from scat_tpu.models import (  # noqa: F401
    factory,
    hand_net,
    hrnet,
    inception,
    losses,
    mano,
    performer,
    resnet,
    transformer,
    vit,
)
from scat_tpu.models.factory import (  # noqa: F401
    build_model,
    check_eval_variables,
)
