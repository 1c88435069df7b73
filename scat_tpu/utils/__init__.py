from scat_tpu.utils import (  # noqa: F401
    checkpoint,
    debugging,
    logging,
    profiling,
    smplx_glue,
    torch_import,
)
