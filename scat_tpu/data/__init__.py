from scat_tpu.data import (  # noqa: F401
    freihand,
    ho3d,
    multi,
    preprocess,
    stb,
    synthetic,
    testset,
)
