from scat_tpu.viz import draw  # noqa: F401
