from scat_tpu.utils import checkpoint  # noqa: F401
