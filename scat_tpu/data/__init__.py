from scat_tpu.data import synthetic  # noqa: F401
