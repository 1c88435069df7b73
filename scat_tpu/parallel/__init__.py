from scat_tpu.parallel import mesh  # noqa: F401
