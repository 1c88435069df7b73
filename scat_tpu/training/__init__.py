from scat_tpu.training import schedule, state, steps  # noqa: F401
