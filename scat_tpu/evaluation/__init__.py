from scat_tpu.evaluation import evaluator  # noqa: F401
