from scat_tpu.ops import geometry, metrics, procrustes  # noqa: F401
