from pointcloudhookup_tpu.utils.logging import Reporter, StageTracer  # noqa: F401
