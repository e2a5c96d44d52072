from pointcloudhookup_tpu.core.batch import (  # noqa: F401
    PointBatch,
    pad_points,
    round_up,
)
