from pointcloudhookup_tpu.models.towers import (  # noqa: F401
    Tower,
    extract_step,
    filter_and_dedup,
)
