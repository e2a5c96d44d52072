from pointcloudhookup_tpu.ops.percentile import masked_percentile  # noqa: F401
from pointcloudhookup_tpu.ops.voxel import voxel_downsample  # noqa: F401
