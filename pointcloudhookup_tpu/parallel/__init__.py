from pointcloudhookup_tpu.parallel.sharded import (  # noqa: F401
    make_sharded_extract,
    tile_mesh,
)
