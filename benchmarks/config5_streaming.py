"""BASELINE config 5: multi-tile corridor streaming — host decode
overlapped with device extraction via TileStreamer.  Prints one JSON
line with end-to-end Mpts/s over all tiles."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    from pointcloudhookup_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()

    from bench import build_workload
    from pointcloudhookup_tpu.config import ExtractParams, ClusterParams
    from pointcloudhookup_tpu.core.streaming import stream_extract

    n_tiles = 8
    tile_n = 1 << 20  # 1M points per tile -> 8M total
    tiles = []
    for t in range(n_tiles):
        xyz, mask, _ = build_workload(tile_n)
        tiles.append(np.asarray(xyz[mask], np.float64) + np.array([t * 4500.0, 0, 0]))

    import os

    fast = os.environ.get("PCH_FAST", "0") == "1"
    params = ExtractParams(
        cluster=ClusterParams(method="grid", max_cells=8192, min_cell_points=3)
    )
    # warm (compile) on one tile
    stream_extract(tiles[:1], capacity=tile_n, params=params, fast=fast)
    t0 = time.perf_counter()
    results = stream_extract(tiles, capacity=tile_n, params=params, fast=fast)
    dt = time.perf_counter() - t0
    total = sum(len(t) for t in tiles)
    towers = sum(int(s["accepted"].sum()) for s, _ in results)
    print(json.dumps(dict(
        metric="streaming_extract", value=round(total / dt / 1e6, 2),
        unit="Mpts/s", tiles=n_tiles, total_points=total,
        towers_found=towers, wall_s=round(dt, 2),
    )))


if __name__ == "__main__":
    main()
