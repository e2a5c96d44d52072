"""Bench-tile m-table occupancy probe: how many dense cells does the
4M bench workload actually produce, and would max_cells=2048/4096 skip
capacity overflow?  Also times the bench body at each max_cells."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(float(os.environ.get("PCH_BENCH_MPTS", "4")) * 1024 * 1024)


def main():
    import jax
    import jax.numpy as jnp

    from pointcloudhookup_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import build_workload
    from pointcloudhookup_tpu.config import ClusterParams, ExtractParams
    from pointcloudhookup_tpu.models.towers import filter_and_dedup
    from pointcloudhookup_tpu.ops.frontend_fused import (
        fused_downsample_ground_cluster,
    )
    from pointcloudhookup_tpu.ops.obb import cluster_obb_stats_accum

    params = ExtractParams(cluster=ClusterParams())
    xyz_np, mask_np, centers = build_workload(N)
    xyz = jnp.asarray(xyz_np)
    mask = jnp.asarray(mask_np)
    print("device:", jax.devices()[0], "N =", N, flush=True)

    def body(m):
        out = fused_downsample_ground_cluster(
            xyz, mask, params, max_cells=m, min_cell_points=3,
            geometric_voxels=True, emit="codes", sort_mode="full",
            return_cells_overflow=True,
        )
        hi, lo, keep, labels, base, mn, cells_over, hier_over = out
        stats = cluster_obb_stats_accum(
            hi, lo, labels, keep, mn, max_clusters=params.max_clusters,
            num_angles=params.obb_angles,
        )
        accepted = filter_and_dedup(stats, params.filters)
        return labels, accepted, cells_over

    for m in (8192, 4096, 2048):
        labels, accepted, cells_over = body(m)
        n_labels = int(np.asarray(jnp.max(labels))) + 1
        n_tow = int(np.asarray(accepted).sum())
        over = float(np.asarray(cells_over))
        # dense-cell count: labels only tell clusters; recompute n_dense
        print(
            f"max_cells={m}: towers={n_tow}/{len(centers)} "
            f"clusters={n_labels} cells_overflow={over}",
            flush=True,
        )
        t0 = time.perf_counter()
        for _ in range(8):
            out = body(m)
        np.asarray(out[1][0:1])
        dt = (time.perf_counter() - t0) / 8
        print(f"  bench body {dt*1e3:8.2f} ms  {N/dt/1e6:6.1f} Mpts/s",
              flush=True)


if __name__ == "__main__":
    main()
