"""Cumulative-stage profile of the bench fast path at 4M points.

Each variant jits a PREFIX of the full pipeline and is timed with the
queue-8 + tiny-fetch fence; stage cost = difference of consecutive
variants.  All stages run inside one jit per variant, so per-dispatch
tunnel overhead cancels in the differences.

Run: python -u benchmarks/profile_cumulative.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(float(os.environ.get("PCH_BENCH_MPTS", "4")) * 1024 * 1024)
ITERS = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pointcloudhookup_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import build_workload
    from pointcloudhookup_tpu.config import ClusterParams, ExtractParams
    from pointcloudhookup_tpu.models.towers import filter_and_dedup
    from pointcloudhookup_tpu.ops.frontend_fused import (
        fused_downsample_ground_cluster,
    )
    from pointcloudhookup_tpu.ops.morton import SENTINEL_HI, morton_encode
    from pointcloudhookup_tpu.ops.obb import cluster_obb_stats_accum

    params = ExtractParams(cluster=ClusterParams())
    xyz_np, mask_np, centers = build_workload(N)
    xyz = jnp.asarray(xyz_np)
    mask = jnp.asarray(mask_np)
    print(f"device: {jax.devices()[0]}, N={N}", flush=True)

    @jax.jit
    def v1_sort(xyz, mask):
        big = jnp.float32(3.0e38)
        mn = jnp.min(jnp.where(mask[:, None], xyz, big), axis=0)
        v = jnp.floor((xyz - mn) / 0.1).astype(jnp.int32)
        hi, lo = morton_encode(v[:, 0], v[:, 1], v[:, 2])
        hi = jnp.where(mask, hi, SENTINEL_HI)
        hi, lo = lax.sort((hi, lo), num_keys=2)
        return hi, lo

    @jax.jit
    def v2_frontend(xyz, mask):
        return fused_downsample_ground_cluster(
            xyz, mask, params, max_cells=8192, min_cell_points=3,
            geometric_voxels=True, emit="codes",
        )

    @jax.jit
    def v3_obb(xyz, mask):
        hi, lo, keep, labels, base, mn = fused_downsample_ground_cluster(
            xyz, mask, params, max_cells=8192, min_cell_points=3,
            geometric_voxels=True, emit="codes",
        )
        stats = cluster_obb_stats_accum(
            hi, lo, labels, keep, mn, max_clusters=params.max_clusters,
            num_angles=params.obb_angles,
        )
        return stats["count"], stats["center"]

    @jax.jit
    def v4_full(xyz, mask):
        hi, lo, keep, labels, base, mn = fused_downsample_ground_cluster(
            xyz, mask, params, max_cells=8192, min_cell_points=3,
            geometric_voxels=True, emit="codes",
        )
        stats = cluster_obb_stats_accum(
            hi, lo, labels, keep, mn, max_clusters=params.max_clusters,
            num_angles=params.obb_angles,
        )
        return filter_and_dedup(stats, params.filters)

    def timeit(name, fn):
        def fence(out):
            leaf = out
            while isinstance(leaf, (tuple, list)):
                leaf = leaf[0]
            return np.asarray(leaf.ravel()[0:1])

        for _ in range(2):
            fence(fn(xyz, mask))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(xyz, mask)
        fence(out)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:<40} {dt*1e3:8.2f} ms", flush=True)
        return dt

    t1 = timeit("v1 prep+sort", v1_sort)
    t2 = timeit("v2 full frontend (sort..labels)", v2_frontend)
    t3 = timeit("v3 + accum OBB", v3_obb)
    t4 = timeit("v4 + filter (full bench)", v4_full)
    print(f"\nstage deltas: frontend-after-sort {1e3*(t2-t1):.2f} ms, "
          f"obb {1e3*(t3-t2):.2f} ms, filter {1e3*(t4-t3):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
