"""Round-2 stage profiler: per-primitive cost at bench scale (4M) on the
real chip, using the queue-K-iterations + 1-element-fetch fence that the
async tunnel requires.

Run: python benchmarks/profile_r2.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 4 * 1024 * 1024
M = 8192
ITERS = 8


def timeit(name, fn, *args, iters=ITERS, fence=None):
    import jax

    out = fn(*args)
    _default_fence(out if fence is None else fence(out))
    out = fn(*args)
    _default_fence(out if fence is None else fence(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _default_fence(out if fence is None else fence(out))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<46} {dt * 1e3:8.2f} ms")
    return dt


def _default_fence(out):
    leaf = out
    while isinstance(leaf, (tuple, list, dict)):
        leaf = leaf[0] if not isinstance(leaf, dict) else next(iter(leaf.values()))
    np.asarray(leaf.ravel()[0:1])


def main():
    import jax
    import jax.numpy as jnp

    from pointcloudhookup_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import build_workload
    from pointcloudhookup_tpu.config import ClusterParams, ExtractParams
    from pointcloudhookup_tpu.models.towers import filter_and_dedup
    from pointcloudhookup_tpu.ops.frontend_fused import fused_downsample_ground_cluster
    from pointcloudhookup_tpu.ops.morton import SENTINEL_HI, morton_encode
    from pointcloudhookup_tpu.ops.obb import cluster_obb_stats
    from pointcloudhookup_tpu.ops.segments import segmented_scan

    params = ExtractParams(cluster=ClusterParams())
    xyz_np, mask_np, centers = build_workload(N)
    xyz = jnp.asarray(xyz_np)
    mask = jnp.asarray(mask_np)
    print(f"device: {jax.devices()[0]}, N={N}")

    # raw materials
    @jax.jit
    def prep(xyz, mask):
        big = jnp.float32(3.0e38)
        mn = jnp.min(jnp.where(mask[:, None], xyz, big), axis=0)
        v = jnp.floor((xyz - mn) / 0.1).astype(jnp.int32)
        hi, lo = morton_encode(v[:, 0], v[:, 1], v[:, 2])
        hi = jnp.where(mask, hi, SENTINEL_HI)
        return hi, lo, mn

    hi, lo, mn = prep(xyz, mask)
    w = mask.astype(jnp.float32)
    timeit("prep (min + encode, elementwise)", prep, xyz, mask)

    s2 = jax.jit(lambda h, l: lax_sort2(h, l))
    import functools
    from jax import lax

    @jax.jit
    def sort2(h, l):
        return lax.sort((h, l), num_keys=2)

    @jax.jit
    def sort3(h, l, w):
        return lax.sort((h, l, w), num_keys=2)

    @jax.jit
    def sort6(h, l, x):
        return lax.sort((h, l, x[:, 0], x[:, 1], x[:, 2], x[:, 0]), num_keys=2)

    timeit("sort (hi,lo) 2 ops", sort2, hi, lo)
    timeit("sort (hi,lo,w) 3 ops", sort3, hi, lo, w)
    timeit("sort (hi,lo)+4 payloads", sort6, hi, lo, xyz)

    lab = jnp.asarray((np.random.default_rng(0).integers(0, 24, N)).astype(np.int32))

    @jax.jit
    def sort_label(lab, x):
        return lax.sort((lab, x[:, 0], x[:, 1], x[:, 2]), num_keys=1)

    timeit("sort label+3 payloads (1 key)", sort_label, lab, xyz)

    hs, ls = sort2(hi, lo)
    start = jnp.asarray((np.arange(N) % 17 == 0))

    @jax.jit
    def seg_add(wv, st):
        return segmented_scan(jnp.add, wv, st, reverse=True)

    @jax.jit
    def seg_add4(x, st):
        vals = jnp.stack([x[:, 0], x[:, 1], x[:, 2], x[:, 0]], axis=1)
        return segmented_scan(jnp.add, vals, st, reverse=True)

    @jax.jit
    def seg_max(v, st):
        return segmented_scan(jnp.maximum, v, st)

    @jax.jit
    def cumsum_i32(st):
        return jnp.cumsum(st.astype(jnp.int32))

    timeit("segmented add scan [N] f32", seg_add, w, start)
    timeit("segmented add scan [N,4] f32", seg_add4, xyz, start)
    timeit("segmented max scan [N] i32", seg_max, lab, start)
    timeit("cumsum [N] i32", cumsum_i32, start)

    # neighbor kernel alone
    from pointcloudhookup_tpu.ops.pallas.neighbor import neighbor_reduce

    centers_m = jnp.asarray(
        np.random.default_rng(1).uniform(-2000, 2000, (M, 3)).astype(np.float32)
    )
    alive_m = jnp.ones(M, bool)
    labels_m = jnp.arange(M, dtype=jnp.int32)
    wts = jnp.ones(M, jnp.float32)

    @jax.jit
    def nbr(c, l, w, a):
        return neighbor_reduce(c, l, w, a, jnp.float32(64.0), sentinel=M)

    timeit("neighbor_reduce pass (m=8192)", nbr, centers_m, labels_m, wts, alive_m)

    # full fused frontend, geometric
    def frontend(xyz, mask):
        return fused_downsample_ground_cluster(
            xyz, mask, params, max_cells=8192, min_cell_points=3,
            geometric_voxels=True,
        )

    out = frontend(xyz, mask)
    timeit("fused frontend (geometric)", frontend, xyz, mask)

    ds_xyz, keep, labels, base = out

    @jax.jit
    def obbstage(ds_xyz, labels, keep):
        stats = cluster_obb_stats(
            ds_xyz, labels, keep, max_clusters=params.max_clusters,
            num_angles=params.obb_angles, per_cluster_cap=8192,
        )
        return filter_and_dedup(stats, params.filters)

    timeit("cluster_obb_stats + filters", obbstage, ds_xyz, labels, keep)


def lax_sort2(h, l):
    from jax import lax

    return lax.sort((h, l), num_keys=2)


if __name__ == "__main__":
    main()
