"""Stage-level timing of the fused extraction front-end on the real chip.

Times each stage of the bench workload separately (jitted in isolation,
fenced with a 1-element fetch) so perf work targets the true hot spots.
Usage: python scripts/profile_frontend.py [n_mpts]
"""

import sys
import time

import numpy as np


def timeit(fn, fence, iters=6, warmup=2):
    for _ in range(warmup):
        fence(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fence(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pointcloudhookup_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    n = int(float(sys.argv[1]) * 1024 * 1024) if len(sys.argv) > 1 else 4 * 1024 * 1024

    sys.path.insert(0, "/root/repo")
    from bench import build_workload

    from pointcloudhookup_tpu.config import ClusterParams, ExtractParams
    from pointcloudhookup_tpu.models.towers import filter_and_dedup
    from pointcloudhookup_tpu.ops.frontend_fused import fused_downsample_ground_cluster
    from pointcloudhookup_tpu.ops.morton import SENTINEL_HI, morton_encode
    from pointcloudhookup_tpu.ops.obb import cluster_obb_stats
    from pointcloudhookup_tpu.ops.percentile import masked_percentile
    from pointcloudhookup_tpu.ops.segments import segmented_scan

    params = ExtractParams(cluster=ClusterParams())
    xyz_np, mask_np, centers = build_workload(n)
    xyz = jnp.asarray(xyz_np)
    mask = jnp.asarray(mask_np)

    def f1(x):
        return np.asarray(x.reshape(-1)[0:1])

    rows = []

    def rec(name, dt):
        rows.append((name, dt * 1e3, n / dt / 1e6))
        print(f"{name:42s} {dt*1e3:9.2f} ms   {n/dt/1e6:8.1f} Mpts/s", flush=True)

    # ---- stage A: morton encode + 3-operand 2-key sort
    @jax.jit
    def stage_sort(xyz, mask):
        big = jnp.float32(3.0e38)
        mn = jnp.min(jnp.where(mask[:, None], xyz, big), axis=0)
        v = jnp.floor((xyz - mn) / 0.1).astype(jnp.int32)
        hi, lo = morton_encode(v[:, 0], v[:, 1], v[:, 2])
        hi = jnp.where(mask, hi, SENTINEL_HI)
        w = mask.astype(jnp.float32)
        hi, lo, w = lax.sort((hi, lo, w), num_keys=2)
        return hi, lo, w

    rec("A morton+sort(hi,lo,w) 2key", timeit(lambda: stage_sort(xyz, mask), lambda o: f1(o[0])))
    hi, lo, w = stage_sort(xyz, mask)

    # sort with only keys (no payload)
    @jax.jit
    def stage_sort2(xyz, mask):
        big = jnp.float32(3.0e38)
        mn = jnp.min(jnp.where(mask[:, None], xyz, big), axis=0)
        v = jnp.floor((xyz - mn) / 0.1).astype(jnp.int32)
        h, l = morton_encode(v[:, 0], v[:, 1], v[:, 2])
        h = jnp.where(mask, h, SENTINEL_HI)
        return lax.sort((h, l), num_keys=2)

    rec("A' morton+sort(hi,lo) keys-only", timeit(lambda: stage_sort2(xyz, mask), lambda o: f1(o[0])))

    # single-key u32 sort baseline
    @jax.jit
    def stage_sort1(xyz, mask):
        big = jnp.float32(3.0e38)
        mn = jnp.min(jnp.where(mask[:, None], xyz, big), axis=0)
        v = jnp.floor((xyz - mn) / 0.1).astype(jnp.int32)
        h, l = morton_encode(v[:, 0], v[:, 1], v[:, 2])
        return lax.sort((l,), num_keys=1)

    rec("A'' sort single i32 key", timeit(lambda: stage_sort1(xyz, mask), lambda o: f1(o[0])))

    # ---- stage B: voxel-run flags + 1-col reverse segscan (geometric mode)
    @jax.jit
    def stage_scan(hi, lo, w):
        v_start = ((hi != jnp.roll(hi, 1)) | (lo != jnp.roll(lo, 1))).at[0].set(True)
        vcount = segmented_scan(jnp.add, w, v_start, reverse=True)
        return vcount

    rec("B 1-col reverse segscan", timeit(lambda: stage_scan(hi, lo, w), f1))

    # ---- stage C: strided percentile (N/16 sort)
    @jax.jit
    def stage_pct(hi, lo, w):
        vz = w[::16]  # stand-in values, same shapes
        return masked_percentile(vz, w[::16] > 0, 25.0)

    rec("C strided percentile (N/16 sort)", timeit(lambda: stage_pct(hi, lo, w), f1))

    # ---- stage D: full fused front-end
    def front(xyz, mask):
        return fused_downsample_ground_cluster(
            xyz, mask, params, max_cells=8192, min_cell_points=3,
            geometric_voxels=True,
        )

    rec("D fused front-end (all)", timeit(lambda: front(xyz, mask), lambda o: f1(o[1])))
    ds_xyz, keep, labels, base = front(xyz, mask)

    # ---- stage E: OBB stats (includes its own label sort)
    def obb(ds_xyz, labels, keep):
        return cluster_obb_stats(
            ds_xyz, labels, keep, max_clusters=params.max_clusters,
            num_angles=params.obb_angles, per_cluster_cap=8192,
        )

    rec("E cluster_obb_stats", timeit(lambda: obb(ds_xyz, labels, keep), lambda o: f1(o["count"])))
    stats = obb(ds_xyz, labels, keep)

    # ---- stage F: filter_and_dedup
    rec("F filter_and_dedup", timeit(lambda: filter_and_dedup(stats, params.filters), f1))

    print()
    total = sum(r[1] for r in rows if r[0][0] in "DEF")
    print(f"D+E+F pipeline total {total:.2f} ms -> {n/total/1e3:.1f} Mpts/s")


if __name__ == "__main__":
    main()
