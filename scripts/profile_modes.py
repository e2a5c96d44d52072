"""Decisive sort-mode A/B: in-graph chained timings of the REAL
frontend graph at _cut=1 (sort phase incl. reconstruction) and _cut=0
(full frontend) for sort_mode full/hier/cell, plus the full bench body.

Every variant chains K iterations inside ONE jit (outputs feed a
scalar carry that perturbs the next iteration's input mask-salt), so
per-dispatch tunnel overhead amortizes to K-th and stage deltas are
trustworthy.  Run alone on the chip: python scripts/profile_modes.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(float(os.environ.get("PCH_BENCH_MPTS", "4")) * 1024 * 1024)
K = 4


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
        cell_sort_plan,
        fused_downsample_ground_cluster,
        hier_sort_eligible,
    )
    from pointcloudhookup_tpu.ops.obb import cluster_obb_stats_accum

    params = ExtractParams(cluster=ClusterParams())
    xyz_np, mask_np, _ = build_workload(N)
    span = xyz_np.max(axis=0) - xyz_np.min(axis=0)
    plan = cell_sort_plan(span, eps=params.cluster.eps)
    assert hier_sort_eligible(span)
    xyz = jnp.asarray(xyz_np)
    mask = jnp.asarray(mask_np)
    print(f"device: {jax.devices()[0]}, N={N}, plan={plan}", flush=True)

    def fe(xyz, mask, mode, cut):
        return fused_downsample_ground_cluster(
            xyz, mask, params, max_cells=8192, min_cell_points=3,
            geometric_voxels=True, emit="codes", sort_mode=mode,
            cell_plan=plan if mode == "cell" else None, _cut=cut,
        )

    def bench_body(xyz, mask, mode):
        hi, lo, keep, labels, base, mn = fe(xyz, mask, mode, 0)
        stats = cluster_obb_stats_accum(
            hi, lo, labels, keep, mn, max_clusters=params.max_clusters,
            num_angles=params.obb_angles,
        )
        accepted = filter_and_dedup(stats, params.filters)
        return labels, stats, accepted, base

    def timeit(name, fn):
        @jax.jit
        def chained(xyz, mask):
            acc = jnp.int32(0)
            for _ in range(K):
                out = fn(xyz, mask & (jnp.arange(N) != acc))
                first = out[0] if isinstance(out, tuple) else out
                acc = (acc + first.ravel()[0].astype(jnp.int32)) % 7 + 1
            return acc
        for _ in range(2):
            np.asarray(chained(xyz, mask))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(2):
                out = chained(xyz, mask)
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / 2 / K)
        print(f"{name:<34} {best*1e3:8.3f} ms  {N/best/1e6:7.1f} Mpts/s",
              flush=True)
        return best

    for mode in ("full", "hier", "cell"):
        timeit(f"{mode} cut=1 sort phase", lambda x, m, md=mode: fe(x, m, md, 1))
    for mode in ("full", "hier", "cell"):
        timeit(f"{mode} cut=0 frontend", lambda x, m, md=mode: fe(x, m, md, 0))
    for mode in ("full", "hier", "cell"):
        timeit(f"{mode} FULL bench body", lambda x, m, md=mode: bench_body(x, m, md))


if __name__ == "__main__":
    main()
