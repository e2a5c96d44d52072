"""Micro-profile of the m-table build (frontend stage 4: 2.56 ms in
the r3 cumulative profile) and candidate replacements, on the real
chip.  Times K-chained invocations inside one jit so the ~4.3 ms
dispatch floor amortizes out.

Run: python -u benchmarks/profile_mtable.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(float(os.environ.get("PCH_BENCH_MPTS", "4")) * 1024 * 1024)
M = 8192
K = 8


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from pointcloudhookup_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import build_workload
    from pointcloudhookup_tpu.config import ClusterParams, ExtractParams
    from pointcloudhookup_tpu.ops.frontend_fused import (
        fused_downsample_ground_cluster,
    )

    params = ExtractParams(cluster=ClusterParams())
    xyz_np, mask_np, _ = build_workload(N)
    pidx_row, ctot = fused_downsample_ground_cluster(
        jnp.asarray(xyz_np), jnp.asarray(mask_np), params, max_cells=M,
        min_cell_points=3, geometric_voxels=True, emit="codes", _cut=3,
    )
    pidx_row = jnp.asarray(np.asarray(pidx_row))  # materialize
    ctot = jnp.asarray(np.asarray(ctot))
    n = pidx_row.shape[0]
    print(f"device: {jax.devices()[0]}, N={n}, n_dense={int(np.asarray(pidx_row)[-1])+1}",
          flush=True)

    queries = jnp.arange(M, dtype=jnp.int32)

    def current(pidx, _q):
        return jnp.clip(
            jnp.searchsorted(pidx, _q, side="left"), 0, n - 1
        ).astype(jnp.int32)

    S = 512

    def twolevel(pidx, _q):
        coarse = pidx[::S]  # [N/S]
        t0 = jnp.searchsorted(coarse, _q, side="left").astype(jnp.int32)
        lo = jnp.maximum(t0 * S - (S - 1), 0)
        hi = jnp.minimum(t0 * S, n - 1)

        def step(_, lh):
            lo, hi = lh
            mid = (lo + hi) // 2
            v = jnp.take(pidx, mid)
            ge = v >= _q
            return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

        lo, hi = lax.fori_loop(0, 9, step, (lo, hi))
        return lo

    def timeit(name, fn):
        @jax.jit
        def chained(pidx, q):
            acc = jnp.int32(0)
            r = None
            for _ in range(K):
                r = fn(pidx, q + (acc % 2))
                acc = acc + r[0]
            return r, acc

        for _ in range(2):
            out = chained(pidx_row, queries)
            np.asarray(out[1])
        t0 = time.perf_counter()
        for _ in range(4):
            out = chained(pidx_row, queries)
        np.asarray(out[1])
        dt = (time.perf_counter() - t0) / 4 / K
        print(f"{name:<28} {dt*1e3:8.3f} ms", flush=True)
        return out[0]

    r1 = timeit("searchsorted (current)", current)
    r2 = timeit("two-level /512 + 9-step", twolevel)
    a, b = np.asarray(r1), np.asarray(r2)
    print("agree:", bool((a == b).all()), flush=True)

    # segscan + gather extras for context
    from pointcloudhookup_tpu.ops.segments import segmented_scan

    flags = jnp.asarray(np.asarray(pidx_row) != np.roll(np.asarray(pidx_row), 1))
    ones = jnp.ones(n, jnp.int32)

    def seg(pidx, _q):
        s = segmented_scan(jnp.add, ones, flags, reverse=True)
        return s[:M]

    timeit("segscan add reverse 4M", seg)

    def gat(pidx, _q):
        return jnp.take(ctot, (_q * 512) % n)

    timeit("gather m from 4M", gat)


if __name__ == "__main__":
    main()
