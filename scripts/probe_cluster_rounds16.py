"""Convergence behavior of cluster_cells on the 16M/32k-cell workload:
how many outer walks, and what does each cost?  Uses max_iter sweeps and
on-device label comparison (no O(m^2) host replica)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(float(os.environ.get("PCH_BENCH_MPTS", "16")) * 1024 * 1024)
M = int(os.environ.get("PCH_CELLS", "32768"))


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from pointcloudhookup_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import build_workload
    from pointcloudhookup_tpu.config import ClusterParams, ExtractParams
    from pointcloudhookup_tpu.ops.frontend_fused import (
        fused_downsample_ground_cluster,
    )
    from pointcloudhookup_tpu.ops.pallas.cluster_converge import cluster_cells

    params = ExtractParams(cluster=ClusterParams())
    xyz_np, mask_np, _ = build_workload(N)
    xyz = jnp.asarray(xyz_np)
    mask = jnp.asarray(mask_np)

    f4 = jax.jit(functools.partial(
        fused_downsample_ground_cluster, params=params, max_cells=M,
        min_cell_points=3, geometric_voxels=True, emit="codes",
        precut_div=4, _cut=4,
    ))
    centers, ccount, cell_alive = f4(xyz, mask)
    print(f"alive cells: {int(np.asarray(cell_alive).sum())} / {M}", flush=True)
    eps2 = params.cluster.eps ** 2
    iota = jnp.arange(M, dtype=jnp.int32)

    ref_lab = None
    prev = None
    for it in (1, 2, 3, 4, 6, 8, 12, 16, 32):
        lab, _ = cluster_cells(
            centers, ccount, cell_alive, iota, eps2,
            params.cluster.min_points, max_iter=it,
        )
        lab = np.asarray(lab)
        if prev is not None and np.array_equal(lab, prev):
            print(f"converged by max_iter={it}", flush=True)
            ref_lab = lab
            break
        prev = lab
    # cost per walk: time max_iter=1 vs 3 chained
    import time

    def timeit(it, K=8):
        @jax.jit
        def run(c):
            acc = jnp.int32(0)
            for i in range(K):
                lab, _ = cluster_cells(
                    c + (acc * 0).astype(jnp.float32), ccount, cell_alive,
                    iota, eps2, params.cluster.min_points, max_iter=it,
                )
                acc = lab[0]
            return acc
        out = run(centers); np.asarray(out.reshape(-1)[:1])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); out = run(centers)
            np.asarray(out.reshape(-1)[:1])
            best = min(best, time.perf_counter() - t0)
        print(f"max_iter={it}: {best/K*1e3:7.2f} ms/call", flush=True)

    timeit(1)
    timeit(3)
    timeit(8)


if __name__ == "__main__":
    main()
