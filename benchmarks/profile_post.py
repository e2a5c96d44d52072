"""Fine-grained cumulative profile of the fused frontend's POST-SORT
stages at 4M, using fused_downsample_ground_cluster(_cut=k) prefixes so
the profile can never drift from the production code.  Differences of
consecutive prefixes are per-stage costs (the ~4.3 ms dispatch floor
cancels).

Run: python -u benchmarks/profile_post.py            (sort_mode=full)
     PCH_SORT=hier python -u benchmarks/profile_post.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(float(os.environ.get("PCH_BENCH_MPTS", "4")) * 1024 * 1024)
ITERS = 8
SORT_MODE = os.environ.get("PCH_SORT", "full")

STAGES = {
    1: "sort (+reconstruct)",
    2: "ground (v_start+decode+percentile)",
    3: "cells (c_start+ctot+pidx scans)",
    4: "m-table (searchsorted+decode)",
    5: "cluster_cells pallas",
    0: "labels (delivery+segmax scan)",
}


def main():
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

    params = ExtractParams(cluster=ClusterParams())
    xyz_np, mask_np, _ = build_workload(N)
    cell_plan = None
    if SORT_MODE == "cell" and os.environ.get("PCH_PLAN", "1") == "1":
        from pointcloudhookup_tpu.ops.frontend_fused import cell_sort_plan

        span = xyz_np.max(axis=0) - xyz_np.min(axis=0)
        cell_plan = cell_sort_plan(span, eps=params.cluster.eps)
    xyz = jnp.asarray(xyz_np)
    mask = jnp.asarray(mask_np)
    print(f"device: {jax.devices()[0]}, N={N}, sort_mode={SORT_MODE}, "
          f"plan={cell_plan}", flush=True)

    def timeit(name, fn):
        def fence(out):
            leaf = out
            while isinstance(leaf, (tuple, list)):
                leaf = leaf[0]
            return np.asarray(leaf.ravel()[0:1])

        import numpy as np  # noqa: F811

        for _ in range(2):
            fence(fn())
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn()
        fence(out)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:<44} {dt*1e3:8.2f} ms", flush=True)
        return dt

    global np
    import numpy as np

    prev = 0.0
    for cut in (1, 2, 3, 4, 5, 0):
        t = timeit(
            f"cut={cut} {STAGES[cut]}",
            lambda cut=cut: fused_downsample_ground_cluster(
                xyz, mask, params,
                max_cells=int(os.environ.get("PCH_CELLS", "8192")),
                min_cell_points=3,
                geometric_voxels=True, emit="codes", sort_mode=SORT_MODE,
                cell_plan=cell_plan,
                precut_div=int(os.environ.get("PCH_PRECUT", "0")),
                _cut=cut,
            ),
        )
        if prev:
            print(f"    delta: {1e3*(t-prev):+.2f} ms", flush=True)
        prev = t


if __name__ == "__main__":
    main()
