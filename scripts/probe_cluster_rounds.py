"""How many convergence rounds does cluster_cells run on the bench tile,
and what does each pairwise walk cost?  Drives the flood+compress
redesign decision."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(float(os.environ.get("PCH_BENCH_MPTS", "4")) * 1024 * 1024)
M = int(os.environ.get("PCH_CELLS", "4096"))


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
    xyz = jnp.asarray(xyz_np)
    mask = jnp.asarray(mask_np)

    # reproduce the m-table inputs via _cut=4
    import functools

    f4 = jax.jit(functools.partial(
        fused_downsample_ground_cluster, params=params, max_cells=M,
        min_cell_points=3, geometric_voxels=True, emit="codes", _cut=4,
    ))
    centers, ccount, cell_alive = f4(xyz, mask)
    centers, ccount, cell_alive = map(np.asarray, (centers, ccount, cell_alive))
    n_alive = int(cell_alive.sum())
    print(f"alive cells: {n_alive} / {M}")

    # host-side replication of the GS sweep structure to count rounds:
    # same per-BLOCK schedule as the kernel (Jacobi within 1024-blocks,
    # alternating-direction GS across blocks)
    eps2 = params.cluster.eps ** 2
    c = centers[cell_alive.astype(bool)]
    w = ccount[cell_alive.astype(bool)]
    m = len(c)
    d2 = ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    nbm = d2 <= eps2
    pop = (nbm * w[None, :]).sum(1)
    core = pop >= params.cluster.min_points
    print(f"core cells: {core.sum()}")
    lab = np.where(core, np.arange(m), m).astype(np.int64)
    nbm_core = nbm & core[None, :]
    BLOCK = 1024
    nb = (m + BLOCK - 1) // BLOCK
    rounds = 0
    while True:
        changed = False
        order = range(nb) if rounds % 2 == 0 else range(nb - 1, -1, -1)
        for b in order:
            sl = slice(b * BLOCK, min((b + 1) * BLOCK, m))
            cand = np.where(nbm_core[sl], lab[None, :], m).min(1)
            new = np.where(core[sl], np.minimum(lab[sl], cand), lab[sl])
            if (new != lab[sl]).any():
                changed = True
            lab[sl] = new
        rounds += 1
        if not changed:
            break
    print(f"GS rounds to convergence (incl. final no-change): {rounds}")
    n_clusters = len(np.unique(lab[core]))
    print(f"clusters: {n_clusters}")
    # distribution of cluster graph diameters is what drives rounds;
    # report the largest cluster sizes
    u, cnt = np.unique(lab[core], return_counts=True)
    print("largest core-cell clusters:", np.sort(cnt)[-8:])


if __name__ == "__main__":
    main()
