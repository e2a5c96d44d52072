"""Micro-profile the exact path's cluster-stage primitives on the real
cell table: pop kernel, border kernel, core compaction, flood kernel,
label scatter, compact_labels."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")

def main():
    import jax, jax.numpy as jnp
    from pointcloudhookup_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    import bench
    from pointcloudhookup_tpu.config import ExtractParams
    from pointcloudhookup_tpu.models.pipeline import _exact_fast_plan
    from pointcloudhookup_tpu.ops.frontend_exact import (
        exact_extract_graph, _core_flood_cluster)
    from pointcloudhookup_tpu.ops.pallas.neighbor import neighbor_reduce
    from pointcloudhookup_tpu.ops.cluster import compact_labels

    n = 4 * 1024 * 1024
    xyz, mask, centers_t = bench.build_workload(n)
    params = ExtractParams()
    plan = _exact_fast_plan(xyz[mask].astype(np.float64), params, n)
    ccap = n // 4
    out = exact_extract_graph(jnp.asarray(xyz), jnp.asarray(mask), params,
        cell_bits=plan, compact_cap=ccap, max_cells=params.cluster.max_cells,
        min_cell_points=2, _cut=4)
    centers = jnp.asarray(np.asarray(out["centers"]))
    ccount = jnp.asarray(np.asarray(out["ccount"]))
    alive = jnp.asarray(np.asarray(out["cell_alive"]))
    m = centers.shape[0]
    n_alive = int(np.asarray(alive).sum())
    eps2 = jnp.float32(params.cluster.eps) ** 2
    print(f"table: m={m} alive={n_alive}", flush=True)

    import functools
    @functools.partial(jax.jit, static_argnames=("which",))
    def piece(centers, ccount, alive, which):
        if which == "pop":
            pop, _ = neighbor_reduce(centers, jnp.zeros(m, jnp.int32),
                                     ccount, alive, eps2, sentinel=m)
            return pop
        if which == "flood_all":
            lab, over = _core_flood_cluster(centers, ccount, alive, eps2,
                                            params.cluster.min_points, True)
            return lab
        if which == "compact_labels":
            # representative-ish labels: min over something cheap
            lab = jnp.where(alive, jnp.arange(m) // 7 * 7, m)
            return compact_labels(lab, jnp.int32(m))
        if which == "border":
            pop, _ = neighbor_reduce(centers, jnp.zeros(m, jnp.int32),
                                     ccount, alive, eps2, sentinel=m)
            core = alive & (pop >= params.cluster.min_points)
            _, lmin = neighbor_reduce(centers, jnp.arange(m, dtype=jnp.int32),
                                      jnp.zeros(m, jnp.float32), core, eps2,
                                      sentinel=m)
            return lmin
        raise ValueError(which)

    def timeit(which, iters=32):
        f = lambda: piece(centers, ccount, alive, which)
        _ = np.asarray(f()[0:1])
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            for _j in range(iters):
                o = f()
            _ = np.asarray(o[0:1])
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"{which}: {best*1e3:.2f} ms", flush=True)
        return best

    t_pop = timeit("pop")
    t_border = timeit("border")   # includes pop twice-ish; delta = border
    print(f"  border-only approx: {(t_border - t_pop)*1e3:.2f} ms", flush=True)
    timeit("compact_labels")
    timeit("flood_all")

if __name__ == "__main__":
    main()
