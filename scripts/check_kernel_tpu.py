"""On-chip validation + timing of the culled neighbor kernel.

Checks the Mosaic-compiled kernel against the XLA oracle on realistic
corridor cell tables (incl. dead capacity + disallowed rows), then
times single pass and the clustering loop shape used by the front-end.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pointcloudhookup_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    sys.path.insert(0, "/root/repo")

    from pointcloudhookup_tpu.ops.pallas.neighbor import (
        neighbor_reduce,
        neighbor_reduce_reference,
    )

    rng = np.random.default_rng(0)
    m = 8192
    nc = 3000
    cells = np.full((m, 3), 3.0e38, np.float32)
    t = rng.integers(0, 24, nc)
    cells[:nc, 0] = t * 160.0 + rng.normal(0, 4, nc)
    cells[:nc, 1] = rng.normal(0, 4, nc)
    cells[:nc, 2] = rng.uniform(0, 60, nc)
    labels = rng.integers(0, m, m).astype(np.int32)
    weights = rng.uniform(0, 40, m).astype(np.float32)
    allowed = np.zeros(m, bool)
    allowed[:nc] = rng.uniform(size=nc) > 0.25
    eps2 = 64.0

    cj = jnp.asarray(cells)
    lj = jnp.asarray(labels)
    wj = jnp.asarray(weights)
    aj = jnp.asarray(allowed)

    pop, lmin = neighbor_reduce(cj, lj, wj, aj, eps2, sentinel=m)
    pop_r, lmin_r = neighbor_reduce_reference(cj, lj, wj, aj, eps2, sentinel=m)
    pop, lmin, pop_r, lmin_r = map(np.asarray, (pop, lmin, pop_r, lmin_r))
    # compare only finite rows (oracle feeds 3e38 coords through the
    # |x|^2 expansion, which overflows on dead rows)
    fin = np.abs(cells[:, 0]) < 1e37
    ok_pop = np.allclose(pop[fin], pop_r[fin], rtol=1e-5)
    ok_lmin = (lmin[fin] == lmin_r[fin]).all()
    print(f"on-chip parity: pop={ok_pop} lmin={ok_lmin}", flush=True)
    if not (ok_pop and ok_lmin):
        bad = np.nonzero((lmin[fin] != lmin_r[fin]))[0][:5]
        print("first bad rows:", bad, lmin[fin][bad], lmin_r[fin][bad])
        sys.exit(1)

    def f1(x):
        return np.asarray(x[0].reshape(-1)[0:1])

    K = 8

    def nr_op(lab):
        _, lm = neighbor_reduce(cj, lab, wj, aj, eps2, sentinel=m)
        return jnp.minimum(lab, lm)

    one = jax.jit(lambda l: (nr_op(l),))
    many = jax.jit(lambda l: (lax.fori_loop(0, K, lambda i, x: nr_op(x), l),))
    for _ in range(2):
        f1(one(lj)), f1(many(lj))
    t0 = time.perf_counter()
    for _ in range(4):
        o = one(lj)
    f1(o)
    t1 = (time.perf_counter() - t0) / 4
    t0 = time.perf_counter()
    for _ in range(4):
        o = many(lj)
    f1(o)
    tk = (time.perf_counter() - t0) / 4
    print(f"culled kernel: {(tk-t1)/(K-1)*1e3:.3f} ms/pass (single-call wall {t1*1e3:.2f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
