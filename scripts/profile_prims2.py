"""True per-op device costs via in-graph repetition: time a jit running
an op K times (fori_loop, serially dependent) minus the K=1 call, so
tunnel/dispatch overhead cancels.

Usage: python scripts/profile_prims2.py [n_mpts]
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

    n = int(float(sys.argv[1]) * 1024 * 1024) if len(sys.argv) > 1 else 4 * 1024 * 1024
    sys.path.insert(0, "/root/repo")
    from pointcloudhookup_tpu.ops.segments import segmented_scan

    rng = np.random.default_rng(0)
    hi = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
    lo = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
    f = jnp.asarray(rng.random(n, dtype=np.float32))
    flags = jnp.asarray(rng.random(n) < 0.1)

    def f1(x):
        while isinstance(x, (tuple, list)):
            x = x[0]
        return np.asarray(x.reshape(-1)[0:1])

    def timecall(fn, *args, iters=4, warmup=1):
        for _ in range(warmup):
            f1(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        f1(out)
        return (time.perf_counter() - t0) / iters

    K = 8

    def measure(name, op, x0):
        @jax.jit
        def one(x):
            return op(x)

        @jax.jit
        def many(x):
            return lax.fori_loop(0, K, lambda i, x: op(x), x)

        t1 = timecall(one, x0)
        tk = timecall(many, x0)
        per = (tk - t1) / (K - 1)
        print(f"{name:40s} {per*1e3:8.3f} ms/op   {n/per/1e6:9.1f} Mrows/s", flush=True)

    measure("sort 2op 2key", lambda ab: lax.sort(ab, num_keys=2), (hi, lo))
    measure(
        "sort 4op 1key",
        lambda t: lax.sort(t, num_keys=1),
        (hi, f, f + 1.0, f + 2.0),
    )
    measure("cumsum f32", lambda x: jnp.cumsum(x) * 1e-6, f)
    measure("cumsum i32 (of flags)", lambda x: (jnp.cumsum(x) & 0x7FFF).astype(jnp.int32),
            flags.astype(jnp.int32))
    measure("segscan add f32 rev",
            lambda x: segmented_scan(jnp.add, x, flags, reverse=True) * 1e-6, f)
    measure("segscan max i32 fwd",
            lambda x: segmented_scan(jnp.maximum, x, flags) - 1, lo)
    measure("flags roll+cmp", lambda h: ((h != jnp.roll(h, 1)).astype(jnp.int32) + h), hi)
    measure("elementwise x3", lambda x: x * 1.000001 + jnp.abs(x) * 1e-9 - 0.0, f)

    ss = jnp.sort(lo)
    qm = jnp.arange(8192, dtype=jnp.int32) * 13

    @jax.jit
    def one_ss(q):
        return jnp.searchsorted(ss, q)

    @jax.jit
    def many_ss(q):
        return lax.fori_loop(
            0, K, lambda i, q: jnp.searchsorted(ss, q).astype(jnp.int32) % 999983, q
        )

    t1 = timecall(one_ss, qm)
    tk = timecall(many_ss, qm)
    print(f"{'searchsorted m=8k':40s} {(tk-t1)/(K-1)*1e3:8.3f} ms/op", flush=True)

    p = min(1 << 20, n)
    idx = jnp.asarray(rng.integers(0, n, p, dtype=np.int32))

    @jax.jit
    def one_g(ix):
        return f[ix]

    @jax.jit
    def many_g(ix):
        def body(i, ix):
            return (f[ix] * 4e6).astype(jnp.int32) % n

        return lax.fori_loop(0, K, body, ix)

    t1 = timecall(one_g, idx)
    tk = timecall(many_g, idx)
    print(f"{'gather P=1M rows':40s} {(tk-t1)/(K-1)*1e3:8.3f} ms/op", flush=True)

    # pallas neighbor pass at m=8192
    from pointcloudhookup_tpu.ops.pallas.neighbor import neighbor_reduce

    m = 8192
    cells = np.full((m, 3), 3.0e38, np.float32)
    nc = 3000
    t = rng.integers(0, 24, nc)
    cells[:nc, 0] = t * 160.0 + rng.normal(0, 4, nc)
    cells[:nc, 1] = rng.normal(0, 4, nc)
    cells[:nc, 2] = rng.uniform(0, 60, nc)
    cells_j = jnp.asarray(cells)
    alive = jnp.arange(m) < nc
    wts = jnp.where(alive, 30.0, 0.0).astype(jnp.float32)
    eps2 = jnp.float32(64.0)
    lab0 = jnp.where(alive, jnp.arange(m), m).astype(jnp.int32)

    def nr_op(labels):
        pop, lmin = neighbor_reduce(cells_j, labels, wts, alive, eps2, sentinel=m)
        return jnp.minimum(labels, lmin)

    @jax.jit
    def one_nr(lab):
        return nr_op(lab)

    @jax.jit
    def many_nr(lab):
        return lax.fori_loop(0, K, lambda i, l: nr_op(l), lab)

    t1 = timecall(one_nr, lab0)
    tk = timecall(many_nr, lab0)
    print(f"{'pallas neighbor m=8192':40s} {(tk-t1)/(K-1)*1e3:8.3f} ms/op", flush=True)
    print(f"{'pallas neighbor single-call wall':40s} {t1*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
