"""Microbenchmarks of the primitive menu the front-end composes from,
at bench scale (4M rows) on the real chip.  Small graphs -> fast
compiles, unlike the monolithic 4M front-end.

Usage: python scripts/profile_prims.py [n_mpts]
"""

import sys
import time

import numpy as np


def timeit(fn, fence, iters=8, warmup=2):
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

    from pointcloudhookup_tpu.ops.segments import segmented_scan

    rng = np.random.default_rng(0)
    hi_np = rng.integers(0, 1 << 30, n, dtype=np.int32)
    lo_np = rng.integers(0, 1 << 30, n, dtype=np.int32)
    f_np = rng.random(n, dtype=np.float32)
    hi = jnp.asarray(hi_np)
    lo = jnp.asarray(lo_np)
    f = jnp.asarray(f_np)

    def f1(x):
        if isinstance(x, (tuple, list)):
            x = x[0]
        return np.asarray(x.reshape(-1)[0:1])

    def rec(name, dt):
        print(f"{name:44s} {dt*1e3:9.2f} ms  {n/dt/1e6:8.1f} Mrows/s", flush=True)

    j = jax.jit

    rec("sort 1op i32", timeit(j(lambda: lax.sort((lo,), num_keys=1)), f1))
    rec("sort 2op (hi,lo) 2key", timeit(j(lambda: lax.sort((hi, lo), num_keys=2)), f1))
    rec("sort 3op (hi,lo,f) 2key", timeit(j(lambda: lax.sort((hi, lo, f), num_keys=2)), f1))
    rec("sort 5op (hi,lo,f,f,f) 2key",
        timeit(j(lambda: lax.sort((hi, lo, f, f + 1, f + 2), num_keys=2)), f1))
    rec("sort 4op (lab,x,y,z) 1key",
        timeit(j(lambda: lax.sort((hi, f, f + 1, f + 2), num_keys=1)), f1))

    flags_np = rng.random(n) < 0.1
    flags = jnp.asarray(flags_np)
    rec("segscan add f32 rev", timeit(j(lambda: segmented_scan(jnp.add, f, flags, reverse=True)), f1))
    rec("segscan max i32 fwd", timeit(j(lambda: segmented_scan(jnp.maximum, lo, flags)), f1))
    rec("cumsum i32", timeit(j(lambda: jnp.cumsum(flags.astype(jnp.int32))), f1))
    rec("cumsum f32", timeit(j(lambda: jnp.cumsum(f)), f1))

    def flagblock():
        a = (hi != jnp.roll(hi, 1)) | (lo != jnp.roll(lo, 1))
        return a.at[0].set(True)

    rec("flags roll+cmp x2", timeit(j(flagblock), f1))

    ss = jnp.sort(lo)
    q_m = jnp.arange(8192, dtype=jnp.int32) * 13
    rec("searchsorted m=8k over N", timeit(j(lambda: jnp.searchsorted(ss, q_m)), f1))
    p = min(1 << 20, n)
    q_p = jnp.arange(p, dtype=jnp.int32)
    rec("searchsorted P=1M over N", timeit(j(lambda: jnp.searchsorted(ss, q_p)), f1))
    idx = jnp.asarray(rng.integers(0, n, p, dtype=np.int32))
    rec("gather P=1M rows from N", timeit(j(lambda: f[idx]), f1))
    idx_s = jnp.sort(idx)
    rec("gather P=1M sorted idx", timeit(j(lambda: f[idx_s]), f1))

    # m-scale: one neighbor_reduce pass and a realistic clustering loop
    from pointcloudhookup_tpu.ops.pallas.neighbor import neighbor_reduce

    m = 8192
    # corridor-like cells: 24 tower columns of stacked cells + noise
    cells = np.full((m, 3), 3.0e38, np.float32)
    nc = 3000
    t = rng.integers(0, 24, nc)
    cells[:nc, 0] = t * 160.0 + rng.normal(0, 4, nc)
    cells[:nc, 1] = rng.normal(0, 4, nc)
    cells[:nc, 2] = rng.uniform(0, 60, nc)
    cells_j = jnp.asarray(cells)
    alive = jnp.arange(m) < nc
    labels0 = jnp.where(alive, jnp.arange(m), m).astype(jnp.int32)
    wts = jnp.where(alive, 30.0, 0.0).astype(jnp.float32)
    eps2 = jnp.float32(64.0)

    rec("pallas neighbor_reduce m=8192 (1 pass)",
        timeit(j(lambda: neighbor_reduce(cells_j, labels0, wts, alive, eps2, sentinel=m)), f1))

    def cluster_loop():
        def step(state):
            labels, _, it = state
            _, lmin = neighbor_reduce(cells_j, labels, jnp.zeros(m, jnp.float32), alive, eps2, sentinel=m)
            new = jnp.where(alive, jnp.minimum(labels, lmin), labels)
            for _ in range(4):
                new = jnp.where(alive, jnp.minimum(new, new[jnp.clip(new, 0, m - 1)]), new)
            return new, jnp.any(new != labels), it + 1

        out = lax.while_loop(lambda s: s[1] & (s[2] < 64), step,
                             (labels0, jnp.bool_(True), jnp.int32(0)))
        return out[0], out[2]

    cl = j(cluster_loop)
    iters = np.asarray(cl()[1])
    rec(f"cluster while_loop m=8192 ({int(iters)} iters)", timeit(cl, f1))


if __name__ == "__main__":
    main()
