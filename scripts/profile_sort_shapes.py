"""How does lax.sort cost scale with shape on TPU?  Times a u32-key
sort (+2 i32 payloads, num_keys=1) at 4M total elements arranged as
[1, 4M] (the frontend's global sort), [16, 256k], [128, 32k],
[512, 8k], [2048, 2k] batched minor-dim sorts, plus smaller totals
(1M, 2M flat) to see N-scaling.  All timings chain K iterations inside
one jit with EVERY output element [0] folded into the carry so nothing
dead-code-eliminates.

Run alone on the chip: python scripts/profile_sort_shapes.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pointcloudhookup_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    rng = np.random.default_rng(0)
    N = 4 * 1024 * 1024
    keys_np = rng.integers(0, 2**32, N, dtype=np.uint32)
    pay_np = rng.integers(0, 2**31, N, dtype=np.int32)
    keys = jnp.asarray(keys_np)
    p1 = jnp.asarray(pay_np)
    p2 = jnp.asarray(pay_np[::-1].copy())
    print("device:", jax.devices()[0], flush=True)

    def timeit(name, fn, *args):
        @jax.jit
        def chained(*a):
            acc = jnp.uint32(0)
            k, x, y = a
            for _ in range(K):
                out = fn(k ^ acc, x, y)
                acc = out[0].ravel()[0] ^ out[1].ravel()[0].astype(
                    jnp.uint32
                ) ^ out[2].ravel()[0].astype(jnp.uint32)
                acc = acc & jnp.uint32(1)
            return acc
        for _ in range(2):
            np.asarray(chained(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(2):
                out = chained(*args)
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / 2 / K)
        print(f"{name:<28} {best*1e3:8.3f} ms", flush=True)
        return best

    def flat(k, x, y):
        return lax.sort((k, x, y), num_keys=1)

    def batched(rows):
        def f(k, x, y):
            return lax.sort(
                (k.reshape(rows, -1), x.reshape(rows, -1),
                 y.reshape(rows, -1)),
                dimension=1, num_keys=1,
            )
        return f

    timeit("flat 4M", flat, keys, p1, p2)
    for rows in (16, 128, 512, 2048):
        timeit(f"[{rows}, {N//rows}]", batched(rows), keys, p1, p2)
    for n in (1024 * 1024, 2 * 1024 * 1024):
        timeit(f"flat {n//(1024*1024)}M", flat, keys[:n], p1[:n], p2[:n])
    # keys-only comparisons
    def flat_k(k, x, y):
        s = lax.sort((k,), num_keys=1)
        return s[0], x, y

    timeit("flat 4M keys-only", flat_k, keys, p1, p2)


if __name__ == "__main__":
    main()


def main2():
    """2-key (hi, lo) variants — the full-mode frontend sort."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pointcloudhookup_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    rng = np.random.default_rng(0)
    N = 4 * 1024 * 1024
    hi = jnp.asarray(rng.integers(0, 2**30, N, dtype=np.int32))
    lo = jnp.asarray(rng.integers(0, 2**30, N, dtype=np.int32))
    print("device:", jax.devices()[0], flush=True)

    def timeit(name, fn):
        @jax.jit
        def chained(a, b):
            acc = jnp.int32(0)
            for _ in range(K):
                out = fn(a ^ acc, b)
                acc = (out[0].ravel()[0] ^ out[1].ravel()[0]) & jnp.int32(1)
            return acc
        for _ in range(2):
            np.asarray(chained(hi, lo))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(2):
                out = chained(hi, lo)
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / 2 / K)
        print(f"{name:<28} {best*1e3:8.3f} ms", flush=True)

    timeit("flat 4M 2-key", lambda a, b: lax.sort((a, b), num_keys=2))
    for rows in (128, 512, 2048):
        timeit(
            f"[{rows}, {N//rows}] 2-key",
            lambda a, b, r=rows: lax.sort(
                (a.reshape(r, -1), b.reshape(r, -1)), dimension=1, num_keys=2
            ),
        )


if __name__ == "__main__" and os.environ.get("PCH_SORT2"):
    main2()
