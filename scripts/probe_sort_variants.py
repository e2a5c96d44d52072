"""Measure lax.sort cost structure at the post-compaction size (1M)
and anchor the radix-sort floor estimate with the compaction kernel's
measured routing cost.

What this answers (round-5 sort decision):
  * how lax.sort cost scales with key count / payload count / dtype
    at 1M and 4M rows;
  * what one butterfly concentration (the conflict-free routing
    primitive a radix bit-split would be built from) costs at 1M for
    2 and 6 channels — a 1-bit stable split is ~2 concentrations, so
    a b-bit LSD radix floors at ~2*b*conc(ch).

Run: python -u scripts/probe_sort_variants.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 64


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pointcloudhookup_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    rng = np.random.default_rng(0)

    def timeit(name, fn, *args):
        f = jax.jit(fn)

        def fence(out):
            leaf = jax.tree.leaves(out)[0]
            np.asarray(leaf.ravel()[0:1])

        fence(f(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = f(*args)
            fence(out)
            best = min(best, (time.perf_counter() - t0) / ITERS)
        print(f"{name:<46} {best*1e3:8.2f} ms", flush=True)
        return best

    for n in (1 << 20, 4 << 20):
        print(f"---- N = {n}", flush=True)
        k32 = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
        k32b = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
        k16 = jnp.asarray(rng.integers(0, 2**16, n, dtype=np.uint16))
        p = [jnp.asarray(rng.integers(-2**31, 2**31, n, dtype=np.int32))
             for _ in range(5)]

        timeit("sort u32 key alone",
               lambda a: lax.sort((a,), num_keys=1), k32)
        timeit("sort u32 + 1 payload",
               lambda a, b: lax.sort((a, b), num_keys=1), k32, p[0])
        timeit("sort u32 + 2 payloads",
               lambda a, b, c: lax.sort((a, b, c), num_keys=1),
               k32, p[0], p[1])
        timeit("sort u32 + 4 payloads",
               lambda a, *r: lax.sort((a,) + r, num_keys=1), k32, *p[:4])
        timeit("sort 2x u32 keys",
               lambda a, b: lax.sort((a, b), num_keys=2), k32, k32b)
        timeit("sort 2x u32 keys + 4 payloads",
               lambda a, b, *r: lax.sort((a, b) + r, num_keys=2),
               k32, k32b, *p[:4])
        timeit("sort u16 key alone",
               lambda a: lax.sort((a,), num_keys=1), k16)
        timeit("sort u16 + 2 payloads",
               lambda a, b, c: lax.sort((a, b, c), num_keys=1),
               k16, p[0], p[1])

        if jax.default_backend() == "tpu":
            from pointcloudhookup_tpu.ops.pallas.compactrows import (
                compact_rows_multi,
            )

            keep = jnp.asarray(rng.random(n) < 0.5)
            timeit(
                "compact_rows_multi 2ch (50% kept, mixed)",
                lambda kp, a, b: compact_rows_multi(kp, (a, b), n),
                keep, p[0].astype(jnp.int32), p[1],
            )
            timeit(
                "compact_rows_multi 6ch (50% kept, mixed)",
                lambda kp, *ch: compact_rows_multi(kp, ch, n),
                keep, k32.astype(jnp.int32), *p[:5],
            )


if __name__ == "__main__":
    main()
