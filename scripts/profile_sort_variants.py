"""Measure lax.sort variants at 4M on the real chip: operand count/width
is the knob (sort traffic scales with bytes moved).  Times K chained
iterations inside one jit so the tunnel dispatch floor cancels.

Run: python scripts/profile_sort_variants.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

N = 1 << 22
K = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pointcloudhookup_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    rng = np.random.default_rng(0)
    hi = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.uint32))
    lo = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.uint32))
    b16 = jnp.asarray(rng.integers(0, 1 << 15, N, dtype=np.uint16))
    f32 = jnp.asarray(rng.random(N, dtype=np.float32))

    def timed(name, fn, *args):
        g = jax.jit(fn)
        out = g(*args)
        _ = np.asarray(out[0][0:1])  # true sync (block_until_ready lies
        # through the async tunnel; a tiny device->host fetch does not)
        t0 = time.perf_counter()
        out = g(*args)
        _ = np.asarray(out[0][0:1])
        dt = (time.perf_counter() - t0) / K * 1e3
        print(f"{name:34s} {dt:7.2f} ms/sort")

    def loop(body):
        def fn(*args):
            def step(c, _):
                out = body(*c)
                # fold a value back so iterations chain (no DCE)
                bump = (out[0] + 1,) + tuple(c[1:])
                return bump, None
            c, _ = lax.scan(step, args, None, length=K)
            return c
        return fn

    timed("2x u32 keys", loop(lambda a, b: lax.sort((a, b), num_keys=2)), hi, lo)
    timed("1x u32 key only", loop(lambda a: lax.sort((a,), num_keys=1)), hi)
    timed("u32 + u16 keys", loop(lambda a, b: lax.sort((a, b), num_keys=2)), hi, b16)
    timed("u32 key + u16 payload", loop(lambda a, b: lax.sort((a, b), num_keys=1)), hi, b16)
    timed("u32 key + u32 payload", loop(lambda a, b: lax.sort((a, b), num_keys=1)), hi, lo)
    timed("2x u32 + f32 payload", loop(lambda a, b, c: lax.sort((a, b, c), num_keys=2)), hi, lo, f32)
    timed("f32 single key", loop(lambda a: lax.sort((a,), num_keys=1)), f32)


if __name__ == "__main__":
    main()
