"""Measure the hierarchical-sort composition on the real chip.

Idea: lax.sort cost is driven by the NUMBER OF KEYS, not operand bytes
(payloads are ~free: 2xu32 keys 12.1 ms vs u32 key + u32 payload
9.2 ms at 4M).  The fused frontend needs full 48-bit Morton order, but
the order can be restored hierarchically:

  1. ONE single-key sort by cell code k1 = C >> 15 (u32) with the
     15 within-cell bits w riding as a u16 payload  -> cells grouped.
  2. reshape [N] -> [N/W, W] and lax.sort along the minor axis with
     num_keys=2 (k1, w): sorts every W-row window.  Short rows make
     this cheap (log^2 W vs log^2 N stages).
  3. repeat at offset W/2: any k1-run of length <= W/2+1 is contained
     in some window of one of the two passes, so the array is then
     EXACTLY (k1, w)-sorted wherever cell occupancy <= W/2+1.

Run: python -u scripts/profile_window_sort.py
"""

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
    k1 = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.uint32))
    w = jnp.asarray(rng.integers(0, 1 << 15, N, dtype=np.uint16))

    def timed(name, fn, *args):
        g = jax.jit(fn)
        out = g(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
        t0 = time.perf_counter()
        out = g(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
        dt = (time.perf_counter() - t0) / K * 1e3
        print(f"{name:44s} {dt:7.2f} ms", flush=True)

    def loop(body):
        def fn(*args):
            def step(c, _):
                out = body(*c)
                bump = (out[0] + 1,) + tuple(out[1:])
                return bump, None
            c, _ = lax.scan(step, args, None, length=K)
            return c
        return fn

    def winsort(a, b, wlen):
        a2 = a.reshape(-1, wlen)
        b2 = b.reshape(-1, wlen)
        a2, b2 = lax.sort((a2, b2), dimension=1, num_keys=2)
        return a2.reshape(-1), b2.reshape(-1)

    def winsort_off(a, b, wlen):
        half = wlen // 2
        a2 = a[half:-half].reshape(-1, wlen)
        b2 = b[half:-half].reshape(-1, wlen)
        a2, b2 = lax.sort((a2, b2), dimension=1, num_keys=2)
        a = lax.dynamic_update_slice(a, a2.reshape(-1), (half,))
        b = lax.dynamic_update_slice(b, b2.reshape(-1), (half,))
        return a, b

    timed("base: u32 key + u16 payload", loop(
        lambda a, b: lax.sort((a, b), num_keys=1)), k1, w)

    for wl in (128, 256, 512):
        timed(f"window sort W={wl} (2 keys)", loop(
            lambda a, b, _wl=wl: winsort(a, b, _wl)), k1, w)

    for wl in (128, 256):
        def full(a, b, _wl=wl):
            a, b = lax.sort((a, b), num_keys=1)
            a, b = winsort(a, b, _wl)
            a, b = winsort_off(a, b, _wl)
            return a, b
        timed(f"FULL: 1-key + 2x window W={wl}", loop(full), k1, w)

    timed("ref: 2x u32 keys", loop(
        lambda a, b: lax.sort((a, b), num_keys=2)), k1,
        jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.uint32)))


if __name__ == "__main__":
    main()
