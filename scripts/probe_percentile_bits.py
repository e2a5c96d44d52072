"""Measure bits-per-round variants of the radix-bisection percentile
(ops/percentile.py::_order_statistic_bits) at the exact path's input
size (4M raw z values).

Context: the round-5 4-bit attempt (15 candidate prefixes per round as
one [N, 15] broadcast-compare-reduce) measured WORSE than the 32
one-bit rounds — the wide intermediate defeats fusion.  This probe
tests the narrow middle ground: b bits/round realised as (2^b - 1)
SEPARATE scalar-threshold count reductions over the same [N] read, so
XLA's multi-output fusion can emit one pass with 2^b-1 compare+sum
lanes and no [N, k] intermediate ever exists.

Run: python -u scripts/probe_percentile_bits.py
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

    from pointcloudhookup_tpu.ops.percentile import (
        _f32_ordered_bits,
        masked_percentile,
        masked_percentile_bisect,
    )
    from pointcloudhookup_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    n = 4 << 20
    rng = np.random.default_rng(0)
    z = rng.normal(40.0, 25.0, n).astype(np.float32)
    mask_np = np.ones(n, bool)
    mask_np[rng.integers(0, n, n // 16)] = False
    x = jnp.asarray(z)
    mask = jnp.asarray(mask_np)

    def order_stat_b(ubits, msk, rank, bits: int):
        """(rank+1)-th smallest via radix bisection, `bits` bits/round:
        each round tests the 2^bits - 1 candidate prefixes with separate
        scalar-threshold counts (monotone predicate -> pick the largest
        candidate whose count(<) <= rank)."""
        rank = rank.astype(jnp.int32)
        k = (1 << bits) - 1
        rounds = 32 // bits if 32 % bits == 0 else 32 // bits + 1

        def body(r, ans):
            # bit positions this round (MSB-first); the last round may
            # cover fewer bits — shift width clamps at 0
            top = 32 - r * bits
            width = jnp.maximum(top - bits, 0)  # traced ok: r is traced
            best = ans
            for c in range(1, k + 1):
                trial = ans | (jnp.uint32(c) << width)
                cnt = jnp.sum((msk & (ubits < trial)).astype(jnp.int32))
                best = jnp.where(cnt <= rank, trial, best)
            return best

        # static unroll over rounds so `width` is a Python int (the
        # fori_loop version would make the shift traced; keep it simple)
        ans = jnp.uint32(0)
        pos = 32
        for _ in range(rounds):
            w = max(pos - bits, 0)
            span = pos - w
            kk = (1 << span) - 1
            best = ans
            for c in range(1, kk + 1):
                trial = ans | (jnp.uint32(c) << w)
                cnt = jnp.sum((msk & (ubits < trial)).astype(jnp.int32))
                best = jnp.where(cnt <= rank, trial, best)
            ans = best
            pos = w
            if pos == 0:
                break
        return ans

    def pctl_bits(x, msk, q, bits):
        nn = jnp.sum(msk.astype(jnp.int32))
        h = (nn - 1).astype(jnp.float32) * (jnp.float32(q) / 100.0)
        lo = jnp.clip(jnp.floor(h).astype(jnp.int32), 0, nn - 1)
        u = _f32_ordered_bits(x)
        return order_stat_b(u, msk, lo, bits)

    def timeit(name, fn, *args, static=()):
        f = jax.jit(fn, static_argnums=static)

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

    # correctness pin first (all variants must agree with the sort)
    want = float(masked_percentile(x, mask, 25.0))
    from pointcloudhookup_tpu.ops.percentile import _f32_from_ordered_bits

    for b in (1, 2, 4):
        got_u = pctl_bits(x, mask, 25.0, b)
        got = float(_f32_from_ordered_bits(got_u))
        # v_lo only (no hi interpolation) — compare against the bisect
        ref_full = float(masked_percentile_bisect(x, mask, 25.0))
        print(f"bits={b}: v_lo={got:.6f} (sort pctl={want:.6f}, "
              f"bisect={ref_full:.6f})")

    print(f"---- N = {n} (f32 z, 1/16 masked)", flush=True)
    timeit("bisect 1-bit (current, full interp)",
           lambda a, m: masked_percentile_bisect(a, m, 25.0), x, mask)
    for b in (1, 2, 3, 4):
        timeit(f"order-stat only, {b}-bit rounds",
               lambda a, m, bb=b: pctl_bits(a, m, 25.0, bb), x, mask)
    timeit("sort-based masked_percentile",
           lambda a, m: masked_percentile(a, m, 25.0), x, mask)


if __name__ == "__main__":
    main()
