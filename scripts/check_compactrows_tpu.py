"""On-chip validation + timing of compact_rows at bench scale."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(float(os.environ.get("PCH_BENCH_MPTS", "4")) * 1024 * 1024)
K = 8


def main():
    import jax
    import jax.numpy as jnp

    from pointcloudhookup_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from pointcloudhookup_tpu.ops.morton import SENTINEL_HI
    from pointcloudhookup_tpu.ops.pallas.compactrows import compact_rows

    rng = np.random.default_rng(0)
    ok_all = True
    for p, cap_div in [(0.22, 4), (0.05, 8), (0.6, 2)]:
        keep = rng.random(N) < p
        hi = rng.integers(0, 2**30, N, dtype=np.int32)
        lo = rng.integers(0, 2**30, N, dtype=np.int32)
        cap = ((N // cap_div) // 16384) * 16384
        out = compact_rows(
            jnp.asarray(keep), jnp.asarray(hi), jnp.asarray(lo), cap
        )
        hi_c, lo_c, cnt = map(np.asarray, out)
        k = int(cnt)
        exp = int(keep.sum())
        ok = k == exp
        if k <= cap:
            ok &= np.array_equal(hi_c[:k], hi[keep])
            ok &= np.array_equal(lo_c[:k], lo[keep])
            ok &= (hi_c[k:] == SENTINEL_HI).all()
        print(f"p={p} cap=N/{cap_div}: count={k} expected={exp} ok={ok}")
        ok_all &= ok

    # timing at the bench keep fraction
    keep = jnp.asarray(rng.random(N) < 0.22)
    hi = jnp.asarray(rng.integers(0, 2**30, N, dtype=np.int32))
    lo = jnp.asarray(rng.integers(0, 2**30, N, dtype=np.int32))
    cap = ((N // 4) // 16384) * 16384

    import functools

    @jax.jit
    def chained(keep, hi, lo):
        for i in range(K):
            h2, l2, c = compact_rows(keep, hi ^ i, lo, cap)
        return h2, l2, c

    out = chained(keep, hi, lo)
    np.asarray(out[0][:1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = chained(keep, hi, lo)
        np.asarray(out[0][:1])
        best = min(best, time.perf_counter() - t0)
    print(f"compact_rows at {N} rows: {best/K*1e3:.2f} ms/op")
    print("ALL OK" if ok_all else "FAILURES")


if __name__ == "__main__":
    main()
