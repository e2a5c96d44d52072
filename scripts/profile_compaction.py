"""Microbench: stream-compaction options on TPU + sort-size scaling.

Question: can we compact the ~20-25% of rows above a conservative
ground pre-cut BEFORE the Morton sort, shrinking the dominant 2-key
sort and every [N] post-stage by the keep fraction?

Times (K-chained so the dispatch floor cancels):
  a) lax.sort 2-key at N, N/2, N/4      (size scaling of the big sort)
  b) jnp.nonzero(size=C) + gather        (XLA-native compaction)
  c) cumsum + scatter (at[].set, sorted/unique flags)
  d) cumsum + searchsorted(C) + gather
"""

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
    from jax import lax

    from pointcloudhookup_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    rng = np.random.default_rng(0)
    hi = jnp.asarray(rng.integers(0, 2**30, N, dtype=np.int32))
    lo = jnp.asarray(rng.integers(0, 2**30, N, dtype=np.int32))
    keep = jnp.asarray(rng.random(N) < 0.22)

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[:1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf[:1])
            best = min(best, time.perf_counter() - t0)
        print(f"{name:46s} {best/K*1e3:8.2f} ms/op", flush=True)

    # a) sort-size scaling, 2-key
    for nn in (N, N // 2, N // 4):
        a, b = hi[:nn], lo[:nn]

        def srt(a, b, nn=nn):
            for _ in range(K):
                a, b = lax.sort((a, b), num_keys=2)
                a = a ^ 1  # defeat CSE
            return a, b

        timeit(f"sort 2-key N={nn//1024//1024}M", srt, a, b)

    C = N // 4

    # b) nonzero(size=C) + gather
    def nz(hi, lo, keep):
        h, l = hi, lo
        for _ in range(K):
            (idx,) = jnp.nonzero(keep, size=C, fill_value=N - 1)
            h2 = jnp.take(h, idx, indices_are_sorted=True)
            l2 = jnp.take(l, idx, indices_are_sorted=True)
            keep = keep ^ (h2[0] < -1)  # defeat CSE, no-op
        return h2, l2

    timeit(f"nonzero(size={C//1024//1024}M)+2x gather", nz, hi, lo, keep)

    # c) cumsum + scatter
    def sc(hi, lo, keep):
        for i in range(K):
            pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
            tgt = jnp.where(keep, pos, C)
            outh = jnp.zeros(C + 1, hi.dtype)
            outl = jnp.zeros(C + 1, lo.dtype)
            outh = outh.at[tgt].set(hi, mode="drop", unique_indices=False,
                                    indices_are_sorted=True)
            outl = outl.at[tgt].set(lo, mode="drop", unique_indices=False,
                                    indices_are_sorted=True)
            keep = keep ^ (outh[0] < -1)
        return outh, outl

    timeit("cumsum + 2x scatter(sorted)", sc, hi, lo, keep)

    # d) cumsum + searchsorted + gather
    def ss(hi, lo, keep):
        for i in range(K):
            s = jnp.cumsum(keep.astype(jnp.int32))
            idx = jnp.searchsorted(s, jnp.arange(1, C + 1, dtype=jnp.int32),
                                   side="left")
            idx = jnp.minimum(idx, N - 1)
            h2 = jnp.take(hi, idx, indices_are_sorted=True)
            l2 = jnp.take(lo, idx, indices_are_sorted=True)
            keep = keep ^ (h2[0] < -1)
        return h2, l2

    timeit("cumsum + searchsorted(C) + 2x gather", ss, hi, lo, keep)

    # e) the end-state: compact to C then sort 2-key at C
    def both(hi, lo, keep):
        for _ in range(K):
            (idx,) = jnp.nonzero(keep, size=C, fill_value=N - 1)
            h2 = jnp.take(hi, idx, indices_are_sorted=True)
            l2 = jnp.take(lo, idx, indices_are_sorted=True)
            h2, l2 = lax.sort((h2, l2), num_keys=2)
            keep = keep ^ (h2[0] < -1)
        return h2, l2

    timeit("nonzero+gather+sort(C) fused", both, hi, lo, keep)

    print(f"device: {jax.devices()[0]}")


if __name__ == "__main__":
    main()
