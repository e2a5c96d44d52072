"""Isolate the sort_mode='cell' sort section vs the plain 2-key sort.

profile_post measured the cell path's cut=1 at 16.4 ms against full's
13.2 ms even though the isolated 1-key sort measures ~2.5 ms cheaper
than the 2-key sort.  Decompose: interleave_tight key build, 3-operand
1-key sort, dupwin(depth).
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

    from bench import build_workload
    from pointcloudhookup_tpu.ops.morton import SENTINEL_HI, morton_encode

    xyz_np, mask_np, _ = build_workload(N)
    xyz = jnp.asarray(xyz_np)
    mask = jnp.asarray(mask_np)

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.reshape(-1)[:1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf.reshape(-1)[:1])
            best = min(best, time.perf_counter() - t0)
        print(f"{name:52s} {best/K*1e3:8.2f} ms/op", flush=True)

    big = jnp.float32(3.0e38)
    voxel = 0.1
    cs = 5
    shift3k = 3 * cs

    def keys(xyz, mask):
        mn = jnp.min(jnp.where(mask[:, None], xyz, big), axis=0)
        v = jnp.floor((xyz - mn) / voxel).astype(jnp.int32)
        hi, lo = morton_encode(v[:, 0], v[:, 1], v[:, 2])
        hi = jnp.where(mask, hi, SENTINEL_HI)
        return hi, lo, v

    hi0, lo0, v0 = jax.jit(keys)(xyz, mask)

    # baseline: 2-key sort
    def s2(hi, lo):
        for _ in range(K):
            hi, lo = lax.sort((hi, lo), num_keys=2)
            hi = hi ^ 1
        return hi, lo

    timeit("2-key sort", s2, hi0, lo0)

    # cell plan path pieces
    from pointcloudhookup_tpu.ops.frontend_fused import cell_sort_plan
    from pointcloudhookup_tpu.ops.morton import interleave_tight

    span = xyz_np.max(axis=0) - xyz_np.min(axis=0)
    plan = cell_sort_plan(span, eps=8.0)
    print("plan:", plan)
    bxp, byp, bzp, gbits, depth = plan
    cbits = (max(bxp - cs, 0), max(byp - cs, 0), max(bzp - cs, 0))

    def build_key(v, lo, mask):
        ck = interleave_tight(v[:, 0] >> cs, v[:, 1] >> cs, v[:, 2] >> cs, cbits)
        w15 = (lo & ((1 << shift3k) - 1)).astype(jnp.uint32)
        ksort = (ck << gbits) | (w15 >> (shift3k - gbits))
        ksort = jnp.where(mask, ksort, jnp.uint32(0xFFFFFFFF))
        return ksort

    ks0 = jax.jit(build_key)(v0, lo0, mask)

    def kb(v, lo, mask):
        out = []
        for i in range(K):
            out.append(build_key(v, lo + i, mask))
        return jnp.stack([o[0] for o in out])

    timeit("interleave_tight key build", kb, v0, lo0, mask)

    def s1(ks, hi, lo):
        for _ in range(K):
            ks, hi, lo = lax.sort((ks, hi, lo), num_keys=1)
            ks = ks ^ 1
        return ks, hi, lo

    timeit("1-key sort +2 payloads", s1, ks0, hi0, lo0)

    kss, his, los = jax.jit(lambda a, b, c: lax.sort((a, b, c), num_keys=1))(
        ks0, hi0, lo0
    )

    from pointcloudhookup_tpu.ops.frontend_fused import _dup_window_flags

    w_low = jnp.where(
        his == SENTINEL_HI, jnp.int32(-1), los & ((1 << (shift3k - gbits)) - 1)
    )

    def dw(ks, w):
        outs = []
        for i in range(K):
            outs.append(_dup_window_flags(ks ^ i, w, depth, N))
        return jnp.stack(outs)

    timeit(f"dupwin depth={depth}", dw, kss, w_low)

    # the whole cell sort section chained
    def cellsec(v, lo, hi, mask):
        for i in range(K):
            ks = build_key(v, lo, mask)
            ks, hi2, lo2 = lax.sort((ks, hi, lo), num_keys=1)
            w_low = jnp.where(
                hi2 == SENTINEL_HI,
                jnp.int32(-1),
                lo2 & ((1 << (shift3k - gbits)) - 1),
            )
            vf = _dup_window_flags(ks, w_low, depth, N)
            lo = lo ^ vf[0].astype(jnp.int32)
        return ks, hi2, lo2, vf

    timeit("cell sort section (key+sort+dupwin)", cellsec, v0, lo0, hi0, mask)

    print(f"device: {jax.devices()[0]}")


if __name__ == "__main__":
    main()
