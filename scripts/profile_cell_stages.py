"""Standalone-jit timing of the cell-mode front stages at 4M: isolates
prep+tight-key+3-operand sort, +dupwin, +v_start/ground — to find where
the end-to-end cell run loses time that the sort/dupwin micro-benches
say it shouldn't."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax, numpy as np
    from pointcloudhookup_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from jax import lax
    from bench import build_workload
    from pointcloudhookup_tpu.ops.frontend_fused import cell_sort_plan
    from pointcloudhookup_tpu.ops.morton import (
        SENTINEL_HI, interleave_tight, morton_encode,
    )

    N = 4 * 1024 * 1024
    K = 4
    xyz_np, mask_np, _ = build_workload(N)
    span = xyz_np.max(axis=0) - xyz_np.min(axis=0)
    plan = cell_sort_plan(span, eps=8.0)
    print("device:", jax.devices()[0], "plan:", plan, flush=True)
    bx, by, bz, g, depth = plan
    cs, shift3k = 5, 15
    xyz = jnp.asarray(xyz_np); mask = jnp.asarray(mask_np)

    def prep_sort(xyz, mask, salt):
        big = jnp.float32(3.0e38)
        mn = jnp.min(jnp.where(mask[:, None], xyz, big), axis=0)
        v = jnp.floor((xyz - mn) / 0.1).astype(jnp.int32) + salt
        hi, lo = morton_encode(v[:, 0], v[:, 1], v[:, 2])
        hi = jnp.where(mask, hi, SENTINEL_HI)
        cbits = (max(bx - cs, 0), max(by - cs, 0), max(bz - cs, 0))
        ck = interleave_tight(v[:, 0] >> cs, v[:, 1] >> cs, v[:, 2] >> cs, cbits)
        w15 = (lo & ((1 << shift3k) - 1)).astype(jnp.uint32)
        ksort = (ck << g) | (w15 >> (shift3k - g))
        ksort = jnp.where(mask, ksort, jnp.uint32(0xFFFFFFFF))
        return lax.sort((ksort, hi, lo), num_keys=1)

    def plus_dupwin(xyz, mask, salt):
        ksort, hi, lo = prep_sort(xyz, mask, salt)
        from pointcloudhookup_tpu.ops.frontend_fused import _dup_window_flags
        w_low = jnp.where(hi == SENTINEL_HI, jnp.int32(-1),
                          lo & ((1 << (shift3k - g)) - 1))
        vf = _dup_window_flags(ksort, w_low, depth, N)
        return ksort, hi, lo, vf

    def full2key(xyz, mask, salt):
        big = jnp.float32(3.0e38)
        mn = jnp.min(jnp.where(mask[:, None], xyz, big), axis=0)
        v = jnp.floor((xyz - mn) / 0.1).astype(jnp.int32) + salt
        hi, lo = morton_encode(v[:, 0], v[:, 1], v[:, 2])
        hi = jnp.where(mask, hi, SENTINEL_HI)
        return lax.sort((hi, lo), num_keys=2)

    def timeit(name, fn):
        @jax.jit
        def chained(xyz, mask):
            acc = jnp.int32(0)
            for _ in range(K):
                out = fn(xyz, mask, acc % 2)
                acc = acc + out[0].ravel()[0].astype(jnp.int32) % 2
            return acc
        for _ in range(2): np.asarray(chained(xyz, mask))
        t0 = time.perf_counter()
        for _ in range(4): out = chained(xyz, mask)
        np.asarray(out)
        print(f"{name:<30} {(time.perf_counter()-t0)/4/K*1e3:8.3f} ms", flush=True)

    timeit("full 2-key prep+sort", full2key)
    timeit("cell prep+tightkey+sort", prep_sort)
    timeit("  + dupwin", plus_dupwin)

if __name__ == "__main__":
    main()
