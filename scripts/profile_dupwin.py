"""Micro-time ops/pallas/dupwin.py first_occurrence_flags at 4M on the
real chip, K-chained so the dispatch floor cancels, at several depths."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax, jax.numpy as jnp, numpy as np
    from pointcloudhookup_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from pointcloudhookup_tpu.ops.pallas.dupwin import first_occurrence_flags
    N = 4 * 1024 * 1024
    K = 8
    rng = np.random.default_rng(0)
    k1 = np.sort(rng.integers(0, 1 << 21, N).astype(np.uint32))
    w = rng.integers(0, 1 << 15, N).astype(np.uint16)
    k1j, wj = jnp.asarray(k1), jnp.asarray(w)
    print("device:", jax.devices()[0], flush=True)
    for depth in (8, 16, 32, 64):
        @jax.jit
        def chained(k1, w):
            acc = jnp.int32(0)
            for _ in range(K):
                f = first_occurrence_flags(k1, w, depth=depth)
                acc = acc + f[0]
                k1 = k1 ^ (acc % 2).astype(jnp.uint32)
            return acc
        for _ in range(2):
            np.asarray(chained(k1j, wj))
        t0 = time.perf_counter()
        for _ in range(4):
            out = chained(k1j, wj)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / 4 / K
        print(f"depth={depth:<3} {dt*1e3:8.3f} ms", flush=True)

if __name__ == "__main__":
    main()
