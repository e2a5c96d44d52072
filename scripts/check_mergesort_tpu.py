"""Real-chip validation + timing of ops/pallas/mergesort.py at the
bench shape (4M rows): asserts exact equality with lax.sort on the
bench workload's actual Morton keys, then times both with the chained
harness (all outputs fold into the carry — no DCE)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    from pointcloudhookup_tpu.ops.pallas.mergesort import merge_sort_2key

    xyz_np, mask_np, _ = build_workload(N)
    xyz = jnp.asarray(xyz_np)
    mask = jnp.asarray(mask_np)

    @jax.jit
    def keys(xyz, mask):
        big = jnp.float32(3.0e38)
        mn = jnp.min(jnp.where(mask[:, None], xyz, big), axis=0)
        v = jnp.floor((xyz - mn) / 0.1).astype(jnp.int32)
        hi, lo = morton_encode(v[:, 0], v[:, 1], v[:, 2])
        return jnp.where(mask, hi, SENTINEL_HI), lo

    hi, lo = keys(xyz, mask)
    print("device:", jax.devices()[0], "N =", N, flush=True)

    for blk in (2048, 4096, 8192):
        gh, gl = merge_sort_2key(hi, lo, block=blk)
        eh, el = jax.jit(lambda a, b: lax.sort((a, b), num_keys=2))(hi, lo)
        ok_h = bool(jnp.array_equal(gh, eh))
        ok_l = bool(jnp.array_equal(gl, el))
        print(f"block={blk}: hi equal={ok_h} lo equal={ok_l}", flush=True)
        assert ok_h and ok_l, f"MISMATCH at block={blk}"

    def timeit(name, fn):
        @jax.jit
        def chained(a, b):
            acc = jnp.int32(0)
            for _ in range(K):
                oh, ol = fn(a ^ acc, b ^ acc)
                acc = (oh.ravel()[0] ^ ol.ravel()[-1]) & jnp.int32(1)
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

    timeit("lax.sort 2-key flat", lambda a, b: lax.sort((a, b), num_keys=2))
    for blk in (2048, 4096, 8192):
        timeit(
            f"merge_sort block={blk}",
            lambda a, b, blk=blk: merge_sort_2key(a, b, block=blk),
        )


if __name__ == "__main__":
    main()
