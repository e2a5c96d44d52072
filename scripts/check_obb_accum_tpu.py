"""On-chip validation + timing of the sort-free OBB accumulation kernel
against its XLA oracle and the sort-based codes path (see
tests/test_obb_accum.py for the CPU/interpret twin)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from pointcloudhookup_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from pointcloudhookup_tpu.ops.morton import morton_encode
    from pointcloudhookup_tpu.ops.pallas.obb_accum import (
        obb_accumulate,
        obb_accumulate_reference,
    )

    rng = np.random.default_rng(3)
    n, k = 262144, 64
    per = n // (k + 4)
    pts = np.vstack(
        [[60 * c, 25 * (c % 7), 2 * c] + rng.normal(0, 5.0, size=(per, 3))
         for c in range(k)]
        + [rng.uniform(0, 4000, size=(n - per * k, 3))]
    ).astype(np.float32)
    mn = pts.min(axis=0)
    v = np.floor((pts - mn) / 0.1).astype(np.int32)
    hi, lo = morton_encode(
        jnp.asarray(v[:, 0]), jnp.asarray(v[:, 1]), jnp.asarray(v[:, 2])
    )
    labels = np.full(n, -1, np.int32)
    for c in range(k):
        labels[c * per : (c + 1) * per] = c
    labels[rng.random(n) < 0.3] = -1
    order = np.lexsort((np.asarray(lo), np.asarray(hi)))
    hi = jnp.asarray(np.asarray(hi)[order])
    lo = jnp.asarray(np.asarray(lo)[order])
    lab = jnp.asarray(labels[order])
    mnj = jnp.asarray(mn)

    ker = obb_accumulate(hi, lo, lab, mnj, max_clusters=k, num_angles=256)
    ref = obb_accumulate_reference(hi, lo, lab, mnj, max_clusters=k, num_angles=256)
    ok = True
    for key in ref:
        good = np.allclose(np.asarray(ref[key]), np.asarray(ker[key]),
                           rtol=1e-5, atol=1e-4)
        ok &= good
        if not good:
            print(f"MISMATCH {key}")
    print(f"on-chip parity: {ok}", flush=True)
    if not ok:
        sys.exit(1)

    def fence(out):
        return np.asarray(out["cnt"].reshape(-1)[0:1])

    for _ in range(2):
        fence(obb_accumulate(hi, lo, lab, mnj, max_clusters=k, num_angles=256))
    t0 = time.perf_counter()
    for _ in range(8):
        out = obb_accumulate(hi, lo, lab, mnj, max_clusters=k, num_angles=256)
    fence(out)
    dt = (time.perf_counter() - t0) / 8
    print(f"obb_accumulate: {dt*1e3:.2f} ms at n={n} k={k} (incl. dispatch)",
          flush=True)


if __name__ == "__main__":
    main()
