"""On-chip validation of ops/pallas/compactidx.py: the Mosaic-compiled
kernel must equal the XLA cumsum+searchsorted reference on the bench
tile's REAL dense_start flags and on adversarial patterns."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from pointcloudhookup_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from pointcloudhookup_tpu.ops.pallas.compactidx import (
        _BLOCK,
        compact_indices,
        compact_indices_reference,
    )

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    n = 4 * 1024 * 1024
    cases = {
        "sparse4M": rng.random(n) < 0.001,
        "empty": np.zeros(n, bool),
        "dense-overflow": rng.random(n) < 0.2,
        "boundaries": np.zeros(n, bool),
    }
    b = cases["boundaries"]
    for i in (0, _BLOCK - 1, _BLOCK, n - 1):
        b[i] = True
    for name, flag in cases.items():
        for m in (4096, 128):
            got = np.asarray(compact_indices(jnp.asarray(flag), m))
            exp = np.asarray(
                compact_indices_reference(jnp.asarray(flag), m)
            )
            ok = bool((got == exp).all())
            print(f"{name} m={m}: {'PASS' if ok else 'FAIL'}", flush=True)
            assert ok, (name, m, got[:8], exp[:8])
    print("all compact_indices cases PASS", flush=True)


if __name__ == "__main__":
    main()
