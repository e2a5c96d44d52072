"""BASELINE config 4: GIM<->cloud registration — batched ICP over a
50-tower corridor batch.  Prints one JSON line with ICP iterations/sec
per tower."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pointcloudhookup_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()

    from pointcloudhookup_tpu.ops.registration import batched_icp

    rng = np.random.default_rng(0)
    b, n, iters = 50, 2048, 20
    t_param = rng.uniform(0, 1, (b, n))
    half = 6.0 * (1 - 0.7 * t_param)
    src = np.stack(
        [
            rng.uniform(-1, 1, (b, n)) * half,
            rng.uniform(-1, 1, (b, n)) * half,
            t_param * 35.0,
        ],
        axis=-1,
    ).astype(np.float32)
    angles = rng.uniform(-0.15, 0.15, b)
    ts = rng.uniform(-1, 1, (b, 3)).astype(np.float32)
    dst = np.empty_like(src)
    for i in range(b):
        c, s = np.cos(angles[i]), np.sin(angles[i])
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        dst[i] = src[i] @ rot.T + ts[i]
    mask = np.ones((b, n), bool)

    args = (jnp.asarray(src), jnp.asarray(mask), jnp.asarray(dst), jnp.asarray(mask))
    out = batched_icp(*args, iters=iters)
    _ = np.asarray(out["rmse"][0:1])
    # 20 queued reps amortize the ~28 ms tunnel fence round trip
    reps = 20
    t0 = time.perf_counter()
    for _i in range(reps):
        out = batched_icp(*args, iters=iters)
    _ = np.asarray(out["rmse"][0:1])
    dt = (time.perf_counter() - t0) / reps
    rmse = float(np.asarray(out["rmse"]).mean())
    print(json.dumps(dict(
        metric="batched_icp", value=round(b * iters / dt, 1),
        unit="tower-ICP-iters/s", towers=b, points_per_tower=n,
        wall_ms=round(dt * 1e3, 1), mean_rmse=round(rmse, 4),
    )))


if __name__ == "__main__":
    main()
