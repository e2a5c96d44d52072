"""Random subsampling on device.

The reference memory-governor caps processing at <= 2M points via
numpy random choice (/root/reference/test/008.py:226-243) and sizes
chunks by available RAM at ~24 bytes/point
(/root/reference/ui/Sampling.py:88-89).  The device version draws one
random key per point and keeps the `max_points` smallest — a single
sort, deterministic under a PRNG key, no host round-trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=("max_points",))
def random_downsample(xyz, mask, key, max_points: int):
    """Keep a uniform random subset of at most max_points valid points.

    Returns (xyz f32[N,3], mask bool[N]) with the kept points packed at
    the front (random order).  If fewer than max_points are valid, all
    survive.
    """
    n = xyz.shape[0]
    r = jax.random.bits(key, (n,), jnp.uint32)
    # invalid points sort last
    r = jnp.where(mask, r >> 1, jnp.uint32(0xFFFFFFFF))
    _, sx, sy, sz, w = lax.sort(
        (r, xyz[:, 0], xyz[:, 1], xyz[:, 2], mask.astype(jnp.int32)), num_keys=1
    )
    keep = (jnp.arange(n) < max_points) & (w > 0)
    out = jnp.stack([sx, sy, sz], axis=1)
    return jnp.where(keep[:, None], out, 0.0), keep


def recommend_chunk_size(available_gb: float, bytes_per_point: float = 24.0) -> int:
    """Reference heuristic: 500k/1M/2M-point chunks for 4/8/16 GB hosts
    (~24 B/point, /root/reference/ui/Sampling.py:88-89)."""
    if available_gb < 6:
        return 500_000
    if available_gb < 12:
        return 1_000_000
    return 2_000_000
