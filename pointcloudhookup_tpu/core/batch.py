"""Fixed-capacity padded point batches.

XLA requires static shapes: every point-cloud buffer on device is padded
to a fixed capacity with an explicit validity mask.  Coordinates are
stored centered (f32 relative to an f64 host-side origin) because LAS
corridor coordinates (~1e5..1e7 m in a projected CRS) do not fit f32 at
centimeter resolution — the reference applies the same centroid shift
before compute (/root/reference/utils/tower_extraction.py:62-64).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def round_up(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PointBatch:
    """A padded batch of 3D points on device.

    xyz:    f32[capacity, 3] — centered coordinates (origin-relative).
    mask:   bool[capacity]   — True for real points.
    origin: f64[3] numpy (static/aux) — world origin the points are
            relative to; kept on host so world coordinates can be
            reconstructed at full precision.
    """

    xyz: jax.Array
    mask: jax.Array
    origin: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float64),
        metadata=dict(static=True),
    )

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def count(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32))

    @staticmethod
    def from_numpy(
        points: np.ndarray,
        capacity: Optional[int] = None,
        origin: Optional[np.ndarray] = None,
        pad_multiple: int = 1024,
    ) -> "PointBatch":
        """Build a PointBatch from world-coordinate points f64[N,3]."""
        points = np.asarray(points, np.float64).reshape(-1, 3)
        n = points.shape[0]
        if origin is None:
            origin = points.mean(axis=0) if n else np.zeros(3, np.float64)
        origin = np.asarray(origin, np.float64)
        if capacity is None:
            capacity = max(round_up(max(n, 1), pad_multiple), pad_multiple)
        if n > capacity:
            raise ValueError(f"{n} points exceed capacity {capacity}")
        xyz = np.zeros((capacity, 3), np.float32)
        xyz[:n] = (points - origin).astype(np.float32)
        mask = np.zeros(capacity, bool)
        mask[:n] = True
        return PointBatch(jnp.asarray(xyz), jnp.asarray(mask), origin)

    def to_numpy(self) -> np.ndarray:
        """World-coordinate points f64[N,3] (valid points only)."""
        xyz = np.asarray(self.xyz)
        mask = np.asarray(self.mask)
        return xyz[mask].astype(np.float64) + self.origin


def pad_points(points: np.ndarray, capacity: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad f32[N,3] -> (f32[capacity,3], bool[capacity])."""
    points = np.asarray(points, np.float32).reshape(-1, 3)
    n = points.shape[0]
    if n > capacity:
        raise ValueError(f"{n} points exceed capacity {capacity}")
    out = np.zeros((capacity, 3), np.float32)
    out[:n] = points
    mask = np.zeros(capacity, bool)
    mask[:n] = True
    return out, mask
