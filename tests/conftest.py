"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding code paths can be exercised without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compilation cache: XLA compiles are slow on this box; cache
# compiled executables across pytest runs.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def synthetic_corridor(
    rng,
    n_ground=20000,
    n_veg=4000,
    towers=((0.0, 0.0), (120.0, 40.0), (-150.0, -60.0)),
    tower_height=35.0,
    tower_width=12.0,
    pts_per_tower=1500,
    extent=400.0,
):
    """Small synthetic power-line corridor: rolling ground + vegetation +
    lattice-like towers.  Returns (points f64[N,3], tower_centers f64[K,3])."""
    ground_xy = rng.uniform(-extent, extent, size=(n_ground, 2))
    ground_z = 0.5 * np.sin(ground_xy[:, 0] / 90.0) + rng.normal(0, 0.15, n_ground)
    ground = np.column_stack([ground_xy, ground_z])

    veg_xy = rng.uniform(-extent, extent, size=(n_veg, 2))
    veg_z = rng.uniform(0.5, 6.0, n_veg)
    veg = np.column_stack([veg_xy, veg_z])

    tower_pts = []
    centers = []
    for cx, cy in towers:
        t = rng.uniform(0, 1, pts_per_tower)
        half = tower_width / 2 * (1.0 - 0.7 * t)  # tapered lattice
        x = cx + rng.uniform(-1, 1, pts_per_tower) * half
        y = cy + rng.uniform(-1, 1, pts_per_tower) * half
        z = t * tower_height
        tower_pts.append(np.column_stack([x, y, z]))
        centers.append([cx, cy, tower_height / 2])
    pts = np.vstack([ground, veg] + tower_pts)
    return pts, np.array(centers)


@pytest.fixture
def corridor(rng):
    return synthetic_corridor(rng)
