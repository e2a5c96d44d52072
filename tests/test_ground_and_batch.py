import jax
import jax.numpy as jnp
import numpy as np

from pointcloudhookup_tpu.core.batch import PointBatch
from pointcloudhookup_tpu.ops.ground import (
    ground_filter,
    percentile_cut,
    ransac_plane,
    remove_ground_ransac,
    remove_ground_tiled_ransac,
)


def _plane_cloud(rng, n=1500, normal=(0.1, -0.05, 1.0), noise=0.05):
    normal = np.asarray(normal) / np.linalg.norm(normal)
    xy = rng.uniform(-50, 50, size=(n, 2))
    # plane z = -(ax+by)/c (through origin)
    z = -(normal[0] * xy[:, 0] + normal[1] * xy[:, 1]) / normal[2]
    pts = np.column_stack([xy, z + rng.normal(0, noise, n)])
    return pts.astype(np.float32), normal


def test_ransac_plane_recovers_normal(rng):
    pts, normal = _plane_cloud(rng)
    outliers = rng.uniform(-50, 50, size=(200, 3)).astype(np.float32)
    outliers[:, 2] += 30.0
    xyz = np.vstack([pts, outliers])
    mask = np.ones(len(xyz), bool)
    n_hat, d, inl = ransac_plane(
        jnp.asarray(xyz), jnp.asarray(mask), jax.random.key(0), dist_thresh=0.2
    )
    n_hat = np.asarray(n_hat)
    assert abs(np.dot(n_hat, normal)) > 0.999
    inl = np.asarray(inl)
    assert inl[: len(pts)].mean() > 0.95
    assert inl[len(pts):].mean() < 0.05


def test_remove_ground_ransac_keeps_above(rng):
    pts, _ = _plane_cloud(rng, normal=(0, 0, 1.0))
    tower = rng.uniform(-2, 2, size=(100, 3)).astype(np.float32)
    tower[:, 2] = rng.uniform(5, 30, 100)
    xyz = np.vstack([pts, tower])
    mask = np.ones(len(xyz), bool)
    keep, (n_hat, d) = remove_ground_ransac(
        jnp.asarray(xyz), jnp.asarray(mask), jax.random.key(1), dist_thresh=0.5
    )
    keep = np.asarray(keep)
    assert keep[len(pts):].mean() > 0.95  # tower kept
    assert keep[: len(pts)].mean() < 0.05  # ground removed


def test_tiled_ransac_handles_slope(rng):
    # undulating terrain: z = 0.2x; single plane fits it too, but the
    # tiled variant must also keep a tower standing on the slope
    xy = rng.uniform(-100, 100, size=(3000, 2))
    z = 0.2 * xy[:, 0] + rng.normal(0, 0.1, 3000)
    ground = np.column_stack([xy, z]).astype(np.float32)
    tower = np.column_stack(
        [
            rng.uniform(-3, 3, 150) + 50.0,
            rng.uniform(-3, 3, 150),
            0.2 * 50.0 + rng.uniform(3, 30, 150),
        ]
    ).astype(np.float32)
    xyz = np.vstack([ground, tower])
    mask = np.ones(len(xyz), bool)
    keep = remove_ground_tiled_ransac(
        jnp.asarray(xyz), jnp.asarray(mask), jax.random.key(2), dist_thresh=0.5, grid=4
    )
    keep = np.asarray(keep)
    assert keep[len(ground):].mean() > 0.9
    assert keep[: len(ground)].mean() < 0.1


def test_percentile_cut(rng):
    z = np.concatenate([rng.uniform(0, 1, 900), rng.uniform(10, 20, 100)])
    xyz = np.column_stack([rng.uniform(0, 1, (1000, 2)), z]).astype(np.float32)
    mask = np.ones(1000, bool)
    keep = np.asarray(percentile_cut(jnp.asarray(xyz), jnp.asarray(mask), 10.0, 4.0))
    assert keep[900:].all()
    assert not keep[:900].any()


def test_point_batch_roundtrip(rng):
    pts = rng.uniform(4.5e5, 4.6e5, size=(100, 3))
    b = PointBatch.from_numpy(pts, capacity=256)
    assert b.capacity == 256
    assert int(b.count()) == 100
    back = b.to_numpy()
    np.testing.assert_allclose(back, pts, atol=0.05)  # f32 centered precision
    # world-scale precision: relative error must be tiny
    np.testing.assert_allclose(back / pts, 1.0, atol=1e-7)
