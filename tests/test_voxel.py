import numpy as np
import pytest
import jax.numpy as jnp

from pointcloudhookup_tpu.core import pad_points
from pointcloudhookup_tpu.ops.voxel import voxel_downsample, voxel_downsample_chunked


def numpy_voxel_downsample(points, voxel_size):
    """Independent numpy oracle with Open3D semantics (per-voxel centroid,
    grid anchored at the cloud min bound)."""
    mn = points.min(axis=0)
    keys = np.floor((points - mn) / voxel_size).astype(np.int64)
    # dict-based groupby
    out = {}
    for p, k in zip(points, map(tuple, keys)):
        s, c = out.get(k, (np.zeros(3), 0))
        out[k] = (s + p, c + 1)
    return np.array([s / c for s, c in out.values()])


def _sorted_rows(a):
    return a[np.lexsort(a.T)]


@pytest.mark.heavy
def test_voxel_matches_numpy_oracle(rng):
    pts = rng.uniform(0, 5, size=(2000, 3)).astype(np.float32)
    xyz, mask = pad_points(pts, 2048)
    got_xyz, got_mask = voxel_downsample(jnp.asarray(xyz), jnp.asarray(mask), 0.5)
    got = np.asarray(got_xyz)[np.asarray(got_mask)]
    want = numpy_voxel_downsample(pts.astype(np.float64), 0.5)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        _sorted_rows(got), _sorted_rows(want.astype(np.float32)), atol=1e-4
    )


def test_voxel_single_point_per_voxel_is_identity(rng):
    # Points far apart: each its own voxel -> centroids == points.
    pts = (rng.permutation(64)[:, None] * 10.0 + rng.uniform(0, 1, (64, 3))).astype(
        np.float32
    )
    xyz, mask = pad_points(pts, 128)
    got_xyz, got_mask = voxel_downsample(jnp.asarray(xyz), jnp.asarray(mask), 1.0)
    got = np.asarray(got_xyz)[np.asarray(got_mask)]
    assert got.shape == pts.shape
    np.testing.assert_allclose(_sorted_rows(got), _sorted_rows(pts), atol=1e-5)


def test_voxel_chunked_dedups_per_chunk_only(rng):
    # Same tight cluster of points duplicated in two chunks: global mode
    # yields 1 voxel, chunked mode yields 2 (reference parity behavior).
    cluster = rng.uniform(0, 0.05, size=(16, 3)).astype(np.float32)
    chunk = np.zeros((32, 3), np.float32)
    chunk[:16] = cluster
    xyz = np.vstack([chunk, chunk])
    mask = np.zeros(64, bool)
    mask[:16] = True
    mask[32:48] = True
    g_xyz, g_mask = voxel_downsample(jnp.asarray(xyz), jnp.asarray(mask), 0.1)
    c_xyz, c_mask = voxel_downsample_chunked(
        jnp.asarray(xyz), jnp.asarray(mask), 0.1, chunk_size=32
    )
    assert int(np.asarray(g_mask).sum()) == 1
    assert int(np.asarray(c_mask).sum()) == 2
