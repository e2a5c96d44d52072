"""sort_mode='hier' (single-key cell sort + offset window sorts) must
reproduce sort_mode='full' exactly whenever cell runs fit the window
guarantee (run <= hier_window/2 + 1), and still extract the same towers
on a bench-like corridor regardless."""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy on a cold 1-core host; quick tier = pytest -m 'not heavy'

from pointcloudhookup_tpu.config import ClusterParams, ExtractParams
from pointcloudhookup_tpu.ops.frontend_fused import (
    fused_downsample_ground_cluster,
    fused_extract_step,
    hier_sort_eligible,
)


def _corridor(n=120_000, seed=3):
    from pointcloudhookup_tpu.io.synthetic import synthetic_corridor

    rng = np.random.default_rng(seed)
    pts, centers = synthetic_corridor(
        rng,
        n_ground=int(n * 0.8),
        n_veg=int(n * 0.1),
        towers=((-120.0, 0.0), (0.0, 40.0), (140.0, -30.0)),
        pts_per_tower=(n - int(n * 0.9)) // 3,
        extent=400.0,
    )
    pts = pts - pts.mean(axis=0)
    xyz = pts.astype(np.float32)
    mask = np.ones(len(xyz), bool)
    # drop a tail so n is NOT a multiple of the window (pad path)
    return xyz[:-37], mask[:-37], centers


def test_hier_matches_full_exactly():
    import jax.numpy as jnp

    xyz, mask, _ = _corridor()
    span = xyz.max(axis=0) - xyz.min(axis=0)
    assert hier_sort_eligible(span)
    params = ExtractParams(cluster=ClusterParams())
    kw = dict(
        max_cells=8192, min_cell_points=2, geometric_voxels=True,
        emit="codes",
    )
    full = fused_downsample_ground_cluster(
        jnp.asarray(xyz), jnp.asarray(mask), params, **kw
    )
    hier = fused_downsample_ground_cluster(
        jnp.asarray(xyz), jnp.asarray(mask), params, sort_mode="hier",
        hier_window=512, **kw
    )
    # verify the guarantee precondition actually holds for this cloud
    v = np.floor((xyz - xyz.min(axis=0)) / 0.1).astype(np.int64)
    c = v >> 5
    _, counts = np.unique(
        (c[:, 0] << 42) | (c[:, 1] << 21) | c[:, 2], return_counts=True
    )
    assert counts.max() <= 257
    names = ("hi", "lo", "keep", "labels", "base", "mn")
    for name, a, b in zip(names, full, hier):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"mismatch in {name}"
        )


def test_hier_extract_step_towers():
    import jax.numpy as jnp

    xyz, mask, centers = _corridor()
    params = ExtractParams(cluster=ClusterParams())
    stats = fused_extract_step(
        jnp.asarray(xyz), jnp.asarray(mask), params,
        geometric_voxels=True, sort_mode="hier",
    )
    accepted = np.asarray(stats["accepted"])
    cent = np.asarray(stats["center"])[accepted.astype(bool)]
    assert accepted.sum() == len(centers)
    got = cent[np.argsort(cent[:, 0]), :2]
    want = np.asarray(centers)
    want = want[np.argsort(want[:, 0]), :2]
    assert np.abs(got - want).max() < 3.0


def test_hier_requires_geometric():
    import jax.numpy as jnp

    xyz = jnp.zeros((64, 3), jnp.float32)
    mask = jnp.ones(64, bool)
    with pytest.raises(ValueError, match="hier"):
        fused_downsample_ground_cluster(
            xyz, mask, ExtractParams(), sort_mode="hier",
            geometric_voxels=False,
        )


def test_hier_eligibility_bounds():
    assert hier_sort_eligible((400.0, 400.0, 120.0))
    assert hier_sort_eligible((6000.0, 6000.0, 2000.0))
    # > 2^20 voxels per axis (104 km) can't even Morton-encode
    assert not hier_sort_eligible((200_000.0, 100.0, 10.0))
