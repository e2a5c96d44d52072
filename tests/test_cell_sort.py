"""sort_mode='cell' (single-key cell sort + windowed duplicate
suppression, no order restoration) must reproduce sort_mode='full'
results whenever cell runs fit the dup-window guarantee (run <= 65):
cell grouping is exact and dedup flags are exact, so per-cluster
counts/extents match bit-for-bit and centroids to f32 summation order.
Row ORDER within cells is unspecified, so comparisons are aggregate,
not positional."""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy on a cold 1-core host; quick tier = pytest -m 'not heavy'

from pointcloudhookup_tpu.config import ClusterParams, ExtractParams
from pointcloudhookup_tpu.ops.frontend_fused import (
    fused_downsample_ground_cluster,
    fused_extract_step,
    hier_sort_eligible,
)


def _corridor(n, extent, seed=3, towers=((-120.0, 0.0), (0.0, 40.0), (140.0, -30.0))):
    from pointcloudhookup_tpu.io.synthetic import synthetic_corridor

    rng = np.random.default_rng(seed)
    pts, centers = synthetic_corridor(
        rng,
        n_ground=int(n * 0.8),
        n_veg=int(n * 0.1),
        towers=towers,
        pts_per_tower=(n - int(n * 0.9)) // len(towers),
        extent=extent,
    )
    pts = pts - pts.mean(axis=0)
    xyz = pts.astype(np.float32)
    mask = np.ones(len(xyz), bool)
    return xyz[:-37], mask[:-37], centers


def _max_cell_run(xyz):
    v = np.floor((xyz - xyz.min(axis=0)) / 0.1).astype(np.int64)
    c = v >> 5
    _, counts = np.unique(
        (c[:, 0] << 42) | (c[:, 1] << 21) | c[:, 2], return_counts=True
    )
    return counts.max()


def test_cell_matches_full_under_guarantee():
    import jax.numpy as jnp

    # sparse corridor: every raw cell run fits the D=64 dup window
    xyz, mask, _ = _corridor(n=40_000, extent=1000.0)
    assert _max_cell_run(xyz) <= 65
    assert hier_sort_eligible(xyz.max(axis=0) - xyz.min(axis=0))
    params = ExtractParams(cluster=ClusterParams())
    outs = {}
    for mode in ("full", "cell"):
        outs[mode] = fused_extract_step(
            jnp.asarray(xyz), jnp.asarray(mask), params,
            geometric_voxels=True, sort_mode=mode,
        )
    f, c = outs["full"], outs["cell"]
    np.testing.assert_array_equal(np.asarray(f["accepted"]), np.asarray(c["accepted"]))
    np.testing.assert_array_equal(np.asarray(f["count"]), np.asarray(c["count"]))
    # min/max-derived stats are multiset-invariant -> exact
    for key in ("extent", "aabb_min", "aabb_max", "angle"):
        np.testing.assert_array_equal(
            np.asarray(f[key]), np.asarray(c[key]), err_msg=f"mismatch in {key}"
        )
    # centroids accumulate in row order -> f32-tolerance only
    np.testing.assert_allclose(
        np.asarray(f["center"]), np.asarray(c["center"]), atol=1e-3
    )
    # kept-voxel multiset is identical
    assert int(np.asarray(f["ground_keep"]).sum()) == int(
        np.asarray(c["ground_keep"]).sum()
    )


def test_cell_extract_step_towers_dense():
    """On a DENSE corridor (runs beyond the guarantee) cell mode may
    overcount duplicate voxels but must still find the same towers."""
    import jax.numpy as jnp

    xyz, mask, centers = _corridor(n=120_000, extent=400.0)
    params = ExtractParams(cluster=ClusterParams())
    stats = fused_extract_step(
        jnp.asarray(xyz), jnp.asarray(mask), params,
        geometric_voxels=True, sort_mode="cell",
    )
    accepted = np.asarray(stats["accepted"])
    cent = np.asarray(stats["center"])[accepted.astype(bool)]
    assert accepted.sum() == len(centers)
    got = cent[np.argsort(cent[:, 0]), :2]
    want = np.asarray(centers)
    want = want[np.argsort(want[:, 0]), :2]
    assert np.abs(got - want).max() < 3.0
    assert float(np.asarray(stats["hier_runs_over"])) >= 0.0


def test_cell_requires_geometric():
    import jax.numpy as jnp

    xyz = jnp.zeros((64, 3), jnp.float32)
    mask = jnp.ones(64, bool)
    with pytest.raises(ValueError, match="cell"):
        fused_downsample_ground_cluster(
            xyz, mask, ExtractParams(), sort_mode="cell",
            geometric_voxels=False,
        )


def _max_subbucket_run(xyz, g, cs=5):
    """Longest run of equal (cell, top-g-of-within-cell-code) — the
    packed-key dedup guarantee unit."""
    from pointcloudhookup_tpu.ops.morton import morton_encode

    import jax.numpy as jnp

    v = np.floor((xyz - xyz.min(axis=0)) / 0.1).astype(np.int64)
    hi, lo = morton_encode(
        jnp.asarray(v[:, 0]), jnp.asarray(v[:, 1]), jnp.asarray(v[:, 2])
    )
    code = (np.asarray(hi).astype(np.int64) << 30) | np.asarray(lo).astype(np.int64)
    sub = code >> (3 * cs - g)
    _, counts = np.unique(sub, return_counts=True)
    return counts.max()


def test_cell_packed_plan_matches_full():
    """The tight packed key (cell_sort_plan) must reproduce 'full'
    aggregates whenever sub-bucket runs fit the depth-16 window."""
    import jax.numpy as jnp

    from pointcloudhookup_tpu.ops.frontend_fused import cell_sort_plan

    xyz, mask, _ = _corridor(n=40_000, extent=1000.0)
    span = xyz.max(axis=0) - xyz.min(axis=0)
    plan = cell_sort_plan(span, eps=8.0)
    assert plan is not None
    bx, by, bz, g, depth = plan
    assert g >= 2
    if depth:
        assert _max_subbucket_run(xyz, g) <= depth + 1
    params = ExtractParams(cluster=ClusterParams())
    f = fused_extract_step(
        jnp.asarray(xyz), jnp.asarray(mask), params,
        geometric_voxels=True, sort_mode="full",
    )
    c = fused_extract_step(
        jnp.asarray(xyz), jnp.asarray(mask), params,
        geometric_voxels=True, sort_mode="cell", cell_plan=plan,
    )
    np.testing.assert_array_equal(np.asarray(f["accepted"]), np.asarray(c["accepted"]))
    np.testing.assert_array_equal(np.asarray(f["count"]), np.asarray(c["count"]))
    for key in ("extent", "aabb_min", "aabb_max", "angle"):
        np.testing.assert_array_equal(
            np.asarray(f[key]), np.asarray(c[key]), err_msg=f"mismatch in {key}"
        )
    np.testing.assert_allclose(
        np.asarray(f["center"]), np.asarray(c["center"]), atol=1e-3
    )
    assert int(np.asarray(f["ground_keep"]).sum()) == int(
        np.asarray(c["ground_keep"]).sum()
    )


def test_cell_packed_plan_tiny_tile_exact_depth0():
    """A tile small enough that the whole voxel key fits the packed u32
    gets depth 0 (exact adjacent dedup, no window at all)."""
    import jax.numpy as jnp

    from pointcloudhookup_tpu.ops.frontend_fused import cell_sort_plan

    xyz, mask, _ = _corridor(n=30_000, extent=60.0)
    span = xyz.max(axis=0) - xyz.min(axis=0)
    plan = cell_sort_plan(span, eps=8.0)
    assert plan is not None and plan[4] == 0, plan
    params = ExtractParams(cluster=ClusterParams())
    f = fused_extract_step(
        jnp.asarray(xyz), jnp.asarray(mask), params,
        geometric_voxels=True, sort_mode="full",
    )
    c = fused_extract_step(
        jnp.asarray(xyz), jnp.asarray(mask), params,
        geometric_voxels=True, sort_mode="cell", cell_plan=plan,
    )
    np.testing.assert_array_equal(np.asarray(f["accepted"]), np.asarray(c["accepted"]))
    np.testing.assert_array_equal(np.asarray(f["count"]), np.asarray(c["count"]))
    assert int(np.asarray(f["ground_keep"]).sum()) == int(
        np.asarray(c["ground_keep"]).sum()
    )
