import numpy as np
import pytest
import jax.numpy as jnp

from pointcloudhookup_tpu.config import (
    ClusterParams,
    ExtractParams,
    GroundParams,
)
from pointcloudhookup_tpu.core import pad_points
from pointcloudhookup_tpu.ops.frontend_fused import (
    fused_downsample_ground_cluster,
    fused_extract_step,
)
from pointcloudhookup_tpu.ops.morton import morton_decode, morton_encode, shift_code


def test_morton_roundtrip(rng):
    ix = rng.integers(0, 1 << 20, 1000).astype(np.int32)
    iy = rng.integers(0, 1 << 20, 1000).astype(np.int32)
    iz = rng.integers(0, 1 << 20, 1000).astype(np.int32)
    hi, lo = morton_encode(jnp.asarray(ix), jnp.asarray(iy), jnp.asarray(iz))
    ox, oy, oz = morton_decode(hi, lo)
    np.testing.assert_array_equal(np.asarray(ox), ix)
    np.testing.assert_array_equal(np.asarray(oy), iy)
    np.testing.assert_array_equal(np.asarray(oz), iz)
    # all codes non-negative (int32-safe)
    assert (np.asarray(hi) >= 0).all() and (np.asarray(lo) >= 0).all()


def test_morton_order_matches_numeric(rng):
    # lexicographic (hi, lo) == numeric 60-bit Morton order
    ix = rng.integers(0, 1 << 20, 500)
    iy = rng.integers(0, 1 << 20, 500)
    iz = rng.integers(0, 1 << 20, 500)
    hi, lo = morton_encode(jnp.asarray(ix), jnp.asarray(iy), jnp.asarray(iz))
    hi, lo = np.asarray(hi).astype(np.int64), np.asarray(lo).astype(np.int64)
    full = (hi << 30) | lo
    order_pairs = np.lexsort((lo, hi))
    order_full = np.argsort(full, kind="stable")
    np.testing.assert_array_equal(order_pairs, order_full)


def test_morton_shift_is_prefix(rng):
    # cell code of (v >> k per axis) == full code >> 3k
    k = 5
    ix = rng.integers(0, 1 << 20, 500).astype(np.int32)
    iy = rng.integers(0, 1 << 20, 500).astype(np.int32)
    iz = rng.integers(0, 1 << 20, 500).astype(np.int32)
    hi, lo = morton_encode(jnp.asarray(ix), jnp.asarray(iy), jnp.asarray(iz))
    s_hi, s_lo = shift_code(hi, lo, 3 * k)
    c_hi, c_lo = morton_encode(
        jnp.asarray(ix >> k), jnp.asarray(iy >> k), jnp.asarray(iz >> k)
    )
    np.testing.assert_array_equal(np.asarray(s_hi), np.asarray(c_hi))
    np.testing.assert_array_equal(np.asarray(s_lo), np.asarray(c_lo))


def _params():
    return ExtractParams(
        ground=GroundParams(min_points_after=100),
        cluster=ClusterParams(eps=5.0, min_points=30),
        max_clusters=32,
        obb_angles=64,
    )


def test_fused_frontend_matches_modular(corridor):
    pts, centers = corridor
    origin = pts.mean(axis=0)
    xyz, mask = pad_points((pts - origin).astype(np.float32), 8192)
    out = fused_extract_step(
        jnp.asarray(xyz), jnp.asarray(mask), _params(),
        max_cells=2048, min_cell_points=1,
    )
    accepted = np.asarray(out["accepted"])
    assert accepted.sum() == len(centers)
    got = np.asarray(out["center"])[accepted] + origin
    want = np.array(sorted(centers[:, :2].tolist()))
    np.testing.assert_allclose(
        np.array(sorted(got[:, :2].tolist())), want, atol=2.5
    )
    # heights/widths in tower range
    ext = np.asarray(out["extent"])[accepted]
    assert (ext[:, 2] > 15).all() and ((ext[:, 0] > 8) & (ext[:, 0] < 50)).all()


@pytest.mark.heavy
def test_fused_codes_path_matches_xyz_path(corridor):
    """emit='codes' + cluster_obb_stats_codes must reproduce the
    geometric xyz path EXACTLY: both use voxel centers, the codes path
    just decodes them after the label sort instead of before."""
    from pointcloudhookup_tpu.ops.obb import cluster_obb_stats, cluster_obb_stats_codes

    pts, centers = corridor
    origin = pts.mean(axis=0)
    xyz, mask = pad_points((pts - origin).astype(np.float32), 8192)
    params = _params()
    ds_xyz, keep, labels, base = fused_downsample_ground_cluster(
        jnp.asarray(xyz), jnp.asarray(mask), params,
        max_cells=2048, min_cell_points=1, geometric_voxels=True,
    )
    hi, lo, keep2, labels2, base2, mn = fused_downsample_ground_cluster(
        jnp.asarray(xyz), jnp.asarray(mask), params,
        max_cells=2048, min_cell_points=1, geometric_voxels=True, emit="codes",
    )
    np.testing.assert_array_equal(np.asarray(keep), np.asarray(keep2))
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(labels2))
    assert float(base) == float(base2)

    s_xyz = cluster_obb_stats(
        ds_xyz, labels, keep, max_clusters=params.max_clusters,
        num_angles=params.obb_angles,
    )
    s_code = cluster_obb_stats_codes(
        hi, lo, labels2, keep2, mn, max_clusters=params.max_clusters,
        num_angles=params.obb_angles,
    )
    for key in ("count", "alive"):
        np.testing.assert_array_equal(np.asarray(s_xyz[key]), np.asarray(s_code[key]))
    for key in ("centroid", "center", "extent", "angle", "north_angle"):
        np.testing.assert_allclose(
            np.asarray(s_xyz[key]), np.asarray(s_code[key]), atol=1e-4,
            err_msg=key,
        )


def test_fused_ground_base_matches_percentile(corridor):
    pts, _ = corridor
    origin = pts.mean(axis=0)
    xyz, mask = pad_points((pts - origin).astype(np.float32), 8192)
    ds_xyz, keep, labels, base = fused_downsample_ground_cluster(
        jnp.asarray(xyz), jnp.asarray(mask), _params(),
        max_cells=2048, min_cell_points=1,
    )
    # base is the P25 of the voxel-downsampled z (within voxel size)
    z = pts[:, 2] - origin[2]
    assert abs(float(base) - np.percentile(z, 25)) < 0.3
    # labels only on kept voxel rows
    lab = np.asarray(labels)
    assert (lab[~np.asarray(keep)] == -1).all()

def test_fused_geometric_voxels_mode(corridor):
    import jax.numpy as jnp

    pts, centers = corridor
    origin = pts.mean(axis=0)
    xyz, mask = pad_points((pts - origin).astype(np.float32), 8192)
    out = fused_extract_step(
        jnp.asarray(xyz), jnp.asarray(mask), _params(),
        max_cells=2048, min_cell_points=1, geometric_voxels=True,
    )
    accepted = np.asarray(out["accepted"])
    assert accepted.sum() == len(centers)
    got = np.asarray(out["center"])[accepted] + origin
    want = np.array(sorted(centers[:, :2].tolist()))
    # geometric voxel centers quantize positions by <= voxel/2
    np.testing.assert_allclose(
        np.array(sorted(got[:, :2].tolist())), want, atol=2.5
    )


def test_codes_obb_points_cap_compaction_exact(corridor):
    """points_cap compaction must be a pure optimization: with a cap
    that covers every labeled row, stats are IDENTICAL to the
    uncompacted path and overflow stays 0."""
    from pointcloudhookup_tpu.ops.obb import cluster_obb_stats_codes

    pts, centers = corridor
    origin = pts.mean(axis=0)
    xyz, mask = pad_points((pts - origin).astype(np.float32), 8192)
    params = _params()
    hi, lo, keep, labels, base, mn = fused_downsample_ground_cluster(
        jnp.asarray(xyz), jnp.asarray(mask), params,
        max_cells=2048, min_cell_points=1, geometric_voxels=True, emit="codes",
    )
    full = cluster_obb_stats_codes(
        hi, lo, labels, keep, mn, max_clusters=params.max_clusters,
        num_angles=params.obb_angles,
    )
    capped = cluster_obb_stats_codes(
        hi, lo, labels, keep, mn, max_clusters=params.max_clusters,
        num_angles=params.obb_angles, points_cap=2048,
    )
    n_labeled = int(np.asarray((labels >= 0) & keep).sum())
    assert n_labeled <= 2048  # cap covers everything -> exactness
    assert float(capped["overflow"]) == 0.0
    for key in ("count", "alive"):
        np.testing.assert_array_equal(np.asarray(full[key]), np.asarray(capped[key]))
    for key in ("centroid", "center", "extent", "angle", "north_angle"):
        np.testing.assert_allclose(
            np.asarray(full[key]), np.asarray(capped[key]), atol=1e-5,
            err_msg=key,
        )
    # an UNDERSIZED cap reports the dropped rows instead of lying
    tiny = cluster_obb_stats_codes(
        hi, lo, labels, keep, mn, max_clusters=params.max_clusters,
        num_angles=params.obb_angles, points_cap=128,
    )
    assert float(tiny["overflow"]) >= n_labeled - 128


def test_cells_overflow_reported_not_silent(corridor):
    """More dense cells than max_cells must be REPORTED via
    cells_overflow (points in unpacked cells stay unlabeled)."""
    from pointcloudhookup_tpu.ops.frontend_fused import fused_extract_step

    pts, centers = corridor
    origin = pts.mean(axis=0)
    xyz, mask = pad_points((pts - origin).astype(np.float32), 8192)
    p = _params()
    ok = fused_extract_step(
        jnp.asarray(xyz), jnp.asarray(mask), p,
        max_cells=2048, min_cell_points=1, geometric_voxels=True,
    )
    assert float(ok["cells_overflow"]) == 0.0
    tiny = fused_extract_step(
        jnp.asarray(xyz), jnp.asarray(mask), p,
        max_cells=16, min_cell_points=1, geometric_voxels=True,
    )
    assert float(tiny["cells_overflow"]) > 0.0


def test_fused_core_flood_branch_matches_converge(corridor):
    """Big cell tables route the cluster stage through the core-flood
    restructure (ops/frontend_exact.py); force the branch at a small
    table and pin equality of labels/keep against the converge-kernel
    branch."""
    from pointcloudhookup_tpu.ops.frontend_fused import (
        fused_downsample_ground_cluster,
    )

    pts, _ = corridor
    origin = pts.mean(axis=0)
    xyz, mask = pad_points((pts - origin).astype(np.float32), 8192)
    kwargs = dict(
        max_cells=2048, min_cell_points=1, geometric_voxels=True,
        emit="codes", return_cells_overflow=True,
    )
    base = fused_downsample_ground_cluster(
        jnp.asarray(xyz), jnp.asarray(mask), _params(), **kwargs,
        core_flood_cells=1 << 30,  # converge-kernel branch
    )
    flood = fused_downsample_ground_cluster(
        jnp.asarray(xyz), jnp.asarray(mask), _params(), **kwargs,
        core_flood_cells=2048,  # force the core-flood branch
    )
    # (hi, lo, keep, labels, base, mn, cells_over, hier_over)
    np.testing.assert_array_equal(np.asarray(base[2]), np.asarray(flood[2]))
    np.testing.assert_array_equal(np.asarray(base[3]), np.asarray(flood[3]))
    assert float(np.asarray(flood[6])) == float(np.asarray(base[6]))


def test_fused_core_cap_overflow_reported_and_escalation_exact(corridor):
    """The fused frontend's core-flood branch takes a right-sizable
    `core_cap` (the 16M/32k envelope routing starts small and escalates
    on overflow): an over-full core table must surface through
    cells_overflow — never silently truncate — and a sufficient cap must
    reproduce the converge-kernel branch's labels exactly."""
    from pointcloudhookup_tpu.ops.frontend_fused import (
        fused_downsample_ground_cluster,
    )

    pts, _ = corridor
    origin = pts.mean(axis=0)
    xyz, mask = pad_points((pts - origin).astype(np.float32), 8192)
    kwargs = dict(
        max_cells=2048, min_cell_points=1, geometric_voxels=True,
        emit="codes", return_cells_overflow=True,
        core_flood_cells=2048,  # force the core-flood branch
    )
    ref = fused_downsample_ground_cluster(
        jnp.asarray(xyz), jnp.asarray(mask), _params(), **kwargs,
        core_cap=2048,
    )
    tiny = fused_downsample_ground_cluster(
        jnp.asarray(xyz), jnp.asarray(mask), _params(), **kwargs,
        core_cap=8,
    )
    # a corridor tile has far more than 8 core cells: the incomplete
    # flood must be flagged so callers escalate (never trusted silently)
    assert float(np.asarray(tiny[6])) > 0.0
    assert float(np.asarray(ref[6])) == 0.0
    # escalated cap == converge-kernel branch, bit-identical labels
    conv = fused_downsample_ground_cluster(
        jnp.asarray(xyz), jnp.asarray(mask), _params(),
        max_cells=2048, min_cell_points=1, geometric_voxels=True,
        emit="codes", return_cells_overflow=True,
        core_flood_cells=1 << 30,
    )
    np.testing.assert_array_equal(np.asarray(conv[3]), np.asarray(ref[3]))
