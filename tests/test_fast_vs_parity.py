"""Bound the bench fast path against the parity path at scale.

bench.py runs the fused front-end with two approximations switched on:
geometric voxel centers (centroids quantized to voxel centers) and a
16x-strided ground percentile over Morton-sorted voxel rows.  This test
runs BOTH the fast mode and the modular parity path (exact centroids,
exact percentile, grid clustering) on the same large synthetic corridor
and asserts the tower-level outputs agree: identical accepted sets and
sub-half-meter center agreement.  Catches any future drift of the
bench's approximations (VERDICT round-1, weak #5)."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy on a cold 1-core host; quick tier = pytest -m 'not heavy'

from pointcloudhookup_tpu.config import ClusterParams, ExtractParams
from pointcloudhookup_tpu.io.synthetic import synthetic_corridor
from pointcloudhookup_tpu.models.towers import filter_and_dedup
from pointcloudhookup_tpu.ops.frontend_fused import fused_downsample_ground_cluster
from pointcloudhookup_tpu.ops.obb import cluster_obb_stats


def _corridor(rng, n):
    n_towers = 12
    xs = np.linspace(-900, 900, n_towers)
    ys = 40.0 * np.sin(xs / 300.0)
    pts, centers = synthetic_corridor(
        rng,
        n_ground=int(n * 0.80),
        n_veg=int(n * 0.12),
        towers=tuple(zip(xs, ys)),
        pts_per_tower=max((n - int(n * 0.92)) // n_towers, 1),
        extent=1000.0,
        n_line=0,
    )
    pts = pts[:n]
    origin = pts.mean(axis=0)
    xyz = np.zeros((n, 3), np.float32)
    xyz[: len(pts)] = (pts - origin).astype(np.float32)
    mask = np.ones(n, bool)
    mask[len(pts) :] = False
    return xyz, mask, centers - origin


def _towers(xyz, mask, params, *, geometric, max_cells=8192):
    ds_xyz, keep, labels, _ = fused_downsample_ground_cluster(
        jnp.asarray(xyz), jnp.asarray(mask), params,
        max_cells=max_cells, min_cell_points=3, geometric_voxels=geometric,
    )
    stats = cluster_obb_stats(
        ds_xyz, labels, keep, max_clusters=params.max_clusters,
        num_angles=params.obb_angles, per_cluster_cap=8192,
    )
    accepted = np.asarray(filter_and_dedup(stats, params.filters))
    return (
        np.asarray(stats["centroid"])[accepted],
        np.asarray(stats["center"])[accepted],
        np.asarray(stats["count"])[accepted],
    )


def test_fast_mode_matches_parity_mode_small(rng):
    """Reduced-size twin of the @slow scale test so the fast-mode bound
    runs in default CI (ADVICE r2: the only bound was slow-marked)."""
    n = 1 << 17
    xyz, mask, true_centers = _corridor(rng, n)
    params = ExtractParams(cluster=ClusterParams())

    fast_cg, fast_c, _ = _towers(xyz, mask, params, geometric=True)
    exact_cg, exact_c, _ = _towers(xyz, mask, params, geometric=False)
    assert len(fast_c) == len(exact_c) == len(true_centers)
    used = set()
    for cg in fast_cg:
        d = np.linalg.norm(exact_cg - cg, axis=1)
        j = int(np.argmin(d))
        assert j not in used
        used.add(j)
        assert d[j] < 0.5


@pytest.mark.slow
def test_fast_mode_matches_parity_mode_at_scale(rng):
    """geometric+strided fast mode vs exact mode on a 1M corridor:
    same accepted towers, centroids within 0.5 m."""
    n = 1 << 20
    xyz, mask, true_centers = _corridor(rng, n)
    params = ExtractParams(cluster=ClusterParams())

    fast_cg, fast_c, fast_n = _towers(xyz, mask, params, geometric=True)
    exact_cg, exact_c, exact_n = _towers(xyz, mask, params, geometric=False)

    # identical accepted-tower SETS
    assert len(fast_c) == len(exact_c) == len(true_centers)

    # greedy pairing by centroid distance; every pair must agree
    used = set()
    for i, cg in enumerate(fast_cg):
        d = np.linalg.norm(exact_cg - cg, axis=1)
        j = int(np.argmin(d))
        assert j not in used, "two fast towers map to one exact tower"
        used.add(j)
        # centroid: density-weighted, robust — the tight bound
        assert d[j] < 0.5, f"centroid drift {d[j]:.3f} m exceeds bound"
        # box center: a max/min midpoint, so a SINGLE boundary voxel
        # kept/dropped by the slightly different ground base can move
        # it — bounded looser (well inside the 30 m dedup / 50 m match
        # radii the product decisions use)
        dc = np.linalg.norm(exact_c[j] - fast_c[i])
        assert dc < 1.5, f"box-center drift {dc:.3f} m exceeds bound"
        # member populations agree to 1%
        assert abs(fast_n[i] - exact_n[j]) <= 0.01 * exact_n[j]

    # and both modes find the planted towers
    for tc in true_centers:
        d = np.linalg.norm(fast_cg[:, :2] - tc[None, :2], axis=1)
        assert d.min() < 2.0
