"""Parity of the gravity-aligned rotating-calipers OBB against vendored
minimum-volume OBB goldens (VERDICT r2 weak #3).

The goldens in tests/fixtures/obb_goldens.json were precomputed by
tests/fixtures/make_obb_goldens.py — an independent scipy implementation
of the hull-face-normal sweep algorithm trimesh.bounds.oriented_bounds
uses (the reference's `mesh.bounding_box_oriented`,
/root/reference/utils/tower_extraction.py:137-146).  No trimesh needed
at test time.

SURVEY.md section 7.4-2's claim under test: for gravity-aligned shapes
(towers), the min-volume box degenerates to the min-AREA rectangle of
the XY footprint extruded over z — so our device OBB must reproduce the
min-volume extents within angle-grid tolerance.  The deliberately
tilted fixture documents the approximation's bounded cost instead.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudhookup_tpu.ops.obb import cluster_obb_stats

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

with open(os.path.join(FIXDIR, "obb_goldens.json")) as f:
    GOLDENS = json.load(f)


def _clusters():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "make_obb_goldens", os.path.join(FIXDIR, "make_obb_goldens.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.fixture_clusters()


CLUSTERS = _clusters()
ZALIGNED = [k for k in GOLDENS if k != "tilted_sheet"]


def _our_obb(pts):
    n = 4096
    xyz = np.zeros((n, 3), np.float32)
    m = min(len(pts), n)
    xyz[:m] = pts[:m] - pts[:m].mean(axis=0)
    mask = np.zeros(n, bool)
    mask[:m] = True
    labels = np.where(mask, 0, -1).astype(np.int32)
    stats = cluster_obb_stats(
        jnp.asarray(xyz), jnp.asarray(labels), jnp.asarray(mask),
        max_clusters=4, num_angles=256,
    )
    ext = np.asarray(stats["extent"])[0]
    assert bool(np.asarray(stats["alive"])[0])
    return ext


@pytest.mark.parametrize("name", ZALIGNED)
def test_matches_min_volume_golden(name):
    pts = CLUSTERS[name][:4096]
    # golden recomputed on the truncated member set so both sides see
    # identical points (the JSON golden covers the full set; volumes on
    # the 4096 head differ only by sampling noise, so recompute exactly)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "make_obb_goldens", os.path.join(FIXDIR, "make_obb_goldens.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    golden = mod.min_volume_obb(pts)

    ours = _our_obb(pts)
    vol_ours = float(np.prod(ours))
    vol_gold = golden["volume"]
    # min-volume is a lower bound; the z-aligned calipers box may exceed
    # it only by the angle-grid resolution (pi/512 -> <1% area) plus
    # hull-vs-f32 noise
    assert vol_ours >= vol_gold * (1 - 1e-3), (name, vol_ours, vol_gold)
    assert vol_ours <= vol_gold * 1.03, (name, vol_ours, vol_gold)
    np.testing.assert_allclose(
        sorted(ours.tolist(), reverse=True), golden["extents"],
        rtol=0.025, atol=0.2, err_msg=name,
    )


def test_full_set_goldens_are_current():
    """The stored JSON matches a fresh oracle run (guards against the
    fixture generator and JSON drifting apart)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "make_obb_goldens", os.path.join(FIXDIR, "make_obb_goldens.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for name, pts in CLUSTERS.items():
        fresh = mod.min_volume_obb(pts)
        np.testing.assert_allclose(
            fresh["volume"], GOLDENS[name]["volume"], rtol=1e-9, err_msg=name
        )


def test_tilted_sheet_cost_is_bounded():
    """Non-gravity-aligned stress case: the z-aligned box is allowed to
    exceed the true min volume, but boundedly (documents the
    approximation; towers in corridors are gravity-aligned)."""
    pts = CLUSTERS["tilted_sheet"][:4096]
    ours = _our_obb(pts)
    vol_ours = float(np.prod(ours))
    vol_gold = GOLDENS["tilted_sheet"]["volume"]
    assert vol_ours >= vol_gold * (1 - 1e-3)
    assert vol_ours <= vol_gold * 3.5
