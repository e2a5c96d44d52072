"""Integrated parity: our device pipeline vs a host reference
implementation with the canonical semantics of
/root/reference/utils/tower_extraction.py (percentile ground cut,
DBSCAN, min-area OBB, size filters, greedy dedup)."""

import numpy as np
from sklearn.cluster import DBSCAN

from pointcloudhookup_tpu.config import (
    ClusterParams,
    ExtractParams,
    GroundParams,
    TowerFilterParams,
)
from pointcloudhookup_tpu.models.pipeline import extract_from_points
from pointcloudhookup_tpu.ops.obb import min_area_rect_numpy

EPS = 5.0
MIN_PTS = 30
FILTERS = TowerFilterParams()


def reference_extract(points):
    """Host oracle following the reference's algorithm order."""
    z = points[:, 2]
    base = np.percentile(z, 25.0)
    kept = points[z > base + 3.0]
    if len(kept) < 100:
        kept = points[z > base + 1.0]
    labels = DBSCAN(eps=EPS, min_samples=MIN_PTS).fit(kept).labels_
    towers = []
    centers = []
    for lab in sorted(set(labels) - {-1}):
        cl = kept[labels == lab]
        _, (eu, ev) = min_area_rect_numpy(cl[:, :2])
        ex, ey = max(eu, ev), min(eu, ev)
        ez = cl[:, 2].max() - cl[:, 2].min()
        width = ex
        height = ez
        if not (
            height > FILTERS.min_height
            and FILTERS.min_width < width < FILTERS.max_width
            and height / width > FILTERS.aspect_ratio_threshold
        ):
            continue
        # box center (min-area rect center + mid z); use axis-aligned
        # midpoint of the cluster as a center proxy with the same
        # tolerance the thresholds allow
        center = np.array(
            [
                (cl[:, 0].max() + cl[:, 0].min()) / 2,
                (cl[:, 1].max() + cl[:, 1].min()) / 2,
                (cl[:, 2].max() + cl[:, 2].min()) / 2,
            ]
        )
        dup = any(np.linalg.norm(center - c) < FILTERS.duplicate_threshold for c in centers)
        if dup:
            continue
        centers.append(center)
        towers.append(dict(center=center, width=width, height=height, n=len(cl)))
    return towers


def test_extract_matches_reference_semantics(corridor):
    pts, _ = corridor
    ref = reference_extract(pts)

    params = ExtractParams(
        ground=GroundParams(min_points_after=100),
        cluster=ClusterParams(eps=EPS, min_points=MIN_PTS),
        filters=FILTERS,
        max_clusters=32,
        obb_angles=128,
    )
    ours, stats, origin = extract_from_points(pts, params, capacity=8192)

    assert len(ours) == len(ref)
    ref_sorted = sorted(ref, key=lambda t: (t["center"][0], t["center"][1]))
    ours_sorted = sorted(ours, key=lambda t: (t.center[0], t.center[1]))
    for r, o in zip(ref_sorted, ours_sorted):
        # centers agree to the rect-orientation tolerance
        np.testing.assert_allclose(o.center[:2], r["center"][:2], atol=1.0)
        assert abs(o.center[2] - r["center"][2]) < 0.2
        assert abs(o.height - r["height"]) < 0.2
        # width: min-area rect vs angle grid, f32 tolerance
        assert abs(o.width - r["width"]) < 0.5
        assert o.num_points == r["n"]
