"""Golden regression: the committed corridor fixture must keep producing
the same towers (centers/extents/angles/counts) across refactors.
Regenerate tests/golden_corridor.json deliberately if semantics change."""

import json
import os

import numpy as np

from pointcloudhookup_tpu.config import (
    ClusterParams,
    ExtractParams,
    GroundParams,
)
from pointcloudhookup_tpu.io.synthetic import synthetic_corridor
from pointcloudhookup_tpu.models.pipeline import extract_from_points

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_corridor.json")


def test_golden_corridor_regression():
    with open(GOLDEN) as f:
        golden = json.load(f)
    rng = np.random.default_rng(golden["seed"])
    pts, _ = synthetic_corridor(
        rng, n_ground=4000, n_veg=800, pts_per_tower=400, extent=250.0
    )
    params = ExtractParams(
        ground=GroundParams(min_points_after=100),
        cluster=ClusterParams(
            eps=golden["params"]["eps"], min_points=golden["params"]["min_points"]
        ),
        max_clusters=32,
        obb_angles=64,
    )
    towers, _, _ = extract_from_points(pts, params, capacity=8192)
    towers = sorted(towers, key=lambda t: t.center[0])
    assert len(towers) == len(golden["towers"])
    for t, g in zip(towers, golden["towers"]):
        np.testing.assert_allclose(t.center, g["center"], atol=0.05)
        np.testing.assert_allclose(t.extent, g["extent"], atol=0.35)
        assert t.num_points == g["num_points"]
        # angle mod 180 within the refinement resolution
        diff = abs(t.north_angle - g["north_angle"]) % 180.0
        assert min(diff, 180.0 - diff) < 1.5
