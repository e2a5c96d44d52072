"""ICP-refined correction (--icp): refined centers must beat greedy box
centers on a corridor whose towers carry one-sided artifacts
(VERDICT r2 item 8; BASELINE config 4 north star wired into correct())."""

import numpy as np
import pytest

from pointcloudhookup_tpu.config import ClusterParams, ExtractParams
from pointcloudhookup_tpu.models.pipeline import correct, extract_from_points
from pointcloudhookup_tpu.models.refine import (
    refine_tower_centers,
    tower_frame_template,
)
from pointcloudhookup_tpu.ops.geo import tm_forward


def _perturbed_corridor(rng, n_towers=3, stub_reach=7.0):
    """Lattice towers with a conductor-stub artifact on the +x face that
    drags the OBB box center off the true lattice axis.  Returns
    (points, true_centers) in CGCS2000 world coordinates."""
    e0, n0 = (float(v) for v in tm_forward(113.5, 28.2, xp=np))
    height, width = 32.0, 12.0
    parts = [
        np.column_stack([
            e0 + rng.uniform(-250, 250, 6000),
            n0 + rng.uniform(-250, 250, 6000),
            rng.normal(0.0, 0.2, 6000) + 80.0,
        ])
    ]
    truth = []
    for k in range(n_towers):
        cx = e0 + (k - 1) * 160.0
        cy = n0 + 30.0 * (k % 2)
        base = 80.0
        t = rng.uniform(0, 1, 900)
        half = width / 2 * (1 - 0.6 * t)
        parts.append(np.column_stack([
            cx + rng.uniform(-1, 1, 900) * half,
            cy + rng.uniform(-1, 1, 900) * half,
            base + t * height,
        ]))
        # one-sided stub: dense points reaching +x from the upper third
        m = 220
        parts.append(np.column_stack([
            cx + width / 2 + rng.uniform(0, stub_reach, m),
            cy + rng.normal(0, 0.6, m),
            base + height * rng.uniform(0.6, 0.85, m),
        ]))
        truth.append([cx, cy, base + height / 2])
    return np.vstack(parts), np.asarray(truth)


def test_template_shape():
    t = tower_frame_template(30.0, 12.0)
    assert t.dtype == np.float32
    # centered box: symmetric z, tapered xy
    assert abs(t[:, 2].min() + 15.0) < 1e-5 and abs(t[:, 2].max() - 15.0) < 1e-5
    np.testing.assert_allclose(t[:, :2].max(), 6.0, atol=1e-5)
    lo = np.abs(t[t[:, 2] > 14.9][:, :2]).max()
    assert lo < 6.0 * 0.45  # tapered at the top


def test_refined_centers_beat_greedy(rng):
    pts, truth = _perturbed_corridor(rng)
    params = ExtractParams(cluster=ClusterParams(eps=5.0, min_points=40))
    towers, stats, _ = extract_from_points(pts, params)
    assert len(towers) == len(truth)
    labels = stats["labels"][: len(pts)]
    clouds = [pts[labels == t.label] for t in towers]

    refined = refine_tower_centers(
        towers, clouds, list(range(len(towers))), iters=30, max_corr_dist=2.0
    )
    assert set(refined) == set(range(len(towers)))
    for i, t in enumerate(towers):
        d = np.linalg.norm(truth[:, :2] - t.center[None, :2], axis=1)
        j = int(np.argmin(d))
        greedy_err = float(d[j])
        refined_err = float(
            np.linalg.norm(refined[i]["center"][:2] - truth[j, :2])
        )
        # the stub biases the box center by ~stub_reach/2; ICP must
        # recover most of it
        assert greedy_err > 1.5, "fixture no longer perturbs the box center"
        assert refined_err < greedy_err * 0.5, (i, greedy_err, refined_err)
        assert refined_err < 1.0, (i, refined_err)


def test_correct_icp_writes_refined_coordinates(rng):
    from pointcloudhookup_tpu.ops.geo import tm_inverse

    pts, truth = _perturbed_corridor(rng)
    params = ExtractParams(cluster=ClusterParams(eps=5.0, min_points=40))
    towers, stats, _ = extract_from_points(pts, params)
    labels = stats["labels"][: len(pts)]
    clouds = [pts[labels == t.label] for t in towers]

    gim_list = []
    for c in truth:
        lon, lat = (float(v) for v in tm_inverse(c[0], c[1], xp=np))
        gim_list.append(
            dict(lat=lat, lng=lon, h=float(c[2]) - 25.0, r=10.0,
                 properties={"杆塔编号": f"P{len(gim_list) + 1}"})
        )

    plain = correct(gim_list, towers)
    res = correct(gim_list, towers, icp=True, pc_clouds=clouds)
    assert res.pairs == plain.pairs and len(res.pairs) == len(truth)
    for gi, pi in res.pairs:
        c = res.converted_towers[pi]
        assert c.icp_rmse is not None and c.icp_rmse < 2.0
        # written-back (corrected) GIM latitude/longitude row reflects
        # the REFINED position: closer to the GIM model truth than the
        # greedy write-back
        lat_r, lng_r = float(res.gim_rows[gi][1]), float(res.gim_rows[gi][2])
        lat_g, lng_g = float(plain.gim_rows[gi][1]), float(plain.gim_rows[gi][2])
        t_lat, t_lng = gim_list[gi]["lat"], gim_list[gi]["lng"]
        err_r = np.hypot(lat_r - t_lat, lng_r - t_lng)
        err_g = np.hypot(lat_g - t_lat, lng_g - t_lng)
        assert err_r < err_g

    # icp without clouds is a hard error, not a silent fallback
    with pytest.raises(ValueError):
        correct(gim_list, towers, icp=True)
