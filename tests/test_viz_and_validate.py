import json

import numpy as np

from pointcloudhookup_tpu.io.geoid import (
    check_grid_effective,
    load_geoid,
    load_gtx,
    load_npz,
    save_gtx,
)
from pointcloudhookup_tpu.models.towers import Tower
from pointcloudhookup_tpu.ops.geo import GeoidGrid
from pointcloudhookup_tpu.utils.validate import (
    check_against_known_towers,
    quality_dedup,
    tower_quality,
    verify_towers,
)
from pointcloudhookup_tpu.viz.boxes import (
    BBOX_PRESETS,
    adaptive_scale_for_height,
    box_lineset,
    expand_box_kuangxuan,
    export_geometries_json,
    get_bbox_preset,
    subsample_for_display,
    tower_display_geometries,
)


def _tower(cx=0.0, cy=0.0, cz=20.0, h=35.0, w=12.0, n=1000, tid="t0"):
    return Tower(
        id=tid,
        center=np.array([cx, cy, cz]),
        extent=np.array([w, w * 0.8, h]),
        height=h,
        width=w,
        north_angle=10.0,
        angle=0.3,
        num_points=n,
        label=0,
    )


# --------------------------------------------------------------- viz
def test_kuangxuan_box_factors():
    # factors multiply width in x/y and height in z (ref semantics)
    mins, maxs = expand_box_kuangxuan([10.0, 20.0, 30.0], width=6.0, height=30.0)
    np.testing.assert_allclose(mins, [10 - 6.0, 20 - 3.0, 30 - 30.0])
    np.testing.assert_allclose(maxs, [10 + 6.0 * 1.67, 20 + 6.0, 30 + 60.0])


def test_box_lineset_is_12_edges():
    pts = box_lineset([0, 0, 0], [1, 2, 3])
    assert pts.shape == (24, 3)
    # every edge endpoint is a box corner
    for p in pts:
        assert all(c in (0.0, 1.0) or c in (0.0, 2.0) or c in (0.0, 3.0) for c in [0])
    lengths = np.linalg.norm(pts[1::2] - pts[0::2], axis=1)
    assert sorted(set(np.round(lengths, 6).tolist())) == [1.0, 2.0, 3.0]


def test_presets_and_adaptive_scale():
    assert set(BBOX_PRESETS) == {
        "kuangxuan_original",
        "kuangxuan_conservative",
        "kuangxuan_aggressive",
        "symmetric_moderate",
        "symmetric_large",
    }
    m, p = get_bbox_preset("nonexistent")
    assert m == "kuangxuan" and p["x_right_factor"] == 1.67
    assert adaptive_scale_for_height(10) == [3.2, 3.2, 5.0]
    assert adaptive_scale_for_height(30) == [3.0, 3.0, 4.8]
    assert adaptive_scale_for_height(50) == [2.8, 2.8, 4.5]


def test_tower_display_geometries_and_export(tmp_path):
    towers = [_tower(), _tower(cx=100, tid="t1")]
    geoms = tower_display_geometries(towers, preset="kuangxuan_original")
    assert len(geoms) == 2 and geoms[0][0].shape == (24, 3)
    sym = tower_display_geometries(towers, method="symmetric")
    assert len(sym) == 2
    path = str(tmp_path / "boxes.json")
    export_geometries_json(geoms, path)
    data = json.load(open(path))
    assert len(data) == 2 and len(data[0]["points"]) == 24


def test_subsample_for_display(rng):
    pts = rng.normal(size=(1000, 3))
    assert subsample_for_display(pts, cap=100).shape == (100, 3)
    assert subsample_for_display(pts, cap=5000) is pts


# --------------------------------------------------------------- geoid io
def test_gtx_roundtrip(tmp_path):
    vals = np.arange(12, dtype=np.float32).reshape(3, 4)
    grid = GeoidGrid(lat0=20.0, lon0=100.0, dlat=0.5, dlon=0.25, values=vals)
    p = str(tmp_path / "g.gtx")
    save_gtx(grid, p)
    back = load_gtx(p)
    assert back.lat0 == 20.0 and back.dlon == 0.25
    np.testing.assert_array_equal(back.values, vals)
    assert load_geoid(p).lat0 == 20.0


def test_npz_load(tmp_path):
    lat = np.linspace(-90, 90, 721)
    lon = np.linspace(-180, 180, 1441)
    geoid = np.zeros((721, 1441), np.float32) + 25.0
    p = str(tmp_path / "egm.npz")
    np.savez(p, lat=lat, lon=lon, geoid=geoid)
    g = load_npz(p)
    assert abs(float(g.interp(28.2, 113.0, np)) - 25.0) < 1e-6
    effective, mean_n = check_grid_effective(g)
    assert effective and abs(mean_n - 25.0) < 1e-6


def test_grid_not_effective_detected():
    g = GeoidGrid(0.0, 0.0, 1.0, 1.0, np.zeros((10, 10), np.float32))
    effective, mean_n = check_grid_effective(
        g, sample_points=[(2.0, 3.0), (4.0, 5.0)]
    )
    assert not effective and mean_n == 0.0


# --------------------------------------------------------------- validate
def test_quality_metric_and_dedup():
    good = _tower(n=5000, tid="good")
    bad = _tower(cx=1.0, n=100, tid="bad")  # within strict radius
    far = _tower(cx=100.0, tid="far")
    near = _tower(cx=20.0, tid="near")  # loose radius -> skipped
    assert tower_quality(35, 12, 5000) > tower_quality(35, 12, 100)
    kept = quality_dedup([bad, good, far, near])
    ids = [t.id for t in kept]
    assert "good" in ids and "bad" not in ids
    assert "far" in ids and "near" not in ids


def test_verify_towers_warnings():
    ok = _tower(tid="ok")
    short = _tower(cx=200, h=10.0, tid="short")
    close_a = _tower(cx=400, tid="a")
    close_b = _tower(cx=402, tid="b")
    few = _tower(cx=600, n=10, tid="few")
    warnings = verify_towers([ok, short, close_a, close_b, few])
    text = "\n".join(warnings)
    assert "short" in text and "height" in text
    assert "a and b" in text or ("a" in text and "b" in text)
    assert "few" in text and "points" in text
    assert not any("ok:" in w for w in warnings)


def test_known_towers_check():
    det = [_tower(cx=0), _tower(cx=100), _tower(cx=500)]
    res = check_against_known_towers(det, [(1.0, 0.0), (101.0, 0.0), (300.0, 0.0)])
    assert res["hits"] == 2 and res["misses"] == 1 and res["extra"] == 1
    assert all(e < 2.0 for e in res["errors"])


def test_geoid_longitude_wrapping():
    # global grid anchored at -180: 0..360 longitudes must wrap
    lon = np.linspace(-180, 179.75, 1440)
    vals = np.tile(np.linspace(0, 100, 1440), (721, 1)).astype(np.float32)
    g = GeoidGrid(-90.0, -180.0, 0.25, 0.25, vals)
    west74 = float(g.interp(40.0, -74.0, np))
    east286 = float(g.interp(40.0, 286.0, np))
    assert abs(west74 - east286) < 1e-4
