"""End-to-end workflow test: the full 8-button reference workflow run
headlessly on synthetic data at real CGCS2000 coordinates."""

import numpy as np

from pointcloudhookup_tpu.config import (
    ClusterParams,
    ExtractParams,
    GroundParams,
    TowerFilterParams,
)
from pointcloudhookup_tpu.io.las import make_las, read_las, write_las
from pointcloudhookup_tpu.io.synthetic import build_synthetic_gim, synthetic_corridor
from pointcloudhookup_tpu.models import pipeline
from pointcloudhookup_tpu.ops.geo import tm_forward, tm_inverse

REGION_N = 25.0


def _small_params():
    return ExtractParams(
        ground=GroundParams(min_points_after=100),
        cluster=ClusterParams(eps=5.0, min_points=30),
        filters=TowerFilterParams(),
        max_clusters=32,
        obb_angles=64,
    )


def test_full_workflow(tmp_path, rng):
    e0, n0 = tm_forward(113.5, 28.2, xp=np)
    e0, n0 = float(e0), float(n0)
    pts, centers = synthetic_corridor(
        rng, n_ground=4000, n_veg=800, pts_per_tower=400, extent=250.0,
        origin=(e0, n0, 80.0),
    )

    # --- import point cloud (write + read LAS)
    las_path = str(tmp_path / "corridor.las")
    write_las(make_las(pts, scales=[0.01, 0.01, 0.01]), las_path)

    # --- compress (voxel downsample)
    ds_path = str(tmp_path / "point_2.las")
    n_out = pipeline.compress(las_path, ds_path, voxel_size=0.1)
    assert 0 < n_out <= len(pts)

    # --- extract towers
    logs = []
    towers = pipeline.extract(
        ds_path,
        log_callback=logs.append,
        params=_small_params(),
        output_dir=str(tmp_path / "output_towers"),
        excel_path=str(tmp_path / "towers_info.xlsx"),
    )
    assert len(towers) == len(centers)
    got = np.array(sorted(t.center[:2].tolist() for t in towers))
    want = np.array(sorted(centers[:, :2].tolist()))
    np.testing.assert_allclose(got, want, atol=2.5)
    # per-tower LAS + table written
    import os

    assert len(os.listdir(tmp_path / "output_towers")) == len(towers)
    assert (tmp_path / "towers_info.csv").exists() or (
        tmp_path / "towers_info.xlsx"
    ).exists()

    # --- build a GIM whose towers sit at the true corridor positions
    gim_towers = []
    for i, c in enumerate(centers):
        lon, lat = tm_inverse(c[0], c[1], xp=np)
        gim_towers.append(
            dict(id=f"P{41 + i}", lat=float(lat), lng=float(lon), h=float(c[2]) - REGION_N, r=33.0)
        )
    gim_path = str(tmp_path / "corridor.gim")
    build_synthetic_gim(gim_path, gim_towers, workdir=str(tmp_path / "gtree"))

    # --- import GIM
    records, folder, header = pipeline.import_gim(gim_path, str(tmp_path / "out_gim"))
    assert len(records) == len(centers)

    # --- match
    res = pipeline.match(records, towers, region_n_value=REGION_N)
    assert len(res.pairs) == len(centers)
    # matched PC towers adopt GIM ids + north angle
    matched_ids = {res.converted_towers[pi].id for _, pi in res.pairs}
    assert matched_ids == {f"P{41 + i}" for i in range(len(centers))}
    for _, pi in res.pairs:
        assert res.converted_towers[pi].north_angle == 33.0
    # elevation conversion applied (ellipsoid -> orthometric, N=25)
    c0 = res.converted_towers[res.pairs[0][1]]
    assert abs(c0.n_value - REGION_N) < 1e-6

    # --- correct (bidirectional)
    res_c = pipeline.correct(records, towers, region_n_value=REGION_N)
    gi, pi = res_c.pairs[0]
    assert res_c.gim_rows[gi][1] == f"{res_c.converted_towers[pi].converted_center[1]:.6f}"

    # --- save corrected GIM
    rows = pipeline.corrected_rows_from_result(res_c, records)
    out_gim = str(tmp_path / "corrected.gim")
    assert pipeline.save_gim(folder, rows, out_gim, original_gim_path=gim_path)

    # --- reopen: BLHA lines carry the corrected (point-cloud) coordinates
    records2, _, header2 = pipeline.import_gim(out_gim, str(tmp_path / "out_gim2"))
    assert header2 == header
    by_id = {r.properties["杆塔编号"]: r for r in records2}
    for _, pi in res_c.pairs:
        c = res_c.converted_towers[pi]
        r2 = by_id[c.id]
        assert abs(r2.lat - c.converted_center[1]) < 1e-6
        assert abs(r2.lng - c.converted_center[0]) < 1e-6
        assert abs(r2.h - c.converted_center[2]) < 1e-3
        assert abs(r2.r - 33.0) < 1e-9


def test_match_semantics_pc_towers_not_consumed():
    """A single PC tower within range of two GIM towers pairs with BOTH
    (the reference's greedy loop never consumes PC towers)."""
    from pointcloudhookup_tpu.models.pipeline import ConvertedTower, match_towers

    gim = [
        dict(lat=28.0, lng=113.0, h=50.0),
        dict(lat=28.0001, lng=113.0, h=50.0),
    ]
    pc = [
        ConvertedTower(
            id="PC-1",
            converted_center=[113.0, 28.00005, 55.0],
            height=30.0,
            north_angle=0.0,
            original_center=[0, 0, 80.0],
            ellipsoid_height=80.0,
            orthometric_height=55.0,
            n_value=25.0,
            height_conversion_applied=True,
        )
    ]
    pairs = match_towers(gim, pc)
    assert pairs == [(0, 0), (1, 0)]


def test_match_result_exports(tmp_path):
    from pointcloudhookup_tpu.models.pipeline import ConvertedTower, _build_result

    gim = [
        dict(lat=28.0, lng=113.0, h=50.0, r=10.0, properties={"杆塔编号": "P1"}),
        dict(lat=28.1, lng=113.1, h=51.0, r=20.0, properties={"杆塔编号": "P2"}),
    ]
    pc = [
        ConvertedTower(
            id="PC-1", converted_center=[113.0, 28.0, 49.0], height=30.0,
            north_angle=5.0, original_center=[0, 0, 74.0], ellipsoid_height=74.0,
            orthometric_height=49.0, n_value=25.0, height_conversion_applied=True,
        )
    ]
    res = _build_result(gim, pc, [(0, 0)], corrected=False)
    csv_path = str(tmp_path / "t.csv")
    res.to_csv(csv_path)
    text = open(csv_path, encoding="utf-8").read()
    assert "配对PC行" in text and "配对GIM行" in text
    html_path = str(tmp_path / "t.html")
    res.to_html(html_path)
    html = open(html_path, encoding="utf-8").read()
    assert "#ADD8E6" in html  # first pair highlighted
    assert "P1" in html and "点云数据" in html
    # matched PC adopted GIM id + north angle
    assert res.pc_rows[0][0] == "P1"
    assert res.pc_rows[0][4] == "10.0"
