"""Golden tests against the reference's REAL data assets.

Round-trip tests alone can hide byte-order/row-order bugs; these load
the reference's actual egm96_15.gtx geoid grid (consumed by
/root/reference/crs.py:6,28) and the captured real GIM tower records
from /root/reference/test/data1.py (the Pingjiang corridor, the
match/correct oracle per SURVEY.md section 7.3).

Skipped when /root/reference is not mounted (CI outside this
environment)."""

import os

import numpy as np
import pytest

_REF = "/root/reference"
_GTX = os.path.join(_REF, "egm96_15.gtx")
_DATA1 = os.path.join(_REF, "test", "data1.py")

# The 4 sample towers hard-coded in /root/reference/crs.py:16-21
CRS_SAMPLE_TOWERS = [
    ("P142", 28.379743, 113.363246, 104.03),
    ("P143", 28.376914, 113.364204, 70.52),
    ("P144", 28.373484, 113.365366, 69.68),
    ("P145", 28.369953, 113.366563, 67.15),
]


@pytest.mark.skipif(not os.path.exists(_GTX), reason="reference gtx not mounted")
class TestRealEgm96Grid:
    @pytest.fixture(scope="class")
    def grid(self):
        from pointcloudhookup_tpu.io.geoid import load_gtx

        return load_gtx(_GTX)

    def test_grid_layout(self, grid):
        # EGM96 15-arcmin global grid: 721 x 1440 from (-90, -180), 0.25 deg
        assert grid.values.shape == (721, 1440)
        assert grid.lat0 == -90.0 and grid.lon0 == -180.0
        assert grid.dlat == 0.25 and grid.dlon == 0.25

    def test_wellknown_undulations(self, grid):
        """Published EGM96 values: a byte-order or row-order bug in
        load_gtx cannot reproduce these."""
        n_origin = float(grid.interp(0.0, 0.0, xp=np))
        assert abs(n_origin - 17.16) < 0.05  # (0N, 0E) = 17.16 m
        n_nyc = float(grid.interp(40.7, -74.0, xp=np))
        assert -34.0 < n_nyc < -31.0
        # global undulation range
        assert -110.0 < float(grid.values.min()) < -100.0
        assert 80.0 < float(grid.values.max()) < 90.0

    def test_crs_sample_towers(self, grid):
        """The 4 towers from crs.py: N-values must agree across the
        corridor (~-15.1 m near Pingjiang) and fail the reference's
        'N close to 0 means grid not in effect' probe (crs.py:49-52)."""
        from pointcloudhookup_tpu.io.geoid import check_grid_effective
        from pointcloudhookup_tpu.ops.geo import ellipsoid_to_orthometric

        ns = []
        for _, lat, lon, h_ellip in CRS_SAMPLE_TOWERS:
            n = float(grid.interp(lat, lon, xp=np))
            ns.append(n)
            h_orth = float(
                ellipsoid_to_orthometric(lat, lon, h_ellip, grid, xp=np)
            )
            assert abs((h_ellip - h_orth) - n) < 1e-3
        ns = np.array(ns)
        assert np.all((-16.0 < ns) & (ns < -14.0))
        assert abs(ns.mean()) > 0.1  # grid IS in effect
        effective, mean_abs = check_grid_effective(
            grid, [(t[1], t[2]) for t in CRS_SAMPLE_TOWERS]
        )
        assert effective and 14.0 < mean_abs < 16.0


def _load_data1():
    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_data1", _DATA1)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.data1


@pytest.mark.skipif(not os.path.exists(_DATA1), reason="reference data1 not mounted")
class TestData1GoldenMatch:
    @pytest.fixture(scope="class")
    def records(self):
        from pointcloudhookup_tpu.io.cbm import GimTowerRecord

        raw = _load_data1()
        assert len(raw) == 251  # full Pingjiang corridor capture
        return [
            GimTowerRecord(
                name=d.get("name", ""),
                type=d.get("type", ""),
                lng=float(d["lng"]),
                lat=float(d["lat"]),
                h=float(d["h"]),
                r=float(d.get("r", 0.0)),
                properties=d.get("properties"),
                cbm_path=d.get("cbm_path", ""),
            )
            for d in raw
        ]

    def test_records_shape(self, records):
        ids = [r.properties.get("杆塔编号", "") for r in records]
        assert "P201" in ids and "P202" in ids
        lats = np.array([r.lat for r in records])
        lngs = np.array([r.lng for r in records])
        assert np.all((28.2 < lats) & (lats < 28.9))
        assert np.all((113.3 < lngs) & (lngs < 113.6))

    @pytest.fixture(scope="class")
    def pc_towers(self, records):
        """Point-cloud towers fabricated AT a subset of the real GIM
        positions (CGCS2000 meters, ellipsoidal heights = ortho + N)."""
        from pointcloudhookup_tpu.models.towers import Tower
        from pointcloudhookup_tpu.ops.geo import tm_forward

        rng = np.random.default_rng(0)
        sel = list(range(0, 40, 2))  # every other of the first 40
        towers = []
        for k, gi in enumerate(sel):
            r = records[gi]
            e, n = (float(v) for v in tm_forward(r.lng, r.lat, xp=np))
            # jitter within the 50 m match radius; ellipsoid = ortho + 25
            de, dn = rng.uniform(-8, 8, 2)
            towers.append(
                Tower(
                    id=f"塔{k + 1}",
                    center=np.array([e + de, n + dn, r.h + 25.0]),
                    extent=np.array([12.0, 10.0, 40.0]),
                    height=40.0,
                    width=12.0,
                    north_angle=123.0,
                    angle=0.0,
                    num_points=1000,
                    label=k,
                )
            )
        return towers, sel

    def test_greedy_match_golden(self, records, pc_towers):
        """pipeline.match on the REAL corridor records must reproduce the
        reference's greedy first-match loop (including the non-consuming
        quirk: P201/P202 sit 40 m apart, inside each other's radius)."""
        from pointcloudhookup_tpu.models import pipeline
        from pointcloudhookup_tpu.ops.geo import haversine_m

        towers, sel = pc_towers
        res = pipeline.match(records, towers, region_n_value=25.0)

        # independent oracle: the reference loop, scalar form
        # (/root/reference/utils/table_match_gim.py:169-196)
        conv = res.converted_towers
        expected = []
        for gi, g in enumerate(records):
            for pi, c in enumerate(conv):
                d = float(
                    haversine_m(g.lat, g.lng, c.converted_center[1],
                                c.converted_center[0], xp=np)
                )
                if d <= 50.0 and abs(g.h - c.converted_center[2]) <= 100.0:
                    expected.append((gi, pi))
                    break
        assert res.pairs == expected
        # every fabricated tower's own record must be matched (possibly
        # to a nearer-in-order neighbor, but sel[k] pairs with SOME pc)
        matched_gims = {gi for gi, _ in res.pairs}
        assert set(sel) <= matched_gims
        # matched PC towers adopt GIM id + north angle (ref :291-316).
        # Non-consuming greedy means several GIM towers can claim one PC
        # tower (P201/P202 are 40 m apart); the LAST adopter wins, same
        # as the reference's sequential overwrite.
        last_adopter = {pi: gi for gi, pi in res.pairs}
        for pi, gi in last_adopter.items():
            assert conv[pi].id == records[gi].properties.get("杆塔编号")
            assert conv[pi].north_angle == records[gi].r

    def test_correct_writes_back_real_records(self, records, pc_towers):
        """correct(): PC coordinates flow into the GIM rows; the
        corrected rows carry the real records' CBM ids for save_gim."""
        from pointcloudhookup_tpu.models import pipeline
        from pointcloudhookup_tpu.models.pipeline import corrected_rows_from_result

        towers, sel = pc_towers
        res = pipeline.correct(records, towers, region_n_value=25.0)
        assert res.corrected_gim and res.pairs
        for gi, pi in res.pairs:
            c = res.converted_towers[pi]
            assert res.gim_rows[gi][1] == f"{c.converted_center[1]:.6f}"
            assert res.gim_rows[gi][2] == f"{c.converted_center[0]:.6f}"
        rows = corrected_rows_from_result(res, records)
        assert len(rows) == len(res.pairs)
        for (gi, pi), row in zip(res.pairs, rows):
            assert row["杆塔编号"] == records[gi].properties.get("杆塔编号")

    def test_conversion_against_real_gtx(self, records):
        """End-to-end: elevation conversion of real records through the
        REAL EGM96 grid (not the empirical fallback)."""
        if not os.path.exists(_GTX):
            pytest.skip("gtx not mounted")
        from pointcloudhookup_tpu.io.geoid import load_gtx
        from pointcloudhookup_tpu.models.towers import Tower
        from pointcloudhookup_tpu.models import pipeline
        from pointcloudhookup_tpu.ops.geo import tm_forward

        grid = load_gtx(_GTX)
        r = records[0]
        e, n = (float(v) for v in tm_forward(r.lng, r.lat, xp=np))
        t = Tower(
            id="塔1", center=np.array([e, n, 100.0]),
            extent=np.array([12.0, 10.0, 40.0]), height=40.0, width=12.0,
            north_angle=0.0, angle=0.0, num_points=500, label=0,
        )
        res = pipeline.match([r], [t], geoid=grid)
        c = res.converted_towers[0]
        # EGM96 N near Pingjiang is about -15 m -> ortho = ellip + 15
        assert 114.0 < c.orthometric_height < 116.0
        assert c.height_conversion_applied
