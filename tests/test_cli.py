"""CLI wiring smoke tests through main(argv) — the same surface the
shell uses."""

import json

import numpy as np
import pytest

from pointcloudhookup_tpu.cli import main
from pointcloudhookup_tpu.io.las import make_las, write_las
from pointcloudhookup_tpu.io.synthetic import build_synthetic_gim, synthetic_corridor
from pointcloudhookup_tpu.ops.geo import tm_forward, tm_inverse


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(3)
    e0, n0 = (float(v) for v in tm_forward(113.5, 28.2, xp=np))
    pts, centers = synthetic_corridor(
        rng, n_ground=2500, n_veg=400, pts_per_tower=350, extent=200.0,
        origin=(e0, n0, 80.0),
    )
    las = str(tmp / "c.las")
    write_las(make_las(pts, scales=[0.01, 0.01, 0.01]), las)
    gts = []
    for i, c in enumerate(centers):
        lon, lat = tm_inverse(c[0], c[1], xp=np)
        gts.append(dict(id=f"P{i}", lat=float(lat), lng=float(lon), h=float(c[2]) - 25.0, r=5.0))
    gim = str(tmp / "c.gim")
    build_synthetic_gim(gim, gts, workdir=str(tmp / "tree"))
    return tmp, las, gim, centers


def test_cli_import_pc(workspace, capsys):
    tmp, las, gim, centers = workspace
    main(["import-pc", las])
    info = json.loads(capsys.readouterr().out)
    assert info["points"] > 3000 and info["point_format"] == 0


def test_cli_import_gim(workspace, capsys, tmp_path):
    tmp, las, gim, centers = workspace
    main(["import-gim", gim, "--output-folder", str(tmp_path / "o"),
          "--table", str(tmp_path / "t.csv")])
    out = capsys.readouterr().out
    assert "P0" in out and "parsed 3 towers" in out
    assert (tmp_path / "t.csv").exists()


def test_cli_compress_and_extract(workspace, capsys, tmp_path):
    tmp, las, gim, centers = workspace
    ds = str(tmp_path / "ds.las")
    main(["compress", las, ds, "--voxel-size", "0.1"])
    assert "points written" in capsys.readouterr().out
    main(["extract", ds, "--eps", "5", "--min-points", "30"])
    out = capsys.readouterr().out
    assert out.count("tower_") == len(centers)


@pytest.mark.heavy
def test_cli_extract_adaptive_method(workspace, capsys, tmp_path):
    """--cluster-method adaptive (knob-free eps) finds the towers."""
    tmp, las, gim, centers = workspace
    ds = str(tmp_path / "ds.las")
    main(["compress", las, ds, "--voxel-size", "0.1"])
    capsys.readouterr()
    main(["extract", ds, "--min-points", "30", "--cluster-method", "adaptive"])
    out = capsys.readouterr().out
    assert out.count("tower_") == len(centers)


def test_cli_correct_save(workspace, capsys, tmp_path):
    tmp, las, gim, centers = workspace
    out_gim = str(tmp_path / "corrected.gim")
    main(["correct", gim, las, "--eps", "5", "--min-points", "30",
          "--output-folder", str(tmp_path / "og"),
          "--save", out_gim, "--csv", str(tmp_path / "r.csv"),
          "--html", str(tmp_path / "r.html")])
    out = capsys.readouterr().out
    assert f"{len(centers)} pairs matched" in out
    assert "saved" in out
    assert (tmp_path / "r.html").exists()
    import os

    assert os.path.getsize(out_gim) > 776


def test_cli_missing_file_exit_code(workspace):
    with pytest.raises(SystemExit) as e:
        main(["import-pc", "nonexistent.las"])
    assert e.value.code == 2


def test_cli_register_nondefault_eps(workspace, capsys, tmp_path):
    """register must cut tower clouds with the SAME clustering it used to
    produce the tower list: with non-default eps/min_points, each pair's
    cloud size must equal the matched tower's num_points (round-1 bug:
    labels came from a second default-params extraction)."""
    import re

    from pointcloudhookup_tpu.config import ClusterParams, ExtractParams
    from pointcloudhookup_tpu.io.las import read_las
    from pointcloudhookup_tpu.models.pipeline import extract_from_points

    tmp, las, gim, centers = workspace
    main(["register", gim, las, "--eps", "5", "--min-points", "30",
          "--output-folder", str(tmp_path / "o"), "--iters", "5"])
    out = capsys.readouterr().out
    rows = re.findall(r"PC\[(\d+)\]: n=(\d+)", out)
    assert rows, out
    params = ExtractParams(cluster=ClusterParams(eps=5.0, min_points=30))
    towers, _, _ = extract_from_points(read_las(las).xyz(), params)
    for pi, n in rows:
        assert int(n) == towers[int(pi)].num_points


def test_cli_run_all(workspace, capsys, tmp_path):
    """The flagship full-workflow command (compress -> extract ->
    correct -> save, the reference's 8-button sweep in one invocation,
    pyGUI_towers_test.py:73): the saved GIM must be byte-valid (776-byte
    header preserved per save_cbm.py:141-150) and its BLHA lines
    rewritten to the point-cloud-derived coordinates."""
    tmp, las, gim, centers = workspace
    out_gim = str(tmp_path / "all.gim")
    with pytest.raises(SystemExit) as e:
        main(["run-all", las, gim, out_gim, "--eps", "5",
              "--min-points", "30",
              "--output-folder", str(tmp_path / "og"),
              "--csv", str(tmp_path / "r.csv")])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert f"{len(centers)} towers corrected" in out
    assert (tmp_path / "r.csv").exists()
    with open(gim, "rb") as f:
        orig_hdr = f.read(776)
    with open(out_gim, "rb") as f:
        new_hdr = f.read(776)
    assert len(new_hdr) == 776 and new_hdr == orig_hdr
    # the corrected GIM re-parses; every tower's BLHA was rewritten
    from pointcloudhookup_tpu.models import pipeline

    before, _, _ = pipeline.import_gim(gim, str(tmp_path / "reparse_a"))
    after, _, _ = pipeline.import_gim(out_gim, str(tmp_path / "reparse_b"))
    assert len(after) == len(centers)
    b = {r.name: (r.lat, r.lng, r.h) for r in before}
    a = {r.name: (r.lat, r.lng, r.h) for r in after}
    assert set(a) == set(b)
    changed = [k for k in a if a[k] != b[k]]
    assert len(changed) == len(centers)
    # corrected positions stay near the originals (same towers, <=50 m)
    for k in a:
        assert abs(a[k][0] - b[k][0]) < 0.001 and abs(a[k][1] - b[k][1]) < 0.001
