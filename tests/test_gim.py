import os

import pytest

from pointcloudhookup_tpu.io.cbm import (
    apply_corrections,
    load_towers_from_gim_folder,
    update_cbm_blha,
)
from pointcloudhookup_tpu.io.gim import HEADER_SIZE, GimFile, extract_gim, write_gim
from pointcloudhookup_tpu.io.synthetic import build_gim_tree, build_synthetic_gim


def _towers():
    return [
        dict(id="P41", lat=28.101234, lng=113.201111, h=55.5, r=12.3),
        dict(id="P42", lat=28.105678, lng=113.208888, h=58.0, r=351.0),
        dict(id="P43", lat=28.110000, lng=113.215555, h=60.25, r=0.0),
    ]


def test_gim_roundtrip(tmp_path):
    gim_path = str(tmp_path / "corridor.gim")
    tree = build_synthetic_gim(gim_path, _towers(), workdir=str(tmp_path / "tree"))
    assert os.path.exists(os.path.join(tree, "Cbm", "project.cbm"))

    gim = GimFile.read(gim_path)
    assert len(gim.header) == HEADER_SIZE
    names = {e.name for e in gim.entries}
    assert "Cbm/project.cbm" in names

    out, header = extract_gim(gim_path, str(tmp_path / "out"))
    assert header == gim.header
    towers = load_towers_from_gim_folder(out)
    assert len(towers) == 3
    byid = {t.properties["杆塔编号"]: t for t in towers}
    assert abs(byid["P41"].lat - 28.101234) < 1e-9
    assert abs(byid["P42"].lng - 113.208888) < 1e-9
    assert byid["P43"].type == "TOWER"
    assert abs(byid["P42"].r - 351.0) < 1e-9


def test_gim_header_preserved_after_repack(tmp_path):
    gim_path = str(tmp_path / "a.gim")
    header = bytes(range(256)) * 4  # 1024 bytes -> truncated to 776
    build_synthetic_gim(gim_path, _towers(), workdir=str(tmp_path / "t"), header=header)
    out, hdr = extract_gim(gim_path, str(tmp_path / "x"))
    assert hdr == header[:HEADER_SIZE]
    out2 = str(tmp_path / "b.gim")
    write_gim(out, out2, header=hdr)
    assert GimFile.read(out2).header == hdr


def test_blha_writeback_formatting(tmp_path):
    tree = tmp_path / "tree"
    build_gim_tree(str(tree), _towers())
    cbm = tree / "Cbm" / "T0.cbm"
    assert update_cbm_blha(str(cbm), 28.5, 113.9, 77.123456, 45.6789)
    text = cbm.read_text(encoding="utf-8")
    # exact reference formatting: %.6f,%.6f,%.3f,%.3f (save_cbm.py:40)
    assert "BLHA=28.500000,113.900000,77.123,45.679\n" in text
    assert text.count("BLHA=") == 1
    # other lines untouched
    assert "GROUPTYPE=TOWER" in text
    assert "BASEFAMILY=T0.fam" in text


def test_blha_appended_when_missing(tmp_path):
    p = tmp_path / "no_blha.cbm"
    p.write_text("ENTITYNAME=x\n", encoding="utf-8")
    assert update_cbm_blha(str(p), 1, 2, 3, 4)
    assert p.read_text(encoding="utf-8").endswith("BLHA=1.000000,2.000000,3.000,4.000\n")


def test_apply_corrections_by_path_and_id(tmp_path):
    tree = tmp_path / "tree"
    build_gim_tree(str(tree), _towers())
    towers = load_towers_from_gim_folder(str(tree))
    rows = [
        {  # by stored cbm path
            "杆塔编号": "P41",
            "纬度": 28.2,
            "经度": 113.3,
            "高度": 50.0,
            "北方向偏角": 10.0,
            "CBM路径": towers[0].cbm_path,
        },
        {  # by tower-id heuristics: id P42 appears in no filename (files
           # are T<i>.cbm) -> falls back to substring search and fails
            "杆塔编号": "NOPE",
            "纬度": 0,
            "经度": 0,
            "高度": 0,
            "北方向偏角": 0,
        },
    ]
    assert apply_corrections(str(tree), rows) == 1
    updated = load_towers_from_gim_folder(str(tree))
    assert abs(updated[0].lat - 28.2) < 1e-9


def test_gim_rejects_bad_paths(tmp_path):
    with pytest.raises(ValueError, match="gim"):
        GimFile.read(str(tmp_path / "foo.txt"))
    short = tmp_path / "short.gim"
    short.write_bytes(b"tiny")
    with pytest.raises(ValueError, match="truncated"):
        GimFile.read(str(short))
