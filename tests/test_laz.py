"""LAZ (LASzip) codec: encode/decode round-trips through the native
arithmetic codec, container plumbing, and read_las wiring.

Matches the reference's laspy LAS/LAZ ingest surface
(/root/reference/pyGUI_towers_test.py:144-197); the chunked
arithmetic-codec algorithm follows the LASzip format (POINT10/
GPSTIME11/RGB12 item v2, compressor 2)."""

import numpy as np
import pytest

from pointcloudhookup_tpu.io.las import make_las, read_las, write_las
from pointcloudhookup_tpu.io.laz import (
    build_laszip_vlr,
    parse_laszip_vlr,
    write_laz,
)
from pointcloudhookup_tpu.native import get_laz_lib

pytestmark = pytest.mark.skipif(
    get_laz_lib() is None, reason="native LAZ codec unavailable (no g++)"
)


def _make(fmt, n, rng, sorted_gps=True):
    xyz = np.cumsum(rng.normal(0, 0.3, (n, 3)), axis=0)
    las = make_las(xyz, scales=[0.01, 0.01, 0.01], point_format=fmt)
    las.points["intensity"] = rng.integers(0, 65536, n).astype(np.uint16)
    las.points["flags"] = (
        rng.integers(1, 6, n) | (rng.integers(1, 6, n) << 3) | (rng.integers(0, 2, n) << 6)
    ).astype(np.uint8)
    las.points["classification"] = rng.integers(0, 32, n).astype(np.uint8)
    las.points["scan_angle"] = rng.integers(-90, 91, n).astype(np.int8)
    las.points["user_data"] = rng.integers(0, 256, n).astype(np.uint8)
    las.points["point_source_id"] = rng.integers(0, 8, n).astype(np.uint16)
    if "gps_time" in las.points.dtype.names:
        t = rng.uniform(3e5, 3e5 + 500, n)
        las.points["gps_time"] = np.sort(t) if sorted_gps else t
    for c in ("red", "green", "blue"):
        if c in las.points.dtype.names:
            las.points[c] = rng.integers(0, 65536, n).astype(np.uint16)
    return las


@pytest.mark.parametrize("fmt", [0, 1, 2, 3])
def test_laz_roundtrip_formats(fmt, tmp_path):
    rng = np.random.default_rng(fmt)
    las = _make(fmt, 30000, rng)
    p = tmp_path / f"t{fmt}.laz"
    write_laz(las, p)
    back = read_las(p)
    assert back.point_format == fmt
    for f in las.points.dtype.names:
        assert np.array_equal(back.points[f], las.points[f]), f
    np.testing.assert_allclose(back.xyz(), las.xyz(), atol=0)


def test_laz_decode_matches_las_twin(tmp_path):
    """A LAZ encoding decodes byte-identical to its LAS twin's records."""
    rng = np.random.default_rng(11)
    las = _make(3, 60000, rng)
    laz_p, las_p = tmp_path / "c.laz", tmp_path / "c.las"
    write_laz(las, laz_p)
    write_las(las, las_p)
    a = read_las(laz_p)
    b = read_las(las_p)
    assert a.points.tobytes() == b.points.tobytes()
    np.testing.assert_array_equal(a.scales, b.scales)
    np.testing.assert_array_equal(a.offsets, b.offsets)


def test_laz_compresses(tmp_path):
    rng = np.random.default_rng(5)
    las = _make(0, 100000, rng)
    laz_p, las_p = tmp_path / "c.laz", tmp_path / "c.las"
    write_laz(las, laz_p)
    write_las(las, las_p)
    import os

    assert os.path.getsize(laz_p) < 0.7 * os.path.getsize(las_p)


@pytest.mark.parametrize("n,chunk", [(1, 50000), (2, 50000), (50000, 50000),
                                     (50001, 50000), (777, 100)])
def test_laz_chunk_boundaries(n, chunk, tmp_path):
    rng = np.random.default_rng(n)
    las = _make(0, n, rng)
    p = tmp_path / "t.laz"
    write_laz(las, p, chunk_size=chunk)
    back = read_las(p)
    assert back.points.tobytes() == las.points.tobytes()


def test_laz_gps_extremes(tmp_path):
    """Huge jumps + repeats exercise the full-value and sequence-switch
    paths of the GPSTIME11 coder."""
    rng = np.random.default_rng(3)
    las = _make(1, 20000, rng)
    t = las.points["gps_time"].copy()
    t[::97] += 1e9
    t[10:40] = 0.0
    t[50:60] = t[49]
    las.points["gps_time"] = t
    p = tmp_path / "t.laz"
    write_laz(las, p)
    back = read_las(p)
    assert np.array_equal(back.points["gps_time"], las.points["gps_time"])


def test_laz_rgb_grayscale(tmp_path):
    rng = np.random.default_rng(4)
    las = _make(2, 20000, rng)
    las.points["green"] = las.points["red"]
    las.points["blue"] = las.points["red"]
    p = tmp_path / "t.laz"
    write_laz(las, p)
    back = read_las(p)
    for f in ("red", "green", "blue"):
        assert np.array_equal(back.points[f], las.points[f])


def test_laszip_vlr_roundtrip():
    vlr = build_laszip_vlr(3, 50000)
    info = parse_laszip_vlr(vlr)
    assert info["compressor"] == 2 and info["coder"] == 0
    assert info["chunk_size"] == 50000
    assert [t for t, _, _ in info["items"]] == [6, 7, 8]  # POINT10, GPS, RGB
    assert all(v == 2 for _, _, v in info["items"])


def test_laz_extract_pipeline(tmp_path):
    """The extraction pipeline ingests .laz directly (reference parity:
    the GUI accepts LAS/LAZ in the same file dialog)."""
    from pointcloudhookup_tpu.io.synthetic import synthetic_corridor
    from pointcloudhookup_tpu.models import pipeline

    rng = np.random.default_rng(9)
    pts, centers = synthetic_corridor(
        rng, n_ground=3000, n_veg=500, pts_per_tower=350, extent=200.0
    )
    las = make_las(pts, scales=[0.01, 0.01, 0.01])
    p = tmp_path / "c.laz"
    write_laz(las, p)
    towers = pipeline.extract(str(p), eps=5.0, min_points=30)
    assert len(towers) == len(centers)


def test_laz_rejects_mismatched_record_len(tmp_path, rng):
    """A record_len that disagrees with the format layout must raise a
    clear error BEFORE any native decode (buffer-safety guard)."""
    import pytest

    from pointcloudhookup_tpu.io.laz import read_laz_bytes

    las = _make(1, 100, rng)
    p = str(tmp_path / "a.laz")
    write_laz(las, p)
    data = bytearray(open(p, "rb").read())
    import struct
    struct.pack_into("<H", data, 105, 30)  # claim 30-byte records (true: 28)
    with pytest.raises(ValueError, match="record_len 30"):
        read_laz_bytes(bytes(data), "a.laz")


def test_laz_v2_parked_table_and_variable_chunks(tmp_path, rng):
    """Round 2 rejected the chunk-table-offset -1 and variable-size
    chunk layouts; both are now SUPPORTED for the legacy formats too.
    The variable-chunk fixture is hand-built from the spec (1-point
    chunks: raw record + the 4-byte coder flush) with the independent
    Python coder from tests/test_laz14.py."""
    import struct

    import pytest

    from pointcloudhookup_tpu.io.laz import build_laszip_vlr, read_laz_bytes
    from tests.test_laz14 import PyEncoder, PyIC

    # --- parked-table layout on a real encoder output: move the table
    # pointer to -1 and append the parked position
    las = _make(0, 100, rng)
    p = str(tmp_path / "b.laz")
    write_laz(las, p)
    raw = open(p, "rb").read()
    data = bytearray(raw)
    header_size, point_offset, _ = struct.unpack_from("<HII", data, 94)
    table_abs = struct.unpack_from("<q", data, point_offset)[0]
    struct.pack_into("<q", data, point_offset, -1)
    data += struct.pack("<q", table_abs)
    got = read_laz_bytes(bytes(data), "parked.laz")
    assert np.array_equal(got.points, las.points)

    # --- genuinely corrupt parked pointer still raises cleanly
    bad = bytearray(raw)
    struct.pack_into("<q", bad, point_offset, -1)  # no parked position
    with pytest.raises(ValueError):
        read_laz_bytes(bytes(bad), "corrupt.laz")

    # --- spec-built v2 variable-chunk image (format 0, 1-pt chunks)
    coords = [(10.0, 20.0, 3.0), (10.5, 20.2, 3.1), (11.0, 19.8, 2.9)]
    scale = 0.01
    recs = []
    for x, y, z in coords:
        r = bytearray(20)
        struct.pack_into("<iii", r, 0, int(round(x / scale)),
                         int(round(y / scale)), int(round(z / scale)))
        recs.append(bytes(r))
    flush = b"\x01\x00\x00\x00"
    chunks = [r + flush for r in recs]
    enc = PyEncoder()
    ic = PyIC(2)
    prev_cnt = prev_sz = 0
    for ch in chunks:
        ic.compress(enc, prev_cnt, 1, 0)
        prev_cnt = 1
        ic.compress(enc, prev_sz, len(ch), 1)
        prev_sz = len(ch)
    table = struct.pack("<II", 0, len(chunks)) + enc.done()
    vlr = build_laszip_vlr(0, 0xFFFFFFFF)
    header_size = 227
    point_offset = header_size + len(vlr)
    hdr = bytearray(header_size)
    hdr[0:4] = b"LASF"
    hdr[24], hdr[25] = 1, 2
    struct.pack_into("<HIIBH", hdr, 94, header_size, point_offset, 1,
                     0 | 0x80, 20)
    struct.pack_into("<I", hdr, 107, len(coords))
    struct.pack_into("<3d", hdr, 131, scale, scale, scale)
    struct.pack_into("<3d", hdr, 155, 0.0, 0.0, 0.0)
    blob = b"".join(chunks)
    body = struct.pack("<q", point_offset + 8 + len(blob)) + blob + table
    las2 = read_laz_bytes(bytes(hdr) + vlr + body, "v2-variable")
    np.testing.assert_allclose(las2.xyz(), coords, atol=1e-9)


def test_render_point_colors_stay_aligned_past_display_cap(rng):
    """Caller-supplied colors must follow the display subsample."""
    from pointcloudhookup_tpu.viz.render import render_scene

    n = 3000
    pts = rng.uniform(-10, 10, size=(n, 3))
    colors = np.zeros((n, 3), np.uint8)
    colors[:, 0] = 255  # all red
    img = render_scene(
        pts, width=120, height=90, display_cap=500,
        point_colors=colors, background=(0, 0, 0),
    )
    lit = img.reshape(-1, 3)[img.reshape(-1, 3).sum(axis=1) > 0]
    assert len(lit) > 0 and (lit[:, 0] == 255).all()  # only red pixels


def test_laz_mutation_fuzz_raises_cleanly(tmp_path):
    """600 mutated/truncated .laz byte images across the v2 chunked and
    v3 layered containers: every rejection must be a ValueError (or the
    native codec's count-mismatch ValueError), never an IndexError /
    struct.error / segfault; byte images that still parse must return a
    LasData.  Mirrors the 7z fuzz (tests/test_sevenzip_bcj2.py)."""
    from pointcloudhookup_tpu.io.las import LasData
    from pointcloudhookup_tpu.io.laz import read_laz_bytes, write_laz

    rng = np.random.default_rng(17)
    images = []
    for fmt in (1, 6):
        las = _make(fmt, 4000, np.random.default_rng(fmt))
        p = tmp_path / f"f{fmt}.laz"
        write_laz(las, p)
        images.append(p.read_bytes())

    cases = 0
    accepted = 0
    while cases < 600:
        base = bytearray(images[cases % len(images)])
        mode = cases % 5
        if mode == 0:
            pos = int(rng.integers(0, len(base)))
            base[pos] ^= int(rng.integers(1, 256))
        elif mode == 1:
            base = base[: int(rng.integers(0, len(base)))]
        elif mode == 2:
            pos = int(rng.integers(0, max(len(base) - 16, 1)))
            base[pos:pos + 16] = rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
        elif mode == 3:
            base = base + rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
        else:  # mangle the header/VLR region specifically
            pos = int(rng.integers(0, min(500, len(base))))
            base[pos] ^= int(rng.integers(1, 256))
        cases += 1
        try:
            out = read_laz_bytes(bytes(base))
        except ValueError:
            continue
        except Exception as e:  # noqa: BLE001 — the assertion IS the test
            raise AssertionError(
                f"case {cases} mode {mode}: leaked {type(e).__name__}: {e}"
            )
        assert isinstance(out, LasData)
        accepted += 1
    # most single-byte payload flips decode (arithmetic streams absorb
    # them into wrong coordinates); the point is NO exception leaks
    assert cases == 600
