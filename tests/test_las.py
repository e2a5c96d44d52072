import numpy as np
import pytest

from pointcloudhookup_tpu.io.las import (
    POINT_DTYPES,
    LasData,
    make_las,
    read_las,
    write_las,
)


def test_las_roundtrip_basic(tmp_path, rng):
    xyz = np.column_stack(
        [
            rng.uniform(500000, 501000, 1000),
            rng.uniform(3100000, 3101000, 1000),
            rng.uniform(50, 150, 1000),
        ]
    )
    las = make_las(xyz, scales=[0.001, 0.001, 0.001])
    p = tmp_path / "a.las"
    write_las(las, p)
    back = read_las(p)
    assert len(back) == 1000
    assert back.point_format == 0
    np.testing.assert_allclose(back.xyz(), xyz, atol=0.0011)
    np.testing.assert_array_equal(back.scales, las.scales)
    np.testing.assert_array_equal(back.offsets, las.offsets)


@pytest.mark.parametrize("fmt", [1, 2, 3, 6, 7, 8])
def test_las_roundtrip_formats(tmp_path, rng, fmt):
    xyz = rng.uniform(0, 100, size=(50, 3))
    las = make_las(xyz, point_format=fmt)
    pts = las.points
    if "gps_time" in pts.dtype.names:
        pts["gps_time"] = rng.uniform(0, 1e6, 50)
    if "red" in pts.dtype.names:
        pts["red"] = rng.integers(0, 65535, 50)
    pts["intensity"] = rng.integers(0, 65535, 50)
    p = tmp_path / f"f{fmt}.las"
    write_las(las, p)
    back = read_las(p)
    assert back.point_format == fmt
    assert back.version == ((1, 4) if fmt >= 6 else (1, 2))
    np.testing.assert_allclose(back.xyz(), xyz, atol=0.0011)
    np.testing.assert_array_equal(back.points["intensity"], pts["intensity"])
    if "gps_time" in pts.dtype.names:
        np.testing.assert_array_equal(back.points["gps_time"], pts["gps_time"])
    if "red" in pts.dtype.names:
        np.testing.assert_array_equal(back.points["red"], pts["red"])


def test_las_reader_tolerates_extra_record_bytes(tmp_path, rng):
    # Files in the wild have extra bytes per record; reader must use the
    # declared record length as stride.
    xyz = rng.uniform(0, 10, size=(20, 3))
    las = make_las(xyz)
    p = tmp_path / "extra.las"
    write_las(las, p)
    raw = bytearray(p.read_bytes())
    # widen records by 5 bytes each
    import struct

    header_size = struct.unpack_from("<H", raw, 94)[0]
    point_offset = struct.unpack_from("<I", raw, 96)[0]
    rec_len = struct.unpack_from("<H", raw, 105)[0]
    body = raw[point_offset:]
    widened = b"".join(
        bytes(body[i * rec_len : (i + 1) * rec_len]) + b"\xab" * 5 for i in range(20)
    )
    struct.pack_into("<H", raw, 105, rec_len + 5)
    p2 = tmp_path / "extra2.las"
    p2.write_bytes(bytes(raw[:point_offset]) + widened)
    back = read_las(p2)
    np.testing.assert_allclose(back.xyz(), xyz, atol=0.0011)


def test_las_rejects_laz(tmp_path):
    las = make_las(np.zeros((1, 3)))
    p = tmp_path / "z.las"
    write_las(las, p)
    raw = bytearray(p.read_bytes())
    raw[104] |= 0x80  # compression bit
    p.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="LAZ"):
        read_las(p)


def test_las_big_coordinates_preserved(tmp_path):
    # CGCS2000-scale coordinates at mm scale survive the int32 encoding.
    xyz = np.array([[505123.456, 3123456.789, 123.456]])
    las = make_las(xyz, scales=[0.001, 0.001, 0.001])
    p = tmp_path / "big.las"
    write_las(las, p)
    np.testing.assert_allclose(read_las(p).xyz(), xyz, atol=5e-4)
