"""LAS 1.4 native LAZ (formats 6-10, layered compressor 3), variable
chunks, and the chunk-table-offset -1 layout (VERDICT r2 item 1).

The fixtures here are SPEC-BUILT, not produced by the codec under test:
a minimal INDEPENDENT Python implementation of the published FastAC
arithmetic coder + LASzip integer compressor (classes Py*) assembles
complete .laz byte images by hand — 1-point chunks make every point a
raw record and every layer empty, so the container bytes exercise the
layered chunk layout, the chunk table (fixed AND variable), and the
parked-table layout with no dependence on the compression internals.
A byte-exact conformance test then pins the native encoder's container
output against the hand-built image.
"""

import struct

import numpy as np
import pytest

from pointcloudhookup_tpu.io.las import POINT_DTYPES, make_las, read_las, write_las
from pointcloudhookup_tpu.io.laz import (
    build_laszip_vlr,
    encode_point_section,
    read_laz_bytes,
    write_laz,
)
from pointcloudhookup_tpu.native import get_laz_lib

pytestmark = pytest.mark.skipif(
    get_laz_lib() is None, reason="native LAZ codec unavailable (no g++)"
)

AC_MIN = 0x01000000
AC_MAX = 0xFFFFFFFF


# ------------------------------------------------- independent mini-coder
class PyModel:
    """FastAC adaptive symbol model (compress side)."""

    def __init__(self, n):
        self.n = n
        self.count = [1] * n
        self.dist = [0] * n
        self.total = 0
        self.cycle = n
        self._update()
        self.cycle = self.until = (n + 6) >> 1

    def _update(self):
        self.total += self.cycle
        if self.total > (1 << 15):
            self.total = 0
            for k in range(self.n):
                self.count[k] = (self.count[k] + 1) >> 1
                self.total += self.count[k]
        scale = 0x80000000 // self.total
        s = 0
        for k in range(self.n):
            self.dist[k] = (scale * s) >> 16  # 31 - 15
            s += self.count[k]
        self.cycle = min((5 * self.cycle) >> 2, (self.n + 6) << 3)
        self.until = self.cycle


class PyBit:
    def __init__(self):
        self.c0 = 1
        self.ct = 2
        self.p0 = 1 << 12
        self.cycle = self.until = 4

    def _update(self):
        self.ct += self.cycle
        if self.ct > (1 << 13):
            self.ct = (self.ct + 1) >> 1
            self.c0 = (self.c0 + 1) >> 1
            if self.c0 == self.ct:
                self.ct += 1
        scale = 0x80000000 // self.ct
        self.p0 = (self.c0 * scale) >> 18  # 31 - 13
        self.cycle = min((5 * self.cycle) >> 2, 64)
        self.until = self.cycle


class PyEncoder:
    def __init__(self):
        self.out = bytearray()
        self.base = 0
        self.length = AC_MAX

    def _carry(self):
        p = len(self.out) - 1
        while p >= 0 and self.out[p] == 0xFF:
            self.out[p] = 0
            p -= 1
        if p >= 0:
            self.out[p] += 1

    def _renorm(self):
        while True:
            self.out.append((self.base >> 24) & 0xFF)
            self.base = (self.base << 8) & 0xFFFFFFFF
            self.length = (self.length << 8) & 0xFFFFFFFF
            if self.length >= AC_MIN:
                break

    def bit(self, m, sym):
        x = m.p0 * (self.length >> 13)
        if sym == 0:
            self.length = x
            m.c0 += 1
        else:
            old = self.base
            self.base = (self.base + x) & 0xFFFFFFFF
            if old > self.base:
                self._carry()
            self.length -= x
        if self.length < AC_MIN:
            self._renorm()
        m.until -= 1
        if m.until == 0:
            m._update()

    def symbol(self, m, sym):
        old = self.base
        if sym == m.n - 1:
            x = m.dist[sym] * (self.length >> 15)
            self.base = (self.base + x) & 0xFFFFFFFF
            self.length -= x
        else:
            self.length >>= 15
            x = m.dist[sym] * self.length
            self.base = (self.base + x) & 0xFFFFFFFF
            self.length = m.dist[sym + 1] * self.length - x
        if old > self.base:
            self._carry()
        if self.length < AC_MIN:
            self._renorm()
        m.count[sym] += 1
        m.until -= 1
        if m.until == 0:
            m._update()

    def bits(self, nbits, sym):
        assert nbits <= 19
        old = self.base
        self.length >>= nbits
        self.base = (self.base + sym * self.length) & 0xFFFFFFFF
        if old > self.base:
            self._carry()
        if self.length < AC_MIN:
            self._renorm()

    def done(self):
        old = self.base
        if self.length > 2 * AC_MIN:
            self.base = (self.base + AC_MIN) & 0xFFFFFFFF
            self.length = AC_MIN >> 1
        else:
            self.base = (self.base + (AC_MIN >> 1)) & 0xFFFFFFFF
            self.length = AC_MIN >> 9
        if old > self.base:
            self._carry()
        self._renorm()
        self.out += b"\x00\x00\x00"
        return bytes(self.out)


class PyIC:
    """LASzip integer compressor (32 bits, k contexts), compress side."""

    def __init__(self, contexts):
        self.mBits = [PyModel(33) for _ in range(contexts)]
        self.corr0 = PyBit()
        self.mCorr = [None] + [PyModel(1 << min(k, 8)) for k in range(1, 33)]

    def compress(self, enc, pred, real, ctx):
        corr = ((real - pred + (1 << 31)) % (1 << 32)) - (1 << 31)
        c1 = (-corr) if corr <= 0 else (corr - 1)
        k = c1.bit_length()
        enc.symbol(self.mBits[ctx], k)
        if k:
            if k < 32:
                cu = (corr - 1) if corr >= 0 else (corr + (1 << k) - 1)
                if k <= 8:
                    enc.symbol(self.mCorr[k], cu)
                else:
                    k1 = k - 8
                    enc.symbol(self.mCorr[k], cu >> k1)
                    enc.bits(k1, cu & ((1 << k1) - 1))
        else:
            enc.bit(self.corr0, corr)


# -------------------------------------------------- hand-built fixtures
def _point14_record(x, y, z, intensity=100, ret=1, nret=1, chan=0, cls=2,
                    gps=0.0):
    rec = np.zeros(30, np.uint8)
    struct.pack_into("<iiiH", rec, 0, x, y, z, intensity)
    rec[14] = ret | (nret << 4)
    rec[15] = chan << 4
    rec[16] = cls
    struct.pack_into("<hH", rec, 18, 0, 0)
    struct.pack_into("<d", rec, 22, gps)
    return rec


def build_fixture_laz(coords, scale=0.01, variable=False, park_table=False,
                      fmt=6):
    """Hand-assemble a complete .laz image: LAS 1.4 header + LASzip VLR
    (compressor 3) + layered point section of 1-POINT chunks (raw record
    + u32 count + zero/flush layer sizes) + spec-coded chunk table."""
    n = len(coords)
    n_layers = {6: 9, 7: 10}[fmt]
    record_len = {6: 30, 7: 36}[fmt]
    recs = []
    for cx, cy, cz in coords:
        r = np.zeros(record_len, np.uint8)
        r[:30] = _point14_record(int(round(cx / scale)), int(round(cy / scale)),
                                 int(round(cz / scale)))
        recs.append(r)

    # --- chunks: raw point + count=1 + layer sizes + XY flush bytes
    flush = b"\x01\x00\x00\x00"  # arithmetic coder done() with no symbols
    chunks = []
    for r in recs:
        sizes = [len(flush)] + [0] * (n_layers - 1)
        chunks.append(
            r.tobytes() + struct.pack("<I", 1)
            + b"".join(struct.pack("<I", s) for s in sizes) + flush
        )
    chunk_blob = b"".join(chunks)

    # --- chunk table (version, count, IC-coded [count,]size entries)
    enc = PyEncoder()
    ic = PyIC(2)
    prev_cnt = prev_sz = 0
    for ch in chunks:
        if variable:
            ic.compress(enc, prev_cnt, 1, 0)
            prev_cnt = 1
        ic.compress(enc, prev_sz, len(ch), 1)
        prev_sz = len(ch)
    table = struct.pack("<II", 0, n) + enc.done()

    # --- LAS 1.4 header + VLR
    chunk_size = 0xFFFFFFFF if variable else 1
    vlr = build_laszip_vlr(fmt, chunk_size)
    header_size = 375
    point_offset = header_size + len(vlr)
    hdr = bytearray(header_size)
    hdr[0:4] = b"LASF"
    hdr[24] = 1
    hdr[25] = 4
    struct.pack_into("<HIIBH", hdr, 94, header_size, point_offset, 1,
                     fmt | 0x80, record_len)
    struct.pack_into("<I", hdr, 107, n)  # legacy count
    struct.pack_into("<3d", hdr, 131, scale, scale, scale)
    struct.pack_into("<3d", hdr, 155, 0.0, 0.0, 0.0)
    struct.pack_into("<Q", hdr, 247, n)  # 1.4 count64

    section_start = point_offset + 8
    if park_table:
        # non-seekable-writer layout: pointer field = -1; the table's
        # absolute position parks in the section's final 8 bytes
        table_abs = section_start + len(chunk_blob)
        body = (
            struct.pack("<q", -1) + chunk_blob + table
            + struct.pack("<q", table_abs)
        )
    else:
        table_abs = section_start + len(chunk_blob)
        body = struct.pack("<q", table_abs) + chunk_blob + table
    return bytes(hdr) + vlr + body, chunk_blob, table


FIXTURE_COORDS = [
    (100.00, 200.00, 50.00),
    (100.25, 200.10, 50.40),
    (100.50, 199.85, 51.10),
    (101.10, 200.90, 49.75),
    (99.40, 201.30, 50.05),
]


def test_spec_fixture_fixed_chunks_decodes():
    blob, _, _ = build_fixture_laz(FIXTURE_COORDS)
    las = read_laz_bytes(blob, "fixture")
    assert las.point_format == 6
    assert las.version == (1, 4)
    np.testing.assert_allclose(las.xyz(), FIXTURE_COORDS, atol=1e-9)


def test_spec_fixture_variable_chunks_decodes():
    blob, _, _ = build_fixture_laz(FIXTURE_COORDS, variable=True)
    las = read_laz_bytes(blob, "fixture-variable")
    np.testing.assert_allclose(las.xyz(), FIXTURE_COORDS, atol=1e-9)


def test_spec_fixture_parked_table_decodes():
    """chunk-table-offset -1: the table position sits in the final 8
    bytes of the point section."""
    blob, _, _ = build_fixture_laz(FIXTURE_COORDS, park_table=True)
    las = read_laz_bytes(blob, "fixture-parked")
    np.testing.assert_allclose(las.xyz(), FIXTURE_COORDS, atol=1e-9)


def test_spec_fixture_variable_parked_combined():
    blob, _, _ = build_fixture_laz(
        FIXTURE_COORDS, variable=True, park_table=True
    )
    las = read_laz_bytes(blob, "fixture-vp")
    np.testing.assert_allclose(las.xyz(), FIXTURE_COORDS, atol=1e-9)


def test_native_encoder_container_bytes_match_fixture():
    """Byte-exact conformance: the native layered encoder's section for
    1-point chunks must equal the hand-assembled spec bytes (raw
    records, counts, layer sizes, flush, and the IC-coded chunk table)."""
    _, chunk_blob, table = build_fixture_laz(FIXTURE_COORDS)
    recs = np.stack([
        _point14_record(int(round(x / 0.01)), int(round(y / 0.01)),
                        int(round(z / 0.01)))
        for x, y, z in FIXTURE_COORDS
    ])
    section, table_rel = encode_point_section(recs, 6, chunk_size=1)
    assert section[:table_rel] == chunk_blob
    assert section[table_rel:] == table


# ------------------------------------------------------- full round trips
def _rich_records(rng, fmt, n):
    dt = POINT_DTYPES[fmt]
    pts = np.zeros(n, dt)
    pts["X"] = np.cumsum(rng.integers(-50, 80, n)) + 1_000_000
    pts["Y"] = np.cumsum(rng.integers(-60, 70, n)) + 2_000_000
    pts["Z"] = rng.normal(5000, 400, n).astype(np.int32)
    pts["intensity"] = rng.integers(0, 4096, n)
    nret = rng.integers(1, 6, n)
    ret = rng.integers(1, nret + 1)
    chan = rng.integers(0, 4, n)
    pts["return_info"] = ret | (nret << 4)
    pts["flags"] = (chan << 4) | rng.integers(0, 16, n)
    pts["classification"] = rng.choice([1, 2, 3, 5, 6], n)
    pts["user_data"] = rng.integers(0, 4, n)
    pts["scan_angle"] = rng.integers(-5000, 5000, n)
    pts["point_source_id"] = rng.choice([41, 42], n)
    pts["gps_time"] = 3.0e5 + np.cumsum(rng.uniform(0, 1e-4, n))
    if "red" in dt.names:
        for ch in ("red", "green", "blue"):
            pts[ch] = rng.integers(0, 65536, n)
    if "nir" in dt.names:
        pts["nir"] = rng.integers(0, 65536, n)
    if "wave_descriptor" in dt.names:
        pts["wave_descriptor"] = rng.integers(0, 3, n)
        pts["wave_offset"] = np.cumsum(rng.integers(0, 2048, n).astype(np.uint64))
        pts["wave_size"] = rng.integers(256, 2048, n)
        pts["wave_return_point"] = rng.uniform(0, 100, n).astype(np.float32)
        pts["wave_xt"] = rng.normal(0, 1, n).astype(np.float32)
        pts["wave_yt"] = rng.normal(0, 1, n).astype(np.float32)
        pts["wave_zt"] = rng.normal(0, 1, n).astype(np.float32)
    return pts


@pytest.mark.parametrize("fmt", [6, 7, 8, 9, 10])
def test_laz14_roundtrip_formats(fmt, tmp_path, rng):
    from pointcloudhookup_tpu.io.las import LasData

    n = 6000
    pts = _rich_records(rng, fmt, n)
    las = LasData(
        points=pts,
        scales=np.array([0.001, 0.001, 0.001]),
        offsets=np.zeros(3),
        point_format=fmt,
        version=(1, 4),
    )
    p = str(tmp_path / f"t{fmt}.laz")
    write_laz(las, p, chunk_size=1024)
    with open(p, "rb") as f:
        back = read_laz_bytes(f.read(), p)
    assert back.point_format == fmt
    assert np.array_equal(back.points, pts)


def test_laz14_via_read_las(tmp_path, rng):
    """read_las transparently routes .laz format-6 files."""
    e = rng.uniform(0, 100, (4000, 3)) + [500000, 3000000, 80]
    las = make_las(e, scales=[0.001, 0.001, 0.001], point_format=6,
                   version=(1, 4))
    p = str(tmp_path / "c.laz")
    write_laz(las, p)
    got = read_las(p)
    np.testing.assert_allclose(got.xyz(), las.xyz(), atol=1e-9)


def test_laz14_rejects_wrong_item_version(tmp_path, rng):
    """A format-6 file whose VLR claims v2 items must be refused with a
    clear error, not misdecoded."""
    e = rng.uniform(0, 10, (100, 3))
    las = make_las(e, point_format=6, version=(1, 4))
    p = str(tmp_path / "v.laz")
    write_laz(las, p)
    blob = bytearray(open(p, "rb").read())
    # item version fields live at the tail of the LASzip VLR payload
    header_size, point_offset = struct.unpack_from("<HI", blob, 94)
    vlr_bytes = bytes(blob[header_size:point_offset])
    idx = vlr_bytes.index(struct.pack("<HHH", 10, 30, 3))
    blob[header_size + idx + 4 : header_size + idx + 6] = struct.pack("<H", 2)
    with pytest.raises(ValueError, match="version"):
        read_laz_bytes(bytes(blob), "bad-version")
