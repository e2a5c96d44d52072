import lzma
import struct

import pytest

from pointcloudhookup_tpu.io.sevenzip import (
    Entry,
    SevenZipError,
    extract_to_directory,
    pack_directory,
    read_7z,
    read_number,
    write_7z,
    write_number,
)


@pytest.mark.parametrize(
    "n", [0, 1, 0x7F, 0x80, 0x3FFF, 0x4000, 123456, 2**31, 2**56 - 1, 2**56, 2**63]
)
def test_number_roundtrip(n):
    import io

    assert read_number(io.BytesIO(write_number(n))) == n


def _sample_entries():
    return [
        Entry(name="Cbm", is_dir=True),
        Entry(name="Cbm/project.cbm", data="SUBSYSTEM=F1.cbm\n".encode("utf-8")),
        Entry(name="Cbm/F1.cbm", data="BLHA=28.1,113.2,55.5,3.0\n杆塔=塔\n".encode("utf-8")),
        Entry(name="empty.txt", data=b""),
        Entry(name="big.bin", data=bytes(range(256)) * 500),
    ]


@pytest.mark.parametrize("store", [False, True])
def test_7z_roundtrip(store):
    blob = write_7z(_sample_entries(), store=store)
    back = read_7z(blob)
    byname = {e.name: e for e in back}
    assert byname["Cbm"].is_dir
    assert byname["Cbm/project.cbm"].data == "SUBSYSTEM=F1.cbm\n".encode()
    assert "杆塔" in byname["Cbm/F1.cbm"].data.decode("utf-8")
    assert byname["empty.txt"].data == b"" and not byname["empty.txt"].is_dir
    assert byname["big.bin"].data == bytes(range(256)) * 500


def test_7z_directory_roundtrip(tmp_path):
    src = tmp_path / "src"
    (src / "Cbm" / "sub").mkdir(parents=True)
    (src / "Cbm" / "project.cbm").write_text("SUBSYSTEM=a.cbm\n", encoding="utf-8")
    (src / "Cbm" / "sub" / "a.fam").write_text("_=杆塔编号=P41\n", encoding="utf-8")
    blob = pack_directory(str(src), level=1)
    out = tmp_path / "out"
    out.mkdir()
    written = extract_to_directory(blob, str(out))
    assert (out / "Cbm" / "project.cbm").read_text(encoding="utf-8") == "SUBSYSTEM=a.cbm\n"
    assert (out / "Cbm" / "sub" / "a.fam").read_text(encoding="utf-8") == "_=杆塔编号=P41\n"
    assert len(written) == 2


def test_7z_bad_signature():
    with pytest.raises(SevenZipError):
        read_7z(b"NOT7ZZZ" + b"\x00" * 100)


def test_7z_reads_lzma1_folder():
    # Hand-build a single-file archive with an LZMA1 coder (the 7z CLI's
    # -m0=LZMA mode) to exercise the non-default codec path.
    payload = b"hello towers " * 100
    filters = [dict(id=lzma.FILTER_LZMA1, preset=6, dict_size=1 << 16)]
    comp = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=filters)
    packed = comp.compress(payload) + comp.flush()
    # LZMA1 props: (pb*5 + lp)*9 + lc, dict_size u32le; preset 6 -> lc=3 lp=0 pb=2
    props = bytes([(2 * 5 + 0) * 9 + 3]) + struct.pack("<I", 1 << 16)

    import io as _io
    from pointcloudhookup_tpu.io import sevenzip as sz

    hdr = _io.BytesIO()
    for b in [
        sz.write_number(sz.K_HEADER),
        sz.write_number(sz.K_MAIN_STREAMS),
        sz.write_number(sz.K_PACK_INFO),
        sz.write_number(0),
        sz.write_number(1),
        sz.write_number(sz.K_SIZE),
        sz.write_number(len(packed)),
        sz.write_number(sz.K_END),
        sz.write_number(sz.K_UNPACK_INFO),
        sz.write_number(sz.K_FOLDER),
        sz.write_number(1),
        b"\x00",
        sz.write_number(1),  # one coder
        bytes([len(sz.CODEC_LZMA1) | 0x20]),
        sz.CODEC_LZMA1,
        sz.write_number(len(props)),
        props,
        sz.write_number(sz.K_CODERS_UNPACK_SIZE),
        sz.write_number(len(payload)),
        sz.write_number(sz.K_END),
        sz.write_number(sz.K_END),
        sz.write_number(sz.K_FILES_INFO),
        sz.write_number(1),
        sz.write_number(sz.K_NAMES),
        sz.write_number(1 + len("a.txt".encode("utf-16-le")) + 2),
        b"\x00" + "a.txt".encode("utf-16-le") + b"\x00\x00",
        sz.write_number(sz.K_END),
        sz.write_number(sz.K_END),
    ]:
        hdr.write(b)
    header = hdr.getvalue()
    import zlib

    start = struct.pack("<QQI", len(packed), len(header), zlib.crc32(header))
    blob = (
        sz.MAGIC
        + bytes([0, 4])
        + struct.pack("<I", zlib.crc32(start))
        + start
        + packed
        + header
    )
    back = read_7z(blob)
    assert back[0].name == "a.txt"
    assert back[0].data == payload


def test_7z_encoded_header_roundtrip():
    """encode_header=True emits the kEncodedHeader layout the real 7z CLI
    writes at -mx defaults (ref: ui/save_cbm.py:72-89)."""
    blob = write_7z(_sample_entries(), level=9, encode_header=True)
    # the plain-header marker (kHeader byte right at the next-header
    # offset) must be replaced by kEncodedHeader (0x17)
    nh_offset, nh_size = struct.unpack_from("<QQ", blob, 12)
    assert blob[32 + nh_offset] == 0x17
    back = read_7z(blob)
    byname = {e.name: e for e in back}
    assert byname["big.bin"].data == bytes(range(256)) * 500
    assert byname["Cbm"].is_dir
    assert byname["empty.txt"].data == b""


def test_7z_crc_mismatch_detected():
    """Payload corruption must fail the (now-verified) substream CRCs."""
    blob = bytearray(write_7z(_sample_entries()))
    nh_offset, _ = struct.unpack_from("<QQ", blob, 12)
    # flip a byte inside the packed payload region (before the header)
    blob[32 + nh_offset // 2] ^= 0xFF
    with pytest.raises(SevenZipError):
        read_7z(bytes(blob))


def test_7z_mixed_folder_fixture():
    """Spec-built interop fixture (scripts/make_7z_fixture.py): two
    folders with MIXED CRC placement — folder 0 (a BCJ-x86+LZMA1 chain)
    has its CRC defined at folder level, folder 1 carries two substreams
    whose digests live in SubStreamsInfo — wrapped in an LZMA1 encoded
    header.  Real `7z a` archives mix these; the SubStreamsInfo digest
    vector must skip folder-covered streams or every following byte
    misaligns."""
    import os

    path = os.path.join(os.path.dirname(__file__), "fixtures", "mixed_folders.7z")
    with open(path, "rb") as fh:
        entries = read_7z(fh.read())
    byname = {e.name: e for e in entries}
    assert byname["prog.bin"].data == bytes.fromhex(
        "e8c0ffffff9090e8b0ffffff9090"
    ) * 64
    assert byname["blha.cbm"].data == (
        "BLHA=28.268279,113.768283,97.360,12.500\n".encode("utf-8") * 8
    )
    assert byname["props.fam"].data == "_=杆塔编号=P143\n_=呼高=36\n".encode("utf-8") * 8
    # CRCs surfaced on entries (folder-level for prog.bin, substream for rest)
    import zlib

    for e in entries:
        assert e.crc == zlib.crc32(e.data) & 0xFFFFFFFF


def test_gim_save_uses_encoded_header(tmp_path):
    """pipeline save path writes CLI-shaped archives end to end."""
    from pointcloudhookup_tpu.io.sevenzip import pack_directory

    src = tmp_path / "src"
    (src / "Cbm").mkdir(parents=True)
    (src / "Cbm" / "p.cbm").write_text("BLHA=28.1,113.2,55.5,3.0\n", encoding="utf-8")
    blob = pack_directory(str(src), level=9, encode_header=True)
    nh_offset, _ = struct.unpack_from("<QQ", blob, 12)
    assert blob[32 + nh_offset] == 0x17
    back = {e.name: e for e in read_7z(blob)}
    assert back["Cbm/p.cbm"].data == "BLHA=28.1,113.2,55.5,3.0\n".encode("utf-8")


def test_zip_slip_rejected(tmp_path):
    """Entry names escaping the extraction dir must be rejected
    (crafted .gim/7z inputs are untrusted external data)."""
    from pointcloudhookup_tpu.io.sevenzip import (
        Entry,
        extract_to_directory,
        write_7z,
    )

    for bad in ["../evil.txt", "/abs/evil.txt", "a/../../evil.txt", "C:/evil.txt"]:
        blob = write_7z([Entry(name=bad, data=b"x")])
        with pytest.raises(ValueError):
            extract_to_directory(blob, str(tmp_path / "out"))
    assert not (tmp_path / "evil.txt").exists()
