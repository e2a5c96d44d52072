"""Generate tests/fixtures/mixed_folders.7z — a spec-built 7z archive the
reader must parse but that our writer cannot produce.

Covers the layout the real `7z a -mx=9` CLI emits for .gim payloads
(ref: /root/reference/ui/save_cbm.py:72-89) that a writer-only roundtrip
never exercises:

  * TWO folders: folder 0 a BCJ-x86 + LZMA1 coder chain with its CRC
    defined at folder level (UnpackInfo kCRC), folder 1 a plain LZMA1
    folder holding TWO substreams whose CRCs live in SubStreamsInfo.
    The SubStreamsInfo digest vector therefore covers ONLY folder 1's
    two streams — the mixed-CRC accounting that misaligned the old
    parser.
  * an encoded (LZMA1-compressed) header with a defined folder CRC.

Built from the public 7zFormat.txt structure description and python's
stdlib lzma only — independent of pointcloudhookup_tpu.io.sevenzip.
"""

import io
import lzma
import os
import struct
import zlib

K_HEADER = 0x01
K_MAIN_STREAMS = 0x04
K_FILES_INFO = 0x05
K_PACK_INFO = 0x06
K_UNPACK_INFO = 0x07
K_SUBSTREAMS_INFO = 0x08
K_SIZE = 0x09
K_CRC = 0x0A
K_FOLDER = 0x0B
K_CODERS_UNPACK_SIZE = 0x0C
K_NUM_UNPACK_STREAM = 0x0D
K_NAMES = 0x11
K_ENCODED_HEADER = 0x17
K_END = 0x00

MAGIC = b"7z\xbc\xaf\x27\x1c"
CODEC_LZMA1 = b"\x03\x01\x01"
CODEC_BCJ_X86 = b"\x03\x03\x01\x03"

FILE1 = bytes.fromhex("e8c0ffffff9090e8b0ffffff9090") * 64  # x86-ish calls
FILE2 = "BLHA=28.268279,113.768283,97.360,12.500\n".encode("utf-8") * 8
FILE3 = "_=杆塔编号=P143\n_=呼高=36\n".encode("utf-8") * 8


def num(v: int) -> bytes:
    """7z variable-length number."""
    if v < 0x80:
        return bytes([v])
    for n in range(1, 9):
        if n == 8 or v < (1 << (7 + 7 * n)):
            break
    if n == 8:
        return b"\xff" + v.to_bytes(8, "little")
    low = v & ((1 << (8 * n)) - 1)
    high = v >> (8 * n)
    mask = (0xFF << (8 - n)) & 0xFF
    return bytes([mask | high]) + low.to_bytes(n, "little")


def lzma1_props(dict_size: int, lc=3, lp=0, pb=2) -> bytes:
    return bytes([(pb * 5 + lp) * 9 + lc]) + struct.pack("<I", dict_size)


def lzma1_pack(payload: bytes, dict_size: int) -> bytes:
    comp = lzma.LZMACompressor(
        format=lzma.FORMAT_RAW,
        filters=[dict(id=lzma.FILTER_LZMA1, preset=6, dict_size=dict_size)],
    )
    return comp.compress(payload) + comp.flush()


def main():
    ds = 1 << 16
    # folder 0: BCJ-x86 + LZMA1 chain over FILE1.  python lzma applies
    # filters in compression order (x86 first, lzma last) = 7z's decode
    # chain packed -> LZMA1 -> BCJ -> data.
    comp0 = lzma.LZMACompressor(
        format=lzma.FORMAT_RAW,
        filters=[
            dict(id=lzma.FILTER_X86),
            dict(id=lzma.FILTER_LZMA1, preset=6, dict_size=ds),
        ],
    )
    packed0 = comp0.compress(FILE1) + comp0.flush()
    # folder 1: plain LZMA1 over FILE2+FILE3 (two substreams)
    payload1 = FILE2 + FILE3
    packed1 = lzma1_pack(payload1, ds)

    h = io.BytesIO()
    h.write(num(K_HEADER))
    h.write(num(K_MAIN_STREAMS))
    # ---- PackInfo: two packed streams
    h.write(num(K_PACK_INFO))
    h.write(num(0))  # pack pos
    h.write(num(2))
    h.write(num(K_SIZE))
    h.write(num(len(packed0)))
    h.write(num(len(packed1)))
    h.write(num(K_END))
    # ---- UnpackInfo
    h.write(num(K_UNPACK_INFO))
    h.write(num(K_FOLDER))
    h.write(num(2))
    h.write(b"\x00")  # not external
    # folder 0: coder0 = LZMA1(props), coder1 = BCJ; bind (in1 <- out0)
    h.write(num(2))  # two coders
    p0 = lzma1_props(ds)
    h.write(bytes([len(CODEC_LZMA1) | 0x20]))
    h.write(CODEC_LZMA1)
    h.write(num(len(p0)))
    h.write(p0)
    h.write(bytes([len(CODEC_BCJ_X86)]))
    h.write(CODEC_BCJ_X86)
    h.write(num(1))  # bind pair: BCJ input (in-stream 1)
    h.write(num(0))  #            <- LZMA1 output (out-stream 0)
    # folder 1: single LZMA1 coder
    h.write(num(1))
    h.write(bytes([len(CODEC_LZMA1) | 0x20]))
    h.write(CODEC_LZMA1)
    h.write(num(len(p0)))
    h.write(p0)
    h.write(num(K_CODERS_UNPACK_SIZE))
    h.write(num(len(FILE1)))  # folder0 out0 (LZMA1 -> BCJ input)
    h.write(num(len(FILE1)))  # folder0 out1 (BCJ, final)
    h.write(num(len(payload1)))  # folder1 out0
    # folder CRCs: defined ONLY for folder 0
    h.write(num(K_CRC))
    h.write(b"\x00")  # not all defined
    h.write(bytes([0b10000000]))  # bit per folder, MSB first
    h.write(struct.pack("<I", zlib.crc32(FILE1) & 0xFFFFFFFF))
    h.write(num(K_END))
    # ---- SubStreamsInfo: folder1 has 2 substreams; digests only for the
    # streams NOT covered by a folder CRC (folder1's two)
    h.write(num(K_SUBSTREAMS_INFO))
    h.write(num(K_NUM_UNPACK_STREAM))
    h.write(num(1))
    h.write(num(2))
    h.write(num(K_SIZE))
    h.write(num(len(FILE2)))  # folder1 first substream (last is implied)
    h.write(num(K_CRC))
    h.write(b"\x01")  # all (unknown-CRC streams) defined
    h.write(struct.pack("<I", zlib.crc32(FILE2) & 0xFFFFFFFF))
    h.write(struct.pack("<I", zlib.crc32(FILE3) & 0xFFFFFFFF))
    h.write(num(K_END))
    h.write(num(K_END))  # end MainStreams
    # ---- FilesInfo
    names = "\x00".join(["prog.bin", "blha.cbm", "props.fam"])
    nblob = b"\x00" + names.encode("utf-16-le") + b"\x00\x00"
    h.write(num(K_FILES_INFO))
    h.write(num(3))
    h.write(num(K_NAMES))
    h.write(num(len(nblob)))
    h.write(nblob)
    h.write(num(K_END))
    h.write(num(K_END))
    header = h.getvalue()

    # ---- encoded header (LZMA1) with defined folder CRC
    hpacked = lzma1_pack(header, ds)
    top = io.BytesIO()
    top.write(num(K_ENCODED_HEADER))
    top.write(num(K_PACK_INFO))
    top.write(num(len(packed0) + len(packed1)))
    top.write(num(1))
    top.write(num(K_SIZE))
    top.write(num(len(hpacked)))
    top.write(num(K_END))
    top.write(num(K_UNPACK_INFO))
    top.write(num(K_FOLDER))
    top.write(num(1))
    top.write(b"\x00")
    top.write(num(1))
    top.write(bytes([len(CODEC_LZMA1) | 0x20]))
    top.write(CODEC_LZMA1)
    top.write(num(len(p0)))
    top.write(p0)
    top.write(num(K_CODERS_UNPACK_SIZE))
    top.write(num(len(header)))
    top.write(num(K_CRC))
    top.write(b"\x01")
    top.write(struct.pack("<I", zlib.crc32(header) & 0xFFFFFFFF))
    top.write(num(K_END))
    top.write(num(K_END))
    topb = top.getvalue()

    nh_offset = len(packed0) + len(packed1) + len(hpacked)
    start = struct.pack("<QQI", nh_offset, len(topb), zlib.crc32(topb) & 0xFFFFFFFF)
    blob = (
        MAGIC
        + bytes([0, 4])
        + struct.pack("<I", zlib.crc32(start) & 0xFFFFFFFF)
        + start
        + packed0
        + packed1
        + hpacked
        + topb
    )
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "mixed_folders.7z")
    with open(path, "wb") as fh:
        fh.write(blob)
    print(f"wrote {path} ({len(blob)} bytes)")


if __name__ == "__main__":
    main()
