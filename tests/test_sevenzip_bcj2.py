"""BCJ2 folder support + corrupt-archive robustness (VERDICT r2 item 6).

The fixture ENCODER here is an independent test-side implementation of
the published BCJ2 method (LZMA-style binary range coder + x86 branch
conversion) — the product only ships the decoder, so round-tripping a
spec-built stream through `_bcj2_decode` is an external-interop check,
not the codec testing itself.  A full .7z container with the real-world
BCJ2 folder layout (LZMA1 main leg + raw call/jump/rc legs) is
hand-assembled byte-by-byte from the 7zFormat.txt structures.

The fuzz test mutates/truncates valid archives 1000 ways and asserts
every failure surfaces as SevenZipError/ValueError — never an
IndexError/struct.error/MemoryError crash.
"""

import io
import lzma
import struct
import zlib

import numpy as np
import pytest

from pointcloudhookup_tpu.io.sevenzip import (
    MAGIC,
    Entry,
    SevenZipError,
    _bcj2_decode,
    read_7z,
    write_7z,
    write_number,
)


# ---------------------------------------------------------------- encoder
class _RangeEncoder:
    """LZMA binary range encoder (11-bit model, 5-bit move), test-side."""

    def __init__(self):
        self.low = 0
        self.range = 0xFFFFFFFF
        self.cache = 0
        self.cache_size = 1
        self.out = bytearray()

    def _shift_low(self):
        if self.low < 0xFF000000 or self.low > 0xFFFFFFFF:
            carry = self.low >> 32
            temp = self.cache
            while True:
                self.out.append((temp + carry) & 0xFF)
                temp = 0xFF
                self.cache_size -= 1
                if self.cache_size == 0:
                    break
            self.cache = (self.low >> 24) & 0xFF
        self.cache_size += 1
        self.low = (self.low << 8) & 0xFFFFFFFF

    def encode_bit(self, probs, i, bit):
        bound = (self.range >> 11) * probs[i]
        if bit == 0:
            self.range = bound
            probs[i] += (2048 - probs[i]) >> 5
        else:
            self.low += bound
            self.range -= bound
            probs[i] -= probs[i] >> 5
        if self.range < (1 << 24):
            self.range = (self.range << 8) & 0xFFFFFFFF
            self._shift_low()

    def flush(self):
        for _ in range(5):
            self._shift_low()
        return bytes(self.out)


def bcj2_encode(data: bytes):
    """Split `data` into BCJ2 (main, call, jump, rc) streams."""
    probs = [1024] * (2 + 256)
    rc = _RangeEncoder()
    main = bytearray()
    call = bytearray()
    jump = bytearray()
    i = 0
    prev = 0
    while i < len(data):
        b = data[i]
        main.append(b)
        i += 1
        is_branch = (b & 0xFE) == 0xE8 or (prev == 0x0F and (b & 0xF0) == 0x80)
        if is_branch:
            idx = prev if b == 0xE8 else (256 if b == 0xE9 else 257)
            convert = i + 4 <= len(data)
            rc.encode_bit(probs, idx, 1 if convert else 0)
            if convert:
                rel = int.from_bytes(data[i : i + 4], "little")
                absolute = (rel + i + 4) & 0xFFFFFFFF
                (call if b == 0xE8 else jump).extend(absolute.to_bytes(4, "big"))
                i += 4
                prev = (rel >> 24) & 0xFF
                continue
        prev = b
    return bytes(main), bytes(call), bytes(jump), rc.flush()


def _x86ish_blob(rng, n=4000):
    """Pseudo machine code: random bytes salted with call/jump opcodes
    followed by plausible relative displacements."""
    data = bytearray(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
    k = 0
    while k < n - 8:
        r = int(rng.integers(0, 10))
        if r == 0:
            data[k] = 0xE8
            struct.pack_into("<i", data, k + 1, int(rng.integers(-5000, 5000)))
            k += 5
        elif r == 1:
            data[k] = 0xE9
            struct.pack_into("<i", data, k + 1, int(rng.integers(-5000, 5000)))
            k += 5
        elif r == 2:
            data[k] = 0x0F
            data[k + 1] = 0x80 + int(rng.integers(0, 16))
            struct.pack_into("<i", data, k + 2, int(rng.integers(-5000, 5000)))
            k += 6
        else:
            k += int(rng.integers(1, 7))
    return bytes(data)


def test_bcj2_stream_roundtrip(rng):
    data = _x86ish_blob(rng)
    main, call, jump, ctrl = bcj2_encode(data)
    assert len(call) + len(jump) > 0  # conversions actually happened
    assert len(main) < len(data)  # addresses moved out of main
    out = _bcj2_decode(main, call, jump, ctrl, len(data))
    assert out == data


def test_bcj2_trailing_branch_byte(rng):
    """A branch opcode in the last 3 bytes still costs a prob bit
    (bit=0); decoder must stay in sync."""
    data = _x86ish_blob(rng, 600)[:-3] + b"\x12\xe8\x01"
    main, call, jump, ctrl = bcj2_encode(data)
    assert _bcj2_decode(main, call, jump, ctrl, len(data)) == data


def test_bcj2_truncated_streams_raise(rng):
    data = _x86ish_blob(rng, 1200)
    main, call, jump, ctrl = bcj2_encode(data)
    with pytest.raises(SevenZipError):
        _bcj2_decode(main[: len(main) // 2], call, jump, ctrl, len(data))
    if call:
        with pytest.raises(SevenZipError):
            _bcj2_decode(main, call[:1], jump, ctrl, len(data))
    with pytest.raises(SevenZipError):
        _bcj2_decode(main, call, jump, b"", len(data))


# ------------------------------------------------------- full container
def build_bcj2_archive(data: bytes, name: str = "code.bin") -> bytes:
    """Hand-assemble a .7z whose single folder is the real-world BCJ2
    layout: LZMA1-compressed main leg, raw call/jump/rc legs.

    Coder graph (7zFormat.txt):
      coder0 LZMA1  (in stream 0 <- pack0, out stream 0)
      coder1 BCJ2   (in streams 1..4, out stream 1 = final)
      bind pair: in 1 <- out 0; packed streams feed ins 0,2,3,4.
    """
    main, call, jump, ctrl = bcj2_encode(data)
    # LZMA1 raw-compress the main leg
    lc, lp, pb, dict_size = 3, 0, 2, 1 << 16
    filt = [dict(id=lzma.FILTER_LZMA1, lc=lc, lp=lp, pb=pb, dict_size=dict_size)]
    comp = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=filt)
    main_packed = comp.compress(main) + comp.flush()
    props = bytes([(pb * 5 + lp) * 9 + lc]) + struct.pack("<I", dict_size)

    packs = [main_packed, call, jump, ctrl]

    h = io.BytesIO()
    w = h.write
    w(write_number(0x01))  # kHeader
    w(write_number(0x04))  # kMainStreamsInfo
    # PackInfo
    w(write_number(0x06))
    w(write_number(0))  # pack pos
    w(write_number(len(packs)))
    w(write_number(0x09))  # kSize
    for p in packs:
        w(write_number(len(p)))
    w(write_number(0x00))  # end PackInfo
    # UnpackInfo
    w(write_number(0x07))
    w(write_number(0x0B))  # kFolder
    w(write_number(1))  # one folder
    w(bytes([0]))  # not external
    w(write_number(2))  # two coders
    w(bytes([0x03 | 0x20]))  # LZMA1: 3-byte id + props
    w(b"\x03\x01\x01")
    w(write_number(len(props)))
    w(props)
    w(bytes([0x04 | 0x10]))  # BCJ2: 4-byte id + complex
    w(b"\x03\x03\x01\x1b")
    w(write_number(4))  # num in
    w(write_number(1))  # num out
    w(write_number(1))  # bind pair: in 1 <- out 0
    w(write_number(0))
    for gi in (0, 2, 3, 4):  # packed stream -> input stream map
        w(write_number(gi))
    w(write_number(0x0C))  # kCodersUnpackSize
    w(write_number(len(main)))  # out of LZMA1
    w(write_number(len(data)))  # out of BCJ2 (final)
    w(write_number(0x0A))  # kCRC (folder)
    w(bytes([1]))  # all defined
    w(struct.pack("<I", zlib.crc32(data) & 0xFFFFFFFF))
    w(write_number(0x00))  # end UnpackInfo
    w(write_number(0x00))  # end StreamsInfo
    # FilesInfo
    w(write_number(0x05))
    w(write_number(1))
    w(write_number(0x11))  # kName
    nm = name.encode("utf-16-le") + b"\x00\x00"
    w(write_number(len(nm) + 1))
    w(bytes([0]))  # not external
    w(nm)
    w(write_number(0x00))  # end FilesInfo props
    w(write_number(0x00))  # end Header
    header = h.getvalue()

    payload = b"".join(packs)
    start = struct.pack("<QQI", len(payload), len(header), zlib.crc32(header) & 0xFFFFFFFF)
    return (
        MAGIC
        + bytes([0, 4])
        + struct.pack("<I", zlib.crc32(start) & 0xFFFFFFFF)
        + start
        + payload
        + header
    )


def test_bcj2_archive_extracts(rng):
    data = _x86ish_blob(rng, 6000)
    blob = build_bcj2_archive(data)
    entries = read_7z(blob)
    assert len(entries) == 1
    assert entries[0].name == "code.bin"
    assert entries[0].data == data


def test_bcj2_archive_bad_folder_crc(rng):
    data = _x86ish_blob(rng, 800)
    blob = bytearray(build_bcj2_archive(data))
    # flip one bit inside the packed call stream region
    blob[40] ^= 0x40
    with pytest.raises(SevenZipError):
        read_7z(bytes(blob))


# ------------------------------------------------------------------ fuzz
def _valid_archives(rng):
    texts = [
        Entry("a/b.cbm", b"BLHA=28.1,113.5,85.2,33.0\n" * 40),
        Entry("a", None, is_dir=True),
        Entry("empty.txt", b""),
    ]
    yield write_7z(texts, level=1)
    yield write_7z(texts, store=True)
    yield write_7z(texts, encode_header=True)
    yield build_bcj2_archive(_x86ish_blob(rng, 900))


def test_mutation_fuzz_raises_cleanly(rng):
    """1000 mutated/truncated archives: every rejection must be a
    SevenZipError/ValueError, and successes must return entries."""
    cases = 0
    archives = list(_valid_archives(rng))
    while cases < 1000:
        base = bytearray(archives[cases % len(archives)])
        mode = cases % 5
        if mode == 0:  # single byte flip
            pos = int(rng.integers(0, len(base)))
            base[pos] ^= int(rng.integers(1, 256))
        elif mode == 1:  # truncate
            base = base[: int(rng.integers(0, len(base)))]
        elif mode == 2:  # corrupt a whole run
            pos = int(rng.integers(0, max(len(base) - 16, 1)))
            base[pos : pos + 16] = rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
        elif mode == 3:  # grow garbage tail
            base = base + rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
        else:  # mangle the start header specifically
            pos = int(rng.integers(6, min(32, len(base))))
            base[pos] ^= int(rng.integers(1, 256))
        cases += 1
        try:
            entries = read_7z(bytes(base))
        except (SevenZipError, ValueError):
            continue
        except lzma.LZMAError as exc:  # must be wrapped, not leaked
            raise AssertionError(f"raw LZMAError leaked: {exc}")
        assert isinstance(entries, list)
