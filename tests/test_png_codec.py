"""functions/png.py — the pure-stdlib PNG pixel codec.

The oracle-parity suite already proves the END-TO-END contract (Spark
kernel decode == DuckDB recipe recomputation); these tests pin the codec
itself: encode→decode round trips (including multi-block stored deflate),
all five scanline filter reconstructions against independently filtered
streams, and the adler32 layer actually being validated."""

from __future__ import annotations

import binascii
import struct
import zlib

import numpy as np
import pytest

from pdf_craft_spark.functions.png import (
    decode_png_rgb,
    encode_png_rgb,
    resample_nearest,
    rgb_features,
)


def _arr(h: int, w: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8).astype(np.uint8)


def test_encode_decode_roundtrip():
    for h, w in [(1, 1), (5, 14), (23, 23), (3, 1)]:
        a = _arr(h, w)
        out = decode_png_rgb(encode_png_rgb(a))
        assert out is not None and (out == a).all(), (h, w)


def test_encode_decode_multiblock():
    # raw scanlines 128*(3*200+1) = 76928 bytes > 0xFFFF: needs >1 stored
    # deflate block; the stream must still inflate to the same pixels
    a = _arr(128, 200)
    png = encode_png_rgb(a)
    out = decode_png_rgb(png)
    assert out is not None and (out == a).all()


def _encode_with_filter(arr: np.ndarray, ftype) -> bytes:
    """Independent writer: real CRCs, zlib.compress, and scanlines run
    through the REAL PNG filter functions — exercises decode paths the
    repo's own encoder (always filter 0) never produces.  ``ftype`` is a
    single filter id or a per-row list (adaptive filtering, like libpng)."""
    h, w, _ = arr.shape
    ftypes = [ftype] * h if isinstance(ftype, int) else list(ftype)
    stride = 3 * w
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        ftype = ftypes[y]
        line = arr[y].reshape(-1).astype(np.int16)
        f = bytearray([ftype])
        for x in range(stride):
            a = int(line[x - 3]) if x >= 3 else 0
            b = int(prev[x])
            c = int(prev[x - 3]) if x >= 3 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            f.append((int(line[x]) - pred) & 0xFF)
        raw += f
        prev = line

    def chunk(tag: bytes, payload: bytes) -> bytes:
        crc = binascii.crc32(tag + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_decode_all_filter_types(ftype):
    a = _arr(9, 11, seed=ftype + 1)
    out = decode_png_rgb(_encode_with_filter(a, ftype))
    assert out is not None and (out == a).all(), ftype


def test_serial_filter_pixel_cap(monkeypatch):
    """Average/Paeth scanlines reconstruct in per-byte Python loops, so
    the SERIAL WORK (pixels in such rows, not total image size) is capped
    (CPU-amplification guard); the vectorized filters (None/Up/Sub) keep
    the full pixel budget, and a large image with only a few adaptive
    Average/Paeth rows — the libpng-default shape — still decodes."""
    import pdf_craft_spark.functions.png as png

    monkeypatch.setattr(png, "MAX_SERIAL_FILTER_PIXELS", 64)
    a = _arr(9, 11, seed=7)  # 99 px total; 9 serial rows x 11 = 99 > cap
    assert png.decode_png_rgb(_encode_with_filter(a, 4)) is None
    assert png.decode_png_rgb(_encode_with_filter(a, 3)) is None
    for vectorized in (0, 1, 2):
        out = png.decode_png_rgb(_encode_with_filter(a, vectorized))
        assert out is not None and (out == a).all(), vectorized
    # adaptive filtering: image BIGGER than the cap but only 2 serial rows
    # (22 px of serial work ≤ 64) must decode — the bound is on the work
    mixed = [0, 4, 2, 1, 0, 3, 0, 0, 0]
    out = png.decode_png_rgb(_encode_with_filter(a, mixed))
    assert out is not None and (out == a).all()
    small = _arr(4, 5, seed=8)  # 20 px of serial work ≤ cap
    out = png.decode_png_rgb(_encode_with_filter(small, 4))
    assert out is not None and (out == small).all()


def test_decode_rejects_bad_adler():
    png = bytearray(encode_png_rgb(_arr(4, 4)))
    # last adler byte sits 17 bytes from the end: 12 (IEND chunk) + 4
    # (IDAT crc) + 1
    png[-17] ^= 0xFF
    assert decode_png_rgb(bytes(png)) is None


def test_decode_rejects_unsupported_layouts():
    # grayscale (color type 0) must fall back to None, not garbage
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    raw = bytes(5) * 4

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", binascii.crc32(tag + payload) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert decode_png_rgb(png) is None
    assert decode_png_rgb(b"") is None
    assert decode_png_rgb(b"\x89PNG\r\n\x1a\n") is None


def test_resample_floor_index_math():
    a = _arr(10, 7)
    t = resample_nearest(a, 3, 4)
    assert t.shape == (4, 3, 3)
    for ty in range(4):
        for tx in range(3):
            assert (t[ty, tx] == a[(ty * 10) // 4, (tx * 7) // 3]).all()
    # pass-through targets are the identity selection
    assert (resample_nearest(a, 7, 10) == a).all()


def test_rgb_features_exact():
    a = np.zeros((2, 2, 3), dtype=np.uint8)
    a[0, 0] = (10, 20, 30)
    a[1, 1] = (250, 0, 90)
    f = rgb_features(a)
    assert f[0] == (10 + 250) / 4
    assert f[1] == 20 / 4
    assert f[2] == (30 + 90) / 4
    assert f[3] == 0.0 and f[4] == 250.0
    assert f[5] == (10 + 20 + 30 + 250 + 90) / 12
    assert f[6] == 10.0 and f[7] == 90.0


def test_decode_rejects_decompression_bombs_cheaply():
    """Untrusted payloads: huge declared dims must be rejected BEFORE any
    inflate allocation, and a stream lying about its length must stop at
    the bounded read instead of materializing unbounded output."""
    import time

    # 40000x40000 declared (4.8 GB raw if believed), tiny actual stream
    zeros = zlib.compress(b"\x00" * 1024)

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", binascii.crc32(tag + payload) & 0xFFFFFFFF)
        )

    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 40000, 40000, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zeros)
        + chunk(b"IEND", b"")
    )
    t0 = time.time()
    assert decode_png_rgb(bomb) is None
    assert time.time() - t0 < 0.5  # rejected at the dims check, no inflate

    # sane dims (4x4) but the zlib stream inflates to far more: the
    # bounded read caps output at expected+1 and returns None
    liar = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 10_000_000))
        + chunk(b"IEND", b"")
    )
    assert decode_png_rgb(liar) is None

    # well-formed streams still decode under the same guards
    a = _arr(4, 4)
    assert decode_png_rgb(encode_png_rgb(a)) is not None
