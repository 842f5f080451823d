"""Adam7-interlaced PNG decode — closes the last real-PNG boundary.

The encoder half lives here in the test: it slices the image into the
seven Adam7 passes with the same ``(x0, y0, dx, dy)`` indexing the
decoder scatters back through (PNG spec §8.2), filters each pass's
scanlines independently with types 0/1/2 (types 3/4 exercise the same
shared ``_unfilter`` path the sequential-layout tests already pin),
and concatenates the passes into one zlib stream.  Decoding is then
checked exactly against the source pixels, across color types, bit
depths, and the edge shapes that make individual passes empty.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from fscrawler_spark.functions import multimodal as MM

# (x_start, y_start, x_step, y_step) per PNG spec §8.2, pass 1..7
PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _adam7_png(
    lanes: np.ndarray, depth: int, color: int,
    plte: np.ndarray | None = None, filters=(0,),
) -> bytes:
    """Encode an interlaced PNG from an (h, w, bpp) byte-lane array."""
    h, w, bpp = lanes.shape
    idat = bytearray()
    for p, (x0, y0, dx, dy) in enumerate(PASSES):
        sub = lanes[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        flat = np.ascontiguousarray(sub).reshape(ph, pw * bpp)
        prev = np.zeros(pw * bpp, np.uint8)
        for i in range(ph):
            row = flat[i]
            f = filters[(i + p) % len(filters)]
            if f == 0:
                enc = row
            elif f == 1:  # Sub (uint8 wrap-around subtraction)
                left = np.concatenate(
                    [np.zeros(bpp, np.uint8), row[:-bpp]]
                ) if row.size > bpp else np.zeros_like(row)
                enc = row - left
            else:  # Up — filters reset at every pass boundary
                enc = row - prev
            idat += bytes([f]) + enc.astype(np.uint8).tobytes()
            prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 1)
    parts = [MM.PNG_MAGIC, _chunk(b"IHDR", ihdr)]
    if plte is not None:
        parts.append(_chunk(b"PLTE", plte.astype(np.uint8).tobytes()))
    parts.append(_chunk(b"IDAT", zlib.compress(bytes(idat))))
    parts.append(_chunk(b"IEND", b""))
    return b"".join(parts)


@pytest.mark.parametrize(
    "w,h", [(1, 1), (2, 3), (5, 7), (8, 8), (9, 10), (16, 16), (33, 17)]
)
def test_adam7_gray_shapes_exact(w, h):
    """Edge shapes leave individual passes empty (w<5 empties pass 2,
    h<3 empties pass 7, 1x1 keeps only pass 1) — decode stays exact."""
    rng = np.random.default_rng(w * 100 + h)
    img = rng.integers(0, 256, (h, w, 1), dtype=np.uint8)
    got = MM.decode_image_py(_adam7_png(img, 8, 0, filters=(0, 1, 2)))
    assert got[:3] == (w, h, 1)
    np.testing.assert_array_equal(got[3], img)


@pytest.mark.parametrize("color,c", [(2, 3), (4, 2), (6, 4)])
def test_adam7_color_types_exact(color, c):
    rng = np.random.default_rng(color)
    img = rng.integers(0, 256, (13, 11, c), dtype=np.uint8)
    got = MM.decode_image_py(_adam7_png(img, 8, color, filters=(1, 2, 0)))
    assert got[:3] == (11, 13, c)
    np.testing.assert_array_equal(got[3], img)


def test_adam7_gray16_exact():
    rng = np.random.default_rng(16)
    wide = rng.integers(0, 65536, (9, 6, 1), dtype=np.uint16)
    lanes = np.concatenate(  # big-endian byte pair per sample
        [(wide >> 8).astype(np.uint8), (wide & 0xFF).astype(np.uint8)],
        axis=2,
    )
    got = MM.decode_image_py(_adam7_png(lanes, 16, 0, filters=(2, 1)))
    assert got[:3] == (6, 9, 1)
    np.testing.assert_array_equal(got[3], wide)


def test_adam7_palette_exact():
    rng = np.random.default_rng(3)
    plte = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (10, 12, 1), dtype=np.uint8)
    got = MM.decode_image_py(_adam7_png(idx, 8, 3, plte=plte))
    assert got[:3] == (12, 10, 3)
    np.testing.assert_array_equal(got[3], plte[idx[:, :, 0]])


def test_adam7_matches_sequential_decode():
    """The same pixels encoded interlaced and non-interlaced (via the
    module's own encoder) decode byte-identically."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (21, 19, 3), dtype=np.uint8)
    seq = MM.decode_image_py(MM.encode_png(img))
    inter = MM.decode_image_py(_adam7_png(img, 8, 2, filters=(2, 0, 1)))
    np.testing.assert_array_equal(seq[3], inter[3])
    assert seq[:3] == inter[:3]


def test_adam7_truncated_idat_contained():
    """A short pixel stream raises inside DECODE_ERRORS (never a wrong
    image, never an uncontained crash)."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = bytearray(_adam7_png(img, 8, 2))
    # rebuild with the deflate stream cut short but still valid zlib
    # (strip the IDAT crc and the IEND chunk's length prefix: 8 bytes)
    raw = zlib.decompress(
        bytes(data)[8 + 25:].split(b"IDAT", 1)[1].rsplit(b"IEND", 1)[0][:-8]
    )
    short = zlib.compress(raw[: len(raw) // 2])
    bad = (
        bytes(data[: 8 + 25])
        + _chunk(b"IDAT", short) + _chunk(b"IEND", b"")
    )
    with pytest.raises(MM.DECODE_ERRORS):
        MM.decode_image_py(bad)


@pytest.mark.parametrize(
    "shape", [(1, 1), (3, 2), (7, 5, 2), (16, 16, 3), (17, 33, 4)]
)
def test_encode_png_interlace_roundtrips(shape):
    """encode_png(interlace=True) — the module's own Adam7 writer —
    round-trips exactly through the decoder at every channel count and
    at edge shapes that empty individual passes."""
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    blob = MM.encode_png(img, interlace=True)
    assert blob[28] == 1  # IHDR interlace byte
    w, h, c, out = MM.decode_image_py(blob)
    exp = img if img.ndim == 3 else img[:, :, None]
    assert (w, h, c) == (exp.shape[1], exp.shape[0], exp.shape[2])
    np.testing.assert_array_equal(out, exp)


def test_interlaced_huge_dims_contained_before_allocation():
    """A ~60-byte interlaced PNG claiming huge dims must raise a
    contained ValueError from the arithmetic stream-length check, not
    an uncontained MemoryError from allocating the lanes grid
    (ADVICE r4 item 2)."""
    ihdr = struct.pack(">IIBBBBB", 1 << 30, 1 << 30, 8, 0, 0, 0, 1)
    blob = (
        MM.PNG_MAGIC + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + _chunk(b"IEND", b"")
    )
    assert len(blob) < 100
    with pytest.raises(ValueError):
        MM.decode_image_py(blob)
