"""Sub-byte PNG depths (1/2/4-bit gray and palette) decode exactly.

The encoder half lives here: samples are packed MSB-first into
ceil(w*depth/8)-byte scanlines (spec §7.2), filtered bytewise with
bpp=1 (spec §9.2 floors the filter offset to one byte for sub-byte
depths), optionally sliced into Adam7 passes.  Gray samples must come
back scaled by exactly 255/(2^depth-1) (255, 85, 17 — all integral);
palette indices must come back as PLTE RGB rows.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from fscrawler_spark.functions import multimodal as MM

PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _pack_rows(samples: np.ndarray, depth: int) -> np.ndarray:
    """(h, w) samples -> (h, ceil(w*depth/8)) MSB-first packed bytes."""
    h, w = samples.shape
    bits = (
        (samples[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1
    ).reshape(h, w * depth).astype(np.uint8)
    return np.packbits(bits, axis=1)  # pads the final byte with zeros


def _filter_rows(rows: np.ndarray, filters) -> bytes:
    """Apply filter types 0/1/2 per scanline (bpp=1 lanes)."""
    out = bytearray()
    prev = np.zeros(rows.shape[1], np.uint8)
    for i in range(rows.shape[0]):
        f = filters[i % len(filters)]
        row = rows[i]
        if f == 0:
            enc = row
        elif f == 1:  # Sub with the spec's 1-byte offset
            left = np.concatenate([np.zeros(1, np.uint8), row[:-1]])
            enc = row - left
        else:  # Up
            enc = row - prev
        out += bytes([f]) + enc.astype(np.uint8).tobytes()
        prev = row
    return bytes(out)


def _subbyte_png(
    samples: np.ndarray, depth: int, color: int,
    plte: np.ndarray | None = None, interlace: int = 0, filters=(0,),
) -> bytes:
    h, w = samples.shape
    if not interlace:
        idat = _filter_rows(_pack_rows(samples, depth), filters)
    else:
        parts = []
        for p, (x0, y0, dx, dy) in enumerate(PASSES):
            sub = samples[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            parts.append(_filter_rows(
                _pack_rows(sub, depth), filters[p % len(filters):] or filters
            ))
        idat = b"".join(parts)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    parts = [MM.PNG_MAGIC, _chunk(b"IHDR", ihdr)]
    if plte is not None:
        parts.append(_chunk(b"PLTE", plte.astype(np.uint8).tobytes()))
    parts.append(_chunk(b"IDAT", zlib.compress(idat)))
    parts.append(_chunk(b"IEND", b""))
    return b"".join(parts)


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("w,h", [(1, 1), (7, 3), (8, 8), (13, 5), (17, 9)])
def test_gray_subbyte_exact(depth, w, h):
    """Widths that leave pad bits in the final byte decode exactly,
    scaled by the integral 255/(2^depth-1)."""
    rng = np.random.default_rng(depth * 100 + w + h)
    samples = rng.integers(0, 1 << depth, (h, w), dtype=np.uint8)
    blob = _subbyte_png(samples, depth, 0, filters=(0, 1, 2))
    gw, gh, gc, out = MM.decode_image_py(blob)
    assert (gw, gh, gc) == (w, h, 1)
    expect = samples * (255 // ((1 << depth) - 1))
    np.testing.assert_array_equal(out[:, :, 0], expect)


def test_gray_1bit_known_pixels():
    samples = np.array([[1, 0, 1], [0, 1, 1]], np.uint8)
    _, _, _, out = MM.decode_image_py(_subbyte_png(samples, 1, 0))
    assert out[:, :, 0].tolist() == [[255, 0, 255], [0, 255, 255]]


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_palette_subbyte_exact(depth):
    rng = np.random.default_rng(depth)
    n = 1 << depth
    plte = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, (6, 11), dtype=np.uint8)
    blob = _subbyte_png(idx, depth, 3, plte=plte, filters=(2, 0, 1))
    w, h, c, out = MM.decode_image_py(blob)
    assert (w, h, c) == (11, 6, 3)
    np.testing.assert_array_equal(out, plte[idx])


@pytest.mark.parametrize("depth", [1, 4])
@pytest.mark.parametrize("w,h", [(3, 2), (9, 10), (16, 16), (21, 13)])
def test_adam7_subbyte_exact(depth, w, h):
    """Interlaced sub-byte: every pass packs its own scanlines into
    its own ceil(pw*depth/8)-byte stride — decode stays exact at edge
    shapes that empty passes or leave pad bits per pass."""
    rng = np.random.default_rng(depth * 1000 + w * 10 + h)
    samples = rng.integers(0, 1 << depth, (h, w), dtype=np.uint8)
    blob = _subbyte_png(samples, depth, 0, interlace=1, filters=(0, 2, 1))
    gw, gh, gc, out = MM.decode_image_py(blob)
    assert (gw, gh, gc) == (w, h, 1)
    expect = samples * (255 // ((1 << depth) - 1))
    np.testing.assert_array_equal(out[:, :, 0], expect)


def test_adam7_subbyte_palette_exact():
    rng = np.random.default_rng(77)
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (12, 9), dtype=np.uint8)
    blob = _subbyte_png(idx, 4, 3, plte=plte, interlace=1, filters=(1, 0))
    w, h, c, out = MM.decode_image_py(blob)
    assert (w, h, c) == (9, 12, 3)
    np.testing.assert_array_equal(out, plte[idx])


def test_subbyte_truncated_contained():
    samples = np.ones((8, 8), np.uint8)
    blob = bytearray(_subbyte_png(samples, 1, 0))
    # corrupt the IDAT length so decompress sees garbage
    with pytest.raises(MM.DECODE_ERRORS):
        MM.decode_image_py(bytes(blob[:40]) + b"\x00" * 8)


def test_palette_index_beyond_plte_contained():
    """Sub-byte palette samples can exceed the PLTE entry count; the
    LUT lookup must raise a contained ValueError, not numpy IndexError
    (ADVICE r4 item 1, PNG flavor) — at sub-byte AND 8-bit depths."""
    plte = np.zeros((4, 3), np.uint8)
    idx = np.full((3, 5), 9, np.uint8)  # 4-bit sample 9, 4-entry PLTE
    blob = _subbyte_png(idx, 4, 3, plte=plte)
    with pytest.raises(MM.DECODE_ERRORS):
        MM.decode_image_py(blob)
