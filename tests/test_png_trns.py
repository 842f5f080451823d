"""PNG tRNS transparency (spec §11.3.2) decodes to an alpha channel:
palette entries get a per-index alpha LUT (entries past the chunk are
opaque), gray/RGB get one fully-transparent sample value.  Matches the
GIF decoder's convention of surfacing transparency as a real channel.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from fscrawler_spark.functions import multimodal as MM


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png(depth, color, pix_rows: bytes, plte=None, trns=None, wh=None):
    w, h = wh
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    parts = [MM.PNG_MAGIC, _chunk(b"IHDR", ihdr)]
    if plte is not None:
        parts.append(_chunk(b"PLTE", plte.astype(np.uint8).tobytes()))
    if trns is not None:
        parts.append(_chunk(b"tRNS", trns))
    parts.append(_chunk(b"IDAT", zlib.compress(pix_rows)))
    parts.append(_chunk(b"IEND", b""))
    return b"".join(parts)


def _rows(arr: np.ndarray) -> bytes:
    """Filter-0 scanlines from an (h, w, c) byte-lane array."""
    return b"".join(
        b"\x00" + np.ascontiguousarray(arr[y]).tobytes()
        for y in range(arr.shape[0])
    )


def test_palette_trns_rgba():
    plte = np.array([[10, 20, 30], [40, 50, 60], [70, 80, 90]], np.uint8)
    idx = np.array([[0, 1], [2, 0]], np.uint8)
    # alpha for entries 0,1 only; entry 2 defaults opaque
    blob = _png(8, 3, _rows(idx[:, :, None]), plte=plte,
                trns=bytes([0, 128]), wh=(2, 2))
    w, h, c, out = MM.decode_image_py(blob)
    assert (w, h, c) == (2, 2, 4)
    np.testing.assert_array_equal(out[..., :3], plte[idx])
    assert out[..., 3].tolist() == [[0, 128], [255, 0]]


def test_palette_subbyte_trns_rgba():
    plte = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9], [10, 11, 12]],
                    np.uint8)
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], np.uint8)
    packed = np.packbits(
        ((idx[:, :, None] >> np.arange(1, -1, -1)) & 1)
        .reshape(2, 8).astype(np.uint8), axis=1,
    )  # depth 2: 4 samples/byte
    blob = _png(2, 3, _rows(packed[:, :, None]), plte=plte,
                trns=bytes([9, 255, 0]), wh=(4, 2))
    w, h, c, out = MM.decode_image_py(blob)
    assert (w, h, c) == (4, 2, 4)
    np.testing.assert_array_equal(out[..., :3], plte[idx])
    lut = np.array([9, 255, 0, 255], np.uint8)
    np.testing.assert_array_equal(out[..., 3], lut[idx])


def test_gray8_trns_key():
    arr = np.array([[5, 200], [5, 0]], np.uint8)
    blob = _png(8, 0, _rows(arr[:, :, None]),
                trns=struct.pack(">H", 5), wh=(2, 2))
    w, h, c, out = MM.decode_image_py(blob)
    assert (w, h, c) == (2, 2, 2)
    np.testing.assert_array_equal(out[..., 0], arr)
    assert out[..., 1].tolist() == [[0, 255], [0, 255]]


def test_gray1_trns_key():
    # depth 1, key=1: white pixels transparent; LSBits of the key field
    packed = np.packbits(np.array([[1, 0, 1]], np.uint8), axis=1)
    blob = _png(1, 0, _rows(packed[:, :, None]),
                trns=struct.pack(">H", 1), wh=(3, 1))
    w, h, c, out = MM.decode_image_py(blob)
    assert (w, h, c) == (3, 1, 2)
    assert out[0, :, 0].tolist() == [255, 0, 255]
    assert out[0, :, 1].tolist() == [0, 255, 0]


def test_rgb8_trns_key():
    arr = np.array([[[1, 2, 3], [9, 9, 9]], [[1, 2, 3], [1, 2, 4]]],
                   np.uint8)
    trns = struct.pack(">HHH", 1, 2, 3)
    blob = _png(8, 2, _rows(arr), trns=trns, wh=(2, 2))
    w, h, c, out = MM.decode_image_py(blob)
    assert (w, h, c) == (2, 2, 4)
    np.testing.assert_array_equal(out[..., :3], arr)
    assert out[..., 3].tolist() == [[0, 255], [0, 255]]


def test_rgb16_trns_key():
    wide = np.array([[[300, 500, 700], [300, 500, 701]]], np.uint16)
    lanes = np.zeros((1, 2, 6), np.uint8)
    lanes[..., 0::2] = (wide >> 8).astype(np.uint8)
    lanes[..., 1::2] = (wide & 0xFF).astype(np.uint8)
    trns = struct.pack(">HHH", 300, 500, 700)
    blob = _png(16, 2, _rows(lanes), trns=trns, wh=(2, 1))
    w, h, c, out = MM.decode_image_py(blob)
    assert (w, h, c) == (2, 1, 4)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out[..., :3], wide)
    assert out[0, :, 3].tolist() == [0, 65535]


def test_no_trns_unchanged():
    arr = np.array([[[1, 2, 3]]], np.uint8)
    blob = _png(8, 2, _rows(arr), wh=(1, 1))
    assert MM.decode_image_py(blob)[:3] == (1, 1, 3)
