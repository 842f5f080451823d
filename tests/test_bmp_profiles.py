"""BMP profiles beyond uncompressed 8/24-bit: 1/4-bit palette rows,
32-bit BGRX truecolor, and RLE8/RLE4 decompression.

The encoder halves live here (fixture plumbing, MSDN BITMAPINFOHEADER
layout): sub-byte rows pack samples MSB-first into 4-byte-aligned
scanlines; the RLE writer emits encoded runs, absolute runs, deltas,
and the EOL/EOB escapes so every branch of the decoder's state machine
is exercised against known pixels.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fscrawler_spark.functions import multimodal as MM


def _bmp(w, h, bitcount, pix: bytes, pal=None, compression=0,
         top_down=False) -> bytes:
    n_pal = 0 if pal is None else pal.shape[0]
    off = 14 + 40 + 4 * n_pal
    hdr = b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
    hdr += struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bitcount,
        compression, len(pix), 2835, 2835, n_pal, 0,
    )
    if pal is not None:  # RGB -> BGRA quads
        quads = np.zeros((n_pal, 4), np.uint8)
        quads[:, :3] = pal[:, ::-1]
        hdr += quads.tobytes()
    return hdr + pix


def _pack_rows_bottom_up(idx: np.ndarray, bitcount: int) -> bytes:
    """(h, w) palette indices -> bottom-up 4-byte-aligned packed rows."""
    h, w = idx.shape
    out = bytearray()
    for y in range(h - 1, -1, -1):
        bits = (
            (idx[y][:, None] >> np.arange(bitcount - 1, -1, -1)) & 1
        ).ravel().astype(np.uint8)
        row = np.packbits(bits).tobytes()
        out += row + b"\x00" * (-len(row) % 4)
    return bytes(out)


@pytest.mark.parametrize("bitcount", [1, 4])
@pytest.mark.parametrize("w,h", [(1, 1), (7, 3), (9, 2), (33, 5)])
def test_subbyte_bmp_exact(bitcount, w, h):
    rng = np.random.default_rng(bitcount * 100 + w + h)
    n = 1 << bitcount
    pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, (h, w), dtype=np.uint8)
    blob = _bmp(w, h, bitcount, _pack_rows_bottom_up(idx, bitcount), pal)
    gw, gh, gc, out = MM.decode_image_py(blob)
    assert (gw, gh, gc) == (w, h, 3)
    np.testing.assert_array_equal(out, pal[idx])


def test_bmp32_bgrx_exact():
    rng = np.random.default_rng(32)
    px = rng.integers(0, 256, (3, 5, 3), dtype=np.uint8)
    rows = bytearray()
    for y in range(2, -1, -1):  # bottom-up BGRX
        for x in range(5):
            r, g, b = px[y, x]
            rows += bytes([b, g, r, 0])
    blob = _bmp(5, 3, 32, bytes(rows))
    w, h, c, out = MM.decode_image_py(blob)
    assert (w, h, c) == (5, 3, 3)
    np.testing.assert_array_equal(out, px)


def test_bmp32_top_down():
    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    rows = bytearray()
    for y in range(2):  # top-down: file order == display order
        for x in range(2):
            r, g, b = px[y, x]
            rows += bytes([b, g, r, 0])
    w, h, c, out = MM.decode_image_py(_bmp(2, 2, 32, bytes(rows),
                                           top_down=True))
    np.testing.assert_array_equal(out, px)


def test_rle8_all_escapes():
    """Encoded runs + absolute run (odd length, word-padded) + delta
    (skipped cells stay palette entry 0) + EOL + EOB."""
    pal = np.array([[0, 0, 0], [10, 11, 12], [20, 21, 22], [30, 31, 32],
                    [40, 41, 42]], np.uint8)
    # file row 0 (display bottom row): run 3x1, abs [2,3,4], run 2x2
    # file row 1: delta skip (2,0) then run 2x3 -> ends mid-row via EOB
    pix = bytes([
        3, 1, 0, 3, 2, 3, 4, 0,  # run + absolute(3, padded to 4 bytes)
        2, 2, 0, 0,              # run, end of line
        0, 2, 2, 0,              # delta dx=2 dy=0
        2, 3, 0, 1,              # run, end of bitmap
    ])
    blob = _bmp(8, 2, 8, pix, pal, compression=1)
    w, h, c, out = MM.decode_image_py(blob)
    assert (w, h, c) == (8, 2, 3)
    # display top row = file row 1; skipped cells are entry 0
    exp_file = np.array([
        [1, 1, 1, 2, 3, 4, 2, 2],
        [0, 0, 3, 3, 0, 0, 0, 0],
    ], np.uint8)
    np.testing.assert_array_equal(out, pal[exp_file[::-1]])


def test_rle4_nibble_runs():
    pal = np.array([[i, i + 1, i + 2] for i in range(0, 48, 3)], np.uint8)
    # run of 5 alternating nibbles 0xA5 -> A 5 A 5 A; absolute 3 samples
    # 0x12 0x30 -> 1 2 3 (pad byte to word); EOL; run 4 of 0x7 0x7; EOB
    pix = bytes([
        5, 0xA5, 0, 3, 0x12, 0x30, 0, 0,
        4, 0x77, 0, 1,
    ])
    blob = _bmp(8, 2, 4, pix, pal, compression=2)
    w, h, c, out = MM.decode_image_py(blob)
    assert (w, h, c) == (8, 2, 3)
    exp_file = np.array([
        [0xA, 0x5, 0xA, 0x5, 0xA, 1, 2, 3],
        [7, 7, 7, 7, 0, 0, 0, 0],
    ], np.uint8)
    np.testing.assert_array_equal(out, pal[exp_file[::-1]])


def test_rle_corruption_contained():
    pal = np.zeros((2, 3), np.uint8)
    # no end-of-bitmap escape
    blob = _bmp(4, 2, 8, bytes([2, 1, 2, 0]), pal, compression=1)
    with pytest.raises(MM.DECODE_ERRORS):
        MM.decode_image_py(blob)
    # top-down RLE is illegal
    blob2 = _bmp(4, 2, 8, bytes([2, 1, 0, 1]), pal, compression=1,
                 top_down=True)
    with pytest.raises(MM.DECODE_ERRORS):
        MM.decode_image_py(blob2)
    # RLE4 with bitcount 8 is a mismatch
    blob3 = _bmp(4, 2, 8, bytes([2, 1, 0, 1]), pal, compression=2)
    with pytest.raises(MM.DECODE_ERRORS):
        MM.decode_image_py(blob3)


def _pix16(vals: np.ndarray) -> bytes:
    """(h, w) uint16 LE sample words -> bottom-up 4-byte-padded rows."""
    h, w = vals.shape
    out = bytearray()
    for y in range(h - 1, -1, -1):
        row = vals[y].astype("<u2").tobytes()
        out += row + b"\x00" * (-len(row) % 4)
    return bytes(out)


def test_bmp16_rgb555_default_masks():
    """BI_RGB 16-bit decodes with the implied 5-5-5 masks, scaled
    exactly by 255//31 arithmetic."""
    r, g, b = 31, 16, 1
    word = (r << 10) | (g << 5) | b
    vals = np.full((2, 3), word, np.uint16)
    gw, gh, gc, out = MM.decode_image_py(_bmp(3, 2, 16, _pix16(vals)))
    assert (gw, gh, gc) == (3, 2, 3)
    exp = [r * 255 // 31, g * 255 // 31, b * 255 // 31]
    np.testing.assert_array_equal(out, np.broadcast_to(exp, (2, 3, 3)))


def test_bmp16_bitfields_565():
    """BI_BITFIELDS 16-bit with the common 5-6-5 masks appended after
    the 40-byte info header."""
    rng = np.random.default_rng(565)
    vals = rng.integers(0, 1 << 16, (3, 4), dtype=np.uint16)
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    # masks sit between header and pixel data: splice them in and
    # shift off_bits by 12
    base = _bmp(4, 3, 16, _pix16(vals), compression=3)
    blob = bytearray(base[:54] + masks + base[54:])
    struct.pack_into("<I", blob, 10, 54 + 12)  # off_bits past the masks
    gw, gh, gc, out = MM.decode_image_py(bytes(blob))
    assert (gw, gh, gc) == (4, 3, 3)
    exp = np.dstack([
        ((vals >> 11) & 31) * 255 // 31,
        ((vals >> 5) & 63) * 255 // 63,
        (vals & 31) * 255 // 31,
    ]).astype(np.uint8)
    np.testing.assert_array_equal(out, exp)


def test_bmp32_bitfields_with_alpha():
    """BI_BITFIELDS 32-bit with a V3 (56-byte) header: embedded masks
    including alpha decode to 4 channels, 8-8-8-8 passed through."""
    rng = np.random.default_rng(8888)
    px = rng.integers(0, 256, (2, 3, 4), dtype=np.uint8)  # RGBA
    words = (px[..., 0].astype(np.uint32) << 16  # R in bits 16-23
             | px[..., 1].astype(np.uint32) << 8
             | px[..., 2].astype(np.uint32)
             | px[..., 3].astype(np.uint32) << 24)
    rows = bytearray()
    for y in range(1, -1, -1):
        rows += words[y].astype("<u4").tobytes()
    off = 14 + 56
    hdr = b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
    hdr += struct.pack(
        "<IiiHHIIiiII", 56, 3, 2, 1, 32, 3, len(rows), 2835, 2835, 0, 0,
    )
    hdr += struct.pack("<IIII", 0x00FF0000, 0x0000FF00, 0x000000FF,
                       0xFF000000)
    gw, gh, gc, out = MM.decode_image_py(hdr + bytes(rows))
    assert (gw, gh, gc) == (3, 2, 4)
    np.testing.assert_array_equal(out, px)


def test_bmp_bitfields_corrupt_masks_contained():
    vals = np.zeros((2, 2), np.uint16)
    base = _bmp(2, 2, 16, _pix16(vals), compression=3)
    for masks in (
        struct.pack("<III", 0, 0x07E0, 0x001F),        # zero mask
        struct.pack("<III", 0xF018, 0x07E0, 0x001F),   # fragmented
    ):
        blob = bytearray(base[:54] + masks + base[54:])
        struct.pack_into("<I", blob, 10, 66)
        with pytest.raises(MM.DECODE_ERRORS):
            MM.decode_image_py(bytes(blob))


def test_rle_palette_index_beyond_color_table_contained():
    """An RLE8 run may emit any 0-255 value while the stored palette is
    only clr_used entries; the out-of-range lookup must be contained as
    a DECODE_ERRORS ValueError, not escape as numpy IndexError
    (ADVICE r4 item 1)."""
    pal = np.zeros((4, 3), np.uint8)  # clr_used = 4
    # run of 2 cells with value 200, then EOL + EOB
    pix = bytes([2, 200, 0, 0, 0, 1])
    blob = _bmp(4, 2, 8, pix, pal, compression=1)
    with pytest.raises(MM.DECODE_ERRORS):
        MM.decode_image_py(blob)
    # same class for sub-byte uncompressed rows: 4-bit sample 9 with a
    # 4-entry palette
    idx = np.full((2, 3), 9, np.uint8)
    blob2 = _bmp(3, 2, 4, _pack_rows_bottom_up(idx, 4), pal)
    with pytest.raises(MM.DECODE_ERRORS):
        MM.decode_image_py(blob2)


# --- BI_JPEG / BI_PNG embedding forms (round-5): the bitmap data is a
# complete JPEG/PNG stream, delegated to the repo's own codecs -------


def test_bmp_bi_png_delegates_exact():
    from fscrawler_spark.functions.multimodal import encode_png

    for c in (1, 3, 4):
        arr = np.random.Generator(np.random.PCG64(70 + c)).integers(
            0, 256, (6, 5, c), dtype=np.uint8
        )
        blob = _bmp(5, 6, 0, encode_png(arr), compression=5)  # BI_PNG
        w, h, ch, out = MM.decode_image_py(blob)
        assert (w, h, ch) == (5, 6, c)
        assert np.array_equal(np.asarray(out).reshape(arr.shape), arr)


def test_bmp_bi_jpeg_matches_jpeg_codec():
    from fscrawler_spark.functions.jpeg import decode_jpeg, encode_jpeg

    arr = np.random.Generator(np.random.PCG64(80)).integers(
        0, 256, (8, 9, 3), dtype=np.uint8
    )
    stream = encode_jpeg(arr, quality=100)
    blob = _bmp(9, 8, 0, stream, compression=4)  # BI_JPEG
    w, h, ch, out = MM.decode_image_py(blob)
    jw, jh, jc, jpx = decode_jpeg(stream)
    assert (w, h, ch) == (jw, jh, jc) == (9, 8, 3)
    assert np.array_equal(
        np.asarray(out).reshape(8, 9, 3), jpx.reshape(8, 9, 3)
    )


def test_bmp_embedded_corruption_contained():
    from fscrawler_spark.functions.multimodal import encode_png

    arr = np.random.Generator(np.random.PCG64(81)).integers(
        0, 256, (4, 4, 3), dtype=np.uint8
    )
    stream = encode_png(arr)
    # header dims disagree with the embedded stream -> contained
    with pytest.raises(ValueError):
        MM.decode_image_py(_bmp(9, 9, 0, stream, compression=5))
    # BI_PNG whose payload is not a PNG -> contained
    with pytest.raises(MM.DECODE_ERRORS):
        MM.decode_image_py(_bmp(4, 4, 0, b"\x00" * 32, compression=5))
    # BI_JPEG whose payload is not a JPEG -> contained
    with pytest.raises(MM.DECODE_ERRORS):
        MM.decode_image_py(_bmp(4, 4, 0, b"\x00" * 32, compression=4))


def test_bmp_alphabitfields_16bit_argb():
    """BI_ALPHABITFIELDS (compression 6): FOUR masks appended after the
    40-byte header — 4-4-4-4 ARGB here — decode to 4 channels."""
    rng = np.random.default_rng(4444)
    vals = rng.integers(0, 1 << 16, (3, 5), dtype=np.uint16)
    masks = struct.pack("<IIII", 0x0F00, 0x00F0, 0x000F, 0xF000)
    base = _bmp(5, 3, 16, _pix16(vals), compression=6)
    blob = bytearray(base[:54] + masks + base[54:])
    struct.pack_into("<I", blob, 10, 54 + 16)  # off_bits past 4 masks
    gw, gh, gc, out = MM.decode_image_py(bytes(blob))
    assert (gw, gh, gc) == (5, 3, 4)
    exp = np.dstack([
        ((vals >> 8) & 15) * 255 // 15,
        ((vals >> 4) & 15) * 255 // 15,
        (vals & 15) * 255 // 15,
        ((vals >> 12) & 15) * 255 // 15,
    ]).astype(np.uint8)
    np.testing.assert_array_equal(out, exp)
    # truncated mask table (only 12 of the 16 required bytes) contained
    with pytest.raises(ValueError):
        MM.decode_image_py(bytes(blob[:54 + 12]))


def test_bmp_embedded_fuzz_contained():
    """Truncations/byte flips over BI_PNG and BI_JPEG containers may
    only raise DECODE_ERRORS (the embedded codecs' own containment
    plus the wrapper's dims check)."""
    from fscrawler_spark.functions.jpeg import encode_jpeg
    from fscrawler_spark.functions.multimodal import encode_png

    rng = np.random.default_rng(90)
    arr = rng.integers(0, 256, (7, 6, 3), dtype=np.uint8)
    for comp, stream in ((5, encode_png(arr)),
                         (4, encode_jpeg(arr, quality=100))):
        blob = bytearray(_bmp(6, 7, 0, stream, compression=comp))
        for trial in range(40):
            bad = bytearray(blob)
            if trial % 3 == 0:
                bad = bad[: int(rng.integers(14, len(bad)))]
            else:
                for _ in range(int(rng.integers(1, 6))):
                    bad[int(rng.integers(2, len(bad)))] = int(
                        rng.integers(0, 256))
            try:
                MM.decode_image_py(bytes(bad))
            except MM.DECODE_ERRORS:
                pass  # the only acceptable failure mode
