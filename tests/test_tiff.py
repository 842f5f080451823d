"""Uncompressed TIFF codec roundtrips (functions/tiff.py) — pure
structural parsing, so every roundtrip is EXACT."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fscrawler_spark.functions.tiff import decode_tiff, encode_tiff
from fscrawler_spark.functions.multimodal import (
    DECODE_ERRORS,
    decode_image_py,
)


def _rng(seed: int) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64(seed))


@pytest.mark.parametrize("spp", [1, 3, 4])
def test_roundtrip_exact(spp):
    shape = (11, 17) if spp == 1 else (11, 17, spp)
    arr = _rng(spp).integers(0, 256, shape, dtype=np.uint8)
    w, h, c, out = decode_image_py(encode_tiff(arr))
    assert (w, h, c) == (17, 11, spp)
    assert np.array_equal(out.reshape(shape), arr)


def test_multi_strip_roundtrip_exact():
    arr = _rng(9).integers(0, 256, (23, 9, 3), dtype=np.uint8)
    blob = encode_tiff(arr, rows_per_strip=4)  # 6 strips
    w, h, c, out = decode_tiff(blob)
    assert (w, h, c) == (9, 23, 3)
    assert np.array_equal(out, arr)


def test_big_endian_and_min_is_white():
    """Hand-built big-endian (MM) grayscale TIFF with MinIsWhite
    photometric: the decoder must byte-swap the IFD and invert."""
    h, w = 2, 3
    pix = np.arange(6, dtype=np.uint8).reshape(h, w)
    ifd_off = 8 + pix.size
    out = bytearray(b"MM\x00*" + struct.pack(">I", ifd_off))
    out += pix.tobytes()
    tags = [
        (256, 3, 1, struct.pack(">HH", w, 0)),
        (257, 3, 1, struct.pack(">HH", h, 0)),
        (258, 3, 1, struct.pack(">HH", 8, 0)),
        (259, 3, 1, struct.pack(">HH", 1, 0)),
        (262, 3, 1, struct.pack(">HH", 0, 0)),   # MinIsWhite
        (273, 4, 1, struct.pack(">I", 8)),
        (277, 3, 1, struct.pack(">HH", 1, 0)),
        (278, 3, 1, struct.pack(">HH", h, 0)),
        (279, 4, 1, struct.pack(">I", pix.size)),
    ]
    out += struct.pack(">H", len(tags))
    for tag, t, n, v in tags:
        out += struct.pack(">HHI", tag, t, n) + v
    out += struct.pack(">I", 0)
    ww, hh, cc, arr = decode_tiff(bytes(out))
    assert (ww, hh, cc) == (w, h, 1)
    assert np.array_equal(arr[:, :, 0], 255 - pix)


def test_unsupported_compression_is_stubbed_not_fatal():
    import zlib as _zlib

    arr = _rng(2).integers(0, 256, (4, 4), dtype=np.uint8)
    blob = bytearray(encode_tiff(arr))
    # flip the Compression tag value (tag 259) to 9 (JBIG, still a
    # declared boundary now that LZW/Deflate/PackBits/JPEG are real)
    i = blob.find(struct.pack("<HHI", 259, 3, 1))
    assert i > 0
    blob[i + 8] = 9
    with pytest.raises(NotImplementedError):
        decode_tiff(bytes(blob))
    # compression 7 over NON-JPEG strip bytes is corrupt, contained
    blob[i + 8] = 7
    with pytest.raises(ValueError):
        decode_tiff(bytes(blob))
    # compression 8 over NON-zlib strip bytes is corrupt, contained
    blob[i + 8] = 8
    with pytest.raises((ValueError, _zlib.error)):
        decode_tiff(bytes(blob))


def test_corruption_contained_fuzzed():
    rng = _rng(3)
    arr = _rng(4).integers(0, 256, (10, 10, 3), dtype=np.uint8)
    blob = bytearray(encode_tiff(arr, rows_per_strip=3))
    for trial in range(60):
        bad = bytearray(blob)
        if trial % 3 == 0:
            bad = bad[: int(rng.integers(4, len(bad)))]
        else:
            for _ in range(int(rng.integers(1, 6))):
                bad[int(rng.integers(4, len(bad)))] = int(rng.integers(0, 256))
        try:
            decode_tiff(bytes(bad))
        except DECODE_ERRORS:
            pass  # the only acceptable failure mode


def test_codec_pair_roundtrip_fuzzed():
    rng = _rng(5)
    for trial in range(20):
        h = int(rng.integers(1, 30))
        w = int(rng.integers(1, 30))
        spp = int(rng.choice([1, 3, 4]))
        rps = int(rng.integers(1, h + 1))
        shape = (h, w) if spp == 1 else (h, w, spp)
        arr = rng.integers(0, 256, shape, dtype=np.uint8)
        ww, hh, cc, out = decode_tiff(encode_tiff(arr, rows_per_strip=rps))
        assert (ww, hh, cc) == (w, h, spp), (trial, shape, rps)
        assert np.array_equal(out.reshape(shape), arr), (trial, shape, rps)


def test_planar_configuration_raises_not_garbles():
    """PlanarConfiguration=2 has the same strip byte count as chunky,
    so without an explicit guard it would decode silently into wrong
    pixels (review finding) — it must raise instead."""
    arr = _rng(6).integers(0, 256, (4, 4, 3), dtype=np.uint8)
    blob = bytearray(encode_tiff(arr))
    n_tags = struct.unpack_from("<H", blob, struct.unpack_from("<I", blob, 4)[0])[0]
    ifd = struct.unpack_from("<I", blob, 4)[0]
    # append a PlanarConfiguration=2 tag (284) before the next-IFD
    # pointer and bump the tag count (284 > every existing tag, so the
    # ascending-order invariant holds; all offsets point backward)
    insert_at = ifd + 2 + 12 * n_tags
    tag = struct.pack("<HHI", 284, 3, 1) + struct.pack("<HH", 2, 0)
    blob[insert_at:insert_at] = tag
    struct.pack_into("<H", blob, ifd, n_tags + 1)
    with pytest.raises(NotImplementedError):
        decode_tiff(bytes(blob))


# ---------------------------------------------------------------------------
# LZW (Compression=5), PackBits (32773), Predictor 2


def test_lzw_hand_vector_pins_bit_layout():
    """Hand-encoded per TIFF 6.0 §13 (MSB-first, 9-bit codes, Clear
    then literals then the just-added table code): Clear(256), 7, 258,
    8, EOI(257) packs to these exact six bytes and decodes to
    07 07 07 08.  Pins the bit order independently of the encoder."""
    from fscrawler_spark.functions.tiff import _lzw_decode
    stream = bytes([0x80, 0x01, 0xE0, 0x40, 0x88, 0x08])
    assert _lzw_decode(stream, 4) == b"\x07\x07\x07\x08"


def test_lzw_roundtrip_across_width_boundaries():
    """Content with >2000 distinct table entries forces the 9->10->11
    bit early-change boundaries (and table growth well past 510/1022);
    exact roundtrip proves encoder/decoder share the same convention
    on both sides of every bump."""
    from fscrawler_spark.functions.tiff import _lzw_decode, _lzw_encode
    rng = _rng(13)
    data = (bytes(rng.integers(0, 256, 60000, dtype=np.uint8))
            + b"abc" * 2000 + bytes(3000))
    assert _lzw_decode(_lzw_encode(data), len(data)) == data


def test_lzw_clear_reset_roundtrip():
    """>4093 table entries forces the encoder's mid-stream Clear; the
    decoder must resync its table and width."""
    from fscrawler_spark.functions.tiff import _lzw_decode, _lzw_encode
    rng = _rng(14)
    data = bytes(rng.integers(0, 256, 300000, dtype=np.uint8))
    assert _lzw_decode(_lzw_encode(data), len(data)) == data


@pytest.mark.parametrize("compression", [5, 8, 32773])
@pytest.mark.parametrize("predictor", [1, 2])
def test_compressed_tiff_roundtrips_exact(compression, predictor):
    rng = _rng(compression * 10 + predictor)
    for shape, rps in [((1, 1), None), ((9, 7), 2), ((12, 5, 3), 5),
                       ((6, 20, 4), None), ((40, 33, 3), 16)]:
        arr = rng.integers(0, 256, shape, dtype=np.uint8)
        blob = encode_tiff(arr, rows_per_strip=rps,
                           compression=compression, predictor=predictor)
        w, h, c, out = decode_tiff(blob)
        exp = arr if arr.ndim == 3 else arr[:, :, None]
        assert (w, h, c) == (exp.shape[1], exp.shape[0], exp.shape[2])
        np.testing.assert_array_equal(out, exp)


def test_predictor_smooth_content_compresses_better():
    """The reason Predictor 2 exists: on smooth gradients the
    differenced stream LZW-compresses far better than the raw one."""
    ramp = np.tile(np.arange(256, dtype=np.uint8), (64, 4))
    plain = encode_tiff(ramp, compression=5, predictor=1)
    pred = encode_tiff(ramp, compression=5, predictor=2)
    assert len(pred) < len(plain) // 4


def test_compressed_corruption_contained():
    from fscrawler_spark.functions import multimodal as MM
    rng = _rng(99)
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    for comp in (5, 32773):
        blob = bytearray(encode_tiff(arr, compression=comp))
        # truncate the strip data mid-stream
        with pytest.raises(MM.DECODE_ERRORS):
            decode_tiff(bytes(blob[: len(blob) // 2]))
        # random byte corruption may only raise DECODE_ERRORS
        for trial in range(30):
            b2 = bytearray(blob)
            for _ in range(4):
                b2[int(rng.integers(8, len(b2)))] = int(rng.integers(256))
            try:
                decode_tiff(bytes(b2))
            except MM.DECODE_ERRORS:
                pass


def test_compressed_tiff_through_spark_dispatch():
    """decode_image_py serves LZW/PackBits TIFFs through the same
    magic-byte dispatch as every other format."""
    from fscrawler_spark.functions import multimodal as MM
    arr = _rng(7).integers(0, 256, (10, 8, 3), dtype=np.uint8)
    blob = encode_tiff(arr, compression=5, predictor=2)
    w, h, c, out = MM.decode_image_py(blob)
    assert (w, h, c) == (8, 10, 3)
    np.testing.assert_array_equal(out, arr)


# --- Compression 7: new-style JPEG-in-TIFF (round-5), delegated to
# the repo's own JPEG codec (functions/jpeg.py) ----------------------


@pytest.mark.parametrize("spp,rps", [(1, None), (3, None), (3, 4)])
def test_jpeg_in_tiff_matches_jpeg_codec(spp, rps):
    from fscrawler_spark.functions.jpeg import decode_jpeg, encode_jpeg

    shape = (11, 13) if spp == 1 else (11, 13, spp)
    arr = _rng(40 + spp + (rps or 0)).integers(0, 256, shape,
                                               dtype=np.uint8)
    blob = encode_tiff(arr, rows_per_strip=rps, compression=7)
    w, h, c, out = decode_tiff(blob)
    assert (w, h, c) == (13, 11, spp)
    # lossy codec: the TIFF assembly must equal the JPEG codec's own
    # per-strip decode EXACTLY (same streams, same IDCT)
    a3 = arr if arr.ndim == 3 else arr[:, :, None]
    rows = []
    for y in range(0, 11, rps or 11):
        strip = a3[y: y + (rps or 11)]
        sw, sh, sc, px = decode_jpeg(encode_jpeg(
            strip[:, :, 0] if spp == 1 else strip, quality=100
        ))
        rows.append(px.reshape(sh, sw, sc))
    assert np.array_equal(out, np.concatenate(rows))


def _split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Move every DQT/DHT segment of a standalone JPEG into an
    abbreviated JPEGTables stream (SOI..tables..EOI), returning
    (tables_stream, tables-less strip stream)."""
    pos = 2
    tables, rest = bytearray(), bytearray(b"\xff\xd8")
    while pos < len(stream):
        assert stream[pos] == 0xFF
        marker = stream[pos + 1]
        if marker == 0xDA:  # SOS: entropy data runs to EOI, keep all
            rest += stream[pos:]
            break
        (seg_len,) = struct.unpack_from(">H", stream, pos + 2)
        seg = stream[pos: pos + 2 + seg_len]
        (tables if marker in (0xDB, 0xC4) else rest).extend(seg)
        pos += 2 + seg_len
    return bytes(b"\xff\xd8" + bytes(tables) + b"\xff\xd9"), bytes(rest)


def _tiff_with_jpeg_tables(strip: bytes, tables: bytes, w: int, h: int,
                           spp: int) -> bytes:
    """Hand-built little-endian single-strip Compression-7 TIFF with a
    JPEGTables tag (347, type UNDEFINED)."""
    bps_off = 8 + len(strip)
    tbl_off = bps_off + (2 * spp if spp > 1 else 0)
    ifd_off = tbl_off + len(tables)
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += strip
    if spp > 1:
        out += struct.pack("<" + "H" * spp, *([8] * spp))
    out += tables
    tags = [
        (256, 3, 1, struct.pack("<HH", w, 0)),
        (257, 3, 1, struct.pack("<HH", h, 0)),
        (258, 3, spp, struct.pack("<I", bps_off) if spp > 1
         else struct.pack("<HH", 8, 0)),
        (259, 3, 1, struct.pack("<HH", 7, 0)),
        (262, 3, 1, struct.pack("<HH", 6 if spp == 3 else 1, 0)),
        (273, 4, 1, struct.pack("<I", 8)),
        (277, 3, 1, struct.pack("<HH", spp, 0)),
        (278, 3, 1, struct.pack("<HH", h, 0)),
        (279, 4, 1, struct.pack("<I", len(strip))),
        (347, 7, len(tables), struct.pack("<I", tbl_off)),
    ]
    out += struct.pack("<H", len(tags))
    for tag, t, n, v in tags:
        out += struct.pack("<HHI", tag, t, n) + v
    out += struct.pack("<I", 0)
    return bytes(out)


def test_jpeg_in_tiff_jpegtables_splice():
    from fscrawler_spark.functions.jpeg import decode_jpeg, encode_jpeg

    arr = _rng(55).integers(0, 256, (10, 7, 3), dtype=np.uint8)
    full = encode_jpeg(arr, quality=100)
    tables, strip = _split_jpeg_tables(full)
    assert len(tables) > 4 and len(strip) < len(full)
    blob = _tiff_with_jpeg_tables(strip, tables, 7, 10, 3)
    w, h, c, out = decode_tiff(blob)
    jw, jh, jc, jpx = decode_jpeg(full)
    assert (w, h, c) == (jw, jh, jc) == (7, 10, 3)
    assert np.array_equal(out, jpx.reshape(10, 7, 3))
    # corrupt JPEGTables (no SOI/EOI framing) is contained
    bad = _tiff_with_jpeg_tables(strip, b"\x00" * len(tables), 7, 10, 3)
    with pytest.raises(ValueError):
        decode_tiff(bad)


def test_jpeg_in_tiff_strip_shape_mismatch_contained():
    from fscrawler_spark.functions.jpeg import encode_jpeg

    arr = _rng(56).integers(0, 256, (6, 5, 3), dtype=np.uint8)
    strip = encode_jpeg(arr, quality=100)
    # IFD claims 9x9: the decoded strip shape disagrees -> contained
    blob = _tiff_with_jpeg_tables(strip, b"\xff\xd8\xff\xd9", 9, 9, 3)
    with pytest.raises(ValueError):
        decode_tiff(blob)


def test_deflate_legacy_code_32946_decodes():
    """Compression 32946 (legacy Deflate) is byte-identical to 8: flip
    the tag value on an encoded blob and the decode is unchanged."""
    arr = _rng(60).integers(0, 256, (7, 9, 3), dtype=np.uint8)
    blob = bytearray(encode_tiff(arr, compression=8))
    i = blob.find(struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 8, 0))
    assert i > 0
    struct.pack_into("<H", blob, i + 8, 32946)
    w, h, c, out = decode_tiff(bytes(blob))
    assert (w, h, c) == (9, 7, 3)
    assert np.array_equal(out, arr)
    # corrupt zlib stream is contained (zlib.error is in DECODE_ERRORS)
    bad = bytearray(encode_tiff(arr, compression=8))
    bad[10] ^= 0xFF
    with pytest.raises(DECODE_ERRORS):
        decode_tiff(bytes(bad))


@pytest.mark.parametrize("compression", [7, 8])
def test_jpeg_and_deflate_corruption_contained_fuzzed(compression):
    """Same protocol as the base fuzz: random truncations and byte
    flips over encoded Compression-7/8 blobs may only raise
    DECODE_ERRORS — nothing (IndexError, ZeroDivisionError, ...)
    escapes the containment envelope."""
    rng = _rng(70 + compression)
    arr = _rng(71).integers(0, 256, (12, 10, 3), dtype=np.uint8)
    blob = bytearray(encode_tiff(arr, rows_per_strip=5,
                                 compression=compression))
    for trial in range(60):
        bad = bytearray(blob)
        if trial % 3 == 0:
            bad = bad[: int(rng.integers(4, len(bad)))]
        else:
            for _ in range(int(rng.integers(1, 6))):
                bad[int(rng.integers(4, len(bad)))] = int(rng.integers(0, 256))
        try:
            decode_tiff(bytes(bad))
        except DECODE_ERRORS:
            pass  # the only acceptable failure mode
