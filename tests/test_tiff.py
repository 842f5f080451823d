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
    arr = _rng(2).integers(0, 256, (4, 4), dtype=np.uint8)
    blob = bytearray(encode_tiff(arr))
    # flip the Compression tag value (tag 259) to 5 (LZW)
    i = blob.find(struct.pack("<HHI", 259, 3, 1))
    assert i > 0
    blob[i + 8] = 5
    with pytest.raises(NotImplementedError):
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
