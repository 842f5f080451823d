"""GIF codec roundtrips (functions/gif.py).

GIF is lossless (palette + LZW), so unlike the JPEG tests these assert
EXACT pixel equality through the full encode->decode pipeline: header,
color tables, sub-blocking, variable-width LSB-first LZW with table
growth/reset, interlacing, and animation compositing with disposal
methods.  No Spark session needed except the pipeline test.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fscrawler_spark.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_video,
    encode_gif,
)
from fscrawler_spark.functions.multimodal import (
    DECODE_ERRORS,
    decode_image_py,
    decode_video_py,
)


def _rng(seed: int) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64(seed))


def _palette_image(rng, h, w, n_colors) -> np.ndarray:
    """Random RGB image drawing from exactly n_colors distinct colors."""
    palette = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, (h, w))
    return palette[idx]


def test_lzw_pair_roundtrip_exact():
    rng = _rng(1)
    for min_code in (2, 4, 8):
        for n in (1, 7, 100, 5000):
            data = rng.integers(0, 1 << min_code, n).astype(np.uint8)
            blob = _lzw_encode(min_code, data)
            back = _lzw_decode(min_code, blob, n)
            assert np.array_equal(back, data), (min_code, n)


def test_lzw_table_growth_and_reset():
    # long low-entropy run drives the table through every width up to
    # 12 bits and past the 4096-entry reset
    rng = _rng(2)
    data = np.repeat(
        rng.integers(0, 4, 3000).astype(np.uint8), 17
    )  # 51000 symbols, heavy repetition
    blob = _lzw_encode(2, data)
    back = _lzw_decode(2, blob, len(data))
    assert np.array_equal(back, data)


def test_gray_roundtrip_exact():
    arr = _rng(3).integers(0, 256, (13, 21), dtype=np.uint8)
    blob = encode_gif(arr)
    w, h, c, out = decode_image_py(blob)
    assert (w, h, c) == (21, 13, 3)  # gray encodes via the gray palette
    assert np.array_equal(out, np.dstack([arr, arr, arr]))


def test_rgb_roundtrip_exact():
    arr = _palette_image(_rng(4), 17, 9, 200)
    blob = encode_gif(arr)
    w, h, c, out = decode_image_py(blob)
    assert (w, h, c) == (9, 17, 3)
    assert np.array_equal(out, arr)


def test_interlaced_roundtrip_exact():
    arr = _palette_image(_rng(5), 23, 11, 64)
    plain = encode_gif(arr)
    inter = encode_gif(arr, interlace=True)
    assert plain != inter
    _, _, _, a = decode_image_py(plain)
    _, _, _, b = decode_image_py(inter)
    assert np.array_equal(a, arr) and np.array_equal(b, arr)


def test_too_many_colors_raises():
    rng = _rng(6)
    arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert len(np.unique(arr.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError):
        encode_gif(arr)


def test_animated_roundtrip_and_video_contract():
    rng = _rng(7)
    frames = [_palette_image(rng, 6, 8, 30) for _ in range(5)]
    blob = encode_gif(frames, delays_cs=[4, 4, 4, 4, 4])
    assert blob[:6] == b"GIF89a"
    n, w, h, out_frames = decode_video_py(blob)
    assert (n, w, h) == (5, 8, 6)
    for got, want in zip(out_frames, frames):
        assert np.array_equal(
            np.frombuffer(got, np.uint8).reshape(6, 8, 3), want
        )


def test_disposal_methods_composite():
    """Hand-built two-frame GIF: frame 2 paints a sub-rectangle with a
    transparent index, so frame 2's composite must keep frame 1's
    pixels underneath (disposal 1 + transparency)."""
    # 4x2 logical screen, GCT with 4 colors
    gct = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  9, 9, 9])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 2, 0x80 | 0x01, 0, 0)  # 2-bit GCT
    out += gct
    # frame 1: full screen, all color 0 (red), disposal 1
    out += b"\x21\xf9\x04" + bytes([0x04, 0, 0, 0]) + b"\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 2, 0)
    idx1 = np.zeros(8, np.uint8)
    out.append(2)
    lzw = _lzw_encode(2, idx1)
    out.append(len(lzw))
    out += lzw + b"\x00"
    # frame 2: 2x1 region at (1,1), color 1 + transparent index 3
    out += b"\x21\xf9\x04" + bytes([0x05, 0, 0, 3]) + b"\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 1, 0)
    idx2 = np.array([1, 3], np.uint8)  # green, transparent
    out.append(2)
    lzw = _lzw_encode(2, idx2)
    out.append(len(lzw))
    out += lzw + b"\x00"
    out += b"\x3b"

    w, h, frames, transp = decode_gif(bytes(out))
    assert (w, h) == (4, 2)
    assert len(frames) == 2
    assert (frames[0] == [255, 0, 0]).all()
    f2 = frames[1]
    assert (f2[1, 1] == [0, 255, 0]).all()      # painted green
    assert (f2[1, 2] == [255, 0, 0]).all()      # transparent: red shows
    assert not transp[1]  # everything painted at some point -> opaque


def test_first_frame_transparency_yields_rgba():
    """A single-frame GIF with a transparent index decodes as RGBA via
    decode_image_py, alpha 0 exactly where the index matched."""
    gct = bytes([10, 20, 30,  40, 50, 60,  0, 0, 0,  0, 0, 0])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 3, 1, 0x80 | 0x01, 2, 0)
    out += gct
    out += b"\x21\xf9\x04" + bytes([0x01, 0, 0, 1]) + b"\x00"  # transp idx 1
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 3, 1, 0)
    idx = np.array([0, 1, 0], np.uint8)
    out.append(2)
    lzw = _lzw_encode(2, idx)
    out.append(len(lzw))
    out += lzw + b"\x00\x3b"
    w, h, c, arr = decode_image_py(bytes(out))
    assert (w, h, c) == (3, 1, 4)
    assert list(arr[0, 0]) == [10, 20, 30, 255]
    assert arr[0, 1, 3] == 0          # transparent pixel
    assert list(arr[0, 2]) == [10, 20, 30, 255]


def test_corruption_contained_fuzzed():
    rng = _rng(8)
    frames = [_palette_image(rng, 10, 10, 16) for _ in range(2)]
    blob = bytearray(encode_gif(frames))
    for trial in range(60):
        bad = bytearray(blob)
        if trial % 3 == 0:
            bad = bad[: int(rng.integers(6, len(bad)))]
        else:
            for _ in range(int(rng.integers(1, 6))):
                bad[int(rng.integers(6, len(bad)))] = int(rng.integers(0, 256))
        try:
            decode_gif(bytes(bad))
        except DECODE_ERRORS:
            pass  # the only acceptable failure mode


def test_codec_pair_roundtrip_fuzzed():
    rng = _rng(9)
    for trial in range(20):
        h = int(rng.integers(1, 30))
        w = int(rng.integers(1, 30))
        nc = int(rng.integers(1, 257))
        interlace = bool(rng.integers(0, 2))
        arr = _palette_image(rng, h, w, nc)
        blob = encode_gif(arr, interlace=interlace)
        ww, hh, cc, out = decode_image_py(blob)
        assert (ww, hh, cc) == (w, h, 3), (trial, h, w, nc)
        assert np.array_equal(out, arr), (trial, h, w, nc, interlace)


def test_gif_through_spark_pipelines(spark):
    """Static GIFs flow through image_info/thumbnails; animated GIFs
    flow through sample_frames like AVI; corrupt rows are contained."""
    from fscrawler_spark.functions import multimodal as MM

    rng = _rng(10)
    img = encode_gif(_palette_image(rng, 12, 20, 50))
    anim_frames = [_palette_image(rng, 6, 4, 10) for _ in range(6)]
    anim = encode_gif(anim_frames)
    media = spark.createDataFrame(
        [(1, "http://m.example/a.gif", "image", img, {}),
         (2, "http://m.example/b.gif", "video", anim, {}),
         (3, "http://m.example/bad.gif", "image", img[:16], {})],
        MM.MEDIA_SCHEMA,
    )
    info = {r["media_id"]: r for r in MM.image_info(media).collect()}
    assert (info[1]["width"], info[1]["height"], info[1]["channels"]) == (20, 12, 3)
    assert info[3]["width"] is None
    frames = MM.sample_frames(media, every_n=2).collect()
    assert {r["frame_idx"] for r in frames} == {0, 2, 4}
    thumbs = MM.thumbnails(media, max_px=5, n_frames=2).collect()
    kinds = {(r["media_id"], r["kind"], r["frame_idx"]) for r in thumbs}
    assert (1, "cover", 0) in kinds
    assert (2, "frame", 0) in kinds and (2, "frame", 5) in kinds


def test_second_gce_clearing_transparency_wins():
    """A later GCE before the image replaces the earlier one (spec):
    pixels painted with the formerly-transparent index must come back
    OPAQUE in the first frame's alpha channel."""
    gct = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  9, 9, 9])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0x80 | 0x01, 0, 0)
    out += gct
    # GCE #1: transparency on, index 1
    out += b"\x21\xf9\x04" + bytes([0x01, 0, 0, 1]) + b"\x00"
    # GCE #2: transparency OFF (replaces #1)
    out += b"\x21\xf9\x04" + bytes([0x00, 0, 0, 0]) + b"\x00"
    # 1x2 frame at (0,0) painting indices [1, 0] — screen bottom row
    # stays unpainted, so the first frame is RGBA
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0)
    idx = np.array([1, 0], np.uint8)
    out.append(2)
    lzw = _lzw_encode(2, idx)
    out.append(len(lzw))
    out += lzw + b"\x00\x3b"
    w, h, c, arr = decode_image_py(bytes(out))
    assert (w, h, c) == (2, 2, 4)
    assert arr[0, 0, 3] == 255          # index-1 pixel painted OPAQUE
    assert list(arr[0, 0, :3]) == [0, 255, 0]
    assert arr[1, 0, 3] == 0            # uncovered row transparent


def test_disposal_restore_previous_restores_paint_mask():
    """Disposal 3 must restore the paint MASK along with the pixels:
    frames after a restore-to-previous must report unpainted regions
    again (review finding)."""
    gct = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  9, 9, 9])

    def frame(gce_disposal, fx, fy, fw, fh, indices):
        b = bytearray()
        b += b"\x21\xf9\x04" + bytes([gce_disposal << 2, 0, 0, 0]) + b"\x00"
        b += b"\x2c" + struct.pack("<HHHHB", fx, fy, fw, fh, 0)
        b.append(2)
        lzw = _lzw_encode(2, np.asarray(indices, np.uint8))
        b.append(len(lzw))
        b += lzw + b"\x00"
        return bytes(b)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0x80 | 0x01, 0, 0)
    out += gct
    out += frame(0, 0, 0, 1, 1, [1])        # paints 1 of 4 pixels
    out += frame(3, 0, 0, 2, 2, [2, 2, 2, 2])  # full cover, restore-prev
    out += frame(0, 1, 1, 1, 1, [1])        # paints 1 more pixel
    out += b"\x3b"
    w, h, frames, transp = decode_gif(bytes(out))
    assert len(frames) == 3
    # frame 3 composites onto the RESTORED state: only 2 of 4 pixels
    # were ever painted there, so it still exposes background
    assert transp == [True, False, True]
    assert (frames[2][0, 0] == [0, 255, 0]).all()   # frame-1 pixel back
    assert (frames[2][0, 1] == [255, 0, 0]).all()   # background again
