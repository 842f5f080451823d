"""Baseline JPEG codec roundtrips (functions/jpeg.py).

The decoder reads quant + huffman tables from the stream the encoder
writes, so these roundtrips exercise the full marker/entropy/DCT
pipeline end-to-end.  quality=100 scales every quant entry to 1, so
the only loss is DCT<->IDCT float rounding (and YCbCr conversion for
color) — tight absolute tolerances are asserted, not similarity.
No Spark session needed: the codec is plain numpy.
"""

from __future__ import annotations

import numpy as np
import pytest

from fscrawler_spark.functions.jpeg import (
    QUANT_LUMA,
    ZIGZAG,
    _quality_scale,
    decode_jpeg,
    encode_jpeg,
)
from fscrawler_spark.functions.multimodal import (
    DECODE_ERRORS,
    decode_image_py,
)


def _rng(seed: int) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64(seed))


def test_zigzag_is_the_standard_order():
    # spot-check the generated order against the published first/last
    # entries of the T.81 zigzag sequence
    expected_head = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(ZIGZAG[:10]) == expected_head
    assert ZIGZAG[63] == 63
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_quality_100_gives_all_ones_tables():
    assert (_quality_scale(QUANT_LUMA, 100) == 1).all()
    assert (_quality_scale(QUANT_LUMA, 50) == QUANT_LUMA).all()


def test_gray_roundtrip_near_lossless():
    arr = _rng(1).integers(0, 256, (17, 24), dtype=np.uint8)
    blob = encode_jpeg(arr, quality=100)
    w, h, c, out = decode_jpeg(blob)
    assert (w, h, c) == (24, 17, 1)
    # all-ones quant: only DCT/IDCT float rounding remains
    assert int(np.abs(out.astype(int) - arr.astype(int)).max()) <= 1


def test_rgb_444_roundtrip_near_lossless():
    arr = _rng(2).integers(0, 256, (16, 16, 3), dtype=np.uint8)
    blob = encode_jpeg(arr, quality=100)
    w, h, c, out = decode_jpeg(blob)
    assert (w, h, c) == (16, 16, 3)
    # YCbCr both ways adds a couple of counts of rounding error
    assert int(np.abs(out.astype(int) - arr.astype(int)).max()) <= 3


def test_constant_color_is_exact_even_with_420_subsampling():
    arr = np.full((20, 28, 3), (200, 30, 90), dtype=np.uint8)
    blob = encode_jpeg(arr, quality=100, subsample=True)
    w, h, c, out = decode_jpeg(blob)
    assert (w, h, c) == (28, 20, 3)
    assert int(np.abs(out.astype(int) - arr.astype(int)).max()) <= 1


def test_420_subsampling_on_smooth_gradient():
    yy, xx = np.mgrid[0:24, 0:32]
    arr = np.stack(
        [(4 * xx) % 256, (4 * yy) % 256, (2 * (xx + yy)) % 256], axis=-1
    ).astype(np.uint8)
    blob = encode_jpeg(arr, quality=100, subsample=True)
    w, h, c, out = decode_jpeg(blob)
    assert (w, h, c) == (32, 24, 3)
    # chroma is 2x2 box-averaged then nearest-upsampled: bounded by the
    # local chroma variation of the gradient, not unbounded
    assert int(np.abs(out.astype(int) - arr.astype(int)).max()) <= 16
    assert float(np.abs(out.astype(int) - arr.astype(int)).mean()) <= 4.0


def test_restart_markers_roundtrip():
    arr = _rng(3).integers(0, 256, (33, 41), dtype=np.uint8)
    plain = encode_jpeg(arr, quality=100)
    rst = encode_jpeg(arr, quality=100, restart_interval=3)
    assert b"\xff\xdd" in rst and b"\xff\xd0" in rst
    _, _, _, out_plain = decode_jpeg(plain)
    _, _, _, out_rst = decode_jpeg(rst)
    # restart segmentation must not change decoded pixels at all
    assert (out_plain == out_rst).all()
    assert int(np.abs(out_rst.astype(int) - arr.astype(int)).max()) <= 1


def test_lossy_quality_still_resembles_input():
    # a flat image with mild noise survives q=85 within JPEG-typical error
    base = np.full((16, 16), 128, dtype=np.int32)
    noise = _rng(4).integers(-8, 9, (16, 16))
    arr = np.clip(base + noise, 0, 255).astype(np.uint8)
    blob = encode_jpeg(arr, quality=85)
    _, _, _, out = decode_jpeg(blob)
    assert float(np.abs(out.astype(int) - arr.astype(int)).mean()) <= 8.0


def test_odd_dimensions_and_edge_padding():
    arr = _rng(5).integers(0, 256, (9, 13, 3), dtype=np.uint8)
    blob = encode_jpeg(arr, quality=100, subsample=True)
    w, h, c, out = decode_jpeg(blob)
    assert (w, h, c) == (13, 9, 3)
    assert out.shape == (9, 13, 3)


def test_truncated_stream_raises_value_error():
    arr = _rng(6).integers(0, 256, (16, 16), dtype=np.uint8)
    blob = encode_jpeg(arr, quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) // 2])
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no scan


def test_progressive_gray_roundtrip_near_lossless():
    arr = _rng(11).integers(0, 256, (17, 24), dtype=np.uint8)
    blob = encode_jpeg(arr, quality=100, progressive=True)
    w, h, c, out = decode_jpeg(blob)
    assert (w, h, c) == (24, 17, 1)
    assert int(np.abs(out.astype(int) - arr.astype(int)).max()) <= 1


def test_progressive_decodes_identical_to_baseline():
    """Progressive re-codes the SAME quantized coefficients as baseline
    (spectral selection + successive approximation change only the
    entropy layer, T.81 annex G), so decode must be pixel-identical to
    the baseline encode at every quality/subsample combination."""
    for seed, q, sub in [(12, 90, False), (13, 50, True), (14, 75, True)]:
        arr = _rng(seed).integers(0, 256, (23, 31, 3), dtype=np.uint8)
        prog = decode_jpeg(encode_jpeg(arr, quality=q, progressive=True,
                                       subsample=sub))
        base = decode_jpeg(encode_jpeg(arr, quality=q, subsample=sub))
        assert prog[:3] == base[:3]
        assert np.array_equal(prog[3], base[3])


def test_progressive_with_restart_markers():
    arr = _rng(15).integers(0, 256, (33, 41, 3), dtype=np.uint8)
    prog = decode_jpeg(
        encode_jpeg(arr, quality=85, progressive=True, restart_interval=2)
    )
    base = decode_jpeg(encode_jpeg(arr, quality=85))
    assert np.array_equal(prog[3], base[3])


def test_corrupt_sos_component_id_contained():
    """A scan header naming a component the frame never declared must
    raise inside DECODE_ERRORS — the bare next() lookup used to escape
    as StopIteration, which would fail a whole Spark job."""
    arr = _rng(17).integers(0, 256, (16, 16), dtype=np.uint8)
    blob = bytearray(encode_jpeg(arr, quality=90))
    i = blob.find(b"\xff\xda")
    blob[i + 5] = 99  # bogus component id in SOS
    with pytest.raises(ValueError):
        decode_jpeg(bytes(blob))


def test_progressive_truncated_raises_value_error():
    arr = _rng(16).integers(0, 256, (16, 16), dtype=np.uint8)
    blob = encode_jpeg(arr, quality=90, progressive=True)
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) // 2])
    # headers-only SOF2 stream (the old NotImplementedError fixture):
    # progressive is now real, so this is a truncation, still contained
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xc2\x00\x08\x08\x00\x10\x00\x10\x01")


def test_dispatch_and_containment_via_decode_image_py():
    arr = _rng(7).integers(0, 256, (8, 8, 3), dtype=np.uint8)
    blob = encode_jpeg(arr, quality=100)
    w, h, c, out = decode_image_py(blob)
    assert (w, h, c) == (8, 8, 3)
    assert out.shape == (8, 8, 3)
    # both failure modes are members of the shared containment tuple
    try:
        decode_image_py(blob[:20])
    except DECODE_ERRORS:
        pass
    try:
        decode_image_py(b"\xff\xd8\xff\xc2\x00\x08\x08\x00\x10\x00\x10\x01")
    except DECODE_ERRORS:
        pass


def test_jpeg_through_spark_image_pipeline(spark):
    """A real JPEG blob flows through the same mapInPandas consumers as
    PNG/BMP (image_info dims + thumbnails), and a corrupt JPEG row is
    contained without failing the job."""
    from fscrawler_spark.functions import multimodal as MM

    arr = _rng(8).integers(0, 256, (12, 20, 3), dtype=np.uint8)
    blob = encode_jpeg(arr, quality=100)
    media = spark.createDataFrame(
        [(1, "http://m.example/a.jpg", "image", blob, {}),
         (2, "http://m.example/bad.jpg", "image", blob[:24], {})],
        MM.MEDIA_SCHEMA,
    )
    info = {r["media_id"]: r for r in MM.image_info(media).collect()}
    assert (info[1]["width"], info[1]["height"], info[1]["channels"]) == (20, 12, 3)
    assert info[2]["width"] is None  # corrupt row contained, not fatal
    thumbs = MM.thumbnails(media, max_px=5).collect()
    assert {r["media_id"] for r in thumbs} == {1}
    (t,) = thumbs
    assert (t["width"], t["height"]) == (5, 3)
    _w, _h, _c, dec = MM.decode_image_py(bytes(t["thumb"]))
    expect = MM._pool_to_max(decode_jpeg(blob)[3].reshape(12, 20, 3), 5)
    assert np.array_equal(dec, expect)


def test_thumbnails_jpeg_codec_option(spark):
    """thumbnails(codec='jpeg') stores previews through the baseline
    JPEG encoder: blobs carry the JPEG magic, decode to the same dims
    as the PNG path, and stay within lossy-roundtrip error of the
    independently pooled pixels; a bad codec name raises."""
    from fscrawler_spark.functions import multimodal as MM

    img = MM.encode_fake_image(12, 6, 3, seed=50)
    media = spark.createDataFrame(
        [(1, "u1", "image", img, {})], MM.MEDIA_SCHEMA
    )
    with pytest.raises(ValueError):
        MM.thumbnails(media, codec="webp")
    (r,) = MM.thumbnails(media, max_px=4, codec="jpeg",
                         jpeg_quality=100).collect()
    blob = bytes(r["thumb"])
    assert blob[:3] == b"\xff\xd8\xff"
    w, h, c, dec = decode_jpeg(blob)
    assert (w, h, c) == (r["width"], r["height"], 3) == (4, 2, 3)
    src = np.frombuffer(img, np.uint8, 12 * 6 * 3, 19).reshape(6, 12, 3)
    expect = src.reshape(2, 3, 4, 3, 3).mean(axis=(1, 3)).astype(np.uint8)
    assert int(np.abs(dec.astype(int) - expect.astype(int)).max()) <= 3


def test_jpeg_codec_pair_roundtrip_fuzzed():
    """Property: random shapes/channels/subsampling/restart intervals
    roundtrip at quality=100 within fixed tolerances — 1 count gray,
    3 counts RGB (YCbCr conversion rounding).  For 4:2:0 on random
    noise, RGB error is dominated by the 2x2 chroma box mean BY DESIGN,
    but the luma plane is full-resolution and the RGB->YCbCr->RGB
    coefficients cancel on Y, so reconstructed LUMA must still match
    (up to gamut clipping on extreme chroma)."""
    rng = _rng(99)

    def luma(img):
        f = img.astype(np.float64)
        return 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]

    for trial in range(20):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        gray = bool(rng.integers(0, 2))
        sub = (not gray) and bool(rng.integers(0, 2))
        ri = int(rng.choice([0, 0, 1, 2, 5]))
        shape = (h, w) if gray else (h, w, 3)
        arr = rng.integers(0, 256, shape, dtype=np.uint8)
        blob = encode_jpeg(arr, quality=100, subsample=sub,
                           restart_interval=ri)
        ww, hh, cc, dec = decode_jpeg(blob)
        assert (ww, hh, cc) == (w, h, 1 if gray else 3), (trial, shape)
        dec = dec.reshape(arr.shape)
        if sub:
            lerr = np.abs(luma(dec) - luma(arr))
            assert float(lerr.mean()) <= 4.0, (trial, shape, ri)
        else:
            err = np.abs(dec.astype(int) - arr.astype(int))
            assert int(err.max()) <= (1 if gray else 3), (trial, shape, ri)


def test_jpeg_decoder_corruption_contained_fuzzed():
    """Property: randomly corrupting a valid JPEG (byte flips and
    truncations) only ever raises members of DECODE_ERRORS — a corrupt
    blob can never crash a mapInPandas consumer with a foreign
    exception type."""
    rng = _rng(98)
    arr = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    blob = bytearray(encode_jpeg(arr, quality=90, restart_interval=2))
    for trial in range(60):
        bad = bytearray(blob)
        if trial % 3 == 0:
            bad = bad[: int(rng.integers(2, len(bad)))]
        else:
            for _ in range(int(rng.integers(1, 6))):
                bad[int(rng.integers(2, len(bad)))] = int(rng.integers(0, 256))
        try:
            decode_jpeg(bytes(bad))
        except DECODE_ERRORS:
            pass  # the only acceptable failure mode
