"""FLAC codec roundtrips (functions/flac.py).

FLAC is lossless, so every roundtrip asserts EXACT sample equality
through the full pipeline: STREAMINFO, frame headers (CRC-8), Rice
residuals, fixed and LPC predictors, stereo decorrelation modes,
wasted bits, frame CRC-16, and the STREAMINFO PCM MD5 (which the
decoder verifies, so a single flipped sample anywhere would fail).
"""

from __future__ import annotations

import numpy as np
import pytest

from fscrawler_spark.functions.flac import (
    _crc8,
    _crc16,
    _utf8_encode,
    decode_flac,
    encode_flac,
)
from fscrawler_spark.functions.multimodal import (
    AUDIO_DECODE_ERRORS,
    decode_audio_py,
)


def _rng(seed: int) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64(seed))


def _tone(n, sr=8000, f=440.0, amp=12000):
    t = np.arange(n) / sr
    return np.round(amp * np.sin(2 * np.pi * f * t)).astype(np.int64)


def test_crc_reference_values():
    # classic check values for the two FLAC polynomials
    assert _crc8(b"123456789") == 0xF4        # CRC-8/SMBUS (poly 0x07)
    assert _crc16(b"123456789") == 0xFEE8     # CRC-16/BUYPASS (poly 0x8005)


def test_utf8_number_boundaries():
    assert _utf8_encode(0) == b"\x00"
    assert _utf8_encode(0x7F) == b"\x7f"
    assert _utf8_encode(0x80) == b"\xc2\x80"   # standard UTF-8 of U+0080
    assert _utf8_encode(0x7FF) == b"\xdf\xbf"
    assert _utf8_encode(0x800) == b"\xe0\xa0\x80"


def test_mono_tone_roundtrip_exact():
    x = _tone(5000)
    blob = encode_flac(x, 8000)
    sr, out = decode_flac(blob)
    assert sr == 8000
    assert np.array_equal(out, x)
    # a sine compresses well below raw PCM
    assert len(blob) < 2 * len(x) * 0.8


def test_noise_roundtrip_exact_multiframe():
    x = _rng(1).integers(-30000, 30000, 10000).astype(np.int64)
    blob = encode_flac(x, 44100, block_size=1024)  # 10 frames
    sr, out = decode_flac(blob)
    assert sr == 44100
    assert np.array_equal(out, x)


@pytest.mark.parametrize("mode", ["indep", "left_side", "right_side",
                                  "mid_side"])
def test_stereo_decorrelation_modes_exact(mode):
    rng = _rng(2)
    left = _tone(3000, f=330.0)
    right = left + rng.integers(-500, 500, 3000)  # correlated channels
    x = np.stack([left, right], axis=1)
    blob = encode_flac(x, 16000, channel_mode=mode, block_size=512)
    sr, out = decode_flac(blob)
    assert sr == 16000
    assert np.array_equal(out, x), mode


def test_lpc_subframes_roundtrip_exact():
    x = _tone(4000, f=220.0) + _rng(3).integers(-50, 50, 4000)
    plain = encode_flac(x, 8000)
    lpc = encode_flac(x, 8000, lpc_order=8)
    assert b"fLaC" == lpc[:4]
    for blob in (plain, lpc):
        _, out = decode_flac(blob)
        assert np.array_equal(out, x)
    # LPC should beat the fixed predictors on a near-periodic signal
    assert len(lpc) <= len(plain)


def test_constant_and_wasted_bits():
    # constant block -> CONSTANT subframe
    x = np.full(2000, -1234, np.int64)
    blob = encode_flac(x, 8000)
    _, out = decode_flac(blob)
    assert np.array_equal(out, x)
    # every sample a multiple of 8 -> 3 wasted bits, still exact
    x = (_rng(4).integers(-3000, 3000, 2000) * 8).astype(np.int64)
    blob = encode_flac(x, 8000)
    _, out = decode_flac(blob)
    assert np.array_equal(out, x)


def test_8bit_and_24bit_depths():
    x8 = _rng(5).integers(-128, 128, 3000).astype(np.int64)
    _, out = decode_flac(encode_flac(x8, 8000, bps=8))
    assert np.array_equal(out, x8)
    x24 = _rng(6).integers(-(1 << 23), 1 << 23, 3000).astype(np.int64)
    _, out = decode_flac(encode_flac(x24, 48000, bps=24))
    assert np.array_equal(out, x24)


def test_out_of_range_samples_raise():
    with pytest.raises(ValueError):
        encode_flac(np.array([40000]), 8000, bps=16)


def test_md5_catches_any_tamper():
    """Flipping one PCM-affecting byte must be caught by a CRC or the
    STREAMINFO MD5 — silent sample corruption is impossible."""
    x = _tone(3000)
    blob = bytearray(encode_flac(x, 8000))
    rng = _rng(7)
    caught = 0
    for _ in range(40):
        bad = bytearray(blob)
        i = int(rng.integers(42, len(bad)))  # past STREAMINFO
        bad[i] ^= 0xFF
        try:
            _, out = decode_flac(bytes(bad))
            assert np.array_equal(out, x)  # only OK if truly unaffected
        except AUDIO_DECODE_ERRORS:
            caught += 1
    assert caught >= 35  # byte flips in frame data are essentially always caught


def test_corruption_contained_fuzzed():
    rng = _rng(8)
    x = _rng(9).integers(-20000, 20000, 4000).astype(np.int64)
    blob = bytearray(encode_flac(x, 8000, block_size=512))
    for trial in range(60):
        bad = bytearray(blob)
        if trial % 3 == 0:
            bad = bad[: int(rng.integers(4, len(bad)))]
        else:
            for _ in range(int(rng.integers(1, 6))):
                bad[int(rng.integers(4, len(bad)))] = int(rng.integers(0, 256))
        try:
            decode_flac(bytes(bad))
        except AUDIO_DECODE_ERRORS:
            pass  # the only acceptable failure mode


def test_codec_pair_roundtrip_fuzzed():
    rng = _rng(10)
    for trial in range(15):
        n = int(rng.integers(1, 5000))
        nch = int(rng.integers(1, 3))
        bps = int(rng.choice([8, 16, 24]))
        lim = 1 << (bps - 1)
        shape = (n,) if nch == 1 else (n, 2)
        x = rng.integers(-lim, lim, shape).astype(np.int64)
        mode = "indep" if nch == 1 else \
            str(rng.choice(["indep", "left_side", "right_side", "mid_side"]))
        lpc = int(rng.choice([0, 0, 4, 8]))
        blob = encode_flac(x, 8000, bps=bps, block_size=576,
                           channel_mode=mode, lpc_order=lpc)
        sr, out = decode_flac(blob)
        assert np.array_equal(out, x), (trial, n, nch, bps, mode, lpc)


def test_audio_dispatch_and_spark_pipeline(spark):
    """FLAC flows through decode_audio_py (stereo mixdown like WAV) and
    the Spark audio_features pipeline; corrupt rows are contained."""
    from fscrawler_spark.functions import multimodal as MM

    left = _tone(4000, f=440.0)
    right = _tone(4000, f=880.0, amp=6000)
    x = np.stack([left, right], axis=1)
    blob = encode_flac(x, 16000, channel_mode="mid_side")
    sr, mono = decode_audio_py(blob)
    assert sr == 16000
    assert np.allclose(mono, x.mean(axis=1))

    media = spark.createDataFrame(
        [(1, "http://m.example/a.flac", "audio", blob, {}),
         (2, "http://m.example/bad.flac", "audio", blob[:40], {})],
        MM.MEDIA_SCHEMA,
    )
    rows = MM.audio_features(media, n_windows=4).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert len(by_media[1]) == 4  # 4 windows of (RMS, ZCR)
    assert all(r["rms"] > 0 for r in by_media[1])
    assert 2 not in by_media  # corrupt row contained (skipped, not fatal)


def test_header_field_limits_raise_at_encode():
    """Oversized header fields must fail at encode time, not silently
    mask into an undecodable stream (review finding)."""
    x = _tone(100)
    with pytest.raises(ValueError):
        encode_flac(x, 8000, block_size=70000)
    with pytest.raises(ValueError):
        encode_flac(x, 1 << 20)  # sample rate exceeds 20-bit field


def test_truncated_stream_with_unset_md5_raises():
    """Cutting a stream at a frame boundary must raise even when the
    STREAMINFO MD5 is zeroed out (review finding) — never silently
    return short audio."""
    x = _rng(11).integers(-20000, 20000, 4096).astype(np.int64)
    blob = bytearray(encode_flac(x, 8000, block_size=1024))
    # zero the STREAMINFO MD5 (bytes 26..42 of the 42-byte prefix:
    # 4 magic + 4 block header + 34 streaminfo; md5 is its last 16)
    blob[26:42] = b"\x00" * 16
    # find the start of the LAST frame by sync-scanning from the end
    cut = None
    for i in range(len(blob) - 2, 42, -1):
        if blob[i] == 0xFF and (blob[i + 1] & 0xFC) == 0xF8:
            cut = i
            break
    assert cut is not None and cut > 42
    with pytest.raises(ValueError):
        decode_flac(bytes(blob[:cut]))
    # the untruncated zero-md5 stream still decodes exactly
    _, out = decode_flac(bytes(blob))
    assert np.array_equal(out, x)
