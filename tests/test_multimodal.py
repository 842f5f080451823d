"""Multimodal binary-column plumbing: schema, mapInPandas batch shape,
deterministic fake decoders, frame explosion, JVM-side header parsing.
(Real codecs are stubbed behind import-try — absent in this container.)"""

from __future__ import annotations

import numpy as np
import pytest

from fscrawler_spark.functions import multimodal as MM


@pytest.fixture(scope="module")
def media_df(spark):
    rows = []
    for i in range(12):
        rows.append(
            (i, f"http://m.example/img{i}.png", "image",
             MM.encode_fake_image(8 + i, 6, 3, seed=i), {"src": "gen"})
        )
    for i in range(12, 18):
        rows.append(
            (i, f"http://m.example/a{i}.wav", "audio",
             MM.encode_fake_audio(16000, 8000 * (i - 11), seed=i), {})
        )
    for i in range(18, 22):
        rows.append(
            (i, f"http://m.example/v{i}.mp4", "video",
             MM.encode_fake_video(7, 4, 3, seed=i), {})
        )
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA).repartition(4)


def test_image_info(media_df):
    got = {r["media_id"]: r for r in MM.image_info(media_df).collect()}
    assert len(got) == 12
    for i in range(12):
        r = got[i]
        assert (r["width"], r["height"], r["channels"]) == (8 + i, 6, 3)
        assert r["n_bytes"] == 19 + (8 + i) * 6 * 3
        # px_sum must equal an independent numpy sum over the raw payload
        blob = MM.encode_fake_image(8 + i, 6, 3, seed=i)
        assert r["px_sum"] == int(
            np.frombuffer(blob[19:], dtype=np.uint8).sum()
        )


def test_image_features_deterministic_and_normed(media_df):
    a = {r["media_id"]: r["features"] for r in MM.image_features(media_df, dim=16).collect()}
    b = {r["media_id"]: r["features"] for r in MM.image_features(media_df, dim=16).collect()}
    assert a == b  # deterministic across runs/partitionings
    for v in a.values():
        assert len(v) == 16
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5


def test_frame_sampling_explodes(media_df):
    rows = MM.sample_frames(media_df, every_n=2).collect()
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == {18, 19, 20, 21}
    for vid, frames in by_id.items():
        assert [f["frame_idx"] for f in sorted(frames, key=lambda x: x["frame_idx"])] == [0, 2, 4, 6]
        assert all(len(f["frame"]) == 12 for f in frames)  # 4x3 bytes


def test_audio_duration_jvm_side(media_df):
    got = {r["media_id"]: r for r in MM.audio_duration(media_df).collect()}
    assert len(got) == 6
    for i in range(12, 18):
        r = got[i]
        assert r["sample_rate"] == 16000
        assert r["n_samples"] == 8000 * (i - 11)
        assert r["duration_sec"] == round(r["n_samples"] / 16000, 6)


def test_real_decoder_boundary():
    # PNG and (since the round-4 codecs) JPEG/GIF/TIFF are real decode
    # paths: a truncated blob is a corrupt file (ValueError), not a
    # missing codec
    with pytest.raises(ValueError):
        MM.decode_image_py(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(ValueError):
        MM.decode_image_py(b"\xff\xd8\xff\xe0" + b"0" * 32)
    with pytest.raises(ValueError):
        MM.decode_image_py(b"GIF89a" + b"0" * 32)
    with pytest.raises(ValueError):
        MM.decode_image_py(b"II*\x00" + b"0" * 32)
    # formats with no decoder stay honestly stubbed
    with pytest.raises(NotImplementedError):
        MM.decode_image_py(b"RIFF\x00\x00\x00\x00WEBP" + b"0" * 16)
    with pytest.raises(NotImplementedError):
        MM.decode_audio_py(b"OggS" + b"0" * 32)
    assert MM.decode_image_py(None) is None
    assert MM.decode_audio_py(None) is None


def test_audio_features_windows(spark):
    """Windowed RMS/ZCR over the fake PCM: values must match an
    independent numpy computation on the same payload."""
    import numpy as np

    from fscrawler_spark.functions import multimodal as MM

    blob = MM.encode_fake_audio(8000, 1600, seed=5)
    media = spark.createDataFrame(
        [(1, "u", "audio", blob, {})], MM.MEDIA_SCHEMA
    )
    rows = {
        r["window"]: (r["rms"], r["zcr"])
        for r in MM.audio_features(media, n_windows=4).collect()
    }
    assert sorted(rows) == [0, 1, 2, 3]
    pcm = np.frombuffer(blob[15:], dtype=np.uint8).astype(np.float64) - 128.0
    for w, chunk in enumerate(np.array_split(pcm, 4)):
        rms = float(np.sqrt((chunk**2).mean()))
        signs = np.sign(chunk)
        nz = signs != 0
        zcr = int((np.diff(signs[nz]) != 0).sum()) / max(1, len(chunk) - 1)
        assert abs(rows[w][0] - rms) < 1e-12, w
        assert abs(rows[w][1] - zcr) < 1e-12, w


# ---------------------------------------------------------------------------
# round 4: REAL decoders, stdlib-only (PNG via zlib, WAV via wave)


def _encode_png(
    arr: np.ndarray, color_type: int, row_filters, depth: int = 8,
    palette: np.ndarray | None = None,
) -> bytes:
    """Test-side PNG encoder: applies the spec's per-row filter
    transforms (the exact inverses the decoder must undo) BYTEWISE with
    the spec's bpp left-offset, deflates, frames the chunks.  arr is
    (h, w, c) samples (uint8 or uint16 for depth 16), or (h, w) indices
    for palette (color type 3, with `palette` as (n, 3) RGB rows).
    CRCs via zlib.crc32."""
    import struct
    import zlib

    h, w = arr.shape[:2]
    c = arr.shape[2] if arr.ndim == 3 else 1
    bpp = c * (depth // 8)
    stride = w * bpp
    out = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        if depth == 16:
            raw = np.frombuffer(arr[y].astype(">u2").tobytes(), np.uint8)
        else:
            raw = arr[y].ravel().astype(np.uint8)
        filt = row_filters[y % len(row_filters)]
        left = np.zeros(stride, dtype=np.uint8)
        left[bpp:] = raw[:-bpp]
        ul = np.zeros(stride, dtype=np.uint8)
        ul[bpp:] = prev[:-bpp]
        if filt == 0:
            enc = raw
        elif filt == 1:
            enc = raw - left
        elif filt == 2:
            enc = raw - prev
        elif filt == 3:
            enc = raw - (
                (left.astype(np.int32) + prev.astype(np.int32)) // 2
            ).astype(np.uint8)
        elif filt == 4:
            enc = raw - MM._paeth(left, prev, ul)
        out.append(filt)
        out += enc.tobytes()
        prev = raw

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    blob = MM.PNG_MAGIC + chunk(b"IHDR", ihdr)
    if palette is not None:
        blob += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    return blob + chunk(b"IDAT", zlib.compress(bytes(out))) + chunk(b"IEND", b"")


@pytest.mark.parametrize(
    "color_type,channels", [(0, 1), (2, 3), (4, 2), (6, 4)]
)
def test_png_roundtrip_all_color_types_all_filters(color_type, channels):
    rng = np.random.Generator(np.random.PCG64(color_type + 10))
    arr = rng.integers(0, 256, (7, 5, channels), dtype=np.uint8)
    # 7 rows cycle through every filter type 0..4 (plus 0,1 again)
    blob = _encode_png(arr, color_type, row_filters=[0, 1, 2, 3, 4])
    w, h, c, dec = MM.decode_image_py(blob)
    assert (w, h, c) == (5, 7, channels)
    assert np.array_equal(dec, arr), f"filter unfiltering broke (ct={color_type})"


def test_png_known_pixels():
    """A hand-built 2x2 gray PNG decodes to exactly the known pixels."""
    arr = np.array([[[10], [200]], [[255], [0]]], dtype=np.uint8)
    blob = _encode_png(arr, 0, row_filters=[0])
    w, h, c, dec = MM.decode_image_py(blob)
    assert (w, h, c) == (2, 2, 1)
    assert dec.tolist() == arr.tolist()


def test_png_unsupported_profiles_raise():
    import struct
    import zlib as _z

    def ihdr_png(depth, color, interlace):
        body = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)
        crc = struct.pack(">I", _z.crc32(b"IHDR" + body) & 0xFFFFFFFF)
        return MM.PNG_MAGIC + struct.pack(">I", len(body)) + b"IHDR" + body + crc

    # sub-byte depths are SUPPORTED now (tests/test_png_subbyte.py);
    # a headers-only 4-bit stream still fails contained (empty IDAT)
    with pytest.raises(MM.DECODE_ERRORS):
        MM.decode_image_py(ihdr_png(4, 0, 0))
    with pytest.raises(ValueError):  # 16-bit palette (spec-invalid)
        MM.decode_image_py(ihdr_png(16, 3, 0))
    with pytest.raises(ValueError):  # 2-bit RGB (spec-invalid)
        MM.decode_image_py(ihdr_png(2, 2, 0))
    with pytest.raises(ValueError):  # unknown interlace method
        MM.decode_image_py(ihdr_png(8, 0, 2))
    # Adam7 (interlace=1) is SUPPORTED — tests/test_png_interlace.py;
    # a headers-only Adam7 stream still fails contained (empty IDAT).
    with pytest.raises(MM.DECODE_ERRORS):
        MM.decode_image_py(ihdr_png(8, 0, 1))


def test_png_16bit_roundtrip_all_filters():
    """16-bit samples survive the bytewise unfilter (bpp=2c lanes) and
    come back as big-endian-decoded uint16 exactly."""
    rng = np.random.Generator(np.random.PCG64(21))
    for c, color_type in [(1, 0), (3, 2)]:
        arr = rng.integers(0, 65536, (7, 5, c), dtype=np.uint16)
        blob = _encode_png(arr, color_type, row_filters=[0, 1, 2, 3, 4], depth=16)
        w, h, cc, dec = MM.decode_image_py(blob)
        assert (w, h, cc) == (5, 7, c)
        assert dec.dtype == np.uint16
        assert np.array_equal(dec, arr)


def test_png_palette_roundtrip():
    """8-bit palette PNG: indices unfilter, then PLTE lookup -> RGB."""
    rng = np.random.Generator(np.random.PCG64(22))
    palette = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (6, 9), dtype=np.uint8)
    blob = _encode_png(idx, 3, row_filters=[0, 1, 2, 3, 4], palette=palette)
    w, h, c, dec = MM.decode_image_py(blob)
    assert (w, h, c) == (9, 6, 3)
    assert np.array_equal(dec, palette[idx])


def _encode_bmp(px: np.ndarray, top_down: bool = False,
                palette: np.ndarray | None = None) -> bytes:
    """Test-side BMP encoder: BITMAPINFOHEADER, BI_RGB, padded rows.
    px is (h, w, 3) RGB for 24-bit or (h, w) indices with `palette`."""
    import struct

    h, w = px.shape[:2]
    if palette is None:
        row_bytes = (w * 3 + 3) & ~3
        pal_blob = b""
        bitcount = 24
    else:
        row_bytes = (w + 3) & ~3
        # BGRA palette entries
        pal_blob = b"".join(
            bytes([b, g, r, 0]) for r, g, b in palette.tolist()
        )
        bitcount = 8
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        if palette is None:
            line = px[y][:, ::-1].astype(np.uint8).tobytes()  # RGB -> BGR
        else:
            line = px[y].astype(np.uint8).tobytes()
        rows.append(line + b"\x00" * (row_bytes - len(line)))
    body = b"".join(rows)
    off_bits = 14 + 40 + len(pal_blob)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bitcount, 0,
        len(body), 2835, 2835, len(palette) if palette is not None else 0, 0,
    )
    hdr = b"BM" + struct.pack("<IHHI", off_bits + len(body), 0, 0, off_bits)
    return hdr + info + pal_blob + body


def test_bmp_24bit_roundtrip_both_row_orders():
    rng = np.random.Generator(np.random.PCG64(23))
    arr = rng.integers(0, 256, (5, 3, 3), dtype=np.uint8)  # w=3 -> padded rows
    for top_down in (False, True):
        w, h, c, dec = MM.decode_image_py(_encode_bmp(arr, top_down=top_down))
        assert (w, h, c) == (3, 5, 3)
        assert np.array_equal(dec, arr), f"top_down={top_down}"


def test_bmp_8bit_palette_roundtrip():
    rng = np.random.Generator(np.random.PCG64(24))
    palette = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, (4, 6), dtype=np.uint8)
    w, h, c, dec = MM.decode_image_py(_encode_bmp(idx, palette=palette))
    assert (w, h, c) == (6, 4, 3)
    assert np.array_equal(dec, palette[idx])


def test_bmp_compressed_raises():
    import struct

    # RLE8 is SUPPORTED now (tests/test_bmp_profiles.py) — on a 24-bit
    # header it's a bitcount mismatch, contained as a corrupt stream
    blob = bytearray(_encode_bmp(np.zeros((2, 2, 3), np.uint8)))
    struct.pack_into("<I", blob, 30, 1)  # biCompression = BI_RLE8
    with pytest.raises(MM.DECODE_ERRORS):
        MM.decode_image_py(bytes(blob))
    # BI_BITFIELDS is SUPPORTED now but only at 16/32 bits — on this
    # 24-bit header it's a bitcount mismatch, contained as corrupt
    struct.pack_into("<I", blob, 30, 3)  # BI_BITFIELDS
    with pytest.raises(MM.DECODE_ERRORS):
        MM.decode_image_py(bytes(blob))
    # BI_JPEG is SUPPORTED now (delegated to functions/jpeg.py) — on
    # this blob the bitmap data is not a JPEG stream, contained as
    # corrupt (tests/test_bmp_profiles.py has the real-stream cases)
    struct.pack_into("<I", blob, 30, 4)
    with pytest.raises(MM.DECODE_ERRORS):
        MM.decode_image_py(bytes(blob))
    # BI_ALPHABITFIELDS is SUPPORTED at 16/32 bits — on this 24-bit
    # header it's a bitcount mismatch, contained as corrupt
    struct.pack_into("<I", blob, 30, 6)
    with pytest.raises(MM.DECODE_ERRORS):
        MM.decode_image_py(bytes(blob))
    # BI_CMYK (11) stays the honest boundary
    struct.pack_into("<I", blob, 30, 11)
    with pytest.raises(NotImplementedError):
        MM.decode_image_py(bytes(blob))


def _encode_avi(frames: np.ndarray, palette_8bit: bool = False,
                top_down: bool = False) -> bytes:
    """Test-side AVI encoder: RIFF('AVI ') / LIST hdrl (strl: strh
    'vids' + strf BITMAPINFOHEADER, BI_RGB) / LIST movi with '00db' DIB
    frames (bottom-up BGR for 24-bit, padded rows; top-down rows with
    negative biHeight when requested)."""
    import struct

    n, h, w = frames.shape[:3]
    bitcount = 8 if palette_8bit else 24

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    strh = b"vids" + b"\x00" * 52
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bitcount,
        0, 0, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", b"\x00" * 56)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b""
    order = range(h) if top_down else range(h - 1, -1, -1)
    for k in range(n):
        rows = []
        if palette_8bit:
            row_bytes = (w + 3) & ~3
            for y in order:
                line = frames[k, y].astype(np.uint8).tobytes()
                rows.append(line + b"\x00" * (row_bytes - len(line)))
        else:
            row_bytes = (w * 3 + 3) & ~3
            for y in order:
                line = frames[k, y][:, ::-1].astype(np.uint8).tobytes()
                rows.append(line + b"\x00" * (row_bytes - len(line)))
        movi_body += chunk(b"00db", b"".join(rows))
    movi = lst(b"movi", movi_body)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def test_avi_24bit_decode_known_frames():
    rng = np.random.Generator(np.random.PCG64(25))
    frames = rng.integers(0, 256, (4, 3, 5, 3), dtype=np.uint8)  # n,h,w,3
    n, w, h, dec = MM.decode_video_py(_encode_avi(frames))
    assert (n, w, h) == (4, 5, 3)
    for k in range(4):
        got = np.frombuffer(dec[k], np.uint8).reshape(3, 5, 3)
        assert np.array_equal(got, frames[k]), f"frame {k}"


def test_avi_8bit_gray_decode():
    rng = np.random.Generator(np.random.PCG64(26))
    frames = rng.integers(0, 256, (3, 2, 6), dtype=np.uint8)  # n,h,w
    n, w, h, dec = MM.decode_video_py(_encode_avi(frames, palette_8bit=True))
    assert (n, w, h) == (3, 6, 2)
    for k in range(3):
        got = np.frombuffer(dec[k], np.uint8).reshape(2, 6)
        assert np.array_equal(got, frames[k])


def test_avi_compressed_codec_raises():
    import struct

    blob = bytearray(_encode_avi(np.zeros((1, 2, 2, 3), np.uint8)))
    pos = bytes(blob).find(b"strf") + 8  # strf body = BITMAPINFOHEADER
    struct.pack_into("<I", blob, pos + 16, 0x44495643)  # biCompression='CVID'
    with pytest.raises(NotImplementedError):
        MM.decode_video_py(bytes(blob))


def test_avi_top_down_not_flipped():
    """Negative biHeight (top-down DIB) must decode unflipped."""
    rng = np.random.Generator(np.random.PCG64(28))
    frames = rng.integers(0, 256, (2, 3, 4, 3), dtype=np.uint8)
    n, w, h, dec = MM.decode_video_py(_encode_avi(frames, top_down=True))
    assert (n, w, h) == (2, 4, 3)
    for k in range(2):
        got = np.frombuffer(dec[k], np.uint8).reshape(3, 4, 3)
        assert np.array_equal(got, frames[k]), f"frame {k} flipped"


def test_corrupt_rows_contained_not_fatal(spark):
    """One undecodable blob must drop that row, not kill the job (D4):
    wave.Error (valid RIFF magic, garbage body), struct.error
    (truncated FAKEVID/FAKEAUD headers), and short AVIs all contained."""
    good_a = MM.encode_fake_audio(8000, 64, seed=1)
    bad_rows = [
        (2, "u2", "audio", b"RIFF\x24\x00\x00\x00WAVE" + b"\x00" * 8, {}),
        (3, "u3", "audio", b"FAKEAUD" + b"\x01", {}),  # struct.error
    ]
    media = spark.createDataFrame(
        [(1, "u1", "audio", good_a, {})] + bad_rows, MM.MEDIA_SCHEMA
    )
    ids = {r["media_id"] for r in MM.audio_features(media, 2).collect()}
    assert ids == {1}

    good_v = MM.encode_fake_video(3, 2, 2, seed=2)
    media_v = spark.createDataFrame(
        [
            (1, "v1", "video", good_v, {}),
            (2, "v2", "video", b"FAKEVID" + b"\x02", {}),  # struct.error
            (3, "v3", "video", b"RIFF\x10\x00\x00\x00AVI " + b"\x00" * 8, {}),
        ],
        MM.MEDIA_SCHEMA,
    )
    vids = {r["media_id"] for r in MM.sample_frames(media_v, 1).collect()}
    assert vids == {1}


def test_audio_duration_wav_and_unknown(spark):
    """audio_duration dispatches JVM-side: FAKEAUD and canonical WAV
    both yield exact header values; unknown formats yield NULLs, not
    garbage."""
    samples = np.zeros(1234, dtype="<i2")
    wav = _encode_wav(samples, 22050, 1, 2)
    rows = [
        (1, "u1", "audio", MM.encode_fake_audio(16000, 8000, seed=3), {}),
        (2, "u2", "audio", wav, {}),
        (3, "u3", "audio", b"OggS" + b"\x00" * 40, {}),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in MM.audio_duration(media).collect()}
    assert (got[1]["sample_rate"], got[1]["n_samples"]) == (16000, 8000)
    assert got[1]["duration_sec"] == 0.5
    assert (got[2]["sample_rate"], got[2]["n_samples"]) == (22050, 1234)
    assert abs(got[2]["duration_sec"] - round(1234 / 22050, 6)) < 1e-12
    assert got[3]["sample_rate"] is None
    assert got[3]["n_samples"] is None
    assert got[3]["duration_sec"] is None


def test_png_codec_pair_roundtrip_fuzzed():
    """Property: encode_png(arr) always decodes back to arr, any shape/
    channel count (hypothesis-style fuzz with a fixed seed budget)."""
    rng = np.random.Generator(np.random.PCG64(99))
    for _ in range(25):
        h = int(rng.integers(1, 12))
        w = int(rng.integers(1, 12))
        c = int(rng.integers(1, 5))
        arr = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        ww, hh, cc, dec = MM.decode_image_py(MM.encode_png(arr))
        assert (ww, hh, cc) == (w, h, c)
        assert np.array_equal(dec, arr), (h, w, c)


def test_png_decoder_fuzzed_all_filters_all_depths():
    """Property: the bytewise unfilter inverts every filter type at
    both depths and random shapes (the encoder applies the spec's
    forward transforms)."""
    rng = np.random.Generator(np.random.PCG64(98))
    for _ in range(15):
        h = int(rng.integers(2, 10))
        w = int(rng.integers(2, 10))
        c, color = [(1, 0), (3, 2), (2, 4), (4, 6)][int(rng.integers(0, 4))]
        depth = int(rng.choice([8, 16]))
        hi = 256 if depth == 8 else 65536
        dt = np.uint8 if depth == 8 else np.uint16
        arr = rng.integers(0, hi, (h, w, c)).astype(dt)
        filters = [int(rng.integers(0, 5)) for _ in range(h)]
        blob = _encode_png(arr, color, row_filters=filters, depth=depth)
        ww, hh, cc, dec = MM.decode_image_py(blob)
        assert (ww, hh, cc) == (w, h, c)
        assert np.array_equal(dec, arr), (h, w, c, depth, filters)


def test_encode_png_roundtrip_through_own_decoder():
    rng = np.random.Generator(np.random.PCG64(30))
    for c in (1, 2, 3, 4):
        arr = rng.integers(0, 256, (5, 7, c), dtype=np.uint8)
        w, h, cc, dec = MM.decode_image_py(MM.encode_png(arr))
        assert (w, h, cc) == (7, 5, c)
        assert np.array_equal(dec, arr)


def test_pool_to_max_exact_and_no_upscale():
    rng = np.random.Generator(np.random.PCG64(31))
    arr = rng.integers(0, 256, (6, 16, 3), dtype=np.uint8)
    small = MM._pool_to_max(arr, 4)  # k = ceil(16/4) = 4
    assert small.shape == (1, 4, 3)
    expect = arr[:4, :16].reshape(1, 4, 4, 4, 3).mean(axis=(1, 3)).astype(np.uint8)
    assert np.array_equal(small, expect)
    tiny = rng.integers(0, 256, (3, 4, 3), dtype=np.uint8)
    assert np.array_equal(MM._pool_to_max(tiny, 4), tiny)  # never upscales
    wide16 = rng.integers(0, 65536, (4, 4, 1), dtype=np.uint16)
    assert MM._pool_to_max(wide16, 4).dtype == np.uint8  # 16-bit previews at 8


def test_thumbnails_image_and_video_pixels(spark):
    """Thumbnail PNGs decode back to exactly the independently pooled
    pixels; video rows follow the cover + evenly-spaced-frame contract."""
    img = MM.encode_fake_image(12, 6, 3, seed=40)   # k=3 -> 4x2
    vid = MM.encode_fake_video(6, 4, 3, seed=41)    # k=1 -> unpooled
    media = spark.createDataFrame(
        [(1, "u1", "image", img, {}), (2, "u2", "video", vid, {}),
         (3, "u3", "audio", MM.encode_fake_audio(8000, 16, seed=42), {})],
        MM.MEDIA_SCHEMA,
    )
    rows = MM.thumbnails(media, max_px=4, n_frames=4).collect()
    got = {(r["media_id"], r["kind"], r["frame_idx"]): r for r in rows}
    # image: one cover, pooled 12x6 -> 4x2
    r = got[(1, "cover", 0)]
    assert (r["width"], r["height"]) == (4, 2)
    src = np.frombuffer(img, np.uint8, 12 * 6 * 3, 19).reshape(6, 12, 3)
    expect = src.reshape(2, 3, 4, 3, 3).mean(axis=(1, 3)).astype(np.uint8)
    _w, _h, _c, dec = MM.decode_image_py(bytes(r["thumb"]))
    assert np.array_equal(dec, expect)
    # video: cover at n//10 = 0 plus frames {0,1,3,5}; frame 3 exact
    keys = {(k, i) for (m, k, i) in got if m == 2}
    assert keys == {("cover", 0), ("frame", 0), ("frame", 1),
                    ("frame", 3), ("frame", 5)}
    fsz = 4 * 3
    frame3 = np.frombuffer(vid, np.uint8, fsz, 19 + 3 * fsz).reshape(3, 4)
    _w, _h, _c, dec3 = MM.decode_image_py(bytes(got[(2, "frame", 3)]["thumb"]))
    assert np.array_equal(dec3.reshape(3, 4), frame3)
    # audio rows produce no thumbnails
    assert not any(m == 3 for (m, _k, _i) in got)


def test_sample_frames_on_real_avi_through_spark(spark):
    rng = np.random.Generator(np.random.PCG64(27))
    frames = rng.integers(0, 256, (5, 3, 4, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "u", "video", _encode_avi(frames), {})], MM.MEDIA_SCHEMA
    )
    rows = {r["frame_idx"]: r["frame"]
            for r in MM.sample_frames(media, every_n=2).collect()}
    assert sorted(rows) == [0, 2, 4]
    for k in (0, 2, 4):
        got = np.frombuffer(rows[k], np.uint8).reshape(3, 4, 3)
        assert np.array_equal(got, frames[k])


def _encode_wav(samples: np.ndarray, sr: int, nch: int, width: int) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(width)
        wf.setframerate(sr)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def test_wav_decode_known_samples_16bit():
    samples = np.array([0, 1000, -1000, 32767, -32768, 5], dtype="<i2")
    sr, pcm = MM.decode_audio_py(_encode_wav(samples, 8000, 1, 2))
    assert sr == 8000
    assert pcm.tolist() == samples.astype(np.float64).tolist()


def test_wav_decode_8bit_centering_and_stereo_mixdown():
    # 8-bit PCM is unsigned: 128 is silence -> centered to 0.0
    s8 = np.array([128, 129, 127, 255, 0], dtype=np.uint8)
    sr, pcm = MM.decode_audio_py(_encode_wav(s8, 16000, 1, 1))
    assert pcm.tolist() == [0.0, 1.0, -1.0, 127.0, -128.0]
    # stereo interleaved (L0,R0,L1,R1) mixes down to per-frame mean
    st = np.array([100, 200, -50, 50], dtype="<i2")
    _sr, pcm2 = MM.decode_audio_py(_encode_wav(st, 16000, 2, 2))
    assert pcm2.tolist() == [150.0, 0.0]


def test_audio_features_on_real_wav_matches_numpy(spark):
    samples = (np.sin(np.linspace(0, 40, 1600)) * 12000).astype("<i2")
    blob = _encode_wav(samples, 8000, 1, 2)
    media = spark.createDataFrame(
        [(1, "u", "audio", blob, {})], MM.MEDIA_SCHEMA
    )
    rows = {
        r["window"]: (r["rms"], r["zcr"])
        for r in MM.audio_features(media, n_windows=4).collect()
    }
    pcm = samples.astype(np.float64)
    for w, chunk in enumerate(np.array_split(pcm, 4)):
        rms = float(np.sqrt((chunk**2).mean()))
        signs = np.sign(chunk)
        nz = signs != 0
        zcr = int((np.diff(signs[nz]) != 0).sum()) / max(1, len(chunk) - 1)
        assert abs(rows[w][0] - rms) < 1e-9
        assert abs(rows[w][1] - zcr) < 1e-12


def test_image_info_on_real_png_through_spark(spark):
    rng = np.random.Generator(np.random.PCG64(77))
    arr = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    blob = _encode_png(arr, 2, row_filters=[0, 1, 2, 3, 4])
    media = spark.createDataFrame(
        [(1, "u", "image", blob, {})], MM.MEDIA_SCHEMA
    )
    r = MM.image_info(media).collect()[0]
    assert (r["width"], r["height"], r["channels"]) == (9, 6, 3)
    assert r["px_sum"] == int(arr.astype(np.int64).sum())


def test_corrupt_png_bad_channels_zero_frames_contained(spark):
    """The round-4 containment gaps, each contained per-row (D4), never
    fatal: zlib.error from a corrupt/truncated PNG IDAT (thumbnails,
    image_info, image_features), a FAKEIMG whose channel count PNG
    cannot encode (ValueError from encode_png inside thumbnails), and
    a zero-frame FAKEVID (previously frames[-1] -> IndexError)."""
    good_img = MM.encode_fake_image(4, 4, 3, seed=7)
    png = MM.encode_png(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    corrupt = bytearray(png)
    corrupt[45:53] = b"\x00" * 8  # stomp IDAT payload -> zlib.error
    trunc = png[: len(png) // 2]  # truncated stream -> zlib.error
    fake5 = MM.encode_fake_image(3, 3, 5, seed=1)  # undrawable channels
    good_vid = MM.encode_fake_video(3, 4, 4, seed=2)
    vid0 = MM.encode_fake_video(0, 4, 4, seed=3)  # zero-frame stream
    media = spark.createDataFrame(
        [
            (1, "ok", "image", good_img, {}),
            (2, "corrupt", "image", bytes(corrupt), {}),
            (3, "trunc", "image", bytes(trunc), {}),
            (4, "5ch", "image", fake5, {}),
            (5, "okv", "video", good_vid, {}),
            (6, "v0", "video", vid0, {}),
        ],
        MM.MEDIA_SCHEMA,
    )
    thumb_ids = {r["media_id"] for r in MM.thumbnails(media).collect()}
    assert thumb_ids == {1, 5}

    info = {r["media_id"]: r for r in MM.image_info(media).collect()}
    assert set(info) == {1, 2, 3, 4}  # every image row survives ...
    assert info[1]["width"] == 4
    assert info[2]["width"] is None  # ... undecodable ones as NULLs
    assert info[3]["width"] is None
    assert info[2]["n_bytes"] == len(corrupt)  # raw length still known
    assert info[4]["channels"] == 5  # FAKEIMG header itself decodes

    feats = {r["media_id"]: r["features"]
             for r in MM.image_features(media, 4).collect()}
    assert feats[1] is not None and feats[4] is not None
    assert feats[2] is None and feats[3] is None


def test_padded_rows_tolerates_missing_final_padding():
    """DIB pixel arrays may legally omit the LAST row's 4-byte padding;
    the vectorized reader must accept that (like the per-row reads it
    replaced) and still reject a genuinely truncated pixel row."""
    h, w = 3, 3  # 24-bit: 9 payload bytes/row, row_bytes=12
    rows = [bytes(range(y * 16, y * 16 + 9)) for y in range(h)]
    full = b"".join(r + b"\x00\x00\x00" for r in rows)
    nopad = b"".join(r + b"\x00\x00\x00" for r in rows[:-1]) + rows[-1]
    a = MM._padded_rows(full, 0, h, 12, 9)
    b = MM._padded_rows(nopad, 0, h, 12, 9)
    assert a.shape == b.shape == (3, 9)
    assert (a == b).all()
    assert bytes(a[2]) == rows[2]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        MM._padded_rows(nopad[:-1], 0, h, 12, 9)  # short by one byte
