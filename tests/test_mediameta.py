"""Structural media metadata (functions/mediameta.py): MP3 frame walk,
MP4 box walk + H.264 SPS, Ogg Opus/Vorbis, header-only WAV/FLAC/AVI/GIF
paths, and the media_info catalog operator with D4 containment.

Every duration/dimension assertion is integer-exact arithmetic over
synthesized streams — payload entropy is never decoded (the declared
boundary), so there is nothing approximate to tolerate."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from fscrawler_spark.functions import mediameta as MM
from fscrawler_spark.functions import multimodal as MX


# ---------------------------------------------------------------------------
# MP3

def test_mp3_cbr_exact_duration_mpeg1():
    m = MM.parse_mp3(MM.synth_mp3(25, 128, 44100, 2))
    assert m["n_frames"] == 25
    assert m["duration_sec"] == 25 * 1152 / 44100
    assert m["sample_rate"] == 44100
    assert m["channels"] == 2
    assert m["bit_rate_kbps"] == 128.0


def test_mp3_mpeg2_has_576_samples_per_frame():
    m = MM.parse_mp3(MM.synth_mp3(11, 64, 22050, 1, mpeg2=True))
    assert m["n_frames"] == 11
    assert m["duration_sec"] == 11 * 576 / 22050
    assert m["channels"] == 1


def test_mp3_id3v2_skip_is_syncsafe():
    # 0x81 payload bytes inside the tag would false-sync a naive scan
    blob = MM.synth_mp3(5, 128, 44100, 2, id3_bytes=300, fill=0x00)
    tagged = bytearray(blob)
    tagged[10:310] = b"\x81" * 300  # tag payload full of near-sync bytes
    m = MM.parse_mp3(bytes(tagged))
    assert m["n_frames"] == 5


def test_mp3_xing_frame_count_is_authoritative():
    m = MM.parse_mp3(MM.synth_mp3(3, 128, 44100, 2, xing_frames=777))
    assert m["n_frames"] == 777
    assert m["duration_sec"] == 777 * 1152 / 44100


def test_mp3_resyncs_over_leading_junk():
    blob = b"\x00junkjunk" + MM.synth_mp3(4, 96, 32000, 2)
    m = MM.parse_mp3(blob)
    assert m["n_frames"] == 4
    assert m["sample_rate"] == 32000


def test_mp3_truncated_final_frame_not_counted():
    blob = MM.synth_mp3(6, 128, 44100, 2)
    m = MM.parse_mp3(blob[:-10])
    assert m["n_frames"] == 5


def test_mp3_vbr_detection_and_average_bitrate():
    a = MM.synth_mp3(10, 128, 44100, 2)
    b = MM.synth_mp3(10, 64, 44100, 2)
    m = MM.parse_mp3(a + b)
    assert m["n_frames"] == 20
    # average of the two frame sizes, exact arithmetic
    total_bytes = len(a) + len(b)
    dur = 20 * 1152 / 44100
    assert m["bit_rate_kbps"] == pytest.approx(total_bytes * 8 / dur / 1000)


def test_mp3_payload_xing_bytes_do_not_false_positive():
    """'Xing' appearing in a CBR frame's PAYLOAD (not at the spec
    side-info offset) must not flip the stream to VBR."""
    blob = bytearray(MM.synth_mp3(8, 128, 44100, 2))
    at = 4 + 32 + 40  # stereo MPEG1 side info is 32; plant well past it
    blob[at: at + 12] = b"Xing" + struct.pack(">II", 1, 9999)
    m = MM.parse_mp3(bytes(blob))
    assert m["n_frames"] == 8


def test_mp3_vbri_header_at_fixed_offset():
    blob = bytearray(MM.synth_mp3(5, 128, 44100, 2))
    blob[36: 36 + 18] = b"VBRI" + struct.pack(">HHHII", 1, 0, 0, 0, 444)
    m = MM.parse_mp3(bytes(blob))
    assert m["n_frames"] == 444


def test_mp3_no_sync_raises():
    with pytest.raises(ValueError):
        MM.parse_mp3(b"\x00" * 5000)


def test_mp3_vectorized_walk_parity_with_sequential():
    """The numpy fast path must be byte-identical to the sequential
    frame walk on every input shape: pure CBR, VBR bitrate switches,
    truncation, corruption at and off frame boundaries, hand-built
    padding alternation, and 1-2-frame streams below the fast-path
    threshold."""
    flen = 144 * 128000 // 44100
    cases = [
        MM.synth_mp3(60, 128, 48000, 2),
        MM.synth_mp3(60, 64, 22050, 1, mpeg2=True),
        MM.synth_mp3(20, 128, 44100, 2) + MM.synth_mp3(20, 64, 44100, 2),
        MM.synth_mp3(40, 128, 44100, 2)[:-100],
        MM.synth_mp3(1, 128, 44100, 2),
        MM.synth_mp3(2, 128, 44100, 2),
    ]
    corrupt = bytearray(MM.synth_mp3(50, 128, 44100, 2))
    corrupt[flen * 17] = 0x00  # kill a frame header: walk must stop
    cases.append(bytes(corrupt))
    payload = bytearray(MM.synth_mp3(50, 128, 44100, 2))
    payload[flen * 10 + 50] = 0xAA  # payload noise: walk must NOT stop
    cases.append(bytes(payload))
    hdr0 = MM.synth_mp3(1, 128, 44100, 2)[:4]
    padded = bytearray(hdr0)
    padded[2] |= 2
    alt = b"".join(
        (bytes(padded) + bytes(flen + 1 - 4)) if i % 2
        else (hdr0 + bytes(flen - 4))
        for i in range(30)
    )
    cases.append(alt)
    for i, blob in enumerate(cases):
        assert MM._walk_mp3_frames(blob, 0) == \
            MM._walk_mp3_sequential(blob, 0), i


def _hdr(ver_bits, layer_bits, br_idx, sr_idx, pad=0, mode=0):
    b1 = 0xE0 | (ver_bits << 3) | (layer_bits << 1) | 1
    b2 = (br_idx << 4) | (sr_idx << 2) | (pad << 1)
    return bytes((0xFF, b1, b2, mode << 6))


@pytest.mark.parametrize(
    "ver,layer_bits,br_idx,sr_idx,pad,mode,expect",
    [
        # Layer I: frame = (12*br//sr + pad) SLOTS of 4 bytes, 384 spf
        (3, 3, 4, 0, 0, 0, ((12 * 128000 // 44100) * 4, 384, 44100, 128, 2)),
        (3, 3, 4, 0, 1, 0, ((12 * 128000 // 44100 + 1) * 4, 384, 44100, 128, 2)),
        # Layer II: always 144*br//sr, 1152 spf, both versions
        (3, 2, 8, 1, 0, 0, (144 * 128000 // 48000, 1152, 48000, 128, 2)),
        (2, 2, 4, 0, 0, 0, (144 * 32000 // 22050, 1152, 22050, 32, 2)),
        # MPEG2.5 Layer III: 72*br//sr, 576 spf, low rates
        (0, 1, 4, 2, 0, 3, (72 * 32000 // 8000, 576, 8000, 32, 1)),
    ],
)
def test_mp3_header_arithmetic_all_layers(
    ver, layer_bits, br_idx, sr_idx, pad, mode, expect
):
    """Pin the MPEG header tables and frame-length formulas across
    layers/versions (Layer I's 4-byte slot padding is the classic
    bug site; synth_mp3 only exercises Layer III)."""
    got = MM._mp3_header(_hdr(ver, layer_bits, br_idx, sr_idx, pad, mode), 0)
    assert got == expect


def test_mp3_invalid_headers_rejected():
    assert MM._mp3_header(_hdr(1, 1, 4, 0), 0) is None  # reserved version
    assert MM._mp3_header(_hdr(3, 0, 4, 0), 0) is None  # reserved layer
    assert MM._mp3_header(_hdr(3, 1, 0, 0), 0) is None  # free-format
    assert MM._mp3_header(_hdr(3, 1, 15, 0), 0) is None  # bad bitrate
    assert MM._mp3_header(_hdr(3, 1, 4, 3), 0) is None  # reserved rate


def test_mp3_id3v2_footer_flag_adds_ten_bytes():
    body = MM.synth_mp3(3, 128, 44100, 2)
    tag = b"ID3\x04\x00\x10" + bytes((0, 0, 0, 20)) + bytes(20 + 10)
    assert MM._id3v2_len(tag) == 40
    m = MM.parse_mp3(tag + body)
    assert m["n_frames"] == 3


# ---------------------------------------------------------------------------
# H.264 SPS

@pytest.mark.parametrize(
    "w,h",
    [(1920, 1080), (1280, 720), (640, 480), (16, 16), (100, 50),
     (1918, 1078), (354, 200), (2, 2)],
)
def test_sps_roundtrip_exact_dims(w, h):
    info = MM.parse_sps(MM.encode_sps(w, h))
    assert (info["width"], info["height"]) == (w, h)
    assert info["profile"] == 66


def test_sps_emulation_prevention_stripping():
    raw = bytes((0, 0, 3, 1, 0, 0, 3, 0))
    assert MM._strip_emulation(raw) == bytes((0, 0, 1, 0, 0, 0))


def test_sps_high_profile_chroma_fields():
    """Hand-built high-profile SPS (chroma/bit-depth fields present,
    no scaling matrix): 4:2:2 halves the horizontal crop unit only."""
    bits: list[int] = []

    def u(v, n):
        bits.extend((v >> (n - 1 - i)) & 1 for i in range(n))

    def ue(v):
        k = v + 1
        u(0, k.bit_length() - 1)
        u(k, k.bit_length())

    u(100, 8)  # high profile
    u(0, 8)
    u(40, 8)
    ue(0)      # sps id
    ue(2)      # chroma_format_idc = 4:2:2
    ue(0)      # bit_depth_luma_minus8
    ue(0)      # bit_depth_chroma_minus8
    u(0, 1)    # qpprime
    u(0, 1)    # no scaling matrix
    ue(4)      # log2_max_frame_num_minus4
    ue(0)      # poc type 0
    ue(4)      # log2_max_pic_order_cnt_lsb_minus4
    ue(1)      # max refs
    u(0, 1)
    ue(79)     # 80 mbs wide  -> 1280
    ue(44)     # 45 units high -> 720
    u(1, 1)    # frame_mbs_only
    u(1, 1)    # direct_8x8
    u(1, 1)    # cropping
    ue(1)      # left: 4:2:2 unit_x=2 -> 2 px
    ue(0)
    ue(2)      # top: 4:2:2 unit_y=1 -> 2 px
    ue(0)
    u(0, 1)    # no vui
    u(1, 1)    # stop bit
    while len(bits) % 8:
        bits.append(0)
    payload = bytes(
        int("".join(map(str, bits[i: i + 8])), 2)
        for i in range(0, len(bits), 8)
    )
    info = MM.parse_sps(b"\x67" + payload)
    assert info["profile"] == 100
    assert info["width"] == 80 * 16 - 2
    assert info["height"] == 45 * 16 - 2


# ---------------------------------------------------------------------------
# MP4

def test_mp4_avc1_sps_dims_and_audio_trak():
    sps = MM.encode_sps(1918, 1078)  # non-multiple-of-16: cropping real
    blob = MM.synth_mp4(90.25, 4000, 1918, 1078, sps=sps, audio=(48000, 2))
    m = MM.parse_mp4(blob)
    assert m["duration_sec"] == 90.25
    assert (m["width"], m["height"]) == (1918, 1078)
    assert m["codec"] == "avc1/h264"
    assert (m["sample_rate"], m["channels"]) == (48000, 2)


def test_mp4_tkhd_dims_without_avcc():
    m = MM.parse_mp4(MM.synth_mp4(3.5, 1000, 320, 240))
    assert (m["width"], m["height"]) == (320, 240)
    assert m["codec"] == "raw"


def test_mp4_tkhd_fallback_when_stsd_dims_zero():
    """Some muxers leave the visual sample entry's width/height zero;
    the parser must then fall back to tkhd's 16.16 dims (regression:
    the v0 tkhd offset was off by 4, latent behind the stsd dims)."""
    blob = bytearray(MM.synth_mp4(2.0, 1000, 864, 486))
    at = blob.find(b"raw ")
    blob[at + 28: at + 32] = bytes(4)  # zero the entry's w/h u16 pair
    m = MM.parse_mp4(bytes(blob))
    assert (m["width"], m["height"]) == (864, 486)


def test_mp4_mvhd_version1_and_largesize_box():
    mvhd_v1 = MM._box(
        b"mvhd",
        struct.pack(">B3xQQIQ", 1, 0, 0, 90000, 90000 * 7) + bytes(80),
    )
    moov = MM._box(b"moov", mvhd_v1)
    ftyp = MM._box(b"ftyp", b"isom" + bytes(8))
    # wrap an inert mdat in a 64-bit largesize box
    payload = bytes(8)
    large = struct.pack(">I", 1) + b"mdat" + struct.pack(
        ">Q", 16 + len(payload)
    ) + payload
    m = MM.parse_mp4(ftyp + large + moov)
    assert m["duration_sec"] == 7.0


def test_mp4_missing_moov_raises():
    with pytest.raises(ValueError):
        MM.parse_mp4(MM._box(b"ftyp", b"isom" + bytes(8)))


# ---------------------------------------------------------------------------
# Ogg

def test_ogg_opus_duration_subtracts_preskip():
    blob = MM.synth_ogg("opus", 48000 * 5, channels=2, preskip=312)
    m = MM.parse_ogg(blob)
    assert m["codec"] == "opus"
    assert m["duration_sec"] == 5.0
    assert m["channels"] == 2
    assert m["sample_rate"] == 48000


def test_ogg_opus_multipage_uses_terminal_granule():
    blob = MM.synth_ogg("opus", 48000 * 2, n_audio_pages=7)
    assert MM.parse_ogg(blob)["duration_sec"] == 2.0


def test_ogg_vorbis_ident_header():
    blob = MM.synth_ogg("vorbis", 44100 * 3, sample_rate=44100, channels=1)
    m = MM.parse_ogg(blob)
    assert m["codec"] == "vorbis"
    assert m["duration_sec"] == 3.0
    assert (m["sample_rate"], m["channels"]) == (44100, 1)


def test_ogg_unknown_codec_raises():
    page = MM._ogg_page(b"XXXXHead", 0, 9, 0, 2)
    with pytest.raises(ValueError):
        MM.parse_ogg(page)


# ---------------------------------------------------------------------------
# WebM / EBML

def test_webm_video_audio_tracks():
    blob = MM.synth_webm(12.5, width=1920, height=1080, audio=(48000, 2))
    m = MM.parse_webm(blob)
    assert m["duration_sec"] == 12.5
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["codec"] == "V_VP9"  # video track wins
    assert (m["sample_rate"], m["channels"]) == (48000, 2)


def test_webm_custom_timescale_and_audio_only():
    blob = MM.synth_webm(3.25, timescale=500_000, audio=(44100, 1),
                         audio_codec="A_VORBIS")
    m = MM.parse_media_meta(blob)  # dispatch on the EBML magic
    assert m["container"] == "webm"
    assert m["duration_sec"] == 3.25
    assert m["codec"] == "A_VORBIS"
    assert m["width"] is None


def test_webm_unknown_size_segment():
    """Streaming muxers write Segment with unknown size (all-ones
    vint); the walk must extend it to EOF, and a 127-byte body must
    NOT be misread as unknown (127 == 2^7-1 only at 1-byte length)."""
    blob = MM.synth_webm(None, width=640, height=360)
    at = blob.find(b"\x18\x53\x80\x67") + 4
    szlen = 1 if blob[at] >= 0x80 else (2 if blob[at] >= 0x40 else 4)
    patched = blob[:at] + b"\xff" + blob[at + szlen:]
    m = MM.parse_webm(patched)
    assert (m["width"], m["height"]) == (640, 360)
    # 127 encoded in 2 bytes is a real size, not the unknown marker
    v, nxt = MM._ebml_vint(b"\x40\x7f", 0, keep_marker=False)
    assert v == 127 and nxt == 2
    v, _ = MM._ebml_vint(b"\xff", 0, keep_marker=False)
    assert v == -1  # 1-byte unknown


def test_webm_random_bodies_contained():
    rng = np.random.Generator(np.random.PCG64(17))
    for _ in range(150):
        body = rng.integers(0, 256, int(rng.integers(0, 120))).astype(
            np.uint8
        ).tobytes()
        try:
            MM.parse_webm(MM.EBML_MAGIC + body)
        except MM.META_ERRORS:
            pass


# ---------------------------------------------------------------------------
# Header-only paths for the formats with full decoders elsewhere

def _wav_bytes(sr: int, nch: int, n: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(np.zeros(n * nch, "<i2").tobytes())
    return buf.getvalue()


def test_wav_header_path():
    m = MM.parse_media_meta(_wav_bytes(16000, 2, 8000))
    assert m["container"] == "wav"
    assert m["duration_sec"] == 0.5
    assert m["bit_rate_kbps"] == 16000 * 2 * 16 / 1000


def test_flac_streaminfo_header_path():
    from fscrawler_spark.functions.flac import encode_flac

    pcm = (np.sin(np.linspace(0, 60, 12000)) * 12000).astype(np.int64)
    m = MM.parse_media_meta(encode_flac(pcm, sample_rate=12000))
    assert m["container"] == "flac"
    assert m["n_frames"] == 12000
    assert m["duration_sec"] == 1.0
    assert m["channels"] == 1


def _avi_bytes(n: int, w: int, h: int, fps: int) -> bytes:
    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    avih = struct.pack("<IIII", 10**6 // fps, 0, 0, 0) + struct.pack(
        "<I", n
    ) + bytes(12) + struct.pack("<II", w, h) + bytes(16)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(
        b"strl", chunk(b"strh", b"vids" + bytes(52)) + chunk(b"strf", strf)
    ))
    row = (w * 3 + 3) & ~3
    movi = lst(b"movi", b"".join(
        chunk(b"00db", bytes(row * h)) for _ in range(n)
    ))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_header_path_duration_and_dims():
    m = MM.parse_media_meta(_avi_bytes(12, 6, 4, 24))
    assert m["container"] == "avi"
    assert (m["width"], m["height"], m["n_frames"]) == (6, 4, 12)
    assert m["duration_sec"] == pytest.approx(12 * (10**6 // 24) / 1e6)
    assert m["codec"] == "rawvideo"


def test_gif_header_path_animated_frame_count():
    from fscrawler_spark.functions.gif import encode_gif

    rng = np.random.Generator(np.random.PCG64(3))
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    frames = pal[rng.integers(0, 8, (4, 5, 7))]
    m = MM.parse_media_meta(encode_gif(list(frames), delays_cs=[10] * 4))
    assert m["container"] == "gif"
    assert (m["width"], m["height"]) == (7, 5)
    assert m["n_frames"] == 4


def test_fake_fixture_paths():
    a = MM.parse_media_meta(MX.encode_fake_audio(8000, 4000, 1))
    assert a["duration_sec"] == 0.5
    v = MM.parse_media_meta(MX.encode_fake_video(6, 4, 3, 2))
    assert (v["width"], v["height"], v["n_frames"]) == (4, 3, 6)


# ---------------------------------------------------------------------------
# Containment / fuzz

def test_random_blobs_never_escape_meta_errors():
    rng = np.random.Generator(np.random.PCG64(99))
    magics = [b"", b"ID3", b"\xff\xfb", b"OggS", b"RIFF", b"fLaC",
              b"GIF89a", b"\x00\x00\x00\x18ftyp"]
    for trial in range(200):
        head = magics[trial % len(magics)]
        body = rng.integers(0, 256, int(rng.integers(0, 400))).astype(
            np.uint8
        ).tobytes()
        try:
            MM.parse_media_meta(head + body)
        except MM.META_ERRORS:
            pass
        except wave.Error:
            pass


def test_truncations_of_valid_streams_contained():
    blobs = [
        MM.synth_mp4(5.0, 1000, 64, 48, sps=MM.encode_sps(64, 48)),
        MM.synth_ogg("opus", 48000),
        MM.synth_mp3(4, 128, 44100, 2),
        _wav_bytes(8000, 1, 100),
    ]
    for blob in blobs:
        for cut in range(0, len(blob), max(1, len(blob) // 17)):
            try:
                MM.parse_media_meta(blob[:cut])
            except MM.META_ERRORS:
                pass
            except wave.Error:
                pass


# ---------------------------------------------------------------------------
# The catalog operator through Spark

def test_media_info_catalogs_mixed_bucket(spark):
    rows = [
        (1, MM.synth_mp3(20, 128, 44100, 2)),
        (2, MM.synth_mp4(8.0, 1000, 1280, 720, sps=MM.encode_sps(1280, 720),
                         audio=(44100, 2))),
        (3, MM.synth_ogg("opus", 48000 * 4)),
        (4, _wav_bytes(16000, 1, 16000)),
        (5, b"\xde\xad\xbe\xef" * 10),  # unknown container
        (6, None),                       # NULL blob
        (7, MM.synth_mp3(6, 128, 44100, 2)[:-30]),  # truncated but valid
    ]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    got = {
        r["media_id"]: r.asDict()
        for r in MM.media_info(df).collect()
    }
    assert len(got) == 7
    assert got[1]["container"] == "mp3"
    assert got[1]["duration_sec"] == 20 * 1152 / 44100
    assert got[2]["codec"] == "avc1/h264"
    assert (got[2]["width"], got[2]["height"]) == (1280, 720)
    assert got[2]["sample_rate"] == 44100
    assert got[3]["codec"] == "opus"
    assert got[3]["duration_sec"] == 4.0
    assert got[4]["container"] == "wav"
    assert got[4]["duration_sec"] == 1.0
    assert got[5]["container"] is None  # unknown container: contained
    assert got[5]["n_bytes"] == 40
    assert got[6]["container"] is None and got[6]["n_bytes"] is None
    assert got[7]["n_frames"] == 5
    assert got[1]["n_bytes"] == len(rows[0][1])
