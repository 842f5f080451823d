"""Structural media metadata: an "ffprobe for the crawl" over opaque
binary columns.

``media_info`` catalogs container, codec, duration, dimensions, sample
rate, channel count, bitrate and frame count for every media format the
engine meets — WITHOUT decoding payloads.  This is the operator a
100-TB pipeline runs over everything it will not transcode: the
entropy layers of MP3 and H.264 are the declared sandbox boundary
(their decode needs spec huffman/synthesis constants no from-scratch
build can verify), but their METADATA layers are purely structural or
algorithmic and are parsed here for real:

  MP3   — ID3v2 skip (syncsafe sizes), MPEG audio frame-header walk
          (version/layer/bitrate/samplerate header tables, per-frame
          length arithmetic), Xing/Info and VBRI VBR headers, exact
          duration from the frame count, CBR/VBR detection.
  MP4   — ISO-BMFF box walk (32/64-bit sizes), mvhd timescale/duration
          (versions 0 and 1), per-trak hdlr dispatch, tkhd 16.16 dims,
          stsd sample-entry fourcc, mp4a sample rate/channels, and for
          avc1 the H.264 SPS from avcC parsed bit-exactly (Exp-Golomb,
          emulation-prevention stripping, scaling-list skip, frame
          cropping) so width/height are the true coded pixel dims.
  Ogg   — page walk (segment lacing, continuation flags), OpusHead /
          Vorbis identification headers, duration from the terminal
          granule position (minus Opus pre-skip at 48 kHz).
  WebM  — Matroska EBML walk (variable-length ids/sizes incl. the
          unknown-size streaming form): Segment Info timescale +
          duration, per-TrackEntry CodecID, video PixelWidth/Height,
          audio SamplingFrequency/Channels.
  plus header-only paths for the formats whose full decoders live in
  this package (WAV, FLAC STREAMINFO, uncompressed AVI, GIF block
  walk) and the FAKE* oracle fixtures, so one call catalogs a mixed
  bucket.

The synthesizers (``synth_mp3`` / ``synth_mp4`` / ``synth_ogg`` /
``synth_webm`` / ``encode_sps``) build structurally valid streams with inert payloads —
deterministic fixtures for tests and the q36 oracle, NOT encoders
(payload entropy coding is exactly the declared boundary).

Reference parity: FsCrawler catalogs media through ffmpeg/ffprobe side
effects (app/processors/preview_file_processor.py:17-62) and extended
attributes (app/processors/metadata_extractor/*); this module is the
column-shaped Spark-first equivalent.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# MP3 — MPEG audio frame headers (ISO/IEC 11172-3 / 13818-3 header tables)

# bitrate kbps by [version-group][layer][index]; index 0 = free, 15 = bad
_BR_V1 = {
    1: (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    2: (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
}
_BR_V2 = {
    1: (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    3: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
# sample rate by version: header version bits 3=MPEG1, 2=MPEG2, 0=MPEG2.5
_SR = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}
# samples per frame by [layer][is_mpeg1]
_SPF = {1: (384, 384), 2: (1152, 1152), 3: (576, 1152)}


def _mp3_header(data: bytes, pos: int):
    """Parse one MPEG audio frame header at pos.  Returns
    (frame_len, samples, sample_rate, bitrate_kbps, channels) or None
    if the 4 bytes are not a valid frame header."""
    if pos + 4 > len(data):
        return None
    b0, b1, b2, b3 = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    ver_bits = (b1 >> 3) & 3  # 3=MPEG1 2=MPEG2 0=MPEG2.5 1=reserved
    layer_bits = (b1 >> 1) & 3  # 3=L1 2=L2 1=L3 0=reserved
    if ver_bits == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits  # 1..3
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 3
    padding = (b2 >> 1) & 1
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format / invalid
    v1 = ver_bits == 3
    bitrate = (_BR_V1 if v1 else _BR_V2)[layer][br_idx]
    sr = _SR[ver_bits][sr_idx]
    if layer == 1:
        frame_len = (12 * bitrate * 1000 // sr + padding) * 4
    else:
        per = 144 if (layer == 2 or v1) else 72
        frame_len = per * bitrate * 1000 // sr + padding
    channels = 1 if ((b3 >> 6) & 3) == 3 else 2
    return frame_len, _SPF[layer][int(v1)], sr, bitrate, channels


def _id3v2_len(data: bytes) -> int:
    """Total bytes of a leading ID3v2 tag (0 if none): 10-byte header
    with a 28-bit syncsafe size, +10 when the footer flag is set."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    if any(b & 0x80 for b in data[6:10]):
        return 0  # size bytes must be syncsafe
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    return 10 + size + (10 if data[5] & 0x10 else 0)


def _walk_mp3_sequential(
    data: bytes, pos: int
) -> tuple[int, set[int], int]:
    """Reference frame walk: (n_frames, bitrates_seen, end_offset).
    Stops at the first invalid header or incomplete final frame."""
    n_frames, bitrates, end = 0, set(), pos
    while True:
        h = _mp3_header(data, pos)
        if h is None or pos + h[0] > len(data):
            break
        n_frames += 1
        bitrates.add(h[3])
        pos += h[0]
        end = pos
    return n_frames, bitrates, end


def _walk_mp3_frames(data: bytes, pos: int) -> tuple[int, set[int], int]:
    """Exact frame walk with a vectorized fast path: a metadata pass
    over billions of crawled MP3s cannot afford a per-frame Python
    loop.  Assume the first frame's stride repeats, validate EVERY
    candidate header in one numpy gather (sync/version/layer/bitrate/
    samplerate fields AND the recomputed frame length), and fall back
    to the sequential walk from the first divergence (padding toggle,
    bitrate switch, corruption) — so the result is byte-identical to
    :func:`_walk_mp3_sequential` on every input (pytest-pinned parity,
    including mid-stream corruption and truncation)."""
    import numpy as np

    first = _mp3_header(data, pos)
    if first is None:
        return 0, set(), pos
    flen = first[0]
    n_est = (len(data) - pos) // flen
    if n_est <= 2:
        return _walk_mp3_sequential(data, pos)
    arr = np.frombuffer(data, np.uint8)
    idx = pos + np.arange(n_est, dtype=np.int64) * flen
    hdr = arr[idx[:, None] + np.arange(4)]
    b0, b1, b2 = hdr[:, 0], hdr[:, 1].astype(np.int32), hdr[:, 2]
    ver = (b1 >> 3) & 3
    layer = (b1 >> 1) & 3
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 3
    pad = (b2 >> 1) & 1
    valid = (
        (b0 == 0xFF) & ((b1 & 0xE0) == 0xE0) & (ver != 1) & (layer != 0)
        & (br_idx != 0) & (br_idx != 15) & (sr_idx != 3)
    )
    # recompute each candidate's frame length from ITS header fields
    # (vectorized lookup of the same tables _mp3_header uses)
    br_tab = np.zeros((4, 4, 16), np.int64)  # [ver_bits][layer_bits][idx]
    sr_tab = np.ones((4, 4), np.int64)
    for vb in (0, 2, 3):
        sr_tab[vb, :3] = _SR[vb]
        for lb in (1, 2, 3):
            table = (_BR_V1 if vb == 3 else _BR_V2)[4 - lb]
            br_tab[vb, lb, 1:15] = table[1:]
    br = br_tab[ver, layer, br_idx] * 1000
    sr = sr_tab[ver, np.minimum(sr_idx, 3)]
    is_l1 = layer == 3
    per = np.where((layer == 2) | (ver == 3), 144, 72)
    cand_len = np.where(
        is_l1, (12 * br // sr + pad) * 4, per * br // sr + pad
    )
    ok = valid & (cand_len == flen)
    bad = np.flatnonzero(~ok)
    k = int(bad[0]) if len(bad) else n_est
    bitrates = set(np.unique(br_tab[ver[:k], layer[:k], br_idx[:k]]).tolist())
    # resume sequentially from the first divergence (padding toggle,
    # bitrate switch, corruption, or simply end-of-candidates — a
    # shorter final frame could still follow); one pass + sequential
    # remainder keeps the worst case O(n), never O(n^2)
    n_rest, br_rest, end_rest = _walk_mp3_sequential(data, pos + k * flen)
    return k + n_rest, bitrates | br_rest, end_rest


def parse_mp3(data: bytes) -> dict:
    """Frame-accurate MP3 metadata: walk every frame header (or trust a
    Xing/Info/VBRI frame count when present), summing per-frame sample
    counts for the exact duration.  Payload bytes are never decoded."""
    pos = _id3v2_len(data)
    # resync: tolerate up to 4 KB of junk before the first frame
    start = pos
    first = None
    while pos < min(len(data), start + 4096):
        first = _mp3_header(data, pos)
        if first is not None:
            break
        pos += 1
    if first is None:
        raise ValueError("no MPEG audio frame sync found")
    _flen, spf, sr, _br, channels = first
    audio_start = pos

    # VBR headers live at spec offsets in the first frame: Xing/Info
    # directly after the side info (whose size depends on version/
    # channels, +2 when a CRC follows the header), VBRI at fixed 4+32.
    # Checking ONLY those offsets (not scanning the payload) prevents
    # payload bytes of a CBR stream from false-positive matching.
    xing_frames = None
    head = data[pos: pos + _flen]
    crc = 2 if not (data[pos + 1] & 1) else 0
    v1 = ((data[pos + 1] >> 3) & 3) == 3
    side = (17 if channels == 1 else 32) if v1 else (
        9 if channels == 1 else 17
    )
    at = 4 + crc + side
    if head[at: at + 4] in (b"Xing", b"Info") and at + 12 <= len(head):
        (flags,) = struct.unpack_from(">I", head, at + 4)
        if flags & 1:
            (xing_frames,) = struct.unpack_from(">I", head, at + 8)
    if xing_frames is None and head[36:40] == b"VBRI" and len(head) >= 54:
        (xing_frames,) = struct.unpack_from(">I", head, 50)

    n_frames, bitrates, end = _walk_mp3_frames(data, pos)
    if xing_frames is not None:
        n_frames = xing_frames  # authoritative for VBR (and the
        # Xing frame itself is metadata, not audio — matches ffprobe)
    if n_frames == 0:
        raise ValueError("MP3 stream has no complete frames")
    duration = n_frames * spf / sr
    audio_bytes = end - audio_start
    vbr = len(bitrates) > 1 or xing_frames is not None
    kbps = (
        audio_bytes * 8 / duration / 1000 if vbr and duration else float(_br)
    )
    return {
        "container": "mp3",
        "codec": "mp3",
        "duration_sec": duration,
        "sample_rate": sr,
        "channels": channels,
        "bit_rate_kbps": kbps,
        "n_frames": n_frames,
    }


def synth_mp3(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    channels: int = 2,
    mpeg2: bool = False,
    id3_bytes: int = 0,
    xing_frames: int | None = None,
    fill: int = 0,
) -> bytes:
    """Structurally valid Layer-III MP3 fixture: real frame headers,
    inert payloads (entropy coding is the declared boundary).  Optional
    leading ID3v2 tag of id3_bytes payload and a Xing header claiming
    xing_frames in the first frame."""
    ver_bits = 2 if mpeg2 else 3
    table = _BR_V2[3] if mpeg2 else _BR_V1[3]
    br_idx = table.index(bitrate_kbps)
    sr_idx = _SR[ver_bits].index(sample_rate)
    b1 = 0xE0 | (ver_bits << 3) | (1 << 1) | 1  # layer III, no CRC
    b2 = (br_idx << 4) | (sr_idx << 2)
    b3 = (3 << 6) if channels == 1 else 0
    hdr = bytes((0xFF, b1, b2, b3))
    per = 72 if mpeg2 else 144
    flen = per * bitrate_kbps * 1000 // sample_rate
    body = bytes([fill]) * (flen - 4)
    first = hdr + body
    if xing_frames is not None:
        side = (9 if channels == 1 else 17) if mpeg2 else (
            17 if channels == 1 else 32
        )
        at = 4 + side
        tag = b"Xing" + struct.pack(">II", 1, xing_frames)
        first = first[:at] + tag + first[at + len(tag):]
    out = b""
    if id3_bytes:
        out += b"ID3\x04\x00\x00" + bytes(
            (id3_bytes >> s) & 0x7F for s in (21, 14, 7, 0)
        ) + bytes(id3_bytes)
    return out + first + (hdr + body) * (n_frames - 1)


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF

def _boxes(data: bytes, pos: int, end: int):
    """Iterate (fourcc, body_start, box_end) over an ISO-BMFF box run;
    handles 64-bit largesize and size==0 (extends to end)."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        fourcc = data[pos + 4: pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4 truncated largesize")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos:
            raise ValueError("mp4 box size underflow")
        yield fourcc, body, min(pos + size, end)
        pos += size


class _BitReader:
    """MSB-first bit reader with Exp-Golomb codes (H.264 7.2)."""

    def __init__(self, data: bytes):
        self.data, self.pos = data, 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte_i = self.pos >> 3
            if byte_i >= len(self.data):
                raise ValueError("SPS bitstream exhausted")
            v = (v << 1) | ((self.data[byte_i] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("Exp-Golomb run too long")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k & 1 else -(k // 2)


def _strip_emulation(rbsp: bytes) -> bytes:
    """Remove 00 00 03 emulation-prevention bytes from a NAL payload."""
    out = bytearray()
    i = 0
    while i < len(rbsp):
        if i + 2 < len(rbsp) and rbsp[i] == 0 and rbsp[i + 1] == 0 and rbsp[i + 2] == 3:
            out += rbsp[i: i + 2]
            i += 3
        else:
            out.append(rbsp[i])
            i += 1
    return bytes(out)


_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}
# SubWidthC / SubHeightC by chroma_format_idc (1=4:2:0, 2=4:2:2, 3=4:4:4)
_SUB_WH = {1: (2, 2), 2: (2, 1), 3: (1, 1)}


def _skip_scaling_list(br: _BitReader, size: int) -> None:
    last, nxt = 8, 8
    for _ in range(size):
        if nxt:
            nxt = (last + br.se() + 256) % 256
        if nxt:
            last = nxt


def parse_sps(nal: bytes) -> dict:
    """Exact coded dimensions (and profile/level) from an H.264
    sequence parameter set NAL, per ITU-T H.264 7.3.2.1.1: Exp-Golomb
    syntax, chroma-aware frame cropping, field/frame mb height."""
    br = _BitReader(_strip_emulation(nal[1:]))  # skip the NAL header byte
    profile = br.u(8)
    br.u(8)  # constraint flags + reserved
    level = br.u(8)
    br.ue()  # seq_parameter_set_id
    chroma = 1
    if profile in _HIGH_PROFILES:
        chroma = br.ue()
        if chroma == 3:
            br.u(1)  # separate_colour_plane_flag
        br.ue()  # bit_depth_luma_minus8
        br.ue()  # bit_depth_chroma_minus8
        br.u(1)  # qpprime_y_zero_transform_bypass
        if br.u(1):  # seq_scaling_matrix_present
            for i in range(8 if chroma != 3 else 12):
                if br.u(1):
                    _skip_scaling_list(br, 16 if i < 6 else 64)
    br.ue()  # log2_max_frame_num_minus4
    poc_type = br.ue()
    if poc_type == 0:
        br.ue()
    elif poc_type == 1:
        br.u(1)
        br.se()
        br.se()
        for _ in range(br.ue()):
            br.se()
    br.ue()  # max_num_ref_frames
    br.u(1)  # gaps_in_frame_num_value_allowed
    pw_mbs = br.ue() + 1
    ph_units = br.ue() + 1
    frame_mbs_only = br.u(1)
    if not frame_mbs_only:
        br.u(1)  # mb_adaptive_frame_field
    br.u(1)  # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if br.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = br.ue(), br.ue(), br.ue(), br.ue()
    if chroma == 0:
        unit_x, unit_y = 1, 2 - frame_mbs_only
    else:
        sw, sh = _SUB_WH.get(chroma, (1, 1))
        unit_x, unit_y = sw, sh * (2 - frame_mbs_only)
    width = pw_mbs * 16 - (crop_l + crop_r) * unit_x
    height = (2 - frame_mbs_only) * ph_units * 16 - (crop_t + crop_b) * unit_y
    return {"profile": profile, "level": level, "width": width, "height": height}


def parse_mp4(data: bytes) -> dict:
    """ISO-BMFF metadata: mvhd duration, first video trak's codec and
    dimensions (H.264 SPS-exact when an avcC record is present, tkhd
    16.16 otherwise), first audio trak's codec/rate/channels."""
    moov = None
    for fourcc, b, e in _boxes(data, 0, len(data)):
        if fourcc == b"moov":
            moov = (b, e)
            break
    if moov is None:
        raise ValueError("mp4 missing moov box")
    out: dict = {"container": "mp4", "codec": None, "duration_sec": None,
                 "width": None, "height": None, "sample_rate": None,
                 "channels": None}
    for fourcc, b, e in _boxes(data, *moov):
        if fourcc == b"mvhd":
            ver = data[b]
            if ver == 1:
                (ts,) = struct.unpack_from(">I", data, b + 20)
                (dur,) = struct.unpack_from(">Q", data, b + 24)
            else:
                ts, dur = struct.unpack_from(">II", data, b + 12)
            if ts:
                out["duration_sec"] = dur / ts
        elif fourcc == b"trak":
            _parse_trak(data, b, e, out)
    return out


def _parse_trak(data: bytes, b: int, e: int, out: dict) -> None:
    handler = None
    tkhd_wh = None
    stsd = None
    stack = [(b, e)]
    while stack:
        lo, hi = stack.pop()
        for fourcc, bb, ee in _boxes(data, lo, hi):
            if fourcc in (b"mdia", b"minf", b"stbl"):
                stack.append((bb, ee))
            elif fourcc == b"tkhd":
                # width/height (16.16 fixed) after the 36-byte matrix:
                # v0 body offset 76 (24 + 8 rsv + 8 layer/alt/vol/rsv
                # + 36), v1 offset 88 (64-bit times add 12)
                ver = data[bb]
                off = bb + (88 if ver == 1 else 76)
                w16, h16 = struct.unpack_from(">II", data, off)
                tkhd_wh = (w16 >> 16, h16 >> 16)
            elif fourcc == b"hdlr":
                handler = data[bb + 8: bb + 12]
            elif fourcc == b"stsd":
                stsd = (bb, ee)
    if stsd is None or handler is None:
        return
    bb, ee = stsd
    (n_entries,) = struct.unpack_from(">I", data, bb + 4)
    if not n_entries:
        return
    entry_start = bb + 8
    (esize,) = struct.unpack_from(">I", data, entry_start)
    fourcc = data[entry_start + 4: entry_start + 8]
    codec = fourcc.decode("ascii", "replace").strip()
    if handler == b"vide" and out.get("width") is None:
        out["codec"] = out["codec"] or codec
        body = entry_start + 8
        w, h = struct.unpack_from(">HH", data, body + 24)
        out["width"], out["height"] = w, h
        if tkhd_wh and not (w or h):
            out["width"], out["height"] = tkhd_wh
        # visual sample entry extensions start after the 78-byte body
        for c2, b2, e2 in _boxes(data, body + 78, entry_start + esize):
            if c2 == b"avcC" and e2 - b2 >= 7:
                n_sps = data[b2 + 5] & 0x1F
                if n_sps:
                    (sps_len,) = struct.unpack_from(">H", data, b2 + 6)
                    sps = data[b2 + 8: b2 + 8 + sps_len]
                    info = parse_sps(sps)
                    out["width"], out["height"] = info["width"], info["height"]
                    out["codec"] = f"{codec}/h264"
    elif handler == b"soun" and out.get("sample_rate") is None:
        out["codec"] = out["codec"] or codec
        body = entry_start + 8
        ch, _ss = struct.unpack_from(">HH", data, body + 16)
        (sr16,) = struct.unpack_from(">I", data, body + 24)
        out["channels"], out["sample_rate"] = ch, sr16 >> 16


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def encode_sps(
    width: int, height: int, profile: int = 66, level: int = 30
) -> bytes:
    """Build a baseline-profile H.264 SPS NAL for exact pixel dims
    (4:2:0 cropping when not multiples of 16) — the write half of
    :func:`parse_sps`, fixture-only."""
    if width % 2 or height % 2:
        raise ValueError("H.264 4:2:0 dims must be even")
    bits: list[int] = []

    def u(v: int, n: int) -> None:
        bits.extend((v >> (n - 1 - i)) & 1 for i in range(n))

    def ue(v: int) -> None:
        k = v + 1
        n = k.bit_length()
        u(0, n - 1)
        u(k, n)

    pw = -(-width // 16)
    ph = -(-height // 16)
    crop_r = (pw * 16 - width) // 2  # cropUnitX = 2 (4:2:0)
    crop_b = (ph * 16 - height) // 2  # cropUnitY = 2 (frame_mbs_only)
    u(profile, 8)
    u(0, 8)  # constraint flags
    u(level, 8)
    ue(0)  # sps id
    ue(4)  # log2_max_frame_num_minus4
    ue(0)  # poc type 0
    ue(4)  # log2_max_pic_order_cnt_lsb_minus4
    ue(1)  # max_num_ref_frames
    u(0, 1)  # gaps allowed
    ue(pw - 1)
    ue(ph - 1)
    u(1, 1)  # frame_mbs_only
    u(1, 1)  # direct_8x8_inference
    if crop_r or crop_b:
        u(1, 1)
        ue(0)
        ue(crop_r)
        ue(0)
        ue(crop_b)
    else:
        u(0, 1)
    u(0, 1)  # vui_parameters_present
    u(1, 1)  # rbsp_stop_one_bit
    while len(bits) % 8:
        bits.append(0)
    payload = bytes(
        int("".join(map(str, bits[i: i + 8])), 2) for i in range(0, len(bits), 8)
    )
    return b"\x67" + payload  # NAL header: nal_ref_idc=3, type=7 (SPS)


def synth_mp4(
    duration_sec: float,
    timescale: int = 1000,
    width: int | None = None,
    height: int | None = None,
    sps: bytes | None = None,
    audio: tuple[int, int] | None = None,
) -> bytes:
    """Structurally valid MP4 fixture: ftyp + moov(mvhd [+video trak]
    [+audio trak]) + an inert mdat.  When sps is given the video trak
    carries a real avcC record (and tkhd mirrors the SPS dims)."""
    dur = int(round(duration_sec * timescale))
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3xIIII", 0, 0, 0, timescale, dur) + bytes(80),
    )
    traks = b""
    if width is not None:
        tkhd = _box(
            b"tkhd",
            struct.pack(">B3xIIII", 0, 0, 0, 1, 0)
            + struct.pack(">I", dur)
            + bytes(52)
            + struct.pack(">II", width << 16, height << 16),
        )
        ext = b""
        codec = b"raw "
        if sps is not None:
            codec = b"avc1"
            avcc = (
                bytes((1, sps[1], sps[2], sps[3], 0xFF, 0xE1))
                + struct.pack(">H", len(sps)) + sps + b"\x00"
            )
            ext = _box(b"avcC", avcc)
        entry = (
            struct.pack(">I", 8 + 78 + len(ext)) + codec
            + bytes(6) + struct.pack(">H", 1)
            + bytes(16)
            + struct.pack(">HH", width, height)
            + struct.pack(">II", 0x480000, 0x480000)
            + bytes(4) + struct.pack(">H", 1) + bytes(32)
            + struct.pack(">Hh", 24, -1)
            + ext
        )
        stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1) + entry)
        hdlr = _box(b"hdlr", struct.pack(">B3x4x", 0) + b"vide" + bytes(13))
        traks += _box(
            b"trak",
            tkhd + _box(b"mdia", hdlr + _box(b"minf", _box(b"stbl", stsd))),
        )
    if audio is not None:
        sr, ch = audio
        entry = (
            struct.pack(">I", 8 + 28) + b"mp4a"
            + bytes(6) + struct.pack(">H", 1)
            + bytes(8)
            + struct.pack(">HH", ch, 16)
            + bytes(4)
            + struct.pack(">I", sr << 16)
        )
        stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1) + entry)
        hdlr = _box(b"hdlr", struct.pack(">B3x4x", 0) + b"soun" + bytes(13))
        traks += _box(
            b"trak",
            _box(b"mdia", hdlr + _box(b"minf", _box(b"stbl", stsd))),
        )
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + _box(b"moov", mvhd + traks) + _box(b"mdat", bytes(16))


# ---------------------------------------------------------------------------
# Ogg (Opus / Vorbis)

def parse_ogg(data: bytes) -> dict:
    """Ogg page walk: identify the codec from the first page's packet
    (OpusHead / Vorbis identification header) and derive the duration
    from the terminal granule position of that logical stream."""
    pos = 0
    serial0 = None
    first_payload = None
    last_granule = None
    while pos + 27 <= len(data):
        if data[pos: pos + 4] != b"OggS":
            if pos == 0:
                raise ValueError("not an Ogg stream")
            break
        granule, serial = struct.unpack_from("<qI", data, pos + 6)
        nseg = data[pos + 26]
        seg_end = pos + 27 + nseg
        if seg_end > len(data):
            raise ValueError("Ogg segment table truncated")
        paylen = sum(data[pos + 27: seg_end])
        if serial0 is None:
            serial0 = serial
            first_payload = data[seg_end: seg_end + paylen]
        if serial == serial0 and granule >= 0:
            last_granule = granule
        pos = seg_end + paylen
    if first_payload is None:
        raise ValueError("Ogg stream has no pages")
    out: dict = {"container": "ogg", "codec": None, "duration_sec": None,
                 "sample_rate": None, "channels": None}
    if first_payload[:8] == b"OpusHead":
        ch = first_payload[9]
        (preskip,) = struct.unpack_from("<H", first_payload, 10)
        (in_sr,) = struct.unpack_from("<I", first_payload, 12)
        out.update(codec="opus", channels=ch, sample_rate=in_sr or 48000)
        if last_granule is not None:
            out["duration_sec"] = max(0, last_granule - preskip) / 48000.0
    elif first_payload[:7] == b"\x01vorbis":
        ch = first_payload[11]
        (sr,) = struct.unpack_from("<I", first_payload, 12)
        out.update(codec="vorbis", channels=ch, sample_rate=sr)
        if last_granule is not None and sr:
            out["duration_sec"] = last_granule / sr
    else:
        raise ValueError("unrecognized Ogg codec header")
    return out


def _ogg_page(
    payload: bytes, granule: int, serial: int, seq: int, htype: int
) -> bytes:
    """One Ogg page holding payload as complete packets (lacing in
    255-byte segments; payload < 255*255)."""
    segs = []
    rest = payload
    while True:
        segs.append(min(255, len(rest)))
        if len(rest) < 255:
            break
        rest = rest[255:]
    hdr = (
        b"OggS\x00" + bytes((htype,))
        + struct.pack("<qIII", granule, serial, seq, 0)
        + bytes((len(segs),)) + bytes(segs)
    )
    return hdr + payload


def synth_ogg(
    codec: str,
    n_samples: int,
    sample_rate: int = 48000,
    channels: int = 2,
    preskip: int = 312,
    n_audio_pages: int = 1,
    serial: int = 0x1234,
) -> bytes:
    """Structurally valid Ogg fixture (codec 'opus' or 'vorbis'): one
    identification page plus n_audio_pages inert audio pages whose
    terminal granule encodes n_samples."""
    if codec == "opus":
        ident = (
            b"OpusHead" + bytes((1, channels))
            + struct.pack("<HIhB", preskip, sample_rate, 0, 0)
        )
        total = n_samples + preskip
    elif codec == "vorbis":
        ident = (
            b"\x01vorbis" + struct.pack("<IB", 0, channels)
            + struct.pack("<IiiiB", sample_rate, 0, 0, 0, 1)
        )
        total = n_samples
    else:
        raise ValueError(f"unknown ogg codec {codec!r}")
    out = _ogg_page(ident, 0, serial, 0, 2)  # BOS
    for k in range(n_audio_pages):
        granule = total * (k + 1) // n_audio_pages
        htype = 4 if k == n_audio_pages - 1 else 0  # EOS on the last
        out += _ogg_page(b"\x00" * 8, granule, serial, k + 1, htype)
    return out


# ---------------------------------------------------------------------------
# WebM / Matroska (EBML)

def _ebml_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """One EBML variable-length integer at pos -> (value, next_pos).
    Element IDs keep the length-marker bit (spec: IDs are compared with
    it); sizes strip it.  An all-ones size payload means 'unknown'."""
    if pos >= len(data):
        raise ValueError("EBML vint past end")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML vint")
    length = 9 - first.bit_length()  # leading zeros + 1
    if pos + length > len(data):
        raise ValueError("EBML vint truncated")
    v = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        v = (v << 8) | data[pos + i]
    if not keep_marker and v == (1 << (7 * length)) - 1:
        v = -1  # unknown size (all value bits set for this length)
    return v, pos + length


def _ebml_children(data: bytes, pos: int, end: int):
    """Iterate (element_id, body_start, body_end) over an EBML master
    element's children; unknown-size elements extend to end."""
    while pos < end:
        eid, pos = _ebml_vint(data, pos, keep_marker=True)
        size, pos = _ebml_vint(data, pos, keep_marker=False)
        body_end = end if size < 0 else min(pos + size, end)
        yield eid, pos, body_end
        pos = body_end


def _ebml_uint(data: bytes, b: int, e: int) -> int:
    return int.from_bytes(data[b:e], "big")


def _ebml_float(data: bytes, b: int, e: int) -> float:
    n = e - b
    if n == 4:
        return struct.unpack(">f", data[b:e])[0]
    if n == 8:
        return struct.unpack(">d", data[b:e])[0]
    raise ValueError(f"EBML float of {n} bytes")


EBML_MAGIC = b"\x1a\x45\xdf\xa3"
_MKV_SEGMENT = 0x18538067
_MKV_INFO = 0x1549A966
_MKV_TSCALE = 0x2AD7B1
_MKV_DURATION = 0x4489
_MKV_TRACKS = 0x1654AE6B
_MKV_TRACKENTRY = 0xAE
_MKV_TRACKTYPE = 0x83
_MKV_CODECID = 0x86
_MKV_VIDEO = 0xE0
_MKV_PIXELW = 0xB0
_MKV_PIXELH = 0xBA
_MKV_AUDIO = 0xE1
_MKV_SAMPLEFREQ = 0xB5
_MKV_CHANNELS = 0x9F


def parse_webm(data: bytes) -> dict:
    """WebM/Matroska metadata via a pure EBML walk: Segment Info
    (TimestampScale + Duration -> seconds) and the first video/audio
    TrackEntry (CodecID, PixelWidth/Height, SamplingFrequency,
    Channels).  No Cluster payloads are read."""
    if data[:4] != EBML_MAGIC:
        raise ValueError("not an EBML stream")
    out: dict = {"container": "webm", "codec": None, "duration_sec": None,
                 "width": None, "height": None, "sample_rate": None,
                 "channels": None}
    segment = None
    for eid, b, e in _ebml_children(data, 0, len(data)):
        if eid == _MKV_SEGMENT:
            segment = (b, e)
            break
    if segment is None:
        raise ValueError("EBML stream has no Segment")
    tscale, duration_ticks = 1_000_000, None
    for eid, b, e in _ebml_children(data, *segment):
        if eid == _MKV_INFO:
            for e2, b2, e2e in _ebml_children(data, b, e):
                if e2 == _MKV_TSCALE:
                    tscale = _ebml_uint(data, b2, e2e)
                elif e2 == _MKV_DURATION:
                    duration_ticks = _ebml_float(data, b2, e2e)
        elif eid == _MKV_TRACKS:
            for e2, b2, e2e in _ebml_children(data, b, e):
                if e2 != _MKV_TRACKENTRY:
                    continue
                ttype = codec = None
                vids = auds = None
                for e3, b3, e3e in _ebml_children(data, b2, e2e):
                    if e3 == _MKV_TRACKTYPE:
                        ttype = _ebml_uint(data, b3, e3e)
                    elif e3 == _MKV_CODECID:
                        codec = data[b3:e3e].decode("ascii", "replace")
                    elif e3 == _MKV_VIDEO:
                        vids = (b3, e3e)
                    elif e3 == _MKV_AUDIO:
                        auds = (b3, e3e)
                if ttype == 1 and vids and out["width"] is None:
                    out["codec"] = out["codec"] or codec
                    for e4, b4, e4e in _ebml_children(data, *vids):
                        if e4 == _MKV_PIXELW:
                            out["width"] = _ebml_uint(data, b4, e4e)
                        elif e4 == _MKV_PIXELH:
                            out["height"] = _ebml_uint(data, b4, e4e)
                elif ttype == 2 and auds and out["sample_rate"] is None:
                    out["codec"] = out["codec"] or codec
                    for e4, b4, e4e in _ebml_children(data, *auds):
                        if e4 == _MKV_SAMPLEFREQ:
                            out["sample_rate"] = int(
                                _ebml_float(data, b4, e4e)
                            )
                        elif e4 == _MKV_CHANNELS:
                            out["channels"] = _ebml_uint(data, b4, e4e)
    if duration_ticks is not None:
        out["duration_sec"] = duration_ticks * tscale / 1e9
    return out


def _ebml_elem(eid: int, body: bytes) -> bytes:
    """Serialize one EBML element with a 1-byte (or minimal) size."""
    id_bytes = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    n = len(body)
    if n < 127:
        size = bytes((0x80 | n,))
    elif n < (1 << 14) - 1:
        size = struct.pack(">H", 0x4000 | n)
    else:
        size = struct.pack(">I", 0x10000000 | n)
    return id_bytes + size + body


def synth_webm(
    duration_sec: float | None = None,
    timescale: int = 1_000_000,
    width: int | None = None,
    height: int | None = None,
    video_codec: str = "V_VP9",
    audio: tuple[int, int] | None = None,
    audio_codec: str = "A_OPUS",
) -> bytes:
    """Structurally valid WebM fixture: EBML header + Segment(Info,
    Tracks) with an empty Cluster stand-in — inert payloads, real
    element tree."""
    header = _ebml_elem(
        0x1A45DFA3,
        _ebml_elem(0x4282, b"webm") + _ebml_elem(0x4287, b"\x04"),
    )
    info = _ebml_elem(
        _MKV_TSCALE, timescale.to_bytes(4, "big").lstrip(b"\x00") or b"\x00"
    )
    if duration_sec is not None:
        ticks = duration_sec * 1e9 / timescale
        info += _ebml_elem(_MKV_DURATION, struct.pack(">d", ticks))
    entries = b""
    if width is not None:
        video = _ebml_elem(
            _MKV_VIDEO,
            _ebml_elem(_MKV_PIXELW, width.to_bytes(2, "big"))
            + _ebml_elem(_MKV_PIXELH, height.to_bytes(2, "big")),
        )
        entries += _ebml_elem(
            _MKV_TRACKENTRY,
            _ebml_elem(_MKV_TRACKTYPE, b"\x01")
            + _ebml_elem(_MKV_CODECID, video_codec.encode())
            + video,
        )
    if audio is not None:
        sr, ch = audio
        aud = _ebml_elem(
            _MKV_AUDIO,
            _ebml_elem(_MKV_SAMPLEFREQ, struct.pack(">d", float(sr)))
            + _ebml_elem(_MKV_CHANNELS, bytes((ch,))),
        )
        entries += _ebml_elem(
            _MKV_TRACKENTRY,
            _ebml_elem(_MKV_TRACKTYPE, b"\x02")
            + _ebml_elem(_MKV_CODECID, audio_codec.encode())
            + aud,
        )
    segment = _ebml_elem(
        _MKV_SEGMENT,
        _ebml_elem(_MKV_INFO, info) + _ebml_elem(_MKV_TRACKS, entries),
    )
    return header + segment


# ---------------------------------------------------------------------------
# Header-only paths for formats whose full decoders live elsewhere

def _parse_wav_head(data: bytes) -> dict:
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as wf:
        sr, ch, n = wf.getframerate(), wf.getnchannels(), wf.getnframes()
        width = wf.getsampwidth()
    return {
        "container": "wav", "codec": f"pcm_{width * 8}",
        "duration_sec": n / sr if sr else None,
        "sample_rate": sr, "channels": ch,
        "bit_rate_kbps": sr * ch * width * 8 / 1000, "n_frames": n,
    }


def _parse_flac_head(data: bytes) -> dict:
    """STREAMINFO only (first metadata block, FLAC format 9.1):
    sample rate 20 bits, channels-1 3 bits, bps-1 5 bits, total
    samples 36 bits — no frame decode."""
    if data[4] & 0x7F != 0:
        raise ValueError("FLAC first block is not STREAMINFO")
    si = data[8: 8 + 34]
    if len(si) < 18:
        raise ValueError("FLAC STREAMINFO truncated")
    packed = int.from_bytes(si[10: 18], "big")
    sr = packed >> 44
    ch = ((packed >> 41) & 7) + 1
    bps = ((packed >> 36) & 31) + 1
    total = packed & ((1 << 36) - 1)
    return {
        "container": "flac", "codec": "flac",
        "duration_sec": total / sr if sr else None,
        "sample_rate": sr, "channels": ch,
        "bit_rate_kbps": len(data) * 8 / (total / sr) / 1000
        if sr and total else None,
        "n_frames": total,
    }


def _parse_avi_head(data: bytes) -> dict:
    """avih + video strf headers, frame count from movi CHUNK HEADERS —
    no frame payload reads."""
    from fscrawler_spark.functions.multimodal import _riff_chunks

    n_frames = w = h = None
    usec_per_frame = compression = None
    movi_frames = 0
    for cid, body, bend in _riff_chunks(data, 12, len(data)):
        if cid != b"LIST":
            continue
        ltype = data[body: body + 4]
        if ltype == b"hdrl":
            for c2, b2, e2 in _riff_chunks(data, body + 4, bend):
                if c2 == b"avih":
                    (usec_per_frame,) = struct.unpack_from("<I", data, b2)
                    (n_frames,) = struct.unpack_from("<I", data, b2 + 16)
                elif c2 == b"LIST" and data[b2: b2 + 4] == b"strl":
                    for c3, b3, e3 in _riff_chunks(data, b2 + 4, e2):
                        if c3 == b"strf" and e3 - b3 >= 20:
                            w, h_signed = struct.unpack_from("<ii", data, b3 + 4)
                            h = abs(h_signed)
                            (compression,) = struct.unpack_from(
                                "<I", data, b3 + 16
                            )
        elif ltype == b"movi":
            for c2, b2, e2 in _riff_chunks(data, body + 4, bend):
                if c2[2:4] in (b"db", b"dc"):
                    movi_frames += 1
    if w is None:
        raise ValueError("AVI missing stream format header")
    frames = n_frames or movi_frames
    dur = frames * usec_per_frame / 1e6 if usec_per_frame else None
    return {
        "container": "avi",
        "codec": "rawvideo" if not compression else
        struct.pack("<I", compression).decode("ascii", "replace"),
        "duration_sec": dur, "width": w, "height": h,
        "n_frames": frames,
    }


def _parse_gif_head(data: bytes) -> dict:
    """Logical-screen dims + frame count by block walk (sub-block skip,
    no LZW decode)."""
    w, h = struct.unpack_from("<HH", data, 6)
    pos = 13
    if data[10] & 0x80:
        pos += 3 * (2 << (data[10] & 7))
    frames = 0
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            frames += 1
            flags = data[pos + 9]
            pos += 10
            if flags & 0x80:
                pos += 3 * (2 << (flags & 7))
            pos += 1  # LZW min code size
            while pos < len(data) and data[pos]:
                pos += 1 + data[pos]
            pos += 1
        else:
            raise ValueError(f"GIF unknown block 0x{b:02x}")
    return {
        "container": "gif", "codec": "gif",
        "width": int(w), "height": int(h), "n_frames": frames,
    }


# ---------------------------------------------------------------------------
# The catalog operator

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("container", T.StringType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("duration_sec", T.DoubleType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("bit_rate_kbps", T.DoubleType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

_META_COLS = (
    "container", "codec", "duration_sec", "width", "height",
    "sample_rate", "channels", "bit_rate_kbps", "n_frames",
)


def parse_media_meta(data: bytes) -> dict:
    """Magic-byte dispatch over every format the engine knows.  Raises
    (contained by media_info) on unknown or corrupt streams."""
    data = bytes(data)
    if data[:3] == b"ID3" or (
        len(data) > 1 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0
    ):
        return parse_mp3(data)
    if data[4:8] == b"ftyp":
        return parse_mp4(data)
    if data[:4] == b"OggS":
        return parse_ogg(data)
    if data[:4] == EBML_MAGIC:
        return parse_webm(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return _parse_wav_head(data)
    if data[:4] == b"fLaC":
        return _parse_flac_head(data)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return _parse_avi_head(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return _parse_gif_head(data)
    if data[:7] == b"FAKEAUD":
        sr, n = struct.unpack_from("<II", data, 7)
        return {"container": "fake", "codec": "fakeaud",
                "duration_sec": n / sr if sr else None,
                "sample_rate": sr, "channels": 1, "n_frames": n}
    if data[:7] == b"FAKEVID":
        n, w, h = struct.unpack_from("<III", data, 7)
        return {"container": "fake", "codec": "fakevid",
                "width": w, "height": h, "n_frames": n}
    raise ValueError("unknown media container")


# everything a corrupt/unknown blob can raise out of the parsers above
META_ERRORS = (ValueError, struct.error, IndexError, EOFError, KeyError)


def media_info(media: DataFrame) -> DataFrame:
    """The catalog operator: one row per media row with structural
    metadata, never decoding payload entropy.  Arrow-batched
    mapInPandas; undecodable rows yield NULL fields, never failures
    (D4 containment)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import wave

        errors = META_ERRORS + (wave.Error,)
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "n_bytes") + _META_COLS}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                meta: dict = {}
                if data is not None:
                    try:
                        meta = parse_media_meta(data)
                    except errors:
                        meta = {}
                rows["media_id"].append(mid)
                rows["n_bytes"].append(
                    len(data) if data is not None else None
                )
                for k in _META_COLS:
                    rows[k].append(meta.get(k))
            yield pd.DataFrame(rows)[
                ["media_id"] + list(_META_COLS) + ["n_bytes"]
            ]

    return media.select("media_id", "data").mapInPandas(
        gen, MEDIA_META_SCHEMA
    )
