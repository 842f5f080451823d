"""GIF codec (GIF87a/GIF89a), stdlib+numpy only — the third of the
web's big three image formats after this repo's PNG and JPEG codecs.

Unlike JPEG, GIF is lossless (palette + LZW), so the pytest roundtrips
are EXACT, and unlike MP3/H.264 its entropy coder is purely
algorithmic — no spec constant tables to transcribe, so a from-scratch
implementation can be verified end-to-end by its own encoder/decoder
pair plus hand-built reference streams.

  decode — header + logical screen descriptor, global/local color
           tables, graphic control extensions (transparency, disposal,
           delay), interlaced and non-interlaced image descriptors,
           LSB-first variable-width LZW with code-table growth to 4096
           and CLEAR/EOI handling, sub-block reassembly.  Animated
           GIFs composite frame-by-frame onto the logical screen with
           disposal methods 0/1 (leave), 2 (restore background) and
           3 (restore previous).
  encode — static or animated: palette built from the frames' distinct
           colors (<= 256, the format's own limit; grayscale uses the
           identity gray palette), LZW compression with code growth
           and table reset, optional interlacing, optional per-frame
           delays (emits NETSCAPE2.0 looping + GCE blocks).

Integration: `multimodal.decode_image_py` serves the first frame of a
GIF (RGB, or RGBA when the frame declares transparency);
`multimodal.decode_video_py` serves an animated GIF as an
(n_frames, w, h, RGB frame bytes) stream — the same contract as the
AVI path, so `sample_frames` and `thumbnails` work on real animated
GIFs unchanged.  Corrupt streams raise ValueError (contained by the
shared DECODE_ERRORS tuple).

Generalizes the reference's binary-content processors
(app/processors/preview_file_processor.py:17-62) to the one common
web animation format its ffmpeg path handled implicitly.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")

# interlace passes: (first row, step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, dynamic code width 3..12)

def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> np.ndarray:
    """Decode a GIF LZW stream (sub-blocks already joined) into exactly
    `expected` palette indices."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(expected, np.uint8)
    n_out = 0

    # bit reader state (LSB-first)
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)

    def init_table():
        return {i: bytes([i]) for i in range(clear)}

    table = init_table()
    next_code = eoi + 1
    width = min_code_size + 1
    prev: bytes | None = None

    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = init_table()
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("GIF LZW: first code not in table")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("GIF LZW: code out of sequence")
        take = min(len(entry), expected - n_out)
        out[n_out: n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += take
        if n_out >= expected:
            break
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < expected:
        raise ValueError(
            f"GIF LZW produced {n_out} of {expected} pixels"
        )
    return out


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    """Encode palette indices as a GIF LZW stream (no sub-blocking)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    buf = b""
    for b in indices.tobytes():
        cand = buf + bytes([b])
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if next_code < 4096:
            table[cand] = next_code
            # GIF code width grows when next_code EXCEEDS the current
            # range (the decoder grows after assigning 2^width - 1)
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:  # table full: reset
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        buf = bytes([b])
    if buf:
        emit(table[buf], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(payload: bytes) -> bytes:
    """Package a byte stream as GIF 255-byte sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i: i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("GIF sub-blocks truncated")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        chunk = data[pos: pos + n]
        if len(chunk) < n:  # short read
            raise ValueError("GIF sub-block truncated")
        out += chunk
        pos += n


# ---------------------------------------------------------------------------
# Decoder

def decode_gif(data: bytes) -> tuple[int, int, list[np.ndarray], list[bool]]:
    """Decode all frames of a GIF: (width, height, frames, transparent)
    where each frame is the COMPOSITED logical screen as (h, w, 3)
    uint8 RGB and transparent[i] says whether frame i left any pixel
    never painted (exposed background with a transparency index)."""
    w, h, frames, transp, _mask = _decode_gif_wrapped(data)
    return w, h, frames, transp


def _decode_gif_wrapped(data: bytes):
    try:
        return _decode_gif(data)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"GIF stream truncated: {exc}") from exc


def _decode_gif(
    data: bytes,
) -> tuple[int, int, list[np.ndarray], list[bool], np.ndarray]:
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF (bad signature)")
    w, h, flags, bg_index, _aspect = struct.unpack_from("<HHBBB", data, 6)
    if w == 0 or h == 0:
        raise ValueError("GIF with empty logical screen")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n

    # logical screen state: start at the background color (or black)
    if gct is not None and bg_index < len(gct):
        screen = np.tile(gct[bg_index], (h, w, 1)).astype(np.uint8)
    else:
        screen = np.zeros((h, w, 3), np.uint8)
    painted = np.zeros((h, w), bool)

    frames: list[np.ndarray] = []
    has_transparency: list[bool] = []
    transparent_idx: int | None = None
    disposal = 0

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            body, pos = _read_sub_blocks(data, pos)
            if label == 0xF9 and len(body) >= 4:  # GCE
                gflags = body[0]
                disposal = (gflags >> 2) & 0x07
                transparent_idx = body[3] if gflags & 0x01 else None
            continue
        if block != 0x2C:  # image descriptor is the only other block
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        fx, fy, fw, fh, lflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if fw == 0 or fh == 0 or fx + fw > w or fy + fh > h:
            raise ValueError("GIF frame outside logical screen")
        ct = gct
        if lflags & 0x80:
            n = 2 << (lflags & 0x07)
            ct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame has no color table")
        min_code_size = data[pos]
        pos += 1
        lzw, pos = _read_sub_blocks(data, pos)
        idx = _lzw_decode(min_code_size, lzw, fw * fh).reshape(fh, fw)
        if lflags & 0x40:  # interlaced: reorder rows
            tmp = np.empty_like(idx)
            src = 0
            for first, step in _INTERLACE:
                rows = range(first, fh, step)
                for r in rows:
                    tmp[r] = idx[src]
                    src += 1
            idx = tmp
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("GIF pixel index outside color table")

        if disposal == 3:
            prev_screen = screen.copy()
            prev_painted = painted.copy()
        else:
            prev_screen = prev_painted = None
        rgb = ct[idx]
        region = (slice(fy, fy + fh), slice(fx, fx + fw))
        if transparent_idx is not None:
            opaque = idx != transparent_idx
            screen[region][opaque] = rgb[opaque]
            painted[region] |= opaque
        else:
            screen[region] = rgb
            painted[region] = True
        frames.append(screen.copy())
        has_transparency.append(not painted.all())
        if len(frames) == 1:
            first_mask = painted.copy()

        # disposal AFTER the frame is shown (screen AND paint mask)
        if disposal == 2:
            if gct is not None and bg_index < len(gct):
                screen[region] = gct[bg_index]
            else:
                screen[region] = 0
            painted[region] = False
        elif disposal == 3 and prev_screen is not None:
            screen = prev_screen
            painted = prev_painted
        disposal = 0
        transparent_idx = None

    if not frames:
        raise ValueError("GIF contains no image frames")
    return w, h, frames, has_transparency, first_mask


def decode_gif_image(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """First frame of a GIF in the decode_image_py contract:
    (w, h, channels, array).  Frames with never-painted pixels come
    back RGBA (alpha 0 where the background shows through), fully
    painted frames come back RGB."""
    w, h, frames, transp, first_mask = _decode_gif_wrapped(data)
    frame = frames[0]
    if transp[0]:
        # decode_gif composites onto the background color, so alpha
        # comes from the first frame's paint mask (computed in the
        # same pass — no second parse/LZW decode)
        alpha = np.where(first_mask, 255, 0).astype(np.uint8)
        return w, h, 4, np.dstack([frame, alpha])
    return w, h, 3, frame


def decode_gif_video(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Animated GIF in the decode_video_py contract:
    (n_frames, w, h, [RGB frame bytes]) — composited logical-screen
    frames, same shape the AVI path yields."""
    w, h, frames, _transp = decode_gif(data)
    return len(frames), w, h, [f.tobytes() for f in frames]


# ---------------------------------------------------------------------------
# Encoder

def _build_palette(frames: list[np.ndarray]) -> tuple[np.ndarray, list[np.ndarray]]:
    """Palette (n<=256, 3) + per-frame index arrays from exact colors."""
    all_px = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(all_px, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"GIF needs <= 256 distinct colors, got {len(palette)}"
        )
    index_frames = []
    off = 0
    for f in frames:
        n = f.shape[0] * f.shape[1]
        index_frames.append(
            inverse[off: off + n].astype(np.uint8).reshape(f.shape[:2])
        )
        off += n
    return palette.astype(np.uint8), index_frames


def encode_gif(
    frames: np.ndarray | list[np.ndarray],
    delays_cs: list[int] | None = None,
    interlace: bool = False,
    loop: bool = True,
) -> bytes:
    """Encode one frame ((h, w) gray or (h, w, 3) RGB) or a list of
    same-shape frames as GIF89a.  Colors must be exact-representable:
    <= 256 distinct RGB colors across all frames (gray input always
    fits via the identity gray palette).  delays_cs gives per-frame
    delays in centiseconds for animations."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("encode_gif needs at least one frame")
    norm = []
    for f in frames:
        f = np.asarray(f)
        if f.ndim == 2:
            f = np.dstack([f, f, f])
        if f.ndim != 3 or f.shape[2] != 3 or f.dtype != np.uint8:
            raise ValueError("frames must be (h,w) or (h,w,3) uint8")
        norm.append(f)
    h, w = norm[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in norm):
        raise ValueError("all frames must share one shape")
    palette, index_frames = _build_palette(norm)

    # color table size: power of two >= max(2, len(palette))
    ct_bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    ct_n = 1 << ct_bits
    table = np.zeros((ct_n, 3), np.uint8)
    table[: len(palette)] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((ct_bits - 1) & 0x07), 0, 0)
    out += table.tobytes()

    animated = len(norm) > 1
    if animated and loop:
        # app extension: one 3-byte sub-block (\x01 + loop count 0 =
        # forever) then the block terminator
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"

    min_code_size = max(2, ct_bits)
    for i, idx in enumerate(index_frames):
        if animated or delays_cs:
            delay = (delays_cs[i] if delays_cs and i < len(delays_cs)
                     else 10)
            out += b"\x21\xf9" + bytes([4]) \
                + struct.pack("<BHB", 0x04, delay, 0) + b"\x00"
        lflags = 0x40 if interlace else 0x00
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, lflags)
        if interlace:
            rows = []
            for first, step in _INTERLACE:
                rows.extend(range(first, h, step))
            idx = idx[rows]
        out.append(min_code_size)
        out += _sub_blocks(_lzw_encode(min_code_size, idx.reshape(-1)))
    out += b"\x3b"
    return bytes(out)
