"""TIFF codec (uncompressed + LZW + PackBits), stdlib+numpy only.

TIFF rounds out the image formats a web crawl actually encounters
(scanned documents, exports): the common lossless profiles have purely
algorithmic entropy layers — LZW (the TIFF variant: MSB-first bit
packing with the famous "early change" code-width bump one code before
GIF's) and PackBits run-length — so, like GIF, they are exactly
roundtrippable with no spec constant tables.

  decode — both byte orders (II little-endian, MM big-endian), classic
           (non-Big) TIFF, first IFD: Compression 1 (none), 5 (LZW,
           per-strip streams), 7 (new-style JPEG, per-strip streams
           decoded by the repo's own codec with optional JPEGTables
           splice), 8/32946 (Deflate, one zlib stream per strip),
           32773 (PackBits); Predictor 2 (horizontal differencing)
           undone per row; 8-bit grayscale (both MinIsBlack and
           MinIsWhite) and RGB / RGBA (extra samples appended),
           multi-strip assembly via StripOffsets/StripByteCounts/
           RowsPerStrip.  Other compressions raise
           NotImplementedError; malformed structures raise ValueError
           — both inside the shared DECODE_ERRORS containment.
  encode — little-endian classic TIFF, one or more strips, gray/RGB/
           RGBA, compressions 1/5/7/8/32773 + predictor, for the
           roundtrip tests (exact for the lossless modes).

Wired into multimodal.decode_image_py behind the II*/MM* magic.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BPS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR_CONFIG = 284
_TAG_PREDICTOR = 317
_TAG_JPEG_TABLES = 347

_LZW_CLEAR, _LZW_EOI, _LZW_FIRST = 256, 257, 258


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """Decode one TIFF-LZW strip (MSB-first codes, 8-bit symbols,
    width 9..12 with the early change: the width bumps one table entry
    BEFORE the GIF convention, i.e. after assigning entry 2^w - 2 the
    next code is read at w+1 bits — codes 511/1023/2047 already arrive
    widened, TIFF 6.0 §13) into exactly `expected` bytes."""
    out = bytearray()
    table: list[bytes] = []
    width = 9
    next_code = _LZW_FIRST
    prev: bytes | None = None
    bitpos = 0
    nbits = len(data) * 8
    while len(out) < expected:
        if bitpos + width > nbits:
            raise ValueError("TIFF LZW stream truncated")
        byte0 = bitpos >> 3
        chunk = int.from_bytes(data[byte0: byte0 + 3].ljust(3, b"\0"),
                               "big")
        code = (chunk >> (24 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == _LZW_CLEAR:
            table = []
            width = 9
            next_code = _LZW_FIRST
            prev = None
            continue
        if code == _LZW_EOI:
            break
        if prev is None:
            if code > 255:
                raise ValueError("TIFF LZW: first code not a literal")
            entry = bytes([code])
        else:
            if code < 256:
                entry = bytes([code])
            elif code - _LZW_FIRST < len(table):
                entry = table[code - _LZW_FIRST]
            elif code == next_code:
                entry = prev + prev[:1]  # KwKwK
            else:
                raise ValueError("TIFF LZW: code out of sequence")
            table.append(prev + entry[:1])
            next_code += 1
            # early change: entry 2^w - 2 just assigned -> read wider
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
        out += entry
        prev = entry
    if len(out) < expected:
        raise ValueError("TIFF LZW produced too few bytes")
    return bytes(out[:expected])


def _lzw_encode(raw: bytes) -> bytes:
    """Encode one strip as TIFF-LZW (the decoder's exact mirror: the
    encoder's table runs one entry ahead, so its early change fires at
    2^w - 1)."""
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, accbits
        acc = (acc << w) | code
        accbits += w
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    width = 9
    next_code = _LZW_FIRST
    emit(_LZW_CLEAR, width)
    buf = b""
    for i in range(len(raw)):
        cand = buf + raw[i: i + 1]
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if next_code < 4094:  # leave room: emit Clear before full
            table[cand] = next_code
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
            next_code += 1
        else:
            emit(_LZW_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            width = 9
            next_code = _LZW_FIRST
        buf = raw[i: i + 1]
    if buf:
        emit(table[buf], width)
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    emit(_LZW_EOI, width)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """Decode a PackBits stream (TIFF 6.0 §9) to exactly `expected`
    bytes: n in 0..127 copies n+1 literals, n in 129..255 repeats the
    next byte 257-n times, 128 is a no-op."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:
            cnt = b + 1
            if i + cnt > n:
                raise ValueError("TIFF PackBits literal truncated")
            out += data[i: i + cnt]
            i += cnt
        elif b > 128:
            if i >= n:
                raise ValueError("TIFF PackBits run truncated")
            out += data[i: i + 1] * (257 - b)
            i += 1
    if len(out) < expected:
        raise ValueError("TIFF PackBits produced too few bytes")
    return bytes(out[:expected])


def _packbits_encode_row(row: bytes) -> bytes:
    """Encode one row (PackBits must not cross row boundaries)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        if j - i >= 2:  # replicate run
            out.append(257 - (j - i))
            out.append(row[i])
            i = j
            continue
        j = i + 1  # literal run: until a 3-byte replicate starts
        while (j < n and j - i < 128
               and not (j + 2 <= n - 1 and row[j] == row[j + 1]
                        and row[j] == row[j + 2] if j + 2 < n else False)):
            j += 1
        out.append(j - i - 1)
        out += row[i:j]
        i = j
    return bytes(out)

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 7: "B", 8: "h", 9: "i"}


def _read_tag_values(data: bytes, e: str, ttype: int, count: int,
                     value_field: bytes) -> list[int]:
    size = _TYPE_SIZES.get(ttype)
    fmt = _TYPE_FMT.get(ttype)
    if size is None or fmt is None:
        raise ValueError(f"unsupported TIFF tag type {ttype}")
    total = size * count
    if total <= 4:
        raw = value_field[:total]
    else:
        (off,) = struct.unpack(e + "I", value_field)
        raw = data[off: off + total]
        if len(raw) < total:
            raise ValueError("TIFF tag value outside file")
    return list(struct.unpack(e + fmt * count, raw))


def decode_tiff(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode the first IFD of an uncompressed TIFF to
    (width, height, channels, uint8 array (h, w, c))."""
    try:
        return _decode_tiff(data)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"TIFF stream truncated: {exc}") from exc


def _decode_tiff(data: bytes) -> tuple[int, int, int, np.ndarray]:
    if data[:4] == b"II*\x00":
        e = "<"
    elif data[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a classic TIFF (bad magic)")
    (ifd_off,) = struct.unpack_from(e + "I", data, 4)
    if ifd_off + 2 > len(data):
        raise ValueError("TIFF IFD offset outside file")
    (n_tags,) = struct.unpack_from(e + "H", data, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_tags):
        at = ifd_off + 2 + 12 * i
        tag, ttype, count = struct.unpack_from(e + "HHI", data, at)
        if tag in (_TAG_WIDTH, _TAG_HEIGHT, _TAG_BPS, _TAG_COMPRESSION,
                   _TAG_PHOTOMETRIC, _TAG_STRIP_OFFSETS, _TAG_SPP,
                   _TAG_ROWS_PER_STRIP, _TAG_STRIP_COUNTS,
                   _TAG_PLANAR_CONFIG, _TAG_PREDICTOR, _TAG_JPEG_TABLES):
            tags[tag] = _read_tag_values(
                data, e, ttype, count, data[at + 8: at + 12]
            )

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default

    w = one(_TAG_WIDTH)
    h = one(_TAG_HEIGHT)
    if w == 0 or h == 0:
        raise ValueError("TIFF with empty dimensions")
    compression = one(_TAG_COMPRESSION, 1)
    if compression not in (1, 5, 7, 8, 32773, 32946):
        raise NotImplementedError(
            f"TIFF compression {compression} "
            "(1/LZW/JPEG/Deflate/PackBits only)"
        )
    predictor = one(_TAG_PREDICTOR, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if compression == 7 and predictor != 1:
        raise ValueError("TIFF predictor with JPEG compression")
    spp = one(_TAG_SPP, 1)
    # PlanarConfiguration 2 stores each sample plane separately; the
    # strip byte count is identical to chunky, so without this guard a
    # planar file would decode silently into garbled pixels
    if spp > 1 and one(_TAG_PLANAR_CONFIG, 1) != 1:
        raise NotImplementedError("planar TIFF (PlanarConfiguration=2)")
    bps_list = tags.get(_TAG_BPS, [8])
    if any(b != 8 for b in bps_list):
        raise NotImplementedError("only 8-bit TIFF samples supported")
    if spp not in (1, 3, 4):
        raise NotImplementedError(f"TIFF SamplesPerPixel {spp} (1/3/4 only)")
    photometric = one(_TAG_PHOTOMETRIC, 1)
    offsets = tags.get(_TAG_STRIP_OFFSETS)
    counts = tags.get(_TAG_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF strip tables missing or inconsistent")
    rps = one(_TAG_ROWS_PER_STRIP, h) or h
    if compression == 7:
        # New-style JPEG-in-TIFF (Technical Note 2): each strip is a
        # JPEG entropy stream, decoded by the repo's own from-scratch
        # codec (functions/jpeg.py).  An optional JPEGTables tag holds
        # an abbreviated stream (SOI..tables..EOI) shared by all
        # strips; it is spliced after each strip's SOI so per-strip
        # tables, when present, still win (they come later).  Our
        # 3-channel JPEG path assumes the standard YCbCr coding, so
        # photometric must say so (6), or 1 for grayscale.
        if photometric not in (1, 6):
            raise NotImplementedError(
                f"JPEG-in-TIFF photometric {photometric} (1/6 only)"
            )
        from fscrawler_spark.functions.jpeg import decode_jpeg

        tables = b""
        if _TAG_JPEG_TABLES in tags:
            tbl = bytes(tags[_TAG_JPEG_TABLES])
            if tbl[:2] != b"\xff\xd8" or tbl[-2:] != b"\xff\xd9":
                raise ValueError("JPEGTables is not an abbreviated stream")
            tables = tbl[2:-2]
        parts = []
        for i, (off, cnt) in enumerate(zip(offsets, counts)):
            chunk = data[off: off + cnt]
            if len(chunk) < cnt:
                raise ValueError("TIFF strip outside file")
            if chunk[:2] != b"\xff\xd8":
                raise ValueError("JPEG-in-TIFF strip without SOI")
            rows_here = min(rps, h - i * rps)
            if rows_here <= 0:
                raise ValueError("TIFF has more strips than rows")
            sw, sh, sc, px = decode_jpeg(
                chunk[:2] + tables + chunk[2:] if tables else chunk
            )
            if (sw, sh, sc) != (w, rows_here, spp):
                raise ValueError(
                    f"JPEG-in-TIFF strip shape ({sw},{sh},{sc}) != "
                    f"IFD ({w},{rows_here},{spp})"
                )
            parts.append(px.reshape(sh, sw, sc))
        return w, h, spp, np.ascontiguousarray(np.concatenate(parts))
    raw = bytearray()
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        chunk = data[off: off + cnt]
        if len(chunk) < cnt:
            raise ValueError("TIFF strip outside file")
        if compression == 1:
            raw += chunk
        else:  # each strip is an independent compressed stream
            rows_here = min(rps, h - i * rps)
            if rows_here <= 0:
                raise ValueError("TIFF has more strips than rows")
            expect = rows_here * w * spp
            if compression in (8, 32946):
                # Adobe Deflate (8) / legacy Deflate (32946): each
                # strip is one zlib stream
                dec = zlib.decompress(bytes(chunk))
                if len(dec) != expect:
                    raise ValueError("TIFF Deflate strip length mismatch")
                raw += dec
            else:
                raw += (_lzw_decode if compression == 5
                        else _packbits_decode)(chunk, expect)
    need = w * h * spp
    if len(raw) < need:
        raise ValueError("TIFF pixel data truncated")
    arr = np.frombuffer(bytes(raw[:need]), np.uint8).reshape(h, w, spp)
    if predictor == 2:  # horizontal differencing: undo per row/channel
        arr = np.cumsum(arr, axis=1, dtype=np.int64).astype(np.uint8)
    if photometric == 0:  # MinIsWhite: invert to the usual convention
        if spp != 1:
            raise ValueError("MinIsWhite only valid for grayscale TIFF")
        arr = 255 - arr
    return w, h, spp, arr


def encode_tiff(arr: np.ndarray, rows_per_strip: int | None = None,
                compression: int = 1, predictor: int = 1) -> bytes:
    """Encode (h, w[, 1|3|4]) uint8 pixels as little-endian classic
    TIFF (one IFD, optionally multiple strips), Compression
    1/5/8(Deflate)/32773 or 7 (new-style JPEG: each strip a standalone stream from the
    repo's own encoder — lossy, so roundtrip tests compare against
    the JPEG codec's own decode, not the source pixels), optional
    horizontal-differencing Predictor 2 (lossless modes only)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3, 4) or arr.dtype != np.uint8:
        raise ValueError("encode_tiff wants (h,w) or (h,w,{1,3,4}) uint8")
    if compression not in (1, 5, 7, 8, 32773):
        raise ValueError(f"encode_tiff compression {compression}")
    if predictor not in (1, 2):
        raise ValueError(f"encode_tiff predictor {predictor}")
    if compression == 7:
        if arr.shape[2] not in (1, 3):
            raise ValueError("JPEG-in-TIFF encode wants 1 or 3 channels")
        if predictor != 1:
            raise ValueError("predictor does not apply to JPEG strips")
    h, w, spp = arr.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    src = arr
    if predictor == 2:  # store per-row horizontal differences
        src = arr.copy()
        src[:, 1:] = arr[:, 1:] - arr[:, :-1]  # uint8 wraparound
    rps = rows_per_strip or h

    def pack(strip: np.ndarray) -> bytes:
        if compression == 5:
            return _lzw_encode(strip.tobytes())
        if compression == 8:  # Adobe Deflate: one zlib stream per strip
            return zlib.compress(strip.tobytes(), 9)
        if compression == 7:  # one standalone JPEG stream per strip
            from fscrawler_spark.functions.jpeg import encode_jpeg

            return encode_jpeg(
                strip[:, :, 0] if spp == 1 else strip, quality=100
            )
        if compression == 32773:  # PackBits: one stream per row
            return b"".join(
                _packbits_encode_row(strip[y].tobytes())
                for y in range(strip.shape[0])
            )
        return strip.tobytes()

    strips = [pack(src[y: y + rps]) for y in range(0, h, rps)]

    # layout: header(8) | pixel strips | BPS array (if spp>1) | IFD
    pos = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    bps_off = pos
    if spp > 1:
        pos += 2 * spp
    ifd_off = pos

    entries = []  # (tag, type, count, packed value)

    def short(v: int) -> bytes:
        return struct.pack("<HH", v, 0)

    def long_(v: int) -> bytes:
        return struct.pack("<I", v)

    entries.append((_TAG_WIDTH, 3, 1, short(w)))
    entries.append((_TAG_HEIGHT, 3, 1, short(h)))
    if spp == 1:
        entries.append((_TAG_BPS, 3, 1, short(8)))
    else:
        entries.append((_TAG_BPS, 3, spp, long_(bps_off)))
    entries.append((_TAG_COMPRESSION, 3, 1, short(compression)))
    # color JPEG strips are coded YCbCr (the codec's standard path);
    # lossless color stays RGB
    entries.append((_TAG_PHOTOMETRIC, 3, 1, short(
        1 if spp == 1 else (6 if compression == 7 else 2)
    )))
    if len(strips) == 1:
        entries.append((_TAG_STRIP_OFFSETS, 4, 1, long_(strip_offsets[0])))
    else:
        # offsets array needs its own storage after the IFD
        pass  # placeholder, handled below
    entries.append((_TAG_SPP, 3, 1, short(spp)))
    if predictor == 2:
        entries.append((_TAG_PREDICTOR, 3, 1, short(2)))
    entries.append((_TAG_ROWS_PER_STRIP, 3, 1, short(rps)))
    if len(strips) == 1:
        entries.append((_TAG_STRIP_COUNTS, 4, 1, long_(len(strips[0]))))

    n_multi = 0 if len(strips) == 1 else 2  # offsets + counts arrays
    n_tags = len(entries) + n_multi
    after_ifd = ifd_off + 2 + 12 * n_tags + 4
    if len(strips) > 1:
        entries.append((_TAG_STRIP_OFFSETS, 4, len(strips), long_(after_ifd)))
        entries.append((
            _TAG_STRIP_COUNTS, 4, len(strips),
            long_(after_ifd + 4 * len(strips)),
        ))
    entries.sort(key=lambda t: t[0])  # spec: ascending tag order

    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    for s in strips:
        out += s
    if spp > 1:
        out += struct.pack("<" + "H" * spp, *([8] * spp))
    out += struct.pack("<H", n_tags)
    for tag, ttype, count, value in entries:
        out += struct.pack("<HHI", tag, ttype, count) + value
    out += struct.pack("<I", 0)  # next IFD: none
    if len(strips) > 1:
        out += struct.pack("<" + "I" * len(strips), *strip_offsets)
        out += struct.pack("<" + "I" * len(strips),
                           *[len(s) for s in strips])
    return bytes(out)
