"""Baseline TIFF codec (uncompressed), stdlib+numpy only.

TIFF rounds out the image formats a web crawl actually encounters
(scanned documents, exports): unlike PNG/GIF/JPEG there is no entropy
coder at all in the baseline profile — the format is a tag directory
(IFD) over raw strips — so this is pure structural parsing, exactly
roundtrippable, in ~150 lines.

  decode — both byte orders (II little-endian, MM big-endian), classic
           (non-Big) TIFF, first IFD: uncompressed (Compression=1)
           8-bit grayscale (both MinIsBlack and MinIsWhite) and RGB /
           RGBA (extra samples appended), multi-strip assembly via
           StripOffsets/StripByteCounts/RowsPerStrip.  LZW/JPEG-in-TIFF
           and other compressions raise NotImplementedError; malformed
           structures raise ValueError — both inside the shared
           DECODE_ERRORS containment.
  encode — little-endian classic TIFF, one or more strips, gray/RGB/
           RGBA, for the exact-roundtrip tests.

Wired into multimodal.decode_image_py behind the II*/MM* magic.
"""

from __future__ import annotations

import struct

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

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}


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
                   _TAG_PLANAR_CONFIG):
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
    if compression != 1:
        raise NotImplementedError(
            f"TIFF compression {compression} (only 1 = uncompressed)"
        )
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
    raw = bytearray()
    for off, cnt in zip(offsets, counts):
        chunk = data[off: off + cnt]
        if len(chunk) < cnt:
            raise ValueError("TIFF strip outside file")
        raw += chunk
    need = w * h * spp
    if len(raw) < need:
        raise ValueError("TIFF pixel data truncated")
    arr = np.frombuffer(bytes(raw[:need]), np.uint8).reshape(h, w, spp)
    if photometric == 0:  # MinIsWhite: invert to the usual convention
        if spp != 1:
            raise ValueError("MinIsWhite only valid for grayscale TIFF")
        arr = 255 - arr
    return w, h, spp, arr


def encode_tiff(arr: np.ndarray, rows_per_strip: int | None = None) -> bytes:
    """Encode (h, w[, 1|3|4]) uint8 pixels as uncompressed
    little-endian classic TIFF (one IFD, optionally multiple strips)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3, 4) or arr.dtype != np.uint8:
        raise ValueError("encode_tiff wants (h,w) or (h,w,{1,3,4}) uint8")
    h, w, spp = arr.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    rps = rows_per_strip or h
    strips = [arr[y: y + rps].tobytes() for y in range(0, h, rps)]

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
    entries.append((_TAG_COMPRESSION, 3, 1, short(1)))
    entries.append((_TAG_PHOTOMETRIC, 3, 1, short(1 if spp == 1 else 2)))
    if len(strips) == 1:
        entries.append((_TAG_STRIP_OFFSETS, 4, 1, long_(strip_offsets[0])))
    else:
        # offsets array needs its own storage after the IFD
        pass  # placeholder, handled below
    entries.append((_TAG_SPP, 3, 1, short(spp)))
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
