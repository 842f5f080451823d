"""Baseline JPEG codec, stdlib+numpy only (no PIL/libjpeg in this
container).

Round 4 left one honest boundary in the multimodal column stack:
"compressed codecs (JPEG/H.264) remain environment-bound".  This
module closes the JPEG half of it with a from-scratch baseline
sequential DCT codec (ITU-T T.81):

  decode — SOI/DQT/DHT/SOF0/SOF1/DRI/SOS parsing, interleaved MCU
           Huffman decode with restart markers and byte unstuffing,
           dequantize + vectorized 2-D IDCT over ALL blocks at once
           (one einsum per component, no per-block Python), chroma
           upsampling for arbitrary h/v sampling factors up to the
           frame hmax/vmax (4:4:4, 4:2:2, 4:2:0, grayscale), JFIF
           full-range YCbCr -> RGB.
  encode — RGB -> YCbCr (or grayscale direct), optional 2x2 chroma
           box subsampling, edge-replicated padding, vectorized 2-D
           DCT, quality-scaled Annex-K-style quantization (quality
           100 scales every table entry to 1 for near-lossless
           roundtrips), standard Huffman tables written as DHT
           segments, byte stuffing, optional restart intervals.

Self-consistency over conformance: the decoder reads the quant and
Huffman tables FROM THE STREAM (as every JPEG decoder must), so the
pytest roundtrips (tests/test_jpeg.py) verify the pair end-to-end
bit-for-bit through the entropy layer and within IDCT rounding of the
pixels; the zigzag order is generated, not transcribed.  Progressive
(SOF2) and arithmetic-coded streams raise ``NotImplementedError`` —
contained per-row by ``DECODE_ERRORS`` like every other decoder here.

Generalizes the reference's binary-content processors (thumbnail
generation, app/processors/preview_file_processor.py:17-62) one
format further: `multimodal.thumbnails()` / `image_info()` /
`image_features()` accept real JPEG blobs through the same
magic-byte dispatch as PNG/BMP.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Constants (ITU-T T.81 Annex K reference tables; self-consistent even if
# they differed — the decoder always reads tables from the stream)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Huffman table specs: (BITS counts for code lengths 1..16, symbol values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


def _zigzag_order() -> np.ndarray:
    """Row-major indices of the 8x8 block in JPEG zigzag order,
    generated from the diagonal-walk definition (odd anti-diagonals
    walk row-increasing, even ones row-decreasing)."""
    out = []
    for s in range(15):
        rows = range(max(0, s - 7), min(s, 7) + 1)
        for r in (rows if s % 2 == 1 else reversed(list(rows))):
            out.append(r * 8 + (s - r))
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag_order()          # zz position -> row-major index
UNZIGZAG = np.argsort(ZIGZAG)     # row-major index -> zz position


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix C: spectrum = C @ f @ C.T."""
    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c


_DCT = _dct_matrix()


def _idct_blocks(coef: np.ndarray) -> np.ndarray:
    """Vectorized 2-D IDCT of an (n, 8, 8) coefficient stack."""
    return np.einsum("kn,bkl,lm->bnm", _DCT, coef, _DCT, optimize=True)


def _dct_blocks(pix: np.ndarray) -> np.ndarray:
    """Vectorized 2-D DCT of an (n, 8, 8) pixel stack."""
    return np.einsum("nk,bkl,ml->bnm", _DCT, pix, _DCT, optimize=True)


def _build_huff(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(code length, code) -> symbol map per T.81 C.2 canonical codes."""
    if sum(bits) != len(vals):
        raise ValueError("huffman BITS/HUFFVAL length mismatch")
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), the encoder-side view of _build_huff."""
    return {sym: (code, length)
            for (length, code), sym in _build_huff(bits, vals).items()}


# ---------------------------------------------------------------------------
# Bit I/O

class _BitReader:
    """MSB-first reader over one unstuffed entropy segment."""

    __slots__ = ("buf", "pos", "nbits")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.nbits = 8 * len(buf)

    def bit(self) -> int:
        if self.pos >= self.nbits:
            raise ValueError("JPEG entropy stream truncated")
        b = (self.buf[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


class _BitWriter:
    """MSB-first writer with 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.n -= 8
            self.acc &= (1 << self.n) - 1
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per T.81


def _extend(v: int, n: int) -> int:
    """T.81 EXTEND: map n received bits to the signed coefficient."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# Decoder

def _split_entropy(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Collect entropy-coded segments from SOS data start to the next
    non-RST marker: unstuff 0xFF00, split at RST0-7.  Returns the
    segments and the position of the terminating marker's 0xFF."""
    segs: list[bytes] = []
    cur = bytearray()
    i = pos
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn: segment boundary
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a baseline JPEG to (width, height, channels, uint8 array
    of shape (h, w) or (h, w, 3)).  Raises ValueError on corrupt input
    and NotImplementedError on progressive/arithmetic streams."""
    try:
        return _decode_jpeg(data)
    except (IndexError, struct.error) as exc:  # truncated stream
        raise ValueError(f"JPEG stream truncated: {exc}") from exc
    except OverflowError as exc:  # corrupt-stream DC drift past int32
        raise ValueError(f"JPEG coefficients out of range: {exc}") from exc


def _decode_jpeg(data: bytes) -> tuple[int, int, int, np.ndarray]:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    hufftables: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    comps: list[dict] = []
    w = h = 0
    dri = 0
    progressive = False
    store: list[np.ndarray] | None = None  # progressive coefficient state
    hmax = vmax = mcux = mcuy = 0
    pos = 2
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline/extended-sequential/progressive "
                "huffman JPEG supported"
            )
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4: pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq:  # 16-bit table
                    tbl = np.frombuffer(body, ">u2", 64, i + 1).astype(np.int32)
                    i += 1 + 128
                else:
                    tbl = np.frombuffer(body, np.uint8, 64, i + 1).astype(np.int32)
                    i += 1 + 64
                q = np.zeros(64, np.int32)
                q[ZIGZAG] = tbl
                qtables[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1: i + 17])
                nval = sum(bits)
                vals = list(body[i + 17: i + 17 + nval])
                hufftables[(tc, th)] = _build_huff(bits, vals)
                i += 17 + nval
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1/SOF2
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * ci)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for ci in range(ns):
                cid, tt = struct.unpack_from(">BB", body, 1 + 2 * ci)
                matches = [c for c in comps if c["id"] == cid]
                if not matches:  # corrupt id must not escape containment
                    raise ValueError(f"SOS references unknown component {cid}")
                comp = matches[0]
                scan.append((comp, tt >> 4, tt & 0x0F))
            if not progressive:
                segs, pos = _split_entropy(data, pos + 2 + seglen)
                return _decode_scan(scan, segs, hufftables, qtables, w, h, dri)
            if store is None:  # allocate frame-wide coefficient state
                if not comps or w == 0 or h == 0:
                    raise ValueError("JPEG frame header missing or empty")
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                if hmax < 1 or vmax < 1:
                    raise ValueError("bad sampling factors")
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                for c in comps:
                    # true (non-MCU-padded) block dims: non-interleaved
                    # scans walk these, per T.81 A.2.2
                    cw = -(-(w * c["h"]) // hmax)
                    chh = -(-(h * c["v"]) // vmax)
                    c["bw"] = -(-cw // 8)
                    c["bh"] = -(-chh // 8)
                store = [
                    np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32)
                    for c in comps
                ]
            if len(body) < 4 + 2 * ns:
                raise ValueError("JPEG SOS header truncated")
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            segs, pos = _split_entropy(data, pos + 2 + seglen)
            _decode_prog_scan(
                [(comps.index(c), c, tdc, tac) for c, tdc, tac in scan],
                segs, hufftables, store, dri, ss, se, ah, al, mcux, mcuy,
            )
            continue  # pos already sits at the terminating marker
        pos += 2 + seglen
    if store is not None:
        return _reconstruct(comps, store, qtables, w, h, hmax, vmax)
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(scan, segs, hufftables, qtables, w, h, dri):
    if not scan or w == 0 or h == 0:
        raise ValueError("JPEG frame header missing or empty")
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    if hmax < 1 or vmax < 1:
        raise ValueError("bad sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy
    # per-component zigzag coefficient store, MCU-interleaved order
    store = []
    for comp, _, _ in scan:
        bx, by = mcux * comp["h"], mcuy * comp["v"]
        store.append(np.zeros((by, bx, 64), np.int32))

    mcu = 0
    pred = [0] * len(scan)
    for seg in segs:
        br = _BitReader(seg)
        end = min(n_mcu, mcu + dri) if dri else n_mcu
        while mcu < end:
            my, mx = divmod(mcu, mcux)
            for si, (comp, tdc, tac) in enumerate(scan):
                dc_tbl = hufftables.get((0, tdc))
                ac_tbl = hufftables.get((1, tac))
                if dc_tbl is None or ac_tbl is None:
                    raise ValueError("scan references missing huffman table")
                for blk in range(comp["v"] * comp["h"]):
                    dy, dx = divmod(blk, comp["h"])
                    zz = store[si][my * comp["v"] + dy, mx * comp["h"] + dx]
                    # DC — category > 15 only occurs in corrupt streams
                    # (stream-supplied tables can map to any byte) and
                    # would overflow the int32 store below
                    s = _huff_sym(br, dc_tbl)
                    if s > 15:
                        raise ValueError("bad DC category in JPEG stream")
                    pred[si] += _extend(br.bits(s), s)
                    zz[0] = pred[si]
                    # AC
                    k = 1
                    while k < 64:
                        rs = _huff_sym(br, ac_tbl)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC coefficient run overflow")
                        zz[k] = _extend(br.bits(s), s)
                        k += 1
            mcu += 1
        pred = [0] * len(scan)  # restart interval resets DC prediction
    if mcu < n_mcu:
        raise ValueError("JPEG scan ended early")
    return _reconstruct(
        [c for c, _, _ in scan], store, qtables, w, h, hmax, vmax
    )


def _reconstruct(comps, store, qtables, w, h, hmax, vmax):
    """Dequantize + IDCT the per-component zigzag stores, upsample to
    frame resolution, and color-convert.  Shared by the baseline
    single-scan path and the progressive multi-scan accumulator."""
    planes = []
    for si, comp in enumerate(comps):
        q = qtables.get(comp["tq"])
        if q is None:
            raise ValueError("frame references missing quant table")
        by, bx, _ = store[si].shape
        coef = np.zeros((by * bx, 64), np.float64)
        coef[:, ZIGZAG] = store[si].reshape(-1, 64)
        coef = coef.reshape(-1, 8, 8) * q
        pix = _idct_blocks(coef) + 128.0
        plane = (
            pix.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        # upsample to frame resolution, crop to (h, w)
        plane = plane.repeat(vmax // comp["v"], 0).repeat(hmax // comp["h"], 1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        gray = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, gray
    if len(planes) != 3:
        raise NotImplementedError("only 1- or 3-component JPEG supported")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr,
         y - 0.344136 * cb - 0.714136 * cr,
         y + 1.772 * cb],
        axis=-1,
    )
    return w, h, 3, np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _huff_sym(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in JPEG stream")


# ---------------------------------------------------------------------------
# Progressive decoder (T.81 G.2): each SOS carries one piece of the
# coefficient picture — a spectral band (ss..se) at one bit-plane
# precision (successive approximation ah -> al) — accumulated into the
# frame-wide per-component zigzag stores until EOI.

def _decode_prog_scan(scan, segs, hufftables, store, dri,
                      ss, se, ah, al, mcux, mcuy):
    """Decode one progressive scan in place.  ``scan`` is a list of
    (frame comp index, comp dict, tdc, tac)."""
    if se > 63 or ss > se:
        raise ValueError("bad spectral selection")
    if ss == 0:
        if se != 0:
            raise ValueError("progressive scan mixes DC and AC bands")
        _decode_prog_dc(scan, segs, hufftables, store, dri, ah, al,
                        mcux, mcuy)
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        _decode_prog_ac(scan[0], segs, hufftables, store, dri,
                        ss, se, ah, al)


def _decode_prog_dc(scan, segs, hufftables, store, dri, ah, al, mcux, mcuy):
    interleaved = len(scan) > 1
    if interleaved:
        n_units = mcux * mcuy
    else:
        _, comp0, _, _ = scan[0]
        n_units = comp0["bw"] * comp0["bh"]
    unit = 0
    pred = [0] * len(scan)
    for seg in segs:
        br = _BitReader(seg)
        end = min(n_units, unit + dri) if dri else n_units
        while unit < end:
            if interleaved:
                my, mx = divmod(unit, mcux)
                for si, (ci, comp, tdc, _) in enumerate(scan):
                    for blk in range(comp["v"] * comp["h"]):
                        dy, dx = divmod(blk, comp["h"])
                        zz = store[ci][my * comp["v"] + dy,
                                       mx * comp["h"] + dx]
                        _dc_unit(br, hufftables, tdc, zz, ah, al, pred, si)
            else:
                ci, comp, tdc, _ = scan[0]
                by, bx = divmod(unit, comp["bw"])
                _dc_unit(br, hufftables, tdc, store[ci][by, bx],
                         ah, al, pred, 0)
            unit += 1
        pred = [0] * len(scan)  # restart resets DC prediction
    if unit < n_units:
        raise ValueError("JPEG scan ended early")


def _dc_unit(br, hufftables, tdc, zz, ah, al, pred, si):
    if ah == 0:  # first DC scan: DPCM on the point-transformed value
        tbl = hufftables.get((0, tdc))
        if tbl is None:
            raise ValueError("scan references missing huffman table")
        s = _huff_sym(br, tbl)
        if s > 15:
            raise ValueError("bad DC category in JPEG stream")
        pred[si] += _extend(br.bits(s), s)
        zz[0] = pred[si] << al
    elif br.bit():  # refinement: one correction bit per block
        zz[0] |= 1 << al


def _decode_prog_ac(scan_entry, segs, hufftables, store, dri, ss, se, ah, al):
    ci, comp, _, tac = scan_entry
    tbl = hufftables.get((1, tac))
    if tbl is None:
        raise ValueError("scan references missing huffman table")
    n_units = comp["bw"] * comp["bh"]
    unit = 0
    for seg in segs:
        br = _BitReader(seg)
        eobrun = 0  # EOB runs cannot cross restart boundaries
        end = min(n_units, unit + dri) if dri else n_units
        while unit < end:
            by, bx = divmod(unit, comp["bw"])
            zz = store[ci][by, bx]
            if ah == 0:
                eobrun = _ac_first_block(br, tbl, zz, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(br, tbl, zz, ss, se, al, eobrun)
            unit += 1
    if unit < n_units:
        raise ValueError("JPEG scan ended early")


def _ac_first_block(br, tbl, zz, ss, se, al, eobrun):
    """First AC scan for one block (T.81 G.1.2.2): zero-run/size
    symbols like baseline, plus EOBn symbols carrying a run of
    all-zero-band blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_sym(br, tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.bits(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("AC coefficient run overflow")
        zz[k] = _extend(br.bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(br, tbl, zz, ss, se, al, eobrun):
    """AC refinement for one block (T.81 G.1.2.3): newly-nonzero
    coefficients arrive as ±2^al; every already-nonzero coefficient
    passed over consumes one correction bit."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_sym(br, tbl)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:  # EOBn: rest of block is corrections only
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                # r == 15 (ZRL): pass over 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad AC refinement magnitude")
                val = p1 if br.bit() else m1
            while k <= se:
                cur = int(zz[k])
                if cur != 0:
                    if br.bit() and (cur & p1) == 0:
                        zz[k] = cur + (p1 if cur >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # corrections for the EOB-covered remainder
            cur = int(zz[k])
            if cur != 0:
                if br.bit() and (cur & p1) == 0:
                    zz[k] = cur + (p1 if cur >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


# ---------------------------------------------------------------------------
# Encoder

def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling; quality=100 -> all-ones table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _plane_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad a 2-D plane to 8x8 multiples by edge replication and return
    (blocks (n,8,8) float64 level-shifted, blocks_y, blocks_x)."""
    ph, pw = plane.shape
    by, bx = -(-ph // 8), -(-pw // 8)
    padded = np.pad(plane.astype(np.float64),
                    ((0, by * 8 - ph), (0, bx * 8 - pw)), mode="edge")
    blocks = (
        padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    return blocks - 128.0, by, bx


def _encode_blocks(zz_all: np.ndarray, writer: _BitWriter, pred: int,
                   dc_codes: dict, ac_codes: dict) -> int:
    """Huffman-encode one component's block (zigzag coeffs) sequence."""
    for zz in zz_all:
        dc = int(zz[0])
        diff = dc - pred
        pred = dc
        s = _category(diff)
        code, length = dc_codes[s]
        writer.write(code, length)
        if s:
            writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
        for k in range(1, last_nz + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            s = _category(v)
            code, length = ac_codes[(run << 4) | s]
            writer.write(code, length)
            writer.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            code, length = ac_codes[0x00]  # EOB
            writer.write(code, length)
    return pred


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode (h, w[, 1|3]) uint8 pixels as a baseline or progressive
    JPEG.

    quality 1-100 scales the Annex-K quant tables (100 -> all ones);
    subsample=True uses 4:2:0 chroma (2x2 box mean), else 4:4:4;
    restart_interval > 0 writes DRI + RSTn markers every that many
    MCUs — or, in progressive non-interleaved scans, every that many
    blocks (exercises the decoder's restart paths).
    progressive=True writes SOF2 with a libjpeg-style scan script
    (spectral selection + successive approximation); both encodings
    quantize identically, so they decode to byte-identical pixels.
    EOB runs are capped at one block so the standard Annex-K Huffman
    tables (which lack the EOB2..EOB14 symbols) stay sufficient."""
    arr = np.asarray(arr)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    if arr.ndim not in (2, 3) or (arr.ndim == 3 and arr.shape[2] != 3):
        raise ValueError("encode_jpeg wants (h,w), (h,w,1) or (h,w,3)")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    gray = arr.ndim == 2

    qy = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)

    if gray:
        planes = [arr.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        f = arr.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # 2x2 box mean after padding odd dims by edge replication
            cb = np.pad(cb, ((0, h % 2), (0, w % 2)), mode="edge")
            cr = np.pad(cr, ((0, h % 2), (0, w % 2)), mode="edge")
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component quantized zigzag blocks in raster order
    comp_zz: list[np.ndarray] = []
    comp_bx: list[int] = []
    for plane, (sh, sv), qi in zip(planes, samp, qsel):
        # pad the plane so its block grid covers the full MCU grid
        need_h, need_w = mcuy * sv * 8, mcux * sh * 8
        ph, pw = plane.shape
        plane = np.pad(plane, ((0, need_h - ph), (0, need_w - pw)), mode="edge")
        blocks, by, bx = _plane_blocks(plane)
        q = qy if qi == 0 else qc
        coef = _dct_blocks(blocks) / q
        coef = np.sign(coef) * np.floor(np.abs(coef) + 0.5)  # round half away
        zz = coef.astype(np.int32).reshape(-1, 64)[:, ZIGZAG]
        comp_zz.append(zz.reshape(by, bx, 64))
        comp_bx.append(bx)

    dc_specs = [_DC_LUMA, _DC_CHROMA]
    ac_specs = [_AC_LUMA, _AC_CHROMA]
    dc_codes = [_huff_codes(*s) for s in dc_specs]
    ac_codes = [_huff_codes(*s) for s in ac_specs]

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)

    def seg(marker: int, body: bytes) -> None:
        out.extend((0xFF, marker))
        out.extend(struct.pack(">H", len(body) + 2) + body)

    for tq, q in ([(0, qy)] if gray else [(0, qy), (1, qc)]):
        seg(0xDB, bytes([tq]) + bytes(q.reshape(-1)[ZIGZAG].astype(np.uint8)))

    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += struct.pack(
            ">BBB", ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]
        )
    seg(0xC2 if progressive else 0xC0, sof)

    used = [0] if gray else [0, 1]
    for ti in used:
        bits, vals = dc_specs[ti]
        seg(0xC4, bytes([ti]) + bytes(bits) + bytes(vals))
        bits, vals = ac_specs[ti]
        seg(0xC4, bytes([0x10 | ti]) + bytes(bits) + bytes(vals))

    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))

    if progressive:
        true_dims = []
        for sh, sv in samp:
            cw = -(-(w * sh) // hmax)
            chh = -(-(h * sv) // vmax)
            true_dims.append((-(-cw // 8), -(-chh // 8)))
        for comps_idx, ss, se_, ah, al in _prog_scan_script(nc):
            sos = bytes([len(comps_idx)])
            for ci in comps_idx:
                ti = 0 if ci == 0 else 1
                sos += bytes([ci + 1, (ti << 4) | ti])
            sos += bytes([ss, se_, (ah << 4) | al])
            seg(0xDA, sos)
            if ss == 0:
                _enc_dc_scan(out, comp_zz, comps_idx, samp, ah, al,
                             dc_codes, restart_interval, mcux, mcuy,
                             true_dims)
            else:
                _enc_ac_scan(out, comp_zz, comps_idx[0], ss, se_, ah, al,
                             ac_codes, restart_interval, true_dims)
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    sos = bytes([nc])
    for ci in range(nc):
        ti = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (ti << 4) | ti])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    writer = _BitWriter()
    pred = [0] * nc
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            writer.flush()
            out += writer.out
            writer = _BitWriter()
            out.extend((0xFF, 0xD0 + (rst & 7)))
            rst += 1
            pred = [0] * nc
        my, mx = divmod(mcu, mcux)
        for ci in range(nc):
            sh, sv = samp[ci]
            ti = 0 if ci == 0 else 1
            zz_blocks = [
                comp_zz[ci][my * sv + dy, mx * sh + dx]
                for dy in range(sv) for dx in range(sh)
            ]
            pred[ci] = _encode_blocks(
                np.array(zz_blocks), writer, pred[ci],
                dc_codes[ti], ac_codes[ti],
            )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (T.81 Annex G forward path)

def _prog_scan_script(nc: int):
    """libjpeg-style scan script: (component indices, ss, se, ah, al).
    DC first at al=1 then refined; luma AC split into a low band
    (1..5) and the rest, approximated at al=2 and refined twice;
    chroma AC at al=1 refined once."""
    if nc == 1:
        return [
            ((0,), 0, 0, 0, 1),
            ((0,), 1, 5, 0, 2), ((0,), 6, 63, 0, 2),
            ((0,), 1, 63, 2, 1),
            ((0,), 0, 0, 1, 0),
            ((0,), 1, 63, 1, 0),
        ]
    return [
        ((0, 1, 2), 0, 0, 0, 1),
        ((0,), 1, 5, 0, 2), ((2,), 1, 63, 0, 1), ((1,), 1, 63, 0, 1),
        ((0,), 6, 63, 0, 2), ((0,), 1, 63, 2, 1),
        ((0, 1, 2), 0, 0, 1, 0),
        ((2,), 1, 63, 1, 0), ((1,), 1, 63, 1, 0), ((0,), 1, 63, 1, 0),
    ]


def _enc_dc_scan(out, comp_zz, comps_idx, samp, ah, al, dc_codes,
                 restart, mcux, mcuy, true_dims):
    """DC scan: MCU-interleaved when multi-component, block-raster over
    the component's true grid otherwise.  ah=0 -> DPCM of the
    arithmetically-shifted value; ah>0 -> one correction bit/block."""
    interleaved = len(comps_idx) > 1
    if interleaved:
        n_units = mcux * mcuy
    else:
        bw, bh = true_dims[comps_idx[0]]
        n_units = bw * bh
    writer = _BitWriter()
    pred = {ci: 0 for ci in comps_idx}
    rst = 0
    for u in range(n_units):
        if restart and u and u % restart == 0:
            writer.flush()
            out += writer.out
            writer = _BitWriter()
            out.extend((0xFF, 0xD0 + (rst & 7)))
            rst += 1
            pred = {ci: 0 for ci in comps_idx}
        if interleaved:
            my, mx = divmod(u, mcux)
            for ci in comps_idx:
                sh, sv = samp[ci]
                codes = dc_codes[0 if ci == 0 else 1]
                for dy in range(sv):
                    for dx in range(sh):
                        dc = int(comp_zz[ci][my * sv + dy, mx * sh + dx, 0])
                        _emit_dc_unit(writer, dc, ah, al, pred, ci, codes)
        else:
            ci = comps_idx[0]
            bw, _ = true_dims[ci]
            by, bx = divmod(u, bw)
            _emit_dc_unit(writer, int(comp_zz[ci][by, bx, 0]), ah, al,
                          pred, ci, dc_codes[0 if ci == 0 else 1])
    writer.flush()
    out += writer.out


def _emit_dc_unit(writer, dc, ah, al, pred, ci, codes):
    if ah:  # refinement: bit al of the two's-complement value
        writer.write((dc >> al) & 1, 1)
        return
    t = dc >> al  # arithmetic shift per T.81 G.1.2.1
    diff = t - pred[ci]
    pred[ci] = t
    s = _category(diff)
    code, length = codes[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _enc_ac_scan(out, comp_zz, ci, ss, se, ah, al, ac_codes, restart,
                 true_dims):
    """Single-component AC scan over the true block grid, restart
    every ``restart`` blocks.  EOB runs are deliberately capped at one
    block (standard tables lack EOB2..EOB14)."""
    bw, bh = true_dims[ci]
    codes = ac_codes[0 if ci == 0 else 1]
    writer = _BitWriter()
    rst = 0
    for u in range(bw * bh):
        if restart and u and u % restart == 0:
            writer.flush()
            out += writer.out
            writer = _BitWriter()
            out.extend((0xFF, 0xD0 + (rst & 7)))
            rst += 1
        by, bx = divmod(u, bw)
        zz = comp_zz[ci][by, bx]
        if ah == 0:
            _emit_ac_first(writer, zz, ss, se, al, codes)
        else:
            _emit_ac_refine(writer, zz, ss, se, al, codes)
    writer.flush()
    out += writer.out


def _emit_ac_first(writer, zz, ss, se, al, codes):
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al  # magnitude shift per T.81 G.1.2.2
        if t == 0:
            r += 1
            continue
        while r > 15:
            code, length = codes[0xF0]  # ZRL
            writer.write(code, length)
            r -= 16
        s = t.bit_length()
        code, length = codes[(r << 4) | s]
        writer.write(code, length)
        vt = t if v >= 0 else -t
        writer.write(vt if vt >= 0 else vt + (1 << s) - 1, s)
        r = 0
    if r > 0:
        code, length = codes[0x00]  # EOB (run of exactly one block)
        writer.write(code, length)


def _emit_ac_refine(writer, zz, ss, se, al, codes):
    """Mirror of _ac_refine_block: ZRLs only where they cannot fold
    into the block-final EOB; correction bits buffered until the next
    symbol they belong to (T.81 figure G.7 / libjpeg AC-refine)."""
    p1 = 1 << al
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = 0  # position of the last newly-nonzero coefficient
    for i, t in enumerate(absv):
        if t == 1:
            eob = ss + i
    r = 0
    pending: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            code, length = codes[0xF0]  # ZRL
            writer.write(code, length)
            for b in pending:
                writer.write(b, 1)
            pending = []
            r -= 16
        if t > 1:  # already nonzero: just a correction bit
            pending.append(t & 1)
            continue
        code, length = codes[(r << 4) | 1]
        writer.write(code, length)
        writer.write(1 if int(zz[k]) >= 0 else 0, 1)
        for b in pending:
            writer.write(b, 1)
        pending = []
        r = 0
    if r > 0 or pending:
        code, length = codes[0x00]  # EOB carrying trailing corrections
        writer.write(code, length)
        for b in pending:
            writer.write(b, 1)
