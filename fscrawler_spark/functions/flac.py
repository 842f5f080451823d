"""FLAC codec, stdlib+numpy only — lossless compressed audio for the
multimodal column stack (the audio analog of the PNG/GIF/JPEG codecs).

FLAC is the one mainstream COMPRESSED audio format a from-scratch
sandbox build can implement honestly: its entropy layer (Rice/unary
codes) and predictors (fixed polynomial + quantized LPC) are purely
algorithmic, with no spec constant tables to transcribe — unlike
MP3/AAC, whose huffman/synthesis-window tables cannot be verified here
against any reference.  Lossless means the pytest roundtrips are
EXACT sample equality.

  decode — fLaC magic + STREAMINFO (other metadata blocks skipped),
           frame sync + header (common block-size/sample-rate/bps
           codes, UTF-8-coded frame number, CRC-8 verified), subframes
           CONSTANT / VERBATIM / FIXED 0-4 / LPC (any order), wasted
           bits, Rice residuals (4- and 5-bit parameters, partition
           orders, escape-to-raw partitions), stereo decorrelation
           (left-side / right-side / mid-side), frame CRC-16 verified,
           MD5 of the decoded PCM checked against STREAMINFO when set.
  encode — fixed-blocking frames; per-block best fixed predictor
           (order 0-4 by residual magnitude) or quantized LPC via
           autocorrelation + Levinson-Durbin (lpc_order > 0), Rice
           parameter fit, wasted-bits detection, optional stereo
           decorrelation mode, STREAMINFO with the real PCM MD5.

Corrupt streams raise ValueError (CRC mismatches included), contained
by multimodal.AUDIO_DECODE_ERRORS like every other decoder here.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


# ---------------------------------------------------------------------------
# CRCs (the two standard FLAC polynomials; self-consistent pair anyway)

def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


# ---------------------------------------------------------------------------
# Bit I/O (MSB-first, unlike GIF's LSB-first LZW)

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def getvalue(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


class _BitReader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos_bits: int = 0):
        self.buf = buf
        self.pos = pos_bits

    def read(self, nbits: int) -> int:
        end = self.pos + nbits
        if end > 8 * len(self.buf):
            raise ValueError("FLAC stream truncated")
        v = 0
        pos = self.pos
        while nbits > 0:
            byte = self.buf[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, nbits)
            shift = avail - take
            v = (v << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            nbits -= take
        self.pos = pos
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >> (nbits - 1) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.read(1):
                return q
            q += 1
            if q > 1 << 24:
                raise ValueError("runaway unary code in FLAC stream")

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


# ---------------------------------------------------------------------------
# UTF-8-style coded numbers (frame header)

def _utf8_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _utf8_decode(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad UTF-8 coded number in FLAC frame")
    v = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = br.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("bad UTF-8 continuation in FLAC frame")
        v = (v << 6) | (b & 0x3F)
    return v


def _zigzag(r: np.ndarray) -> np.ndarray:
    return np.where(r >= 0, r << 1, (-r << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if not (u & 1) else -((u + 1) >> 1)


# ---------------------------------------------------------------------------
# Decoder

_BLOCKSIZE_BASE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                   8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                   13: 8192, 14: 16384, 15: 32768}
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}


def decode_flac(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a FLAC stream to (sample_rate, samples) where samples is
    int32 of shape (n,) mono or (n, channels).  Raises ValueError on
    corruption (bad sync, CRC mismatch, malformed codes)."""
    try:
        return _decode_flac(data)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"FLAC stream truncated: {exc}") from exc


def _decode_flac(data: bytes) -> tuple[int, np.ndarray]:
    if data[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC stream (bad magic)")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("FLAC metadata truncated")
        hdr = data[pos]
        length = int.from_bytes(data[pos + 1: pos + 4], "big")
        body = data[pos + 4: pos + 4 + length]
        if (hdr & 0x7F) == 0:  # STREAMINFO
            if length < 34:
                raise ValueError("FLAC STREAMINFO too short")
            br = _BitReader(body)
            br.read(16)  # min blocksize
            br.read(16)  # max blocksize
            br.read(24)  # min framesize
            br.read(24)  # max framesize
            sr = br.read(20)
            nch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            md5 = body[18:34]
            info = (sr, nch, bps, total, md5)
        pos += 4 + length
        if hdr & 0x80:  # last metadata block
            break
    if info is None:
        raise ValueError("FLAC has no STREAMINFO")
    sr, nch, bps, total, md5 = info
    if sr == 0 or nch < 1:
        raise ValueError("FLAC STREAMINFO invalid")

    chans: list[list[np.ndarray]] = [[] for _ in range(nch)]
    n_read = 0
    while pos < len(data) and (total == 0 or n_read < total):
        frame_start = pos
        br = _BitReader(data, 8 * pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("bad FLAC frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy (number semantics only)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)  # reserved
        _num = _utf8_decode(br)
        if bs_code == 0:
            raise ValueError("reserved FLAC block-size code")
        elif bs_code == 6:
            bsize = br.read(8) + 1
        elif bs_code == 7:
            bsize = br.read(16) + 1
        else:
            bsize = _BLOCKSIZE_BASE[bs_code]
        if sr_code == 0:
            fsr = sr
        elif sr_code == 12:
            fsr = br.read(8) * 1000
        elif sr_code == 13:
            fsr = br.read(16)
        elif sr_code == 14:
            fsr = br.read(16) * 10
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample-rate code")
        else:  # table codes: accept, frame rate == stream rate expected
            fsr = sr
        if bps_code == 0:
            fbps = bps
        elif bps_code in _BPS_CODES:
            fbps = _BPS_CODES[bps_code]
        else:
            raise ValueError("reserved FLAC bps code")
        hdr_bytes = data[frame_start: br.pos >> 3]
        if br.pos & 7:
            raise ValueError("FLAC frame header not byte aligned")
        crc8 = br.read(8)
        if _crc8(hdr_bytes) != crc8:
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code < 8:
            fch = ch_code + 1
            assignment = "indep"
        elif ch_code == 8:
            fch, assignment = 2, "left_side"
        elif ch_code == 9:
            fch, assignment = 2, "right_side"
        elif ch_code == 10:
            fch, assignment = 2, "mid_side"
        else:
            raise ValueError("reserved FLAC channel assignment")
        if fch != nch:
            raise ValueError("FLAC frame channel count != STREAMINFO")

        sub = []
        for ci in range(fch):
            cbps = fbps
            if assignment == "left_side" and ci == 1:
                cbps += 1
            elif assignment == "right_side" and ci == 0:
                cbps += 1
            elif assignment == "mid_side" and ci == 1:
                cbps += 1
            sub.append(_read_subframe(br, bsize, cbps))

        br.align()
        crc16 = br.read(16)
        if _crc16(data[frame_start: (br.pos >> 3) - 2]) != crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = br.pos >> 3

        if assignment == "indep":
            frame_ch = sub
        elif assignment == "left_side":
            left, side = sub
            frame_ch = [left, left - side]
        elif assignment == "right_side":
            side, right = sub
            frame_ch = [side + right, right]
        else:  # mid_side
            mid, side = sub
            m2 = (mid.astype(np.int64) << 1) | (side & 1)
            frame_ch = [((m2 + side) >> 1).astype(np.int64),
                        ((m2 - side) >> 1).astype(np.int64)]
        for ci in range(nch):
            chans[ci].append(frame_ch[ci].astype(np.int64))
        n_read += bsize

    if n_read == 0:
        raise ValueError("FLAC contains no audio frames")
    if total and n_read < total:
        # must not silently return short audio when the MD5 field is
        # unset (all zeros = "unknown") and cannot catch it
        raise ValueError(
            f"FLAC stream ends after {n_read} of {total} samples"
        )
    out = np.stack([np.concatenate(c) for c in chans], axis=-1)
    if total:
        out = out[:total]
    if md5 != b"\x00" * 16:
        if _pcm_md5(out, bps) != md5:
            raise ValueError("FLAC PCM MD5 mismatch")
    if nch == 1:
        out = out[:, 0]
    return sr, out.astype(np.int32)


def _read_subframe(br: _BitReader, bsize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("bad FLAC subframe padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        v = br.read_signed(bps)
        out = np.full(bsize, v, np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([br.read_signed(bps) for _ in range(bsize)], np.int64)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = np.array([br.read_signed(bps) for _ in range(order)], np.int64)
        resid = _read_residual(br, bsize, order)
        out = _undiff(warm, resid, order)
    elif stype >= 32:  # LPC
        order = (stype & 0x1F) + 1
        warm = np.array([br.read_signed(bps) for _ in range(order)], np.int64)
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _read_residual(br, bsize, order)
        out = np.empty(bsize, np.int64)
        out[:order] = warm
        for i in range(order, bsize):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * out[i - 1 - j]
            out[i] = resid[i - order] + (pred >> shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        out = out << wasted
    return out


def _read_residual(br: _BitReader, bsize: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if bsize % nparts:
        raise ValueError("FLAC partition order does not divide block")
    out = np.empty(bsize - order, np.int64)
    at = 0
    for p in range(nparts):
        n = (bsize >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC partition smaller than predictor order")
        k = br.read(pbits)
        if k == escape:
            raw_bits = br.read(5)
            for i in range(n):
                out[at + i] = br.read_signed(raw_bits) if raw_bits else 0
        else:
            for i in range(n):
                q = br.read_unary()
                u = (q << k) | br.read(k)
                out[at + i] = _unzigzag(u)
        at += n
    return out


def _undiff(warm: np.ndarray, resid: np.ndarray, order: int) -> np.ndarray:
    """Invert order-k polynomial differencing given k warmup samples —
    k cumulative sums instead of a per-sample Python loop."""
    if order == 0:
        return resid.copy()
    seq = resid.astype(np.int64)
    for lvl in range(order, 0, -1):
        d = warm.astype(np.int64)
        for _ in range(lvl - 1):
            d = np.diff(d)
        seq = d[-1] + np.cumsum(seq)
    return np.concatenate([warm, seq])


def _pcm_md5(samples_2d: np.ndarray, bps: int) -> bytes:
    """MD5 of the interleaved little-endian PCM, as STREAMINFO defines."""
    nbytes = (bps + 7) // 8
    flat = samples_2d.astype(np.int64).reshape(-1)
    if nbytes == 1:
        raw = (flat & 0xFF).astype(np.uint8).tobytes()
    elif nbytes == 2:
        raw = flat.astype("<i2").tobytes()
    elif nbytes == 3:
        as4 = flat.astype("<i4").tobytes()
        b = np.frombuffer(as4, np.uint8).reshape(-1, 4)
        raw = b[:, :3].tobytes()
    else:
        raw = flat.astype("<i4").tobytes()
    return hashlib.md5(raw).digest()


# ---------------------------------------------------------------------------
# Encoder

def _best_fixed_order(x: np.ndarray, max_order: int = 4) -> int:
    best, best_cost = 0, None
    d = x.astype(np.int64)
    for order in range(max_order + 1):
        if order > 0:
            if len(d) < 2:
                break
            d = np.diff(d)
        cost = int(np.abs(d).sum())
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
    return best


def _rice_k(resid: np.ndarray) -> int:
    if len(resid) == 0:
        return 0
    mean = float(np.abs(resid).mean())
    k = 0
    while (1 << k) < mean and k < 14:
        k += 1
    return k


def _write_residual(bw: _BitWriter, resid: np.ndarray, bps: int) -> None:
    """Partition order 0, Rice method 00 (4-bit parameter), falling
    back to the escape raw encoding when residuals are too wide."""
    bw.write(0, 2)   # method 00
    bw.write(0, 4)   # partition order 0
    k = _rice_k(resid)
    u = _zigzag(resid.astype(np.int64))
    # unary quotients must stay sane; escape to raw if k underfits
    if len(u) and int(u.max()) >> k > 1 << 16:
        bw.write(15, 4)  # escape
        width = int(max(2, np.ceil(np.log2(np.abs(resid).max() + 1)) + 1)) \
            if len(resid) else 2
        width = min(width, 31)
        bw.write(width, 5)
        for r in resid:
            bw.write(int(r), width)
        return
    bw.write(k, 4)
    for v in u:
        v = int(v)
        bw.write_unary(v >> k)
        bw.write(v, k)


def _levinson(acf: np.ndarray, order: int) -> np.ndarray | None:
    """Levinson-Durbin: LPC coefficients from autocorrelation."""
    err = acf[0]
    if err <= 0:
        return None
    a = np.zeros(order)
    for i in range(order):
        acc = acf[i + 1] - np.dot(a[:i], acf[i:0:-1][:i])
        k = acc / err
        new = a.copy()
        new[i] = k
        new[:i] = a[:i] - k * a[i - 1::-1][:i]
        a = new
        err *= (1 - k * k)
        if err <= 0:
            return None
    return a


def _write_subframe(bw: _BitWriter, x: np.ndarray, bps: int,
                    lpc_order: int) -> None:
    bw.write(0, 1)  # padding
    x = x.astype(np.int64)
    # wasted bits: shared low zero bits (only meaningful for nonzero data)
    wasted = 0
    if np.any(x):
        ors = int(np.bitwise_or.reduce(x))
        while not ors & 1:
            wasted += 1
            ors >>= 1
        if wasted:
            x = x >> wasted
            bps -= wasted

    def wasted_bits():
        if wasted:
            bw.write(1, 1)
            bw.write_unary(wasted - 1)
        else:
            bw.write(0, 1)

    if np.all(x == x[0]):
        bw.write(0, 6)  # CONSTANT
        wasted_bits()
        bw.write(int(x[0]), bps)
        return
    if lpc_order and len(x) > 2 * lpc_order:
        xs = x.astype(np.float64)
        acf = np.array([np.dot(xs[: len(xs) - i], xs[i:])
                        for i in range(lpc_order + 1)])
        a = _levinson(acf, lpc_order)
        if a is not None and np.all(np.isfinite(a)):
            prec = 12
            shift = 10
            qc = np.clip(np.round(a * (1 << shift)), -(1 << (prec - 1)),
                         (1 << (prec - 1)) - 1).astype(np.int64)
            if np.any(qc):
                order = lpc_order
                resid = np.empty(len(x) - order, np.int64)
                for i in range(order, len(x)):
                    pred = int(np.dot(qc, x[i - order: i][::-1]))
                    resid[i - order] = x[i] - (pred >> shift)
                bw.write(0x20 | (order - 1), 6)
                wasted_bits()
                for v in x[:order]:
                    bw.write(int(v), bps)
                bw.write(prec - 1, 4)
                bw.write(shift, 5)
                for c in qc:
                    bw.write(int(c), prec)
                _write_residual(bw, resid, bps)
                return
    order = _best_fixed_order(x)
    d = x.astype(np.int64)
    for _ in range(order):
        d = np.diff(d)
    bw.write(8 + order, 6)  # FIXED
    wasted_bits()
    for v in x[:order]:
        bw.write(int(v), bps)
    _write_residual(bw, d, bps)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int,
    bps: int = 16,
    block_size: int = 4096,
    channel_mode: str = "indep",
    lpc_order: int = 0,
) -> bytes:
    """Encode int PCM ((n,) mono or (n, ch)) as FLAC.  channel_mode for
    stereo input: 'indep', 'left_side', 'right_side' or 'mid_side'
    (all lossless).  lpc_order > 0 uses quantized LPC subframes;
    0 picks the best fixed predictor per block."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2 or x.shape[0] == 0:
        raise ValueError("samples must be (n,) or (n, channels), n > 0")
    n, nch = x.shape
    if channel_mode != "indep" and nch != 2:
        raise ValueError("stereo decorrelation needs exactly 2 channels")
    lim = 1 << (bps - 1)
    if int(x.max()) >= lim or int(x.min()) < -lim:
        raise ValueError(f"samples exceed {bps}-bit range")
    # header field widths are hard limits: silently masking an
    # oversized value would emit an undecodable stream
    if not 1 <= block_size <= 1 << 16:
        raise ValueError("FLAC block_size must be 1..65536 (16-bit field)")
    if not 1 <= sample_rate < 1 << 20:
        raise ValueError("FLAC sample_rate must fit STREAMINFO's 20 bits")
    if n >= 1 << 36:
        raise ValueError("FLAC total samples must fit STREAMINFO's 36 bits")
    x = x.astype(np.int64)

    out = bytearray(FLAC_MAGIC)
    info = _BitWriter()
    info.write(min(block_size, n), 16)
    info.write(block_size, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(nch - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    body = info.getvalue() + _pcm_md5(x, bps)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    for fi, start in enumerate(range(0, n, block_size)):
        blk = x[start: start + block_size]
        bsize = blk.shape[0]
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocking
        bw.write(7, 4)  # 16-bit block size at end of header
        bw.write(0, 4)  # sample rate from STREAMINFO
        if channel_mode == "indep":
            bw.write(nch - 1, 4)
            subs = [(blk[:, c], bps) for c in range(nch)]
        else:
            left = blk[:, 0]
            right = blk[:, 1]
            side = left - right
            if channel_mode == "left_side":
                bw.write(8, 4)
                subs = [(left, bps), (side, bps + 1)]
            elif channel_mode == "right_side":
                bw.write(9, 4)
                subs = [(side, bps + 1), (right, bps)]
            elif channel_mode == "mid_side":
                bw.write(10, 4)
                mid = (left + right) >> 1
                subs = [(mid, bps), (side, bps + 1)]
            else:
                raise ValueError(f"unknown channel_mode {channel_mode!r}")
        bw.write(0, 3)  # bps from STREAMINFO
        bw.write(0, 1)
        for b in _utf8_encode(fi):
            bw.write(b, 8)
        bw.write(bsize - 1, 16)
        bw.align()
        hdr = bw.getvalue()
        bw.write(_crc8(hdr), 8)
        for sdata, sbps in subs:
            _write_subframe(bw, sdata, sbps, lpc_order)
        bw.align()
        frame = bw.getvalue()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)
