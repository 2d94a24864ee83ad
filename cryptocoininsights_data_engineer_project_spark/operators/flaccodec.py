"""Stdlib+numpy FLAC decoder for the audio codec seam.

FLAC is the dominant lossless archival audio format (the xiph.org
spec, now RFC 9639) — WAV covers the raw/telephony shapes
(PCM/µ-law/A-law/ADPCM, operators/multimodal.py); an audio training
corpus's archival side arrives as FLAC. Like the JPEG/PNG/GIF
decoders this is REAL decode from the public spec with no codec
library: bit-level frame parsing, all four subframe types
(CONSTANT, VERBATIM, FIXED orders 0-4, LPC), Rice-coded residuals
with partitioning and the escape hatch, stereo decorrelation
(left/side, right/side, mid/side), wasted bits, and both frame
CRCs verified (CRC-8 header, CRC-16 frame).

The predictors are prefix-sum-shaped exactly like SOF3's (the FIXED
family is repeated integer differencing), so the decode cost is
linear and the corpus-scale parallelism comes from Spark rows (one
archive per row inside mapInPandas), not intra-file threading.

Verification: the spec pins every structure with CRCs, and FLAC is
lossless — so the independent encoder in tests/test_flac.py
round-trips arbitrary sample grids to EXACT equality through every
subframe type, stereo mode, partition order, and bit depth.
"""

from __future__ import annotations

import numpy as np


class FlacError(ValueError):
    """Malformed FLAC stream structure."""


def _crc8(data: bytes, crc: int = 0) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0 — the
    frame-header checksum."""
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _crc16(data: bytes, crc: int = 0) -> int:
    """CRC-16, polynomial 0x8005, init 0 — the whole-frame checksum."""
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                (crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1
            ) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader over bytes with byte-position tracking."""

    __slots__ = ("data", "byte", "bit")

    def __init__(self, data: bytes, byte: int = 0):
        self.data = data
        self.byte = byte
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        d = self.data
        byte, bit = self.byte, self.bit
        for _ in range(n):
            if byte >= len(d):
                raise FlacError("truncated bitstream")
            v = (v << 1) | ((d[byte] >> (7 - bit)) & 1)
            bit += 1
            if bit == 8:
                bit = 0
                byte += 1
        self.byte, self.bit = byte, bit
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
            if n > 1 << 20:
                raise FlacError("runaway unary code")
        return n

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


_BLOCKSIZE_FIXED = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
_RATE_FIXED = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _coded_number(br: _Bits) -> int:
    """The frame header's UTF-8-style extended coded number (frame or
    sample index, up to 36 bits)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise FlacError(f"bad coded-number lead byte {b0:#x}")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise FlacError(f"bad coded-number continuation {c:#x}")
        v = (v << 6) | (c & 0x3F)
    return v


def _residuals(br: _Bits, blocksize: int, order: int) -> list[int]:
    """Rice-coded residual section: 2-bit method, 4-bit partition
    order, per-partition parameter with the raw-bits escape."""
    method = br.read(2)
    if method > 1:
        raise FlacError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise FlacError("partition order does not divide blocksize")
    out: list[int] = []
    for p in range(nparts):
        n = (blocksize >> po) - (order if p == 0 else 0)
        if n < 0:
            raise FlacError("partition smaller than predictor order")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            out.extend(
                br.read_signed(raw) if raw else 0 for _ in range(n)
            )
        else:
            for _ in range(n):
                q = br.unary()
                r = br.read(param)
                u = (q << param) | r
                out.append((u >> 1) ^ -(u & 1))  # zigzag
    return out


def _subframe(br: _Bits, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise FlacError("subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise FlacError("wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        v = br.read_signed(eff)
        out = [v] * blocksize
    elif stype == 1:  # VERBATIM
        out = [br.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        if order > blocksize:
            raise FlacError("predictor order exceeds blocksize")
        out = [br.read_signed(eff) for _ in range(order)]
        res = _residuals(br, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs))
            out.append(pred + r)
    elif stype & 0x20:  # LPC, order 1-32
        order = (stype & 0x1F) + 1
        if order > blocksize:
            raise FlacError("predictor order exceeds blocksize")
        out = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise FlacError("invalid LPC precision escape")
        shift = br.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _residuals(br, blocksize, order)
        for r in res:
            acc = sum(c * out[-1 - j] for j, c in enumerate(coefs))
            out.append((acc >> shift) + r)
    else:
        raise FlacError(f"reserved subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(payload: bytes):
    """Decode a FLAC stream to (sample_rate, channels, bps, samples)
    with samples an int32 ndarray of shape (n, channels) holding the
    exact reconstructed values — losslessness is the format's
    contract. Verifies both frame CRCs and the STREAMINFO
    total-sample count (when set)."""
    b = bytes(payload)
    if b[:4] != b"fLaC":
        raise FlacError("missing fLaC stream marker")
    pos = 4
    si = None
    while True:
        if pos + 4 > len(b):
            raise FlacError("truncated metadata block header")
        last = b[pos] >> 7
        btype = b[pos] & 0x7F
        blen = int.from_bytes(b[pos + 1 : pos + 4], "big")
        body = b[pos + 4 : pos + 4 + blen]
        if len(body) < blen:
            raise FlacError("truncated metadata block")
        if btype == 0:  # STREAMINFO
            if blen != 34:
                raise FlacError(f"STREAMINFO length {blen} != 34")
            br = _Bits(body)
            br.read(16), br.read(16)  # min/max blocksize
            br.read(24), br.read(24)  # min/max framesize
            rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            si = (rate, channels, bps, total)
        elif btype == 127:
            raise FlacError("invalid metadata block type 127")
        pos += 4 + blen
        if last:
            break
    if si is None:
        raise FlacError("missing STREAMINFO block")
    rate, channels, bps, total = si
    chans: list[list[int]] = [[] for _ in range(channels)]
    try:
        while pos < len(b):
            pos = _frame(b, pos, si, chans)
    except IndexError as e:
        raise FlacError(f"truncated FLAC stream: {e}") from e
    n = len(chans[0])
    if total and n != total:
        raise FlacError(
            f"decoded {n} samples, STREAMINFO declares {total}"
        )
    out = np.zeros((n, channels), dtype=np.int32)
    for ci, ch in enumerate(chans):
        out[:, ci] = ch
    return rate, channels, bps, out


def _frame(b: bytes, pos: int, si, chans) -> int:
    rate_si, channels, bps_si, _total = si
    if pos + 2 > len(b):
        raise FlacError("truncated frame sync")
    if b[pos] != 0xFF or (b[pos + 1] & 0xFC) != 0xF8:
        raise FlacError(f"bad frame sync at {pos}")
    br = _Bits(b, pos)
    br.read(14)  # sync
    if br.read(1):
        raise FlacError("frame reserved bit set")
    br.read(1)  # blocking strategy
    bs_code = br.read(4)
    sr_code = br.read(4)
    chan_code = br.read(4)
    size_code = br.read(3)
    if br.read(1):
        raise FlacError("frame header reserved bit set")
    _num = _coded_number(br)
    if bs_code == 0:
        raise FlacError("reserved blocksize code 0")
    elif bs_code in _BLOCKSIZE_FIXED:
        blocksize = _BLOCKSIZE_FIXED[bs_code]
    elif bs_code == 6:
        blocksize = br.read(8) + 1
    elif bs_code == 7:
        blocksize = br.read(16) + 1
    else:
        blocksize = 256 << (bs_code - 8)
    if sr_code == 0:
        rate = rate_si
    elif sr_code in _RATE_FIXED:
        rate = _RATE_FIXED[sr_code]
    elif sr_code == 12:
        rate = br.read(8) * 1000
    elif sr_code == 13:
        rate = br.read(16)
    elif sr_code == 14:
        rate = br.read(16) * 10
    else:
        raise FlacError("invalid sample-rate code 15")
    if rate != rate_si:
        raise FlacError("frame sample rate differs from STREAMINFO")
    if chan_code <= 7:
        nch, stereo = chan_code + 1, None
    elif chan_code in (8, 9, 10):
        nch, stereo = 2, chan_code
    else:
        raise FlacError(f"reserved channel assignment {chan_code}")
    if nch != channels:
        raise FlacError("frame channel count differs from STREAMINFO")
    bps_map = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
    if size_code == 0:
        bps = bps_si
    elif size_code in bps_map:
        bps = bps_map[size_code]
    else:
        raise FlacError(f"reserved sample-size code {size_code}")
    if bps != bps_si:
        raise FlacError("frame sample size differs from STREAMINFO")
    hdr_end = br.byte  # CRC-8 is byte-aligned here
    if hdr_end + 1 > len(b):
        raise FlacError("truncated frame header CRC-8")
    if _crc8(b[pos:hdr_end]) != b[hdr_end]:
        raise FlacError(f"frame header CRC-8 mismatch at {pos}")
    br = _Bits(b, hdr_end + 1)
    subs = []
    for ci in range(nch):
        extra = 1 if (
            (stereo in (8, 10) and ci == 1) or (stereo == 9 and ci == 0)
        ) else 0
        subs.append(_subframe(br, blocksize, bps + extra))
    br.align()
    crc_pos = br.byte
    if crc_pos + 2 > len(b):
        raise FlacError("truncated frame CRC-16")
    want = int.from_bytes(b[crc_pos : crc_pos + 2], "big")
    if _crc16(b[pos:crc_pos]) != want:
        raise FlacError(f"frame CRC-16 mismatch at {pos}")
    if stereo is None:
        for ci in range(nch):
            chans[ci].extend(subs[ci])
    elif stereo == 8:  # left/side
        for lv, sv in zip(subs[0], subs[1]):
            chans[0].append(lv)
            chans[1].append(lv - sv)
    elif stereo == 9:  # right/side (side stored first)
        for sv, rv in zip(subs[0], subs[1]):
            chans[0].append(rv + sv)
            chans[1].append(rv)
    else:  # mid/side
        for mv, sv in zip(subs[0], subs[1]):
            m2 = (mv << 1) | (sv & 1)
            chans[0].append((m2 + sv) >> 1)
            chans[1].append((m2 - sv) >> 1)
    return crc_pos + 2
