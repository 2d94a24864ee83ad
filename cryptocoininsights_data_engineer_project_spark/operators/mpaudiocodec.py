"""MPEG-1 Audio Layer I/II (ISO/IEC 11172-3) frame decoder — the
audio half of ISO/IEC 11172, pairing operators/mpegcodec.py (the video
half, 11172-2). Stdlib+numpy only, like every codec in this repo.

Scope (each limit gates LOUDLY, the house convention):

* Layer I — complete: header, 4-bit allocations (nbits = alloc + 1),
  6-bit scalefactors, 12 granules x 1 sample/subband requantization.
* Layer II — the low-rate allocation-table class (11172-3 Annex 3-B
  tables 2c/2d: nbal = 4 for every coded subband, one shared
  quantization ladder 3,5,9,15,...,16383): header, allocations,
  scfsi, 1-3 scalefactors per coded subband, 12 granules x 3
  samples, including the GROUPED codes (steps 3/5/9 pack three
  samples into one 5/7/10-bit word, v = c0 + steps*c1 + steps^2*c2).
  The high-rate tables 3-B.2a/b (per-subband quantization menus)
  raise NotImplementedError naming the table.
* Requantization is held in EXACT INTEGER form: the spec formula
  s''' = C * (s'' + D) with C = 2^nb / steps and D * 2^(nb-1)
  an integer offset o (o = 1 for steps = 2^nb - 1; o = 1, 2, 4 for
  the grouped steps 3, 5, 9) collapses to

      s''' = 2 * (c - 2^(nb-1) + o) / steps

  so every sample is the integer numerator q = c - 2^(nb-1) + o
  over the odd constant ``steps`` — decode keeps q; floats only on
  request (dequantize()).
* Synthesis to PCM: the normative matrixing stage (the 32->64 cosine
  bank, 11172-3 2.4.3.5) is implemented; the WINDOWING stage needs
  the 512-coefficient table 3-C.3, which is numeric spec data this
  stdlib-only repo does not bundle — synthesize() raises
  NotImplementedError naming the table unless a window is registered
  via register_synthesis_window() (the multimodal.register_decoder
  seam pattern). Nothing upstream of windowing is gated.
* Single-channel streams only (the fixtures' shape); stereo modes
  raise (intensity/ms handling would be untested guesswork).

Reference parity note: the reference pipeline (coininsights.py) has
no media path at all — this module belongs to the beyond-reference
LLM-data frontier (audio assets in crawl archives).
"""

from __future__ import annotations

import math

import numpy as np


class MpegAudioError(ValueError):
    """Malformed or out-of-subset MPEG audio stream."""


# header tables (11172-3 2.4.2.3)
_BITRATE_L1 = [
    None, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448,
]
_BITRATE_L2 = [
    None, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384,
]
_SAMPLING = {0: 44100, 1: 48000, 2: 32000}

# Layer II low-rate ladder (Annex 3-B tables 2c/2d): alloc value ->
# number of quantization steps; 3/5/9 are the grouped classes.
_L2_STEPS = [
    3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 16383,
]
# grouped classes: (bits per granule triplet); ungrouped: 3 x nb
_L2_GROUP_BITS = {3: 5, 5: 7, 9: 10}
# de-grouped per-sample bit width nb and integer offset o per steps
_L2_NB = {3: 2, 5: 3, 9: 4}
_L2_OFFSET = {3: 1, 5: 2, 9: 4}

# Layer II table selection (11172-3 table 3-B.2 choice): this module
# implements only the low-rate class; the supported (sampling_rate,
# kbps-per-channel) combos map to their sblimit.
_L2_LOW_RATE_SBLIMIT = {
    (32000, 32): 12,
    (32000, 48): 12,
    (48000, 32): 8,
    (48000, 48): 8,
    (44100, 32): 8,
    (44100, 48): 8,
}


def _crc16_mpa(bits: list[int]) -> int:
    """11172-3 2.4.3.1 CRC check: polynomial X^16 + X^15 + X^2 + 1
    (0x8005), initial state 0xFFFF, fed MSB-first with the PROTECTED
    bits (header bits 16..31, then the layer's side information:
    layer I allocation bits, layer II allocation + scfsi bits)."""
    crc = 0xFFFF
    for bit in bits:
        top = (crc >> 15) & 1
        crc = (crc << 1) & 0xFFFF
        if top ^ bit:
            crc ^= 0x8005
    return crc


class _Bits:
    """MSB-first bit reader (the flaccodec._Bits shape)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        if self.pos + n > len(self.data) * 8:
            raise MpegAudioError("bitstream truncated")
        v = 0
        p = self.pos
        for _ in range(n):
            v = (v << 1) | ((self.data[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v


def _steps_nb_offset_l1(alloc: int) -> tuple[int, int, int]:
    nb = alloc + 1  # 11172-3 layer I: code width = allocation + 1
    return (1 << nb) - 1, nb, 1


def _steps_nb_offset_l2(alloc: int) -> tuple[int, int, int]:
    steps = _L2_STEPS[alloc - 1]
    if steps in _L2_NB:
        return steps, _L2_NB[steps], _L2_OFFSET[steps]
    nb = steps.bit_length()  # steps = 2^nb - 1
    return steps, nb, 1


class AudioFrame:
    """One decoded frame held in exact integer form.

    All per-subband state is PER CHANNEL (round 13 added independent
    stereo/dual_channel): alloc[ch][sb], scf[ch][sb] (layer I: 1
    part, layer II: 3 parts after scfsi expansion), scfsi[ch][sb],
    steps[ch][sb]. qnum[s, ch, sb] (layer I: s in 0..11, layer II:
    0..35) is the integer numerator q; the dequantized sample is
    2 * sf * q / steps with sf = 2.0 * 2**(-scf_idx/3).
    alloc[ch][sb] = 0 means the subband is not coded in that channel
    (qnum slice zero, steps 0)."""

    def __init__(self, layer, sample_rate, bitrate, channels,
                 alloc, scfsi, scf, steps, qnum):
        self.layer = layer
        self.sample_rate = sample_rate
        self.bitrate = bitrate
        self.channels = channels
        self.alloc = alloc
        self.scfsi = scfsi
        self.scf = scf
        self.steps = steps
        self.qnum = qnum


def _parse_header(b: bytes, pos: int):
    if pos + 4 > len(b):
        raise MpegAudioError("truncated header")
    h = int.from_bytes(b[pos : pos + 4], "big")
    if (h >> 20) & 0xFFF != 0xFFF:
        raise MpegAudioError(f"bad syncword at byte {pos}")
    if not (h >> 19) & 1:
        raise MpegAudioError("ID 0 (MPEG-2 LSF) not in subset")
    layer_code = (h >> 17) & 3
    if layer_code == 3:
        layer = 1
    elif layer_code == 2:
        layer = 2
    elif layer_code == 1:
        raise MpegAudioError("Layer III is outside the 11172-3 subset here")
    else:
        raise MpegAudioError("reserved layer code")
    protection = (h >> 16) & 1
    bitrate_index = (h >> 12) & 0xF
    sampling_index = (h >> 10) & 3
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3
    if sampling_index == 3:
        raise MpegAudioError("reserved sampling_frequency")
    if bitrate_index in (0, 15):
        raise MpegAudioError("free-format/forbidden bitrate not in subset")
    if mode == 1:
        raise NotImplementedError(
            "joint_stereo (intensity coding, mode 01) is outside the "
            "implemented subset — stereo/dual_channel decode as two "
            "independent channels; single_channel is complete"
        )
    nch = 1 if mode == 3 else 2
    rate = _SAMPLING[sampling_index]
    kbps = (_BITRATE_L1 if layer == 1 else _BITRATE_L2)[bitrate_index]
    if layer == 1:
        frame_bytes = 4 * (12 * kbps * 1000 // rate + padding)
    else:
        frame_bytes = 144 * kbps * 1000 // rate + padding
    return layer, protection, rate, kbps, nch, frame_bytes


def _decode_frame_l1(br: _Bits, rate: int, kbps: int, nch: int) -> AudioFrame:
    alloc = [[0] * 32 for _ in range(nch)]
    for sb in range(32):
        for ch in range(nch):
            a = br.read(4)
            if a == 15:
                raise MpegAudioError("layer I allocation 15 is forbidden")
            alloc[ch][sb] = a
    scf = [[[] for _ in range(32)] for _ in range(nch)]
    for sb in range(32):
        for ch in range(nch):
            if alloc[ch][sb]:
                scf[ch][sb] = [br.read(6)]
    steps = [[0] * 32 for _ in range(nch)]
    meta = {}
    for ch in range(nch):
        for sb in range(32):
            if alloc[ch][sb]:
                meta[(ch, sb)] = _steps_nb_offset_l1(alloc[ch][sb])
                steps[ch][sb] = meta[(ch, sb)][0]
    qnum = np.zeros((12, nch, 32), dtype=np.int64)
    for g in range(12):
        for sb in range(32):
            for ch in range(nch):
                if not alloc[ch][sb]:
                    continue
                st, nb, off = meta[(ch, sb)]
                c = br.read(nb)
                if c == (1 << nb) - 1:
                    # 11172-3 layer I: steps = 2^nb - 1, so the
                    # all-ones code is forbidden (mirrors alloc == 15)
                    raise MpegAudioError(
                        f"layer I all-ones sample code ({nb} bits) is "
                        "forbidden"
                    )
                qnum[g, ch, sb] = c - (1 << (nb - 1)) + off
    return AudioFrame(
        1, rate, kbps, nch, alloc, None, scf, steps, qnum
    )


def _decode_frame_l2(br: _Bits, rate: int, kbps: int, nch: int) -> AudioFrame:
    key = (rate, kbps // nch)
    if key not in _L2_LOW_RATE_SBLIMIT:
        raise NotImplementedError(
            f"layer II (rate={rate}, {kbps // nch} kbps/ch) selects a "
            "high-rate allocation table (ISO/IEC 11172-3 Annex "
            "3-B.2a/2b) — only the low-rate table class (3-B.2c/2d) is "
            "implemented"
        )
    sblimit = _L2_LOW_RATE_SBLIMIT[key]
    alloc = [[0] * 32 for _ in range(nch)]
    for sb in range(sblimit):
        for ch in range(nch):
            a = br.read(4)
            if a == 15:
                raise MpegAudioError("layer II allocation 15 is forbidden")
            alloc[ch][sb] = a
    scfsi = [[None] * 32 for _ in range(nch)]
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[ch][sb]:
                scfsi[ch][sb] = br.read(2)
    scf = [[[] for _ in range(32)] for _ in range(nch)]
    for sb in range(sblimit):
        for ch in range(nch):
            if not alloc[ch][sb]:
                continue
            si = scfsi[ch][sb]
            if si == 0:
                a, b, c = br.read(6), br.read(6), br.read(6)
            elif si == 1:
                a = b = br.read(6)
                c = br.read(6)
            elif si == 2:
                a = b = c = br.read(6)
            else:
                a = br.read(6)
                b = c = br.read(6)
            scf[ch][sb] = [a, b, c]
    steps = [[0] * 32 for _ in range(nch)]
    meta = {}
    for ch in range(nch):
        for sb in range(sblimit):
            if alloc[ch][sb]:
                meta[(ch, sb)] = _steps_nb_offset_l2(alloc[ch][sb])
                steps[ch][sb] = meta[(ch, sb)][0]
    qnum = np.zeros((36, nch, 32), dtype=np.int64)
    for g in range(12):
        for sb in range(sblimit):
            for ch in range(nch):
                if not alloc[ch][sb]:
                    continue
                st, nb, off = meta[(ch, sb)]
                if st in _L2_GROUP_BITS:
                    v = br.read(_L2_GROUP_BITS[st])
                    if v >= st * st * st:
                        raise MpegAudioError(
                            f"grouped code {v} out of range for steps {st}"
                        )
                    codes = (v % st, (v // st) % st, v // (st * st))
                else:
                    codes = (br.read(nb), br.read(nb), br.read(nb))
                for i, c in enumerate(codes):
                    qnum[3 * g + i, ch, sb] = c - (1 << (nb - 1)) + off
    return AudioFrame(
        2, rate, kbps, nch, alloc, scfsi, scf, steps, qnum
    )


def _frame_bit(body: bytes, p: int) -> int:
    return (body[p >> 3] >> (7 - (p & 7))) & 1


def _protected_side_bits(body: bytes, layer: int, rate: int,
                         kbps: int, nch: int, start: int) -> list[int]:
    """The side-information bits the frame CRC covers, starting at bit
    ``start`` (just after the 16-bit crc_check field): layer I — all
    allocation nibbles; layer II — allocation nibbles + the scfsi
    pairs of coded subbands."""
    bits: list[int] = []
    if layer == 1:
        n_alloc_bits = 32 * nch * 4
        bits += [_frame_bit(body, start + i) for i in range(n_alloc_bits)]
        return bits
    sblimit = _L2_LOW_RATE_SBLIMIT.get((rate, kbps // nch))
    if sblimit is None:
        return bits  # the table gate raises before CRC matters
    allocs = []
    p = start
    for _sb in range(sblimit):
        for _ch in range(nch):
            nib = [_frame_bit(body, p + i) for i in range(4)]
            bits += nib
            allocs.append(nib[0] * 8 + nib[1] * 4 + nib[2] * 2 + nib[3])
            p += 4
    for a in allocs:
        if a:
            bits += [_frame_bit(body, p), _frame_bit(body, p + 1)]
        p += 2 if a else 0
    return bits


def decode_mpeg_audio(payload: bytes) -> list[AudioFrame]:
    """All frames of an MPEG-1 audio elementary stream (layer I or II
    per frame header; single_channel, stereo, or dual_channel — the
    two-channel modes decode as independent channels, channel-major
    inner loops per 11172-3 2.4.1.5/2.4.1.6). Protected frames
    (protection_bit 0) have their CRC-16 VERIFIED over header bits
    16..31 + the layer's side information (2.4.3.1); a mismatch
    raises. Zero padding after the last frame is ignored (fixture
    frames are padded to the header-implied slot count, like real
    ancillary-data regions)."""
    frames: list[AudioFrame] = []
    pos = 0
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] == 0 and not any(payload[pos:]):
            break  # trailing pad
        layer, protection, rate, kbps, nch, frame_bytes = _parse_header(
            payload, pos
        )
        if pos + frame_bytes > n:
            raise MpegAudioError("frame extends past payload")
        body = payload[pos : pos + frame_bytes]
        br = _Bits(body)
        br.pos = 32
        if not protection:
            crc_stored = br.read(16)
            covered = [_frame_bit(body, i) for i in range(16, 32)]
            covered += _protected_side_bits(
                body, layer, rate, kbps, nch, br.pos
            )
            crc = _crc16_mpa(covered)
            if crc != crc_stored:
                raise MpegAudioError(
                    f"frame CRC mismatch: stored {crc_stored:#06x}, "
                    f"computed {crc:#06x}"
                )
        if layer == 1:
            frames.append(_decode_frame_l1(br, rate, kbps, nch))
        else:
            frames.append(_decode_frame_l2(br, rate, kbps, nch))
        pos += frame_bytes
    if not frames:
        raise MpegAudioError("no audio frames found")
    return frames


def scalefactor(idx: int) -> float:
    """Table 3-B.1: sf = 2.0 * 2^(-idx/3) (exactly a power of two at
    idx % 3 == 0 — the fixtures stay on that lattice so dequantized
    values are exact dyadic multiples of 1/steps)."""
    if not 0 <= idx <= 62:
        raise MpegAudioError(f"scalefactor index {idx} out of range")
    return 2.0 * 2.0 ** (-idx / 3.0)


def dequantize(frame: AudioFrame) -> np.ndarray:
    """float64 subband samples (n_samples, channels, 32):
    2 * sf * q / steps, part-wise scalefactors for layer II (parts
    of 12 samples), independently per channel."""
    out = np.zeros(frame.qnum.shape, dtype=np.float64)
    for ch in range(frame.channels):
        for sb in range(32):
            if not frame.alloc[ch][sb]:
                continue
            st = frame.steps[ch][sb]
            if frame.layer == 1:
                sf = scalefactor(frame.scf[ch][sb][0])
                out[:, ch, sb] = 2.0 * sf * frame.qnum[:, ch, sb] / st
            else:
                for part in range(3):
                    sf = scalefactor(frame.scf[ch][sb][part])
                    sl = slice(12 * part, 12 * (part + 1))
                    out[sl, ch, sb] = (
                        2.0 * sf * frame.qnum[sl, ch, sb] / st
                    )
    return out


# ------------------------------------------------ synthesis filterbank
_SYNTHESIS_WINDOW: np.ndarray | None = None


def register_synthesis_window(window) -> None:
    """Install the 512-coefficient synthesis window (ISO/IEC 11172-3
    Table 3-C.3). The table is numeric spec data this stdlib-only
    build does not bundle; a deployment that has it (or any analysis
    window of its own) registers it here — the
    multimodal.register_decoder seam pattern."""
    global _SYNTHESIS_WINDOW
    w = np.asarray(window, dtype=np.float64)
    if w.shape != (512,):
        raise MpegAudioError("synthesis window must have 512 coefficients")
    _SYNTHESIS_WINDOW = w


def matrixing(samples32: np.ndarray) -> np.ndarray:
    """The NORMATIVE matrixing stage (11172-3 2.4.3.5): 64 values
    V[i] = sum_k cos((16 + i)(2k + 1) pi / 64) * S[k]."""
    i = np.arange(64)[:, None]
    k = np.arange(32)[None, :]
    n = np.cos((16 + i) * (2 * k + 1) * math.pi / 64)
    return n @ np.asarray(samples32, dtype=np.float64)


def synthesize(subband_samples: np.ndarray) -> np.ndarray:
    """Full synthesis to PCM: matrixing + 1024-value FIFO + windowing.
    Requires a registered Table 3-C.3 window — gates loudly without
    one (the windowing stage is the ONLY gated piece; everything
    upstream, including matrixing, is implemented and tested)."""
    if _SYNTHESIS_WINDOW is None:
        raise NotImplementedError(
            "PCM synthesis needs the 512-coefficient window of ISO/IEC "
            "11172-3 Table 3-C.3, which is numeric spec data not bundled "
            "in this stdlib-only build; install it with "
            "register_synthesis_window(...)"
        )
    d = _SYNTHESIS_WINDOW
    x = np.asarray(subband_samples, dtype=np.float64)
    v = np.zeros(1024, dtype=np.float64)
    out = np.empty((x.shape[0], 32), dtype=np.float64)
    for t in range(x.shape[0]):
        v[64:] = v[:-64].copy()
        v[:64] = matrixing(x[t])
        # build U from the FIFO (11172-3 figure 3-A.2 indexing)
        u = np.empty(512, dtype=np.float64)
        for i in range(8):
            u[i * 64 : i * 64 + 32] = v[i * 128 : i * 128 + 32]
            u[i * 64 + 32 : i * 64 + 64] = v[i * 128 + 96 : i * 128 + 128]
        w = u * d
        out[t] = w.reshape(16, 32).sum(axis=0)
    return out
