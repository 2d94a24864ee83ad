"""MPEG-1 Audio Layer I/II (ISO/IEC 11172-3) frame decoder — the
audio half of ISO/IEC 11172, pairing operators/mpegcodec.py (the video
half, 11172-2). Stdlib+numpy only, like every codec in this repo.

Scope (each limit gates LOUDLY, the house convention):

* Layer I — complete: header, 4-bit allocations (nbits = alloc + 1),
  6-bit scalefactors, 12 granules x 1 sample/subband requantization.
* Layer II — ALL FOUR allocation tables (11172-3 Annex 3-B: the
  low-rate 2c/2d shared ladder AND the high-rate 2a/2b per-subband
  menus with 4/4/3/2-bit allocation fields, selected by the 2.4.2.6
  rule): header, allocations, scfsi, 1-3 scalefactors per coded
  subband, 12 granules x 3 samples, including the GROUPED codes
  (steps 3/5/9 pack three samples into one 5/7/10-bit word,
  v = c0 + steps*c1 + steps^2*c2).
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
* All channel modes: single_channel, stereo and dual_channel (two
  independent channels), and joint_stereo (mode 01) — intensity
  bands at/above the mode_extension bound share one allocation and
  one set of sample codes under per-channel scalefactors.

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
_BITRATE_L3 = [
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]
_SAMPLING = {0: 44100, 1: 48000, 2: 32000}
# MPEG-2 LSF (ISO/IEC 13818-3, ID bit 0): halved sampling rates and
# its own bitrate columns — Layer III 8..160 kbps, Layer I
# 32..256 kbps, Layer II sharing the Layer III column (13818-3
# Table 11, r16)
_SAMPLING_LSF = {0: 22050, 1: 24000, 2: 16000}
# MPEG-2.5 (r16): the de-facto FhG extension — 11-bit syncword,
# version bits 00, quartered sampling rates, LSF bitrate columns and
# frame layouts otherwise
_SAMPLING_25 = {0: 11025, 1: 12000, 2: 8000}
_BITRATE_L3_LSF = [
    None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
]
_BITRATE_L1_LSF = [
    None, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256,
]
_BITRATE_L2_LSF = _BITRATE_L3_LSF  # 13818-3: layers II and III share it

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

# Layer II table selection (11172-3 table 3-B.2 choice): low-rate
# (sampling_rate, kbps-per-channel) combos map to their sblimit.
_L2_LOW_RATE_SBLIMIT = {
    (32000, 32): 12,
    (32000, 48): 12,
    (48000, 32): 8,
    (48000, 48): 8,
    (44100, 32): 8,
    (44100, 48): 8,
}

# High-rate tables 3-B.2a (sblimit 27) / 3-B.2b (sblimit 30):
# per-subband allocation-field widths and quantization menus. Four
# menu classes; every step count is either a grouped class (3/5/9) or
# 2^nb - 1 (ungrouped) — the requantization path is shared with the
# low-rate ladder.
_L2_HI_NBAL_A = [4] * 3 + [4] * 8 + [3] * 12 + [2] * 4          # 27 sb
_L2_HI_NBAL_B = [4] * 3 + [4] * 8 + [3] * 12 + [2] * 7          # 30 sb
_L2_HI_MENU_0_2 = [
    3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 16383,
    32767, 65535,
]
_L2_HI_MENU_3_10 = [
    3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 65535,
]
_L2_HI_MENU_11_22 = [3, 5, 7, 9, 15, 31, 65535]
_L2_HI_MENU_23_UP = [3, 5, 65535]


def _l2_hi_steps(sb: int, alloc: int) -> int:
    """Steps for allocation code ``alloc`` in high-rate subband
    ``sb`` (tables 2a/2b share the menus; 2b only extends the 2-bit
    class to subband 29)."""
    if sb <= 2:
        menu = _L2_HI_MENU_0_2
    elif sb <= 10:
        menu = _L2_HI_MENU_3_10
    elif sb <= 22:
        menu = _L2_HI_MENU_11_22
    else:
        menu = _L2_HI_MENU_23_UP
    return menu[alloc - 1]


# MPEG-2 LSF / MPEG-2.5 Layer II (13818-3 Annex B, Table B.1 —
# r16): ONE allocation table for every LSF bitrate/rate combination
# (no 2.4.2.6-style selection): sblimit 30, allocation-field widths
# 4/3/2 bits by subband class. Transcription witnesses (pinned in
# tests): every menu EXACTLY fills its field width (15/7/3 nonzero
# codes for 4/3/2 bits), and every step count is either a grouped
# class (3/5/9) or 2^nb - 1 — so the shared requantization path
# applies unchanged.
_L2_LSF_NBAL = [4] * 4 + [3] * 7 + [2] * 19                     # 30 sb
_L2_LSF_MENU_0_3 = [
    3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 16383,
]
_L2_LSF_MENU_4_10 = [3, 5, 7, 9, 15, 31, 63]
_L2_LSF_MENU_11_29 = [3, 5, 7]


def _l2_lsf_steps(sb: int, alloc: int) -> int:
    """Steps for allocation code ``alloc`` in LSF subband ``sb``."""
    if sb <= 3:
        menu = _L2_LSF_MENU_0_3
    elif sb <= 10:
        menu = _L2_LSF_MENU_4_10
    else:
        menu = _L2_LSF_MENU_11_29
    return menu[alloc - 1]


def _l2_table_select(rate: int, kbps_ch: int) -> tuple[str, int]:
    """The 11172-3 2.4.2.6 table choice (the dist10 II_pick_table
    rule): returns (table_id, sblimit) with table_id in
    {'a', 'b', 'c', 'd'}."""
    if (rate == 48000 and kbps_ch >= 56) or 56 <= kbps_ch <= 80:
        return "a", 27
    if rate != 48000 and kbps_ch >= 96:
        return "b", 30
    if rate != 32000 and kbps_ch <= 48:
        return "c", 8
    return "d", 12


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
    """MSB-first bit reader (the flaccodec._Bits shape). The whole
    buffer is held as ONE big int so an n-bit read is a single shift
    + mask instead of an n-iteration per-bit loop — measured ~4x on
    the layer II high-rate decode, whose 65535-step ladder reads
    16-bit codes (frames are a few hundred bytes, so the shift is a
    few dozen machine words)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self._int = int.from_bytes(data, "big")
        self._nbits = len(data) * 8

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > self._nbits:
            raise MpegAudioError("bitstream truncated")
        v = (self._int >> (self._nbits - end)) & ((1 << n) - 1)
        self.pos = end
        return v


def _steps_nb_offset_l1(alloc: int) -> tuple[int, int, int]:
    nb = alloc + 1  # 11172-3 layer I: code width = allocation + 1
    return (1 << nb) - 1, nb, 1


def _steps_nb_offset_l2(steps: int) -> tuple[int, int, int]:
    """(steps, nb, offset) for a layer II step count: the grouped
    classes (3/5/9) carry their table offsets; every other menu entry
    is 2^nb - 1 with offset 1 — shared across the low-rate ladder and
    the high-rate menus."""
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
    if (h >> 21) & 0x7FF != 0x7FF:
        raise MpegAudioError(f"bad syncword at byte {pos}")
    # version (bits 20-19 after the 11-bit sync): 11 = MPEG-1,
    # 10 = MPEG-2 LSF, 00 = MPEG-2.5 (r16 — the FhG low-rate
    # extension real voice/podcast archives carry), 01 = reserved
    version = (h >> 19) & 3
    if version == 1:
        raise MpegAudioError("reserved version id 01")
    lsf = version != 3  # both MPEG-2 LSF and 2.5 use the LSF layouts
    mp25 = version == 0
    layer_code = (h >> 17) & 3
    if layer_code == 3:
        layer = 1
    elif layer_code == 2:
        layer = 2
    elif layer_code == 1:
        layer = 3
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
    nch = 1 if mode == 3 else 2
    # joint_stereo (mode 01): intensity coding — subbands at or above
    # the bound (mode_extension: 4, 8, 12, 16) carry ONE shared
    # allocation and ONE set of sample codes, but per-channel
    # scalefactors (11172-3 2.4.1.5/2.4.1.6, layers I/II meaning of
    # mode_extension). bound = 32 means "no intensity bands" —
    # identical bit layout to independent stereo.
    mode_ext = (h >> 4) & 3
    bound = 4 * (mode_ext + 1) if mode == 1 else 32
    # layer III reinterprets mode_extension as (intensity, ms) flags;
    # the LSF intensity-stereo scalefactor layout needs the flag
    intensity_l3 = layer == 3 and mode == 1 and bool(mode_ext & 1)
    if mp25:
        rate = _SAMPLING_25[sampling_index]
    else:
        rate = (_SAMPLING_LSF if lsf else _SAMPLING)[sampling_index]
    kbps = {
        1: _BITRATE_L1_LSF if lsf else _BITRATE_L1,
        2: _BITRATE_L2_LSF if lsf else _BITRATE_L2,
        3: _BITRATE_L3_LSF if lsf else _BITRATE_L3,
    }[layer][bitrate_index]
    if layer == 1:
        frame_bytes = 4 * (12 * kbps * 1000 // rate + padding)
    elif layer == 3 and lsf:
        # LSF/2.5 layer III frames carry ONE 576-sample granule
        frame_bytes = 72 * kbps * 1000 // rate + padding
    else:  # layers II and III share the 144-coefficient frame size
        frame_bytes = 144 * kbps * 1000 // rate + padding
    return (layer, protection, rate, kbps, nch, bound, frame_bytes,
            lsf, intensity_l3)


def _decode_frame_l1(
    br: _Bits, rate: int, kbps: int, nch: int, bound: int = 32
) -> AudioFrame:
    alloc = [[0] * 32 for _ in range(nch)]
    for sb in range(32):
        if sb < bound:
            for ch in range(nch):
                a = br.read(4)
                if a == 15:
                    raise MpegAudioError(
                        "layer I allocation 15 is forbidden"
                    )
                alloc[ch][sb] = a
        else:
            # intensity band (joint_stereo): ONE shared allocation
            a = br.read(4)
            if a == 15:
                raise MpegAudioError("layer I allocation 15 is forbidden")
            for ch in range(nch):
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
            chans = range(nch) if sb < bound else range(1)
            for ch in chans:
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
                q = c - (1 << (nb - 1)) + off
                if sb < bound:
                    qnum[g, ch, sb] = q
                else:  # intensity: one code, both channels
                    for c2 in range(nch):
                        qnum[g, c2, sb] = q
    return AudioFrame(
        1, rate, kbps, nch, alloc, None, scf, steps, qnum
    )


def _decode_frame_l2(
    br: _Bits, rate: int, kbps: int, nch: int, bound: int = 32,
    lsf: bool = False,
) -> AudioFrame:
    if lsf:
        # 13818-3: one table for every LSF/2.5 rate — Table B.1
        table, sblimit = "lsf", 30
        nbal = _L2_LSF_NBAL

        def steps_of(sb: int, a: int) -> int:
            return _l2_lsf_steps(sb, a)

    else:
        table, sblimit = _l2_table_select(rate, kbps // nch)
        if table in ("a", "b"):
            nbal = _L2_HI_NBAL_A if table == "a" else _L2_HI_NBAL_B

            def steps_of(sb: int, a: int) -> int:
                return _l2_hi_steps(sb, a)

        else:
            nbal = [4] * sblimit

            def steps_of(sb: int, a: int) -> int:
                if a == 15:
                    raise MpegAudioError(
                        "layer II allocation 15 is forbidden (low-rate "
                        "ladder has 14 entries)"
                    )
                return _L2_STEPS[a - 1]

    alloc = [[0] * 32 for _ in range(nch)]
    for sb in range(sblimit):
        if sb < bound:
            for ch in range(nch):
                alloc[ch][sb] = br.read(nbal[sb])
        else:
            # intensity band (joint_stereo): ONE shared allocation
            a = br.read(nbal[sb])
            for ch in range(nch):
                alloc[ch][sb] = a
    # validate every nonzero code against its menu (low-rate forbids
    # 15; every high-rate menu exactly fills its field width)
    for ch in range(nch):
        for sb in range(sblimit):
            if alloc[ch][sb]:
                steps_of(sb, alloc[ch][sb])
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
                meta[(ch, sb)] = _steps_nb_offset_l2(
                    steps_of(sb, alloc[ch][sb])
                )
                steps[ch][sb] = meta[(ch, sb)][0]
    qnum = np.zeros((36, nch, 32), dtype=np.int64)
    for g in range(12):
        for sb in range(sblimit):
            chans = range(nch) if sb < bound else range(1)
            for ch in chans:
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
                    q = c - (1 << (nb - 1)) + off
                    if sb < bound:
                        qnum[3 * g + i, ch, sb] = q
                    else:  # intensity: one triplet, both channels
                        for c2 in range(nch):
                            qnum[3 * g + i, c2, sb] = q
    return AudioFrame(
        2, rate, kbps, nch, alloc, scfsi, scf, steps, qnum
    )


def _frame_bit(body: bytes, p: int) -> int:
    return (body[p >> 3] >> (7 - (p & 7))) & 1


def _protected_side_bits(body: bytes, layer: int, rate: int,
                         kbps: int, nch: int, bound: int,
                         start: int, lsf: bool = False) -> list[int]:
    """The side-information bits the frame CRC covers, starting at bit
    ``start`` (just after the 16-bit crc_check field): layer I — all
    allocation fields; layer II — allocation fields + the scfsi pairs
    of coded subbands. Intensity bands (sb >= bound in joint_stereo)
    carry one shared allocation but per-channel scfsi."""
    bits: list[int] = []
    if layer == 1:
        n_alloc_bits = sum(
            (nch if sb < bound else 1) * 4 for sb in range(32)
        )
        bits += [_frame_bit(body, start + i) for i in range(n_alloc_bits)]
        return bits
    if layer == 3:
        # the CRC covers the whole fixed-size side information
        # (2.4.1.7): 9 + 5/3 + 4*nch scfsi + 2 * 59 * nch granule
        # bits; the LSF layout (13818-3 2.4.1.7) is 8 + 1/2 + one
        # 63-bit granule per channel (no scfsi, 9-bit
        # scalefac_compress, no preflag bit)
        if lsf:
            n_side = 8 + (1 if nch == 1 else 2) + 63 * nch
        else:
            n_side = 9 + (5 if nch == 1 else 3) + 4 * nch + 118 * nch
        return [_frame_bit(body, start + i) for i in range(n_side)]
    if lsf:
        sblimit, nbal = 30, _L2_LSF_NBAL
    else:
        table, sblimit = _l2_table_select(rate, kbps // nch)
        if table in ("a", "b"):
            nbal = _L2_HI_NBAL_A if table == "a" else _L2_HI_NBAL_B
        else:
            nbal = [4] * sblimit
    alloc_by = [[0] * sblimit for _ in range(nch)]
    p = start
    for sb in range(sblimit):
        n_fields = nch if sb < bound else 1
        vals = []
        for _ in range(n_fields):
            v = 0
            for i in range(nbal[sb]):
                b = _frame_bit(body, p + i)
                bits.append(b)
                v = (v << 1) | b
            vals.append(v)
            p += nbal[sb]
        for ch in range(nch):
            alloc_by[ch][sb] = vals[ch] if sb < bound else vals[0]
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc_by[ch][sb]:
                bits += [_frame_bit(body, p), _frame_bit(body, p + 1)]
                p += 2
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
    l3_infos: list[tuple] = []
    pos = 0
    n = len(payload)
    if payload[:3] == b"ID3" and n >= 10:
        # ID3v2 envelope (the shape crawled MP3s actually arrive in):
        # 10-byte header, 28-bit SYNCSAFE size, optional 10-byte
        # footer (flag bit 4). Tag content is metadata, not audio —
        # skip it; a lying size still fails loudly at the syncword.
        if any(b & 0x80 for b in payload[6:10]):
            raise MpegAudioError("ID3v2 size bytes must be syncsafe")
        size = (
            (payload[6] << 21) | (payload[7] << 14)
            | (payload[8] << 7) | payload[9]
        )
        pos = 10 + size + (10 if payload[5] & 0x10 else 0)
        if pos >= n:
            raise MpegAudioError("ID3v2 tag extends past payload")
    while pos + 4 <= n:
        if payload[pos] == 0 and not any(payload[pos:]):
            break  # trailing pad
        (layer, protection, rate, kbps, nch, bound, frame_bytes, lsf,
         intensity_l3) = _parse_header(payload, pos)
        if pos + frame_bytes > n:
            raise MpegAudioError("frame extends past payload")
        body = payload[pos : pos + frame_bytes]
        br = _Bits(body)
        br.pos = 32
        if not protection:
            crc_stored = br.read(16)
            covered = [_frame_bit(body, i) for i in range(16, 32)]
            covered += _protected_side_bits(
                body, layer, rate, kbps, nch, bound, br.pos, lsf
            )
            crc = _crc16_mpa(covered)
            if crc != crc_stored:
                raise MpegAudioError(
                    f"frame CRC mismatch: stored {crc_stored:#06x}, "
                    f"computed {crc:#06x}"
                )
        if (l3_infos and layer != 3) or (frames and layer == 3):
            raise MpegAudioError("mixed layer-III / layer-I/II stream")
        if layer == 1:
            frames.append(_decode_frame_l1(br, rate, kbps, nch, bound))
        elif layer == 2:
            frames.append(
                _decode_frame_l2(br, rate, kbps, nch, bound, lsf)
            )
        else:  # layer III: reservoir spans frames — decode after walk
            l3_infos.append(
                (pos, frame_bytes, protection, rate, kbps, nch, lsf,
                 intensity_l3)
            )
        pos += frame_bytes
    if l3_infos:
        from .mp3codec import decode_mp3_frames

        return decode_mp3_frames(payload, l3_infos)
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
    build does not bundle (free-form array, no public-reproduction
    cross-check available in-container — the r16 SCALE.md policy);
    a deployment that has it (or any analysis window of its own)
    registers it here — the multimodal.register_decoder seam
    pattern. For worker-side synthesis the operators capture
    ``snapshot_synthesis_window()`` at plan-build time (the
    register_huffman_table shipment discipline)."""
    global _SYNTHESIS_WINDOW
    w = np.asarray(window, dtype=np.float64)
    if w.shape != (512,):
        raise MpegAudioError("synthesis window must have 512 coefficients")
    _SYNTHESIS_WINDOW = w


def snapshot_synthesis_window():
    """Driver-side snapshot of the registered window for shipment
    into Spark python workers (None if unregistered)."""
    return None if _SYNTHESIS_WINDOW is None else _SYNTHESIS_WINDOW.copy()


def install_synthesis_window(snap) -> None:
    """Worker-side counterpart of ``snapshot_synthesis_window``."""
    global _SYNTHESIS_WINDOW
    _SYNTHESIS_WINDOW = None if snap is None else np.asarray(
        snap, dtype=np.float64
    )


_MATRIXING_N: np.ndarray | None = None


def matrixing(samples32: np.ndarray) -> np.ndarray:
    """The NORMATIVE matrixing stage (11172-3 2.4.3.5): 64 values
    V[i] = sum_k cos((16 + i)(2k + 1) pi / 64) * S[k]. The 64x32
    cosine matrix is a constant — built once per process and cached
    (it was rebuilt per granule: 72 np.cos(2048)/doc dominated the
    synthesis profile, ~60% of synthesize() wall)."""
    global _MATRIXING_N
    if _MATRIXING_N is None:
        i = np.arange(64)[:, None]
        k = np.arange(32)[None, :]
        _MATRIXING_N = np.cos((16 + i) * (2 * k + 1) * math.pi / 64)
    return _MATRIXING_N @ np.asarray(samples32, dtype=np.float64)


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
