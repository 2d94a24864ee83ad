"""MPEG-1 Audio Layer III (MP3, ISO/IEC 11172-3) — the BIT layer,
decoded to exact INTEGER frequency lines (VERDICT r13 item 2: by far
the most common audio format a crawl carries; round 13's Layer I/II
landed the frame skeleton, this module adds the Layer III side
information, the bit reservoir, scalefactor decode, and the
big-values / count1 Huffman stage).

Everything up to and including the Huffman-decoded frequency lines
``is[0..575]`` is INTEGER-EXACT by construction (the spec's own
decode output before requantization), so the oracle can state every
line in closed form with zero float drift — the same contract as the
Layer I/II subband numerators. The FLOAT half (x^(4/3)
requantization, stereo processing, alias reduction, hybrid
IMDCT/windowing, polyphase synthesis) is deliberately downstream of
this module's output; synthesis already gates on the unbundled Table
3-C.3 window (mpaudiocodec.register_synthesis_window), and the
Layer III hybrid stage sits behind the same seam.

Scope (each limit gates LOUDLY, the house convention):

* Long blocks only: ``window_switching_flag = 1`` (short/mixed
  blocks, Table 3-B.7 block types) raises by name.
* Huffman tables: the bundled subset is tables 0-3 of Table 3-B.7
  plus both count1 tables (A/B). The linbits/ESC tables (16-31)
  and the remaining small tables raise naming the table id. The
  bundled code data is transcribed from the public spec table; its
  structural invariants (prefix-freeness and Kraft completeness,
  sum 2^-len == 1) are pinned in tests/test_mp3.py so a
  transcription slip cannot silently corrupt decode.
* MPEG-1 only (ID = 1); LSF raises upstream in mpaudiocodec.
* Both channel modes decode (mono; stereo/dual as independent
  channels — ms/intensity stereo PROCESSING is float-side, after
  the integer lines this module stops at).

Reference parity note: the reference pipeline has no media path —
beyond-reference LLM-data frontier, like operators/mpaudiocodec.py.
"""

from __future__ import annotations

import numpy as np

from .mpaudiocodec import MpegAudioError, _Bits

# --------------------------------------------------- Huffman tables
# ISO/IEC 11172-3 Table 3-B.7, tables 0-3 (xy pair codes, no
# linbits) and the count1 tables A/B (vwxy quadruples). Layout:
# {(x, y): (hlen, hcod)}. Structural invariants pinned in tests.
HUFF_XY: dict[int, dict[tuple[int, int], tuple[int, int]]] = {
    0: {},  # table 0: no data — all lines zero
    1: {
        (0, 0): (1, 1), (0, 1): (3, 1), (1, 0): (2, 1), (1, 1): (3, 0),
    },
    2: {
        (0, 0): (1, 1), (0, 1): (3, 2), (0, 2): (6, 1),
        (1, 0): (3, 3), (1, 1): (3, 1), (1, 2): (5, 1),
        (2, 0): (5, 3), (2, 1): (5, 2), (2, 2): (6, 0),
    },
    3: {
        (0, 0): (2, 3), (0, 1): (2, 2), (0, 2): (6, 1),
        (1, 0): (3, 1), (1, 1): (2, 1), (1, 2): (5, 1),
        (2, 0): (5, 3), (2, 1): (5, 2), (2, 2): (6, 0),
    },
}

# count1 tables: quadruple (v, w, x, y), index n = v*8 + w*4 + x*2 + y
_COUNT1_A_LEN = [1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6]
_COUNT1_A_COD = [1, 5, 4, 5, 6, 5, 4, 4, 7, 3, 6, 0, 7, 2, 3, 1]
HUFF_COUNT1: dict[int, dict[tuple[int, int, int, int], tuple[int, int]]] = {
    0: {
        (n >> 3 & 1, n >> 2 & 1, n >> 1 & 1, n & 1): (
            _COUNT1_A_LEN[n], _COUNT1_A_COD[n],
        )
        for n in range(16)
    },
    # table B: every quadruple is 4 bits, code = 15 - n
    1: {
        (n >> 3 & 1, n >> 2 & 1, n >> 1 & 1, n & 1): (4, 15 - n)
        for n in range(16)
    },
}

# slen1/slen2 per scalefac_compress (11172-3 2.4.2.7)
SLEN = [
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3),
]

# Long-block scalefactor-band BOUNDARY indices (Table 3-B.8, the
# cumulative form: line index where each of the 22 bands starts,
# plus the 576 terminator) — needed only to translate
# region0_count/region1_count into line boundaries.
SFB_LONG = {
    44100: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110,
            134, 162, 196, 238, 288, 342, 418, 576],
    48000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106,
            128, 156, 190, 230, 276, 330, 384, 576],
    32000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126,
            156, 194, 240, 296, 364, 448, 550, 576],
}


def _build_decoder(table: dict) -> dict[tuple[int, int], tuple]:
    """(hlen, hcod) -> value, for MSB-first prefix decode."""
    return {(ln, cd): val for val, (ln, cd) in table.items()}


_XY_DECODERS = {t: _build_decoder(tab) for t, tab in HUFF_XY.items()}
_C1_DECODERS = {t: _build_decoder(tab) for t, tab in HUFF_COUNT1.items()}
_MAX_HLEN = 19  # spec bound on any Layer III Huffman code length


def _huff_read(br: _Bits, decoder: dict, what: str):
    """MSB-first canonical prefix decode against a (len, code) map."""
    code = 0
    for ln in range(1, _MAX_HLEN + 1):
        code = (code << 1) | br.read(1)
        hit = decoder.get((ln, code))
        if hit is not None:
            return hit
    raise MpegAudioError(f"unterminated Huffman code in {what}")


class GranuleInfo:
    """Side information + decoded integer lines for one (granule,
    channel)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


class Mp3Frame:
    """One Layer III frame: header fields + per-granule-channel
    GranuleInfo with ``lines`` (int64[576], the spec's is[i])."""

    def __init__(self, sample_rate, bitrate, channels,
                 main_data_begin, granules):
        self.layer = 3
        self.sample_rate = sample_rate
        self.bitrate = bitrate
        self.channels = channels
        self.main_data_begin = main_data_begin
        self.granules = granules  # [granule][channel] -> GranuleInfo


def _parse_side_info(br: _Bits, nch: int) -> tuple[int, list, list]:
    """11172-3 2.4.1.7: main_data_begin, scfsi, and per-(granule,
    channel) side info. Returns (main_data_begin, scfsi, infos)."""
    main_data_begin = br.read(9)
    br.read(5 if nch == 1 else 3)  # private_bits
    scfsi = [[br.read(1) for _ in range(4)] for _ in range(nch)]
    infos: list[list[dict]] = []
    for _g in range(2):
        per_ch = []
        for _ch in range(nch):
            gi = {
                "part2_3_length": br.read(12),
                "big_values": br.read(9),
                "global_gain": br.read(8),
                "scalefac_compress": br.read(4),
                "window_switching_flag": br.read(1),
            }
            if gi["window_switching_flag"]:
                raise NotImplementedError(
                    "Layer III window_switching (short/mixed blocks) "
                    "is outside the implemented subset — long blocks "
                    "only"
                )
            gi["table_select"] = [br.read(5) for _ in range(3)]
            gi["region0_count"] = br.read(4)
            gi["region1_count"] = br.read(3)
            gi["preflag"] = br.read(1)
            gi["scalefac_scale"] = br.read(1)
            gi["count1table_select"] = br.read(1)
            per_ch.append(gi)
        infos.append(per_ch)
    return main_data_begin, scfsi, infos


def _xy_decoder_for(table_id: int):
    if table_id in _XY_DECODERS:
        return _XY_DECODERS[table_id]
    raise NotImplementedError(
        f"Layer III Huffman table {table_id} (ISO/IEC 11172-3 Table "
        "3-B.7) is not bundled — tables 0-3 and count1 A/B are; the "
        "linbits/ESC tables (16-31) and remaining smalls gate here"
    )


def _read_scalefacs(br: _Bits, gi: dict, g: int, scfsi_ch: list,
                    prev: list | None) -> list[int]:
    """Long-block scalefactors (21 bands): slen1 for sfb 0-10, slen2
    for 11-20; in granule 1, scfsi groups copy granule 0's values
    instead of reading bits (2.4.2.7)."""
    slen1, slen2 = SLEN[gi["scalefac_compress"]]
    groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2),
              (16, 21, slen2)]
    out = [0] * 21
    for gidx, (lo, hi, slen) in enumerate(groups):
        if g == 1 and scfsi_ch[gidx]:
            if prev is None:
                raise MpegAudioError("scfsi set with no granule 0")
            out[lo:hi] = prev[lo:hi]
        else:
            for sfb in range(lo, hi):
                out[sfb] = br.read(slen) if slen else 0
    return out


def _decode_granule_lines(br: _Bits, gi: dict, rate: int,
                          start_bit: int) -> np.ndarray:
    """Huffman stage (2.4.2.7): big_values pairs over the three
    regions, then count1 quadruples until part2_3_length is spent;
    remaining lines are the zero region."""
    lines = np.zeros(576, dtype=np.int64)
    bounds = SFB_LONG[rate]
    r0_end = bounds[min(gi["region0_count"] + 1, 22)]
    r1_end = bounds[min(gi["region0_count"] + 1 + gi["region1_count"] + 1,
                        22)]
    big = 2 * gi["big_values"]
    if big > 576:
        raise MpegAudioError(f"big_values {gi['big_values']} exceeds 576/2")
    i = 0
    while i < big:
        if i < r0_end:
            tsel = gi["table_select"][0]
        elif i < r1_end:
            tsel = gi["table_select"][1]
        else:
            tsel = gi["table_select"][2]
        dec = _xy_decoder_for(tsel)
        if not dec:  # table 0: no data, lines stay zero
            i += 2
            continue
        x, y = _huff_read(br, dec, f"big_values table {tsel}")
        if x:
            lines[i] = -x if br.read(1) else x
        if y:
            lines[i + 1] = -y if br.read(1) else y
        i += 2
    c1dec = _C1_DECODERS[gi["count1table_select"]]
    while (
        i + 4 <= 576
        and br.pos - start_bit < gi["part2_3_length"]
    ):
        v, w, x, y = _huff_read(br, c1dec, "count1")
        for val in (v, w, x, y):
            if i >= 576:
                raise MpegAudioError("count1 region exceeds 576 lines")
            if val:
                lines[i] = -val if br.read(1) else val
            i += 1
    return lines


def decode_mp3_frames(
    payload: bytes, frame_infos: list[tuple]
) -> list[Mp3Frame]:
    """Decode the Layer III frames of an elementary stream.
    ``frame_infos``: [(offset, frame_bytes, protection, rate, kbps,
    nch), ...] from the caller's header walk (mpaudiocodec).
    Maintains the BIT RESERVOIR: each frame's main data may begin
    ``main_data_begin`` bytes back in the previous frames' unused
    main-data space (2.4.2.7 main_data_begin)."""
    reservoir = bytearray()
    out: list[Mp3Frame] = []
    for offset, frame_bytes, protection, rate, kbps, nch in frame_infos:
        body = payload[offset : offset + frame_bytes]
        br = _Bits(body)
        br.pos = 32
        if not protection:
            br.read(16)  # CRC over side info: verified by caller
        main_begin, scfsi, infos = _parse_side_info(br, nch)
        side_end = br.pos
        if side_end % 8:
            raise MpegAudioError("side info not byte-aligned")
        main_slot = body[side_end // 8 :]
        if main_begin > len(reservoir):
            raise MpegAudioError(
                f"main_data_begin {main_begin} reaches past the "
                f"reservoir ({len(reservoir)} bytes held)"
            )
        data = bytes(
            reservoir[len(reservoir) - main_begin :] if main_begin else b""
        ) + bytes(main_slot)
        mbr = _Bits(data)
        granules = []
        for g in range(2):
            per_ch = []
            for ch in range(nch):
                gi = infos[g][ch]
                start_bit = mbr.pos
                prev = granules[0][ch].scalefacs if g == 1 else None
                scf = _read_scalefacs(mbr, gi, g, scfsi[ch], prev)
                part2 = mbr.pos - start_bit
                lines = _decode_granule_lines(mbr, gi, rate, start_bit)
                spent = mbr.pos - start_bit
                if spent > gi["part2_3_length"]:
                    raise MpegAudioError(
                        f"granule {g} ch {ch} consumed {spent} bits, "
                        f"part2_3_length is {gi['part2_3_length']}"
                    )
                mbr.pos = start_bit + gi["part2_3_length"]
                per_ch.append(
                    GranuleInfo(
                        scalefacs=scf,
                        part2_bits=part2,
                        lines=lines,
                        **gi,
                    )
                )
            granules.append(per_ch)
        # reservoir update: this frame's unused main-data bytes join
        # the pool; spec bounds the pool at 511 bytes (9-bit pointer)
        reservoir += main_slot
        if len(reservoir) > 511:
            del reservoir[: len(reservoir) - 511]
        out.append(
            Mp3Frame(rate, kbps, nch, main_begin, granules)
        )
    return out
