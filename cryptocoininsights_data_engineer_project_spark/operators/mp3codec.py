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

* ALL window shapes decode (VERDICT r14 item 1): long blocks AND
  ``window_switching_flag = 1`` granules — short blocks
  (block_type 2), mixed blocks (mixed_block_flag = 1), and the
  long start/stop windows (block_types 1/3) — with the implied
  region counts, subblock gains, and the short/mixed scalefactor
  layouts of 2.4.2.7. Block-type 0 with window switching set and
  scfsi over a short-block granule are spec violations and raise
  typed errors. (Line REORDERING for short blocks is part of the
  float requantization stage downstream of this module's
  integer-line output, like stereo processing.)
* Huffman tables: the bundled subset is tables 0-3, 5-7 and 9 of
  Table 3-B.7 plus both count1 tables (A/B). The bundled code data
  is transcribed from the public spec table; its structural
  invariants (prefix-freeness and Kraft completeness, sum 2^-len
  == 1) are pinned in tests/test_mp3.py so a transcription slip
  cannot silently corrupt decode. The structural witness DETECTS
  corruption but cannot CERTIFY spec fidelity — completeness is a
  property of any well-formed code page, not a fingerprint of the
  spec's particular one — so pages whose content this build could
  not source confidently stay seamed regardless of validatability:
  table 8 (whose earlier bundling leaned on a Kraft/prefix
  "forced completion" that public reproductions contradict —
  unbundled in r16 per ADVICE rather than shipping a
  plausible-but-unverifiable page), the 8x8 and 16x16 code pages
  (tables 10-13, 15, and the shared pages of the linbits families
  16-23 / 24-31). They gate loudly by table id and install through
  ``register_huffman_table`` (the register_synthesis_window seam
  pattern) — registration runs the SAME Kraft/prefix validation,
  and ``complete=False`` admits a deliberately incomplete spec
  page (prefix-free, Kraft <= 1; an unassigned bit pattern then
  raises the typed unterminated-code error at decode). The
  linbits/ESC *machinery* (value-15 escape + linbits extension
  bits, Table 3-B.7's per-table linbits counts) is fully
  implemented and tested through the seam; only the code-page
  data is seamed. Registered pages ship into Spark python workers
  via the ``snapshot_registered_tables`` hook the decoding
  operators capture at plan-build time (ADVICE r15).
* Tables 4 and 14 are "not used" in the spec and raise as
  reserved.
* MPEG-2 LSF (ID = 0, ISO/IEC 13818-3 — the 16/22.05/24 kHz class
  real podcasts and low-rate crawl audio use) decodes as of r15:
  the one-granule frame layout, the 8-bit main_data_begin (255-byte
  reservoir pool), the 9-bit scalefac_compress with its implied
  preflag, the four-partition LSF scalefactor layouts (long, short,
  mixed, and the intensity-channel 180/244/255 partitioning of
  scalefac_compress >> 1), the LSF long-sfb region tables, and the
  LSF Layer III bitrate column. The NR_OF_SFB_LSF partition-size
  rows carry a built-in fidelity witness (every long row sums to 21
  sfbs, short to 36, mixed to 33 — pinned in tests). MPEG-2.5
  (version bits 00 — the FhG low-rate extension, 8/11.025/12 kHz)
  decodes as of r16 with the same one-granule LSF machinery:
  11.025/12 kHz reuse the 22.05/24 kHz scalefactor-band tables (the
  public-decoder convention), 8 kHz has its own row, and EVERY
  SFB_LONG row is pinned by the widths-sum-to-576 witness. LSF/2.5
  layers I/II decode in mpaudiocodec as of r16.
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
    # tables 5-9 (r15): 4x4 / 6x6 pages, transcribed from the public
    # spec table and validated as COMPLETE prefix codes (Kraft sum
    # 2^-len == 1 AND prefix-freeness) before bundling — a random
    # transcription error passes both checks with negligible
    # probability, so validation doubles as a fidelity witness.
    5: {
        (0, 0): (1, 1), (0, 1): (3, 2), (0, 2): (6, 6), (0, 3): (7, 5),
        (1, 0): (3, 3), (1, 1): (3, 1), (1, 2): (6, 4), (1, 3): (7, 4),
        (2, 0): (6, 7), (2, 1): (6, 5), (2, 2): (7, 7), (2, 3): (8, 1),
        (3, 0): (7, 6), (3, 1): (6, 1), (3, 2): (7, 1), (3, 3): (8, 0),
    },
    6: {
        (0, 0): (3, 7), (0, 1): (3, 3), (0, 2): (5, 5), (0, 3): (7, 1),
        (1, 0): (3, 6), (1, 1): (2, 2), (1, 2): (4, 3), (1, 3): (5, 2),
        (2, 0): (4, 5), (2, 1): (4, 4), (2, 2): (5, 4), (2, 3): (6, 1),
        (3, 0): (6, 3), (3, 1): (5, 3), (3, 2): (6, 2), (3, 3): (7, 0),
    },
    7: {
        (0, 0): (1, 1), (0, 1): (3, 2), (0, 2): (6, 10),
        (0, 3): (8, 19), (0, 4): (8, 16), (0, 5): (9, 10),
        (1, 0): (3, 3), (1, 1): (4, 3), (1, 2): (6, 7),
        (1, 3): (7, 10), (1, 4): (7, 5), (1, 5): (8, 3),
        (2, 0): (6, 11), (2, 1): (5, 4), (2, 2): (7, 13),
        (2, 3): (8, 17), (2, 4): (8, 8), (2, 5): (9, 4),
        (3, 0): (7, 12), (3, 1): (7, 11), (3, 2): (8, 18),
        (3, 3): (9, 15), (3, 4): (9, 11), (3, 5): (9, 2),
        (4, 0): (7, 7), (4, 1): (7, 6), (4, 2): (8, 9),
        (4, 3): (9, 14), (4, 4): (9, 3), (4, 5): (10, 1),
        (5, 0): (8, 6), (5, 1): (8, 4), (5, 2): (9, 5),
        (5, 3): (10, 3), (5, 4): (10, 2), (5, 5): (10, 0),
    },
    # table 8 is NOT bundled (r16, ADVICE r15): the r15 page relied
    # on a Kraft/prefix "forced completion" for its uncertain
    # entries, but completeness assumes the spec page is itself
    # Kraft-complete — public reproductions show longer codes in
    # that region, so the forced page was a guess the structural
    # witness could not falsify. It now gates by id and installs
    # via register_huffman_table (complete=False admits the page if
    # the spec's is genuinely incomplete).
    9: {
        (0, 0): (3, 7), (0, 1): (3, 5), (0, 2): (5, 9),
        (0, 3): (6, 14), (0, 4): (8, 15), (0, 5): (9, 7),
        (1, 0): (3, 6), (1, 1): (3, 4), (1, 2): (4, 5),
        (1, 3): (5, 5), (1, 4): (6, 6), (1, 5): (8, 7),
        (2, 0): (4, 7), (2, 1): (4, 6), (2, 2): (5, 8),
        (2, 3): (6, 8), (2, 4): (7, 8), (2, 5): (8, 5),
        (3, 0): (6, 15), (3, 1): (5, 6), (3, 2): (6, 9),
        (3, 3): (7, 10), (3, 4): (7, 5), (3, 5): (8, 1),
        (4, 0): (7, 11), (4, 1): (6, 7), (4, 2): (7, 9),
        (4, 3): (7, 6), (4, 4): (8, 4), (4, 5): (9, 1),
        (5, 0): (8, 14), (5, 1): (7, 4), (5, 2): (8, 6),
        (5, 3): (8, 2), (5, 4): (9, 6), (5, 5): (9, 0),
    },
}

# Table 3-B.7 linbits counts: tables 16-23 share table 16's code
# page, 24-31 share table 24's — only the linbits width varies.
LINBITS = {
    16: 1, 17: 2, 18: 3, 19: 4, 20: 6, 21: 8, 22: 10, 23: 13,
    24: 4, 25: 5, 26: 6, 27: 7, 28: 8, 29: 9, 30: 11, 31: 13,
}
_RESERVED_TABLES = {4, 14}

# ------------------------------------------------- code-page seam
# Table 8 and the 8x8/16x16 code pages (tables 10-13, 15, and the
# shared pages of 16-23 / 24-31) are free-form spec data this build
# does not bundle (module docstring); a deployment that has the spec
# installs them here — the register_synthesis_window seam pattern,
# with the SAME structural validation the bundled tables pass.
_REGISTERED_XY: dict[int, dict[tuple[int, int], tuple[int, int]]] = {}
# prebuilt (hlen, hcod) -> (x, y) decoders for registered pages,
# built ONCE at registration (ADVICE r15: rebuilding a 256-entry
# decoder per big_values pair is quadratic-ish on table-16 streams)
_REGISTERED_DECODERS: dict[int, dict[tuple[int, int], tuple]] = {}
_REGISTRABLE_IDS = {8, 10, 11, 12, 13, 15, 16, 24}


def _validate_code_page(entries: dict, complete: bool = True) -> None:
    kraft = 0
    seen: set[tuple[int, int]] = set()
    for (x, y), (ln, cd) in entries.items():
        if not (0 <= x <= 15 and 0 <= y <= 15):
            raise MpegAudioError(f"symbol ({x},{y}) out of range")
        if not (1 <= ln <= _MAX_HLEN) or cd >= (1 << ln):
            raise MpegAudioError(f"bad code ({ln},{cd}) for ({x},{y})")
        if (ln, cd) in seen:
            raise MpegAudioError(f"duplicate code ({ln},{cd})")
        seen.add((ln, cd))
        kraft += 1 << (_MAX_HLEN - ln)
    if complete and kraft != (1 << _MAX_HLEN):
        raise MpegAudioError("code page is not Kraft-complete")
    if kraft > (1 << _MAX_HLEN):
        raise MpegAudioError("code page exceeds Kraft capacity")
    items = sorted(seen)
    for i, (l1, c1) in enumerate(items):
        for l2, c2 in items[i + 1:]:
            if l2 > l1 and (c2 >> (l2 - l1)) == c1:
                raise MpegAudioError(
                    f"code ({l1},{c1}) is a prefix of ({l2},{c2})"
                )


def register_huffman_table(
    table_id: int, entries: dict, complete: bool = True
) -> None:
    """Install an unbundled Table 3-B.7 code page:
    ``{(x, y): (hlen, hcod)}``. Accepted ids: 8, 10-13, 15, 16, 24
    (17-23 and 25-31 reuse 16's / 24's page with their own linbits
    count — register the page under 16 or 24 and every member of
    the family decodes). The page must be a prefix code; by default
    it must also be Kraft-COMPLETE — the same check the bundled
    tables pass in tests. Pass ``complete=False`` for a spec page
    that is genuinely incomplete (Kraft sum < 1): decode then
    raises the typed unterminated-code error if the stream selects
    an unassigned bit pattern.

    Module-global registration does NOT reach Spark python workers
    on its own (the webarchive._codec_snapshot gotcha): the
    decoding operators (multimodal/webarchive audio routes) capture
    ``snapshot_registered_tables()`` at plan-build time and
    reinstall it worker-side, so a driver-side registration behaves
    identically in local and cluster mode (ADVICE r15)."""
    if table_id in HUFF_XY or table_id in _RESERVED_TABLES:
        raise MpegAudioError(
            f"table {table_id} is bundled or reserved — not seamable"
        )
    if table_id not in _REGISTRABLE_IDS:
        raise MpegAudioError(
            f"table id {table_id} is not a registrable code page "
            "(8, 10-13, 15, 16, 24)"
        )
    _validate_code_page(entries, complete)
    _REGISTERED_XY[table_id] = dict(entries)
    _REGISTERED_DECODERS[table_id] = _build_decoder(entries)


def snapshot_registered_tables() -> dict:
    """Capture the driver-registered code pages for shipment into
    Spark python workers (the webarchive._codec_snapshot pattern):
    a worker re-imports this module with an EMPTY registry, so every
    operator that decodes Layer III captures this snapshot at
    plan-build time and hands it to ``install_registered_tables``
    inside the worker closure."""
    return {t: dict(p) for t, p in _REGISTERED_XY.items()}


def install_registered_tables(snap: dict) -> None:
    """Worker-side counterpart of ``snapshot_registered_tables``:
    (re)install the snapshot, replacing the registry wholesale.
    Pages were validated at registration; installation rebuilds the
    prebuilt decoders only."""
    _REGISTERED_XY.clear()
    _REGISTERED_DECODERS.clear()
    for t, p in snap.items():
        _REGISTERED_XY[t] = dict(p)
        _REGISTERED_DECODERS[t] = _build_decoder(p)

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
    # MPEG-2 LSF long-block boundaries (13818-3 Table B.2; 22050 and
    # 16000 share one table)
    22050: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140,
            168, 200, 238, 284, 336, 396, 464, 522, 576],
    24000: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 114, 136,
            162, 194, 232, 278, 332, 394, 464, 540, 576],
    16000: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140,
            168, 200, 238, 284, 336, 396, 464, 522, 576],
    # MPEG-2.5 (r16): 11.025/12 kHz reuse the 22.05/24 kHz tables
    # (the public-decoder convention); 8 kHz has its own row. Every
    # row's band widths sum to 576 lines — the transcription witness
    # pinned in tests (all nine rows pass).
    11025: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140,
            168, 200, 238, 284, 336, 396, 464, 522, 576],
    12000: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 114, 136,
            162, 194, 232, 278, 332, 394, 464, 540, 576],
    8000: [0, 12, 24, 36, 48, 60, 72, 88, 108, 132, 160, 192, 232,
           280, 336, 400, 476, 566, 568, 570, 572, 574, 576],
}

# LSF scalefactor partition sizes (13818-3 2.4.3.2): rows indexed by
# the blocknumber the scalefac_compress ranges select, columns by
# block shape (0 = long, 1 = short, 2 = short mixed), entries = the
# number of scalefactor bands read with slen[0..3]. Fidelity witness
# (pinned in tests): every long row sums to 21 sfbs, every short row
# to 36 (12 sfb x 3 windows), every mixed row to 33 (6 long + 9 x 3).
NR_OF_SFB_LSF = {
    0: ([6, 5, 5, 5], [9, 9, 9, 9], [6, 9, 9, 9]),
    1: ([6, 5, 7, 3], [9, 9, 12, 6], [6, 9, 12, 6]),
    2: ([11, 10, 0, 0], [18, 18, 0, 0], [15, 18, 0, 0]),
    3: ([7, 7, 7, 0], [12, 12, 12, 0], [6, 15, 12, 0]),
    4: ([6, 6, 6, 3], [12, 9, 9, 6], [6, 12, 9, 6]),
    5: ([8, 8, 5, 0], [15, 12, 9, 0], [6, 18, 9, 0]),
}


def _lsf_slen_block(sfc: int, intensity: bool) -> tuple[list[int], int, int]:
    """(slen[0..3], blocknumber, preflag) for an LSF granule's
    scalefac_compress (13818-3 2.4.3.2). ``intensity``: the second
    channel of an intensity-stereo pair reads the 180/244/255
    partitioning of scalefac_compress >> 1."""
    if intensity:
        x = sfc >> 1
        if x < 180:
            return [x // 36, (x % 36) // 6, x % 6, 0], 3, 0
        if x < 244:
            x -= 180
            return [(x % 64) >> 3, x % 8, 0, 0], 4, 0
        x -= 244
        return [x // 3, x % 3, 0, 0], 5, 0
    if sfc < 400:
        return (
            [(sfc >> 4) // 5, (sfc >> 4) % 5, (sfc % 16) >> 2, sfc % 4],
            0, 0,
        )
    if sfc < 500:
        x = sfc - 400
        return [(x >> 2) // 5, (x >> 2) % 5, x % 4, 0], 1, 0
    x = sfc - 500
    return [x // 3, x % 3, 0, 0], 2, 1


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


def _parse_side_info(
    br: _Bits, nch: int, lsf: bool = False
) -> tuple[int, list, list]:
    """11172-3 2.4.1.7: main_data_begin, scfsi, and per-(granule,
    channel) side info. Returns (main_data_begin, scfsi, infos).
    The MPEG-2 LSF layout (13818-3 2.4.1.7): 8-bit main_data_begin,
    1/2 private bits, NO scfsi, ONE granule, 9-bit scalefac_compress,
    and no preflag bit (preflag is IMPLIED by the scalefac_compress
    partition — set during scalefactor decode)."""
    main_data_begin = br.read(8 if lsf else 9)
    if lsf:
        br.read(1 if nch == 1 else 2)  # private_bits
        scfsi = [[0] * 4 for _ in range(nch)]
    else:
        br.read(5 if nch == 1 else 3)  # private_bits
        scfsi = [[br.read(1) for _ in range(4)] for _ in range(nch)]
    infos: list[list[dict]] = []
    for _g in range(1 if lsf else 2):
        per_ch = []
        for _ch in range(nch):
            gi = {
                "part2_3_length": br.read(12),
                "big_values": br.read(9),
                "global_gain": br.read(8),
                "scalefac_compress": br.read(9 if lsf else 4),
                "window_switching_flag": br.read(1),
            }
            if gi["window_switching_flag"]:
                # 2.4.1.7 window-switching layout: block_type,
                # mixed_block_flag, TWO table_selects, three
                # subblock gains; region counts are IMPLIED
                # (2.4.2.7): region0 = 8 short-sfb triplets for a
                # pure short block, else 7 long sfbs; region1 runs
                # to the end (no region2).
                gi["block_type"] = br.read(2)
                if gi["block_type"] == 0:
                    raise MpegAudioError(
                        "block_type 0 with window_switching_flag set "
                        "is forbidden (11172-3 2.4.1.7)"
                    )
                gi["mixed_block_flag"] = br.read(1)
                gi["table_select"] = [br.read(5) for _ in range(2)]
                gi["subblock_gain"] = [br.read(3) for _ in range(3)]
                if gi["block_type"] == 2 and not gi["mixed_block_flag"]:
                    gi["region0_count"] = 8
                else:
                    gi["region0_count"] = 7
                gi["region1_count"] = 20 - gi["region0_count"]
            else:
                gi["block_type"] = 0
                gi["mixed_block_flag"] = 0
                gi["subblock_gain"] = [0, 0, 0]
                gi["table_select"] = [br.read(5) for _ in range(3)]
                gi["region0_count"] = br.read(4)
                gi["region1_count"] = br.read(3)
            gi["preflag"] = None if lsf else br.read(1)
            gi["scalefac_scale"] = br.read(1)
            gi["count1table_select"] = br.read(1)
            per_ch.append(gi)
        infos.append(per_ch)
    return main_data_begin, scfsi, infos


def _xy_decoder_for(table_id: int):
    """(decoder, linbits) for a table id: bundled pages directly;
    linbits families 16-23 / 24-31 map to their shared registered
    page; reserved ids are spec violations."""
    if table_id in _RESERVED_TABLES:
        raise MpegAudioError(
            f"Layer III Huffman table {table_id} is reserved "
            "('not used' in Table 3-B.7) — invalid bitstream"
        )
    if table_id in _XY_DECODERS:
        return _XY_DECODERS[table_id], 0
    linbits = LINBITS.get(table_id, 0)
    page_id = table_id if table_id not in LINBITS else (
        16 if table_id < 24 else 24
    )
    dec = _REGISTERED_DECODERS.get(page_id)
    if dec is not None:
        return dec, linbits
    raise NotImplementedError(
        f"Layer III Huffman table {table_id} (ISO/IEC 11172-3 Table "
        "3-B.7) is not bundled — tables 0-3, 5-7 and 9 plus count1 "
        "A/B are; table 8 and the 8x8/16x16 code pages (10-13, 15, "
        "and the shared linbits pages 16/24) install via "
        "register_huffman_table"
    )


def _read_scalefacs(br: _Bits, gi: dict, g: int, scfsi_ch: list,
                    prev: list | None) -> list[int]:
    """Scalefactors (2.4.2.7). Long blocks (block types 0/1/3): 21
    bands, slen1 for sfb 0-10, slen2 for 11-20; in granule 1, scfsi
    groups copy granule 0's values instead of reading bits. Short
    blocks (block_type 2): slen1 for short sfb 0-5 x 3 windows,
    slen2 for 6-11 x 3; the MIXED layout reads long sfb 0-7 first,
    then short sfb 3-5 x 3 — scfsi is long-block-only, so a set
    scfsi group over a short-block granule is a spec violation."""
    slen1, slen2 = SLEN[gi["scalefac_compress"]]
    if gi["window_switching_flag"] and gi["block_type"] == 2:
        if g == 1 and any(scfsi_ch):
            raise MpegAudioError(
                "scfsi set for a short-block granule (scfsi applies "
                "to long blocks only, 11172-3 2.4.2.7)"
            )
        out = []
        if gi["mixed_block_flag"]:
            for _sfb in range(8):  # long sfb 0-7
                out.append(br.read(slen1) if slen1 else 0)
            short_lo = 3
        else:
            short_lo = 0
        for _sfb in range(short_lo, 6):
            for _w in range(3):
                out.append(br.read(slen1) if slen1 else 0)
        for _sfb in range(6, 12):
            for _w in range(3):
                out.append(br.read(slen2) if slen2 else 0)
        return out
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


def _read_scalefacs_lsf(br: _Bits, gi: dict, intensity: bool) -> list[int]:
    """MPEG-2 LSF scalefactors (13818-3 2.4.3.2): four slen
    partitions selected by the scalefac_compress ranges, band counts
    from NR_OF_SFB_LSF by block shape; sets the IMPLIED preflag."""
    slen, blocknumber, preflag = _lsf_slen_block(
        gi["scalefac_compress"], intensity
    )
    if gi["window_switching_flag"] and gi["block_type"] == 2:
        shape = 2 if gi["mixed_block_flag"] else 1
    else:
        shape = 0
    counts = NR_OF_SFB_LSF[blocknumber][shape]
    gi["preflag"] = preflag
    out: list[int] = []
    for part, cnt in enumerate(counts):
        s = slen[part]
        for _ in range(cnt):
            out.append(br.read(s) if s else 0)
    return out


def _decode_granule_lines(br: _Bits, gi: dict, rate: int,
                          start_bit: int) -> np.ndarray:
    """Huffman stage (2.4.2.7): big_values pairs over the three
    regions, then count1 quadruples until part2_3_length is spent;
    remaining lines are the zero region."""
    lines = np.zeros(576, dtype=np.int64)
    bounds = SFB_LONG[rate]
    if gi["window_switching_flag"]:
        # implied regions (2.4.2.7): short blocks bound region0 at
        # line 36 (12 lines x 3 windows); the start/stop long
        # windows use the long-sfb bound l[region0_count + 1] = l[8]
        # (36 at every MPEG-1 rate, 54 at the LSF rates) — and NO
        # region2 either way.
        r0_end = 36 if gi["block_type"] == 2 else bounds[8]
        r1_end = 576
    else:
        r0_end = bounds[min(gi["region0_count"] + 1, 22)]
        r1_end = bounds[
            min(gi["region0_count"] + 1 + gi["region1_count"] + 1, 22)
        ]
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
        dec, linbits = _xy_decoder_for(tsel)
        if not dec:  # table 0: no data, lines stay zero
            i += 2
            continue
        x, y = _huff_read(br, dec, f"big_values table {tsel}")
        # linbits/ESC (Table 3-B.7 families 16-31): value 15 is an
        # escape — extend with linbits more bits BEFORE the sign
        if x == 15 and linbits:
            x += br.read(linbits)
        if x:
            lines[i] = -x if br.read(1) else x
        if y == 15 and linbits:
            y += br.read(linbits)
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
    nch, lsf, intensity_l3), ...] from the caller's header walk
    (mpaudiocodec). Maintains the BIT RESERVOIR: each frame's main
    data may begin ``main_data_begin`` bytes back in the previous
    frames' unused main-data space (2.4.2.7 main_data_begin; the LSF
    pointer is 8 bits, so its pool caps at 255). MPEG-2 LSF frames
    (13818-3) carry ONE granule with the LSF side-info and
    scalefactor layouts; in LSF intensity stereo the second channel
    reads the intensity partitioning of scalefac_compress >> 1."""
    reservoir = bytearray()
    out: list[Mp3Frame] = []
    for (offset, frame_bytes, protection, rate, kbps, nch, lsf,
         intensity_l3) in frame_infos:
        body = payload[offset : offset + frame_bytes]
        br = _Bits(body)
        br.pos = 32
        if not protection:
            br.read(16)  # CRC over side info: verified by caller
        main_begin, scfsi, infos = _parse_side_info(br, nch, lsf)
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
        for g in range(1 if lsf else 2):
            per_ch = []
            for ch in range(nch):
                gi = infos[g][ch]
                start_bit = mbr.pos
                if lsf:
                    scf = _read_scalefacs_lsf(
                        mbr, gi, intensity_l3 and ch == 1
                    )
                else:
                    prev = (
                        granules[0][ch].scalefacs if g == 1 else None
                    )
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
        # the pool; the pointer width bounds the pool (9 bits -> 511
        # bytes; the LSF 8-bit pointer -> 255)
        cap = 255 if lsf else 511
        reservoir += main_slot
        if len(reservoir) > cap:
            del reservoir[: len(reservoir) - cap]
        frame = Mp3Frame(rate, kbps, nch, main_begin, granules)
        frame.lsf = lsf
        out.append(frame)
    return out
