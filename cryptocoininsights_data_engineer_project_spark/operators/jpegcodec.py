"""Stdlib+numpy JPEG (ITU-T T.81) decoder for the codec seam.

The reference pipeline stores opaque media payloads and defers decode
to downstream consumers (data-extract.py:10-46 ships raw API bytes to
S3 unparsed); this engine's multimodal operators decode payloads on
executors through a pluggable registry (operators/multimodal.py::
register_decoder). PNG/WAV/Y4M decode with real bytes already; this
module closes the format gaps a 100 TB image corpus actually hits:
**baseline JFIF** (SOF0/1) — sequential DCT, Huffman entropy coding,
8-bit samples, grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0
subsampling, restart markers, 0xFF00 byte stuffing — and
**progressive JFIF** (SOF2) — spectral selection (per-scan Ss..Se
bands with EOB-run coding) and successive approximation (Ah/Al
first + refinement scans for both DC and AC), the encoding most
web-crawled JPEGs actually use — plus **12-bit extended
sequential** (SOF1, round 7): level shift 2048, clamp to 4095,
high-byte chop to the uint8 contract — plus **arithmetic-coded
sequential AND progressive** (SOF9/SOF10, round 8): the Annex
D/F QM-coder with the F.1.4 DC/AC statistical models, DAC
conditioning, and G.2's successive-approximation decision models —
plus **lossless arithmetic** (SOF11, round 9): the Annex H 2-D
statistical model over the same QM coder — and **12-bit
progressive** (SOF2/SOF10, round 9) through the shared
reconstruction tail — and **hierarchical (Annex J) pyramids** via
decode_jpeg_hierarchical, where as of round 12 EVERY T.81 frame
type decodes: Huffman sequential/progressive/lossless (SOF0-SOF3,
differential SOF5-SOF7) and arithmetic sequential/progressive/
lossless (SOF9-SOF11, differential SOF13-SOF15). No T.81 operating
mode remains gated.

Decode stages, per the spec:
  segment parse (DQT/SOF0/SOF2/DHT/DRI/SOS, APPn/COM skipped)
  -> canonical Huffman tables (counts-per-length + symbol list)
  -> entropy-decode (baseline: one interleaved scan of DC size+
     amplitude with per-component prediction and AC run/size with
     EOB/ZRL; progressive: coefficients accumulate across scans —
     G.1.2's DC/AC first and refinement procedures — until EOI)
  -> dezigzag -> dequantize -> 2-D IDCT (separable, float64)
  -> level shift +128, clamp to [0, 255]
  -> chroma upsample (sample replication) -> JFIF YCbCr -> RGB.

Everything here is from the public spec; no external codec library.
Performance note: numpy vectorizes the IDCT (one 8x8 matmul pair per
block) but entropy decoding is inherently serial per scan — at corpus
scale the parallelism comes from Spark (one payload per row, decoded
executor-side inside mapInPandas batches), not from within one image.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index -> natural (row-major v*8+u) index, T.81 Figure A.6
ZIGZAG_TO_NATURAL = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)

# IDCT basis: _C[u, x] = c(u)/2 * cos((2x+1) u pi / 16); block idct is
# _C.T @ F @ _C (A.3.3's definition, separably)
_C = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


class JpegError(ValueError):
    """Malformed or unsupported-by-spec-subset JPEG payload."""


class _HuffTable:
    """Canonical Huffman decode table from a DHT segment: 16 counts
    per code length + symbols in code order (T.81 Annex C)."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any real marker (RSTn handled by the caller
    via ``sync_restart``)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            # past a marker: the spec pads with 1-bits (F.2.2.5)
            self.bits = (self.bits << 8) | 0xFF
            self.nbits += 8
            return
        if self.pos >= len(self.data):
            raise JpegError("truncated entropy-coded stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise JpegError("truncated entropy-coded stream")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed literal 0xFF
            else:
                self.marker = nxt
                self.pos += 1
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                return
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code in entropy stream")

    def sync_restart(self, expect: int) -> None:
        """Consume the pending RSTn marker and realign to byte
        boundary (F.2.1.3.1: restart resets DC prediction and the bit
        stream is byte-aligned before the marker)."""
        self.bits = 0
        self.nbits = 0
        if self.marker is None:
            # marker not yet buffered: it must be next in the stream
            if (
                self.data[self.pos] != 0xFF
                or (self.data[self.pos + 1] & 0xF8) != 0xD0
            ):
                raise JpegError("expected restart marker")
            self.marker = self.data[self.pos + 1]
            self.pos += 2
        if self.marker != 0xD0 + expect:
            raise JpegError(
                f"restart marker out of order: got {self.marker:#x}, "
                f"expected {0xD0 + expect:#x}"
            )
        self.marker = None


def _extend(value: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map ``size`` received bits to the signed
    coefficient amplitude."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def decode_jpeg_lossless(payload: bytes):
    """Decode a LOSSLESS (SOF3 Huffman or SOF11 arithmetic) JPEG to
    (width, height, channels,
    samples) with samples an int32 ndarray of shape (h, w, channels)
    holding the exact reconstructed values at full precision (2-16
    bits, point transform applied) — the DICOM/medical contract where
    chopping to 8 bits would defeat the format's purpose. Raises
    JpegError if the payload is not a lossless stream."""
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise JpegError("missing SOI marker")
    try:
        out = _parse_segments(data, raw_lossless=True)
    except (IndexError, KeyError, struct.error) as e:
        raise JpegError(f"truncated or malformed JPEG stream: {e}") from e
    if not isinstance(out[3], np.ndarray):
        raise JpegError("not a lossless (SOF3/SOF11) JPEG stream")
    return out


def _ll_predict(
    p: np.ndarray,
    y: int,
    x: int,
    seg_y: int,
    seg_x: int,
    default: int,
    pred_sel: int,
) -> int:
    """H.1.2.1 predictors 1-7 with H.1.2.2 boundary rules: the first
    sample of the scan/restart segment predicts 2^(P-Pt-1); the rest
    of that line uses Ra; later line starts use Rb."""
    if (y, x) == (seg_y, seg_x):
        return default
    if y == seg_y:
        return int(p[y, x - 1])  # rest of the first line: Ra
    if x == 0:
        return int(p[y - 1, 0])  # line starts: Rb
    ra = int(p[y, x - 1])
    rb = int(p[y - 1, x])
    rc = int(p[y - 1, x - 1])
    if pred_sel == 1:
        return ra
    if pred_sel == 2:
        return rb
    if pred_sel == 3:
        return rc
    if pred_sel == 4:
        return ra + rb - rc
    if pred_sel == 5:
        return ra + ((rb - rc) >> 1)
    if pred_sel == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1


def _decode_lossless_scan(
    data: bytes,
    pos: int,
    width: int,
    height: int,
    comps: list[_Component],
    dc_tables: dict[int, _HuffTable],
    restart_interval: int,
    precision: int,
    pred_sel: int,
    pt: int,
    differential: bool = False,
    return_end: bool = False,
):
    """Lossless (SOF3) scan per T.81 Annex H: each sample is a
    Huffman-coded DIFF (DC-style SSSS category + amplitude bits;
    SSSS=16 means diff=32768 with no extra bits) added to a
    prediction in modulo-65536 arithmetic. Predictors 1-7 (H.1.2.1):
    Ra, Rb, Rc, Ra+Rb-Rc, Ra+((Rb-Rc)>>1), Rb+((Ra-Rc)>>1),
    (Ra+Rb)>>1. Boundary rules (H.1.2.2): the first sample at the
    start of the scan — and of each restart interval — is predicted
    with 2^(P-Pt-1); the remainder of that line uses Ra; the first
    sample of subsequent lines uses Rb. Prediction runs in the
    point-transformed domain; the output is shifted left by Pt.
    Components are sample-interleaved when Ns > 1 (all 1x1).

    ``differential`` selects predictor 0 — Table H.1's "no
    prediction (differential coding only)": the coded diffs ARE the
    output values (mod 2^16, still point-transformed), the
    correction signal a hierarchical SOF7 frame adds to its
    reference. Differential frames shall use Ss = 0 and
    non-differential frames shall not (H.1.2.1)."""
    if differential != (pred_sel == 0):
        raise JpegError(
            f"predictor {pred_sel} invalid for "
            f"{'differential' if differential else 'non-differential'} "
            "lossless frame (T.81 Table H.1)"
        )
    if not 0 <= pred_sel <= 7:
        raise JpegError(f"bad lossless predictor selector {pred_sel}")
    ncomp = len(comps)
    reader = _BitReader(data, pos)
    planes = np.zeros((ncomp, height, width), dtype=np.int32)
    default = 1 << (precision - pt - 1)
    rst_n = 0
    since = 0
    seg_y, seg_x = 0, 0  # where the current restart segment began
    for y in range(height):
        for x in range(width):
            if restart_interval and since == restart_interval:
                reader.sync_restart(rst_n)
                rst_n = (rst_n + 1) & 7
                since = 0
                seg_y, seg_x = y, x
            for ci, c in enumerate(comps):
                p = planes[ci]
                if differential:
                    px = 0
                else:
                    px = _ll_predict(
                        p, y, x, seg_y, seg_x, default, pred_sel
                    )
                ssss = reader.decode_symbol(dc_tables[c.td])
                if ssss == 16:
                    diff = 32768
                elif ssss > 16:
                    raise JpegError(f"bad lossless SSSS {ssss}")
                else:
                    diff = _extend(reader.receive(ssss), ssss)
                p[y, x] = (px + diff) & 0xFFFF
            since += 1
    out = ((planes << pt) & 0xFFFF).transpose(1, 2, 0)
    if return_end:
        return out, _scan_end(reader, data)
    return out


# Lossless arithmetic (SOF11) statistical model, T.81 Annex H.1.4:
# the two-dimensional extension of the F.1.4.1 DC model. The current
# DIFF is conditioned on the classifications of Da (the diff coded
# for the sample to the left) and Db (the diff coded for the sample
# above), each into five categories {0, +S, -S, +L, -L} using the
# DAC (L, U) thresholds applied to the diff's magnitude category —
# exactly the F.1.4.4.1.2 classification the sequential DC model
# applies to its previous diff. 5 x 5 contexts x 4 decision bins
# (zero, sign, SP, SN) = 100, plus TWO magnitude-category/mantissa
# chains of 29 bins each (X2..X16 + one mantissa bin per category),
# selected by whether Db classifies large: 158 bins total.
# Conformance note: T.81 has no public reference implementation of
# this mode (libjpeg never shipped it); the context ordering here
# (ctx = 4*(5*classify(Db) + classify(Da)), chains at 100/129) is
# this module's documented reading of H.1.4, pinned by the
# independent Annex-H encoder round-trips in
# tests/test_jpeg_lossless_arith.py — the same discipline the
# SOF9/SOF10 QM paths use.
LL_STAT_BINS = 158


def _ll_class(d: int, low: int, up: int) -> int:
    """Classify a coded DIFF into {0: zero, 1: +S, 2: -S, 3: +L,
    4: -L} via the magnitude category m = 2^floor(log2(|d| - 1))
    against the DAC thresholds — F.1.4.4.1.2 with sign kept."""
    if d == 0:
        return 0
    sign = 1 if d < 0 else 0
    v1 = (-d if sign else d) - 1
    m = 0 if v1 == 0 else 1 << (v1.bit_length() - 1)
    if m < (1 << low) >> 1:
        return 0
    if m > (1 << up) >> 1:
        return 3 + sign
    return 1 + sign


def _arith_ll_diff(
    dec: "_ArithDecoder", bins: bytearray, ca: int, cb: int
) -> int:
    """Decode one lossless DIFF under context (ca, cb) — the
    F.1.4.4.1 decision sequence (zero? sign? magnitude category,
    mantissa) with the chain selected by Db's class."""
    base = 4 * (5 * cb + ca)
    if dec.decode(bins, base) == 0:
        return 0
    sign = dec.decode(bins, base + 1)
    st = base + 2 + sign  # SP / SN
    m = dec.decode(bins, st)
    if m:
        st = 100 if cb < 3 else 129
        while dec.decode(bins, st):
            m <<= 1
            if m == 0x8000:
                raise JpegError("arithmetic lossless magnitude overflow")
            st += 1
    v = m
    st += 14  # one mantissa bin per magnitude category
    mm = m >> 1
    while mm:
        if dec.decode(bins, st):
            v |= mm
        mm >>= 1
    v += 1
    return -v if sign else v


def _decode_lossless_arith_scan(
    data: bytes,
    pos: int,
    width: int,
    height: int,
    comps: list["_Component"],
    dc_cond: dict[int, tuple[int, int]],
    restart_interval: int,
    precision: int,
    pred_sel: int,
    pt: int,
    differential: bool = False,
    return_end: bool = False,
) -> np.ndarray:
    """Lossless arithmetic (SOF11, differential SOF15) scan: the
    same H.1.2 prediction,
    boundary rules, and modulo-65536 reconstruction as the Huffman
    scan — only the entropy layer differs (QM decisions under the
    Annex-H 2-D statistical model above). Diffs decode as signed
    16-bit values; Da/Db condition each sample from the diffs coded
    for its left and upper neighbours (zero at segment boundaries).
    Restart markers reset the decoder, every statistics area, the
    prediction, and the diff history (the F.1.4.4.3 convention).
    ``differential`` selects predictor 0 (Table H.1: the coded diffs
    ARE the corrections, accumulated mod 65536 by the hierarchical
    caller); the Da/Db conditioning still runs on the coded diffs."""
    if differential != (pred_sel == 0):
        raise JpegError(
            f"lossless predictor selector {pred_sel} invalid for a "
            f"{'differential' if differential else 'non-differential'} "
            "frame (H.1.2.1 / Table H.1)"
        )
    if not 0 <= pred_sel <= 7:
        raise JpegError(f"bad lossless predictor selector {pred_sel}")
    ncomp = len(comps)
    planes = np.zeros((ncomp, height, width), dtype=np.int32)
    default = 1 << (precision - pt - 1)

    def fresh():
        bins = {c.td: bytearray(LL_STAT_BINS) for c in comps}
        # per-component diff history: previous line + current line
        prev = [[0] * width for _ in range(ncomp)]
        cur = [[0] * width for _ in range(ncomp)]
        return bins, prev, cur

    dec = _ArithDecoder(data, pos)
    bins, prev_d, cur_d = fresh()
    rst_n = 0
    since = 0
    seg_y, seg_x = 0, 0
    for y in range(height):
        for x in range(width):
            if restart_interval and since == restart_interval:
                mpos = dec.marker_scan_pos()
                if (
                    mpos + 1 >= len(data)
                    or data[mpos] != 0xFF
                    or data[mpos + 1] != 0xD0 + rst_n
                ):
                    raise JpegError(f"expected RST{rst_n} at offset {mpos}")
                dec = _ArithDecoder(data, mpos + 2)
                bins, prev_d, cur_d = fresh()
                rst_n = (rst_n + 1) & 7
                since = 0
                seg_y, seg_x = y, x
            for ci, c in enumerate(comps):
                p = planes[ci]
                px = (
                    0
                    if differential
                    else _ll_predict(p, y, x, seg_y, seg_x, default, pred_sel)
                )
                low, up = dc_cond.get(c.td, (0, 1))
                da = 0 if (y, x) == (seg_y, seg_x) or (
                    y > seg_y and x == 0
                ) else cur_d[ci][x - 1]
                db = 0 if y == seg_y else prev_d[ci][x]
                diff = _arith_ll_diff(
                    dec,
                    bins[c.td],
                    _ll_class(da, low, up),
                    _ll_class(db, low, up),
                )
                cur_d[ci][x] = diff
                p[y, x] = (px + diff) & 0xFFFF
            since += 1
        # the line's diffs become next line's Db history — but only
        # within the current restart segment (fresh() re-created the
        # lists at a restart, so swapping here is segment-local)
        prev_d, cur_d = cur_d, prev_d
    out = (planes << pt).transpose(1, 2, 0)
    if return_end:
        return out, dec.marker_scan_pos()
    return out


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "pred", "blocks_w", "blocks_h")

    def __init__(self, cid: int, h: int, v: int, tq: int):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.pred = 0


def decode_jpeg_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG to (width, height, channels, pixels):
    channels 1 (grayscale) or 3 (interleaved RGB, JFIF YCbCr
    conversion), pixels row-major bytes (12-bit SOF1 samples are
    chopped to their high byte). Raises JpegError on malformed input
    and NotImplementedError for hierarchical streams (the registry
    seam: swap in libjpeg on a real cluster)."""
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise JpegError("missing SOI marker")
    try:
        return _parse_segments(data)
    except (IndexError, KeyError, struct.error) as e:
        raise JpegError(f"truncated or malformed JPEG stream: {e}") from e


def _parse_dqt(seg: bytes, qtables: dict[int, np.ndarray]) -> None:
    """B.2.4.1 quantization-table segment: 8- or 16-bit entries in
    zigzag order. Shared by the flat and hierarchical walkers."""
    i = 0
    while i < len(seg):
        pq, tq = seg[i] >> 4, seg[i] & 0x0F
        i += 1
        n = 64 * (2 if pq else 1)
        raw = seg[i : i + n]
        vals = struct.unpack(">64H", raw) if pq else list(raw)
        q = np.zeros(64, dtype=np.int32)
        for z, v in enumerate(vals):
            q[ZIGZAG_TO_NATURAL[z]] = v
        qtables[tq] = q.reshape(8, 8)
        i += n


def _parse_dht(
    seg: bytes,
    dc_tables: dict[int, "_HuffTable"],
    ac_tables: dict[int, "_HuffTable"],
) -> None:
    """B.2.4.2 Huffman-table segment. Shared by both walkers."""
    i = 0
    while i < len(seg):
        tc, th = seg[i] >> 4, seg[i] & 0x0F
        counts = list(seg[i + 1 : i + 17])
        nsym = sum(counts)
        symbols = seg[i + 17 : i + 17 + nsym]
        (ac_tables if tc else dc_tables)[th] = _HuffTable(counts, symbols)
        i += 17 + nsym


def _parse_segments(data: bytes, raw_lossless: bool = False):
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _HuffTable] = {}
    ac_tables: dict[int, _HuffTable] = {}
    comps: list[_Component] = []
    width = height = 0
    restart_interval = 0
    precision = 8
    progressive = False
    lossless = False
    ll_arith = False
    arith = False
    dc_cond: dict[int, tuple[int, int]] = {}  # DAC: table id -> (L, U)
    ac_cond: dict[int, int] = {}  # DAC: table id -> Kx
    coefs: list[np.ndarray] = []  # per-comp (blocks_h, blocks_w, 64)
    any_scan = False

    while True:
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at offset {pos}")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — the marker code is the byte after the LAST 0xFF
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if progressive and any_scan:
                return _reconstruct(
                    comps, coefs, qtables, width, height, precision
                )
            raise JpegError("EOI before SOS: no image data")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            _parse_dqt(seg, qtables)
        elif marker == 0xC4:  # DHT
            _parse_dht(seg, dc_tables, ac_tables)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            # SOF0/1 sequential, SOF2 progressive (Huffman);
            # SOF9 extended sequential, SOF10 progressive (arithmetic)
            progressive = marker in (0xC2, 0xCA)
            arith = marker in (0xC9, 0xCA)
            precision = seg[0]
            # SOF0 is 8-bit by definition (T.81 Table B.2);
            # SOF1/SOF9 (extended sequential) and SOF2/SOF10
            # (progressive, round 9) additionally allow 12-bit —
            # level shift 2048, clamp to 4095, high-byte chop to
            # the uint8 contract, all through the shared _finish.
            allowed = (8,) if marker == 0xC0 else (8, 12)
            if precision not in allowed:
                raise NotImplementedError(
                    f"{precision}-bit precision on SOF{marker - 0xC0}: "
                    "8-bit (SOF0) or 8/12-bit (SOF1/SOF2/SOF9/SOF10) "
                    "only — register a libjpeg-backed decoder for the "
                    "rest"
                )
            height, width = struct.unpack(">HH", seg[1:5])
            nf = seg[5]
            if nf not in (1, 3):
                raise NotImplementedError(
                    f"{nf}-component image: only grayscale/YCbCr here"
                )
            for c in range(nf):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(_Component(cid, hv >> 4, hv & 0x0F, tq))
            if progressive:
                hmax = max(c.h for c in comps)
                vmax = max(c.v for c in comps)
                if any(hmax % c.h or vmax % c.v for c in comps):
                    raise NotImplementedError(
                        "fractional chroma sampling ratios: integer-"
                        "ratio subsampling only (4:4:4 / 4:2:2 / 4:2:0)"
                    )
                mcus_x = -(-width // (8 * hmax))
                mcus_y = -(-height // (8 * vmax))
                for c in comps:
                    c.blocks_w = mcus_x * c.h
                    c.blocks_h = mcus_y * c.v
                    coefs.append(
                        np.zeros((c.blocks_h, c.blocks_w, 64), dtype=np.int32)
                    )
        elif marker in (0xC3, 0xCB):  # SOF3/SOF11: lossless sequential
            lossless = True
            ll_arith = marker == 0xCB
            precision = seg[0]
            if not 2 <= precision <= 16:
                raise JpegError(f"bad lossless precision {precision}")
            height, width = struct.unpack(">HH", seg[1:5])
            nf = seg[5]
            if nf > 4:
                raise JpegError(f"{nf} components exceeds T.81 limit")
            for c in range(nf):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(_Component(cid, hv >> 4, hv & 0x0F, tq))
            if any(c.h != 1 or c.v != 1 for c in comps):
                raise NotImplementedError(
                    "lossless with subsampled components: 1x1 "
                    "sampling only (the common DICOM/raw shape)"
                )
        elif marker == 0xDE:  # DHP: hierarchical stream
            raise NotImplementedError(
                "hierarchical (DHP) stream: decode via "
                "decode_jpeg_hierarchical — decode_jpeg_pixels would "
                "silently return only the reduced-resolution first "
                "frame"
            )
        elif marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"differential SOF marker {marker:#x} outside a "
                "hierarchy is malformed; hierarchical streams decode "
                "via decode_jpeg_hierarchical (every T.81 frame type, "
                "Huffman and arithmetic)"
            )
        elif marker == 0xCC:  # DAC: arithmetic conditioning (B.2.4.3)
            if len(seg) % 2:
                raise JpegError(f"odd DAC segment length {len(seg)}")
            i = 0
            while i < len(seg):
                tc, tb = seg[i] >> 4, seg[i] & 0x0F
                cs = seg[i + 1]
                if tc == 0:
                    low, up = cs & 0x0F, cs >> 4
                    if low > up:
                        raise JpegError(f"DAC DC bounds L={low} > U={up}")
                    dc_cond[tb] = (low, up)
                else:
                    if not 1 <= cs <= 63:
                        raise JpegError(f"DAC AC Kx={cs} out of range")
                    ac_cond[tb] = cs
                i += 2
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            by_id = {c.cid: c for c in comps}
            scan_order = []
            for c in range(ns):
                cid, tdta = seg[1 + 2 * c : 3 + 2 * c]
                comp = by_id[cid]
                comp.td, comp.ta = tdta >> 4, tdta & 0x0F
                scan_order.append(comp)
            if lossless:
                pred_sel = seg[1 + 2 * ns]  # Ss = predictor selector
                pt = seg[3 + 2 * ns] & 0x0F  # Al = point transform
                if ll_arith:
                    samples = _decode_lossless_arith_scan(
                        data,
                        pos + seglen,
                        width,
                        height,
                        scan_order,
                        dc_cond,
                        restart_interval,
                        precision,
                        pred_sel,
                        pt,
                    )
                else:
                    samples = _decode_lossless_scan(
                        data,
                        pos + seglen,
                        width,
                        height,
                        scan_order,
                        dc_tables,
                        restart_interval,
                        precision,
                        pred_sel,
                        pt,
                    )
                if raw_lossless:
                    return width, height, len(scan_order), samples
                if precision > 8:  # high-byte chop, the uint8 contract
                    px = (samples >> (precision - 8)).astype(np.uint8)
                else:
                    px = (samples << (8 - precision)).astype(np.uint8)
                return width, height, len(scan_order), px.tobytes()
            if arith and progressive:
                pos = _decode_progressive_arith_scan(
                    data,
                    pos + seglen,
                    comps,
                    scan_order,
                    coefs,
                    seg[1 + 2 * ns],
                    seg[2 + 2 * ns],
                    seg[3 + 2 * ns] >> 4,
                    seg[3 + 2 * ns] & 0x0F,
                    dc_cond,
                    ac_cond,
                    restart_interval,
                    width,
                    height,
                )
                any_scan = True
                continue
            if arith:
                if ns != len(comps):
                    raise NotImplementedError(
                        "non-interleaved multi-scan arithmetic not supported"
                    )
                return _decode_arith_scan(
                    data,
                    pos + seglen,
                    width,
                    height,
                    scan_order,
                    qtables,
                    dc_cond,
                    ac_cond,
                    restart_interval,
                    precision,
                )
            if not progressive:
                if ns != len(comps):
                    raise NotImplementedError(
                        "non-interleaved multi-scan baseline not supported"
                    )
                pos = pos + seglen
                return _decode_scan(
                    data,
                    pos,
                    width,
                    height,
                    scan_order,
                    qtables,
                    dc_tables,
                    ac_tables,
                    restart_interval,
                    precision,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            pos = _decode_progressive_scan(
                data,
                pos + seglen,
                comps,
                scan_order,
                coefs,
                ss,
                se,
                ah,
                al,
                dc_tables,
                ac_tables,
                restart_interval,
                width,
                height,
            )
            any_scan = True
            continue
        # APPn / COM / anything else: skip
        pos += seglen


def _decode_scan(
    data: bytes,
    pos: int,
    width: int,
    height: int,
    comps: list[_Component],
    qtables: dict[int, np.ndarray],
    dc_tables: dict[int, _HuffTable],
    ac_tables: dict[int, _HuffTable],
    restart_interval: int,
    precision: int = 8,
    raw_planes: bool = False,
    differential: bool = False,
) -> tuple[int, int, int, bytes]:
    if width == 0 or height == 0:
        raise JpegError("SOS before SOF: image dimensions unknown")
    if len(comps) == 1:
        # non-interleaved single-component scan: MCU = one data unit
        # over the component's full-resolution block grid (F.2.1.2) —
        # the declared sampling factors don't scale anything
        comps[0].h = comps[0].v = 1
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    if any(hmax % c.h or vmax % c.v for c in comps):
        raise NotImplementedError(
            "fractional chroma sampling ratios: integer-ratio "
            "subsampling only (4:4:4 / 4:2:2 / 4:2:0)"
        )
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    planes = []
    for c in comps:
        c.blocks_w = mcus_x * c.h
        c.blocks_h = mcus_y * c.v
        planes.append(
            np.zeros((c.blocks_h * 8, c.blocks_w * 8), dtype=np.float64)
        )

    reader = _BitReader(data, pos)
    coeffs = np.zeros(64, dtype=np.int32)
    rst_n = 0
    mcus_since_restart = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcus_since_restart == restart_interval:
                reader.sync_restart(rst_n)
                rst_n = (rst_n + 1) & 7
                mcus_since_restart = 0
                for c in comps:
                    c.pred = 0
            for ci, c in enumerate(comps):
                dct = dc_tables[c.td]
                act = ac_tables[c.ta]
                q = qtables[c.tq]
                for by in range(c.v):
                    for bx in range(c.h):
                        coeffs[:] = 0
                        size = reader.decode_symbol(dct)
                        diff = _extend(reader.receive(size), size)
                        if differential:
                            # T.81 F.1.1.5.1: in differential frames
                            # the DC prediction is always ZERO — each
                            # block's DC is coded directly, no DPCM
                            # chain (round-10 conformance fix; the
                            # round-9 SOF5 path chained here)
                            coeffs[0] = diff
                        else:
                            c.pred += diff
                            coeffs[0] = c.pred
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(act)
                            run, ssss = rs >> 4, rs & 0x0F
                            if ssss == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise JpegError("AC run past block end")
                            coeffs[ZIGZAG_TO_NATURAL[k]] = _extend(
                                reader.receive(ssss), ssss
                            )
                            k += 1
                        block = _C.T @ (coeffs.reshape(8, 8) * q) @ _C
                        y0 = (my * c.v + by) * 8
                        x0 = (mx * c.h + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcus_since_restart += 1

    if raw_planes:
        # hierarchical caller: signed IDCT planes (no level shift /
        # clamp — those happen on the accumulated reference) + the
        # byte offset where the entropy scan ended
        return planes, _scan_end(reader, data)
    return _finish(planes, comps, hmax, vmax, width, height, precision)


def _finish(
    planes: list[np.ndarray],
    comps: list[_Component],
    hmax: int,
    vmax: int,
    width: int,
    height: int,
    precision: int = 8,
) -> tuple[int, int, int, bytes]:
    """Shared reconstruction tail: level shift + clamp at the SOF
    precision, chroma upsample by sample replication, JFIF
    YCbCr -> RGB (color math at full precision around the precision
    midpoint), then the high-byte chop for 12-bit (libjpeg strip
    convention — keeps the uint8 contract all operators share)."""
    mid = float(1 << (precision - 1))
    top = float((1 << precision) - 1)
    chop = precision - 8
    samples = []
    for ci, c in enumerate(comps):
        p = np.clip(np.round(planes[ci]) + mid, 0, top)
        if c.h != hmax or c.v != vmax:
            p = np.repeat(np.repeat(p, vmax // c.v, axis=0), hmax // c.h, axis=1)
        samples.append(p[:height, :width])

    if len(samples) == 1:
        out = samples[0].astype(np.int32) >> chop
        return width, height, 1, out.astype(np.uint8).tobytes()
    y, cb, cr = samples
    r = y + 1.402 * (cr - mid)
    g = y - 0.344136 * (cb - mid) - 0.714136 * (cr - mid)
    b = y + 1.772 * (cb - mid)
    rgb = np.stack(
        [np.clip(np.round(ch), 0, top).astype(np.int32) >> chop
         for ch in (r, g, b)],
        axis=-1,
    ).astype(np.uint8)
    return width, height, 3, rgb.tobytes()


# --------------------------------------------- progressive (SOF2) decode


def _nonint_grid(c: _Component, width: int, height: int, hmax: int, vmax: int) -> tuple[int, int]:
    """Block grid a NON-interleaved progressive scan iterates: ceil of
    the component's true sample dimensions (T.81 A.2.2) — NOT padded
    to MCU multiples like the interleaved coefficient array."""
    cw = -(-width * c.h // hmax)
    ch = -(-height * c.v // vmax)
    return -(-cw // 8), -(-ch // 8)


def _scan_end(reader: _BitReader, data: bytes) -> int:
    """Byte offset of the next marker after a finished entropy scan
    (skipping padding bits and stuffed 0xFF00s)."""
    if reader.marker is not None:
        return reader.pos - 2
    p = reader.pos
    while p + 1 < len(data) and not (data[p] == 0xFF and data[p + 1] != 0x00):
        p += 1
    return p


def _decode_progressive_scan(
    data: bytes,
    pos: int,
    comps: list[_Component],
    scomps: list[_Component],
    coefs: list[np.ndarray],
    ss: int,
    se: int,
    ah: int,
    al: int,
    dc_tables: dict[int, _HuffTable],
    ac_tables: dict[int, _HuffTable],
    restart_interval: int,
    width: int,
    height: int,
    differential: bool = False,
) -> int:
    """Decode ONE progressive scan into the coefficient accumulators,
    returning the offset of the next marker. Implements T.81 G.1.2:
    DC first/refine (Ss=0), AC first/refine (Ss>0, single component),
    EOB-run coding, restart intervals. ``differential`` (SOF6 inside
    a hierarchy) switches the DC first scan to PRED = 0 per
    F.1.1.5.1; AC semantics are unchanged."""
    if not coefs:
        raise JpegError("SOS before SOF2 in progressive stream")
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    reader = _BitReader(data, pos)
    by_comp = {id(c): coefs[i] for i, c in enumerate(comps)}
    for c in scomps:
        c.pred = 0
    rst_n = 0
    since = 0
    eobrun = 0

    def _restart_due() -> bool:
        return restart_interval and since == restart_interval

    def _do_restart() -> None:
        nonlocal since, rst_n, eobrun
        reader.sync_restart(rst_n)
        rst_n = (rst_n + 1) & 7
        since = 0
        eobrun = 0
        for c in scomps:
            c.pred = 0

    if ss == 0:  # DC scan
        if se != 0:
            raise JpegError("DC scan must have Se=0")
        interleaved = len(scomps) > 1
        if interleaved:
            for _my in range(mcus_y):
                for _mx in range(mcus_x):
                    if _restart_due():
                        _do_restart()
                    for c in scomps:
                        arr = by_comp[id(c)]
                        for by in range(c.v):
                            for bx in range(c.h):
                                _dc_unit(
                                    reader,
                                    arr[_my * c.v + by, _mx * c.h + bx],
                                    c,
                                    dc_tables,
                                    ah,
                                    al,
                                    differential,
                                )
                    since += 1
        else:
            c = scomps[0]
            arr = by_comp[id(c)]
            bw, bh = _nonint_grid(c, width, height, hmax, vmax)
            for by in range(bh):
                for bx in range(bw):
                    if _restart_due():
                        _do_restart()
                    _dc_unit(
                        reader, arr[by, bx], c, dc_tables, ah, al,
                        differential,
                    )
                    since += 1
    else:  # AC scan: exactly one component (B.2.3)
        if len(scomps) != 1:
            raise JpegError("progressive AC scan must be single-component")
        if se > 63 or ss > se:
            raise JpegError("bad spectral band")
        c = scomps[0]
        arr = by_comp[id(c)]
        act = ac_tables[c.ta]
        bw, bh = _nonint_grid(c, width, height, hmax, vmax)
        for by in range(bh):
            for bx in range(bw):
                if _restart_due():
                    _do_restart()
                if ah == 0:
                    eobrun = _ac_first(
                        reader, arr[by, bx], act, ss, se, al, eobrun
                    )
                else:
                    eobrun = _ac_refine(
                        reader, arr[by, bx], act, ss, se, al, eobrun
                    )
                since += 1
    return _scan_end(reader, data)


def _dc_unit(
    reader: _BitReader,
    cb: np.ndarray,
    c: _Component,
    dc_tables: dict[int, _HuffTable],
    ah: int,
    al: int,
    differential: bool = False,
) -> None:
    if ah == 0:  # first DC scan: baseline DIFF coding, point transform
        size = reader.decode_symbol(dc_tables[c.td])
        diff = _extend(reader.receive(size), size)
        if differential:
            # T.81 F.1.1.5.1: DC prediction is zero in differential
            # frames — SOF6 scans code each block's DC directly
            cb[0] = diff << al
        else:
            c.pred += diff
            cb[0] = c.pred << al
    else:  # refinement: one raw bit appends bit Al — the bitwise OR
        # is two's-complement-correct for negative DCs as well (the
        # first scan stored an arithmetic-shift approximation), so
        # the same line serves differential frames' signed DCs
        if reader.read_bit():
            cb[0] |= 1 << al



def _ac_first(
    reader: _BitReader,
    cb: np.ndarray,
    act: _HuffTable,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """G.1.2.2: first AC scan for a band — run/size with EOBn codes;
    new coefficients arrive scaled by 2^Al."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.receive(r)
            return eobrun
        k += r
        if k > se:
            raise JpegError("AC run past band end")
        cb[ZIGZAG_TO_NATURAL[k]] = _extend(reader.receive(s), s) << al
        k += 1
    return 0


def _ac_refine(
    reader: _BitReader,
    cb: np.ndarray,
    act: _HuffTable,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """G.1.2.3: AC refinement — newly-significant coefficients arrive
    as ±2^Al; every already-nonzero coefficient in the band consumes a
    correction bit IN THE ORDER VISITED (history coefficients inside
    zero runs and EOB spans included)."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(act)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    # EOB span INCLUDES the current block: the tail
                    # below still consumes this block's correction
                    # bits, then decrements (G.1.2.3 — unlike the
                    # first-scan EOB, which ends the block outright)
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                # r == 15: ZRL — skip 16 zero-history positions
            else:
                if s != 1:
                    raise JpegError("AC refinement size must be 1")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                z = ZIGZAG_TO_NATURAL[k]
                if cb[z] != 0:
                    if reader.read_bit() and (cb[z] & p1) == 0:
                        cb[z] += p1 if cb[z] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                cb[ZIGZAG_TO_NATURAL[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            z = ZIGZAG_TO_NATURAL[k]
            if cb[z] != 0:
                if reader.read_bit() and (cb[z] & p1) == 0:
                    cb[z] += p1 if cb[z] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


# ------------------------------------------- arithmetic (SOF9) decode
# T.81's second entropy coder: the adaptive binary arithmetic coder of
# Annexes D (encode) / F.2 (decode) — the QM-coder — driving the
# DC/AC statistical models of §F.1.4. Everything below is from the
# published spec: the 113-row probability-estimation state machine
# (Table D.3), the conditional-exchange interval arithmetic, 0xFF00
# byte stuffing with zero-fill past the terminating marker, the
# 5-category DC conditioning on the previous DIFF (DAC L/U bounds),
# and the AC low/high spectral split at Kx. The companion encoder in
# tests/test_jpeg_arith.py is written independently from the encoder
# annex so round-trips cross-check both directions.

# Table D.3: (Qe, next-index-MPS, next-index-LPS, switch-MPS) — plus
# a 114th non-adaptive entry (index 113) the AC sign decision uses
# (F.1.4.3.1: fixed Qe, no estimation).
_ARITH_QE = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1),
    (0x5A1D, 113, 113, 0),  # fixed ~equiprobable bin (AC sign)
)

# a statistics bin is one byte: (estimation-state index << 1) | MPS
_FIXED_BIN = bytearray([113 << 1])

DC_STAT_BINS = 49  # 5 conditioning classes x 4 + X1..X15 + M2..M15
AC_STAT_BINS = 245  # 63 x (EOB, nonzero, X1) + 2 x (X2..X15, M2..M15)


class _ArithDecoder:
    """QM decoder in the value-window formulation: ``a`` is the
    current interval size in (0, 0x10000], ``v`` the code value
    within it; the MPS owns the lower [0, a-Qe) subinterval and the
    LPS the upper [a-Qe, a), with T.81's conditional exchange when
    the MPS subinterval shrinks below Qe. Renormalization doubles
    both until a >= 0x8000, pulling code bits MSB-first from the
    entropy segment (0xFF00 unstuffed; on the terminating marker the
    decoder zero-fills, per F.2.2.3's "pushed out" convention)."""

    __slots__ = ("data", "pos", "a", "v", "_cur", "_nbits", "_ended")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._cur = 0
        self._nbits = 0
        self._ended = False
        self.a = 0x10000
        v = 0
        for _ in range(16):
            v = (v << 1) | self._bit()
        self.v = v

    def _next_byte(self) -> int:
        if self._ended:
            return 0
        d, p = self.data, self.pos
        if p >= len(d):
            self._ended = True
            return 0
        b = d[p]
        if b != 0xFF:
            self.pos = p + 1
            return b
        if p + 1 < len(d) and d[p + 1] == 0x00:
            self.pos = p + 2  # stuffed zero: data byte is 0xFF
            return 0xFF
        self._ended = True  # marker: entropy data ends here
        return 0

    def _bit(self) -> int:
        if self._nbits == 0:
            self._cur = self._next_byte()
            self._nbits = 8
        self._nbits -= 1
        return (self._cur >> self._nbits) & 1

    def marker_scan_pos(self) -> int:
        """Byte offset of the marker that ended (or will end) this
        entropy segment: the next 0xFF not followed by a stuffed 0."""
        d = self.data
        p = self.pos
        while p < len(d):
            if d[p] == 0xFF and (p + 1 >= len(d) or d[p + 1] != 0x00):
                return p
            p += 1
        return len(d)

    def decode(self, bins: bytearray, idx: int) -> int:
        st = bins[idx]
        state = st >> 1
        mps = st & 1
        qe, nmps, nlps, switch = _ARITH_QE[state]
        bottom = self.a - qe
        if self.v < bottom:
            if bottom >= 0x8000:  # fast path: no renorm, no estimation
                self.a = bottom
                return mps
            if bottom < qe:  # conditional exchange: lower half is LPS
                d = mps ^ 1
                if switch:
                    mps ^= 1
                bins[idx] = (nlps << 1) | mps
            else:
                d = mps
                bins[idx] = (nmps << 1) | mps
            self.a = bottom
        else:
            self.v -= bottom
            self.a = qe
            if bottom < qe:  # conditional exchange: upper half is MPS
                d = mps
                bins[idx] = (nmps << 1) | mps
            else:
                d = mps ^ 1
                if switch:
                    mps ^= 1
                bins[idx] = (nlps << 1) | mps
        a = self.a
        v = self.v
        while a < 0x8000:
            a <<= 1
            v = (v << 1) | self._bit()
        self.a = a
        self.v = v
        return d


def _arith_dc_diff(
    dec: _ArithDecoder, bins: bytearray, ctx: int, cond: tuple[int, int]
) -> tuple[int, int]:
    """Decode one DC DIFF per F.1.4.1/F.1.4.4.1: returns (diff,
    next conditioning offset). ``ctx`` is the conditioning offset
    established by the PREVIOUS diff of this component (0 zero /
    4,8 small +- / 12,16 large +-); ``cond`` the DAC (L, U)."""
    low, up = cond
    if dec.decode(bins, ctx) == 0:
        return 0, 0
    sign = dec.decode(bins, ctx + 1)
    st = ctx + 2 + sign  # SP / SN
    m = dec.decode(bins, st)
    if m:
        st = 20  # X1 (shared across conditioning classes)
        while dec.decode(bins, st):
            m <<= 1
            if m == 0x8000:
                raise JpegError("arithmetic DC magnitude overflow")
            st += 1
    # F.1.4.4.1.2: classify THIS diff's category for the next block
    if m < (1 << low) >> 1:
        nctx = 0
    elif m > (1 << up) >> 1:
        nctx = 12 + 4 * sign
    else:
        nctx = 4 + 4 * sign
    v = m
    st += 14  # mantissa bins parallel the magnitude bins
    mm = m >> 1
    while mm:
        if dec.decode(bins, st):
            v |= mm
        mm >>= 1
    v += 1
    return (-v if sign else v), nctx


def _arith_ac_block(
    dec: _ArithDecoder,
    bins: bytearray,
    coeffs: np.ndarray,
    kx: int,
    ss: int = 1,
    se: int = 63,
    al: int = 0,
) -> None:
    """Decode one block's AC coefficients per F.1.4.2/F.1.4.3:
    per-k (EOB?, nonzero?, X1) bin trios, fixed-bin sign, and the
    magnitude-category chains split low/high at Kx. ``ss/se/al``
    generalize the same model to a progressive band's first scan
    (G.2.3: identical statistics, coefficients arrive scaled by
    2^Al); the sequential scan is the (1, 63, 0) instance."""
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(bins, st):  # EOB
            return
        while dec.decode(bins, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise JpegError("arithmetic AC run past band end")
        sign = dec.decode(_FIXED_BIN, 0)
        st += 2  # X1 for this k
        m = dec.decode(bins, st)
        if m:
            if dec.decode(bins, st):
                m = 2
                st = 189 if k <= kx else 217  # X2, low/high band
                while dec.decode(bins, st):
                    m <<= 1
                    if m == 0x8000:
                        raise JpegError(
                            "arithmetic AC magnitude overflow"
                        )
                    st += 1
        v = m
        st += 14
        mm = m >> 1
        while mm:
            if dec.decode(bins, st):
                v |= mm
            mm >>= 1
        v += 1
        coeffs[ZIGZAG_TO_NATURAL[k]] = (-v if sign else v) << al
        k += 1


def _arith_ac_refine_block(
    dec: _ArithDecoder,
    bins: bytearray,
    coeffs: np.ndarray,
    ss: int,
    se: int,
    al: int,
) -> None:
    """G.2.4 (jdarith's Figure G.10 reading): AC successive-
    approximation refinement — per k an EOB decision only past the
    previous scans' last nonzero index (kex), a correction decision
    at the trio's third bin for already-nonzero coefficients, a
    newly-significant decision at the second bin with a fixed-bin
    sign for zeros."""
    kex = se
    while kex > 0 and coeffs[ZIGZAG_TO_NATURAL[kex]] == 0:
        kex -= 1
    p1 = 1 << al
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex and dec.decode(bins, st):  # EOB
            return
        while True:
            nat = ZIGZAG_TO_NATURAL[k]
            cur = coeffs[nat]
            if cur:
                if dec.decode(bins, st + 2):
                    coeffs[nat] = cur - p1 if cur < 0 else cur + p1
                break
            if dec.decode(bins, st + 1):
                coeffs[nat] = -p1 if dec.decode(_FIXED_BIN, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise JpegError("arithmetic AC refinement past band end")
        k += 1


def _decode_arith_scan(
    data: bytes,
    pos: int,
    width: int,
    height: int,
    comps: list["_Component"],
    qtables: dict[int, np.ndarray],
    dc_cond: dict[int, tuple[int, int]],
    ac_cond: dict[int, int],
    restart_interval: int,
    precision: int = 8,
    raw_planes: bool = False,
    differential: bool = False,
) -> tuple[int, int, int, bytes]:
    """Sequential-DCT arithmetic scan (the SOF9 twin of
    ``_decode_scan``): same MCU walk, dequant, IDCT, and
    reconstruction tail; only the entropy layer differs. At a restart
    marker ALL statistics areas, conditioning contexts, and DC
    predictions reset and the decoder re-initializes after the
    marker (F.1.4.4.3). ``differential`` (SOF13 inside a hierarchy):
    DC prediction is zero — the coded DIFF is the coefficient, same
    F.1.1.5.1 rule as the Huffman twin; the conditioning context
    still tracks the previous diff. ``raw_planes`` returns signed
    IDCT planes + the scan-end offset for the hierarchical walker."""
    if width == 0 or height == 0:
        raise JpegError("SOS before SOF: image dimensions unknown")
    if len(comps) == 1:
        comps[0].h = comps[0].v = 1
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    if any(hmax % c.h or vmax % c.v for c in comps):
        raise NotImplementedError(
            "fractional chroma sampling ratios: integer-ratio "
            "subsampling only (4:4:4 / 4:2:2 / 4:2:0)"
        )
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    planes = []
    for c in comps:
        c.blocks_w = mcus_x * c.h
        c.blocks_h = mcus_y * c.v
        planes.append(
            np.zeros((c.blocks_h * 8, c.blocks_w * 8), dtype=np.float64)
        )

    def fresh_stats():
        dc_bins = {c.td: bytearray(DC_STAT_BINS) for c in comps}
        ac_bins = {c.ta: bytearray(AC_STAT_BINS) for c in comps}
        for c in comps:
            c.pred = 0
        return dc_bins, ac_bins, [0] * len(comps)

    dec = _ArithDecoder(data, pos)
    dc_bins, ac_bins, dc_ctx = fresh_stats()
    coeffs = np.zeros(64, dtype=np.int32)
    rst_n = 0
    mcus_since_restart = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcus_since_restart == restart_interval:
                mpos = dec.marker_scan_pos()
                if (
                    mpos + 1 >= len(data)
                    or data[mpos] != 0xFF
                    or data[mpos + 1] != 0xD0 + rst_n
                ):
                    raise JpegError(
                        f"expected RST{rst_n} at offset {mpos}"
                    )
                dec = _ArithDecoder(data, mpos + 2)
                dc_bins, ac_bins, dc_ctx = fresh_stats()
                rst_n = (rst_n + 1) & 7
                mcus_since_restart = 0
            for ci, c in enumerate(comps):
                cond = dc_cond.get(c.td, (0, 1))
                kx = ac_cond.get(c.ta, 5)
                q = qtables[c.tq]
                for by in range(c.v):
                    for bx in range(c.h):
                        coeffs[:] = 0
                        diff, dc_ctx[ci] = _arith_dc_diff(
                            dec, dc_bins[c.td], dc_ctx[ci], cond
                        )
                        if differential:
                            coeffs[0] = diff
                        else:
                            c.pred += diff
                            coeffs[0] = c.pred
                        _arith_ac_block(dec, ac_bins[c.ta], coeffs, kx)
                        block = _C.T @ (coeffs.reshape(8, 8) * q) @ _C
                        y0 = (my * c.v + by) * 8
                        x0 = (mx * c.h + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcus_since_restart += 1

    if raw_planes:
        return planes, dec.marker_scan_pos()
    return _finish(planes, comps, hmax, vmax, width, height, precision)


def _decode_progressive_arith_scan(
    data: bytes,
    pos: int,
    comps: list["_Component"],
    scomps: list["_Component"],
    coefs: list[np.ndarray],
    ss: int,
    se: int,
    ah: int,
    al: int,
    dc_cond: dict[int, tuple[int, int]],
    ac_cond: dict[int, int],
    restart_interval: int,
    width: int,
    height: int,
    differential: bool = False,
) -> int:
    """Decode ONE progressive-arithmetic (SOF10, differential
    SOF14) scan into the
    coefficient accumulators, returning the next-marker offset —
    the QM twin of ``_decode_progressive_scan``. T.81 G.2: DC first
    scans reuse the sequential DC model with DIFFs scaled by 2^Al,
    DC refinements are one fixed-bin decision per block, AC first
    scans reuse the sequential AC model over [Ss, Se], AC
    refinements follow ``_arith_ac_refine_block``. Statistics areas
    initialize per scan and at every restart marker."""
    if not coefs:
        raise JpegError("SOS before SOF in progressive stream")
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    by_comp = {id(c): coefs[i] for i, c in enumerate(comps)}

    def fresh():
        for c in scomps:
            c.pred = 0
        return (
            _ArithDecoder(data, pos_holder[0]),
            {c.td: bytearray(DC_STAT_BINS) for c in scomps},
            {c.ta: bytearray(AC_STAT_BINS) for c in scomps},
            [0] * len(scomps),
        )

    pos_holder = [pos]
    dec, dc_bins, ac_bins, dc_ctx = fresh()
    rst_n = 0
    since = 0

    def maybe_restart():
        nonlocal dec, dc_bins, ac_bins, dc_ctx, rst_n, since
        if restart_interval and since == restart_interval:
            mpos = dec.marker_scan_pos()
            if (
                mpos + 1 >= len(data)
                or data[mpos] != 0xFF
                or data[mpos + 1] != 0xD0 + rst_n
            ):
                raise JpegError(f"expected RST{rst_n} at offset {mpos}")
            pos_holder[0] = mpos + 2
            dec, dc_bins, ac_bins, dc_ctx = fresh()
            rst_n = (rst_n + 1) & 7
            since = 0

    if ss == 0:  # DC scan
        if se != 0:
            raise JpegError("DC scan must have Se=0")

        def dc_unit(ci, c, cb):
            if ah == 0:
                diff, dc_ctx[ci] = _arith_dc_diff(
                    dec, dc_bins[c.td], dc_ctx[ci], dc_cond.get(c.td, (0, 1))
                )
                if differential:
                    # F.1.1.5.1 twin: prediction is zero in
                    # differential frames
                    cb[0] = diff << al
                else:
                    c.pred += diff
                    cb[0] = c.pred << al
            elif dec.decode(_FIXED_BIN, 0):
                cb[0] |= 1 << al

        if len(scomps) > 1:  # interleaved
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    maybe_restart()
                    for ci, c in enumerate(scomps):
                        arr = by_comp[id(c)]
                        for by in range(c.v):
                            for bx in range(c.h):
                                dc_unit(
                                    ci, c, arr[my * c.v + by, mx * c.h + bx]
                                )
                    since += 1
        else:
            c = scomps[0]
            arr = by_comp[id(c)]
            bw, bh = _nonint_grid(c, width, height, hmax, vmax)
            for by in range(bh):
                for bx in range(bw):
                    maybe_restart()
                    dc_unit(0, c, arr[by, bx])
                    since += 1
    else:  # AC scan: single component (B.2.3)
        if len(scomps) != 1:
            raise JpegError("progressive AC scan must be single-component")
        if se > 63 or ss > se:
            raise JpegError("bad spectral band")
        c = scomps[0]
        arr = by_comp[id(c)]
        kx = ac_cond.get(c.ta, 5)
        bw, bh = _nonint_grid(c, width, height, hmax, vmax)
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                if ah == 0:
                    _arith_ac_block(
                        dec, ac_bins[c.ta], arr[by, bx], kx, ss, se, al
                    )
                else:
                    _arith_ac_refine_block(
                        dec, ac_bins[c.ta], arr[by, bx], ss, se, al
                    )
                since += 1
    return dec.marker_scan_pos()


def _reconstruct(
    comps: list[_Component],
    coefs: list[np.ndarray],
    qtables: dict[int, np.ndarray],
    width: int,
    height: int,
    precision: int = 8,
) -> tuple[int, int, int, bytes]:
    """Dequantize + IDCT every accumulated coefficient block (one
    vectorized einsum per component) and hand off to the shared
    reconstruction tail."""
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    planes = _coef_planes(comps, coefs, qtables)
    return _finish(planes, comps, hmax, vmax, width, height, precision)


def _coef_planes(
    comps: list[_Component],
    coefs: list[np.ndarray],
    qtables: dict[int, np.ndarray],
) -> list[np.ndarray]:
    """Accumulated progressive coefficients -> signed spatial planes
    (no level shift / clamp — shared by the flat reconstruction and
    the hierarchical SOF6 frame finalizer)."""
    planes = []
    for ci, c in enumerate(comps):
        q = qtables[c.tq].astype(np.float64)
        bh, bw = c.blocks_h, c.blocks_w
        # coefficients were stored in NATURAL order during decode
        # (written through ZIGZAG_TO_NATURAL), so a reshape dezigzags
        nat = coefs[ci].reshape(bh, bw, 64).astype(np.float64)
        deq = nat.reshape(bh, bw, 8, 8) * q[None, None, :, :]
        blocks = np.einsum("ux,ijuv,vy->ijxy", _C, deq, _C)
        planes.append(blocks.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    return planes


# ------------------------------------------------- hierarchical (Annex J)
# The pyramid mode: a DHP segment declares the full-resolution frame,
# a first NON-differential frame decodes at (possibly) reduced
# resolution, and each later DIFFERENTIAL frame (SOF5 here) adds a
# correction image to the reference — optionally after an EXP marker
# doubles the reference horizontally/vertically with the Annex-J
# bilinear filter (even samples copied, odd samples (a+b+1)>>1, edge
# repeated). Scope: sequential HUFFMAN frames with 1x1 sampling —
# the DICOM/archival shape. Round 9 added differential progressive
# (SOF6) and differential lossless (SOF7); round 12 added every
# arithmetic frame type (SOF9-SOF11, SOF13-SOF15) and the SOF3
# non-differential lossless base — all of Table B.1's frame types
# now decode inside a pyramid. Convention notes
# (documented, mirrored by the independent encoder in
# tests/test_jpeg_hierarchical.py): each stage's output is rounded
# and clamped to [0, 2^P - 1] before becoming the next reference;
# differential frames apply no level shift.


def _expand_ref(p: np.ndarray, eh: int, ev: int) -> np.ndarray:
    """J.1.1.2 reference expansion: double along each requested axis
    — even outputs copy inputs, odd outputs interpolate
    (a + b + 1) >> 1, the final odd sample repeating the edge."""
    if eh:
        h, w = p.shape
        out = np.zeros((h, 2 * w), dtype=p.dtype)
        out[:, 0::2] = p
        if w > 1:
            out[:, 1 : 2 * w - 1 : 2] = (p[:, :-1] + p[:, 1:] + 1) >> 1
        out[:, 2 * w - 1] = p[:, -1]
        p = out
    if ev:
        h, w = p.shape
        out = np.zeros((2 * h, w), dtype=p.dtype)
        out[0::2, :] = p
        if h > 1:
            out[1 : 2 * h - 1 : 2, :] = (p[:-1, :] + p[1:, :] + 1) >> 1
        out[2 * h - 1, :] = p[-1, :]
        p = out
    return p


def decode_jpeg_hierarchical(payload: bytes):
    """Decode a HIERARCHICAL (DHP) JPEG to (width, height, channels,
    samples) with samples an int32 ndarray of shape (h, w, channels)
    at full precision (2-12 bit DCT range) — the progressive-
    transmission / DICOM pyramid contract. Raises JpegError if the
    stream carries no DHP segment."""
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise JpegError("missing SOI marker")
    try:
        return _decode_hier(data)
    except (IndexError, KeyError, struct.error) as e:
        raise JpegError(f"truncated or malformed JPEG stream: {e}") from e


def _decode_hier(data: bytes):
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _HuffTable] = {}
    ac_tables: dict[int, _HuffTable] = {}
    dc_cond: dict[int, tuple[int, int]] = {}
    ac_cond: dict[int, int] = {}
    restart_interval = 0
    precision = None
    full_w = full_h = None
    ncomp = None
    refs: list[np.ndarray] | None = None
    pending_exp = (0, 0)
    # single-scan frame awaiting its SOS:
    # ("seq" | "lossless", differential, fw, fh, comps, arith)
    frame = None
    # multi-scan progressive frame (SOF2/SOF6) accumulating
    # coefficients until the next frame-level marker
    prog: dict | None = None
    pos = 2

    def _finalize_prog():
        """Reconstruct a pending progressive frame: dequantize + IDCT
        the accumulated coefficients and fold the signed planes into
        the reference pyramid — differential frames ADD (SOF6),
        non-differential frames level-shift (SOF2 as first frame)."""
        nonlocal refs, prog
        if prog is None:
            return
        top = (1 << precision) - 1
        planes = _coef_planes(prog["comps"], prog["coefs"], qtables)
        rounded = [
            np.round(pl[: prog["fh"], : prog["fw"]]).astype(np.int64)
            for pl in planes
        ]
        if prog["differential"]:
            refs = [np.clip(r + d, 0, top) for r, d in zip(refs, rounded)]
        else:
            mid = 1 << (precision - 1)
            refs = [np.clip(d + mid, 0, top) for d in rounded]
        prog = None

    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at offset {pos}")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1  # B.1.1.2 fill bytes before the marker code
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            _finalize_prog()
            if refs is None:
                raise JpegError("EOI before any hierarchical frame")
            if refs[0].shape != (full_h, full_w):
                raise JpegError(
                    f"final reference {refs[0].shape} != DHP "
                    f"{(full_h, full_w)}"
                )
            top = (1 << precision) - 1
            out = np.stack(
                [np.clip(r, 0, top).astype(np.int32) for r in refs],
                axis=-1,
            )
            return full_w, full_h, ncomp, out
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            _parse_dqt(seg, qtables)
        elif marker == 0xC4:  # DHT
            _parse_dht(seg, dc_tables, ac_tables)
        elif marker == 0xCC:  # DAC: arithmetic conditioning (B.2.4.3)
            if len(seg) % 2:
                raise JpegError(f"odd DAC segment length {len(seg)}")
            i = 0
            while i < len(seg):
                tc, tb = seg[i] >> 4, seg[i] & 0x0F
                cs = seg[i + 1]
                if tc == 0:
                    low, up = cs & 0x0F, cs >> 4
                    if low > up:
                        raise JpegError(f"DAC DC bounds L={low} > U={up}")
                    dc_cond[tb] = (low, up)
                else:
                    if not 1 <= cs <= 63:
                        raise JpegError(f"DAC AC Kx={cs} out of range")
                    ac_cond[tb] = cs
                i += 2
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDE:  # DHP
            if full_w is not None:
                raise JpegError("multiple DHP segments")
            precision = seg[0]
            if not 2 <= precision <= 12:
                raise NotImplementedError(
                    f"{precision}-bit hierarchical: DCT precisions only"
                )
            full_h, full_w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            for c in range(ncomp):
                hv = seg[7 + 3 * c]
                if hv != 0x11:
                    raise NotImplementedError(
                        "hierarchical with subsampled components: "
                        "1x1 sampling only"
                    )
        elif marker == 0xDF:  # EXP
            _finalize_prog()
            pending_exp = (seg[0] >> 4, seg[0] & 0x0F)
            if pending_exp[0] > 1 or pending_exp[1] > 1:
                raise JpegError(f"bad EXP fields {seg[0]:#x}")
            # (0, 0) is syntactically valid per B.3.3: a no-op
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            _finalize_prog()
            if full_w is None:
                raise JpegError(
                    "hierarchical frame before DHP — use "
                    "decode_jpeg_pixels for non-hierarchical streams"
                )
            differential = marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF)
            arith = marker in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
            if seg[0] != precision:
                raise JpegError(
                    f"frame precision {seg[0]} != DHP {precision}"
                )
            fh, fw = struct.unpack(">HH", seg[1:5])
            if seg[5] != ncomp:
                raise JpegError("frame component count != DHP")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                if hv != 0x11:
                    raise NotImplementedError(
                        "hierarchical with subsampled components: "
                        "1x1 sampling only"
                    )
                comps.append(_Component(cid, 1, 1, tq))
            if differential and refs is None:
                raise JpegError("differential frame with no reference")
            if not differential and refs is not None:
                raise NotImplementedError(
                    "multiple non-differential hierarchical frames"
                )
            if pending_exp != (0, 0):
                if refs is None:
                    raise JpegError("EXP before any reference exists")
                refs = [
                    _expand_ref(r, pending_exp[0], pending_exp[1])
                    for r in refs
                ]
                pending_exp = (0, 0)
            if refs is not None:
                if refs[0].shape[0] < fh or refs[0].shape[1] < fw:
                    raise JpegError(
                        f"reference {refs[0].shape} smaller than "
                        f"frame {(fh, fw)}"
                    )
                refs = [r[:fh, :fw] for r in refs]
            if marker in (0xC2, 0xC6, 0xCA, 0xCE):  # progressive
                bw_, bh_ = -(-fw // 8), -(-fh // 8)
                for c in comps:
                    c.blocks_w, c.blocks_h = bw_, bh_
                prog = {
                    "differential": differential,
                    "arith": arith,
                    "fw": fw,
                    "fh": fh,
                    "comps": comps,
                    "coefs": [
                        np.zeros((bh_, bw_, 64), dtype=np.int32)
                        for _ in comps
                    ],
                }
                frame = None
            elif marker in (0xC3, 0xC7, 0xCB, 0xCF):  # lossless
                frame = ("lossless", differential, fw, fh, comps, arith)
            else:
                frame = ("seq", differential, fw, fh, comps, arith)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if prog is not None:  # one scan of a progressive frame
                by_id = {c.cid: c for c in prog["comps"]}
                scomps = []
                for c in range(ns):
                    cid, tdta = seg[1 + 2 * c : 3 + 2 * c]
                    comp = by_id[cid]
                    comp.td, comp.ta = tdta >> 4, tdta & 0x0F
                    scomps.append(comp)
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
                if prog["arith"]:
                    pos = _decode_progressive_arith_scan(
                        data,
                        pos + seglen,
                        prog["comps"],
                        scomps,
                        prog["coefs"],
                        ss,
                        se,
                        ah,
                        al,
                        dc_cond,
                        ac_cond,
                        restart_interval,
                        prog["fw"],
                        prog["fh"],
                        differential=prog["differential"],
                    )
                else:
                    pos = _decode_progressive_scan(
                        data,
                        pos + seglen,
                        prog["comps"],
                        scomps,
                        prog["coefs"],
                        ss,
                        se,
                        ah,
                        al,
                        dc_tables,
                        ac_tables,
                        restart_interval,
                        prog["fw"],
                        prog["fh"],
                        differential=prog["differential"],
                    )
                continue
            if frame is None:
                raise JpegError("SOS with no pending hierarchical frame")
            kind, differential, fw, fh, comps, arith = frame
            if ns != len(comps):
                raise NotImplementedError(
                    "non-interleaved hierarchical scans: every "
                    "single-scan frame must code all its components "
                    "in one scan here (progressive frames may split)"
                )
            by_id = {c.cid: c for c in comps}
            scan_order = []
            for c in range(ns):
                cid, tdta = seg[1 + 2 * c : 3 + 2 * c]
                comp = by_id[cid]
                comp.td, comp.ta = tdta >> 4, tdta & 0x0F
                scan_order.append(comp)
            if kind == "lossless":  # SOF3/SOF7/SOF11/SOF15
                pred_sel = seg[1 + 2 * ns]  # Ss (0 iff differential)
                pt = seg[3 + 2 * ns] & 0x0F  # Al = point transform
                decode_ll = (
                    _decode_lossless_arith_scan if arith
                    else _decode_lossless_scan
                )
                samples, scan_end = decode_ll(
                    data,
                    pos + seglen,
                    fw,
                    fh,
                    scan_order,
                    dc_cond if arith else dc_tables,
                    restart_interval,
                    precision,
                    pred_sel,
                    pt,
                    differential=differential,
                    return_end=True,
                )
                if differential:
                    # J: differential lossless corrections accumulate
                    # in modulo-2^16 arithmetic; the EOI clamp
                    # produces the final [0, 2^P - 1] output
                    refs = [
                        (r + samples[:, :, ci].astype(np.int64)) & 0xFFFF
                        for ci, r in enumerate(refs)
                    ]
                else:
                    # lossless base frame: absolute full-precision
                    # samples become the reference directly
                    refs = [
                        samples[:, :, ci].astype(np.int64)
                        for ci in range(len(comps))
                    ]
                frame = None
                pos = scan_end
                continue
            if arith:
                planes, scan_end = _decode_arith_scan(
                    data,
                    pos + seglen,
                    fw,
                    fh,
                    scan_order,
                    qtables,
                    dc_cond,
                    ac_cond,
                    restart_interval,
                    precision,
                    raw_planes=True,
                    differential=differential,
                )
            else:
                planes, scan_end = _decode_scan(
                    data,
                    pos + seglen,
                    fw,
                    fh,
                    scan_order,
                    qtables,
                    dc_tables,
                    ac_tables,
                    restart_interval,
                    precision,
                    raw_planes=True,
                    differential=differential,
                )
            top = (1 << precision) - 1
            rounded = [
                np.round(p[:fh, :fw]).astype(np.int64) for p in planes
            ]
            if differential:
                refs = [
                    np.clip(r + d, 0, top) for r, d in zip(refs, rounded)
                ]
            else:
                mid = 1 << (precision - 1)
                refs = [np.clip(d + mid, 0, top) for d in rounded]
            frame = None
            pos = scan_end
            continue
        pos += seglen
    raise JpegError("missing EOI marker")
