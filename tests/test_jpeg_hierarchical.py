"""Hierarchical (Annex J) JPEG: independent encoder + reference
pyramid math vs the decoder.

Same discipline as the other JPEG suites: the encoder below emits
DHP / EXP / SOF0-SOF1 / SOF5 framing independently of the decoder,
and the EXPECTED image is computed by a separate O(N^4)
definition-IDCT pyramid (math.cos loops, python ints for the
expansion filter) — so framing, entropy coding, reference
expansion, and differential accumulation are all cross-checked.
The stage conventions (round + clamp to [0, 2^P - 1] per stage,
no level shift in differential frames, (a+b+1)>>1 expansion) are
shared by construction and documented at
jpegcodec.decode_jpeg_hierarchical.
"""

from __future__ import annotations

import math
import struct

import pytest

from cryptocoininsights_data_engineer_project_spark.operators.jpegcodec import (
    AC_STAT_BINS,
    DC_STAT_BINS,
    LL_STAT_BINS,
    ZIGZAG_TO_NATURAL,
    JpegError,
    decode_jpeg_hierarchical,
    decode_jpeg_pixels,
)
from tests.test_jpeg import _amp_bits, _canonical, _category, _dht, _Packer
from tests.test_jpeg_arith import ArithEncoder, _encode_ac, _encode_dc
from tests.test_jpeg_lossless_arith import _classify, _encode_ll_diff, _predict

# ------------------------------------------------------------- encoder


def _scan_bytes(
    comps_n, w, h, block_coeffs, dc_codes, ac_codes, differential=False
):
    pk = _Packer()
    pred = [0] * comps_n
    counters = [0] * comps_n
    bw, bh = -(-w // 8), -(-h // 8)
    for _my in range(bh):
        for _mx in range(bw):
            for ci in range(comps_n):
                coeffs = block_coeffs(ci, counters[ci])
                counters[ci] += 1
                if differential:
                    # T.81 F.1.1.5.1: DC prediction is zero in
                    # differential frames — code the DC directly
                    diff = coeffs[0]
                else:
                    diff = coeffs[0] - pred[ci]
                    pred[ci] = coeffs[0]
                c = _category(diff)
                pk.put(*dc_codes[c])
                if c:
                    pk.put(_amp_bits(diff, c), c)
                zz = [coeffs[ZIGZAG_TO_NATURAL[z]] for z in range(64)]
                k = 1
                while k < 64:
                    run = 0
                    while k < 64 and zz[k] == 0:
                        run += 1
                        k += 1
                    if k == 64:
                        pk.put(*ac_codes[0x00])
                        break
                    while run >= 16:
                        pk.put(*ac_codes[0xF0])
                        run -= 16
                    c = _category(zz[k])
                    pk.put(*ac_codes[(run << 4) | c])
                    pk.put(_amp_bits(zz[k], c), c)
                    k += 1
            # 1x1 sampling: one block per component per MCU
    pk.pad_to_byte()
    return bytes(pk.out)


def _prog_dc_scan(comps_n, w, h, block_coeffs, dc_codes, differential,
                  ah, al):
    """Progressive DC scan bytes (first scan at point transform Al,
    or one-bit refinement when Ah > 0) — PRED = 0 in differential
    frames per F.1.1.5.1."""
    pk = _Packer()
    pred = [0] * comps_n
    bw, bh = -(-w // 8), -(-h // 8)
    for b in range(bw * bh):
        for ci in range(comps_n):
            dc = block_coeffs(ci, b)[0]
            if ah == 0:
                v = dc >> al  # arithmetic shift: DC point transform
                if differential:
                    diff = v
                else:
                    diff = v - pred[ci]
                    pred[ci] = v
                c = _category(diff)
                pk.put(*dc_codes[c])
                if c:
                    pk.put(_amp_bits(diff, c), c)
            else:
                pk.put((dc >> al) & 1, 1)
    pk.pad_to_byte()
    return bytes(pk.out)


def _prog_ac_scan(ci, w, h, block_coeffs, ac_codes):
    """Progressive AC first scan (Ss=1..63, no SA) for one component:
    per-block run/size coding, single-block EOB0 terminators."""
    pk = _Packer()
    bw, bh = -(-w // 8), -(-h // 8)
    for b in range(bw * bh):
        coeffs = block_coeffs(ci, b)
        zz = [coeffs[ZIGZAG_TO_NATURAL[z]] for z in range(64)]
        k = 1
        while k < 64:
            run = 0
            while k < 64 and zz[k] == 0:
                run += 1
                k += 1
            if k == 64:
                pk.put(*ac_codes[0x00])  # EOB0: this block only
                break
            while run >= 16:
                pk.put(*ac_codes[0xF0])
                run -= 16
            c = _category(zz[k])
            pk.put(*ac_codes[(run << 4) | c])
            pk.put(_amp_bits(zz[k], c), c)
            k += 1
    pk.pad_to_byte()
    return bytes(pk.out)


def _ll_scan_bytes(comps_n, w, h, samples_fn, dc_codes):
    """Differential lossless (SOF7) scan bytes: every sample's diff
    coded directly (predictor 0 — Table H.1 'no prediction'),
    sample-interleaved."""
    pk = _Packer()
    for y in range(h):
        for x in range(w):
            for ci in range(comps_n):
                diff = samples_fn(ci, y, x)
                c = _category(diff)
                pk.put(*dc_codes[c])
                if c:
                    pk.put(_amp_bits(diff, c), c)
    pk.pad_to_byte()
    return bytes(pk.out)


def _arith_seq_scan(comps_n, w, h, block_coeffs, differential):
    """QM twin of _scan_bytes: one interleaved sequential-arithmetic
    scan, PRED = 0 in differential frames. All components share table
    0, so statistics bins are shared across components (the decoder
    keys bins by table destination) while DC contexts stay
    per-component."""
    enc = ArithEncoder()
    dc_bins = bytearray(DC_STAT_BINS)
    ac_bins = bytearray(AC_STAT_BINS)
    pred = [0] * comps_n
    ctxs = [0] * comps_n
    counters = [0] * comps_n
    bw, bh = -(-w // 8), -(-h // 8)
    for _b in range(bw * bh):
        for ci in range(comps_n):
            coeffs = block_coeffs(ci, counters[ci])
            counters[ci] += 1
            if differential:
                diff = coeffs[0]
            else:
                diff = coeffs[0] - pred[ci]
                pred[ci] = coeffs[0]
            ctxs[ci] = _encode_dc(enc, dc_bins, ctxs[ci], (0, 1), diff)
            zz = [coeffs[ZIGZAG_TO_NATURAL[z]] for z in range(64)]
            _encode_ac(enc, ac_bins, zz, 5)
    return enc.flush()


def _arith_prog_dc_scan(comps_n, w, h, block_coeffs, differential, ah, al):
    enc = ArithEncoder()
    bins = bytearray(DC_STAT_BINS)
    fixed = bytearray([113 << 1])
    pred = [0] * comps_n
    ctxs = [0] * comps_n
    bw, bh = -(-w // 8), -(-h // 8)
    for b in range(bw * bh):
        for ci in range(comps_n):
            dc = block_coeffs(ci, b)[0]
            if ah == 0:
                v = dc >> al
                if differential:
                    diff = v
                else:
                    diff = v - pred[ci]
                    pred[ci] = v
                ctxs[ci] = _encode_dc(enc, bins, ctxs[ci], (0, 1), diff)
            else:
                enc.encode(fixed, 0, (dc >> al) & 1)
    return enc.flush()


def _arith_prog_ac_scan(ci, w, h, block_coeffs):
    """AC first scan over the full band (Ss=1, Se=63, Al=0): the G.2
    model coincides with the sequential AC model there, so the
    sequential encoder path is the correct byte generator."""
    enc = ArithEncoder()
    bins = bytearray(AC_STAT_BINS)
    bw, bh = -(-w // 8), -(-h // 8)
    for b in range(bw * bh):
        coeffs = block_coeffs(ci, b)
        zz = [coeffs[ZIGZAG_TO_NATURAL[z]] for z in range(64)]
        _encode_ac(enc, bins, zz, 5)
    return enc.flush()


def _arith_ll_scan(comps_n, w, h, samples_fn, differential,
                   pred_sel=1, pt=0, precision=8):
    """Annex-H scan bytes for the hierarchy: differential (SOF15,
    predictor 0 — samples_fn returns the signed diff) or
    non-differential (SOF11 base — samples_fn returns the ABSOLUTE
    point-transformed sample; diffs computed against predictor
    ``pred_sel`` with the H.1.2 boundary rules, wrapped to signed
    16-bit as the decoder's mod-65536 reconstruction expects)."""
    enc = ArithEncoder()
    bins = bytearray(LL_STAT_BINS)
    prev = [[0] * w for _ in range(comps_n)]
    cur = [[0] * w for _ in range(comps_n)]
    planes = [[[0] * w for _ in range(h)] for _ in range(comps_n)]
    default = 1 << (precision - pt - 1)
    for y in range(h):
        for x in range(w):
            for ci in range(comps_n):
                if differential:
                    diff = samples_fn(ci, y, x)
                else:
                    v = samples_fn(ci, y, x) & 0xFFFF
                    px = _predict(planes[ci], y, x, 0, 0, default, pred_sel)
                    diff = ((v - px + 0x8000) & 0xFFFF) - 0x8000
                    planes[ci][y][x] = v
                da = 0 if (y, x) == (0, 0) or (y > 0 and x == 0) \
                    else cur[ci][x - 1]
                db = 0 if y == 0 else prev[ci][x]
                _encode_ll_diff(
                    enc, bins, _classify(da, 0, 1), _classify(db, 0, 1), diff
                )
                cur[ci][x] = diff
        prev, cur = cur, prev
    return enc.flush()


def encode_hierarchical(full_w, full_h, ncomp, qtable, precision, stages):
    """DHP + frame sequence. ``stages``: list of dicts with keys
    diff (bool), w, h, exp ((eh, ev) or None), and per mode:

    - mode "seq" (default): coeffs (fn(ci, block_idx) -> 64
      natural-order ints) — SOF0/SOF1 or differential SOF5;
    - mode "prog": same coeffs, coded as SOF2/SOF6 progressive —
      a DC scan then one AC scan per component, or an explicit
      "scans" list of (ss, se, ah, al) tuples (DC first/refine and
      AC first supported);
    - mode "lossless": samples (fn(ci, y, x) -> signed diff in the
      point-transformed domain) + optional pt — differential SOF7."""
    dc_syms = list(range(16))
    ac_syms = sorted(
        {(r << 4) | s for r in range(16) for s in range(15)}
        | {0x00, 0xF0}
    )
    dc_counts, dc_codes = _canonical(dc_syms)
    ac_counts, ac_codes = _canonical(ac_syms)

    out = bytearray(b"\xff\xd8")
    zz_q = bytes(qtable[ZIGZAG_TO_NATURAL[z]] for z in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q
    dhp = bytes([precision]) + struct.pack(">HH", full_h, full_w)
    dhp += bytes([ncomp])
    for ci in range(ncomp):
        dhp += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xde" + struct.pack(">H", 2 + len(dhp)) + dhp
    out += _dht(0, 0, dc_counts, dc_syms)
    out += _dht(1, 0, ac_counts, ac_syms)

    def emit_sos(comp_ids, tail):
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            sos += bytes([ci + 1, 0x00])
        sos += bytes(tail)
        out.extend(b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos)

    for st in stages:
        mode = st.get("mode", "seq")
        arith = st.get("arith", False)
        if st.get("exp"):
            eh, ev = st["exp"]
            out += b"\xff\xdf" + struct.pack(">H", 3) + bytes(
                [(eh << 4) | ev]
            )
        sof = bytes([precision]) + struct.pack(">HH", st["h"], st["w"])
        sof += bytes([ncomp])
        for ci in range(ncomp):
            sof += bytes([ci + 1, 0x11, 0])
        if mode == "lossless":
            if arith:
                marker = b"\xff\xcf" if st["diff"] else b"\xff\xcb"
            else:
                assert st["diff"], "Huffman lossless here is SOF7 only"
                marker = b"\xff\xc7"
        elif mode == "prog":
            if arith:
                marker = b"\xff\xce" if st["diff"] else b"\xff\xca"
            else:
                marker = b"\xff\xc6" if st["diff"] else b"\xff\xc2"
        elif arith:
            marker = b"\xff\xcd" if st["diff"] else b"\xff\xc9"
        else:
            marker = (
                b"\xff\xc5"
                if st["diff"]
                else (b"\xff\xc1" if precision != 8 else b"\xff\xc0")
            )
        out += marker + struct.pack(">H", 2 + len(sof)) + sof
        if mode == "seq":
            emit_sos(range(ncomp), [0, 63, 0])
            if arith:
                out += _arith_seq_scan(
                    ncomp, st["w"], st["h"], st["coeffs"],
                    differential=st["diff"],
                )
            else:
                out += _scan_bytes(
                    ncomp, st["w"], st["h"], st["coeffs"], dc_codes,
                    ac_codes, differential=st["diff"],
                )
        elif mode == "prog":
            scans = st.get(
                "scans",
                [(0, 0, 0, 0)] + [(1, 63, 0, 0, ci) for ci in range(ncomp)],
            )
            for sc in scans:
                ss, se, ah, al = sc[:4]
                if ss == 0:
                    emit_sos(range(ncomp), [0, 0, (ah << 4) | al])
                    if arith:
                        out += _arith_prog_dc_scan(
                            ncomp, st["w"], st["h"], st["coeffs"],
                            st["diff"], ah, al,
                        )
                    else:
                        out += _prog_dc_scan(
                            ncomp, st["w"], st["h"], st["coeffs"],
                            dc_codes, st["diff"], ah, al,
                        )
                else:
                    ci = sc[4] if len(sc) > 4 else 0
                    assert (ah, al) == (0, 0), "AC SA not in this encoder"
                    if not arith and (ss, se) != (1, 63):
                        pass  # Huffman AC scans accept any band
                    if arith:
                        assert (ss, se) == (1, 63), (
                            "arith AC scans: full band only here"
                        )
                    emit_sos([ci], [ss, se, 0])
                    if arith:
                        out += _arith_prog_ac_scan(
                            ci, st["w"], st["h"], st["coeffs"]
                        )
                    else:
                        out += _prog_ac_scan(
                            ci, st["w"], st["h"], st["coeffs"], ac_codes
                        )
        else:  # lossless
            pt = st.get("pt", 0)
            pred_sel = 0 if st["diff"] else st.get("pred_sel", 1)
            emit_sos(range(ncomp), [pred_sel, 0, pt])
            if arith:
                out += _arith_ll_scan(
                    ncomp, st["w"], st["h"], st["samples"], st["diff"],
                    pred_sel=pred_sel, pt=pt, precision=precision,
                )
            else:
                out += _ll_scan_bytes(
                    ncomp, st["w"], st["h"], st["samples"], dc_codes
                )
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------- reference pyramid math


def _brute_raw(coeffs, qtable):
    """A.3.3 IDCT from the definition — signed, no shift, no clamp."""
    out = [[0] * 8 for _ in range(8)]
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu
                        * cv
                        * coeffs[v * 8 + u]
                        * qtable[v * 8 + u]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[y][x] = round(s / 4)
    return out


def _frame_plane(w, h, ci, coeffs_fn, qtable):
    bw, bh = -(-w // 8), -(-h // 8)
    plane = [[0] * (bw * 8) for _ in range(bh * 8)]
    counters = 0
    for by in range(bh):
        for bx in range(bw):
            blk = _brute_raw(coeffs_fn(ci, by * bw + bx), qtable)
            for y in range(8):
                for x in range(8):
                    plane[by * 8 + y][bx * 8 + x] = blk[y][x]
            counters += 1
    return [row[:w] for row in plane[:h]]


def _expand_py(p, eh, ev):
    if eh:
        out = []
        for row in p:
            r = []
            for i, v in enumerate(row):
                r.append(v)
                nxt = row[i + 1] if i + 1 < len(row) else v
                r.append((v + nxt + 1) >> 1)
            out.append(r)
        p = out
    if ev:
        out = []
        for i, row in enumerate(p):
            out.append(list(row))
            nxt = p[i + 1] if i + 1 < len(p) else row
            out.append([(a + b + 1) >> 1 for a, b in zip(row, nxt)])
        p = out
    return p


def _expected(full_w, full_h, ncomp, qtable, precision, stages):
    top = (1 << precision) - 1
    mid = 1 << (precision - 1)
    refs = None
    for st in stages:
        if st.get("exp"):
            refs = [_expand_py(r, *st["exp"]) for r in refs]
        if st.get("mode") == "lossless":
            # differential lossless correction: modulo-2^16 add of the
            # point-transformed diffs (J); clamp happens only at EOI
            pt = st.get("pt", 0)
            refs = [
                [
                    [
                        (refs[ci][y][x]
                         + ((st["samples"](ci, y, x) << pt) & 0xFFFF))
                        & 0xFFFF
                        for x in range(st["w"])
                    ]
                    for y in range(st["h"])
                ]
                for ci in range(ncomp)
            ]
            continue
        planes = [
            _frame_plane(st["w"], st["h"], ci, st["coeffs"], qtable)
            for ci in range(ncomp)
        ]
        if st["diff"]:
            refs = [
                [
                    [
                        min(top, max(0, refs[ci][y][x] + planes[ci][y][x]))
                        for x in range(st["w"])
                    ]
                    for y in range(st["h"])
                ]
                for ci in range(ncomp)
            ]
        else:
            refs = [
                [
                    [
                        min(top, max(0, planes[ci][y][x] + mid))
                        for x in range(st["w"])
                    ]
                    for y in range(st["h"])
                ]
                for ci in range(ncomp)
            ]
    # final EOI clamp (a no-op for DCT-final pyramids, which clamp
    # per stage; meaningful after a mod-2^16 lossless correction)
    return [
        [[min(top, max(0, v)) for v in row] for row in r] for r in refs
    ]


def _grids(seed, spread=60):
    import random

    rng = random.Random(seed)
    cache = {}

    def coeffs(ci, b):
        if (ci, b) not in cache:
            c = [0] * 64
            c[0] = rng.randint(-spread * 4, spread * 4)
            for _ in range(5):
                c[rng.randint(1, 63)] = rng.randint(-spread, spread)
            cache[(ci, b)] = c
        return cache[(ci, b)]

    return coeffs


def _check(full_w, full_h, ncomp, qtable, precision, stages):
    blob = encode_hierarchical(
        full_w, full_h, ncomp, qtable, precision, stages
    )
    w, h, ch, samples = decode_jpeg_hierarchical(blob)
    assert (w, h, ch) == (full_w, full_h, ncomp)
    want = _expected(full_w, full_h, ncomp, qtable, precision, stages)
    for ci in range(ncomp):
        got = samples[:, :, ci].tolist()
        assert got == want[ci], f"component {ci}"


# --------------------------------------------------------------- tests


def test_two_level_pyramid_grayscale():
    q = [8] * 64
    co = _grids(1)
    cd = _grids(2, spread=10)
    stages = [
        {"diff": False, "w": 8, "h": 8, "coeffs": co},
        {"diff": True, "w": 16, "h": 16, "exp": (1, 1), "coeffs": cd},
    ]
    _check(16, 16, 1, q, 8, stages)


def test_three_level_pyramid_odd_dims():
    # full 13x11: base ceil/4 = 4x3, expand twice with edge cropping
    q = [6] * 64
    stages = [
        {"diff": False, "w": 4, "h": 3, "coeffs": _grids(3)},
        {"diff": True, "w": 7, "h": 6, "exp": (1, 1), "coeffs": _grids(4, 8)},
        {"diff": True, "w": 13, "h": 11, "exp": (1, 1), "coeffs": _grids(5, 8)},
    ]
    _check(13, 11, 1, q, 8, stages)


def test_anisotropic_expansion():
    # horizontal-only then vertical-only expansion
    q = [8] * 64
    stages = [
        {"diff": False, "w": 8, "h": 16, "coeffs": _grids(6)},
        {"diff": True, "w": 16, "h": 16, "exp": (1, 0), "coeffs": _grids(7, 9)},
    ]
    _check(16, 16, 1, q, 8, stages)
    stages = [
        {"diff": False, "w": 16, "h": 8, "coeffs": _grids(8)},
        {"diff": True, "w": 16, "h": 16, "exp": (0, 1), "coeffs": _grids(9, 9)},
    ]
    _check(16, 16, 1, q, 8, stages)


def test_color_pyramid_and_same_resolution_correction():
    # 3 components, plus a correction frame at the SAME resolution
    # (no EXP): quality refinement, not resolution growth
    q = [8] * 64
    stages = [
        {"diff": False, "w": 8, "h": 8, "coeffs": _grids(10)},
        {"diff": True, "w": 8, "h": 8, "coeffs": _grids(11, 12)},
        {"diff": True, "w": 16, "h": 16, "exp": (1, 1), "coeffs": _grids(12, 12)},
    ]
    _check(16, 16, 3, q, 8, stages)


def test_12bit_pyramid():
    q = [4] * 64
    stages = [
        {"diff": False, "w": 8, "h": 8, "coeffs": _grids(13, 200)},
        {"diff": True, "w": 16, "h": 16, "exp": (1, 1), "coeffs": _grids(14, 40)},
    ]
    _check(16, 16, 1, q, 12, stages)


def test_gates_and_routing():
    q = [8] * 64
    blob = encode_hierarchical(
        16, 16, 1, q, 8,
        [
            {"diff": False, "w": 8, "h": 8, "coeffs": _grids(20)},
            {"diff": True, "w": 16, "h": 16, "exp": (1, 1), "coeffs": _grids(21, 9)},
        ],
    )
    # the flat decoder refuses hierarchical streams loudly
    with pytest.raises(NotImplementedError, match="hierarchical"):
        decode_jpeg_pixels(blob)
    # a differential frame with no reference is malformed
    bad = bytearray(blob)
    at = bad.index(b"\xff\xc1") if b"\xff\xc1" in bad else bad.index(b"\xff\xc0")
    # remove the base frame by renaming its SOF to a COM segment
    bad[at + 1] = 0xFE
    with pytest.raises(JpegError):
        decode_jpeg_hierarchical(bytes(bad))
    # truncation stays typed
    with pytest.raises(JpegError):
        decode_jpeg_hierarchical(blob[: len(blob) // 2])
    # non-hierarchical stream into the hierarchical decoder
    from tests.test_jpeg import _encode

    flat = _encode(8, 8, [(1, 1)], q, _grids(22))
    with pytest.raises(JpegError, match="before DHP"):
        decode_jpeg_hierarchical(flat)


def test_fill_bytes_noop_exp_and_scan_coverage_gates():
    q = [8] * 64
    stages = [
        {"diff": False, "w": 8, "h": 8, "coeffs": _grids(30)},
        {"diff": True, "w": 16, "h": 16, "exp": (1, 1), "coeffs": _grids(31, 9)},
    ]
    blob = encode_hierarchical(16, 16, 1, q, 8, stages)
    base = decode_jpeg_hierarchical(blob)[3]
    # B.1.1.2 fill bytes before a marker are legal padding
    at = blob.index(b"\xff\xde")
    padded = blob[:at] + b"\xff\xff\xff" + blob[at:]
    assert (decode_jpeg_hierarchical(padded)[3] == base).all()
    # EXP(0, 0) is a syntactically valid no-op
    at = blob.index(b"\xff\xdf")
    noop = bytearray(blob)
    noop[at + 4] = 0x00  # Eh=Ev=0 ... but then dims mismatch; instead
    # insert an EXTRA no-op EXP before the real one
    noop = blob[:at] + b"\xff\xdf\x00\x03\x00" + blob[at:]
    assert (decode_jpeg_hierarchical(bytes(noop))[3] == base).all()
    # a scan not covering every frame component gates loudly:
    # shrink the declared scan component count to 0 of 1
    ssos = blob.index(b"\xff\xda", blob.index(b"\xff\xc5"))
    bad = bytearray(blob)
    bad[ssos + 4] = 0  # Ns = 0 != frame's 1 component
    with pytest.raises(NotImplementedError, match="non-interleaved"):
        decode_jpeg_hierarchical(bytes(bad))
    # undefined Huffman slot surfaces typed, not KeyError
    at = blob.index(b"\xff\xda")
    bad = bytearray(blob)
    bad[at + 5] = 0x55  # td=5/ta=5: tables never defined
    with pytest.raises(JpegError):
        decode_jpeg_hierarchical(bytes(bad))


# --------------------------- differential progressive / lossless frames


def test_sof6_differential_progressive_pyramid():
    """SOF6: a progressive correction frame (DC scan + AC scan,
    multiple SOS per frame) accumulated into the pyramid — decoded
    pixels match the definition-IDCT reference, proving PRED = 0 DC
    coding and multi-scan coefficient accumulation inside the
    hierarchy walker."""
    q = [6] * 64
    stages = [
        {"diff": False, "w": 8, "h": 8, "coeffs": _grids(40, 150)},
        {"diff": True, "w": 16, "h": 16, "exp": (1, 1),
         "mode": "prog", "coeffs": _grids(41, 30)},
    ]
    _check(16, 16, 1, q, 8, stages)


def test_sof6_successive_approximation_dc():
    """SOF6 with successive approximation on the DC band: first scan
    at Al=1, a refinement scan appending the dropped bit, then the AC
    band — the signed differential DC reconstructs exactly through
    the two's-complement refinement OR."""
    q = [5] * 64
    stages = [
        {"diff": False, "w": 8, "h": 8, "coeffs": _grids(42, 120)},
        {"diff": True, "w": 16, "h": 16, "exp": (1, 1), "mode": "prog",
         "coeffs": _grids(43, 25),
         "scans": [(0, 0, 0, 1), (0, 0, 1, 0), (1, 63, 0, 0, 0)]},
    ]
    _check(16, 16, 1, q, 8, stages)


def test_sof6_color_pyramid():
    q = [7] * 64
    stages = [
        {"diff": False, "w": 8, "h": 8, "coeffs": _grids(44, 100)},
        {"diff": True, "w": 16, "h": 16, "exp": (1, 1), "mode": "prog",
         "coeffs": _grids(45, 20)},
    ]
    _check(16, 16, 3, q, 8, stages)


def test_sof6_then_sof5_mixed_corrections():
    """Progressive and sequential differential frames mix freely in
    one pyramid: SOF6 at 16x16, then a same-resolution SOF5
    refinement pass."""
    q = [6] * 64
    stages = [
        {"diff": False, "w": 8, "h": 8, "coeffs": _grids(46, 150)},
        {"diff": True, "w": 16, "h": 16, "exp": (1, 1), "mode": "prog",
         "coeffs": _grids(47, 25)},
        {"diff": True, "w": 16, "h": 16, "coeffs": _grids(48, 9)},
    ]
    _check(16, 16, 1, q, 8, stages)


def test_sof7_lossless_differential_correction():
    """SOF7: a lossless differential frame adds its coded diffs in
    mod-2^16 arithmetic (Table H.1 predictor 0 — no prediction)."""
    import random

    rng = random.Random(50)
    diffs = {
        (ci, y, x): rng.randint(-40, 40)
        for ci in range(1) for y in range(16) for x in range(16)
    }
    q = [6] * 64
    stages = [
        {"diff": False, "w": 8, "h": 8, "coeffs": _grids(51, 150)},
        {"diff": True, "w": 16, "h": 16, "exp": (1, 1),
         "mode": "lossless",
         "samples": lambda ci, y, x: diffs[(ci, y, x)]},
    ]
    _check(16, 16, 1, q, 8, stages)


def test_sof7_point_transform():
    import random

    rng = random.Random(52)
    diffs = {
        (ci, y, x): rng.randint(-15, 15)
        for ci in range(1) for y in range(8) for x in range(8)
    }
    q = [6] * 64
    stages = [
        {"diff": False, "w": 8, "h": 8, "coeffs": _grids(53, 100)},
        {"diff": True, "w": 8, "h": 8, "mode": "lossless", "pt": 2,
         "samples": lambda ci, y, x: diffs[(ci, y, x)]},
    ]
    _check(8, 8, 1, q, 8, stages)


def test_sof7_makes_pyramid_lossless():
    """THE Annex-J use case: a final SOF7 frame codes exactly
    target - reference, making the whole lossy pyramid reconstruct
    the target image bit-exactly."""
    import random

    rng = random.Random(54)
    target = [[rng.randint(0, 255) for _ in range(16)] for _ in range(16)]
    q = [10] * 64
    lossy_stages = [
        {"diff": False, "w": 8, "h": 8, "coeffs": _grids(55, 150)},
        {"diff": True, "w": 16, "h": 16, "exp": (1, 1),
         "coeffs": _grids(56, 20)},
    ]
    ref = _expected(16, 16, 1, q, 8, lossy_stages)[0]

    def corr(ci, y, x):
        d = target[y][x] - ref[y][x]
        return d  # in [-255, 255]: category <= 9, no mod wrap needed

    stages = lossy_stages + [
        {"diff": True, "w": 16, "h": 16, "mode": "lossless",
         "samples": corr},
    ]
    blob = encode_hierarchical(16, 16, 1, q, 8, stages)
    _w, _h, _ch, samples = decode_jpeg_hierarchical(blob)
    assert samples[:, :, 0].tolist() == target


def test_sof2_first_frame_in_pyramid():
    """A NON-differential progressive first frame (SOF2 inside a
    hierarchy) level-shifts like any first frame."""
    q = [6] * 64
    stages = [
        {"diff": False, "w": 8, "h": 8, "mode": "prog",
         "coeffs": _grids(57, 150)},
        {"diff": True, "w": 16, "h": 16, "exp": (1, 1),
         "coeffs": _grids(58, 9)},
    ]
    _check(16, 16, 1, q, 8, stages)


def test_remaining_hierarchy_gates():
    """Round 12 flipped the SOF3/SOF9-SOF11/SOF13-SOF15 hierarchy
    gates to decode paths (tests/test_jpeg_hier_arith.py); what stays
    malformed: SOF7 with a nonzero predictor selector (Table H.1),
    and a second non-differential frame."""
    q = [8] * 64
    stages = [
        {"diff": False, "w": 8, "h": 8, "coeffs": _grids(60)},
        {"diff": True, "w": 8, "h": 8, "coeffs": _grids(61, 9)},
    ]
    blob = encode_hierarchical(8, 8, 1, q, 8, stages)
    # relabel the differential SOF5 as NON-differential SOF0: a second
    # non-differential frame in one pyramid is gated
    at = blob.index(b"\xff\xc5")
    bad = bytearray(blob)
    bad[at + 1] = 0xC0
    with pytest.raises(NotImplementedError, match="non-differential"):
        decode_jpeg_hierarchical(bytes(bad))
    # SOF7 whose SOS carries predictor selector 1: Table H.1 violation
    import random

    rng = random.Random(62)
    stages_ll = [
        {"diff": False, "w": 8, "h": 8, "coeffs": _grids(63)},
        {"diff": True, "w": 8, "h": 8, "mode": "lossless",
         "samples": lambda ci, y, x: rng.randint(-5, 5)},
    ]
    blob = encode_hierarchical(8, 8, 1, q, 8, stages_ll)
    at = blob.index(b"\xff\xda", blob.index(b"\xff\xc7"))
    bad = bytearray(blob)
    bad[at + 7] = 1  # Ss: predictor selector (ff da len2 ns cid tdta Ss)
    with pytest.raises(JpegError, match="predictor"):
        decode_jpeg_hierarchical(bytes(bad))
