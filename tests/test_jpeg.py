"""Baseline JPEG decoder (operators/jpegcodec.py) against an
INDEPENDENT in-test encoder and a brute-force IDCT.

The encoder here is written from the T.81 spec separately from the
decoder (its own canonical-code assignment, its own bit packer with
0xFF stuffing, its own MCU walk), so a shared misreading of the spec
would have to be made twice to cancel out. Expected pixels come from
the O(N^4) IDCT definition with math.cos — not the decoder's numpy
basis matrix."""

from __future__ import annotations

import math
import struct

import pytest

from cryptocoininsights_data_engineer_project_spark.operators import multimodal
from cryptocoininsights_data_engineer_project_spark.operators.jpegcodec import (
    ZIGZAG_TO_NATURAL,
    JpegError,
    decode_jpeg_pixels,
)

# --------------------------------------------------------------- test encoder


class _Packer:
    """MSB-first bit packer with JPEG 0xFF00 byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = self.n = 0

    def pad_to_byte(self) -> None:
        while self.n:
            self.put(1, 1)


def _category(v: int) -> int:
    a, c = abs(v), 0
    while a:
        a >>= 1
        c += 1
    return c


def _amp_bits(v: int, c: int) -> int:
    return v if v >= 0 else v + (1 << c) - 1


def _canonical(symbols: list[int]) -> tuple[list[int], dict[int, tuple[int, int]]]:
    """All symbols at code length 8 — valid canonical table, trivially
    prefix-free, and deliberately NOT the table shape the decoder's
    own fixtures use."""
    counts = [0] * 16
    counts[7] = len(symbols)
    return counts, {s: (i, 8) for i, s in enumerate(symbols)}


def _dht(tc: int, th: int, counts: list[int], symbols: list[int]) -> bytes:
    body = bytes([tc << 4 | th]) + bytes(counts) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _encode(
    width: int,
    height: int,
    comps: list[tuple[int, int]],  # (h, v) per component
    qtable: list[int],  # 64 natural-order values
    block_coeffs,  # fn(ci, block_index) -> 64 natural-order ints
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """Minimal baseline encoder: quantized coefficients in, JFIF bytes
    out. Walks MCUs exactly as F.2.1.2 prescribes (interleaved when
    Ns > 1), with DC prediction, ZRL/EOB, optional restart markers.
    precision=12 emits an SOF1 (extended sequential) frame with the
    wider magnitude-category symbol sets the 12-bit range needs."""
    hmax = max(h for h, _ in comps)
    vmax = max(v for _, v in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    dc_syms = list(range(16 if precision == 12 else 12))
    ac_hi = 15 if precision == 12 else 11
    ac_syms = sorted({(r << 4) | s for r in range(16) for s in range(ac_hi)} | {0x00, 0xF0})
    dc_counts, dc_codes = _canonical(dc_syms)
    ac_counts, ac_codes = _canonical(ac_syms)

    out = bytearray(b"\xff\xd8")
    zz_q = bytes(qtable[ZIGZAG_TO_NATURAL[z]] for z in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q
    sof = bytes([precision]) + struct.pack(">HH", height, width) + bytes([len(comps)])
    for ci, (h, v) in enumerate(comps):
        sof += bytes([ci + 1, (h << 4) | v, 0])
    sof_marker = b"\xff\xc1" if precision == 12 else b"\xff\xc0"
    out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht(0, 0, dc_counts, dc_syms)
    out += _dht(1, 0, ac_counts, ac_syms)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", restart_interval)
    sos = bytes([len(comps)])
    for ci in range(len(comps)):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    pk = _Packer()
    pred = [0] * len(comps)
    counters = [0] * len(comps)
    rst = 0
    since = 0
    for _my in range(mcus_y):
        for _mx in range(mcus_x):
            if restart_interval and since == restart_interval:
                pk.pad_to_byte()
                out += bytes(pk.out)
                pk = _Packer()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = [0] * len(comps)
                since = 0
            for ci, (h, v) in enumerate(comps):
                for _b in range(h * v):
                    coeffs = block_coeffs(ci, counters[ci])
                    counters[ci] += 1
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
                            pk.put(*ac_codes[0x00])  # EOB
                            break
                        while run >= 16:
                            pk.put(*ac_codes[0xF0])  # ZRL
                            run -= 16
                        c = _category(zz[k])
                        pk.put(*ac_codes[(run << 4) | c])
                        pk.put(_amp_bits(zz[k], c), c)
                        k += 1
                    else:
                        pass
            since += 1
    pk.pad_to_byte()
    out += bytes(pk.out)
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------- progressive (SOF2) test encoder


def _sign_shift(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al truncating toward zero."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _encode_progressive(
    width: int,
    height: int,
    comps: list[tuple[int, int]],
    qtable: list[int],
    block_coeffs,  # fn(ci, block_index) -> 64 natural-order ints
    scans: list[tuple[list[int], int, int, int, int]],  # (comp_idxs, ss, se, ah, al)
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """Minimal progressive encoder, written from T.81 Annex G
    independently of the decoder: spectral selection bands, successive
    approximation (DC shift / AC magnitude-shift point transforms),
    cross-block EOB runs with buffered refinement correction bits
    (the libjpeg BE-buffer discipline), optional restarts."""
    hmax = max(h for h, _ in comps)
    vmax = max(v for _, v in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    dc_syms = list(range(12 if precision == 8 else 16))
    max_s = 11 if precision == 8 else 15
    ac_syms = sorted({(r << 4) | s for r in range(16) for s in range(max_s)} | {0x00, 0xF0})
    dc_counts, dc_codes = _canonical(dc_syms)
    ac_counts, ac_codes = _canonical(ac_syms)

    # materialize every component's full (padded) coefficient grid once
    grids = []
    for ci, (h, v) in enumerate(comps):
        bw, bh = mcus_x * h, mcus_y * v
        grids.append(
            [[list(block_coeffs(ci, by * bw + bx)) for bx in range(bw)] for by in range(bh)]
        )

    def nonint_grid(ci):
        h, v = comps[ci]
        cw = -(-width * h // hmax)
        ch = -(-height * v // vmax)
        return -(-cw // 8), -(-ch // 8)

    out = bytearray(b"\xff\xd8")
    zz_q = bytes(qtable[ZIGZAG_TO_NATURAL[z]] for z in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q
    sof = bytes([precision]) + struct.pack(">HH", height, width) + bytes([len(comps)])
    for ci, (h, v) in enumerate(comps):
        sof += bytes([ci + 1, (h << 4) | v, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2
    out += _dht(0, 0, dc_counts, dc_syms)
    out += _dht(1, 0, ac_counts, ac_syms)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", restart_interval)

    for comp_idxs, ss, se, ah, al in scans:
        sos = bytes([len(comp_idxs)])
        for ci in comp_idxs:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

        pk = _Packer()
        rst = 0
        since = 0
        pred = {ci: 0 for ci in comp_idxs}
        # EOB-run state: count + buffered refinement correction bits
        eob_n = 0
        eob_bits: list[int] = []

        def flush_eob(pk=None):
            nonlocal eob_n, eob_bits
            if eob_n:
                r = eob_n.bit_length() - 1
                pk.put(*ac_codes[r << 4])
                if r:
                    pk.put(eob_n - (1 << r), r)
                for b in eob_bits:
                    pk.put(b, 1)
            eob_n = 0
            eob_bits = []

        def do_restart():
            nonlocal pk, rst, since, pred
            flush_eob(pk)
            pk.pad_to_byte()
            out.extend(pk.out)
            pk.__init__()
            out.extend(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) & 7
            since = 0
            pred = {ci: 0 for ci in comp_idxs}

        def dc_unit(ci, zz):
            nonlocal pred
            if ah == 0:
                v = zz[0] >> al  # arithmetic shift: DC point transform
                diff = v - pred[ci]
                pred[ci] = v
                c = _category(diff)
                pk.put(*dc_codes[c])
                if c:
                    pk.put(_amp_bits(diff, c), c)
            else:
                pk.put((zz[0] >> al) & 1, 1)

        def ac_first_unit(zz):
            nonlocal eob_n
            band = [(_sign_shift(zz[k], al), k) for k in range(ss, se + 1)]
            nz = [(v, k) for v, k in band if v != 0]
            if not nz:
                eob_n += 1
                if eob_n == 0x7FFF:
                    flush_eob(pk)
                return
            flush_eob(pk)
            k = ss
            for v, t in nz:
                run = t - k
                while run >= 16:
                    pk.put(*ac_codes[0xF0])
                    run -= 16
                c = _category(v)
                pk.put(*ac_codes[(run << 4) | c])
                pk.put(_amp_bits(v, c), c)
                k = t + 1
            if k <= se:
                eob_n += 1

        def ac_refine_unit(zz):
            nonlocal eob_n
            hist = [_sign_shift(zz[k], al + 1) for k in range(ss, se + 1)]
            cur = [_sign_shift(zz[k], al) for k in range(ss, se + 1)]
            newly = [
                i for i in range(len(cur)) if hist[i] == 0 and cur[i] != 0
            ]
            corr = lambda i: (abs(zz[ss + i]) >> al) & 1
            if not newly:
                eob_n += 1
                eob_bits.extend(corr(i) for i in range(len(cur)) if hist[i] != 0)
                if eob_n == 0x7FFF:
                    flush_eob(pk)
                return
            flush_eob(pk)
            i = 0
            for t in newly:
                # count zero-history positions between i and t, emitting
                # buffered-in-place correction bits for nonzero history
                run = sum(1 for j in range(i, t) if hist[j] == 0)
                pending = list(range(i, t))
                while run >= 16:
                    pk.put(*ac_codes[0xF0])
                    taken = 0
                    while pending and taken < 16:
                        j = pending.pop(0)
                        if hist[j] == 0:
                            taken += 1
                        else:
                            pk.put(corr(j), 1)
                    run -= 16
                pk.put(*ac_codes[(run << 4) | 1])
                pk.put(1 if cur[t] > 0 else 0, 1)
                for j in pending:
                    if hist[j] != 0:
                        pk.put(corr(j), 1)
                i = t + 1
            if i <= se - ss:
                eob_n += 1
                eob_bits.extend(
                    corr(j) for j in range(i, se - ss + 1) if hist[j] != 0
                )

        if ss == 0:  # DC scan
            if len(comp_idxs) > 1:  # interleaved MCU walk
                for _my in range(mcus_y):
                    for _mx in range(mcus_x):
                        if restart_interval and since == restart_interval:
                            do_restart()
                        for ci in comp_idxs:
                            h, v = comps[ci]
                            for by in range(v):
                                for bx in range(h):
                                    zz_nat = grids[ci][_my * v + by][_mx * h + bx]
                                    dc_unit(ci, zz_nat)
                        since += 1
            else:
                ci = comp_idxs[0]
                bw, bh = nonint_grid(ci)
                for by in range(bh):
                    for bx in range(bw):
                        if restart_interval and since == restart_interval:
                            do_restart()
                        dc_unit(ci, grids[ci][by][bx])
                        since += 1
        else:  # AC scan: single component, zigzag band
            ci = comp_idxs[0]
            bw, bh = nonint_grid(ci)
            for by in range(bh):
                for bx in range(bw):
                    if restart_interval and since == restart_interval:
                        do_restart()
                    nat = grids[ci][by][bx]
                    zz = [nat[ZIGZAG_TO_NATURAL[z]] for z in range(64)]
                    if ah == 0:
                        ac_first_unit(zz)
                    else:
                        ac_refine_unit(zz)
                    since += 1
        flush_eob(pk)
        pk.pad_to_byte()
        out.extend(pk.out)
    out += b"\xff\xd9"
    return bytes(out)


def _brute_block(coeffs, qtable):
    """T.81 A.3.3 IDCT straight from the definition + level shift."""
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
            out[y][x] = min(255, max(0, round(s / 4) + 128))
    return out


# --------------------------------------------------------------------- tests


def test_grayscale_random_coefficients_match_definition_idct():
    import random

    rng = random.Random(42)
    qtable = [rng.randint(1, 24) for _ in range(64)]
    blocks = []
    for _ in range(6):  # 24x16 image -> 6 blocks
        c = [0] * 64
        c[0] = rng.randint(-64, 64)
        for zz in rng.sample(range(1, 64), 9):
            c[ZIGZAG_TO_NATURAL[zz]] = rng.choice([-1, 1]) * rng.randint(1, 100)
        blocks.append(c)
    payload = _encode(24, 16, [(1, 1)], qtable, lambda ci, b: blocks[b])
    w, h, ch, px = decode_jpeg_pixels(payload)
    assert (w, h, ch) == (24, 16, 1)
    for bi, coeffs in enumerate(blocks):
        want = _brute_block(coeffs, qtable)
        bx, by = bi % 3, bi // 3
        for y in range(8):
            for x in range(8):
                got = px[(by * 8 + y) * 24 + bx * 8 + x]
                assert got == want[y][x], (bi, x, y)


def test_12bit_extended_sequential_matches_definition_idct():
    """Round 7: SOF1 at 12-bit precision — level shift 2048, clamp to
    4095, high-byte chop — against the definition IDCT; coefficient
    magnitudes chosen to exercise categories beyond the 8-bit range
    (amplitudes > 1023, DC diffs spanning the 12-bit swing)."""
    import random

    rng = random.Random(9)
    qtable = [rng.randint(1, 16) for _ in range(64)]
    blocks = []
    for _ in range(6):
        c = [0] * 64
        c[0] = rng.randint(-1500, 1500)
        for zz in rng.sample(range(1, 64), 7):
            c[ZIGZAG_TO_NATURAL[zz]] = rng.choice([-1, 1]) * rng.randint(
                200, 3000
            )
        blocks.append(c)
    payload = _encode(
        24, 16, [(1, 1)], qtable, lambda ci, b: blocks[b], precision=12
    )
    assert b"\xff\xc1" in payload and b"\xff\xc0" not in payload[2:]  # SOF1
    w, h, ch, px = decode_jpeg_pixels(payload)
    assert (w, h, ch) == (24, 16, 1)
    for bi, coeffs in enumerate(blocks):
        # definition IDCT at 12-bit: shift 2048, clamp 4095, chop >> 4
        want = [[0] * 8 for _ in range(8)]
        for y in range(8):
            for x in range(8):
                sacc = 0.0
                for v in range(8):
                    for u in range(8):
                        cu = 1 / math.sqrt(2) if u == 0 else 1.0
                        cv = 1 / math.sqrt(2) if v == 0 else 1.0
                        sacc += (
                            cu * cv * coeffs[v * 8 + u] * qtable[v * 8 + u]
                            * math.cos((2 * x + 1) * u * math.pi / 16)
                            * math.cos((2 * y + 1) * v * math.pi / 16)
                        )
                want[y][x] = min(4095, max(0, round(sacc / 4) + 2048)) >> 4
        bx, by = bi % 3, bi // 3
        for y in range(8):
            for x in range(8):
                got = px[(by * 8 + y) * 24 + bx * 8 + x]
                assert got == want[y][x], (bi, x, y)
    # 12-bit on SOF0 must stay gated
    bad = bytearray(payload)
    bad[bad.index(b"\xff\xc1")+1] = 0xC0
    with pytest.raises(NotImplementedError, match="12-bit precision on SOF0"):
        decode_jpeg_pixels(bytes(bad))


def test_color_420_subsampling_and_ycbcr():
    """One 16x16 MCU, 4:2:0: four flat Y blocks + one flat Cb + one
    flat Cr. Chroma replicates 2x2; every pixel's RGB follows the JFIF
    matrix, computed here independently."""
    qtable = [8] * 64
    y_dcs = [4, -3, 10, -7]  # per Y block (2x2 inside the MCU)
    cb_dc, cr_dc = 5, -6

    def coeffs(ci, b):
        c = [0] * 64
        c[0] = y_dcs[b] if ci == 0 else (cb_dc if ci == 1 else cr_dc)
        return c

    payload = _encode(16, 16, [(2, 2), (1, 1), (1, 1)], qtable, coeffs)
    w, h, ch, px = decode_jpeg_pixels(payload)
    assert (w, h, ch) == (16, 16, 3)
    for yy in range(16):
        for xx in range(16):
            yb = (yy // 8) * 2 + (xx // 8)
            yval = 128 + y_dcs[yb]  # dequant 8, /8 from DC basis
            cb = 128 + cb_dc
            cr = 128 + cr_dc
            r = min(255, max(0, round(yval + 1.402 * (cr - 128))))
            g = min(255, max(0, round(yval - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))))
            b = min(255, max(0, round(yval + 1.772 * (cb - 128))))
            at = (yy * 16 + xx) * 3
            assert (px[at], px[at + 1], px[at + 2]) == (r, g, b), (xx, yy)


def test_restart_markers_reset_dc_prediction():
    """DRI=1: a RSTn between each MCU; the encoder resets predictors
    at restarts, so a decoder that failed to reset (or to realign to a
    byte boundary) would shift every later block's DC."""
    qtable = [8] * 64
    dcs = [7, 9, -5, 11]  # 4 MCUs: 32x8 grayscale

    def coeffs(ci, b):
        c = [0] * 64
        c[0] = dcs[b]
        return c

    payload = _encode(32, 8, [(1, 1)], qtable, coeffs, restart_interval=1)
    assert b"\xff\xd0" in payload and b"\xff\xd1" in payload
    w, h, ch, px = decode_jpeg_pixels(payload)
    assert (w, h, ch) == (32, 8, 1)
    for bi, dc in enumerate(dcs):
        assert px[bi * 8] == 128 + dc, bi
        assert px[7 * 32 + bi * 8 + 7] == 128 + dc, bi


def test_byte_stuffing_roundtrip():
    """Coefficient amplitudes chosen to force 0xFF bytes into the
    entropy stream; the encoder stuffs 0x00, the decoder must unstuff.
    The stream really contains stuffed bytes (asserted) and decodes to
    the definition-IDCT pixels."""
    import random

    rng = random.Random(7)
    qtable = [1] * 64
    found = None
    for attempt in range(200):
        c = [0] * 64
        c[0] = rng.randint(-200, 200)
        for zz in rng.sample(range(1, 64), 12):
            c[ZIGZAG_TO_NATURAL[zz]] = rng.choice([-1, 1]) * rng.randint(120, 1000)
        payload = _encode(8, 8, [(1, 1)], qtable, lambda ci, b, c=c: c)
        scan_at = payload.index(b"\xff\xda")
        if b"\xff\x00" in payload[scan_at:]:
            found = (payload, c)
            break
    assert found, "no stuffed byte produced in 200 attempts"
    payload, c = found
    w, h, ch, px = decode_jpeg_pixels(payload)
    want = _brute_block(c, qtable)
    assert [px[y * 8 + x] for y in range(8) for x in range(8)] == [
        want[y][x] for y in range(8) for x in range(8)
    ]


def test_edge_blocks_cropped_not_padded():
    """A 12x10 image needs 2x2 blocks of coverage; the decoder must
    crop the padded right/bottom samples back to the declared size."""
    qtable = [8] * 64

    def coeffs(ci, b):
        c = [0] * 64
        c[0] = 2 * b + 1
        return c

    payload = _encode(12, 10, [(1, 1)], qtable, coeffs)
    w, h, ch, px = decode_jpeg_pixels(payload)
    assert (w, h, ch) == (12, 10, 1)
    assert len(px) == 12 * 10
    # pixel (11, 9) lives in block 3 (dc=7)
    assert px[9 * 12 + 11] == 128 + 7


def test_arithmetic_and_malformed_gates():
    # a baseline stream relabeled SOF11 is MALFORMED lossless (its
    # DCT SOS carries Ss=0, not a 1-7 predictor selector) — SOF11
    # DECODES now (tests/test_jpeg_lossless_arith.py), so the gate
    # became a loud structure error, not NotImplementedError
    arith = bytearray(_encode(8, 8, [(1, 1)], [8] * 64, lambda ci, b: [3] + [0] * 63))
    at = arith.index(b"\xff\xc0")
    arith[at + 1] = 0xCB
    with pytest.raises(JpegError, match="predictor"):
        decode_jpeg_pixels(bytes(arith))
    # hierarchical stays gated
    arith[at + 1] = 0xCE
    with pytest.raises(NotImplementedError, match="hierarchical"):
        decode_jpeg_pixels(bytes(arith))
    # a baseline stream relabeled SOF2 is MALFORMED progressive (its
    # single scan claims the full band with Se=63 from a DC scan) —
    # loud JpegError, not a silent misdecode
    mislabeled = bytearray(_encode(8, 8, [(1, 1)], [8] * 64, lambda ci, b: [3] + [0] * 63))
    at = mislabeled.index(b"\xff\xc0")
    mislabeled[at + 1] = 0xC2
    with pytest.raises(JpegError, match="Se=0"):
        decode_jpeg_pixels(bytes(mislabeled))
    with pytest.raises(JpegError):
        decode_jpeg_pixels(b"\x89PNG not a jpeg")
    ok = _encode(8, 8, [(1, 1)], [8] * 64, lambda ci, b: [3] + [0] * 63)
    with pytest.raises(JpegError):
        decode_jpeg_pixels(ok[: len(ok) // 2])  # truncated mid-scan


def _rand_coeffs(seed, nblocks, spread=40):
    import random

    rng = random.Random(seed)
    blocks = []
    for _ in range(nblocks):
        c = [0] * 64
        c[0] = rng.randrange(-spread, spread)
        for _k in range(rng.randrange(12)):
            c[rng.randrange(1, 64)] = rng.randrange(-9, 10)
        blocks.append(c)
    return blocks


def test_progressive_spectral_selection_matches_baseline():
    """Spectral-selection-only script (DC scan + two AC band scans)
    must reconstruct pixel-identically to the baseline encoding of the
    SAME coefficients — progressive changes transmission order, not
    content. Bands chosen so most blocks end early -> cross-block
    EOB runs exercise the EOBn path."""
    qtable = [8] * 64
    blocks = _rand_coeffs(11, 6)
    base = _encode(24, 16, [(1, 1)], qtable, lambda ci, b: blocks[b])
    prog = _encode_progressive(
        24,
        16,
        [(1, 1)],
        qtable,
        lambda ci, b: blocks[b],
        scans=[([0], 0, 0, 0, 0), ([0], 1, 5, 0, 0), ([0], 6, 63, 0, 0)],
    )
    assert decode_jpeg_pixels(prog) == decode_jpeg_pixels(base)


def test_progressive_successive_approximation_matches_baseline():
    """Full SA script: DC and AC first scans at Al=1, then refinement
    scans at Ah=1/Al=0 — exercises DC raw-bit refinement, AC
    newly-significant insertion, correction bits inside runs and EOB
    spans. Must equal the baseline decode bit-for-bit."""
    qtable = [6] * 64
    blocks = _rand_coeffs(23, 6)
    base = _encode(24, 16, [(1, 1)], qtable, lambda ci, b: blocks[b])
    prog = _encode_progressive(
        24,
        16,
        [(1, 1)],
        qtable,
        lambda ci, b: blocks[b],
        scans=[
            ([0], 0, 0, 0, 1),
            ([0], 1, 63, 0, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ],
    )
    assert decode_jpeg_pixels(prog) == decode_jpeg_pixels(base)


def test_progressive_color_420_and_banded_sa():
    """Color 4:2:0 progressive: interleaved DC scan over all three
    components, per-component AC band scans with a refinement pass on
    Y. One 16x16 MCU so baseline and progressive block indices align."""
    qtable = [8] * 64
    blocks = {ci: _rand_coeffs(31 + ci, 4) for ci in range(3)}

    def coeffs(ci, b):
        return blocks[ci][b]

    base = _encode(16, 16, [(2, 2), (1, 1), (1, 1)], qtable, coeffs)
    prog = _encode_progressive(
        16,
        16,
        [(2, 2), (1, 1), (1, 1)],
        qtable,
        coeffs,
        scans=[
            ([0, 1, 2], 0, 0, 0, 0),
            ([0], 1, 63, 0, 1),
            ([1], 1, 63, 0, 0),
            ([2], 1, 63, 0, 0),
            ([0], 1, 63, 1, 0),
        ],
    )
    assert decode_jpeg_pixels(prog) == decode_jpeg_pixels(base)


def test_progressive_restart_markers():
    """DRI inside a progressive AC scan: restarts reset the EOB run
    and byte-align mid-scan; result must still match baseline."""
    qtable = [8] * 64
    blocks = _rand_coeffs(47, 8)
    base = _encode(32, 16, [(1, 1)], qtable, lambda ci, b: blocks[b])
    prog = _encode_progressive(
        32,
        16,
        [(1, 1)],
        qtable,
        lambda ci, b: blocks[b],
        scans=[([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0)],
        restart_interval=3,
    )
    assert decode_jpeg_pixels(prog) == decode_jpeg_pixels(base)


def test_progressive_brute_force_idct_oracle():
    """Progressive decode against the O(N^4) definition IDCT — the
    same independence argument as the baseline test, through the
    accumulate-then-reconstruct path."""
    qtable = [5] * 64
    blocks = _rand_coeffs(59, 2)
    prog = _encode_progressive(
        16,
        8,
        [(1, 1)],
        qtable,
        lambda ci, b: blocks[b],
        scans=[
            ([0], 0, 0, 0, 1),
            ([0], 1, 20, 0, 0),
            ([0], 21, 63, 0, 1),
            ([0], 0, 0, 1, 0),
            ([0], 21, 63, 1, 0),
        ],
    )
    w, h, ch, px = decode_jpeg_pixels(prog)
    assert (w, h, ch) == (16, 8, 1)
    for b, coeffs in enumerate(blocks):
        want = _brute_block(coeffs, qtable)
        for y in range(8):
            for x in range(8):
                assert px[y * 16 + b * 8 + x] == want[y][x], (b, x, y)


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes.
    Inject fill padding before DQT, DHT, SOF0 and SOS of a valid
    stream; the decoder must skip the padding and decode unchanged."""
    payload = _encode(8, 8, [(1, 1)], [8] * 64, lambda ci, b: [5] + [0] * 63)
    want = decode_jpeg_pixels(payload)
    padded = bytearray(payload)
    for seg in (b"\xff\xdb", b"\xff\xc4", b"\xff\xc0", b"\xff\xda"):
        at = bytes(padded).index(seg)
        padded[at:at] = b"\xff" * 3  # three fill bytes, then the marker
    assert decode_jpeg_pixels(bytes(padded)) == want


def test_registry_routes_real_jpeg_decoder():
    payload = _encode(8, 8, [(1, 1)], [8] * 64, lambda ci, b: [5] + [0] * 63)
    w, h, ch, px = multimodal.decode_image(payload)
    assert (w, h, ch) == (8, 8, 1)
    assert set(px) == {133}


def test_progressive_sql_fixture_family_decodes_to_formula():
    """The progressive registry fixture assembled in-process (same hex
    the SQL builds) decodes to the closed-form pixel statement the
    DuckDB oracle uses — successive-approximation DC reconstruction
    included. Hits both ff00-stuffing corners (d=7 at doc_id%4==3;
    r1=r2=1 at doc_id%2==1 and (doc_id//4)%2==1)."""
    S = [1, -1, -1, 1, 1, -1, -1, 1]
    for doc_id in list(range(0, 97, 13)) + [3, 7, 5, 13]:
        u1 = 16 + doc_id % 16
        d = 4 + doc_id % 4
        ac1 = 4 + (doc_id // 2) % 4
        ac2 = 4 + (doc_id * 3) % 4
        r1 = doc_id % 2
        r2 = (doc_id // 4) % 2
        b10 = bytes([u1 * 2])
        b11 = b"\xff\x00" if d == 7 else bytes([143 + d * 16])
        b20 = bytes([34 + ((doc_id // 2) % 4) * 8])
        b22 = bytes([120 + ((doc_id * 3) % 4) * 2])
        b30 = (
            b"\xff\x00"
            if (r1 == 1 and r2 == 1)
            else bytes([63 + r1 * 128 + r2 * 64])
        )
        payload = (
            bytes.fromhex(multimodal._JPEG_PROG_HEADER_HEX)
            + bytes.fromhex(multimodal._SOS1_HEX)
            + b10
            + b11
            + bytes.fromhex(multimodal._SOS2_HEX)
            + b20
            + b"\x66"
            + b22
            + b"\xbf"
            + bytes.fromhex(multimodal._SOS3_HEX)
            + b30
            + b"\xff\xd9"
        )
        w, h, ch, px = decode_jpeg_pixels(payload)
        assert (w, h, ch) == (16, 8, 1)
        dc1 = 2 * u1 + r1
        dc2 = 2 * u1 + 2 * d + r2
        for y in range(8):
            for x in range(16):
                if x < 8:
                    want = 128 + dc1 + ac1 * S[y]
                else:
                    want = 128 + dc2 + ac2 * S[x - 8] * S[y]
                assert px[y * 16 + x] == want, (doc_id, x, y)


def test_sql_fixture_family_decodes_to_formula():
    """The registry fixture (multimodal.synth_jpeg_assets) decoded
    in-process matches the closed-form pixel statement the DuckDB
    oracle uses — the same check the oracle sweep does distributed."""
    S = [1, -1, -1, 1, 1, -1, -1, 1]
    for doc_id in range(0, 97, 13):
        dc1 = 32 + doc_id % 32
        ac1 = 4 + doc_id % 4
        diff = 8 + doc_id % 8
        ac2 = 4 + (doc_id * 3) % 4
        hexs = multimodal._JPEG_HEADER_HEX
        payload = (
            bytes.fromhex(hexs)
            + bytes(
                [
                    dc1,
                    34 + (doc_id % 4) * 8,
                    97 + (doc_id % 8) * 4,
                    0x99,
                    226 + ((doc_id * 3) % 4) * 8,
                ]
            )
            + b"\xff\xd9"
        )
        w, h, ch, px = decode_jpeg_pixels(payload)
        assert (w, h, ch) == (16, 8, 1)
        for y in range(8):
            for x in range(16):
                if x < 8:
                    want = 128 + dc1 + ac1 * S[y]
                else:
                    want = 128 + dc1 + diff + ac2 * S[x - 8] * S[y]
                assert px[y * 16 + x] == want, (doc_id, x, y)


# ------------------------------------------------- lossless (SOF3) tests


def _encode_lossless(
    width: int,
    height: int,
    ncomp: int,
    reduced,  # fn(ci, y, x) -> reduced-domain sample value
    precision: int,
    pred_sel: int,
    pt: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """Independent lossless encoder written from T.81 Annex H:
    predictor selection + boundary rules + modulo-65536 DIFF with
    DC-style SSSS categories (16 -> bare 32768). Restart intervals
    reset prediction as at scan start."""
    syms = list(range(17))
    counts, codes = _canonical(syms)
    out = bytearray(b"\xff\xd8")
    sof = bytes([precision]) + struct.pack(">HH", height, width) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht(0, 0, counts, syms)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([pred_sel, 0, pt])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    default = 1 << (precision - pt - 1)
    planes = [[[0] * width for _ in range(height)] for _ in range(ncomp)]
    pk = _Packer()
    rst = 0
    since = 0
    seg = (0, 0)
    for y in range(height):
        for x in range(width):
            if restart_interval and since == restart_interval:
                pk.pad_to_byte()
                out += bytes(pk.out)
                pk = _Packer()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                since = 0
                seg = (y, x)
            for ci in range(ncomp):
                p = planes[ci]
                if (y, x) == seg:
                    pred = default
                elif y == seg[0]:
                    pred = p[y][x - 1]
                elif x == 0:
                    pred = p[y - 1][0]
                else:
                    ra, rb, rc = p[y][x - 1], p[y - 1][x], p[y - 1][x - 1]
                    pred = [
                        None, ra, rb, rc, ra + rb - rc,
                        ra + ((rb - rc) >> 1), rb + ((ra - rc) >> 1),
                        (ra + rb) >> 1,
                    ][pred_sel]
                v = reduced(ci, y, x)
                p[y][x] = v
                d = (v - pred) & 0xFFFF
                if d > 32768:
                    d -= 65536
                if d == 32768:
                    pk.put(*codes[16])
                else:
                    c = _category(d)
                    pk.put(*codes[c])
                    if c:
                        pk.put(_amp_bits(d, c), c)
            since += 1
    pk.pad_to_byte()
    out += bytes(pk.out)
    out += b"\xff\xd9"
    return bytes(out)


def test_lossless_all_predictors_exact():
    """SOF3 round trip at 16-bit: every predictor 1-7 reconstructs
    the exact sample array (that's the format's whole point)."""
    import random

    from cryptocoininsights_data_engineer_project_spark.operators.jpegcodec import (
        decode_jpeg_lossless,
    )

    rng = random.Random(3)
    w, h = 9, 6
    vals = [
        [rng.randrange(1 << 16) for _ in range(w)] for _ in range(h)
    ]
    for pred_sel in range(1, 8):
        payload = _encode_lossless(
            w, h, 1, lambda ci, y, x: vals[y][x], 16, pred_sel
        )
        gw, gh, ch, samples = decode_jpeg_lossless(payload)
        assert (gw, gh, ch) == (w, h, 1)
        got = samples[:, :, 0].tolist()
        assert got == vals, f"predictor {pred_sel}"


def test_lossless_point_transform_precision_and_color():
    """12-bit with Pt=2 (prediction in the reduced domain, output
    shifted back), and a 3-component sample-interleaved scan."""
    import random

    from cryptocoininsights_data_engineer_project_spark.operators.jpegcodec import (
        decode_jpeg_lossless,
    )

    rng = random.Random(5)
    w, h, pt = 7, 5, 2
    vals = [
        [[rng.randrange(1 << 10) for _ in range(3)] for _ in range(w)]
        for _ in range(h)
    ]
    payload = _encode_lossless(
        w, h, 3, lambda ci, y, x: vals[y][x][ci], 12, 4, pt=pt
    )
    gw, gh, ch, samples = decode_jpeg_lossless(payload)
    assert (gw, gh, ch) == (w, h, 3)
    for y in range(h):
        for x in range(w):
            for ci in range(3):
                assert samples[y, x, ci] == vals[y][x][ci] << pt


def test_lossless_restart_and_ssss16():
    """Restart intervals reset prediction (row-aligned, the
    well-defined placement); the SSSS=16 bare-32768 escape decodes
    (first sample 0 against the 32768 default prediction)."""
    import random

    from cryptocoininsights_data_engineer_project_spark.operators.jpegcodec import (
        decode_jpeg_lossless,
    )

    rng = random.Random(7)
    w, h = 8, 6
    vals = [[rng.randrange(1 << 16) for _ in range(w)] for _ in range(h)]
    vals[0][0] = 0  # diff vs default 32768 -> (0-32768)&0xFFFF == 32768
    payload = _encode_lossless(
        w, h, 1, lambda ci, y, x: vals[y][x], 16, 2, restart_interval=2 * w
    )
    assert b"\xff\xd0" in payload  # a restart marker actually landed
    gw, gh, ch, samples = decode_jpeg_lossless(payload)
    assert samples[:, :, 0].tolist() == vals


def test_lossless_pixel_contract_chops():
    """decode_jpeg_pixels on an SOF3 stream honors the uint8
    contract: high-byte chop for P>8, shift up for P<8; and
    decode_jpeg_lossless rejects baseline streams."""
    import pytest as _pytest

    from cryptocoininsights_data_engineer_project_spark.operators.jpegcodec import (
        decode_jpeg_lossless,
        decode_jpeg_pixels,
    )

    w, h = 4, 3
    vals = [[(y * w + x) * 1111 for x in range(w)] for y in range(h)]
    payload = _encode_lossless(w, h, 1, lambda ci, y, x: vals[y][x], 16, 1)
    gw, gh, ch, px = decode_jpeg_pixels(payload)
    assert (gw, gh, ch) == (w, h, 1)
    assert list(px) == [vals[y][x] >> 8 for y in range(h) for x in range(w)]
    # 4-bit precision scales up into the byte range
    small = _encode_lossless(w, h, 1, lambda ci, y, x: (y + x) % 16, 4, 1)
    _, _, _, px4 = decode_jpeg_pixels(small)
    assert list(px4) == [((y + x) % 16) << 4 for y in range(h) for x in range(w)]
    qtable = [8] * 64
    base = _encode(8, 8, [(1, 1)], qtable, lambda ci, b: [4] + [0] * 63)
    with _pytest.raises(Exception, match="not a lossless"):
        decode_jpeg_lossless(base)


def test_12bit_progressive_matches_12bit_sequential():
    """Round 9: 12-bit SOF2 — the same coefficient grids decoded
    through the progressive scan script and the extended-sequential
    SOF1 twin must reconstruct identical 12-bit-chopped pixels."""
    import random

    rng = random.Random(29)
    cache = {}

    def coeffs(ci, b):
        if (ci, b) not in cache:
            c = [0] * 64
            c[0] = rng.randint(-1800, 1800)  # full 12-bit DC swing
            for _ in range(8):
                c[rng.randint(1, 63)] = rng.randint(-300, 300)
            cache[(ci, b)] = c
        return cache[(ci, b)]

    q = [4] * 64
    scans = [
        ([0], 0, 0, 0, 1),  # DC first at Al=1
        ([0], 1, 5, 0, 1),  # low AC band first
        ([0], 6, 63, 0, 0),  # high AC band
        ([0], 0, 0, 1, 0),  # DC refinement
        ([0], 1, 5, 1, 0),  # AC refinement
    ]
    prog = decode_jpeg_pixels(
        _encode_progressive(16, 16, [(1, 1)], q, coeffs, scans, precision=12)
    )
    seq = decode_jpeg_pixels(
        _encode(16, 16, [(1, 1)], q, coeffs, precision=12)
    )
    assert prog == seq
    # color + subsampling at 12-bit through the progressive path
    scans3 = [
        ([0, 1, 2], 0, 0, 0, 0),
        ([0], 1, 63, 0, 0),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
    ]
    prog3 = decode_jpeg_pixels(
        _encode_progressive(
            16, 16, [(2, 2), (1, 1), (1, 1)], q, coeffs, scans3, precision=12
        )
    )
    seq3 = decode_jpeg_pixels(
        _encode(16, 16, [(2, 2), (1, 1), (1, 1)], q, coeffs, precision=12)
    )
    assert prog3 == seq3
