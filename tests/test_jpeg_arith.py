"""Arithmetic-coded (SOF9) JPEG decode tests.

The encoder here is written independently from T.81 Annex D's ENCODER
flowcharts (the decoder implements Annex F), using a big-integer code
register so carry propagation and byte stuffing fall out of ordinary
arithmetic instead of the spec's BYTEOUT/stack bookkeeping — a
deliberately different construction, so encoder/decoder agreement
round-trips through the bitstream format rather than shared code.
Pixel-level truth comes from the EXISTING Huffman path: the same
quantized coefficients encoded as SOF0 (tests/test_jpeg.py::_encode)
must decode to byte-identical pixels, since the two entropy coders
sit under an identical dequant/IDCT/color tail.
"""

from __future__ import annotations

import random
import struct

import pytest

from cryptocoininsights_data_engineer_project_spark.operators.jpegcodec import (
    AC_STAT_BINS,
    DC_STAT_BINS,
    ZIGZAG_TO_NATURAL,
    JpegError,
    _ARITH_QE,
    decode_jpeg_pixels,
)
from tests.test_jpeg import _encode as huffman_encode
from tests.test_jpeg import _encode_progressive as huffman_encode_progressive


# ------------------------------------------------------------- QM encoder


class ArithEncoder:
    """Annex D QM-coder, big-int formulation: ``a`` the interval,
    ``base`` the accumulated code value over all renormalized bits.
    MPS owns [0, a-Qe), LPS [a-Qe, a), conditional exchange when
    a-Qe < Qe — the mirror of the decoder's DECODE procedure."""

    def __init__(self):
        self.a = 0x10000
        self.base = 0
        self.nbits = 0

    def encode(self, bins: bytearray, idx: int, bit: int) -> None:
        st = bins[idx]
        state, mps = st >> 1, st & 1
        qe, nmps, nlps, switch = _ARITH_QE[state]
        bottom = self.a - qe
        if bit == mps:
            if bottom >= 0x8000:  # fast path: no renorm, no estimation
                self.a = bottom
                return
            if bottom < qe:  # exchange: MPS coded in the upper part
                self.base += bottom
                self.a = qe
            else:
                self.a = bottom
            bins[idx] = (nmps << 1) | mps
        else:
            if bottom < qe:  # exchange: LPS coded in the lower part
                self.a = bottom
            else:
                self.base += bottom
                self.a = qe
            if switch:
                mps ^= 1
            bins[idx] = (nlps << 1) | mps
        while self.a < 0x8000:
            self.a <<= 1
            self.base <<= 1
            self.nbits += 1

    def flush(self) -> bytes:
        """Emit the code string: any value in [base, base+a) decodes
        correctly, so pick the one with the most trailing zero bits
        (T.81's FLUSH intent), drop trailing zero bytes (the decoder
        zero-fills past the marker), and stuff 0x00 after 0xFF."""
        total = self.nbits + 16
        lo, hi = self.base, self.base + self.a
        v = lo
        for tz in range(total, -1, -1):
            cand = ((hi - 1) >> tz) << tz
            if cand >= lo:
                v = cand
                break
        pad = (-total) % 8
        v <<= pad
        nbytes = (total + pad) // 8
        raw = v.to_bytes(nbytes, "big") if nbytes else b""
        raw = raw.rstrip(b"\x00")
        out = bytearray()
        for b in raw:
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


_FIXED = bytearray([113 << 1])


def _encode_dc(enc, bins, ctx, cond, diff):
    low, up = cond
    if diff == 0:
        enc.encode(bins, ctx, 0)
        return 0
    enc.encode(bins, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(bins, ctx + 1, sign)
    v1 = (-diff if sign else diff) - 1
    st = ctx + 2 + sign
    if v1 == 0:
        enc.encode(bins, st, 0)
        m = 0
        st = ctx + 2 + sign
    else:
        enc.encode(bins, st, 1)
        m = 1 << (v1.bit_length() - 1)
        st = 20
        mm = 1
        while mm < m:
            enc.encode(bins, st, 1)
            mm <<= 1
            st += 1
        enc.encode(bins, st, 0)
    if m < (1 << low) >> 1:
        nctx = 0
    elif m > (1 << up) >> 1:
        nctx = 12 + 4 * sign
    else:
        nctx = 4 + 4 * sign
    st += 14
    mm = m >> 1
    while mm:
        enc.encode(bins, st, 1 if v1 & mm else 0)
        mm >>= 1
    return nctx


def _encode_ac(enc, bins, zz, kx):
    last = max((k for k in range(1, 64) if zz[k]), default=0)
    k = 1
    while k <= last:
        st = 3 * (k - 1)
        enc.encode(bins, st, 0)  # not EOB
        while zz[k] == 0:
            enc.encode(bins, st + 1, 0)
            st += 3
            k += 1
        enc.encode(bins, st + 1, 1)
        v = zz[k]
        sign = 1 if v < 0 else 0
        enc.encode(_FIXED, 0, sign)
        v1 = (-v if sign else v) - 1
        st += 2
        if v1 == 0:
            enc.encode(bins, st, 0)
            m = 0
        else:
            enc.encode(bins, st, 1)
            m = 1 << (v1.bit_length() - 1)
            if m == 1:
                enc.encode(bins, st, 0)
            else:
                enc.encode(bins, st, 1)
                st = 189 if k <= kx else 217
                mm = 2
                while mm < m:
                    enc.encode(bins, st, 1)
                    mm <<= 1
                    st += 1
                enc.encode(bins, st, 0)
        st += 14
        mm = m >> 1
        while mm:
            enc.encode(bins, st, 1 if v1 & mm else 0)
            mm >>= 1
        k += 1
    if last < 63:
        enc.encode(bins, 3 * (last + 1 - 1), 1)  # EOB


def encode_arith(
    width: int,
    height: int,
    comps: list[tuple[int, int]],
    qtable: list[int],
    block_coeffs,
    restart_interval: int = 0,
    precision: int = 8,
    dac: dict | None = None,
) -> bytes:
    """SOF9 twin of tests/test_jpeg.py::_encode — same signature, same
    MCU walk, arithmetic entropy layer. ``dac``: optional
    {"dc": (L, U), "ac": Kx} conditioning (emits a DAC segment)."""
    hmax = max(h for h, _ in comps)
    vmax = max(v for _, v in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    cond = (dac or {}).get("dc", (0, 1))
    kx = (dac or {}).get("ac", 5)

    out = bytearray(b"\xff\xd8")
    zz_q = bytes(qtable[ZIGZAG_TO_NATURAL[z]] for z in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q
    sof = bytes([precision]) + struct.pack(">HH", height, width)
    sof += bytes([len(comps)])
    for ci, (h, v) in enumerate(comps):
        sof += bytes([ci + 1, (h << 4) | v, 0])
    out += b"\xff\xc9" + struct.pack(">H", 2 + len(sof)) + sof
    if dac:
        seg = bytearray()
        if "dc" in dac:
            seg += bytes([0x00, (dac["dc"][1] << 4) | dac["dc"][0]])
        if "ac" in dac:
            seg += bytes([0x10, dac["ac"]])
        out += b"\xff\xcc" + struct.pack(">H", 2 + len(seg)) + seg
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(comps)])
    for ci in range(len(comps)):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    def fresh():
        return (
            ArithEncoder(),
            bytearray(DC_STAT_BINS),
            bytearray(AC_STAT_BINS),
            [0] * len(comps),
            [0] * len(comps),
        )

    enc, dc_bins, ac_bins, pred, ctxs = fresh()
    counters = [0] * len(comps)
    rst = 0
    since = 0
    for _my in range(mcus_y):
        for _mx in range(mcus_x):
            if restart_interval and since == restart_interval:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                enc, dc_bins, ac_bins, pred, ctxs = fresh()
                since = 0
            for ci, (h, v) in enumerate(comps):
                for _b in range(h * v):
                    coeffs = block_coeffs(ci, counters[ci])
                    counters[ci] += 1
                    diff = coeffs[0] - pred[ci]
                    pred[ci] = coeffs[0]
                    ctxs[ci] = _encode_dc(
                        enc, dc_bins, ctxs[ci], cond, diff
                    )
                    zz = [coeffs[ZIGZAG_TO_NATURAL[z]] for z in range(64)]
                    _encode_ac(enc, ac_bins, zz, kx)
            since += 1
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ----------------------------------------- progressive (SOF10) encoder


def encode_arith_progressive(
    width: int,
    height: int,
    comps: list[tuple[int, int]],
    qtable: list[int],
    block_coeffs,
    scans: list[tuple[list[int], int, int, int, int]],
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """SOF10 twin of tests/test_jpeg.py::_encode_progressive — same
    scan-script shape, QM entropy layer per T.81 G.2. The encoder
    tracks the DECODER-visible coefficient state per block so
    refinement decisions (correction bits, newly-significant, EOB
    horizon kex) mirror what the decoder will see; scans must form a
    proper successive-approximation cascade (Ah of a refinement ==
    Al of the prior scan for that band)."""
    hmax = max(h for h, _ in comps)
    vmax = max(v for _, v in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    grids = []
    state = []  # decoder-visible accumulated coefficients
    for ci, (h, v) in enumerate(comps):
        bw, bh = mcus_x * h, mcus_y * v
        grids.append(
            [
                [list(block_coeffs(ci, by * bw + bx)) for bx in range(bw)]
                for by in range(bh)
            ]
        )
        state.append([[[0] * 64 for _ in range(bw)] for _ in range(bh)])

    def nonint_grid(ci):
        h, v = comps[ci]
        cw = -(-width * h // hmax)
        ch = -(-height * v // vmax)
        return -(-cw // 8), -(-ch // 8)

    out = bytearray(b"\xff\xd8")
    zz_q = bytes(qtable[ZIGZAG_TO_NATURAL[z]] for z in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q
    sof = bytes([precision]) + struct.pack(">HH", height, width)
    sof += bytes([len(comps)])
    for ci, (h, v) in enumerate(comps):
        sof += bytes([ci + 1, (h << 4) | v, 0])
    out += b"\xff\xca" + struct.pack(">H", 2 + len(sof)) + sof  # SOF10
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def sar(v, n):  # arithmetic shift of a signed value (G.1.2.1)
        return v >> n

    for comp_idxs, ss, se, ah, al in scans:
        sos = bytes([len(comp_idxs)])
        for ci in comp_idxs:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

        def fresh():
            return (
                ArithEncoder(),
                bytearray(DC_STAT_BINS),
                bytearray(AC_STAT_BINS),
                {ci: 0 for ci in comp_idxs},
                {ci: 0 for ci in comp_idxs},
            )

        enc, dc_bins, ac_bins, pred, ctxs = fresh()
        rst = 0
        since = 0

        def maybe_restart():
            nonlocal enc, dc_bins, ac_bins, pred, ctxs, rst, since
            if restart_interval and since == restart_interval:
                out.extend(enc.flush())
                out.extend(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) & 7
                enc, dc_bins, ac_bins, pred, ctxs = fresh()
                since = 0

        def dc_unit(ci, by, bx):
            coeffs = grids[ci][by][bx]
            st = state[ci][by][bx]
            if ah == 0:
                val = sar(coeffs[0], al)
                diff = val - pred[ci]
                pred[ci] = val
                ctxs[ci] = _encode_dc(enc, dc_bins, ctxs[ci], (0, 1), diff)
                st[0] = val << al
            else:
                bit = sar(coeffs[0], al) & 1
                enc.encode(_FIXED, 0, bit)
                if bit:
                    st[0] |= 1 << al

        def ac_first_unit(ci, by, bx):
            coeffs = grids[ci][by][bx]
            st_blk = state[ci][by][bx]
            zz = [coeffs[ZIGZAG_TO_NATURAL[z]] for z in range(64)]

            def tval(k):
                v = zz[k]
                t = (-v if v < 0 else v) >> al
                return -t if v < 0 else t

            last = max(
                (k for k in range(ss, se + 1) if tval(k)), default=ss - 1
            )
            k = ss
            while k <= last:
                st = 3 * (k - 1)
                enc.encode(ac_bins, st, 0)  # not EOB
                while tval(k) == 0:
                    enc.encode(ac_bins, st + 1, 0)
                    st += 3
                    k += 1
                enc.encode(ac_bins, st + 1, 1)
                v = tval(k)
                sign = 1 if v < 0 else 0
                enc.encode(_FIXED, 0, sign)
                v1 = (-v if sign else v) - 1
                st += 2
                if v1 == 0:
                    enc.encode(ac_bins, st, 0)
                    m = 0
                else:
                    enc.encode(ac_bins, st, 1)
                    m = 1 << (v1.bit_length() - 1)
                    if m == 1:
                        enc.encode(ac_bins, st, 0)
                    else:
                        enc.encode(ac_bins, st, 1)
                        st = 189 if k <= 5 else 217
                        mm = 2
                        while mm < m:
                            enc.encode(ac_bins, st, 1)
                            mm <<= 1
                            st += 1
                        enc.encode(ac_bins, st, 0)
                st += 14
                mm = m >> 1
                while mm:
                    enc.encode(ac_bins, st, 1 if v1 & mm else 0)
                    mm >>= 1
                st_blk[ZIGZAG_TO_NATURAL[k]] = v << al
                k += 1
            if last < se:
                enc.encode(ac_bins, 3 * (last + 1 - 1), 1)  # EOB

        def ac_refine_unit(ci, by, bx):
            coeffs = grids[ci][by][bx]
            st_blk = state[ci][by][bx]
            p1 = 1 << al

            def tmag(k):
                v = coeffs[ZIGZAG_TO_NATURAL[k]]
                return (-v if v < 0 else v) >> al

            kex = se
            while kex > 0 and st_blk[ZIGZAG_TO_NATURAL[kex]] == 0:
                kex -= 1
            k = ss
            while k <= se:
                st = 3 * (k - 1)
                if k > kex:
                    if not any(
                        st_blk[ZIGZAG_TO_NATURAL[j]] or tmag(j)
                        for j in range(k, se + 1)
                    ):
                        enc.encode(ac_bins, st, 1)  # EOB
                        return
                    enc.encode(ac_bins, st, 0)
                while True:
                    nat = ZIGZAG_TO_NATURAL[k]
                    cur = st_blk[nat]
                    if cur:
                        bit = tmag(k) & 1
                        enc.encode(ac_bins, st + 2, bit)
                        if bit:
                            st_blk[nat] = cur - p1 if cur < 0 else cur + p1
                        break
                    if tmag(k):
                        enc.encode(ac_bins, st + 1, 1)
                        sign = 1 if coeffs[nat] < 0 else 0
                        enc.encode(_FIXED, 0, sign)
                        st_blk[nat] = -p1 if sign else p1
                        break
                    enc.encode(ac_bins, st + 1, 0)
                    st += 3
                    k += 1
                k += 1

        if ss == 0:
            if len(comp_idxs) > 1:  # interleaved DC
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        maybe_restart()
                        for ci in comp_idxs:
                            h, v = comps[ci]
                            for by in range(v):
                                for bx in range(h):
                                    dc_unit(
                                        ci, my * v + by, mx * h + bx
                                    )
                        since += 1
            else:
                ci = comp_idxs[0]
                bw, bh = nonint_grid(ci)
                for by in range(bh):
                    for bx in range(bw):
                        maybe_restart()
                        dc_unit(ci, by, bx)
                        since += 1
        else:
            ci = comp_idxs[0]
            bw, bh = nonint_grid(ci)
            for by in range(bh):
                for bx in range(bw):
                    maybe_restart()
                    if ah == 0:
                        ac_first_unit(ci, by, bx)
                    else:
                        ac_refine_unit(ci, by, bx)
                    since += 1
        out.extend(enc.flush())
    out += b"\xff\xd9"
    return bytes(out)


# -------------------------------------------------------- raw coder tests


def _roundtrip_bits(bits, nbins=4, seed=0):
    """Encode a bit sequence against rotating adaptive contexts, then
    decode with the production decoder and compare."""
    from cryptocoininsights_data_engineer_project_spark.operators.jpegcodec import (
        _ArithDecoder,
    )

    enc = ArithEncoder()
    ebins = bytearray(nbins)
    for i, b in enumerate(bits):
        enc.encode(ebins, i % nbins, b)
    blob = enc.flush() + b"\xff\xd9"
    dec = _ArithDecoder(blob, 0)
    dbins = bytearray(nbins)
    got = [dec.decode(dbins, i % nbins) for i in range(len(bits))]
    assert got == list(bits)
    assert dbins == ebins  # estimation state machines stayed in lockstep


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_raw_coder_roundtrip_random(seed):
    rng = random.Random(seed)
    _roundtrip_bits([rng.randint(0, 1) for _ in range(4000)])


@pytest.mark.parametrize("p1", [0.02, 0.2, 0.5, 0.8, 0.98])
def test_raw_coder_roundtrip_skewed(p1):
    rng = random.Random(int(p1 * 100))
    _roundtrip_bits([1 if rng.random() < p1 else 0 for _ in range(6000)])


def test_raw_coder_roundtrip_tiny_and_constant():
    _roundtrip_bits([0])
    _roundtrip_bits([1])
    _roundtrip_bits([0] * 500)
    _roundtrip_bits([1] * 500)


def test_coder_adapts_toward_entropy():
    # 20k bits at P(1)=0.95 (H ~ 0.286 bits/bit ~ 716 bytes): the
    # adaptive estimator must land well under 1 bit/bit — a scrambled
    # Qe table or broken estimation stays near (or above) raw size.
    rng = random.Random(42)
    bits = [1 if rng.random() < 0.95 else 0 for _ in range(20000)]
    enc = ArithEncoder()
    ebins = bytearray(1)
    for b in bits:
        enc.encode(ebins, 0, b)
    n = len(enc.flush())
    assert n < 1100, f"compressed {n} bytes, expected near-entropy ~720"


def test_qe_table_invariants():
    assert len(_ARITH_QE) == 114
    assert _ARITH_QE[0][0] == 0x5A1D and _ARITH_QE[112][0] == 0x59EB
    assert _ARITH_QE[113] == (0x5A1D, 113, 113, 0)  # fixed bin
    for i, (qe, nmps, nlps, sw) in enumerate(_ARITH_QE):
        assert 0 < qe < 0x8000
        assert 0 <= nmps < 114 and 0 <= nlps < 114
        assert sw in (0, 1)
        if i < 113 and sw:
            # MPS switches only from the most-uncertain states
            assert qe > 0x5000


def test_stuffing_occurs_and_decodes():
    # hunt a seed whose code string contains 0xFF -> stuffed 0x00
    for seed in range(50):
        rng = random.Random(seed)
        bits = [rng.randint(0, 1) for _ in range(3000)]
        enc = ArithEncoder()
        ebins = bytearray(2)
        for i, b in enumerate(bits):
            enc.encode(ebins, i % 2, b)
        blob = enc.flush()
        if b"\xff\x00" in blob:
            _roundtrip_bits(bits, nbins=2)
            return
    pytest.fail("no seed produced a 0xFF byte to stuff")


# ------------------------------------------------- full-image round-trips


def _rand_coeffs(seed, spread=40):
    rng = random.Random(seed)

    def gen(ci, b):
        c = [0] * 64
        c[0] = rng.randint(-spread, spread)
        for _ in range(rng.randint(0, 12)):
            c[rng.randint(1, 63)] = rng.randint(-12, 12)
        return c

    return gen


def _pixels(blob):
    w, h, ch, px = decode_jpeg_pixels(blob)
    return w, h, ch, bytes(px)


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_grayscale_matches_huffman_twin(seed):
    gen = _rand_coeffs(seed)
    cache = {}

    def coeffs(ci, b):
        if (ci, b) not in cache:
            cache[(ci, b)] = gen(ci, b)
        return cache[(ci, b)]

    q = [8] * 64
    hv = [(1, 1)]
    a = _pixels(encode_arith(24, 16, hv, q, coeffs))
    b = _pixels(huffman_encode(24, 16, hv, q, coeffs))
    assert a == b


def test_color_420_matches_huffman_twin():
    gen = _rand_coeffs(77, spread=30)
    cache = {}

    def coeffs(ci, b):
        if (ci, b) not in cache:
            cache[(ci, b)] = gen(ci, b)
        return cache[(ci, b)]

    q = [4] * 64
    hv = [(2, 2), (1, 1), (1, 1)]
    a = _pixels(encode_arith(32, 16, hv, q, coeffs))
    b = _pixels(huffman_encode(32, 16, hv, q, coeffs))
    assert a == b
    assert a[2] == 3


def test_restart_markers_match_huffman_twin():
    gen = _rand_coeffs(5)
    cache = {}

    def coeffs(ci, b):
        if (ci, b) not in cache:
            cache[(ci, b)] = gen(ci, b)
        return cache[(ci, b)]

    q = [8] * 64
    a = _pixels(encode_arith(48, 16, [(1, 1)], q, coeffs, restart_interval=2))
    b = _pixels(huffman_encode(48, 16, [(1, 1)], q, coeffs, restart_interval=2))
    assert a == b
    # and the restart stream really carries RST markers
    blob = encode_arith(48, 16, [(1, 1)], q, coeffs, restart_interval=2)
    assert b"\xff\xd0" in blob


def test_nondefault_dac_conditioning_roundtrip():
    # U=2 widens the "small diff" class; Kx=1 pushes the AC high band
    # onto nearly every k — both sides must honor the DAC parameters
    gen = _rand_coeffs(99, spread=60)
    cache = {}

    def coeffs(ci, b):
        if (ci, b) not in cache:
            cache[(ci, b)] = gen(ci, b)
        return cache[(ci, b)]

    q = [8] * 64
    dac = {"dc": (0, 2), "ac": 1}
    a = _pixels(encode_arith(32, 24, [(1, 1)], q, coeffs, dac=dac))
    b = _pixels(huffman_encode(32, 24, [(1, 1)], q, coeffs))
    assert a == b
    blob = encode_arith(32, 24, [(1, 1)], q, coeffs, dac=dac)
    assert b"\xff\xcc" in blob


def test_12bit_sof9_matches_12bit_sof1():
    rng = random.Random(13)
    cache = {}

    def coeffs(ci, b):
        if (ci, b) not in cache:
            c = [0] * 64
            c[0] = rng.randint(-900, 900)  # 12-bit DC range
            for _ in range(6):
                c[rng.randint(1, 63)] = rng.randint(-40, 40)
            cache[(ci, b)] = c
        return cache[(ci, b)]

    q = [8] * 64
    a = _pixels(encode_arith(16, 8, [(1, 1)], q, coeffs, precision=12))
    b = _pixels(huffman_encode(16, 8, [(1, 1)], q, coeffs, precision=12))
    assert a == b


def test_large_magnitudes_exercise_deep_chains():
    # DC diffs and AC values far beyond one octave: X-chain + mantissa
    vals = [0, 1, -1, 2, -3, 255, -256, 1023, -1000, 512]

    def coeffs(ci, b):
        c = [0] * 64
        c[0] = vals[b % len(vals)]
        c[1] = vals[(b + 3) % len(vals)] // 2
        c[9] = -vals[(b + 5) % len(vals)] // 4
        return c

    q = [1] * 64
    hv = [(1, 1)]
    a = _pixels(encode_arith(80, 8, hv, q, coeffs))
    b = _pixels(huffman_encode(80, 8, hv, q, coeffs))
    assert a == b


# ------------------------------------------- progressive round-trips


def _cached(gen):
    cache = {}

    def coeffs(ci, b):
        if (ci, b) not in cache:
            cache[(ci, b)] = gen(ci, b)
        return cache[(ci, b)]

    return coeffs


def _twin(width, height, hv, q, coeffs, scans, **kw):
    a = _pixels(encode_arith_progressive(width, height, hv, q, coeffs, scans, **kw))
    b = _pixels(
        huffman_encode_progressive(width, height, hv, q, coeffs, scans, **kw)
    )
    assert a == b
    return a


def test_progressive_arith_spectral_selection():
    coeffs = _cached(_rand_coeffs(21))
    scans = [([0], 0, 0, 0, 0), ([0], 1, 5, 0, 0), ([0], 6, 63, 0, 0)]
    _twin(24, 16, [(1, 1)], [8] * 64, coeffs, scans)


def test_progressive_arith_successive_approximation():
    coeffs = _cached(_rand_coeffs(22))
    scans = [
        ([0], 0, 0, 0, 1),
        ([0], 1, 63, 0, 1),
        ([0], 0, 0, 1, 0),
        ([0], 1, 63, 1, 0),
    ]
    _twin(16, 16, [(1, 1)], [8] * 64, coeffs, scans)


def test_progressive_arith_banded_sa_color_420():
    coeffs = _cached(_rand_coeffs(23, spread=25))
    scans = [
        ([0, 1, 2], 0, 0, 0, 1),  # interleaved DC first
        ([0], 1, 5, 0, 2),
        ([0], 6, 63, 0, 1),
        ([1], 1, 63, 0, 1),
        ([2], 1, 63, 0, 1),
        ([0, 1, 2], 0, 0, 1, 0),  # DC refine
        ([0], 1, 5, 2, 1),
        ([0], 1, 5, 1, 0),
        ([0], 6, 63, 1, 0),
        ([1], 1, 63, 1, 0),
        ([2], 1, 63, 1, 0),
    ]
    got = _twin(32, 16, [(2, 2), (1, 1), (1, 1)], [4] * 64, coeffs, scans)
    assert got[2] == 3


def test_progressive_arith_restart_markers():
    coeffs = _cached(_rand_coeffs(24))
    scans = [
        ([0], 0, 0, 0, 1),
        ([0], 1, 63, 0, 0),
        ([0], 0, 0, 1, 0),
    ]
    blob = encode_arith_progressive(
        48, 16, [(1, 1)], [8] * 64, coeffs, scans, restart_interval=2
    )
    assert b"\xff\xd0" in blob
    a = _pixels(blob)
    b = _pixels(
        huffman_encode_progressive(
            48, 16, [(1, 1)], [8] * 64, coeffs, scans, restart_interval=2
        )
    )
    assert a == b


def test_progressive_arith_matches_sequential_arith():
    # full-band single-scan progressive == sequential on same coeffs
    coeffs = _cached(_rand_coeffs(25))
    scans = [([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0)]
    a = _pixels(
        encode_arith_progressive(16, 8, [(1, 1)], [8] * 64, coeffs, scans)
    )
    b = _pixels(encode_arith(16, 8, [(1, 1)], [8] * 64, coeffs))
    assert a == b


def test_registry_fixture_blob_matches_independent_encoder():
    # the constant QM segment embedded in operators/multimodal.py must
    # be exactly what the independent Annex-D encoder produces for the
    # documented DIFF sequence under default conditioning
    from cryptocoininsights_data_engineer_project_spark.operators import (
        multimodal,
    )

    enc = ArithEncoder()
    dc_bins = bytearray(DC_STAT_BINS)
    ac_bins = bytearray(AC_STAT_BINS)
    ctx = 0
    for d in (8, 8, -16, 24):
        ctx = _encode_dc(enc, dc_bins, ctx, (0, 1), d)
        _encode_ac(enc, ac_bins, [0] * 64, 5)
    assert enc.flush().hex() == multimodal.JPEG_ARITH_BLOB_HEX


def test_registry_fixture_decodes_to_block_formula():
    import numpy as np

    from cryptocoininsights_data_engineer_project_spark.operators import (
        multimodal,
    )

    pre = bytes.fromhex(multimodal._JPEG_ARITH_PRE_HEX)
    post = bytes.fromhex(multimodal._JPEG_ARITH_POST_HEX)
    for doc_id in (0, 4, 12, 25):
        q0 = 1 + doc_id % 13
        w, h, ch, px = decode_jpeg_pixels(pre + bytes([q0]) + post)
        assert (w, h, ch) == (16, 16, 1)
        a = np.frombuffer(bytes(px), dtype=np.uint8).reshape(16, 16)
        for by, bx, m in ((0, 0, 1), (0, 1, 2), (1, 0, 0), (1, 1, 3)):
            blk = a[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert (blk == 128 + q0 * m).all()


def test_progressive_registry_fixture_matches_independent_encoder():
    from cryptocoininsights_data_engineer_project_spark.operators import (
        multimodal,
    )

    dcs = multimodal.JPEG_ARITHP_DCS

    def coeffs(ci, b):
        return [dcs[b]] + [0] * 63

    scans = [
        ([0], 0, 0, 0, 1),
        ([0], 1, 63, 0, 0),
        ([0], 0, 0, 1, 0),
        ([0], 1, 63, 1, 0),
    ]
    blob = encode_arith_progressive(16, 16, [(1, 1)], [8] * 64, coeffs, scans)
    pre = bytes.fromhex(multimodal._JPEG_ARITHP_PRE_HEX)
    post = bytes.fromhex(multimodal._JPEG_ARITHP_POST_HEX)
    assert blob == pre + bytes([8]) + post


def test_progressive_registry_fixture_decodes_to_block_formula():
    import numpy as np

    from cryptocoininsights_data_engineer_project_spark.operators import (
        multimodal,
    )

    pre = bytes.fromhex(multimodal._JPEG_ARITHP_PRE_HEX)
    post = bytes.fromhex(multimodal._JPEG_ARITHP_POST_HEX)
    dcs = multimodal.JPEG_ARITHP_DCS
    for doc_id in (0, 5, 18):
        scale = 1 + doc_id % 13
        w, h, ch, px = decode_jpeg_pixels(pre + bytes([8 * scale]) + post)
        assert (w, h, ch) == (16, 16, 1)
        a = np.frombuffer(bytes(px), dtype=np.uint8).reshape(16, 16)
        for b, (by, bx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            blk = a[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert (blk == 128 + dcs[b] * scale).all()


def test_gates_still_loud():
    # SOF11 decodes now (tests/test_jpeg_lossless_arith.py): a DCT
    # stream relabeled SOF11 is malformed LOSSLESS (Ss=0 is not a
    # predictor) — loud JpegError; hierarchical stays gated
    blob = bytearray(
        encode_arith(8, 8, [(1, 1)], [8] * 64, lambda ci, b: [3] + [0] * 63)
    )
    at = blob.index(b"\xff\xc9")
    blob[at + 1] = 0xCB
    with pytest.raises(JpegError, match="predictor"):
        decode_jpeg_pixels(bytes(blob))
    blob[at + 1] = 0xCD
    with pytest.raises(NotImplementedError):
        decode_jpeg_pixels(bytes(blob))
    # a sequential-arith stream relabeled progressive-arith is
    # MALFORMED (its interleaved full-band scan violates G.2) —
    # loud JpegError, not a silent misdecode
    blob[at + 1] = 0xCA
    with pytest.raises(JpegError):
        decode_jpeg_pixels(bytes(blob))


def test_dac_validation():
    blob = bytearray(
        encode_arith(
            8, 8, [(1, 1)], [8] * 64, lambda ci, b: [3] + [0] * 63,
            dac={"ac": 5},
        )
    )
    at = blob.index(b"\xff\xcc")
    blob[at + 5] = 0  # Kx = 0 out of range
    with pytest.raises(JpegError, match="Kx"):
        decode_jpeg_pixels(bytes(blob))


def test_raw_coder_roundtrip_property():
    # hypothesis sweep: arbitrary bit sequences against 1-8 contexts
    # must round-trip exactly with lockstep estimation state
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(
        bits=st.lists(st.integers(0, 1), min_size=0, max_size=600),
        nbins=st.integers(1, 8),
    )
    def run(bits, nbins):
        if bits:
            _roundtrip_bits(bits, nbins=nbins)

    run()


def test_odd_dac_segment_raises_jpeg_error():
    blob = bytearray(
        encode_arith(
            8, 8, [(1, 1)], [8] * 64, lambda ci, b: [3] + [0] * 63,
            dac={"ac": 5},
        )
    )
    at = blob.index(b"\xff\xcc")
    # shrink the declared segment to an odd payload length
    blob[at + 2 : at + 4] = (3).to_bytes(2, "big")
    with pytest.raises(JpegError, match="odd DAC"):
        decode_jpeg_pixels(bytes(blob[: at + 5]) + bytes(blob[at + 6 :]))


def test_12bit_progressive_arith_matches_huffman_progressive():
    """Round 9: 12-bit SOF10 — same grids through the QM progressive
    path and the 12-bit Huffman progressive twin."""
    rng = random.Random(31)
    cache = {}

    def coeffs(ci, b):
        if (ci, b) not in cache:
            c = [0] * 64
            c[0] = rng.randint(-1500, 1500)
            for _ in range(6):
                c[rng.randint(1, 63)] = rng.randint(-200, 200)
            cache[(ci, b)] = c
        return cache[(ci, b)]

    q = [4] * 64
    scans = [
        ([0], 0, 0, 0, 1),
        ([0], 1, 63, 0, 0),
        ([0], 0, 0, 1, 0),
    ]
    a = _pixels(
        encode_arith_progressive(
            16, 16, [(1, 1)], q, coeffs, scans, precision=12
        )
    )
    b = _pixels(
        huffman_encode_progressive(
            16, 16, [(1, 1)], q, coeffs, scans, precision=12
        )
    )
    assert a == b
