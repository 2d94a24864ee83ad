"""FLAC: independent encoder + exact round trips against the decoder.

Same discipline as the lossless-JPEG suites: FLAC is lossless, so a
round trip to EXACT source samples is a ground-truth check of the
whole pipeline (bit packing, coded numbers, Rice coding, predictors,
stereo decorrelation, CRCs) — and the encoder below is written from
the spec (RFC 9639 / xiph) independently of the decoder's structure.
"""

from __future__ import annotations

import numpy as np
import pytest

from cryptocoininsights_data_engineer_project_spark.operators.flaccodec import (
    FlacError,
    _crc8,
    _crc16,
    decode_flac,
)

# ------------------------------------------------------------- bit writer


class _W:
    def __init__(self):
        self.bits: list[int] = []

    def w(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ws(self, v, n):  # signed two's complement
        self.w(v & ((1 << n) - 1), n)

    def unary(self, n):
        self.bits.extend([0] * n + [1])

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self):
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _coded(w, v):
    if v < 0x80:
        w.w(v, 8)
        return
    n = 1  # continuation bytes; lead byte then carries 6 - n bits
    while v >= (1 << (5 * n + 6)):
        n += 1
    # lead byte: n+1 ones, a zero, then the top bits of v
    top = v >> (6 * n)
    ones = (1 << (n + 1)) - 1
    w.w((ones << (7 - n)) | top, 8)
    for i in range(n - 1, -1, -1):
        w.w(0x80 | ((v >> (6 * i)) & 0x3F), 8)


def _rice(w, residuals, param, escape_bits=None, pbits=4):
    if escape_bits is not None:
        w.w((1 << pbits) - 1, pbits)
        w.w(escape_bits, 5)
        for r in residuals:
            if escape_bits:
                w.ws(r, escape_bits)
        return
    w.w(param, pbits)
    for r in residuals:
        u = -2 * r - 1 if r < 0 else 2 * r  # zigzag
        w.unary(u >> param)
        w.w(u & ((1 << param) - 1), param)


def encode_flac(
    channels_samples,
    bps=16,
    rate=8000,
    blocksize=None,
    subframe="verbatim",
    fixed_order=2,
    stereo=None,
    partition_order=0,
    rice_param=4,
    escape_bits=None,
    wasted=0,
    lpc=None,
):
    """Single-frame FLAC stream for per-channel sample lists.
    ``stereo``: None (independent) / 8 (left/side) / 9 (right/side) /
    10 (mid/side). ``lpc``: (coefs, shift, precision) to force an LPC
    subframe."""
    nch = len(channels_samples)
    n = len(channels_samples[0])
    blocksize = blocksize or n

    # STREAMINFO
    si = _W()
    si.w(blocksize, 16), si.w(blocksize, 16)
    si.w(0, 24), si.w(0, 24)
    si.w(rate, 20), si.w(nch - 1, 3), si.w(bps - 1, 5), si.w(n, 36)
    head = b"fLaC" + bytes([0x80, 0, 0, 34]) + si.bytes() + bytes(16)

    # channel-assignment transform
    if stereo is None:
        subs = [list(c) for c in channels_samples]
        chan_code = nch - 1
        extras = [0] * nch
    else:
        left, right = channels_samples
        side = [lv - rv for lv, rv in zip(left, right)]
        if stereo == 8:
            subs = [list(left), side]
            extras = [0, 1]
        elif stereo == 9:
            subs = [side, list(right)]
            extras = [1, 0]
        else:
            mid = [(lv + rv) >> 1 for lv, rv in zip(left, right)]
            subs = [mid, side]
            extras = [0, 1]
        chan_code = stereo

    # frame header
    h = _W()
    h.w(0b11111111111110, 14)
    h.w(0, 1), h.w(0, 1)  # reserved, fixed blocking
    h.w(7, 4)  # blocksize: 16-bit-1 field at header end
    h.w(0, 4)  # sample rate: from STREAMINFO
    h.w(chan_code, 4)
    h.w({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
    h.w(0, 1)
    _coded(h, 0)
    h.w(blocksize - 1, 16)
    hdr = h.bytes()
    hdr += bytes([_crc8(hdr)])

    body = _W()
    for ci, samples in enumerate(subs):
        eff = bps + extras[ci] - wasted
        body.w(0, 1)
        if subframe == "constant":
            body.w(0, 6)
        elif subframe == "verbatim":
            body.w(1, 6)
        elif subframe == "fixed":
            body.w(8 + fixed_order, 6)
        else:  # lpc
            body.w(0x20 | (len(lpc[0]) - 1), 6)
        if wasted:
            body.w(1, 1)
            body.unary(wasted - 1)
        else:
            body.w(0, 1)
        vals = [v >> wasted for v in samples]
        if subframe == "constant":
            body.ws(vals[0], eff)
            continue
        if subframe == "verbatim":
            for v in vals:
                body.ws(v, eff)
            continue
        if subframe == "fixed":
            order = fixed_order
            coefs = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                     4: [4, -6, 4, -1]}[order]
            shift = 0
        else:
            coefs, shift, prec = lpc
            order = len(coefs)
        for v in vals[:order]:
            body.ws(v, eff)
        if subframe == "lpc":
            body.w(prec - 1, 4)
            body.ws(shift, 5)
            for c in coefs:
                body.ws(c, prec)
        res = []
        for i in range(order, len(vals)):
            acc = sum(c * vals[i - 1 - j] for j, c in enumerate(coefs))
            res.append(vals[i] - (acc >> shift))
        body.w(0, 2)  # 4-bit rice parameters
        body.w(partition_order, 4)
        nparts = 1 << partition_order
        per = blocksize // nparts
        start = 0
        for p in range(nparts):
            cnt = per - (order if p == 0 else 0)
            _rice(body, res[start : start + cnt], rice_param,
                  escape_bits=escape_bits)
            start += cnt
    body.align()
    frame = hdr + body.bytes()
    frame += _crc16(frame).to_bytes(2, "big")
    return head + frame


# ------------------------------------------------------------- round trips


def _grid(seed, n, lo, hi):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, size=n).tolist()


def _check(blob, chans, rate=8000, bps=16):
    r, nch, b, samples = decode_flac(blob)
    assert (r, nch, b) == (rate, len(chans), bps)
    for ci, c in enumerate(chans):
        assert samples[:, ci].tolist() == c


@pytest.mark.parametrize("sub", ["constant", "verbatim", "fixed", "lpc"])
def test_roundtrip_subframe_types(sub):
    if sub == "constant":
        chans = [[-1234] * 24]
    else:
        chans = [_grid(3, 24, -2000, 2000)]
    kw = {}
    if sub == "lpc":
        kw["lpc"] = ([3, -2], 1, 5)  # quantized 2-tap predictor
    _check(encode_flac(chans, subframe=sub, **kw), chans)


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_roundtrip_fixed_orders(order):
    chans = [_grid(10 + order, 32, -5000, 5000)]
    _check(encode_flac(chans, subframe="fixed", fixed_order=order), chans)


@pytest.mark.parametrize("stereo", [None, 8, 9, 10])
def test_roundtrip_stereo_modes(stereo):
    chans = [_grid(20, 16, -3000, 3000), _grid(21, 16, -3000, 3000)]
    _check(encode_flac(chans, stereo=stereo), chans)


@pytest.mark.parametrize("po", [0, 1, 2])
def test_roundtrip_partition_orders(po):
    chans = [_grid(30 + po, 32, -400, 400)]
    _check(
        encode_flac(chans, subframe="fixed", partition_order=po), chans
    )


def test_roundtrip_escape_partitions():
    chans = [_grid(40, 16, -100, 100)]
    _check(
        encode_flac(chans, subframe="fixed", escape_bits=18), chans
    )
    # zero-bit escape: all residuals zero == a linear ramp
    ramp = [[7 + 3 * i for i in range(16)]]
    _check(
        encode_flac(ramp, subframe="fixed", fixed_order=2,
                    escape_bits=0),
        ramp,
    )


def test_roundtrip_wasted_bits():
    chans = [[v << 3 for v in _grid(50, 16, -200, 200)]]
    _check(encode_flac(chans, wasted=3), chans)


@pytest.mark.parametrize("bps", [8, 12, 16, 24])
def test_roundtrip_bit_depths(bps):
    lim = 1 << (bps - 1)
    chans = [_grid(60 + bps, 16, -lim, lim)]
    _check(encode_flac(chans, bps=bps), chans, bps=bps)


def test_crc_gates_and_structure_gates():
    chans = [_grid(70, 16, -500, 500)]
    good = encode_flac(chans)
    bad = bytearray(good)
    bad[-10] ^= 0x01  # flip a residual bit -> frame CRC-16 mismatch
    with pytest.raises(FlacError, match="CRC-16"):
        decode_flac(bytes(bad))
    bad2 = bytearray(good)
    # frame header starts right after 4 + 4 + 34 metadata bytes
    fh = 4 + 4 + 34
    bad2[fh + 2] ^= 0x10  # blocksize code -> header CRC-8 mismatch
    with pytest.raises(FlacError, match="CRC-8"):
        decode_flac(bytes(bad2))
    with pytest.raises(FlacError, match="fLaC"):
        decode_flac(b"RIFF not a flac")
    # truncation at the metadata boundary is caught by the
    # STREAMINFO total-samples cross-check; mid-frame by the reader
    with pytest.raises(FlacError, match="truncated|sync|declares"):
        decode_flac(good[: len(good) // 2])
    with pytest.raises(FlacError, match="truncated|sync|CRC"):
        decode_flac(good[: len(good) - 4])


def test_streaminfo_total_mismatch_gates():
    chans = [_grid(80, 16, -500, 500)]
    blob = bytearray(encode_flac(chans))
    # STREAMINFO total-samples field: last 36 bits of the 34-byte
    # block body ending at offset 8 + 34; bump the low byte
    blob[8 + 34 - 16 - 1] ^= 0x01
    with pytest.raises(FlacError, match="STREAMINFO declares"):
        decode_flac(bytes(blob))


def test_fixture_matches_registry_formula(spark):
    from cryptocoininsights_data_engineer_project_spark.operators.multimodal import (
        FLAC_N_SAMPLES,
        synth_flac_assets,
    )

    docs = spark.range(0, 9).selectExpr("id AS doc_id")
    for row in synth_flac_assets(docs).collect():
        rate, nch, bps, samples = decode_flac(bytes(row.payload))
        assert (rate, nch, bps) == (8000, 1, 8)
        d = row.asset_id
        want = []
        for j in range(FLAC_N_SAMPLES):
            u = (d * 37 + j * 11) % 256
            want.append(u - 256 if u >= 128 else u)
        assert samples[:, 0].tolist() == want


def test_truncation_at_every_boundary_is_typed():
    # every prefix of a valid stream must raise FlacError (never an
    # untyped IndexError) — the contract the zip/tar/tfrecord
    # siblings are fuzzed for
    chans = [_grid(90, 12, -300, 300)]
    good = encode_flac(chans)
    for cut in range(len(good)):
        try:
            decode_flac(good[:cut])
        except FlacError:
            pass


def test_fuzz_never_crashes_untyped():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=250, deadline=None)
    @given(st.binary(max_size=400))
    def run(blob):
        try:
            decode_flac(b"fLaC" + blob)
        except FlacError:
            pass

    run()


def test_metadata_only_stream_decodes_to_zero_samples():
    # STREAMINFO with total_samples = 0 ("unknown") and no frames is
    # spec-valid; the stats operator emits NULL peaks/rms for it
    chans = [_grid(91, 8, -100, 100)]
    blob = bytearray(encode_flac(chans))
    meta = bytes(blob[: 4 + 4 + 34])
    meta = bytearray(meta)
    # zero the 36-bit total-samples field (last 4.5 bytes before MD5)
    meta[8 + 13] &= 0xF0
    for i in range(14, 18):
        meta[8 + i] = 0
    _, nch, _, samples = decode_flac(bytes(meta))
    assert samples.shape == (0, 1)
