"""Arithmetic frame types inside hierarchical pyramids (round 12 —
closing the last T.81 operating-mode gates): SOF9/SOF13 sequential,
SOF10/SOF14 progressive, SOF11/SOF15 lossless arithmetic frames, plus
the SOF3 Huffman non-differential lossless base, all inside DHP
pyramids. Strategy: the SAME stage specs encode through the Huffman
and the QM entropy layers (tests/test_jpeg_hierarchical.py's
encode_hierarchical grew per-stage ``arith``); decodes must agree
with each other AND with the closed-form pyramid evaluator
``_expected`` — entropy-agnostic by construction, so a shared bug in
the arithmetic tables can't cancel out.
"""

from __future__ import annotations

import struct

import pytest

from cryptocoininsights_data_engineer_project_spark.operators.jpegcodec import (
    JpegError,
    decode_jpeg_hierarchical,
)
from tests.test_jpeg import _amp_bits, _canonical, _category, _dht, _Packer
from tests.test_jpeg_hierarchical import (
    _check,
    _expand_py,
    _expected,
    _frame_plane,
    _grids,
    encode_hierarchical,
)


def _twin_check(full_w, full_h, ncomp, q, precision, stages):
    """Decode the arith-flagged stages AND their Huffman twin; both
    must equal the closed-form expectation exactly."""
    _check(full_w, full_h, ncomp, q, precision, stages)
    blob_a = encode_hierarchical(full_w, full_h, ncomp, q, precision, stages)
    huff = [dict(st, arith=False) for st in stages]
    blob_h = encode_hierarchical(full_w, full_h, ncomp, q, precision, huff)
    _, _, _, sa = decode_jpeg_hierarchical(blob_a)
    _, _, _, sh = decode_jpeg_hierarchical(blob_h)
    assert (sa == sh).all()


def test_sof9_base_sof13_correction():
    q = [8] * 64
    stages = [
        {"diff": False, "w": 8, "h": 8, "coeffs": _grids(1), "arith": True},
        {"diff": True, "w": 16, "h": 16, "exp": (1, 1),
         "coeffs": _grids(2, 12), "arith": True},
    ]
    _twin_check(16, 16, 1, q, 8, stages)


def test_sof13_color_and_mixed_entropy_pyramid():
    """Arithmetic corrections over a HUFFMAN base (and vice versa) —
    entropy choice is per frame in T.81, so pyramids may mix."""
    q = [8] * 64
    stages = [
        {"diff": False, "w": 8, "h": 8, "coeffs": _grids(3), "arith": False},
        {"diff": True, "w": 8, "h": 8, "coeffs": _grids(4, 10), "arith": True},
        {"diff": True, "w": 16, "h": 16, "exp": (1, 1),
         "coeffs": _grids(5, 8), "arith": False},
    ]
    _check(16, 16, 3, q, 8, stages)


def test_sof10_base_sof14_progressive_pyramid():
    q = [8] * 64
    stages = [
        {"diff": False, "w": 8, "h": 8, "coeffs": _grids(6),
         "mode": "prog", "arith": True},
        {"diff": True, "w": 16, "h": 16, "exp": (1, 1),
         "coeffs": _grids(7, 10), "mode": "prog", "arith": True},
    ]
    _twin_check(16, 16, 1, q, 8, stages)


def test_sof14_dc_successive_approximation():
    q = [8] * 64
    stages = [
        {"diff": False, "w": 8, "h": 8, "coeffs": _grids(8), "arith": True},
        {"diff": True, "w": 8, "h": 8, "coeffs": _grids(9, 10),
         "mode": "prog", "arith": True,
         "scans": [(0, 0, 0, 1), (0, 0, 1, 0), (1, 63, 0, 0, 0)]},
    ]
    _twin_check(8, 8, 1, q, 8, stages)


def test_sof15_lossless_arith_final_correction():
    import random

    rng = random.Random(10)
    cache = {}

    def samples(ci, y, x):
        if (ci, y, x) not in cache:
            cache[(ci, y, x)] = rng.randint(-20, 20)
        return cache[(ci, y, x)]

    q = [8] * 64
    stages = [
        {"diff": False, "w": 8, "h": 8, "coeffs": _grids(11), "arith": True},
        {"diff": True, "w": 8, "h": 8, "mode": "lossless",
         "samples": samples, "arith": True},
    ]
    _twin_check(8, 8, 1, q, 8, stages)


def test_sof15_point_transform():
    def samples(ci, y, x):
        return (y * 8 + x) % 7 - 3

    q = [8] * 64
    stages = [
        {"diff": False, "w": 8, "h": 8, "coeffs": _grids(12), "arith": True},
        {"diff": True, "w": 8, "h": 8, "mode": "lossless",
         "samples": samples, "pt": 2, "arith": True},
    ]
    _twin_check(8, 8, 1, q, 8, stages)


@pytest.mark.parametrize("pred_sel", [1, 2, 4, 7])
def test_sof11_lossless_arith_base_frame(pred_sel):
    """NON-differential lossless base inside a pyramid: absolute
    samples become the reference, then EXP + a differential SOF13
    correction refines — expectation composed by hand (the _expected
    helper models DCT/differential stages only)."""
    def samples(ci, y, x):
        return 100 + ((y * 17 + x * 29 + ci * 5) % 40)

    q = [8] * 64
    corr = _grids(13, 10)
    stages = [
        {"diff": False, "w": 8, "h": 8, "mode": "lossless",
         "samples": samples, "pred_sel": pred_sel, "arith": True},
        {"diff": True, "w": 16, "h": 16, "exp": (1, 1),
         "coeffs": corr, "arith": True},
    ]
    blob = encode_hierarchical(16, 16, 1, q, 8, stages)
    w, h, ch, out = decode_jpeg_hierarchical(blob)
    assert (w, h, ch) == (16, 16, 1)
    base = [[samples(0, y, x) for x in range(8)] for y in range(8)]
    ref = _expand_py(base, 1, 1)
    plane = _frame_plane(16, 16, 0, corr, q)
    want = [
        [min(255, max(0, ref[y][x] + plane[y][x])) for x in range(16)]
        for y in range(16)
    ]
    assert out[:, :, 0].tolist() == want


def test_sof3_huffman_lossless_base_frame():
    """SOF3 (Huffman, non-differential) as the pyramid base: DPCM
    against predictor 1 with the H.1.2 boundary rules, encoded by a
    scan writer local to this test (the shared encoder keeps Huffman
    lossless differential-only)."""
    w0 = h0 = 8

    def samples(y, x):
        return 90 + ((y * 13 + x * 7) % 50)

    dc_syms = list(range(17))
    dc_counts, dc_codes = _canonical(dc_syms)
    pk = _Packer()
    for y in range(h0):
        for x in range(w0):
            if (y, x) == (0, 0):
                px = 128  # 1 << (P - pt - 1)
            elif y == 0:
                px = samples(y, x - 1)
            elif x == 0:
                px = samples(y - 1, 0)
            else:
                px = samples(y, x - 1)  # predictor 1: Ra
            diff = (samples(y, x) - px) % 65536
            if diff >= 32768:
                diff -= 65536
            c = _category(diff)
            pk.put(*dc_codes[c])
            if c and c < 16:
                pk.put(_amp_bits(diff, c), c)
    pk.pad_to_byte()

    out = bytearray(b"\xff\xd8")
    dhp = bytes([8]) + struct.pack(">HH", 16, 16) + bytes([1, 1, 0x11, 0])
    out += b"\xff\xde" + struct.pack(">H", 2 + len(dhp)) + dhp
    out += _dht(0, 0, dc_counts, dc_syms)
    sof = bytes([8]) + struct.pack(">HH", h0, w0) + bytes([1, 1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 1, 0, 0])
    out += bytes(pk.out)
    # EXP + a no-op differential SOF5 correction to reach 16x16,
    # spliced from a shared-encoder stream: copy its DQT/DHT
    # segments (the SOF5 scan needs them) but not its SOI/DHP
    out += b"\xff\xdf" + struct.pack(">H", 3) + bytes([0x11])
    q = [8] * 64
    blob_tail = encode_hierarchical(
        16, 16, 1, q, 8,
        [{"diff": True, "w": 16, "h": 16,
          "coeffs": lambda ci, b: [0] * 64}],
    )
    pos = 2
    while pos + 1 < len(blob_tail):
        marker = blob_tail[pos + 1]
        if marker == 0xC5:
            out += blob_tail[pos:]
            break
        seglen = struct.unpack(">H", blob_tail[pos + 2 : pos + 4])[0]
        if marker != 0xDE:  # skip the second DHP
            out += blob_tail[pos : pos + 2 + seglen]
        pos += 2 + seglen
    w, h, ch, got = decode_jpeg_hierarchical(bytes(out))
    assert (w, h, ch) == (16, 16, 1)
    base = [[samples(y, x) for x in range(8)] for y in range(8)]
    want = _expand_py(base, 1, 1)
    assert got[:, :, 0].tolist() == want


def test_12bit_arith_pyramid():
    q = [8] * 64
    stages = [
        {"diff": False, "w": 8, "h": 8, "coeffs": _grids(14, 200),
         "arith": True},
        {"diff": True, "w": 16, "h": 16, "exp": (1, 1),
         "coeffs": _grids(15, 60), "arith": True},
    ]
    _twin_check(16, 16, 1, q, 12, stages)


def test_dac_segment_parses_in_hierarchy():
    """A DAC segment carrying the DEFAULT conditioning decodes
    identically to no DAC segment (non-default bounds are covered by
    the flat arithmetic suites; the hierarchy shares those dicts)."""
    q = [8] * 64
    stages = [
        {"diff": False, "w": 8, "h": 8, "coeffs": _grids(16), "arith": True},
        {"diff": True, "w": 8, "h": 8, "coeffs": _grids(17, 9),
         "arith": True},
    ]
    blob = encode_hierarchical(8, 8, 1, q, 8, stages)
    at = blob.index(b"\xff\xc9")
    dac = b"\xff\xcc" + struct.pack(">H", 6) + bytes([0x00, 0x10, 0x10, 5])
    patched = blob[:at] + dac + blob[at:]
    _, _, _, a = decode_jpeg_hierarchical(blob)
    _, _, _, b = decode_jpeg_hierarchical(patched)
    assert (a == b).all()
    # malformed DAC still gates
    bad = blob[:at] + b"\xff\xcc" + struct.pack(">H", 6) + bytes(
        [0x00, 0x01, 0x10, 5]
    ) + blob[at:]
    with pytest.raises(JpegError, match="DAC DC bounds"):
        decode_jpeg_hierarchical(bad)


def test_sof15_predictor_selector_violation():
    q = [8] * 64
    stages = [
        {"diff": False, "w": 8, "h": 8, "coeffs": _grids(18), "arith": True},
        {"diff": True, "w": 8, "h": 8, "mode": "lossless",
         "samples": lambda ci, y, x: 1, "arith": True},
    ]
    blob = encode_hierarchical(8, 8, 1, q, 8, stages)
    at = blob.index(b"\xff\xda", blob.index(b"\xff\xcf"))
    bad = bytearray(blob)
    bad[at + 7] = 3  # Ss must be 0 in a differential lossless frame
    with pytest.raises(JpegError, match="predictor"):
        decode_jpeg_hierarchical(bytes(bad))
