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
) -> bytes:
    """Minimal baseline encoder: quantized coefficients in, JFIF bytes
    out. Walks MCUs exactly as F.2.1.2 prescribes (interleaved when
    Ns > 1), with DC prediction, ZRL/EOB, optional restart markers."""
    hmax = max(h for h, _ in comps)
    vmax = max(v for _, v in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    dc_syms = list(range(12))
    ac_syms = sorted({(r << 4) | s for r in range(16) for s in range(11)} | {0x00, 0xF0})
    dc_counts, dc_codes = _canonical(dc_syms)
    ac_counts, ac_codes = _canonical(ac_syms)

    out = bytearray(b"\xff\xd8")
    zz_q = bytes(qtable[ZIGZAG_TO_NATURAL[z]] for z in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([len(comps)])
    for ci, (h, v) in enumerate(comps):
        sof += bytes([ci + 1, (h << 4) | v, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
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


def test_progressive_and_malformed_gates():
    # progressive SOF2 -> NotImplementedError naming the seam
    prog = bytearray(_encode(8, 8, [(1, 1)], [8] * 64, lambda ci, b: [3] + [0] * 63))
    at = prog.index(b"\xff\xc0")
    prog[at + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg_pixels(bytes(prog))
    with pytest.raises(JpegError):
        decode_jpeg_pixels(b"\x89PNG not a jpeg")
    ok = _encode(8, 8, [(1, 1)], [8] * 64, lambda ci, b: [3] + [0] * 63)
    with pytest.raises(JpegError):
        decode_jpeg_pixels(ok[: len(ok) // 2])  # truncated mid-scan


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
