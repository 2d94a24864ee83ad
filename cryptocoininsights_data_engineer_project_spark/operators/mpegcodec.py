"""MPEG-1 video (ISO/IEC 11172-2) elementary-stream decoder subset +
syntax-level encoder — the motion-COMPENSATED video seam (VERDICT r10
item 2 / r11 item 1): I-, P-, AND B-pictures, 4:2:0 macroblocks,
integer and half-pel forward/backward motion vectors, interpolated
(bidirectional) prediction, skipped macroblocks (P zero-vector copy
and B repeat-previous-prediction semantics), intra macroblocks inside
P/B-pictures, DCT residuals with the full run-level VLC table incl.
escape coding, quantizer-scale updates, custom quant matrices,
MPEG-1 mismatch control (oddification), and coding-order -> display-
order frame reordering.

This closes the inter-frame class the reference pipeline would hand
to ffmpeg: MS-RLE/APNG (rounds 9-10) covered temporal SKIP deltas;
this module adds temporal prediction at an OFFSET (motion vectors)
with coded residuals on top — the MPEG-family structure proper.

Spec fidelity notes (all public, ISO/IEC 11172-2:1993):
- start codes / picture & slice headers per 2.4.2-2.4.3;
- macroblock_address_increment per Table B.1 (incl. escape +33 and
  macroblock_stuffing);
- macroblock_type per Tables B.2a (I), B.2b (P), B.2c (B), and
  B.2d (D: the single code '1'); D-pictures decode as DC-only intra
  pictures with the end_of_macroblock bit (2.4.4.4) and may not mix
  with I/P/B in one sequence;
- B-picture semantics per 2.4.4.3: separate forward/backward vector
  predictors reset at slice start and at intra macroblocks, retained
  across macroblocks that code only the other direction; a SKIPPED
  B macroblock repeats the PREVIOUS macroblock's prediction mode and
  reconstructed vectors (unlike P's zero-vector co-located copy) and
  may not follow an intra macroblock; interpolated prediction
  averages the two single-direction predictions with (f+b+1)>>1
  after each side's own half-pel interpolation (2.4.4.4);
- display reordering: decoding a reference (I/P) picture emits the
  previously pending reference, B pictures emit immediately, and the
  last pending reference flushes at sequence end — coding order
  I P B B ... comes out in display order I B B P ...;
- motion codes per Table B.4 (same codewords as B.1 with a trailing
  sign bit), reconstruction with the modulo wrap of 2.4.4.2 and the
  full_pel doubling; half-pel interpolation is the spec's "//"
  (integer division rounding half AWAY from zero): (a+b+1)>>1 on
  non-negative pels;
- chrominance vectors are the luma reconstruction "/2" with
  truncation toward zero, THEN split into integer + half parts with
  arithmetic (floor) shift, per 2.4.4.2;
- coded_block_pattern per Table B.3 (62 entries, cbp=0 illegal);
- dct_dc_size per Tables B.5a/B.5b, run-level coefficients per
  Tables B.5c/B.5d with the dct_coeff_first '1s' vs dct_coeff_next
  '11s' distinction, and 2.4.3.7 escape levels (8-bit, with the
  0x00/0x80 16-bit extensions);
- reconstruction per 2.4.4.1-2.4.4.4: intra DC step 8 with per-
  component predictors (reset to 1024 at slice start and after any
  non-intra macroblock), intra/non-intra dequant with truncating
  division, oddification (mismatch control: even -> toward zero by
  one) on everything except intra DC, clamp to [-2048, 2047];
- IDCT: the separable float64 basis REUSED from
  operators/jpegcodec._C (T.81 A.3.3 == 11172-2 Annex A up to the
  normalization both modules use), rounded to nearest integer.
  Fixtures avoid exact-half IDCT outputs so the rounding convention
  is never load-bearing (the same discipline as the JPEG fixtures).

The encoder is a SYNTAX writer (callers hand it per-macroblock
decisions), not a rate-distortion encoder — its job is independent
round-trip evidence for the decoder and byte-level evidence that the
SQL-built registry fixture (operators/multimodal.py) is a valid
stream. Reference behavior parity: the reference repo has no video
path at all (SURVEY.md section 2.9) — this is north-star scope for
the training-data pipeline, same as the JPEG/GIF/APNG decoders.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .jpegcodec import _C  # shared separable IDCT basis

__all__ = [
    "MpegError",
    "MpegUnsupported",
    "decode_mpeg1",
    "Mpeg1Writer",
    "IntraMB",
    "InterMB",
    "SkipMB",
    "PictureSpec",
    "SequenceSpec",
    "encode_mpeg1",
    "DEFAULT_INTRA_QM",
]


class MpegError(ValueError):
    """Malformed MPEG-1 video payload."""


class MpegUnsupported(NotImplementedError):
    """Valid MPEG-1 syntax outside the implemented subset. Every
    picture-type grid cell now decodes natively (I/P/B rounds 10-12,
    D round 13); the class remains the loud-gate type for any future
    out-of-subset syntax and for the register_decoder seam."""


# ------------------------------------------------------------------ tables

ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

# Default intra quantizer matrix, RASTER order (11172-2 2.4.3.2's
# printed table; transmitted matrices arrive in zigzag order and are
# de-zigzagged on load). Non-intra default is flat 16.
DEFAULT_INTRA_QM = np.array(
    [
        8, 16, 19, 22, 26, 27, 29, 34,
        16, 16, 22, 24, 27, 29, 34, 37,
        19, 22, 26, 27, 29, 34, 34, 38,
        22, 22, 26, 27, 29, 34, 37, 40,
        22, 26, 27, 29, 32, 35, 40, 48,
        26, 27, 29, 32, 35, 40, 48, 58,
        26, 27, 29, 34, 38, 46, 56, 69,
        27, 29, 35, 38, 46, 56, 69, 83,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Table B.1 — macroblock_address_increment codewords 1..33.
_MBA_CODES: dict[int, str] = {
    1: "1", 2: "011", 3: "010", 4: "0011", 5: "0010",
    6: "00011", 7: "00010",
    8: "0000111", 9: "0000110",
    10: "00001011", 11: "00001010", 12: "00001001", 13: "00001000",
    14: "00000111", 15: "00000110",
    16: "0000010111", 17: "0000010110", 18: "0000010101",
    19: "0000010100", 20: "0000010011", 21: "0000010010",
    22: "00000100011", 23: "00000100010", 24: "00000100001",
    25: "00000100000",
    26: "00000011111", 27: "00000011110", 28: "00000011101",
    29: "00000011100", 30: "00000011011", 31: "00000011010",
    32: "00000011001", 33: "00000011000",
}
MBA_ESCAPE = "00000001000"   # +33, then another B.1 code follows
MBA_STUFFING = "00000001111"  # discarded

# Table B.4 — motion_code. '1' is code 0; magnitudes 1..16 carry a
# trailing sign bit (0 = positive), prefixes below.
_MOTION_MAG: dict[int, str] = {
    1: "01", 2: "001", 3: "0001", 4: "000011",
    5: "0000101", 6: "0000100", 7: "0000011",
    8: "000001011", 9: "000001010", 10: "000001001",
    11: "0000010001", 12: "0000010000", 13: "0000001111",
    14: "0000001110", 15: "0000001101", 16: "0000001100",
}

# Table B.2a / B.2b — macroblock_type.
# flags: (quant, motion_forward, pattern, intra)
_MBTYPE_I: dict[str, tuple[int, int, int, int]] = {
    "1": (0, 0, 0, 1),
    "01": (1, 0, 0, 1),
}
_MBTYPE_P: dict[str, tuple[int, int, int, int]] = {
    "1": (0, 1, 1, 0),        # MC, coded
    "01": (0, 0, 1, 0),       # no MC, coded
    "001": (0, 1, 0, 0),      # MC, not coded
    "00011": (0, 0, 0, 1),    # intra
    "00010": (1, 1, 1, 0),    # MC, coded, quant
    "00001": (1, 0, 1, 0),    # no MC, coded, quant
    "000001": (1, 0, 0, 1),   # intra, quant
}

# Table B.2c — macroblock_type for B-pictures.
# flags: (quant, motion_forward, motion_backward, pattern, intra)
_MBTYPE_B: dict[str, tuple[int, int, int, int, int]] = {
    "10": (0, 1, 1, 0, 0),      # interpolated, not coded
    "11": (0, 1, 1, 1, 0),      # interpolated, coded
    "010": (0, 0, 1, 0, 0),     # backward, not coded
    "011": (0, 0, 1, 1, 0),     # backward, coded
    "0010": (0, 1, 0, 0, 0),    # forward, not coded
    "0011": (0, 1, 0, 1, 0),    # forward, coded
    "00011": (0, 0, 0, 0, 1),   # intra
    "00010": (1, 1, 1, 1, 0),   # interpolated, coded, quant
    "000011": (1, 1, 0, 1, 0),  # forward, coded, quant
    "000010": (1, 0, 1, 1, 0),  # backward, coded, quant
    "000001": (1, 0, 0, 0, 1),  # intra, quant
}

# Table B.3 — coded_block_pattern (bit 32 = Y0 ... bit 1 = Cr).
_CBP_CODES: dict[int, str] = {
    60: "111",
    4: "1101", 8: "1100", 16: "1011", 32: "1010",
    12: "10011", 48: "10010", 20: "10001", 40: "10000",
    28: "01111", 44: "01110", 52: "01101", 56: "01100",
    1: "01011", 61: "01010", 2: "01001", 62: "01000",
    24: "001111", 36: "001110", 3: "001101", 63: "001100",
    5: "0010111", 9: "0010110", 17: "0010101", 33: "0010100",
    6: "0010011", 10: "0010010", 18: "0010001", 34: "0010000",
    7: "00011111", 11: "00011110", 19: "00011101", 35: "00011100",
    13: "00011011", 49: "00011010", 21: "00011001", 41: "00011000",
    14: "00010111", 50: "00010110", 22: "00010101", 42: "00010100",
    15: "00010011", 51: "00010010", 23: "00010001", 43: "00010000",
    25: "00001111", 37: "00001110", 26: "00001101", 38: "00001100",
    29: "00001011", 45: "00001010", 53: "00001001", 57: "00001000",
    30: "00000111", 46: "00000110", 54: "00000101", 58: "00000100",
    31: "000000111", 47: "000000110", 55: "000000101", 59: "000000100",
    27: "000000011", 39: "000000010",
}

# Tables B.5a / B.5b — dct_dc_size.
_DC_SIZE_LUMA: dict[int, str] = {
    0: "100", 1: "00", 2: "01", 3: "101", 4: "110",
    5: "1110", 6: "11110", 7: "111110", 8: "1111110",
}
_DC_SIZE_CHROMA: dict[int, str] = {
    0: "00", 1: "01", 2: "10", 3: "110", 4: "1110",
    5: "11110", 6: "111110", 7: "1111110", 8: "11111110",
}

# Tables B.5c/B.5d — run-level codewords WITHOUT the trailing sign
# bit. (run 0, level 1) is context-dependent: '1' as the first
# coefficient of a non-intra block (where EOB cannot occur), '11'
# elsewhere — handled in the coder, not the table.
_RUN_LEVEL_CODES: dict[tuple[int, int], str] = {
    (0, 2): "0100", (0, 3): "00101", (0, 4): "0000110",
    (0, 5): "00100110", (0, 6): "00100001", (0, 7): "0000001010",
    (0, 8): "000000011101", (0, 9): "000000011000",
    (0, 10): "000000010011", (0, 11): "000000010000",
    (0, 12): "0000000011010", (0, 13): "0000000011001",
    (0, 14): "0000000011000", (0, 15): "0000000010111",
    (0, 16): "00000000011111", (0, 17): "00000000011110",
    (0, 18): "00000000011101", (0, 19): "00000000011100",
    (0, 20): "00000000011011", (0, 21): "00000000011010",
    (0, 22): "00000000011001", (0, 23): "00000000011000",
    (0, 24): "00000000010111", (0, 25): "00000000010110",
    (0, 26): "00000000010101", (0, 27): "00000000010100",
    (0, 28): "00000000010011", (0, 29): "00000000010010",
    (0, 30): "00000000010001", (0, 31): "00000000010000",
    (0, 32): "000000000011111", (0, 33): "000000000011110",
    (0, 34): "000000000011101", (0, 35): "000000000011100",
    (0, 36): "000000000011011", (0, 37): "000000000011010",
    (0, 38): "000000000011001", (0, 39): "000000000011000",
    (0, 40): "000000000010111",
    (1, 1): "011", (1, 2): "000110", (1, 3): "00100101",
    (1, 4): "0000001100", (1, 5): "000000011011",
    (1, 6): "0000000010110", (1, 7): "0000000010101",
    (1, 8): "000000000010110", (1, 9): "000000000010101",
    (1, 10): "000000000010100", (1, 11): "000000000010011",
    (1, 12): "000000000010010", (1, 13): "000000000010001",
    (1, 14): "000000000010000",
    (1, 15): "0000000000011111", (1, 16): "0000000000011110",
    (1, 17): "0000000000011101", (1, 18): "0000000000011100",
    (2, 1): "0101", (2, 2): "0000100", (2, 3): "0000001011",
    (2, 4): "000000010100", (2, 5): "0000000010100",
    (3, 1): "00111", (3, 2): "00100100", (3, 3): "000000011100",
    (3, 4): "0000000010011",
    (4, 1): "00110", (4, 2): "0000001111", (4, 3): "000000010010",
    (5, 1): "000111", (5, 2): "0000001001", (5, 3): "0000000010010",
    (6, 1): "000101", (6, 2): "000000011110", (6, 3): "0000000000011011",
    (7, 1): "000100", (7, 2): "000000010101",
    (8, 1): "0000111", (8, 2): "000000010001",
    (9, 1): "0000101", (9, 2): "0000000010001",
    (10, 1): "00100111", (10, 2): "0000000010000",
    (11, 1): "00100011", (11, 2): "0000000000011010",
    (12, 1): "00100010", (12, 2): "0000000000011001",
    (13, 1): "00100000", (13, 2): "0000000000011000",
    (14, 1): "0000001110", (14, 2): "0000000000010111",
    (15, 1): "0000001101", (15, 2): "0000000000010110",
    (16, 1): "0000001000", (16, 2): "0000000000010101",
    (17, 1): "000000011111",
    (18, 1): "000000011010", (19, 1): "000000011001",
    (20, 1): "000000010111", (21, 1): "000000010110",
    (22, 1): "0000000011111", (23, 1): "0000000011110",
    (24, 1): "0000000011101", (25, 1): "0000000011100",
    (26, 1): "0000000011011",
    (27, 1): "0000000000010100", (28, 1): "0000000000010011",
    (29, 1): "0000000000010010", (30, 1): "0000000000010001",
    (31, 1): "0000000000010000",
}
EOB = "10"
COEFF_ESCAPE = "000001"

# Start codes.
SEQ_START = 0xB3
GOP_START = 0xB8
PIC_START = 0x00
SEQ_END = 0xB7
EXT_START = 0xB5
USER_START = 0xB2
SLICE_MIN, SLICE_MAX = 0x01, 0xAF


def _prefix_decoder(codes: dict) -> dict[str, object]:
    """Invert a value->bits table for MSB-first prefix decode."""
    inv = {}
    for val, bits in codes.items():
        if bits in inv:
            raise AssertionError(f"duplicate code {bits}")
        inv[bits] = val
    # prefix-freedom sanity (tables are hand-entered from the spec)
    for a in inv:
        for b in inv:
            if a is not b and b.startswith(a):
                raise AssertionError(f"{a} prefixes {b}")
    return inv


_MBA_DEC = _prefix_decoder(_MBA_CODES)
_MBA_FULL_DEC = {
    **{bits: val for val, bits in _MBA_CODES.items()},
    MBA_ESCAPE: "esc",
    MBA_STUFFING: "stuff",
}
_MBTYPE_I_DEC = dict(_MBTYPE_I)
_MBTYPE_P_DEC = dict(_MBTYPE_P)
_MBTYPE_B_DEC = dict(_MBTYPE_B)
_CBP_DEC = _prefix_decoder(_CBP_CODES)
_DC_LUMA_DEC = _prefix_decoder(_DC_SIZE_LUMA)
_DC_CHROMA_DEC = _prefix_decoder(_DC_SIZE_CHROMA)
_RL_DEC = _prefix_decoder(_RUN_LEVEL_CODES)
_MOTION_DEC = _prefix_decoder({**_MOTION_MAG, 0: "1"})


# ------------------------------------------------------------------ bits


class _BitReader:
    """MSB-first bit reader with byte-aligned start-code scanning."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise MpegError("truncated MPEG-1 stream")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def read_bit(self) -> int:
        return self.read(1)

    def peek(self, n: int) -> int:
        save = self.pos
        try:
            return self.read(n)
        finally:
            self.pos = save

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def at_start_code(self) -> bool:
        """True if zero-padding to the byte boundary is followed by a
        00 00 01 start-code prefix (the 2.3 next_start_code test)."""
        save = self.pos
        try:
            pad = (-self.pos) & 7
            if pad and self.read(pad) != 0:
                return False
            byte = self.pos >> 3
            return self.data[byte : byte + 3] == b"\x00\x00\x01"
        except MpegError:
            return True  # end of stream terminates like a start code
        finally:
            self.pos = save

    def next_start_code(self) -> int | None:
        """Advance to the next byte-aligned 00 00 01 prefix and return
        the start-code byte, or None at end of stream."""
        self.byte_align()
        j = self.data.find(b"\x00\x00\x01", self.pos >> 3)
        if j < 0 or j + 3 >= len(self.data):
            return None
        self.pos = (j + 4) << 3
        return self.data[j + 3]

    def decode_prefix(self, table: dict[str, object], what: str):
        bits = ""
        for _ in range(17):
            bits += "1" if self.read_bit() else "0"
            if bits in table:
                return table[bits]
        raise MpegError(f"invalid {what} code {bits!r}")


class BitWriter:
    """MSB-first bit writer (encoder side)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, bits: str) -> None:
        for ch in bits:
            self.acc = (self.acc << 1) | (ch == "1")
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def put_uint(self, value: int, n: int) -> None:
        if not 0 <= value < (1 << n):
            raise ValueError(f"{value} does not fit in {n} bits")
        self.put(format(value, f"0{n}b"))

    def byte_align(self) -> None:
        while self.nbits:
            self.put("0")

    def bytes(self) -> bytes:
        if self.nbits:
            raise ValueError("writer not byte-aligned")
        return bytes(self.buf)


# ------------------------------------------------------------------ shared math


def _dc_extend(bits: int, size: int) -> int:
    """JPEG-style differential extension (11172-2 2.4.3.7)."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _oddify(v: int) -> int:
    """Mismatch control: pull even reconstructions toward zero by 1."""
    if v > 0 and v % 2 == 0:
        return v - 1
    if v < 0 and v % 2 == 0:
        return v + 1
    return v


def _clamp_coef(v: int) -> int:
    return max(-2048, min(2047, v))


def _idct(block: np.ndarray) -> np.ndarray:
    """Separable float64 IDCT on an 8x8 coefficient block (raster),
    rounded to nearest integer — jpegcodec's basis, MPEG's Annex A."""
    return np.rint(_C.T @ block.astype(np.float64) @ _C).astype(np.int64)


def _trunc_div2(v: int) -> int:
    """11172-2 '/' operator: integer division truncating toward 0."""
    return v // 2 if v >= 0 else -((-v) // 2)


def _mv_split(recon: int) -> tuple[int, int]:
    """Half-pel reconstruction -> (integer pel, half flag) with
    arithmetic (floor) shift per 2.4.4.2."""
    return recon >> 1, recon & 1


def _predict(plane: np.ndarray, x0: int, y0: int, size: int,
             recon_x: int, recon_y: int) -> np.ndarray:
    """Forward prediction of a size x size block at (x0, y0) from the
    previous plane, half-pel interpolated with rounding away from
    zero ((a+b+1)>>1 on non-negative pels; the 4-tap corner case is
    (a+b+c+d+2)>>2)."""
    px, hx = _mv_split(recon_x)
    py, hy = _mv_split(recon_y)
    xs, ys = x0 + px, y0 + py
    h, w = plane.shape
    if not (0 <= xs and xs + size + (1 if hx else 0) <= w
            and 0 <= ys and ys + size + (1 if hy else 0) <= h):
        raise MpegError(
            f"motion vector ({recon_x},{recon_y}) references outside the "
            f"picture at block ({x0},{y0})"
        )
    p = plane.astype(np.int64)
    a = p[ys : ys + size, xs : xs + size]
    if not hx and not hy:
        return a
    if hx and not hy:
        b = p[ys : ys + size, xs + 1 : xs + 1 + size]
        return (a + b + 1) >> 1
    if hy and not hx:
        b = p[ys + 1 : ys + 1 + size, xs : xs + size]
        return (a + b + 1) >> 1
    b = p[ys : ys + size, xs + 1 : xs + 1 + size]
    c = p[ys + 1 : ys + 1 + size, xs : xs + size]
    d = p[ys + 1 : ys + 1 + size, xs + 1 : xs + 1 + size]
    return (a + b + c + d + 2) >> 2


# ------------------------------------------------------------------ decoder


@dataclass
class _SeqState:
    width: int
    height: int
    intra_qm: np.ndarray
    non_intra_qm: np.ndarray

    @property
    def mb_width(self) -> int:
        return (self.width + 15) // 16

    @property
    def mb_height(self) -> int:
        return (self.height + 15) // 16


def _parse_sequence_header(r: _BitReader) -> _SeqState:
    width = r.read(12)
    height = r.read(12)
    r.read(4)  # pel_aspect_ratio
    r.read(4)  # picture_rate
    r.read(18)  # bit_rate
    if r.read_bit() != 1:
        raise MpegError("sequence header marker bit missing")
    r.read(10)  # vbv_buffer_size
    r.read_bit()  # constrained_parameters_flag
    intra = DEFAULT_INTRA_QM.copy()
    if r.read_bit():  # load_intra_quantizer_matrix (zigzag order)
        flat = np.zeros(64, dtype=np.int64)
        for i in range(64):
            flat[ZIGZAG[i]] = r.read(8)
        intra = flat.reshape(8, 8)
    non_intra = np.full((8, 8), 16, dtype=np.int64)
    if r.read_bit():
        flat = np.zeros(64, dtype=np.int64)
        for i in range(64):
            flat[ZIGZAG[i]] = r.read(8)
        non_intra = flat.reshape(8, 8)
    if width == 0 or height == 0 or width > 4096 or height > 4096:
        raise MpegError(f"implausible sequence dimensions {width}x{height}")
    return _SeqState(width, height, intra, non_intra)


def _decode_intra_block(r: _BitReader, seq: _SeqState, qscale: int,
                        dc_pred: list[int], comp: int) -> np.ndarray:
    """comp: 0 = luma, 1 = Cb, 2 = Cr (per-component DC predictors)."""
    table = _DC_LUMA_DEC if comp == 0 else _DC_CHROMA_DEC
    size = r.decode_prefix(table, "dct_dc_size")
    diff = _dc_extend(r.read(size), size) if size else 0
    dc = dc_pred[comp] + diff * 8
    dc_pred[comp] = dc
    coeffs = np.zeros(64, dtype=np.int64)
    coeffs[0] = _clamp_coef(dc)
    idx = 0
    qm = seq.intra_qm
    while True:
        run, level = _read_run_level(r, first=False)
        if run is None:
            break
        idx += run + 1
        if idx > 63:
            raise MpegError("intra block coefficient index overflow")
        zz = ZIGZAG[idx]
        w = int(qm[zz >> 3, zz & 7])
        recon = (2 * level * qscale * w) // 16 if level >= 0 else -(
            (2 * (-level) * qscale * w) // 16
        )
        coeffs[zz] = _clamp_coef(_oddify(recon))
    return _idct(coeffs.reshape(8, 8))


def _decode_intra_dc_block(r: _BitReader, dc_pred: list[int],
                           comp: int) -> np.ndarray:
    """D-picture block (11172-2 2.4.4.4): dct_dc_size + differential
    ONLY — no AC coefficients, no EOB. A DC-only block reconstructs
    flat, so the IDCT collapses to dc / 8 (exact: intra DC is a
    multiple of 8)."""
    table = _DC_LUMA_DEC if comp == 0 else _DC_CHROMA_DEC
    size = r.decode_prefix(table, "dct_dc_size")
    diff = _dc_extend(r.read(size), size) if size else 0
    dc = dc_pred[comp] + diff * 8
    dc_pred[comp] = dc
    return np.full((8, 8), _clamp_coef(dc) // 8, dtype=np.int64)


def _decode_non_intra_block(r: _BitReader, seq: _SeqState,
                            qscale: int) -> np.ndarray:
    coeffs = np.zeros(64, dtype=np.int64)
    idx = -1
    first = True
    qm = seq.non_intra_qm
    while True:
        run, level = _read_run_level(r, first=first)
        first = False
        if run is None:
            break
        idx += run + 1
        if idx > 63:
            raise MpegError("non-intra block coefficient index overflow")
        zz = ZIGZAG[idx]
        w = int(qm[zz >> 3, zz & 7])
        mag = (2 * abs(level) + 1) * qscale * w // 16
        recon = mag if level > 0 else -mag
        coeffs[zz] = _clamp_coef(_oddify(recon))
    return _idct(coeffs.reshape(8, 8))


def _read_run_level(r: _BitReader, first: bool):
    """One (run, level) pair; (None, None) at end_of_block. Handles
    the dct_coeff_first/next asymmetry and 2.4.3.7 escapes."""
    bits = ""
    for _ in range(17):
        bits += "1" if r.read_bit() else "0"
        if first and bits == "1":
            return 0, (-1 if r.read_bit() else 1)
        if not first:
            if bits == "10":
                return None, None
            if bits == "11":
                return 0, (-1 if r.read_bit() else 1)
        if bits == COEFF_ESCAPE:
            run = r.read(6)
            s = r.read(8)
            if s == 0:
                level = r.read(8)
                if level < 128:
                    raise MpegError("escape level 0x00 extension < 128")
            elif s == 128:
                level = r.read(8) - 256
                if level > -128:
                    raise MpegError("escape level 0x80 extension > -128")
            else:
                level = s if s < 128 else s - 256
            if level == 0:
                raise MpegError("escape level 0 is forbidden")
            return run, level
        if bits in _RL_DEC and bits not in ("1", "10", "11"):
            run, mag = _RL_DEC[bits]
            return run, (-mag if r.read_bit() else mag)
    raise MpegError(f"invalid dct_coeff code {bits!r}")


def _decode_motion(r: _BitReader, f_code: int, pred: int) -> int:
    """One vector component in the CODED domain (pre full-pel
    doubling): Table B.4 magnitude code + sign (+ residual for f>1),
    differential reconstruction with the 2.4.4.2 modulo wrap. The
    caller keeps predictors in this domain and doubles for use when
    full_pel_forward_vector is set."""
    code = r.decode_prefix(_MOTION_DEC, "motion_code")
    f = 1 << (f_code - 1)
    if code == 0:
        delta = 0
    else:
        sign = r.read_bit()
        if f == 1:
            delta = -code if sign else code
        else:
            residual = r.read(f_code - 1)
            mag = ((code - 1) * f) + residual + 1
            delta = -mag if sign else mag
    recon = pred + delta
    lo, hi = -16 * f, 16 * f - 1
    if recon > hi:
        recon -= 32 * f
    elif recon < lo:
        recon += 32 * f
    return recon


def decode_mpeg1(payload: bytes):
    """Decode an MPEG-1 video elementary stream (I/P/B pictures) to
    ``(width, height, frames)`` with each frame a tuple of numpy
    uint8 planes ``(Y, Cb, Cr)`` at 4:2:0 sizes, in DISPLAY order
    (a reference picture emits the previously pending reference, B
    pictures emit immediately, the last reference flushes at sequence
    end — identical to coding order for I/P-only streams).
    D-pictures (DC-only intra, picture_coding_type 4) decode too;
    per 11172-2 they may not share a sequence with I/P/B pictures."""
    b = bytes(payload)
    r = _BitReader(b)
    code = r.next_start_code()
    if code != SEQ_START:
        raise MpegError("payload does not start with an MPEG-1 sequence header")
    seq = _parse_sequence_header(r)
    w, h = seq.width, seq.height
    cw, ch_ = (w + 1) // 2, (h + 1) // 2
    # ref_old = older reference (B's forward side), ref_new = most
    # recently decoded reference (P's forward side, B's backward side;
    # pending display until the next reference or sequence end).
    ref_old: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None
    ref_new: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None
    frames: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    ptypes_seen: set[int] = set()
    while True:
        code = r.next_start_code()
        if code is None or code == SEQ_END:
            break
        if code in (GOP_START, EXT_START, USER_START, SEQ_START):
            continue  # headers we skip to the next start code
        if code != PIC_START:
            raise MpegError(f"unexpected start code 0x{code:02x}")
        r.read(10)  # temporal_reference
        ptype = r.read(3)
        r.read(16)  # vbv_delay
        full_pel = full_pel_b = False
        f_code = b_code = 1
        if ptype == 1:
            pass
        elif ptype == 2:
            full_pel = bool(r.read_bit())
            f_code = r.read(3)
            if f_code == 0:
                raise MpegError("forward_f_code 0 is forbidden")
        elif ptype == 3:
            full_pel = bool(r.read_bit())
            f_code = r.read(3)
            full_pel_b = bool(r.read_bit())
            b_code = r.read(3)
            if f_code == 0 or b_code == 0:
                raise MpegError("f_code 0 is forbidden")
        elif ptype == 4:
            # D-pictures (11172-2 2.4.4.4): DC-only intra pictures with
            # no motion parameters; a sequence carrying them may carry
            # ONLY them (enforced below at the macroblock level via the
            # ref-frame checks and here by the mixing guard)
            pass
        else:
            raise MpegError(f"invalid picture_coding_type {ptype}")
        while r.read_bit():
            r.read(8)  # extra_information_picture
        ptypes_seen.add(ptype)
        if 4 in ptypes_seen and ptypes_seen != {4}:
            raise MpegError(
                "D-pictures may not share a sequence with I/P/B pictures"
            )
        if ptype == 2 and ref_new is None:
            raise MpegError("P-picture with no reference frame")
        if ptype == 3 and (ref_old is None or ref_new is None):
            raise MpegError("B-picture without two reference frames")
        # picture reconstruction buffers
        y = np.zeros((seq.mb_height * 16, seq.mb_width * 16), dtype=np.int64)
        cb = np.zeros((seq.mb_height * 8, seq.mb_width * 8), dtype=np.int64)
        cr = np.zeros_like(cb)
        n_mbs = seq.mb_width * seq.mb_height
        decoded = np.zeros(n_mbs, dtype=bool)

        def _mc_pred(ref, mbx, mby, rx, ry):
            """One direction's (Y, Cb, Cr) macroblock prediction; the
            chroma vector is the luma reconstruction /2 truncated
            toward zero, applied in chroma half-pel units (2.4.4.2)."""
            ry_, rcb, rcr = ref
            crx, cry = _trunc_div2(rx), _trunc_div2(ry)
            return (
                _predict(ry_, mbx, mby, 16, rx, ry),
                _predict(rcb, mbx // 2, mby // 2, 8, crx, cry),
                _predict(rcr, mbx // 2, mby // 2, 8, crx, cry),
            )

        def _combine(mbx, mby, use_f, use_b, vf, vb):
            """Prediction per 2.4.4.4: each used direction half-pel
            interpolates on its own reference, then interpolated
            macroblocks average the two with (f + b + 1) >> 1."""
            if use_f:
                pf = _mc_pred(ref_old if ptype == 3 else ref_new,
                              mbx, mby, *vf)
                if not use_b:
                    return pf
            if use_b:
                pb = _mc_pred(ref_new, mbx, mby, *vb)
                if not use_f:
                    return pb
            return tuple((a + b_ + 1) >> 1 for a, b_ in zip(pf, pb))

        def _paint(mbx, mby, pred, cbp, qscale):
            pred_y, pred_cb, pred_cr = pred
            for i in range(4):
                bx, by = (i & 1) * 8, (i >> 1) * 8
                base = pred_y[by : by + 8, bx : bx + 8]
                if cbp & (32 >> i):
                    base = base + _decode_non_intra_block(r, seq, qscale)
                y[mby + by : mby + by + 8, mbx + bx : mbx + bx + 8] = (
                    np.clip(base, 0, 255)
                )
            if cbp & 2:
                pred_cb = pred_cb + _decode_non_intra_block(r, seq, qscale)
            if cbp & 1:
                pred_cr = pred_cr + _decode_non_intra_block(r, seq, qscale)
            cx, cy = mbx // 2, mby // 2
            cb[cy : cy + 8, cx : cx + 8] = np.clip(pred_cb, 0, 255)
            cr[cy : cy + 8, cx : cx + 8] = np.clip(pred_cr, 0, 255)

        # slices
        while True:
            save = r.pos
            code = r.next_start_code()
            if code is None or not (SLICE_MIN <= code <= SLICE_MAX):
                r.pos = save  # picture/sequence level code: rewind
                break
            mb_addr = (code - 1) * seq.mb_width - 1
            qscale = r.read(5)
            if qscale == 0:
                raise MpegError("quantizer_scale 0 is forbidden")
            while r.read_bit():
                r.read(8)  # extra_information_slice
            dc_pred = [1024, 1024, 1024]
            mv_pred = [0, 0]       # forward predictor (coded domain)
            mv_pred_b = [0, 0]     # backward predictor (B only)
            # previous macroblock's prediction, for B skips:
            # (use_fwd, use_bwd, (rxf, ryf), (rxb, ryb)); None after
            # an intra macroblock (skip may not follow intra in B)
            # and at slice start (predictors reset per slice) — the
            # skip-error message below names which cause applies
            last_b_mode = None
            last_b_none_cause = "slice start (predictors reset per slice)"
            first_in_slice = True
            while not r.at_start_code():
                inc = 0
                while True:
                    got = r.decode_prefix(
                        _MBA_FULL_DEC, "macroblock_address_increment"
                    )
                    if got == "stuff":
                        continue
                    if got == "esc":
                        inc += 33
                        continue
                    inc += got
                    break
                skipped = range(mb_addr + 1, mb_addr + inc) if not first_in_slice else ()
                mb_addr += inc
                first_in_slice = False
                if mb_addr >= n_mbs:
                    raise MpegError("macroblock address beyond picture")
                for sk in skipped:
                    if ptype in (1, 4):
                        raise MpegError(
                            "skipped macroblock in an I-picture"
                            if ptype == 1
                            else "skipped macroblock in a D-picture"
                        )
                    if ptype == 2:
                        # zero-vector co-located copy; resets predictors
                        _copy_mb(y, cb, cr, ref_new, sk, seq.mb_width)
                        mv_pred = [0, 0]
                    else:
                        # B: repeat the previous macroblock's prediction
                        # mode and vectors; predictors unchanged
                        if last_b_mode is None:
                            raise MpegError(
                                "skipped B macroblock follows "
                                + last_b_none_cause
                            )
                        uf, ub, vf, vb = last_b_mode
                        skx = (sk % seq.mb_width) * 16
                        sky = (sk // seq.mb_width) * 16
                        _paint(skx, sky, _combine(skx, sky, uf, ub, vf, vb),
                               0, qscale)
                    decoded[sk] = True
                    dc_pred = [1024, 1024, 1024]
                mbx = (mb_addr % seq.mb_width) * 16
                mby = (mb_addr // seq.mb_width) * 16
                if ptype == 4:
                    # Table B.2d: the single macroblock_type code '1'
                    if not r.read_bit():
                        raise MpegError(
                            "macroblock_type in a D-picture must be '1'"
                        )
                    quant = fwd = bwd = pattern = 0
                    intra = 1
                elif ptype == 1:
                    quant, fwd, pattern, intra = r.decode_prefix(
                        _MBTYPE_I_DEC, "macroblock_type"
                    )
                    bwd = 0
                elif ptype == 2:
                    quant, fwd, pattern, intra = r.decode_prefix(
                        _MBTYPE_P_DEC, "macroblock_type"
                    )
                    bwd = 0
                else:
                    quant, fwd, bwd, pattern, intra = r.decode_prefix(
                        _MBTYPE_B_DEC, "macroblock_type"
                    )
                if quant:
                    qscale = r.read(5)
                    if qscale == 0:
                        raise MpegError("quantizer_scale 0 is forbidden")
                if intra:
                    mv_pred = [0, 0]
                    mv_pred_b = [0, 0]
                    last_b_mode = None
                    last_b_none_cause = "an intra macroblock"
                    for i in range(4):
                        bx = mbx + (i & 1) * 8
                        by = mby + (i >> 1) * 8
                        blk = (
                            _decode_intra_dc_block(r, dc_pred, 0)
                            if ptype == 4
                            else _decode_intra_block(r, seq, qscale, dc_pred, 0)
                        )
                        y[by : by + 8, bx : bx + 8] = np.clip(blk, 0, 255)
                    cx, cy = mbx // 2, mby // 2
                    if ptype == 4:
                        blk = _decode_intra_dc_block(r, dc_pred, 1)
                    else:
                        blk = _decode_intra_block(r, seq, qscale, dc_pred, 1)
                    cb[cy : cy + 8, cx : cx + 8] = np.clip(blk, 0, 255)
                    if ptype == 4:
                        blk = _decode_intra_dc_block(r, dc_pred, 2)
                    else:
                        blk = _decode_intra_block(r, seq, qscale, dc_pred, 2)
                    cr[cy : cy + 8, cx : cx + 8] = np.clip(blk, 0, 255)
                    if ptype == 4 and not r.read_bit():
                        raise MpegError("end_of_macroblock must be '1'")
                else:
                    dc_pred = [1024, 1024, 1024]
                    rx = ry = rxb = ryb = 0
                    if fwd:
                        mv_pred[0] = _decode_motion(r, f_code, mv_pred[0])
                        mv_pred[1] = _decode_motion(r, f_code, mv_pred[1])
                        rx, ry = mv_pred
                        if full_pel:
                            rx, ry = rx * 2, ry * 2
                    elif ptype == 2:
                        # P: a non-MC macroblock resets the predictor
                        # and predicts at zero; in B the predictor is
                        # RETAINED across backward-only macroblocks
                        mv_pred = [0, 0]
                    if bwd:
                        mv_pred_b[0] = _decode_motion(r, b_code, mv_pred_b[0])
                        mv_pred_b[1] = _decode_motion(r, b_code, mv_pred_b[1])
                        rxb, ryb = mv_pred_b
                        if full_pel_b:
                            rxb, ryb = rxb * 2, ryb * 2
                    cbp = r.decode_prefix(_CBP_DEC, "coded_block_pattern") if pattern else 0
                    use_f = bool(fwd) or ptype == 2
                    pred = _combine(mbx, mby, use_f, bool(bwd),
                                    (rx, ry), (rxb, ryb))
                    if ptype == 3:
                        last_b_mode = (use_f, bool(bwd), (rx, ry), (rxb, ryb))
                    _paint(mbx, mby, pred, cbp, qscale)
                decoded[mb_addr] = True
        if not decoded.all():
            # trailing skipped MBs are illegal (last MB of a slice must
            # be coded); anything undecoded means a malformed stream
            raise MpegError(
                "I-picture with uncoded macroblocks" if ptype == 1
                else "picture does not cover every macroblock"
            )
        frame = (
            y[:h, :w].astype(np.uint8),
            cb[:ch_, :cw].astype(np.uint8),
            cr[:ch_, :cw].astype(np.uint8),
        )
        if ptype in (3, 4):
            frames.append(frame)  # B/D display immediately
        else:
            if ref_new is not None:
                frames.append(ref_new)  # pending reference displays now
            ref_old, ref_new = ref_new, frame
    if ref_new is not None:
        frames.append(ref_new)  # flush the last reference
    if not frames:
        raise MpegError("sequence contains no pictures")
    return w, h, frames


def _copy_mb(y, cb, cr, prev, addr: int, mb_width: int) -> None:
    """Skipped-macroblock reconstruction: co-located copy (2.4.4.4)."""
    py_, pcb, pcr = prev
    x = (addr % mb_width) * 16
    yy = (addr // mb_width) * 16
    y[yy : yy + 16, x : x + 16] = py_[yy : yy + 16, x : x + 16]
    cx, cy = x // 2, yy // 2
    cb[cy : cy + 8, cx : cx + 8] = pcb[cy : cy + 8, cx : cx + 8]
    cr[cy : cy + 8, cx : cx + 8] = pcr[cy : cy + 8, cx : cx + 8]


# ------------------------------------------------------------------ encoder


@dataclass
class IntraMB:
    """Intra macroblock: six DC differentials (Y0..Y3, Cb, Cr) and
    optional per-block AC (zigzag index -> level) lists."""

    dc_diffs: tuple[int, int, int, int, int, int]
    ac: tuple[dict[int, int], ...] = field(
        default_factory=lambda: tuple({} for _ in range(6))
    )
    new_qscale: int | None = None


@dataclass
class InterMB:
    """Predicted macroblock. ``mv`` is the RECONSTRUCTED forward
    vector in half-pel units (None = no-MC in P / no forward in B);
    ``mv_b`` the reconstructed backward vector (B-pictures only; both
    set = interpolated). ``blocks`` maps block index 0..5 to a list of
    (run, level) residual pairs (empty dict = not coded)."""

    mv: tuple[int, int] | None = None
    blocks: dict[int, list[tuple[int, int]]] = field(default_factory=dict)
    new_qscale: int | None = None
    force_escape: bool = False  # escape-code every residual pair
    mv_b: tuple[int, int] | None = None


@dataclass
class SkipMB:
    pass


@dataclass
class PictureSpec:
    ptype: int  # 1 = I, 2 = P, 3 = B
    # slices: list of lists of MBs, concatenated in address order
    slices: list[list[object]]
    qscale: int = 8
    full_pel: bool = False
    f_code: int = 1
    temporal_reference: int = 0
    full_pel_b: bool = False  # B only: backward vector full-pel flag
    b_code: int = 1           # B only: backward_f_code


@dataclass
class SequenceSpec:
    width: int
    height: int
    pictures: list[PictureSpec]
    intra_qm: np.ndarray | None = None  # raster order; None = default
    non_intra_qm: np.ndarray | None = None
    with_gop: bool = True


def _encode_dc(wtr: BitWriter, diff: int, comp: int) -> None:
    size = abs(diff).bit_length()
    table = _DC_SIZE_LUMA if comp == 0 else _DC_SIZE_CHROMA
    if size > 8:
        raise ValueError(f"dc differential {diff} too large")
    wtr.put(table[size])
    if size:
        bits = diff if diff > 0 else diff + (1 << size) - 1
        wtr.put_uint(bits, size)


def _encode_run_level(wtr: BitWriter, run: int, level: int,
                      first: bool, force_escape: bool) -> None:
    mag = abs(level)
    if not force_escape:
        if run == 0 and mag == 1:
            wtr.put("1" if first else "11")
            wtr.put("1" if level < 0 else "0")
            return
        if (run, mag) in _RUN_LEVEL_CODES:
            wtr.put(_RUN_LEVEL_CODES[(run, mag)])
            wtr.put("1" if level < 0 else "0")
            return
    wtr.put(COEFF_ESCAPE)
    wtr.put_uint(run, 6)
    if 1 <= level <= 127:
        wtr.put_uint(level, 8)
    elif -127 <= level <= -1:
        wtr.put_uint(level + 256, 8)
    elif 128 <= level <= 255:
        wtr.put_uint(0, 8)
        wtr.put_uint(level, 8)
    elif -255 <= level <= -128:
        wtr.put_uint(128, 8)
        wtr.put_uint(level + 256, 8)
    else:
        raise ValueError(f"escape level {level} out of range")


def _encode_motion(wtr: BitWriter, delta: int, f_code: int) -> None:
    f = 1 << (f_code - 1)
    # modulo wrap (the decoder unwraps): keep delta in [-16f, 16f-1]
    if delta > 16 * f - 1:
        delta -= 32 * f
    elif delta < -16 * f:
        delta += 32 * f
    if delta == 0:
        wtr.put("1")
        return
    mag = abs(delta)
    if f == 1:
        code, residual = mag, None
    else:
        code = (mag - 1) // f + 1
        residual = (mag - 1) % f
    if not 1 <= code <= 16:
        raise ValueError(f"motion delta {delta} out of code range at f={f}")
    wtr.put(_MOTION_MAG[code])
    wtr.put("1" if delta < 0 else "0")
    if f > 1:
        wtr.put_uint(residual, f_code - 1)


def encode_mpeg1(spec: SequenceSpec) -> bytes:
    """Write a spec-valid MPEG-1 video elementary stream from explicit
    per-macroblock decisions (syntax writer; no search). Emits
    sequence header (+ optional custom matrices), an optional GOP
    header, pictures/slices/macroblocks, and a sequence_end_code."""
    wtr = BitWriter()
    wtr.put("0" * 23 + "1")
    wtr.put_uint(SEQ_START, 8)
    wtr.put_uint(spec.width, 12)
    wtr.put_uint(spec.height, 12)
    wtr.put_uint(1, 4)   # pel aspect 1.0
    wtr.put_uint(3, 4)   # 25 fps
    wtr.put_uint(0x3FFFF, 18)  # variable bit rate
    wtr.put("1")
    wtr.put_uint(16, 10)
    wtr.put("0")  # constrained_parameters_flag
    for qm in (spec.intra_qm, spec.non_intra_qm):
        if qm is None:
            wtr.put("0")
        else:
            wtr.put("1")
            flat = np.asarray(qm, dtype=np.int64).reshape(64)
            for i in range(64):
                wtr.put_uint(int(flat[ZIGZAG[i]]), 8)
    wtr.byte_align()
    if spec.with_gop:
        wtr.put("0" * 23 + "1")
        wtr.put_uint(GOP_START, 8)
        wtr.put_uint(0, 25)  # time code
        wtr.put("1")  # closed_gop
        wtr.put("0")  # broken_link
        wtr.byte_align()
    mb_width = (spec.width + 15) // 16
    for pic in spec.pictures:
        wtr.put("0" * 23 + "1")
        wtr.put_uint(PIC_START, 8)
        wtr.put_uint(pic.temporal_reference, 10)
        wtr.put_uint(pic.ptype, 3)
        wtr.put_uint(0xFFFF, 16)  # vbv_delay
        if pic.ptype in (2, 3):
            wtr.put("1" if pic.full_pel else "0")
            wtr.put_uint(pic.f_code, 3)
        if pic.ptype == 3:
            wtr.put("1" if pic.full_pel_b else "0")
            wtr.put_uint(pic.b_code, 3)
        wtr.put("0")  # extra_bit_picture
        wtr.byte_align()
        addr = -1
        for sl in pic.slices:
            if isinstance(sl[0], SkipMB) or isinstance(sl[-1], SkipMB):
                raise ValueError(
                    "first/last macroblock of a slice cannot be skipped"
                )
            first_addr = addr + 1
            svp = first_addr // mb_width + 1
            wtr.put("0" * 23 + "1")
            wtr.put_uint(svp, 8)
            wtr.put_uint(pic.qscale, 5)
            wtr.put("0")  # extra_bit_slice
            mv_pred = [0, 0]
            mv_pred_b = [0, 0]
            pred_addr = (svp - 1) * mb_width - 1
            for mb in sl:
                addr += 1
                if isinstance(mb, SkipMB):
                    if pic.ptype == 2:
                        mv_pred = [0, 0]  # P skips reset the predictor
                    # B skips leave both predictors unchanged
                    continue
                inc = addr - pred_addr
                pred_addr = addr
                while inc > 33:
                    wtr.put(MBA_ESCAPE)
                    inc -= 33
                wtr.put(_MBA_CODES[inc])
                if isinstance(mb, IntraMB):
                    if pic.ptype == 4:
                        if mb.new_qscale:
                            raise ValueError("D macroblocks cannot requant")
                        if any(mb.ac[i] for i in range(6)):
                            raise ValueError("D blocks are DC-only")
                        wtr.put("1")  # Table B.2d: the single type code
                        for i in range(6):
                            _encode_dc(wtr, mb.dc_diffs[i],
                                       0 if i < 4 else i - 3)
                        wtr.put("1")  # end_of_macroblock
                        continue
                    if pic.ptype == 1:
                        wtr.put("01" if mb.new_qscale else "1")
                    else:
                        wtr.put("000001" if mb.new_qscale else "00011")
                    if mb.new_qscale:
                        wtr.put_uint(mb.new_qscale, 5)
                        qscale = mb.new_qscale
                    mv_pred = [0, 0]
                    mv_pred_b = [0, 0]
                    for i in range(6):
                        _encode_dc(wtr, mb.dc_diffs[i], 0 if i < 4 else i - 3)
                        for zz_idx in sorted(mb.ac[i]):
                            # run from previous coded AC (zigzag walk)
                            prev_coded = [
                                j for j in sorted(mb.ac[i]) if j < zz_idx
                            ]
                            run = zz_idx - (prev_coded[-1] if prev_coded else 0) - 1
                            _encode_run_level(
                                wtr, run, mb.ac[i][zz_idx], first=False,
                                force_escape=False,
                            )
                        wtr.put(EOB)
                elif isinstance(mb, InterMB):
                    if pic.ptype == 1:
                        raise ValueError("InterMB in an I-picture")
                    coded = bool(mb.blocks)
                    if pic.ptype == 2:
                        if mb.mv_b is not None:
                            raise ValueError(
                                "backward vector in a P-picture"
                            )
                        if mb.mv is not None and coded:
                            wtr.put("00010" if mb.new_qscale else "1")
                        elif mb.mv is not None:
                            wtr.put("001")
                            if mb.new_qscale:
                                raise ValueError("MC-not-coded cannot requant")
                        elif coded:
                            wtr.put("00001" if mb.new_qscale else "01")
                        else:
                            raise ValueError(
                                "no-MC not-coded macroblock must be a SkipMB"
                            )
                    else:  # B-picture, Table B.2c
                        f_, b_ = mb.mv is not None, mb.mv_b is not None
                        if not (f_ or b_):
                            raise ValueError(
                                "B macroblock needs at least one vector"
                            )
                        if mb.new_qscale and not coded:
                            raise ValueError("not-coded cannot requant")
                        if f_ and b_:
                            code = ("00010" if mb.new_qscale
                                    else ("11" if coded else "10"))
                        elif f_:
                            code = ("000011" if mb.new_qscale
                                    else ("0011" if coded else "0010"))
                        else:
                            code = ("000010" if mb.new_qscale
                                    else ("011" if coded else "010"))
                        wtr.put(code)
                    if mb.new_qscale:
                        wtr.put_uint(mb.new_qscale, 5)
                        qscale = mb.new_qscale

                    def _put_vector(want_mv, pred, full_pel, f_code):
                        want = list(want_mv)
                        if full_pel:
                            if want[0] % 2 or want[1] % 2:
                                raise ValueError(
                                    "full-pel picture requires even vectors"
                                )
                            want = [want[0] // 2, want[1] // 2]
                        for axis in (0, 1):
                            _encode_motion(
                                wtr, want[axis] - pred[axis], f_code
                            )
                            pred[axis] = want[axis]

                    if mb.mv is not None:
                        _put_vector(mb.mv, mv_pred, pic.full_pel, pic.f_code)
                    elif pic.ptype == 2:
                        mv_pred = [0, 0]
                    if mb.mv_b is not None:
                        _put_vector(mb.mv_b, mv_pred_b, pic.full_pel_b,
                                    pic.b_code)
                    if coded:
                        cbp = 0
                        for i in mb.blocks:
                            cbp |= 32 >> i
                        wtr.put(_CBP_CODES[cbp])
                        for i in sorted(mb.blocks):
                            first = True
                            for run, level in mb.blocks[i]:
                                _encode_run_level(
                                    wtr, run, level, first=first,
                                    force_escape=mb.force_escape,
                                )
                                first = False
                            wtr.put(EOB)
                else:
                    raise TypeError(f"unknown macroblock spec {mb!r}")
            wtr.byte_align()
    wtr.put("0" * 23 + "1")
    wtr.put_uint(SEQ_END, 8)
    return wtr.bytes()
