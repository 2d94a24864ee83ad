"""CCITT Group 4 (ITU-T T.6, MMR) bilevel image decoding — the
compression scanned-document PDFs carry in /CCITTFaxDecode streams
(VERDICT r15 "what's missing" item 6). Stdlib-only, the house codec
discipline: loud typed gates for everything out of subset.

Scope:

* The full T.6 2-D coding machinery: PASS / HORIZONTAL / VERTICAL
  (V0, VR1-3, VL1-3) modes against the reference line, the imaginary
  all-white first reference line, a0 = -1 start-of-line state, and
  the optional EOFB terminator. The MODE code table is tiny and
  transcribed with high confidence (it is the famous 9-entry table
  every fax description reproduces); the decoder cross-checks it
  structurally at import (prefix-free) and the independent in-repo
  encoder round-trips it in tests.
* HORIZONTAL mode needs the T.4 white/black RUN-LENGTH code pages.
  Note a structural fact: a black run can only APPEAR where the
  reference line is white through horizontal mode, so every
  non-trivial G4 image uses it — a "vertical/pass-only" subset
  would be empty. Under the SCALE.md bundling policy the bundled
  subset is the HEAD of the T.4 tables — terminating runs 0-15 per
  color plus the 64-makeups — the rows every fax-coding description
  reproduces (high-confidence transcription, cross-checked
  self-consistent: prefix-freeness validated at import, and the
  independent in-repo encoder round-trips every bundled entry in
  tests). Runs needing the LONGER terminating codes (16-63) or
  other makeups gate loudly by name and install via
  ``register_runlength_tables`` (the register_huffman_table seam:
  validation at registration, worker shipment via snapshot).
* Group 3 (K >= 0) is 1-D run-length coding, i.e. all horizontal:
  outside the implemented subset (G4 /K -1 only), gated by name in
  the PDF front end.

Reference parity note: the reference pipeline has no media path —
beyond-reference LLM-data frontier, like operators/jpegcodec.py.
"""

from __future__ import annotations


class FaxError(ValueError):
    """Malformed or out-of-subset CCITT stream."""


# T.6/T.4 2-D mode codes (MSB-first): the 9-entry table.
_MODE_CODES = {
    (1, 0b1): ("V", 0),
    (3, 0b011): ("V", 1),      # VR1
    (3, 0b010): ("V", -1),     # VL1
    (3, 0b001): ("H", 0),
    (4, 0b0001): ("P", 0),
    (6, 0b000011): ("V", 2),   # VR2
    (6, 0b000010): ("V", -2),  # VL2
    (7, 0b0000011): ("V", 3),  # VR3
    (7, 0b0000010): ("V", -3),  # VL3
}
# structural check at import: prefix-free (a slipped bit collides)
_mode_bits = [format(c, f"0{ln}b") for ln, c in _MODE_CODES]
for _a in _mode_bits:
    for _b in _mode_bits:
        if _a != _b and _b.startswith(_a):
            raise AssertionError("mode table not prefix-free")
del _mode_bits, _a, _b

_EOFB = "000000000001000000000001"

# -------------------------------------- run-length tables (T.4)
# The bundled HEAD: terminating runs 0-15 + the 64-makeup per
# color — the universally-reproduced first rows of the T.4 tables
# (module docstring). {run: (code_length, code)}.
_RUNLEN_WHITE_HEAD = {
    0: (8, 0b00110101), 1: (6, 0b000111), 2: (4, 0b0111),
    3: (4, 0b1000), 4: (4, 0b1011), 5: (4, 0b1100),
    6: (4, 0b1110), 7: (4, 0b1111), 8: (5, 0b10011),
    9: (5, 0b10100), 10: (5, 0b00111), 11: (5, 0b01000),
    12: (6, 0b001000), 13: (6, 0b000011), 14: (6, 0b110100),
    15: (6, 0b110101),
    64: (5, 0b11011), 128: (5, 0b10010),
}
_RUNLEN_BLACK_HEAD = {
    0: (10, 0b0000110111), 1: (3, 0b010), 2: (2, 0b11),
    3: (2, 0b10), 4: (3, 0b011), 5: (4, 0b0011),
    6: (4, 0b0010), 7: (5, 0b00011), 8: (6, 0b000101),
    9: (6, 0b000100), 10: (7, 0b0000100), 11: (7, 0b0000101),
    12: (7, 0b0000111), 13: (8, 0b00000100), 14: (8, 0b00000111),
    15: (9, 0b000011000),
    64: (10, 0b0000001111), 128: (12, 0b000011001000),
}
_RUNLEN: dict[str, dict[int, tuple[int, int]]] | None = None
_RUNLEN_DECODERS: dict[str, dict[tuple[int, int], int]] | None = None


def _validate_runlength(
    table: dict, color: str, complete: bool = True
) -> None:
    seen: set[tuple[int, int]] = set()
    for run, (ln, cd) in table.items():
        if run < 0 or (run > 63 and run % 64):
            raise FaxError(f"{color} entry {run}: not a run or makeup")
        if not (1 <= ln <= 14) or cd >= (1 << ln):
            raise FaxError(f"{color} run {run}: bad code ({ln},{cd})")
        if (ln, cd) in seen:
            raise FaxError(f"{color} run {run}: duplicate code")
        seen.add((ln, cd))
    if complete:
        for run in range(64):
            if run not in table:
                raise FaxError(f"{color} terminating run {run} missing")
    items = sorted(seen)
    for i, (l1, c1) in enumerate(items):
        for l2, c2 in items[i + 1:]:
            if l2 > l1 and (c2 >> (l2 - l1)) == c1:
                raise FaxError(
                    f"{color}: code ({l1},{c1}) is a prefix of ({l2},{c2})"
                )


# the bundled head must itself be structurally clean (import-time
# witness: a transcription slip that collides fails immediately)
_validate_runlength(_RUNLEN_WHITE_HEAD, "white", complete=False)
_validate_runlength(_RUNLEN_BLACK_HEAD, "black", complete=False)


def register_runlength_tables(white: dict, black: dict) -> None:
    """Install the FULL T.4 run-length code pages:
    ``{run: (code_length, code)}`` per color, terminating runs 0-63
    complete, makeups as multiples of 64. Validation: prefix-free,
    no duplicates, complete terminating coverage — the
    register_huffman_table discipline. Registered tables REPLACE
    the bundled head. For worker-side decode the operators capture
    ``snapshot_runlength_tables()`` at plan-build time."""
    global _RUNLEN, _RUNLEN_DECODERS
    _validate_runlength(white, "white")
    _validate_runlength(black, "black")
    _RUNLEN = {"white": dict(white), "black": dict(black)}
    _RUNLEN_DECODERS = {
        color: {(ln, cd): run for run, (ln, cd) in tab.items()}
        for color, tab in _RUNLEN.items()
    }


def snapshot_runlength_tables():
    return None if _RUNLEN is None else {
        c: dict(t) for c, t in _RUNLEN.items()
    }


def install_runlength_tables(snap) -> None:
    global _RUNLEN, _RUNLEN_DECODERS
    if snap is None:
        _RUNLEN = _RUNLEN_DECODERS = None
    else:
        register_runlength_tables(snap["white"], snap["black"])


_HEAD_TABLES = {"white": _RUNLEN_WHITE_HEAD, "black": _RUNLEN_BLACK_HEAD}
_HEAD_DECODERS = {
    color: {(ln, cd): run for run, (ln, cd) in tab.items()}
    for color, tab in _HEAD_TABLES.items()
}


def _active_tables() -> dict:
    return _RUNLEN if _RUNLEN is not None else _HEAD_TABLES


def _active_decoders() -> dict:
    return (
        _RUNLEN_DECODERS if _RUNLEN_DECODERS is not None
        else _HEAD_DECODERS
    )


class _Bits:
    """MSB-first bit reader over bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def read(self, k: int) -> int:
        if self.pos + k > self.n:
            raise FaxError("CCITT stream truncated")
        v = 0
        for _ in range(k):
            v = (v << 1) | (
                (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
            )
            self.pos += 1
        return v

    def peek_bits(self, k: int) -> str:
        out = []
        for i in range(k):
            p = self.pos + i
            if p >= self.n:
                break
            out.append(str((self.data[p >> 3] >> (7 - (p & 7))) & 1))
        return "".join(out)

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_mode(br: _Bits):
    code = 0
    for ln in range(1, 8):
        code = (code << 1) | br.read(1)
        hit = _MODE_CODES.get((ln, code))
        if hit is not None:
            return hit
    raise FaxError(
        f"unknown 2-D mode code at bit {br.pos - 7} "
        "(T.6 extension codes are outside the implemented subset)"
    )


def _read_run(br: _Bits, color: str) -> int:
    """One T.4 run (makeups accumulate until a terminating code)."""
    dec = _active_decoders()[color]
    bundled_only = _RUNLEN_DECODERS is None
    total = 0
    while True:
        code = 0
        for ln in range(1, 15):
            code = (code << 1) | br.read(1)
            run = dec.get((ln, code))
            if run is not None:
                break
        else:
            if bundled_only:
                raise NotImplementedError(
                    f"CCITT {color} run code outside the bundled "
                    "T.4 head (terminating 0-15 + the 64-makeup): "
                    "the longer terminating codes and remaining "
                    "makeups install via register_runlength_tables "
                    "(the SCALE.md transcription-confidence policy)"
                )
            raise FaxError(f"unterminated {color} run code")
        total += run
        if run < 64:
            return total
        # makeup: a terminating code must follow


def _transitions(row: list[int], columns: int) -> list[int]:
    """Changing-element positions of one decoded row (color differs
    from the pixel to its left; first pixel changes iff black),
    terminated by two sentinels at ``columns``."""
    out = []
    prev = 0  # white
    for x, px in enumerate(row):
        if px != prev:
            out.append(x)
            prev = px
    out.append(columns)
    out.append(columns)
    return out


def decode_g4(
    data: bytes,
    columns: int,
    rows: int,
    *,
    encoded_byte_align: bool = False,
    black_is_1: bool = False,
) -> bytes:
    """Decode a T.6 (pure 2-D / MMR) stream to ``rows`` x
    ``columns`` pixels, one byte each: 0 = white, 1 = black
    (``black_is_1`` matches the PDF /BlackIs1 sense for the
    CALLER's packing; the returned buffer is always 0-white/
    1-black). Stops after ``rows`` lines; a trailing EOFB is
    consumed if present."""
    if columns <= 0 or rows <= 0:
        raise FaxError(f"bad geometry {columns}x{rows}")
    br = _Bits(data)
    out = bytearray()
    # imaginary all-white reference line
    ref_tr = [columns, columns]
    for _y in range(rows):
        if encoded_byte_align:
            br.byte_align()
        row = [0] * columns
        a0 = -1
        color = 0  # white
        while a0 < columns:
            # b1: first changing element on the reference line right
            # of a0 with color OPPOSITE to a0's color; transitions
            # alternate starting with white->black
            i = 0
            while i < len(ref_tr) and ref_tr[i] <= a0:
                i += 1
            # ref_tr[i] has color index parity: even index = w->b
            if (i & 1) != (0 if color == 0 else 1):
                i += 1
            b1 = ref_tr[i] if i < len(ref_tr) else columns
            b2 = ref_tr[i + 1] if i + 1 < len(ref_tr) else columns
            mode, d = _read_mode(br)
            if mode == "P":
                # pass: color runs through b2
                start = max(a0, 0)
                if color:
                    for x in range(start, b2):
                        row[x] = 1
                a0 = b2
            elif mode == "V":
                a1 = b1 + d
                if a1 < 0 or a1 > columns:
                    raise FaxError(
                        f"vertical mode moves a1 to {a1} "
                        f"(columns {columns})"
                    )
                start = max(a0, 0)
                if color:
                    for x in range(start, a1):
                        row[x] = 1
                a0 = a1
                color ^= 1
            else:  # horizontal: two runs from the seamed tables
                r1 = _read_run(br, "white" if color == 0 else "black")
                r2 = _read_run(br, "black" if color == 0 else "white")
                start = max(a0, 0)
                end1 = start + r1
                end2 = end1 + r2
                if end2 > columns:
                    raise FaxError(
                        f"horizontal runs {r1}+{r2} overrun column "
                        f"{columns}"
                    )
                if color:
                    for x in range(start, end1):
                        row[x] = 1
                else:
                    for x in range(end1, end2):
                        row[x] = 1
                a0 = end2
        out.extend(row)
        ref_tr = _transitions(row, columns)
    # optional EOFB
    if br.peek_bits(24) == _EOFB:
        br.read(24)
    return bytes(out)


# --------------------------------------------------------- encoder
# Independent forward coder for fixtures/tests (the mpeg "syntax
# writer" discipline): always emits the 2-D modes; falls back to
# horizontal ONLY when the vertical window (|a1 - b1| <= 3) cannot
# express a transition — callers keeping their content inside the
# vertical window get streams that DECODE WITHOUT the seamed run
# tables.
def encode_g4(
    pixels: bytes,
    columns: int,
    rows: int,
    *,
    encoded_byte_align: bool = False,
) -> bytes:
    if len(pixels) != columns * rows:
        raise FaxError("pixel buffer does not match geometry")
    bits: list[str] = []
    inv_modes = {v: format(c, f"0{ln}b") for (ln, c), v in
                 _MODE_CODES.items()}
    ref_tr = [columns, columns]
    for y in range(rows):
        if encoded_byte_align and bits:
            total = sum(len(b) for b in bits)
            bits.append("0" * ((-total) % 8))
        row = list(pixels[y * columns : (y + 1) * columns])
        cur_tr = _transitions(row, columns)
        a0 = -1
        color = 0
        ti = 0  # next transition index on the coding line
        while a0 < columns:
            a1 = cur_tr[ti] if ti < len(cur_tr) else columns
            i = 0
            while i < len(ref_tr) and ref_tr[i] <= a0:
                i += 1
            if (i & 1) != (0 if color == 0 else 1):
                i += 1
            b1 = ref_tr[i] if i < len(ref_tr) else columns
            b2 = ref_tr[i + 1] if i + 1 < len(ref_tr) else columns
            if b2 < a1:
                bits.append(inv_modes[("P", 0)])
                a0 = b2
                continue
            d = a1 - b1
            if -3 <= d <= 3:
                bits.append(inv_modes[("V", d)])
                a0 = a1
                color ^= 1
                ti += 1
                continue
            # horizontal: two runs (needs the registered tables)
            a2 = cur_tr[ti + 1] if ti + 1 < len(cur_tr) else columns
            start = max(a0, 0)
            bits.append(inv_modes[("H", 0)])
            bits.append(_encode_run(a1 - start, "white" if color == 0
                                    else "black"))
            bits.append(_encode_run(a2 - a1, "black" if color == 0
                                    else "white"))
            a0 = a2
            ti += 2
        ref_tr = cur_tr
    bits.append(_EOFB)
    s = "".join(bits)
    s += "0" * ((-len(s)) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _encode_run(run: int, color: str) -> str:
    tab = _active_tables()[color]
    out = []
    while run >= 64:
        make = min((run // 64) * 64, max(r for r in tab if r % 64 == 0))
        if make not in tab:
            raise FaxError(f"no {color} makeup for run {run}")
        out.append(format(tab[make][1], f"0{tab[make][0]}b"))
        run -= make
    if run not in tab:
        raise NotImplementedError(
            f"encoding {color} run {run} needs a code outside the "
            "bundled T.4 head; register_runlength_tables(...)"
        )
    ln, cd = tab[run]
    out.append(format(cd, f"0{ln}b"))
    return "".join(out)


def unpack_bilevel(packed: bytes, columns: int, rows: int,
                   black_is_1: bool) -> bytes:
    """Unpack 1-bit rows (byte-aligned per row, the PDF image
    convention) to one byte per pixel, 0 = white / 1 = black."""
    stride = (columns + 7) // 8
    if len(packed) < stride * rows:
        raise FaxError(
            f"{len(packed)} bytes for {rows} rows of stride {stride}"
        )
    out = bytearray(columns * rows)
    for y in range(rows):
        base = y * stride
        for x in range(columns):
            bit = (packed[base + (x >> 3)] >> (7 - (x & 7))) & 1
            out[y * columns + x] = bit if black_is_1 else bit ^ 1
    return bytes(out)


def pack_bilevel(pixels: bytes, columns: int, rows: int,
                 black_is_1: bool) -> bytes:
    """Inverse of ``unpack_bilevel`` (fixture/test packer)."""
    stride = (columns + 7) // 8
    out = bytearray(stride * rows)
    for y in range(rows):
        for x in range(columns):
            bit = pixels[y * columns + x]
            if not black_is_1:
                bit ^= 1
            if bit:
                out[y * stride + (x >> 3)] |= 0x80 >> (x & 7)
    return bytes(out)
