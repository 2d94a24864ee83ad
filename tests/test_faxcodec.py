"""CCITT Group 4 (ITU-T T.6) codec (operators/faxcodec.py): mode-code
hand vectors, encoder/decoder round trips incl. byte alignment and
makeups, the bundled-head run-table witnesses, the register seam, and
bilevel pack/unpack."""

from __future__ import annotations

import random

import pytest

from cryptocoininsights_data_engineer_project_spark.operators import (
    faxcodec as FX,
)


def _gen(rng, cols, rows, maxrun=14):
    out = []
    for _y in range(rows):
        row = []
        c = 0
        while len(row) < cols:
            r = rng.randrange(1, maxrun)
            row += [c] * min(r, cols - len(row))
            c ^= 1
        out.append(row)
    return bytes(b for r in out for b in r)


def test_mode_code_hand_vector():
    """Spec bit layout for one row [ww bbb www] of 8 columns:
    HORIZONTAL (001) + white-2 (0111) + black-3 (10), then V0 (1)
    to close the line at the imaginary reference — the exact T.6
    coding every fax description walks through."""
    px = bytes([0, 0, 1, 1, 1, 0, 0, 0])
    enc = FX.encode_g4(px, 8, 1)
    bits = "".join(format(b, "08b") for b in enc)
    assert bits.startswith("001" + "0111" + "10" + "1")
    assert FX.decode_g4(enc, 8, 1) == px
    # all-white row: single V0 + EOFB
    enc = FX.encode_g4(bytes(8), 8, 1)
    bits = "".join(format(b, "08b") for b in enc)
    assert bits.startswith("1" + "000000000001000000000001")


def test_round_trips_all_modes():
    """Randomized round trips exercising pass/vertical/horizontal
    modes, the 64-makeups, and EncodedByteAlign."""
    rng = random.Random(42)
    for _trial in range(60):
        cols = rng.randrange(4, 60)
        rows = rng.randrange(1, 14)
        px = _gen(rng, cols, rows)
        for align in (False, True):
            enc = FX.encode_g4(px, cols, rows, encoded_byte_align=align)
            assert FX.decode_g4(
                enc, cols, rows, encoded_byte_align=align
            ) == px
    # makeup-64 white and black runs
    px = bytes(70) + bytes([1]) * 69 + bytes(21)
    enc = FX.encode_g4(px, 160, 1)
    assert FX.decode_g4(enc, 160, 1) == px
    # all-black / all-white images
    assert FX.decode_g4(FX.encode_g4(bytes(64), 8, 8), 8, 8) == bytes(64)
    allb = bytes([1]) * 64
    assert FX.decode_g4(FX.encode_g4(allb, 8, 8), 8, 8) == allb


def test_bundled_head_witnesses():
    """The bundled T.4 head validates structurally at import; here
    re-run the witness explicitly and pin a few famous codes."""
    FX._validate_runlength(FX._RUNLEN_WHITE_HEAD, "white", complete=False)
    FX._validate_runlength(FX._RUNLEN_BLACK_HEAD, "black", complete=False)
    assert FX._RUNLEN_WHITE_HEAD[2] == (4, 0b0111)
    assert FX._RUNLEN_BLACK_HEAD[2] == (2, 0b11)
    assert FX._RUNLEN_BLACK_HEAD[3] == (2, 0b10)
    assert FX._RUNLEN_WHITE_HEAD[64] == (5, 0b11011)
    assert FX._RUNLEN_BLACK_HEAD[64] == (10, 0b0000001111)


def test_out_of_head_runs_gate_loudly():
    # encoding a white run of 20 needs terminating code 20
    px = bytes(20) + bytes([1]) * 3 + bytes(9)
    with pytest.raises(NotImplementedError, match="bundled T.4 head"):
        FX.encode_g4(px, 32, 1)
    # decoding an unknown run code gates by name too: hand-craft
    # H-mode followed by an unassigned pattern
    bits = "001" + "00000000000000"
    data = bytes(
        int(bits[i : i + 8].ljust(8, "0"), 2)
        for i in range(0, len(bits), 8)
    )
    with pytest.raises(NotImplementedError, match="register_runlength"):
        FX.decode_g4(data, 8, 1)


def test_register_seam_and_validation():
    """A registered FULL table replaces the head (runs 16+ then
    work); malformed tables refuse."""
    white = dict(FX._RUNLEN_WHITE_HEAD)
    black = dict(FX._RUNLEN_BLACK_HEAD)
    # complete both to 0-63 with synthetic 14-bit codes in the
    # unused deep-zeros branch (no head code starts with 8 zeros)
    for run in range(16, 64):
        white[run] = (14, run)
        black[run] = (14, run)
    FX.register_runlength_tables(white, black)
    try:
        px = bytes(20) + bytes([1]) * 30 + bytes(14)
        enc = FX.encode_g4(px, 64, 1)
        assert FX.decode_g4(enc, 64, 1) == px
        snap = FX.snapshot_runlength_tables()
        assert snap is not None and snap["white"][20][0] == 14
    finally:
        FX.install_runlength_tables(None)
    # incomplete registration refuses
    with pytest.raises(FX.FaxError, match="missing"):
        FX.register_runlength_tables(
            dict(FX._RUNLEN_WHITE_HEAD), dict(FX._RUNLEN_BLACK_HEAD)
        )
    # prefix collision refuses
    bad = dict(white)
    bad[63] = (5, 0b01110)  # child of white-2's 0111
    with pytest.raises(FX.FaxError, match="prefix"):
        FX.register_runlength_tables(bad, black)


def test_typed_errors():
    with pytest.raises(FX.FaxError, match="geometry"):
        FX.decode_g4(b"\x00", 0, 1)
    with pytest.raises(FX.FaxError, match="truncated"):
        FX.decode_g4(b"", 8, 2)
    # unknown mode code (T.6 extension space)
    with pytest.raises(FX.FaxError, match="mode code"):
        FX.decode_g4(bytes([0b00000001, 0xFF]), 8, 1)


def test_bilevel_pack_round_trip():
    rng = random.Random(3)
    for _ in range(20):
        cols = rng.randrange(1, 30)
        rows = rng.randrange(1, 8)
        px = bytes(rng.randrange(2) for _ in range(cols * rows))
        for b1 in (False, True):
            packed = FX.pack_bilevel(px, cols, rows, b1)
            assert FX.unpack_bilevel(packed, cols, rows, b1) == px
