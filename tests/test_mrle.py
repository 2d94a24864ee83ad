"""MS-RLE video compositor (operators/multimodal.py::
compose_mrle_frames) against an INDEPENDENT in-test encoder and
per-pixel reference compositor: the encoder emits BI_RLE8 frame
streams (runs, absolute mode with word padding, EOL/EOB/delta
escapes) from random sparse updates, wrapped in a hand-assembled
RIFF/AVI tree; the reference composites scalar-Python over the
previous frame. Expected pixels never come from the code under
test."""

from __future__ import annotations

import random
import struct

import pytest

from cryptocoininsights_data_engineer_project_spark.operators.multimodal import (
    compose_mrle_frames,
)

# --------------------------------------------------------------- test encoder


def _encode_rle8_frame(update: dict[tuple[int, int], int], w: int, h: int,
                       rng: random.Random) -> bytes:
    """Encode a sparse update {(x, y_stored): idx} as a BI_RLE8
    stream, choosing randomly between encoded runs and absolute mode
    per row segment, with delta escapes skipping untouched spans."""
    out = bytearray()
    rows: dict[int, list[int]] = {}
    for (x, y), v in update.items():
        rows.setdefault(y, []).append(x)
    cx = cy = 0
    for y in sorted(rows):
        xs = sorted(rows[y])
        x0 = xs[0]
        # move to this row: a delta keeps x (only usable when the
        # row's first pixel is at or right of the cursor), EOLs
        # reset x to 0 — both leave skipped pixels untouched
        if y > cy:
            if rng.random() < 0.5 and x0 >= cx and y - cy <= 255:
                out += bytes([0, 2, x0 - cx, y - cy])
                cx, cy = x0, y
            else:
                while cy < y:
                    out += bytes([0, 0])
                    cy += 1
                cx = 0
        i = 0
        while i < len(xs):
            # contiguous segment
            j = i
            while j + 1 < len(xs) and xs[j + 1] == xs[j] + 1:
                j += 1
            seg = [update[(x, y)] for x in xs[i : j + 1]]
            x0 = xs[i]
            if x0 > cx:
                out += bytes([0, 2, x0 - cx, 0])
            cx = x0
            # runs of equal values vs absolute mode
            if rng.random() < 0.5 and len(seg) >= 3:
                out += bytes([0, len(seg)]) + bytes(seg)
                if len(seg) & 1:
                    out += b"\x00"  # word padding
                cx += len(seg)
            else:
                k = 0
                while k < len(seg):
                    m = k
                    while m + 1 < len(seg) and seg[m + 1] == seg[m]:
                        m += 1
                    out += bytes([m - k + 1, seg[k]])
                    cx += m - k + 1
                    k = m + 1
            i = j + 1
    out += bytes([0, 1])  # EOB
    return bytes(out)


def _avi(frames: list[bytes], w: int, h: int) -> bytes:
    """Minimal spec-shaped RIFF/AVI wrapping the RLE8 frame chunks."""
    def le32(v):
        return struct.pack("<I", v)

    avih = (
        le32(40000) + le32(0) + le32(0) + le32(0) + le32(len(frames))
        + le32(0) + le32(1) + le32(0) + le32(w) + le32(h) + le32(0) * 4
    )
    strh = (
        b"vidsMRLE" + le32(0) + struct.pack("<HH", 0, 0) + le32(0)
        + le32(1) + le32(25) + le32(0) + le32(len(frames)) + le32(0)
        + le32(0xFFFFFFFF) + le32(0) + struct.pack("<HHHH", 0, 0, 0, 0)
    )
    strf = (
        le32(40) + le32(w) + le32(h) + struct.pack("<HH", 1, 8)
        + le32(1) + le32(w * h) + le32(0) * 2 + le32(256) + le32(0)
        + bytes(1024)
    )
    strl = b"strl" + b"strh" + le32(len(strh)) + strh + b"strf" + le32(
        len(strf)
    ) + strf
    hdrl = b"hdrl" + b"avih" + le32(len(avih)) + avih + b"LIST" + le32(
        len(strl)
    ) + strl
    movi = bytearray(b"movi")
    for f in frames:
        movi += b"00dc" + le32(len(f)) + f
        if len(f) & 1:
            movi += b"\x00"
    body = (
        b"AVI " + b"LIST" + le32(len(hdrl)) + hdrl
        + b"LIST" + le32(len(movi)) + movi
    )
    return b"RIFF" + le32(len(body)) + body


def _reference(updates: list[dict], w: int, h: int) -> list[bytes]:
    """Scalar reference: apply each sparse update over the previous
    canvas (stored order), emit display order."""
    canvas = [[0] * w for _ in range(h)]  # [y_stored][x]
    out = []
    for up in updates:
        for (x, y), v in up.items():
            canvas[y][x] = v
        disp = bytearray()
        for y in range(h - 1, -1, -1):
            disp += bytes(canvas[y])
        out.append(bytes(disp))
    return out


def _rand_updates(w: int, h: int, n_frames: int,
                  rng: random.Random) -> list[dict]:
    ups = [{(x, y): rng.randrange(256) for x in range(w) for y in range(h)}]
    for _ in range(n_frames - 1):
        up = {}
        for _ in range(rng.randrange(1, w * h // 2)):
            up[(rng.randrange(w), rng.randrange(h))] = rng.randrange(256)
        ups.append(up)
    return ups


# ---------------------------------------------------------------------- tests


@pytest.mark.parametrize("seed", range(6))
def test_random_sparse_updates_match_reference(seed):
    """Random sparse per-frame updates through random encodings
    (runs / absolute / delta / EOL addressing): skipped pixels must
    hold the previous frame's value on every frame."""
    rng = random.Random(seed)
    w, h = rng.randrange(3, 14), rng.randrange(3, 11)
    updates = _rand_updates(w, h, rng.randrange(2, 6), rng)
    frames = [_encode_rle8_frame(u, w, h, rng) for u in updates]
    gw, gh, got = compose_mrle_frames(_avi(frames, w, h))
    want = _reference(updates, w, h)
    assert (gw, gh, len(got)) == (w, h, len(updates))
    for t, (g, e) in enumerate(zip(got, want)):
        assert g == e, f"seed {seed} frame {t} mismatch"


def test_empty_update_frame_is_pure_reference():
    """A frame that is ONLY an EOB repeats the previous frame — the
    degenerate all-skip temporal frame."""
    rng = random.Random(9)
    w, h = 5, 4
    updates = _rand_updates(w, h, 2, rng)
    frames = [_encode_rle8_frame(updates[0], w, h, rng), bytes([0, 1])]
    _, _, got = compose_mrle_frames(_avi(frames, w, h))
    assert got[0] == got[1]


def test_mid_row_delta_hole():
    """A delta skip INSIDE a repainted row leaves a temporal hole."""
    w, h = 6, 2
    f0 = {(x, y): 7 for x in range(w) for y in range(h)}
    rng = random.Random(1)
    frames = [
        _encode_rle8_frame(f0, w, h, rng),
        # row 1: paint x0..1 = 3, skip 2, paint x4..5 = 4
        bytes([0, 2, 0, 1, 2, 3, 0, 2, 2, 0, 2, 4, 0, 1]),
    ]
    _, _, got = compose_mrle_frames(_avi(frames, w, h))
    # stored row 1 = display row 0
    assert got[1][:6] == bytes([3, 3, 7, 7, 4, 4])
    assert got[1][6:] == got[0][6:]


def test_bad_container_gates():
    with pytest.raises(ValueError, match="RIFF"):
        compose_mrle_frames(b"nope" + bytes(40))
    rng = random.Random(3)
    frames = [_encode_rle8_frame(_rand_updates(4, 4, 1, rng)[0], 4, 4, rng)]
    blob = bytearray(_avi(frames, 4, 4))
    i = blob.index(b"avih")
    blob[i:i + 4] = b"xxxx"
    with pytest.raises(ValueError, match="avih"):
        compose_mrle_frames(bytes(blob))


def test_truncated_frame_stream_raises_typed():
    from cryptocoininsights_data_engineer_project_spark.operators.bitmap import (
        BmpError,
    )

    rng = random.Random(4)
    up = _rand_updates(4, 4, 1, rng)[0]
    f0 = _encode_rle8_frame(up, 4, 4, rng)
    with pytest.raises(BmpError):
        compose_mrle_frames(_avi([f0[:-2]], 4, 4))  # EOB cut off


def test_mrle_fuzz_never_crashes_untyped():
    """Mutations of a valid clip must decode or raise ValueError /
    BmpError — nothing untyped escapes the container or RLE walk."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cryptocoininsights_data_engineer_project_spark.operators.bitmap import (
        BmpError,
    )

    rng = random.Random(41)
    updates = _rand_updates(5, 4, 3, rng)
    seedblob = _avi(
        [_encode_rle8_frame(u, 5, 4, rng) for u in updates], 5, 4
    )

    @settings(max_examples=250, deadline=None)
    @given(
        st.integers(0, len(seedblob) - 1),
        st.integers(1, 255),
        st.integers(0, len(seedblob)),
    )
    def mutate(pos, xor, cut):
        blob = bytearray(seedblob)
        blob[pos] ^= xor
        try:
            compose_mrle_frames(bytes(blob[:cut]))
        except (ValueError, BmpError):
            pass

    mutate()
