"""APNG compositor (operators/multimodal.py::compose_apng_frames)
against an INDEPENDENT in-test encoder and per-pixel reference
renderer: the encoder writes real zlib streams (actual compression,
real adler), real chunk CRC-32s, and spec filter choices per
scanline; the reference compositor is a straightforward per-pixel
Python loop written from the APNG spec's sample code, separately
from the numpy compositor under test — the same independence
discipline as the GIF/JPEG tests. Expected pixels never come from
the code under test."""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from cryptocoininsights_data_engineer_project_spark.operators.multimodal import (
    compose_apng_frames,
    parse_apng_frames,
)

# --------------------------------------------------------------- test encoder


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        len(data).to_bytes(4, "big")
        + typ
        + data
        + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _filter_scanlines(rgba: bytes, w: int, h: int, ch: int,
                      rng: random.Random) -> bytes:
    """Apply a randomly chosen spec filter (None/Sub/Up) per scanline
    — enough to prove the compositor runs frame data through the real
    unfilter path (Average/Paeth are covered by the still-PNG tests)."""
    stride = w * ch
    out = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = rgba[y * stride : (y + 1) * stride]
        f = rng.choice((0, 1, 2))
        out.append(f)
        if f == 0:
            out += line
        elif f == 1:
            out += bytes(
                (line[i] - (line[i - ch] if i >= ch else 0)) & 0xFF
                for i in range(stride)
            )
        else:
            out += bytes((line[i] - prev[i]) & 0xFF for i in range(stride))
        prev = line
    return bytes(out)


def encode_apng(w: int, h: int, frames: list[dict], ctype: int = 6,
                seed: int = 0, default_in_anim: bool = True) -> bytes:
    """Spec-valid APNG from frame dicts {x y w h dispose blend rgba}:
    real zlib compression, real CRCs, shared fcTL/fdAT sequence
    numbering. With default_in_anim=False the IDAT carries a default
    image that is NOT part of the animation (no fcTL before it)."""
    rng = random.Random(seed)
    ch = 4 if ctype == 6 else 3
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
    out += _chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    for k, f in enumerate(frames):
        raw = _filter_scanlines(f["rgba"], f["w"], f["h"], ch, rng)
        z = zlib.compress(raw, level=rng.choice((0, 6, 9)))
        if k == 0 and not default_in_anim:
            # default image first (no fcTL), then frame 0 as fdAT
            default = bytes(rng.randrange(256) for _ in range(w * h * ch))
            out += _chunk(
                b"IDAT",
                zlib.compress(_filter_scanlines(default, w, h, ch, rng)),
            )
        fctl = struct.pack(
            ">IIIIIHHBB", seq, f["w"], f["h"], f["x"], f["y"],
            1, 100, f["dispose"], f["blend"],
        )
        seq += 1
        out += _chunk(b"fcTL", fctl)
        if k == 0 and default_in_anim:
            # split across two IDATs to prove concatenation
            mid = len(z) // 2
            out += _chunk(b"IDAT", z[:mid])
            out += _chunk(b"IDAT", z[mid:])
        else:
            # split across two fdATs to prove concatenation
            mid = len(z) // 2
            out += _chunk(b"fdAT", seq.to_bytes(4, "big") + z[:mid])
            seq += 1
            out += _chunk(b"fdAT", seq.to_bytes(4, "big") + z[mid:])
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


# ------------------------------------------------------ reference compositor


def reference_compose(w: int, h: int, frames: list[dict],
                      ch: int = 4) -> list[bytes]:
    """Per-pixel APNG compositing straight from the spec's sample
    code — scalar Python, independent of the numpy implementation."""
    canvas = [[0, 0, 0, 0] for _ in range(w * h)]
    out = []
    for k, f in enumerate(frames):
        dispose = f["dispose"]
        if dispose == 2 and k == 0:
            dispose = 1
        snap = [px[:] for px in canvas]
        for y in range(f["h"]):
            for x in range(f["w"]):
                i = (f["y"] + y) * w + (f["x"] + x)
                s = list(f["rgba"][(y * f["w"] + x) * ch :][:ch])
                if ch == 3:
                    s = s + [255]
                if f["blend"] == 0:
                    canvas[i] = s
                else:
                    fa, ba = s[3], canvas[i][3]
                    if fa == 0:
                        pass
                    elif fa == 255 or ba == 0:
                        canvas[i] = s
                    else:
                        u = fa * 255
                        v = (255 - fa) * ba
                        al = u + v
                        canvas[i] = [
                            (s[c] * u + canvas[i][c] * v) // al
                            for c in range(3)
                        ] + [al // 255]
        out.append(bytes(b for px in canvas for b in px))
        if dispose:
            for y in range(f["h"]):
                for x in range(f["w"]):
                    i = (f["y"] + y) * w + (f["x"] + x)
                    canvas[i] = (
                        [0, 0, 0, 0] if dispose == 1 else snap[i][:]
                    )
    return out


def _rand_frames(w: int, h: int, n: int, rng: random.Random,
                 ch: int = 4) -> list[dict]:
    frames = [dict(x=0, y=0, w=w, h=h, dispose=rng.randrange(3), blend=0,
                   rgba=bytes(rng.randrange(256) for _ in range(w * h * ch)))]
    for _ in range(n - 1):
        fw = rng.randrange(1, w + 1)
        fh = rng.randrange(1, h + 1)
        frames.append(dict(
            x=rng.randrange(w - fw + 1), y=rng.randrange(h - fh + 1),
            w=fw, h=fh, dispose=rng.randrange(3), blend=rng.randrange(2),
            rgba=bytes(rng.randrange(256) for _ in range(fw * fh * ch)),
        ))
    return frames


# ---------------------------------------------------------------------- tests


@pytest.mark.parametrize("seed", range(6))
def test_random_animations_match_reference(seed):
    """Random frame rects, dispose/blend ops, alpha bytes, filters,
    and zlib levels — the numpy compositor must match the scalar
    spec-sample reference on every frame."""
    rng = random.Random(seed)
    w, h = rng.randrange(3, 12), rng.randrange(3, 10)
    frames = _rand_frames(w, h, rng.randrange(2, 7), rng)
    payload = encode_apng(w, h, frames, seed=seed)
    gw, gh, got = compose_apng_frames(payload)
    want = reference_compose(w, h, frames)
    assert (gw, gh, len(got)) == (w, h, len(frames))
    for t, (g, e) in enumerate(zip(got, want)):
        assert g == e, f"seed {seed} frame {t} composite mismatch"


def test_rgb_frames_get_opaque_alpha():
    """Color type 2 (RGB) animations composite with implicit alpha
    255 — every OVER acts as copy."""
    rng = random.Random(99)
    w, h = 5, 4
    frames = _rand_frames(w, h, 3, rng, ch=3)
    payload = encode_apng(w, h, frames, ctype=2, seed=1)
    gw, gh, got = compose_apng_frames(payload)
    want = reference_compose(w, h, frames, ch=3)
    assert (gw, gh) == (w, h)
    for t, (g, e) in enumerate(zip(got, want)):
        assert g == e, f"frame {t} mismatch"


def test_default_image_outside_animation_is_skipped():
    """IDAT with no preceding fcTL is the standalone default image:
    the animation starts at the first fdAT frame and the default
    pixels never reach the canvas."""
    rng = random.Random(5)
    w, h = 6, 5
    frames = _rand_frames(w, h, 3, rng)
    payload = encode_apng(w, h, frames, seed=2, default_in_anim=False)
    gw, gh, got = compose_apng_frames(payload)
    want = reference_compose(w, h, frames)
    assert len(got) == len(frames)
    for t, (g, e) in enumerate(zip(got, want)):
        assert g == e, f"frame {t} mismatch"


def test_dispose_previous_on_frame0_acts_as_background():
    """Spec rule: PREVIOUS on the first frame behaves as BACKGROUND —
    frame 1 must land on a cleared canvas, not the frame-0 pixels."""
    w, h = 4, 3
    opaque = bytes([200, 100, 50, 255] * (w * h))
    # frame 1 covers only part of the canvas; the rest must be 0
    f1 = dict(x=1, y=1, w=2, h=1, dispose=0, blend=0,
              rgba=bytes([9, 8, 7, 255] * 2))
    frames = [dict(x=0, y=0, w=w, h=h, dispose=2, blend=0, rgba=opaque), f1]
    payload = encode_apng(w, h, frames, seed=3)
    _, _, got = compose_apng_frames(payload)
    want = reference_compose(w, h, frames)
    assert got[0] == opaque  # rendered before disposal
    assert got[1] == want[1]
    # everything outside f1's rect is transparent black after clear
    px = got[1]
    for y in range(h):
        for x in range(w):
            if not (y == 1 and 1 <= x <= 2):
                assert px[(y * w + x) * 4 : (y * w + x) * 4 + 4] == b"\0\0\0\0"


def test_sequence_gap_rejected():
    rng = random.Random(11)
    payload = bytearray(encode_apng(4, 4, _rand_frames(4, 4, 2, rng)))
    # corrupt the first fdAT sequence number (search for the type tag)
    i = payload.index(b"fdAT")
    payload[i + 4 : i + 8] = (99).to_bytes(4, "big")
    with pytest.raises(ValueError, match="sequence"):
        compose_apng_frames(bytes(payload))


def test_actl_count_mismatch_rejected():
    rng = random.Random(12)
    payload = bytearray(encode_apng(4, 4, _rand_frames(4, 4, 2, rng)))
    i = payload.index(b"acTL")
    payload[i + 4 : i + 8] = (7).to_bytes(4, "big")
    with pytest.raises(ValueError, match="num_frames"):
        compose_apng_frames(bytes(payload))


def test_plain_png_rejected_loudly():
    """A still PNG (no acTL) is not an animation — the error names
    the missing chunk so callers fall back to decode_png_pixels."""
    still = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00" + b"\x01" * 8 + b"\x00" + b"\x02" * 8))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="acTL"):
        compose_apng_frames(still)


def test_frame_rect_outside_canvas_rejected():
    rng = random.Random(13)
    frames = _rand_frames(4, 4, 2, rng)
    frames[1].update(x=3, w=3)  # 3 + 3 > 4
    payload = encode_apng(4, 4, frames, seed=4)
    with pytest.raises(ValueError, match="outside"):
        compose_apng_frames(payload)


def test_parse_reports_shape():
    rng = random.Random(14)
    frames = _rand_frames(5, 3, 2, rng)
    payload = encode_apng(5, 3, frames, seed=6)
    w, h, depth, ctype, interlace, parsed = parse_apng_frames(payload)
    assert (w, h, depth, ctype, interlace) == (5, 3, 8, 6, 0)
    assert [f["w"] for f in parsed] == [f["w"] for f in frames]
    assert [f["dispose"] for f in parsed] == [f["dispose"] for f in frames]


def test_truncated_chunk_raises_typed_error():
    """A payload cut mid-chunk (or a length field past the buffer)
    raises the module's typed ValueError, not struct.error / a
    misleading zlib message."""
    rng = random.Random(77)
    payload = encode_apng(4, 4, _rand_frames(4, 4, 2, rng))
    i = payload.index(b"fcTL")
    with pytest.raises(ValueError, match="truncated fcTL"):
        compose_apng_frames(payload[: i + 10])
    # corrupt a length field to exceed the buffer
    bad = bytearray(payload)
    bad[i - 4 : i] = (10**6).to_bytes(4, "big")
    with pytest.raises(ValueError, match="truncated"):
        compose_apng_frames(bytes(bad))


def test_apng_fuzz_never_crashes_untyped():
    """Arbitrary PNG-signed bytes and mutations of a valid animation
    must decode or raise the module's typed ValueError — zlib/struct/
    numpy errors may not escape."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rng = random.Random(31)
    seedblob = encode_apng(5, 4, _rand_frames(5, 4, 2, rng), seed=31)

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=150))
    def run(blob):
        try:
            compose_apng_frames(b"\x89PNG\r\n\x1a\n" + blob)
        except ValueError:
            pass

    run()

    @settings(max_examples=250, deadline=None)
    @given(
        st.integers(8, len(seedblob) - 1),
        st.integers(1, 255),
        st.integers(8, len(seedblob)),
    )
    def mutate(pos, xor, cut):
        blob = bytearray(seedblob)
        blob[pos] ^= xor
        try:
            compose_apng_frames(bytes(blob[:cut]))
        except ValueError:
            pass

    mutate()
