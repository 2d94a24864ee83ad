"""GIF decoder (operators/gifcodec.py) against an INDEPENDENT in-test
encoder: a REAL compressing LZW (greedy longest-match dictionary
build, width bumps, 12-bit cap with explicit Clear), written from the
spec separately from the decoder — the same independence discipline
as the JPEG tests. Expected pixels come from the palette formula
directly, never from the decoder."""

from __future__ import annotations

import random

import pytest

from cryptocoininsights_data_engineer_project_spark.operators import multimodal
from cryptocoininsights_data_engineer_project_spark.operators.gifcodec import (
    GifError,
    decode_gif_pixels,
)

# --------------------------------------------------------------- test encoder


class _LsbPacker:
    """LSB-first bit packer (GIF's order — the opposite of JPEG's)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = self.n = 0
        return bytes(self.out)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Greedy LZW with dictionary growth and width bumps; emits Clear
    up front and again if the table hits 4096 (the decoder must
    handle both)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pk = _LsbPacker()
    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    pk.put(clear, width)
    cur = b""
    for byte in indices:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        pk.put(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        # width bumps AFTER assigning code next_code-1; decoder bumps
        # when its next_code reaches 2^width
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:
            pk.put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([byte])
    if cur:
        pk.put(table[cur], width)
    pk.put(eoi, width)
    return pk.flush()


def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _encode_gif(
    w: int,
    h: int,
    palette: bytes,  # 3*n bytes, n a power of two >= 2
    indices: bytes,  # w*h palette indices
    interlace: bool = False,
    version: bytes = b"GIF89a",
    gce: bool = False,
    local_palette: bool = False,
) -> bytes:
    n = len(palette) // 3
    size_bits = n.bit_length() - 2  # 2 << size_bits == n
    min_code = max(2, (n - 1).bit_length())
    if interlace:
        rows = bytearray()
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            for y in range(start, h, step):
                rows += indices[y * w : (y + 1) * w]
        indices = bytes(rows)
    out = bytearray(version)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    if local_palette:
        out += bytes([0x00, 0, 0])  # no GCT
    else:
        out += bytes([0x80 | size_bits, 0, 0])
        out += palette
    if gce:  # Graphic Control Extension (89a): must be skipped cleanly
        out += bytes([0x21, 0xF9, 4, 0x04, 0x0A, 0x00, 0x00, 0x00])
    out += bytes([0x2C]) + b"\x00\x00\x00\x00"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    ipacked = (0x40 if interlace else 0) | (0x80 | size_bits if local_palette else 0)
    out += bytes([ipacked])
    if local_palette:
        out += palette
    out += bytes([min_code])
    out += _subblocks(_lzw_encode(indices, min_code))
    out += bytes([0x3B])
    return bytes(out)


def _palette(n: int, seed: int = 3) -> bytes:
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(3 * n))


def _expected_rgb(palette: bytes, indices: bytes) -> bytes:
    out = bytearray()
    for ci in indices:
        out += palette[3 * ci : 3 * ci + 3]
    return bytes(out)


# --------------------------------------------------------------------- tests


def test_random_image_roundtrip_compressing_lzw():
    """47x31 image over a 16-color palette with repetitive runs — the
    dictionary genuinely grows and the code width bumps past its
    initial 5 bits."""
    rng = random.Random(11)
    w, h = 47, 31
    pal = _palette(16)
    idx = bytearray()
    while len(idx) < w * h:
        run = rng.randrange(1, 9)
        idx += bytes([rng.randrange(16)]) * run
    idx = bytes(idx[: w * h])
    gw, gh, ch, rgb = decode_gif_pixels(_encode_gif(w, h, pal, idx))
    assert (gw, gh, ch) == (w, h, 3)
    assert rgb == _expected_rgb(pal, idx)


def test_high_entropy_image_forces_many_codes():
    """Random indices over a 64-color palette: few matches, lots of
    dictionary churn and multiple width bumps."""
    rng = random.Random(13)
    w, h = 40, 40
    pal = _palette(64, seed=5)
    idx = bytes(rng.randrange(64) for _ in range(w * h))
    _, _, _, rgb = decode_gif_pixels(_encode_gif(w, h, pal, idx))
    assert rgb == _expected_rgb(pal, idx)


def test_kwkwk_edge_case():
    """aaa... produces the code==next_code (KwKwK) case immediately —
    the classic LZW decoder trap."""
    w, h = 10, 3
    pal = _palette(4)
    idx = bytes([1] * (w * h))
    _, _, _, rgb = decode_gif_pixels(_encode_gif(w, h, pal, idx))
    assert rgb == _expected_rgb(pal, idx)


def test_interlaced_rows_reordered():
    """Interlaced flag: rows stored in 4-pass order decode back to
    natural order. Row-colored image makes any misorder visible."""
    w, h = 8, 16
    pal = _palette(16, seed=7)
    idx = bytes(y % 16 for y in range(h) for _x in range(w))
    _, _, _, rgb = decode_gif_pixels(_encode_gif(w, h, pal, idx, interlace=True))
    assert rgb == _expected_rgb(pal, idx)


def test_89a_gce_and_local_palette():
    """89a with a Graphic Control Extension (skipped) and a LOCAL
    color table overriding the absent global one."""
    w, h = 9, 5
    pal = _palette(8, seed=9)
    idx = bytes((x + y) % 8 for y in range(h) for x in range(w))
    payload = _encode_gif(
        w, h, pal, idx, gce=True, local_palette=True
    )
    _, _, _, rgb = decode_gif_pixels(payload)
    assert rgb == _expected_rgb(pal, idx)


def test_dictionary_cap_and_mid_stream_clear():
    """A big high-entropy image pushes the dictionary to 4096 so the
    encoder emits a mid-stream Clear; the decoder must reset width
    and table."""
    rng = random.Random(17)
    w, h = 80, 60
    pal = _palette(128, seed=11)
    idx = bytes(rng.randrange(128) for _ in range(w * h))
    _, _, _, rgb = decode_gif_pixels(_encode_gif(w, h, pal, idx))
    assert rgb == _expected_rgb(pal, idx)


def test_malformed_gates():
    with pytest.raises(GifError, match="signature"):
        decode_gif_pixels(b"\x89PNG not a gif")
    ok = _encode_gif(8, 8, _palette(4), bytes([0] * 64))
    with pytest.raises(GifError):
        decode_gif_pixels(ok[: len(ok) // 2])  # truncated
    with pytest.raises(GifError, match="trailer"):
        decode_gif_pixels(ok[:13] + _palette(4) + b"\x3b")  # no image


def test_animated_frames_decode_and_partial_canvas_gate():
    """Multi-frame GIF: all frames decode in order through the block
    walker; a frame with a sub-canvas descriptor (needs disposal
    compositing) raises the documented gate."""
    from cryptocoininsights_data_engineer_project_spark.operators.gifcodec import (
        decode_gif_frames,
    )

    w, h = 6, 4
    pal = _palette(8, seed=31)
    frames_idx = [
        bytes((t + x + y) % 8 for y in range(h) for x in range(w))
        for t in range(3)
    ]
    # assemble a 3-frame GIF by splicing single-frame encodings
    first = _encode_gif(w, h, pal, frames_idx[0], gce=True)
    body = bytearray(first[:-1])  # drop trailer
    for idx in frames_idx[1:]:
        f = _encode_gif(w, h, pal, idx, gce=True, local_palette=True)
        lsd_end = 13  # no GCT in local_palette form
        body += f[lsd_end:-1]
    body.append(0x3B)
    gw, gh, frames = decode_gif_frames(bytes(body))
    assert (gw, gh, len(frames)) == (w, h, 3)
    for t, idx in enumerate(frames_idx):
        assert frames[t] == _expected_rgb(pal, idx), t


# ------------------------------------------------- disposal compositing


def _encode_anim(
    screen_w: int,
    screen_h: int,
    gct: bytes,
    bg_index: int,
    frames: list[dict],
) -> bytes:
    """Independent animated-GIF assembler: each frame dict gives
    {left, top, w, h, indices, disposal, trans_idx} and is emitted as
    GCE + image descriptor + LZW data. Written from the 89a spec,
    separately from the decoder."""
    n = len(gct) // 3
    size_bits = n.bit_length() - 2
    min_code = max(2, (n - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += screen_w.to_bytes(2, "little") + screen_h.to_bytes(2, "little")
    out += bytes([0x80 | size_bits, bg_index, 0])
    out += gct
    for f in frames:
        t = f.get("trans_idx")
        packed = (f.get("disposal", 0) << 2) | (1 if t is not None else 0)
        out += bytes([0x21, 0xF9, 4, packed, 0x0A, 0x00, t or 0, 0x00])
        out += bytes([0x2C])
        out += f["left"].to_bytes(2, "little") + f["top"].to_bytes(2, "little")
        out += f["w"].to_bytes(2, "little") + f["h"].to_bytes(2, "little")
        out += bytes([0x00, min_code])
        out += _subblocks(_lzw_encode(f["indices"], min_code))
    out += bytes([0x3B])
    return bytes(out)


def _reference_compose(
    screen_w: int,
    screen_h: int,
    gct: bytes,
    bg_index: int,
    frames: list[dict],
) -> list[bytes]:
    """Per-pixel pure-Python renderer written from the spec —
    independent of the numpy compositor under test."""
    bg = gct[3 * bg_index : 3 * bg_index + 3]
    canvas = [list(bg) for _ in range(screen_w * screen_h)]
    out = []
    for f in frames:
        snap = [px[:] for px in canvas]
        for y in range(f["h"]):
            cy = f["top"] + y
            if cy >= screen_h:
                continue
            for x in range(f["w"]):
                cx = f["left"] + x
                if cx >= screen_w:
                    continue
                ci = f["indices"][y * f["w"] + x]
                if f.get("trans_idx") is not None and ci == f["trans_idx"]:
                    continue
                canvas[cy * screen_w + cx] = list(gct[3 * ci : 3 * ci + 3])
        out.append(bytes(b for px in canvas for b in px))
        d = f.get("disposal", 0)
        if d in (2, 3):
            for y in range(f["h"]):
                cy = f["top"] + y
                if cy >= screen_h:
                    continue
                for x in range(f["w"]):
                    cx = f["left"] + x
                    if cx >= screen_w:
                        continue
                    canvas[cy * screen_w + cx] = (
                        list(bg) if d == 2 else snap[cy * screen_w + cx][:]
                    )
    return out


def test_partial_canvas_disposal_compositing():
    """The round-7 gate retired: partial-canvas frames composite onto
    the logical screen with transparency and all disposal methods,
    matching an independent per-pixel reference renderer — including
    restore-to-background (2), restore-to-previous (3), transparent
    holes showing the underlying canvas, and a frame rect that
    overhangs the canvas edge (clipped)."""
    from cryptocoininsights_data_engineer_project_spark.operators.gifcodec import (
        compose_gif_frames,
    )

    rng = random.Random(77)
    sw, sh = 10, 7
    gct = _palette(16, seed=5)
    frames = [
        # full-canvas base, leave in place
        dict(left=0, top=0, w=sw, h=sh, disposal=1, trans_idx=None,
             indices=bytes(rng.randrange(16) for _ in range(sw * sh))),
        # partial with transparency, restore-to-previous
        dict(left=2, top=1, w=5, h=4, disposal=3, trans_idx=7,
             indices=bytes(rng.randrange(16) for _ in range(5 * 4))),
        # partial, restore-to-background
        dict(left=4, top=3, w=3, h=3, disposal=2, trans_idx=None,
             indices=bytes(rng.randrange(16) for _ in range(3 * 3))),
        # overhangs the right/bottom edge -> clipped
        dict(left=8, top=5, w=4, h=4, disposal=0, trans_idx=3,
             indices=bytes(rng.randrange(16) for _ in range(4 * 4))),
        # full-canvas with transparency over the post-disposal state
        dict(left=0, top=0, w=sw, h=sh, disposal=0, trans_idx=0,
             indices=bytes(rng.randrange(16) for _ in range(sw * sh))),
    ]
    payload = _encode_anim(sw, sh, gct, bg_index=9, frames=frames)
    gw, gh, got = compose_gif_frames(payload)
    want = _reference_compose(sw, sh, gct, bg_index=9, frames=frames)
    assert (gw, gh, len(got)) == (sw, sh, len(frames))
    for t, (g, w_) in enumerate(zip(got, want)):
        assert g == w_, f"frame {t} composite mismatch"


def test_registry_routes_gif_decoder():
    pal = _palette(4, seed=21)
    idx = bytes([2] * 24)
    payload = _encode_gif(6, 4, pal, idx)
    assert multimodal.sniff_format(payload) == "gif"
    w, h, ch, px = multimodal.decode_image(payload)
    assert (w, h, ch) == (6, 4, 3)
    assert px == _expected_rgb(pal, idx)
