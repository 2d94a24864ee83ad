"""Stdlib-only GIF (87a/89a) decoder for the codec seam.

Closes the third common web-image format after PNG (operators/
multimodal.py::decode_png_pixels) and JPEG (operators/jpegcodec.py):
GIF's only compression is LZW with variable-width codes, which needs
no external library — so like the other two, the decode is REAL and
registered in the same ``register_decoder`` seam the multimodal
operators use (reference stores payloads opaque and defers decode
downstream, data-extract.py:10-46).

Spec coverage (from the public GIF87a/89a specification):
  header + logical screen descriptor -> global color table
  -> block stream: extensions (Graphic Control / Comment / Plain
     Text / Application — length-prefixed sub-blocks, skipped),
     image descriptors (local color table override, INTERLACED
     four-pass row order), trailer
  -> LZW: LSB-first bit packing (opposite of JPEG's MSB-first),
     initial width = min_code_size+1, Clear/EOI codes, dictionary
     growth with width bumps at 2^w, max 12-bit codes, the deferred
     clear convention, and the KwKwK first-char edge case
  -> palette indexing -> interleaved RGB bytes.

The still-image contract (decode_gif_pixels) decodes the FIRST image
frame; animated clips go through either gif_image_blocks (temporal
sampling — skipped frames cost zero LZW work) or compose_gif_frames
(full renderer semantics: partial-canvas frames composited onto the
logical-screen canvas with GCE transparency and disposal methods
0/1 leave, 2 restore-background, 3 restore-previous).
"""

from __future__ import annotations


class GifError(ValueError):
    """Malformed or unsupported GIF payload."""


def _u16(b: bytes, p: int) -> int:
    return b[p] | (b[p + 1] << 8)


def _skip_subblocks(b: bytes, p: int) -> int:
    """Advance past a length-prefixed sub-block chain + terminator."""
    while True:
        if p >= len(b):
            raise GifError("truncated sub-block chain")
        n = b[p]
        p += 1 + n
        if n == 0:
            return p


def _collect_subblocks(b: bytes, p: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if p >= len(b):
            raise GifError("truncated image data")
        n = b[p]
        p += 1
        if n == 0:
            return bytes(out), p
        out += b[p : p + n]
        p += n


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """Variable-width LSB-first LZW per the GIF spec, with dictionary
    growth, width bumps at 2^w, 12-bit cap + deferred clear, and the
    KwKwK (code == next dictionary slot) case."""
    if not 2 <= min_code_size <= 11:
        raise GifError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh():
        return {i: bytes([i]) for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise GifError("truncated LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise GifError("first code after clear not a literal")
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]  # KwKwK
            else:
                raise GifError("LZW code out of range")
            if next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
        out += entry
        prev = entry
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise GifError(
            f"LZW stream ended at {len(out)} of {n_pixels} pixels"
        )
    return out[:n_pixels]


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def parse_gif(payload: bytes) -> tuple[int, int, int, bytes | None, list[dict]]:
    """Walk the block stream and return
    ``(screen_w, screen_h, bg_index, gct, blocks)`` WITHOUT decoding
    any LZW data. Each block dict carries
    {left, top, w, h, interlaced, palette, min_code, data, disposal,
    trans_idx}: the last two come from the Graphic Control Extension
    preceding the image block (89a §23 — a GCE governs exactly the
    next renderable block), defaulting to disposal 0 / no transparency
    when absent. Container parse only — the entry point that lets a
    temporal frame sampler skip unsampled frames' decompression
    entirely (each GIF frame's LZW stream is self-contained)."""
    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("missing GIF87a/89a signature")
    if len(b) < 13:
        raise GifError("truncated logical screen descriptor")
    screen_w, screen_h = _u16(b, 6), _u16(b, 8)
    packed = b[10]
    bg_index = b[11]
    p = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = b[p : p + 3 * n]
        if len(gct) < 3 * n:
            raise GifError("truncated global color table")
        p += 3 * n

    blocks: list[dict] = []
    disposal = 0
    trans_idx: int | None = None
    while True:
        if p >= len(b):
            raise GifError("missing trailer")
        block = b[p]
        p += 1
        if block == 0x3B:  # trailer
            if not blocks:
                raise GifError("no image data before trailer")
            return screen_w, screen_h, bg_index, gct, blocks
        if block == 0x21:  # extension: label + sub-blocks
            if p >= len(b):
                raise GifError("truncated extension")
            if b[p] == 0xF9 and p + 5 < len(b) and b[p + 1] == 4:
                gpacked = b[p + 2]
                disposal = (gpacked >> 2) & 0x07
                trans_idx = b[p + 5] if gpacked & 0x01 else None
            p = _skip_subblocks(b, p + 1)
            continue
        if block != 0x2C:
            raise GifError(f"unknown block introducer {block:#x}")
        left, top = _u16(b, p), _u16(b, p + 2)
        w, h = _u16(b, p + 4), _u16(b, p + 6)
        ipacked = b[p + 8]
        p += 9
        palette = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            palette = b[p : p + 3 * n]
            if len(palette) < 3 * n:
                raise GifError("truncated local color table")
            p += 3 * n
        if palette is None:
            raise GifError("image has neither local nor global palette")
        if w == 0 or h == 0:
            raise GifError("zero-dimension image")
        min_code = b[p]
        p += 1
        data, p = _collect_subblocks(b, p)
        blocks.append(
            {
                "left": left,
                "top": top,
                "w": w,
                "h": h,
                "interlaced": bool(ipacked & 0x40),
                "palette": palette,
                "min_code": min_code,
                "data": data,
                "disposal": disposal,
                "trans_idx": trans_idx,
            }
        )
        disposal = 0
        trans_idx = None


def gif_image_blocks(payload: bytes) -> list[dict]:
    """Image blocks only (see parse_gif) — the temporal-sampling
    entry point that skips unsampled frames' decompression."""
    return parse_gif(payload)[4]


def _decode_block_indices(blk: dict) -> bytearray:
    """LZW-decode one image block to its w*h palette INDICES (the
    pre-palettization form compositing needs for transparency)."""
    w, h = blk["w"], blk["h"]
    idx = _lzw_decode(blk["data"], blk["min_code"], w * h)
    if blk["interlaced"]:  # 4-pass row order
        rows = bytearray(w * h)
        src = 0
        for start, step in _INTERLACE_PASSES:
            for y in range(start, h, step):
                rows[y * w : (y + 1) * w] = idx[src : src + w]
                src += w
        idx = rows
    return idx


def decode_gif_block(blk: dict) -> tuple[int, int, int, bytes]:
    """LZW-decode one image block to (w, h, 3, rgb bytes)."""
    w, h = blk["w"], blk["h"]
    idx = _decode_block_indices(blk)
    palette = blk["palette"]
    npal = len(palette) // 3
    rgb = bytearray(w * h * 3)
    for i, ci in enumerate(idx):
        if ci >= npal:
            raise GifError(f"palette index {ci} out of range")
        rgb[3 * i : 3 * i + 3] = palette[3 * ci : 3 * ci + 3]
    return w, h, 3, bytes(rgb)


def decode_gif_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode the first frame of a GIF to (width, height, 3, rgb
    bytes) — the still-image contract the pixel operators use.
    Raises GifError on malformed input."""
    return decode_gif_block(gif_image_blocks(payload)[0])


def compose_gif_frames(payload: bytes) -> tuple[int, int, list[bytes]]:
    """(screen_w, screen_h, [canvas rgb bytes after each frame]):
    REAL animated-GIF compositing, closing the round-6/7 gate —
    partial-canvas frames (left/top offsets, sub-region w/h) are
    drawn onto the logical-screen canvas honoring the Graphic
    Control Extension's transparency index (transparent pixels leave
    the underlying canvas visible) and disposal method between
    frames: 0/1 leave the canvas, 2 restores the frame's rect to the
    BACKGROUND color (logical screen descriptor's bg index into the
    global color table — the deterministic spec reading; browsers
    that composite onto a transparent page use clear instead), 3
    restores the canvas as it was BEFORE the frame (89a §23). The
    emitted frame list is the canvas AFTER each frame draws — what a
    renderer displays. Frames are clipped to the canvas (malformed
    oversize rects draw their visible part, the tolerant-renderer
    convention). numpy throughout: palette gather + transparency
    mask are vectorized, no per-pixel Python in the composite."""
    import numpy as np

    screen_w, screen_h, bg_index, gct, blocks = parse_gif(payload)
    if gct is not None and 3 * bg_index + 3 <= len(gct):
        bg_rgb = np.frombuffer(
            gct[3 * bg_index : 3 * bg_index + 3], dtype=np.uint8
        ).copy()
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(bg_rgb, (screen_h, screen_w, 3)).copy()
    frames: list[bytes] = []
    for blk in blocks:
        bw, bh = blk["w"], blk["h"]
        left, top = blk["left"], blk["top"]
        idx = np.frombuffer(
            bytes(_decode_block_indices(blk)), dtype=np.uint8
        ).reshape(bh, bw)
        pal = np.frombuffer(blk["palette"], dtype=np.uint8).reshape(-1, 3)
        if int(idx.max(initial=0)) >= len(pal):
            raise GifError("palette index out of range")
        # clip the frame rect to the canvas
        vw = min(bw, screen_w - left)
        vh = min(bh, screen_h - top)
        if vw <= 0 or vh <= 0:
            frames.append(canvas.tobytes())
            continue
        vis = idx[:vh, :vw]
        region = canvas[top : top + vh, left : left + vw]
        snapshot = region.copy() if blk["disposal"] == 3 else None
        rgb = pal[vis]  # (vh, vw, 3) gather
        t = blk["trans_idx"]
        if t is not None:
            mask = vis != t
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        frames.append(canvas.tobytes())
        if blk["disposal"] == 2:
            region[:, :] = bg_rgb
        elif blk["disposal"] == 3:
            region[:, :] = snapshot
    return screen_w, screen_h, frames


def decode_gif_frames(payload: bytes) -> tuple[int, int, list[bytes]]:
    """(width, height, [frame rgb bytes]): decode every frame of an
    animated GIF with full disposal/transparency compositing — each
    returned frame is the rendered logical-screen canvas. (Until
    round 7 partial-canvas frames raised NotImplementedError; the
    compositor above retires that gate.)"""
    return compose_gif_frames(payload)
