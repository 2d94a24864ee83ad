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

Only the FIRST image frame is decoded (the still-image contract the
pixel operators use); animation = repeated image blocks, and a frame
sampler would walk them exactly like the MJPEG AVI chunk walker.
Transparency (GCE bit) is palette metadata, not pixel data — emitted
pixels are the palette RGB, matching every mainstream still decode.
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


def gif_image_blocks(payload: bytes) -> list[dict]:
    """Walk the block stream and return every image block's parsed
    pieces WITHOUT decoding any LZW data:
    [{left, top, w, h, interlaced, palette, min_code, data}, ...].
    Container parse only — the entry point that lets a temporal frame
    sampler skip unsampled frames' decompression entirely (each GIF
    frame's LZW stream is self-contained)."""
    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("missing GIF87a/89a signature")
    if len(b) < 13:
        raise GifError("truncated logical screen descriptor")
    packed = b[10]
    p = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = b[p : p + 3 * n]
        if len(gct) < 3 * n:
            raise GifError("truncated global color table")
        p += 3 * n

    blocks: list[dict] = []
    while True:
        if p >= len(b):
            raise GifError("missing trailer")
        block = b[p]
        p += 1
        if block == 0x3B:  # trailer
            if not blocks:
                raise GifError("no image data before trailer")
            return blocks
        if block == 0x21:  # extension: label + sub-blocks
            if p >= len(b):
                raise GifError("truncated extension")
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
            }
        )


def decode_gif_block(blk: dict) -> tuple[int, int, int, bytes]:
    """LZW-decode one image block to (w, h, 3, rgb bytes)."""
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


def decode_gif_frames(payload: bytes) -> tuple[int, int, list[bytes]]:
    """(width, height, [frame rgb bytes]): decode every frame of an
    animated GIF. Full-canvas frames only — frames that cover a
    sub-region (left/top offsets, smaller w/h) require disposal-method
    compositing against prior frames and raise NotImplementedError
    (the documented gate; a real cluster registers a PIL-backed
    callable through the same seam)."""
    blocks = gif_image_blocks(payload)
    w, h = blocks[0]["w"], blocks[0]["h"]
    frames = []
    for blk in blocks:
        if blk["left"] or blk["top"] or blk["w"] != w or blk["h"] != h:
            raise NotImplementedError(
                "partial-canvas animation frame: disposal compositing "
                "not implemented (full-canvas frames only)"
            )
        frames.append(decode_gif_block(blk)[3])
    return w, h, frames
