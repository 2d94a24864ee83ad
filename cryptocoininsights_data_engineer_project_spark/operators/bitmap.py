"""Stdlib-only BMP and TIFF decoders for the codec seam.

Rounds out the raster-format matrix after PNG (operators/
multimodal.py), JPEG baseline/progressive/lossless (operators/
jpegcodec.py), and GIF (operators/gifcodec.py): BMP is the
uncompressed-or-RLE Windows format scraped corpora are full of, and
TIFF is the scanned-document/archival container (multi-strip, both
byte orders). Like the other decoders here, everything is from the
public specs (Windows BITMAPINFOHEADER layout; TIFF 6.0), needs no
codec library, and registers in the same ``register_decoder`` seam
the multimodal operators use (reference stores payloads opaque,
data-extract.py:10-46).

Coverage:
  BMP: BITMAPFILEHEADER + BITMAPINFOHEADER; 24/32-bit BI_RGB
    (BGR(A) rows, 4-byte padded), 8-bit palettized BI_RGB, and
    8-bit BI_RLE8 (run pairs, absolute mode with word padding, EOL /
    EOB / delta escapes); bottom-up AND top-down row order.
  TIFF: II/MM byte orders, IFD walk, multi-strip assembly
    (RowsPerStrip), photometric 0/1 (grey, WhiteIsZero inverted),
    2 (RGB), 3 (palette via 16-bit ColorMap, high-byte chop),
    compression 1 (none) and 32773 (PackBits).

Both emit (width, height, channels, rgb-or-grey bytes) in row-major
top-down order — the shared pixel contract every downstream operator
uses.
"""

from __future__ import annotations

import struct


class BmpError(ValueError):
    """Malformed or unsupported BMP payload."""


class TiffError(ValueError):
    """Malformed or unsupported TIFF payload."""


def _rle8_decode(
    data: bytes, w: int, h: int, into: bytearray | None = None
) -> bytearray:
    """BI_RLE8 per the Windows spec: (count, index) run pairs;
    count 0 escapes to EOL (00), EOB (01), delta (02 dx dy), or
    absolute mode (n literal indices padded to a 16-bit boundary).
    Rows are stored bottom-up like uncompressed BMP; the caller
    flips.

    ``into`` is the INITIAL canvas the stream paints over: for still
    BMPs it is None and skipped cells keep index 0 (the common
    renderer convention); for MS-RLE video frames it is the previous
    frame's canvas — delta/EOL/EOB skips RETAIN prior pixels, which
    is exactly the codec's temporal prediction (the skip IS the
    inter-frame reference)."""
    out = bytearray(w * h) if into is None else into
    x = y = 0
    pos = 0
    while True:
        if pos >= len(data):
            raise BmpError("RLE8 stream ended without EOB")
        n = data[pos]
        if pos + 1 >= len(data):
            raise BmpError("truncated RLE8 pair")
        v = data[pos + 1]
        pos += 2
        if n:  # encoded run
            if y >= h or x + n > w:
                raise BmpError("RLE8 run overflows row")
            out[y * w + x : y * w + x + n] = bytes([v]) * n
            x += n
            continue
        if v == 0:  # end of line
            x, y = 0, y + 1
            continue
        if v == 1:  # end of bitmap
            return out
        if v == 2:  # delta
            if pos + 2 > len(data):
                raise BmpError("truncated RLE8 delta")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
            if x > w or y > h:
                raise BmpError("RLE8 delta out of bounds")
            continue
        # absolute mode: v literal indices, padded to even byte count
        if y >= h or x + v > w:
            raise BmpError("RLE8 absolute run overflows row")
        if pos + v > len(data):
            raise BmpError("truncated RLE8 absolute run")
        out[y * w + x : y * w + x + v] = data[pos : pos + v]
        x += v
        pos += v + (v & 1)
    raise BmpError("RLE8 stream ended without EOB")


def decode_bmp_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a BMP to (width, height, channels, pixels): 24/32-bit
    BI_RGB and 8-bit BI_RGB/BI_RLE8 palettized, bottom-up (positive
    height) or top-down (negative). 32-bit alpha is dropped (the
    pixel contract is grey/RGB); palette output is RGB."""
    b = bytes(payload)
    if b[:2] != b"BM" or len(b) < 54:
        raise BmpError("not a BMP payload")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise BmpError(f"DIB header {hdr_size} bytes: BITMAPINFOHEADER+ only")
    w, h_raw = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    clr_used = struct.unpack_from("<I", b, 46)[0]
    if planes != 1 or w <= 0 or h_raw == 0:
        raise BmpError("bad BMP plane/dimension fields")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw

    if bpp == 8:
        npal = clr_used or 256
        pal_off = 14 + hdr_size
        pal = b[pal_off : pal_off + 4 * npal]
        if len(pal) < 4 * npal:
            raise BmpError("truncated BMP palette")
        if compression == 1:  # BI_RLE8
            if top_down:
                raise BmpError("RLE8 with top-down rows is invalid")
            idx = _rle8_decode(b[data_off:], w, h)
        elif compression == 0:
            stride = (w + 3) & ~3
            need = stride * h
            raw = b[data_off : data_off + need]
            if len(raw) < need:
                raise BmpError("truncated BMP pixel data")
            idx = bytearray(w * h)
            for y in range(h):
                idx[y * w : (y + 1) * w] = raw[y * stride : y * stride + w]
        else:
            raise BmpError(f"BMP compression {compression} on 8-bit")
        rgb = bytearray(w * h * 3)
        for y in range(h):
            sy = y if top_down else h - 1 - y
            for x in range(w):
                ci = idx[sy * w + x]
                if ci >= npal:
                    raise BmpError(f"palette index {ci} out of range")
                bgr = pal[4 * ci : 4 * ci + 3]
                o = 3 * (y * w + x)
                rgb[o], rgb[o + 1], rgb[o + 2] = bgr[2], bgr[1], bgr[0]
        return w, h, 3, bytes(rgb)

    if bpp in (24, 32):
        if compression != 0:
            raise BmpError(f"BMP compression {compression} on {bpp}-bit")
        src_px = bpp // 8
        stride = (w * src_px + 3) & ~3
        need = stride * h
        raw = b[data_off : data_off + need]
        if len(raw) < need:
            raise BmpError("truncated BMP pixel data")
        rgb = bytearray(w * h * 3)
        for y in range(h):
            sy = y if top_down else h - 1 - y
            row = raw[sy * stride : sy * stride + w * src_px]
            for x in range(w):
                o = 3 * (y * w + x)
                s = x * src_px
                rgb[o], rgb[o + 1], rgb[o + 2] = (
                    row[s + 2],
                    row[s + 1],
                    row[s],
                )
        return w, h, 3, bytes(rgb)

    raise BmpError(f"BMP bit depth {bpp}: 8/24/32 only")


# ------------------------------------------------------------------ tiff


def packbits_decode(data: bytes, expect: int) -> bytes:
    """TIFF 6.0 PackBits: header n in [0,127] copies n+1 literal
    bytes; n in [129,255] (two's-complement -127..-1) repeats the
    next byte 257-n times; 128 is a no-op. Decodes exactly
    ``expect`` bytes or raises."""
    out = bytearray()
    pos = 0
    while len(out) < expect:
        if pos >= len(data):
            raise TiffError("truncated PackBits stream")
        n = data[pos]
        pos += 1
        if n == 128:
            continue
        if n < 128:
            if pos + n + 1 > len(data):
                raise TiffError("truncated PackBits literal run")
            out += data[pos : pos + n + 1]
            pos += n + 1
        else:
            if pos >= len(data):
                raise TiffError("truncated PackBits repeat run")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
    if len(out) != expect:
        raise TiffError(
            f"PackBits run crosses expected boundary ({len(out)} != {expect})"
        )
    return bytes(out)


def _tiff_ifd(b: bytes, e: str) -> dict[int, list[int]]:
    """First IFD as {tag: [values...]} with offsets resolved; value
    types 1 (byte), 3 (short), 4 (long) cover the baseline tags."""
    off = struct.unpack(f"{e}I", b[4:8])[0]
    if off + 2 > len(b):
        raise TiffError("IFD offset out of range")
    n = struct.unpack(f"{e}H", b[off : off + 2])[0]
    sizes = {1: 1, 3: 2, 4: 4}
    fmts = {1: "B", 3: "H", 4: "I"}
    tags: dict[int, list[int]] = {}
    for i in range(n):
        ent = b[off + 2 + 12 * i : off + 2 + 12 * (i + 1)]
        tag, typ = struct.unpack(f"{e}HH", ent[:4])
        count = struct.unpack(f"{e}I", ent[4:8])[0]
        if typ not in sizes:
            continue  # rational/ascii tags are irrelevant to decode
        total = sizes[typ] * count
        raw = (
            ent[8 : 8 + total]
            if total <= 4
            else b[
                struct.unpack(f"{e}I", ent[8:12])[0] :
            ][:total]
        )
        if len(raw) < total:
            raise TiffError(f"truncated values for tag {tag}")
        tags[tag] = list(
            struct.unpack(f"{e}{count}{fmts[typ]}", raw)
        )
    return tags


def decode_tiff_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline TIFF to (width, height, channels, pixels):
    II/MM byte orders, multi-strip assembly, photometric 0 (grey
    inverted), 1 (grey), 2 (RGB), 3 (palette via the 16-bit ColorMap,
    chopped to its high byte), compression 1 (none) or 32773
    (PackBits), 8 bits per sample."""
    b = bytes(payload)
    e = None
    if b[:4] == b"II*\x00":
        e = "<"
    elif b[:4] == b"MM\x00*":
        e = ">"
    if e is None:
        raise TiffError("not a TIFF payload")
    tags = _tiff_ifd(b, e)

    def one(tag: int, default=None) -> int:
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise TiffError(f"missing required TIFF tag {tag}")
            return default
        return v[0]

    w = one(256)
    h = one(257)
    compression = one(259, 1)
    photometric = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [8])
    if any(x != 8 for x in bits):
        raise TiffError(f"bits per sample {bits}: 8-bit only")
    if compression not in (1, 32773):
        raise TiffError(
            f"TIFF compression {compression}: none/PackBits only"
        )
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffError("missing or mismatched strip tables")
    rps = one(278, h)
    raw = bytearray()
    for si, (so, sc) in enumerate(zip(offsets, counts)):
        strip = b[so : so + sc]
        if len(strip) < sc:
            raise TiffError(f"truncated strip {si}")
        rows = min(rps, h - si * rps)
        if rows <= 0:
            raise TiffError("more strips than image rows")
        expect = rows * w * spp
        raw += (
            packbits_decode(strip, expect)
            if compression == 32773
            else strip[:expect]
        )
    if len(raw) < h * w * spp:
        raise TiffError("assembled strips shorter than the image")

    if photometric in (0, 1):
        if spp != 1:
            raise TiffError("grey TIFF with multiple samples")
        px = bytes(raw[: w * h])
        if photometric == 0:  # WhiteIsZero
            px = bytes(255 - v for v in px)
        return w, h, 1, px
    if photometric == 2:
        if spp != 3:
            raise TiffError(f"RGB TIFF with {spp} samples per pixel")
        return w, h, 3, bytes(raw[: w * h * 3])
    if photometric == 3:
        cmap = tags.get(320)
        if not cmap or len(cmap) < 3 * 256:
            raise TiffError("palette TIFF missing a full ColorMap")
        rgb = bytearray(w * h * 3)
        for i in range(w * h):
            ci = raw[i]
            # ColorMap is three 256-entry 16-bit planes; chop high byte
            rgb[3 * i] = cmap[ci] >> 8
            rgb[3 * i + 1] = cmap[256 + ci] >> 8
            rgb[3 * i + 2] = cmap[512 + ci] >> 8
        return w, h, 3, bytes(rgb)
    raise TiffError(f"TIFF photometric {photometric}: 0/1/2/3 only")
