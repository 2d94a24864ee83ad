"""BMP/TIFF decoders (operators/bitmap.py) against INDEPENDENT
in-test encoders written from the public specs (Windows BMP layout;
TIFF 6.0), the same independence discipline as the PNG/JPEG/GIF
tests: expected pixels come from the source arrays directly, never
from the decoder."""

from __future__ import annotations

import random
import struct

import pytest

from cryptocoininsights_data_engineer_project_spark.operators.bitmap import (
    BmpError,
    TiffError,
    decode_bmp_pixels,
    decode_tiff_pixels,
    packbits_decode,
)

# ------------------------------------------------------------ bmp encoder


def _encode_bmp(
    w: int,
    h: int,
    pixels,  # fn(x, y) -> (r, g, b) for 24/32; palette index for 8
    bpp: int = 24,
    top_down: bool = False,
    palette: list[tuple[int, int, int]] | None = None,
    rle_stream: bytes | None = None,
) -> bytes:
    npal = len(palette) if palette else 0
    data_off = 14 + 40 + 4 * npal
    body = bytearray()
    if rle_stream is not None:
        body += rle_stream
        compression = 1
    else:
        compression = 0
        src = bpp // 8
        stride = (w * src + 3) & ~3
        rows = range(h) if top_down else range(h - 1, -1, -1)
        for y in rows:
            row = bytearray()
            for x in range(w):
                if bpp == 8:
                    row.append(pixels(x, y))
                else:
                    r, g, b = pixels(x, y)
                    row += bytes([b, g, r] + ([0xAA] if bpp == 32 else []))
            row += bytes(stride - len(row))
            body += row
    hdr = b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
    dib = struct.pack(
        "<IiiHHIIiiII",
        40, w, -h if top_down else h, 1, bpp, compression,
        len(body), 0, 0, npal, 0,
    )
    pal = bytearray()
    for r, g, b in palette or []:
        pal += bytes([b, g, r, 0])
    return bytes(hdr + dib + pal + body)


def test_bmp_24_and_32_bit_both_row_orders():
    rng = random.Random(2)
    w, h = 5, 4
    px = [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
           for _ in range(w)] for _ in range(h)]
    want = bytes(c for row in px for p in row for c in p)
    for bpp in (24, 32):
        for td in (False, True):
            payload = _encode_bmp(
                w, h, lambda x, y: px[y][x], bpp=bpp, top_down=td
            )
            gw, gh, ch, out = decode_bmp_pixels(payload)
            assert (gw, gh, ch) == (w, h, 3)
            assert out == want, (bpp, td)


def test_bmp_8bit_palette_uncompressed():
    rng = random.Random(3)
    w, h = 7, 3  # odd width exercises the 4-byte row pad
    pal = [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
           for _ in range(16)]
    idx = [[rng.randrange(16) for _ in range(w)] for _ in range(h)]
    payload = _encode_bmp(w, h, lambda x, y: idx[y][x], bpp=8, palette=pal)
    gw, gh, ch, out = decode_bmp_pixels(payload)
    assert (gw, gh, ch) == (w, h, 3)
    want = bytes(c for row in idx for i in row for c in pal[i])
    assert out == want


def test_bmp_rle8_delta_and_absolute_mode():
    """Hand-built RLE8 stream: encoded runs, an absolute-mode run
    with odd length (word pad), a delta escape (skipped cells keep
    index 0), EOL, EOB — against a hand-derived expected grid."""
    w, h = 8, 3
    pal = [(10 * j, 20 * j % 256, 5 * j) for j in range(8)]
    stream = bytes(
        [
            3, 4,             # run: 3 cells of index 4  (row 0, x 0-2)
            0, 3, 1, 2, 3, 0,  # absolute: 3 literals + word pad (x 3-5)
            0, 2, 2, 1,       # delta: 2 right, 1 down -> (8, 1)
            0, 0,          # EOL -> row 2, x 0
            2, 7,          # run: 2 cells of index 7
            0, 1,          # EOB
        ]
    )
    # build expected stored grid (bottom-up rows)
    grid = [[0] * w for _ in range(h)]
    grid[0][0:3] = [4, 4, 4]
    grid[0][3:6] = [1, 2, 3]
    grid[2][0:2] = [7, 7]
    payload = _encode_bmp(
        w, h, None, bpp=8, palette=pal, rle_stream=stream
    )
    gw, gh, ch, out = decode_bmp_pixels(payload)
    assert (gw, gh, ch) == (w, h, 3)
    want = bytearray()
    for y in range(h):  # output top-down = stored row h-1-y
        for x in range(w):
            want += bytes(pal[grid[h - 1 - y][x]])
    assert out == bytes(want)


def test_bmp_gates():
    with pytest.raises(BmpError, match="not a BMP"):
        decode_bmp_pixels(b"PX" + bytes(60))
    ok = _encode_bmp(4, 2, lambda x, y: (1, 2, 3))
    with pytest.raises(BmpError, match="truncated"):
        decode_bmp_pixels(ok[:-5])
    bad_depth = bytearray(ok)
    bad_depth[28] = 16
    with pytest.raises(BmpError, match="bit depth"):
        decode_bmp_pixels(bytes(bad_depth))


# ----------------------------------------------------------- tiff encoder


def _packbits_encode(row: bytes) -> bytes:
    """Greedy PackBits: emit repeat runs for >=2 equal bytes, else
    literal runs — independent of the decoder."""
    out = bytearray()
    i = 0
    while i < len(row):
        run = 1
        while i + run < len(row) and row[i + run] == row[i] and run < 128:
            run += 1
        if run >= 2:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit = i
        while (
            i < len(row)
            and (i + 1 >= len(row) or row[i + 1] != row[i])
            and i - lit < 128
        ):
            i += 1
        out += bytes([i - lit - 1]) + row[lit:i]
    return bytes(out)


def _encode_tiff(
    w: int,
    h: int,
    photometric: int,
    samples,  # bytes, w*h*spp row-major
    spp: int = 1,
    big_endian: bool = False,
    packbits: bool = False,
    rows_per_strip: int | None = None,
    colormap: list[int] | None = None,  # 3*256 16-bit values
) -> bytes:
    e = ">" if big_endian else "<"
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        rows = min(rps, h - y0)
        chunk = samples[y0 * w * spp : (y0 + rows) * w * spp]
        strips.append(_packbits_encode(chunk) if packbits else chunk)
    head_len = 8
    offsets = []
    pos = head_len
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    ifd_off = pos
    entries = []

    def entry(tag, typ, count, value):
        raw = struct.pack(f"{e}HHI", tag, typ, count)
        if typ == 3 and count == 1:
            pad = struct.pack(f"{e}HH", value, 0)
            return raw + pad
        return raw + struct.pack(f"{e}I", value)

    n_strips = len(strips)
    arrays = bytearray()
    extra_off = 0  # filled after count known

    def arr_entry(tag, values):
        nonlocal arrays
        if len(values) == 1:
            return entry(tag, 4, 1, values[0])
        at = len(arrays)
        arrays += struct.pack(f"{e}{len(values)}I", *values)
        return ("ARR", tag, at, len(values))

    entries.append(entry(256, 3, 1, w))
    entries.append(entry(257, 3, 1, h))
    entries.append(entry(258, 3, 1, 8))
    entries.append(entry(259, 3, 1, 32773 if packbits else 1))
    entries.append(entry(262, 3, 1, photometric))
    entries.append(arr_entry(273, offsets))
    entries.append(entry(277, 3, 1, spp))
    entries.append(entry(278, 3, 1, rps))
    entries.append(arr_entry(279, [len(s) for s in strips]))
    if colormap is not None:
        at = len(arrays)
        arrays += struct.pack(f"{e}{len(colormap)}H", *colormap)
        entries.append(("CMAP", 320, at, len(colormap)))
    n = len(entries)
    arrays_base = ifd_off + 2 + 12 * n + 4
    fixed = []
    for en in entries:
        if isinstance(en, tuple):
            kind, tag, at, count = en
            typ = 3 if kind == "CMAP" else 4
            fixed.append(
                struct.pack(f"{e}HHI", tag, typ, count)
                + struct.pack(f"{e}I", arrays_base + at)
            )
        else:
            fixed.append(en)
    out = bytearray()
    out += (b"MM\x00*" if big_endian else b"II*\x00")
    out += struct.pack(f"{e}I", ifd_off)
    for s in strips:
        out += s
    out += struct.pack(f"{e}H", n)
    for f in fixed:
        out += f
    out += struct.pack(f"{e}I", 0)
    out += arrays
    return bytes(out)


def test_tiff_grey_both_endians_and_packbits():
    rng = random.Random(5)
    w, h = 9, 5
    body = bytes(rng.randrange(256) for _ in range(w * h))
    for be in (False, True):
        for pb in (False, True):
            payload = _encode_tiff(
                w, h, 1, body, big_endian=be, packbits=pb,
                rows_per_strip=2,
            )
            gw, gh, ch, out = decode_tiff_pixels(payload)
            assert (gw, gh, ch) == (w, h, 1)
            assert out == body, (be, pb)


def test_tiff_white_is_zero_inverts():
    w, h = 4, 2
    body = bytes(range(8))
    payload = _encode_tiff(w, h, 0, body)
    _, _, _, out = decode_tiff_pixels(payload)
    assert out == bytes(255 - v for v in body)


def test_tiff_rgb_and_palette_colormap_chop():
    rng = random.Random(7)
    w, h = 5, 3
    rgbs = bytes(rng.randrange(256) for _ in range(w * h * 3))
    payload = _encode_tiff(w, h, 2, rgbs, spp=3, packbits=True)
    gw, gh, ch, out = decode_tiff_pixels(payload)
    assert (gw, gh, ch, out) == (w, h, 3, rgbs)
    cmap = [rng.randrange(1 << 16) for _ in range(3 * 256)]
    idx = bytes(rng.randrange(256) for _ in range(w * h))
    payload = _encode_tiff(w, h, 3, idx, colormap=cmap)
    gw, gh, ch, out = decode_tiff_pixels(payload)
    assert (gw, gh, ch) == (w, h, 3)
    want = bytearray()
    for i in idx:
        want += bytes(
            [cmap[i] >> 8, cmap[256 + i] >> 8, cmap[512 + i] >> 8]
        )
    assert out == bytes(want)


def test_packbits_edge_cases():
    # 128 is a no-op header; repeat + literal mixes reconstruct
    assert packbits_decode(bytes([128, 0, 7]), 1) == b"\x07"
    assert packbits_decode(bytes([254, 9, 1, 5, 6]), 5) == bytes(
        [9, 9, 9, 5, 6]
    )
    with pytest.raises(TiffError, match="truncated"):
        packbits_decode(bytes([3, 1, 2]), 4)
    with pytest.raises(TiffError, match="boundary"):
        packbits_decode(bytes([253, 1]), 3)  # run of 4 past expect=3


def test_tiff_gates():
    with pytest.raises(TiffError, match="not a TIFF"):
        decode_tiff_pixels(b"IIII" + bytes(20))
    ok = _encode_tiff(3, 2, 1, bytes(6))
    broken = bytearray(ok)
    broken[4:8] = struct.pack("<I", len(ok) + 50)  # IFD out of range
    with pytest.raises(TiffError, match="IFD offset"):
        decode_tiff_pixels(bytes(broken))


def test_registry_routes_bmp_and_tiff(spark):
    """The sniff registry dispatches BM / II* / MM* payloads to the
    new decoders end-to-end through decode_image_stats."""
    from pyspark.sql import functions as F

    from cryptocoininsights_data_engineer_project_spark.operators import (
        multimodal,
    )

    docs = (
        spark.range(1, 4)
        .withColumnRenamed("id", "doc_id")
        .withColumn("text", F.lit("x"))
    )
    rows = multimodal.decode_image_stats(
        multimodal.synth_bmp_assets(docs)
    ).collect()
    assert len(rows) == 3 and all(r["channels"] == 3 for r in rows)
    rows = multimodal.decode_image_stats(
        multimodal.synth_tiff_assets(docs)
    ).collect()
    assert len(rows) == 3 and all(r["channels"] == 1 for r in rows)
