"""Multimodal plumbing: schema contract, Arrow batch shapes, magic
sniffing — the parts that survive a real-decoder swap."""

from __future__ import annotations

import pytest

from cryptocoininsights_data_engineer_project_spark.catalog import table
from cryptocoininsights_data_engineer_project_spark.operators import multimodal


def test_binarize_schema(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(20)
    assets = multimodal.binarize_text(docs)
    assert [f.name for f in assets.schema.fields] == [
        "asset_id",
        "payload",
        "media_type",
        "n_bytes",
        "content_md5",
    ]
    assert dict(assets.dtypes)["payload"] == "binary"
    r = assets.first()
    assert r["n_bytes"] == len(r["payload"])


def test_extract_features_batch_shape(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(50)
    out = multimodal.extract_features(multimodal.binarize_text(docs))
    rows = out.collect()
    assert len(rows) == 50
    for r in rows[:5]:
        assert len(r["features"]) == multimodal.FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r["features"])
    # deterministic: same payload → same features
    again = multimodal.extract_features(multimodal.binarize_text(docs)).collect()
    assert {r["asset_id"]: r["features"] for r in rows} == {
        r["asset_id"]: r["features"] for r in again
    }


def test_sniff_media_type(spark):
    rows = [
        (1, bytes.fromhex("89504e470d0a1a0a") + b"xxxx"),
        (2, bytes.fromhex("ffd8ffe0") + b"jfif"),
        (3, b"plain text bytes"),
    ]
    df = spark.createDataFrame(rows, "asset_id: long, payload: binary")
    got = {
        r["asset_id"]: r["sniffed_type"]
        for r in multimodal.sniff_media_type(df).collect()
    }
    assert got == {
        1: "image/png",
        2: "image/jpeg",
        3: "application/octet-stream",
    }


def test_decode_hook_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def _png(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00"
        + b"\x00\x00\x00\x00"
    )


def _wav(channels: int, rate: int) -> bytes:
    return (
        b"RIFF"
        + (36).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
    )


def test_parse_media_header_crafted_bytes():
    """The pure-Python header parser decodes real PNG/WAV layouts,
    including multi-byte big/little-endian fields and truncation."""
    assert multimodal.parse_media_header(_png(1920, 1080)) == {
        "media_type": "image/png",
        "width": 1920,
        "height": 1080,
    }
    assert multimodal.parse_media_header(_wav(2, 44100)) == {
        "media_type": "audio/wav",
        "channels": 2,
        "sample_rate": 44100,
    }
    assert multimodal.parse_media_header(b"just text") == {}
    assert multimodal.parse_media_header(b"\x89PNG\r\n\x1a\n trunc") == {}
    assert multimodal.parse_media_header(None) == {}


def test_decode_meta_jvm_matches_python_parser(spark):
    """The JVM-side hex-expression decode (registry query path) and the
    Arrow-side pure-Python parser agree on the same payloads."""
    rows = [
        (1, _png(640, 480)),
        (2, _wav(1, 8000)),
        (3, _wav(2, 48000)),
        (4, b"plain text bytes"),
        (5, _png(1, 1)),
    ]
    df = spark.createDataFrame(rows, "asset_id: long, payload: binary")
    jvm = {
        r.asset_id: (r.media_type, r.width, r.height, r.channels, r.sample_rate)
        for r in multimodal.decode_meta(df).collect()
    }
    for aid, payload in rows:
        m = multimodal.parse_media_header(payload)
        expect = (
            m.get("media_type", "text/plain"),
            m.get("width"),
            m.get("height"),
            m.get("channels"),
            m.get("sample_rate"),
        )
        assert jvm[aid] == expect, aid


def test_extract_features_emits_header_metadata(spark):
    """extract_features now carries the decoded header fields through
    the Arrow batches alongside the feature vector."""
    rows = [(1, _png(320, 200), "application/octet-stream"),
            (2, _wav(2, 16000), "application/octet-stream"),
            (3, b"hello", "text/plain")]
    df = spark.createDataFrame(rows, "asset_id: long, payload: binary, media_type: string")
    got = {r.asset_id: r for r in multimodal.extract_features(df).collect()}
    assert (got[1].media_type, got[1].width, got[1].height) == ("image/png", 320, 200)
    assert (got[2].media_type, got[2].channels, got[2].sample_rate) == ("audio/wav", 2, 16000)
    assert got[3].media_type == "text/plain"
    assert len(got[1].features) == multimodal.FEATURE_DIM


# ------------------------------------------------------------- PCM decode
def _build_wav(rate, channels, samples):
    """Canonical 44-byte-header WAV with real 16-bit PCM, stdlib only."""
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, rate,
        rate * channels * 2, channels * 2, 16,
    )
    body = b"WAVE" + fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def test_decode_wav_frames_real_clip_pinned(spark):
    """Fixture-pinned end-to-end: a real 1-second 8 kHz mono clip
    through the REAL 25ms/10ms frame_sample_plan — every planned frame
    (200 samples each) must decode to the numpy-computed reference
    stats for its exact byte range."""
    import math

    import numpy as np

    rate = 8000
    rng = np.random.RandomState(7)
    samples = rng.randint(-32768, 32768, size=rate, dtype=np.int64)
    payload = _build_wav(rate, 1, samples.tolist())
    assets = spark.createDataFrame(
        [(1, bytearray(payload))], "asset_id long, payload binary"
    )
    plan = multimodal.frame_sample_plan(assets)
    got = {
        r.frame_idx: r
        for r in multimodal.decode_wav_frames(assets, plan).collect()
    }
    assert len(got) == multimodal.N_FRAMES  # 98 frames, all decoded
    for f in (0, 1, 42, multimodal.N_FRAMES - 1):
        lo = f * 80  # 10 ms stride * 8 samples/ms
        frame = samples[lo : lo + 200]  # 25 ms * 8 samples/ms
        r = got[f]
        assert r.n_samples == 200
        assert r.peak_min == frame.min() and r.peak_max == frame.max()
        want = math.sqrt(int((frame**2).sum()) / 200)
        assert r.rms == math.floor(want * 1e6 + 0.5) / 1e6


def test_decode_wav_frames_truncated_and_empty_ranges(spark):
    """A frame extending past the payload decodes the available prefix;
    one fully outside yields n_samples=0 with NULL stats."""
    payload = _build_wav(8000, 1, [100, -200, 300])  # 6 data bytes
    assets = spark.createDataFrame(
        [(1, bytearray(payload))], "asset_id long, payload binary"
    )
    plan = spark.createDataFrame(
        [(1, 0, 44, 4), (1, 1, 46, 100), (1, 2, 5000, 10)],
        "asset_id long, frame_idx long, start_byte long, n_bytes long",
    )
    got = {r.frame_idx: r for r in multimodal.decode_wav_frames(assets, plan).collect()}
    assert (got[0].n_samples, got[0].peak_min, got[0].peak_max) == (2, -200, 100)
    assert (got[1].n_samples, got[1].peak_min, got[1].peak_max) == (2, -200, 300)
    assert got[2].n_samples == 0 and got[2].rms is None


def test_synth_wav_payload_is_decodable_wav(spark):
    """The synthetic fixtures must be REAL WAV files end-to-end: the
    stdlib wave module (an independent third parser) must agree with
    the header fields and the closed-form waveform."""
    import io
    import wave

    docs = spark.createDataFrame(
        [(4, "x"), (7, "y")], "doc_id long, text string"
    )  # doc_id % 3 == 1 -> WAV
    rows = {r.asset_id: bytes(r.payload) for r in multimodal.synth_assets(docs).collect()}
    for doc_id, payload in rows.items():
        w = wave.open(io.BytesIO(payload))
        assert w.getnchannels() == (doc_id % 2) + 1
        assert w.getframerate() == 8000 + (doc_id % 8) * 4000
        assert w.getsampwidth() == 2
        pcm = w.readframes(w.getnframes())
        import struct as st

        vals = st.unpack(f"<{len(pcm)//2}h", pcm)
        assert len(vals) == multimodal.PCM_N_SAMPLES
        for i, v in enumerate(vals):
            u = (doc_id * 131 + i * 7919) % 65536
            assert v == (u - 65536 if u >= 32768 else u)


# ------------------------------------------------------------ PNG pixels
def _encode_png(wd, ht, chn, pix, filt):
    """Minimal reference PNG encoder (test-only): real zlib stream,
    chosen per-row filter, correct chunk layout, zeroed CRCs."""
    import struct
    import zlib

    stride = wd * chn
    raw = b""
    prev = bytes(stride)
    for y in range(ht):
        line = pix[y * stride:(y + 1) * stride]
        if filt == 0:
            fl = line
        elif filt == 1:
            fl = bytes((line[i] - (line[i - chn] if i >= chn else 0)) & 255 for i in range(stride))
        elif filt == 2:
            fl = bytes((line[i] - prev[i]) & 255 for i in range(stride))
        elif filt == 3:
            fl = bytes(
                (line[i] - (((line[i - chn] if i >= chn else 0) + prev[i]) >> 1)) & 255
                for i in range(stride)
            )
        else:
            out = []
            for i in range(stride):
                a = line[i - chn] if i >= chn else 0
                b_ = prev[i]
                c = prev[i - chn] if i >= chn else 0
                p = a + b_ - c
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c)
                out.append((line[i] - pr) & 255)
            fl = bytes(out)
        raw += bytes([filt]) + fl
        prev = line
    z = zlib.compress(raw)
    ctype = {1: 0, 3: 2, 2: 4, 4: 6}[chn]
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big") + b"IHDR"
        + struct.pack(">IIBBBBB", wd, ht, 8, ctype, 0, 0, 0) + b"\x00" * 4
        + len(z).to_bytes(4, "big") + b"IDAT" + z + b"\x00" * 4
        + (0).to_bytes(4, "big") + b"IEND" + b"\x00" * 4
    )


def test_png_pixels_round_trip_all_filters_and_channels():
    """The decoder must invert a REAL zlib-compressed stream under
    every spec filter type, for grey / RGB / RGBA layouts."""
    import itertools
    import random

    rng = random.Random(7)
    for chn, filt in itertools.product([1, 2, 3, 4], range(5)):
        wd, ht = 5, 4
        pix = bytes(rng.randrange(256) for _ in range(wd * ht * chn))
        w, h, c, out = multimodal.decode_png_pixels(_encode_png(wd, ht, chn, pix, filt))
        assert (w, h, c) == (wd, ht, chn)
        assert out == pix, f"filter={filt} channels={chn}"


def test_png_pixels_multi_idat_chunks():
    """IDAT may legally split across chunks mid-stream; the decoder
    concatenates before inflating."""
    import struct

    pix = bytes(range(24))
    png = _encode_png(4, 2, 3, pix, 2)
    # split the single IDAT into two chunks
    sig, rest = png[:8], png[8:]
    ihdr = rest[: 8 + 13 + 4]
    idat_len = int.from_bytes(rest[25:29], "big")
    idat_data = rest[33 : 33 + idat_len]
    tail = rest[33 + idat_len + 4 :]
    a, b = idat_data[:3], idat_data[3:]
    rebuilt = (
        sig + ihdr
        + len(a).to_bytes(4, "big") + b"IDAT" + a + b"\x00" * 4
        + len(b).to_bytes(4, "big") + b"IDAT" + b + b"\x00" * 4
        + tail
    )
    w, h, c, out = multimodal.decode_png_pixels(rebuilt)
    assert (w, h, c, out) == (4, 2, 3, pix)


def test_png_pixels_rejects_unsupported_shapes():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        multimodal.decode_png_pixels(b"\x89PNG\r\n\x1a\n" + b"garbage")
    with _pytest.raises(ValueError):
        multimodal.decode_png_pixels(b"JFIF not a png")
    # truncated pixel data: valid header, IDAT covering half the rows
    png = _encode_png(4, 4, 1, bytes(range(16)), 0)
    import struct, zlib

    short = zlib.compress(b"\x00" + bytes(4))  # one row only
    broken = (
        png[:33]
        + len(short).to_bytes(4, "big") + b"IDAT" + short + b"\x00" * 4
        + (0).to_bytes(4, "big") + b"IEND" + b"\x00" * 4
    )
    with _pytest.raises(ValueError):
        multimodal.decode_png_pixels(broken)


def test_decode_image_routes_png_and_gates_unregistered():
    png = _encode_png(2, 2, 1, bytes([1, 2, 3, 4]), 0)
    w, h, c, px = multimodal.decode_image(png)
    assert (w, h, c, px) == (2, 2, 1, bytes([1, 2, 3, 4]))
    # a format with no registered decoder still raises through the
    # seam (Y4M is video-only — no entry in the image registry);
    # JPEG and GIF now decode for real
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"YUV4MPEG2 W2 H2 F25:1 Cmono\n")


def test_synth_png_assets_decode_on_spark(spark, sf_dir):
    """The SQL-built PNGs are REAL PNGs: pull one payload and decode it
    in-process; run the distributed stats path and spot-check one id."""
    from cryptocoininsights_data_engineer_project_spark.catalog import table

    docs = table(spark, sf_dir, "documents").limit(20)
    assets = multimodal.synth_png_assets(docs)
    row = assets.filter("asset_id = 3").first()
    w, h, c, px = multimodal.decode_png_pixels(bytes(row["payload"]))
    assert (w, h, c) == (multimodal.PNG_W, multimodal.PNG_H, 1)
    assert px == bytes((3 * 7 + i) % 256 for i in range(8))
    stats = {r["asset_id"]: r for r in multimodal.decode_png_stats(assets).collect()}
    assert stats[3]["pixel_sum"] == sum((3 * 7 + i) % 256 for i in range(8))
    assert stats[3]["n_pixels"] == 8


def test_resize_nearest_semantics():
    """4x2 grey -> 2x1 picks pixel centers (1,1) and (3,1); RGB keeps
    channel interleave; identity resize returns the input."""
    px = bytes(range(8))  # 4x2 grey, value == index
    assert multimodal.resize_nearest(px, 4, 2, 1, 2, 1) == bytes([5, 7])
    assert multimodal.resize_nearest(px, 4, 2, 1, 4, 2) == px
    rgb = bytes(range(24))  # 4x2 RGB
    out = multimodal.resize_nearest(rgb, 4, 2, 3, 2, 1)
    assert out == rgb[(1 * 4 + 1) * 3:(1 * 4 + 1) * 3 + 3] + rgb[(1 * 4 + 3) * 3:(1 * 4 + 3) * 3 + 3]


def test_resize_png_assets_on_spark(spark, sf_dir):
    from cryptocoininsights_data_engineer_project_spark.catalog import table

    docs = table(spark, sf_dir, "documents").limit(10)
    assets = multimodal.synth_png_assets(docs)
    rows = {r["asset_id"]: r for r in multimodal.resize_png_assets(assets).collect()}
    # fixture pixel (sx, sy) = (7d + sx + 4*sy) % 256; resize picks (1,1), (3,1)
    d = 3
    exp = bytes([(7 * d + 1 + 4) % 256, (7 * d + 3 + 4) % 256])
    assert rows[d]["resized_hex"] == exp.hex()
    assert rows[d]["pixel_sum"] == sum(exp)
    assert (rows[d]["out_w"], rows[d]["out_h"]) == (2, 1)


# ------------------------------------------------------------ Y4M video
def test_decode_y4m_parses_real_stream():
    payload = (
        b"YUV4MPEG2 W3 H2 F25:1 Cmono\n"
        + b"FRAME\n" + bytes([1, 2, 3, 4, 5, 6])
        + b"FRAME\n" + bytes([7, 8, 9, 10, 11, 12])
    )
    w, h, frames = multimodal.decode_y4m(payload)
    assert (w, h) == (3, 2)
    assert frames == [bytes([1, 2, 3, 4, 5, 6]), bytes([7, 8, 9, 10, 11, 12])]


def test_decode_y4m_rejects_bad_streams():
    with pytest.raises(ValueError):
        multimodal.decode_y4m(b"not a video")
    with pytest.raises(NotImplementedError):  # exotic colorspace
        multimodal.decode_y4m(b"YUV4MPEG2 W2 H2 C411\nFRAME\n" + bytes(6))
    with pytest.raises(ValueError):  # C420 needs even dims
        multimodal.decode_y4m(b"YUV4MPEG2 W3 H2 C420jpeg\nFRAME\n" + bytes(9))
    with pytest.raises(ValueError):  # truncated frame
        multimodal.decode_y4m(b"YUV4MPEG2 W2 H2 Cmono\nFRAME\n" + bytes(2))
    with pytest.raises(ValueError):  # missing FRAME marker
        multimodal.decode_y4m(b"YUV4MPEG2 W2 H2 Cmono\nBOGUS\n" + bytes(4))


def test_decode_y4m_chroma_planes():
    """Round 7: C420/C422/C444 split into exact (Y, U, V) planes;
    the default colorspace when the C tag is absent is 420jpeg; the
    mono view returns luma only."""
    y = bytes(range(16))  # 4x4
    u420, v420 = bytes([100, 101, 102, 103]), bytes([200, 201, 202, 203])
    clip = b"YUV4MPEG2 W4 H4 F25:1 C420jpeg\nFRAME\n" + y + u420 + v420
    w, h, cs, frames = multimodal.decode_y4m_planes(clip)
    assert (w, h, cs) == (4, 4, "420jpeg")
    assert frames == [(y, u420, v420)]
    # default colorspace = 420jpeg
    w, h, cs, frames = multimodal.decode_y4m_planes(
        b"YUV4MPEG2 W4 H4\nFRAME\n" + y + u420 + v420
    )
    assert cs == "420jpeg" and frames == [(y, u420, v420)]
    # 422: half-width chroma; 444: full planes; two frames each
    u422, v422 = bytes(range(50, 58)), bytes(range(60, 68))
    clip422 = (
        b"YUV4MPEG2 W4 H4 C422\n"
        + b"FRAME\n" + y + u422 + v422
        + b"FRAME\n" + y[::-1] + v422 + u422
    )
    _, _, cs, frames = multimodal.decode_y4m_planes(clip422)
    assert cs == "422" and len(frames) == 2
    assert frames[1] == (y[::-1], v422, u422)
    u444 = bytes(range(16, 32))
    clip444 = b"YUV4MPEG2 W4 H4 C444\nFRAME\n" + y + u444 + y
    assert multimodal.decode_y4m_planes(clip444)[3] == [(y, u444, y)]
    # mono view of a color stream = luma plane
    assert multimodal.decode_y4m(clip)[2] == [y]


def test_sample_video_frames_stride(spark, sf_dir):
    from cryptocoininsights_data_engineer_project_spark.catalog import table

    docs = table(spark, sf_dir, "documents").limit(5)
    assets = multimodal.synth_y4m_assets(docs)
    rows = multimodal.sample_video_frames(assets, stride=2).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append(r["frame_idx"])
    # 3 frames, stride 2 -> frames 0 and 2 kept
    assert all(sorted(v) == [0, 2] for v in by_asset.values())
    d = 2
    got = {r["frame_idx"]: r["pixel_sum"] for r in rows if r["asset_id"] == d}
    for t in (0, 2):
        assert got[t] == sum((7 * d + i + 11 * t) % 256 for i in range(8))


def test_extract_pixel_features_by_hand(spark, sf_dir):
    from cryptocoininsights_data_engineer_project_spark.catalog import table

    docs = table(spark, sf_dir, "documents").limit(5)
    rows = {
        r["asset_id"]: r
        for r in multimodal.extract_pixel_features(
            multimodal.synth_png_assets(docs)
        ).collect()
    }
    d = 1
    px = [(7 * d + i) % 256 for i in range(8)]
    n = 8
    s, ss = sum(px), sum(v * v for v in px)
    assert rows[d]["mean_level"] == s / n
    assert rows[d]["var_level"] == pytest.approx(ss / n - (s / n) ** 2, abs=1e-6)
    grad = sum(abs(px[y * 4 + x + 1] - px[y * 4 + x]) for y in range(2) for x in range(3))
    assert rows[d]["grad_energy"] == grad


def test_codec_registry_jpeg_end_to_end(spark):
    """The codec seam (VERDICT r4 #5): registering a decoder for a
    format this container has no codec for must flow END-TO-END through
    extract_pixel_features — the registry snapshot rides the UDF
    closure to the executors, so no operator changes. The fake decoder
    is deterministic (4 'pixels' derived from payload length), standing
    in for a PIL-backed callable on a real cluster."""

    def fake_jpeg(b):
        v = len(b) % 251
        return 2, 2, 1, bytes([v, v + 1, v + 2, v + 3])

    real_jpeg = multimodal.DECODERS["jpeg"]
    multimodal.register_decoder("jpeg", fake_jpeg)
    try:
        rows = [
            (1, b"\xff\xd8\xff\xe0" + b"x" * 10),
            (2, b"\xff\xd8\xff\xe0" + b"y" * 20),
        ]
        df = spark.createDataFrame(rows, "asset_id: long, payload: binary")
        got = {
            r["asset_id"]: r
            for r in multimodal.extract_pixel_features(df).collect()
        }
        for aid, payload in rows:
            w, h, ch, px = fake_jpeg(payload)
            n = w * h * ch
            s = sum(px)
            assert got[aid]["n_pixels"] == w * h
            assert got[aid]["mean_level"] == pytest.approx(s / n, abs=1e-6)
            assert got[aid]["grad_energy"] == sum(
                abs(px[i + 1] - px[i]) for y in range(h) for i in (y * 2,)
            )
    finally:
        multimodal.register_decoder("jpeg", real_jpeg)
    # a format with no registered decoder is a loud gap — and the
    # error names the seam (GIF decodes for real now; Y4M stays a
    # video-path format with no image-registry entry)
    with pytest.raises(NotImplementedError, match="register_decoder"):
        multimodal.decode_image(b"YUV4MPEG2 W2 H2 F25:1 Cmono\n")


def test_png_filter_vectorization_matches_spec_reference():
    """The numpy filter reconstruction (Sub via per-lane cumsum, Up via
    row add) must agree byte-for-byte with a direct per-spec scalar
    implementation on random pixel data across all filters/channels."""
    import random
    import struct
    import zlib

    rng = random.Random(7)
    for ch in (1, 2, 3, 4):
        w, h = 9, 6
        pix = bytes(rng.randrange(256) for _ in range(w * h * ch))
        for filt in (0, 1, 2, 3, 4):
            enc = _encode_png(w, h, ch, pix, filt)
            gw, gh, gc, out = multimodal.decode_png_pixels(enc)
            assert (gw, gh, gc) == (w, h, ch)
            assert out == pix, f"filter {filt} ch {ch}"


def _encode_png_full(
    wd, ht, ctype, depth, samples, filt=0, interlace=False, plte=None
):
    """Independent full-matrix PNG encoder (test-only, written from
    the spec separately from the decoder): palette/grey/color at any
    legal depth, optional Adam7 serialization, any single filter type
    applied at the spec's byte distance. ``samples`` is a row-major
    list of per-pixel channel tuples of RAW sample values."""
    import struct
    import zlib

    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    bpp = max(1, nch * depth // 8)

    def pack_row(vals):
        flat = [c for px in vals for c in px]
        if depth == 8:
            return bytes(flat)
        if depth == 16:
            return b"".join(v.to_bytes(2, "big") for v in flat)
        out = bytearray()
        acc = n = 0
        for v in flat:
            acc = (acc << depth) | v
            n += depth
            if n == 8:
                out.append(acc)
                acc = n = 0
        if n:
            out.append(acc << (8 - n))
        return bytes(out)

    def filter_row(line, prev):
        if filt == 0:
            return line
        out = bytearray()
        for i in range(len(line)):
            a = line[i - bpp] if i >= bpp else 0
            b_ = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if filt == 1:
                pred = a
            elif filt == 2:
                pred = b_
            elif filt == 3:
                pred = (a + b_) >> 1
            else:
                p = a + b_ - c
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c)
            out.append((line[i] - pred) & 255)
        return bytes(out)

    passes = (
        ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
         (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
        if interlace
        else ((0, 0, 1, 1),)
    )
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        xs = list(range(x0, wd, dx))
        ys = list(range(y0, ht, dy))
        if not xs or not ys:
            continue
        prev = bytes((len(xs) * nch * depth + 7) // 8)
        for y in ys:
            line = pack_row([samples[y * wd + x] for x in xs])
            raw += bytes([filt]) + filter_row(line, prev)
            prev = line
    z = zlib.compress(bytes(raw))
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += (13).to_bytes(4, "big") + b"IHDR"
    out += struct.pack(
        ">IIBBBBB", wd, ht, depth, ctype, 0, 0, 1 if interlace else 0
    )
    out += b"\x00" * 4
    if plte is not None:
        out += len(plte).to_bytes(4, "big") + b"PLTE" + plte + b"\x00" * 4
    out += len(z).to_bytes(4, "big") + b"IDAT" + z + b"\x00" * 4
    out += (0).to_bytes(4, "big") + b"IEND" + b"\x00" * 4
    return bytes(out)


def test_png_full_shape_matrix_round_trip():
    """Round 7: the full spec shape matrix — palette through PLTE,
    grey sub-byte depths with exact 255/(2^d-1) expansion, 16-bit
    high-byte chop, odd widths (row pad bits discarded) — against
    the independent encoder, expected pixels computed from the raw
    samples directly."""
    import random

    rng = random.Random(41)
    # (ctype, depth) -> expected transform of one sample tuple
    cases = [
        (0, 1), (0, 2), (0, 4), (0, 8), (0, 16),
        (2, 8), (2, 16), (3, 1), (3, 2), (3, 4), (3, 8),
        (4, 8), (4, 16), (6, 8), (6, 16),
    ]
    for ctype, depth in cases:
        wd, ht = 7, 5  # odd width exercises pad bits at depth < 8
        nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
        hi = (1 << depth) - 1
        samples = [
            tuple(rng.randrange(hi + 1) for _ in range(nch))
            for _ in range(wd * ht)
        ]
        plte = None
        if ctype == 3:
            npal = 1 << depth
            plte = bytes(rng.randrange(256) for _ in range(3 * npal))
        for filt in (0, 1, 2, 3, 4):
            png = _encode_png_full(
                wd, ht, ctype, depth, samples, filt=filt, plte=plte
            )
            w, h, ch, out = multimodal.decode_png_pixels(png)
            if ctype == 3:
                want = b"".join(
                    plte[3 * px[0] : 3 * px[0] + 3] for px in samples
                )
                assert (w, h, ch) == (wd, ht, 3)
            elif depth < 8:
                scale = 255 // hi
                want = bytes(c * scale for px in samples for c in px)
                assert (w, h, ch) == (wd, ht, nch)
            elif depth == 16:
                want = bytes(c >> 8 for px in samples for c in px)
                assert (w, h, ch) == (wd, ht, nch)
            else:
                want = bytes(c for px in samples for c in px)
                assert (w, h, ch) == (wd, ht, nch)
            assert out == want, f"ctype={ctype} depth={depth} filt={filt}"


def test_png_adam7_interlace_round_trip():
    """Adam7: all 7 passes independently filtered and scattered —
    shapes chosen so some passes are empty (1-2 pixel edges) and
    others multi-row; every color type, both byte and sub-byte."""
    import random

    rng = random.Random(43)
    shapes = [(8, 8), (7, 5), (3, 3), (1, 1), (2, 9), (13, 4)]
    for ctype, depth in [(0, 8), (2, 8), (3, 4), (6, 8), (0, 2), (2, 16)]:
        nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
        hi = (1 << depth) - 1
        for wd, ht in shapes:
            samples = [
                tuple(rng.randrange(hi + 1) for _ in range(nch))
                for _ in range(wd * ht)
            ]
            plte = (
                bytes(rng.randrange(256) for _ in range(3 * (1 << depth)))
                if ctype == 3
                else None
            )
            for filt in (0, 4):
                png = _encode_png_full(
                    wd, ht, ctype, depth, samples,
                    filt=filt, interlace=True, plte=plte,
                )
                w, h, ch, out = multimodal.decode_png_pixels(png)
                ni = _encode_png_full(
                    wd, ht, ctype, depth, samples, filt=0, plte=plte
                )
                _, _, _, want = multimodal.decode_png_pixels(ni)
                assert (w, h) == (wd, ht)
                assert out == want, (
                    f"adam7 ctype={ctype} depth={depth} {wd}x{ht} f={filt}"
                )


def test_png_palette_gates():
    """Palette image without PLTE, or with an out-of-range index,
    must fail loudly (ValueError), not decode garbage."""
    import pytest as _pytest

    samples = [(1,)] * 4
    png = _encode_png_full(2, 2, 3, 8, samples, plte=bytes(6))
    w, h, ch, out = multimodal.decode_png_pixels(png)
    assert (w, h, ch) == (2, 2, 3)
    # strip the PLTE chunk
    at = png.index(b"PLTE") - 4
    end = at + 4 + 4 + 6 + 4
    with _pytest.raises(ValueError, match="PLTE"):
        multimodal.decode_png_pixels(png[:at] + png[end:])
    # index beyond the palette
    bad = _encode_png_full(2, 2, 3, 8, [(5,)] * 4, plte=bytes(6))
    with _pytest.raises(ValueError, match="palette index"):
        multimodal.decode_png_pixels(bad)


def test_image_phash_pairs_designed_structure(spark):
    """The phash dedup bridge finds exactly the designed near-dup
    structure: within each doc_id//4 group, variants 0/1/2 pair at
    Hamming 1/2/3 (designed bit flips), variant 3 (8 flips) and
    cross-group pairs stay out. Decode is the REAL PNG path; the hash
    is computed from decoded bytes, not from the formula."""
    from cryptocoininsights_data_engineer_project_spark.operators import dedup

    docs = spark.range(16).withColumnRenamed("id", "doc_id")
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.image_phash_pairs(docs).collect()
    }
    want = {}
    for g in range(4):
        b = 4 * g
        want[(b, b + 1)] = 1      # variant 1 flips bit {1}
        want[(b, b + 2)] = 2      # variant 2 flips bits {2,3}
        want[(b + 1, b + 2)] = 3  # symmetric difference {1,2,3}
    assert got == want

    # the pair generation is banded (equi-join on chunk buckets), not
    # an all-pairs product
    plan = dedup.image_phash_pairs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_image_phash_bucket_cap_drops_degenerate_buckets(spark):
    """The skew guard: each fixture group's 4 variants share chunks
    1-3 verbatim (all designed flips land in chunk 0), so every
    pair-producing bucket has exactly 4 members. bucket_cap=3 treats
    those as degenerate and drops them wholesale — zero pairs, no
    O(n^2) explosion; bucket_cap=4 readmits them and restores the full
    designed result. Deterministic, and mirrored bit-for-bit by the
    HAVING clause in image_phash_oracle_sql."""
    from cryptocoininsights_data_engineer_project_spark.operators import dedup

    docs = spark.range(16).withColumnRenamed("id", "doc_id")
    assert dedup.image_phash_pairs(docs, bucket_cap=3).count() == 0
    full = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.image_phash_pairs(docs, bucket_cap=4).collect()
    }
    want = {}
    for g in range(4):
        b = 4 * g
        want[(b, b + 1)] = 1
        want[(b, b + 2)] = 2
        want[(b + 1, b + 2)] = 3
    assert full == want


def test_mulaw_expansion_matches_spec_table():
    """G.711 expansion over all 256 codes vs an independent scalar
    restatement of the spec formula, plus the published extremes."""
    import numpy as np

    v = multimodal.mulaw_expand(
        np.array([0x00, 0x80, 0xFF, 0x7F], dtype=np.uint8)
    )
    assert list(v) == [-32124, 32124, 0, 0]

    def ref(b):
        u = (~b) & 0xFF
        mag = ((((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 7)) - 0x84
        return -mag if u & 0x80 else mag

    allv = multimodal.mulaw_expand(np.arange(256, dtype=np.uint8))
    assert [ref(b) for b in range(256)] == list(allv)


def test_alaw_expansion_matches_spec_table():
    """A-law over all 256 codes vs an independent scalar restatement,
    plus the extremes (±32256) and the no-zero property (min |s|=8)."""
    import numpy as np

    v = multimodal.alaw_expand(
        np.array([0x55, 0xD5, 0x2A, 0xAA], dtype=np.uint8)
    )
    assert list(v) == [-8, 8, -32256, 32256]

    def ref(b):
        u = b ^ 0x55
        e = (u >> 4) & 7
        m = u & 0x0F
        mag = (m << 4) + 8 if e == 0 else ((m << 4) + 0x108) << (e - 1)
        return mag if u & 0x80 else -mag

    allv = multimodal.alaw_expand(np.arange(256, dtype=np.uint8))
    assert [ref(b) for b in range(256)] == list(allv)
    assert min(abs(x) for x in allv) == 8  # A-law encodes no zero


def test_cross_law_gate(spark):
    """A mu-law WAV through the A-law decoder fails loudly (and vice
    versa) — the two expansions disagree on every nontrivial byte, so
    silent cross-decoding would corrupt the corpus undetectably."""
    import pytest as _pytest

    docs = spark.range(2).withColumnRenamed("id", "doc_id")
    mu = multimodal.synth_mulaw_assets(docs)
    al = multimodal.synth_alaw_assets(docs)
    with _pytest.raises(Exception, match="A-law|tag"):
        multimodal.decode_alaw_stats(mu).collect()
    with _pytest.raises(Exception, match="mu-law|tag"):
        multimodal.decode_mulaw_stats(al).collect()


def _ref_ima_adpcm(data, block_align):
    """Independent scalar IMA ADPCM reference, written from the
    public spec tables separately from the operator."""
    steps = [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
        449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
        1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
        3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
        9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
        22385, 24623, 27086, 29794, 32767,
    ]
    adj = [-1, -1, -1, -1, 2, 4, 6, 8]
    out = []
    for off in range(0, len(data), block_align):
        pred = int.from_bytes(data[off : off + 2], "little", signed=True)
        idx = data[off + 2]
        out.append(pred)
        nibs = []
        for byte in data[off + 4 : off + block_align]:
            nibs += [byte & 15, byte >> 4]
        for d in nibs:
            st = steps[idx]
            diff = st >> 3
            if d & 1:
                diff += st >> 2
            if d & 2:
                diff += st >> 1
            if d & 4:
                diff += st
            pred = pred + (-diff if d & 8 else diff)
            pred = min(32767, max(-32768, pred))
            out.append(pred)
            idx = min(88, max(0, idx + adj[d & 7]))
    return out


def test_adpcm_decode_matches_spec_reference():
    """Random block streams, including clamp-extreme blocks (index
    pinned at 0 and 88, predictor at the int16 rails), against the
    independent scalar reference."""
    import random

    rng = random.Random(11)
    for trial in range(20):
        align = rng.choice([8, 12, 36])
        blocks = rng.randrange(1, 5)
        data = bytearray()
        for _ in range(blocks):
            if trial < 3:  # force the rails
                pred = rng.choice([-32768, 32767, -32000, 32000])
                idx = rng.choice([0, 88, 87, 1])
            else:
                pred = rng.randrange(-32768, 32768)
                idx = rng.randrange(89)
            data += pred.to_bytes(2, "little", signed=True)
            data += bytes([idx, 0])
            data += bytes(
                rng.randrange(256) for _ in range(align - 4)
            )
        got = multimodal.adpcm_ima_decode(bytes(data), align)
        want = _ref_ima_adpcm(bytes(data), align)
        assert list(got) == want, f"trial {trial}"


def test_adpcm_gates():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="block_align"):
        multimodal.adpcm_ima_decode(b"\x00" * 8, 4)
    with _pytest.raises(ValueError, match="multiple"):
        multimodal.adpcm_ima_decode(b"\x00" * 9, 8)
    with _pytest.raises(ValueError, match="step index"):
        multimodal.adpcm_ima_decode(b"\x00\x00\x59\x00" + b"\x00" * 4, 8)


def test_adpcm_decoder_rejects_pcm_and_g711(spark):
    """Feeding linear-PCM or mu-law WAVs to the ADPCM reader must
    fail loudly on the fmt tag — the silent-corruption gate."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    docs = (
        spark.range(1, 3)
        .withColumnRenamed("id", "doc_id")
        .withColumn("text", F.lit("x"))
    )
    pcm = multimodal.synth_assets(docs).where("asset_id % 3 = 1")  # WAV rows
    with _pytest.raises(Exception, match="expected 4-bit IMA ADPCM"):
        multimodal.decode_adpcm_stats(pcm).collect()
    mul = multimodal.synth_mulaw_assets(docs)
    with _pytest.raises(Exception, match="expected 4-bit IMA ADPCM"):
        multimodal.decode_adpcm_stats(mul).collect()


def test_mulaw_decoder_rejects_non_mulaw_wav(spark):
    """A 16-bit PCM WAV (format tag 1) through the mu-law decoder
    fails loudly — silent misinterpretation of companded vs linear
    bytes is the classic audio-corpus corruption."""
    import pytest as _pytest

    docs = spark.range(2).selectExpr(
        "id * 3 + 1 AS doc_id", "'x' AS text"  # %3==1 -> WAV shape
    )
    pcm_assets = multimodal.synth_assets(docs)
    with _pytest.raises(Exception, match="mu-law|tag"):
        multimodal.decode_mulaw_stats(pcm_assets).collect()


def test_avi_mjpeg_walker_and_real_decode():
    """The RIFF walker finds movi '00dc' chunks through the LIST tree,
    each frame decodes via the real T.81 path, and malformed
    containers fail loudly."""
    import pytest as _pytest

    doc_id = 5
    jlen = multimodal._avi_jpeg_len()
    payload = bytes.fromhex(multimodal._avi_mjpeg_header_hex())
    for t in range(multimodal.AVI_FRAMES):
        k = doc_id + 11 * t
        ent = bytes(
            [
                32 + k % 32,
                34 + (k % 4) * 8,
                97 + (k % 8) * 4,
                0x99,
                226 + ((k * 3) % 4) * 8,
            ]
        )
        payload += (
            bytes.fromhex("30306463")
            + jlen.to_bytes(4, "little")
            + bytes.fromhex(multimodal._JPEG_HEADER_HEX)
            + ent
            + b"\xff\xd9"
            + (b"\x00" if jlen & 1 else b"")
        )
    w, h, frames = multimodal.decode_avi_mjpeg(payload)
    assert (w, h, len(frames)) == (16, 8, multimodal.AVI_FRAMES)
    S = [1, -1, -1, 1, 1, -1, -1, 1]
    for t, px in enumerate(frames):
        k = doc_id + 11 * t
        for y in range(8):
            for x in range(16):
                if x < 8:
                    want = 128 + (32 + k % 32) + (4 + k % 4) * S[y]
                else:
                    want = (
                        128
                        + (32 + k % 32)
                        + (8 + k % 8)
                        + (4 + (k * 3) % 4) * S[x - 8] * S[y]
                    )
                assert px[y * 16 + x] == want, (t, x, y)
    with _pytest.raises(ValueError, match="RIFF"):
        multimodal.decode_avi_mjpeg(b"\x89PNG not an avi")
    # a RIFF with no video chunks fails loudly, not silently empty
    empty = (
        b"RIFF" + (4).to_bytes(4, "little") + b"AVI "
    )
    with _pytest.raises(ValueError, match="no video"):
        multimodal.decode_avi_mjpeg(empty)


def test_incremental_phash_matches_one_shot(spark, tmp_path):
    """index(A) + incremental(B) must equal the B-involving subset of
    one-shot image_phash_pairs(A ∪ B) — the invariant that lets an
    image pipeline dedup new batches against persisted hash rows
    without re-DECODING any indexed image (mirror of the MinHash
    cross-run test in test_packing_dedup.py)."""
    from cryptocoininsights_data_engineer_project_spark.operators import dedup

    docs = spark.range(16).withColumnRenamed("id", "doc_id")
    a = docs.filter("doc_id % 2 = 0")
    b = docs.filter("doc_id % 2 = 1")
    idx = str(tmp_path / "phash_index")
    dedup.write_phash_index(a, idx)

    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup.incremental_phash_pairs(spark, b, idx).collect()
    }
    full = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup.image_phash_pairs(docs).collect()
    }
    b_ids = {r.doc_id for r in b.collect()}
    want = {(x, y, h) for x, y, h in full if x in b_ids or y in b_ids}
    assert got == want
    assert len(got) > 0

    # maintenance invariant: append B's fingerprints; index-time plus
    # incremental reports reconstruct the full union pair set
    dedup.write_phash_index(b, idx)
    a_internal = {
        (x, y, h) for x, y, h in full if x not in b_ids and y not in b_ids
    }
    assert a_internal | got == full

    # cap-clean write: bucket_cap=1 drops A's shared-chunk buckets at
    # index time (only never-colliding singletons remain), so a B
    # probe surfaces zero cross pairs — the explosion-free guard
    idx2 = str(tmp_path / "phash_index_capped")
    dedup.write_phash_index(a, idx2, bucket_cap=1)
    assert dedup.incremental_phash_pairs(spark, b, idx2).count() == 0


def test_ahash_chunks_bits_match_decoded_pixels(spark):
    """ahash_chunks recomputed by hand from the decoded fixture bytes:
    bit j set iff pixel j > image mean (integer threshold)."""
    from cryptocoininsights_data_engineer_project_spark.operators.multimodal import (
        ahash_chunks,
        decode_png_pixels,
        synth_phash_png_assets,
    )

    docs = spark.range(7).withColumnRenamed("id", "doc_id")
    assets = {r["asset_id"]: bytes(r["payload"]) for r in synth_phash_png_assets(docs).collect()}
    got = {r["asset_id"]: r for r in ahash_chunks(synth_phash_png_assets(docs)).collect()}
    for aid, payload in assets.items():
        w, h, ch, px = decode_png_pixels(payload)
        assert (w, h, ch) == (8, 8, 1)
        n = len(px)
        s = sum(px)
        bits = [1 if px[j] * n > s else 0 for j in range(64)]
        for c in range(4):
            want = sum(bits[c * 16 + k] << k for k in range(16))
            assert got[aid][f"c{c}"] == want, (aid, c)
