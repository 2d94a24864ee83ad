"""Ogg walker (operators/oggcodec.py) against an INDEPENDENT in-test
packer: pages are hand-assembled per RFC 3533 with an independently
written bit-by-bit CRC-32 (no table, written separately from the
decoder's table-driven fold), packets split across lacing values and
page boundaries at random, and the FLAC-in-Ogg mapping packed from a
natively assembled FLAC stream. Expected bytes never come from the
code under test."""

from __future__ import annotations

import random

import pytest

from cryptocoininsights_data_engineer_project_spark.operators.oggcodec import (
    OggError,
    flac_from_ogg,
    ogg_crc,
    ogg_packets,
    parse_ogg_pages,
)

# --------------------------------------------------------------- test packer


def _crc32_bitwise(data: bytes) -> int:
    """RFC 3533 CRC, computed bit-by-bit — an independent
    implementation of the polynomial the decoder folds via table."""
    reg = 0
    for byte in data:
        for k in range(7, -1, -1):
            bit = (byte >> k) & 1
            top = (reg >> 31) & 1
            reg = ((reg << 1) & 0xFFFFFFFF) | bit
            if top:
                reg ^= 0x04C11DB7
    # RFC 3533's direct CRC has no augmentation; the shift-register
    # form above needs 32 zero bits flushed to match it
    for _ in range(32):
        top = (reg >> 31) & 1
        reg = (reg << 1) & 0xFFFFFFFF
        if top:
            reg ^= 0x04C11DB7
    return reg


def _page(
    body_laces: list[bytes],
    *,
    seq: int,
    serial: int = 7,
    continued: bool = False,
    bos: bool = False,
    eos: bool = False,
    granule: int = 0,
    corrupt_crc: bool = False,
    version: int = 0,
) -> bytes:
    flags = (0x01 if continued else 0) | (0x02 if bos else 0) | (
        0x04 if eos else 0
    )
    lacing = bytes(len(x) for x in body_laces)
    assert all(len(x) <= 255 for x in body_laces)
    hdr = (
        b"OggS"
        + bytes([version, flags])
        + granule.to_bytes(8, "little", signed=True)
        + serial.to_bytes(4, "little")
        + seq.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + bytes([len(lacing)])
        + lacing
    )
    body = b"".join(body_laces)
    crc = _crc32_bitwise(hdr + body)
    if corrupt_crc:
        crc ^= 0xDEAD
    page = bytearray(hdr + body)
    page[22:26] = crc.to_bytes(4, "little")
    return bytes(page)


def _lace_packet(pkt: bytes) -> list[bytes]:
    """Split one packet into its lacing segments: 255-byte chunks,
    terminated by a final chunk < 255 (possibly empty)."""
    out = []
    i = 0
    while True:
        chunk = pkt[i : i + 255]
        out.append(chunk)
        i += 255
        if len(chunk) < 255:
            return out


def pack_stream(
    packets: list[bytes], serial: int = 7, max_laces_per_page: int = 5,
    rng: random.Random | None = None, granules: list[int] | None = None,
) -> bytes:
    """Pack packets into pages, at most ``max_laces_per_page`` lacing
    values per page — packets whose lacing runs over continue on the
    next page with the continuation flag, exactly RFC 3533 §4."""
    rng = rng or random.Random(0)
    laces: list[bytes] = []
    for pkt in packets:
        laces.extend(_lace_packet(pkt))
    pages = []
    seq = 0
    i = 0
    while i < len(laces):
        n = rng.randrange(1, max_laces_per_page + 1)
        chunk = laces[i : i + n]
        continued = i > 0 and len(laces[i - 1]) == 255
        last = i + n >= len(laces)
        pages.append(
            _page(
                chunk,
                seq=seq,
                serial=serial,
                continued=continued,
                bos=(seq == 0),
                eos=last,
                granule=(granules[seq] if granules else seq),
            )
        )
        seq += 1
        i += n
    return b"".join(pages)


# ------------------------------------------------------------------- crc


def test_crc_implementations_agree():
    rng = random.Random(1)
    for n in (0, 1, 7, 64, 300):
        data = bytes(rng.randrange(256) for _ in range(n))
        assert ogg_crc(data) == _crc32_bitwise(data)


# ----------------------------------------------------------------- round trip


@pytest.mark.parametrize("seed", range(5))
def test_random_packets_round_trip(seed):
    """Random packet sizes (incl. 0, 255-multiples forcing empty
    terminators, and > 255 forcing multi-lace + page-spanning
    continuation) reassemble exactly."""
    rng = random.Random(seed)
    packets = [
        bytes(rng.randrange(256) for _ in range(size))
        for size in (
            0, 1, 255, 256, 510, rng.randrange(1, 1200),
            rng.randrange(1, 1200),
        )
    ]
    blob = pack_stream(packets, rng=rng)
    pages = parse_ogg_pages(blob)
    assert pages[0]["bos"] and pages[-1]["eos"]
    got = ogg_packets(pages)
    assert [p for _, p in got] == packets
    assert all(s == 7 for s, _ in got)


def test_packet_spanning_pages_needs_continuation_flag():
    # a 600-byte packet laced 255+255+90 split across pages
    pkt = bytes(range(256)) * 3
    pkt = pkt[:600]
    pages = [
        _page(_lace_packet(pkt)[:1], seq=0, bos=True),
        _page(_lace_packet(pkt)[1:], seq=1, continued=True, eos=True),
    ]
    got = ogg_packets(parse_ogg_pages(b"".join(pages)))
    assert [p for _, p in got] == [pkt]


def test_multiplexed_streams_reassemble_per_serial():
    a = _page([b"alpha"], seq=0, serial=3, bos=True, eos=True)
    b_ = _page([b"beta"], seq=0, serial=9, bos=True, eos=True)
    got = ogg_packets(parse_ogg_pages(a + b_))
    assert sorted(got) == [(3, b"alpha"), (9, b"beta")]


# --------------------------------------------------------------------- gates


def test_crc_mismatch_raises():
    blob = _page([b"data"], seq=0, bos=True, eos=True, corrupt_crc=True)
    with pytest.raises(OggError, match="CRC mismatch"):
        parse_ogg_pages(blob)


def test_bad_capture_pattern_raises():
    with pytest.raises(OggError, match="capture pattern"):
        parse_ogg_pages(b"NotO" + b"\x00" * 30)


def test_bad_version_raises():
    blob = _page([b"x"], seq=0, bos=True, eos=True, version=1)
    with pytest.raises(OggError, match="version"):
        parse_ogg_pages(blob)


def test_sequence_gap_raises():
    p0 = _page([b"a"], seq=0, bos=True)
    p2 = _page([b"b"], seq=2, eos=True)
    with pytest.raises(OggError, match="sequence gap"):
        ogg_packets(parse_ogg_pages(p0 + p2))


def test_continuation_flag_mismatch_raises():
    # page 1 claims continuation but no packet is open
    p0 = _page([b"done"], seq=0, bos=True)
    p1 = _page([b"x"], seq=1, continued=True, eos=True)
    with pytest.raises(OggError, match="continuation flag"):
        ogg_packets(parse_ogg_pages(p0 + p1))


def test_unterminated_packet_raises():
    p0 = _page([bytes(255)], seq=0, bos=True)  # lace 255, never ends
    with pytest.raises(OggError, match="unterminated"):
        ogg_packets(parse_ogg_pages(p0))


def test_truncated_body_raises():
    blob = _page([b"0123456789"], seq=0, bos=True, eos=True)
    with pytest.raises(OggError, match="truncated page body"):
        parse_ogg_pages(blob[:-4])


# ------------------------------------------------------------- flac mapping


def _native_flac(doc: int) -> bytes:
    """The registry fixture's native FLAC, assembled in pure Python
    (head + frame with the 0x8005 CRC-16) — independent of the SQL
    builder."""
    from cryptocoininsights_data_engineer_project_spark.operators import (
        multimodal as M,
    )

    samples = bytes((doc * 37 + j * 11) % 256 for j in range(M.FLAC_N_SAMPLES))
    s = M._FLAC_CRC16_SEED
    for b in samples:
        s ^= b * 256
        for _ in range(8):
            s = (((s * 2) % 65536) ^ 32773) if s >= 32768 else (s * 2) % 65536
    return (
        bytes.fromhex(M._FLAC_HEAD_HEX)
        + bytes.fromhex(M._FLAC_FRAME_PRE_HEX)
        + samples
        + s.to_bytes(2, "big")
    )


@pytest.mark.parametrize("seed", range(3))
def test_flac_in_ogg_repack_decodes(seed):
    """Pack the native fixture stream through the INDEPENDENT packer
    (random page splits) and decode through the full path — the
    encapsulation must be byte-transparent."""
    from cryptocoininsights_data_engineer_project_spark.operators.flaccodec import (
        decode_flac,
    )

    doc = 41 + seed
    native = _native_flac(doc)
    streaminfo_end = 4 + 4 + 34  # fLaC + block header + STREAMINFO
    mapping = (
        bytes([0x7F]) + b"FLAC" + bytes([1, 0])
        + (0).to_bytes(2, "big") + native[:streaminfo_end]
    )
    frame = native[streaminfo_end:]
    blob = pack_stream(
        [mapping, frame], rng=random.Random(seed), max_laces_per_page=1
    )
    n_pages, n_packets, got_native = flac_from_ogg(blob)
    assert got_native == native
    assert n_packets == 2
    rate, ch, _bps, smp = decode_flac(got_native)
    want = [(doc * 37 + j * 11) % 256 for j in range(16)]
    want = [v - 256 if v >= 128 else v for v in want]
    assert (rate, ch) == (8000, 1)
    assert list(smp[:, 0]) == want


def test_flac_mapping_gates():
    bad_first = pack_stream([b"\x7fVORB" + bytes(9)])
    with pytest.raises(OggError, match="mapping header"):
        flac_from_ogg(bad_first)
    native = _native_flac(1)
    mapping = (
        bytes([0x7F]) + b"FLAC" + bytes([2, 0])
        + (0).to_bytes(2, "big") + native[:42]
    )
    with pytest.raises(OggError, match="major version"):
        flac_from_ogg(pack_stream([mapping, native[42:]]))
    # declared header count exceeds what follows
    mapping = (
        bytes([0x7F]) + b"FLAC" + bytes([1, 0])
        + (5).to_bytes(2, "big") + native[:42]
    )
    with pytest.raises(OggError, match="header packets"):
        flac_from_ogg(pack_stream([mapping, native[42:]]))


def test_registry_fixture_matches_python_mirror(spark):
    """The SQL-built payload equals the pure-Python assembly byte for
    byte — in-plan CRC-16 and CRC-32 folds included."""
    from pyspark.sql import functions as F

    from cryptocoininsights_data_engineer_project_spark.operators import (
        multimodal as M,
    )
    from cryptocoininsights_data_engineer_project_spark.operators.oggcodec import (
        OGG_CRC_POLY,
    )

    docs = spark.range(6).select(F.col("id").alias("doc_id"))
    got = {
        r.asset_id: bytes(r.payload)
        for r in M.synth_ogg_flac_assets(docs).collect()
    }
    c = M._ogg_fixture_consts()
    for doc in range(6):
        native = _native_flac(doc)
        frame = native[42:]
        s32 = c["crc32_seed"]
        for b in frame[len(bytes.fromhex(M._FLAC_FRAME_PRE_HEX)) :]:
            s32 ^= b << 24
            for _ in range(8):
                s32 = (
                    (((s32 * 2) % (1 << 32)) ^ OGG_CRC_POLY)
                    if s32 >= (1 << 31)
                    else (s32 * 2) % (1 << 32)
                )
        want = (
            bytes.fromhex(c["page0_hex"])
            + bytes.fromhex(c["p1_pre_crc_hex"])
            + s32.to_bytes(4, "little")
            + bytes.fromhex(c["p1_post_crc_hex"])
            + frame[len(bytes.fromhex(M._FLAC_FRAME_PRE_HEX)) :]
        )
        assert got[doc] == want, f"doc {doc} payload mismatch"
        # and the whole page-1 CRC verifies against the independent CRC
        pages = parse_ogg_pages(got[doc])
        assert len(pages) == 2 and pages[1]["eos"]


def test_flac_in_ogg_with_header_packets():
    """n_headers > 0: metadata-block header packets between the
    mapping packet and the audio packets reassemble into a valid
    native stream (STREAMINFO loses its last-block flag, the PADDING
    block carries it)."""
    from cryptocoininsights_data_engineer_project_spark.operators.flaccodec import (
        decode_flac,
    )

    native = _native_flac(13)
    streaminfo = bytearray(native[:42])
    assert streaminfo[4] == 0x80  # last-block flag on STREAMINFO
    streaminfo[4] = 0x00  # more metadata follows
    padding = bytes([0x81, 0, 0, 4]) + bytes(4)  # last=1, type 1, 4 bytes
    mapping = (
        bytes([0x7F]) + b"FLAC" + bytes([1, 0])
        + (1).to_bytes(2, "big") + bytes(streaminfo)
    )
    frame = native[42:]
    blob = pack_stream([mapping, padding, frame], rng=random.Random(8))
    n_pages, n_packets, got = flac_from_ogg(blob)
    assert n_packets == 3
    rate, ch, _bps, smp = decode_flac(got)
    want = [(13 * 37 + j * 11) % 256 for j in range(16)]
    want = [v - 256 if v >= 128 else v for v in want]
    assert (rate, ch) == (8000, 1)
    assert list(smp[:, 0]) == want


def test_parse_ogg_fuzz_never_crashes_untyped():
    """Arbitrary bytes — and mutations of a valid stream — must parse
    or raise OggError; no IndexError/struct.error escapes the gate
    layer."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rng = random.Random(21)
    seedblob = pack_stream(
        [bytes(rng.randrange(256) for _ in range(30)), b"xy"], rng=rng
    )

    @settings(max_examples=250, deadline=None)
    @given(st.binary(max_size=150))
    def run(blob):
        try:
            ogg_packets(parse_ogg_pages(blob))
        except OggError:
            pass

    run()

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
            ogg_packets(parse_ogg_pages(bytes(blob[:cut])))
        except OggError:
            pass

    mutate()


def test_flac_from_ogg_fuzz_typed():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=120))
    def run(blob):
        try:
            flac_from_ogg(b"OggS" + blob)
        except OggError:
            pass

    run()
