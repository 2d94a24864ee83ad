"""MPEG-1 audio Layer III (operators/mp3codec.py): bundled Huffman
table invariants, fixture byte-equality, decode vs closed form, the
bit reservoir, scalefactor decode with scfsi copy groups, CRC
verification, every loud gate, and a mutation fuzzer."""

from __future__ import annotations

import pytest

from cryptocoininsights_data_engineer_project_spark.operators import (
    mp3codec as L3,
)
from cryptocoininsights_data_engineer_project_spark.operators import (
    mpaudiocodec as A,
)
from cryptocoininsights_data_engineer_project_spark.operators import (
    multimodal as M,
)


def _payload(doc: int) -> bytes:
    return M._mpeg_pack(M._mpa_l3_ops(doc))


def test_huffman_tables_are_complete_prefix_codes():
    """Kraft completeness (sum 2^-len == 1) and prefix-freeness for
    every bundled table — the structural invariants of the Table
    3-B.7 transcription (a slipped length or code fails here)."""
    tables = list(L3.HUFF_XY.values())[1:] + list(L3.HUFF_COUNT1.values())
    for tab in tables:
        kraft = sum(2.0 ** -ln for ln, _ in tab.values())
        assert kraft == 1.0, tab
        codes = [(ln, cd) for ln, cd in tab.values()]
        assert len(set(codes)) == len(codes)
        as_bits = [format(cd, f"0{ln}b") for ln, cd in codes]
        for a in as_bits:
            for b in as_bits:
                if a is not b:
                    assert not b.startswith(a) or a == b


def _bits(v, n):
    return format(v, f"0{n}b")


def _build_l3(
    granule_specs,
    *,
    main_data_begin=0,
    scfsi=(0, 0, 0, 0),
    protection=True,
    main_override=None,
    frame_kbps_bits="0111",
):
    """Independent single-frame builder (NOT the module fixture).
    granule_specs: [{pairs: [(x, y, sx, sy)...], table: id,
    scalefac_compress: n, scalefacs: [...]}] x2."""
    hdr = "1" * 12 + "1" + "01" + ("1" if protection else "0")
    hdr += frame_kbps_bits + "01"  # 96 kbps default, 48 kHz
    hdr += "0" + "0" + "11" + "00" + "0" + "0" + "00"
    side = _bits(main_data_begin, 9) + "0" * 5
    side += "".join(str(b) for b in scfsi)
    mains = []
    for g, spec in enumerate(granule_specs):
        tab = L3.HUFF_XY[spec.get("table", 1)]
        main = ""
        sfc = spec.get("scalefac_compress", 0)
        slen1, slen2 = L3.SLEN[sfc]
        scf = spec.get("scalefacs", [0] * 21)
        groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2),
                  (16, 21, slen2)]
        for gi_, (lo, hi, slen) in enumerate(groups):
            if g == 1 and scfsi[gi_]:
                continue
            for sfb in range(lo, hi):
                if slen:
                    main += _bits(scf[sfb], slen)
        for x, y, sx, sy in spec["pairs"]:
            ln, cd = tab[(x, y)]
            main += _bits(cd, ln)
            if x:
                main += str(sx)
            if y:
                main += str(sy)
        mains.append(main)
    for g, spec in enumerate(granule_specs):
        side += _bits(len(mains[g]), 12)
        side += _bits(len(spec["pairs"]), 9)
        side += _bits(spec.get("global_gain", 100), 8)
        side += _bits(spec.get("scalefac_compress", 0), 4) + "0"
        side += _bits(spec.get("table", 1), 5) * 3
        side += _bits(15, 4) + _bits(5, 3) + "000"
    total = hdr + ("0" * 16 if not protection else "") + side
    main_bits = main_override if main_override is not None else (
        mains[0] + mains[1]
    )
    total += main_bits
    pad = 288 * 8 - len(total)
    assert pad >= 0
    total += "0" * pad
    b = bytes(int(total[i : i + 8], 2) for i in range(0, len(total), 8))
    if not protection:
        # compute and splice the CRC over header 16..31 + side info
        covered = []
        for i in range(16, 32):
            covered.append((b[i // 8] >> (7 - i % 8)) & 1)
        start = 48
        n_side = 9 + 5 + 4 + 118
        for i in range(start, start + n_side):
            covered.append((b[i // 8] >> (7 - i % 8)) & 1)
        crc = A._crc16_mpa(covered)
        b = b[:4] + crc.to_bytes(2, "big") + b[6:]
    return b


def test_sql_fixture_bytes_equal_int_mode(spark):
    docs = spark.createDataFrame([(4,), (29,)], "doc_id long")
    got = {
        r.asset_id: bytes(r.payload)
        for r in M.synth_mpeg_audio_l3_assets(docs).collect()
    }
    assert got[4] == _payload(4) and got[29] == _payload(29)
    assert len(got[4]) == 2 * 288


def test_fixture_decode_matches_closed_form():
    for doc in (0, 11, 257):
        frames = A.decode_mpeg_audio(_payload(doc))
        assert len(frames) == 2 and frames[0].layer == 3
        for f, fr in enumerate(frames):
            for g in range(2):
                gi = fr.granules[g][0]
                assert gi.global_gain == (doc * 5 + 2 * g + f) % 256
                nz = [(i, int(v)) for i, v in enumerate(gi.lines) if v]
                expect = []
                for p in range(M.MP3_PAIRS):
                    sx = (doc + 3 * p + 5 * g + 7 * f) % 2
                    sy = (doc * 3 + p + 2 * g + f) % 2
                    expect += [(2 * p, 1 - 2 * sx), (2 * p + 1, 1 - 2 * sy)]
                assert nz == expect


def test_tables_2_and_3_decode():
    """Values up to 2 through the 3x3 tables, mixed zero/nonzero."""
    pairs = [(2, 1, 0, 1), (0, 2, 0, 0), (1, 0, 1, 0), (2, 2, 1, 1)]
    for table in (2, 3):
        frame = _build_l3(
            [{"pairs": pairs, "table": table},
             {"pairs": [], "table": table}]
        )
        (fr,) = A.decode_mpeg_audio(frame)
        gi = fr.granules[0][0]
        got = [int(v) for v in gi.lines[:8]]
        assert got == [2, -1, 0, 2, -1, 0, -2, -2]
        assert all(v == 0 for v in fr.granules[1][0].lines)


def test_bit_reservoir():
    """Frame 2's main data begins inside frame 1's unused slot:
    main_data_begin > 0 must locate it across the frame boundary."""
    doc = 11
    f1 = bytearray(_payload(doc)[:288])
    # frame 2, same granule content as the fixture's frame 1, but its
    # 40 main-data bits live in the LAST 10 bytes of frame 1's slot
    mains = ""
    for g in range(2):
        for p in range(M.MP3_PAIRS):
            mains += "000"
            mains += str((doc + 3 * p + 5 * g + 7) % 2)
            mains += str((doc * 3 + p + 2 * g + 1) % 2)
    assert len(mains) == 40
    tail_bits = mains + "0" * (80 - len(mains))
    tail = bytes(
        int(tail_bits[i : i + 8], 2) for i in range(0, 80, 8)
    )
    f1[288 - 10 :] = tail
    # frame 2: header + side info with main_data_begin = 10, empty slot
    hdr = "1" * 12 + "1" + "01" + "1" + "0111" + "01"
    hdr += "0" + "0" + "11" + "00" + "0" + "0" + "00"
    side = _bits(10, 9) + "0" * 5 + "0000"
    for g in range(2):
        side += _bits(20, 12) + _bits(M.MP3_PAIRS, 9)
        side += _bits((doc * 5 + 2 * g + 1) % 256, 8)
        side += "0000" + "0" + "00001" * 3 + "1111" + "101" + "000"
    total = hdr + side
    total += "0" * (288 * 8 - len(total))
    f2 = bytes(int(total[i : i + 8], 2) for i in range(0, len(total), 8))
    frames = A.decode_mpeg_audio(bytes(f1) + f2)
    assert len(frames) == 2 and frames[1].main_data_begin == 10
    for g in range(2):
        gi = frames[1].granules[g][0]
        nz = [(i, int(v)) for i, v in enumerate(gi.lines) if v]
        expect = []
        for p in range(M.MP3_PAIRS):
            sx = (doc + 3 * p + 5 * g + 7) % 2
            sy = (doc * 3 + p + 2 * g + 1) % 2
            expect += [(2 * p, 1 - 2 * sx), (2 * p + 1, 1 - 2 * sy)]
        assert nz == expect


def test_scalefactors_and_scfsi_copy():
    """scalefac_compress 5 (slen 1,1) reads 21 one-bit scalefactors;
    granule 1 with scfsi group 0 set copies sfb 0-5 from granule 0
    instead of reading bits."""
    scf0 = [(i * 7 + 3) % 2 for i in range(21)]
    scf1 = [(i * 5 + 1) % 2 for i in range(21)]
    frame = _build_l3(
        [
            {"pairs": [(1, 1, 0, 1)], "scalefac_compress": 5,
             "scalefacs": scf0},
            {"pairs": [(1, 1, 1, 0)], "scalefac_compress": 5,
             "scalefacs": scf1},
        ],
        scfsi=(1, 0, 0, 0),
    )
    (fr,) = A.decode_mpeg_audio(frame)
    g0, g1 = fr.granules[0][0], fr.granules[1][0]
    assert g0.scalefacs == scf0
    assert g1.scalefacs[:6] == scf0[:6]       # copied group
    assert g1.scalefacs[6:] == scf1[6:]       # freshly read
    assert [int(v) for v in g0.lines[:2]] == [1, -1]
    assert [int(v) for v in g1.lines[:2]] == [-1, 1]


def test_protected_l3_frame_crc():
    frame = _build_l3(
        [{"pairs": [(1, 1, 0, 0)]}, {"pairs": []}], protection=False
    )
    (fr,) = A.decode_mpeg_audio(frame)
    assert [int(v) for v in fr.granules[0][0].lines[:2]] == [1, 1]
    bad = bytearray(frame)
    bad[7] ^= 0x01  # corrupt a covered side-info bit
    with pytest.raises(A.MpegAudioError, match="CRC mismatch"):
        A.decode_mpeg_audio(bytes(bad))


def test_loud_gates():
    good = _payload(1)
    # short/mixed blocks: set window_switching_flag of granule 0
    # (bit 32 + 18 + 12 + 9 + 8 + 4 = 83 into the frame)
    b = bytearray(good)
    pos = 32 + 18 + 33
    b[pos // 8] |= 0x80 >> (pos % 8)
    with pytest.raises(NotImplementedError, match="window_switching"):
        A.decode_mpeg_audio(bytes(b))
    # an unbundled Huffman table gates by id
    frame = _build_l3([{"pairs": [(1, 1, 0, 0)], "table": 1},
                       {"pairs": []}])
    fb = bytearray(frame)
    # table_select[0] of granule 0 starts at bit 48 + 18 + 34
    tpos = 32 + 16 + 18 + 34  # protected=True has no CRC field... see below
    # simpler: rebuild via module fixture and flip its table bits
    ops = M._mpa_l3_ops(1)
    # locate the granule block op carrying the table selects
    raw = M._mpeg_pack(ops)
    raw = bytearray(raw)
    # granule 0 table_select[0] bits are at 32+18+34 .. +39
    start = 32 + 18 + 34
    # set table_select[0] = 16 (an ESC table): bits 10000
    for i, bit in enumerate("10000"):
        byte, off = divmod(start + i, 8)
        if bit == "1":
            raw[byte] |= 0x80 >> off
        else:
            raw[byte] &= ~(0x80 >> off) & 0xFF
    with pytest.raises(NotImplementedError, match="Table 3-B.7"):
        A.decode_mpeg_audio(bytes(raw))
    # reservoir overrun: first frame cannot reach back
    over = bytearray(good[:288])
    # main_data_begin bits are at 32..40
    over[4] = 0xFF
    over[5] |= 0x80
    with pytest.raises(A.MpegAudioError, match="reservoir"):
        A.decode_mpeg_audio(bytes(over))
    # mixed layer stream
    l1 = M._mpeg_pack(M._mpa_l1_ops(1))[:96]
    with pytest.raises(A.MpegAudioError, match="mixed layer"):
        A.decode_mpeg_audio(good[:288] + l1)


def test_mutation_fuzz_never_crashes_untyped():
    """Bit flips anywhere in the stream must either decode or raise a
    TYPED error — never an IndexError/struct crash."""
    base = bytearray(_payload(23))
    for i in range(0, len(base) * 8, 53):
        mut = bytearray(base)
        mut[i // 8] ^= 0x80 >> (i % 8)
        try:
            A.decode_mpeg_audio(bytes(mut))
        except (A.MpegAudioError, NotImplementedError):
            pass


def test_id3v2_envelope_skipped():
    """Crawled MP3s arrive wrapped in an ID3v2 tag: the syncsafe-size
    envelope (with and without the footer flag) is skipped before the
    frame walk; a non-syncsafe size and an overrunning tag gate."""
    audio = _payload(7)
    body = b"TIT2\x00\x00\x00\x05\x00\x00\x00song"
    tag = b"ID3\x04\x00\x00" + bytes(
        [len(body) >> 21 & 0x7F, len(body) >> 14 & 0x7F,
         len(body) >> 7 & 0x7F, len(body) & 0x7F]
    ) + body
    frames = A.decode_mpeg_audio(tag + audio)
    assert len(frames) == 2 and frames[0].layer == 3
    # footer flag adds 10 bytes after the tag body
    tagf = b"ID3\x04\x00\x10" + tag[6:10] + body + b"3DI" + b"\x00" * 7
    assert len(A.decode_mpeg_audio(tagf + audio)) == 2
    # works for layer I/II streams too
    l1 = M._mpeg_pack(M._mpa_l1_ops(3))
    assert len(A.decode_mpeg_audio(tag + l1)) == 2
    with pytest.raises(A.MpegAudioError, match="syncsafe"):
        A.decode_mpeg_audio(b"ID3\x04\x00\x00\x00\x00\x00\x80" + audio)
    with pytest.raises(A.MpegAudioError, match="extends past"):
        A.decode_mpeg_audio(b"ID3\x04\x00\x00\x7f\x7f\x7f\x7f" + audio)


def test_wav_mp3_dispatch_guards(spark):
    """WAVE_FORMAT_MPEGLAYER3 dispatch: the happy path round-trips
    the same frames as the bare elementary stream; a wrong fmt tag, a
    contradicting nBlockSize, and a missing data chunk fail loudly."""
    doc = 6
    docs = spark.createDataFrame([(doc,)], "doc_id long")
    wav = bytes(M.synth_wav_mp3_assets(docs).collect()[0].payload)
    hdr = bytes.fromhex(M._wav_mp3_header_hex())
    assert wav == hdr + _payload(doc)

    rows = M.decode_wav_mp3_stats(
        spark.createDataFrame([(doc, bytearray(wav))],
                              "asset_id long, payload binary")
    ).collect()
    bare = M.decode_mpeg_l3_stats(
        spark.createDataFrame([(doc, bytearray(_payload(doc)))],
                              "asset_id long, payload binary")
    ).collect()
    assert sorted(map(str, rows)) == sorted(map(str, bare))

    def run(b):
        return M.decode_wav_mp3_stats(
            spark.createDataFrame([(1, bytearray(b))],
                                  "asset_id long, payload binary")
        ).collect()

    # stale nBlockSize declaration (fmt body starts at byte 20;
    # nBlockSize at body[24:26])
    bad = bytearray(wav)
    bad[20 + 24 : 20 + 26] = (999).to_bytes(2, "little")
    with pytest.raises(Exception, match="contradicts"):
        run(bytes(bad))
    # wrong fmt tag
    bad2 = bytearray(wav)
    bad2[20] = 0x50
    with pytest.raises(Exception, match="0x0055|MPEGLAYER3"):
        run(bytes(bad2))
    # data chunk renamed away
    bad3 = bytearray(wav)
    at = wav.find(b"data")
    bad3[at : at + 4] = b"junk"
    with pytest.raises(Exception, match="no data chunk"):
        run(bytes(bad3))
