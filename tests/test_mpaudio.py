"""MPEG-1 audio (ISO/IEC 11172-3 layer I/II): fixture byte-equality
between the SQL bit-packer and int-mode ops, decoder-vs-closed-form
equivalence, the exact-integer dequantization contract, the normative
matrixing stage, and every loud gate."""

from __future__ import annotations

import math

import numpy as np
import pytest

from cryptocoininsights_data_engineer_project_spark.operators import multimodal as M
from cryptocoininsights_data_engineer_project_spark.operators import mpaudiocodec as A


def _payload(doc: int, layer: int) -> bytes:
    ops = M._mpa_l1_ops(doc) if layer == 1 else M._mpa_l2_ops(doc)
    return M._mpeg_pack(ops)


def test_sql_fixture_bytes_equal_int_mode(spark):
    """The SQL hex pieces and the int-mode packer must emit the SAME
    stream — the pin that makes the SQL fixture trustworthy."""
    docs = spark.createDataFrame([(3,), (12,)], "doc_id long")
    got = {
        r.asset_id: bytes(r.payload)
        for r in M.synth_mpeg_audio_assets(docs, layer=1).collect()
    }
    assert got[3] == _payload(3, 1) and got[12] == _payload(12, 1)
    got2 = {
        r.asset_id: bytes(r.payload)
        for r in M.synth_mpeg_audio_assets(docs, layer=2).collect()
    }
    assert got2[3] == _payload(3, 2) and got2[12] == _payload(12, 2)
    assert len(got[3]) == 2 * 96 and len(got2[3]) == 2 * 216


def test_decoder_matches_closed_form():
    for doc in (0, 7, 41):
        frames = A.decode_mpeg_audio(_payload(doc, 1))
        assert len(frames) == M.MPA_FRAMES
        for f, fr in enumerate(frames):
            assert fr.layer == 1 and fr.sample_rate == 32000
            for sb, alloc in enumerate(M._MPA_L1_ALLOC):
                nb = alloc + 1
                for g in range(12):
                    c = (
                        doc * M._MPA_L1_A[sb]
                        + g * M._MPA_L1_B[sb]
                        + f * M._MPA_L1_F[sb]
                    ) % ((1 << nb) - 1)  # all-ones code is forbidden
                    assert fr.qnum[g, 0, sb] == c - (1 << (nb - 1)) + 1
        frames2 = A.decode_mpeg_audio(_payload(doc, 2))
        for f, fr in enumerate(frames2):
            assert fr.layer == 2
            for sb, steps in enumerate(M._MPA_L2_STEPS):
                nb = A._L2_NB.get(steps, steps.bit_length())
                off = A._L2_OFFSET.get(steps, 1)
                for s in range(36):
                    g, i = divmod(s, 3)
                    c = (
                        doc * M._MPA_L2_A[sb]
                        + g * M._MPA_L2_B[sb]
                        + i * M._MPA_L2_E[sb]
                        + f * M._MPA_L2_F[sb]
                    ) % steps
                    assert fr.qnum[s, 0, sb] == c - (1 << (nb - 1)) + off


def test_dequantize_exact_dyadic():
    """On the idx%3==0 scalefactor lattice every dequantized value is
    exactly 2*sf*q/steps: value*steps must reproduce 2*sf*q with zero
    float error (sf a power of two, q a small integer)."""
    fr = A.decode_mpeg_audio(_payload(9, 2))[0]
    vals = A.dequantize(fr)
    for sb, steps in enumerate(M._MPA_L2_STEPS):
        for s in range(36):
            part = s // 12
            sf = A.scalefactor(fr.scf[0][sb][part])
            assert sf == 2.0 * 2.0 ** (-fr.scf[0][sb][part] // 3)
            assert vals[s, 0, sb] * steps == 2.0 * sf * fr.qnum[s, 0, sb]


def test_scfsi_expansion():
    """All four sharing patterns: the expanded per-part indices must
    follow the transmitted-field order of the spec."""
    doc, f = 5, 1
    fr = A.decode_mpeg_audio(_payload(doc, 2))[f]
    fld = lambda sb, j: 3 * ((doc + 2 * sb + 3 * j + f) % 4)  # noqa: E731
    assert fr.scf[0][0] == [fld(0, 0), fld(0, 1), fld(0, 2)]  # scfsi 0
    assert fr.scf[0][1] == [fld(1, 0), fld(1, 0), fld(1, 1)]  # scfsi 1
    assert fr.scf[0][2] == [fld(2, 0)] * 3                    # scfsi 2
    assert fr.scf[0][3] == [fld(3, 0), fld(3, 1), fld(3, 1)]  # scfsi 3


def test_matrixing_is_the_normative_cosine_bank():
    """Vectorized matrixing == the literal spec double loop, and the
    DC property: V[16] (i = 16 -> cos((32)(2k+1)pi/64) = 0 except...)
    checked numerically against the direct form."""
    rng = np.random.default_rng(7)
    s = rng.standard_normal(32)
    v = A.matrixing(s)
    direct = np.array(
        [
            sum(
                math.cos((16 + i) * (2 * k + 1) * math.pi / 64) * s[k]
                for k in range(32)
            )
            for i in range(64)
        ]
    )
    assert np.allclose(v, direct, atol=1e-12)
    # mirror symmetry of the bank: V[16+j] = -V[16-j] holds for the
    # cosine arguments ((32+2j)(2k+1)pi/64 vs (32-2j)(2k+1)pi/64)
    assert np.allclose(v[16 + 1 : 32], -v[1:16][::-1], atol=1e-12)
    assert abs(v[16]) < 1e-12


def test_synthesis_gates_without_window_and_runs_with_one():
    fr = A.decode_mpeg_audio(_payload(4, 1))[0]
    vals = A.dequantize(fr)[:, 0, :]
    assert A._SYNTHESIS_WINDOW is None
    with pytest.raises(NotImplementedError, match="3-C.3"):
        A.synthesize(vals)
    try:
        # a registered window (here: a simple sine prototype) unlocks
        # the full FIFO+window pipeline; pin shape and the zero-input
        # -> zero-output property
        w = np.sin(np.arange(512) * math.pi / 512)
        A.register_synthesis_window(w)
        pcm = A.synthesize(vals)
        assert pcm.shape == vals.shape
        assert np.allclose(A.synthesize(np.zeros((5, 32))), 0.0)
        with pytest.raises(A.MpegAudioError):
            A.register_synthesis_window(np.zeros(100))
    finally:
        A._SYNTHESIS_WINDOW = None


def test_loud_gates():
    good = bytearray(_payload(1, 1))
    # reserved layer code (00)
    b = bytearray(good)
    b[1] &= ~0b110
    with pytest.raises(A.MpegAudioError, match="reserved layer"):
        A.decode_mpeg_audio(bytes(b))
    # free-format bitrate
    b = bytearray(good)
    b[2] &= 0x0F
    with pytest.raises(A.MpegAudioError, match="free-format"):
        A.decode_mpeg_audio(bytes(b))
    # bad sync
    with pytest.raises(A.MpegAudioError, match="syncword"):
        A.decode_mpeg_audio(b"\x12\x34\x56\x78" * 30)


def test_l2_table_select_is_the_dist10_rule():
    """The 11172-3 2.4.2.6 table choice over every implemented
    (sampling, kbps/ch) pair, spot-checked against the published
    selection logic."""
    assert A._l2_table_select(48000, 56) == ("a", 27)
    assert A._l2_table_select(48000, 192) == ("a", 27)
    assert A._l2_table_select(44100, 56) == ("a", 27)
    assert A._l2_table_select(44100, 80) == ("a", 27)
    assert A._l2_table_select(32000, 64) == ("a", 27)
    assert A._l2_table_select(44100, 96) == ("b", 30)
    assert A._l2_table_select(32000, 96) == ("b", 30)
    assert A._l2_table_select(44100, 32) == ("c", 8)
    assert A._l2_table_select(48000, 48) == ("c", 8)
    assert A._l2_table_select(32000, 32) == ("d", 12)
    assert A._l2_table_select(32000, 48) == ("d", 12)


def test_l2_high_rate_menus_are_the_spec_tables():
    """Table 3-B.2a/2b menu structure: field widths 4/4/3/2, every
    menu entry either a grouped class (3/5/9) or 2^nb - 1, and the
    per-class ladders match the published tables."""
    assert len(A._L2_HI_NBAL_A) == 27 and len(A._L2_HI_NBAL_B) == 30
    assert A._L2_HI_NBAL_A == A._L2_HI_NBAL_B[:27]
    assert A._l2_hi_steps(0, 1) == 3 and A._l2_hi_steps(0, 2) == 7
    assert A._l2_hi_steps(0, 15) == 65535
    assert A._l2_hi_steps(3, 2) == 5 and A._l2_hi_steps(3, 15) == 65535
    assert A._l2_hi_steps(11, 7) == 65535
    assert A._l2_hi_steps(23, 1) == 3 and A._l2_hi_steps(23, 3) == 65535
    for sb in range(30):
        nbal = A._L2_HI_NBAL_B[sb]
        for a in range(1, (1 << nbal)):
            st = A._l2_hi_steps(sb, a)
            assert st in (3, 5, 9) or (st + 1) & st == 0  # 2^nb - 1


def test_layer1_forbidden_alloc():
    ops = M._mpa_l1_ops(1)
    # first alloc nibble follows the 32-bit header: ops[1] is sb0
    assert ops[1] == ("b", format(M._MPA_L1_ALLOC[0], "04b"))
    ops[1] = ("b", "1111")
    with pytest.raises(A.MpegAudioError, match="forbidden"):
        A.decode_mpeg_audio(M._mpeg_pack(ops))


def test_layer1_forbidden_all_ones_code():
    """steps = 2^nb - 1 (11172-3 layer I): the all-ones sample code is
    out of range and must be rejected, mirroring alloc == 15."""
    ops = M._mpa_l1_ops(1)
    # header + 32 alloc nibbles + 4 scf fields -> first sample op
    first_sample = 1 + 32 + len(M._MPA_L1_ALLOC)
    code, nb = ops[first_sample][1], ops[first_sample][2]
    assert isinstance(code, int) and code < (1 << nb) - 1
    ops[first_sample] = ("b", "1" * nb)
    with pytest.raises(A.MpegAudioError, match="all-ones"):
        A.decode_mpeg_audio(M._mpeg_pack(ops))


def test_l2_48k_48kbps_selects_low_rate_table():
    """(48000, 48) and (44100, 48) kbps/ch are LOW-RATE combos
    (table 3-B.2c, sblimit 8) per the 11172-3 table selection — they
    must decode, not gate as high-rate."""
    hdr = list(M._mpa_header_bits(2))
    hdr[16:20] = list("0010")  # bitrate_index 2 = 48 kbps
    hdr[20:22] = list("01")    # sampling 48 kHz
    bits = "".join(hdr) + "0" * (8 * 4)  # 8 alloc nibbles, all zero
    frame = 144 * 48 * 1000 // 48000  # 144 bytes
    bits += "0" * (frame * 8 - len(bits))
    (fr,) = A.decode_mpeg_audio(M._mpeg_pack([("b", bits)]))
    assert fr.layer == 2 and fr.sample_rate == 48000
    assert all(a == 0 for a in fr.alloc[0])


def test_stereo_independent_channels(spark):
    """Independent stereo (mode 00): channel-major interleaved
    allocation / scalefactor / sample loops with ASYMMETRIC
    allocation between channels; byte-equality of SQL and int-mode
    fixtures; unallocated (ch, sb) slices stay zero."""
    doc = 11
    b = M._mpeg_pack(M._mpa_st_ops(doc))
    assert len(b) == 2 * 192
    docs = spark.createDataFrame([(doc,)], "doc_id long")
    got = {
        r.asset_id: bytes(r.payload)
        for r in M.synth_mpeg_audio_stereo_assets(docs).collect()
    }
    assert got[doc] == b

    frames = A.decode_mpeg_audio(b)
    assert len(frames) == 2
    for f, fr in enumerate(frames):
        assert fr.channels == 2
        for ch in range(2):
            for sb, alloc in M._MPA_ST_ALLOC[ch].items():
                nb = alloc + 1
                for g in range(12):
                    c = (
                        doc * M._MPA_ST_A[(ch, sb)]
                        + g * M._MPA_ST_B[(ch, sb)]
                        + f * M._MPA_ST_F[(ch, sb)]
                    ) % ((1 << nb) - 1)  # all-ones code is forbidden
                    assert fr.qnum[g, ch, sb] == c - (1 << (nb - 1)) + 1
                assert fr.scf[ch][sb] == [
                    3 * ((doc + 2 * sb + ch + f) % 4)
                ]
        # ch1 does not code sb1; ch0 does — asymmetry observable
        assert fr.alloc[0][1] != 0 and fr.alloc[1][1] == 0
        assert fr.qnum[:, 1, 1].sum() == 0


def test_protected_frame_crc():
    """protection_bit = 0 frames verify the 11172-3 2.4.3.1 CRC-16
    (poly 0x8005, init 0xFFFF, header bits 16..31 + side info): a
    correctly-stamped frame decodes, a corrupted allocation nibble or
    a wrong stored CRC raises. The reference CRC here is an
    independent table-free restatement of the spec definition."""

    def ref_crc(bits):
        crc = 0xFFFF
        for bit in bits:
            fb = ((crc >> 15) & 1) ^ bit
            crc = (crc << 1) & 0xFFFF
            if fb:
                crc ^= 0x8005
        return crc

    # build a protected layer-I mono frame: header with protection
    # bit 0, 16-bit crc, then the standard fixture side info/samples
    ops = M._mpa_l1_ops(7)
    hdr = list(M._mpa_header_bits(1))
    hdr[15] = "0"  # protection_bit: CRC present
    # assemble the unprotected body AFTER the header to compute CRC
    body_ops = ops[1:]  # alloc..samples..pad of frame 0 + frame 1
    # frame 1 must be patched identically; simplest: single frame
    f0_end = None
    total = 0
    for i, op in enumerate(body_ops):
        total += len(op[1]) if op[0] == "b" else op[2]
        if total == 96 * 8 - 32:
            f0_end = i + 1
            break
    body_ops = body_ops[:f0_end]
    # protected bits: header[16:32] + 128 allocation bits
    hdr_bits = [int(c) for c in hdr[16:]]
    alloc_bits = []
    for op in body_ops:
        if op[0] == "b" and len(alloc_bits) < 128:
            alloc_bits += [int(c) for c in op[1]]
    alloc_bits = alloc_bits[:128]
    crc = ref_crc(hdr_bits + alloc_bits)
    assert crc == A._crc16_mpa(hdr_bits + alloc_bits)
    frame_ops = (
        [("b", "".join(hdr)), ("b", format(crc, "016b"))]
        + body_ops[:-1]
        # 16 CRC bits displaced the pad: shrink it
        + [("b", body_ops[-1][1][:-16])]
    )
    data = M._mpeg_pack(frame_ops)
    assert len(data) == 96
    fr = A.decode_mpeg_audio(data)
    assert len(fr) == 1 and fr[0].layer == 1

    # corrupt one allocation nibble -> CRC mismatch raises
    bad = bytearray(data)
    bad[6] ^= 0x10  # inside the allocation region
    with pytest.raises(A.MpegAudioError, match="CRC mismatch"):
        A.decode_mpeg_audio(bytes(bad))
    # corrupt the stored CRC itself
    bad2 = bytearray(data)
    bad2[4] ^= 0xFF
    with pytest.raises(A.MpegAudioError, match="CRC mismatch"):
        A.decode_mpeg_audio(bytes(bad2))


def test_mpaudio_fuzz_never_crashes_untyped():
    """Mutation fuzzing (the APNG/FLAC/MRLE discipline that caught
    untyped escapes in earlier codecs): random mutations of valid
    layer I/II/stereo frames, random prefixes behind a syncword, and
    raw noise must only ever raise the TYPED errors (MpegAudioError /
    NotImplementedError) — never IndexError/struct.error/etc."""
    import random

    rng = random.Random(1311)
    seeds = [
        M._mpeg_pack(M._mpa_l1_ops(3)),
        M._mpeg_pack(M._mpa_l2_ops(3)),
        M._mpeg_pack(M._mpa_st_ops(3)),
    ]

    def try_decode(b: bytes):
        try:
            A.decode_mpeg_audio(b)
        except (A.MpegAudioError, NotImplementedError):
            pass

    for _ in range(400):
        base = bytearray(rng.choice(seeds))
        for _k in range(rng.randint(1, 6)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        try_decode(bytes(base))
    for _ in range(200):
        try_decode(bytes(rng.randrange(256) for _ in range(rng.randint(0, 120))))
        # keep the syncword so parsing enters the frame body
        blob = bytearray(rng.randrange(256) for _ in range(rng.randint(4, 200)))
        blob[0] = 0xFF
        blob[1] = 0xFD
        try_decode(bytes(blob))


def test_wav_mpeg_dispatch_guards(spark):
    """WAVE_FORMAT_MPEG dispatch: byte-level container checks — a
    wrong fmt tag, a stale fwHeadLayer declaration, and a missing
    data chunk each fail loudly; the happy path round-trips the same
    frames as the bare elementary stream."""
    doc = 6
    docs = spark.createDataFrame([(doc,)], "doc_id long")
    wav = bytes(
        M.synth_wav_mpeg_assets(docs).collect()[0].payload
    )
    hdr = bytes.fromhex(M._wav_mpeg_header_hex())
    assert wav == hdr + _payload(doc, 1)

    rows = M.decode_wav_mpeg_stats(
        spark.createDataFrame([(doc, bytearray(wav))],
                              "asset_id long, payload binary")
    ).collect()
    bare = M.decode_mpeg_audio_stats(
        spark.createDataFrame([(doc, bytearray(_payload(doc, 1)))],
                              "asset_id long, payload binary")
    ).collect()
    assert sorted(map(str, rows)) == sorted(map(str, bare))

    import pytest

    def run(b):
        return M.decode_wav_mpeg_stats(
            spark.createDataFrame([(1, bytearray(b))],
                                  "asset_id long, payload binary")
        ).collect()

    # stale fwHeadLayer: declare layer 2 (only) over layer-I frames
    bad = bytearray(wav)
    bad[20 + 18] = 2  # fmt body starts at 20; ext layer at +18
    with pytest.raises(Exception, match="exclude"):
        run(bytes(bad))
    # fwHeadLayer is an ACM FLAGS field: LAYER1|LAYER2 = 0x0003 is a
    # legal declaration for layer-I frames and must be accepted
    multi = bytearray(wav)
    multi[20 + 18] = 3
    strip = lambda rs: sorted(  # noqa: E731  (run() pins asset_id=1)
        str({k: v for k, v in r.asDict().items() if k != "asset_id"})
        for r in rs
    )
    assert strip(run(bytes(multi))) == strip(rows)
    # a chunk whose declared size overruns the payload fails loudly
    # instead of silently truncating
    short = bytearray(wav)
    at_data = bytes(wav).find(b"data")
    short[at_data + 4 : at_data + 8] = (2**31).to_bytes(4, "little")
    with pytest.raises(Exception, match="declares"):
        run(bytes(short))
    # wrong fmt tag
    bad2 = bytearray(wav)
    bad2[20] = 1  # WAVE_FORMAT_PCM
    with pytest.raises(Exception, match="0x0050|expected WAVE_FORMAT"):
        run(bytes(bad2))
    # data chunk renamed away
    bad3 = bytearray(wav)
    at = bytes(wav).find(b"data")
    bad3[at:at+4] = b"junk"
    with pytest.raises(Exception, match="no data chunk"):
        run(bytes(bad3))


def test_joint_stereo_intensity_decode(spark):
    """mode 01: byte-equality of SQL and int-mode fixtures; below the
    bound channels decode independently (asymmetric allocation);
    AT/above the bound one transmitted code lands in BOTH channels
    while scalefactors stay per-channel."""
    doc = 9
    b = M._mpeg_pack(M._mpa_js_ops(doc))
    assert len(b) == 2 * 192
    docs = spark.createDataFrame([(doc,)], "doc_id long")
    got = {
        r.asset_id: bytes(r.payload)
        for r in M.synth_mpeg_audio_js_assets(docs).collect()
    }
    assert got[doc] == b

    frames = A.decode_mpeg_audio(b)
    assert len(frames) == 2
    for f, fr in enumerate(frames):
        assert fr.channels == 2
        # independent band: asymmetric (ch1 skips sb1)
        assert fr.alloc[0][1] != 0 and fr.alloc[1][1] == 0
        for (sb, ch), a_const in M._MPA_JS_A_IND.items():
            alloc = M._MPA_JS_IND[sb][ch]
            nb = alloc + 1
            for g in range(12):
                c = (
                    doc * a_const
                    + g * M._MPA_JS_B_IND[(sb, ch)]
                    + f * M._MPA_JS_F_IND[(sb, ch)]
                ) % ((1 << nb) - 1)
                assert fr.qnum[g, ch, sb] == c - (1 << (nb - 1)) + 1
        # intensity bands: SAME numerators both channels, OWN scf
        for sb, alloc in M._MPA_JS_INT.items():
            nb = alloc + 1
            assert fr.alloc[0][sb] == fr.alloc[1][sb] == alloc
            for g in range(12):
                c = (
                    doc * M._MPA_JS_A_INT[sb]
                    + g * M._MPA_JS_B_INT[sb]
                    + f * M._MPA_JS_F_INT[sb]
                ) % ((1 << nb) - 1)
                q = c - (1 << (nb - 1)) + 1
                assert fr.qnum[g, 0, sb] == q == fr.qnum[g, 1, sb]
            assert fr.scf[0][sb] == [3 * ((doc + 2 * sb + 0 + f) % 4)]
            assert fr.scf[1][sb] == [3 * ((doc + 2 * sb + 1 + f) % 4)]


def test_l2_high_rate_decode(spark):
    """Table 3-B.2a: byte-equality of fixtures; per-subband field
    widths and menus decode to the closed form across all four menu
    classes including the 16-bit 65535 ladder top."""
    doc = 5
    b = M._mpeg_pack(M._mpa_l2hr_ops(doc))
    assert len(b) == 2 * 288
    docs = spark.createDataFrame([(doc,)], "doc_id long")
    got = {
        r.asset_id: bytes(r.payload)
        for r in M.synth_mpeg_audio_l2hr_assets(docs).collect()
    }
    assert got[doc] == b

    frames = A.decode_mpeg_audio(b)
    assert len(frames) == 2
    for f, fr in enumerate(frames):
        assert fr.layer == 2 and fr.sample_rate == 48000
        assert fr.channels == 1
        coded = [sb for sb in range(32) if fr.alloc[0][sb]]
        assert coded == sorted(M._MPA_HR_ALLOC)
        for sb, alloc in M._MPA_HR_ALLOC.items():
            steps = A._l2_hi_steps(sb, alloc)
            assert fr.steps[0][sb] == steps
            nb = A._L2_NB.get(steps, steps.bit_length())
            off = A._L2_OFFSET.get(steps, 1)
            for s in range(36):
                g, i = divmod(s, 3)
                c = (
                    doc * M._MPA_HR_A[sb]
                    + g * M._MPA_HR_B[sb]
                    + i * M._MPA_HR_E[sb]
                    + f * M._MPA_HR_F[sb]
                ) % steps
                assert fr.qnum[s, 0, sb] == c - (1 << (nb - 1)) + off


# -------------------------- round 16: MPEG-2.5 + LSF layers I/II


def test_lsf_l2_table_b1_witnesses():
    """Table B.1 transcription witnesses (r16): 30 subbands with
    4/3/2-bit allocation fields; every menu EXACTLY fills its field
    width (15/7/3 nonzero codes); every step count is a grouped
    class (3/5/9) or 2^nb - 1 — so the shared requantization path
    needs no new arithmetic."""
    assert A._L2_LSF_NBAL == [4] * 4 + [3] * 7 + [2] * 19
    for menu, nbal in (
        (A._L2_LSF_MENU_0_3, 4),
        (A._L2_LSF_MENU_4_10, 3),
        (A._L2_LSF_MENU_11_29, 2),
    ):
        assert len(menu) == (1 << nbal) - 1
        for st in menu:
            assert st in (3, 5, 9) or (st + 1) & st == 0, st
        assert menu == sorted(menu)
    # the dispatch covers all 30 subbands with the right menu
    for sb in range(30):
        menu = (
            A._L2_LSF_MENU_0_3 if sb <= 3
            else A._L2_LSF_MENU_4_10 if sb <= 10
            else A._L2_LSF_MENU_11_29
        )
        assert A._l2_lsf_steps(sb, len(menu)) == menu[-1]
        assert A._l2_lsf_steps(sb, 1) == 3


def test_lsf_layers_1_2_decode_closed_form():
    """LSF layer I/II fixtures decode to their closed forms (the
    r15 'LSF layers I/II raise by name' gate is retired)."""
    for doc in (0, 7, 133):
        frames = A.decode_mpeg_audio(M._mpeg_pack(M._mpa_l1lsf_ops(doc)))
        assert [f.layer for f in frames] == [1, 1]
        assert frames[0].sample_rate == 24000 and frames[0].bitrate == 144
        for f, fr in enumerate(frames):
            for sb, alloc in enumerate(M._MPA_L1_ALLOC):
                nb = alloc + 1
                for g in range(12):
                    k = g * M._MPA_L1_B[sb] + f * M._MPA_L1_F[sb]
                    q = (
                        (doc * M._MPA_L1_A[sb] + k) % ((1 << nb) - 1)
                        - (1 << (nb - 1)) + 1
                    )
                    assert fr.qnum[g, 0, sb] == q
        frames = A.decode_mpeg_audio(M._mpeg_pack(M._mpa_l2lsf_ops(doc)))
        assert [f.layer for f in frames] == [2, 2]
        assert frames[0].sample_rate == 24000 and frames[0].bitrate == 64
        for f, fr in enumerate(frames):
            for i, steps in enumerate(M._MPA_L2LSF_STEPS):
                sb = M._MPA_L2LSF_SB[i]
                assert fr.steps[0][sb] == steps
                nb = A._L2_NB.get(steps, steps.bit_length())
                off = A._L2_OFFSET.get(steps, 1)
                for s in range(36):
                    g, j = divmod(s, 3)
                    k = (
                        g * M._MPA_L2LSF_B[i] + j * M._MPA_L2LSF_E[i]
                        + f * M._MPA_L2LSF_F[i]
                    )
                    q = (
                        (doc * M._MPA_L2LSF_A[i] + k) % steps
                        - (1 << (nb - 1)) + off
                    )
                    assert fr.qnum[s, 0, sb] == q


def test_lsf_sql_fixtures_byte_equal(spark):
    docs = spark.createDataFrame([(6,), (133,)], "doc_id long")
    for layer, ops in ((1, M._mpa_l1lsf_ops), (2, M._mpa_l2lsf_ops)):
        got = {
            r.asset_id: bytes(r.payload)
            for r in M.synth_mpeg_audio_lsf_assets(docs, layer).collect()
        }
        assert got[6] == M._mpeg_pack(ops(6))
        assert got[133] == M._mpeg_pack(ops(133))
    got = {
        r.asset_id: bytes(r.payload)
        for r in M.synth_mpeg_audio_l3m25_assets(docs).collect()
    }
    assert got[6] == M._mpeg_pack(M._mpa_l3m25_ops(6))
    got = {
        r.asset_id: bytes(r.payload)
        for r in M.synth_mpeg_audio_l2pcm_assets(docs).collect()
    }
    assert got[133] == M._mpeg_pack(M._mpa_l2pcm_ops(133))


def test_lsf_l2_protected_frame_crc():
    """The CRC side-information walk covers the Table B.1
    allocation-field widths (r16): a protected LSF layer-II frame
    with a spec-true CRC decodes; a flipped allocation bit raises
    the mismatch."""
    ops = M._mpa_l2lsf_ops(7)
    raw = bytearray(M._mpeg_pack(ops)[:384])  # frame 0 only
    raw[1] &= 0xFE  # protection_bit 0: CRC present
    # splice a 16-bit CRC slot after the header
    body = bytes(raw[:4]) + b"\x00\x00" + bytes(raw[4:-2])
    covered = [(body[i // 8] >> (7 - i % 8)) & 1 for i in range(16, 32)]
    covered += A._protected_side_bits(
        body, 2, 24000, 64, 1, 32, 48, lsf=True
    )
    crc = A._crc16_mpa(covered)
    good = body[:4] + crc.to_bytes(2, "big") + body[6:]
    fr = A.decode_mpeg_audio(good)[0]
    assert fr.layer == 2 and fr.steps[0][0] == 7
    bad = bytearray(good)
    bad[6] ^= 0x80  # first allocation bit
    with pytest.raises(A.MpegAudioError, match="CRC"):
        A.decode_mpeg_audio(bytes(bad))


# ----------------------------- round 16: PCM synthesis (seam demo)


def test_synthesize_exact_integer_path():
    """The registered rational-row window makes the FULL filterbank
    (matrixing + FIFO + U-build + windowing + fold) integer-exact:
    pcm[t][16]·31/4 equals the closed form and every other output
    column is exactly 0.0 — pinning the FIFO epoch parity, the
    figure 3-A.2 U indexing, and the output fold in one shot."""
    A.register_synthesis_window(M.MP2_PCM_WINDOW)
    try:
        for doc in (0, 7, 133):
            frames = A.decode_mpeg_audio(
                M._mpeg_pack(M._mpa_l2pcm_ops(doc))
            )
            sub = np.concatenate(
                [A.dequantize(fr)[:, 0, :] for fr in frames], axis=0
            )
            pcm = A.synthesize(sub)
            assert np.abs(np.delete(pcm, 16, axis=1)).max() == 0.0
            nums = np.rint(pcm[:, 16] * 31.0 / 4.0).astype(np.int64)

            def c(t, sb):
                return (doc * 3 + 5 * t + 7 * sb) % 31

            for t in range(72):
                want = -sum(
                    (i + 1) * sum(c(t - 2 * i - 1, sb) - 15
                                  for sb in range(4))
                    for i in range(8) if t - 2 * i - 1 >= 0
                )
                assert nums[t] == want
            assert np.abs(pcm[:, 16] * 31 / 4 - nums).max() < 1e-9
    finally:
        A.install_synthesis_window(None)


def test_synthesis_window_ships_to_spark_workers(spark):
    """ADVICE-r15 discipline for the window seam: a driver-side
    register_synthesis_window call must reach the mapInPandas
    decode path via the snapshot captured at plan-build time."""
    A.register_synthesis_window(M.MP2_PCM_WINDOW)
    try:
        docs = spark.createDataFrame([(7,)], "doc_id long")
        rows = (
            M.decode_mpeg_l2_pcm(M.synth_mpeg_audio_l2pcm_assets(docs))
            .orderBy("t")
            .collect()
        )
        assert len(rows) == 72
        assert all(r["side_leak"] == 0 for r in rows)

        def c(t, sb):
            return (7 * 3 + 5 * t + 7 * sb) % 31

        for r in rows[:10]:
            t = r["t"]
            want = -sum(
                (i + 1) * sum(c(t - 2 * i - 1, sb) - 15 for sb in range(4))
                for i in range(8) if t - 2 * i - 1 >= 0
            )
            assert r["pcm_num"] == want
    finally:
        A.install_synthesis_window(None)
