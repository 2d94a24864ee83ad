"""The MPEG-1 registry fixture (multimodal_video_mpeg): the SQL-built
stream must be a byte-exact valid stream (pinned against the
independent mpegcodec.encode_mpeg1 syntax writer), the oracle's
no-clamp precondition must hold, and the plan must move payload bytes
zero times. Full oracle parity runs in the registry-wide sweep
(tests/test_oracle_parity.py); codec round-trips live in
tests/test_mpeg.py.
"""

from __future__ import annotations

import contextlib
import io
import re

import numpy as np

import cryptocoininsights_data_engineer_project_spark.operators.multimodal as mm
from cryptocoininsights_data_engineer_project_spark.operators import mpegcodec as m
from cryptocoininsights_data_engineer_project_spark.queries import REGISTRY, _t

SF = "/root/testdata/sf0.001"


def _encoder_spec(d: int) -> m.SequenceSpec:
    """The fixture's content restated through the ENCODER's API — an
    independent spelling of the same stream (picture specs, not bit
    ops), so layout drift between the SQL builder and the codec's
    tables fails loudly."""
    P = lambda n: mm._mpeg_param(n, d)  # noqa: E731

    def intra_f0(mb):
        return m.IntraMB(dc_diffs=(
            16 + P(f"e{mb}0"), -(16 + P(f"e{mb}1")),
            16 + P(f"e{mb}2"), -(16 + P(f"e{mb}3")),
            8 + P(f"c0{mb}"), -(8 + P(f"c1{mb}")),
        ))

    pic0 = m.PictureSpec(
        ptype=1, qscale=5,
        slices=[[intra_f0(mb)] for mb in range(4)], temporal_reference=0,
    )
    pic1 = m.PictureSpec(ptype=2, qscale=5, slices=[[
        m.InterMB(mv=(4, 2), blocks={0: [(0, P("Ldc")), (9, P("Lac"))]},
                  force_escape=True),
        m.InterMB(mv=(-4, 6)),
        m.SkipMB(),
        m.InterMB(mv=(-3, 0)),
    ]], temporal_reference=1)
    pic2 = m.PictureSpec(ptype=2, qscale=5, slices=[[
        m.IntraMB(dc_diffs=(
            16 + P("g0"), -(16 + P("g1")), 16 + P("g2"), -(16 + P("g3")),
            8 + P("h0"), -(8 + P("h1")),
        )),
        m.InterMB(mv=None, blocks={4: [(0, P("Lcb"))]}, force_escape=True),
        m.SkipMB(),
        m.InterMB(mv=(0, -2)),
    ]], temporal_reference=2)
    return m.SequenceSpec(32, 32, [pic0, pic1, pic2])


def test_fixture_bytes_equal_independent_encoder():
    for d in range(24):
        assert mm.mpeg_payload_bytes(d) == m.encode_mpeg1(_encoder_spec(d))


def test_spark_built_payload_equals_python_bytes(spark):
    docs = _t(spark, SF, "documents").limit(8)
    rows = mm.synth_mpeg_assets(docs).collect()
    assert len(rows) == 8
    for r in rows:
        assert bytes(r.payload) == mm.mpeg_payload_bytes(r.asset_id)


def test_no_clamp_precondition():
    """The closed-form oracle has no LEAST/GREATEST: every
    reconstructed sample must stay strictly inside [0, 255] across
    the whole parameter lattice. The parameters are periodic in
    doc_id with period lcm(16, 8, 2) * ... <= 720720, but every
    field's residue is determined by doc_id mod 720720's divisors;
    scanning doc_id 0..1679 covers all (mod 16, mod 8, mod 2)
    combinations each formula can take (lcm of the moduli = 16, and
    16 * 105 coprime shifts is overkill but cheap)."""
    for d in range(0, 1680, 7):
        _, _, frames = m.decode_mpeg1(mm.mpeg_payload_bytes(d))
        for planes in frames:
            for p in planes:
                assert 1 <= int(p.min()) and int(p.max()) <= 254, d


def test_mpeg_query_plan_payloads_never_shuffle(spark):
    """Payload bytes never shuffle: the ONLY Exchange is the
    pre-synthesis repartition of the 8-byte doc_id frame (the
    fixture corpus is one parquet partition — without it the
    per-document decode serializes onto one worker); synthesis and
    decode run in the same task after it."""
    df = REGISTRY["multimodal_video_mpeg"].fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    # the Exchange's input schema is doc_id alone — no payload column
    # exists yet at that point in the plan
    m = re.search(r"\(\d+\) Exchange\nInput \[1\]: \[doc_id#\d+L?\]", plan)
    assert m, plan[:2000]
    assert "Scan parquet" in plan


def test_decoded_planes_match_reference_composition(spark):
    """End-to-end spot check: decode the Spark-built payload and
    verify frame 1's MB3 half-pel block and frame 2's skip against a
    straight-numpy reference prediction (independent of both the
    decoder's _predict and the oracle SQL)."""
    docs = _t(spark, SF, "documents").limit(3)
    for r in mm.synth_mpeg_assets(docs).collect():
        _, _, frames = m.decode_mpeg1(bytes(r.payload))
        y0 = frames[0][0].astype(np.int64)
        y1 = frames[1][0].astype(np.int64)
        y2 = frames[2][0].astype(np.int64)
        # frame 1 MB3: mv (-3, 0) -> int -2, half x
        a = y0[16:32, 14:30]
        b = y0[16:32, 15:31]
        assert (y1[16:32, 16:32] == (a + b + 1) >> 1).all()
        # frame 1 MB2 skipped
        assert (y1[16:32, :16] == y0[16:32, :16]).all()
        # frame 2 MB2 skipped, MB3 mv (0,-2)
        assert (y2[16:32, :16] == y1[16:32, :16]).all()
        assert (y2[16:32, 16:32] == y1[15:31, 16:32]).all()


# ----------------------------------------------- B-picture fixture


def _encoder_spec_b(d: int) -> m.SequenceSpec:
    """multimodal_video_mpeg_b's content restated through the
    encoder's API (independent spelling; see _encoder_spec)."""
    P = lambda n: mm._mpeg_b_param(n, d)  # noqa: E731

    def intra(p0, p1, p2, p3, c0, c1):
        return m.IntraMB(dc_diffs=(
            16 + P(p0), -(16 + P(p1)), 16 + P(p2), -(16 + P(p3)),
            8 + P(c0), -(8 + P(c1)),
        ))

    pic_i = m.PictureSpec(ptype=1, qscale=5, temporal_reference=0, slices=[
        [intra(f"f{mb}0", f"f{mb}1", f"f{mb}2", f"f{mb}3",
               f"d0{mb}", f"d1{mb}")]
        for mb in range(4)
    ])
    pic_p = m.PictureSpec(ptype=2, qscale=5, temporal_reference=2, slices=[[
        m.InterMB(mv=(4, 0)),
        intra("gb0", "gb1", "gb2", "gb3", "hb0", "hb1"),
        m.SkipMB(),
        m.InterMB(mv=(0, -4)),
    ]])
    pic_b = m.PictureSpec(ptype=3, qscale=5, temporal_reference=1, slices=[[
        m.InterMB(mv=(2, 0), mv_b=(0, 2)),
        m.InterMB(mv_b=(0, 0), blocks={0: [(0, P("Lb"))]},
                  force_escape=True),
        m.SkipMB(),
        m.InterMB(mv=(-3, 0)),
    ]])
    return m.SequenceSpec(32, 32, [pic_i, pic_p, pic_b])


def test_b_fixture_bytes_equal_independent_encoder():
    for d in range(24):
        assert mm.mpeg_b_payload_bytes(d) == m.encode_mpeg1(_encoder_spec_b(d))


def test_b_spark_built_payload_equals_python_bytes(spark):
    docs = _t(spark, SF, "documents").limit(8)
    rows = mm.synth_mpeg_b_assets(docs).collect()
    assert len(rows) == 8
    for r in rows:
        assert bytes(r.payload) == mm.mpeg_b_payload_bytes(r.asset_id)


def test_b_no_clamp_precondition():
    for d in range(0, 1680, 7):
        _, _, frames = m.decode_mpeg1(mm.mpeg_b_payload_bytes(d))
        for planes in frames:
            for p in planes:
                assert 1 <= int(p.min()) and int(p.max()) <= 254, d


def test_b_query_plan_payloads_never_shuffle(spark):
    df = REGISTRY["multimodal_video_mpeg_b"].fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    m = re.search(r"\(\d+\) Exchange\nInput \[1\]: \[doc_id#\d+L?\]", plan)
    assert m, plan[:2000]
    assert "Scan parquet" in plan


def test_b_decoded_planes_match_reference_composition(spark):
    """Display order is I B P; the B frame (index 1) is verified
    against straight-numpy predictions over the decoded I (index 0)
    and P (index 2) planes — interpolated average, backward residual,
    B-skip repeat, and forward half-pel."""
    docs = _t(spark, SF, "documents").limit(3)
    for r in mm.synth_mpeg_b_assets(docs).collect():
        _, _, frames = m.decode_mpeg1(bytes(r.payload))
        assert len(frames) == 3
        yI = frames[0][0].astype(np.int64)
        yB = frames[1][0].astype(np.int64)
        yP = frames[2][0].astype(np.int64)
        # display reorder sanity: frame 2 is the P picture (its MB0
        # samples the I frame at (x+2, y))
        assert (yP[:16, :16] == yI[:16, 2:18]).all()
        # B MB0 interpolated: fwd (2,0) from I, bwd (0,2) from P
        f = yI[:16, 1:17]
        b = yP[1:17, :16]
        assert (yB[:16, :16] == (f + b + 1) >> 1).all()
        # B MB1: backward co-located + flat escape residual on Y0
        resid = (10 * mm._mpeg_b_param("Lb", int(r.asset_id)) + 9) // 8
        assert (yB[:8, 16:24] == yP[:8, 16:24] + resid).all()
        assert (yB[8:16, 16:32] == yP[8:16, 16:32]).all()
        # B MB2 skipped: repeats MB1's backward (0,0) -> the P plane
        assert (yB[16:32, :16] == yP[16:32, :16]).all()
        # B MB3: forward half-pel (-3,0) from the I reference
        a = yI[16:32, 14:30]
        c = yI[16:32, 15:31]
        assert (yB[16:32, 16:32] == (a + c + 1) >> 1).all()


def test_d_fixture_bytes_equal_encoder(spark):
    """The D-picture SQL fixture == int-mode ops == the independent
    encode_mpeg1 syntax writer, for several documents (the same
    one-spec-two-emitters pin as the I/P/B fixture)."""
    from cryptocoininsights_data_engineer_project_spark.operators import (
        mpegcodec as m,
        multimodal as M,
    )

    def dspec(doc):
        diffs = M._mpeg_d_diffs(doc)
        pics = []
        for f in range(2):
            slices = []
            for sl in range(2):
                mbs = []
                for j in range(2):
                    luma, cb, cr = diffs[f][2 * sl + j]
                    dcs = [s * (16 + p) for s, p in luma] + [
                        cb[0] * (8 + cb[1]),
                        cr[0] * (8 + cr[1]),
                    ]
                    mbs.append(
                        m.IntraMB(dc_diffs=dcs, ac=[{} for _ in range(6)])
                    )
                slices.append(mbs)
            pics.append(
                m.PictureSpec(
                    ptype=4, temporal_reference=f, slices=slices, qscale=5
                )
            )
        return m.SequenceSpec(width=32, height=32, pictures=pics)

    docs = spark.createDataFrame([(2,), (9,)], "doc_id long")
    got = {
        r.asset_id: bytes(r.payload)
        for r in M.synth_mpeg_d_assets(docs).collect()
    }
    for doc in (2, 9):
        ints = M._mpeg_pack(M._mpeg_d_ops(doc))
        enc = m.encode_mpeg1(dspec(doc))
        assert got[doc] == ints == enc
