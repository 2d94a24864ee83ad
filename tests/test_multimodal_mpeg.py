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


def test_mpeg_query_plan_zero_exchange(spark):
    """Payload bytes never shuffle: synth + decode + stats is one
    scan-side mapInPandas pipeline with zero Exchange nodes."""
    df = REGISTRY["multimodal_video_mpeg"].fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0
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
