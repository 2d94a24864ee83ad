"""MPEG-1 video codec round-trips (operators/mpegcodec.py).

The encoder is a syntax writer and the decoder a spec (ISO/IEC
11172-2) subset; these tests pin the pair against STRAIGHT-NUMPY
reference reconstructions written independently in the test (spelled
via prediction/dequant math, not by calling decoder internals), so a
shared bug in the VLC tables cannot silently cancel out on the pixel
math side. The registry fixture's byte-level agreement with the
encoder is pinned in test_multimodal_mpeg.py.
"""

from __future__ import annotations

import numpy as np
import pytest

from cryptocoininsights_data_engineer_project_spark.operators import mpegcodec as m


def intra(d0, d1, d2, d3, dcb, dcr, **kw):
    return m.IntraMB(dc_diffs=(d0, d1, d2, d3, dcb, dcr), **kw)


def pic_i(temporal_reference=0):
    """Four-slice I-picture over a 32x32 frame, flat DC-only blocks."""
    return m.PictureSpec(
        ptype=1,
        qscale=5,
        slices=[
            [intra(20, -18, 17, -19, 9, -10)],
            [intra(25, -20, 16, -16, 8, -8)],
            [intra(30, -25, 20, -20, 10, -9)],
            [intra(16, -31, 31, -16, 15, -15)],
        ],
        temporal_reference=temporal_reference,
    )


def predict(plane, x0, y0, size, rx, ry):
    """Reference half-pel forward prediction (independent spelling)."""
    px, hx = rx >> 1, rx & 1
    py, hy = ry >> 1, ry & 1
    xs, ys = x0 + px, y0 + py
    p = plane.astype(np.int64)
    a = p[ys : ys + size, xs : xs + size]
    if hx and hy:
        b = p[ys : ys + size, xs + 1 : xs + 1 + size]
        c = p[ys + 1 : ys + 1 + size, xs : xs + size]
        d = p[ys + 1 : ys + 1 + size, xs + 1 : xs + 1 + size]
        return (a + b + c + d + 2) >> 2
    if hx:
        return (a + p[ys : ys + size, xs + 1 : xs + 1 + size] + 1) >> 1
    if hy:
        return (a + p[ys + 1 : ys + 1 + size, xs : xs + size] + 1) >> 1
    return a


def deq_non_intra(level, q=5, w=16):
    mag = (2 * abs(level) + 1) * q * w // 16
    v = mag if level > 0 else -mag
    if v and v % 2 == 0:
        v -= 1 if v > 0 else -1
    return v


def test_i_frame_flat_dc_round_trip():
    data = m.encode_mpeg1(m.SequenceSpec(32, 32, [pic_i()]))
    w, h, frames = m.decode_mpeg1(data)
    assert (w, h, len(frames)) == (32, 32, 1)
    y, cb, cr = frames[0]
    # per-MB DC chains from 128 (per-slice predictor reset)
    assert (y[0:8, 0:8] == 148).all() and (y[0:8, 8:16] == 130).all()
    assert (y[8:16, 0:8] == 147).all() and (y[8:16, 8:16] == 128).all()
    assert (y[0:8, 16:24] == 153).all()  # slice 2 resets to 128+25
    assert (cb[0:8, 0:8] == 137).all() and (cr[0:8, 0:8] == 118).all()
    assert (cb[8:16, 8:16] == 143).all() and (cr[8:16, 8:16] == 113).all()


def test_p_frame_mc_halfpel_skip_residual():
    """One P-picture exercising every P macroblock class: MC+coded
    with an escape-coded residual, MC-not-coded, skipped (co-located
    copy), and a half-pel vector, checked block-by-block against the
    reference prediction math."""
    resid = [(0, 40), (9, 12)]  # DC + AC at zigzag index 10
    pic1 = m.PictureSpec(
        ptype=2,
        qscale=5,
        slices=[[
            m.InterMB(mv=(4, 2), blocks={0: resid}, force_escape=True),
            m.InterMB(mv=(-4, 6)),
            m.SkipMB(),
            m.InterMB(mv=(-3, -3)),  # 4-tap half-pel corner
        ]],
        temporal_reference=1,
    )
    data = m.encode_mpeg1(m.SequenceSpec(32, 32, [pic_i(), pic1]))
    _, _, frames = m.decode_mpeg1(data)
    y0, cb0, cr0 = (p.astype(np.int64) for p in frames[0])
    y1, cb1, cr1 = (p.astype(np.int64) for p in frames[1])

    d, a = deq_non_intra(40), deq_non_intra(12)
    assert (d, a) == (405, 125)
    s = np.array([1, -1, -1, 1, 1, -1, -1, 1])
    res = np.rint((d + np.outer(s * a, np.ones(8))) / 8).astype(np.int64)
    expect = np.clip(predict(y0, 0, 0, 16, 4, 2)[:8, :8] + res, 0, 255)
    assert (y1[:8, :8] == expect).all()
    assert (y1[:16, 8:16] == predict(y0, 0, 0, 16, 4, 2)[:16, 8:16]).all()
    assert (cb1[:8, :8] == predict(cb0, 0, 0, 8, 2, 1)).all()
    assert (y1[:16, 16:32] == predict(y0, 16, 0, 16, -4, 6)).all()
    assert (cr1[:8, 8:16] == predict(cr0, 8, 0, 8, -2, 3)).all()
    assert (y1[16:32, :16] == y0[16:32, :16]).all()  # skip
    assert (cb1[8:16, :8] == cb0[8:16, :8]).all()
    assert (y1[16:32, 16:32] == predict(y0, 16, 16, 16, -3, -3)).all()
    assert (cb1[8:16, 8:16] == predict(cb0, 8, 8, 8, -1, -1)).all()


def test_three_frame_chain_intra_in_p():
    resid = [(0, 40), (9, 12)]
    pic1 = m.PictureSpec(ptype=2, qscale=5, slices=[[
        m.InterMB(mv=(4, 2), blocks={0: resid}, force_escape=True),
        m.InterMB(mv=(-4, 6)),
        m.SkipMB(),
        m.InterMB(mv=(-3, 0)),
    ]], temporal_reference=1)
    pic2 = m.PictureSpec(ptype=2, qscale=5, slices=[[
        intra(22, -20, 18, -18, 11, -11),
        m.InterMB(mv=None, blocks={4: [(0, 30)]}, force_escape=True),
        m.SkipMB(),
        m.InterMB(mv=(0, -2)),
    ]], temporal_reference=2)
    data = m.encode_mpeg1(m.SequenceSpec(32, 32, [pic_i(), pic1, pic2]))
    _, _, frames = m.decode_mpeg1(data)
    y1, cb1, cr1 = (p.astype(np.int64) for p in frames[1])
    y2, cb2, cr2 = (p.astype(np.int64) for p in frames[2])
    assert (y2[:8, :8] == 150).all() and (y2[:8, 8:16] == 130).all()
    assert (cb2[:8, :8] == 139).all() and (cr2[:8, :8] == 117).all()
    # no-MC coded MB: luma copied, Cb gets round(deq(30)/8) = 38
    assert deq_non_intra(30) == 305
    assert (y2[:16, 16:32] == y1[:16, 16:32]).all()
    assert (cb2[:8, 8:16] == np.clip(cb1[:8, 8:16] + 38, 0, 255)).all()
    assert (cr2[:8, 8:16] == cr1[:8, 8:16]).all()
    assert (y2[16:32, :16] == y1[16:32, :16]).all()
    assert (y2[16:32, 16:32] == y1[15:31, 16:32]).all()
    assert (cb2[8:16, 8:16] == predict(cb1, 8, 8, 8, 0, -1)).all()


def test_full_pel_and_f_code_2():
    """full_pel_forward_vector doubles the coded vector; f_code=2
    appends one residual bit to non-zero motion codes."""
    pic1 = m.PictureSpec(ptype=2, qscale=5, full_pel=True, f_code=2,
                         slices=[[
                             m.InterMB(mv=(4, 2)),   # coded (2,1), doubled
                             m.InterMB(mv=(-8, 6)),
                             m.SkipMB(),
                             m.InterMB(mv=(-6, 0)),
                         ]],
                         temporal_reference=1)
    data = m.encode_mpeg1(m.SequenceSpec(32, 32, [pic_i(), pic1]))
    _, _, frames = m.decode_mpeg1(data)
    y0 = frames[0][0].astype(np.int64)
    y1 = frames[1][0].astype(np.int64)
    assert (y1[:16, :16] == predict(y0, 0, 0, 16, 4, 2)).all()
    assert (y1[:16, 16:32] == predict(y0, 16, 0, 16, -8, 6)).all()
    assert (y1[16:32, 16:32] == predict(y0, 16, 16, 16, -6, 0)).all()


def test_intra_ac_with_custom_matrices():
    """Intra AC coefficients through LOADED (zigzag-transmitted)
    quant matrices; expected pixels from the closed-form basis at
    vertical frequency 4 (the exactly-representable slot)."""
    qm = np.full((8, 8), 16, dtype=np.int64)
    mb = intra(20, -18, 17, -19, 9, -10)
    mb.ac[0][10] = 7   # zigzag 10 = (4,0): s(y) pattern
    mb.ac[5][10] = -3
    pic = m.PictureSpec(ptype=1, qscale=5, slices=[
        [mb], [intra(25, -20, 16, -16, 8, -8)],
        [intra(30, -25, 20, -20, 10, -9)],
        [intra(16, -31, 31, -16, 15, -15)],
    ])
    data = m.encode_mpeg1(
        m.SequenceSpec(32, 32, [pic], intra_qm=qm, non_intra_qm=qm)
    )
    _, _, frames = m.decode_mpeg1(data)
    y, cb, cr = (p.astype(np.int64) for p in frames[0])
    # intra AC dequant with W=16: (2*7*5*16)//16 = 70 -> oddified 69
    ac = 69
    s = np.array([1, -1, -1, 1, 1, -1, -1, 1])
    add = np.where(s > 0, (ac + 4) // 8, -((ac + 4) // 8))
    for j in range(8):
        assert (y[j, :8] == 148 + add[j]).all()
    ac2 = 29  # (2*3*5*16)//16 = 30 -> 29, negative level
    add2 = np.where(s > 0, -((ac2 + 4) // 8), (ac2 + 4) // 8)
    for j in range(8):
        assert (cr[j, :8] == 118 + add2[j]).all()
    assert (cb[:8, :8] == 137).all()


def test_escape_level_16bit_extensions():
    """2.4.3.7 escape levels beyond +-127 use the 0x00/0x80 16-bit
    forms; exercise both signs (clamped at the pixel stage)."""
    pic1 = m.PictureSpec(ptype=2, qscale=1, slices=[[
        m.InterMB(mv=(0, 0), blocks={0: [(0, 200)]}, force_escape=True),
        m.InterMB(mv=(0, 0), blocks={0: [(0, -200)]}, force_escape=True),
        m.SkipMB(),
        m.InterMB(mv=(0, 0)),
    ]], temporal_reference=1)
    data = m.encode_mpeg1(m.SequenceSpec(32, 32, [pic_i(), pic1]))
    _, _, frames = m.decode_mpeg1(data)
    y0 = frames[0][0].astype(np.int64)
    y1 = frames[1][0].astype(np.int64)
    d = deq_non_intra(200, q=1)
    assert d == 401
    add = round(d / 8)
    assert (y1[:8, :8] == np.clip(y0[:8, :8] + add, 0, 255)).all()
    assert (y1[:8, 16:24] == np.clip(y0[:8, 16:24] - add, 0, 255)).all()


def test_vlc_coded_residuals_match_escape_coded():
    """The same residual through table B.5 codewords and through
    escape coding must reconstruct identically."""
    resid = [(0, 3), (1, -2), (4, 1)]
    frames_by_mode = []
    for force in (False, True):
        pic1 = m.PictureSpec(ptype=2, qscale=5, slices=[[
            m.InterMB(mv=(0, 0), blocks={i: list(resid) for i in range(6)},
                      force_escape=force),
            m.InterMB(mv=(0, 0)),
            m.SkipMB(),
            m.InterMB(mv=(0, 0)),
        ]], temporal_reference=1)
        data = m.encode_mpeg1(m.SequenceSpec(32, 32, [pic_i(), pic1]))
        frames_by_mode.append(m.decode_mpeg1(data)[2][1])
    for a, b in zip(frames_by_mode[0], frames_by_mode[1]):
        assert (a == b).all()


def test_mba_escape_wide_picture():
    """Increment > 33 (escape +33) across a 35-macroblock-wide row."""
    mbs = 35
    row = [intra(16, 0, 0, 0, 8, -8) for _ in range(mbs)]
    pic0 = m.PictureSpec(ptype=1, qscale=5, slices=[row])
    pic1 = m.PictureSpec(ptype=2, qscale=5, slices=[[
        m.InterMB(mv=(2, 0), blocks={0: [(0, 8)]}),
        *[m.SkipMB() for _ in range(mbs - 2)],
        m.InterMB(mv=(0, 0), blocks={0: [(0, 8)]}),
    ]], temporal_reference=1)
    data = m.encode_mpeg1(m.SequenceSpec(mbs * 16, 16, [pic0, pic1]))
    w, h, frames = m.decode_mpeg1(data)
    assert (w, h) == (mbs * 16, 16)
    y0 = frames[0][0].astype(np.int64)
    y1 = frames[1][0].astype(np.int64)
    # middle 33 MBs are skipped copies
    assert (y1[:, 16 : 16 * (mbs - 1)] == y0[:, 16 : 16 * (mbs - 1)]).all()
    add = round(deq_non_intra(8) / 8)
    assert (y1[:8, 16 * (mbs - 1) : 16 * (mbs - 1) + 8]
            == np.clip(y0[:8, 16 * (mbs - 1) : 16 * (mbs - 1) + 8] + add,
                       0, 255)).all()


def test_quantizer_update_mid_slice():
    pic1 = m.PictureSpec(ptype=2, qscale=2, slices=[[
        m.InterMB(mv=(0, 0), blocks={0: [(0, 10)]}),
        m.InterMB(mv=(0, 0), blocks={0: [(0, 10)]}, new_qscale=10),
        m.SkipMB(),
        m.InterMB(mv=(0, 0), blocks={0: [(0, 10)]}),
    ]], temporal_reference=1)
    data = m.encode_mpeg1(m.SequenceSpec(32, 32, [pic_i(), pic1]))
    _, _, frames = m.decode_mpeg1(data)
    y0 = frames[0][0].astype(np.int64)
    y1 = frames[1][0].astype(np.int64)
    lo = round(deq_non_intra(10, q=2) / 8)   # before the update
    hi = round(deq_non_intra(10, q=10) / 8)  # after (persists in slice)
    assert (y1[:8, :8] == np.clip(y0[:8, :8] + lo, 0, 255)).all()
    assert (y1[:8, 16:24] == np.clip(y0[:8, 16:24] + hi, 0, 255)).all()
    assert (y1[16:24, 16:24] == np.clip(y0[16:24, 16:24] + hi, 0, 255)).all()


def pic_p_simple(temporal_reference=2):
    """P-picture whose every macroblock differs from the I reference
    (so B tests can tell the two references apart)."""
    return m.PictureSpec(ptype=2, qscale=5, slices=[[
        m.InterMB(mv=(0, 0), blocks={0: [(0, 10)]}),
        m.InterMB(mv=(-2, 0)),
        m.InterMB(mv=(0, 0), blocks={0: [(0, 20)]}),
        m.InterMB(mv=(0, -2)),
    ]], temporal_reference=temporal_reference)


def test_b_picture_modes_and_display_reorder():
    """One B-picture exercising every non-intra B macroblock class —
    interpolated (fwd+bwd average), backward-only with an escape-coded
    residual, skipped (repeat previous prediction), and forward-only
    half-pel whose delta proves the forward predictor is RETAINED
    across a backward-only macroblock — checked against reference
    prediction math over the decoded I and P planes. Coding order
    I P B must come out in display order I B P."""
    pic_b = m.PictureSpec(ptype=3, qscale=5, slices=[[
        m.InterMB(mv=(2, 0), mv_b=(0, 2)),   # interpolated, not coded
        m.InterMB(mv_b=(0, 0), blocks={0: [(0, 12)]}, force_escape=True),
        m.SkipMB(),                          # repeats backward (0, 0)
        m.InterMB(mv=(-3, 0)),               # fwd half-pel; delta -5 from
                                             # the RETAINED predictor (2,0)
    ]], temporal_reference=1)
    data = m.encode_mpeg1(
        m.SequenceSpec(32, 32, [pic_i(), pic_p_simple(), pic_b])
    )
    _, _, frames = m.decode_mpeg1(data)
    assert len(frames) == 3
    yI, cbI, crI = (p.astype(np.int64) for p in frames[0])
    yB, cbB, crB = (p.astype(np.int64) for p in frames[1])
    yP, cbP, crP = (p.astype(np.int64) for p in frames[2])
    # display order: frame 2 is the P picture (I + residual on MB0 Y0)
    add = round(deq_non_intra(10) / 8)
    assert (yP[:8, :8] == np.clip(yI[:8, :8] + add, 0, 255)).all()
    # MB0: interpolated = (fwd + bwd + 1) >> 1, per plane
    f_y = predict(yI, 0, 0, 16, 2, 0)
    b_y = predict(yP, 0, 0, 16, 0, 2)
    assert (yB[:16, :16] == (f_y + b_y + 1) >> 1).all()
    f_c = predict(cbI, 0, 0, 8, 1, 0)   # chroma fwd: 2/2=1 -> half-pel x
    b_c = predict(cbP, 0, 0, 8, 0, 1)
    assert (cbB[:8, :8] == (f_c + b_c + 1) >> 1).all()
    f_c = predict(crI, 0, 0, 8, 1, 0)
    b_c = predict(crP, 0, 0, 8, 0, 1)
    assert (crB[:8, :8] == (f_c + b_c + 1) >> 1).all()
    # MB1: backward-only + escape residual on Y0
    d = deq_non_intra(12)
    assert d == 125
    res = int(np.rint(d / 8))
    assert (yB[:8, 16:24] == np.clip(yP[:8, 16:24] + res, 0, 255)).all()
    assert (yB[8:16, 16:32] == yP[8:16, 16:32]).all()
    assert (cbB[:8, 8:16] == cbP[:8, 8:16]).all()
    # MB2: skipped -> repeats backward (0,0): the P plane, NOT the I
    assert (yB[16:32, :16] == yP[16:32, :16]).all()
    assert (yP[16:24, :8] != yI[16:24, :8]).any()  # the two refs differ
    # MB3: forward-only half-pel from the I reference
    assert (yB[16:32, 16:32] == predict(yI, 16, 16, 16, -3, 0)).all()
    assert (cbB[8:16, 8:16] == predict(cbI, 8, 8, 8, -1, 0)).all()


def test_b_intra_resets_both_predictors():
    """An intra macroblock inside a B-picture resets the forward AND
    backward vector predictors; the following macroblocks' deltas are
    coded from zero again."""
    pic_b = m.PictureSpec(ptype=3, qscale=5, slices=[[
        m.InterMB(mv=(2, 0), mv_b=(0, 2)),
        intra(22, -20, 18, -18, 11, -11),
        m.InterMB(mv=(2, 0)),     # delta +2 from the RESET predictor
        m.InterMB(mv_b=(0, -2)),  # delta -2 from the RESET predictor
    ]], temporal_reference=1)
    data = m.encode_mpeg1(
        m.SequenceSpec(32, 32, [pic_i(), pic_p_simple(), pic_b])
    )
    _, _, frames = m.decode_mpeg1(data)
    yI = frames[0][0].astype(np.int64)
    yB = frames[1][0].astype(np.int64)
    yP = frames[2][0].astype(np.int64)
    assert (yB[:8, 16:24] == 150).all()  # intra chain from 128
    assert (yB[16:32, :16] == predict(yI, 0, 16, 16, 2, 0)).all()
    assert (yB[16:32, 16:32] == predict(yP, 16, 16, 16, 0, -2)).all()


def test_b_full_pel_backward_and_b_code():
    """full_pel_backward_vector doubles the coded backward vector and
    backward_f_code=2 appends a residual bit — independent of the
    forward side's settings."""
    pic_b = m.PictureSpec(ptype=3, qscale=5, full_pel_b=True, b_code=2,
                          slices=[[
                              m.InterMB(mv_b=(4, 2)),
                              m.InterMB(mv_b=(0, 2)),
                              m.InterMB(mv_b=(0, 0)),
                              m.InterMB(mv_b=(-4, 0)),
                          ]], temporal_reference=1)
    data = m.encode_mpeg1(
        m.SequenceSpec(32, 32, [pic_i(), pic_p_simple(), pic_b])
    )
    _, _, frames = m.decode_mpeg1(data)
    yB = frames[1][0].astype(np.int64)
    yP = frames[2][0].astype(np.int64)
    assert (yB[:16, :16] == predict(yP, 0, 0, 16, 4, 2)).all()
    assert (yB[:16, 16:32] == predict(yP, 16, 0, 16, 0, 2)).all()
    assert (yB[16:32, :16] == yP[16:32, :16]).all()
    assert (yB[16:32, 16:32] == predict(yP, 16, 16, 16, -4, 0)).all()


def test_b_without_two_references_raises():
    pic_b = m.PictureSpec(ptype=3, qscale=5, slices=[[
        m.InterMB(mv=(0, 0), mv_b=(0, 0)),
        m.InterMB(mv=(0, 0)),
        m.InterMB(mv=(0, 0)),
        m.InterMB(mv=(0, 0)),
    ]], temporal_reference=0)
    data = m.encode_mpeg1(m.SequenceSpec(32, 32, [pic_i(), pic_b]))
    with pytest.raises(m.MpegError, match="two reference frames"):
        m.decode_mpeg1(data)


def test_b_skip_after_intra_raises():
    pic_b = m.PictureSpec(ptype=3, qscale=5, slices=[[
        intra(22, -20, 18, -18, 11, -11),
        m.SkipMB(),
        m.InterMB(mv=(0, 0)),
        m.InterMB(mv=(0, 0)),
    ]], temporal_reference=1)
    data = m.encode_mpeg1(
        m.SequenceSpec(32, 32, [pic_i(), pic_p_simple(), pic_b])
    )
    with pytest.raises(m.MpegError, match="follows an intra"):
        m.decode_mpeg1(data)


def _d_mb(dcs):
    return m.IntraMB(dc_diffs=dcs, ac=[{} for _ in range(6)])


def _d_pic(tref, slices):
    return m.PictureSpec(ptype=4, temporal_reference=tref, slices=slices)


def test_d_picture_roundtrip():
    """D-pictures decode (round 13, closing the picture-type grid):
    DC-only blocks reconstruct flat, predictors chain within a slice
    and reset between slices, end_of_macroblock is consumed."""
    spec = m.SequenceSpec(
        32, 32,
        [
            _d_pic(0, [
                [_d_mb([20, -18, 22, -19, 9, -8]),
                 _d_mb([17, -16, 18, -17, 8, -7])],
                [_d_mb([21, -20, 23, -22, 10, -9]),
                 _d_mb([16, -15, 17, -16, 7, -6])],
            ]),
            _d_pic(1, [
                [_d_mb([24, -21, 25, -23, 11, -10]),
                 _d_mb([18, -17, 19, -18, 9, -8])],
                [_d_mb([22, -19, 20, -18, 12, -11]),
                 _d_mb([17, -15, 16, -14, 8, -6])],
            ]),
        ],
    )
    w, h, frames = m.decode_mpeg1(m.encode_mpeg1(spec))
    assert (w, h, len(frames)) == (32, 32, 2)
    y0 = frames[0][0]
    # MB0 chain: 128+20, -18, +22, -19
    assert y0[0, 0] == 148 and y0[0, 8] == 130
    assert y0[8, 0] == 152 and y0[8, 8] == 133
    # MB1 continues the slice chain from 133
    assert y0[0, 16] == 133 + 17
    # slice 2 resets the predictor: MB2 starts from 128 again
    assert y0[16, 0] == 128 + 21
    # flat blocks
    assert (y0[0:8, 0:8] == 148).all()
    # chroma predictors are per-component
    assert frames[0][1][0, 0] == 137 and frames[0][2][0, 0] == 120


def test_d_picture_guards():
    d = _d_pic(0, [[_d_mb([20, -18, 22, -19, 9, -8])] * 2] * 2)
    # D may not mix with I/P/B in one sequence
    data = m.encode_mpeg1(m.SequenceSpec(32, 32, [pic_i(), d]))
    with pytest.raises(m.MpegError, match="may not share"):
        m.decode_mpeg1(data)
    # the encoder refuses AC coefficients in D macroblocks
    bad = m.IntraMB(dc_diffs=[20, -18, 22, -19, 9, -8],
                    ac=[{2: 3}] + [{} for _ in range(5)])
    with pytest.raises(ValueError, match="DC-only"):
        m.encode_mpeg1(m.SequenceSpec(32, 32, [_d_pic(0, [[bad] * 2] * 2)]))
    # skipped macroblocks are forbidden in D-pictures: a mid-slice
    # SkipMB writes an address increment of 2, whose hole only a skip
    # could paint — the decoder must reject it
    mbs = [_d_mb([20, -18, 22, -19, 9, -8]), m.SkipMB(),
           _d_mb([17, -16, 18, -17, 8, -7])]
    sl2 = [_d_mb([21, -20, 23, -22, 10, -9])]
    spec = m.SequenceSpec(
        48, 32, [_d_pic(0, [mbs, sl2 * 3])]
    )
    with pytest.raises(m.MpegError, match="skipped macroblock in a D"):
        m.decode_mpeg1(m.encode_mpeg1(spec))


def test_malformed_streams_raise():
    with pytest.raises(m.MpegError, match="sequence header"):
        m.decode_mpeg1(b"\x00\x00\x01\xb7")
    data = m.encode_mpeg1(m.SequenceSpec(32, 32, [pic_i()]))
    with pytest.raises(m.MpegError, match="truncated|no pictures|start"):
        m.decode_mpeg1(data[: len(data) // 2])


def test_mpeg_video_fuzz_never_crashes_untyped():
    """Mutation fuzzing over all four picture-type streams (I/P/B/D):
    random byte mutations and truncations must only raise the typed
    MpegError/MpegUnsupported family — never IndexError or a numpy
    shape error. (The audio twin lives in tests/test_mpaudio.py.)"""
    import random

    from cryptocoininsights_data_engineer_project_spark.operators import (
        multimodal as MM,
    )

    rng = random.Random(1312)
    seeds = [
        MM._mpeg_pack(MM._mpeg_ops(3)),
        MM._mpeg_pack(MM._mpeg_b_ops(3)),
        MM._mpeg_pack(MM._mpeg_d_ops(3)),
    ]

    def try_decode(b: bytes):
        try:
            m.decode_mpeg1(b)
        except (m.MpegError, m.MpegUnsupported):
            pass

    for _ in range(300):
        base = bytearray(rng.choice(seeds))
        for _k in range(rng.randint(1, 5)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        try_decode(bytes(base))
    for _ in range(100):
        base = bytearray(rng.choice(seeds))
        try_decode(bytes(base[: rng.randrange(len(base))]))
