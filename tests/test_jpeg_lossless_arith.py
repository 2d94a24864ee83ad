"""SOF11 (lossless arithmetic) JPEG: independent Annex-H encoder +
round trips against the decoder.

Same discipline as the SOF9/SOF10 suite (tests/test_jpeg_arith.py):
the encoder below implements T.81 Annex H's statistical model over
the Annex-D big-int QM encoder INDEPENDENTLY of the decoder's
value-window formulation, and every test round-trips to the EXACT
source samples — lossless has ground truth, so a round trip is a
full-pipeline equality check, not just self-consistency of the
entropy layer. The one shared assumption is the 2-D context layout
reading of H.1.4 (documented at jpegcodec.LL_STAT_BINS); T.81 ships
no public reference implementation of this mode to cross-check
against, which is why the layout note exists.
"""

from __future__ import annotations

import numpy as np
import pytest

from cryptocoininsights_data_engineer_project_spark.operators.jpegcodec import (
    LL_STAT_BINS,
    JpegError,
    decode_jpeg_lossless,
)
from tests.test_jpeg_arith import ArithEncoder

# ------------------------------------------------- Annex-H encoder


def _cat(v1: int) -> int:
    return 0 if v1 == 0 else 1 << (v1.bit_length() - 1)


def _classify(d: int, low: int, up: int) -> int:
    if d == 0:
        return 0
    sign = 1 if d < 0 else 0
    m = _cat(abs(d) - 1)
    if m < (1 << low) >> 1:
        return 0
    if m > (1 << up) >> 1:
        return 3 + sign
    return 1 + sign


def _encode_ll_diff(enc, bins, ca, cb, diff):
    base = 4 * (5 * cb + ca)
    if diff == 0:
        enc.encode(bins, base, 0)
        return
    enc.encode(bins, base, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(bins, base + 1, sign)
    v1 = (-diff if sign else diff) - 1
    st = base + 2 + sign
    if v1 == 0:
        enc.encode(bins, st, 0)
        return
    enc.encode(bins, st, 1)
    m = 1 << (v1.bit_length() - 1)
    st = 100 if cb < 3 else 129
    mm = 1
    while mm < m:
        enc.encode(bins, st, 1)
        mm <<= 1
        st += 1
    enc.encode(bins, st, 0)
    st += 14
    mm = m >> 1
    while mm:
        enc.encode(bins, st, 1 if v1 & mm else 0)
        mm >>= 1


def _predict(p, y, x, seg_y, seg_x, default, sel):
    if (y, x) == (seg_y, seg_x):
        return default
    if y == seg_y:
        return p[y][x - 1]
    if x == 0:
        return p[y - 1][0]
    ra, rb, rc = p[y][x - 1], p[y - 1][x], p[y - 1][x - 1]
    return {
        1: ra,
        2: rb,
        3: rc,
        4: ra + rb - rc,
        5: ra + ((rb - rc) >> 1),
        6: rb + ((ra - rc) >> 1),
        7: (ra + rb) >> 1,
    }[sel]


def encode_lossless_arith(
    planes,
    precision=8,
    pred_sel=1,
    pt=0,
    restart_interval=0,
    dc_cond=None,
):
    """Full SOF11 byte stream for per-component sample grids
    ``planes`` (list of h x w lists, full-precision samples)."""
    ncomp = len(planes)
    h, w = len(planes[0]), len(planes[0][0])
    out = bytearray(b"\xff\xd8")
    if dc_cond:
        body = bytearray()
        for tb, (low, up) in sorted(dc_cond.items()):
            body += bytes([tb, (up << 4) | low])
        out += b"\xff\xcc" + (2 + len(body)).to_bytes(2, "big") + body
    if restart_interval:
        out += b"\xff\xdd\x00\x04" + restart_interval.to_bytes(2, "big")
    sof = bytearray([precision]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xcb" + (2 + len(sof)).to_bytes(2, "big") + sof
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # every component uses DC table 0
    sos += bytes([pred_sel, 0, pt])
    out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos

    default = 1 << (precision - pt - 1)
    low, up = (dc_cond or {}).get(0, (0, 1))
    recon = [[[0] * w for _ in range(h)] for _ in range(ncomp)]

    def fresh():
        return (
            ArithEncoder(),
            bytearray(LL_STAT_BINS),
            [[0] * w for _ in range(ncomp)],
            [[0] * w for _ in range(ncomp)],
        )

    enc, bins, prev_d, cur_d = fresh()
    rst_n = 0
    since = 0
    seg_y, seg_x = 0, 0
    for y in range(h):
        for x in range(w):
            if restart_interval and since == restart_interval:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + rst_n])
                enc, bins, prev_d, cur_d = fresh()
                rst_n = (rst_n + 1) & 7
                since = 0
                seg_y, seg_x = y, x
            for ci in range(ncomp):
                p = recon[ci]
                px = _predict(p, y, x, seg_y, seg_x, default, pred_sel)
                s = int(planes[ci][y][x]) >> pt
                diff = (s - px) & 0xFFFF
                if diff >= 0x8000:
                    diff -= 0x10000
                da = (
                    0
                    if (y, x) == (seg_y, seg_x) or (y > seg_y and x == 0)
                    else cur_d[ci][x - 1]
                )
                db = 0 if y == seg_y else prev_d[ci][x]
                _encode_ll_diff(
                    enc,
                    bins,
                    _classify(da, low, up),
                    _classify(db, low, up),
                    diff,
                )
                cur_d[ci][x] = diff
                p[y][x] = (px + diff) & 0xFFFF
            since += 1
        prev_d, cur_d = cur_d, prev_d
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------- round trips


def _grid(seed, h, w, lo, hi):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, size=(h, w)).tolist()


@pytest.mark.parametrize("sel", [1, 2, 3, 4, 5, 6, 7])
def test_roundtrip_all_predictors(sel):
    g = _grid(sel, 9, 7, 0, 256)
    blob = encode_lossless_arith([g], pred_sel=sel)
    w, h, ch, samples = decode_jpeg_lossless(blob)
    assert (w, h, ch) == (7, 9, 1)
    assert samples[:, :, 0].tolist() == g


def test_roundtrip_point_transform():
    g = (np.array(_grid(11, 6, 6, 0, 64)) << 2).tolist()
    blob = encode_lossless_arith([g], pt=2)
    _, _, _, samples = decode_jpeg_lossless(blob)
    assert samples[:, :, 0].tolist() == g


def test_roundtrip_restart_intervals():
    g = _grid(12, 8, 10, 0, 256)
    blob = encode_lossless_arith([g], restart_interval=13)
    assert b"\xff\xd0" in blob  # at least one RST actually emitted
    _, _, _, samples = decode_jpeg_lossless(blob)
    assert samples[:, :, 0].tolist() == g


def test_roundtrip_interleaved_color():
    gs = [_grid(20 + ci, 5, 8, 0, 256) for ci in range(3)]
    blob = encode_lossless_arith(gs)
    w, h, ch, samples = decode_jpeg_lossless(blob)
    assert (w, h, ch) == (8, 5, 3)
    for ci in range(3):
        assert samples[:, :, ci].tolist() == gs[ci]


def test_roundtrip_16bit_deep_chains_and_wrap():
    # full-precision DICOM shape: huge diffs walk the X chain to its
    # deepest categories, and the first row exercises mod-65536 wrap
    g = _grid(33, 6, 6, 0, 65536)
    g[0][0] = 65535  # diff from default 32768 wraps negative
    g[0][1] = 0  # then a -65535 raw diff -> +1 after wrap
    blob = encode_lossless_arith([g], precision=16)
    _, _, _, samples = decode_jpeg_lossless(blob)
    assert samples[:, :, 0].tolist() == g


def test_roundtrip_nondefault_dac_conditioning():
    # U=3 widens the small class; L=2 sends tiny diffs to the zero
    # context class — different conditioning, same reconstruction
    g = _grid(44, 7, 7, 100, 140)
    blob = encode_lossless_arith([g], dc_cond={0: (2, 3)})
    assert b"\xff\xcc" in blob
    _, _, _, samples = decode_jpeg_lossless(blob)
    assert samples[:, :, 0].tolist() == g


def test_uniform_image_codes_compactly_and_roundtrips():
    # all-zero diffs: the adaptive zero bins should squeeze 48
    # samples into a handful of entropy bytes
    g = [[7777] * 8 for _ in range(6)]
    blob = encode_lossless_arith([g], precision=13)
    _, _, _, samples = decode_jpeg_lossless(blob)
    assert samples[:, :, 0].tolist() == g
    assert len(blob) < 70


def test_corrupt_stream_gates():
    g = _grid(55, 6, 6, 0, 256)
    blob = bytearray(encode_lossless_arith([g], restart_interval=7))
    # break the first restart marker
    i = blob.find(b"\xff\xd0")
    blob[i + 1] = 0xD7
    with pytest.raises(JpegError, match="expected RST"):
        decode_jpeg_lossless(bytes(blob))


def test_fixture_blob_regenerates():
    """The constant entropy stream embedded in the registry fixture
    must be exactly what this independent encoder produces for the
    documented sample grid."""
    from cryptocoininsights_data_engineer_project_spark.operators.multimodal import (
        JPEG_LLA_BLOB_HEX,
        JPEG_LLA_H,
        JPEG_LLA_W,
        _jpeg_lla_a,
    )

    g = [
        [128 + _jpeg_lla_a(y, x) for x in range(JPEG_LLA_W)]
        for y in range(JPEG_LLA_H)
    ]
    blob = encode_lossless_arith([g])
    soi = blob.find(b"\xff\xda")
    seglen = int.from_bytes(blob[soi + 2 : soi + 4], "big")
    entropy = blob[soi + 2 + seglen : -2]  # up to EOI
    assert entropy.hex() == JPEG_LLA_BLOB_HEX
