"""PassJoin segment-blocked fuzzy matching (operators/fuzzy.py).

The load-bearing claims: (1) blocking is recall-lossless — every pair
within edit distance tau survives, even with inserts/deletes that shift
positions; (2) the candidate space is bounded by near-dup density, not
by the quadratic within-block pair count.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cryptocoininsights_data_engineer_project_spark.operators import fuzzy
from cryptocoininsights_data_engineer_project_spark.queries import _t

ALPHA = "abcdefghijklmnop "


def _mutate(rng: random.Random, s: str, n_edits: int) -> str:
    for _ in range(n_edits):
        op = rng.choice(["sub", "ins", "del"])
        i = rng.randrange(len(s))
        if op == "sub":
            s = s[:i] + rng.choice(ALPHA) + s[i + 1 :]
        elif op == "ins":
            s = s[:i] + rng.choice(ALPHA) + s[i:]
        elif len(s) > 8:
            s = s[:i] + s[i + 1 :]
    return s


def test_passjoin_lossless_on_random_edits(spark):
    """Every planted pair at edit distance <= 3 (random substitutions,
    inserts, AND deletes — deletes shift all downstream positions) must
    be found. Also: found pairs must genuinely verify (no false
    positives past the levenshtein filter)."""
    rng = random.Random(123)
    rows = []
    kid = 0
    for base_i in range(40):
        base = "".join(rng.choice(ALPHA.strip()) for _ in range(rng.randrange(15, 40)))
        rows.append((kid, "blk", base))
        kid += 1
        # a planted near-dup with 1-3 edits of every kind
        rows.append((kid, "blk", _mutate(rng, base, rng.randrange(1, 4))))
        kid += 1
    df = spark.createDataFrame(rows, "k long, blk string, txt string")
    got = {
        (r.key_a, r.key_b): r.edit_dist
        for r in fuzzy.edit_distance_pairs(df, "k", "txt", "blk", tau=3).collect()
    }
    # ground truth by brute force on the driver (80 strings)
    import itertools

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    expect = {}
    for (ka, _, ta), (kb, _, tb) in itertools.combinations(rows, 2):
        d = lev(ta, tb)
        if d <= 3:
            expect[(min(ka, kb), max(ka, kb))] = d
    assert got == expect
    assert len(expect) >= 40  # the planted pairs are actually in play


def test_passjoin_candidates_bounded_by_output(spark, sf_dir):
    """Candidate pairs scale with true near-dup density (~output size),
    not with the quadratic brand-block pair count: cands <= 4*(output
    + n), while the brand-block pair count violates that bound at
    sf0.01 (12.7k pairs vs 4*(798+801)) — the 100x-data safety margin."""
    p = (
        _t(spark, "/root/testdata/sf0.01", "part")
        .filter(F.col("p_size") <= 20)
        .select("p_partkey", "p_brand", "p_name")
    )
    n = p.count()
    out = fuzzy.edit_distance_pairs(p, "p_partkey", "p_name", "p_brand").count()
    cands = fuzzy.candidate_pairs(p, "p_partkey", "p_name", "p_brand").count()
    brand_pairs = (
        p.groupBy("p_brand")
        .count()
        .agg(F.sum(F.expr("count * (count - 1) / 2")))
        .first()[0]
    )
    assert cands <= 4 * (out + n)
    assert brand_pairs > 4 * (out + n)  # the old blocking would not pass


def _python_keys(txt: str, tau: int = 3):
    """Pure-Python mirror of the Spark key-generation arithmetic
    (operators/fuzzy.py) — index keys and probe keys."""
    segs = tau + 1
    m = len(txt)
    idx = set()
    for i in range(segs):
        start = i * m // segs + 1
        slen = (i + 1) * m // segs - i * m // segs
        if slen >= 1:
            idx.add((m, i, txt[start - 1 : start - 1 + slen]))
    prb = set()
    for l in range(m - tau, m + tau + 1):
        if l <= tau:
            continue
        for i in range(segs):
            start = i * l // segs + 1
            slen = (i + 1) * l // segs - i * l // segs
            if slen < 1:
                continue
            lo, hi = max(1, start - tau), min(m - slen + 1, start + tau)
            for pos in range(lo, hi + 1):
                prb.add((l, i, txt[pos - 1 : pos - 1 + slen]))
    return idx, prb


def test_passjoin_geometry_property():
    """Hypothesis-grade sweep without Spark: for thousands of random
    (s, r) pairs within edit distance tau, r's probe keys intersect
    s's index keys (the pigeonhole + shift-window guarantee the
    distributed equi-join relies on)."""
    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st
    except ImportError:  # pragma: no cover
        import pytest

        pytest.skip("hypothesis unavailable")

    alpha = "abcd"

    @settings(max_examples=2000, deadline=None)
    @given(
        base=st.text(alphabet=alpha, min_size=8, max_size=40),
        edits=st.lists(
            st.tuples(
                st.sampled_from(["sub", "ins", "del"]),
                st.integers(min_value=0, max_value=200),
                st.sampled_from(alpha),
            ),
            min_size=0,
            max_size=3,
        ),
    )
    def check(base, edits):
        s = base
        r = base
        for op, i, ch in edits:
            i = i % max(len(r), 1)
            if op == "sub":
                r = r[:i] + ch + r[i + 1 :]
            elif op == "ins":
                r = r[:i] + ch + r[i:]
            elif len(r) > 5:
                r = r[:i] + r[i + 1 :]
        # true edit distance <= number of applied edits <= 3
        idx_s, _ = _python_keys(s)
        _, prb_r = _python_keys(r)
        assert idx_s & prb_r, (s, r)

    check()
