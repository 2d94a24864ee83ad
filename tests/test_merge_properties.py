"""Property-based MERGE invariants (SURVEY.md §5.4): random key
overlap, both strategies, the reference's upsert contract
(coininsights.py:110-165) must hold for every generated frame."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cryptocoininsights_data_engineer_project_spark.operators.merge import merge

KEYS = st.integers(min_value=0, max_value=15)
VALS = st.integers(min_value=-1000, max_value=1000)

frame = st.dictionaries(KEYS, st.tuples(VALS, VALS), min_size=0, max_size=12)


def _df(spark, d, tag):
    rows = [(f"k{k}", float(v1), float(v2), tag) for k, (v1, v2) in d.items()]
    return spark.createDataFrame(
        rows, "id: string, price: double, supply: double, src: int"
    )


def _as_map(df):
    return {r["id"]: (r["price"], r["supply"], r["src"]) for r in df.collect()}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(t=frame, s=frame)
def test_merge_invariants(spark, t, s):
    target = _df(spark, t, tag=0)
    stage = _df(spark, s, tag=1)
    for strategy in ("full_outer", "union_latest"):
        out = _as_map(merge(target, stage, ["id"], strategy=strategy))
        # keys = target ∪ stage
        assert set(out) == {f"k{k}" for k in set(t) | set(s)}
        for k in s:  # matched/inserted rows carry stage values
            assert out[f"k{k}"] == (float(s[k][0]), float(s[k][1]), 1)
        for k in set(t) - set(s):  # unmatched target rows unchanged
            assert out[f"k{k}"] == (float(t[k][0]), float(t[k][1]), 0)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(t=frame, s=frame)
def test_merge_idempotent(spark, t, s):
    target = _df(spark, t, tag=0)
    stage = _df(spark, s, tag=1)
    once = merge(target, stage, ["id"])
    twice = merge(once, stage, ["id"])
    assert _as_map(once) == _as_map(twice)
