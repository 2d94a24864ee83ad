"""MERGE operator matrix (FIXTURES.md B5; reference semantics from
coininsights.py:110-165): both physical strategies must agree on every
case."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cryptocoininsights_data_engineer_project_spark.operators.merge import (
    dedupe_latest,
    merge,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("supply", T.DoubleType()),
        T.StructField("ts", T.LongType()),
    ]
)


def df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def as_map(result):
    return {r["id"]: (r["price"], r["supply"], r["ts"]) for r in result.collect()}


STRATEGIES = ["full_outer", "union_latest"]


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_mixed_match(spark, strategy):
    target = df(spark, [("a", 1.0, 10.0, 1), ("b", 2.0, 20.0, 1), ("c", 3.0, 30.0, 1)])
    stage = df(spark, [("b", 2.5, 25.0, 2), ("c", 3.5, 35.0, 2), ("d", 4.0, 40.0, 2)])
    out = as_map(merge(target, stage, ["id"], strategy=strategy))
    assert out == {
        "a": (1.0, 10.0, 1),
        "b": (2.5, 25.0, 2),
        "c": (3.5, 35.0, 2),
        "d": (4.0, 40.0, 2),
    }


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_duplicate_stage_keys_keep_latest(spark, strategy):
    target = df(spark, [("a", 1.0, 10.0, 1)])
    stage = df(spark, [("a", 9.0, 90.0, 2), ("a", 5.0, 50.0, 3)])
    out = as_map(
        merge(target, stage, ["id"], dedupe_order=["ts"], strategy=strategy)
    )
    assert out == {"a": (5.0, 50.0, 3)}  # highest ts wins


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_null_overwrites_nonnull(spark, strategy):
    # reference MERGE updates unconditionally (coininsights.py:145-157):
    # a NULL stage measure replaces a non-NULL target value
    target = df(spark, [("a", 1.0, 10.0, 1)])
    stage = df(spark, [("a", 2.0, None, 2)])
    out = as_map(merge(target, stage, ["id"], strategy=strategy))
    assert out == {"a": (2.0, None, 2)}


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_empty_stage_and_empty_target(spark, strategy):
    target = df(spark, [("a", 1.0, 10.0, 1)])
    empty = df(spark, [])
    assert as_map(merge(target, empty, ["id"], strategy=strategy)) == {
        "a": (1.0, 10.0, 1)
    }
    assert as_map(merge(empty, target, ["id"], strategy=strategy)) == {
        "a": (1.0, 10.0, 1)
    }


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_idempotent_remerge(spark, strategy):
    target = df(spark, [("a", 1.0, 10.0, 1), ("b", 2.0, 20.0, 1)])
    stage = df(spark, [("b", 2.5, 25.0, 2), ("c", 3.0, 30.0, 2)])
    once = merge(target, stage, ["id"], strategy=strategy)
    twice = merge(once, stage, ["id"], strategy=strategy)
    assert as_map(once) == as_map(twice)


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_partial_update_cols_passthrough(spark, strategy):
    # only price is updated; supply must survive the match untouched
    target = df(spark, [("a", 1.0, 10.0, 1)])
    stage = df(spark, [("a", 2.0, 99.0, 2)])
    out = as_map(merge(target, stage, ["id"], update_cols=["price"], strategy=strategy))
    assert out == {"a": (2.0, 10.0, 1)}


def test_strategies_agree_on_random_overlap(spark):
    # property-style: random key overlap, both strategies identical
    import random

    rng = random.Random(7)
    t_keys = rng.sample(range(100), 40)
    s_keys = rng.sample(range(100), 40)
    target = df(spark, [(f"k{k}", float(k), k * 10.0, 1) for k in t_keys])
    stage = df(spark, [(f"k{k}", float(k) + 0.5, k * 10.0 + 5, 2) for k in s_keys])
    a = as_map(merge(target, stage, ["id"], strategy="full_outer"))
    b = as_map(merge(target, stage, ["id"], strategy="union_latest"))
    assert a == b
    assert set(a) == {f"k{k}" for k in set(t_keys) | set(s_keys)}
    for k in s_keys:
        assert a[f"k{k}"][2] == 2  # stage rows won
    for k in set(t_keys) - set(s_keys):
        assert a[f"k{k}"][2] == 1  # untouched


def test_dedupe_latest_deterministic(spark):
    d = df(spark, [("a", 1.0, 1.0, 5), ("a", 2.0, 2.0, 5), ("a", 3.0, 3.0, 4)])
    # tie on ts=5 broken by price desc
    out = dedupe_latest(d, ["id"], ["ts", "price"]).collect()
    assert len(out) == 1 and out[0]["price"] == 2.0


def test_missing_stage_column_raises(spark):
    target = df(spark, [("a", 1.0, 10.0, 1)])
    stage = target.drop("supply")
    with pytest.raises(ValueError, match="missing merge columns"):
        merge(target, stage, ["id"], update_cols=["price", "supply"])


def test_merge_null_key_stage_row_inserts(spark):
    """NULL-key stage rows never 'match' a NULL-key target row (plain
    equality, like the oracle and Redshift MERGE ON t.id = s.id): both
    survive as distinct rows and the target's values are untouched."""
    target = spark.createDataFrame(
        [(None, 1.0), ("btc", 2.0)], "id string, price double"
    )
    stage = spark.createDataFrame([(None, 9.0)], "id string, price double")
    out = merge(target, stage, keys=["id"], strategy="full_outer")
    rows = sorted(out.collect(), key=lambda r: (r.id or "", r.price or 0))
    assert [(r.id, r.price) for r in rows] == [(None, 1.0), (None, 9.0), ("btc", 2.0)]


def test_scd2_semantics(spark):
    """scd2_apply: changed keys close+reopen, new keys open, unchanged
    untouched, closed history passes through, NULL<->value attribute
    transitions count as changes (null-safe compare)."""
    from cryptocoininsights_data_engineer_project_spark.operators.merge import (
        scd2_apply,
        scd2_init,
    )

    t1, t2, t3 = (
        "2024-01-01 00:00:00",
        "2024-02-01 00:00:00",
        "2024-03-01 00:00:00",
    )
    snap1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "id long, attr string"
    )
    dim = scd2_init(snap1, keys=["id"], ts=t1)
    snap2 = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c"), (4, "d")], "id long, attr string"
    )
    dim2 = scd2_apply(dim, snap2, keys=["id"], attrs=["attr"], ts=t2)
    rows = {
        (r["id"], r["attr"], str(r["valid_from"]), str(r["valid_to"]))
        for r in dim2.collect()
    }
    assert (1, "a", t1, "None") in rows  # unchanged: untouched
    assert (2, "b", t1, t2) in rows  # changed: closed
    assert (2, "B", t2, "None") in rows  # changed: reopened
    assert (3, None, t1, t2) in rows  # NULL -> value is a change
    assert (3, "c", t2, "None") in rows
    assert (4, "d", t2, "None") in rows  # new key opens
    assert len(rows) == 6

    # second application: closed history must survive verbatim
    snap3 = spark.createDataFrame([(2, "B"), (4, None)], "id long, attr string")
    dim3 = scd2_apply(dim2, snap3, keys=["id"], attrs=["attr"], ts=t3)
    rows3 = {
        (r["id"], r["attr"], str(r["valid_from"]), str(r["valid_to"]))
        for r in dim3.collect()
    }
    assert (2, "b", t1, t2) in rows3  # history intact
    assert (2, "B", t2, "None") in rows3  # unchanged in snap3
    assert (4, "d", t2, t3) in rows3  # value -> NULL is a change
    assert (4, None, t3, "None") in rows3
    # keys absent from snap3 (1, 3) keep their current rows open
    assert (1, "a", t1, "None") in rows3
    assert (3, "c", t2, "None") in rows3
