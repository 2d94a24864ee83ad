"""Unit tests for the as-of join operators (operators/asof.py).

The single-scan ``asof_join_within`` must agree with the two-input
``asof_join`` and honor the tricky edges: strict '<' at equal
timestamps, atomic (arg_max-style) payload selection among equal-ts
right rows, and NULL payloads when no prior right row exists.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cryptocoininsights_data_engineer_project_spark.operators import asof


def _events(spark):
    rows = [
        # (event_id, user_id, ts, event_type, value)
        (1, 1, 100, "view", None),
        (2, 1, 200, "purchase", 10.0),
        (3, 1, 200, "purchase", 20.0),   # same ts as 2: dedupe -> max event_id (3)
        (4, 1, 200, "view", None),       # equal-ts left: must NOT see 2/3 (strict <)
        (5, 1, 300, "view", None),       # sees purchase 3 (value 20.0), not 2
        (6, 2, 50, "purchase", 5.0),
        (7, 2, 40, "view", None),        # before user 2's only purchase -> NULL
        (8, 3, 10, "view", None),        # user with no purchases -> NULL
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string, value double"
    )


def test_asof_join_within_semantics(spark):
    out = asof.asof_join_within(
        _events(spark),
        keys=["user_id"],
        ts="ts",
        right_pred=F.col("event_type") == "purchase",
        payload_cols=["event_id", "value"],
        right_order=["event_id"],
        left_cols=["event_id", "user_id"],
    )
    got = {r.event_id: (r.asof_event_id, r.asof_value) for r in out.collect()}
    assert got == {
        1: (None, None),
        2: (None, None),   # purchase's own left copy: strict '<'
        3: (None, None),
        4: (None, None),   # equal ts -> prior only
        5: (3, 20.0),      # max-event_id row wins, value atomically from it
        6: (None, None),
        7: (None, None),
        8: (None, None),
    }
    assert out.count() == 8  # every left row survives (left join)


def test_asof_join_within_matches_two_input_form(spark):
    e = _events(spark)
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("event_id", "event_id").alias("event_id"),
             F.max_by("value", "event_id").alias("value"))
    )
    two_input = asof.asof_join(
        e.select("event_id", "user_id", "ts"),
        purchases.select("user_id", "ts", "event_id", "value"),
        keys=["user_id"],
        ts="ts",
        payload_cols=["event_id", "value"],
    )
    single = asof.asof_join_within(
        e, keys=["user_id"], ts="ts",
        right_pred=F.col("event_type") == "purchase",
        payload_cols=["event_id", "value"],
        right_order=["event_id"],
        left_cols=["event_id", "user_id", "ts"],
    )
    cols = ["event_id", "user_id", "ts", "asof_event_id", "asof_value"]
    assert sorted(map(str, two_input.select(cols).collect())) == sorted(
        map(str, single.select(cols).collect())
    )


def test_asof_join_payload_atomic_with_null_field(spark):
    """A NULL in one payload column of the winning right row must NOT
    back-fill from an older right row — the whole payload comes from
    the same (latest) right row."""
    left = spark.createDataFrame([(1, 1000)], "user_id long, ts long")
    right = spark.createDataFrame(
        [
            (1, 100, 10.0, "old"),
            (1, 200, None, "new"),  # latest: value NULL, note 'new'
        ],
        "user_id long, ts long, value double, note string",
    )
    out = asof.asof_join(
        left, right, keys=["user_id"], ts="ts", payload_cols=["value", "note"]
    ).collect()
    assert len(out) == 1
    assert out[0].asof_value is None  # NOT 10.0 from the older row
    assert out[0].asof_note == "new"


def test_asof_join_right_order_tiebreaker(spark):
    """Equal-(key, ts) right rows resolve deterministically by
    right_order ascending (last wins)."""
    left = spark.createDataFrame([(1, 1000)], "user_id long, ts long")
    right = spark.createDataFrame(
        [(1, 200, 10.0, 2), (1, 200, 20.0, 3), (1, 200, 15.0, 1)],
        "user_id long, ts long, value double, seq long",
    )
    out = asof.asof_join(
        left,
        right,
        keys=["user_id"],
        ts="ts",
        payload_cols=["value", "seq"],
        right_order=["seq"],
    ).collect()
    assert (out[0].asof_value, out[0].asof_seq) == (20.0, 3)
