"""Skewed-join A/B (VERDICT r5 #6 / r6 #1): prove AQE's skew split
actually fires on this engine's joins, and that the explicit salted
fallback is row-identical — the executable half of the decision rule
pinned in SCALE.md §"Skewed joins". The measured sf1-scale numbers
come from scripts/skew_ab.py; this test pins the MECHANISMS:

1. the hot-key fixture really concentrates a shuffle partition,
2. AQE rewrites the SMJ to ``skew=true`` once the partition crosses
   max(skewedPartitionThresholdInBytes, factor x median),
3. with the split disabled the same plan runs unsplit (the A side of
   the A/B is a real baseline, not a misconfiguration),
4. ``salted_join`` is provably equal to the plain join — including
   m:n keys — so the fallback never trades correctness for balance.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from cryptocoininsights_data_engineer_project_spark.operators.skew import (
    salted_join,
    skewed_join_fixture,
)

_AB_CONF = {
    # force the 100 TB shape: dim too big to broadcast -> shuffle join
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # scale AQE's byte thresholds to the local fixture (defaults are
    # 256m/64m, sized for executor-scale partitions; the RATIO rule —
    # split when partition > max(threshold, factor x median) — is what
    # the test pins, and it is scale-free)
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512k",
}


@contextmanager
def _conf(spark, overrides):
    saved = {}
    for k, v in overrides.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _joined_agg(fact, dim):
    return fact.join(dim, "key").groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v") + F.col("w")).alias("s"),
    )


def test_aqe_skew_split_fires_and_matches_unsplit(spark):
    fact, dim = skewed_join_fixture(spark, 400_000, 20_000, hot_frac=0.4)
    with _conf(spark, _AB_CONF):
        split = _joined_agg(fact, dim)
        split_rows = split.collect()
        plan = split._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan  # the split REALLY engaged

        with _conf(
            spark, {"spark.sql.adaptive.skewJoin.enabled": "false"}
        ):
            plain = _joined_agg(fact, dim)
            plain_rows = plain.collect()
            plain_plan = (
                plain._jdf.queryExecution().executedPlan().toString()
            )
            assert "skew=true" not in plain_plan  # honest baseline
            assert "SortMergeJoin" in plain_plan

    assert split_rows == plain_rows
    assert split_rows[0]["n"] == 400_000


def test_salted_join_identical_to_plain_including_mn(spark):
    fact, dim = skewed_join_fixture(spark, 50_000, 2_000, hot_frac=0.5)
    # m:n: duplicate a slice of dim keys so replication-correctness is
    # exercised, not just the unique-key happy path
    dim_mn = dim.unionAll(dim.filter(F.col("key") < 100))
    with _conf(spark, _AB_CONF):
        for d in (dim, dim_mn):
            want = sorted(
                fact.join(d, "key").select("key", "v", "w").collect()
            )
            got_df = salted_join(fact, d, "key").select("key", "v", "w")
            got = sorted(got_df.collect())
            assert got == want
        # the salt really spreads the hot key: phase-1 join keys are
        # (key, salt), so no single partition owns the hot key
        plan = salted_join(fact, dim, "key")._jdf.queryExecution().executedPlan().toString()
        assert "__salt" in plan
