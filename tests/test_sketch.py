"""Count-min sketch invariants (operators/sketch.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cryptocoininsights_data_engineer_project_spark.catalog import table
from cryptocoininsights_data_engineer_project_spark.operators import sketch


def test_cms_never_underestimates(spark, sf_dir):
    """The defining CMS guarantee: est_count >= true count for every
    key (min over d counters, each counter >= the key's true count)."""
    li = table(spark, sf_dir, "lineitem")
    est = sketch.cms_topk(li, "l_partkey", k=10_000)  # effectively all keys
    exact = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count(F.lit(1)).alias("true_count")
    )
    joined = est.join(exact, "key").collect()
    assert len(joined) == exact.count()
    assert all(r.est_count >= r.true_count for r in joined)
    # and the error is bounded in practice: mean overestimate small
    over = sum(r.est_count - r.true_count for r in joined) / len(joined)
    assert over < li.count() / sketch.CMS_WIDTH * sketch.CMS_DEPTH


def test_cms_deterministic(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    a = sorted(map(str, sketch.cms_topk(li, "l_partkey").collect()))
    b = sorted(map(str, sketch.cms_topk(li, "l_partkey").collect()))
    assert a == b
