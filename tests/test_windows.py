"""global_cumsum: the distributed prefix-sum must equal a
driver-computed running sum over the same total order, including when
the data is forced across many range partitions (the offsets path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cryptocoininsights_data_engineer_project_spark.operators.windows import (
    global_cumsum,
)


def test_global_cumsum_matches_serial(spark):
    df = spark.range(1000).select(
        F.col("id"), ((F.col("id") * 37) % 101).alias("v")
    )
    out = global_cumsum(
        df, [F.col("v").desc(), F.col("id")], F.col("v"), out="cum",
        num_partitions=16,
    )
    rows = {r["id"]: (r["v"], r["cum"]) for r in out.collect()}
    serial = sorted(((r["v"], r["id"]) for r in df.collect()),
                    key=lambda t: (-t[0], t[1]))
    run = 0
    for v, i in serial:
        run += v
        assert rows[i] == (v, run), (i, v, run, rows[i])


def test_global_cummax_exclusive_matches_serial(spark):
    from cryptocoininsights_data_engineer_project_spark.operators.windows import (
        global_cummax_exclusive,
    )

    df = spark.range(500).select(
        F.col("id"), ((F.col("id") * 61) % 97).alias("v")
    )
    out = global_cummax_exclusive(
        df, [F.col("id")], F.col("v"), out="m", num_partitions=11
    )
    got = {r["id"]: r["m"] for r in out.collect()}
    best = None
    for i in range(500):
        assert got[i] == best, (i, got[i], best)
        v = (i * 61) % 97
        best = v if best is None or v > best else best


def test_global_cumsum_single_partition_degenerate(spark):
    df = spark.range(5).select(F.col("id"), F.lit(1).alias("v"))
    out = global_cumsum(df, [F.col("id")], F.col("v"), num_partitions=1)
    got = sorted((r["id"], r["cumsum"]) for r in out.collect())
    assert got == [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]
