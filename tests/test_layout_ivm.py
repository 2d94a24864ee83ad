"""Z-order layout clustering and incremental rollup maintenance."""

from __future__ import annotations

from pyspark.sql import functions as F

from cryptocoininsights_data_engineer_project_spark.catalog import table
from cryptocoininsights_data_engineer_project_spark.operators import ivm, layout


def _py_morton(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for j in range(bits):
        z |= ((x >> j) & 1) << (2 * j)
        z |= ((y >> j) & 1) << (2 * j + 1)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    rows = [(0, 0), (1, 0), (0, 1), (1, 1), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.zkey
        for r in layout.with_zorder_key(df, "x", "y").collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _py_morton(x, y), (x, y)


def test_zorder_write_clusters_both_dims(spark, sf_dir, tmp_path):
    """Files written via zorder_write cover tiles of (x, y) space:
    the per-file value range on EACH dimension is far below the global
    range — the property row-group pruning needs. A single-column sort
    would leave the other dimension's per-file range at ~100%."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_orderkey")
    dst = str(tmp_path / "zordered")
    layout.zorder_write(li, dst, "l_partkey", "l_orderkey", n_files=16)

    per_file = (
        spark.read.parquet(dst)
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            (F.max("l_partkey") - F.min("l_partkey")).alias("xr"),
            (F.max("l_orderkey") - F.min("l_orderkey")).alias("yr"),
        )
        .collect()
    )
    gx = li.agg(F.max("l_partkey") - F.min("l_partkey")).first()[0]
    gy = li.agg(F.max("l_orderkey") - F.min("l_orderkey")).first()[0]
    # median per-file spans: both dimensions clustered
    xs = sorted(r.xr for r in per_file)
    ys = sorted(r.yr for r in per_file)
    assert xs[len(xs) // 2] <= gx * 0.6
    assert ys[len(ys) // 2] <= gy * 0.6
    # row content survives the re-layout
    assert spark.read.parquet(dst).count() == li.count()


def test_incremental_rollup_equals_full_recompute(spark, sf_dir):
    """Applying per-batch deltas through merge_rollup lands on exactly
    the rollup a from-scratch aggregation computes — the IVM algebra
    for additive counters, across 3 uneven batches."""
    o = table(spark, sf_dir, "orders")
    batches = [
        o.filter(F.col("o_orderkey") % 3 == i).select(
            "o_custkey", "o_totalprice"
        )
        for i in range(3)
    ]
    rollup = None
    for b in batches:
        delta_agg = ivm.aggregate_delta(b, ["o_custkey"], ["o_totalprice"])
        rollup = ivm.merge_rollup(rollup, delta_agg, ["o_custkey"])
    full = ivm.aggregate_delta(
        o.select("o_custkey", "o_totalprice"), ["o_custkey"], ["o_totalprice"]
    )
    # compare with rounding: incremental addition reorders double sums
    def snap(df):
        return sorted(
            (r.o_custkey, round(r.sum_o_totalprice, 4), r.n_rows)
            for r in df.collect()
        )

    assert snap(rollup) == snap(full)


def test_bucketed_join_no_exchange(spark, sf_dir):
    """Two tables bucketed on the same key with the same bucket count
    must join with ZERO Exchange nodes — the write-time co-location
    replaces the read-time shuffle (the 100 TB fact-fact join story).
    An unbucketed control join over the same data DOES shuffle,
    proving the assertion bites."""
    import contextlib
    import io

    from cryptocoininsights_data_engineer_project_spark.operators.layout import (
        colocated_join,
        write_bucketed,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_orderkey")
        .count()
    )
    write_bucketed(orders, "t_orders_b", "o_orderkey", n_buckets=8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_licnt_b",
        "o_orderkey",
        n_buckets=8,
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a real join strategy decision (tiny test tables would
        # broadcast and trivially show no exchange)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def plan_of(df):
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            return buf.getvalue()

        joined = colocated_join(spark, "t_orders_b", "t_licnt_b", "o_orderkey")
        p = plan_of(joined)
        assert "Exchange" not in p, p
        assert "SortMergeJoin" in p

        control = orders.join(
            li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        )
        assert "Exchange" in plan_of(control)

        # and the join is correct: every order with lineitems matched
        n = joined.count()
        assert n == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_licnt_b")
