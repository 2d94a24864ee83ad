"""Aggregate navigation: the materialized-rollup answer must equal the
direct fact aggregation, the MV path must scan ONLY the rollup, and
non-derivable requests must refuse (no silent wrong answers)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from cryptocoininsights_data_engineer_project_spark.catalog import table
from cryptocoininsights_data_engineer_project_spark.operators.mv import (
    MVSpec,
    build_mv,
    can_answer,
    query_rollup,
)

SPEC = MVSpec(
    keys=("o_custkey", "o_orderstatus", "o_orderpriority"),
    measures=("o_totalprice",),
)


@pytest.fixture(scope="module")
def mv_path(spark, sf_dir, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("mv") / "orders_rollup")
    build_mv(table(spark, sf_dir, "orders"), SPEC, p)
    return p


def test_rollup_answer_equals_fact_aggregation(spark, sf_dir, mv_path):
    want = {
        "revenue": ("sum", "o_totalprice"),
        "n_orders": ("count", "*"),
        "avg_price": ("avg", "o_totalprice"),
    }
    got = {
        (r["o_orderstatus"], r["o_orderpriority"]): (
            round(r["revenue"], 2), r["n_orders"], round(r["avg_price"], 6),
        )
        for r in query_rollup(
            spark, mv_path, SPEC, ["o_orderstatus", "o_orderpriority"], want
        ).collect()
    }
    direct = {
        (r["o_orderstatus"], r["o_orderpriority"]): (
            round(r["revenue"], 2), r["n_orders"], round(r["avg_price"], 6),
        )
        for r in table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.avg("o_totalprice").alias("avg_price"),
        )
        .collect()
    }
    assert got == direct


def test_rollup_plan_reads_only_the_mv(spark, mv_path):
    df = query_rollup(
        spark, mv_path, SPEC, ["o_orderstatus"], {"revenue": ("sum", "o_totalprice")}
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    import re

    locs = re.findall(r"Location: InMemoryFileIndex[^\n]*\[([^\]]*)\]", p)
    assert locs and all("orders_rollup" in loc for loc in locs)


def test_non_derivable_requests_refuse(spark, mv_path):
    # key outside the MV grain
    assert not can_answer(SPEC, ["o_clerk"], {"n": ("count", "*")})
    # measure the MV never summed
    assert not can_answer(SPEC, ["o_orderstatus"], {"s": ("sum", "o_shippriority")})
    # count(col) for a column the MV carries no non-null counter for
    assert not can_answer(SPEC, ["o_orderstatus"], {"n": ("count", "o_clerk")})
    with pytest.raises(ValueError):
        query_rollup(
            spark, mv_path, SPEC, ["o_clerk"], {"n": ("count", "*")}
        )


def test_nullable_measure_avg_and_count_match_sql_semantics(
    spark, sf_dir, tmp_path
):
    """SQL AVG/COUNT(col) ignore NULLs; the MV must too. Fact with a
    measure NULLed out on ~half the rows (and one group all-NULL) —
    the rollup answer must equal the direct aggregation, including the
    NULL avg for the all-NULL group."""
    fact = table(spark, sf_dir, "orders").withColumn(
        "price_n",
        # status 'P' -> all-NULL group; elsewhere NULL on odd keys
        F.when(
            F.col("o_orderstatus") != "P",
            F.when(F.col("o_orderkey") % 2 == 0, F.col("o_totalprice")),
        ),
    )
    spec = MVSpec(keys=("o_orderstatus",), measures=("price_n",))
    p = str(tmp_path / "null_mv")
    build_mv(fact, spec, p)
    want = {
        "avg_price": ("avg", "price_n"),
        "n_priced": ("count", "price_n"),
        "n_all": ("count", "*"),
    }
    got = {
        r["o_orderstatus"]: (
            None if r["avg_price"] is None else round(r["avg_price"], 6),
            r["n_priced"],
            r["n_all"],
        )
        for r in query_rollup(spark, p, spec, ["o_orderstatus"], want).collect()
    }
    direct = {
        r["o_orderstatus"]: (
            None if r["avg_price"] is None else round(r["avg_price"], 6),
            r["n_priced"],
            r["n_all"],
        )
        for r in fact.groupBy("o_orderstatus")
        .agg(
            F.avg("price_n").alias("avg_price"),
            F.count("price_n").alias("n_priced"),
            F.count(F.lit(1)).alias("n_all"),
        )
        .collect()
    }
    assert got == direct
