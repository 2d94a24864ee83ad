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
    with pytest.raises(ValueError):
        query_rollup(
            spark, mv_path, SPEC, ["o_clerk"], {"n": ("count", "*")}
        )
