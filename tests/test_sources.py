"""Sources/sinks: REST ingestion seam (S1), raw JSON sink (S2),
managed-table sink (S8)."""

from __future__ import annotations

import json

import pytest

from cryptocoininsights_data_engineer_project_spark.pipeline import fixtures
from cryptocoininsights_data_engineer_project_spark.pipeline.coins import (
    normalize,
    read_raw_json,
    split_info,
)
from cryptocoininsights_data_engineer_project_spark.sources.rest import (
    ingest_rest,
    write_raw_json,
    write_raw_json_bulk,
)


def _fake_payload():
    import random

    rng = random.Random(42)
    return [fixtures._coin(rng, i, 0) for i in range(25)]


def test_ingest_rest_with_fixture_fetch(spark):
    df = ingest_rest(spark, fetch_fn=_fake_payload)
    assert df.count() == 25
    assert df.schema["roi"].dataType.typeName() == "struct"
    row = df.filter("symbol = 'c0003'").first()
    assert row["market_cap_rank"] == 4


def test_ingest_rest_raises_on_bad_payload(spark):
    # error model: raise, never swallow (unlike data-extract.py:35-46)
    with pytest.raises(ValueError, match="JSON array"):
        ingest_rest(spark, fetch_fn=lambda: {"error": "rate limited"})
    with pytest.raises(Exception):
        ingest_rest(spark, fetch_fn=lambda: (_ for _ in ()).throw(IOError("boom")))


def test_write_raw_json_roundtrip(spark, tmp_path):
    df = ingest_rest(spark, fetch_fn=_fake_payload)
    path = write_raw_json(df, str(tmp_path), batch_id=7)
    assert path.endswith("raw_coins_batch7.json")
    with open(path) as f:
        payload = json.load(f)
    assert len(payload) == 25
    back = read_raw_json(spark, path)
    assert back.count() == 25
    assert back.first()["batch_id"] == 7
    # full pipeline composes on re-read
    assert split_info(normalize(back)).count() == 25


def test_table_sink_saveAsTable(spark, tmp_path):
    # S8: managed-table append (COPY→stage semantics,
    # coininsights.py:82,100); warehouse dir is set by the session
    # factory (static conf)
    df = ingest_rest(spark, fetch_fn=_fake_payload)
    info = split_info(normalize(df.selectExpr("*", "CAST(0 AS INT) AS batch_id")))
    info.write.mode("overwrite").saveAsTable("coin_info_stage")
    assert spark.table("coin_info_stage").count() == 25
    info.write.mode("append").saveAsTable("coin_info_stage")
    assert spark.table("coin_info_stage").count() == 50
    spark.sql("TRUNCATE TABLE coin_info_stage")  # M3
    assert spark.table("coin_info_stage").count() == 0
    spark.sql("DROP TABLE coin_info_stage")


def test_orc_sink_scan_roundtrip(spark, sf_dir, tmp_path):
    """ORC source/sink coverage: write a projected lineitem slice to
    ORC, read it back identically, and confirm predicate pushdown
    reaches the ORC scan (same contract as the parquet path)."""
    import contextlib
    import io

    from cryptocoininsights_data_engineer_project_spark.catalog import table

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_shipdate"
    )
    dst = str(tmp_path / "li_orc")
    li.write.mode("overwrite").orc(dst)
    back = spark.read.orc(dst)
    assert sorted(map(str, back.collect())) == sorted(map(str, li.collect()))

    filtered = back.filter(back.l_quantity > 40).select("l_orderkey")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        filtered.explain("formatted")
    plan = buf.getvalue()
    assert "Scan orc" in plan
    assert "l_quantity" in plan.split("PushedFilters:")[1].splitlines()[0]


def test_write_raw_json_bulk_roundtrip(spark, tmp_path):
    """The executor-parallel raw sink (VERDICT r5 #4): part files are
    written by executors (several of them when the frame has several
    partitions — no driver funnel), and read_raw_json detects the
    directory shape, recovers the batch_id from the directory name,
    and composes with the downstream pipeline identically to the
    single-file shape."""
    import glob
    import os

    df = ingest_rest(spark, fetch_fn=_fake_payload).repartition(4)
    path = write_raw_json_bulk(df, str(tmp_path), batch_id=9)
    assert path.endswith("raw_coins_batch9")
    parts = glob.glob(os.path.join(path, "part-*"))
    assert len(parts) == 4  # one file per partition: executor-parallel

    back = read_raw_json(spark, path)
    assert back.count() == 25
    assert {r["batch_id"] for r in back.select("batch_id").distinct().collect()} == {9}
    assert split_info(normalize(back)).count() == 25

    # rows survive the trip bit-for-bit (modulo order)
    a = sorted(map(str, df.drop("batch_id").collect()))
    b = sorted(map(str, back.drop("batch_id").collect()))
    assert a == b

    # n_files coalesces small batches down without losing rows
    p2 = write_raw_json_bulk(df, str(tmp_path / "small"), batch_id=3, n_files=1)
    assert len(glob.glob(os.path.join(p2, "part-*"))) == 1
    assert read_raw_json(spark, p2).count() == 25
