"""Custom Python DataSource (Spark 4) + streaming dedup tests."""

from __future__ import annotations

import json

from cryptocoininsights_data_engineer_project_spark.sources.coin_datasource import (
    CoinMarketsDataSource,
)
from cryptocoininsights_data_engineer_project_spark.streaming.ingest import (
    streaming_dedup,
)


def test_coin_datasource_paged_read(spark):
    spark.dataSource.register(CoinMarketsDataSource)
    df = (
        spark.read.format("coin_markets")
        .option("pages", 3)
        .option("per_page", 50)
        .load()
    )
    assert df.count() == 150
    # one input partition per page
    assert df.rdd.getNumPartitions() == 3
    pages = {r["page"] for r in df.select("page").distinct().collect()}
    assert pages == {0, 1, 2}
    # deterministic: same options, same data
    again = (
        spark.read.format("coin_markets")
        .option("pages", 3)
        .option("per_page", 50)
        .load()
    )
    assert sorted(r["id"] for r in df.collect()) == sorted(
        r["id"] for r in again.collect()
    )
    # ~20% null max_supply like the real feed
    nulls = df.filter("max_supply IS NULL").count()
    assert 0 < nulls < 150


def test_stream_stream_interval_join(spark, tmp_path):
    # errors stream joined to purchases stream within ±1h per user —
    # the streaming twin of the batch range_join_counts query
    from cryptocoininsights_data_engineer_project_spark.streaming.ingest import (
        interval_join_streams,
    )

    errs = tmp_path / "errs"
    purch = tmp_path / "purch"
    errs.mkdir()
    purch.mkdir()
    with open(errs / "e.json", "w") as f:
        f.write(json.dumps({"event_id": 1, "user_id": 7, "ts": "2024-03-10T12:00:00"}) + "\n")
        f.write(json.dumps({"event_id": 2, "user_id": 8, "ts": "2024-03-10T12:00:00"}) + "\n")
    with open(purch / "p.json", "w") as f:
        f.write(json.dumps({"event_id": 10, "user_id": 7, "ts": "2024-03-10T12:30:00"}) + "\n")  # in window
        f.write(json.dumps({"event_id": 11, "user_id": 7, "ts": "2024-03-10T15:00:00"}) + "\n")  # outside
        f.write(json.dumps({"event_id": 12, "user_id": 9, "ts": "2024-03-10T12:10:00"}) + "\n")  # wrong user

    schema = "event_id long, user_id long, ts timestamp"
    l = spark.readStream.schema(schema).json(str(errs))
    r = spark.readStream.schema(schema).json(str(purch))
    joined = interval_join_streams(l, r, key="user_id").select(
        l.event_id.alias("err_id"), r.event_id.alias("purch_id")
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("sxs_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {(r["err_id"], r["purch_id"]) for r in spark.sql("SELECT * FROM sxs_join").collect()}
    assert got == {(1, 10)}  # only the in-window same-user pair


def test_stream_static_enrichment(spark, tmp_path, sf_dir):
    # stream of synthetic order events enriched with the static
    # customer dim — the streaming star join (J3/T-series)
    from cryptocoininsights_data_engineer_project_spark.catalog import table
    from cryptocoininsights_data_engineer_project_spark.streaming.ingest import (
        enrich_stream,
    )

    raw = tmp_path / "raw"
    raw.mkdir()
    with open(raw / "orders.json", "w") as f:
        for i, cust in enumerate([0, 1, 2, 99999]):  # last one unmatched
            f.write(json.dumps({"order_id": i, "c_custkey": cust, "amt": 10.0 * i}) + "\n")

    customers = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    stream = spark.readStream.schema("order_id long, c_custkey long, amt double").json(
        str(raw)
    )
    q = (
        enrich_stream(stream, customers, on="c_custkey")
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = {r["order_id"]: r["c_mktsegment"] for r in spark.sql("SELECT * FROM enriched").collect()}
    assert len(rows) == 4
    assert rows[3] is None  # unmatched key survives (left join)
    assert all(v is not None for k, v in rows.items() if k < 3)


def test_streaming_dedup_drops_redeliveries(spark, tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()

    def write(fname, rows):
        with open(raw / fname, "w") as f:
            for eid, ts in rows:
                f.write(json.dumps({"event_id": eid, "ts": ts, "value": 1.0}) + "\n")

    # batch 1: three events; batch 2: one re-delivery + one new event
    write("f1.json", [(1, "2024-03-10T12:00:00"), (2, "2024-03-10T12:01:00"),
                      (3, "2024-03-10T12:02:00")])
    write("f2.json", [(2, "2024-03-10T12:01:00"), (4, "2024-03-10T12:03:00")])

    schema = "event_id long, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(str(raw))
    )
    q = (
        streaming_dedup(stream, keys=["event_id"], watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    ids = sorted(r["event_id"] for r in spark.sql("SELECT * FROM dedup_out").collect())
    assert ids == [1, 2, 3, 4]  # the redelivered 2 appears exactly once


def test_coin_datasource_streaming_read(spark, tmp_path):
    spark.dataSource.register(CoinMarketsDataSource)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("coin_markets")
            .option("per_page", 20)
            .option("max_pages", 4)
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    out = spark.read.parquet(out_dir)
    # 4 pages x 20 rows, each page ingested exactly once
    assert out.count() == 80
    pages = sorted(r["page"] for r in out.select("page").distinct().collect())
    assert pages == [0, 1, 2, 3]
    # restart from the same checkpoint: offsets are committed, no replay,
    # no duplicates in the sink
    run_once()
    assert spark.read.parquet(out_dir).count() == 80


def test_simple_stream_reader_reads_feed_exactly_once(spark, tmp_path):
    """coin_markets_simple (SimpleDataSourceStreamReader): every page
    arrives exactly once across micro-batches, offsets advance one
    page per batch on the driver, and exhaustion yields empty batches
    rather than duplicates."""
    import time

    from cryptocoininsights_data_engineer_project_spark.sources.coin_datasource import (
        CoinMarketsSimpleDataSource,
    )

    spark.dataSource.register(CoinMarketsSimpleDataSource)
    q = (
        spark.readStream.format("coin_markets_simple")
        .option("max_pages", 3)
        .option("per_page", 40)
        .load()
        .writeStream.format("memory")
        .queryName("simple_feed")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("simple_feed").count() >= 120:
                break
            time.sleep(0.5)
        # let a couple of post-exhaustion (empty) batches run
        time.sleep(1.5)
        got = spark.table("simple_feed")
        assert got.count() == 120  # 3 pages × 40, no replays after exhaustion
        assert {r["page"] for r in got.select("page").distinct().collect()} == {0, 1, 2}
        assert got.select("id").distinct().count() == 120
    finally:
        q.stop()


def test_rate_limited_pages_retry_then_succeed(spark):
    """Transient 429s on specific pages are absorbed by in-task
    backoff: the read returns the complete dataset, no rows dropped
    (the reference swallows the error and ships nothing —
    data-extract.py:35-46)."""
    spark.dataSource.register(CoinMarketsDataSource)
    df = (
        spark.read.format("coin_markets")
        .option("pages", 4)
        .option("per_page", 25)
        .option("fail_pages", "1,3")
        .option("fail_times", 2)  # < max_retries=3 → recovers
        .option("backoff_s", 0.0)
        .load()
    )
    assert df.count() == 100
    pages = {r["page"] for r in df.select("page").distinct().collect()}
    assert pages == {0, 1, 2, 3}


def test_rate_limit_exhaustion_fails_loudly(spark):
    """A page that stays rate-limited past max_retries fails the job —
    never a silently-short dataset."""
    import pytest
    from py4j.protocol import Py4JJavaError

    spark.dataSource.register(CoinMarketsDataSource)
    df = (
        spark.read.format("coin_markets")
        .option("pages", 2)
        .option("per_page", 10)
        .option("fail_pages", "1")
        .option("fail_times", 10)  # > max_retries → exhausts
        .option("max_retries", 2)
        .option("backoff_s", 0.0)
        .load()
    )
    with pytest.raises((Py4JJavaError, Exception), match="429|RateLimited"):
        df.count()


def test_fetch_with_retry_backoff_schedule():
    """The backoff doubles per attempt and raises after max_retries."""
    from cryptocoininsights_data_engineer_project_spark.sources.coin_datasource import (
        RateLimitedError,
        fetch_with_retry,
    )

    sleeps: list[float] = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] <= 3:
            raise RateLimitedError("429")
        return "ok"

    assert (
        fetch_with_retry(
            flaky, max_retries=3, backoff_s=1.0, sleep=sleeps.append
        )
        == "ok"
    )
    assert sleeps == [1.0, 2.0, 4.0]

    calls["n"] = -100  # needs 103 successes' worth of failures → exhausts
    import pytest

    with pytest.raises(RateLimitedError):
        fetch_with_retry(
            flaky, max_retries=2, backoff_s=0.5, sleep=sleeps.append
        )
