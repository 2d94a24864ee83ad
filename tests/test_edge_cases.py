"""Edge behaviors: malformed raw input (error model), CSV dialect
corners, watermark late-data drop (T5 semantics)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from cryptocoininsights_data_engineer_project_spark.pipeline.coins import (
    read_csv,
    read_raw_json,
    write_csv,
)
from cryptocoininsights_data_engineer_project_spark.streaming.ingest import (
    windowed_event_counts,
)


def test_corrupt_raw_file_fails_fast(spark, tmp_path):
    bad = tmp_path / "raw_coins_batch0.json"
    bad.write_text('[{"id": "x", "symbol": ')  # truncated JSON
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST|parse"):
        read_raw_json(spark, str(bad)).collect()
    # permissive mode salvages instead of failing
    rows = read_raw_json(spark, str(bad), mode="PERMISSIVE").collect()
    assert all(r["id"] is None for r in rows)


def test_csv_dialect_quoting_roundtrip(spark, tmp_path):
    # the reference dialect (coininsights.py:85,103): comma delimiter,
    # double-quote quoting, header — fields containing commas, quotes
    # and newlines must survive a write/read cycle
    schema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("name", T.StringType())]
    )
    rows = [
        ("a", 'plain'),
        ("b", 'has, comma'),
        ("c", 'has "quotes"'),
        ("d", 'multi\nline'),
        ("e", None),
    ]
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "csv")
    write_csv(df, path)
    back = read_csv(
        spark,
        path,
        schema,
    )
    # multiLine needed only on read of embedded newlines
    back = (
        spark.read.schema(schema)
        .option("header", True)
        .option("quote", '"')
        .option("multiLine", True)
        .csv(path)
    )
    got = {r["id"]: r["name"] for r in back.collect()}
    assert got == dict(rows)


def test_watermark_drops_late_rows(spark, tmp_path):
    """T5: rows arriving later than the watermark are DROPPED from
    windowed aggregation — unlike the reference, which re-merges late
    files idempotently (coininsights.py:116-165). Documented semantic
    difference, asserted here."""
    raw = tmp_path / "raw"
    raw.mkdir()

    def write(fname, rows):
        with open(raw / fname, "w") as f:
            for eid, ts, val in rows:
                f.write(json.dumps({"event_id": eid, "ts": ts, "value": val,
                                    "user_id": 1, "event_type": "click"}) + "\n")

    schema = "event_id long, ts timestamp, value double, user_id long, event_type string"

    out = str(tmp_path / "out")

    def run_once():
        stream = spark.readStream.schema(schema).json(str(raw))
        q = (
            windowed_event_counts(stream, "24 hours", "1 hour")
            .writeStream.format("json")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # run 1: recent data only -> checkpointed watermark = 13:00 - 1h
    write("f1.json", [(1, "2024-03-10T12:00:00", 1.0), (2, "2024-03-10T13:00:00", 1.0)])
    run_once()
    # run 2: a row 3 DAYS older than the watermark (must be dropped)
    # plus a fresh row that keeps the stream moving
    write("f2.json", [(3, "2024-03-07T00:00:00", 99.0), (4, "2024-03-10T13:30:00", 1.0)])
    run_once()
    rows = (
        spark.read.schema("start timestamp, end timestamp, event_type string, n long, total_value double")
        .json(out)
        .collect()
    )
    # the 2024-03-07 window (the late row) must not appear with data
    assert all(r["start"].day != 7 for r in rows), rows


def test_new_operators_tolerate_degenerate_inputs(spark):
    """Empty and single-row inputs must not crash the round-2
    operators (a 100 TB pipeline hits empty partitions and empty
    filter results constantly)."""
    from cryptocoininsights_data_engineer_project_spark.operators import (
        dedup,
        fuzzy,
        sketch,
    )

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert dedup.simhash_hamming_pairs(empty_docs).count() == 0
    one_doc = spark.createDataFrame([(1, "hello world one")], "doc_id long, text string")
    assert dedup.simhash_hamming_pairs(one_doc).count() == 0

    empty_p = spark.createDataFrame([], "k long, blk string, txt string")
    assert fuzzy.edit_distance_pairs(empty_p, "k", "txt", "blk").count() == 0
    one_p = spark.createDataFrame([(1, "b", "some name")], "k long, blk string, txt string")
    assert fuzzy.edit_distance_pairs(one_p, "k", "txt", "blk").count() == 0

    one_key = spark.createDataFrame([(7,), (7,), (7,)], "l_partkey long")
    rows = sketch.cms_topk(one_key, "l_partkey").collect()
    assert [(r.key, r.est_count) for r in rows] == [(7, 3)]


def test_multimodal_decode_ignores_malformed_headers(spark):
    """Truncated or wrong-magic payloads fall through to text/plain
    with NULL media fields — never a parse error."""
    from cryptocoininsights_data_engineer_project_spark.operators import multimodal

    rows = [
        (1, b"\x89PNG"),                      # truncated PNG signature
        (2, b"RIFFxxxxWAVE"),                 # RIFF but no fmt chunk
        (3, b""),                             # empty payload
        (4, b"\x89PNG\r\n\x1a\nXXXXYYYY"),    # signature but no IHDR
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {r.asset_id: r for r in multimodal.decode_meta(df).collect()}
    for aid in (1, 2, 3, 4):
        assert got[aid].media_type == "text/plain"
        assert got[aid].width is None and got[aid].sample_rate is None


def test_mutual_info_entropy_counts_all_segments(spark, tmp_path):
    # Regression: H(segment) was once summed via a min-b guard
    # (only cells where b == min(b) contributed) — a segment with NO
    # order at the minimum priority silently vanished from the
    # entropy, in engine and oracle alike. Build exactly that shape:
    # segment 'BLD' never places a '1-URGENT' order.
    import datetime
    import math

    from cryptocoininsights_data_engineer_project_spark.queries import REGISTRY

    d = datetime.datetime(1995, 1, 1)
    orders = spark.createDataFrame(
        [
            (1, 1, "O", 10.0, d, "1-URGENT"),
            (2, 1, "O", 10.0, d, "2-HIGH"),
            (3, 2, "O", 10.0, d, "2-HIGH"),
            (4, 2, "O", 10.0, d, "2-HIGH"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    )
    customer = spark.createDataFrame(
        [
            (1, "a", 0, 0.0, "AUTO"),
            (2, "b", 0, 0.0, "BLD"),
        ],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    orders.write.parquet(str(tmp_path / "orders.parquet"))
    customer.write.parquet(str(tmp_path / "customer.parquet"))
    row = REGISTRY["mutual_info"].fn(spark, str(tmp_path)).collect()[0]
    # both segments have 2 of 4 orders -> H = ln 2, NOT the ln-half
    # a min-b-guarded sum would produce (only AUTO has an urgent cell)
    assert row["h_segment_nats"] == pytest.approx(math.log(2), abs=1e-6)
    assert row["n_cells"] == 3
