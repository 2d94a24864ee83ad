"""Catalog hardening: events.parquet `ts` dtype drift.

The driver regenerated the testdata between rounds, switching events.ts
from TIMESTAMP(NANOS) (readable only as int64 via
``spark.sql.legacy.parquet.nanosAsLong``) to TIMESTAMP(MICROS). The
catalog must normalize BOTH encodings to the same (ts timestamp_ntz,
ts_ns int64-nanos) shape, and fail with a diagnosis — not 30 identical
AnalysisExceptions downstream — on anything else.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cryptocoininsights_data_engineer_project_spark.catalog import table

_BASE_US = 1704067200_000_000  # 2024-01-01T00:00:00Z in microseconds
_ROWS = [
    (0, _BASE_US + 598_778_549, 13, "error", 185.22, '{"k": 87}'),
    (1, _BASE_US + 966_738_090, 12, "signup", 106.03, '{"k": 0}'),
    (2, _BASE_US + 1_017_102_229, 12, "purchase", 9.64, '{"k": 12}'),
]


def _write_events(dirpath: str, ts_array: pa.Array) -> str:
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in _ROWS], pa.string()),
            "value": pa.array([r[4] for r in _ROWS], pa.float64()),
            "props": pa.array([r[5] for r in _ROWS], pa.string()),
        }
    )
    os.makedirs(dirpath, exist_ok=True)
    pq.write_table(tbl, os.path.join(dirpath, "events.parquet"))
    return dirpath


def _assert_normalized(ev):
    assert [f.name for f in ev.schema.fields] == [
        "event_id",
        "ts_ns",
        "user_id",
        "event_type",
        "value",
        "props",
        "ts",
    ]
    assert ev.schema["ts"].dataType.typeName() == "timestamp_ntz"
    assert ev.schema["ts_ns"].dataType.typeName() == "long"
    got = {r["event_id"]: r for r in ev.collect()}
    assert got[0]["ts_ns"] == (_BASE_US + 598_778_549) * 1000
    assert got[0]["ts"] == dt.datetime(2024, 1, 1, 0, 9, 58, 778549)
    assert got[2]["ts_ns"] == (_BASE_US + 1_017_102_229) * 1000


def test_events_micros_timestamp(spark, tmp_path):
    us = pa.array(
        [r[1] for r in _ROWS], pa.timestamp("us")
    )
    sf_dir = _write_events(str(tmp_path / "us"), us)
    _assert_normalized(table(spark, sf_dir, "events"))


def test_events_nanos_legacy(spark, tmp_path):
    ns = pa.array(
        [r[1] * 1000 for r in _ROWS], pa.timestamp("ns")
    )
    sf_dir = _write_events(str(tmp_path / "ns"), ns)
    _assert_normalized(table(spark, sf_dir, "events"))


def test_events_unsupported_dtype_diagnosed(spark, tmp_path):
    bad = pa.array([str(r[1]) for r in _ROWS], pa.string())
    sf_dir = _write_events(str(tmp_path / "bad"), bad)
    with pytest.raises(TypeError, match="events.ts has unsupported dtype"):
        table(spark, sf_dir, "events")


def test_missing_column_diagnosed(spark, tmp_path):
    import pytest as _pytest

    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64())})
    d = tmp_path / "docs"
    os.makedirs(d, exist_ok=True)
    pq.write_table(tbl, os.path.join(str(d), "documents.parquet"))
    with _pytest.raises(ValueError, match="documents.*missing expected column"):
        table(spark, str(d), "documents")


def test_dtype_drift_diagnosed_non_events(spark, tmp_path):
    # the next regeneration hazard: same column NAMES, silently
    # retyped (here orders.o_totalprice double -> decimal) — must fail
    # with one diagnostic naming table+column+both dtypes, not produce
    # different arithmetic downstream
    import decimal

    tbl = pa.table(
        {
            "o_orderkey": pa.array([1], pa.int64()),
            "o_custkey": pa.array([1], pa.int64()),
            "o_orderstatus": pa.array(["O"], pa.string()),
            "o_totalprice": pa.array(
                [decimal.Decimal("10.00")], pa.decimal128(12, 2)
            ),
            "o_orderdate": pa.array([_BASE_US], pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"], pa.string()),
        }
    )
    d = tmp_path / "orders_drift"
    os.makedirs(d, exist_ok=True)
    pq.write_table(tbl, os.path.join(str(d), "orders.parquet"))
    with pytest.raises(
        ValueError,
        match="orders.*dtype drift.*o_totalprice: expected double, found decimal",
    ):
        table(spark, str(d), "orders")


def test_events_ts_dtype_exempt_from_generic_check(spark, tmp_path):
    # ts is normalized by the dedicated _events branch (int64-nanos OR
    # timestamp) — the generic dtype check must not reject either shape
    ns = pa.array([r[1] * 1000 for r in _ROWS], pa.timestamp("ns"))
    sf_dir = _write_events(str(tmp_path / "ns2"), ns)
    _assert_normalized(table(spark, sf_dir, "events"))
