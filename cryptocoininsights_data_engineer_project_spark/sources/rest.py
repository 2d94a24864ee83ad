"""S1/S2: REST ingestion and the raw JSON sink.

Reference behavior: an AWS Lambda GETs CoinGecko ``/coins/markets``
(data-extract.py:12-20), then writes the JSON payload to S3 with a
wall-clock-timestamped key (data-extract.py:23-33), swallowing every
error (data-extract.py:35-46 — the DAG's sensors detect missing data
by timing out an hour later).

Spark-first design:
- There is no distributed HTTP source in Spark, and one API page of
  ~250 coins doesn't need one: the fetch is a driver-side call whose
  result becomes a DataFrame via ``createDataFrame`` with an explicit
  schema. For many-page crawls the page-id list would be parallelized
  with ``spark.range(n_pages).mapInPandas(fetch_page)`` — the fetch
  itself distributed, one task per page window.
- Errors RAISE. A failed extraction fails the batch — transactional
  per run, unlike the reference's log-and-swallow.
- The sink writes with a caller-supplied deterministic ``batch_id``
  instead of ``datetime.now()`` so runs are reproducible and the
  DuckDB oracle can replay them.

The default ``fetch_fn`` uses ``requests`` if available (gated import:
the test container has no network); tests inject a fixture-backed
callable, which is exactly how the unit seam should work anyway.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..pipeline.coins import RAW_COIN_SCHEMA

COINGECKO_URL = (
    "https://api.coingecko.com/api/v3/coins/markets?vs_currency=usd"  # data-extract.py:12
)


def _default_fetch(url: str = COINGECKO_URL) -> list[dict]:
    try:
        import requests  # gated: not guaranteed in every container
    except ImportError as exc:  # pragma: no cover
        raise RuntimeError(
            "requests not installed; pass fetch_fn= explicitly"
        ) from exc
    resp = requests.get(url, timeout=30)
    resp.raise_for_status()  # reference parity: data-extract.py:18
    return resp.json()


def ingest_rest(
    spark: SparkSession,
    fetch_fn: Callable[[], list[dict]] | None = None,
    schema=RAW_COIN_SCHEMA,
) -> DataFrame:
    """S1: one REST page → typed DataFrame. Raises on failure (no
    silent-swallow: the reference's error model is replaced by
    fail-the-batch)."""
    rows = (fetch_fn or _default_fetch)()
    if not isinstance(rows, list):
        raise ValueError(f"expected a JSON array of coin rows, got {type(rows)}")
    return spark.createDataFrame(rows, schema)


def write_raw_json(df: DataFrame, raw_dir: str, batch_id: int) -> str:
    """S2: raw-layer sink. One JSON array per batch (the exact shape
    data-extract.py:29-33 puts to S3), deterministic filename
    ``raw_coins_batch{batch_id}.json`` instead of the reference's
    ``cryptoinsight_raw_{datetime.now()}`` (data-extract.py:24-27).

    Driver-side serialization is fine at one-API-page scale; bulk
    re-emission of raw data is ``df.write.json`` (JSON-lines,
    executor-parallel) — both shapes are readable back by
    ``read_raw_json``'s schema."""
    os.makedirs(raw_dir, exist_ok=True)
    path = os.path.join(raw_dir, f"raw_coins_batch{batch_id}.json")
    payload = [row.asDict(recursive=True) for row in df.collect()]
    with open(path, "w") as f:
        json.dump(payload, f, default=str)
    return path


def write_raw_json_bulk(
    df: DataFrame, raw_dir: str, batch_id: int, n_files: int | None = None
) -> str:
    """S2 at scale: the executor-parallel raw sink ``write_raw_json``'s
    docstring promises. ``df.write.json`` emits JSON-lines part files
    under ``raw_coins_batch{batch_id}/`` — every executor writes its
    own partitions, nothing funnels through the driver, so the raw
    layer has no bottleneck at 100 TB. ``n_files`` coalesces small
    batches down (a one-page batch doesn't need 32 part files);
    leave it None to keep the upstream parallelism.

    Readable back by ``read_raw_json`` (it detects the directory shape
    and switches off multiLine), with the same ``batch_id`` recovery —
    the directory name carries the batch token the reference encoded
    in its S3 key (data-extract.py:24-27)."""
    path = os.path.join(raw_dir, f"raw_coins_batch{batch_id}")
    writer = df.coalesce(n_files) if n_files else df
    writer.write.mode("overwrite").json(path)
    return path
