"""Coin-pipeline parity: the reference's end-to-end dataflow
(CoinGecko JSON → normalize → split into dim/fact → stage → MERGE →
archive/purge) re-expressed as one composable Spark batch pipeline
with a deterministic ``batch_id`` instead of wall-clock filenames."""

from .coins import (
    RAW_COIN_SCHEMA,
    CoinWarehouse,
    normalize,
    read_raw_json,
    split_info,
    split_metrics,
)

__all__ = [
    "RAW_COIN_SCHEMA",
    "CoinWarehouse",
    "normalize",
    "read_raw_json",
    "split_info",
    "split_metrics",
]
