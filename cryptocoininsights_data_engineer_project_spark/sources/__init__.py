"""Sources/sinks beyond plain parquet scans: REST ingestion (S1),
raw JSON sink (S2). File scans (S3/S4), CSV compat (S6/S7) and managed
tables (S8) live in pipeline/coins.py next to their pipeline stages."""

from .rest import ingest_rest, write_raw_json

__all__ = ["ingest_rest", "write_raw_json"]
