"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (TPC-H-Q1-shaped pricing summary)
  at sf0.001 — smoke check.
- ``queries()``: one named entry per implemented operator from
  SURVEY.md §2 (registry in
  cryptocoininsights_data_engineer_project_spark/queries.py).
- ``oracle_sql()``: DuckDB twins of each query; names/types/rounding
  aligned so the driver's order-insensitive value hash matches.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# importable regardless of the caller's working directory
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from cryptocoininsights_data_engineer_project_spark import queries as _registry  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _registry.q1_pricing_summary(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
