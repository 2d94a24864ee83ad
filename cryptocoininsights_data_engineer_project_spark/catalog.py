"""Table catalog over the driver-generated parquet testdata.

``load(spark, sf_dir)`` returns a dict of DataFrames for the TPC-H-ish
star schema plus the LLM-pipeline tables. All reads are schema-on-file
parquet scans — Catalyst prunes columns and pushes predicates into the
scan, so callers should select/filter early and let the optimizer do
the rest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .session import tune_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor: they are
# bounded by the real world (5 regions, 25 nations), not by data volume.
ALWAYS_BROADCAST = {"region", "nation"}

# Columns every consumer in the registry depends on. Checked on read so a
# driver-side testdata regeneration that renames or drops a column fails
# with ONE diagnostic naming the table and the drift, instead of dozens of
# identical unresolved-column AnalysisExceptions downstream (the round-2
# events.ts dtype drift cost a full round — see _events).
REQUIRED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
    "orders": {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    },
    "lineitem": {
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding"},
}


def _check_columns(name: str, df: DataFrame) -> DataFrame:
    missing = REQUIRED_COLUMNS[name] - set(df.columns)
    if missing:
        raise ValueError(
            f"table {name!r} is missing expected column(s) {sorted(missing)}; "
            f"found {df.columns} — testdata generator drift?"
        )
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    tune_session(spark)
    if name == "events":
        return _events(spark, sf_dir)
    return _check_columns(
        name, spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    )


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize events.parquet to a stable shape regardless of how the
    generator stored ``ts``:

    - older drops: TIMESTAMP(NANOS), which Spark's reader only accepts
      as int64 via ``spark.sql.legacy.parquet.nanosAsLong``;
    - current drops: TIMESTAMP(MICROS) (``timestamp[us]``), read
      natively as TIMESTAMP_NTZ / TIMESTAMP.

    Output columns are identical either way:

    - ``ts``     timestamp_ntz at microsecond precision (nanos inputs
                 are floor-truncated the same way DuckDB truncates
                 ns → µs, so oracle comparisons agree);
    - ``ts_ns``  int64 nanoseconds for full-precision ops.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # TIMESTAMP -> TIMESTAMP_NTZ cast goes through the session zone; pin
    # it so `ts` is the same wall-clock instant DuckDB reads.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = _check_columns(
        "events", spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    )
    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # int64 nanoseconds (legacy nanos file read via nanosAsLong)
        return raw.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts",
            F.expr("CAST(timestamp_micros(ts_ns div 1000) AS TIMESTAMP_NTZ)"),
        )
    if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
        # Same column order as the legacy branch: ts_ns where the raw
        # ts column sat, derived ts appended last.
        cols = [
            F.expr(
                "unix_micros(CAST(CAST(ts AS TIMESTAMP_NTZ) AS TIMESTAMP)) * 1000L"
            ).alias("ts_ns")
            if c == "ts"
            else F.col(c)
            for c in raw.columns
        ]
        cols.append(F.col("ts").cast("timestamp_ntz").alias("ts"))
        return raw.select(*cols)
    raise TypeError(
        f"events.ts has unsupported dtype {ts_type}; expected int64 "
        "nanoseconds or a timestamp type (testdata generator drift?)"
    )


def load(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    tune_session(spark)
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so queries can be written in
    SQL (same Catalyst plan as the DataFrame API)."""
    for name, df in load(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
