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

# Columns every consumer in the registry depends on, with the Spark dtype
# (``simpleString``) each consumer assumes. Checked on read so a driver-side
# testdata regeneration that renames, drops, or RETYPES a column (e.g. a
# decimal→double flip on a price) fails with ONE diagnostic naming the table
# and the drift, instead of dozens of downstream AnalysisExceptions or —
# worse — silently different arithmetic (the round-2 events.ts dtype drift
# cost a full round; see _events). ``None`` = any dtype accepted here
# because a dedicated branch normalizes it (events.ts: legacy int64-nanos
# vs current timestamp — _events raises its own diagnostic for anything
# else). Extra columns are always allowed (e.g. embeddings.label).
EXPECTED_SCHEMA: dict[str, dict[str, str | None]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint",
        "ts": None,  # int64 nanos OR timestamp — normalized by _events
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>"},
}


def _check_columns(name: str, df: DataFrame) -> DataFrame:
    expected = EXPECTED_SCHEMA[name]
    missing = set(expected) - set(df.columns)
    if missing:
        raise ValueError(
            f"table {name!r} is missing expected column(s) {sorted(missing)}; "
            f"found {df.columns} — testdata generator drift?"
        )
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    drifted = sorted(
        f"{col}: expected {want}, found {actual[col]}"
        for col, want in expected.items()
        if want is not None and actual[col] != want
    )
    if drifted:
        raise ValueError(
            f"table {name!r} has dtype drift — {'; '.join(drifted)} — "
            "testdata generator drift? (update EXPECTED_SCHEMA only after "
            "auditing every consumer's arithmetic)"
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
