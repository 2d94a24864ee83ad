"""Data-layout operators: Z-order (Morton) interleaving for
multi-dimensional clustering.

Sorting a table by ONE column gives perfect pruning on that column and
none on any other. Interleaving the bits of two key columns into one
Morton code and sorting by THAT bounds every ~2^(2j)-row run of the
sort order inside a 2^j x 2^j tile of (x, y) space — so parquet
row-group min/max stats prune selective predicates on EITHER column.
This is the standard lakehouse OPTIMIZE ZORDER BY technique, here as a
pure whole-stage-codegen expression (32 shift/mask/or terms — no UDF,
no Python), with the identical arithmetic generated for DuckDB so the
codes are cross-engine checkable.

At 100 TB the usage is: ``df.repartitionByRange(N, zkey).
sortWithinPartitions(zkey).write...`` — range partition + local sort
by the Morton code, then every file covers one tile of the key space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16


def _interleave_terms(x: str, y: str, bits: int, shift_op: str) -> str:
    """SUM of (bit j of x) << 2j  |  (bit j of y) << 2j+1, as SQL text.

    ``shift_op`` abstracts the right-shift spelling: Spark uses
    ``shiftright(c, j)``, DuckDB uses ``(c >> j)``.
    """
    terms = []
    for j in range(bits):
        xs = shift_op.format(col=x, n=j)
        ys = shift_op.format(col=y, n=j)
        terms.append(f"(({xs} & 1) * {1 << (2 * j)})")
        terms.append(f"(({ys} & 1) * {1 << (2 * j + 1)})")
    return " + ".join(terms)


def zorder_spark_sql(x: str, y: str, bits: int = ZORDER_BITS) -> str:
    """Spark SQL expression for the Morton code of (x, y); both inputs
    must already be non-negative and < 2^bits (mask upstream)."""
    return (
        f"CAST({_interleave_terms(x, y, bits, 'shiftright({col}, {n})')} AS BIGINT)"
    )


def zorder_duck_sql(x: str, y: str, bits: int = ZORDER_BITS) -> str:
    return f"CAST({_interleave_terms(x, y, bits, '({col} >> {n})')} AS BIGINT)"


def with_zorder_key(
    df: DataFrame, x: str, y: str, out: str = "zkey", bits: int = ZORDER_BITS
) -> DataFrame:
    """Append the Morton code of (x, y), each min/max-normalized to
    the FULL 2^bits range first.

    Normalization is load-bearing, not cosmetic: interleaving raw
    values whose ranges span different bit-widths puts the wider
    dimension's high bits above every bit of the narrower one, so
    range-splitting the code clusters only the wide dimension (the
    narrow one stays at ~100% span per file). Scaling both to the same
    width makes the interleave alternate MEANINGFUL bits. The min/max
    pass is one tiny aggregate (4 longs to the driver — stats a table
    catalog would already hold)."""
    mask = (1 << bits) - 1
    stats = df.agg(
        F.min(x).alias("nx"), F.max(x).alias("xx"),
        F.min(y).alias("ny"), F.max(y).alias("xy"),
    ).first()
    rx = max(int(stats.xx) - int(stats.nx), 1)
    ry = max(int(stats.xy) - int(stats.ny), 1)
    d = df.withColumn(
        "__zx", F.expr(f"CAST((({x} - {int(stats.nx)}) * {mask}) div {rx} AS BIGINT)")
    ).withColumn(
        "__zy", F.expr(f"CAST((({y} - {int(stats.ny)}) * {mask}) div {ry} AS BIGINT)")
    )
    return d.withColumn(out, F.expr(zorder_spark_sql("__zx", "__zy", bits))).drop(
        "__zx", "__zy"
    )


def zorder_write(
    df: DataFrame, path: str, x: str, y: str, n_files: int = 32
) -> None:
    """Cluster-and-write: range-partition by the Morton code, sort
    within partitions, drop the key — every output file covers one
    tile of (x, y) space, so min/max stats prune on both columns."""
    keyed = with_zorder_key(df, x, y)
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
) -> None:
    """Persist a table hash-bucketed AND per-bucket-sorted on ``key``
    (Hive-compatible bucketing via ``saveAsTable``).

    This is the storage-side half of the co-located join: two tables
    bucketed on the same key with the same bucket count join WITHOUT
    any Exchange — each task reads bucket i of both sides and merges.
    At 100 TB this turns every repeated fact-fact join on the same key
    (the workload's star joins, MERGE stages, IVM refreshes) from a
    full two-sided shuffle into a metadata decision made once at write
    time. The engine-parity story is unaffected: bucketing changes the
    physical plan, never results."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def colocated_join(spark, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-key/same-count bucketed tables; with bucketing
    active the physical plan contains NO Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key)
