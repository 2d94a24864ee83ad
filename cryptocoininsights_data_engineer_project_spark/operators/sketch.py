"""Deterministic count-min sketch: approximate heavy-hitter counts
whose estimates are REPRODUCIBLE across engines.

A count-min sketch is d hash rows x w buckets of counters; a key's
estimate is the MIN over its d bucket counters — an overestimate
bounded by n/w per row, never an underestimate. Unlike HLL (whose
sketch bytes are engine-internal, see ``approx_distinct``), CMS output
is a pure function of (hash family, data), so deriving the hashes from
the portable md5 family (functions/hashing.py) makes the whole sketch
— and therefore the top-k it ranks — bit-identical in Spark and
DuckDB: an APPROXIMATE operator with an EXACT oracle.

Physical shape at 100 TB: building the sketch is one map-side-combined
groupBy over d x n tiny (row, bucket) pairs — the sketch itself is
d*w counters (a few KB), broadcast back to score the distinct keys.
No shuffle carries anything proportional to the key cardinality except
the final distinct-key aggregation, which any exact counter needs too;
the win is the sketch can be merged across partitions/streams in O(d*w)
regardless of cardinality (the classic use: pre-aggregation for
streaming heavy hitters, where exact per-key state is unbounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import (
    HASH_PRIME,
    duck_hash64,
    duck_minhash_term,
    minhash_params,
    spark_hash64,
    spark_minhash_term,
)

CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_SEED = 7
TOPK = 10

_CMS_PARAMS = minhash_params(CMS_DEPTH, CMS_SEED)


def cms_topk(
    df: DataFrame,
    key: str,
    k: int = TOPK,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(key, est_count): the k keys with the largest count-min estimate
    (ties broken by key ascending). est_count >= true count always."""
    h = df.select(
        F.col(key).alias("key"),
        F.expr(spark_hash64(f"CAST({key} AS STRING)")).alias("h"),
    )
    rows = [
        F.struct(
            F.lit(j).alias("j"),
            F.expr(f"({spark_minhash_term(a, b, 'h')}) % {width}").alias("bucket"),
        )
        for j, (a, b) in enumerate(_CMS_PARAMS[:depth])
    ]
    pairs = h.select("key", F.explode(F.array(*rows)).alias("jb")).select(
        "key", F.col("jb.j"), F.col("jb.bucket")
    )
    # the sketch: d*w counters — tiny, broadcast back for scoring
    counters = pairs.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("c"))
    key_buckets = pairs.distinct()
    est = (
        key_buckets.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy("key")
        .agg(F.min("c").alias("est_count"))
    )
    w = Window.orderBy(F.col("est_count").desc(), F.col("key").asc())
    return (
        est.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(F.col("key"), "est_count")
    )


def cms_topk_oracle_sql(
    table: str,
    key: str,
    k: int = TOPK,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    key_alias: str | None = None,
) -> str:
    terms = []
    for j, (a, b) in enumerate(_CMS_PARAMS[:depth]):
        terms.append(
            f"SELECT key, {j} AS j, ({duck_minhash_term(a, b, 'h')}) % {width} AS bucket FROM h"
        )
    return f"""
WITH src AS (
  SELECT {key} AS key, {duck_hash64(f"CAST({key} AS VARCHAR)")} AS h FROM {table}
), h AS (SELECT key, h FROM src),
pairs AS ({' UNION ALL '.join(terms)}),
counters AS (SELECT j, bucket, count(*) AS c FROM pairs GROUP BY 1, 2),
kb AS (SELECT DISTINCT key, j, bucket FROM pairs),
est AS (
  SELECT kb.key, min(c.c) AS est_count
  FROM kb JOIN counters c ON c.j = kb.j AND c.bucket = kb.bucket
  GROUP BY kb.key
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY est_count DESC, key ASC) AS rn FROM est
)
SELECT key AS {key_alias or key}, est_count FROM ranked WHERE rn <= {k}
"""
