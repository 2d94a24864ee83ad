"""Skew mitigation: salted two-phase aggregation.

When one grouping key dominates (the classic hot-key problem), a
plain groupBy sends every hot-key row to one reducer. Salting splits
each key into ``n_salts`` sub-keys for a first partial aggregation,
then re-aggregates the (tiny) salted partials — the hot key's load
spreads across ``n_salts`` tasks.

AQE's skew-join handling covers *joins*; aggregation skew is already
mostly absorbed by Spark's map-side partial aggregation, so explicit
salting matters when partial aggregation is defeated — e.g.
``collect_list``/``collect_set`` or high-cardinality distinct
accumulation under a hot group. The operator exists for those shapes
and as the documented pattern; results are provably identical to the
unsalted plan (sum/count/min/max are associative), which the DuckDB
oracle checks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def skewed_join_fixture(
    spark: SparkSession,
    n_fact: int,
    n_keys: int,
    hot_frac: float = 0.4,
    hot_key: int = 7,
    pad: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic (fact, dim) pair with one hot join key owning
    ``hot_frac`` of the fact — the fixture behind the skewed-join A/B
    (tests/test_skew_join.py, scripts/skew_ab.py). ``pad`` widens fact
    rows with an opaque string so the hot shuffle partition crosses
    byte thresholds at a chosen row count. The pad is INCOMPRESSIBLE
    (per-row sha2 hex): shuffle blocks are lz4-compressed, so a
    constant pad would vanish before AQE ever measured it — a real
    wide fact row (urls, payloads) does not."""
    fact = spark.range(n_fact).select(
        F.when(F.col("id") < int(n_fact * hot_frac), F.lit(hot_key))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
        .alias("key"),
        (F.col("id") % 1000).alias("v"),
        *(
            [
                F.expr(
                    "substring(repeat(sha2(cast(id AS string), 512), "
                    f"{pad // 128 + 1}), 1, {pad})"
                ).alias("pad")
            ]
            if pad
            else []
        ),
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("key"), (F.col("id") * 2).alias("w")
    )
    return fact, dim


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Hot-key-safe equi-join: fact rows get a deterministic salt (hash
    of all columns mod ``n_salts``), the dim side is replicated once
    per salt value, and the join runs on (key, salt) — the hot key's
    rows spread over ``n_salts`` shuffle partitions instead of one.

    Output is row-for-row identical to ``fact.join(dim, key)``: every
    fact row carries exactly ONE salt, so it meets each matching dim
    row exactly once (the replication multiplies dim ×n_salts but each
    copy matches a disjoint salt slice of the fact). Cost: the dim
    side's shuffle volume ×n_salts — which is why AQE's skew split
    (same splitting, no dim inflation, runtime-triggered) is preferred
    whenever it can fire; see the decision rule in SCALE.md."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    f = fact.withColumn("__salt", salt)
    # replicate dim via a narrow generator (no join, no BNLJ)
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    return f.join(d, [key, "__salt"]).drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase salted aggregation.

    aggs: output_name -> (input_col, fn) with fn in {sum, count, min,
    max}. Phase 1 groups by (keys + random-ish salt derived from a
    stable row attribute — here a hash of all columns — so the plan
    stays deterministic); phase 2 merges partials: sum+sum, count+sum,
    min+min, max+max.
    """
    keys = list(keys)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    phase1_aggs: list[Column] = []
    phase2_aggs: list[Column] = []
    for out, (col, fn) in aggs.items():
        if fn == "sum":
            phase1_aggs.append(F.sum(col).alias(f"__p_{out}"))
            phase2_aggs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "count":
            phase1_aggs.append(F.count(F.lit(1)).alias(f"__p_{out}"))
            phase2_aggs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "min":
            phase1_aggs.append(F.min(col).alias(f"__p_{out}"))
            phase2_aggs.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            phase1_aggs.append(F.max(col).alias(f"__p_{out}"))
            phase2_aggs.append(F.max(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"unsupported salted aggregate {fn!r}")
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*phase1_aggs)
    return partial.groupBy(*keys).agg(*phase2_aggs)
