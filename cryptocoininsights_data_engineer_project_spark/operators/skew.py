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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


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
