"""Incremental view maintenance for ADDITIVE aggregates.

A 100 TB warehouse cannot recompute its rollups from scratch per
batch: a daily-revenue table over 3 years of facts should cost one
delta-sized aggregation per refresh, not a full-table scan. For
additive aggregates (sum, count — and avg as sum/count at read time)
the refresh is exact algebra:

    rollup' = (rollup ∪ agg(delta)) GROUP BY keys SUM counters

i.e. aggregate ONLY the delta (map-side combine makes this one tiny
shuffle), then merge counter-wise into the existing rollup on the
group keys. Non-additive aggregates (distinct counts, percentiles)
need sketches (HLL, KLL) merged the same way — the CMS in
operators/sketch.py shows the shape.

Equivalence (refresh-per-batch == one full recompute) is asserted in
tests/test_layout_ivm.py over multi-batch runs, including re-delivery of the
same delta (idempotence requires an upstream dedupe, exactly like the
MERGE path — documented, not hidden).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_delta(
    delta: DataFrame, keys: Sequence[str], measures: Sequence[str]
) -> DataFrame:
    """Delta → counter rows: sum + non-null count per measure + row
    count per key. count_<m> keeps avg and count(col) NULL-correct in
    the rollup (mv.query_rollup divides sum_<m> by count_<m>, never by
    n_rows) — same additive-merge algebra either way."""
    aggs = [F.sum(m).alias(f"sum_{m}") for m in measures]
    aggs += [F.count(m).alias(f"count_{m}") for m in measures]
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    return delta.groupBy(*keys).agg(*aggs)


def merge_rollup(
    existing: DataFrame | None,
    delta_agg: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Counter-wise additive merge; None existing = first refresh."""
    if existing is None:
        return delta_agg
    counters = [c for c in delta_agg.columns if c not in keys]
    unioned = existing.select(delta_agg.columns).unionByName(delta_agg)
    return unioned.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in counters]
    )
