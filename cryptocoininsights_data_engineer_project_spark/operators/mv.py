"""Aggregate navigation: answer coarser aggregates FROM a materialized
rollup instead of the fact table.

The other half of incremental view maintenance (operators/ivm.py keeps
the rollup fresh; this module makes queries USE it): a query grouping
on a SUBSET of a materialized view's keys, asking for algebraic
measures the MV carries, re-aggregates |MV| rows instead of scanning
the fact — at 100 TB the difference between touching a few thousand
counter rows and a full fact pass. The classic warehouse "aggregate
navigator" (Kimball) / materialized-view rewrite (Oracle, Calcite's
MaterializedViewRule), expressed here at the API level where it is
provable: re-aggregability of sum/count is exact algebra, and avg is
derived as sum/count AT READ TIME (never averaged averages).

Matching rule (`can_answer`): wanted keys ⊆ MV keys AND every wanted
measure derivable from the MV's counters (sum_x needs sum_x;
count(*) needs n_rows; count(x) and avg_x need count_x — the
per-measure NON-NULL counter, because SQL AVG and COUNT(col) ignore
NULLs while n_rows counts every row). No silent fallback —
`query_rollup` raises on a mismatch so a caller can route to the fact
explicitly; an engine wrapper would catch and fall back.

Equivalence (MV answer == direct fact aggregation) and the plan
property (the MV path scans ONLY the rollup parquet) are pinned in
tests/test_mv.py.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MVSpec:
    """A materialized rollup: group keys + the source measures whose
    per-group sums (and the row count) it carries."""

    keys: tuple[str, ...]
    measures: tuple[str, ...]  # fact columns summed into sum_<m>

    def counter_cols(self) -> list[str]:
        return (
            [f"sum_{m}" for m in self.measures]
            + [f"count_{m}" for m in self.measures]
            + ["n_rows"]
        )


def build_mv(fact: DataFrame, spec: MVSpec, path: str) -> None:
    """Materialize the rollup: one map-combinable aggregation of the
    fact, written as parquet. Refresh incrementally via operators/ivm
    (same counter layout by construction). Each measure carries BOTH
    sum_<m> and count_<m> (non-null rows) so avg and count(col) stay
    NULL-correct at read time."""
    aggs = [F.sum(m).alias(f"sum_{m}") for m in spec.measures]
    aggs += [F.count(m).alias(f"count_{m}") for m in spec.measures]
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    fact.groupBy(*spec.keys).agg(*aggs).write.mode("overwrite").parquet(path)


def can_answer(
    spec: MVSpec, want_keys: Sequence[str], want: dict[str, tuple[str, str]]
) -> bool:
    """Can the MV answer GROUP BY want_keys with the wanted measures?
    ``want``: out_col -> (kind, src) with kind in {sum, count, avg}.
    count with src "*" is COUNT(*); count with a column name is
    COUNT(col) and needs that column's non-null counter."""
    if not set(want_keys) <= set(spec.keys):
        return False
    for kind, src in want.values():
        if kind == "count" and src == "*":
            continue
        if kind in ("sum", "avg", "count") and src in spec.measures:
            continue
        return False
    return True


def query_rollup(
    spark,
    path: str,
    spec: MVSpec,
    want_keys: Sequence[str],
    want: dict[str, tuple[str, str]],
) -> DataFrame:
    """GROUP BY ``want_keys`` answered from the materialized rollup:
    counters re-aggregate by summation (exact algebra for sum/count),
    avg derives as total sum / total NON-NULL count of the SOURCE
    rows (count_<src>) — the correct weighted form matching SQL AVG's
    NULL semantics, never an average of per-group averages; count(col)
    likewise serves from count_<col>, count(*) from n_rows."""
    if not can_answer(spec, want_keys, want):
        raise ValueError(
            f"MV{spec.keys} cannot answer keys={tuple(want_keys)} want={want}"
        )
    mv = spark.read.parquet(path)
    rolled = mv.groupBy(*want_keys).agg(
        *[F.sum(c).alias(c) for c in spec.counter_cols()]
    )
    outs = []
    for out, (kind, src) in want.items():
        if kind == "sum":
            outs.append(F.col(f"sum_{src}").alias(out))
        elif kind == "count" and src == "*":
            outs.append(F.col("n_rows").alias(out))
        elif kind == "count":
            outs.append(F.col(f"count_{src}").alias(out))
        else:  # avg: NULL-aware denominator; all-NULL group -> NULL
            outs.append(
                (
                    F.col(f"sum_{src}")
                    / F.nullif(F.col(f"count_{src}"), F.lit(0))
                ).alias(out)
            )
    return rolled.select(*want_keys, *outs)
