"""MERGE / upsert — the heart of the reference pipeline.

The reference ships two Redshift ``MERGE`` statements:
- dim upsert  (coininsights.py:110-131): ``MERGE INTO dim_coin_info
  USING coin_info_stage ON id WHEN MATCHED THEN UPDATE … WHEN NOT
  MATCHED THEN INSERT …``
- fact upsert (coininsights.py:134-165): same pattern, 13 measure
  columns.

Semantics preserved exactly:
- matched rows take the stage values for every update column, even
  when the stage value is NULL (Redshift UPDATE overwrites
  unconditionally, coininsights.py:145-157);
- unmatched target rows pass through untouched;
- unmatched stage rows are inserted whole;
- when the stage carries duplicate keys, a deterministic keep-latest
  rule picks the winner first (Redshift MERGE would error; the
  pipeline's timestamped batches imply last-write-wins).

Spark has no MERGE on plain parquet tables, so this is a library-level
operator with two physical strategies that must agree:

- ``full_outer``: target FULL OUTER JOIN stage on the keys, matched
  rows resolved column-wise. One shuffle on the key; with both sides
  bucketed by key on disk, shuffle-free. Small stage → Catalyst/AQE
  picks broadcast automatically.
- ``union_latest``: target ∪ stage with a batch-priority column, then
  one row_number window per key (W3 keep-latest). Same single shuffle;
  simpler plan when stage and target share a schema.

At 100 TB the winning layout is: target partitioned by a stable bucket
of the key (or Delta/Iceberg-style file groups); only partitions with
matching stage keys are rewritten. Here we rewrite the whole table —
correct, and the partition-pruned rewrite is a straightforward
extension of the same plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedupe_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """Keep exactly one row per key: the first under ``order_by``
    (descending). This is W3 (SURVEY.md §2.5) and the stage-side
    duplicate-key resolution for merge.

    ``order_by`` columns are sorted descending; append a unique
    tiebreaker column to make the result deterministic.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge(
    target: DataFrame,
    stage: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str] | None = None,
    dedupe_order: Sequence[str] | None = None,
    strategy: str = "full_outer",
) -> DataFrame:
    """Upsert ``stage`` into ``target`` on ``keys``.

    update_cols: columns overwritten from stage on match (default: all
    non-key target columns present in stage). Columns in target but not
    in stage pass through (NULL for inserted rows); columns only in
    stage are dropped (mirrors the explicit column lists of the
    reference's MERGE, coininsights.py:119-126, 144-157).
    dedupe_order: if given, stage duplicates per key are resolved
    keep-latest by these columns (descending) first.
    """
    keys = list(keys)
    if dedupe_order:
        stage = dedupe_latest(stage, keys, dedupe_order)
    target_cols = [c for c in target.columns]
    if update_cols is None:
        update_cols = [c for c in target_cols if c not in keys and c in stage.columns]
    missing = [c for c in list(update_cols) + keys if c not in stage.columns]
    if missing:
        raise ValueError(f"stage is missing merge columns: {missing}")

    if strategy == "full_outer":
        return _merge_full_outer(target, stage, keys, update_cols, target_cols)
    if strategy == "union_latest":
        return _merge_union_latest(target, stage, keys, update_cols, target_cols)
    raise ValueError(f"unknown merge strategy {strategy!r}")


def _merge_full_outer(target, stage, keys, update_cols, target_cols):
    t = target.alias("t")
    # Plain equality, matching merge_oracle_sql and the union_latest
    # strategy: NULL-key stage rows never match and insert as new rows
    # (Redshift MERGE ON t.id = s.id behaves identically). Matched is
    # detected via a dedicated sentinel, not key-null testing, so it
    # stays correct even for joins where a key column could be NULL.
    s = stage.select(
        *keys, *update_cols, F.lit(True).alias("__matched")
    ).alias("s")
    cond = [F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys]
    joined = t.join(s, cond, "full_outer")
    matched = F.col("s.__matched").isNotNull()
    out = []
    for c in target_cols:
        if c in keys:
            out.append(F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}")).alias(c))
        elif c in update_cols:
            # stage wins on match even when the stage value is NULL
            out.append(F.when(matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c))
        else:
            out.append(F.col(f"t.{c}").alias(c))
    return joined.select(*out)


def _merge_union_latest(target, stage, keys, update_cols, target_cols):
    # Stage rows outrank target rows; within stage, caller already
    # resolved duplicates. Non-updated target columns must survive a
    # match, so matched rows re-acquire them via a left join back to
    # the target (cheap: same key partitioning reused).
    passthrough = [c for c in target_cols if c not in keys and c not in update_cols]
    s = stage.select(*keys, *update_cols)
    if passthrough:
        t_extra = target.select(*keys, *passthrough)
        s = s.join(t_extra, list(keys), "left")
    s = s.select(*target_cols).withColumn("__pri", F.lit(1))
    t = target.select(*target_cols).withColumn("__pri", F.lit(0))
    unioned = t.unionByName(s)
    w = Window.partitionBy(*keys).orderBy(F.col("__pri").desc())
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__pri")
    )


def merge_oracle_sql(
    target_sql: str,
    stage_sql: str,
    keys: Sequence[str],
    update_cols: Sequence[str],
    passthrough_cols: Sequence[str],
) -> str:
    """ANSI-SQL twin of ``merge`` (full-outer form) for the DuckDB
    oracle: CTEs for target/stage, FULL OUTER JOIN, stage-wins CASE per
    update column."""
    keys = list(keys)
    k0 = keys[0]
    sel = []
    for k in keys:
        sel.append(f"coalesce(t.{k}, s.{k}) AS {k}")
    for c in update_cols:
        sel.append(f"CASE WHEN s.{k0} IS NOT NULL THEN s.{c} ELSE t.{c} END AS {c}")
    for c in passthrough_cols:
        sel.append(f"t.{c} AS {c}")
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    return (
        f"WITH target AS ({target_sql}), stage AS ({stage_sql}) "
        f"SELECT {', '.join(sel)} FROM target t FULL OUTER JOIN stage s ON {on}"
    )
