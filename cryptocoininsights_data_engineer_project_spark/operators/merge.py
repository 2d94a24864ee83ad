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


# ------------------------------------------------------------------ SCD2
def scd2_init(stage: DataFrame, keys: Sequence[str], ts: str) -> DataFrame:
    """Open a type-2 dimension from its first snapshot: every row
    becomes current (valid_from=ts, valid_to=NULL)."""
    return stage.select(
        *stage.columns,
        F.lit(ts).cast("timestamp_ntz").alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
    )


def scd2_apply(
    dim: DataFrame,
    stage: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    ts: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension merge: apply a new attribute
    snapshot to a versioned dimension, preserving history.

    - changed keys: the current row closes (valid_to=ts) and a new
      current row opens (valid_from=ts);
    - new keys: inserted open;
    - unchanged keys: untouched;
    - closed history rows: pass through untouched.

    This is the dimension-history discipline the reference's
    stage-wins MERGE (coininsights.py:110-131) cannot express — its
    UPDATE destroys the prior attribute value. Attribute comparison is
    null-safe (NULL -> value and value -> NULL both count as changes).

    Plan shape: ONE full-outer join of the current slice against the
    stage on the keys (same single-shuffle footprint as ``merge``; the
    closed-history slice is a filter union, no join), then three
    row-arms unioned. At 100 TB: same bucketed-layout story as merge —
    co-located on the key, the join is shuffle-free."""
    keys, attrs = list(keys), list(attrs)
    cur = dim.filter(F.col("valid_to").isNull())
    hist = dim.filter(F.col("valid_to").isNotNull())
    s = stage.select(
        *[F.col(k).alias(f"__s_{k}") for k in keys],
        *[F.col(a).alias(f"__s_{a}") for a in attrs],
    )
    cond = [cur[k] == s[f"__s_{k}"] for k in keys]
    j = cur.join(s, cond, "full_outer")
    in_stage = F.col(f"__s_{keys[0]}").isNotNull()
    in_dim = F.col(keys[0]).isNotNull()
    changed = in_stage & in_dim & ~F.expr(
        " AND ".join(f"({a} <=> __s_{a})" for a in attrs)
    )
    ts_lit = F.lit(ts).cast("timestamp_ntz")
    dim_cols = dim.columns
    # arm 1: dim rows survive — closed if changed, untouched otherwise
    kept = j.filter(in_dim).select(
        *[F.col(c) for c in dim_cols if c != "valid_to"],
        F.when(changed, ts_lit).otherwise(F.col("valid_to")).alias("valid_to"),
    )
    # arm 2: new current rows for changed + brand-new keys
    opened = (
        j.filter(in_stage & (changed | ~in_dim))
        .select(
            *[F.col(f"__s_{k}").alias(k) for k in keys],
            *[F.col(f"__s_{a}").alias(a) for a in attrs],
            ts_lit.alias("valid_from"),
            F.lit(None).cast("timestamp_ntz").alias("valid_to"),
        )
    )
    ordered = keys + attrs + ["valid_from", "valid_to"]
    return hist.select(ordered).unionByName(kept.select(ordered)).unionByName(
        opened
    )


def scd2_oracle_sql(
    snapshot_sqls: Sequence[tuple[str, str]],
    keys: Sequence[str],
    attrs: Sequence[str],
) -> str:
    """DuckDB twin of ``scd2_init`` + a chain of ``scd2_apply`` calls.
    ``snapshot_sqls`` is [(sql, ts), ...] in application order. The
    oracle favors clarity over plan quality (kept/opened arms as two
    plain joins); the Spark operator does it in one full-outer."""
    keys, attrs = list(keys), list(attrs)
    k0 = keys[0]
    on = " AND ".join(f"d.{k} = s.{k}" for k in keys)
    eq = " AND ".join(f"(d.{a} IS NOT DISTINCT FROM s.{a})" for a in attrs)
    d_cols = ", ".join(f"d.{c}" for c in keys + attrs)
    s_cols = ", ".join(f"s.{c}" for c in keys + attrs)
    cols = ", ".join(keys + attrs)
    (sql0, ts0) = snapshot_sqls[0]
    ctes = [
        f"s0 AS ({sql0})",
        f"d0 AS (SELECT {cols}, TIMESTAMP '{ts0}' AS valid_from, "
        f"CAST(NULL AS TIMESTAMP) AS valid_to FROM s0)",
    ]
    prev = "d0"
    for i, (sql_i, ts_i) in enumerate(snapshot_sqls[1:], start=1):
        ctes.append(f"s{i} AS ({sql_i})")
        ctes.append(f"cur{i} AS (SELECT * FROM {prev} WHERE valid_to IS NULL)")
        ctes.append(
            f"d{i} AS ("
            f"SELECT {cols}, valid_from, valid_to FROM {prev} "
            f"WHERE valid_to IS NOT NULL "
            f"UNION ALL "
            f"SELECT {d_cols}, d.valid_from, "
            f"CASE WHEN s.{k0} IS NOT NULL AND NOT ({eq}) "
            f"THEN TIMESTAMP '{ts_i}' ELSE d.valid_to END AS valid_to "
            f"FROM cur{i} d LEFT JOIN s{i} s ON {on} "
            f"UNION ALL "
            f"SELECT {s_cols}, TIMESTAMP '{ts_i}' AS valid_from, "
            f"CAST(NULL AS TIMESTAMP) AS valid_to "
            f"FROM s{i} s LEFT JOIN cur{i} d ON {on} "
            f"WHERE d.{k0} IS NULL OR NOT ({eq}))"
        )
        prev = f"d{i}"
    return (
        "WITH " + ", ".join(ctes) +
        f" SELECT {cols}, valid_from, valid_to FROM {prev}"
    )
