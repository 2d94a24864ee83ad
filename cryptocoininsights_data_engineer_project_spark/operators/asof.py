"""As-of (point-in-time) join — the canonical tick-data operator Spark
has no native physical plan for.

``asof_join(left, right, keys, ts)`` attaches to every left row the
most recent right row with the same key and an earlier timestamp
(backward as-of, strict ``<``).

Physical strategy — union + ignore-nulls window, the shuffle-minimal
form:

    tag left rows 1, right rows 0 → unionByName →
    last(right_payload, ignorenulls=True) OVER
        (PARTITION BY keys ORDER BY ts, tag
         ROWS UNBOUNDED PRECEDING .. CURRENT ROW) →
    keep tagged-left rows

One shuffle on the key (both sides together), one sort — exactly the
cost of a sort-merge join, with no range-explosion. The naive
alternative (inequality join + keep-latest) is O(n·m) per key and
dies at scale; this stays O((n+m) log(n+m)) per key. Right rows sort
BEFORE left rows at equal timestamps via the tag, so a left row never
sees a same-timestamp right row: strict `<` semantics, matching the
DuckDB ``ASOF JOIN ... ON l.ts > r.ts`` oracle.

At 100 TB: partition-by-key parallelism is total (each key group
independent); skewed keys split under AQE; if the right side is tiny
(e.g. a slowly-changing dimension), broadcast + a range lookup UDF
would win, but the union form needs no such special case.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts: str,
    payload_cols: Sequence[str] | None = None,
    right_order: Sequence[str] = (),
    prefix: str = "asof_",
) -> DataFrame:
    """Backward strict as-of join.

    Returns every left row plus ``{prefix}{c}`` for each right payload
    column: the value from the latest right row with the same key and
    ``right.ts < left.ts`` (NULL when no such row exists).

    The payload travels as ONE struct so every emitted ``{prefix}{c}``
    comes from the SAME right row (`arg_max` semantics) — filling each
    column with an independent ignore-nulls window would let a NULL in
    one payload column back-fill from an older right row, mixing fields
    across rows. ``right_order`` breaks ties among right rows sharing
    (keys, ts): ascending order, last one wins; without it equal-ts
    right rows resolve in partition-arrival order (nondeterministic).
    """
    keys = list(keys)
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in keys and c != ts]
    payload_cols = list(payload_cols)
    order_cols = [c for c in right_order if c not in (*keys, ts)]

    l_tag = left.select(
        *keys,
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__o_{c}") for c in order_cols],
        F.lit(None)
        .cast(right.select(F.struct(*payload_cols).alias("s")).schema["s"].dataType)
        .alias("__rpay"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    r_tag = right.select(
        *keys,
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__o_{c}") for c in order_cols],
        F.struct(*[F.col(c) for c in payload_cols]).alias("__rpay"),
        F.lit(None)
        .cast(l_tag.schema["__lrow"].dataType)
        .alias("__lrow"),
    )
    unioned = l_tag.unionByName(r_tag)
    # For strict '<', a left row must not see same-timestamp right
    # rows: order ts asc, tag desc puts the left copy (tag 1) BEFORE
    # equal-ts right copies (tag 0), leaving them outside its running
    # frame. Among equal-(keys, ts) right rows, right_order ascending
    # puts the winner last, where last(ignorenulls) picks it up.
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("__ts").asc(),
            F.col("__is_left").desc(),
            *[F.col(f"__o_{c}").asc() for c in order_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "__is_left",
        "__lrow",
        F.last("__rpay", ignorenulls=True).over(w).alias("__f"),
    ).filter(F.col("__is_left") == 1)
    return filled.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__f.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )


def asof_join_within(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    right_pred,
    payload_cols: Sequence[str],
    right_order: Sequence[str] = (),
    left_cols: Sequence[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward strict as-of join where the right side is a filtered
    subset of the SAME DataFrame — single scan, single shuffle.

    Every row is a left row; rows matching ``right_pred`` additionally
    act as right rows. Instead of scanning the source twice and
    shuffling twice (once to dedupe the right side, once for the as-of
    window), each matching row is exploded into a (left-copy,
    right-copy) pair from one scan, and ONE window does both jobs:

    - strict ``<``: at equal ts the left copy sorts before right
      copies (tag desc), so same-timestamp right rows are outside the
      running frame;
    - dedupe-to-latest: among right copies with equal (keys, ts),
      ``right_order`` ascending puts the winner last, and the payload
      travels as ONE struct so all its fields come from that same
      winning row (`arg_max` semantics — no per-column divergence).

    At 100 TB this halves the source scan and drops an exchange+sort
    of the full right side; the explode only doubles the (typically
    sparse) right-matching rows, not the whole table.
    """
    keys = list(keys)
    payload_cols = list(payload_cols)
    left_cols = list(left_cols) if left_cols is not None else list(df.columns)
    order_cols = [c for c in right_order if c not in (*keys, ts)]

    tagged = (
        df.select(
            *keys,
            F.col(ts).alias("__ts"),
            *[F.col(c).alias(f"__o_{c}") for c in order_cols],
            F.struct(*[F.col(c) for c in left_cols]).alias("__lrow"),
            F.when(right_pred, F.struct(*[F.col(c) for c in payload_cols])).alias("__rpay"),
        )
        .withColumn(
            "__tag",
            F.explode(
                F.when(F.col("__rpay").isNotNull(), F.array(F.lit(1), F.lit(0))).otherwise(
                    F.array(F.lit(1))
                )
            ),
        )
        # the left copy of a right-matching row must not see its own
        # payload (it would match at ts == ts, breaking strict '<')
        .withColumn("__rpay", F.when(F.col("__tag") == 0, F.col("__rpay")))
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("__ts").asc(),
            F.col("__tag").desc(),
            *[F.col(f"__o_{c}").asc() for c in order_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        tagged.select(
            "__tag",
            "__lrow",
            F.last("__rpay", ignorenulls=True).over(w).alias("__f"),
        )
        .filter(F.col("__tag") == 1)
    )
    return filled.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left_cols],
        *[F.col(f"__f.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )
