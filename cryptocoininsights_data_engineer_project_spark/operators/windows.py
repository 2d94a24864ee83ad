"""Scale-safe global window primitives.

A window over a GLOBAL ordering (``Window.orderBy`` with no
``partitionBy``) plans as a single-partition sort in Spark — one
executor materializes the whole dataset, the canonical 100 TB
chokepoint. But the classic prefix-sum decomposition distributes it:

1. range-partition by the global order (Spark's scale-safe sort path —
   sampled boundaries, P-way parallel sort);
2. prefix-sum WITHIN each partition (window keyed on
   ``spark_partition_id()`` — no cross-partition traffic);
3. aggregate one total per partition (P rows), prefix-sum THOSE on a
   single partition (P values, trivially small), and broadcast the
   resulting offsets back.

Every row moves exactly once; the only single-partition work is over
P rows. The reference outsources this shape to Redshift's windowed SUM
(data-transformation.py aggregates feeding ranked dashboards); here it
is first-class and cluster-safe.

Determinism: callers must pass a TOTAL order (include a unique
tiebreaker) — ties split across range-partition boundaries would
otherwise make per-row prefixes depend on partition placement. With a
total order and exact-integer values the result is bit-stable and
matches a ROWS-framed running sum in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_gcs_pid"
_LOCAL = "_gcs_local"
_OFF = "_gcs_off"
_TOT = "_gcs_tot"


def global_cumsum(
    df: DataFrame,
    order_by: list[Column],
    value: Column,
    out: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Running sum of ``value`` over the TOTAL order ``order_by``,
    without a single-partition sort. ``order_by`` must be a total
    order (unique key somewhere in the list)."""
    parts = [num_partitions] if num_partitions else []
    d = (
        df.repartitionByRange(*parts, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn(_PID, F.spark_partition_id())
    )
    w_in = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = d.withColumn(_LOCAL, F.sum(value).over(w_in))
    # P rows; the global window below runs on ONE partition of P values
    totals = local.groupBy(_PID).agg(F.sum(value).alias(_TOT))
    w_off = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        _PID, F.coalesce(F.sum(_TOT).over(w_off), F.lit(0)).alias(_OFF)
    )
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out, F.col(_LOCAL) + F.col(_OFF))
        .drop(_PID, _LOCAL, _OFF)
    )


def global_cummax_exclusive(
    df: DataFrame,
    order_by: list[Column],
    value: Column,
    out: str = "cummax",
    num_partitions: int | None = None,
) -> DataFrame:
    """Running max of ``value`` over all STRICTLY-PRECEDING rows of the
    total order ``order_by`` (NULL for the first row) — same
    prefix-scan decomposition as :func:`global_cumsum` with the
    (max, greatest) monoid. The exclusive frame is what dominance
    tests (skyline/Pareto-frontier) need: "best value among everything
    ranked ahead of me"."""
    parts = [num_partitions] if num_partitions else []
    d = (
        df.repartitionByRange(*parts, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn(_PID, F.spark_partition_id())
    )
    w_in = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = d.withColumn(_LOCAL, F.max(value).over(w_in))
    totals = local.groupBy(_PID).agg(F.max(value).alias(_TOT))
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(_PID, F.max(_TOT).over(w_off).alias(_OFF))
    # greatest() skips NULLs (empty local frame / first partition), so
    # the first row of the whole order correctly yields NULL
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out, F.greatest(F.col(_LOCAL), F.col(_OFF)))
        .drop(_PID, _LOCAL, _OFF)
    )
