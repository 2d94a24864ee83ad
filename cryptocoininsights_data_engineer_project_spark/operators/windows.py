"""Scale-safe global window primitives.

A window over a GLOBAL ordering (``Window.orderBy`` with no
``partitionBy``) plans as a single-partition sort in Spark — one
executor materializes the whole dataset, the canonical 100 TB
chokepoint. But the classic prefix-sum decomposition distributes it:

1. range-partition by the global order (Spark's scale-safe sort path —
   sampled boundaries, P-way parallel sort), stamp each row with its
   partition id, and ``localCheckpoint`` the result;
2. prefix-sum WITHIN each partition-id group (a window keyed on the
   stamped pid);
3. aggregate one total per pid (P rows after map-side combine),
   prefix-sum THOSE on a single partition (P values, trivially small),
   and broadcast the resulting offsets back.

Cost model (honest): rows move TWICE — once in the range exchange that
assigns pids, once in the hash exchange the pid-keyed window requires
(``Window.partitionBy(_PID)`` needs ClusteredDistribution on the pid,
which RangePartitioning on ``order_by`` does not satisfy, so
EnsureRequirements inserts a hash exchange + sort). The only
single-partition work is over P rows. That is still the scale win:
both exchanges are P-way parallel and no single task ever holds more
than one partition's rows, versus the whole dataset for a naive
``Window.orderBy``.

Why the ``localCheckpoint``: pid assignment is NONDETERMINISTIC —
range-partition boundaries come from sampling seeded by RDD id, so two
independent recomputations of the stamped frame (the window branch and
the totals branch, or an AQE replan / task retry) could sample
different boundaries and assign inconsistent pids, silently corrupting
the prefixes. Checkpointing materializes ONE pid assignment that every
consumer reads (the repo's "q11 discipline" for nondeterministic
mid-plan frames). The checkpoint also replaces lineage recomputation
on the second branch with a block read.

Determinism: callers must pass a TOTAL order (include a unique
tiebreaker) — ties split across range-partition boundaries would
otherwise make per-row prefixes depend on partition placement. With a
total order and exact-integer values the result is bit-stable and
matches a ROWS-framed running sum in any engine.

The reference outsources this shape to Redshift's windowed SUM
(data-transformation.py aggregates feeding ranked dashboards); here it
is first-class and cluster-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_gcs_pid"
_LOCAL = "_gcs_local"
_OFF = "_gcs_off"
_TOT = "_gcs_tot"


def _pid_stamped(
    df: DataFrame, order_by: list[Column], num_partitions: int | None
) -> DataFrame:
    """Range-partition by the order, stamp partition ids, and
    materialize via localCheckpoint so every downstream branch sees the
    SAME (sampled, nondeterministic) boundary assignment.

    No ``sortWithinPartitions`` here: the pid-keyed window downstream
    re-sorts after its own hash exchange anyway, so a pre-sort would be
    pure wasted work — pid assignment only needs the range exchange.
    """
    parts = [num_partitions] if num_partitions else []
    d = df.repartitionByRange(*parts, *order_by).withColumn(
        _PID, F.spark_partition_id()
    )
    return d.localCheckpoint()


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
    d = _pid_stamped(df, order_by, num_partitions)
    w_in = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = d.withColumn(_LOCAL, F.sum(value).over(w_in))
    # P rows; the global window below runs on ONE partition of P values
    totals = d.groupBy(_PID).agg(F.sum(value).alias(_TOT))
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
    d = _pid_stamped(df, order_by, num_partitions)
    w_in = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = d.withColumn(_LOCAL, F.max(value).over(w_in))
    totals = d.groupBy(_PID).agg(F.max(value).alias(_TOT))
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(_PID, F.max(_TOT).over(w_off).alias(_OFF))
    # greatest() skips NULLs (empty local frame / first partition), so
    # the first row of the whole order correctly yields NULL
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out, F.greatest(F.col(_LOCAL), F.col(_OFF)))
        .drop(_PID, _LOCAL, _OFF)
    )
