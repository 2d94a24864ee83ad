"""Sessionization: split per-key event streams into activity sessions
separated by inactivity gaps — the canonical stateful streaming
operator, here in its batch/window form (the streaming twin keeps the
same per-key ordering contract via ``applyInPandasWithState`` or
``session_window``; see streaming/).

Batch algorithm (pure window functions, one shuffle on the key):
    gap  = ts - lag(ts)  per key, event-time order
    mark = 1 where gap > timeout (or first event)
    session_seq = running sum of mark   ← classic gaps-and-islands
    aggregate per (key, session_seq)

Timestamps are compared in integer epoch-microseconds so the DuckDB
oracle (epoch_us) agrees exactly; float seconds would drift.

At 100 TB: one hash shuffle on user_id + an in-partition sort — the
same cost as any per-key window; no state store needed in batch mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_us: int = DEFAULT_GAP_US,
) -> DataFrame:
    """(key, session_seq, n_events, session_start, session_end,
    duration_s) — one row per session."""
    us = F.expr(f"unix_micros(CAST({ts} AS TIMESTAMP))")
    w = Window.partitionBy(key).orderBy("__us")
    marked = (
        events.select(key, F.col(ts).alias("__ts"), us.alias("__us"))
        .withColumn("__prev", F.lag("__us").over(w))
        .withColumn(
            "__mark",
            F.when(
                F.col("__prev").isNull() | (F.col("__us") - F.col("__prev") > gap_us), 1
            ).otherwise(0),
        )
        .withColumn(
            "session_seq",
            F.sum("__mark").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        marked.groupBy(key, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("__ts").alias("session_start"),
            F.max("__ts").alias("session_end"),
            F.round((F.max("__us") - F.min("__us")) / 1_000_000.0, 3).alias(
                "duration_s"
            ),
        )
    )


def sessionize_oracle_sql(
    key: str = "user_id", gap_us: int = DEFAULT_GAP_US
) -> str:
    return f"""
WITH marked AS (
  SELECT {key}, ts, epoch_us(ts) AS us,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
         THEN 1 ELSE 0 END AS mark
  FROM events
  WINDOW w AS (PARTITION BY {key} ORDER BY epoch_us(ts))
), numbered AS (
  SELECT {key}, ts, us,
    CAST(sum(mark) OVER (PARTITION BY {key} ORDER BY us
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM marked
)
SELECT {key}, session_seq, count(*) AS n_events,
  min(ts) AS session_start, max(ts) AS session_end,
  round((max(us) - min(us)) / 1000000.0, 3) AS duration_s
FROM numbered GROUP BY {key}, session_seq
"""
