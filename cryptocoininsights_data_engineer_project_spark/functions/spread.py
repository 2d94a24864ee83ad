"""Scale-adaptive scan spreading, shared by every operator whose heavy
per-row work (Python decode stages, packed-argmin scoring) runs in the
scan's own partitions.

Why it exists: the shuffle-free pipelines in this engine (ANN scoring
after the r16 packed-argmin rewrite, the mapInPandas codec decoders,
the JVM-side fixture synthesis) do their expensive per-row work IN THE
SCAN'S OWN partitions. A single-file parquet scan at bench scale
yields 1-2 partitions, serializing that work on 2 of 32 cores. At
production scale the same scan yields thousands of partitions and any
unconditional ``repartition(n_cores)`` would do the OPPOSITE of what
it does locally: coalesce a wide scan down to core count and add a
full shuffle of the frame (VERDICT r16 item 1).

``spread`` therefore repartitions ONLY when the scan under-splits
(fewer partitions than ``defaultParallelism``); when the scan already
has at least core-count partitions it returns the frame untouched — a
provable no-op at scale, no Exchange added. Callers should project to
the columns the downstream work needs BEFORE spreading so the
round-robin exchange, when it does fire, moves the narrowest possible
rows.

The partition-count probe (``df.rdd.getNumPartitions()``) forces
physical planning of the subtree once per call — cheap for the bare
table scans this guards, and the decision is correct per-plan rather
than cached across frames with different splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` round-robin, but
    only when its current plan yields fewer partitions than that —
    scale-adaptive: a many-partition production scan passes through
    with no Exchange added."""
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    return df.repartition(n) if df.rdd.getNumPartitions() < n else df
