"""``mapInArrow`` surface: the zero-copy Arrow batch path.

Completes the Python-execution API matrix alongside the pandas paths
(``functions/udafs.py`` grouped-agg pandas UDAF, ``operators/
multimodal.py`` mapInPandas, ``streaming/stateful.py``
applyInPandasWithState) and the ``@udtf`` twin (``functions/
udtfs.py``). Same doctrine as all of those: built-in JVM expressions
own the hot path; the Arrow form exists because some workloads
genuinely need columnar Python (custom vectorized kernels, libraries
that speak Arrow natively), and when they do, RecordBatch in/out with
no pandas conversion is the cheapest possible bridge — one
serialization boundary, no per-row Python, no index bookkeeping.

``cents_arrow`` mirrors the registry's money-cents discipline
(queries.py::_CENTS) so the test can pin it bit-equal to the JVM
expression: round-half-away scale-0 via pyarrow.compute, cast to
int64 — the exact arithmetic the codegen path runs.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CENTS_EXPR = "CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)"


def cents_builtin(li: DataFrame) -> DataFrame:
    """JVM form: the hot path (whole-stage codegen, no Python)."""
    return li.select(
        "l_orderkey", "l_linenumber", F.expr(CENTS_EXPR).alias("cents")
    )


def cents_arrow(li: DataFrame) -> DataFrame:
    """Arrow form: same arithmetic through mapInArrow RecordBatches.

    pyarrow.compute.round(round_mode="half_towards_infinity") matches
    Spark/DuckDB scale-0 rounding (numpy's np.round would NOT — it
    rounds half-to-even; see ADVICE round-1 on similarity.py).
    """

    def _batches(it: Iterator) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in it:
            t = pa.Table.from_batches([batch])
            cents = pc.cast(
                pc.round(
                    pc.multiply(
                        pc.multiply(
                            t["l_extendedprice"],
                            pc.subtract(
                                pa.scalar(1.0, pa.float64()), t["l_discount"]
                            ),
                        ),
                        pa.scalar(100.0, pa.float64()),
                    ),
                    ndigits=0,
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
            out = pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "l_linenumber": t["l_linenumber"],
                    "cents": cents,
                }
            )
            yield from out.to_batches()

    return li.select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    ).mapInArrow(_batches, "l_orderkey bigint, l_linenumber int, cents bigint")
