"""Pandas UDAF surface (Arrow-batched grouped aggregation).

Position (same as the UDTF surface, functions/udtfs.py): the engine
keeps aggregation JVM-side — a grouped-agg ``pandas_udf`` ships every
group's column through Arrow to Python, which at 100 TB is a
bandwidth tax the built-ins never pay. The surface still matters for
semantics Spark lacks natively; the worked example is the GEOMETRIC
mean (no built-in aggregate), and even that has a composition twin
``exp(avg(ln(x)))`` that stays in codegen — the registry query
(`geomean_price`) uses the composition, and tests pin the UDAF equal,
so the API demo can never drift from the production form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geomean_udaf(v: pd.Series) -> float:
    """Geometric mean of a positive column: exp(mean(log x))."""
    return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))


def geomean_builtin(col: str):
    """The codegen-resident composition twin of ``geomean_udaf``."""
    return F.exp(F.avg(F.log(col)))
