"""Scalar-function helpers shared by operators and their DuckDB oracle SQL.

Every helper here exists in TWO forms that must stay semantically
identical: a Spark expression builder (returns a SQL-expression string
usable with ``F.expr`` / ``selectExpr``) and a DuckDB SQL builder. One
source of truth for constants (hash prime, stopword lists, regexes)
guarantees the driver's oracle comparison can hash-match.
"""

from .hashing import HASH_PRIME, duck_hash64, minhash_params, spark_hash64
from .textnorm import (
    STOPWORDS,
    duck_norm,
    duck_tokens,
    spark_norm,
    spark_tokens,
)

__all__ = [
    "HASH_PRIME",
    "spark_hash64",
    "duck_hash64",
    "minhash_params",
    "STOPWORDS",
    "spark_norm",
    "duck_norm",
    "spark_tokens",
    "duck_tokens",
]
