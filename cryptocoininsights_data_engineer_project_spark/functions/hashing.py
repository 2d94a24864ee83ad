"""Portable 60-bit hashing: identical values from Spark and DuckDB.

Spark's ``hash``/``xxhash64`` and DuckDB's ``hash`` are different
algorithms, so any operator whose *output* depends on hash values
(MinHash, SimHash, LSH buckets, fingerprints) derives its integers
from ``md5`` — available and bit-identical in both engines. We take
the first 15 hex chars (60 bits, always non-negative in int64) and
parse them as an integer:

- Spark:  ``CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)``
- DuckDB: ``CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)``

MinHash uses the classic universal family h_i(x) = (a_i*x + b_i) mod P
with P = 2^31 - 1 (Mersenne prime). The base hash is reduced mod P
*first* so a_i * x never overflows int64 (a_i < 2^31, x < 2^31).
"""

from __future__ import annotations

import random

# Mersenne prime 2^31 - 1: big enough for dedup resolution, small enough
# that (a * (x % P) + b) stays within int64 in both engines.
HASH_PRIME = 2_147_483_647


def spark_hash64(expr: str) -> str:
    """Spark SQL expression: 60-bit non-negative int from md5(expr)."""
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def duck_hash64(expr: str) -> str:
    """DuckDB SQL expression computing the identical integer."""
    return f"CAST('0x' || substring(md5({expr}), 1, 15) AS BIGINT)"


def minhash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for k universal hash functions.

    a_i in [1, P-1], b_i in [0, P-1]. Same constants feed the Spark plan
    and the generated oracle SQL, so signatures match bit-for-bit.
    """
    rng = random.Random(seed)
    return [(rng.randrange(1, HASH_PRIME), rng.randrange(0, HASH_PRIME)) for _ in range(k)]


def spark_minhash_term(a: int, b: int, hash_col: str) -> str:
    """One MinHash slot: (a * (h % P) + b) % P, as a Spark SQL expression
    over an already-computed 60-bit hash column."""
    return f"(({a}L * ({hash_col} % {HASH_PRIME}L) + {b}L) % {HASH_PRIME}L)"


def duck_minhash_term(a: int, b: int, hash_col: str) -> str:
    """Identical arithmetic in DuckDB SQL (int64 everywhere)."""
    return (
        f"(({a}::BIGINT * ({hash_col} % {HASH_PRIME}::BIGINT) + {b}::BIGINT)"
        f" % {HASH_PRIME}::BIGINT)"
    )
