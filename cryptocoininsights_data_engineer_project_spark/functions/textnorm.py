"""Text normalization / tokenization, in lockstep Spark + DuckDB forms.

Pipeline: lowercase → collapse every non-alphanumeric run to a single
space (Spark ``regexp_replace`` is global by default; DuckDB needs the
``'g'`` flag) → trim → split on single spaces. Both engines therefore
produce the exact same token arrays; word w-shingles are built by index
(Spark arrays are 0-based via ``getItem``; DuckDB lists are 1-based —
the builders account for that).
"""

from __future__ import annotations

# Tiny per-language stopword lexicons for the language-ID heuristic.
# Ordered dict: CASE-chain precedence is part of the operator contract.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los", "una"),
    "fr": ("le", "les", "des", "et", "une", "est"),
    "de": ("der", "die", "und", "das", "ein", "ist"),
}

QUALITY_STOPWORDS = STOPWORDS["en"]


def spark_norm(col: str = "text") -> str:
    return f"trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' '))"


def duck_norm(col: str = "text") -> str:
    return f"trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g'))"


def spark_tokens(col: str = "text") -> str:
    return f"split({spark_norm(col)}, ' ')"


def duck_tokens(col: str = "text") -> str:
    return f"string_split({duck_norm(col)}, ' ')"


# Shingle construction lives in operators/dedup.py (generator form on
# the Spark side, UNNEST(generate_series) CTE on the DuckDB side) —
# higher-order-function shingle builders were removed after profiling:
# nested transform() lambdas cost seconds of codegen compilation.
