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


def spark_shingles(tokens_col: str, w: int = 3) -> str:
    """Spark SQL expr: array of w-word shingles (space-joined).

    Empty array when the document has fewer than w tokens.
    """
    parts = ", ".join(f"{tokens_col}[i + {j}]" for j in range(w))
    return (
        f"CASE WHEN size({tokens_col}) >= {w} THEN "
        f"transform(sequence(0, size({tokens_col}) - {w}), i -> concat_ws(' ', {parts})) "
        f"ELSE array() END"
    )


def duck_shingles_select(doc_key: str, tokens_cte: str, tokens_col: str, w: int = 3) -> str:
    """DuckDB SELECT producing (doc_key, shingle) rows from a CTE that
    exposes a token-list column. 1-based list indexing."""
    parts = " || ' ' || ".join(f"{tokens_col}[i + {j}]" for j in range(w))
    return (
        f"SELECT {doc_key}, {parts} AS shingle "
        f"FROM {tokens_cte}, UNNEST(generate_series(1, len({tokens_col}) - {w - 1})) AS g(i) "
        f"WHERE len({tokens_col}) >= {w}"
    )


# Convenience mirror so callers can treat the Spark side uniformly.
def duck_shingles(tokens_col: str, w: int = 3) -> str:
    """DuckDB list-comprehension form of w-shingles (no unnest needed)."""
    parts = " || ' ' || ".join(f"{tokens_col}[i + {j}]" for j in range(w))
    return (
        f"CASE WHEN len({tokens_col}) >= {w} THEN "
        f"[{parts} FOR i IN generate_series(1, len({tokens_col}) - {w - 1})] "
        f"ELSE [] END"
    )
