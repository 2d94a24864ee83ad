"""Python UDTF surface (Spark 4 `@udtf`).

The reference defines no UDFs/UDTFs (SURVEY.md §2.11) — every
transform there is built-in pandas/SQL, and our engine keeps the hot
path JVM-side for the same reason. This module exists to cover the
table-function API surface with a real, tested example and to
document the engine's position on it:

- ``ChunkDoc`` splits a document into fixed-size token windows with a
  stride (the standard LLM training-data chunking op).
- The PRODUCTION path for the same semantics is
  ``queries.doc_chunks`` — pure built-ins (split + posexplode over a
  sequence of starts + slice), which runs inside whole-stage codegen
  with zero Python round-trips. A row-at-a-time UDTF pays one Python
  call per input row and serializes every emitted row; at 100 TB that
  is the difference between scan-speed and a 10-100x slowdown.
- ``tests/test_udtf.py`` pins UDTF output == built-in output, so the
  API demo can never drift from the operator it mirrors.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


@udtf(returnType="chunk_id bigint, n_tokens int, chunk_text string")
class ChunkDoc:
    """Lateral table function: one row per token window of the input.

    Tokenization is a plain single-space split (matching the built-in
    twin and the DuckDB oracle); windows start every CHUNK_STRIDE
    tokens and carry up to CHUNK_TOKENS tokens.
    """

    def eval(self, text: str):  # noqa: D102 — contract in class docstring
        if text is None:
            return
        ws = text.split(" ")
        chunk_id = 0
        for start in range(0, len(ws), CHUNK_STRIDE):
            toks = ws[start : start + CHUNK_TOKENS]
            yield chunk_id, len(toks), " ".join(toks)
            chunk_id += 1


def register(spark) -> None:
    """Register the UDTFs for SQL use (LATERAL chunk_doc(text))."""
    spark.udtf.register("chunk_doc", ChunkDoc)
