"""Text-analysis operators over a ``documents``-shaped table.

All four are single-pass, shuffle-free projections (narrow
transformations): at 100 TB they run at scan speed, fully inside
whole-stage codegen — no UDFs, no Python. Each returns deterministic
values reproducible by the generated DuckDB oracle.

- language ID:   tiny per-language stopword lexicons, argmax with a
                 fixed precedence order (a real system would use
                 character n-gram profiles; the operator shape — score
                 columns + CASE argmax — is identical).
- quality score: length / punctuation / stopword ratios combined into
                 one bounded score, the usual cheap pre-filter before
                 expensive model-based scoring.
- token count:   whitespace tokens and a BPE-ish regex segmentation
                 (letter runs / digit runs / single symbols).
- fingerprint:   min w-shingle hash (MinHash with k=1) — a compact
                 content fingerprint for cheap near-dup pre-grouping.

Regex note: Spark SQL string literals process backslash escapes,
DuckDB's do not — canonical patterns live here once and are escaped
per engine by ``_spark_re`` / ``_duck_re``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import duck_hash64, spark_hash64
from ..functions.spread import spread
from ..functions.textnorm import (
    QUALITY_STOPWORDS,
    STOPWORDS,
    duck_norm,
    duck_tokens,
    spark_norm,
    spark_tokens,
)

# BPE-ish segmentation: alphabetic runs, digit runs, or a single
# non-space symbol — a crude stand-in for byte-pair pretokenization.
BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"
PUNCT_RE = r"[^a-zA-Z0-9\s]"


def _spark_re(pat: str) -> str:
    """Escape a regex for embedding in a Spark SQL string literal."""
    return pat.replace("\\", "\\\\")


def _duck_re(pat: str) -> str:
    """DuckDB string literals are escape-free: pattern passes verbatim."""
    return pat


def _in_list(values: tuple[str, ...]) -> str:
    return ", ".join(f"'{v}'" for v in values)


# -------------------------------------------------------------- language ID
def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_pred): stopword-lexicon argmax, ties broken by the
    fixed language precedence en > es > fr > de; 'unknown' when no
    lexicon matches at all."""
    scored = docs.select(
        "doc_id",
        *[
            F.expr(
                f"size(filter({spark_tokens('text')}, t -> t IN ({_in_list(words)})))"
            ).alias(f"n_{lang}")
            for lang, words in STOPWORDS.items()
        ],
    )
    return scored.select("doc_id", F.expr(_argmax_case(list(STOPWORDS))).alias("lang_pred"))


def _argmax_case(langs: list[str]) -> str:
    best = "GREATEST(" + ", ".join(f"n_{l}" for l in langs) + ")"
    return (
        "CASE "
        + " ".join(f"WHEN n_{l} = {best} AND n_{l} > 0 THEN '{l}'" for l in langs)
        + " ELSE 'unknown' END"
    )


def lang_id_oracle_sql() -> str:
    score_cols = ", ".join(
        f"len(list_filter({duck_tokens('text')}, t -> t IN ({_in_list(words)}))) AS n_{lang}"
        for lang, words in STOPWORDS.items()
    )
    return (
        f"WITH scored AS (SELECT doc_id, {score_cols} FROM documents) "
        f"SELECT doc_id, {_argmax_case(list(STOPWORDS))} AS lang_pred FROM scored"
    )


# ------------------------------------------------------------ quality score
def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, avg_token_len, punct_ratio, stop_ratio,
    quality): heuristic quality features + combined bounded score."""
    stop = _in_list(QUALITY_STOPWORDS)
    toks = spark_tokens("text")
    # NOTE: no rounding anywhere — every expression here is rational
    # per-row arithmetic, bit-identical across engines; round() itself
    # is the only operation the engines disagree on (boundary doubles)
    feats = docs.selectExpr(
        "doc_id",
        f"CAST(size({toks}) AS BIGINT) AS n_tokens",
        f"length(replace({spark_norm('text')}, ' ', ''))"
        f" / CAST(size({toks}) AS DOUBLE) AS avg_token_len",
        f"CAST(size(regexp_extract_all(text, '{_spark_re(PUNCT_RE)}', 0)) AS DOUBLE)"
        f" / length(text) AS punct_ratio",
        f"CAST(size(filter({toks}, t -> t IN ({stop}))) AS DOUBLE)"
        f" / size({toks}) AS stop_ratio",
    )
    return feats.withColumn(
        "quality",
        F.least(
            F.lit(1.0),
            0.5 * F.least(F.col("stop_ratio") * 10, F.lit(1.0))
            + 0.3 * (1 - F.col("punct_ratio"))
            + 0.2 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0)),
        ),
    )


def quality_score_oracle_sql() -> str:
    stop = _in_list(QUALITY_STOPWORDS)
    toks = duck_tokens("text")
    return f"""
WITH feats AS (
  SELECT doc_id,
    CAST(len({toks}) AS BIGINT) AS n_tokens,
    length(replace({duck_norm('text')}, ' ', ''))
          / CAST(len({toks}) AS DOUBLE) AS avg_token_len,
    CAST(len(regexp_extract_all(text, '{_duck_re(PUNCT_RE)}')) AS DOUBLE)
          / length(text) AS punct_ratio,
    CAST(len(list_filter({toks}, t -> t IN ({stop}))) AS DOUBLE)
          / len({toks}) AS stop_ratio
  FROM documents
)
SELECT doc_id, n_tokens, avg_token_len, punct_ratio, stop_ratio,
  LEAST(1.0,
    0.5 * LEAST(stop_ratio * 10, 1.0) + 0.3 * (1 - punct_ratio)
    + 0.2 * LEAST(n_tokens / 100.0, 1.0)) AS quality
FROM feats
"""


# -------------------------------------------------------------- token count
def token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens)."""
    return docs.selectExpr(
        "doc_id",
        f"CAST(size({spark_tokens('text')}) AS BIGINT) AS ws_tokens",
        f"CAST(size(regexp_extract_all(text, '{_spark_re(BPE_RE)}', 0)) AS BIGINT)"
        " AS bpe_tokens",
    )


def token_count_oracle_sql() -> str:
    return (
        f"SELECT doc_id, CAST(len({duck_tokens('text')}) AS BIGINT) AS ws_tokens, "
        f"CAST(len(regexp_extract_all(text, '{_duck_re(BPE_RE)}')) AS BIGINT) AS bpe_tokens "
        f"FROM documents"
    )


# ---------------------------------------------------------------- winnowing
# pos fits in 20 bits (docs ≤ ~1M tokens); (h % P) < 2^31 → packed
# (h << 20 | pos) < 2^51, safely in int64, and integer MIN over the
# packed value IS the lexicographic (h, pos) minimum winnowing wants.
_POS_BITS = 20


def winnow_fingerprints(docs: DataFrame, k: int = 4, window: int = 5) -> DataFrame:
    """(doc_id, n_fps, min_fp): winnowing fingerprint selection
    (Schleimer/Wilkerson/Aiken, the MOSS algorithm): hash all k-token
    shingles, slide a window of ``window`` consecutive hashes, keep
    each window's minimum (rightmost-on-ties via the position
    tiebreak), dedupe. Guarantees any match of length >= window+k-1
    shares a fingerprint, with ~2/(window+1) selection density —
    the principled sparse fingerprint for large-corpus dedup.

    Shuffle profile: one explode + two grouped aggregations; the
    sliding min is a per-doc window frame (ROWS BETWEEN CURRENT AND
    window-1 FOLLOWING) — no joins."""
    from pyspark.sql import Window as W

    from ..functions.hashing import HASH_PRIME

    toks = docs.select("doc_id", F.expr(spark_tokens("text")).alias("ws"))
    idx = toks.select("doc_id", "ws", F.posexplode("ws").alias("i", "_t"))
    shingle_sql = "concat_ws(' ', " + ", ".join(f"ws[i + {j}]" for j in range(k)) + ")"
    hashed = (
        idx.filter(F.expr(f"i + {k} <= size(ws)"))
        .select(
            "doc_id",
            "i",
            F.expr(f"({spark_hash64(shingle_sql)} % {HASH_PRIME}L)").alias("h"),
        )
        .withColumn("packed", F.expr(f"h * {1 << _POS_BITS}L + i"))
    )
    w = W.partitionBy("doc_id").orderBy("i").rowsBetween(0, window - 1)
    selected = (
        hashed.withColumn("win_min", F.min("packed").over(w))
        # the last window-1 positions start incomplete windows; a full
        # window exists while i <= n_shingles - window — enforce via
        # count over the same frame
        .withColumn("win_n", F.count("packed").over(w))
        .filter(F.col("win_n") == window)
        .select("doc_id", "win_min")
        .distinct()
    )
    return selected.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.min(F.expr(f"win_min div {1 << _POS_BITS}L")).alias("min_fp"),
    )


def winnow_oracle_sql(k: int = 4, window: int = 5) -> str:
    from ..functions.hashing import HASH_PRIME, duck_hash64

    parts = " || ' ' || ".join(f"ws[i + {j}]" for j in range(k))
    return f"""
WITH toks AS (SELECT doc_id, {duck_tokens('text')} AS ws FROM documents),
sh AS (
  SELECT doc_id, i, ({duck_hash64(f"({parts})")} % {HASH_PRIME}::BIGINT)
           * {1 << _POS_BITS}::BIGINT + i AS packed
  FROM toks, UNNEST(generate_series(1, len(ws) - {k - 1})) AS g(i)
  WHERE len(ws) >= {k}
),
wins AS (
  SELECT doc_id,
    min(packed) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS win_min,
    count(packed) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS win_n
  FROM sh
),
sel AS (SELECT DISTINCT doc_id, win_min FROM wins WHERE win_n = {window})
SELECT doc_id, count(*) AS n_fps,
  CAST(min(win_min // {1 << _POS_BITS}) AS BIGINT) AS min_fp
FROM sel GROUP BY doc_id
"""


# -------------------------------------------------------------- fingerprint
def doc_fingerprint(docs: DataFrame, w: int = 4) -> DataFrame:
    """(doc_id, fingerprint): min over w-shingle hashes — MinHash k=1.
    Documents shorter than w tokens fall back to the whole-text hash.
    Built on the generator-form shingler (see dedup.shingle_docs) —
    no higher-order-function lambdas in the hot path."""
    from .dedup import shingle_docs

    sh = shingle_docs(docs, w)
    short = docs.selectExpr(
        "doc_id", f"{spark_norm('text')} AS shingle"
    ).filter(F.expr(f"size({spark_tokens('text')}) < {w}"))
    allsh = sh.unionByName(short)
    return (
        allsh.select("doc_id", F.expr(spark_hash64("shingle")).alias("h"))
        .groupBy("doc_id")
        .agg(F.min("h").alias("fingerprint"))
    )


def doc_fingerprint_oracle_sql(w: int = 4) -> str:
    parts = " || ' ' || ".join(f"ws[i + {j}]" for j in range(w))
    return f"""
WITH toks AS (SELECT doc_id, {duck_tokens('text')} AS ws FROM documents),
sh AS (
  SELECT doc_id, {parts} AS shingle
  FROM toks, UNNEST(generate_series(1, len(ws) - {w - 1})) AS g(i)
  WHERE len(ws) >= {w}
  UNION ALL
  SELECT doc_id, array_to_string(ws, ' ') AS shingle FROM toks WHERE len(ws) < {w}
)
SELECT doc_id, min({duck_hash64('shingle')}) AS fingerprint FROM sh GROUP BY doc_id
"""


# ------------------------------------------------------------ corpus filter
def corpus_doc_features(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_pred, quality, fingerprint): the PER-DOCUMENT
    (set-independent) half of ``corpus_filter`` — one narrow scan, no
    shuffle. Shared by the batch filter (which adds the global
    canon-by-fingerprint window) and the streaming corpus pipeline
    (which persists these rows per micro-batch and late-binds the
    global decisions at selection time)."""
    stop = _in_list(QUALITY_STOPWORDS)
    toks = spark_tokens("text")
    feats = docs.selectExpr(
        "doc_id",
        *[
            f"size(filter({toks}, t -> t IN ({_in_list(words)}))) AS n_{lg}"
            for lg, words in STOPWORDS.items()
        ],
        f"CAST(size({toks}) AS BIGINT) AS n_tokens",
        f"CAST(size(regexp_extract_all(text, '{_spark_re(PUNCT_RE)}', 0)) AS DOUBLE)"
        f" / length(text) AS punct_ratio",
        f"CAST(size(filter({toks}, t -> t IN ({stop}))) AS DOUBLE)"
        f" / size({toks}) AS stop_ratio",
        f"md5({spark_norm('text')}) AS fingerprint",
    )
    return feats.select(
        "doc_id",
        F.expr(_argmax_case(list(STOPWORDS))).alias("lang_pred"),
        F.least(
            F.lit(1.0),
            0.5 * F.least(F.col("stop_ratio") * 10, F.lit(1.0))
            + 0.3 * (1 - F.col("punct_ratio"))
            + 0.2 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0)),
        ).alias("quality"),
        "fingerprint",
    )


def corpus_filter(docs: DataFrame, lang: str = "en", min_quality: float = 0.5) -> DataFrame:
    """(doc_id, lang_pred, quality, n_copies, keep): the end-to-end
    training-corpus filter — language gate + quality gate + exact-dup
    canonicalization — FUSED into one pass.

    Physical shape is the point: language scores, quality features,
    and the content fingerprint are all narrow projections of the same
    scan, so they compute in one pipelined stage; the duplicate-group
    canon (smallest doc_id, copy count) comes from a WINDOW over the
    fingerprint rather than an aggregate+self-join — one scan, one
    shuffle, total. The naive composition (lang_id ⋈ quality_score ⋈
    dedup) re-reads the corpus four times; at 100 TB that is the whole
    game. Per-family semantics match lang_id / quality_score /
    exact_dedup_clusters exactly (shared expression builders).
    """
    from pyspark.sql import Window

    scored = corpus_doc_features(docs)
    w = Window.partitionBy("fingerprint")
    return (
        scored.withColumn("keep_id", F.min("doc_id").over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(w))
        .select(
            "doc_id",
            "lang_pred",
            "quality",
            "n_copies",
            (
                (F.col("lang_pred") == lang)
                & (F.col("quality") >= min_quality)
                & (F.col("doc_id") == F.col("keep_id"))
            ).alias("keep"),
        )
    )


def corpus_filter_oracle_sql(lang: str = "en", min_quality: float = 0.5) -> str:
    stop = _in_list(QUALITY_STOPWORDS)
    toks = duck_tokens("text")
    score_cols = ", ".join(
        f"len(list_filter({toks}, t -> t IN ({_in_list(words)}))) AS n_{lg}"
        for lg, words in STOPWORDS.items()
    )
    return f"""
WITH feats AS (
  SELECT doc_id, {score_cols},
    CAST(len({toks}) AS BIGINT) AS n_tokens,
    CAST(len(regexp_extract_all(text, '{_duck_re(PUNCT_RE)}')) AS DOUBLE)
          / length(text) AS punct_ratio,
    CAST(len(list_filter({toks}, t -> t IN ({stop}))) AS DOUBLE)
          / len({toks}) AS stop_ratio,
    md5({duck_norm('text')}) AS fingerprint
  FROM documents
), scored AS (
  SELECT doc_id, {_argmax_case(list(STOPWORDS))} AS lang_pred,
    LEAST(1.0,
      0.5 * LEAST(stop_ratio * 10, 1.0) + 0.3 * (1 - punct_ratio)
      + 0.2 * LEAST(n_tokens / 100.0, 1.0)) AS quality,
    fingerprint
  FROM feats
)
SELECT doc_id, lang_pred, quality,
  count(*) OVER (PARTITION BY fingerprint) AS n_copies,
  (lang_pred = '{lang}' AND quality >= {min_quality}
   AND doc_id = min(doc_id) OVER (PARTITION BY fingerprint)) AS keep
FROM scored
"""


# ---------------------------------------------------------- repetition score
# Gopher-style repetition features (Rae et al. 2021 §A1.1): fraction of
# duplicate words, share of the most frequent word, share of the most
# frequent bigram. High values flag boilerplate / degenerate generations
# that the quality heuristic (stopword-based) misses entirely.
def repetition_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, dup_word_frac, top_word_frac, top_bigram_frac).

    Scale shape: token/bigram explosion feeds a two-level aggregation
    (count per (doc, term) → max/sum per doc), so the shuffle carries
    partial counts, never raw token rows twice; both per-doc aggregates
    then meet in a join that is co-partitioned on doc_id because both
    sides were just shuffled on it. No HOF lambdas in the hot path
    (first-use codegen cost — see shingle_docs) and no per-row Python.
    Docs shorter than 2 tokens emit NULL top_bigram_frac on both
    engines (explicit CASE, not division-by-zero behavior).
    """
    toks = docs.select("doc_id", F.expr(spark_tokens("text")).alias("ws"))
    wagg = (
        toks.select("doc_id", F.explode("ws").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top_c"),
        )
    )
    idx = toks.select("doc_id", "ws", F.posexplode("ws").alias("i", "_t"))
    bagg = (
        idx.filter(F.expr("i + 2 <= size(ws)"))
        .select(
            "doc_id",
            F.concat_ws(" ", F.expr("ws[i]"), F.expr("ws[i + 1]")).alias("s"),
        )
        .groupBy("doc_id", "s")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bg"))
    )
    return wagg.join(bagg, "doc_id", "left").select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(1 - F.col("n_distinct") / F.col("n_tokens"), 6).alias(
            "dup_word_frac"
        ),
        F.round(F.col("top_c") / F.col("n_tokens"), 6).alias("top_word_frac"),
        F.when(
            F.col("n_bigrams") > 0,
            F.round(F.col("top_bg") / F.col("n_bigrams"), 6),
        ).alias("top_bigram_frac"),
    )


def repetition_score_oracle_sql() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {duck_tokens('text')} AS ws FROM documents),
words AS (SELECT doc_id, unnest(ws) AS w FROM toks),
wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w),
wagg AS (
  SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct, max(c) AS top_c
  FROM wc GROUP BY doc_id
),
bg AS (
  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS s
  FROM toks, UNNEST(generate_series(1, len(ws) - 1)) AS g(i)
  WHERE len(ws) >= 2
),
bc AS (SELECT doc_id, s, count(*) AS c FROM bg GROUP BY doc_id, s),
bagg AS (
  SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bg FROM bc GROUP BY doc_id
)
SELECT wagg.doc_id,
  CAST(n_tokens AS BIGINT) AS n_tokens,
  round(1 - n_distinct / CAST(n_tokens AS DOUBLE), 6) AS dup_word_frac,
  round(top_c / CAST(n_tokens AS DOUBLE), 6) AS top_word_frac,
  CASE WHEN n_bigrams > 0
       THEN round(top_bg / CAST(n_bigrams AS DOUBLE), 6) END
    AS top_bigram_frac
FROM wagg LEFT JOIN bagg ON wagg.doc_id = bagg.doc_id
"""


# ------------------------------------------------------------- PII redaction
# RE2-safe patterns (no lookaround/backrefs) so Java regex (Spark) and
# RE2 (DuckDB) match identically. \b is supported by both.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,4}"
PHONE_RE = r"\+?[0-9][0-9() .-]{6,}[0-9]"
IPV4_RE = r"\b[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}\b"


def pii_redact(docs: DataFrame) -> DataFrame:
    """(doc_id, redacted, n_emails, n_phones, n_ips): replace
    email / phone-number / IPv4 literals with typed placeholder tokens
    and count what was removed — the standard scrub pass before a text
    corpus is used for training.

    Narrow projection, zero shuffle: three chained JVM
    ``regexp_replace`` calls (global by default in Spark) and three
    ``regexp_extract_all`` counts, all inside one whole-stage-codegen
    span. Order matters: emails first (an email contains digit runs a
    greedy phone pattern could claim), then IPs, then phones.
    """
    email, phone, ip = (
        _spark_re(EMAIL_RE),
        _spark_re(PHONE_RE),
        _spark_re(IPV4_RE),
    )
    return docs.selectExpr(
        "doc_id",
        "regexp_replace(regexp_replace(regexp_replace("
        f"text, '{email}', '<EMAIL>'), '{ip}', '<IP>'), '{phone}', '<PHONE>')"
        " AS redacted",
        f"CAST(size(regexp_extract_all(text, '{email}', 0)) AS BIGINT) AS n_emails",
        f"CAST(size(regexp_extract_all(regexp_replace(regexp_replace(text,"
        f" '{email}', '<EMAIL>'), '{ip}', '<IP>'), '{phone}', 0)) AS BIGINT)"
        " AS n_phones",
        f"CAST(size(regexp_extract_all(text, '{ip}', 0)) AS BIGINT) AS n_ips",
    )


def pii_redact_oracle_sql() -> str:
    email, phone, ip = _duck_re(EMAIL_RE), _duck_re(PHONE_RE), _duck_re(IPV4_RE)
    return f"""
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(
    text, '{email}', '<EMAIL>', 'g'), '{ip}', '<IP>', 'g'),
    '{phone}', '<PHONE>', 'g') AS redacted,
  CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(regexp_replace(regexp_replace(text,
    '{email}', '<EMAIL>', 'g'), '{ip}', '<IP>', 'g'), '{phone}'))
    AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(text, '{ip}')) AS BIGINT) AS n_ips
FROM documents
"""


# -------------------------------------------------------- sequence packing
# Greedy contiguous first-fit packing of documents into fixed-size
# context windows — the step that turns a deduped corpus into training
# sequences. Sequential by nature WITHIN a shard; shards are fully
# independent, so parallelism = n_shards and only (doc_id, n_tokens)
# metadata ever moves — the text itself stays where it is and the pack
# assignment joins back by doc_id.
PACK_CAPACITY = 256
PACK_SHARDS = 32


def pack_sequences(
    docs,
    capacity: int = PACK_CAPACITY,
    n_shards: int = PACK_SHARDS,
):
    """(doc_id, shard, pack_id, n_tokens): greedy contiguous packing.

    Docs are sharded by ``doc_id % n_shards``; within a shard, in
    doc_id order, each doc joins the current pack while the running
    token total fits ``capacity``, else opens the next pack (a doc
    longer than ``capacity`` gets a pack of its own). The loop is
    inherently sequential per shard, so it runs as one arrow-batched
    ``applyInPandas`` per shard over METADATA ONLY — the hot path
    never carries text through Python.

    At 100 TB: shard by input partition (or date bucket) instead of a
    modulus so the metadata groupBy is the only shuffle; packing cost
    is O(docs/shard) per task with ~16 bytes per doc in flight.
    DuckDB oracle: per-shard recursive CTE carrying (acc, pack) —
    identical greedy rule, engine-portable.
    """
    from pyspark.sql import functions as F

    meta = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    return pack_sequences_from_meta(meta, capacity=capacity, n_shards=n_shards)


def pack_sequences_from_meta(
    meta,
    capacity: int = PACK_CAPACITY,
    n_shards: int = PACK_SHARDS,
):
    """The packing stage proper, over (doc_id, n_tokens) METADATA —
    split out so callers that already persisted per-doc token counts
    (the streaming corpus pipeline's late-bound selection) pack
    without touching text. Same greedy rule, same applyInPandas."""
    import pandas as pd

    from pyspark.sql import functions as F

    meta = meta.select(
        "doc_id",
        (F.col("doc_id") % n_shards).alias("shard"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        packs = []
        acc = 0
        pid = -1
        for tok in pdf["n_tokens"]:
            if pid >= 0 and acc + tok <= capacity:
                acc += tok
            else:
                pid += 1
                acc = tok
            packs.append(pid)
        pdf["pack_id"] = packs
        return pdf[["doc_id", "shard", "pack_id", "n_tokens"]]

    return meta.groupBy("shard").applyInPandas(
        lambda _, pdf: pack(pdf),
        "doc_id long, shard long, pack_id long, n_tokens int",
    )


def pack_sequences_oracle_sql(
    capacity: int = PACK_CAPACITY, n_shards: int = PACK_SHARDS
) -> str:
    """Recursive-CTE twin of ``pack_sequences``: all shards advance one
    row per iteration, so recursion depth = max rows per shard."""
    return f"""
WITH RECURSIVE t AS (
  SELECT doc_id, doc_id % {n_shards} AS shard,
         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
         row_number() OVER (PARTITION BY doc_id % {n_shards} ORDER BY doc_id) AS rn
  FROM documents
), r AS (
  SELECT shard, rn, doc_id, n_tokens,
         n_tokens AS acc, CAST(0 AS BIGINT) AS pack_id
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.shard, t.rn, t.doc_id, t.n_tokens,
         CASE WHEN r.acc + t.n_tokens <= {capacity}
              THEN r.acc + t.n_tokens ELSE t.n_tokens END,
         CASE WHEN r.acc + t.n_tokens <= {capacity}
              THEN r.pack_id ELSE r.pack_id + 1 END
  FROM r JOIN t ON t.shard = r.shard AND t.rn = r.rn + 1
)
SELECT doc_id, shard, pack_id, n_tokens FROM r
"""


# --------------------------------------------------- hashed embeddings
def hash_embed_docs(
    docs: DataFrame, dim: int = 64, tf_weight: str = "raw"
) -> DataFrame:
    """Feature-hashing (hashing-trick) embeddings for a docs frame
    carrying (doc_id, text): every token lands in md5%dim with an
    md5-derived sign, aggregated and L2-normalized. The engine core
    behind the ``text_hash_embedding`` registry query.

    ``tf_weight`` picks the term-frequency contribution per cell:

    - ``"raw"``: signed occurrence counts (the registry default — its
      DuckDB oracle states exactly this).
    - ``"binary"``: signed PRESENCE (each distinct doc-term once) —
      the production weighting for natural-language text. Measured on
      the Zipf fixture (tests/test_zipf_lsh.py): raw TF lets the
      high-frequency head dominate every vector (the stopword effect
      — LSH candidate fraction 13%, max bucket 41% of corpus even at
      a 4000-word vocabulary), while binary cuts candidates to 1.5%
      and the max bucket to 7.5% at equal recall. Raw stays the
      default only because the driver's ~20-word synthetic corpus
      makes term SETS nearly identical across docs (binary there
      collapses everything to cosine ~1); real corpora want binary or
      a saturating cap, exactly as BM25 saturates tf.

    Signed integer counts keep the norm and every element the same
    IEEE doubles cross-engine. One token explode + bounded
    aggregations (cells <= dim/doc); O(docs x dim) state regardless
    of vocabulary."""
    if tf_weight not in ("raw", "binary"):
        raise ValueError(f"tf_weight must be raw|binary, got {tf_weight!r}")
    # tokenize+explode+hash is this operator's map-side CPU and runs
    # in the scan's partitions: spread when the scan under-splits
    toks = spread(docs.select("doc_id", "text")).select(
        "doc_id",
        F.explode(
            F.expr(f"filter({spark_tokens('text')}, x -> x != '')")
        ).alias("term"),
    )
    if tf_weight == "binary":
        toks = toks.distinct()  # presence: one vote per (doc, term)
    h = toks.select("doc_id", F.expr(spark_hash64("term")).alias("h64"))
    # ONE hash aggregate computing all `dim` signed cell sums as flat
    # columns (integer div, NOT `/`: h64 is up to 60 bits and a double
    # division would lose exactness past 2^53). The former shape —
    # groupBy(doc_id, cell) then groupBy(doc_id) collecting a map —
    # paid a second Exchange plus per-element map probes and an
    # interpreted HOF normalize (lambda machinery per element); flat
    # columns keep the whole normalize inside whole-stage codegen.
    # Arithmetic is unchanged: integer sums are exact under any
    # grouping, and the flat n2 chain below is the same left-to-right
    # summation order as the sequential fold it replaces (r17,
    # measured 3.0 -> 1.2 s warm at sf0.1, output bit-identical).
    sums = [
        F.sum(
            F.when(
                (F.col("h64") % dim) == i,
                F.when(
                    F.expr(f"(h64 div {dim}) % 2 = 0"), 1
                ).otherwise(-1),
            ).otherwise(0)
        ).alias(f"c{i}")
        for i in range(dim)
    ]
    vec = h.groupBy("doc_id").agg(*sums)
    n2 = " + ".join(
        f"(CAST(c{i} AS DOUBLE) * CAST(c{i} AS DOUBLE))" for i in range(dim)
    )
    emb = "array(" + ", ".join(
        f"round(CAST(c{i} AS DOUBLE) / sqrt(n2), 6)" for i in range(dim)
    ) + ")"
    return (
        vec.withColumn("n2", F.expr(n2))
        .filter("n2 > 0")
        .select("doc_id", F.expr(emb).alias("embedding"))
    )


# ------------------------------------------------------------ BPE merges
# The tokenizer-adjacent primitive a training-data pipeline still
# lacked (VERDICT r5 #7): iterative byte-pair-encoding merge-table
# construction (Sennrich et al. 2016, ACL — public algorithm). The
# corpus is scanned ONCE into a word-frequency vocabulary (the classic
# BPE reduction: all further work is on the vocab, which is tiny
# relative to the corpus at any scale); each of the K steps is a
# pair-count aggregation + 1-row argmax + a literal string rewrite.
#
# Segmentation representation (shared with the DuckDB oracle): symbols
# joined by TWO spaces with two-space edges ("  a  b  c  "), so one
# merge step is a plain left-to-right non-overlapping replace of
# " L  R " with " LR " — each match consumes one space from either
# edge and re-supplies it, preserving the invariant; greedy-leftmost
# replace() semantics are exactly BPE's within-step merge order, and
# the double delimiters make prefix collisions (" a  ab ") impossible.
BPE_VOCAB_N = 150
BPE_STEPS = 6


def collect_word_vocab(docs: DataFrame, n_words: int = BPE_VOCAB_N):
    """ONE corpus scan cutting the weighted top-``n_words`` word
    vocabulary by the deterministic (count DESC, word ASC) order —
    the shared seed of the char-BPE, byte-BPE, and Unigram trainers
    (all three cut the SAME 150 rows). ``tokenizer_counts`` collects
    it once, so the fused 4-way fertility pays one vocab scan
    instead of three."""
    return (
        docs.select(F.explode(F.expr(spark_tokens("text"))).alias("w"))
        .filter("w <> ''")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("w"))
        .limit(n_words)
        .collect()
    )



def bpe_merge_table(
    spark,
    docs: DataFrame,
    n_words: int = BPE_VOCAB_N,
    steps: int = BPE_STEPS,
    vocab_rows=None,
) -> DataFrame:
    """(step, lhs, rhs, pair_count, merged): the first ``steps`` BPE
    merges learned from the corpus' top-``n_words`` vocabulary, with
    fully deterministic tie-breaks (pair_count DESC, lhs ASC, rhs ASC;
    vocabulary cut by count DESC, word ASC).

    Physical shape: ONE distributed corpus scan builds the weighted
    vocabulary (the only data-scale-dependent stage — at 100 TB it is
    a token count with map-side combine), cut to the top ``n_words``
    by the deterministic (count DESC, word ASC) order. The cut vocab
    is bounded by a PARAMETER, not by data (150 rows here), so the K
    merge iterations run driver-local on the collected rows — real
    BPE trainers iterate in memory for the same reason. This replaced
    a K-tiny-Spark-jobs loop that produced byte-identical results but
    paid ~6 job-scheduling round-trips per call (measured ~2-3 s of
    pure overhead at any scale); a vocabulary too large to collect
    would bring that per-iteration aggregation shape back, unchanged.
    The in-memory loop reproduces the Spark/DuckDB semantics exactly:
    double-delimited segmentation, pair weights summed per (lhs, rhs),
    argmax tie-broken (count DESC, lhs ASC, rhs ASC), greedy-leftmost
    non-overlapping replace (str.replace == Spark replace() ==
    DuckDB replace())."""
    if vocab_rows is None:
        vocab_rows = collect_word_vocab(docs, n_words)
    segs = [
        (int(r["cnt"]), "  " + "".join(c + "  " for c in r["w"]))
        for r in vocab_rows
    ]

    return spark.createDataFrame(
        _bpe_merge_loop(segs, steps),
        "step bigint, lhs string, rhs string, pair_count bigint, merged string",
    )


def _bpe_merge_loop(segs: list, steps: int) -> list:
    """The driver-local K-iteration merge loop shared by the char and
    byte BPE trainers (both operate on double-delimited segmentations
    and differ only in the seg0 alphabet)."""
    merges = []
    for step in range(1, steps + 1):
        freqs: dict[tuple[str, str], int] = {}
        for cnt, seg in segs:
            syms = seg.strip().split("  ")
            for a, b in zip(syms, syms[1:]):
                freqs[(a, b)] = freqs.get((a, b), 0) + cnt
        if not freqs:
            break  # vocabulary fully merged before K steps
        (lhs, rhs), f = min(
            freqs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, lhs, rhs, f, lhs + rhs))
        segs = [
            (cnt, seg.replace(f" {lhs}  {rhs} ", f" {lhs}{rhs} "))
            for cnt, seg in segs
        ]
    return merges


def _bpe_merge_blocks(n_words: int, steps: int) -> list[str]:
    """Shared CTE prefix (vocab → seg0 → {lst,pair,best,seg}×K) for
    the merge-learning and encode oracles — both must see the exact
    same deterministically-tie-broken merge sequence."""
    blocks = [
        "wc AS (SELECT w AS word, count(*) AS cnt FROM "
        f"(SELECT unnest({duck_tokens('text')}) AS w FROM documents) "
        "WHERE w <> '' GROUP BY 1)",
        f"vocab AS (SELECT word, cnt FROM wc ORDER BY cnt DESC, word LIMIT {n_words})",
        "seg0 AS (SELECT cnt, '  ' || regexp_replace(word, '(.)', "
        "'\\1  ', 'g') AS seg FROM vocab)",
    ]
    outs = []
    for i in range(1, steps + 1):
        p = i - 1
        blocks.append(
            f"lst{i} AS (SELECT cnt, string_split(trim(seg), '  ') AS lst "
            f"FROM seg{p})"
        )
        blocks.append(
            f"pair{i} AS (SELECT lst[g.i] AS lhs, lst[g.i + 1] AS rhs, "
            f"sum(cnt) AS f FROM lst{i}, "
            "UNNEST(generate_series(1, len(lst) - 1)) AS g(i) GROUP BY 1, 2)"
        )
        blocks.append(
            f"best{i} AS (SELECT lhs, rhs, f FROM pair{i} "
            "ORDER BY f DESC, lhs, rhs LIMIT 1)"
        )
        blocks.append(
            f"seg{i} AS (SELECT s.cnt, replace(s.seg, "
            "' ' || b.lhs || '  ' || b.rhs || ' ', "
            "' ' || b.lhs || b.rhs || ' ') AS seg "
            f"FROM seg{p} s, best{i} b)"
        )
    return blocks


def bpe_merges_oracle_sql(
    n_words: int = BPE_VOCAB_N, steps: int = BPE_STEPS
) -> str:
    """Unrolled-iteration oracle (the ema_macd pattern): K CTE blocks,
    each re-deriving pair counts from the previous segmentation,
    taking the same deterministically-tie-broken argmax, and applying
    the same double-delimited replace."""
    blocks = _bpe_merge_blocks(n_words, steps)
    outs = [
        f"SELECT CAST({i} AS BIGINT) AS step, lhs, rhs, "
        "CAST(f AS BIGINT) AS pair_count, lhs || rhs AS merged "
        f"FROM best{i}"
        for i in range(1, steps + 1)
    ]
    return "WITH " + ",\n".join(blocks) + "\n" + "\nUNION ALL\n".join(outs)


def bpe_encode_counts(
    spark,
    docs: DataFrame,
    n_words: int = BPE_VOCAB_N,
    steps: int = BPE_STEPS,
) -> DataFrame:
    """(doc_id, n_words, n_bpe): tokenize the corpus WITH the learned
    merge table — the apply side that closes the tokenizer loop opened
    by ``bpe_merge_table``. Every word is segmented to characters in
    the same double-delimited representation, the K learned merges are
    applied in order as literal replaces, and the per-word token count
    is summed per document (n_bpe = what ``pack_sequences`` would pack
    on under this tokenizer; n_words = the whitespace grain).

    Physical shape: the LEARNING loop is ``bpe_merge_table``'s K tiny
    jobs (one corpus scan total); the ENCODE pass is ONE narrow
    corpus scan with zero shuffles — the merge table collects to the
    driver (K rows, bounded by construction) and unrolls into a
    literal replace chain inside a single higher-order aggregate, so
    tokenization runs at scan speed entirely in codegen. At 100 TB the
    per-doc counts stream straight into the pack/filter stages without
    ever exploding a token row per word."""
    merges = sorted(
        bpe_merge_table(spark, docs, n_words, steps).collect(),
        key=lambda r: r["step"],
    )
    toks = f"filter({spark_tokens('text')}, w -> w <> '')"
    per_word = _bpe_word_count_expr(merges)
    # the fold is the query's CPU and it runs in the scan's own
    # partitions — spread the narrow projection when the scan
    # under-splits (conditional: no-op at production split counts)
    d = spread(docs.select("doc_id", "text"))
    return d.select(
        "doc_id",
        F.expr(f"CAST(size({toks}) AS BIGINT)").alias("n_words"),
        F.expr(
            f"aggregate({toks}, CAST(0 AS BIGINT), (a, w) -> a + {per_word})"
        ).alias("n_bpe"),
    )


def _bpe_word_count_expr(merges) -> str:
    """Per-word BPE token count as one expression over ``w`` — the
    learned merge table unrolled into a literal replace chain (shared
    by bpe_encode_counts and the single-scan tokenizer_counts)."""
    chain = "concat('  ', regexp_replace(w, '(.)', '$1  '))"
    for m in merges:
        chain = f"replace({chain}, ' {m['lhs']}  {m['rhs']} ', ' {m['merged']} ')"
    return f"size(split(trim({chain}), '  '))"


def bpe_encode_oracle_sql(
    n_words: int = BPE_VOCAB_N, steps: int = BPE_STEPS
) -> str:
    """Re-derives the identical merge sequence via the shared CTE
    prefix, then applies it word-by-word: each enc{i} chains the
    double-delimited replace against best{i} (1-row cross join), and
    the per-doc aggregate LEFT JOINs back so token-free documents
    surface (0, 0) exactly as the Spark fold does."""
    blocks = _bpe_merge_blocks(n_words, steps)
    blocks.append(
        "wrds AS (SELECT doc_id, w FROM (SELECT doc_id, "
        f"unnest({duck_tokens('text')}) AS w FROM documents) WHERE w <> '')"
    )
    blocks.append(
        "enc0 AS (SELECT doc_id, '  ' || regexp_replace(w, '(.)', "
        "'\\1  ', 'g') AS seg FROM wrds)"
    )
    for i in range(1, steps + 1):
        blocks.append(
            f"enc{i} AS (SELECT e.doc_id, replace(e.seg, "
            "' ' || b.lhs || '  ' || b.rhs || ' ', "
            "' ' || b.lhs || b.rhs || ' ') AS seg "
            f"FROM enc{i - 1} e, best{i} b)"
        )
    blocks.append(
        f"agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, "
        f"CAST(sum(len(string_split(trim(seg), '  '))) AS BIGINT) AS n_bpe "
        f"FROM enc{steps} GROUP BY doc_id)"
    )
    return (
        "WITH "
        + ",\n".join(blocks)
        + "\nSELECT d.doc_id, coalesce(a.n_words, 0) AS n_words, "
        "coalesce(a.n_bpe, 0) AS n_bpe "
        "FROM documents d LEFT JOIN agg a USING (doc_id)"
    )


# ---------------------------------------------------- byte-level BPE
# The production GPT-class variant (VERDICT r13 item 8): merges are
# learned over the UTF-8 BYTES of each word, not its characters, so
# multi-byte codepoints decompose (é = C3 A9 can merge with its
# neighbors byte-wise) and any input is representable from a 256-entry
# base alphabet — no <unk>. Pre-tokenization stays word-bounded, as in
# GPT-2 (merges never cross pre-token boundaries); the byte-to-unicode
# printable table of the reference implementation is an ENCODING
# convenience, not semantics — the house representation is uppercase
# hex byte pairs (hex(encode(w)) agrees bit-for-bit between Spark and
# DuckDB), which keeps the whole pipeline in the same double-delimited
# string machinery as character BPE.


def bpe_bytes_merge_table(
    spark,
    docs: DataFrame,
    n_words: int = BPE_VOCAB_N,
    steps: int = BPE_STEPS,
    vocab_rows=None,
) -> DataFrame:
    """(step, lhs, rhs, pair_count, merged): the first ``steps``
    BYTE-LEVEL BPE merges — symbols are uppercase hex byte pairs of
    the word's UTF-8 encoding. Same physical shape as
    ``bpe_merge_table``: one corpus scan cuts the weighted top-N word
    vocabulary; the K merge iterations run driver-local on the
    parameter-bounded rows. Tie-breaks are deterministic in the hex
    alphabet ([0-9A-F], ASCII order — identical in Python, Spark, and
    DuckDB)."""
    if vocab_rows is None:
        vocab_rows = collect_word_vocab(docs, n_words)
    segs = [
        (
            int(r["cnt"]),
            "  "
            + "".join(
                f"{byte:02X}  " for byte in r["w"].encode("utf-8")
            ),
        )
        for r in vocab_rows
    ]
    merges = []
    for step in range(1, steps + 1):
        freqs: dict[tuple[str, str], int] = {}
        for cnt, seg in segs:
            syms = seg.strip().split("  ")
            for a, b in zip(syms, syms[1:]):
                freqs[(a, b)] = freqs.get((a, b), 0) + cnt
        if not freqs:
            break
        (lhs, rhs), f = min(
            freqs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, lhs, rhs, f, lhs + rhs))
        segs = [
            (cnt, seg.replace(f" {lhs}  {rhs} ", f" {lhs}{rhs} "))
            for cnt, seg in segs
        ]
    return spark.createDataFrame(
        merges,
        "step bigint, lhs string, rhs string, pair_count bigint, merged string",
    )


def _bpe_bytes_merge_blocks(n_words: int, steps: int) -> list[str]:
    """Shared CTE prefix for the byte-level merge/encode oracles —
    identical to ``_bpe_merge_blocks`` except seg0 segments the
    word's UTF-8 bytes as hex pairs."""
    blocks = [
        "bwc AS (SELECT w AS word, count(*) AS cnt FROM "
        f"(SELECT unnest({duck_tokens('text')}) AS w FROM documents) "
        "WHERE w <> '' GROUP BY 1)",
        f"bvocab AS (SELECT word, cnt FROM bwc "
        f"ORDER BY cnt DESC, word LIMIT {n_words})",
        "bseg0 AS (SELECT cnt, '  ' || regexp_replace(hex(encode(word)), "
        "'(..)', '\\1  ', 'g') AS seg FROM bvocab)",
    ]
    for i in range(1, steps + 1):
        p = i - 1
        blocks.append(
            f"blst{i} AS (SELECT cnt, string_split(trim(seg), '  ') AS lst "
            f"FROM bseg{p})"
        )
        blocks.append(
            f"bpair{i} AS (SELECT lst[g.i] AS lhs, lst[g.i + 1] AS rhs, "
            f"sum(cnt) AS f FROM blst{i}, "
            "UNNEST(generate_series(1, len(lst) - 1)) AS g(i) GROUP BY 1, 2)"
        )
        blocks.append(
            f"bbest{i} AS (SELECT lhs, rhs, f FROM bpair{i} "
            "ORDER BY f DESC, lhs, rhs LIMIT 1)"
        )
        blocks.append(
            f"bseg{i} AS (SELECT s.cnt, replace(s.seg, "
            "' ' || b.lhs || '  ' || b.rhs || ' ', "
            "' ' || b.lhs || b.rhs || ' ') AS seg "
            f"FROM bseg{p} s, bbest{i} b)"
        )
    return blocks


def bpe_bytes_merges_oracle_sql(
    n_words: int = BPE_VOCAB_N, steps: int = BPE_STEPS
) -> str:
    blocks = _bpe_bytes_merge_blocks(n_words, steps)
    outs = [
        f"SELECT CAST({i} AS BIGINT) AS step, lhs, rhs, "
        "CAST(f AS BIGINT) AS pair_count, lhs || rhs AS merged "
        f"FROM bbest{i}"
        for i in range(1, steps + 1)
    ]
    return "WITH " + ",\n".join(blocks) + "\n" + "\nUNION ALL\n".join(outs)


def _bpe_bytes_word_count_expr(merges) -> str:
    """Per-word byte-level BPE token count as one expression over
    ``w`` (the same unrolled replace-chain shape as
    ``_bpe_word_count_expr``, over hex byte pairs)."""
    chain = (
        "concat('  ', regexp_replace(hex(encode(w, 'utf-8')), "
        "'(..)', '$1  '))"
    )
    for m in merges:
        chain = (
            f"replace({chain}, ' {m['lhs']}  {m['rhs']} ', ' {m['merged']} ')"
        )
    return f"size(split(trim({chain}), '  '))"


def bpe_bytes_encode_counts(
    spark,
    docs: DataFrame,
    n_words: int = BPE_VOCAB_N,
    steps: int = BPE_STEPS,
) -> DataFrame:
    """(doc_id, n_words, n_bytes, n_bpe_bytes): tokenize the corpus
    with the learned BYTE-level merge table. n_bytes (the UTF-8 length
    of the word stream) is the un-merged floor — byte-BPE fertility is
    bounded above by bytes/word and below by 1. Physical shape =
    ``bpe_encode_counts``: the bounded merge table unrolls into a
    literal replace chain inside one codegen'd fold; ONE narrow corpus
    scan, zero shuffles."""
    merges = sorted(
        bpe_bytes_merge_table(spark, docs, n_words, steps).collect(),
        key=lambda r: r["step"],
    )
    toks = f"filter({spark_tokens('text')}, w -> w <> '')"
    per_word = _bpe_bytes_word_count_expr(merges)
    # fold CPU runs in the scan's partitions: spread when under-split
    d = spread(docs.select("doc_id", "text"))
    return d.select(
        "doc_id",
        F.expr(f"CAST(size({toks}) AS BIGINT)").alias("n_words"),
        F.expr(
            f"aggregate({toks}, CAST(0 AS BIGINT), "
            "(a, w) -> a + length(encode(w, 'utf-8')))"
        ).alias("n_bytes"),
        F.expr(
            f"aggregate({toks}, CAST(0 AS BIGINT), (a, w) -> a + {per_word})"
        ).alias("n_bpe_bytes"),
    )


def bpe_bytes_encode_oracle_sql(
    n_words: int = BPE_VOCAB_N, steps: int = BPE_STEPS
) -> str:
    blocks = _bpe_bytes_merge_blocks(n_words, steps)
    blocks.append(
        "bwrds AS (SELECT doc_id, w FROM (SELECT doc_id, "
        f"unnest({duck_tokens('text')}) AS w FROM documents) WHERE w <> '')"
    )
    blocks.append(
        "benc0 AS (SELECT doc_id, octet_length(encode(w)) AS nb, "
        "'  ' || regexp_replace(hex(encode(w)), '(..)', '\\1  ', 'g') "
        "AS seg FROM bwrds)"
    )
    for i in range(1, steps + 1):
        blocks.append(
            f"benc{i} AS (SELECT e.doc_id, e.nb, replace(e.seg, "
            "' ' || b.lhs || '  ' || b.rhs || ' ', "
            "' ' || b.lhs || b.rhs || ' ') AS seg "
            f"FROM benc{i - 1} e, bbest{i} b)"
        )
    blocks.append(
        "bagg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, "
        "CAST(sum(nb) AS BIGINT) AS n_bytes, "
        "CAST(sum(len(string_split(trim(seg), '  '))) AS BIGINT) "
        f"AS n_bpe_bytes FROM benc{steps} GROUP BY doc_id)"
    )
    return (
        "WITH "
        + ",\n".join(blocks)
        + "\nSELECT d.doc_id, coalesce(a.n_words, 0) AS n_words, "
        "coalesce(a.n_bytes, 0) AS n_bytes, "
        "coalesce(a.n_bpe_bytes, 0) AS n_bpe_bytes "
        "FROM documents d LEFT JOIN bagg a USING (doc_id)"
    )


def pack_sequences_bpe(
    spark,
    docs,
    capacity: int = PACK_CAPACITY,
    n_shards: int = PACK_SHARDS,
    n_words: int = BPE_VOCAB_N,
    steps: int = BPE_STEPS,
):
    """(doc_id, shard, pack_id, n_tokens): the packer driven by the
    LEARNED tokenizer — n_tokens is ``bpe_encode_counts``'s n_bpe (the
    real post-merge token count), not the whitespace proxy. This is
    the literal closing of the tokenizer loop: learn merges → apply
    them → pack training sequences on the true counts.

    Physical shape: the encode pass is one narrow corpus scan (see
    ``bpe_encode_counts``); packing is the same metadata-only
    applyInPandas per shard. The only shuffle is the shard groupBy of
    16-byte metadata rows."""
    import pandas as pd

    from pyspark.sql import functions as F

    meta = bpe_encode_counts(spark, docs, n_words, steps).select(
        "doc_id",
        (F.col("doc_id") % n_shards).alias("shard"),
        F.col("n_bpe").cast("int").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        packs = []
        acc = 0
        pid = -1
        for tok in pdf["n_tokens"]:
            if pid >= 0 and acc + tok <= capacity:
                acc += tok
            else:
                pid += 1
                acc = tok
            packs.append(pid)
        pdf["pack_id"] = packs
        return pdf[["doc_id", "shard", "pack_id", "n_tokens"]]

    return meta.groupBy("shard").applyInPandas(
        lambda _, pdf: pack(pdf),
        "doc_id long, shard long, pack_id long, n_tokens int",
    )


def pack_sequences_bpe_oracle_sql(
    capacity: int = PACK_CAPACITY,
    n_shards: int = PACK_SHARDS,
    n_words: int = BPE_VOCAB_N,
    steps: int = BPE_STEPS,
) -> str:
    """The recursive packer CTE over the bpe_encode oracle's counts —
    merge derivation, encode, and greedy packing all re-stated in one
    engine-portable statement.

    ``t`` is MATERIALIZED (Postgres-style CTE hint, DuckDB honors
    it): without it the recursive packer join re-evaluates the whole
    BPE encode (corpus × words × K merge replaces) once per recursion
    depth — ~6,250 re-encodes of 50k docs at sf1, which is why the
    round-7 sweep recorded this oracle as sf1-bound (>10 min). With
    the counts pinned once, sf1 finishes in ~19 s measured."""
    enc = bpe_encode_oracle_sql(n_words, steps)
    return f"""
WITH RECURSIVE t AS MATERIALIZED (
  SELECT doc_id, doc_id % {n_shards} AS shard,
         CAST(n_bpe AS INT) AS n_tokens,
         row_number() OVER (PARTITION BY doc_id % {n_shards} ORDER BY doc_id) AS rn
  FROM ({enc}) enc
), r AS (
  SELECT shard, rn, doc_id, n_tokens,
         n_tokens AS acc, CAST(0 AS BIGINT) AS pack_id
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.shard, t.rn, t.doc_id, t.n_tokens,
         CASE WHEN r.acc + t.n_tokens <= {capacity}
              THEN r.acc + t.n_tokens ELSE t.n_tokens END,
         CASE WHEN r.acc + t.n_tokens <= {capacity}
              THEN r.pack_id ELSE r.pack_id + 1 END
  FROM r JOIN t ON t.shard = r.shard AND t.rn = r.rn + 1
)
SELECT doc_id, shard, pack_id, n_tokens FROM r
"""


# ------------------------------------------------------ URL normalization
# The crawl-pipeline verb between WARC ingestion and URL-level dedup:
# two crawls of the same page differ by scheme/host case, an explicit
# default port, query-parameter order, and a fragment — none of which
# change the resource. Canonicalization rules (RFC 3986 §6.2.2-6.2.3
# syntax-based + the standard crawler extensions):
#   scheme and host lowercased; default port stripped (http:80,
#   https:443; others kept); fragment dropped; query parameters
#   sorted bytewise (ampersand-split); path and query VALUES kept
#   case-intact (they are case-sensitive per the RFC).
# Pure JVM string expressions — runs at scan speed, zero shuffles —
# with the DuckDB oracle restating the identical rules.


# host: optional userinfo stripped, bracketed IPv6 literals kept
# whole; port: trailing :digits of the authority only (so userinfo
# colons and IPv6 colons never masquerade as ports); query: the '?'
# must precede any '#' (a '?' inside the fragment is fragment text)
_URL_HOST_RE = r"^(?:[^@]*@)?(\[[^\]]*\]|[^:]*)"
_URL_PORT_RE = r":([0-9]+)$"
_URL_QUERY_RE = r"^[^#]*?[?]([^#]*)"


def _url_parts(col: str, esc) -> tuple[str, str, str, str, str, str]:
    """Engine-shared regex pulls: (scheme, authority, host, port,
    path, query). ``esc`` is the engine's string-literal escaper
    (_spark_re / _duck_re) — the PATTERNS are identical, so both
    engines run the same extraction rules by construction."""
    scheme = f"lower(regexp_extract({col}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    auth = f"regexp_extract({col}, '^[^:]+://([^/?#]*)', 1)"
    host = f"lower(regexp_extract({auth}, '{esc(_URL_HOST_RE)}', 1))"
    port = f"regexp_extract({auth}, '{esc(_URL_PORT_RE)}', 1)"
    path = f"regexp_extract({col}, '^[^:]+://[^/?#]*([^?#]*)', 1)"
    q = f"regexp_extract({col}, '{esc(_URL_QUERY_RE)}', 1)"
    return scheme, auth, host, port, path, q


def _url_norm_expr(col: str, esc, qsorted) -> str:
    """Shared normalization skeleton; ``qsorted`` supplies the engine
    spelling of the sorted query (the one piece regex can't do)."""
    scheme, _auth, host, port, path, q = _url_parts(col, esc)
    norm_port = (
        f"CASE WHEN {port} = '' THEN '' "
        f"WHEN {scheme} = 'http' AND {port} = '80' THEN '' "
        f"WHEN {scheme} = 'https' AND {port} = '443' THEN '' "
        f"ELSE concat(':', {port}) END"
    )
    norm_q = f"CASE WHEN {q} = '' THEN '' ELSE concat('?', {qsorted(q)}) END"
    return f"concat({scheme}, '://', {host}, {norm_port}, {path}, {norm_q})"


def spark_url_host(col: str) -> str:
    """The ONE Spark spelling of URL→host (userinfo stripped, IPv6
    brackets kept) — shared by url_normalize, robots_filter, and the
    link-graph queries so the rules cannot drift apart."""
    return _url_parts(col, _spark_re)[2]


def url_normalize(urls: DataFrame, col: str = "url") -> DataFrame:
    """(..., url_norm, host): append the canonical URL and its
    lowercased host. One narrow projection — no Python, no shuffle."""
    qsorted = lambda q: f"array_join(array_sort(split({q}, '&')), '&')"  # noqa: E731
    return urls.withColumn(
        "url_norm", F.expr(_url_norm_expr(col, _spark_re, qsorted))
    ).withColumn("host", F.expr(spark_url_host(col)))


def url_norm_oracle_exprs(col: str) -> tuple[str, str]:
    """(url_norm, host) as DuckDB SQL — the same extraction patterns
    verbatim (DuckDB literals are escape-free), DuckDB spellings only
    for the list sort."""
    qsorted = lambda q: f"array_to_string(list_sort(string_split({q}, '&')), '&')"  # noqa: E731
    return (
        _url_norm_expr(col, _duck_re, qsorted),
        _url_parts(col, _duck_re)[2],
    )


# ------------------------------------------------ boilerplate line removal
# The C4/CCNet preprocessing step this family still lacked: lines that
# recur across many documents (navigation, cookie banners, footers)
# are template boilerplate, not content — C4 drops lines seen >= 3
# times in the corpus (Raffel et al. 2020 §2.2, public method). The
# operator is corpus-global: a line's document frequency decides its
# fate everywhere at once.


def remove_boilerplate_lines(
    docs: DataFrame, min_docs: int = 50, col: str = "text"
) -> DataFrame:
    """(doc_id, clean_text, n_kept, n_dropped): drop every line that
    occurs in >= ``min_docs`` DISTINCT documents, preserving the
    surviving lines' original order.

    Physical shape: one explode → one (line, doc) distinct-count
    aggregation (map-side combine absorbs the within-doc repeats) →
    LEFT ANTI join of the line rows against the boilerplate set —
    at crawl scale the boilerplate set is the long tail's head and
    too big to broadcast, so the anti-join shuffles on the line
    hash; AQE broadcast-converts when it is small. Reassembly is a
    per-doc collect_list + array_sort on the carried position — the
    only per-doc state is the doc's own lines. Documents whose every
    line was boilerplate surface with empty clean_text via the
    right-side join back to the doc list."""
    lines = _doc_lines(docs, col)
    boiler = (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("nd"))
        # blank lines are document STRUCTURE (paragraph breaks), not
        # template content — never boilerplate candidates
        .filter((F.col("nd") >= min_docs) & (F.col("line") != ""))
        .select("line")
    )
    return _strip_lines(docs, lines, boiler, col)


def _doc_lines(docs: DataFrame, col: str) -> DataFrame:
    return docs.select(
        "doc_id", F.posexplode(F.split(F.col(col), "\n")).alias("pos", "line")
    )


def _strip_lines(
    docs: DataFrame, lines: DataFrame, boiler: DataFrame, col: str
) -> DataFrame:
    """Shared tail of the boilerplate family: ANTI join the line rows
    against the boilerplate set, order-preserving per-doc reassembly,
    empty-survivor documents surfaced via the doc-list join back."""
    kept = lines.join(boiler, "line", "left_anti")
    reassembled = kept.groupBy("doc_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, line))),"
            " x -> x.line), '\\n')"
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    totals = docs.select(
        "doc_id",
        F.expr(f"size(split({col}, '\\n'))").alias("n_lines"),
    )
    return totals.join(reassembled, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
        .cast("long")
        .alias("n_dropped"),
    )


def write_line_frequency_index(
    docs: DataFrame, path: str, mode: str = "append", col: str = "text"
) -> None:
    """Persist a batch's per-line distinct-document counts as the
    cross-run boilerplate index: (line, nd) — the line-frequency
    sibling of dedup.write_fingerprint_index. Distinct-doc counts
    over DISJOINT batches (fresh doc_ids per batch, the same
    contract the dedup index assumes) are additive, so the index is
    mergeable by a plain SUM at probe time; ``mode="append"`` makes
    maintenance one cheap aggregated write per batch."""
    nd = (
        _doc_lines(docs, col)
        .groupBy("line")
        .agg(F.countDistinct("doc_id").alias("nd"))
    )
    nd.repartition("line").write.mode(mode).parquet(path)


def incremental_boilerplate_lines(
    spark,
    batch_docs: DataFrame,
    index_path: str,
    min_docs: int = 50,
    col: str = "text",
    update_index: bool = True,
) -> DataFrame:
    """Clean a NEW batch against corpus-global line frequencies
    without re-reading indexed text: a line is boilerplate when its
    batch count PLUS the index's summed count reaches ``min_docs``.
    Incremental stance matches extend_training_corpus: already-packed
    documents are never re-opened, so a line that crosses the
    threshold only as of this batch is stripped from this batch
    onward (the one-shot union run would also have stripped it from
    earlier docs — the standard trade-off, documented not hidden).
    The batch's own counts are appended to the index afterwards,
    keeping the invariant for the next batch.

    Probe cost: batch lines + one aggregated index scan of (line,
    nd) rows — the indexed corpus's TEXT is never touched."""
    lines = _doc_lines(batch_docs, col)
    batch_nd = lines.groupBy("line").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    idx_nd = (
        spark.read.parquet(index_path)
        .groupBy("line")
        .agg(F.sum("nd").alias("nd"))
    )
    total = (
        batch_nd.unionByName(idx_nd)
        .groupBy("line")
        .agg(F.sum("nd").alias("nd_total"))
    )
    # PIN the boilerplate set before touching the index: the output
    # plan reads index_path lazily, and appending first would double-
    # count this batch when the caller finally acts on the result
    boiler = (
        total.filter(
            (F.col("nd_total") >= min_docs) & (F.col("line") != "")
        )
        .select("line")
        .localCheckpoint()
    )
    out = _strip_lines(batch_docs, lines, boiler, col)
    if update_index:
        # write the ALREADY-AGGREGATED batch counts (recomputing them
        # from the text would double the probe's dominant scan cost)
        batch_nd.repartition("line").write.mode("append").parquet(index_path)
    return out


def boilerplate_oracle_sql(min_docs: int = 50, source_sql: str = "documents") -> str:
    """DuckDB twin over the same (doc_id, text) source: split with
    ordinality, document-frequency gate, order-preserving
    reassembly."""
    return f"""
WITH src AS (SELECT doc_id, text FROM ({source_sql})),
lines AS (
  SELECT doc_id, g.i AS pos, parts[g.i + 1] AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM src),
       UNNEST(generate_series(0, len(parts) - 1)) AS g(i)
),
boiler AS (
  SELECT line FROM lines WHERE line <> '' GROUP BY line
  HAVING count(DISTINCT doc_id) >= {min_docs}
),
kept AS (
  SELECT l.* FROM lines l ANTI JOIN boiler b ON l.line = b.line
),
re AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, len(string_split(text, chr(10))) AS n_lines FROM src)
SELECT t.doc_id, coalesce(r.clean_text, '') AS clean_text,
  CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
  CAST(t.n_lines - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped
FROM tot t LEFT JOIN re r ON t.doc_id = r.doc_id
"""


# ---------------------------------------------------------- robots filter
# Crawl-frontier URL filtering per the Robots Exclusion Protocol
# (RFC 9309 §2.2.2): among all rules whose path is a prefix of the
# URL's path, the LONGEST match decides; on equal length the less
# restrictive (Allow) rule wins; no match means allowed. The
# verdict encodes as one integer per candidate — priority =
# 2*len(rule_path) + is_allow — so the argmax is a plain MAX and
# the allow bit is its parity: no window, no struct ordering, one
# equi-join on host + one aggregation.


def _rule_pattern_expr(rule: str, esc) -> str:
    """SQL expression turning a robots rule path into an anchored
    regex implementing RFC 9309 §2.2.3's two special characters:
    '*' matches any octet run, a trailing '$' anchors the end;
    everything else is literal (regex metacharacters escaped, the
    chain identical in both engines since replace() is). A mid-rule
    '$' is literal per the RFC."""
    anchored = f"right({rule}, 1) = '$'"
    base = (
        f"CASE WHEN {anchored} "
        f"THEN substr({rule}, 1, length({rule}) - 1) ELSE {rule} END"
    )
    e = base
    pairs = [
        ("\\", "\\\\"), (".", "\\."), ("+", "\\+"), ("?", "\\?"),
        ("(", "\\("), (")", "\\)"), ("[", "\\["), ("]", "\\]"),
        ("{", "\\{"), ("}", "\\}"), ("|", "\\|"), ("^", "\\^"),
        ("$", "\\$"),
    ]
    for a, b in pairs:
        e = f"replace({e}, '{esc(a)}', '{esc(b)}')"
    e = f"replace({e}, '*', '.*')"
    return (
        f"concat('^', {e}, "
        f"CASE WHEN {anchored} THEN '$' ELSE '' END)"
    )


def robots_filter(urls: DataFrame, rules: DataFrame) -> DataFrame:
    """(doc_id, url, allowed): apply robots rules to URLs.

    ``urls``: (doc_id, url); ``rules``: (host, rule_path, is_allow).
    Rule paths honor RFC 9309 §2.2.3's special characters: '*'
    wildcards and a trailing '$' end-anchor (compiled to anchored
    regexes identically on both engines); plain paths behave as
    prefixes exactly as before. Most-specific match = longest RULE
    TEXT (the Googlebot convention — wildcards count), Allow beats
    Disallow on ties. The rules side is per-host and small relative
    to the frontier — broadcast it (AQE does when sizes allow; at
    planet scale it is still only hosts x rules). Matching shuffles
    nothing on the URL side beyond the host join."""
    u = urls.selectExpr(
        "doc_id",
        "url",
        f"{spark_url_host('url')} AS host",
        "regexp_extract(url, '^[^:]+://[^/?#]*([^?#]*)', 1) AS path",
    )
    pattern = _rule_pattern_expr("rule_path", _spark_re)
    cand = (
        u.join(rules.filter(F.col("rule_path") != ""), "host")
        .filter(F.expr(f"path rlike {pattern}"))
        .groupBy("doc_id", "url")
        .agg(
            F.max(
                F.expr(
                    "2 * length(rule_path) + CAST(is_allow AS INT)"
                )
            ).alias("pri")
        )
    )
    return u.join(cand, ["doc_id", "url"], "left").select(
        "doc_id",
        "url",
        F.coalesce(F.expr("pri % 2 = 1"), F.lit(True)).alias("allowed"),
    )


def robots_oracle_sql(urls_sql: str, rules_sql: str) -> str:
    """DuckDB twin over the same (doc_id, url) and (host, rule_path,
    is_allow) sources — identical priority encoding."""
    return f"""
WITH u AS (
  SELECT doc_id, url,
    {_url_parts('url', _duck_re)[2]} AS host,
    regexp_extract(url, '^[^:]+://[^/?#]*([^?#]*)', 1) AS path
  FROM ({urls_sql})
),
r AS (SELECT * FROM ({rules_sql}) WHERE rule_path <> ''),
cand AS (
  SELECT u.doc_id, u.url,
    max(2 * length(r.rule_path) + CAST(r.is_allow AS INT)) AS pri
  FROM u JOIN r ON u.host = r.host
  WHERE regexp_matches(u.path, {_rule_pattern_expr('r.rule_path', _duck_re)})
  GROUP BY u.doc_id, u.url
)
SELECT u.doc_id, u.url,
  coalesce(c.pri % 2 = 1, TRUE) AS allowed
FROM u LEFT JOIN cand c ON u.doc_id = c.doc_id AND u.url = c.url
"""


# -------------------------------------------------------- robots.txt parse
# The missing half of robots_filter: real crawls fetch robots.txt
# BODIES, not rule frames. Parsing is per-host (robots.txt is capped
# at 500 KiB by RFC 9309 §2.4) so the work is bounded per row; the
# frame of parsed rules is exactly what robots_filter consumes.


def parse_robots_txt(txt: str, agent: str = "*") -> list[tuple[str, bool]]:
    """RFC 9309 §2.2.1 group selection + rule extraction for one
    product token: groups open with consecutive User-agent lines;
    the crawler obeys the group(s) naming its token (case-
    insensitive exact match), falling back to the ``*`` group(s)
    only when no named group exists. Comments (#) stripped, empty
    Disallow means no rule (allow-all), unknown directives ignored
    (sitemap etc.), rules from multiple matching groups combine.
    Returns [(rule_path, is_allow), ...]."""
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_agents = True
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agents:  # a new group begins
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_agents = True
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_agents = False
            if value:  # empty Disallow/Allow carries no rule
                cur_rules.append((value, field == "allow"))
        # other fields (sitemap, crawl-delay, ...) are non-normative
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    named = [r for agents, rules in groups if agent in agents for r in rules]
    if any(agent in agents for agents, _ in groups):
        return named
    return [r for agents, rules in groups if "*" in agents for r in rules]


def parse_robots(
    robots: DataFrame, agent: str = "*"
) -> DataFrame:
    """(host, rule_path, is_allow): parse a frame of fetched
    robots.txt bodies — (host, robots_txt) — into the rules frame
    ``robots_filter`` consumes. One mapInPandas pass; per-row work
    bounded by the RFC's 500 KiB file cap, output rows bounded by
    rule counts (hosts x rules — the broadcastable side)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("host", T.StringType(), False),
            T.StructField("rule_path", T.StringType(), False),
            T.StructField("is_allow", T.BooleanType(), False),
        ]
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"host": [], "rule_path": [], "is_allow": []}
            for host, txt in zip(pdf["host"], pdf["robots_txt"]):
                for path, allow in parse_robots_txt(str(txt), agent):
                    rows["host"].append(host)
                    rows["rule_path"].append(path)
                    rows["is_allow"].append(allow)
            yield pd.DataFrame(rows)

    return robots.select("host", "robots_txt").mapInPandas(
        _parse, schema=schema
    )


# ----------------------------------------------------- n-gram language ID
# The brief's language-ID verb names the N-GRAM heuristic specifically
# (Cavnar & Trenkle 1994, the public method): character-trigram
# profiles per language, documents classified by profile overlap.
# Profiles train IN-QUERY from the corpus's declared labels — the
# self-contained form whose DuckDB twin restates training AND
# classification. lang_id (stopword lexicons) stays as the cheap
# zero-shuffle sibling.
NGRAM_LANG_K = 40
_LANG_TIE = ("en", "es", "fr", "de", "zh")


def _lang_code_case(col: str = "lang") -> str:
    cases = " ".join(
        f"WHEN '{lg}' THEN {len(_LANG_TIE) - i}"
        for i, lg in enumerate(_LANG_TIE)
    )
    return f"CASE {col} {cases} ELSE 0 END"


def _lang_argmax_key(cnt: str, lang: str) -> str:
    """Total-order tie-break key (ASC = winner): highest count, then
    highest precedence code, then lexicographically smallest language
    — the string tail makes the order TOTAL for any label set, not
    just the precedence list (review finding: two unlisted languages
    with equal counts were a nondeterministic max_by coin flip)."""
    score = f"({cnt} * 8 + {_lang_code_case(lang)})"
    return (
        f"concat(lpad(cast(1000000000 - {score} AS string), 12, '0'), "
        f"{lang})"
    )


def lang_id_ngram(docs: DataFrame, k: int = NGRAM_LANG_K) -> DataFrame:
    """(doc_id, lang_pred): classify by overlap with per-language
    top-``k`` character-trigram profiles trained from the corpus's
    declared labels. Scoring is the integer hit count (membership in
    the profile set), argmax tie-broken by the fixed language
    precedence via one integer encode (cnt * 8 + code) under max_by —
    no window over docs. Physical shape: one trigram explode feeds
    BOTH training (per-lang counts → per-lang rank cut; the profile
    table is |langs| x k rows — broadcast) and classification (hits
    join + per-doc aggregate); docs with zero profile hits surface as
    'unknown' via the doc-list left join."""
    from pyspark.sql import Window as W

    tri_expr = (
        "CASE WHEN length(text) < 3 THEN array() "
        "ELSE transform(sequence(1, length(text) - 2), "
        "i -> substring(text, i, 3)) END"
    )
    # r16 pinned the EXPLODED trigram stream (localCheckpoint) so the
    # profile build and the hits join shared one evaluation — but that
    # spills ~|text| rows (several x corpus size) to executor storage
    # at scale, and Spark's size estimate of the checkpointed RDD then
    # broadcast the DOC side of the hits join (build-left on the
    # corpus stream — an OOM at 100 TB). r17 inverts it: the profile
    # aggregates per (lang, tri) BEFORE anything is retained — its
    # pre-cut size is bounded by |langs| x |distinct trigrams| (a
    # vocabulary, not the corpus), the post-cut profile is |langs| x k
    # rows — and broadcasts into the hits join in the scale-safe
    # direction. The trigram explode re-derives from the scan on the
    # hits side (one extra text read; nothing corpus-sized is ever
    # pinned or broadcast). Spread the narrow working projection when
    # the scan under-splits — the explode + agg map work is the CPU.
    d = spread(docs.select("doc_id", "lang", "text"))
    prof = (
        d.select("lang", F.explode(F.expr(tri_expr)).alias("tri"))
        .groupBy("lang", "tri")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("lang").orderBy(F.desc("c"), F.asc("tri"))
            ),
        )
        .filter(F.col("rk") <= k)
        .select(F.col("lang").alias("plang"), "tri")
    )
    hits = (
        d.select("doc_id", F.explode(F.expr(tri_expr)).alias("tri"))
        .join(F.broadcast(prof), "tri")
        .groupBy("doc_id", "plang")
        .agg(F.count("*").alias("cnt"))
    )
    pred = hits.groupBy("doc_id").agg(
        F.expr(
            f"min_by(plang, {_lang_argmax_key('cnt', 'plang')})"
        ).alias("lang_pred")
    )
    return docs.select("doc_id").join(pred, "doc_id", "left").select(
        "doc_id", F.coalesce("lang_pred", F.lit("unknown")).alias("lang_pred")
    )


def lang_id_ngram_oracle_sql(
    k: int = NGRAM_LANG_K, source_sql: str = "documents"
) -> str:
    """``source_sql`` lets a fixture CTE stand in for the documents
    table (same pattern as the URL fixture queries)."""
    return f"""
WITH src AS (SELECT * FROM ({source_sql})),
tri AS (
  SELECT doc_id, lang, substr(text, g.i, 3) AS tri
  FROM src,
       UNNEST(generate_series(1, greatest(length(text) - 2, 0))) AS g(i)
),
cnts AS (
  SELECT lang, tri, count(*) AS c FROM tri GROUP BY lang, tri
),
prof AS (
  SELECT lang AS plang, tri FROM (
    SELECT lang, tri,
      row_number() OVER (PARTITION BY lang ORDER BY c DESC, tri) AS rk
    FROM cnts) WHERE rk <= {k}
),
hits AS (
  SELECT t.doc_id, p.plang, count(*) AS cnt
  FROM tri t JOIN prof p ON t.tri = p.tri
  GROUP BY t.doc_id, p.plang
),
pred AS (
  SELECT doc_id,
    arg_min(plang, {_lang_argmax_key('cnt', 'plang').replace("AS string", "AS VARCHAR")}) AS lang_pred
  FROM hits GROUP BY doc_id
)
SELECT d.doc_id, coalesce(p.lang_pred, 'unknown') AS lang_pred
FROM src d LEFT JOIN pred p USING (doc_id)
"""


# ------------------------------------------------------ NFC normalization
def nfc_normalize_docs(docs):
    """(doc_id, raw_text, nfc_text): Unicode NFC normalization — the
    canonicalization pass that belongs BEFORE hashing, dedup, and
    tokenization in a text pipeline (the same visible string can
    arrive precomposed, decomposed, or with non-canonically ordered
    combining marks, and every downstream fingerprint would treat
    them as different documents).

    No JVM builtin exists for Unicode normalization, so this is a
    legitimate Python surface: one Arrow-batched ``mapInPandas``
    pass over ``unicodedata.normalize`` (CPython's implementation of
    UAX #15), raw text passed through so the changed/length columns
    compute JVM-side afterwards with no re-join. The DuckDB oracle
    runs utf8proc's ``nfc_normalize`` — two independent
    implementations of the same algorithm, agreement checked across
    composition, canonical reordering, singleton (ANGSTROM), and
    Hangul-jamo shapes in tests/test_textops.py."""
    import unicodedata

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("raw_text", T.StringType(), True),
            T.StructField("nfc_text", T.StringType(), True),
        ]
    )

    def _norm(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "raw_text": pdf["text"],
                    "nfc_text": [
                        None
                        if t is None
                        else unicodedata.normalize("NFC", t)
                        for t in pdf["text"]
                    ],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(_norm, schema)


# ------------------------------------------------------- WordPiece
WP_VOCAB_N = 16       # multi-char pieces in the learned vocabulary
WP_PIECE_LENS = (2, 3, 4)
WP_MAX_WORD = 16      # fold unroll bound — production sets this to the
                      # tokenizer's max-chars-per-word (HF uses 100). A
                      # word longer than this FAILS LOUDLY in the fold's
                      # terminal lambda (raise_error) instead of being
                      # silently undercounted; tests pin both the loud
                      # path and that the test corpus stays under it.


def wordpiece_vocab(spark, docs: DataFrame, n: int = WP_VOCAB_N) -> DataFrame:
    """(piece, tf): the top-``n`` multi-character substrings (lengths
    2..4) of corpus words by TOTAL frequency (word frequency summed
    over every occurrence position), deterministic tie-break on the
    piece itself — the greedy-subword vocabulary WordPiece-style
    tokenizers select before encoding. All single characters are
    implicitly in the vocabulary (the encoder's ELSE-advance-1), so
    segmentation is total without an explicit char list."""
    toks = f"filter({spark_tokens('text')}, w -> w <> '')"
    wf = (
        docs.select(F.explode(F.expr(toks)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    cand = (
        wf.select(
            "w", "f", F.explode(F.lit(list(WP_PIECE_LENS))).alias("l")
        )
        # guard BEFORE sequence(): Spark's sequence(1, 0) is the
        # DESCENDING [1, 0], not empty (DuckDB's generate_series(1, 0)
        # is empty) — short words would leak truncated pieces
        .filter(F.expr("length(w) >= l"))
        .select(
            "w", "f", "l",
            F.explode(F.expr("sequence(1, length(w) - l + 1)")).alias("p"),
        )
        .select(F.expr("substring(w, p, l)").alias("piece"), "f")
        .groupBy("piece")
        .agg(F.sum("f").alias("tf"))
    )
    return cand.orderBy(F.col("tf").desc(), F.col("piece").asc()).limit(n)


def wordpiece_encode_counts(
    spark, docs: DataFrame, n: int = WP_VOCAB_N
) -> DataFrame:
    """(doc_id, n_words, n_wordpiece): greedy longest-match-first
    subword encoding — the WordPiece/BERT-family apply pass next to
    ``bpe_encode_counts``'s merge-replay: at each cursor position take
    the LONGEST vocabulary piece that matches (4 > 3 > 2), else emit
    one single-character token and advance 1.

    Physical shape mirrors bpe_encode_counts: vocabulary learning is
    a few tiny jobs ending in a TakeOrderedAndProject top-n; the
    n-row vocab collects to the driver (bounded by construction) and
    unrolls into literal IN-lists inside ONE codegen'd fold —
    `aggregate(sequence(1, WP_MAX_WORD), (pos, cnt), ...)` advances
    the cursor by the matched length per step — nested inside the
    per-document aggregate over the token array. The encode pass is
    one narrow corpus scan, zero shuffles, no token explode."""
    pieces = [r["piece"] for r in wordpiece_vocab(spark, docs, n).collect()]
    fold = _wp_word_count_expr(pieces)
    toks = f"filter({spark_tokens('text')}, w -> w <> '')"
    # fold CPU runs in the scan's partitions: spread when under-split
    d = spread(docs.select("doc_id", "text"))
    return d.select(
        "doc_id",
        F.expr(f"CAST(size({toks}) AS BIGINT)").alias("n_words"),
        F.expr(
            f"aggregate({toks}, CAST(0 AS BIGINT), (a, w) -> a + {fold})"
        ).alias("n_wordpiece"),
    )


def _wp_word_count_expr(pieces: list[str]) -> str:
    """Per-word WordPiece token count as one cursor-fold expression
    over ``w`` (shared by wordpiece_encode_counts and the single-scan
    tokenizer_counts)."""
    branches = []
    for length in sorted(WP_PIECE_LENS, reverse=True):
        of_len = sorted(p for p in pieces if len(p) == length)
        if of_len:
            in_list = ", ".join(f"'{p}'" for p in of_len)
            branches.append(
                f"WHEN substring(w, acc.p, {length}) IN ({in_list}) "
                f"THEN {length}"
            )
    step = "CASE " + " ".join(branches) + " ELSE 1 END" if branches else "1"
    return (
        f"aggregate(sequence(1, {WP_MAX_WORD}), "
        "named_struct('p', 1, 'c', CAST(0 AS BIGINT)), "
        "(acc, i) -> IF(acc.p > length(w), acc, "
        f"named_struct('p', acc.p + ({step}), 'c', acc.c + CAST(1 AS BIGINT))), "
        # terminal lambda: a cursor still inside the word after
        # WP_MAX_WORD steps means the word is longer than the unroll
        # bound — fail loudly rather than silently undercount (the
        # DuckDB oracle's recursive CTE counts the full word, so a
        # silent truncation here would be a parity divergence that
        # only surfaces on data with a long word).
        "acc -> IF(acc.p > length(w), acc.c, "
        "CAST(raise_error(concat('wordpiece_encode: word exceeds "
        f"WP_MAX_WORD={WP_MAX_WORD} chars: ', w)) AS BIGINT)))"
    )


def wordpiece_encode_oracle_sql(n: int = WP_VOCAB_N) -> str:
    """DuckDB twin: derives the identical vocabulary (same frequency
    definition, same (tf DESC, piece) order), then encodes every
    DISTINCT word with a recursive cursor CTE whose per-step advance
    is the max matching piece length (greedy longest-match), and
    joins the per-word counts back onto the corpus tokens. Words
    terminate at pos > length(word), so each contributes exactly one
    terminal row; empty documents surface (0, 0) via the LEFT JOIN
    exactly as the Spark fold does."""
    lens = ", ".join(str(x) for x in WP_PIECE_LENS)
    return f"""
WITH RECURSIVE wrds AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest({duck_tokens("text")}) AS w FROM documents)
  WHERE w <> ''
), wf AS (
  SELECT w, count(*) AS f FROM wrds GROUP BY w
), cand AS (
  SELECT substring(wf.w, p.p, l.l) AS piece, CAST(sum(wf.f) AS BIGINT) AS tf
  FROM wf, (SELECT unnest([{lens}]) AS l) l,
       UNNEST(generate_series(1, length(wf.w) - l.l + 1)) AS p(p)
  GROUP BY 1
), v AS (
  SELECT piece FROM cand ORDER BY tf DESC, piece LIMIT {n}
), step AS (
  SELECT w, 1 AS pos, CAST(0 AS BIGINT) AS cnt FROM wf
  UNION ALL
  SELECT w,
    pos + coalesce((SELECT max(length(v.piece)) FROM v
                    WHERE v.piece = substring(step.w, step.pos,
                                              length(v.piece))), 1),
    cnt + 1
  FROM step WHERE pos <= length(w)
), wcnt AS (
  SELECT w, cnt FROM step WHERE pos > length(w)
), agg AS (
  SELECT wrds.doc_id, count(*) AS n_words,
         CAST(sum(wcnt.cnt) AS BIGINT) AS n_wordpiece
  FROM wrds JOIN wcnt ON wrds.w = wcnt.w GROUP BY wrds.doc_id
)
SELECT d.doc_id,
  coalesce(a.n_words, 0) AS n_words,
  coalesce(a.n_wordpiece, 0) AS n_wordpiece
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


# ---------------------------------------------------- Unigram LM
# The third production tokenizer class next to BPE (merge replay) and
# WordPiece (greedy longest-match): SentencePiece-style unigram, here
# in its deterministic hard-EM (Viterbi-EM) form so every quantity is
# an INTEGER and both engines agree bit-for-bit. Seed vocabulary =
# substring frequencies over the bounded word vocabulary; each EM
# round Viterbi-segments the word vocabulary under the current scores
# (objective: fewest pieces, then highest total score — the integer
# lexicographic stand-in for max sum-log-p that keeps the DP exact
# cross-engine) and re-estimates every piece's score as its usage
# count. Single-character pieces are never pruned (SentencePiece
# keeps the character set for the same totality reason); characters
# unseen at training encode as score-0 singles (the UNK convention).
UNI_VOCAB_WORDS = 150   # word vocabulary the EM trains over (BPE's cut)
UNI_PIECES_N = 24       # multi-char seed pieces kept (lengths 2..4)
UNI_EM_STEPS = 2        # hard-EM re-estimation rounds
UNI_MAX_WORD = 16       # DP unroll bound; longer words FAIL LOUDLY
UNI_PIECE_LENS = (1, 2, 3, 4)


def _uni_viterbi(word: str, scores: dict[str, int]):
    """(n_tokens, total_score, 'p1 p2 ... ') — the exact mirror of the
    unrolled SQL DP: candidates are the <=4 suffix pieces at each
    position (multi-char only if in the vocabulary; single char always,
    score 0 when unknown), best by (tokens ASC, score DESC, len DESC).
    One candidate per length, so the argmin is unique."""
    n = len(word)
    dp = [(0, 0, "")]
    for i in range(1, n + 1):
        cands = []
        for ln in UNI_PIECE_LENS:
            if ln > i:
                continue
            piece = word[i - ln:i]
            sc = scores.get(piece)
            if sc is None:
                if ln != 1:
                    continue
                sc = 0
            t0, s0, seg0 = dp[i - ln]
            cands.append((t0 + 1, -(s0 + sc), -ln, seg0 + piece + " "))
        t, ns, _, seg = min(cands)
        dp.append((t, -ns, seg))
    return dp[n]


def unigram_train(spark, docs: DataFrame, vocab_rows=None) -> dict[str, int]:
    """piece -> integer score, the trained unigram-LM vocabulary.

    Physical shape (the bpe_merge_table pattern): ONE distributed
    corpus scan builds the weighted word vocabulary — the only
    data-scale-dependent stage, a token count with map-side combine at
    100 TB — cut to the top UNI_VOCAB_WORDS by (count DESC, word ASC).
    The cut is bounded by a PARAMETER, so the EM iterations run
    driver-local on the collected rows exactly like real SentencePiece
    trainers iterate in memory over their (suffix-array-derived) seed.
    All arithmetic is integer: seed scores are substring frequencies,
    EM re-scores are Viterbi usage counts."""
    if vocab_rows is None:
        vocab_rows = collect_word_vocab(docs, UNI_VOCAB_WORDS)
    vocab = [(r["w"], int(r["cnt"])) for r in vocab_rows]
    for w, _ in vocab:
        if len(w) > UNI_MAX_WORD:
            raise ValueError(
                f"unigram_train: vocabulary word exceeds "
                f"UNI_MAX_WORD={UNI_MAX_WORD} chars: {w!r}"
            )
    seed1: dict[str, int] = {}
    seedm: dict[str, int] = {}
    for word, cnt in vocab:
        for ln in UNI_PIECE_LENS:
            tgt = seed1 if ln == 1 else seedm
            for p in range(len(word) - ln + 1):
                piece = word[p:p + ln]
                tgt[piece] = tgt.get(piece, 0) + cnt
    top_m = sorted(seedm.items(), key=lambda kv: (-kv[1], kv[0]))
    scores = dict(seed1)
    scores.update(dict(top_m[:UNI_PIECES_N]))
    chars = set(seed1)
    for _ in range(UNI_EM_STEPS):
        usage: dict[str, int] = {}
        for word, cnt in vocab:
            _, _, seg = _uni_viterbi(word, scores)
            for piece in seg.split():
                usage[piece] = usage.get(piece, 0) + cnt
        scores = {c: usage.get(c, 0) for c in chars}
        for piece, u in usage.items():
            if len(piece) > 1:
                scores[piece] = u
    return scores


def unigram_vocab(spark, docs: DataFrame) -> DataFrame:
    """(piece, score): the trained unigram vocabulary as a DataFrame
    (bounded by parameters: <= |charset| + UNI_PIECES_N rows)."""
    scores = unigram_train(spark, docs)
    return spark.createDataFrame(
        sorted(scores.items()), "piece string, score bigint"
    )


def _uni_score_maps(scores: dict[str, int]) -> dict[int, str]:
    """Per-length literal map expressions (smaller maps = fewer string
    compares per element_at probe in the encode fold)."""
    out = {}
    for ln in UNI_PIECE_LENS:
        items = sorted(
            (p, s) for p, s in scores.items() if len(p) == ln
        )
        if items:
            body = ", ".join(
                f"'{p}', CAST({s} AS BIGINT)" for p, s in items
            )
            out[ln] = f"map({body})"
    return out


def unigram_encode_counts(spark, docs: DataFrame) -> DataFrame:
    """(doc_id, n_words, n_unigram): Viterbi-encode the corpus with
    the trained unigram vocabulary — the apply pass next to
    bpe_encode_counts (merge replay) and wordpiece_encode_counts
    (greedy). At each cursor position the DP considers the <=4
    suffix pieces ending there and keeps the lexicographic best
    (fewest tokens, then highest score, then longest piece).

    Physical shape: training is unigram_train's one corpus scan +
    driver-local EM; the ENCODE pass is ONE narrow corpus scan with
    zero shuffles — the trained scores unroll into literal per-length
    maps inside a single codegen'd DP fold (array-of-structs dp,
    array_min for the argmin, struct comparison is lexicographic),
    nested in the per-document aggregate over the token array. Words
    longer than UNI_MAX_WORD raise from the terminal lambda (the
    wordpiece_encode loud-fail convention)."""
    scores = unigram_train(spark, docs)
    fold = _uni_word_count_expr(scores)
    toks = f"filter({spark_tokens('text')}, w -> w <> '')"
    # fold CPU runs in the scan's partitions: spread when under-split
    d = spread(docs.select("doc_id", "text"))
    return d.select(
        "doc_id",
        F.expr(f"CAST(size({toks}) AS BIGINT)").alias("n_words"),
        F.expr(
            f"aggregate({toks}, CAST(0 AS BIGINT), (a, w) -> a + {fold})"
        ).alias("n_unigram"),
    )


def _uni_word_count_expr(scores: dict[str, int]) -> str:
    """Per-word Unigram-LM Viterbi token count as one DP-fold
    expression over ``w`` (shared by unigram_encode_counts and the
    single-scan tokenizer_counts).

    The accumulator is a FIXED 4-slot lookback window (d1 = dp[i-1]
    .. d4 = dp[i-4]) plus the last executed position — pieces are at
    most 4 chars, so Viterbi never looks further back. The first
    form of this fold carried the whole dp array and concat'd one
    entry per step (an O(len^2) copy per word); the sliding struct
    allocates O(1) per step (unigram_encode_counts measured
    4.0 -> 2.9 s at sf0.1, training included — the encode scan
    itself roughly halves). A slot is NULL exactly while its position is before the
    word start (i < l), so the per-length candidate guard is one
    IS NOT NULL check."""
    maps = _uni_score_maps(scores)
    dp_t = "struct<t: bigint, ns: bigint, nl: int>"

    def cand(ln: int) -> str:
        prev = f"acc.d{ln}"
        piece = f"substring(w, i - {ln - 1}, {ln})"
        if ln == 1:
            sc = (
                f"coalesce(element_at({maps[1]}, {piece}), "
                "CAST(0 AS BIGINT))"
            )
            return (
                f"named_struct('t', {prev}.t + CAST(1 AS BIGINT), "
                f"'ns', {prev}.ns - {sc}, 'nl', -1)"
            )
        if ln not in maps:
            return "NULL"
        m = maps[ln]
        return (
            f"IF({prev} IS NOT NULL "
            f"AND element_at({m}, {piece}) IS NOT NULL, "
            f"named_struct('t', {prev}.t + CAST(1 AS BIGINT), "
            f"'ns', {prev}.ns - element_at({m}, {piece}), 'nl', {-ln}), "
            "NULL)"
        )

    # dp entries are (t, ns=-score, nl=-len): array_min's struct
    # comparison IS the (tokens ASC, score DESC, len DESC) objective;
    # NULL candidates (no piece of that length / before word start)
    # are skipped by array_min.
    step = (
        "array_min(array("
        + ", ".join(cand(ln) for ln in (4, 3, 2, 1))
        + "))"
    )
    zero = (
        "named_struct('t', CAST(0 AS BIGINT), "
        "'ns', CAST(0 AS BIGINT), 'nl', 0)"
    )
    return (
        f"aggregate(sequence(1, {UNI_MAX_WORD}), "
        f"named_struct('d1', {zero}, 'd2', CAST(NULL AS {dp_t}), "
        f"'d3', CAST(NULL AS {dp_t}), 'd4', CAST(NULL AS {dp_t}), "
        "'n', 0), "
        "(acc, i) -> IF(i > length(w), acc, "
        f"named_struct('d1', {step}, 'd2', acc.d1, 'd3', acc.d2, "
        "'d4', acc.d3, 'n', i)), "
        "acc -> IF(acc.n = length(w), acc.d1.t, "
        "CAST(raise_error(concat('unigram_encode: word exceeds "
        f"UNI_MAX_WORD={UNI_MAX_WORD} chars: ', w)) AS BIGINT)))"
    )


def tokenizer_counts(spark, docs: DataFrame) -> DataFrame:
    """(doc_id, n_words, n_bpe, n_wordpiece, n_unigram, n_bpe_bytes):
    all FOUR trained tokenizers applied in ONE corpus scan — the
    encode passes are per-word expression folds over the same token
    array, so they belong in the same projection — round 13 fused the
    first three (one text read instead of three), round 14 adds the
    byte-level BPE fold. Measured NEUTRAL at sf0.1 (per-token fold
    CPU dominates there and the text sits in page cache: bpe 1.4 +
    wp 1.4 + uni 4.0 s separately vs 7.0 s fused), but at 100 TB the
    scan is the I/O-bound term and Nx text reads are real money.
    Training still runs per tokenizer (bounded driver-side work +
    tiny jobs)."""
    vocab_rows = collect_word_vocab(docs)  # ONE scan, three trainers
    merges = sorted(
        bpe_merge_table(spark, docs, vocab_rows=vocab_rows).collect(),
        key=lambda r: r["step"],
    )
    bmerges = sorted(
        bpe_bytes_merge_table(
            spark, docs, vocab_rows=vocab_rows
        ).collect(),
        key=lambda r: r["step"],
    )
    pieces = [r["piece"] for r in wordpiece_vocab(spark, docs).collect()]
    scores = unigram_train(spark, docs, vocab_rows=vocab_rows)
    toks = f"filter({spark_tokens('text')}, w -> w <> '')"
    bpe = _bpe_word_count_expr(merges)
    bpb = _bpe_bytes_word_count_expr(bmerges)
    wp = _wp_word_count_expr(pieces)
    uni = _uni_word_count_expr(scores)
    # the four folds are this query's entire CPU and they run in the
    # scan's own partitions — at bench scale a single task decoded the
    # whole corpus (measured: 4.4 s of the query's 6.6 s). Spread the
    # narrow projection when the scan under-splits (conditional:
    # provable no-op at production split counts)
    docs = spread(docs.select("doc_id", "text"))
    return docs.select(
        "doc_id",
        F.expr(f"CAST(size({toks}) AS BIGINT)").alias("n_words"),
        F.expr(
            f"aggregate({toks}, CAST(0 AS BIGINT), (a, w) -> a + {bpe})"
        ).alias("n_bpe"),
        F.expr(
            f"aggregate({toks}, CAST(0 AS BIGINT), (a, w) -> a + {wp})"
        ).alias("n_wordpiece"),
        F.expr(
            f"aggregate({toks}, CAST(0 AS BIGINT), (a, w) -> a + {uni})"
        ).alias("n_unigram"),
        F.expr(
            f"aggregate({toks}, CAST(0 AS BIGINT), (a, w) -> a + {bpb})"
        ).alias("n_bpe_bytes"),
    )


def _uni_train_blocks() -> list[str]:
    """Shared CTE prefix deriving the trained scores table sc{K} —
    the SQL restatement of unigram_train: same word-vocabulary cut,
    same substring seed, same per-round Viterbi DP (unrolled over
    positions 1..UNI_MAX_WORD) and usage re-scoring."""
    lens = ", ".join(str(x) for x in UNI_PIECE_LENS)
    blocks = [
        "uwc AS (SELECT w AS word, count(*) AS cnt FROM "
        f"(SELECT unnest({duck_tokens('text')}) AS w FROM documents) "
        "WHERE w <> '' GROUP BY 1)",
        "uvocab AS (SELECT word, cnt FROM uwc "
        f"ORDER BY cnt DESC, word LIMIT {UNI_VOCAB_WORDS})",
        "useedpos AS (SELECT substring(word, p.p, l.l) AS piece, l.l, cnt "
        f"FROM uvocab, (SELECT unnest([{lens}]) AS l) l, "
        "UNNEST(generate_series(1, length(word) - l.l + 1)) AS p(p))",
        "useed1 AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS score "
        "FROM useedpos WHERE l = 1 GROUP BY 1)",
        "useedm AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS score "
        "FROM useedpos WHERE l > 1 GROUP BY 1 "
        f"ORDER BY score DESC, piece LIMIT {UNI_PIECES_N})",
        "sc0 AS (SELECT * FROM useed1 UNION ALL SELECT * FROM useedm)",
    ]
    for k in range(1, UNI_EM_STEPS + 1):
        blocks += _uni_dp_blocks(
            f"e{k}", "uvocab", f"sc{k - 1}", with_seg=True, keep_cnt=True
        )
        blocks.append(
            f"e{k}v AS (SELECT word, cnt, seg FROM e{k}d{UNI_MAX_WORD} "
            "WHERE pos = length(word))"
        )
        blocks.append(
            f"u{k} AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS score "
            "FROM (SELECT cnt, unnest(string_split(trim(seg), ' ')) AS "
            f"piece FROM e{k}v) GROUP BY 1)"
        )
        blocks.append(
            f"sc{k} AS (SELECT s1.piece, "
            f"CAST(coalesce(u.score, 0) AS BIGINT) AS score "
            f"FROM useed1 s1 LEFT JOIN u{k} u USING (piece) "
            f"UNION ALL SELECT piece, score FROM u{k} "
            "WHERE length(piece) > 1)"
        )
    return blocks


def _uni_dp_blocks(
    prefix: str,
    src_cte: str,
    scores_cte: str,
    with_seg: bool,
    keep_cnt: bool,
) -> list[str]:
    """Position-unrolled Viterbi DP: {prefix}d{i} holds the best
    (t, s[, seg]) at every position <= i for every word; candidates at
    position i extend the <=4 positions behind it, best per word by
    (t ASC, s DESC, piece-length DESC) — the exact objective of the
    Spark fold's array_min over (t, ns, nl) structs."""
    lens = ", ".join(str(x) for x in UNI_PIECE_LENS)
    cnt = "cnt, " if keep_cnt else ""
    seg0 = ", '' AS seg" if with_seg else ""
    seg_sel = ", seg" if with_seg else ""
    blocks = [
        f"{prefix}d0 AS MATERIALIZED (SELECT word, {cnt}0 AS pos, "
        f"CAST(0 AS BIGINT) AS t, CAST(0 AS BIGINT) AS s{seg0} "
        f"FROM {src_cte})"
    ]
    for i in range(1, UNI_MAX_WORD + 1):
        seg_new = (
            f", d.seg || substring(d.word, {i} - l.l + 1, l.l) || ' ' AS seg"
            if with_seg
            else ""
        )
        blocks.append(
            f"{prefix}c{i} AS (SELECT d.word, {('d.cnt, ' if keep_cnt else '')}"
            "d.t + 1 AS t, d.s + coalesce(v.score, 0) AS s, l.l AS l"
            f"{seg_new} "
            f"FROM {prefix}d{i - 1} d "
            f"JOIN (SELECT unnest([{lens}]) AS l) l "
            f"ON d.pos = {i} - l.l AND length(d.word) >= {i} "
            f"LEFT JOIN {scores_cte} v "
            f"ON v.piece = substring(d.word, {i} - l.l + 1, l.l) "
            "WHERE l.l = 1 OR v.piece IS NOT NULL)"
        )
        blocks.append(
            f"{prefix}d{i} AS MATERIALIZED (SELECT word, {cnt}pos, t, s{seg_sel} "
            f"FROM {prefix}d{i - 1} UNION ALL "
            f"SELECT word, {cnt}{i} AS pos, t, s{seg_sel} FROM ("
            "SELECT *, row_number() OVER (PARTITION BY word "
            f"ORDER BY t, s DESC, l DESC) AS rn FROM {prefix}c{i}) "
            "WHERE rn = 1)"
        )
    return blocks


def unigram_vocab_oracle_sql() -> str:
    """The training chain alone: the final scores table."""
    return (
        "WITH "
        + ",\n".join(_uni_train_blocks())
        + f"\nSELECT piece, score FROM sc{UNI_EM_STEPS}"
    )


def unigram_encode_oracle_sql() -> str:
    """Training chain + the same DP over the corpus' DISTINCT words
    under the final scores, joined back per document; token-free
    documents surface (0, 0) via the LEFT JOIN exactly as the Spark
    fold does. (Words longer than UNI_MAX_WORD silently drop here —
    the Spark side raises first on the same data, the
    wordpiece_encode loud-engine convention.)"""
    blocks = _uni_train_blocks()
    blocks.append(
        "uwrds AS (SELECT doc_id, w FROM (SELECT doc_id, "
        f"unnest({duck_tokens('text')}) AS w FROM documents) "
        "WHERE w <> '')"
    )
    blocks.append("udw AS (SELECT DISTINCT w AS word FROM uwrds)")
    blocks += _uni_dp_blocks(
        "x", "udw", f"sc{UNI_EM_STEPS}", with_seg=False, keep_cnt=False
    )
    blocks.append(
        f"uwt AS (SELECT word, t FROM xd{UNI_MAX_WORD} "
        "WHERE pos = length(word))"
    )
    blocks.append(
        "uagg AS (SELECT uwrds.doc_id, CAST(count(*) AS BIGINT) AS n_words, "
        "CAST(sum(uwt.t) AS BIGINT) AS n_unigram "
        "FROM uwrds JOIN uwt ON uwrds.w = uwt.word GROUP BY uwrds.doc_id)"
    )
    return (
        "WITH "
        + ",\n".join(blocks)
        + "\nSELECT d.doc_id, coalesce(a.n_words, 0) AS n_words, "
        "coalesce(a.n_unigram, 0) AS n_unigram "
        "FROM documents d LEFT JOIN uagg a ON d.doc_id = a.doc_id"
    )
