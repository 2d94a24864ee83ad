"""Scale-safe fuzzy string matching: edit-distance pairs without a
quadratic block.

The naive shape (block on a low-cardinality attribute, levenshtein
every in-block pair) is quadratic in data volume: brand cardinality is
fixed, so at 100x rows each block holds 100x rows = 10,000x pairs.

This module implements PassJoin-style segment blocking (Li, Deng, Feng
— "PassJoin: A Partition-based Method for Similarity Joins", PVLDB
2011; public algorithm): to find all pairs within edit distance tau,

- partition every string s of length l into tau+1 contiguous segments
  (the canonical even partition);
- pigeonhole: tau edits cannot touch all tau+1 segments, so for any r
  with ed(r, s) <= tau, r CONTAINS one of s's segments verbatim, at a
  start position shifted by at most tau from the segment's home
  position;
- so the candidate set is an EQUI-join between "index keys" (each
  string's segments) and "probe keys" (each string's substrings at the
  segment geometries of every partner length within +-tau, restricted
  to the +-tau position window).

Candidate volume is bounded by true near-duplicate density: unrelated
strings rarely share an exact length-l/4 substring at a constrained
position, and the key fan-out per row is a CONSTANT
(~(2*tau+1)^2*(tau+1) probe keys), not a function of data volume —
the same property that makes MinHash-LSH the scalable dedup tier.
Blocking is recall-LOSSLESS: the registry query keeps the plain
quadratic SQL definition as its oracle, and the hash-match between the
two is an executable proof of losslessness on the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FUZZY_TAU = 3


def edit_distance_pairs(
    df: DataFrame,
    key: str,
    text: str,
    block: str,
    tau: int = FUZZY_TAU,
) -> DataFrame:
    """(key_a, key_b, edit_dist): all unordered pairs agreeing on
    ``block`` with levenshtein(text_a, text_b) <= tau, key_a < key_b.

    Exactly equivalent to the quadratic blocked self-join for strings
    of length > tau (shorter strings can have empty canonical segments,
    outside the pigeonhole guarantee — irrelevant for product names,
    asserted below). Candidate generation is segment equi-join; the
    levenshtein verify runs only on the (near-dup-bounded) candidates.
    """
    p = _projected(df, key, text, block)
    cands = candidate_pairs(df, key, text, block, tau)
    na = p.select(F.col("k").alias("key_a"), F.col("txt").alias("txt_a"))
    nb = p.select(F.col("k").alias("key_b"), F.col("txt").alias("txt_b"))
    return (
        cands.join(na, "key_a")
        .join(nb, "key_b")
        # cheap lossless pre-filter before the O(len^2) levenshtein
        .filter(F.abs(F.length("txt_a") - F.length("txt_b")) <= tau)
        .withColumn("edit_dist", F.levenshtein("txt_a", "txt_b"))
        .filter(F.col("edit_dist") <= tau)
        .select("key_a", "key_b", "edit_dist")
    )


def _projected(df: DataFrame, key: str, text: str, block: str) -> DataFrame:
    return df.select(
        F.col(key).alias("k"),
        F.col(block).alias("blk"),
        F.col(text).alias("txt"),
        F.length(text).alias("m"),
    )


def candidate_pairs(
    df: DataFrame, key: str, text: str, block: str, tau: int = FUZZY_TAU
) -> DataFrame:
    """The pre-verify candidate set (key_a, key_b), distinct — exposed
    so tests can assert the near-linear pair-count property directly."""
    segs = tau + 1
    p = _projected(df, key, text, block)
    # Index side: each string's tau+1 canonical segments, keyed by its
    # own length. start/slen use the even partition floor(i*l/(tau+1)).
    idx = (
        p.select(
            "k", "blk", "txt", "m", F.explode(F.expr(f"sequence(0, {tau})")).alias("i")
        )
        .withColumn("start", F.expr(f"CAST(floor(i * m / {segs}) AS INT) + 1"))
        .withColumn(
            "slen",
            F.expr(
                f"CAST(floor((i + 1) * m / {segs}) - floor(i * m / {segs}) AS INT)"
            ),
        )
        .filter(F.col("slen") >= 1)
        .select(
            F.col("k").alias("s_key"),
            "blk",
            F.col("m").alias("l"),
            "i",
            F.expr("substring(txt, start, slen)").alias("sub"),
        )
    )
    # Probe side: for every partner length l in [m-tau, m+tau] and every
    # segment geometry of THAT length, the substrings of this string at
    # the +-tau shifted window around the segment's home position.
    prb = (
        p.select(
            "k",
            "blk",
            "txt",
            "m",
            F.explode(F.expr(f"sequence(m - {tau}, m + {tau})")).alias("l"),
        )
        .filter(F.col("l") > tau)  # pigeonhole needs tau+1 non-empty segments
        .select(
            "k", "blk", "txt", "m", "l", F.explode(F.expr(f"sequence(0, {tau})")).alias("i")
        )
        .withColumn("start", F.expr(f"CAST(floor(i * l / {segs}) AS INT) + 1"))
        .withColumn(
            "slen",
            F.expr(
                f"CAST(floor((i + 1) * l / {segs}) - floor(i * l / {segs}) AS INT)"
            ),
        )
        .filter(F.col("slen") >= 1)
        .withColumn("p_lo", F.expr(f"greatest(1, start - {tau})"))
        .withColumn("p_hi", F.expr(f"least(m - slen + 1, start + {tau})"))
        .filter(F.col("p_lo") <= F.col("p_hi"))
        .select(
            F.col("k").alias("r_key"),
            "blk",
            "l",
            "i",
            "txt",
            "slen",
            F.explode(F.expr("sequence(p_lo, p_hi)")).alias("pos"),
        )
        .select(
            "r_key",
            "blk",
            "l",
            "i",
            F.expr("substring(txt, pos, slen)").alias("sub"),
        )
    )
    return (
        prb.join(idx, ["blk", "l", "i", "sub"])
        .filter(F.col("r_key") != F.col("s_key"))
        .select(
            F.least("r_key", "s_key").alias("key_a"),
            F.greatest("r_key", "s_key").alias("key_b"),
        )
        .distinct()
    )
