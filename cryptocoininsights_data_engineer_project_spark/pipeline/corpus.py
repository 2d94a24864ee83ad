"""End-to-end training-corpus preparation: the composed pipeline a
100 TB pretraining run actually executes, built from the registry's
verified operators —

    quality/language/exact-dup gate  (textops.corpus_filter — fused, 1 scan)
      → near-dup removal             (dedup.minhash_candidate_pairs
                                      → dedup.connected_components → canon)
      → benchmark decontamination    (dedup.decontaminate — broadcast probe)
      → sequence packing             (textops.pack_sequences — per-shard
                                      greedy fill, metadata-only Python)
      → train/val/test split         (portable md5 bucket per PACK, so a
                                      pack never straddles splits)

Each stage consumes the previous stage's survivor set; every stage's
semantics are individually oracle-checked via its registry query, and
the composition test (tests/test_corpus_pipeline.py) pins that the
pipeline equals composing the standalone operators by hand.

Scale shape: survivor sets are MATERIALIZED between phases (to
``staging_dir`` as parquet when given — the real 100 TB pattern, each
phase restartable from storage — else via localCheckpoint at test
scale). Without that, every downstream consumer of "survivors"
re-evaluates the gate join against the raw corpus: the un-materialized
plan re-scans the corpus text 5x for the packs output alone (14x with
the stats frame) — measured, which is why the materialization is not
optional-by-default. All inter-stage joins are on doc_id, the
benchmark side broadcasts, and the per-stage lineage counts are lazy
1-row aggregates union'd into a stats frame — no driver-side counting
mid-pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup, textops, webarchive
from ..functions.hashing import spark_hash64

TRAIN_BUCKETS = 10  # md5 % 10: 8 train / 1 val / 1 test


def _split_col(key_expr: str):
    bucket = F.expr(f"{spark_hash64(key_expr)} % {TRAIN_BUCKETS}").cast("int")
    return (
        F.when(bucket < 8, F.lit("train"))
        .when(bucket == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def _materialize(df: DataFrame, staging_dir: str | None, name: str) -> DataFrame:
    """Pin a phase boundary: parquet round-trip when a staging dir is
    given (restartable, scan-cost paid once), localCheckpoint otherwise
    (same plan-truncation effect at test scale)."""
    if staging_dir:
        path = f"{staging_dir}/{name}"
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)
    return df.localCheckpoint()


def prepare_training_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    lang: str = "en",
    min_quality: float = 0.5,
    decon_w: int = 6,
    capacity: int = textops.PACK_CAPACITY,
    n_shards: int = textops.PACK_SHARDS,
    staging_dir: str | None = None,
    index_dir: str | None = None,
    boilerplate_min_docs: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Run the full corpus-preparation pipeline.

    ``boilerplate_min_docs``: when set, a C4-style line-level
    boilerplate pass (textops.remove_boilerplate_lines) runs FIRST —
    lines recurring in that many distinct documents are stripped
    before the quality gate scores the text, exactly where C4 places
    it; documents whose every line was boilerplate arrive at the
    gate with empty text and fail it naturally. Document count is
    unchanged, so the lineage stats keep their shape.

    ``index_dir``: when given, the surviving corpus's MinHash band
    fingerprints are written there (overwrite — this is the initial
    index build), enabling :func:`extend_training_corpus` to absorb
    future batches incrementally.

    Returns ``(packs, stats)``:

    - ``packs``: (doc_id, shard, pack_id, n_tokens, split) — every
      surviving document placed into a training sequence pack with its
      train/val/test assignment (split keyed on (shard, pack_id) so
      whole packs move between splits atomically);
    - ``stats``: (stage, n) lineage counts — input, after the fused
      quality/language/exact-dup gate, after near-dup clustering,
      after decontamination, and packs formed. Lazy until acted on.
    """
    docs = docs.select("doc_id", "text", "lang", "source", "n_chars")

    # 0. optional boilerplate strip (C4 §2.2 ordering: before scoring)
    if boilerplate_min_docs is not None:
        cleaned = textops.remove_boilerplate_lines(
            docs, min_docs=boilerplate_min_docs
        ).select("doc_id", F.col("clean_text").alias("text"))
        docs = _materialize(
            docs.drop("text", "n_chars")
            .join(cleaned, "doc_id")
            .withColumn("n_chars", F.length("text"))
            .select("doc_id", "text", "lang", "source", "n_chars"),
            staging_dir,
            "boilerplate_clean",
        )

    # 1. fused gate: language + quality + exact-dup canonicalization in
    #    ONE corpus scan (keep = lang match ∧ quality ≥ τ ∧ is-canon)
    gate = textops.corpus_filter(docs, lang=lang, min_quality=min_quality)
    kept_ids = gate.filter(F.col("keep")).select("doc_id")
    survivors = _materialize(docs.join(kept_ids, "doc_id"), staging_dir, "survivors")

    # 2. near-dup removal: banded MinHash candidates over survivors,
    #    connected components, keep each cluster's smallest doc_id.
    #    Non-clustered docs have no pair row and survive by anti-join.
    pairs = dedup.minhash_candidate_pairs(survivors)
    labels, _rounds = dedup.connected_components(pairs)
    non_canon = labels.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    deduped = survivors.join(non_canon, "doc_id", "left_anti")

    # 3. decontamination: any doc sharing a w-gram with the held-out
    #    benchmark is dropped (broadcast shingle-set semi-probe)
    contaminated = dedup.decontaminate(deduped, benchmark, w=decon_w).select(
        "doc_id"
    )
    clean = _materialize(
        deduped.join(contaminated, "doc_id", "left_anti"), staging_dir, "clean"
    )

    if index_dir:
        dedup.write_fingerprint_index(clean, index_dir, mode="overwrite")

    # 4. pack into training sequences (greedy per-shard fill)
    packs = textops.pack_sequences(clean, capacity=capacity, n_shards=n_shards)

    # 5. split per PACK: md5 of (shard, pack_id) — deterministic,
    #    engine-portable, and pack-atomic
    packs = packs.withColumn(
        "split", _split_col("concat(shard, ':', pack_id)")
    )

    def _n(df: DataFrame, stage: str) -> DataFrame:
        return df.agg(
            F.lit(stage).alias("stage"), F.count(F.lit(1)).alias("n")
        )

    stats = (
        _n(docs, "input")
        .unionByName(_n(kept_ids, "after_quality_gate"))
        .unionByName(_n(deduped.select("doc_id"), "after_near_dup"))
        .unionByName(_n(clean.select("doc_id"), "after_decontaminate"))
        .unionByName(
            packs.select("shard", "pack_id")
            .distinct()
            .agg(F.lit("packs_formed").alias("stage"), F.count(F.lit(1)).alias("n"))
        )
    )
    return packs, stats


def extend_training_corpus(
    new_docs: DataFrame,
    benchmark: DataFrame,
    index_dir: str,
    *,
    lang: str = "en",
    min_quality: float = 0.5,
    decon_w: int = 6,
    capacity: int = textops.PACK_CAPACITY,
    n_shards: int = textops.PACK_SHARDS,
    staging_dir: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Incremental mode of :func:`prepare_training_corpus`: absorb a
    NEW batch against an already-prepared corpus without ever touching
    the indexed corpus's text again.

    - gate: same fused quality/language/exact-dup pass over the batch;
    - near-dup: the batch probes the persisted MinHash band index
      (``dedup.incremental_dedup_pairs``) — a batch doc is dropped if
      it collides with ANY indexed doc (the indexed corpus is
      immutable, so the incumbent always wins) or if it is a non-canon
      member of a batch-internal collision pair (smallest doc_id
      survives, the same canon rule as the full pipeline);
    - decontaminate + pack + pack-atomic split: identical to the full
      pipeline, over batch survivors only;
    - finally the surviving batch docs' fingerprints are APPENDED to
      the index, keeping the invariant for the next batch.

    Incremental semantics (standard for training pipelines): earlier
    corpus packs are never re-opened — a batch doc that duplicates an
    indexed doc disappears, never the reverse. Per-batch cost scales
    with the batch plus one fingerprint-index probe; the 100 TB of
    already-ingested text stays cold.

    Returns ``(packs, stats)`` for the batch, shaped exactly like
    :func:`prepare_training_corpus`.
    """
    spark = new_docs.sparkSession
    docs = new_docs.select("doc_id", "text", "lang", "source", "n_chars")

    gate = textops.corpus_filter(docs, lang=lang, min_quality=min_quality)
    kept_ids = gate.filter(F.col("keep")).select("doc_id")
    survivors = _materialize(
        docs.join(kept_ids, "doc_id"), staging_dir, "batch_survivors"
    )

    pairs = dedup.incremental_dedup_pairs(spark, survivors, index_dir)
    batch_ids = survivors.select("doc_id")
    # vs-index collision: the batch-side doc of any pair whose partner
    # is NOT in this batch (per incremental_dedup_pairs, one side is
    # always a batch doc)
    a_in = pairs.join(
        batch_ids.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi"
    )
    vs_index_a = pairs.join(
        batch_ids.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_anti"
    ).select(F.col("doc_a").alias("doc_id"))
    vs_index_b = pairs.join(
        batch_ids.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_anti"
    ).select(F.col("doc_b").alias("doc_id"))
    # batch-internal pairs: non-canon = larger doc_id of each component
    internal = a_in.join(
        batch_ids.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi"
    )
    labels, _ = dedup.connected_components(internal)
    internal_non_canon = labels.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    dropped = vs_index_a.unionByName(vs_index_b).unionByName(internal_non_canon)
    deduped = survivors.join(dropped.distinct(), "doc_id", "left_anti")

    contaminated = dedup.decontaminate(deduped, benchmark, w=decon_w).select(
        "doc_id"
    )
    clean = _materialize(
        deduped.join(contaminated, "doc_id", "left_anti"),
        staging_dir,
        "batch_clean",
    )

    packs = textops.pack_sequences(clean, capacity=capacity, n_shards=n_shards)
    packs = packs.withColumn("split", _split_col("concat(shard, ':', pack_id)"))

    # keep the index invariant: the batch's SURVIVING docs join the index
    dedup.write_fingerprint_index(clean, index_dir, mode="append")

    def _n(df: DataFrame, stage: str) -> DataFrame:
        return df.agg(F.lit(stage).alias("stage"), F.count(F.lit(1)).alias("n"))

    stats = (
        _n(docs, "batch_input")
        .unionByName(_n(kept_ids, "after_quality_gate"))
        .unionByName(_n(deduped.select("doc_id"), "after_near_dup"))
        .unionByName(_n(clean.select("doc_id"), "after_decontaminate"))
        .unionByName(
            packs.select("shard", "pack_id")
            .distinct()
            .agg(F.lit("packs_formed").alias("stage"), F.count(F.lit(1)).alias("n"))
        )
    )
    return packs, stats


def docs_from_warc(assets: DataFrame, *, source: str = "warc") -> DataFrame:
    """WARC archives → a documents-shaped frame the corpus pipeline
    consumes: (doc_id, text, lang, source, n_chars), one row per
    text-carrying response record — HTML (tag strip) AND PDF
    (operators/pdftext.py; round 14 — PDFs were previously dropped)
    — via webarchive.warc_doc_text: parse, envelope peel,
    content-encoding undo, and format-dispatched extraction fused in
    one mapInPandas pass; the archive payload never leaves the scan
    stage.

    ``lang`` is NULL: crawls carry no trusted language label, and the
    pipeline's gate classifies from the text itself
    (textops.corpus_filter's lang_pred), so the label column is
    metadata only. ``doc_id`` is the asset id — callers ingesting
    multi-response archives should re-key before the pipeline (the
    synthetic fixtures are one response per archive)."""
    return webarchive.warc_doc_text(assets).select(
        F.col("asset_id").alias("doc_id"),
        "text",
        F.lit(None).cast("string").alias("lang"),
        F.lit(source).alias("source"),
        "n_chars",
    )


def prepare_corpus_from_warc(
    assets: DataFrame, benchmark: DataFrame, **kwargs
) -> tuple[DataFrame, DataFrame]:
    """End-to-end Common-Crawl shape: WARC archives in, training
    packs out — docs_from_warc feeding prepare_training_corpus
    unchanged (same stats frame, same pack-atomic split). Composition
    pinned in tests/test_webarchive.py."""
    return prepare_training_corpus(docs_from_warc(assets), benchmark, **kwargs)
