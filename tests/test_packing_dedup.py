"""Unit tests for the round-2 training-prep operators: hyperplane-LSH
embedding near-dup, substring-span dedup, and sequence packing —
crafted fixtures for exact values, real testdata for recall."""

from __future__ import annotations

import duckdb
import pytest

from cryptocoininsights_data_engineer_project_spark.operators import (
    dedup,
    similarity,
    textops,
)

from .oracle_compare import compare

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------ hyperplane LSH
def test_lsh_pairs_subset_of_exact_with_recall_floor(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {
        (r.vec_a, r.vec_b)
        for r in similarity.all_pairs_cosine_blas(emb, threshold=0.45).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b)
        for r in similarity.hyperplane_lsh_pairs(emb, threshold=0.45).collect()
    }
    # verification makes precision exact; banding only costs recall
    assert lsh <= exact
    assert len(lsh) >= len(exact) - 1  # measured 7/7 on this corpus


def test_lsh_candidate_space_is_subquadratic(spark):
    # the candidate generator must come from band buckets, never an
    # all-pairs join: with a single vector per bucket, zero candidates
    emb = spark.createDataFrame(
        [(i, [float(i == j) for j in range(64)], 0) for i in range(8)],
        "vec_id long, embedding array<float>, label long",
    )
    # orthonormal vectors: cosine 0 for every pair, nothing >= 0.45
    assert similarity.hyperplane_lsh_pairs(emb, threshold=0.45).count() == 0


# --------------------------------------------------- substring dedup
SPAN = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 words
SPAN2 = "iota kappa lambda mu nu xi omicron pi"  # 8 words, disjoint from SPAN


def test_substring_dedup_scrubs_repeated_span(spark):
    docs = spark.createDataFrame(
        [
            (1, f"intro words here {SPAN} tail one"),
            (2, f"other document text {SPAN} closing words"),
            (3, "short doc"),
            (4, f"{SPAN2} {SPAN2}"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dedup.substring_dedup(docs).collect()}
    # doc 1 holds the first occurrence: untouched
    assert rows[1].clean_text == f"intro words here {SPAN} tail one"
    assert rows[1].n_dropped == 0
    # doc 2's copy of the span is scrubbed, surrounding text kept
    assert rows[2].clean_text == "other document text closing words"
    assert rows[2].n_dropped == 8
    # shorter than the gram width: passes through
    assert rows[3].clean_text == "short doc" and rows[3].n_dropped == 0
    # intra-doc repeat: first occurrence kept, second scrubbed (the
    # straddling grams cover nothing extra — their first occurrences
    # are within this doc)
    assert rows[4].clean_text == SPAN2
    assert rows[4].n_dropped == 8


def test_substring_dedup_identical_docs_keep_first(spark):
    docs = spark.createDataFrame(
        [(i, "one two three four five six seven eight nine ten") for i in (5, 9, 7)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dedup.substring_dedup(docs).collect()}
    assert rows[5].n_dropped == 0
    assert rows[7].clean_text == "" and rows[7].n_kept == 0
    assert rows[9].clean_text == "" and rows[9].n_dropped == 10


# ----------------------------------------------------- sequence packing
def _mkdocs(spark, toks_per_doc):
    return spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(toks_per_doc)],
        "doc_id long, text string",
    )


def test_pack_sequences_greedy_rule(spark):
    # one shard; capacity 10; token counts 4,4,4,9,12,1
    docs = _mkdocs(spark, [4, 4, 4, 9, 12, 1])
    out = textops.pack_sequences(docs, capacity=10, n_shards=1)
    packs = {r.doc_id: r.pack_id for r in out.collect()}
    # [4,4]=8 fits; +4 overflows -> pack 1 [4,9->no: 4 then 9 overflows]
    assert packs == {0: 0, 1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_pack_sequences_invariants(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = textops.pack_sequences(docs).collect()
    by_pack: dict[tuple, list] = {}
    for r in out:
        by_pack.setdefault((r.shard, r.pack_id), []).append(r.n_tokens)
    for (_, _), toks in by_pack.items():
        # capacity respected unless a single over-long doc
        assert sum(toks) <= textops.PACK_CAPACITY or len(toks) == 1
    # pack ids contiguous from 0 within every shard
    shards: dict[int, set] = {}
    for r in out:
        shards.setdefault(r.shard, set()).add(r.pack_id)
    for ids in shards.values():
        assert ids == set(range(len(ids)))
    # every doc packed exactly once
    assert len(out) == docs.count()


def test_pack_sequences_matches_oracle_on_crafted_rows(spark):
    docs = _mkdocs(spark, [3, 5, 2, 8, 1, 1, 1, 9, 4])
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(r.doc_id, r.text) for r in docs.collect()],
    )
    out = textops.pack_sequences(docs, capacity=9, n_shards=2)
    assert (
        compare(
            out, con, textops.pack_sequences_oracle_sql(capacity=9, n_shards=2), "pack"
        )
        == []
    )
    con.close()


# ---------------------------------------------------- connected components
def _cc(spark, edges, max_rounds=50):
    from cryptocoininsights_data_engineer_project_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    labels, rounds = connected_components(pairs, max_rounds=max_rounds)
    return {r["doc_id"]: r["cluster_id"] for r in labels.collect()}, rounds


def test_connected_components_adversarial_chain(spark):
    # path graph 0-1-2-...-200: diameter 200. Plain min-propagation
    # needs ~200 rounds; pointer jumping must land well inside the cap
    # (log2(200) ~ 8, allow slack for the union/shortcut interleaving).
    n = 201
    labels, rounds = _cc(spark, [(i, i + 1) for i in range(n - 1)], max_rounds=16)
    assert labels == {i: 0 for i in range(n)}
    assert rounds <= 16


def test_connected_components_star_and_islands(spark):
    # star centered at 1000 (high id — min must still win through the
    # center), plus a disjoint 2-cycle island
    edges = [(1000, i) for i in range(5)] + [(7000, 7001)]
    labels, rounds = _cc(spark, edges)
    assert labels == {**{i: 0 for i in range(5)}, 1000: 0, 7000: 7000, 7001: 7000}
    assert rounds <= 4


def test_connected_components_round_cap_diagnoses(spark):
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="failed to converge in 1 rounds"):
        _cc(spark, [(i, i + 1) for i in range(64)], max_rounds=1)


# ---------------------------------------------- incremental cross-run dedup
def test_incremental_dedup_matches_full_corpus(spark, tmp_path):
    """index(A) + incremental(B) must equal the B-involving subset of
    one-shot dedup over A ∪ B — the invariant that lets a pipeline
    dedup new batches against a persisted index instead of re-scanning
    the corpus."""
    from cryptocoininsights_data_engineer_project_spark.operators.dedup import (
        incremental_dedup_pairs,
        minhash_candidate_pairs,
        write_fingerprint_index,
    )
    from cryptocoininsights_data_engineer_project_spark.queries import _t

    docs = _t(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text")
    a = docs.filter("doc_id % 2 = 0")
    b = docs.filter("doc_id % 2 = 1")
    idx = str(tmp_path / "fp_index")
    write_fingerprint_index(a, idx)

    got = {
        (r.doc_a, r.doc_b)
        for r in incremental_dedup_pairs(spark, b, idx).collect()
    }
    full = {
        (r.doc_a, r.doc_b) for r in minhash_candidate_pairs(docs).collect()
    }
    b_ids = {r.doc_id for r in b.collect()}
    want = {(x, y) for x, y in full if x in b_ids or y in b_ids}
    assert got == want
    assert len(got) > 0  # fixture corpus has cross-parity near-dups

    # maintenance invariant: append B's fingerprints and a later batch
    # (here: empty) sees a complete index — the union's pair set is
    # fully recoverable from index-time + incremental reports
    write_fingerprint_index(b, idx)
    a_internal = {(x, y) for x, y in full if x not in b_ids and y not in b_ids}
    assert a_internal | got == full
