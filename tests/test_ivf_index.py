"""Persisted IVF index: build once, probe with partition pruning, and
return exactly what the in-query trained-IVF computes."""

from __future__ import annotations

from pyspark.sql import functions as F

from cryptocoininsights_data_engineer_project_spark.catalog import table
from cryptocoininsights_data_engineer_project_spark.operators import similarity


def test_probe_equals_in_query_ivf(spark, sf_dir, tmp_path):
    emb = table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, idx)

    queries = similarity._ivf_vecs(emb).filter(
        F.col("vec_id") % similarity.QUERY_MODULUS == 0
    ).select(F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb"))
    served = {
        (r["query_id"], r["neighbor_id"], r["cosine"])
        for r in similarity.probe_ivf_index(spark, idx, queries).collect()
    }
    in_query = {
        (r["query_id"], r["neighbor_id"], r["cosine"])
        for r in similarity.ivf_trained_topk(emb).collect()
    }
    assert served == in_query and served


def test_probe_prunes_partitions(spark, sf_dir, tmp_path):
    emb = table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, idx)

    # one query -> at most nprobe cells may be read
    queries = similarity._ivf_vecs(emb).filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    cents = spark.read.parquet(f"{idx}/centroids")
    q = queries.select("query_id", "q_emb", F.expr(
        similarity.dot_expr("q_emb", "q_emb")).alias("q_vv"))
    qd = q.crossJoin(F.broadcast(cents)).withColumn(
        "d2", F.expr(f"q_vv - 2 * ({similarity.dot_expr('q_emb', 'cent')}) + cc")
    ).orderBy("d2", "cid").limit(similarity.IVF_NPROBE)
    probe_cids = {r["cid"] for r in qd.select("cid").collect()}

    pruned = spark.read.parquet(f"{idx}/corpus").filter(
        F.col("cid").isin(list(probe_cids))
    )
    # runtime truth: which files were actually opened (inputFiles() is
    # the PRE-pruning listing, so it can't see partition pruning)
    read_files = {
        r["f"] for r in pruned.select(F.input_file_name().alias("f")).distinct().collect()
    }
    all_files = set(spark.read.parquet(f"{idx}/corpus").inputFiles())
    assert 0 < len(read_files) < len(all_files)
    # every file actually read lives under a probed cell's directory
    assert all(any(f"cid={c}/" in f for c in probe_cids) for f in read_files)
    # and the pruning is visible in the plan as a partition filter
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    assert "PartitionFilters" in buf.getvalue()
    assert "cid" in buf.getvalue().split("PartitionFilters", 1)[1][:200]


def test_ivfpq_probe_equals_in_query(spark, sf_dir, tmp_path):
    """A probe of a freshly built IVF-PQ index returns exactly the
    in-query ivfpq_topk result (training shared via _ivfpq_parts)."""
    emb = table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivfpq")
    similarity.build_ivfpq_index(emb, idx)

    queries = similarity._ivf_vecs(emb).filter(
        F.col("vec_id") % similarity.QUERY_MODULUS == 0
    ).select(F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb"))
    served = {
        (r["query_id"], r["neighbor_id"], r["cosine"])
        for r in similarity.probe_ivfpq_index(spark, idx, queries).collect()
    }
    in_query = {
        (r["query_id"], r["neighbor_id"], r["cosine"])
        for r in similarity.ivfpq_topk(emb).collect()
    }
    assert served == in_query and served


def test_ivfpq_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """One query touches at most nprobe of the corpus cell
    directories — pruning happens at the file listing."""
    emb = table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivfpq")
    similarity.build_ivfpq_index(emb, idx)

    queries = similarity._ivf_vecs(emb).filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    cents = spark.read.parquet(f"{idx}/centroids")
    assert cents.count() == similarity.IVF_KCLUSTERS
    q = queries.select("query_id", "q_emb", F.expr(
        similarity.dot_expr("q_emb", "q_emb")).alias("q_vv"))
    qd = q.crossJoin(F.broadcast(cents)).withColumn(
        "d2",
        F.expr(f"q_vv - 2 * ({similarity.dot_expr('q_emb', 'cent')}) + cc"),
    ).orderBy("d2", "cid").limit(similarity.IVF_NPROBE)
    probe_cids = {r["cid"] for r in qd.select("cid").collect()}

    pruned = spark.read.parquet(f"{idx}/corpus").filter(
        F.col("cid").isin(list(probe_cids))
    )
    # runtime truth: which files were actually opened (inputFiles() is
    # the PRE-pruning listing, so it can't see partition pruning)
    read_files = {
        r["f"]
        for r in pruned.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    }
    all_files = set(spark.read.parquet(f"{idx}/corpus").inputFiles())
    assert 0 < len(read_files) < len(all_files)
    assert all(any(f"cid={c}/" in f for c in probe_cids) for f in read_files)


def test_stream_incremental_similarity_pinned_to_oneshot(
    spark, sf_dir, tmp_path
):
    """Streaming ANN maintenance (VERDICT r13 item 5): build an IVF
    index on a SEED slice, stream the remaining vectors in two
    micro-batch files, and pin probe(base + delta) row-for-row to
    probing an index laid out in ONE SHOT from the same centroids
    over seed ∪ streamed. Then replay the whole stream against a
    fresh checkpoint and assert the delta table is txn-convergent
    (the second run's rows equal the first's)."""
    from cryptocoininsights_data_engineer_project_spark.pipeline.table import (
        BucketedTable,
    )
    from cryptocoininsights_data_engineer_project_spark.streaming.ingest import (
        stream_incremental_similarity,
    )

    emb = table(spark, sf_dir, "embeddings")
    seed = emb.filter(F.col("vec_id") % 3 == 0)
    rest1 = emb.filter(F.col("vec_id") % 3 == 1)
    rest2 = emb.filter(F.col("vec_id") % 3 == 2)

    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(seed, idx)

    vecs_dir = str(tmp_path / "arrivals")
    rest1.select("vec_id", "embedding").coalesce(1).write.mode(
        "append"
    ).parquet(vecs_dir)
    rest2.select("vec_id", "embedding").coalesce(1).write.mode(
        "append"
    ).parquet(vecs_dir)

    troot = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    q = stream_incremental_similarity(spark, vecs_dir, idx, troot, ckpt)
    q.awaitTermination(120)
    delta_tbl = BucketedTable(spark, troot + "/delta", ["vec_id"])
    delta = delta_tbl.read()
    assert delta.count() == rest1.count() + rest2.count()

    queries = (
        similarity._ivf_vecs(emb)
        .filter(F.col("vec_id") % similarity.QUERY_MODULUS == 0)
        .select(
            F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
        )
    )
    served = {
        (r["query_id"], r["neighbor_id"], r["cosine"])
        for r in similarity.probe_ivf_index(
            spark, idx, queries, delta=delta
        ).collect()
    }

    # one-shot twin: SAME centroids, corpus = seed ∪ streamed
    idx2 = str(tmp_path / "ivf2")
    cents = spark.read.parquet(f"{idx}/centroids")
    assigned = (
        similarity._ivf_assign(similarity._ivf_vecs(emb), cents)
        .withColumn("nrm", F.expr("sqrt(vv)"))
    )
    assigned.select("vec_id", "emb", "nrm", "cid").write.partitionBy(
        "cid"
    ).mode("overwrite").parquet(f"{idx2}/corpus")
    cents.write.mode("overwrite").parquet(f"{idx2}/centroids")
    oneshot = {
        (r["query_id"], r["neighbor_id"], r["cosine"])
        for r in similarity.probe_ivf_index(spark, idx2, queries).collect()
    }
    assert served == oneshot and served

    # replay convergence: a fresh checkpoint re-delivers every file;
    # the txn markers make the re-upserts idempotent at the manifest
    before = sorted(
        (r["vec_id"], r["cid"]) for r in delta.select("vec_id", "cid").collect()
    )
    q2 = stream_incremental_similarity(
        spark, vecs_dir, idx, troot, str(tmp_path / "ckpt2")
    )
    q2.awaitTermination(120)
    after = sorted(
        (r["vec_id"], r["cid"])
        for r in delta_tbl.read().select("vec_id", "cid").collect()
    )
    assert after == before


def test_compact_ivf_delta(spark, sf_dir, tmp_path):
    """Folding the streamed delta into the base rewrites only touched
    cells and leaves probe results identical to base+delta serving."""
    emb = table(spark, sf_dir, "embeddings")
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(seed, idx)
    delta = similarity.assign_to_index(spark, idx, rest).localCheckpoint()

    queries = (
        similarity._ivf_vecs(emb)
        .filter(F.col("vec_id") % similarity.QUERY_MODULUS == 0)
        .select(
            F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
        )
    )
    with_delta = {
        tuple(r)
        for r in similarity.probe_ivf_index(
            spark, idx, queries, delta=delta
        ).collect()
    }
    n = similarity.compact_ivf_delta(spark, idx, delta)
    assert n == delta.select("cid").distinct().count() > 0
    compacted = {
        tuple(r)
        for r in similarity.probe_ivf_index(spark, idx, queries).collect()
    }
    assert compacted == with_delta and compacted
    # base now holds every vector exactly once
    base = spark.read.parquet(f"{idx}/corpus")
    assert base.count() == emb.count()
    assert base.select("vec_id").distinct().count() == emb.count()


def test_compact_ivf_delta_stale_redelivery_no_duplicates(
    spark, sf_dir, tmp_path
):
    """Compacting a delta whose vec_ids ALREADY exist in the base
    (re-delivery, or a second compact racing the delta truncation)
    must not write any vector twice: the base side is anti-joined
    against the delta's vec_ids before the union (delta wins),
    mirroring the probe-path collision semantics (ADVICE r15)."""
    emb = table(spark, sf_dir, "embeddings")
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(seed, idx)
    delta = similarity.assign_to_index(spark, idx, rest).localCheckpoint()
    similarity.compact_ivf_delta(spark, idx, delta)
    # second compact with the SAME stale delta — and a delta that
    # internally re-delivers each row twice
    doubled = delta.unionByName(delta)
    n = similarity.compact_ivf_delta(spark, idx, doubled)
    assert n > 0
    base = spark.read.parquet(f"{idx}/corpus")
    assert base.count() == emb.count()
    assert base.select("vec_id").distinct().count() == emb.count()


def test_compact_ivfpq_delta_stale_redelivery_no_duplicates(
    spark, sf_dir, tmp_path
):
    """Same stale-redelivery discipline for the PQ-coded compactor
    (ADVICE r15): re-compacting an already-folded delta leaves every
    vec_id in the base exactly once."""
    emb = table(spark, sf_dir, "embeddings")
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "ivfpq")
    similarity.build_ivfpq_index(seed, idx)
    delta = similarity.assign_to_ivfpq_index(
        spark, idx, rest
    ).localCheckpoint()
    similarity.compact_ivfpq_delta(spark, idx, delta)
    doubled = delta.unionByName(delta)
    n = similarity.compact_ivfpq_delta(spark, idx, doubled)
    assert n > 0
    base = spark.read.parquet(f"{idx}/corpus")
    assert base.count() == emb.count()
    assert base.select("vec_id").distinct().count() == emb.count()


def test_probe_with_stale_delta_never_duplicates(spark, sf_dir, tmp_path):
    """If probing resumes between compact_ivf_delta and the delta
    truncation (or a vec_id is re-delivered), the same vector exists
    in BOTH the base corpus and the delta. The probe path must keep
    exactly one copy (delta wins) so top-k never seats the same
    vec_id twice (ADVICE r14)."""
    emb = table(spark, sf_dir, "embeddings")
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(seed, idx)
    delta = similarity.assign_to_index(spark, idx, rest).localCheckpoint()
    similarity.compact_ivf_delta(spark, idx, delta)

    queries = (
        similarity._ivf_vecs(emb)
        .filter(F.col("vec_id") % similarity.QUERY_MODULUS == 0)
        .select(
            F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
        )
    )
    base_only = similarity.probe_ivf_index(spark, idx, queries).collect()
    stale = similarity.probe_ivf_index(
        spark, idx, queries, delta=delta
    ).collect()
    assert {tuple(r) for r in stale} == {tuple(r) for r in base_only}
    # no query's top-k ever contains a neighbor twice
    pairs = [(r["query_id"], r["neighbor_id"]) for r in stale]
    assert len(pairs) == len(set(pairs)) > 0


# ----------------------------------------- round 15: IVFPQ maintenance


def test_ivfpq_delta_probe_and_compact(spark, sf_dir, tmp_path):
    """The PQ-coded maintenance triad (VERDICT r14 item 5): new
    vectors assign to a persisted IVF-PQ index with the PERSISTED
    codebooks (cells + residual codes, no retraining); probe(base +
    delta) equals a one-shot layout from the same quantizer over
    seed ∪ delivered; compact folds only touched cells and
    probe(compacted) == probe(base + delta); a stale delta never
    seats a vec_id twice."""
    emb = table(spark, sf_dir, "embeddings")
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "ivfpq")
    similarity.build_ivfpq_index(seed, idx)
    delta = similarity.assign_to_ivfpq_index(
        spark, idx, rest
    ).localCheckpoint()

    queries = (
        similarity._ivf_vecs(emb)
        .filter(F.col("vec_id") % similarity.QUERY_MODULUS == 0)
        .select(
            F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
        )
    )
    with_delta = {
        tuple(r)
        for r in similarity.probe_ivfpq_index(
            spark, idx, queries, delta=delta
        ).collect()
    }

    # one-shot twin: SAME centroids + codebook, corpus over seed∪rest
    idx2 = str(tmp_path / "ivfpq2")
    full = similarity.assign_to_ivfpq_index(spark, idx, emb)
    full.write.partitionBy("cid").mode("overwrite").parquet(
        f"{idx2}/corpus"
    )
    spark.read.parquet(f"{idx}/centroids").write.mode("overwrite").parquet(
        f"{idx2}/centroids"
    )
    spark.read.parquet(f"{idx}/codebook").write.mode("overwrite").parquet(
        f"{idx2}/codebook"
    )
    oneshot = {
        tuple(r)
        for r in similarity.probe_ivfpq_index(spark, idx2, queries).collect()
    }
    assert with_delta == oneshot and with_delta

    n = similarity.compact_ivfpq_delta(spark, idx, delta)
    assert n == delta.select("cid").distinct().count() > 0
    compacted = {
        tuple(r)
        for r in similarity.probe_ivfpq_index(spark, idx, queries).collect()
    }
    assert compacted == with_delta
    # stale delta (post-compact, pre-truncate): no duplicate seating
    stale = similarity.probe_ivfpq_index(
        spark, idx, queries, delta=delta
    ).collect()
    assert {tuple(r) for r in stale} == compacted
    pairs = [(r["query_id"], r["neighbor_id"]) for r in stale]
    assert len(pairs) == len(set(pairs)) > 0
    base = spark.read.parquet(f"{idx}/corpus")
    assert base.count() == emb.count()
    assert base.select("vec_id").distinct().count() == emb.count()


def test_stream_incremental_similarity_pq_pinned_to_oneshot(
    spark, sf_dir, tmp_path
):
    """Streaming IVFPQ maintenance: per micro-batch, cells assigned
    AND residual codes packed with the persisted codebooks into the
    manifest-txn delta table; probe(base + delta) pinned to the
    one-shot layout; replay-convergent on a fresh checkpoint."""
    from cryptocoininsights_data_engineer_project_spark.pipeline.table import (
        BucketedTable,
    )
    from cryptocoininsights_data_engineer_project_spark.streaming.ingest import (
        stream_incremental_similarity_pq,
    )

    emb = table(spark, sf_dir, "embeddings")
    seed = emb.filter(F.col("vec_id") % 3 == 0)
    rest1 = emb.filter(F.col("vec_id") % 3 == 1)
    rest2 = emb.filter(F.col("vec_id") % 3 == 2)

    idx = str(tmp_path / "ivfpq")
    similarity.build_ivfpq_index(seed, idx)

    vecs_dir = str(tmp_path / "arrivals")
    rest1.select("vec_id", "embedding").coalesce(1).write.mode(
        "append"
    ).parquet(vecs_dir)
    rest2.select("vec_id", "embedding").coalesce(1).write.mode(
        "append"
    ).parquet(vecs_dir)

    troot = str(tmp_path / "tbl")
    q = stream_incremental_similarity_pq(
        spark, vecs_dir, idx, troot, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    delta_tbl = BucketedTable(spark, troot + "/delta", ["vec_id"])
    delta = delta_tbl.read()
    assert delta.count() == rest1.count() + rest2.count()

    queries = (
        similarity._ivf_vecs(emb)
        .filter(F.col("vec_id") % similarity.QUERY_MODULUS == 0)
        .select(
            F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
        )
    )
    served = {
        tuple(r)
        for r in similarity.probe_ivfpq_index(
            spark, idx, queries, delta=delta
        ).collect()
    }
    # streamed delta rows == direct assignment of the same vectors
    direct = similarity.assign_to_ivfpq_index(
        spark, idx, rest1.unionByName(rest2)
    )
    a = sorted(
        (r["vec_id"], r["cid"], tuple(r["pq_codes"]))
        for r in delta.select("vec_id", "cid", "pq_codes").collect()
    )
    b = sorted(
        (r["vec_id"], r["cid"], tuple(r["pq_codes"]))
        for r in direct.select("vec_id", "cid", "pq_codes").collect()
    )
    assert a == b
    # one-shot twin
    idx2 = str(tmp_path / "ivfpq2")
    similarity.assign_to_ivfpq_index(spark, idx, emb).write.partitionBy(
        "cid"
    ).mode("overwrite").parquet(f"{idx2}/corpus")
    spark.read.parquet(f"{idx}/centroids").write.mode("overwrite").parquet(
        f"{idx2}/centroids"
    )
    spark.read.parquet(f"{idx}/codebook").write.mode("overwrite").parquet(
        f"{idx2}/codebook"
    )
    oneshot = {
        tuple(r)
        for r in similarity.probe_ivfpq_index(spark, idx2, queries).collect()
    }
    assert served == oneshot and served
    # replay convergence
    before = sorted(
        (r["vec_id"], r["cid"]) for r in delta.select("vec_id", "cid").collect()
    )
    q2 = stream_incremental_similarity_pq(
        spark, vecs_dir, idx, troot, str(tmp_path / "ckpt2")
    )
    q2.awaitTermination(120)
    after = sorted(
        (r["vec_id"], r["cid"])
        for r in delta_tbl.read().select("vec_id", "cid").collect()
    )
    assert after == before
