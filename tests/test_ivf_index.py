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
