"""k-means IVF quantizer invariants (the full cross-engine check is
the unrolled-CTE oracle in tests/test_oracle_parity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cryptocoininsights_data_engineer_project_spark.catalog import table
from cryptocoininsights_data_engineer_project_spark.operators.similarity import (
    kmeans_assign,
)


def test_kmeans_assignment_invariants(spark, sf_dir):
    em = table(spark, sf_dir, "embeddings")
    out = kmeans_assign(em, k=8, max_iters=3)
    rows = out.collect()
    # every vector assigned exactly once
    assert len(rows) == em.count()
    assert len({r["vec_id"] for r in rows}) == len(rows)
    # all k clusters used (synthetic data is spread out)
    clusters = {r["centroid_id"] for r in rows}
    assert len(clusters) >= 4
    assert all(0 <= c < 8 for c in clusters)
    assert all(r["dist_micro2"] >= 0 for r in rows)


def test_kmeans_deterministic(spark, sf_dir):
    em = table(spark, sf_dir, "embeddings")
    a = {(r["vec_id"], r["centroid_id"]) for r in kmeans_assign(em, k=4, max_iters=2).collect()}
    b = {(r["vec_id"], r["centroid_id"]) for r in kmeans_assign(em, k=4, max_iters=2).collect()}
    assert a == b


def test_kmeans_improves_over_init(spark, sf_dir):
    em = table(spark, sf_dir, "embeddings")
    d0 = (
        kmeans_assign(em, k=8, max_iters=0)
        .agg(F.sum("dist_micro2"))
        .first()[0]
    )
    d3 = (
        kmeans_assign(em, k=8, max_iters=3)
        .agg(F.sum("dist_micro2"))
        .first()[0]
    )
    assert d3 <= d0  # Lloyd's objective is non-increasing


def test_kmeans_sparse_noncontiguous_ids(spark):
    """Seeding must not assume contiguous 0-based vec_ids: sparse ids
    (and total < k) still train without shape errors, and every vector
    gets an assignment."""
    import random

    rng = random.Random(7)
    rows = [
        (1000 + i * 997, [rng.uniform(-1, 1) for _ in range(8)], 0)
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    out = kmeans_assign(df, k=4, max_iters=3).collect()
    assert len(out) == 12
    assert {r.vec_id for r in out} == {v for v, _, _ in rows}
    # more clusters requested than vectors: trains len(df) centroids
    tiny = spark.createDataFrame(rows[:3], "vec_id long, embedding array<double>, label long")
    out2 = kmeans_assign(tiny, k=8, max_iters=2).collect()
    assert len(out2) == 3
