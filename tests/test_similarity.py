"""The BLAS block-pair all-pairs path must agree exactly with the
pure-JVM triangle-join form (same rounding, same pair set) — it is the
same operator with a different physical strategy."""

from __future__ import annotations

from cryptocoininsights_data_engineer_project_spark.operators import similarity
from cryptocoininsights_data_engineer_project_spark.queries import _t

SF_DIR = "/root/testdata/sf0.001"


def test_blas_matches_jvm_triangle_join(spark):
    e = _t(spark, SF_DIR, "embeddings")
    cols = ["vec_a", "vec_b", "cosine"]
    jvm = sorted(map(str, similarity.all_pairs_cosine(e, 0.45).select(cols).collect()))
    blas = sorted(map(str, similarity.all_pairs_cosine_blas(e, 0.45).select(cols).collect()))
    assert jvm == blas
    assert len(jvm) > 0  # threshold chosen so the fixture has hits


def test_blas_block_count_invariance(spark):
    # the block count is a physical knob — results must not depend on it
    e = _t(spark, SF_DIR, "embeddings")
    cols = ["vec_a", "vec_b", "cosine"]
    b4 = sorted(map(str, similarity.all_pairs_cosine_blas(e, 0.45, n_blocks=4).select(cols).collect()))
    b13 = sorted(map(str, similarity.all_pairs_cosine_blas(e, 0.45, n_blocks=13).select(cols).collect()))
    assert b4 == b13
