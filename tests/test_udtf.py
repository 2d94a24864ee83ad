"""The ChunkDoc UDTF (API-surface demo) must emit exactly what the
built-in doc_chunks operator emits — same windows, same text."""

from __future__ import annotations

from cryptocoininsights_data_engineer_project_spark.functions import udtfs
from cryptocoininsights_data_engineer_project_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def test_udtf_matches_builtin_chunking(spark):
    udtfs.register(spark)
    builtin = REGISTRY["doc_chunks"].fn(spark, SF_DIR)
    docs = builtin.sparkSession.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.createOrReplaceTempView("__udtf_docs")
    via_udtf = spark.sql(
        "SELECT d.doc_id, c.chunk_id, c.n_tokens, c.chunk_text "
        "FROM __udtf_docs d, LATERAL chunk_doc(d.text) c"
    )
    cols = ["doc_id", "chunk_id", "n_tokens", "chunk_text"]
    a = sorted(map(str, builtin.select(cols).collect()))
    b = sorted(map(str, via_udtf.select(cols).collect()))
    assert a == b
    assert len(a) > 0


def test_udtf_empty_and_null_text(spark):
    udtfs.register(spark)
    df = spark.createDataFrame([(1, "a b c"), (2, None)], "doc_id long, text string")
    df.createOrReplaceTempView("__udtf_tiny")
    rows = spark.sql(
        "SELECT d.doc_id, c.* FROM __udtf_tiny d, LATERAL chunk_doc(d.text) c"
    ).collect()
    # NULL text emits no rows; short text emits one short chunk
    assert [(r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text) for r in rows] == [
        (1, 0, 3, "a b c")
    ]


def test_geomean_udaf_pins_builtin(spark, sf_dir):
    """UDAF API surface: the Arrow grouped-agg geometric mean equals
    the codegen composition exp(avg(ln(x))) used by the registry."""
    from pyspark.sql import functions as F

    from cryptocoininsights_data_engineer_project_spark.catalog import table
    from cryptocoininsights_data_engineer_project_spark.functions.udafs import (
        geomean_builtin,
        geomean_udaf,
    )

    p = table(spark, sf_dir, "part")
    via_udaf = {
        r.p_brand: r.g
        for r in p.groupBy("p_brand")
        .agg(F.round(geomean_udaf("p_retailprice"), 6).alias("g"))
        .collect()
    }
    via_builtin = {
        r.p_brand: r.g
        for r in p.groupBy("p_brand")
        .agg(F.round(geomean_builtin("p_retailprice"), 6).alias("g"))
        .collect()
    }
    assert via_udaf == via_builtin


def test_map_in_arrow_pinned_to_builtin(spark):
    """functions/arrowops.py: the Arrow-batch cents kernel must be
    bit-equal to the JVM codegen expression — same rows, same int64
    values (pins pyarrow half-away-from-zero == Spark scale-0 round)."""
    from cryptocoininsights_data_engineer_project_spark.functions import arrowops

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    a = arrowops.cents_builtin(li).collect()
    b = arrowops.cents_arrow(li).collect()
    key = lambda r: (r.l_orderkey, r.l_linenumber)  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)
    assert len(a) == li.count()
