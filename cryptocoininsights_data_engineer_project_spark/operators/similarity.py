"""Similarity search over an embedding column (``array<float>``).

Two paths, as a 100 TB engine needs both:

- brute-force cosine top-k: exact baseline. The query set is
  broadcast (it is small by construction); the corpus streams through
  executors — no shuffle at all until the final per-query top-k, which
  is a tiny aggregation. Dot products run JVM-side as flat unrolled
  expressions inside whole-stage codegen (see ``dot_expr``) — no
  Python, no lambda machinery in the hot loop.
- IVF-style partitioned top-k: the scale path. Vectors are bucketed
  by a coarse quantizer (here the pre-assigned ``label``; production
  would k-means its own centroids) and each query only scans its own
  bucket — a 1/n_buckets reduction in compared pairs, expressed as an
  equi-join so Catalyst partitions both sides by bucket.

Everything computes in float64 after an explicit cast from float32 so
the DuckDB oracle (``list_dot_product`` over ``DOUBLE[]``) agrees to
the last bit before the final rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Query set: every 100th vector. Scale-factor-proportional (50 queries
# at sf0.01) and deterministic.
QUERY_MODULUS = 100
TOP_K = 5
IVF_TOP_K = 3

# Number of triangle-join blocks for exact all-pairs scoring.
ALL_PAIRS_BLOCKS = 8


def _round_half_away(x, decimals: int = 6):
    """Round half AWAY from zero, matching Spark's ``F.round`` (BigDecimal
    HALF_UP) and DuckDB's ``round`` — numpy's ``np.round`` is banker's
    rounding (half to even) and would flip a value landing exactly on a
    representable .5e-6 boundary, silently breaking oracle parity and
    any >= threshold comparison on the rounded value."""
    import numpy as np

    s = 10.0**decimals
    return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s


def dot_expr(a: str, b: str) -> str:
    """Sequential-fold dot product (left-to-right accumulation —
    bit-identical to DuckDB's list_dot_product).

    Measured on this corpus: the higher-order-function fold beats a
    flat unrolled ``a[0]*b[0] + …`` sum ~2-3× — the unrolled form's
    ~190-node expression tree falls out of whole-stage codegen and
    interprets per node, while the HOF runs one specialized loop."""
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"


def _with_norms(embeddings: DataFrame) -> DataFrame:
    e = embeddings.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("emb"),
        "label",
    )
    return e.withColumn("nrm", F.expr(f"sqrt({dot_expr('emb', 'emb')})"))


def cosine_topk(
    embeddings: DataFrame,
    k: int = TOP_K,
    query_modulus: int = QUERY_MODULUS,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (query_id, neighbor_id, cosine) with cosine rounded to 6
    decimals; ranking is on the rounded value with neighbor_id as the
    deterministic tiebreaker so results are reproducible across engines.
    """
    n = _with_norms(embeddings)
    q = n.filter(F.col("vec_id") % query_modulus == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    pairs = F.broadcast(q).join(n, F.col("query_id") != F.col("vec_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            F.expr(dot_expr("q_emb", "emb")) / (F.col("q_nrm") * F.col("nrm")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def cosine_topk_oracle_sql(
    k: int = TOP_K, query_modulus: int = QUERY_MODULUS
) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label FROM embeddings
), n AS (
  SELECT vec_id, emb, label, sqrt(list_dot_product(emb, emb)) AS nrm FROM e
), q AS (
  SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm FROM n
  WHERE vec_id % {query_modulus} = 0
), scored AS (
  SELECT query_id, n.vec_id AS neighbor_id,
         round(list_dot_product(q_emb, emb) / (q_nrm * nrm), 6) AS cosine
  FROM q JOIN n ON query_id != n.vec_id
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
  ) AS rn FROM scored
)
SELECT query_id, neighbor_id, cosine FROM ranked WHERE rn <= {k}
"""


def ivf_topk(
    embeddings: DataFrame,
    k: int = IVF_TOP_K,
    query_modulus: int = QUERY_MODULUS,
) -> DataFrame:
    """Bucketed (IVF-style) approximate top-k: each query scans only
    its own coarse bucket. The bucket equi-join is the whole trick —
    at 1000 buckets it cuts compared pairs 1000×, and both sides
    shuffle-partition on the bucket key, so no broadcast is required
    when the query set itself is huge."""
    n = _with_norms(embeddings)
    q = n.filter(F.col("vec_id") % query_modulus == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("label").alias("bucket"),
    )
    pairs = q.join(
        n.withColumnRenamed("label", "bucket"),
        ["bucket"],
    ).filter(F.col("query_id") != F.col("vec_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            F.expr(dot_expr("q_emb", "emb")) / (F.col("q_nrm") * F.col("nrm")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def all_pairs_cosine(
    embeddings: DataFrame,
    threshold: float,
    n_blocks: int = ALL_PAIRS_BLOCKS,
) -> DataFrame:
    """Exact cosine near-duplicate pairs: every unordered pair with
    cosine >= threshold, output (vec_a < vec_b, cosine).

    Triangle block-join: vectors hash into n_blocks groups; the
    (i <= j) block-pair list drives two genuine EQUI-joins, so the
    quadratic pair space runs as shuffle-partitioned hash joins —
    parallel across the cluster — instead of one BroadcastNestedLoop
    stage on a single-sided broadcast. Off-diagonal block pairs take
    every (a, b) combination once (ids normalized with least/greatest);
    diagonal blocks filter a < b. This is the exact baseline; the
    sub-quadratic scale paths are ivf_topk / MinHash-LSH."""
    n = _with_norms(embeddings)
    spark = embeddings.sparkSession
    blocks = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(n_blocks) if i <= j],
        "ga: long, gb: long",
    )
    a = n.select(
        F.col("vec_id").alias("ia"),
        F.col("emb").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
        (F.col("vec_id") % n_blocks).alias("ga"),
    )
    b = n.select(
        F.col("vec_id").alias("ib"),
        F.col("emb").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
        (F.col("vec_id") % n_blocks).alias("gb"),
    )
    pairs = (
        a.join(F.broadcast(blocks), "ga")
        .join(b, "gb")
        .filter((F.col("ga") < F.col("gb")) | (F.col("ia") < F.col("ib")))
    )
    return (
        pairs.withColumn(
            "cosine",
            F.round(
                F.expr(dot_expr("emb_a", "emb_b")) / (F.col("nrm_a") * F.col("nrm_b")),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            F.least("ia", "ib").alias("vec_a"),
            F.greatest("ia", "ib").alias("vec_b"),
            "cosine",
        )
    )


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    max_iters: int = 5,
) -> DataFrame:
    """(vec_id, centroid_id, dist): coarse-quantizer training — the
    part ``ivf_topk`` takes as given (its ``label`` column). Lloyd's
    algorithm, shuffle-free:

    - init: k deterministic seed vectors — the k smallest by
      xxhash64(vec_id), a uniform sample that needs no id contiguity;
    - per iteration: centroids broadcast as one numpy array; a single
      ``mapInPandas`` pass assigns every vector (vectorized argmin of
      squared distance, ties to the lowest centroid id) and emits only
      per-partition PARTIAL SUMS — k x (64 + 1) floats per partition,
      regardless of data size. The driver combines the k x P partials,
      forms new means (empty clusters keep their old centroid), and
      checks movement — no shuffle, no join, no extra convergence job;
    - final pass: same broadcast-assign, emitting the assignment rows.

    At 100 TB each iteration is one scan at memory bandwidth with
    k*65*P floats of driver traffic; the old crossJoin+window form
    amplified the data k-fold through a shuffle per iteration.
    Iterative and therefore not SQL-expressible in one query — the
    driver records a rows-only check for the registry entry; unit
    tests assert the invariants (determinism, all-assigned,
    objective non-increasing).
    """
    import numpy as np
    import pandas as pd

    n = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).localCheckpoint()
    # Seed selection must not assume contiguous 0-based vec_ids: hash-
    # rank the ids and take the k smallest — a deterministic uniform
    # sample that compiles to TakeOrderedAndProject (per-partition
    # top-k, no global sort shuffle). With fewer than k vectors we
    # train that many centroids; every array below is sized from the
    # ACTUAL seed count, never the requested k.
    seeds = (
        n.withColumn("__h", F.xxhash64("vec_id"))
        .orderBy("__h", "vec_id")
        .limit(k)
        .select("emb")
        .collect()
    )
    if not seeds:
        raise ValueError("kmeans_assign: embeddings input is empty")
    cents = np.stack([r.emb for r in seeds])
    k = cents.shape[0]
    sc = embeddings.sparkSession.sparkContext

    for _ in range(max_iters):
        bc = sc.broadcast(cents)

        def partial_sums(batches):
            c = bc.value
            kk, dim = c.shape
            sums = np.zeros((kk, dim))
            counts = np.zeros(kk, dtype=np.int64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                m = np.stack(pdf["emb"].to_numpy())
                d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(-1)
                cid = d2.argmin(1)  # ties -> lowest centroid id
                np.add.at(sums, cid, m)
                np.add.at(counts, cid, 1)
            yield pd.DataFrame(
                {
                    "cid": np.arange(kk),
                    "s": list(sums),
                    "cnt": counts,
                }
            )

        partials = n.mapInPandas(
            partial_sums, "cid long, s array<double>, cnt long"
        ).collect()
        sums = np.zeros_like(cents)
        counts = np.zeros(k, dtype=np.int64)
        for r in partials:
            sums[r.cid] += np.asarray(r.s)
            counts[r.cid] += r.cnt
        new_cents = cents.copy()  # empty clusters keep their centroid
        nonempty = counts > 0
        new_cents[nonempty] = sums[nonempty] / counts[nonempty, None]
        moved = not np.array_equal(new_cents, cents)
        cents = new_cents
        if not moved:
            break

    bc = sc.broadcast(cents)

    def assign(batches):
        c = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["emb"].to_numpy())
            d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            cid = d2.argmin(1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "centroid_id": cid,
                    "dist": _round_half_away(
                        np.sqrt(d2[np.arange(len(cid)), cid]), 6
                    ),
                }
            )

    return n.mapInPandas(assign, "vec_id long, centroid_id long, dist double")


def ivf_topk_oracle_sql(
    k: int = IVF_TOP_K, query_modulus: int = QUERY_MODULUS
) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label FROM embeddings
), n AS (
  SELECT vec_id, emb, label, sqrt(list_dot_product(emb, emb)) AS nrm FROM e
), q AS (
  SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm, label AS bucket FROM n
  WHERE vec_id % {query_modulus} = 0
), scored AS (
  SELECT query_id, n.vec_id AS neighbor_id,
         round(list_dot_product(q_emb, emb) / (q_nrm * nrm), 6) AS cosine
  FROM q JOIN n ON q.bucket = n.label AND query_id != n.vec_id
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
  ) AS rn FROM scored
)
SELECT query_id, neighbor_id, cosine FROM ranked WHERE rn <= {k}
"""


def all_pairs_cosine_blas(
    embeddings: DataFrame,
    threshold: float,
    n_blocks: int = ALL_PAIRS_BLOCKS,
) -> DataFrame:
    """Exact cosine near-duplicate pairs via per-block-pair BLAS.

    Same triangle block decomposition as ``all_pairs_cosine``, but the
    quadratic pair space NEVER materializes as Spark rows: vectors are
    replicated once per participating block pair (a ~n_blocks-factor
    on the small input, not the n^2 output), grouped by (block_a,
    block_b), and each group computes an (n_a x n_b) cosine matrix
    with one numpy matmul inside ``applyInPandas``. Only the
    above-threshold pairs come back through Arrow.

    Why this beats the pure-JVM join form: per-pair higher-order-
    function folds cost ~64 interpreted-loop steps and two 512-byte
    array copies PER PAIR through the shuffle (gigabytes at 2M pairs);
    dgemm does the same arithmetic at memory bandwidth and the shuffle
    only carries each vector ~n_blocks times. Parallelism is the
    n_blocks*(n_blocks+1)/2 block pairs — size n_blocks so one block's
    vectors fit executor memory (at 100 TB: n_blocks ~ sqrt(pairs) so
    each side stays ~GB).
    """
    import pandas as pd  # local import: keep module importable w/o Arrow deps

    n = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    spark = embeddings.sparkSession
    # role table: block g acts as side 'a' in pairs (g, j>=g) and side
    # 'b' in pairs (i<g, g) — a tiny broadcast join, no lambda codegen
    roles = spark.createDataFrame(
        [(g, g, j, "a") for g in range(n_blocks) for j in range(g, n_blocks)]
        + [(g, i, g, "b") for g in range(n_blocks) for i in range(g)],
        "g: long, pa: long, pb: long, side: string",
    )
    tagged = n.withColumn("g", F.col("vec_id") % n_blocks).join(
        F.broadcast(roles), "g"
    )

    def score(key, pdf):
        import numpy as np

        pa, pb = key
        if pa == pb:
            ids = pdf["vec_id"].to_numpy()
            m = np.stack(pdf["emb"].to_numpy())
            if len(ids) < 2:
                return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
                    {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
                )
            nrm = np.sqrt(np.einsum("ij,ij->i", m, m))
            cos = (m @ m.T) / np.outer(nrm, nrm)
            iu, ju = np.triu_indices(len(ids), k=1)
            ia, ib, c = ids[iu], ids[ju], cos[iu, ju]
        else:
            a = pdf[pdf["side"] == "a"]
            b = pdf[pdf["side"] == "b"]
            if len(a) == 0 or len(b) == 0:
                return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
                    {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
                )
            ids_a = a["vec_id"].to_numpy()
            ids_b = b["vec_id"].to_numpy()
            ma = np.stack(a["emb"].to_numpy())
            mb = np.stack(b["emb"].to_numpy())
            na = np.sqrt(np.einsum("ij,ij->i", ma, ma))
            nb = np.sqrt(np.einsum("ij,ij->i", mb, mb))
            cos = (ma @ mb.T) / np.outer(na, nb)
            ii, jj = np.meshgrid(
                np.arange(len(ids_a)), np.arange(len(ids_b)), indexing="ij"
            )
            ia, ib, c = ids_a[ii.ravel()], ids_b[jj.ravel()], cos.ravel()
        c = _round_half_away(c, 6)
        keep = c >= threshold
        ia, ib, c = ia[keep], ib[keep], c[keep]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(ia, ib),
                "vec_b": np.maximum(ia, ib),
                "cosine": c,
            }
        )

    return tagged.groupBy("pa", "pb").applyInPandas(
        score, "vec_a long, vec_b long, cosine double"
    )
