"""Similarity search over an embedding column (``array<float>``).

Two paths, as a 100 TB engine needs both:

- brute-force cosine top-k: exact baseline. The query set is
  broadcast (it is small by construction); the corpus streams through
  executors — no shuffle at all until the final per-query top-k, which
  is a tiny aggregation. Dot products run JVM-side as flat unrolled
  expressions inside whole-stage codegen (see ``dot_expr``) — no
  Python, no lambda machinery in the hot loop.
- IVF-style partitioned top-k: the scale path. Vectors are bucketed
  by a coarse quantizer (k-means cells trained in-query, or the same
  cells untrained as the ablation) and each query scans only its
  nearest-``nprobe`` cells — an nprobe/n_cells reduction in compared
  pairs, expressed as an equi-join so Catalyst partitions both sides
  by cell. Measured recall@5 vs the exact baseline is pinned in
  tests/test_similarity.py (NB: the synthetic corpus is near-uniform
  random, the hardest case for any pruning index — real text/image
  embeddings cluster, which raises IVF recall at the same scan
  fraction).

Everything computes in float64 after an explicit cast from float32 so
the DuckDB oracle (``list_dot_product`` over ``DOUBLE[]``) agrees to
the last bit before the final rounding.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import spark_hash64
from ..functions.spread import spread

# Query set: every 100th vector. Scale-factor-proportional (50 queries
# at sf0.01) and deterministic.
QUERY_MODULUS = 100
# Fixed-size audit query set for the offline eval queries
# (ann_recall_at_5 / ndcg_at_5): the EVAL_QUERIES vec_ids with the
# LARGEST portable md5 hash of vec_id — descending, so it is disjoint
# from the k-means seed selection (which takes the smallest) whenever
# the corpus has >= EVAL_QUERIES + n_clusters rows; on a smaller
# fixture the sets can overlap, which is harmless (a seed vector can
# still serve as a query). |queries| is constant in corpus size, so the exact-cosine
# baseline inside the audits costs O(EVAL_QUERIES * n) — linear in the
# corpus — instead of the O(n^2 / modulus) the modulus sample gave
# (measured 11-14x at 10x data in the r10 sf1 sweep before this bound).
EVAL_QUERIES = 64
TOP_K = 5
# Cap on the held-out benchmark slice semantic_decontaminate collects
# to the driver: real benchmark suites are a few thousand items no
# matter how big the corpus is, so the collected set must be constant
# in corpus size (the SCALE.md fixed-sample house rule). 256 keeps the
# closure ~128 KiB of doubles; it exceeds the % 17 slice at the driver
# SFs (29 members at sf0.01, 117 at sf0.1 — results unchanged there)
# and binds at the derived sf1 (~1.2k slice members) and beyond, which
# is the point: the collect stops growing with the corpus.
BENCH_LIMIT = 256
# Same k as the exact baseline so recall@k is the clean headline metric
# (tests/test_similarity.py pins the floors).
IVF_TOP_K = 5

# Number of triangle-join blocks for exact all-pairs scoring.
ALL_PAIRS_BLOCKS = 8
# Registry default cap on the exact all-pairs verification baseline
# (dedup_embedding): md5-top-N sampled-block mode — O(cap^2) constant
# in corpus size (slack at every driver SF, binding from the derived
# sf1 up). The uncapped exact form stays available (max_vectors=None).
ALL_PAIRS_CAP = 4096


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


# Scale-adaptive scan spreading (shared helper since r17 — the ANN
# operators are shuffle-free up to their final per-query top-k after
# the r16 packed-argmin rewrite, so their heavy per-row scoring runs
# in the scan's own partitions; see functions/spread.py for the full
# rationale).
_spread = spread


def _with_norms(embeddings: DataFrame) -> DataFrame:
    e = _spread(
        embeddings.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("emb"),
            "label",
        )
    )
    return e.withColumn("nrm", F.expr(f"sqrt({dot_expr('emb', 'emb')})"))


def _query_sample(
    n: DataFrame, query_modulus: int, query_limit: int | None
) -> DataFrame:
    """The query subset of a vector frame. ``query_limit`` set → the
    fixed-size md5-top-N sample (constant |queries| in corpus size;
    Spark plans the orderBy+limit as TakeOrderedAndProject, a
    distributed partial top-k over (hash, id) — never a global sort).
    ``query_limit`` None → the scale-proportional every-modulus-th
    sample the serving-path registry queries keep."""
    if query_limit is None:
        return n.filter(F.col("vec_id") % query_modulus == 0)
    h = F.expr(spark_hash64("CAST(vec_id AS STRING)"))
    return (
        n.withColumn("__qh", h)
        .orderBy(F.col("__qh").desc(), F.col("vec_id").asc())
        .limit(query_limit)
        .drop("__qh")
    )


def eval_query_frame(
    embeddings: DataFrame,
    query_modulus: int = QUERY_MODULUS,
    query_limit: int | None = None,
) -> DataFrame:
    """The shared (query_id, q_emb, q_vv, q_nrm) query-sample frame
    for composed audits (ann_recall_at_5 / ann_recall_curve /
    ndcg_at_5): each composes TWO retrievers over the same sample,
    and without sharing each retriever plans its own
    TakeOrderedAndProject corpus scan to build its broadcast side —
    the same |sample| rows derived twice (§2.4). Pinned lazily
    (<= |sample| rows — bounded, never the corpus); the first
    broadcast build materializes it. Values are identical to what
    each retriever derived itself: same _query_sample selection, and
    nrm = sqrt(vv) is the same expression _with_norms computes."""
    q = _query_sample(_ivf_vecs(embeddings), query_modulus, query_limit)
    return q.select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("vv").alias("q_vv"),
        F.expr("sqrt(vv)").alias("q_nrm"),
    ).localCheckpoint(eager=False)


def cosine_topk(
    embeddings: DataFrame,
    k: int = TOP_K,
    query_modulus: int = QUERY_MODULUS,
    query_limit: int | None = None,
    q_frame: DataFrame | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (query_id, neighbor_id, cosine) with cosine rounded to 6
    decimals; ranking is on the rounded value with neighbor_id as the
    deterministic tiebreaker so results are reproducible across engines.

    ``q_frame`` (an ``eval_query_frame``) overrides the in-plan query
    sample so a composed audit derives the sample once, not once per
    retriever.
    """
    n = _with_norms(embeddings)
    if q_frame is not None:
        q = q_frame.select("query_id", "q_emb", "q_nrm")
    else:
        q = _query_sample(n, query_modulus, query_limit).select(
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


def sq8_topk(
    embeddings: DataFrame,
    k: int = TOP_K,
    query_modulus: int = QUERY_MODULUS,
    query_limit: int | None = None,
) -> DataFrame:
    """Scalar-quantized (SQ8) top-k cosine — the 4x-compressed ANN
    serving path next to PQ: every vector is quantized to int8 codes
    (per-vector symmetric scale max|x|/127, round-half-away — the
    embedding_quantize convention, pinned cross-engine) and ALL
    scoring runs on the integer codes. For cosine the per-vector
    scales cancel exactly, so SQ8 cosine IS the cosine of the integer
    code vectors — no dequantization anywhere. Every intermediate is
    an integer-valued double far below 2^53 (|dot| <= 64 * 127^2), so
    both engines compute bit-identical scores before the final
    division/sqrt, which are IEEE-identical on identical inputs.

    Output: (query_id, neighbor_id, qcosine) with qcosine rounded to
    6 decimals; ties (common after quantization) break on neighbor_id.

    Scale shape: same as cosine_topk — the |queries|-row side
    broadcasts onto one corpus scan; with query_limit set the query
    side is a TakeOrderedAndProject partial top-k, and the whole
    operator is O(|queries| * n). At 100 TB the int8 codes are the
    column you SHIP to the serving tier: 4x less IO than float32, and
    this operator is the exact scoring those codes support."""
    e = _spread(
        embeddings.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
    )
    s = e.withColumn(
        "scale", F.expr("array_max(transform(emb, v -> abs(v))) / 127.0")
    )
    # scale = 0 means the all-zero vector: its codes are all zero by
    # definition. Guarding here (both spellings) keeps the degenerate
    # case engine-portable — IEEE x/0 diverges across engines (Spark
    # NaN/Inf vs DuckDB NULL).
    z = s.select(
        "vec_id",
        F.expr(
            "transform(emb, x -> CASE WHEN scale = 0D THEN 0D"
            " ELSE round(x / scale) END)"
        ).alias("q"),
    )
    n = z.withColumn("qn", F.expr(f"sqrt({dot_expr('q', 'q')})"))
    q = _query_sample(n, query_modulus, query_limit).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("qn").alias("q_qn"),
    )
    pairs = F.broadcast(q).join(n, F.col("query_id") != F.col("vec_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            F.when(F.col("q_qn") * F.col("qn") == 0, F.lit(0.0)).otherwise(
                F.expr(dot_expr("qq", "q")) / (F.col("q_qn") * F.col("qn"))
            ),
            6,
        ).alias("qcosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "qcosine")
    )


def sq8_topk_oracle_sql(
    k: int = TOP_K,
    query_modulus: int = QUERY_MODULUS,
    query_limit: int | None = None,
) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), s AS (
  SELECT vec_id, emb,
         list_max(list_transform(emb, v -> abs(v))) / 127.0 AS scale
  FROM e
), z AS (
  SELECT vec_id, list_transform(emb,
           x -> CASE WHEN scale = 0 THEN 0.0 ELSE round(x / scale) END) AS q
  FROM s
), n AS (
  SELECT vec_id, q, sqrt(list_dot_product(q, q)) AS qn FROM z
), qs AS (
  SELECT vec_id AS query_id, q AS qq, qn AS q_qn FROM n
  {_query_sample_sql(query_modulus, query_limit)}
), scored AS (
  SELECT query_id, n.vec_id AS neighbor_id,
         round(CASE WHEN q_qn * qn = 0 THEN 0.0
               ELSE list_dot_product(qq, q) / (q_qn * qn) END, 6) AS qcosine
  FROM qs JOIN n ON query_id != n.vec_id
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY qcosine DESC, neighbor_id
  ) AS rn FROM scored
)
SELECT query_id, neighbor_id, qcosine FROM ranked WHERE rn <= {k}
"""


def duck_hash64_vec_id() -> str:
    """The portable md5 order key over vec_id, for oracle sample
    CTEs (the DuckDB spelling of ``spark_hash64`` on the same
    string)."""
    from ..functions.hashing import duck_hash64

    return duck_hash64("CAST(vec_id AS VARCHAR)")


def _query_sample_sql(query_modulus: int, query_limit: int | None) -> str:
    """DuckDB tail clause selecting the identical query subset."""
    if query_limit is None:
        return f"WHERE vec_id % {query_modulus} = 0"
    from ..functions.hashing import duck_hash64

    dh = duck_hash64("CAST(vec_id AS VARCHAR)")
    return f"ORDER BY {dh} DESC, vec_id LIMIT {query_limit}"


def cosine_topk_oracle_sql(
    k: int = TOP_K,
    query_modulus: int = QUERY_MODULUS,
    query_limit: int | None = None,
) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label FROM embeddings
), n AS (
  SELECT vec_id, emb, label, sqrt(list_dot_product(emb, emb)) AS nrm FROM e
), q AS (
  SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm FROM n
  {_query_sample_sql(query_modulus, query_limit)}
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
    """Bucketed (IVF-style) approximate top-k with an UNTRAINED coarse
    quantizer: cells are the deterministic md5-seed vectors themselves,
    zero Lloyd's iterations — the n_iters=0 ablation of
    :func:`ivf_trained_topk` (same probe geometry, so the recall gap
    between the two registry entries is exactly the value of training).

    An earlier version bucketed on the dataset's pre-assigned ``label``
    column; measured recall@5 was 0.04 — chance — because the labels
    are classification targets with no cosine geometry (same-label mean
    cosine ≈ all-pairs mean cosine on this corpus). A bucketing that
    ignores the vectors cannot prune a vector space; replaced with the
    seed-cell quantizer, which probes by actual distance."""
    return ivf_trained_topk(
        embeddings, k=k, query_modulus=query_modulus, n_iters=0
    )


# Trained-quantizer IVF geometry: 16 coarse cells, two Lloyd's
# iterations (enough to pull seeds onto the data modes), five probes
# per query — a 31% scan fraction chosen against measured recall@5 on
# the near-uniform synthetic corpus (see tests/test_similarity.py).
IVF_KCLUSTERS = 16
IVF_ITERS = 2
IVF_NPROBE = 5


def _pack_cents(cents: DataFrame) -> DataFrame:
    """ONE row holding the whole centroid table as a cid-sorted
    array<struct<cid, cent, cc>>. Broadcast-crossJoined onto the
    vector frame, the nearest-centroid argmin then evaluates INSIDE
    each vector's own projection (array_min over a transform) — the
    former k-fold crossJoin expansion plus per-vec_id Window forced an
    Exchange + Sort of the k-expanded corpus per assignment pass; the
    packed form is zero-shuffle (same FLOPs, same fold arithmetic).

    The trailing size filter preserves the former crossJoin's
    zero-row semantics for an EMPTY centroid frame: a global agg
    always emits one row, and an empty packed array would otherwise
    surface NULL-cid assignments where the join produced no rows
    (ADVICE r16 — benign in current flows, where kmeans seeds from
    non-empty data, but cheap to pin)."""
    return cents.agg(
        F.array_sort(F.collect_list(F.struct("cid", "cent", "cc"))).alias("cs")
    ).filter(F.size("cs") > 0)


def _ivf_assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: (vec_id, emb, vv, cid).
    d2 = vv - 2*<v,c> + cc with every dot product the sequential fold
    that DuckDB's list_dot_product reproduces bit-for-bit; ties break
    to the lowest cid — array_min over struct(d2, cid) IS the
    (d2 ASC, cid ASC) objective the former Window ranked by."""
    best = (
        "array_min(transform(cs, c -> named_struct("
        f"'d2', vv - 2 * ({dot_expr('emb', 'c.cent')}) + c.cc, "
        "'cid', c.cid)))"
    )
    return vecs.crossJoin(F.broadcast(_pack_cents(cents))).select(
        "vec_id", "emb", "vv", F.expr(f"{best}.cid").alias("cid")
    )


def _ivf_vecs(embeddings: DataFrame) -> DataFrame:
    """(vec_id, emb double[], vv): the normalized working projection,
    spread over the session's parallelism when the scan under-splits
    (see _spread)."""
    e = _spread(
        embeddings.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
    )
    return e.withColumn("vv", F.expr(dot_expr("emb", "emb")))


def _train_centroids(
    vecs: DataFrame, n_clusters: int, n_iters: int
) -> DataFrame:
    """Deterministic Lloyd's training (seeds = smallest md5-of-id rows,
    means rounded to 6 decimals per iteration for engine parity);
    returns (cid, cent, cc). Shared verbatim by the in-query IVF, the
    persisted-index build, and their oracles."""
    h = F.expr(spark_hash64("CAST(vec_id AS STRING)"))
    seeds = vecs.withColumn("__h", h).orderBy("__h", "vec_id").limit(n_clusters)
    w_seed = Window.orderBy("__h", "vec_id")  # n_clusters rows: single partition is fine
    cents = seeds.select(
        (F.row_number().over(w_seed) - 1).cast("long").alias("cid"),
        F.col("emb").alias("cent"),
    )
    for _ in range(n_iters):
        cents = cents.withColumn("cc", F.expr(dot_expr("cent", "cent")))
        assigned = _ivf_assign(vecs, cents)
        cents = (
            assigned.select("cid", F.posexplode("emb").alias("idx", "v"))
            .groupBy("cid", "idx")
            .agg(F.round(F.avg("v"), 6).alias("v"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("idx", "v"))).alias("ps"))
            .select("cid", F.expr("transform(ps, p -> p.v)").alias("cent"))
            # k tiny rows; pin so the deep training lineage is not
            # re-evaluated once per downstream reference. Lazy: the
            # next iteration's (or the final assignment's) first job
            # materializes it — one fewer scheduling round-trip per
            # Lloyd iteration than the eager form, identical pinning
            .localCheckpoint(eager=False)
        )
    return cents.withColumn("cc", F.expr(dot_expr("cent", "cent")))


def ivf_trained_topk(
    embeddings: DataFrame,
    k: int = IVF_TOP_K,
    query_modulus: int = QUERY_MODULUS,
    n_clusters: int = IVF_KCLUSTERS,
    n_iters: int = IVF_ITERS,
    nprobe: int = IVF_NPROBE,
    query_limit: int | None = None,
    q_frame: DataFrame | None = None,
) -> DataFrame:
    """IVF top-k over a quantizer trained END-TO-END in the query:
    deterministic seeds → ``n_iters`` unrolled Lloyd's iterations →
    nearest-``nprobe`` multi-probe per query → cosine top-k within the
    probed cells. ``ivf_topk`` is the n_iters=0 ablation — the recall
    gap between the two registry entries is the value of training.

    Every step is engine-portable, so the whole pipeline — training
    included — has an exact DuckDB oracle (``ivf_trained_oracle_sql``):

    - seeds: the ``n_clusters`` rows with the smallest portable 60-bit
      md5 hash of vec_id (no id-contiguity assumption);
    - assignment: squared distance via the sequential-fold dot product
      (bit-identical to list_dot_product), ties to the lowest cid;
    - update: element-wise mean rounded to 6 decimals — the rounding
      quantizes away summation-order ulp so both engines hand the NEXT
      iteration identical centroids (the iteration would otherwise
      amplify a 1-ulp difference into different assignments);
    - probe: each query scores all k centroids (k is tiny) and keeps
      the ``nprobe`` nearest, an equi-join fan-out of nprobe, bounding
      extra work at nprobe/n_clusters of a full scan.

    Scale notes: the crossJoin here is (n × k) with k broadcast — one
    scan per iteration, no shuffle for assignment; the element-wise
    mean is one groupBy on (cid, idx) = k×dim groups. This form is the
    oracle-checkable twin; ``kmeans_assign`` is the shuffle-free
    mapInPandas production path (same algorithm, partial sums on the
    executors), and ``similarity_kmeans_ivf`` exercises it rows-only.
    """
    vecs = _ivf_vecs(embeddings)
    cents = _train_centroids(vecs, n_clusters, n_iters)
    assigned = _ivf_assign(vecs, cents).withColumn("nrm", F.expr("sqrt(vv)"))

    if q_frame is not None:
        q = q_frame.select("query_id", "q_emb", "q_vv", "q_nrm")
    else:
        q = _query_sample(vecs, query_modulus, query_limit).select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("q_emb"),
            F.col("vv").alias("q_vv"),
            F.expr("sqrt(vv)").alias("q_nrm"),
        )
    # nearest-nprobe cells per query: sort the packed k-struct array by
    # (d2 ASC, cid ASC) and keep the first nprobe — same selection the
    # former per-query Window ranked, with zero exchange
    nearest = (
        "transform(slice(array_sort(transform(cs, c -> named_struct("
        f"'d2', q_vv - 2 * ({dot_expr('q_emb', 'c.cent')}) + c.cc, "
        f"'cid', c.cid))), 1, {nprobe}), p -> p.cid)"
    )
    probes = q.crossJoin(F.broadcast(_pack_cents(cents))).select(
        "query_id", "q_emb", "q_nrm", F.explode(F.expr(nearest)).alias("cid")
    )
    # probes is |queries| x nprobe rows — tiny for any bounded query
    # batch (the ANN serving shape) — but it sits behind a Window over
    # a crossJoin, so Spark's size estimate is unusable and it would
    # otherwise plan a SortMergeJoin that SHUFFLES THE WHOLE CORPUS on
    # cid. Broadcasting the probe list keeps the corpus in place: each
    # executor streams its assigned partitions past the probe table.
    cand = assigned.join(F.broadcast(probes), "cid").filter(
        F.col("query_id") != F.col("vec_id")
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            F.expr(dot_expr("q_emb", "emb")) / (F.col("q_nrm") * F.col("nrm")), 6
        ).alias("cosine"),
    )
    w_k = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w_k))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def ivf_trained_oracle_sql(
    k: int = IVF_TOP_K,
    query_modulus: int = QUERY_MODULUS,
    n_clusters: int = IVF_KCLUSTERS,
    n_iters: int = IVF_ITERS,
    nprobe: int = IVF_NPROBE,
    query_limit: int | None = None,
) -> str:
    """DuckDB twin of ``ivf_trained_topk`` — the Lloyd's iterations are
    unrolled as a CTE chain generated from the same constants."""
    from ..functions.hashing import duck_hash64

    dh = duck_hash64("CAST(vec_id AS VARCHAR)")
    d2 = "v.vv - 2 * list_dot_product(v.emb, c.cent) + list_dot_product(c.cent, c.cent)"
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)",
        "v AS (SELECT vec_id, emb, list_dot_product(emb, emb) AS vv FROM e)",
        f"seed_sel AS (SELECT vec_id, emb FROM v ORDER BY {dh}, vec_id LIMIT {n_clusters})",
        f"c0 AS (SELECT CAST(row_number() OVER (ORDER BY {dh}, vec_id) - 1 AS BIGINT) AS cid, "
        "emb AS cent FROM seed_sel)",
    ]
    prev = "c0"
    for i in range(1, n_iters + 1):
        ctes.append(
            f"a{i} AS (SELECT vec_id, emb, vv, cid FROM ("
            f"SELECT v.vec_id, v.emb, v.vv, c.cid, "
            f"row_number() OVER (PARTITION BY v.vec_id ORDER BY {d2} ASC, c.cid ASC) AS rn "
            f"FROM v CROSS JOIN {prev} c) WHERE rn = 1)"
        )
        ctes.append(
            f"c{i} AS (SELECT cid, array_agg(av ORDER BY i) AS cent FROM ("
            f"SELECT cid, i, round(avg(emb[i]), 6) AS av "
            f"FROM a{i}, UNNEST(generate_series(1, len(emb))) AS g(i) "
            f"GROUP BY cid, i) GROUP BY cid)"
        )
        prev = f"c{i}"
    ctes.append(
        f"af AS (SELECT vec_id, emb, vv, cid FROM ("
        f"SELECT v.vec_id, v.emb, v.vv, c.cid, "
        f"row_number() OVER (PARTITION BY v.vec_id ORDER BY {d2} ASC, c.cid ASC) AS rn "
        f"FROM v CROSS JOIN {prev} c) WHERE rn = 1)"
    )
    ctes.append(
        f"q AS (SELECT vec_id AS query_id, emb AS q_emb, vv AS q_vv, sqrt(vv) AS q_nrm "
        f"FROM v {_query_sample_sql(query_modulus, query_limit)})"
    )
    qd2 = "q.q_vv - 2 * list_dot_product(q.q_emb, c.cent) + list_dot_product(c.cent, c.cent)"
    ctes.append(
        f"probe AS (SELECT query_id, q_emb, q_nrm, cid FROM ("
        f"SELECT q.query_id, q.q_emb, q.q_nrm, c.cid, "
        f"row_number() OVER (PARTITION BY q.query_id ORDER BY {qd2} ASC, c.cid ASC) AS rn "
        f"FROM q CROSS JOIN {prev} c) WHERE rn <= {nprobe})"
    )
    ctes.append(
        "scored AS (SELECT p.query_id, a.vec_id AS neighbor_id, "
        "round(list_dot_product(p.q_emb, a.emb) / (p.q_nrm * sqrt(a.vv)), 6) AS cosine "
        "FROM probe p JOIN af a ON a.cid = p.cid AND a.vec_id != p.query_id)"
    )
    ctes.append(
        "ranked AS (SELECT *, row_number() OVER ("
        "PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn FROM scored)"
    )
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT query_id, neighbor_id, cosine FROM ranked WHERE rn <= {k}"
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


# Random-hyperplane LSH geometry. 24 planes in 8 bands of 3 bits:
# chosen empirically on this corpus (near-dup threshold 0.45 ≈ 63°,
# plane-agreement p ≈ 0.65, per-band collision p^3 ≈ 0.27, recall
# 1-(1-p^3)^8 ≈ 0.92 — measured 13/14). NOTE the regime: at a weak
# threshold like 0.45 the candidate reduction is modest by nature; at
# production near-dup thresholds (cosine ≥ 0.9, p ≈ 0.9) the same
# geometry collides near-dups at ~0.97 while random pairs collide at
# ~2^-24 per band — the classic 1000×+ pruning. The operator is the
# honest sub-quadratic sibling of the exact all_pairs_cosine_blas.
LSH_PLANES = 24
LSH_BANDS = 8
LSH_SEED = 7


def _lsh_planes(
    dim: int, n_planes: int = LSH_PLANES, seed: int = LSH_SEED
) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes, rounded to 6 decimals so the
    literal text parses to the identical double in Spark and DuckDB
    (6-digit decimals cast exactly: mantissa ≤ 8e6 and 1e6 are both
    exact doubles, so decimal→double equals string→double)."""
    import random

    rng = random.Random(seed)
    return [
        [round(rng.gauss(0.0, 1.0), 6) for _ in range(dim)]
        for _ in range(n_planes)
    ]


def _sketch_band_rows(
    e: DataFrame,
    dim: int,
    n_planes: int = LSH_PLANES,
    n_bands: int = LSH_BANDS,
    seed: int = LSH_SEED,
) -> DataFrame:
    """(vec_id, emb, band_id, band_val) hyperplane-LSH band rows from
    a (vec_id, emb array<double>) frame. The sketch is ONE vectorized
    Arrow pass — a (rows x n_planes) BLAS matmul against the
    broadcast-by-closure literal plane matrix, then integer band
    packing — but shaped so the VECTORS never cross the Python
    boundary: a scalar pandas_udf maps emb -> the n_bands packed band
    values (5000 x 64 doubles in, 5000 x 6 longs out), and the
    n_bands-factor row replication happens JVM-side via posexplode
    with emb just projected through. The prior mapInPandas form
    Arrow-serialized every vector back OUT of Python n_bands times
    (r10 profile: 30% of this stage's wall at sf0.1). Per-row Python
    work stays nanoseconds vs the interpreted ~24x64 lambda steps of
    the equivalent nested HOF expression. Summation-order caveat:
    BLAS accumulates the sign dot in a different order than the
    oracle's sequential fold; a sign flip needs |dot| under ~1e-13 of
    the fold value — the same accepted ulp argument as
    all_pairs_cosine_blas's rounding."""
    from pyspark.sql.functions import pandas_udf

    planes = _lsh_planes(dim, n_planes, seed)
    bb = n_planes // n_bands

    @pandas_udf("array<long>")
    def band_vals(emb: pd.Series) -> pd.Series:
        import numpy as np

        H = np.array(planes).T  # (dim, n_planes)
        weights = 1 << np.arange(bb - 1, -1, -1)
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        m = np.stack(emb.to_numpy())
        bits_m = (m @ H) >= 0
        vals = np.stack(
            [
                bits_m[:, b * bb : (b + 1) * bb] @ weights
                for b in range(n_bands)
            ],
            axis=1,
        )  # (rows, n_bands)
        return pd.Series(list(vals))

    return e.withColumn("bv", band_vals("emb")).select(
        "vec_id",
        "emb",
        F.posexplode("bv").alias("band_id", "band_val"),
    ).withColumn("band_id", F.col("band_id").cast("long"))


def hyperplane_lsh_pairs(
    embeddings: DataFrame,
    threshold: float,
    dim: int = 64,
    n_planes: int = LSH_PLANES,
    n_bands: int = LSH_BANDS,
    seed: int = LSH_SEED,
) -> DataFrame:
    """Embedding near-duplicate pairs via random-hyperplane LSH
    (SimHash over vectors): sub-quadratic candidate generation, exact
    cosine verification. Output (vec_a < vec_b, cosine), identical
    schema to ``all_pairs_cosine_blas`` minus the missed pairs.

    Plan shape, built for 100 TB:
    - sketching is one narrow projection — ``transform`` over a LITERAL
      plane matrix evaluates 24 sequential-fold dot products per vector
      inside whole-stage codegen; no join, no shuffle, no Python;
    - vectors shuffle ONCE, partitioned by (band_id, band_value) — an
      n_bands-factor replication of the input, never a pair join;
    - each bucket verifies its own members with one numpy matmul
      inside ``applyInPandas`` (the all_pairs_cosine_blas kernel):
      within-bucket pairs never materialize as Spark rows, and a pair
      colliding in several bands collapses in the final ``distinct``
      (identical cosine on every copy — same rounding everywhere).
    Bucket size is bounded by collision probability (at production
    thresholds, by true near-dup density), so per-task memory is the
    bucket's vectors, not the corpus.

    The whole pipeline — planes included, inlined as literals from the
    same Python constants — is reproduced bit-for-bit by the DuckDB
    oracle (``hyperplane_lsh_oracle_sql``)."""
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    exploded = _sketch_band_rows(e, dim, n_planes, n_bands, seed)

    # verify runs in applyInArrow, not applyInPandas: the vectors
    # arrive as one contiguous Arrow list buffer that reshapes to the
    # (rows x dim) matrix with zero per-row object conversion (pandas
    # boxes each array — r10 profile: the boxing alone ~2x'd this
    # stage's wall). Survivor selection masks the cosine matrix
    # in-place instead of materializing all O(k²) upper-triangle index
    # arrays: the pre-filter keeps everything within 1e-6 of the
    # threshold (strictly wider than the round-half-away boundary of
    # 5e-7), and the exact round-then-compare — identical arithmetic
    # to the oracle — runs only on candidates.
    def score_bucket(_key, tbl):
        import numpy as np
        import pyarrow as pa

        sch = pa.schema(
            [
                ("vec_a", pa.int64()),
                ("vec_b", pa.int64()),
                ("cosine", pa.float64()),
            ]
        )
        n = tbl.num_rows
        if n < 2:
            return pa.Table.from_arrays(
                [
                    pa.array([], pa.int64()),
                    pa.array([], pa.int64()),
                    pa.array([], pa.float64()),
                ],
                schema=sch,
            )
        ids = tbl.column("vec_id").to_numpy()
        m = np.asarray(
            tbl.column("emb").combine_chunks().flatten(), dtype=np.float64
        ).reshape(n, -1)
        nrm = np.sqrt(np.einsum("ij,ij->i", m, m))
        # row-tiled verify: a degenerate mega-bucket (the synthetic
        # corpus's head-dominated vectors put >50% of docs in one
        # band value at every scale) would otherwise materialize a
        # k x k cosine matrix in one task — ~5 GB at sf1. Tiles keep
        # peak memory at tile x k while computing the IDENTICAL
        # floating-point expression dot(i,j) / (nrm_i * nrm_j) — each
        # cosine is an independent length-dim BLAS dot, so tiling
        # changes no summation order and the output is bit-identical
        # to the untiled form (and to the oracle's spelling).
        tile = 2048
        out_a, out_b, out_c = [], [], []
        for lo in range(0, n - 1, tile):
            hi = min(lo + tile, n)
            # columns start at lo: a pair (i, j) with j <= i is dead
            # (lower triangle), so the tile only multiplies against
            # m[lo:] — half the FLOPs across the tile sweep, and each
            # kept cosine is the same independent BLAS dot as before
            # (r17; verify-CPU trim per VERDICT item 4)
            cos = (m[lo:hi] @ m[lo:].T) / np.outer(nrm[lo:hi], nrm[lo:])
            cand = cos >= threshold - 1e-6
            # upper triangle in LOCAL coords: global j = jj + lo,
            # global i = ii + lo, so j > i is simply jj > ii
            ii, jj = np.nonzero(cand)
            keep_ut = jj > ii
            ii, jj = ii[keep_ut], jj[keep_ut]
            c = _round_half_away(cos[ii, jj], 6)
            keep = c >= threshold
            ii, jj, c = ii[keep], jj[keep], c[keep]
            ia, ib = ids[ii + lo], ids[jj + lo]
            out_a.append(np.minimum(ia, ib))
            out_b.append(np.maximum(ia, ib))
            out_c.append(c)
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_a) if out_a else np.array([], dtype=np.int64)),
                pa.array(np.concatenate(out_b) if out_b else np.array([], dtype=np.int64)),
                pa.array(np.concatenate(out_c) if out_c else np.array([], dtype=np.float64)),
            ],
            schema=sch,
        )

    return (
        exploded.groupBy("band_id", "band_val")
        .applyInArrow(score_bucket, "vec_a long, vec_b long, cosine double")
        .distinct()
    )


def hyperplane_lsh_oracle_sql(
    threshold: float,
    dim: int = 64,
    n_planes: int = LSH_PLANES,
    n_bands: int = LSH_BANDS,
    seed: int = LSH_SEED,
    source_sql: str | None = None,
) -> str:
    """DuckDB twin of ``hyperplane_lsh_pairs`` — identical literal
    hyperplanes, identical fold dot products, identical banding.
    ``source_sql`` overrides the vector source (any SELECT producing
    (vec_id, emb DOUBLE[])) so derived embeddings — e.g. the
    feature-hashing text vectors — reuse the same oracle."""
    planes = _lsh_planes(dim, n_planes, seed)
    bb = n_planes // n_bands
    h_lit = (
        "CAST(["
        + ",".join("[" + ",".join(repr(v) for v in p) + "]" for p in planes)
        + "] AS DOUBLE[][])"
    )
    band_selects = [
        "SELECT vec_id, {b} AS band_id, {expr} AS band_val FROM bits".format(
            b=b,
            expr=" + ".join(
                f"bits[{b * bb + j + 1}] * {1 << (bb - 1 - j)}"
                for j in range(bb)
            ),
        )
        for b in range(n_bands)
    ]
    source = source_sql or (
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings"
    )
    return f"""
WITH e AS (
  {source}
), bits AS (
  SELECT vec_id,
         list_transform({h_lit},
           h -> CASE WHEN list_dot_product(emb, h) >= 0 THEN 1 ELSE 0 END) AS bits
  FROM e
), bands AS ({' UNION ALL '.join(band_selects)}),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_val = b.band_val
   AND a.vec_id < b.vec_id
), n AS (
  SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e
), scored AS (
  SELECT vec_a, vec_b,
         round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) AS cosine
  FROM cand JOIN n a ON a.vec_id = vec_a JOIN n b ON b.vec_id = vec_b
)
SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= {threshold}
"""


def semantic_decontaminate(
    embeddings: DataFrame,
    threshold: float,
    bench_mod: int = 17,
    bench_limit: int = BENCH_LIMIT,
    dim: int = 64,
    n_planes: int = LSH_PLANES,
    n_bands: int = LSH_BANDS,
    seed: int = LSH_SEED,
) -> DataFrame:
    """(vec_id, n_bench_hits, max_cosine): corpus vectors semantically
    too close to a held-out BENCHMARK set — the embedding-space twin
    of ``dedup.decontaminate`` (which matches n-gram text verbatim;
    this catches paraphrased/translated contamination that shares no
    8-gram). Benchmark membership is the vec_id % ``bench_mod`` == 0
    slice (the text twin's convention) CAPPED at ``bench_limit``
    vectors by portable md5 order — the house fixed-sample rule
    (SCALE.md): real benchmark sets are a few thousand items no
    matter how big the corpus is, so the held-out set must not grow
    with the corpus. (Spark plans the cap as TakeOrderedAndProject —
    a distributed partial top-k, never a global sort.)

    Physical shape, built for that asymmetry (benchmark bounded, the
    corpus is the 100 TB side): the benchmark slice collects ONCE to
    the driver — at most ``bench_limit`` rows, constant in corpus
    size — and rides the closure as embeddings, norms, and pre-packed
    band values, so the whole probe is ONE narrow Arrow pass over the
    corpus with ZERO shuffles, zero joins, zero broadcast exchanges.
    Per batch: the corpus sketches against the literal planes (one
    BLAS matmul), the band-collision candidate mask is a vectorized
    (batch x bench x n_bands) compare, and the survivors verify with
    a single corpus x bench dgemm — per-pair work is a few FLOPs at
    memory bandwidth. Semantics are identical to the per-pair banded
    join this replaced (measured 4-6 s -> sub-second at sf0.1: the
    join form exploded ~1k candidate ROWS per corpus vector because
    3-bit bands barely filter, then paid a 64-term fold per row).
    Output is bounded by true contamination density."""
    import pandas as pd

    planes = _lsh_planes(dim, n_planes, seed)
    bb = n_planes // n_bands
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    h = F.expr(spark_hash64("CAST(vec_id AS STRING)"))
    bench_rows = (
        e.filter(F.col("vec_id") % bench_mod == 0)
        .withColumn("__qh", h)
        .orderBy(F.col("__qh").desc(), F.col("vec_id").asc())
        .limit(bench_limit)
        .drop("__qh")
        .collect()
    )
    import numpy as np

    B = np.stack([np.asarray(r["emb"], dtype=np.float64) for r in bench_rows])
    H = np.array(planes).T  # (dim, n_planes)
    weights = 1 << np.arange(bb - 1, -1, -1)
    bench_bits = (B @ H) >= 0
    bench_bands = np.stack(
        [bench_bits[:, b * bb : (b + 1) * bb] @ weights for b in range(n_bands)],
        axis=1,
    )  # (m, n_bands)
    Bn = B / np.sqrt(np.einsum("ij,ij->i", B, B))[:, None]

    corp = e.filter(F.col("vec_id") % bench_mod != 0)

    def probe(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf["emb"].to_numpy())
            bits = (M @ H) >= 0
            bands = np.stack(
                [
                    bits[:, b * bb : (b + 1) * bb] @ weights
                    for b in range(n_bands)
                ],
                axis=1,
            )  # (n, n_bands)
            collide = (bands[:, None, :] == bench_bands[None, :, :]).any(
                axis=2
            )  # (n, m)
            Mn = M / np.sqrt(np.einsum("ij,ij->i", M, M))[:, None]
            cos = _round_half_away(Mn @ Bn.T, 6)
            ok = collide & (cos >= threshold)
            hits = ok.sum(axis=1)
            keep = hits > 0
            if not keep.any():
                continue
            mx = np.where(ok, cos, -np.inf).max(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[keep],
                    "n_bench_hits": hits[keep].astype("int64"),
                    "max_cosine": mx[keep],
                }
            )

    return corp.mapInPandas(
        probe, "vec_id long, n_bench_hits long, max_cosine double"
    )


def semantic_decontaminate_oracle_sql(
    threshold: float,
    bench_mod: int = 17,
    bench_limit: int = BENCH_LIMIT,
    dim: int = 64,
    n_planes: int = LSH_PLANES,
    n_bands: int = LSH_BANDS,
    seed: int = LSH_SEED,
) -> str:
    """Identical literal planes, banding, capped benchmark slice,
    fold cosine, and per-corpus-vector aggregation."""
    from ..functions.hashing import duck_hash64

    dh = duck_hash64("CAST(vec_id AS VARCHAR)")
    planes = _lsh_planes(dim, n_planes, seed)
    bb = n_planes // n_bands
    h_lit = (
        "CAST(["
        + ",".join("[" + ",".join(repr(v) for v in p) + "]" for p in planes)
        + "] AS DOUBLE[][])"
    )
    band_selects = [
        "SELECT vec_id, {b} AS band_id, {expr} AS band_val FROM bits".format(
            b=b,
            expr=" + ".join(
                f"bits[{b * bb + j + 1}] * {1 << (bb - 1 - j)}"
                for j in range(bb)
            ),
        )
        for b in range(n_bands)
    ]
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), bits AS (
  SELECT vec_id,
         list_transform({h_lit},
           h -> CASE WHEN list_dot_product(emb, h) >= 0 THEN 1 ELSE 0 END) AS bits
  FROM e
), bands AS ({' UNION ALL '.join(band_selects)}),
bench AS (
  SELECT vec_id FROM e WHERE vec_id % {bench_mod} = 0
  ORDER BY {dh} DESC, vec_id LIMIT {bench_limit}
),
cand AS (
  SELECT DISTINCT c.vec_id AS cid, b.vec_id AS bid
  FROM bands c JOIN bands b
    ON c.band_id = b.band_id AND c.band_val = b.band_val
  WHERE c.vec_id % {bench_mod} <> 0
    AND b.vec_id IN (SELECT vec_id FROM bench)
), n AS (
  SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e
), scored AS (
  SELECT cid,
         round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) AS cosine
  FROM cand JOIN n a ON a.vec_id = cid JOIN n b ON b.vec_id = bid
)
SELECT cid AS vec_id, CAST(count(*) AS BIGINT) AS n_bench_hits,
       max(cosine) AS max_cosine
FROM scored WHERE cosine >= {threshold} GROUP BY cid
"""


# Product-quantization geometry: 64 dims → 4 subspaces × 16 dims, 8
# centroids per subspace (codebook 4×8; a code is 4 small ints — 64
# doubles compress to 4 bytes, the 128× shrink that lets a 100 TB
# corpus's ANN index live in executor memory). One Lloyd's update after
# deterministic seeding; distances are asymmetric (ADC): the query stays
# full-precision, only the corpus is coded.
PQ_M = 8
PQ_DSUB = 8
PQ_K = 16
PQ_TOP_K = 5
# ADC shortlist size ahead of the exact re-rank (the FAISS "refine"
# stage). 16× over-fetch vs k: ADC on 8×8-dim subspaces is lossy; the
# shortlist bounds full-precision work to rerank/N of the corpus per
# query while recovering most of the recall ADC alone loses.
PQ_RERANK = 80


def pq_adc_topk(
    embeddings: DataFrame,
    k: int = PQ_TOP_K,
    query_modulus: int = QUERY_MODULUS,
    m: int = PQ_M,
    dsub: int = PQ_DSUB,
    n_codes: int = PQ_K,
    rerank: int = PQ_RERANK,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance (ADC), the
    codebook trained END-TO-END in the query — the compression-side
    complement of the IVF pruning path (real systems compose both:
    IVF cells × PQ codes = the FAISS IVFPQ layout).

    Engine-portable construction (every step has a DuckDB twin in
    ``pq_adc_oracle_sql``):

    - subspaces: each vector splits into ``m`` contiguous ``dsub``-dim
      subvectors (one generator explode, no shuffle);
    - codebook: per subspace, ``n_codes`` centroids — seeds are the
      subvectors of the ``n_codes`` globally-smallest md5-hashed
      vec_ids, then ONE Lloyd's update with means rounded to 6
      decimals (the rounding hands both engines identical codebooks);
    - encoding: nearest-centroid id per (vector, subspace), ties to
      the lowest cid — the corpus compresses to ``m`` small ints per
      vector;
    - ADC: each query computes its m×n_codes lookup table of partial
      squared distances (tiny — broadcast), every corpus code row
      joins its partial by (subspace, cid) equi-key, and per-pair
      distances sum EXACTLY as integer micros (floating summation
      order would otherwise differ between engines);
    - shortlist: top-``rerank`` per query by approximate distance,
      self excluded;
    - re-rank: exact cosine over the shortlist only (full vectors are
      touched for rerank/N of the corpus per query), top-k by true
      cosine — the FAISS "refine" stage; output is (query_id,
      neighbor_id, cosine) like every other ANN entry.

    Scale shape: the codebook and the per-query LUTs broadcast; the
    corpus is scanned once to encode (the encode output is what a real
    pipeline would persist); the candidate fan-out is m partial rows
    per (query, vector) combined map-side before the (query, vector)
    shuffle. No all-pairs full-precision math anywhere."""
    e = _spread(
        embeddings.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
    )
    sub = e.select(
        "vec_id",
        F.expr(
            f"explode(transform(sequence(0, {m - 1}), "
            f"s -> named_struct('s', s, 'semb', slice(emb, s * {dsub} + 1, {dsub}))))"
        ).alias("x"),
    ).select(
        "vec_id",
        F.col("x.s").alias("s"),
        F.col("x.semb").alias("semb"),
    ).withColumn("svv", F.expr(dot_expr("semb", "semb")))

    h = F.expr(spark_hash64("CAST(vec_id AS STRING)"))
    seeds = e.withColumn("__h", h).orderBy("__h", "vec_id").limit(n_codes)
    w_seed = Window.orderBy("__h", "vec_id")  # n_codes rows
    seed_cents = seeds.select(
        (F.row_number().over(w_seed) - 1).cast("long").alias("cid"),
        F.col("emb"),
    )
    cents = seed_cents.select(
        "cid",
        F.expr(
            f"explode(transform(sequence(0, {m - 1}), "
            f"s -> named_struct('s', s, 'cent', slice(emb, s * {dsub} + 1, {dsub}))))"
        ).alias("x"),
    ).select("cid", F.col("x.s").alias("s"), F.col("x.cent").alias("cent"))

    def _assign(cents_df: DataFrame) -> DataFrame:
        # per-subspace packed codebook + in-row argmin (array_min over
        # struct(d2, cid) = the former Window's (d2 ASC, cid ASC)):
        # no n_codes-fold expansion, no per-(vec_id, s) Exchange+Sort
        cc = cents_df.withColumn("cc", F.expr(dot_expr("cent", "cent")))
        packed = cc.groupBy("s").agg(
            F.array_sort(F.collect_list(F.struct("cid", "cent", "cc"))).alias("cs")
        )
        best = (
            "array_min(transform(cs, c -> named_struct("
            f"'d2', svv - 2 * ({dot_expr('semb', 'c.cent')}) + c.cc, "
            "'cid', c.cid)))"
        )
        return (
            sub.join(F.broadcast(packed), "s")
            .withColumn("b", F.expr(best))
            .select(
                "vec_id", "s", "semb", "svv",
                F.col("b.cid").alias("cid"), F.col("b.d2").alias("d2"),
            )
        )

    # one Lloyd's update: means per (subspace, cid, component), rounded
    # so both engines hand encoding identical codebooks
    updated = (
        _assign(cents)
        .select("s", "cid", F.posexplode("semb").alias("idx", "v"))
        .groupBy("s", "cid", "idx")
        .agg(F.round(F.avg("v"), 6).alias("v"))
        .groupBy("s", "cid")
        .agg(F.array_sort(F.collect_list(F.struct("idx", "v"))).alias("ps"))
        .select("s", "cid", F.expr("transform(ps, p -> p.v)").alias("cent"))
        .localCheckpoint()  # m*n_codes tiny rows; training lineage ends here
    )
    codes = _assign(updated).select("vec_id", "s", "cid")

    q_sub = sub.filter(F.col("vec_id") % query_modulus == 0).select(
        F.col("vec_id").alias("query_id"),
        "s",
        F.col("semb").alias("q_semb"),
        F.col("svv").alias("q_svv"),
    )
    cc = updated.withColumn("cc", F.expr(dot_expr("cent", "cent")))
    lut = q_sub.join(F.broadcast(cc), "s").select(
        "query_id",
        "s",
        "cid",
        F.expr(
            f"CAST(round((q_svv - 2 * ({dot_expr('q_semb', 'cent')}) + cc) * 1000000, 0) AS BIGINT)"
        ).alias("pd2_micro"),
    )
    pairs = (
        codes.join(F.broadcast(lut), ["s", "cid"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pd2_micro").alias("d2_micro"))
        # a vector only pairs with a query when ALL m subspace partials
        # matched (inner join on (s, cid) always matches — the LUT has
        # every (s, cid) — so every pair carries exactly m rows)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.col("d2_micro") / 1000000.0, 6).alias("approx_d2"),
        )
    )
    # exact re-rank of the ADC shortlist (the FAISS "refine" stage):
    # the compressed-domain scan nominates `rerank` candidates per
    # query, full-precision cosine orders them, top-k survive. Only
    # shortlist rows ever touch full vectors, so the full-precision
    # cost is rerank/N of a brute-force pass.
    w_r = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        pairs.withColumn("rn", F.row_number().over(w_r))
        .filter(F.col("rn") <= rerank)
        .select("query_id", "neighbor_id")
    )
    vecs = e.withColumn("nrm", F.expr(f"sqrt({dot_expr('emb', 'emb')})"))
    qv = vecs.select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    nv = vecs.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("n_emb"),
        F.col("nrm").alias("n_nrm"),
    )
    rescored = (
        shortlist.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.expr(dot_expr("q_emb", "n_emb"))
                / (F.col("q_nrm") * F.col("n_nrm")),
                6,
            ).alias("cosine"),
        )
    )
    w_k = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rn", F.row_number().over(w_k))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def pq_adc_oracle_sql(
    k: int = PQ_TOP_K,
    query_modulus: int = QUERY_MODULUS,
    m: int = PQ_M,
    dsub: int = PQ_DSUB,
    n_codes: int = PQ_K,
    rerank: int = PQ_RERANK,
) -> str:
    """DuckDB twin of ``pq_adc_topk``: identical seeding, one identical
    Lloyd's update (means rounded to 6), identical encoding,
    integer-micro ADC sums, and the same shortlist→exact-re-rank."""
    from ..functions.hashing import duck_hash64

    dh = duck_hash64("CAST(vec_id AS VARCHAR)")
    sub_slice = f"emb[g.s * {dsub} + 1 : (g.s + 1) * {dsub}]"
    d2 = (
        "a.svv - 2 * list_dot_product(a.semb, c.cent) "
        "+ list_dot_product(c.cent, c.cent)"
    )
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), sub AS (
  SELECT vec_id, g.s AS s, {sub_slice} AS semb,
         list_dot_product({sub_slice}, {sub_slice}) AS svv
  FROM e, UNNEST(generate_series(0, {m - 1})) AS g(s)
), seeds AS (
  SELECT CAST(row_number() OVER (ORDER BY {dh}, vec_id) - 1 AS BIGINT) AS cid, emb
  FROM (SELECT vec_id, emb FROM e ORDER BY {dh}, vec_id LIMIT {n_codes})
), c0 AS (
  SELECT cid, g.s AS s, emb[g.s * {dsub} + 1 : (g.s + 1) * {dsub}] AS cent
  FROM seeds, UNNEST(generate_series(0, {m - 1})) AS g(s)
), a0 AS (
  SELECT vec_id, s, semb, cid FROM (
    SELECT a.vec_id, a.s, a.semb, c.cid,
      row_number() OVER (PARTITION BY a.vec_id, a.s ORDER BY {d2} ASC, c.cid ASC) AS rn
    FROM sub a JOIN c0 c ON a.s = c.s) WHERE rn = 1
), c1 AS (
  SELECT s, cid, array_agg(av ORDER BY i) AS cent FROM (
    SELECT s, cid, i, round(avg(semb[i]), 6) AS av
    FROM a0, UNNEST(generate_series(1, {dsub})) AS g(i)
    GROUP BY s, cid, i) GROUP BY s, cid
), codes AS (
  SELECT vec_id, s, cid FROM (
    SELECT a.vec_id, a.s, c.cid,
      row_number() OVER (PARTITION BY a.vec_id, a.s ORDER BY {d2} ASC, c.cid ASC) AS rn
    FROM sub a JOIN c1 c ON a.s = c.s) WHERE rn = 1
), lut AS (
  SELECT q.vec_id AS query_id, q.s, c.cid,
    CAST(round((q.svv - 2 * list_dot_product(q.semb, c.cent)
                + list_dot_product(c.cent, c.cent)) * 1000000, 0) AS BIGINT) AS pd2_micro
  FROM sub q JOIN c1 c ON q.s = c.s
  WHERE q.vec_id % {query_modulus} = 0
), pairs AS (
  SELECT l.query_id, x.vec_id AS neighbor_id,
         round(sum(l.pd2_micro) / 1000000.0, 6) AS approx_d2
  FROM codes x JOIN lut l ON x.s = l.s AND x.cid = l.cid
  WHERE x.vec_id != l.query_id
  GROUP BY l.query_id, x.vec_id
), shortlist AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY approx_d2 ASC, neighbor_id ASC) AS rn
    FROM pairs) WHERE rn <= {rerank}
), vn AS (
  SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e
), rescored AS (
  SELECT s.query_id, s.neighbor_id,
         round(list_dot_product(q.emb, x.emb) / (q.nrm * x.nrm), 6) AS cosine
  FROM shortlist s
  JOIN vn q ON q.vec_id = s.query_id
  JOIN vn x ON x.vec_id = s.neighbor_id
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
  FROM rescored
)
SELECT query_id, neighbor_id, cosine FROM ranked WHERE rn <= {k}
"""


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    max_iters: int = 5,
) -> DataFrame:
    """(vec_id, centroid_id, dist_micro2): coarse-quantizer training —
    the part ``ivf_topk`` takes as given (its ``label`` column).
    Lloyd's algorithm, shuffle-free AND engine-exact:

    - quantization: each component becomes an int64 micro-unit,
      ``floor(x * 1e6)``, computed JVM-side — the same double input
      bits give the same integer in any engine, and from there every
      distance, sum, and centroid is INTEGER arithmetic: argmin ties,
      means (truncating division), and the output d2 are
      order-independent and bit-identical to the DuckDB oracle
      (house rule — float Lloyd's sums in partition order and would
      drift in the last ulps);
    - init: k deterministic seed vectors — the k smallest by
      md5-of-id (spark_hash64, the cross-engine hash), a uniform
      sample that needs no id contiguity;
    - per iteration: centroids broadcast as one numpy int64 array; a
      single ``mapInPandas`` pass assigns every vector (vectorized
      argmin of integer squared distance, ties to the lowest centroid
      id) and emits only per-partition PARTIAL SUMS — k x (dim + 1)
      int64 per partition, regardless of data size. The driver
      combines the k x P partials, forms new means by truncating
      integer division (empty clusters keep their old centroid), and
      checks movement — no shuffle, no join, no extra convergence
      job;
    - final pass: same broadcast-assign, emitting the assignment rows
      with the exact integer squared distance in micro² units.

    At 100 TB each iteration is one scan at memory bandwidth with
    k*(dim+1)*P int64 of driver traffic; the old crossJoin+window
    form amplified the data k-fold through a shuffle per iteration.
    The iterations unroll into the oracle as one CTE block per round
    (``kmeans_oracle_sql``) — same seeds, same integer recurrence.
    """
    import numpy as np
    import pandas as pd

    n = embeddings.select(
        "vec_id",
        F.expr(
            "transform(cast(embedding AS array<double>), "
            "x -> cast(floor(x * 1000000) AS bigint))"
        ).alias("q"),
    ).localCheckpoint()
    # Seed selection must not assume contiguous 0-based vec_ids: hash-
    # rank the ids and take the k smallest — a deterministic uniform
    # sample that compiles to TakeOrderedAndProject (per-partition
    # top-k, no global sort shuffle). With fewer than k vectors we
    # train that many centroids; every array below is sized from the
    # ACTUAL seed count, never the requested k.
    h = F.expr(spark_hash64("CAST(vec_id AS STRING)"))
    seeds = (
        n.withColumn("__h", h)
        .orderBy("__h", "vec_id")
        .limit(k)
        .select("q")
        .collect()
    )
    if not seeds:
        raise ValueError("kmeans_assign: embeddings input is empty")
    cents = np.stack([np.asarray(r.q, dtype=np.int64) for r in seeds])
    k = cents.shape[0]
    sc = embeddings.sparkSession.sparkContext

    for _ in range(max_iters):
        bc = sc.broadcast(cents)

        def partial_sums(batches):
            c = bc.value
            kk, dim = c.shape
            sums = np.zeros((kk, dim), dtype=np.int64)
            counts = np.zeros(kk, dtype=np.int64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                m = np.stack(pdf["q"].to_numpy()).astype(np.int64)
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
            partial_sums, "cid long, s array<long>, cnt long"
        ).collect()
        sums = np.zeros_like(cents)
        counts = np.zeros(k, dtype=np.int64)
        for r in partials:
            sums[r.cid] += np.asarray(r.s, dtype=np.int64)
            counts[r.cid] += r.cnt
        new_cents = cents.copy()  # empty clusters keep their centroid
        nonempty = counts > 0
        # truncating (toward-zero) division — matches DuckDB BIGINT //
        # and Spark div; numpy // floors, so route through abs
        new_cents[nonempty] = np.sign(sums[nonempty]) * (
            np.abs(sums[nonempty]) // counts[nonempty, None]
        )
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
            m = np.stack(pdf["q"].to_numpy()).astype(np.int64)
            d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            cid = d2.argmin(1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "centroid_id": cid,
                    "dist_micro2": d2[np.arange(len(cid)), cid],
                }
            )

    return n.mapInPandas(
        assign, "vec_id long, centroid_id long, dist_micro2 long"
    )


def kmeans_oracle_sql(k: int = 8, max_iters: int = 5) -> str:
    """DuckDB twin of :func:`kmeans_assign` — the Lloyd's rounds
    unrolled as a CTE chain over the SAME integer-micro recurrence:
    floor(x*1e6) quantization, md5-seeded init, integer squared
    distances (exact: |q| <= ~6e5 so every dot-product term and sum
    stays far below 2^53 — DuckDB's double list_dot_product is exact
    on them), truncating-division means, ties to the lowest cid.
    Early convergence on the Spark side is idempotent here: once
    centroids are a fixed point, every further unrolled round
    reproduces them."""
    from ..functions.hashing import duck_hash64

    dh = duck_hash64("CAST(vec_id AS VARCHAR)")
    d2 = (
        "CAST(v.qq - 2 * list_dot_product(v.q, c.cent) "
        "+ list_dot_product(c.cent, c.cent) AS BIGINT)"
    )
    ctes = [
        "e AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]), "
        "x -> CAST(floor(x * 1000000) AS BIGINT)) AS q FROM embeddings)",
        "v AS (SELECT vec_id, q, "
        "CAST(list_dot_product(q, q) AS BIGINT) AS qq FROM e)",
        f"seed_sel AS (SELECT vec_id, q FROM v ORDER BY {dh}, vec_id "
        f"LIMIT {k})",
        f"c0 AS (SELECT CAST(row_number() OVER (ORDER BY {dh}, vec_id) "
        "- 1 AS BIGINT) AS cid, q AS cent FROM seed_sel)",
    ]
    prev = "c0"
    for i in range(1, max_iters + 1):
        ctes.append(
            f"a{i} AS (SELECT vec_id, q, cid FROM ("
            "SELECT v.vec_id, v.q, c.cid, "
            f"row_number() OVER (PARTITION BY v.vec_id "
            f"ORDER BY {d2} ASC, c.cid ASC) AS rn "
            f"FROM v CROSS JOIN {prev} c) WHERE rn = 1)"
        )
        # truncating mean per component; empty clusters keep their
        # previous centroid via the left join
        ctes.append(
            f"m{i} AS (SELECT cid, array_agg(cm ORDER BY i) AS cent "
            "FROM (SELECT cid, i, "
            "CASE WHEN sum(q[i]) < 0 THEN -((-sum(q[i])) // count(*)) "
            "ELSE sum(q[i]) // count(*) END AS cm "
            f"FROM a{i}, UNNEST(generate_series(1, len(q))) AS g(i) "
            "GROUP BY cid, i) GROUP BY cid)"
        )
        ctes.append(
            f"c{i} AS (SELECT p.cid, coalesce(m.cent, p.cent) AS cent "
            f"FROM {prev} p LEFT JOIN m{i} m ON p.cid = m.cid)"
        )
        prev = f"c{i}"
    ctes.append(
        "af AS (SELECT vec_id, cid, d2 FROM ("
        f"SELECT v.vec_id, c.cid, {d2} AS d2, "
        f"row_number() OVER (PARTITION BY v.vec_id "
        f"ORDER BY {d2} ASC, c.cid ASC) AS rn "
        f"FROM v CROSS JOIN {prev} c) WHERE rn = 1)"
    )
    return (
        "WITH "
        + ", ".join(ctes)
        + " SELECT vec_id, cid AS centroid_id, d2 AS dist_micro2 FROM af"
    )


def ivf_topk_oracle_sql(
    k: int = IVF_TOP_K, query_modulus: int = QUERY_MODULUS
) -> str:
    """DuckDB twin of :func:`ivf_topk` — the untrained (n_iters=0)
    instantiation of the trained-IVF oracle."""
    return ivf_trained_oracle_sql(
        k=k, query_modulus=query_modulus, n_iters=0
    )


def all_pairs_cosine_blas(
    embeddings: DataFrame,
    threshold: float,
    n_blocks: int = ALL_PAIRS_BLOCKS,
    max_vectors: int | None = None,
) -> DataFrame:
    """Exact cosine near-duplicate pairs via per-block-pair BLAS.

    ``max_vectors`` set → SAMPLED-BLOCK mode (the registry default,
    VERDICT r12 item 8): the exact all-pairs verification runs over
    the md5-top-``max_vectors`` sample (TakeOrderedAndProject — the
    fixed-sample house rule), so the quadratic cost is CONSTANT in
    corpus size instead of O(n^2): the recall-measurement semantics a
    verification baseline exists for survive on a bounded panel.
    ``None`` keeps the full exact form (tests, small corpora).

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
    if max_vectors is not None:
        h = F.expr(spark_hash64("CAST(vec_id AS STRING)"))
        n = (
            n.withColumn("__qh", h)
            .orderBy(F.col("__qh").desc(), F.col("vec_id").asc())
            .limit(max_vectors)
            .drop("__qh")
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


# ------------------------------------------------------------ persisted IVF
def build_ivf_index(
    embeddings: DataFrame,
    index_dir: str,
    n_clusters: int = IVF_KCLUSTERS,
    n_iters: int = IVF_ITERS,
) -> None:
    """Persist an IVF index: train the deterministic quantizer
    (``_train_centroids`` — the same pipeline the in-query form uses),
    assign every vector, and write the corpus PARTITIONED BY centroid
    id, plus the centroid table alongside.

    This is the "index once, serve many" production ANN shape the
    in-query registry entries amortize away: at 100 TB the quantizer
    trains once, the corpus is laid out so each cell is a parquet
    partition directory, and every probe after that reads ONLY the
    nprobe cells it needs (partition pruning — verified in
    tests/test_ivf_index.py by inputFiles inspection). Re-indexing is
    per-cell, not global.
    """
    vecs = _ivf_vecs(embeddings)
    cents = _train_centroids(vecs, n_clusters, n_iters)
    assigned = _ivf_assign(vecs, cents).withColumn("nrm", F.expr("sqrt(vv)"))
    assigned.select("vec_id", "emb", "nrm", "cid").write.partitionBy(
        "cid"
    ).mode("overwrite").parquet(f"{index_dir}/corpus")
    cents.select("cid", "cent", "cc").write.mode("overwrite").parquet(
        f"{index_dir}/centroids"
    )


def assign_to_index(spark, index_dir: str, embeddings: DataFrame) -> DataFrame:
    """Assign NEW vectors to a persisted IVF index's cells: the
    centroid table is read once (k rows, broadcast by _ivf_assign) and
    the assignment is the exact expression build/probe use — so an
    appended vector lands in the same cell a one-shot rebuild with
    these centroids would put it. Returns (vec_id, emb, nrm, cid), the
    persisted-corpus row shape. The streaming maintenance path
    (streaming/ingest.py::stream_incremental_similarity) calls this
    per micro-batch."""
    cents = spark.read.parquet(f"{index_dir}/centroids")
    return (
        _ivf_assign(_ivf_vecs(embeddings), cents)
        .withColumn("nrm", F.expr("sqrt(vv)"))
        .select("vec_id", "emb", "nrm", "cid")
    )


def compact_ivf_delta(spark, index_dir: str, delta: DataFrame) -> int:
    """Fold streamed delta rows (vec_id, emb, nrm, cid — the
    stream_incremental_similarity table) into the partitioned base
    corpus, rewriting ONLY the cells the delta touches (dynamic
    partition overwrite — untouched cell directories are not
    rewritten): the periodic re-index step that keeps the
    pushed-predicate delta scan bounded. Returns the number of cells
    rewritten. After compaction the caller truncates/retires the
    delta table; probe(base') ≡ probe(base, delta) because both
    sides carry exactly the same (vec_id, emb, nrm, cid) rows.

    A vec_id present in BOTH base and delta (re-delivery, or a probe
    raced between compact and truncate) must not be written twice:
    the delta is deduped and the base side is anti-joined against the
    delta's vec_ids (delta wins), mirroring ``probe_ivf_index``'s
    collision semantics. Assignment is deterministic in the persisted
    quantizers, so a re-delivered vec_id lands in the SAME cell as
    its base row and the anti-join sees it."""
    d = delta.select("vec_id", "emb", "nrm", "cid").dropDuplicates(
        ["vec_id"]
    )
    cells = [r["cid"] for r in d.select("cid").distinct().collect()]
    if not cells:
        return 0
    base = spark.read.parquet(f"{index_dir}/corpus").filter(
        F.col("cid").isin(cells)
    )
    merged = (
        base.join(F.broadcast(d.select("vec_id")), "vec_id", "left_anti")
        .unionByName(d)
        .localCheckpoint()  # sever self-read-overwrite lineage
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cid")
        .parquet(f"{index_dir}/corpus")
    )
    return len(cells)


def probe_ivf_index(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = IVF_TOP_K,
    nprobe: int = IVF_NPROBE,
    delta: DataFrame | None = None,
) -> DataFrame:
    """Serve top-k from a persisted IVF index: score the query batch
    against the (tiny) centroid table, keep the nprobe nearest cells
    per query, and scan ONLY those cells' partition directories —
    the cell filter is a partition-column predicate, so file listing
    itself prunes (no data files outside the probed cells are even
    opened). Scoring matches ``ivf_trained_topk`` expression-for-
    expression, so a probe of a freshly built index returns exactly
    the in-query result.

    ``queries``: (query_id, q_emb double[]). The probed-cell id list
    is collected to the driver — bounded by n_clusters, the same
    metadata-collect class as the bucket-prune list in
    pipeline/coins.py.
    """
    cents = spark.read.parquet(f"{index_dir}/centroids")
    q = queries.select(
        "query_id",
        "q_emb",
        F.expr(dot_expr("q_emb", "q_emb")).alias("q_vv"),
    ).withColumn("q_nrm", F.expr("sqrt(q_vv)"))
    qd = q.crossJoin(F.broadcast(cents)).withColumn(
        "d2", F.expr(f"q_vv - 2 * ({dot_expr('q_emb', 'cent')}) + cc")
    )
    w_p = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("cid").asc()
    )
    probes = (
        qd.withColumn("rn", F.row_number().over(w_p))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "q_emb", "q_nrm", "cid")
        .localCheckpoint()  # one probe assignment for cid-list + join
    )
    cell_ids = [r["cid"] for r in probes.select("cid").distinct().collect()]
    corpus = spark.read.parquet(f"{index_dir}/corpus").filter(
        F.col("cid").isin(cell_ids)
    )
    if delta is not None:
        # streaming-appended vectors (stream_incremental_similarity):
        # the base corpus partition-prunes; the DELTA is a plain scan
        # with the cid predicate pushed — bounded by the re-index
        # cadence (the FAISS/Lucene base+delta serving shape), and
        # compactable into the partitioned base per cell. The delta
        # WINS on vec_id collision: if probing resumes between
        # compact_ivf_delta and the delta truncation (or a vec_id is
        # re-delivered), the same vector exists on both sides — the
        # anti-join below keeps exactly one copy, so top-k can never
        # seat the same vec_id twice. The delta is cadence-bounded,
        # so its vec_id list broadcasts.
        d = (
            delta.select("vec_id", "emb", "nrm", "cid")
            .filter(F.col("cid").isin(cell_ids))
            .dropDuplicates(["vec_id"])
        )
        corpus = corpus.join(
            F.broadcast(d.select("vec_id")), "vec_id", "left_anti"
        ).unionByName(d)
    cand = corpus.join(F.broadcast(probes), "cid").filter(
        F.col("query_id") != F.col("vec_id")
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            F.expr(dot_expr("q_emb", "emb")) / (F.col("q_nrm") * F.col("nrm")), 6
        ).alias("cosine"),
    )
    w_k = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w_k))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


# ---------------------------------------------------------------- ivf-pq
# The FAISS IVFPQ composition (VERDICT r11 #6): coarse IVF cells prune
# WHERE to look, product-quantized RESIDUAL codes compress WHAT is
# scanned there — probes read nprobe cells and rank candidates by
# asymmetric distance against per-(query, cell) lookup tables, then
# exact-rerank a shortlist. In-query form below (oracle-backed
# registry entry `similarity_ivfpq`); persisted form in
# build_ivfpq_index / probe_ivfpq_index.


def _residual_subvectors(res: DataFrame, m: int, dsub: int) -> DataFrame:
    """(vec_id, cid, s, semb, svv): residual subvectors — one
    generator explode, no shuffle."""
    return (
        res.select(
            "vec_id",
            "cid",
            F.expr(
                f"explode(transform(sequence(0, {m - 1}), "
                f"s -> named_struct('s', s, "
                f"'semb', slice(remb, s * {dsub} + 1, {dsub}))))"
            ).alias("x"),
        )
        .select(
            "vec_id", "cid",
            F.col("x.s").alias("s"), F.col("x.semb").alias("semb"),
        )
        .withColumn("svv", F.expr(dot_expr("semb", "semb")))
    )


def _train_pq_codebook(
    res: DataFrame, rsub: DataFrame, m: int, dsub: int, n_codes: int
) -> DataFrame:
    """(pqid, s, cent): the shared residual codebook — seeds are the
    residual subvectors of the n_codes smallest-md5 vec_ids (the PQ
    recipe of pq_adc_topk, run on residuals), then ONE Lloyd's update
    with means rounded to 6 decimals so both engines hand encoding
    identical codebooks. Returns a localCheckpointed m*n_codes-row
    frame (training lineage ends here)."""
    h = F.expr(spark_hash64("CAST(vec_id AS STRING)"))
    seeds = res.withColumn("__h", h).orderBy("__h", "vec_id").limit(n_codes)
    w_seed = Window.orderBy("__h", "vec_id")  # n_codes rows
    cb0 = (
        seeds.select(
            (F.row_number().over(w_seed) - 1).cast("long").alias("pqid"),
            "remb",
        )
        .select(
            "pqid",
            F.expr(
                f"explode(transform(sequence(0, {m - 1}), "
                f"s -> named_struct('s', s, "
                f"'cent', slice(remb, s * {dsub} + 1, {dsub}))))"
            ).alias("x"),
        )
        .select("pqid", F.col("x.s").alias("s"), F.col("x.cent").alias("cent"))
    )
    a0 = _assign_pq(rsub, cb0)
    return (
        a0.select("s", "pqid", F.posexplode("semb").alias("idx", "v"))
        .groupBy("s", "pqid", "idx")
        .agg(F.round(F.avg("v"), 6).alias("v"))
        .groupBy("s", "pqid")
        .agg(F.array_sort(F.collect_list(F.struct("idx", "v"))).alias("ps"))
        .select("s", "pqid", F.expr("transform(ps, p -> p.v)").alias("cent"))
        .localCheckpoint()
    )


def _assign_pq(rsub: DataFrame, cb: DataFrame) -> DataFrame:
    """Nearest codebook entry per (vector, subspace) on the residual
    (ties to the lowest pqid); the codebook packs into one pqid-sorted
    array row PER SUBSPACE and broadcasts — the argmin evaluates
    inside each (vector, subspace) row's projection (array_min over
    struct(d2, pqid) = the former Window's (d2 ASC, pqid ASC)), so no
    n_codes-fold expansion and no per-(vec_id, s) Exchange + Sort."""
    cc = cb.withColumn("cc", F.expr(dot_expr("cent", "cent")))
    packed = cc.groupBy("s").agg(
        F.array_sort(F.collect_list(F.struct("pqid", "cent", "cc"))).alias("cs")
    )
    best = (
        "array_min(transform(cs, c -> named_struct("
        f"'d2', svv - 2 * ({dot_expr('semb', 'c.cent')}) + c.cc, "
        "'pqid', c.pqid)))"
    )
    return rsub.join(F.broadcast(packed), "s").select(
        "vec_id", "cid", "s", "semb", "svv",
        F.expr(f"{best}.pqid").alias("pqid"),
    )


def _ivfpq_parts(
    embeddings: DataFrame,
    n_clusters: int,
    n_iters: int,
    m: int,
    dsub: int,
    n_codes: int,
):
    """Shared training pipeline: (cents, res, codes, codebook) — the
    coarse quantizer, per-vector residuals, PQ codes, and the trained
    residual codebook. Used by the in-query operator and the
    persisted-index build so a probe of a fresh index reproduces the
    in-query result exactly."""
    vecs = _ivf_vecs(embeddings)
    cents = _train_centroids(vecs, n_clusters, n_iters)
    assigned = _ivf_assign(vecs, cents)
    res = assigned.join(
        F.broadcast(cents.select("cid", "cent")), "cid"
    ).select(
        "vec_id", "cid", "emb", "vv",
        F.expr("zip_with(emb, cent, (x, c) -> x - c)").alias("remb"),
    )
    rsub = _residual_subvectors(res, m, dsub)
    codebook = _train_pq_codebook(res, rsub, m, dsub, n_codes)
    codes = _assign_pq(rsub, codebook).select("vec_id", "cid", "s", "pqid")
    return cents, res, codes, codebook


def _ivfpq_rank(
    queries: DataFrame,
    cents: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    full_vecs: DataFrame,
    k: int,
    nprobe: int,
    m: int,
    dsub: int,
    rerank: int,
) -> DataFrame:
    """Probe + ADC + exact rerank over already-trained parts.
    ``queries``: (query_id, q_emb, q_vv, q_nrm). ``full_vecs``:
    (neighbor_id, n_emb, n_nrm) for the rerank stage."""
    # nearest-nprobe cells per query via the packed-array sort (zero
    # exchange; selection identical to the former (d2 ASC, cid ASC)
    # Window) — the probed cell's centroid rides along for the
    # query-residual computation
    nearest = (
        "slice(array_sort(transform(cs, c -> named_struct("
        f"'d2', q_vv - 2 * ({dot_expr('q_emb', 'c.cent')}) + c.cc, "
        f"'cid', c.cid, 'cent', c.cent))), 1, {nprobe})"
    )
    probes = (
        queries.crossJoin(F.broadcast(_pack_cents(cents)))
        .select("query_id", "q_emb", F.explode(F.expr(nearest)).alias("p"))
        .select(
            "query_id",
            F.col("p.cid").alias("cid"),
            F.expr("zip_with(q_emb, p.cent, (x, c) -> x - c)").alias("qremb"),
        )
    )
    q_rsub = (
        probes.select(
            "query_id", "cid",
            F.expr(
                f"explode(transform(sequence(0, {m - 1}), "
                f"s -> named_struct('s', s, "
                f"'semb', slice(qremb, s * {dsub} + 1, {dsub}))))"
            ).alias("x"),
        )
        .select(
            "query_id", "cid",
            F.col("x.s").alias("s"), F.col("x.semb").alias("q_semb"),
        )
        .withColumn("q_svv", F.expr(dot_expr("q_semb", "q_semb")))
    )
    cc = codebook.withColumn("cc", F.expr(dot_expr("cent", "cent")))
    # per-(query, probed-cell) ADC lookup table: tiny
    # (|queries| * nprobe * m * n_codes) — broadcast; integer micros
    # make the m-partial sum associativity-proof across engines
    lut = q_rsub.join(F.broadcast(cc), "s").select(
        "query_id", "cid", "s", "pqid",
        F.expr(
            f"CAST(round((q_svv - 2 * ({dot_expr('q_semb', 'cent')}) + cc)"
            " * 1000000, 0) AS BIGINT)"
        ).alias("pd2_micro"),
    )
    pairs = (
        codes.join(F.broadcast(lut), ["cid", "s", "pqid"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pd2_micro").alias("d2_micro"))
    )
    w_r = Window.partitionBy("query_id").orderBy(
        F.col("d2_micro").asc(), F.col("vec_id").asc()
    )
    shortlist = (
        pairs.withColumn("rn", F.row_number().over(w_r))
        .filter(F.col("rn") <= rerank)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    qv = queries.select(
        "query_id", F.col("q_emb").alias("qq_emb"), "q_nrm"
    )
    rescored = (
        shortlist.join(F.broadcast(qv), "query_id")
        .join(full_vecs, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.expr(dot_expr("qq_emb", "n_emb"))
                / (F.col("q_nrm") * F.col("n_nrm")),
                6,
            ).alias("cosine"),
        )
    )
    w_k = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rn", F.row_number().over(w_k))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def ivfpq_topk(
    embeddings: DataFrame,
    k: int = PQ_TOP_K,
    query_modulus: int = QUERY_MODULUS,
    n_clusters: int = IVF_KCLUSTERS,
    n_iters: int = IVF_ITERS,
    nprobe: int = IVF_NPROBE,
    m: int = PQ_M,
    dsub: int = PQ_DSUB,
    n_codes: int = PQ_K,
    rerank: int = PQ_RERANK,
    query_limit: int | None = None,
) -> DataFrame:
    """IVF-PQ ANN trained END-TO-END in the query: deterministic
    Lloyd's coarse quantizer (shared with similarity_ivf_trained) →
    per-vector residuals → shared residual codebook (the pq_adc_topk
    recipe on residuals) → nprobe-cell probes ranked by integer-micro
    ADC against per-(query, cell) LUTs → exact cosine re-rank of the
    shortlist. Output (query_id, neighbor_id, cosine) like every ANN
    entry; every step engine-portable (``ivfpq_oracle_sql``).

    Scale shape: this is the FAISS IVFPQ layout — candidates are
    bounded by the probed cells (nprobe/n_clusters of the corpus) AND
    scanned in compressed form (m code ids per vector, the LUT join
    replacing full-precision math); the only full-vector touches are
    the rerank shortlist. The persisted twin (build_ivfpq_index /
    probe_ivfpq_index) partitions codes by cell so probes prune at
    the file listing."""
    cents, res, codes, codebook = _ivfpq_parts(
        embeddings, n_clusters, n_iters, m, dsub, n_codes
    )
    vecs = _ivf_vecs(embeddings)
    q = _query_sample(
        vecs.withColumn("nrm", F.expr("sqrt(vv)")), query_modulus, query_limit
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("vv").alias("q_vv"),
        F.col("nrm").alias("q_nrm"),
    )
    full_vecs = vecs.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("n_emb"),
        F.expr("sqrt(vv)").alias("n_nrm"),
    )
    return _ivfpq_rank(
        q, cents, codes, codebook, full_vecs, k, nprobe, m, dsub, rerank
    )


def ivfpq_oracle_sql(
    k: int = PQ_TOP_K,
    query_modulus: int = QUERY_MODULUS,
    n_clusters: int = IVF_KCLUSTERS,
    n_iters: int = IVF_ITERS,
    nprobe: int = IVF_NPROBE,
    m: int = PQ_M,
    dsub: int = PQ_DSUB,
    n_codes: int = PQ_K,
    rerank: int = PQ_RERANK,
    query_limit: int | None = None,
) -> str:
    """DuckDB twin of ``ivfpq_topk``: the ivf_trained training chain,
    residuals via element-wise list_zip subtraction (IEEE doubles —
    identical inputs, identical outputs), the PQ codebook recipe on
    residuals, per-(query, cell) LUTs with integer-micro partials,
    and the same shortlist→exact-re-rank."""
    from ..functions.hashing import duck_hash64

    dh = duck_hash64("CAST(vec_id AS VARCHAR)")
    d2 = (
        "v.vv - 2 * list_dot_product(v.emb, c.cent) "
        "+ list_dot_product(c.cent, c.cent)"
    )
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)",
        "v AS (SELECT vec_id, emb, list_dot_product(emb, emb) AS vv FROM e)",
        f"seed_sel AS (SELECT vec_id, emb FROM v ORDER BY {dh}, vec_id LIMIT {n_clusters})",
        f"c0 AS (SELECT CAST(row_number() OVER (ORDER BY {dh}, vec_id) - 1 AS BIGINT) AS cid, "
        "emb AS cent FROM seed_sel)",
    ]
    prev = "c0"
    for i in range(1, n_iters + 1):
        ctes.append(
            f"a{i} AS (SELECT vec_id, emb, vv, cid FROM ("
            f"SELECT v.vec_id, v.emb, v.vv, c.cid, "
            f"row_number() OVER (PARTITION BY v.vec_id ORDER BY {d2} ASC, c.cid ASC) AS rn "
            f"FROM v CROSS JOIN {prev} c) WHERE rn = 1)"
        )
        ctes.append(
            f"c{i} AS (SELECT cid, array_agg(av ORDER BY i) AS cent FROM ("
            f"SELECT cid, i, round(avg(emb[i]), 6) AS av "
            f"FROM a{i}, UNNEST(generate_series(1, len(emb))) AS g(i) "
            f"GROUP BY cid, i) GROUP BY cid)"
        )
        prev = f"c{i}"
    ctes.append(
        f"af AS (SELECT vec_id, emb, vv, cid FROM ("
        f"SELECT v.vec_id, v.emb, v.vv, c.cid, "
        f"row_number() OVER (PARTITION BY v.vec_id ORDER BY {d2} ASC, c.cid ASC) AS rn "
        f"FROM v CROSS JOIN {prev} c) WHERE rn = 1)"
    )
    # residuals + residual subvectors
    ctes.append(
        f"r AS (SELECT a.vec_id, a.cid, "
        f"list_transform(list_zip(a.emb, c.cent), p -> p[1] - p[2]) AS remb "
        f"FROM af a JOIN {prev} c ON a.cid = c.cid)"
    )
    sub_slice = f"remb[g.s * {dsub} + 1 : (g.s + 1) * {dsub}]"
    ctes.append(
        f"rsub AS (SELECT vec_id, cid, g.s AS s, {sub_slice} AS semb, "
        f"list_dot_product({sub_slice}, {sub_slice}) AS svv "
        f"FROM r, UNNEST(generate_series(0, {m - 1})) AS g(s))"
    )
    # PQ codebook on residuals: seed + one rounded Lloyd's update
    ctes.append(
        f"pqseeds AS (SELECT CAST(row_number() OVER (ORDER BY {dh}, vec_id) - 1 AS BIGINT) "
        f"AS pqid, remb FROM (SELECT r.remb, r.vec_id FROM r "
        f"ORDER BY {duck_hash64('CAST(r.vec_id AS VARCHAR)')}, r.vec_id LIMIT {n_codes}))"
    )
    cb_slice = f"remb[g.s * {dsub} + 1 : (g.s + 1) * {dsub}]"
    ctes.append(
        f"cb0 AS (SELECT pqid, g.s AS s, {cb_slice} AS cent "
        f"FROM pqseeds, UNNEST(generate_series(0, {m - 1})) AS g(s))"
    )
    pd2 = (
        "a.svv - 2 * list_dot_product(a.semb, c.cent) "
        "+ list_dot_product(c.cent, c.cent)"
    )
    ctes.append(
        f"pa0 AS (SELECT vec_id, cid, s, semb, pqid FROM ("
        f"SELECT a.vec_id, a.cid, a.s, a.semb, c.pqid, "
        f"row_number() OVER (PARTITION BY a.vec_id, a.s ORDER BY {pd2} ASC, c.pqid ASC) AS rn "
        f"FROM rsub a JOIN cb0 c ON a.s = c.s) WHERE rn = 1)"
    )
    ctes.append(
        f"cb1 AS (SELECT s, pqid, array_agg(av ORDER BY i) AS cent FROM ("
        f"SELECT s, pqid, i, round(avg(semb[i]), 6) AS av "
        f"FROM pa0, UNNEST(generate_series(1, {dsub})) AS g(i) "
        f"GROUP BY s, pqid, i) GROUP BY s, pqid)"
    )
    ctes.append(
        f"codes AS (SELECT vec_id, cid, s, pqid FROM ("
        f"SELECT a.vec_id, a.cid, a.s, c.pqid, "
        f"row_number() OVER (PARTITION BY a.vec_id, a.s ORDER BY {pd2} ASC, c.pqid ASC) AS rn "
        f"FROM rsub a JOIN cb1 c ON a.s = c.s) WHERE rn = 1)"
    )
    # queries, probes, per-(query, cell) residual LUT
    ctes.append(
        f"q AS (SELECT vec_id AS query_id, emb AS q_emb, vv AS q_vv, "
        f"sqrt(vv) AS q_nrm FROM v {_query_sample_sql(query_modulus, query_limit)})"
    )
    qd2 = (
        "q.q_vv - 2 * list_dot_product(q.q_emb, c.cent) "
        "+ list_dot_product(c.cent, c.cent)"
    )
    ctes.append(
        f"probe AS (SELECT query_id, cid, "
        f"list_transform(list_zip(q_emb, cent), p -> p[1] - p[2]) AS qremb FROM ("
        f"SELECT q.query_id, q.q_emb, c.cid, c.cent, "
        f"row_number() OVER (PARTITION BY q.query_id ORDER BY {qd2} ASC, c.cid ASC) AS rn "
        f"FROM q CROSS JOIN {prev} c) WHERE rn <= {nprobe})"
    )
    q_slice = f"qremb[g.s * {dsub} + 1 : (g.s + 1) * {dsub}]"
    ctes.append(
        f"qrsub AS (SELECT query_id, cid, g.s AS s, {q_slice} AS q_semb, "
        f"list_dot_product({q_slice}, {q_slice}) AS q_svv "
        f"FROM probe, UNNEST(generate_series(0, {m - 1})) AS g(s))"
    )
    ctes.append(
        "lut AS (SELECT u.query_id, u.cid, u.s, c.pqid, "
        "CAST(round((u.q_svv - 2 * list_dot_product(u.q_semb, c.cent) "
        "+ list_dot_product(c.cent, c.cent)) * 1000000, 0) AS BIGINT) AS pd2_micro "
        "FROM qrsub u JOIN cb1 c ON u.s = c.s)"
    )
    ctes.append(
        "pairs AS (SELECT l.query_id, x.vec_id, sum(l.pd2_micro) AS d2_micro "
        "FROM codes x JOIN lut l ON x.cid = l.cid AND x.s = l.s AND x.pqid = l.pqid "
        "WHERE x.vec_id != l.query_id GROUP BY l.query_id, x.vec_id)"
    )
    ctes.append(
        f"shortlist AS (SELECT query_id, vec_id AS neighbor_id FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY query_id "
        f"ORDER BY d2_micro ASC, vec_id ASC) AS rn FROM pairs) WHERE rn <= {rerank})"
    )
    ctes.append(
        "vn AS (SELECT vec_id, emb, sqrt(vv) AS nrm FROM v)"
    )
    ctes.append(
        "rescored AS (SELECT s.query_id, s.neighbor_id, "
        "round(list_dot_product(q.emb, x.emb) / (q.nrm * x.nrm), 6) AS cosine "
        "FROM shortlist s JOIN vn q ON q.vec_id = s.query_id "
        "JOIN vn x ON x.vec_id = s.neighbor_id)"
    )
    ctes.append(
        "ranked AS (SELECT *, row_number() OVER ("
        "PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn "
        "FROM rescored)"
    )
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT query_id, neighbor_id, cosine FROM ranked WHERE rn <= {k}"
    )


def build_ivfpq_index(
    embeddings: DataFrame,
    index_dir: str,
    n_clusters: int = IVF_KCLUSTERS,
    n_iters: int = IVF_ITERS,
    m: int = PQ_M,
    dsub: int = PQ_DSUB,
    n_codes: int = PQ_K,
) -> None:
    """Persist an IVF-PQ index: the coarse quantizer and residual
    codebook train once; the corpus writes PARTITIONED BY cell id
    with each vector's m PQ codes packed as an array (the compressed
    scan payload) plus its full vector and norm (the rerank payload —
    a real deployment could split these into separate files; one
    table keeps the probe single-scan here). Probes after that read
    ONLY the nprobe cells they need (partition pruning, verified by
    inputFiles inspection in tests/test_ivf_index.py)."""
    cents, res, codes, codebook = _ivfpq_parts(
        embeddings, n_clusters, n_iters, m, dsub, n_codes
    )
    packed = (
        codes.groupBy("vec_id", "cid")
        .agg(
            F.array_sort(F.collect_list(F.struct("s", "pqid"))).alias("ps")
        )
        .select(
            "vec_id", "cid",
            F.expr("transform(ps, p -> p.pqid)").alias("pq_codes"),
        )
    )
    vecs = _ivf_vecs(embeddings)
    full = vecs.select("vec_id", "emb", F.expr("sqrt(vv)").alias("nrm"))
    packed.join(full, "vec_id").select(
        "vec_id", "emb", "nrm", "pq_codes", "cid"
    ).write.partitionBy("cid").mode("overwrite").parquet(
        f"{index_dir}/corpus"
    )
    cents.select("cid", "cent", "cc").write.mode("overwrite").parquet(
        f"{index_dir}/centroids"
    )
    codebook.write.mode("overwrite").parquet(f"{index_dir}/codebook")


def assign_to_ivfpq_index(
    spark,
    index_dir: str,
    embeddings: DataFrame,
    m: int = PQ_M,
    dsub: int = PQ_DSUB,
) -> DataFrame:
    """Assign NEW vectors to a persisted IVF-PQ index with the
    PERSISTED quantizers (VERDICT r14 item 5): cells by the exact
    build/probe centroid expression, residual PQ codes by the
    persisted codebook — NO retraining, so an appended vector gets
    exactly the (cid, pq_codes) a one-shot rebuild with these
    quantizers would give it. Returns the persisted-corpus row shape
    (vec_id, emb, nrm, pq_codes, cid). The streaming maintenance
    path (streaming/ingest.py::stream_incremental_similarity_pq)
    calls this per micro-batch; centroid and codebook tables are
    tiny and broadcast."""
    cents = spark.read.parquet(f"{index_dir}/centroids")
    codebook = spark.read.parquet(f"{index_dir}/codebook")
    vecs = _ivf_vecs(embeddings)
    assigned = _ivf_assign(vecs, cents)
    res = assigned.join(
        F.broadcast(cents.select("cid", "cent")), "cid"
    ).select(
        "vec_id", "cid", "emb", "vv",
        F.expr("zip_with(emb, cent, (x, c) -> x - c)").alias("remb"),
    )
    codes = _assign_pq(_residual_subvectors(res, m, dsub), codebook)
    packed = (
        codes.groupBy("vec_id", "cid")
        .agg(
            F.array_sort(F.collect_list(F.struct("s", "pqid"))).alias("ps")
        )
        .select(
            "vec_id", "cid",
            F.expr("transform(ps, p -> p.pqid)").alias("pq_codes"),
        )
    )
    full = assigned.select(
        "vec_id", "emb", F.expr("sqrt(vv)").alias("nrm")
    )
    return packed.join(full, "vec_id").select(
        "vec_id", "emb", "nrm", "pq_codes", "cid"
    )


def compact_ivfpq_delta(spark, index_dir: str, delta: DataFrame) -> int:
    """Fold streamed IVF-PQ delta rows (vec_id, emb, nrm, pq_codes,
    cid) into the partitioned base corpus, rewriting ONLY the cells
    the delta touches (dynamic partition overwrite) — the
    compact_ivf_delta discipline for the PQ-coded index. Returns the
    number of cells rewritten; probe(base') ≡ probe(base, delta)
    because both sides carry exactly the same rows.

    As in ``compact_ivf_delta``: the delta is deduped on vec_id and
    the base side is anti-joined against the delta's vec_ids (delta
    wins), so a vec_id present in both sides is written exactly once
    — mirroring ``probe_ivfpq_index``'s broadcast anti-join."""
    d = delta.select("vec_id", "emb", "nrm", "pq_codes", "cid").dropDuplicates(
        ["vec_id"]
    )
    cells = [r["cid"] for r in d.select("cid").distinct().collect()]
    if not cells:
        return 0
    base = spark.read.parquet(f"{index_dir}/corpus").filter(
        F.col("cid").isin(cells)
    )
    merged = (
        base.join(F.broadcast(d.select("vec_id")), "vec_id", "left_anti")
        .unionByName(d)
        .localCheckpoint()  # sever self-read-overwrite lineage
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cid")
        .parquet(f"{index_dir}/corpus")
    )
    return len(cells)


def probe_ivfpq_index(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = PQ_TOP_K,
    nprobe: int = IVF_NPROBE,
    m: int = PQ_M,
    dsub: int = PQ_DSUB,
    rerank: int = PQ_RERANK,
    delta: DataFrame | None = None,
) -> DataFrame:
    """Serve top-k from a persisted IVF-PQ index: nprobe cells per
    query (tiny centroid table), partition-pruned scan of ONLY those
    cells, ADC ranking of the packed codes against broadcast
    per-(query, cell) LUTs, exact cosine re-rank of the shortlist.
    Scoring matches ``ivfpq_topk`` expression-for-expression, so a
    probe of a freshly built index returns exactly the in-query
    result (pinned in tests). ``queries``: (query_id, q_emb
    double[])."""
    cents = spark.read.parquet(f"{index_dir}/centroids")
    codebook = spark.read.parquet(f"{index_dir}/codebook")
    q = queries.select(
        "query_id",
        "q_emb",
        F.expr(dot_expr("q_emb", "q_emb")).alias("q_vv"),
    ).withColumn("q_nrm", F.expr("sqrt(q_vv)"))
    qd = q.crossJoin(F.broadcast(cents)).withColumn(
        "d2", F.expr(f"q_vv - 2 * ({dot_expr('q_emb', 'cent')}) + cc")
    )
    w_p = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("cid").asc()
    )
    probes = (
        qd.withColumn("rn", F.row_number().over(w_p))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "q_emb", "q_vv", "q_nrm", "cid", "cent")
        .localCheckpoint()  # one probe assignment for cid-list + join
    )
    cell_ids = [r["cid"] for r in probes.select("cid").distinct().collect()]
    corpus = spark.read.parquet(f"{index_dir}/corpus").filter(
        F.col("cid").isin(cell_ids)
    )
    if delta is not None:
        # streaming-appended vectors (stream_incremental_similarity_pq):
        # base partition-prunes, the cadence-bounded delta is one
        # pushed-predicate scan; the delta WINS on vec_id collision
        # (probe between compact and truncate, or re-delivery) via the
        # broadcast anti-join, so top-k never seats a vec_id twice —
        # the probe_ivf_index discipline.
        d = (
            delta.select("vec_id", "emb", "nrm", "pq_codes", "cid")
            .filter(F.col("cid").isin(cell_ids))
            .dropDuplicates(["vec_id"])
        )
        corpus = corpus.join(
            F.broadcast(d.select("vec_id")), "vec_id", "left_anti"
        ).unionByName(d)
        corpus = corpus.localCheckpoint()  # one scan for ADC + rerank
    # unpack codes to (vec_id, cid, s, pqid) rows — cheap integer rows
    codes = corpus.select(
        "vec_id", "cid", F.posexplode("pq_codes").alias("s", "pqid")
    )
    q_rsub = (
        probes.select(
            "query_id", "cid",
            F.expr("zip_with(q_emb, cent, (x, c) -> x - c)").alias("qremb"),
        )
        .select(
            "query_id", "cid",
            F.expr(
                f"explode(transform(sequence(0, {m - 1}), "
                f"s -> named_struct('s', s, "
                f"'semb', slice(qremb, s * {dsub} + 1, {dsub}))))"
            ).alias("x"),
        )
        .select(
            "query_id", "cid",
            F.col("x.s").alias("s"), F.col("x.semb").alias("q_semb"),
        )
        .withColumn("q_svv", F.expr(dot_expr("q_semb", "q_semb")))
    )
    cc = codebook.withColumn("cc", F.expr(dot_expr("cent", "cent")))
    lut = q_rsub.join(F.broadcast(cc), "s").select(
        "query_id", "cid", "s", "pqid",
        F.expr(
            f"CAST(round((q_svv - 2 * ({dot_expr('q_semb', 'cent')}) + cc)"
            " * 1000000, 0) AS BIGINT)"
        ).alias("pd2_micro"),
    )
    pairs = (
        codes.join(F.broadcast(lut), ["cid", "s", "pqid"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pd2_micro").alias("d2_micro"))
    )
    w_r = Window.partitionBy("query_id").orderBy(
        F.col("d2_micro").asc(), F.col("vec_id").asc()
    )
    shortlist = (
        pairs.withColumn("rn", F.row_number().over(w_r))
        .filter(F.col("rn") <= rerank)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    qv = probes.select("query_id", F.col("q_emb").alias("qq_emb"), "q_nrm").distinct()
    nv = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("n_emb"),
        F.col("nrm").alias("n_nrm"),
    )
    rescored = (
        shortlist.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.expr(dot_expr("qq_emb", "n_emb"))
                / (F.col("q_nrm") * F.col("n_nrm")),
                6,
            ).alias("cosine"),
        )
    )
    w_k = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rn", F.row_number().over(w_k))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )
