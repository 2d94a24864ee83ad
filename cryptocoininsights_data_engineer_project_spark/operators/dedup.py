"""Deduplication operators for LLM-scale corpora.

Four tiers, cheapest to priciest, all over a ``documents``-shaped
DataFrame (``doc_id bigint, text string``):

- exact:        group on a normalized fingerprint (one shuffle on the
                fingerprint — the 100 TB plan: map-side partial
                aggregation, then a single hash-partitioned reduce).
- MinHash+LSH:  word-shingles → k universal min-hashes → b bands of r
                rows → bucket join. The self-join is on (band, hash),
                i.e. only near-identical docs meet — no O(n²) stage.
- SimHash:      32-bit sign-aggregated token hash per doc; Hamming
                buckets come free by grouping on the code.
- n-gram Jaccard: exact verification join on *rare* shingles
                (document-frequency cap) — the standard trick that
                keeps hot shingles from going quadratic at scale.

Every operator's hash derives from md5 (functions.hashing) so the
DuckDB oracle can reproduce results bit-for-bit; each has a
``*_oracle_sql`` twin generated from the SAME constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.spread import spread
from ..functions.hashing import (
    HASH_PRIME,
    duck_hash64,
    duck_minhash_term,
    minhash_params,
    spark_hash64,
    spark_minhash_term,
)
from ..functions.textnorm import (
    duck_norm,
    duck_tokens,
    spark_norm,
    spark_tokens,
)

# LSH geometry: k = BANDS * ROWS signatures. r=2 keeps the candidate
# threshold low enough (~ (1/b)^(1/r) ≈ 0.35 Jaccard) to surface pairs
# in the synthetic corpus; production would tune upward.
MINHASH_K = 16
LSH_BANDS = 8
LSH_ROWS = 2
SHINGLE_W = 3
MINHASH_SEED = 42
SIMHASH_BITS = 32
# Hamming-neighbor search geometry: 4 chunks of 8 bits. Pigeonhole: a
# pair within Hamming distance 3 differs in <= 3 chunks, so it agrees
# EXACTLY on at least one — banding is recall-lossless for r <= 3.
SIMHASH_CHUNKS = 4
SIMHASH_MAX_HAMMING = 3
JACCARD_MAX_DF = 20

_PARAMS = minhash_params(MINHASH_K, MINHASH_SEED)


# ---------------------------------------------------------------- shingles
def shingle_docs(docs: DataFrame, w: int = SHINGLE_W) -> DataFrame:
    """(doc_id, shingle) — distinct word w-shingles per document.

    posexplode + indexed lookups instead of a nested ``transform``
    lambda building the shingle array: same rows, but the flat
    generator form avoids seconds of whole-stage-codegen compilation
    that the higher-order-function expression costs on first use."""
    # tokenize+explode is the map-side CPU of every shingle consumer
    # and runs in the scan's own partitions — spread the narrow
    # projection when the scan under-splits (conditional helper:
    # provable no-op at production split counts)
    toks = spread(docs.select("doc_id", "text")).select(
        "doc_id", F.expr(spark_tokens("text")).alias("ws")
    )
    idx = toks.select("doc_id", "ws", F.posexplode("ws").alias("i", "_tok"))
    parts = [F.expr(f"ws[i + {j}]") for j in range(w)]
    return (
        idx.filter(F.expr(f"i + {w} <= size(ws)"))
        .select("doc_id", F.concat_ws(" ", *parts).alias("shingle"))
        .distinct()
    )


def _duck_shingle_cte(w: int = SHINGLE_W) -> str:
    """CTE chain producing (doc_id, shingle) in DuckDB, identical to
    ``shingle_docs``."""
    parts = " || ' ' || ".join(f"ws[i + {j}]" for j in range(w))
    return (
        f"toks AS (SELECT doc_id, {duck_tokens('text')} AS ws FROM documents), "
        f"sh AS (SELECT DISTINCT doc_id, {parts} AS shingle "
        f"FROM toks, UNNEST(generate_series(1, len(ws) - {w - 1})) AS g(i) "
        f"WHERE len(ws) >= {w})"
    )


def _ordered_pairs(buckets: DataFrame, ids_col: str = "ids") -> DataFrame:
    """(doc_a, doc_b) with doc_a < doc_b from each bucket's sorted id
    list. Two chained generators (posexplode + slice) rather than a
    nested ``transform`` lambda: identical output, but the flat form
    whole-stage-codegens in milliseconds where the nested-lambda
    expression costs seconds of compilation on first use."""
    step = buckets.select(ids_col, F.posexplode(ids_col).alias("i", "doc_a"))
    return step.select(
        "doc_a",
        F.explode(F.expr(f"slice({ids_col}, i + 2, size({ids_col}))")).alias("doc_b"),
    )


# ------------------------------------------------------------- exact dedup
def exact_dedup_clusters(docs: DataFrame) -> DataFrame:
    """Exact near-duplicate clusters on a normalized-text fingerprint.

    Returns one row per distinct content: (fingerprint, keep_id =
    smallest doc_id, n_copies). Single hash aggregation — scales as a
    plain groupBy (partial agg map-side, one shuffle on fingerprint).
    """
    return (
        docs.select(
            "doc_id", F.md5(F.expr(spark_norm("text"))).alias("fingerprint")
        )
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup_oracle_sql() -> str:
    return (
        f"SELECT md5({duck_norm('text')}) AS fingerprint, "
        f"min(doc_id) AS keep_id, count(*) AS n_copies "
        f"FROM documents GROUP BY 1"
    )


# ----------------------------------------------------------- MinHash + LSH
def minhash_signatures(docs: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """(doc_id, s0..s{k-1}) MinHash signature matrix.

    One shuffle: groupBy(doc_id) with k partial mins — Catalyst turns
    this into a single hash aggregate with map-side combine, so the
    shuffle carries one row per (doc, partial-sig), not per shingle.
    """
    h = shingle_docs(docs).select(
        "doc_id", F.expr(spark_hash64("shingle")).alias("h")
    )
    aggs = [
        F.min(F.expr(spark_minhash_term(a, b, "h"))).alias(f"s{i}")
        for i, (a, b) in enumerate(_PARAMS[:k])
    ]
    return h.groupBy("doc_id").agg(*aggs)


def minhash_bands(sigs: DataFrame, bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> DataFrame:
    """(doc_id, band_id, band_hash): md5 over each band's slice of the
    signature. Exploding bands multiplies rows by ``bands`` but each row
    is tiny; the subsequent join partitions on (band_id, band_hash)."""
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"s{b * rows + r}").cast("string") for r in range(rows)]
        band_structs.append(
            F.struct(F.lit(b).alias("band_id"), F.md5(F.concat_ws(",", *cols)).alias("band_hash"))
        )
    return sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_hash")


def minhash_candidate_pairs(
    docs: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b) candidate near-duplicate pairs: docs agreeing on
    at least one full LSH band.

    Physical shape: a band self-join would evaluate the whole
    shingle→signature pipeline TWICE (Spark's exchange reuse does not
    kick in reliably across self-join aliases — at 100 TB that's
    re-tokenizing the corpus). Instead, group each (band_id, band_hash)
    bucket once, collect its (tiny, near-dup-only) member list, and
    explode ordered pairs in place: single pipeline, one extra shuffle,
    no second scan. Bucket membership is bounded by true duplicate
    cluster size; a pathological all-identical corpus is the only skew
    case, and AQE splits that reduce."""
    # callers that already hold (materialized) signatures pass them in,
    # saving a second shingle->hash->min-agg pass over the corpus
    b = minhash_bands(
        minhash_signatures(docs, k) if sigs is None else sigs, bands, rows
    )
    buckets = (
        b.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    return _ordered_pairs(buckets).distinct()


def _minhash_cte_chain(
    k: int = MINHASH_K, bands: int = LSH_BANDS, rows: int = LSH_ROWS
) -> str:
    """Shared CTE prefix (sh → h → sig → bands → cand) for every
    MinHash oracle — pairs, accuracy audit, clusters all extend it."""
    mins = ", ".join(
        f"min({duck_minhash_term(a, b, 'h')}) AS s{i}"
        for i, (a, b) in enumerate(_PARAMS[:k])
    )
    band_selects = []
    for b in range(bands):
        cols = " || ',' || ".join(
            f"CAST(s{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band_id, md5({cols}) AS band_hash FROM sig"
        )
    return (
        f"{_duck_shingle_cte()}, "
        f"h AS (SELECT doc_id, {duck_hash64('shingle')} AS h FROM sh), "
        f"sig AS (SELECT doc_id, {mins} FROM h GROUP BY doc_id), "
        f"bands AS ({' UNION ALL '.join(band_selects)}), "
        f"cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        f"FROM bands a JOIN bands b "
        f"ON a.band_id = b.band_id AND a.band_hash = b.band_hash "
        f"AND a.doc_id < b.doc_id)"
    )


def minhash_pairs_oracle_sql(
    k: int = MINHASH_K, bands: int = LSH_BANDS, rows: int = LSH_ROWS
) -> str:
    return (
        f"WITH {_minhash_cte_chain(k, bands, rows)} "
        f"SELECT doc_a, doc_b FROM cand"
    )


# ----------------------------------------------------------------- SimHash
def simhash(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash): sign-aggregated feature hash over word
    w-SHINGLES (the Manku/Charikar web-crawl form), not unigrams. One
    shingle generator + one grouped aggregation.

    Shingles, not tokens, because unigram bit votes are dominated by
    the corpus's high-frequency head — on a realistic 4000-type Zipf
    corpus at 50k docs (the sf1 sweep) unigram codes concentrated 63%
    of the corpus into ONE 8-bit chunk bucket (954M candidate pairs —
    quadratic death for engine and oracle alike), while 3-shingles,
    being near-unique per document, spread the same corpus to a 0.7%
    max bucket and 47x fewer candidates. Stopword dominance is the
    same failure the hashed-embedding tf_weight seam documents
    (operators/textops.py::hash_embed_docs)."""
    h = shingle_docs(docs).select(
        "doc_id", F.expr(spark_hash64("shingle")).alias("h")
    )
    # shiftright() rather than the >> operator: works on every Spark 3.x/4.x
    weights = [
        F.sum(
            F.expr(f"CASE WHEN (shiftright(h, {j}) & 1) = 1 THEN 1 ELSE -1 END")
        ).alias(f"w{j}")
        for j in range(bits)
    ]
    per_doc = h.groupBy("doc_id").agg(*weights)
    code = " + ".join(
        f"CASE WHEN w{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for j in range(bits)
    )
    return per_doc.select("doc_id", F.expr(code).alias("simhash"))


def simhash_oracle_sql(bits: int = SIMHASH_BITS) -> str:
    weights = ", ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS w{j}"
        for j in range(bits)
    )
    code = " + ".join(
        f"CASE WHEN w{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for j in range(bits)
    )
    return (
        f"WITH {_duck_shingle_cte()}, "
        f"h AS (SELECT doc_id, {duck_hash64('shingle')} AS h FROM sh), "
        f"w AS (SELECT doc_id, {weights} FROM h GROUP BY doc_id) "
        f"SELECT doc_id, {code} AS simhash FROM w"
    )


def simhash_hamming_pairs(
    docs: DataFrame,
    bits: int = SIMHASH_BITS,
    chunks: int = SIMHASH_CHUNKS,
    max_hamming: int = SIMHASH_MAX_HAMMING,
) -> DataFrame:
    """(doc_a, doc_b, hamming): near-duplicate pairs whose SimHash
    codes differ in at most ``max_hamming`` bits.

    Banding turns the Hamming-ball search into equi-joins: the code is
    split into ``chunks`` equal bit-chunks, and (pigeonhole) any pair
    within distance ``chunks - 1`` shares at least one chunk verbatim —
    so grouping on (chunk_id, chunk_value) surfaces every qualifying
    pair with zero recall loss, and only the (tiny, near-dup-bounded)
    bucket members are pair-exploded and popcount-verified.

    Physical shape mirrors ``minhash_candidate_pairs``: bucket-collect
    + in-place ordered-pair explosion from ONE pipeline — a chunk
    self-join would re-run the whole tokenize→simhash aggregation per
    side. At 100 TB bucket size is bounded by true near-dup density
    (an 8-bit chunk value shared by unrelated docs still requires the
    other 24 bits to verify, and the popcount filter drops them);
    a degenerate corpus of one repeated document is the only skew case,
    handled by AQE the same way as the LSH tier.
    """
    cw = bits // chunks
    mask = (1 << cw) - 1
    codes = simhash(docs, bits)
    chunk_structs = [
        F.struct(
            F.lit(c).alias("chunk_id"),
            F.expr(f"shiftright(simhash, {c * cw}) & {mask}").alias("chunk_val"),
        )
        for c in range(chunks)
    ]
    exploded = codes.select(
        F.struct("doc_id", "simhash").alias("ds"),
        F.explode(F.array(*chunk_structs)).alias("ch"),
    ).select("ds", F.col("ch.chunk_id"), F.col("ch.chunk_val"))
    buckets = (
        exploded.groupBy("chunk_id", "chunk_val")
        .agg(F.sort_array(F.collect_set("ds")).alias("members"))
        .filter(F.size("members") >= 2)
    )
    step = buckets.select("members", F.posexplode("members").alias("i", "a"))
    pairs = step.select(
        "a",
        F.explode(F.expr("slice(members, i + 2, size(members))")).alias("b"),
    )
    return (
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)").alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_pairs_oracle_sql(
    bits: int = SIMHASH_BITS,
    chunks: int = SIMHASH_CHUNKS,
    max_hamming: int = SIMHASH_MAX_HAMMING,
) -> str:
    cw = bits // chunks
    mask = (1 << cw) - 1
    code_sql = simhash_oracle_sql(bits)
    chunk_ids = ", ".join(f"({c})" for c in range(chunks))
    return f"""
WITH codes AS ({code_sql}),
chunked AS (
  SELECT doc_id, simhash, c.chunk_id,
         (simhash >> (c.chunk_id * {cw})) & {mask} AS chunk_val
  FROM codes, (VALUES {chunk_ids}) AS c(chunk_id)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM chunked a JOIN chunked b
  ON a.chunk_id = b.chunk_id AND a.chunk_val = b.chunk_val
 AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


# ----------------------------------------------------- duplicate clusters
def connected_components(
    pairs: DataFrame, max_rounds: int = 50
) -> tuple[DataFrame, int]:
    """Connected components over an undirected pair graph
    ``(doc_a, doc_b)`` → ``(doc_id, cluster_id)`` labels with
    cluster_id = smallest doc_id in the component. Returns
    ``(labels, rounds_used)``.

    Each round does min-label propagation (every node adopts the
    smallest label among itself and its neighbors — one equi-join +
    one groupBy) FOLLOWED by a pointer-jumping shortcut
    (``label(v) ← label(label(v))`` — a self-join on the label table,
    which is one row per node, far smaller than the edge list). Plain
    propagation alone needs O(component diameter) rounds — unbounded on
    an adversarial path graph (templated boilerplate chaining A≈B≈C…).
    The shortcut halves remaining label-tree depth every round, so
    convergence is O(log diameter): a 2^50-diameter component — more
    nodes than atoms in a planet — fits the default cap. This is the
    path-halving half of the large-star/small-star CC construction
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14); the full alternation is unnecessary once min-propagation
    supplies the neighbor step.

    Everything is distributed: the driver only compares a scalar
    convergence metric per round (sum of labels, strictly decreasing
    until fixpoint — min-propagation can only lower labels).
    ``max_rounds`` is a hard safety: exceeding it raises RuntimeError
    (diagnosis, not silence) — with log-convergence it is unreachable
    for any physical input and exists to catch a broken edge list
    (e.g. labels oscillating because ids changed dtype mid-plan).
    """
    # symmetric edge list, materialized ONCE — every propagation round
    # joins against it, and without the checkpoint each round would
    # re-run the whole upstream pair pipeline from the scan
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .localCheckpoint()
    )
    nodes = edges.select(F.col("src").alias("doc_id")).distinct()
    # lazy checkpoints: the convergence-sum job is what materializes
    # each round's label table, so checkpoint + scalar cost ONE job
    # per round instead of two (the eager form paid a materialize job
    # AND the sum job back to back)
    labels = nodes.withColumn("cluster_id", F.col("doc_id")).localCheckpoint(
        eager=False
    )
    prev_sum = labels.agg(F.sum("cluster_id")).first()[0] or 0
    for rounds in range(1, max_rounds + 1):
        neighbor = (
            edges.join(labels, edges.src == labels.doc_id)
            .select(F.col("dst").alias("doc_id"), "cluster_id")
        )
        stepped = (
            labels.unionByName(neighbor)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
        )
        # pointer jump: follow the label one hop through the label
        # table itself. Every label IS a node id (min over node ids,
        # seeded with self), so the inner join cannot drop rows.
        parent = stepped.select(
            F.col("doc_id").alias("cluster_id"),
            F.col("cluster_id").alias("_cc_parent"),
        )
        labels = (
            stepped.join(parent, "cluster_id")
            .select("doc_id", F.col("_cc_parent").alias("cluster_id"))
            # truncate the growing lineage each round; materialized by
            # the convergence sum below (one job, not two)
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(F.sum("cluster_id")).first()[0] or 0
        if cur_sum == prev_sum:
            return labels, rounds
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components failed to converge in {max_rounds} rounds — "
        "log-convergent pointer jumping makes this unreachable for any "
        "physical graph; suspect a corrupted edge list (dtype drift on "
        "doc ids, or nondeterministic pair generation upstream)"
    )


def dedup_clusters(docs: DataFrame) -> DataFrame:
    """(doc_id, cluster_id): connected components over the MinHash-LSH
    candidate-pair graph; cluster_id = smallest doc_id in the
    component (the canonical survivor a dedup pass would keep).
    Propagation machinery (and its giant-component guarantees):
    :func:`connected_components`.
    """
    # materialize the pairs BEFORE the symmetrizing self-union: the two
    # union branches share no exchange, so an uncheckpointed union
    # re-runs the whole shingle→minhash→band pipeline once per side
    pairs = minhash_candidate_pairs(docs).localCheckpoint()
    labels, _ = connected_components(pairs)
    return labels


def dedup_clusters_oracle_sql() -> str:
    """Transitive closure as a recursive CTE over the same pair graph."""
    pairs = minhash_pairs_oracle_sql()
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
walk(node, reach) AS (
  SELECT src, src FROM edges
  UNION
  SELECT w.node, e.dst FROM walk w JOIN edges e ON e.src = w.reach
)
SELECT node AS doc_id, CAST(min(reach) AS BIGINT) AS cluster_id
FROM walk GROUP BY node
"""


# ------------------------------------------------------------ exact Jaccard
def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    max_df: int = JACCARD_MAX_DF,
    w: int = SHINGLE_W,
) -> DataFrame:
    """Exact shingle-set Jaccard over candidate pairs that share at
    least one *rare* shingle (document frequency <= max_df).

    The df cap is what makes this tractable at 100 TB: shingles shared
    by thousands of docs contribute candidates quadratically but no
    discriminating signal; dropping them is standard practice and is
    mirrored exactly in the oracle.

    Physical shape: rare-shingle buckets collect their (df-capped, so
    bounded) member lists once and explode ordered pairs in place — no
    shingle self-join, so the corpus is tokenized twice (once for
    buckets, once for the per-doc size table) instead of six times.
    The size table is one row per doc — orders of magnitude smaller
    than the shingle table. The size lookups join onto the already-tiny
    candidate-pair set; AQE converts them to broadcasts when the stats
    allow (no static hint: at billion-doc scale the size table itself
    outgrows a broadcast, and the pair side is the small one)."""
    sh = shingle_docs(docs, w)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    buckets = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids").between(2, max_df))
    )
    inter = _ordered_pairs(buckets).groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("inter")
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        # integer-derived division: bit-identical across engines, no
        # rounding (round() boundary behavior is engine-specific)
        .withColumn(
            "jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_oracle_sql(
    threshold: float = 0.5, max_df: int = JACCARD_MAX_DF, w: int = SHINGLE_W
) -> str:
    return (
        f"WITH {_duck_shingle_cte(w)}, "
        f"sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id), "
        f"rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {max_df}), "
        f"shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)), "
        f"inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter "
        f"FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
        f"GROUP BY 1, 2) "
        f"SELECT doc_a, doc_b, "
        f"inter / (na.n_sh + nb.n_sh - inter) AS jaccard "
        f"FROM inter JOIN sizes na ON na.doc_id = doc_a "
        f"JOIN sizes nb ON nb.doc_id = doc_b "
        f"WHERE inter / (na.n_sh + nb.n_sh - inter) >= {threshold}"
    )


# -------------------------------------------------------- decontamination
# Benchmark decontamination (GPT-3 paper §C / PaLM-style): a corpus
# document is contaminated if it shares any word n-gram with a held-out
# benchmark document — those rows must not reach a training set, or
# eval numbers are fiction. The n-gram join is the exact-substring
# tier; the MinHash/SimHash tiers above catch fuzzier leakage.
def decontaminate(
    corpus: DataFrame, benchmark: DataFrame, w: int = 6
) -> DataFrame:
    """(doc_id, n_shared) — corpus docs sharing ≥1 word ``w``-gram with
    any benchmark doc, with the count of distinct shared shingles.

    Scale shape: the benchmark side is small by definition (eval sets
    are thousands of docs, the corpus is billions), so its distinct
    shingle set BROADCASTS and the probe is a map-side hash-semi pass
    over corpus shingles — no corpus shuffle at all until the final
    per-doc count, which groups the (already tiny) matched subset.
    One corpus scan; shingling runs inside it (shingle_docs generator
    form, no codegen-hostile lambdas).
    """
    sh_c = shingle_docs(corpus, w)
    sh_b = shingle_docs(benchmark, w).select("shingle").distinct()
    return (
        sh_c.join(F.broadcast(sh_b), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def contamination_report(
    corpus: DataFrame, benchmark: DataFrame, w: int = 6
) -> DataFrame:
    """(bench_doc_id, n_corpus_docs, n_hits) — the TRANSPOSE of
    ``decontaminate``: per held-out benchmark document, how many
    corpus documents share at least one word ``w``-gram with it and
    the total count of shared (corpus doc, shingle) matches. This is
    the audit a benchmark OWNER publishes (which eval items leaked
    into the training corpus, and how badly) next to the corpus-side
    drop list decontaminate produces.

    Same physical shape as decontaminate — the benchmark shingle set
    broadcasts WITH its doc identity (still bounded: |bench| x
    shingles/doc rows), the corpus scans once, and the join output is
    bounded by true contamination density; the final aggregate groups
    the tiny matched subset by benchmark doc."""
    sh_c = shingle_docs(corpus, w)
    sh_b = shingle_docs(benchmark, w).select(
        F.col("doc_id").alias("bench_doc_id"), "shingle"
    )
    return (
        sh_c.join(F.broadcast(sh_b), "shingle")
        .groupBy("bench_doc_id")
        .agg(
            F.countDistinct("doc_id").alias("n_corpus_docs"),
            F.count(F.lit(1)).alias("n_hits"),
        )
    )


def contamination_report_oracle_sql(
    corpus_pred: str, benchmark_pred: str, w: int = 6
) -> str:
    """DuckDB twin over the `documents` view split by two predicates."""
    parts = " || ' ' || ".join(f"ws[i + {j}]" for j in range(w))
    return f"""
WITH toks AS (SELECT doc_id, {duck_tokens('text')} AS ws FROM documents),
sh AS (
  SELECT DISTINCT doc_id, {parts} AS shingle
  FROM toks, UNNEST(generate_series(1, len(ws) - {w - 1})) AS g(i)
  WHERE len(ws) >= {w}
),
sh_c AS (SELECT doc_id, shingle FROM sh WHERE {corpus_pred}),
sh_b AS (SELECT doc_id AS bench_doc_id, shingle FROM sh WHERE {benchmark_pred})
SELECT bench_doc_id,
  CAST(count(DISTINCT sh_c.doc_id) AS BIGINT) AS n_corpus_docs,
  CAST(count(*) AS BIGINT) AS n_hits
FROM sh_c JOIN sh_b USING (shingle)
GROUP BY bench_doc_id
"""


def decontaminate_oracle_sql(
    corpus_pred: str, benchmark_pred: str, w: int = 6
) -> str:
    """DuckDB twin over the `documents` view split by two predicates."""
    parts = " || ' ' || ".join(f"ws[i + {j}]" for j in range(w))
    return f"""
WITH toks AS (SELECT doc_id, {duck_tokens('text')} AS ws FROM documents),
sh AS (
  SELECT doc_id, {parts} AS shingle
  FROM toks, UNNEST(generate_series(1, len(ws) - {w - 1})) AS g(i)
  WHERE len(ws) >= {w}
),
sh_c AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE {corpus_pred}),
sh_b AS (SELECT DISTINCT shingle FROM sh WHERE {benchmark_pred})
SELECT doc_id, count(*) AS n_shared
FROM sh_c JOIN sh_b USING (shingle)
GROUP BY doc_id
"""


# --------------------------------------------- exact substring-span dedup
# Span width for duplicate-substring scrubbing: any word 8-gram seen
# before (in this doc or any earlier one) is scrubbed. Production
# systems (suffix-array dedup per Lee et al., "Deduplicating Training
# Data Makes Language Models Better") use ~50-token repeats; 8 fits
# the short synthetic docs while exercising the identical plan.
SUBSTR_N = 8


def substring_dedup(docs: DataFrame, n: int = SUBSTR_N) -> DataFrame:
    """Exact duplicate-SPAN dedup: scrub every word ``n``-gram whose
    first corpus occurrence is elsewhere, keeping the first occurrence
    (smallest (doc_id, position)). Unlike whole-document dedup this
    removes boilerplate *inside* otherwise-distinct documents — the
    dominant duplication mode in web corpora. Output one row per doc:
    (doc_id, clean_text, n_kept, n_dropped).

    Plan shape (all linear, no pair joins anywhere):
    1. per-doc word array → sliding n-gram md5 fingerprints, built with
       array expressions inside codegen (no explode of the gram text);
    2. one groupBy(gram) keeping min(struct(doc_id, start)) — map-side
       combine makes the shuffle one row per DISTINCT gram;
    3. join grams back to keepers on the gram hash: fan-out bounded by
       occurrence count, i.e. by the duplication actually present;
    4. duplicate spans explode to their n covered positions (constant
       factor n), distinct, and anti-join against the exploded words on
       (doc_id, pos) — both shuffles on well-distributed composite keys;
    5. per-doc reassembly: collect (pos, word), sort, join — one final
       groupBy(doc_id).
    A hot boilerplate gram repeated 10^6 times costs exactly its 10^6
    span scrubs, never a pairwise comparison. Docs shorter than ``n``
    words pass through unchanged; a fully-duplicated doc comes back as
    an empty string (standard practice drops those downstream).
    """
    w = docs.select("doc_id", F.split("text", " ").alias("w"))
    # generator form (posexplode + indexed concat), NOT a transform()
    # lambda building gram structs: identical rows, but the flat form
    # whole-stage-codegens in milliseconds where the nested-lambda
    # expression costs seconds of compilation on first use (same
    # lesson as shingle_docs above).
    idx = w.select("doc_id", "w", F.posexplode("w").alias("i0", "_tok"))
    parts = [F.expr(f"w[i0 + {j}]") for j in range(n)]
    grams = idx.filter(F.expr(f"i0 + {n} <= size(w)")).select(
        "doc_id",
        (F.col("i0") + 1).alias("start"),  # 1-based, matching the oracle
        F.md5(F.concat_ws(" ", *parts)).alias("gh"),
    )
    # grams feeds BOTH the keeper aggregation and the occurrence join;
    # without a checkpoint Spark re-derives the scan→explode→md5
    # pipeline once per consumer (same lesson as dedup_clusters).
    grams = grams.localCheckpoint(eager=False)
    keeper = grams.groupBy("gh").agg(
        F.min(F.struct("doc_id", "start")).alias("k")
    )
    dups = grams.join(keeper, "gh").filter(
        (F.col("doc_id") != F.col("k.doc_id")) | (F.col("start") != F.col("k.start"))
    )
    covered = dups.select(
        "doc_id",
        F.explode(F.expr(f"sequence(start, start + {n - 1})")).alias("pos"),
    ).distinct()
    words = w.select(
        "doc_id", F.posexplode("w").alias("p0", "word")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "word")
    kept = words.join(covered, ["doc_id", "pos"], "left_anti")
    sur = kept.groupBy("doc_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, word))), "
            "s -> s.word), ' ')"
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    base = w.select("doc_id", F.size("w").alias("n_words"))
    return base.join(sur, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        (F.col("n_words") - F.coalesce("n_kept", F.lit(0))).alias("n_dropped"),
    )


def substring_dedup_oracle_sql(n: int = SUBSTR_N) -> str:
    """DuckDB twin of ``substring_dedup`` (keeper selection via
    row_number, equivalent to min(struct(doc_id, start)))."""
    return f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id, g.i AS start,
         md5(array_to_string(list_slice(w, g.i, g.i + {n - 1}), ' ')) AS gh
  FROM w, UNNEST(generate_series(1, len(w) - {n - 1})) AS g(i)
  WHERE len(w) >= {n}
), ranked AS (
  SELECT doc_id, start, gh,
         row_number() OVER (PARTITION BY gh ORDER BY doc_id, start) AS rn
  FROM grams
), covered AS (
  SELECT DISTINCT doc_id, c.pos
  FROM ranked, UNNEST(generate_series(start, start + {n - 1})) AS c(pos)
  WHERE rn > 1
), words AS (
  SELECT doc_id, g.pos, w[g.pos] AS word
  FROM w, UNNEST(generate_series(1, len(w))) AS g(pos)
), kept AS (
  SELECT wd.doc_id, wd.pos, wd.word
  FROM words wd ANTI JOIN covered c
    ON wd.doc_id = c.doc_id AND wd.pos = c.pos
), sur AS (
  SELECT doc_id, array_to_string(array_agg(word ORDER BY pos), ' ') AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id,
       COALESCE(sur.clean_text, '') AS clean_text,
       COALESCE(sur.n_kept, 0) AS n_kept,
       len(b.w) - COALESCE(sur.n_kept, 0) AS n_dropped
FROM w b LEFT JOIN sur ON b.doc_id = sur.doc_id
"""


# ------------------------------------------------- incremental (cross-run)
def write_fingerprint_index(
    docs: DataFrame,
    path: str,
    mode: str = "append",
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
) -> None:
    """Persist the MinHash band fingerprints of a corpus (or batch) as
    the cross-run dedup index: (doc_id, band_id, band_hash), ``bands``
    tiny rows per document.

    This is the mode a real 100 TB training pipeline runs in: the
    corpus is fingerprinted ONCE when ingested; every later batch
    dedups against the index (``incremental_dedup_pairs``) instead of
    re-scanning — and re-tokenizing — petabytes of already-seen text.
    Soundness rests on MinHash being a PER-DOCUMENT function: a doc's
    signature (and hence its band hashes) never depends on the rest of
    the corpus, so bands computed in different runs collide exactly as
    they would in one run.

    ``mode="append"`` makes index maintenance one cheap write per
    batch (fingerprint the batch, append). The layout shuffles on the
    probe key (band_id, band_hash) before writing so each output file
    covers a key range; production would bucket the table on band_hash
    (operators/layout.py::write_bucketed) to make every future probe
    join exchange-free on the index side."""
    b = minhash_bands(minhash_signatures(docs, k), bands, rows)
    b.repartition("band_id", "band_hash").write.mode(mode).parquet(path)


def incremental_dedup_pairs(
    spark,
    batch_docs: DataFrame,
    index_path: str,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
) -> DataFrame:
    """(doc_a, doc_b) near-duplicate candidate pairs for a NEW batch:
    batch-vs-index collisions plus batch-internal collisions, without
    touching any already-indexed document's text.

    Union-equivalence (tested): index(A) then incremental(B) finds
    exactly the pairs of minhash_candidate_pairs(A ∪ B) that involve a
    B document — because band fingerprints are per-document, batching
    cannot create or destroy collisions. A-internal pairs were already
    reported when A was indexed; re-indexing the batch afterwards
    (``write_fingerprint_index(batch, path)``) keeps the invariant for
    the next run.

    Physical shape: the batch is fingerprinted in one pipeline (its
    only corpus scan); the index side is a pure parquet scan of
    band-hash rows — never text. The probe is an equi-join on
    (band_id, band_hash); with a bucketed index the exchange lands on
    the (small) batch side only, and AQE broadcasts it outright when
    the batch is broadcast-sized. Output is bounded by true collision
    density, same as the one-shot banding."""
    return incremental_dedup_pairs_frame(
        batch_docs, spark.read.parquet(index_path), k, bands, rows
    )


def incremental_dedup_pairs_frame(
    batch_docs: DataFrame,
    index_df: DataFrame | None,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
) -> DataFrame:
    """``incremental_dedup_pairs`` with the index as a FRAME — the
    form the streaming maintainer uses, where the index is a
    manifest-committed BucketedTable snapshot rather than a raw
    parquet path. ``index_df`` None means "no corpus indexed yet"
    (the first micro-batch): only batch-internal pairs exist. Index
    rows that duplicate the batch's own fingerprints are harmless —
    they reproduce the identical (least, greatest) keyed pairs, so
    a replayed index append cannot change the accumulated result."""
    b = minhash_bands(minhash_signatures(batch_docs, k), bands, rows)
    # one batch scan feeds both the cross-probe and the internal pairs
    return incremental_pairs_from_bands(b.localCheckpoint(), index_df)


def incremental_pairs_from_bands(
    batch_bands: DataFrame, index_df: DataFrame | None
) -> DataFrame:
    """The probe core over ALREADY-FINGERPRINTED batch band rows
    (doc_id, band_id, band_hash) — the streaming maintainer computes
    the bands once, probes here, and appends the SAME frame to the
    index, so no micro-batch fingerprints its documents twice.
    ``batch_bands`` should be materialized (localCheckpoint) by the
    caller when it feeds both this probe and an index append."""
    b = batch_bands
    internal_buckets = (
        b.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    internal = _ordered_pairs(internal_buckets)
    if index_df is None:
        return internal.distinct()
    cross = (
        index_df.select("doc_id", "band_id", "band_hash")
        .join(
            b.withColumnRenamed("doc_id", "batch_id"),
            ["band_id", "band_hash"],
        )
        .filter(F.col("doc_id") != F.col("batch_id"))
        .select(
            F.least("doc_id", "batch_id").alias("doc_a"),
            F.greatest("doc_id", "batch_id").alias("doc_b"),
        )
    )
    return cross.unionByName(internal).distinct()


# ------------------------------------------------- sketch-accuracy audit
def minhash_accuracy(docs: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """Per candidate pair: MinHash-estimated vs EXACT Jaccard — the
    sketch-accuracy audit as a query (the dedup analog of
    ann_recall_at_5: the measurement itself is engine work, not a
    notebook afterthought). Columns (doc_a, doc_b, est_ppm, jac_ppm,
    err_ppm), all exact integers (ppm via truncating integer division —
    Spark ``div`` and DuckDB ``//`` both truncate toward zero).

    est = (matching signature components) / k, the unbiased MinHash
    estimator; exact Jaccard joins the (distinct-shingle) sets only for
    the already-banded candidate pairs, so the exact computation stays
    bounded by near-dup density — never all-pairs. At 100 TB you run
    this on a sample of buckets to monitor whether k still fits the
    corpus's similarity profile."""
    sigs = minhash_signatures(docs, k).localCheckpoint()
    # band the CHECKPOINTED signatures: the former minhash_candidate_pairs(docs)
    # call re-ran the whole shingle->hash->min-agg pipeline a second time
    pairs = minhash_candidate_pairs(docs, k, sigs=sigs).localCheckpoint()
    a = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"s{i}").alias(f"a{i}") for i in range(k)],
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"s{i}").alias(f"b{i}") for i in range(k)],
    )
    match_expr = " + ".join(
        f"CASE WHEN a{i} = b{i} THEN 1 ELSE 0 END" for i in range(k)
    )
    est = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", F.expr(f"({match_expr})").alias("m"))
    )
    # exact Jaccard only needs the shingle sets of docs that appear in
    # a candidate PAIR — bounded by near-dup density, not the corpus.
    # The former shape derived shingle_docs(docs) three times (sizes +
    # both sides of the intersection join), each a full corpus
    # shingle pass; filtering the doc frame by the (checkpointed)
    # pairs' ids first shrinks all three to the pair docs, and the
    # one small derivation pins so the plan shares it (§2.4).
    pair_ids = (
        pairs.select(F.explode(F.array("doc_a", "doc_b")).alias("doc_id"))
        .distinct()
    )
    sh = shingle_docs(
        docs.join(F.broadcast(pair_ids), "doc_id")
    ).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        pairs.join(
            sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a"
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        est.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr(f"m * 1000000 div {k}").alias("est_ppm"),
            F.expr(
                "coalesce(i, 0) * 1000000 div (na + nb - coalesce(i, 0))"
            ).alias("jac_ppm"),
            F.expr(
                f"abs(m * 1000000 div {k}"
                " - coalesce(i, 0) * 1000000 div (na + nb - coalesce(i, 0)))"
            ).alias("err_ppm"),
        )
    )


def minhash_accuracy_oracle_sql(k: int = MINHASH_K) -> str:
    match_expr = " + ".join(
        f"CASE WHEN a.s{i} = b.s{i} THEN 1 ELSE 0 END" for i in range(k)
    )
    return f"""
WITH {_minhash_cte_chain(k)},
est AS (
  SELECT p.doc_a, p.doc_b, ({match_expr}) AS m
  FROM cand p JOIN sig a ON a.doc_id = p.doc_a
              JOIN sig b ON b.doc_id = p.doc_b),
sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS i
  FROM cand p JOIN sh x ON x.doc_id = p.doc_a
              JOIN sh y ON y.doc_id = p.doc_b AND y.shingle = x.shingle
  GROUP BY 1, 2)
SELECT e.doc_a, e.doc_b,
  CAST(e.m * 1000000 // {k} AS BIGINT) AS est_ppm,
  CAST(coalesce(i.i, 0) * 1000000
       // (sa.n_sh + sb.n_sh - coalesce(i.i, 0)) AS BIGINT) AS jac_ppm,
  CAST(abs(e.m * 1000000 // {k}
       - coalesce(i.i, 0) * 1000000
         // (sa.n_sh + sb.n_sh - coalesce(i.i, 0))) AS BIGINT) AS err_ppm
FROM est e
LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
JOIN sz sa ON sa.doc_id = e.doc_a
JOIN sz sb ON sb.doc_id = e.doc_b
"""


# --------------------------------------------- canonical representative
def canonical_docs(docs: DataFrame) -> DataFrame:
    """(cluster_id, canonical_id, n_members): per near-dup cluster, the
    document a dedup pass KEEPS — longest text wins, smallest doc_id
    breaks ties (the standard keep-best heuristic; plug a quality score
    into the same argmax key for model-scored selection). One sort-free
    max_by over the cluster labels joined to doc lengths; the composite
    key n_chars*1e6 - doc_id is an exact integer, so the argmax is
    deterministic and portable."""
    labels = dedup_clusters(docs)
    return (
        labels.join(docs.select("doc_id", "n_chars"), "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.expr(
                "max_by(doc_id, n_chars * 1000000 - doc_id)"
            ).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


def canonical_docs_oracle_sql() -> str:
    return f"""
WITH cl AS ({dedup_clusters_oracle_sql()})
SELECT cl.cluster_id,
  arg_max(d.doc_id, d.n_chars * 1000000 - d.doc_id) AS canonical_id,
  count(*) AS n_members
FROM cl JOIN documents d ON d.doc_id = cl.doc_id
GROUP BY cl.cluster_id
"""


# ------------------------------------------------- perceptual image dedup
PHASH_BUCKET_CAP = 64


def image_phash_pairs(
    docs: DataFrame, max_hamming: int = None, bucket_cap: int = PHASH_BUCKET_CAP
) -> DataFrame:
    """(doc_a, doc_b, hamming): near-duplicate IMAGE pairs by
    average-hash over real decoded pixels — the multimodal/dedup
    bridge. Pixels come from the PNG decode path (operators/
    multimodal.py::synth_phash_png_assets -> ahash_chunks), candidates
    from the same recall-lossless chunk banding as
    ``simhash_hamming_pairs``: 4 chunks of 16 bits, so (pigeonhole)
    any pair within Hamming distance 3 shares a full chunk verbatim
    and grouping on (chunk_id, chunk_val) surfaces every qualifying
    pair; only bucket members get pair-exploded and popcount-verified.

    Scale note vs the 8-bit-chunk simhash tier: 16-bit chunks make
    random bucket collisions ~256x rarer (n/65536 expected members),
    which is the right trade for image corpora where the verify step
    (4 xor+popcounts) is cheap but candidate volume is the cost. At
    100 TB the hash pass is scan-speed mapInPandas; the only shuffle
    is the bucket groupBy on (chunk_id, chunk_val).

    ``bucket_cap`` is the skew guard (the banded analogue of
    ``ngram_jaccard_pairs``'s document-frequency cap): a degenerate
    corpus — e.g. millions of uniform images all hashing to the
    all-zero code — would otherwise collect ONE O(n) member array on a
    single executor and explode O(n^2) pairs. Buckets larger than the
    cap are dropped wholesale (deterministically, mirrored in the
    DuckDB oracle); a >cap bucket means >cap mutually-near-identical
    images, which exact dedup (``exact_dedup_clusters`` on the pixel
    hash) already collapses more cheaply than pairwise listing.
    """
    from . import multimodal

    if max_hamming is None:
        max_hamming = multimodal.PHASH_MAX_HAMMING
    chunks = multimodal.PHASH_CHUNKS
    codes = multimodal.ahash_chunks(
        multimodal.synth_phash_png_assets(docs)
    ).withColumnRenamed("asset_id", "doc_id")
    chunk_cols = [f"c{c}" for c in range(chunks)]
    chunk_structs = [
        F.struct(F.lit(c).alias("chunk_id"), F.col(f"c{c}").alias("chunk_val"))
        for c in range(chunks)
    ]
    exploded = codes.select(
        F.struct("doc_id", *chunk_cols).alias("ds"),
        F.explode(F.array(*chunk_structs)).alias("ch"),
    ).select("ds", F.col("ch.chunk_id"), F.col("ch.chunk_val"))
    buckets = (
        exploded.groupBy("chunk_id", "chunk_val")
        .agg(F.sort_array(F.collect_set("ds")).alias("members"))
        .filter(
            (F.size("members") >= 2) & (F.size("members") <= bucket_cap)
        )
    )
    step = buckets.select("members", F.posexplode("members").alias("i", "a"))
    pairs = step.select(
        "a",
        F.explode(F.expr("slice(members, i + 2, size(members))")).alias("b"),
    )
    hamming = " + ".join(
        f"bit_count(a.c{c} ^ b.c{c})" for c in range(chunks)
    )
    return (
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr(f"CAST({hamming} AS BIGINT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _phash_chunk_rows(codes: DataFrame) -> DataFrame:
    """Flatten (doc_id, c0..c3) hash codes to 4 probe rows per image:
    (doc_id, chunk_id, chunk_val, c0..c3) — chunk_val is the banding
    key, the full code rides along for probe-time Hamming verify."""
    from . import multimodal

    chunks = multimodal.PHASH_CHUNKS
    chunk_cols = [f"c{c}" for c in range(chunks)]
    structs = [
        F.struct(F.lit(c).alias("chunk_id"), F.col(f"c{c}").alias("chunk_val"))
        for c in range(chunks)
    ]
    return codes.select(
        "doc_id",
        *chunk_cols,
        F.explode(F.array(*structs)).alias("ch"),
    ).select("doc_id", F.col("ch.chunk_id"), F.col("ch.chunk_val"), *chunk_cols)


def write_phash_index(
    docs: DataFrame,
    path: str,
    mode: str = "append",
    bucket_cap: int | None = None,
) -> None:
    """Persist perceptual-hash band fingerprints as the cross-run
    IMAGE dedup index (the phash mirror of
    ``write_fingerprint_index``): 4 tiny rows per image — the pixels
    are decoded ONCE, at index time, and never again.

    Soundness is the same per-document argument as MinHash bands: an
    image's aHash depends only on its own pixels, so chunk values
    computed in different runs collide exactly as in one run.

    ``bucket_cap`` (optional) drops chunk buckets with more than
    ``cap`` members WITHIN the indexed corpus at write time — the
    skew guard for degenerate corpora (millions of uniform images on
    one chunk value), keeping every future probe join explosion-free.
    Capped drops are per-write; buckets that only exceed the cap
    across appends are the monitoring case (re-index to re-cap)."""
    from . import multimodal

    codes = multimodal.ahash_chunks(
        multimodal.synth_phash_png_assets(docs)
    ).withColumnRenamed("asset_id", "doc_id")
    rows = _phash_chunk_rows(codes)
    if bucket_cap is not None:
        w = F.count(F.lit(1)).over(
            Window.partitionBy("chunk_id", "chunk_val")
        )
        rows = rows.withColumn("__n", w).filter(
            F.col("__n") <= bucket_cap
        ).drop("__n")
    rows.repartition("chunk_id", "chunk_val").write.mode(mode).parquet(path)


def incremental_phash_pairs(
    spark,
    batch_docs: DataFrame,
    index_path: str,
    max_hamming: int = None,
    bucket_cap: int = PHASH_BUCKET_CAP,
) -> DataFrame:
    """(doc_a, doc_b, hamming): near-duplicate image pairs for a NEW
    batch — batch-vs-index collisions plus batch-internal collisions,
    without re-decoding any indexed image (the phash mirror of
    ``incremental_dedup_pairs``).

    Union-equivalence (tested): on a corpus where no chunk bucket
    exceeds ``bucket_cap``, index(A) then incremental(B) reports
    exactly the B-involving subset of ``image_phash_pairs(A ∪ B)``,
    because chunk fingerprints are per-image. The batch-internal path
    applies the same bucket cap as the one-shot operator; the cross
    probe relies on the index being written cap-clean
    (``write_phash_index(bucket_cap=...)``) for its skew guard.

    Physical shape: the batch decodes once (mapInPandas) into a
    localCheckpointed 4-rows/image frame; the index side is a pure
    parquet scan of hash rows — pixels never move. The probe is an
    equi-join on (chunk_id, chunk_val); Hamming verifies from the
    carried codes, 4 xor+popcounts per candidate."""
    from . import multimodal

    codes = multimodal.ahash_chunks(
        multimodal.synth_phash_png_assets(batch_docs)
    ).withColumnRenamed("asset_id", "doc_id")
    b = _phash_chunk_rows(codes).localCheckpoint()
    return incremental_phash_pairs_frame(
        b, spark.read.parquet(index_path), max_hamming, bucket_cap
    )


def incremental_phash_pairs_frame(
    batch_rows: DataFrame,
    index_rows: DataFrame | None,
    max_hamming: int = None,
    bucket_cap: int = PHASH_BUCKET_CAP,
) -> DataFrame:
    """Frame-level core of ``incremental_phash_pairs`` (the phash
    mirror of ``incremental_pairs_from_bands``): both sides are
    already (doc_id, chunk_id, chunk_val, c0..c3) rows — the batch's
    freshly decoded, the index's persisted — so the streaming
    foreachBatch twin can probe a BucketedTable read with the same
    plan the path-based form uses. ``index_rows`` None (no index
    yet): batch-internal collisions only."""
    from . import multimodal

    if max_hamming is None:
        max_hamming = multimodal.PHASH_MAX_HAMMING
    chunks = multimodal.PHASH_CHUNKS
    b = batch_rows
    if index_rows is None:
        return _phash_internal_pairs(b, chunks, max_hamming, bucket_cap)
    idx = index_rows.select(
        "doc_id", "chunk_id", "chunk_val", *[f"c{c}" for c in range(chunks)]
    )
    renames = dict(
        [("doc_id", "batch_id")] + [(f"c{c}", f"b{c}") for c in range(chunks)]
    )
    bp = b.withColumnsRenamed(renames)
    ham = " + ".join(f"bit_count(c{c} ^ b{c})" for c in range(chunks))
    cross = (
        idx.join(bp, ["chunk_id", "chunk_val"])
        .filter(F.col("doc_id") != F.col("batch_id"))
        .select(
            F.least("doc_id", "batch_id").alias("doc_a"),
            F.greatest("doc_id", "batch_id").alias("doc_b"),
            F.expr(f"CAST({ham} AS BIGINT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    internal = _phash_internal_pairs(b, chunks, max_hamming, bucket_cap)
    return cross.unionByName(internal).distinct()


def _phash_internal_pairs(
    b: DataFrame, chunks: int, max_hamming: int, bucket_cap: int
) -> DataFrame:
    """Batch-internal chunk collisions (same bucket walk as the
    one-shot operator, incl. the bucket-cap skew guard)."""
    internal_buckets = (
        b.groupBy("chunk_id", "chunk_val")
        .agg(
            F.sort_array(
                F.collect_set(F.struct("doc_id", *[f"c{c}" for c in range(chunks)]))
            ).alias("members")
        )
        .filter(
            (F.size("members") >= 2) & (F.size("members") <= bucket_cap)
        )
    )
    step = internal_buckets.select(
        "members", F.posexplode("members").alias("i", "a")
    )
    ipairs = step.select(
        "a",
        F.explode(F.expr("slice(members, i + 2, size(members))")).alias("b"),
    )
    iham = " + ".join(f"bit_count(a.c{c} ^ b.c{c})" for c in range(chunks))
    return ipairs.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.expr(f"CAST({iham} AS BIGINT)").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming).distinct()


def image_phash_oracle_sql(
    max_hamming: int = None, bucket_cap: int = PHASH_BUCKET_CAP
) -> str:
    """DuckDB restates the decoded pixels from the fixture formula,
    then computes aHash bits (integer-exact px*n > sum), chunk values,
    and the banded pair join — semantically identical to the lossless
    banding (any pair within the radius shares a chunk), including the
    same deterministic ``bucket_cap`` skew-guard drop."""
    from . import multimodal

    if max_hamming is None:
        max_hamming = multimodal.PHASH_MAX_HAMMING
    chunks = multimodal.PHASH_CHUNKS
    cw = multimodal.PHASH_CHUNK_BITS
    n = multimodal.PHASH_W * multimodal.PHASH_H
    px = multimodal.phash_px_duck("g.j")
    c_cols = ", ".join(
        f"CAST(sum(bit << (j % {cw})) FILTER (WHERE j // {cw} = {c}) "
        f"AS BIGINT) AS c{c}"
        for c in range(chunks)
    )
    chunk_ids = ", ".join(f"({c})" for c in range(chunks))
    chunk_case = " ".join(
        f"WHEN {c} THEN c{c}" for c in range(chunks)
    )
    ham = " + ".join(
        f"bit_count(xor(a.c{c}, b.c{c}))" for c in range(chunks)
    )
    return f"""
WITH px AS (
  SELECT doc_id, g.j AS j, {px} AS v
  FROM documents, UNNEST(generate_series(0, {n - 1})) AS g(j)
),
bits AS (
  SELECT p.doc_id, p.j,
         CASE WHEN p.v * {n} > t.s THEN 1 ELSE 0 END AS bit
  FROM px p JOIN (SELECT doc_id, sum(v) AS s FROM px GROUP BY doc_id) t
    USING (doc_id)
),
codes AS (SELECT doc_id, {c_cols} FROM bits GROUP BY doc_id),
chunked AS (
  SELECT doc_id, c.chunk_id,
         CASE c.chunk_id {chunk_case} END AS chunk_val,
         c0, c1, c2, c3
  FROM codes, (VALUES {chunk_ids}) AS c(chunk_id)
),
ok AS (
  SELECT chunk_id, chunk_val FROM chunked
  GROUP BY chunk_id, chunk_val
  HAVING count(*) BETWEEN 2 AND {bucket_cap}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST({ham} AS BIGINT) AS hamming
FROM chunked a
JOIN ok USING (chunk_id, chunk_val)
JOIN chunked b
  ON a.chunk_id = b.chunk_id AND a.chunk_val = b.chunk_val
 AND a.doc_id < b.doc_id
WHERE {ham} <= {max_hamming}
"""
