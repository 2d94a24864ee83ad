"""Link-graph operators for crawl corpora.

The reference pipeline has no graph stage (its four scripts end at
Redshift tables), but a web-scale text corpus's quality signals are
graph-shaped: PageRank-style host authority is the canonical crawl
prioritization / quality-weighting feature (Page et al. 1999, the
public algorithm). Sibling of operators/dedup.py::connected_components
— same iterate-with-checkpoint physical shape.

Determinism note (house rule): float PageRank sums in data-dependent
order, so Spark and DuckDB would disagree in the last ulps. The
implementation therefore runs in INTEGER parts-per-billion — rank
mass held as int64 ppb, per-edge contributions via truncating
division — which is order-independent and bit-identical on both
engines. The quantization error per iteration is < outdeg ppb per
node (dropped remainder), far below any ranking-relevant signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPB = 1_000_000_000
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as a ratio


def pagerank(
    edges: DataFrame,
    iterations: int = 4,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, rank_ppb): ``iterations`` rounds of damped PageRank over
    a directed edge list ``(src, dst)`` (deduplicated here), with all
    arithmetic in integer ppb:

        r0(v)   = PPB div N
        r_t+1(v) = (PPB - damp) div N
                   + (damp * sum over u->v of (r_t(u) div outdeg(u)))
                     div PPB-scale

    where damp = 85 PPB-percent. Every node is assumed to have
    outdegree >= 1 (crawl host graphs after the usual self-link
    patch); nodes with no inbound links still receive the teleport
    term via the left join.

    Node identity is the edge key itself — host string, url hash,
    any equality-comparable type. The node frame is derived FROM the
    edges (``src ∪ dst`` distinct) rather than ``spark.range(N)``,
    so no dense 0..N-1 id assignment exists anywhere: the web-scale
    alternative (a ``row_number`` over all distinct hosts) is a
    single-partition sort over 10⁸–10⁹ rows. N itself — only needed
    for the two teleport constants — is one counted scalar.

    Physical shape: the edge list materializes ONCE (localCheckpoint
    — each round joins it, and an unpinned plan would re-derive the
    edges from the corpus every iteration); the node frame likewise
    (it seeds every round's left join and the count() already runs a
    job). Per round: one equi-join of the (|nodes|-sized) rank table
    onto the edges and one groupBy dst — the rank side is the small
    one, AQE broadcast-converts it when |nodes| allows, else it's a
    co-partitioned shuffle join. The driver never sees per-node data;
    K is a parameter, so lineage stays bounded without
    iteration-count surprises. Ranks re-checkpoint every
    ``checkpoint_every`` rounds: each skipped checkpoint saves one
    job's scheduling round-trip (~0.5 s measured at fixture scale),
    while the cadence still bounds plan depth for long runs — a K<=4
    call plans as one shallow tree."""
    e0 = edges.select("src", "dst").distinct()
    outdeg = e0.groupBy("src").agg(F.count("*").alias("outdeg"))
    # outdeg is static across rounds: fold it into the materialized
    # edge table ONCE instead of re-joining it inside every iteration
    # (one join per round saved; same contribution arithmetic)
    e = e0.join(outdeg, "src").localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()  # one scalar: the teleport denominator
    if n_nodes == 0:
        raise ValueError(
            "pagerank: empty edge frame — no nodes to rank "
            "(upstream filter removed every link?)"
        )
    base = PPB // n_nodes
    teleport = (PPB - (DAMP_NUM * PPB) // DAMP_DEN) // n_nodes
    ranks = nodes.select("node", F.lit(base).cast("long").alias("rank_ppb"))
    for i in range(1, iterations + 1):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_ppb div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.expr(
                    f"({DAMP_NUM} * coalesce(inflow, 0)) div {DAMP_DEN}"
                )
            ).alias("rank_ppb"),
        )
        if i % checkpoint_every == 0 and i < iterations:
            ranks = ranks.localCheckpoint()  # bound plan depth
    return ranks


def pagerank_oracle_sql(edges_sql: str, iterations: int = 4) -> str:
    """Unrolled-iteration DuckDB twin (the ema_macd pattern): one CTE
    block per round, identical integer arithmetic. Mirrors the
    operator exactly: the node set is src ∪ dst from the edges (no
    generate_series — node identity is the edge key, any type), and
    the two teleport constants divide by the counted |nodes| (DuckDB
    ``//`` and Python ``//`` agree on positive BIGINTs)."""
    damp_ppb = (DAMP_NUM * PPB) // DAMP_DEN
    blocks = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src)",
        "n AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        f"k AS (SELECT CAST({PPB} // count(*) AS BIGINT) AS base, "
        f"CAST({PPB - damp_ppb} // count(*) AS BIGINT) AS tele FROM n)",
        "r0 AS (SELECT node, (SELECT base FROM k) AS rank_ppb FROM n)",
    ]
    for i in range(1, iterations + 1):
        p = i - 1
        blocks.append(
            f"c{i} AS (SELECT e.dst AS node, "
            f"sum(r.rank_ppb // od.outdeg) AS inflow "
            f"FROM e JOIN r{p} r ON e.src = r.node "
            "JOIN od ON e.src = od.src GROUP BY e.dst)"
        )
        blocks.append(
            f"r{i} AS (SELECT n.node, CAST((SELECT tele FROM k) "
            f"+ ({DAMP_NUM} * coalesce(c.inflow, 0)) // {DAMP_DEN} "
            f"AS BIGINT) AS rank_ppb "
            f"FROM n LEFT JOIN c{i} c ON n.node = c.node)"
        )
    return (
        "WITH "
        + ",\n".join(blocks)
        + f"\nSELECT node, rank_ppb FROM r{iterations}"
    )


def hits(
    edges: DataFrame,
    iterations: int = 3,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, hub_ppb, auth_ppb): ``iterations`` rounds of HITS
    (Kleinberg 1999, the public algorithm) over a directed edge list
    — the hub/authority complement to :func:`pagerank`: PageRank
    measures WHERE quality flows, HITS separates pages that POINT AT
    quality (hubs — link directories, sitemaps, curated lists a
    crawler should expand first) from pages quality points at
    (authorities). Per round:

        auth_raw(v) = sum over u->v of hub(u)     then L1-normalize
        hub_raw(u)  = sum over u->v of auth(v)    then L1-normalize

    All arithmetic is integer ppb (the pagerank house rule — float
    HITS sums in data-dependent order and drifts cross-engine):
    scores start at PPB div N, and each normalization is

        score = (raw * 1000) div (total div 1_000_000)

    i.e. raw * PPB / total with every intermediate bounded by
    1000 * PPB * max_degree — exact in int64 while max degree is
    below ~9e6 (cap the degree upstream beyond that), and defined
    while total >= 1e6, which holds for any non-empty graph here
    since mass starts at ~PPB and flows along at least one edge.
    Truncating division is order-independent and bit-identical on
    both engines.

    Physical shape mirrors pagerank: edges and nodes materialize
    once; each round is two |nodes|-sized-side equi-joins onto the
    edges (AQE broadcast-converts them when |nodes| allows), two
    groupBys, and two 1-row total aggregates broadcast back. Each
    round's raw-mass table pins as a lazy localCheckpoint (see
    ``_l1_normalize``), which bounds plan depth per round —
    ``checkpoint_every`` is kept for signature compatibility but the
    per-round pin already does its job."""
    e = edges.select("src", "dst").distinct().localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError(
            "hits: empty edge frame — no nodes to score "
            "(upstream filter removed every link?)"
        )

    def _l1_normalize(raw: DataFrame) -> DataFrame:
        """(node, raw) -> (node, score) for nodes PRESENT in raw, with
        total mass ~PPB. Nodes with no contributing edges stay ABSENT
        (a 0 score adds nothing to the next round's sums — identical
        arithmetic); the final output densifies once instead of every
        round (the former per-round nodes left-join was 6 extra joins
        per run). ``raw`` pins as a lazy localCheckpoint: both the
        1-row total and the scored projection reference it, and an
        unpinned plan DOUBLES the whole iteration subtree per
        reference — two normalizes per round made the 3-round final
        plan carry ~4^3 copies of the edge join (~1300 Exchange nodes
        at fixture scale; the measured cost was plan size, not data)."""
        raw = raw.localCheckpoint(eager=False)
        total = raw.agg(F.sum("raw").alias("t"))
        return raw.join(F.broadcast(total)).select(
            "node",
            F.expr(f"(raw * 1000) div (t div {PPB // 1000})").alias("score"),
        )

    hub = nodes.select(
        "node", F.lit(PPB // n_nodes).cast("long").alias("score")
    )
    auth = None
    for i in range(1, iterations + 1):
        a_raw = (
            e.join(hub, e.src == hub.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("score").alias("raw"))
        )
        auth = _l1_normalize(a_raw)
        h_raw = (
            e.join(auth, e.dst == auth.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("score").alias("raw"))
        )
        hub = _l1_normalize(h_raw)
    return (
        nodes.join(
            hub.withColumnRenamed("score", "hub_ppb"), "node", "left"
        )
        .join(auth.withColumnRenamed("score", "auth_ppb"), "node", "left")
        .select(
            "node",
            F.coalesce("hub_ppb", F.lit(0)).cast("long").alias("hub_ppb"),
            F.coalesce("auth_ppb", F.lit(0)).cast("long").alias("auth_ppb"),
        )
    )


def hits_oracle_sql(edges_sql: str, iterations: int = 3) -> str:
    """Unrolled-iteration DuckDB twin of :func:`hits` — identical
    integer arithmetic, one authority + one hub CTE block per round
    with their 1-row totals (the pagerank_oracle_sql pattern)."""
    m = PPB // 1000  # the div-1e6 normalization denominator scale
    blocks = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "n AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        f"k AS (SELECT CAST({PPB} // count(*) AS BIGINT) AS base FROM n)",
        "h0 AS (SELECT node, (SELECT base FROM k) AS score FROM n)",
    ]
    for i in range(1, iterations + 1):
        p = i - 1
        blocks.append(
            f"ar{i} AS (SELECT e.dst AS node, sum(h.score) AS raw "
            f"FROM e JOIN h{p} h ON e.src = h.node GROUP BY e.dst)"
        )
        blocks.append(f"at{i} AS (SELECT sum(raw) AS t FROM ar{i})")
        blocks.append(
            f"a{i} AS (SELECT n.node, CAST(coalesce("
            f"(a.raw * 1000) // ((SELECT t FROM at{i}) // {m}), 0) "
            f"AS BIGINT) AS score "
            f"FROM n LEFT JOIN ar{i} a ON n.node = a.node)"
        )
        blocks.append(
            f"hr{i} AS (SELECT e.src AS node, sum(a.score) AS raw "
            f"FROM e JOIN a{i} a ON e.dst = a.node GROUP BY e.src)"
        )
        blocks.append(f"ht{i} AS (SELECT sum(raw) AS t FROM hr{i})")
        blocks.append(
            f"h{i} AS (SELECT n.node, CAST(coalesce("
            f"(h.raw * 1000) // ((SELECT t FROM ht{i}) // {m}), 0) "
            f"AS BIGINT) AS score "
            f"FROM n LEFT JOIN hr{i} h ON n.node = h.node)"
        )
    k = iterations
    return (
        "WITH "
        + ",\n".join(blocks)
        + f"\nSELECT n.node, h{k}.score AS hub_ppb, a{k}.score AS auth_ppb"
        f"\nFROM n JOIN h{k} ON n.node = h{k}.node"
        f" JOIN a{k} ON n.node = a{k}.node"
    )
