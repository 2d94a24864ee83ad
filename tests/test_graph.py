"""Integer-ppb PageRank: hand-checkable graphs + mass accounting."""

from __future__ import annotations

from cryptocoininsights_data_engineer_project_spark.operators.graph import (
    PPB,
    pagerank,
)


def _ranks(spark, edges, n, iters=4):
    # n is the expected node count — every test graph covers all its
    # nodes as edge endpoints, so the edge-derived node frame equals
    # range(n); the assertion pins that assumption.
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r.node: r.rank_ppb for r in pagerank(df, iterations=iters).collect()
    }
    assert set(got) == set(range(n))
    return got


def test_cycle_stays_uniform(spark):
    # a 4-cycle is vertex-transitive: every iteration maps the uniform
    # vector to itself (up to the shared truncation), so all nodes tie
    got = _ranks(spark, [(0, 1), (1, 2), (2, 3), (3, 0)], 4)
    assert len(set(got.values())) == 1
    assert abs(got[0] - PPB // 4) <= 4  # truncation drift only


def test_star_core_outranks_leaves(spark):
    # 1,2,3 all point at 0; 0 points back at 1 only. The 0<->1 pair
    # forms a 2-cycle whose mass oscillates between them per
    # iteration, but both always dwarf the teleport-only leaves.
    got = _ranks(spark, [(1, 0), (2, 0), (3, 0), (0, 1)], 4)
    assert got[2] == got[3]  # symmetric leaves tie exactly
    assert min(got[0], got[1]) > 5 * got[2]


def test_mass_conserved_within_truncation(spark):
    # each node drops < outdeg ppb per iteration to truncation, plus
    # the teleport rounding: total stays within a tight bound of PPB
    edges = [(i, (i * 3 + 1) % 7) for i in range(7)] + [
        (i, (i + 2) % 7) for i in range(7)
    ]
    got = _ranks(spark, edges, 7, iters=6)
    total = sum(got.values())
    assert PPB - 600 <= total <= PPB


def test_duplicate_edges_collapse(spark):
    # the edge list dedupes: repeating an edge must not double its flow
    a = _ranks(spark, [(0, 1), (1, 0)], 2)
    b = _ranks(spark, [(0, 1), (0, 1), (1, 0), (1, 0)], 2)
    assert a == b


def test_matches_python_reference(spark):
    # independent driver-side reference of the same integer recurrence
    edges = sorted({(i % 5, (i * 7 + 3) % 5) for i in range(40)})
    n, iters = 5, 4
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    ranks = {v: PPB // n for v in range(n)}
    teleport = (PPB - 85 * PPB // 100) // n
    for _ in range(iters):
        inflow = {v: 0 for v in range(n)}
        for s, d in edges:
            inflow[d] += ranks[s] // outdeg[s]
        ranks = {v: teleport + 85 * inflow[v] // 100 for v in range(n)}
    got = _ranks(spark, edges, n, iters)
    assert got == ranks


def test_empty_edges_raise_typed_error(spark):
    import pytest

    df = spark.createDataFrame([], "src string, dst string")
    with pytest.raises(ValueError, match="empty edge frame"):
        pagerank(df, iterations=2)


def test_crawl_authority_probe_equals_inline(spark):
    """The persisted authority table (crawl_authority: PageRank
    upserted into a BucketedTable keyed on host, read back through a
    manifest snapshot) must return exactly the ranks the inline
    computation produces — and stay identical after a second upsert
    of the same build (merge idempotence)."""
    from pyspark.sql import functions as F

    from cryptocoininsights_data_engineer_project_spark import queries
    from cryptocoininsights_data_engineer_project_spark.operators import (
        textops,
        webarchive,
    )

    sf = "/root/testdata/sf0.001"
    docs = queries._t(spark, sf, "documents")
    links = webarchive.warc_html_links(
        webarchive.synth_warc_linked_assets(docs)
    )
    edges = links.filter(F.col("href").startswith("http://")).selectExpr(
        f"{textops.spark_url_host('base_url')} AS src",
        f"{textops.spark_url_host('href')} AS dst",
    )
    inline = {
        r.node: r.rank_ppb for r in pagerank(edges, 4).collect()
    }
    probe1 = {
        r.host: r.rank_ppb
        for r in queries.crawl_authority(spark, sf, docs).collect()
    }
    probe2 = {
        r.host: r.rank_ppb
        for r in queries.crawl_authority(spark, sf, docs).collect()
    }
    assert probe1 == inline
    assert probe2 == inline


def test_hits_hand_graph(spark):
    """HITS on a hand-reasoned 3-node graph (1->2, 1->3, 2->3):
    node 1 is the pure hub (points at everything, nothing points at
    it), node 3 the pure authority; mutual reinforcement must rank
    hub(1) > hub(2) > hub(3) = 0 and auth(3) > auth(2) > auth(1) = 0,
    and each normalized mass stays within truncation of PPB."""
    from cryptocoininsights_data_engineer_project_spark.operators.graph import (
        PPB,
        hits,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    rows = {r.node: (r.hub_ppb, r.auth_ppb) for r in hits(edges, 3).collect()}
    assert set(rows) == {1, 2, 3}
    hub = {k: v[0] for k, v in rows.items()}
    auth = {k: v[1] for k, v in rows.items()}
    assert hub[1] > hub[2] > hub[3] == 0
    assert auth[3] > auth[2] > auth[1] == 0
    # L1 mass conservation: the normalization denominator truncates
    # (total div 1e6), biasing each round's mass up by at most
    # 1e6/total — <= 0.1% per round while total >= PPB, identical on
    # both engines (the oracle-parity sweep pins exact agreement)
    assert abs(sum(hub.values()) - PPB) < PPB // 500
    assert abs(sum(auth.values()) - PPB) < PPB // 500
