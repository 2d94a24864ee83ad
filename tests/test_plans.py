"""Physical-plan regression tests.

The bench numbers rest on plan PROPERTIES, not just query text: dims
broadcast in star joins, filters reach the parquet scan, single-scan
pipelines stay single-scan, and nothing silently introduces a
BroadcastNestedLoopJoin. These tests pin those properties via
``explain("formatted")`` so a future edit that regresses a plan fails
loudly instead of just getting slower.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from cryptocoininsights_data_engineer_project_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _nodes(plan: str, op: str) -> int:
    """Count operator nodes in the detail listing (the ASCII tree above
    it would double-count)."""
    return len(re.findall(rf"\(\d+\) {re.escape(op)}", plan))


def test_star_join_broadcasts_all_dims(spark):
    """Every dim join in the star query must be a broadcast hash join —
    a SortMergeJoin on a 25-row dim means a full fact shuffle."""
    p = _plan(spark, "star_join_revenue")
    assert _nodes(p, "BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_q1_scan_pushdown_and_pruning(spark):
    """The shipdate filter must reach the parquet scan (PushedFilters)
    and the scan must read only the 7 referenced columns."""
    p = _plan(spark, "q1_pricing_summary")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", p)
    assert m and "LessThanOrEqual(l_shipdate" in m.group(1)
    m = re.search(r"ReadSchema: ([^\n]*)", p)
    assert m
    read = m.group(1)
    # a pruned scan: none of the unreferenced lineitem columns appear
    for col in ("l_orderkey", "l_shipmode", "l_comment", "l_partkey"):
        assert col not in read


def test_dedup_minhash_single_scan(spark):
    """The shingle→minhash→band→bucket pipeline runs off ONE corpus
    scan — a second scan means a self-join crept back in."""
    p = _plan(spark, "dedup_minhash")
    assert _nodes(p, "Scan parquet") == 1


def test_simhash_pairs_single_scan(spark):
    p = _plan(spark, "dedup_simhash_pairs")
    assert _nodes(p, "Scan parquet") == 1


# BroadcastNestedLoopJoin is allowed ONLY where the broadcast side is a
# constant-size relation (not data-proportional):
#   similarity_topk        — the labeled exact baseline (broadcast query set)
#   similarity_ivf_trained — crossJoin against <= 16 trained centroids
#   similarity_ivf         — same crossJoin geometry, untrained (n_iters=0)
#   high_low_24h           — 1-row max-timestamp scalar
#   tfidf_top_terms        — 1-row corpus doc-count scalar
#   q22_dormant_value      — 1-row avg-acctbal scalar (inequality join)
#   q11_important_stock    — 1-row value-threshold scalar (inequality join)
#   stratified_sample      — 1-row min-stratum-count scalar joined onto the
#                            (|sources|-sized) rate table, not the corpus
BNLJ_ALLOWED = {
    "similarity_topk",
    "similarity_ivf_trained",
    "similarity_ivf",
    "similarity_ivfpq",  # broadcast centroid/codebook cross joins
    "high_low_24h",
    "tfidf_top_terms",
    "q22_dormant_value",
    "q11_important_stock",
    "stratified_sample",
    "bm25_score",  # 1-row corpus-stats scalar (N, avgdl, per-term df)
    "unigram_logppl",  # 1-row corpus-token-total scalar onto the vocab table
    "rfm_segments",  # 1-row anchor-date + 1-row median-threshold scalars
    "pareto_parts",  # 1-row revenue-total scalar onto the part rollup
    "feature_bins",  # 1-row decile-threshold scalar onto the fact scan
    "target_encode",  # 1-row global-mean scalar onto the segment rollup
    "mutual_info",  # 1-row total + 1-row entropy scalars onto the cell table
    "dq_orphans",  # three 1-row orphan-count scalars cross-joined
    "pct_of_total",  # 1-row grand-total scalar onto the nation rollup
    "k_anonymity",  # 1-row corpus-risky-rows scalar onto the cohort table
    "approx_quantile_hist",  # 3-row quantile-rank list onto the bucket table
    "embedding_outliers",  # 1-row p01/p99 norm-threshold scalar onto the scan
    "ann_recall_at_5",  # composes cosine_topk + ivf (both allowlisted shapes)
    "rank_fusion",  # dense side = ivf_trained (<=16-centroid crossJoin)
    "mmr_diversify",  # broadcast query set, same non-equi shape as cosine_topk
    "ndcg_at_5",  # composes cosine_topk + ivf (both allowlisted shapes)
    "ngram_collocations",  # two 1-row corpus-total scalars onto the bigram table
    "corpus_diversity",  # 1-row total onto the (tiny) dimension rollup
    "survival_conversion",  # 1-row cohort-total scalar onto the duration table
    "skew_report",  # 1-row key-stats scalar onto the 5-row hot list
    "attribution_last_touch",  # 1-row conversion-total scalar onto the channel rollup
    "basket_affinity_lift",  # 1-row basket-count scalar onto the pair table
    "attribution_linear",  # 1-row credit-total scalar onto the channel rollup
    "volatility_regimes",  # 1-row tercile-threshold scalar onto the vol table
    "corpus_mix_temperature",  # 1-row totals scalar onto the rate table
    "corpus_mix_report",  # 1-row totals + 1-row kept-total scalars
    "hits_hosts",  # two 1-row L1-mass scalars per HITS round
    "similarity_sq8",  # broadcast 64-row query set, cosine_topk's non-equi shape
    "source_overlap_matrix",  # |sources|x|sources| pair frame (both sides tiny)
    "ann_recall_curve",  # 5-row k-frame range join + cosine_topk's shapes
    "topic_mix_report",  # 1-row vector-total scalar onto the k-row cluster rollup
    "ppl_buckets",  # 1-row tercile-threshold scalar onto the per-doc scores
    "corpus_mix_epochs",  # 1-row totals scalar onto the |sources| rate table
    "length_bucket_efficiency",  # 1-row corpus-max/total scalar onto buckets
}


@pytest.mark.parametrize(
    "name", sorted(n for n in REGISTRY if n not in BNLJ_ALLOWED)
)
def test_no_nested_loop_joins(spark, name):
    """No registry query outside the allowlist may plan a
    BroadcastNestedLoopJoin or CartesianProduct — at scale those are
    single-broadcast chokepoints outside whole-stage codegen."""
    p = _plan(spark, name)
    assert _nodes(p, "BroadcastNestedLoopJoin") == 0, name
    assert _nodes(p, "CartesianProduct") == 0, name


@pytest.mark.parametrize("name", ["pagerank_hosts", "warc_link_pagerank"])
def test_pagerank_has_no_window_sort(spark, name):
    """The pagerank queries must not contain a WindowExec anywhere:
    the retired host→id assignment was a partition-less
    row_number().over(Window.orderBy(host)) — a single task sorting
    the whole host universe (10⁸–10⁹ rows at crawl scale). Node
    identity is now the edge key itself, so no Window (and no dense
    id) belongs in either plan."""
    p = _plan(spark, name)
    assert _nodes(p, "Window") == 0, name


def test_bloom_filter_injects_on_shuffle_join(spark):
    """Runtime bloom-filter pruning: when the selective side can't
    broadcast, its join keys reach the big side's scan as a
    might_contain filter — the shuffle-volume reducer that matters at
    100 TB. (Broadcast joins, the local-scale norm, neither need nor
    get one: see test_star_join_broadcasts_all_dims.)"""
    import pyspark.sql.functions as F

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    except Exception:
        old_aqe = None
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        o = (
            spark.read.parquet(f"{SF}/orders.parquet")
            .filter(F.col("o_orderpriority") == "1-URGENT")
        )
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        assert "might_contain" in buf.getvalue().lower()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )


def test_corpus_filter_single_scan(spark):
    """The fused corpus filter computes language + quality + dup-canon
    off ONE scan (window, not aggregate+self-join) — its reason to
    exist over composing the three standalone queries."""
    p = _plan(spark, "corpus_filter")
    assert _nodes(p, "Scan parquet") == 1


def test_q6_all_predicates_pushed(spark):
    """Q6 is the pushdown litmus: every predicate is a range filter
    that must reach the parquet scan, and the scan must read only the
    four referenced columns."""
    p = _plan(spark, "q6_forecast_revenue")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", p)
    assert m
    pushed = m.group(1)
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount",
        "LessThanOrEqual(l_discount",
        "LessThan(l_quantity",
    ):
        assert frag in pushed, frag
    m = re.search(r"ReadSchema: ([^\n]*)", p)
    assert m and "l_orderkey" not in m.group(1)


def test_q4_plans_left_semi(spark):
    """The EXISTS subquery must decorrelate to a semi join — a full
    join + distinct would duplicate-then-dedup the fact."""
    p = _plan(spark, "q4_order_priority")
    assert "LeftSemi" in p
    assert _nodes(p, "HashAggregate") <= 2  # partial+final only


def test_q9_broadcasts_all_dims(spark):
    """part/supplier/nation ride broadcasts; only orders may shuffle-
    join against the fact."""
    p = _plan(spark, "q9_nation_profit")
    assert _nodes(p, "BroadcastHashJoin") >= 3
    assert _nodes(p, "SortMergeJoin") + _nodes(p, "ShuffledHashJoin") <= 1


def test_q13_outer_join_keeps_filter_in_condition(spark):
    """LEFT OUTER with the priority filter inside the join condition:
    the plan must stay an outer join (a WHERE would have turned it
    inner and dropped 0-order customers)."""
    p = _plan(spark, "q13_customer_distribution")
    assert "LeftOuter" in p


def test_window_rank_family_single_window(spark):
    """Two frame specs over the same (partition, order) must fuse into
    one Window node with one exchange."""
    p = _plan(spark, "window_rank_family")
    assert _nodes(p, "Window") == 1
    assert _nodes(p, "Exchange") == 1


def test_q11_fact_scanned_once(spark):
    """Both the threshold scalar and the filter leg must read the
    checkpointed per-part aggregate — a parquet scan in the final plan
    means the fact pipeline is running twice."""
    p = _plan(spark, "q11_important_stock")
    assert _nodes(p, "Scan parquet") == 0
    assert _nodes(p, "Scan ExistingRDD") == 2


def test_q12_filters_reach_scans(spark):
    """returnflag + shipdate push into the lineitem scan; orderkey
    join is the only join."""
    p = _plan(spark, "q12_priority_shipping")
    assert "In(l_returnflag, [A,R]" in p
    assert "IsNotNull(l_shipdate)" in p
    assert (
        _nodes(p, "BroadcastHashJoin")
        + _nodes(p, "SortMergeJoin")
        + _nodes(p, "ShuffledHashJoin")
        == 1
    )


def test_q20_partname_pushdown_and_semi(spark):
    """The widget filter reaches the part scan; parts prune the fact
    via a LEFT SEMI broadcast, never duplicating lineitem rows."""
    p = _plan(spark, "q20_promotable_suppliers")
    assert "StringContains(p_name,widget)" in p
    assert "LeftSemi" in p
    assert _nodes(p, "Scan parquet") == 3


def test_q21_no_self_join(spark):
    """The only-this-supplier-late predicate folds into a two-level
    aggregation: one lineitem scan, one orders scan, one supplier
    broadcast, NO late-lines self-join and no multi-distinct Expand."""
    p = _plan(spark, "q21_waiting_suppliers")
    assert _nodes(p, "Scan parquet") == 3
    assert _nodes(p, "Expand") == 0
    assert _nodes(p, "BroadcastHashJoin") == 2
    assert _nodes(p, "SortMergeJoin") + _nodes(p, "ShuffledHashJoin") == 0


def test_stratified_sample_single_corpus_scan(spark):
    """The rate table derives from a checkpointed counts aggregate —
    the corpus parquet is scanned exactly once in the final plan, and
    the sample filter probes a broadcast rate table."""
    p = _plan(spark, "stratified_sample")
    assert _nodes(p, "Scan parquet") == 1
    assert _nodes(p, "BroadcastHashJoin") == 1


def test_embedding_quantize_pure_projection(spark):
    """int8 quantization is a zero-shuffle projection: one scan, no
    exchange, no join, no aggregate."""
    p = _plan(spark, "embedding_quantize")
    assert _nodes(p, "Scan parquet") == 1
    assert _nodes(p, "Exchange") == 0
    assert _nodes(p, "HashAggregate") == 0


def test_ohlcv_single_scan_single_shuffle(spark):
    """OHLCV bars: open/close picked by min_by/max_by INSIDE the same
    hash aggregate as high/low/volume — one tick scan, one exchange to
    bar grain, zero windows/sorts/joins."""
    p = _plan(spark, "ohlcv_candles")
    assert _nodes(p, "Scan parquet") == 1
    assert _nodes(p, "Exchange") == 1
    assert _nodes(p, "Window") == 0
    assert _nodes(p, "SortMergeJoin") + _nodes(p, "BroadcastHashJoin") == 0


def test_anomaly_zscore_broadcast_stats(spark):
    """Per-instrument moments come back to the tick scan as a
    broadcast — no shuffle of the tick table itself."""
    p = _plan(spark, "anomaly_zscore")
    assert _nodes(p, "BroadcastHashJoin") == 1
    assert _nodes(p, "SortMergeJoin") == 0


def test_bollinger_windows_daily_grain_only(spark):
    """The Window runs over the |instrument x day| close table (fed by
    the grain aggregate), never over raw ticks: one scan, and the
    aggregate sits below the window."""
    p = _plan(spark, "bollinger_daily")
    assert _nodes(p, "Scan parquet") == 1
    assert _nodes(p, "Window") == 1


def test_ivf_probe_broadcasts_onto_corpus(spark):
    """The IVF candidate join must broadcast the (|queries| x nprobe)
    probe list — a SortMergeJoin here shuffles the whole corpus on cid
    (the 100 TB regression this pins against). rank_fusion composes
    the same trained-IVF retriever as its dense leg (VERDICT r4 #3) —
    its plan must stay probe-broadcast too, never a corpus shuffle per
    query batch."""
    for name in ("similarity_ivf", "similarity_ivf_trained", "rank_fusion"):
        p = _plan(spark, name)
        assert _nodes(p, "SortMergeJoin") == 0, name
        assert _nodes(p, "ShuffledHashJoin") == 0, name


def test_spread_is_conditional(spark):
    """The shared scan-spreading helper (functions/spread.py) must be
    scale-adaptive: a frame that already has >= defaultParallelism
    partitions passes through UNTOUCHED (no Exchange added — the
    100 TB guard: an unconditional repartition(n_cores) would coalesce
    a thousand-partition scan down to core count and shuffle the whole
    frame), while an under-split frame is spread to core count."""
    from cryptocoininsights_data_engineer_project_spark.functions.spread import (
        spread,
    )

    n = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, 1, n)
    assert spread(wide) is wide  # identity — not even a new plan node
    wider = spark.range(0, 1000, 1, n + 3)
    assert spread(wider) is wider
    narrow = spark.range(0, 1000, 1, 1)
    out = spread(narrow)
    assert out.rdd.getNumPartitions() == n


def test_decode_spread_no_exchange_on_presplit_input(spark, tmp_path):
    """The decode-family spread sites route through the conditional
    helper: a pre-split parquet input (>= core-count partitions) must
    plan with ZERO round-robin Exchange — the repartition only fires
    when the scan under-splits."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from cryptocoininsights_data_engineer_project_spark.functions.spread import (
        spread,
    )
    from cryptocoininsights_data_engineer_project_spark.operators import (
        multimodal,
    )

    n = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "presplit_docs")
    spark.range(0, 400, 1, n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
    ).write.mode("overwrite").parquet(path)
    # default split packing would coalesce the tiny files into one
    # scan partition; pin the split size down so the scan really is
    # pre-split, then restore
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
    try:
        docs = spark.read.parquet(path).select("doc_id", "text")
        assert docs.rdd.getNumPartitions() >= n
        df = multimodal.decode_meta(multimodal.synth_assets(spread(docs)))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        assert "RoundRobinPartitioning" not in buf.getvalue()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
