"""End-to-end coin-pipeline parity (SURVEY.md §5.3): fixture JSON →
ingest → normalize → split → merge into dim/fact → maintenance; run
twice to assert merge idempotency (the reference's core invariant)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from cryptocoininsights_data_engineer_project_spark.pipeline import fixtures
from cryptocoininsights_data_engineer_project_spark.pipeline.coins import (
    INFO_COLS,
    METRIC_COLS,
    CoinWarehouse,
    normalize,
    read_csv,
    read_raw_json,
    run_batch_pipeline,
    split_info,
    split_metrics,
    write_csv,
)


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw")
    fixtures.write_batches(str(d))
    return str(d)


def test_read_and_normalize(spark, raw_dir):
    raw = read_raw_json(spark, os.path.join(raw_dir, "raw_coins_batch0.json"))
    assert raw.count() == fixtures.N_PER_BATCH
    assert raw.filter("batch_id = 0").count() == fixtures.N_PER_BATCH
    n = normalize(raw)
    # roi struct flattened to scalars (S5), ~20% nulls preserved
    assert {"roi_times", "roi_currency", "roi_percentage"} <= set(n.columns)
    assert "roi" not in n.columns
    null_roi = n.filter("roi_currency IS NULL").count()
    assert 0 < null_roi < fixtures.N_PER_BATCH


def test_split_projections(spark, raw_dir):
    n = normalize(read_raw_json(spark, os.path.join(raw_dir, "raw_coins_batch0.json")))
    info, metrics = split_info(n), split_metrics(n)
    assert info.columns == INFO_COLS + ["batch_id"]
    assert metrics.columns == METRIC_COLS + ["batch_id"]
    row = info.filter("symbol = 'c0000'").first()
    assert row["id"] == "c0000"  # id := symbol (data-transformation.py:46)
    assert row["image_url"].startswith("https://")
    m = metrics.filter("id = 'c0000'").first()
    assert m["last_updated"] is not None  # cast succeeded (P5)
    assert isinstance(m["current_price_usd"], float)


def test_full_pipeline_three_batches_then_idempotent(spark, raw_dir, tmp_path):
    wh = CoinWarehouse(spark, str(tmp_path / "warehouse"))
    archive = str(tmp_path / "archive")

    for b in range(3):
        run_batch_pipeline(
            spark, os.path.join(raw_dir, f"raw_coins_batch{b}.json"), wh, archive
        )

    dim, fact = wh.dim(), wh.fact()
    # batches cover indices 0..449 → 450 distinct coins
    assert dim.count() == 450
    assert fact.count() == 450
    assert dim.select("id").distinct().count() == 450

    # overlap keys carry batch-2 values (stage wins)
    m = fact.filter("id = 'c0200'").first()  # in batches 1 and 2
    assert m["last_updated"].day == 3  # batch2 ts day=3

    # re-run the LAST batch: warehouse unchanged (idempotency)
    before = sorted(
        (r["id"], r["current_price_usd"], r["last_updated"])
        for r in fact.collect()
    )
    run_batch_pipeline(
        spark, os.path.join(raw_dir, "raw_coins_batch2.json"), wh, archive
    )
    after = sorted(
        (r["id"], r["current_price_usd"], r["last_updated"])
        for r in wh.fact().collect()
    )
    assert before == after

    # archive received every batch file (M4); Hadoop LocalFS also
    # writes .crc sidecars — only the payload files matter
    assert sorted(f for f in os.listdir(archive) if f.endswith(".json")) == [
        "raw_coins_batch0.json",
        "raw_coins_batch1.json",
        "raw_coins_batch2.json",
    ]


def _bucket_of(d):
    from cryptocoininsights_data_engineer_project_spark.pipeline.coins import _bucket_of

    return _bucket_of(d)


def _manifest_parts(spark, path):
    from cryptocoininsights_data_engineer_project_spark.pipeline import manifest

    _, m = manifest.latest_manifest(spark, path)
    return m["partitions"]


def test_partition_pruned_merge(spark, raw_dir, tmp_path):
    """A small incremental batch must rewrite ONLY the bucket
    partitions containing its keys — untouched buckets' manifest
    entries carry over file-identical (the 100 TB property: merge
    I/O ∝ delta)."""
    wh = CoinWarehouse(spark, str(tmp_path / "whp"), n_buckets=16)
    run_batch_pipeline(spark, os.path.join(raw_dir, "raw_coins_batch0.json"), wh)

    before = _manifest_parts(spark, wh.fact_path)
    assert len({_bucket_of(d) for d in before}) > 4  # spread over buckets

    # tiny stage: 3 coins → at most 3 buckets touched
    from pyspark.sql import functions as F

    n = normalize(read_raw_json(spark, os.path.join(raw_dir, "raw_coins_batch0.json")))
    small = n.filter(F.col("symbol").isin("c0000", "c0001", "c0002"))
    wh.upsert_batch(split_info(small), split_metrics(small))

    after = _manifest_parts(spark, wh.fact_path)
    changed_buckets = {
        _bucket_of(d)
        for d in set(before) ^ set(after)
    } | {_bucket_of(d) for d in before if d in after and before[d] != after[d]}
    assert 1 <= len(changed_buckets) <= 3  # only the stage's buckets
    # untouched buckets keep their exact manifest file lists
    untouched = [d for d in before if _bucket_of(d) not in changed_buckets]
    assert untouched and all(before[d] == after[d] for d in untouched)
    # data still complete and correct
    assert wh.fact().count() == fixtures.N_PER_BATCH
    assert wh.fact().filter("id = 'c0000'").count() == 1


def test_purge_removes_consumed_files(spark, tmp_path):
    d = tmp_path / "raw2"
    fixtures.write_batches(str(d))
    wh = CoinWarehouse(spark, str(tmp_path / "wh2"))
    run_batch_pipeline(
        spark,
        str(d / "raw_coins_batch0.json"),
        wh,
        archive_dir=str(tmp_path / "arch2"),
        purge=True,
    )
    remaining = sorted(os.listdir(d))
    assert "raw_coins_batch0.json" not in remaining  # M5
    assert "raw_coins_batch1.json" in remaining  # untouched
    assert os.path.exists(tmp_path / "arch2" / "raw_coins_batch0.json")


def test_schema_evolution_semantics(spark, tmp_path):
    """Reference §1.4 parity: a NEW upstream field is silently dropped
    by schema-on-read; a MISSING field yields nulls (vs. the
    reference's pandas KeyError crash — ours degrades, documented)."""
    import json as _json

    extra = tmp_path / "raw_coins_batch9.json"
    rows = [
        {
            "id": "coin-x", "symbol": "cx", "name": "X",
            "image": "https://img/x.png", "current_price": 1.0,
            "market_cap": 10, "market_cap_rank": 1,
            "last_updated": "2024-01-01T00:00:00Z",
            "brand_new_api_field": {"nested": True},  # unknown field
            # note: most schema fields absent entirely
        }
    ]
    extra.write_text(_json.dumps(rows))
    df = read_raw_json(spark, str(extra))
    r = df.first()
    assert "brand_new_api_field" not in df.columns  # new field dropped
    assert r["symbol"] == "cx"
    assert r["max_supply"] is None  # missing field → null, no crash
    info, metrics = split_info(normalize(df)), split_metrics(normalize(df))
    assert info.count() == 1 and metrics.first()["max_supply"] is None


def test_csv_compat_roundtrip(spark, raw_dir, tmp_path):
    # S6/S7: reference CSV dialect (header, comma, double-quote)
    n = normalize(read_raw_json(spark, os.path.join(raw_dir, "raw_coins_batch0.json")))
    info = split_info(n).drop("batch_id")
    path = str(tmp_path / "coin_info_csv")
    write_csv(info, path)
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("symbol", T.StringType()),
            T.StructField("image_url", T.StringType()),
        ]
    )
    back = read_csv(spark, path, schema)
    assert sorted(r["id"] for r in back.collect()) == sorted(
        r["id"] for r in info.collect()
    )
    assert back.columns == INFO_COLS


def test_crash_mid_commit_leaves_table_intact(spark, raw_dir, tmp_path):
    """A writer crashing AFTER staging data files but BEFORE publishing
    its manifest must leave the table byte-identical to readers: the
    orphan files are unreachable (no recovery step exists or is
    needed), and vacuum reclaims them without touching live data."""
    import glob

    from cryptocoininsights_data_engineer_project_spark.pipeline import manifest

    wh = CoinWarehouse(spark, str(tmp_path / "whc"), n_buckets=8)
    run_batch_pipeline(spark, os.path.join(raw_dir, "raw_coins_batch0.json"), wh)
    before_rows = sorted(map(str, wh.fact().collect()))

    # simulate the crash: stage a commit's files, never publish
    from pyspark.sql import functions as F

    n = normalize(read_raw_json(spark, os.path.join(raw_dir, "raw_coins_batch1.json")))
    doomed = wh._with_partition_cols(
        wh._bucketed(split_metrics(n)), wh.fact_path
    )
    manifest.stage_commit_files(
        spark, wh.fact_path, doomed, wh._partition_cols(wh.fact_path)
    )

    # orphan files are physically present yet invisible to every read
    live = {
        os.path.join(d, f) if d else f
        for d, fl in _manifest_parts(spark, wh.fact_path).items()
        for f in fl
    }
    on_disk = {
        os.path.relpath(p, wh.fact_path)
        for p in glob.glob(os.path.join(wh.fact_path, "**", "*.parquet"), recursive=True)
    }
    assert on_disk > live  # orphans exist...
    assert sorted(map(str, wh.fact().collect())) == before_rows  # ...unseen

    # vacuum reclaims exactly the orphans
    res = manifest.vacuum(spark, wh.fact_path, keep=2, retain_seconds=0)
    assert res["data_files"] == len(on_disk - live)
    assert sorted(map(str, wh.fact().collect())) == before_rows


def test_snapshot_isolation_no_mixed_version_reads(spark, raw_dir, tmp_path):
    """A reader that planned against snapshot N must keep reading
    snapshot N even while/after a commit publishes N+1 — never a blend
    of old and new buckets (the mixed-version window the old in-place
    directory swap had)."""
    from pyspark.sql import functions as F

    wh = CoinWarehouse(spark, str(tmp_path / "whs"), n_buckets=8)
    run_batch_pipeline(spark, os.path.join(raw_dir, "raw_coins_batch0.json"), wh)

    pinned = wh.fact()  # plan pinned to snapshot 1's file list
    before_rows = sorted(map(str, pinned.collect()))

    # commit snapshot 2: every c00xx coin's price bumped (all buckets)
    n = normalize(read_raw_json(spark, os.path.join(raw_dir, "raw_coins_batch0.json")))
    bump = split_metrics(n).withColumn(
        "current_price_usd", F.col("current_price_usd") + 1000000.0
    ).withColumn(
        "last_updated", F.col("last_updated") + F.expr("INTERVAL 1 DAY")
    )
    wh.upsert_batch(split_info(n), bump)

    # the pinned reader re-collects identically: all-old, zero-new rows
    assert sorted(map(str, pinned.collect())) == before_rows
    # a fresh reader sees all-new rows — also no blend
    fresh = wh.fact()
    assert fresh.filter(F.col("current_price_usd") < 1000000.0).count() == 0
    assert fresh.count() == len(before_rows)


def test_compaction_reduces_files_preserves_rows(spark, raw_dir, tmp_path):
    """Immutable-file commits accrete files in re-touched partitions
    (the REAL accretion path: each upsert adds files); compact()
    rewrites ONLY the multi-file partitions down to one manifest file
    each and the table contents are row-identical before/after."""
    from pyspark.sql import functions as F

    wh = CoinWarehouse(spark, str(tmp_path / "whf"), n_buckets=4)
    n0 = normalize(read_raw_json(spark, os.path.join(raw_dir, "raw_coins_batch0.json")))
    # AQE's partition coalescing hides the small-file state at test
    # scale (one post-shuffle partition → one file per dir); a wide
    # cluster writes one file PER TASK per dir — reproduce that
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(key, "true")
    try:
        spark.conf.set(key, "false")
        wh.upsert_batch(split_info(n0), split_metrics(n0))
    finally:
        spark.conf.set(key, old)

    before_rows = sorted(map(str, wh.fact().collect()))
    before = _manifest_parts(spark, wh.fact_path)
    assert any(len(fl) > 1 for fl in before.values())  # small files exist

    rewritten = wh.compact(wh.fact_path)
    after = _manifest_parts(spark, wh.fact_path)
    assert set(rewritten) == {d for d, fl in before.items() if len(fl) > 1}
    assert all(len(fl) == 1 for fl in after.values())
    # untouched (already-compact) partitions carried over unchanged
    for d, fl in before.items():
        if len(fl) == 1:
            assert after[d] == fl
    assert sorted(map(str, wh.fact().collect())) == before_rows
    # idempotent: second pass is a no-op
    assert wh.compact(wh.fact_path) == {}


def test_dynamic_partition_overwrite(spark, tmp_path):
    """Dynamic partition-overwrite: rewriting one partition's data
    leaves sibling partitions untouched — the write-side contract the
    bucketed upsert relies on conceptually, exposed as plain Spark
    conf for user tables."""
    dst = str(tmp_path / "dyn")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "id long, part string"
    )
    df.write.partitionBy("part").mode("overwrite").parquet(dst)
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        spark.createDataFrame([(9, "a")], "id long, part string").write.partitionBy(
            "part"
        ).mode("overwrite").parquet(dst)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    got = sorted((r.id, r.part) for r in spark.read.parquet(dst).collect())
    assert got == [(2, "b"), (9, "a")]  # partition b survived, a replaced


def test_observed_metrics_single_pass(spark, tmp_path):
    """pipeline.observed_metrics: QC counters ride the consuming action
    (no second scan) and agree with directly-computed values."""
    from cryptocoininsights_data_engineer_project_spark.pipeline import coins, fixtures

    d = tmp_path / "raw"
    d.mkdir()
    fixtures.write_batches(str(d))
    raw = coins.read_raw_json(spark, str(d))
    norm = coins.normalize(raw)
    observed, obs = coins.observed_metrics(norm)
    n = observed.count()  # the one action; metrics piggyback on it
    m = obs.get
    assert m["n_rows"] == n
    assert m["null_price_rows"] == norm.filter("current_price IS NULL").count()
    assert m["negative_price_rows"] == norm.filter("current_price < 0").count()
    assert m["approx_symbols"] > 0


def test_file_discovery_modes_agree(spark, tmp_path):
    """`glob` (metadata-only listing, the scale default) and `scan`
    (input_file_name collect, the parity mode) must archive/purge the
    same files; an unknown mode is rejected."""
    for mode in ("glob", "scan"):
        d = tmp_path / f"raw_{mode}"
        fixtures.write_batches(str(d))
        wh = CoinWarehouse(spark, str(tmp_path / f"wh_{mode}"))
        arch = tmp_path / f"arch_{mode}"
        stats = run_batch_pipeline(
            spark,
            str(d / "raw_coins_batch0.json"),
            wh,
            archive_dir=str(arch),
            purge=True,
            file_discovery=mode,
        )
        assert stats["files"] == 1
        assert not (d / "raw_coins_batch0.json").exists()
        assert (d / "raw_coins_batch1.json").exists()
        assert (arch / "raw_coins_batch0.json").exists()

    with pytest.raises(ValueError, match="file_discovery"):
        d = tmp_path / "raw_bad"
        fixtures.write_batches(str(d))
        run_batch_pipeline(
            spark,
            str(d / "raw_coins_batch0.json"),
            CoinWarehouse(spark, str(tmp_path / "wh_bad")),
            file_discovery="nope",
        )


def test_merge_schema_evolution(spark, raw_dir, tmp_path):
    """MERGE WITH SCHEMA EVOLUTION: a batch carrying a new metric
    column appends it to the fact table (old rows NULL), and a later
    NON-evolving batch must not narrow the evolved schema back."""
    from pyspark.sql import functions as F

    wh = CoinWarehouse(spark, str(tmp_path / "wh_evolve"))
    n0 = normalize(read_raw_json(spark, os.path.join(raw_dir, "raw_coins_batch0.json")))
    wh.upsert_batch(split_info(n0), split_metrics(n0))
    before = wh.fact()
    assert "ath_usd" not in before.columns
    n_before = before.count()

    # batch 1 ships a new column, evolve it in
    n1 = normalize(read_raw_json(spark, os.path.join(raw_dir, "raw_coins_batch1.json")))
    m1 = split_metrics(n1).withColumn(
        "ath_usd", F.col("current_price_usd") * 2
    )
    wh.upsert_batch(split_info(n1), m1, evolve_schema=True)
    f = wh.fact()
    assert "ath_usd" in f.columns
    # rows refreshed by batch 1 carry values; rows only in batch 0 are NULL
    batch1_ids = {r["id"] for r in m1.select("id").collect()}
    vals = {r["id"]: r["ath_usd"] for r in f.collect()}
    assert all(vals[i] is not None for i in batch1_ids)
    only_b0 = set(vals) - batch1_ids
    assert all(vals[i] is None for i in only_b0) and (not only_b0 or True)

    # a later legacy (non-evolving) batch keeps the evolved column
    n2 = normalize(read_raw_json(spark, os.path.join(raw_dir, "raw_coins_batch2.json")))
    wh.upsert_batch(split_info(n2), split_metrics(n2))
    f2 = wh.fact()
    assert "ath_usd" in f2.columns
    # values written by the evolving batch survive unless batch 2
    # re-touched that id (then the stage lacks the column -> passthrough
    # keeps the old value, per merge()'s passthrough contract)
    vals2 = {r["id"]: r["ath_usd"] for r in f2.collect()}
    assert any(v is not None for v in vals2.values())
    for i in batch1_ids:
        assert vals2[i] == vals[i]
    assert f2.count() >= n_before


def test_delete_keys_prunes_buckets(spark, raw_dir, tmp_path):
    """GDPR delete: the target ids vanish, ONLY their buckets rewrite
    (untouched buckets keep identical manifest file lists), and the op
    is idempotent."""
    from pyspark.sql import functions as F

    wh = CoinWarehouse(spark, str(tmp_path / "wh_del"))
    n0 = normalize(read_raw_json(spark, os.path.join(raw_dir, "raw_coins_batch0.json")))
    wh.upsert_batch(split_info(n0), split_metrics(n0))
    fact0 = wh.fact()
    all_ids = [r["id"] for r in fact0.select("id").collect()]
    victims = sorted(all_ids)[:3]
    n_before = fact0.count()

    before = _manifest_parts(spark, wh.fact_path)
    res = wh.delete_keys(wh.fact_path, victims)
    assert res["deleted"] == 3
    assert 1 <= res["buckets_rewritten"] <= 3
    after = _manifest_parts(spark, wh.fact_path)
    changed_buckets = {
        _bucket_of(d)
        for d in (set(before) ^ set(after))
        | {d for d in before if d in after and before[d] != after[d]}
    }
    assert len(changed_buckets) <= res["buckets_rewritten"]
    # untouched buckets keep byte-identical manifest listings
    untouched = [d for d in before if _bucket_of(d) not in changed_buckets]
    assert all(before[d] == after[d] for d in untouched)

    f = wh.fact()
    assert f.count() == n_before - 3
    assert f.filter(F.col("id").isin(victims)).count() == 0
    # idempotent
    res2 = wh.delete_keys(wh.fact_path, victims)
    assert res2["deleted"] == 0
    assert wh.fact().count() == n_before - 3
