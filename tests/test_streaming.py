"""Streaming surface tests (SURVEY.md §5.5): Trigger.AvailableNow on a
temp dir — drop files, assert per-micro-batch merge results, archival,
and exactly-once file consumption across restarts."""

from __future__ import annotations

import os
import shutil

import pytest

from cryptocoininsights_data_engineer_project_spark.pipeline import fixtures
from cryptocoininsights_data_engineer_project_spark.pipeline.coins import CoinWarehouse
from cryptocoininsights_data_engineer_project_spark.streaming.ingest import (
    stream_coin_pipeline,
    windowed_event_counts,
)


@pytest.fixture()
def dirs(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    return {
        "raw": str(raw),
        "wh": str(tmp_path / "wh"),
        "ckpt": str(tmp_path / "ckpt"),
        "archive": str(tmp_path / "archive"),
        "staging": str(tmp_path / "staging"),
    }


def _drop_batches(staging_dir, raw_dir, which):
    fixtures.write_batches(staging_dir)
    for b in which:
        shutil.copy(
            os.path.join(staging_dir, f"raw_coins_batch{b}.json"),
            os.path.join(raw_dir, f"raw_coins_batch{b}.json"),
        )


def test_stream_ingest_merge_and_archive(spark, dirs):
    wh = CoinWarehouse(spark, dirs["wh"])
    _drop_batches(dirs["staging"], dirs["raw"], [0, 1])

    q = stream_coin_pipeline(
        spark, dirs["raw"], wh, dirs["ckpt"], archive_dir=dirs["archive"]
    )
    q.awaitTermination(300)

    # batches 0+1 cover coins 0..349
    assert wh.dim().count() == 350
    assert wh.fact().count() == 350

    # T1 exactly-once: drop batch2 + re-drop batch0; only batch2 is new
    _drop_batches(dirs["staging"], dirs["raw"], [2])
    q2 = stream_coin_pipeline(
        spark, dirs["raw"], wh, dirs["ckpt"], archive_dir=dirs["archive"]
    )
    q2.awaitTermination(300)
    assert wh.fact().count() == 450

    # T3 cleanSource=archive moves consumed files out of the source
    # dir. The cleaner runs on a background thread, so archival is
    # best-effort for files consumed right before the query stops —
    # poll briefly and require at least the first run's files moved.
    import time

    def archived_files():
        out = []
        for _root, _, files in os.walk(dirs["archive"]):
            out += [f for f in files if f.endswith(".json")]
        return sorted(out)

    deadline = time.time() + 30
    while time.time() < deadline and len(archived_files()) < 2:
        time.sleep(1)
    archived = archived_files()
    assert archived[:2] == ["raw_coins_batch0.json", "raw_coins_batch1.json"]
    remaining = [f for f in os.listdir(dirs["raw"]) if f.endswith(".json")]
    # everything archived is gone from the source dir
    assert not (set(archived) & set(remaining))


def test_stream_upsert_last_write_wins(spark, dirs):
    # overlapping coins across micro-batches resolve to the later batch
    wh = CoinWarehouse(spark, dirs["wh"])
    _drop_batches(dirs["staging"], dirs["raw"], [0, 1, 2])
    q = stream_coin_pipeline(spark, dirs["raw"], wh, dirs["ckpt"])
    q.awaitTermination(300)
    m = wh.fact().filter("id = 'c0200'").first()  # in batches 1 and 2
    assert m["last_updated"].day == 3  # batch2 wrote last


def test_windowed_counts_batch_parity(spark, sf_dir):
    # T4: the streaming window plan applied to the batch events table
    # must equal a plain groupBy on day buckets
    from cryptocoininsights_data_engineer_project_spark.catalog import table

    events = table(spark, sf_dir, "events")
    win = windowed_event_counts(events, "24 hours", "1 hour")
    got = {
        (r["start"].isoformat(), r["event_type"]): (r["n"], r["total_value"])
        for r in win.collect()
    }
    from pyspark.sql import functions as F

    expect = {
        (r["day"].isoformat(), r["event_type"]): (r["n"], r["total_value"])
        for r in events.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .collect()
    }
    assert got == expect


def test_sliding_windowed_counts_batch_parity(spark, sf_dir):
    # the sliding form must equal the registry's sliding_window query
    # (span/slide = 2 windows per event, epoch-aligned starts)
    from cryptocoininsights_data_engineer_project_spark.catalog import table
    from cryptocoininsights_data_engineer_project_spark.queries import REGISTRY

    events = table(spark, sf_dir, "events")
    win = windowed_event_counts(events, "10 minutes", "1 hour", slide="5 minutes")
    got = {
        (r["start"].isoformat(), r["event_type"]): (r["n"], r["total_value"])
        for r in win.collect()
    }
    expect = {
        (r["win_start"].isoformat(), r["event_type"]): (r["n"], r["total_value"])
        for r in REGISTRY["sliding_window"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_windowed_counts_streaming_mode(spark, dirs, sf_dir):
    # run the same aggregation as a real stream over the events data
    # (json re-encoded), AvailableNow, results in a memory sink
    from cryptocoininsights_data_engineer_project_spark.catalog import table

    events = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = dirs["raw"]
    events.coalesce(1).write.mode("overwrite").json(src)
    schema = events.schema
    stream = spark.readStream.schema(schema).json(src)
    q = (
        windowed_event_counts(stream, "24 hours", "1 hour")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # append mode only emits windows sealed by the watermark; with
    # AvailableNow the final watermark seals all but the last window
    got = spark.sql("SELECT count(*) AS n FROM win_counts").first()["n"]
    batch = windowed_event_counts(events, "24 hours", "1 hour").count()
    assert got >= batch - 5  # all but the unsealed tail windows


def test_replayed_micro_batch_is_idempotent(spark, dirs):
    """Exactly-once end-to-end under retry: delete the checkpoint's
    last commit marker after a successful run — on restart Spark
    re-delivers the final micro-batch with the SAME batch_id — and the
    warehouse must come out row-identical (the MERGE + keep-latest
    dedupe make redelivery a no-op, like the reference's re-runnable
    Redshift MERGE)."""
    wh = CoinWarehouse(spark, dirs["wh"])
    _drop_batches(dirs["staging"], dirs["raw"], [0, 1])
    q = stream_coin_pipeline(spark, dirs["raw"], wh, dirs["ckpt"])
    q.awaitTermination(300)

    def snapshot():
        dim = sorted(map(str, wh.dim().collect()))
        fact = sorted(map(str, wh.fact().collect()))
        return dim, fact

    before = snapshot()
    assert len(before[1]) == 350

    # simulate a crash AFTER the sink wrote but BEFORE the commit
    # marker landed: remove the newest commit file; restart replays
    # that batch with the same batch_id
    commits = os.path.join(dirs["ckpt"], "commits")
    latest = max(
        (f for f in os.listdir(commits) if f.isdigit()), key=int
    )
    os.remove(os.path.join(commits, latest))
    crc = os.path.join(commits, f".{latest}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    q2 = stream_coin_pipeline(spark, dirs["raw"], wh, dirs["ckpt"])
    q2.awaitTermination(300)
    assert snapshot() == before


def test_streaming_ohlcv_batch_parity(spark, sf_dir):
    # the streaming candle plan applied to the batch events table must
    # equal the ohlcv_candles registry query row-for-row
    from cryptocoininsights_data_engineer_project_spark.catalog import table
    from cryptocoininsights_data_engineer_project_spark.queries import REGISTRY
    from cryptocoininsights_data_engineer_project_spark.streaming.ingest import (
        streaming_ohlcv,
    )

    events = table(spark, sf_dir, "events")
    got = {
        (r["bar_ts"].isoformat(), r["event_type"]): (
            r["open"], r["high"], r["low"], r["close"], r["volume"], r["n_trades"],
        )
        for r in streaming_ohlcv(events).collect()
    }
    expect = {
        (r["bar_ts"].isoformat(), r["event_type"]): (
            r["open"], r["high"], r["low"], r["close"], r["volume"], r["n_trades"],
        )
        for r in REGISTRY["ohlcv_candles"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_streaming_ohlcv_streaming_mode(spark, dirs, sf_dir):
    # real stream, AvailableNow: sealed candles must MATCH the batch
    # candles (not just count) — min_by/max_by state works in streaming
    from cryptocoininsights_data_engineer_project_spark.catalog import table
    from cryptocoininsights_data_engineer_project_spark.streaming.ingest import (
        streaming_ohlcv,
    )

    events = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    src = dirs["raw"]
    events.coalesce(1).write.mode("overwrite").json(src)
    stream = spark.readStream.schema(events.schema).json(src)
    q = (
        streaming_ohlcv(stream)
        .writeStream.format("memory")
        .queryName("ohlcv_stream")
        .outputMode("append")
        .option("checkpointLocation", dirs["ckpt"] + "_ohlcv")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["bar_ts"].isoformat(), r["event_type"]): (
            r["open"], r["high"], r["low"], r["close"], r["volume"], r["n_trades"],
        )
        for r in spark.sql("SELECT * FROM ohlcv_stream").collect()
    }
    batch = {
        (r["bar_ts"].isoformat(), r["event_type"]): (
            r["open"], r["high"], r["low"], r["close"], r["volume"], r["n_trades"],
        )
        for r in streaming_ohlcv(events).collect()
    }
    # append mode withholds candles the final watermark hasn't sealed
    assert set(got).issubset(set(batch))
    assert len(got) >= len(batch) - 10
    for k, v in got.items():
        assert v == batch[k]


def test_stream_candles_table_maintenance(spark, dirs, sf_dir, tmp_path):
    """The continuously-merged candle table must equal the batch OHLCV
    over all delivered ticks, and reprocessing the same ticks (fresh
    checkpoint — the replay case) must converge to the same table."""
    from cryptocoininsights_data_engineer_project_spark.catalog import table
    from cryptocoininsights_data_engineer_project_spark.queries import REGISTRY
    from cryptocoininsights_data_engineer_project_spark.streaming.ingest import (
        stream_candles_to_table,
    )

    events = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    ticks = str(tmp_path / "ticks")
    # two files -> two micro-batches, split by event time
    events.filter("event_id % 2 = 0").coalesce(1).write.json(ticks + "/a")
    events.filter("event_id % 2 = 1").coalesce(1).write.json(ticks + "/b")
    import glob
    import shutil

    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, f in enumerate(sorted(glob.glob(ticks + "/*/part-*.json"))):
        shutil.copy(f, f"{flat}/f{i}.json")

    tbl = str(tmp_path / "candles")
    q = stream_candles_to_table(spark, flat, tbl, str(tmp_path / "ck1"))
    q.awaitTermination(300)

    def snap(path):
        from cryptocoininsights_data_engineer_project_spark.pipeline.manifest import (
            SnapshotTable,
        )

        # snapshot read: superseded files persist until vacuum, so a
        # raw directory scan would double-count — the manifest is the
        # table
        return {
            (r["event_type"], r["bar_ts"].isoformat()): (
                r["open"], r["high"], r["low"], r["close"], r["volume"], r["n_trades"],
            )
            for r in SnapshotTable(spark, path).read().collect()
        }

    got = snap(tbl)
    expect = {
        (r["event_type"], r["bar_ts"].isoformat()): (
            r["open"], r["high"], r["low"], r["close"], r["volume"], r["n_trades"],
        )
        for r in REGISTRY["ohlcv_candles"].fn(spark, sf_dir).collect()
    }
    assert got == expect

    # replay: reprocess everything with a fresh checkpoint — the keyed
    # merge must converge to the identical table, not duplicate bars
    q2 = stream_candles_to_table(spark, flat, tbl, str(tmp_path / "ck2"))
    q2.awaitTermination(300)
    assert snap(tbl) == expect


def test_stream_candles_bucketed_table(spark, dirs, sf_dir, tmp_path):
    """The 100 TB candle maintainer (BucketedTable keyed on
    (event_type, bar_ts), date-partitioned): table equals the batch
    OHLCV over all delivered ticks, each micro-batch's commit replaces
    only the buckets its bars hash to, and replay converges."""
    from cryptocoininsights_data_engineer_project_spark.catalog import table
    from cryptocoininsights_data_engineer_project_spark.pipeline import manifest
    from cryptocoininsights_data_engineer_project_spark.pipeline.table import BucketedTable
    from cryptocoininsights_data_engineer_project_spark.queries import REGISTRY
    from cryptocoininsights_data_engineer_project_spark.streaming.ingest import (
        stream_candles_to_bucketed_table,
    )

    events = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    ticks = str(tmp_path / "bticks")
    events.filter("event_id % 2 = 0").coalesce(1).write.json(ticks + "/a")
    events.filter("event_id % 2 = 1").coalesce(1).write.json(ticks + "/b")
    import glob
    import shutil

    flat = str(tmp_path / "bflat")
    os.makedirs(flat)
    for i, f in enumerate(sorted(glob.glob(ticks + "/*/part-*.json"))):
        shutil.copy(f, f"{flat}/f{i}.json")

    tbl = str(tmp_path / "bcandles")
    q = stream_candles_to_bucketed_table(
        spark, flat, tbl, str(tmp_path / "bck1")
    )
    q.awaitTermination(300)

    def snap():
        bt = BucketedTable(
            spark, tbl, ["event_type", "bar_ts"], date_col="bar_ts"
        )
        return {
            (r["event_type"], r["bar_ts"].isoformat()): (
                r["open"], r["high"], r["low"], r["close"],
                r["volume"], r["n_trades"],
            )
            for r in bt.read().collect()
        }

    expect = {
        (r["event_type"], r["bar_ts"].isoformat()): (
            r["open"], r["high"], r["low"], r["close"],
            r["volume"], r["n_trades"],
        )
        for r in REGISTRY["ohlcv_candles"].fn(spark, sf_dir).collect()
    }
    assert snap() == expect

    # layout: date partition above the bucket
    parts = manifest.latest_manifest(spark, tbl)[1]["partitions"]
    assert parts and all(
        d.startswith("p_date=") and "/bucket=" in d for d in parts
    )
    # >= 2 commits (one per micro-batch), manifest history intact
    assert len(manifest.table_history(spark, tbl)) >= 2

    # replay with a fresh checkpoint: keyed merge converges, no dupes
    q2 = stream_candles_to_bucketed_table(
        spark, flat, tbl, str(tmp_path / "bck2")
    )
    q2.awaitTermination(300)
    assert snap() == expect


def test_stream_warc_ingest_exactly_once(spark, tmp_path):
    """The WARC→text extractor lifts to Structured Streaming
    unchanged: streamed output equals the batch query on the same
    archives, and a second run over the same checkpoint emits ONLY
    newly-arrived files (exactly-once per file)."""
    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        synth_warc_html_assets,
        warc_html_text,
    )
    from cryptocoininsights_data_engineer_project_spark.streaming.ingest import (
        stream_warc_ingest,
    )

    src = str(tmp_path / "warc_src")
    out = str(tmp_path / "warc_out")
    ckpt = str(tmp_path / "warc_ckpt")

    docs1 = spark.range(6).selectExpr("id AS doc_id")
    synth_warc_html_assets(docs1).write.mode("append").parquet(src)
    q = stream_warc_ingest(spark, src, out, ckpt)
    q.awaitTermination()

    got1 = spark.read.parquet(out)
    want1 = warc_html_text(synth_warc_html_assets(docs1))
    assert sorted(map(str, got1.collect())) == sorted(map(str, want1.collect()))

    # second batch of archives arrives; only its rows are appended
    docs2 = spark.range(6, 10).selectExpr("id AS doc_id")
    synth_warc_html_assets(docs2).write.mode("append").parquet(src)
    q = stream_warc_ingest(spark, src, out, ckpt)
    q.awaitTermination()

    got2 = spark.read.parquet(out)
    assert got2.count() == 10
    assert got2.select("asset_id").distinct().count() == 10
    # replaying with nothing new is a clean no-op
    q = stream_warc_ingest(spark, src, out, ckpt)
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 10


def test_stream_incremental_dedup_converges(spark, tmp_path):
    """Streaming cross-run dedup: pairs accumulated over micro-batches
    (each probing the persisted fingerprint index) equal the one-shot
    banding over ALL delivered docs; a fresh-checkpoint replay over
    the same files converges to the same tables; a replayed
    micro-batch (same txn marker) is skipped at the manifest."""
    from cryptocoininsights_data_engineer_project_spark.operators.dedup import (
        minhash_candidate_pairs,
    )
    from cryptocoininsights_data_engineer_project_spark.pipeline.table import (
        BucketedTable,
    )
    from cryptocoininsights_data_engineer_project_spark.queries import _t
    from cryptocoininsights_data_engineer_project_spark.streaming.ingest import (
        stream_incremental_dedup,
    )

    docs = _t(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    src = str(tmp_path / "ddocs")
    os.makedirs(src)
    # three arrival files -> three micro-batches (maxFilesPerTrigger=1)
    for i in range(3):
        docs.filter(f"doc_id % 3 = {i}").coalesce(1).write.parquet(
            f"{str(tmp_path)}/stage{i}"
        )
        import glob as _glob
        import shutil as _shutil

        part = _glob.glob(f"{str(tmp_path)}/stage{i}/part-*.parquet")[0]
        _shutil.copy(part, f"{src}/batch{i}.parquet")

    root = str(tmp_path / "dtbl")
    ck = str(tmp_path / "dck1")
    q = stream_incremental_dedup(spark, src, root, ck)
    q.awaitTermination(300)

    def pairs_snap():
        t = BucketedTable(spark, root + "/pairs", ["doc_a", "doc_b"])
        return {(r.doc_a, r.doc_b) for r in t.read().collect()}

    expect = {
        (r.doc_a, r.doc_b) for r in minhash_candidate_pairs(docs).collect()
    }
    assert expect, "fixture produced no candidate pairs"
    assert pairs_snap() == expect

    # the index holds every delivered doc's fingerprints exactly once
    bands = BucketedTable(spark, root + "/bands", ["doc_id", "band_id"]).read()
    n_docs = docs.count()
    per_doc = bands.groupBy("doc_id").count().select("count").distinct()
    assert bands.select("doc_id").distinct().count() == n_docs
    assert per_doc.count() == 1  # same band count for every doc

    # fresh-checkpoint replay over the SAME files: tables converge
    q2 = stream_incremental_dedup(spark, src, root, str(tmp_path / "dck2"))
    q2.awaitTermination(300)
    assert pairs_snap() == expect

    # replayed micro-batch with an already-recorded txn marker: both
    # upserts are skipped at the manifest (exactly-once, not re-merged)
    pairs_tbl = BucketedTable(spark, root + "/pairs", ["doc_a", "doc_b"])
    some = pairs_tbl.read().limit(1)
    assert pairs_tbl.upsert(some, txn=(ck + "#pairs", 0)) is False


def test_stream_incremental_image_dedup_converges(spark, tmp_path):
    """Streaming cross-run IMAGE dedup (the phash mirror): pairs
    accumulated over micro-batches equal the one-shot
    ``image_phash_pairs`` over ALL delivered docs; the codes index
    holds exactly 4 chunk rows per image; a fresh-checkpoint replay
    converges; a replayed txn marker is skipped at the manifest."""
    from cryptocoininsights_data_engineer_project_spark.operators.dedup import (
        image_phash_pairs,
    )
    from cryptocoininsights_data_engineer_project_spark.pipeline.table import (
        BucketedTable,
    )
    from cryptocoininsights_data_engineer_project_spark.queries import _t
    from cryptocoininsights_data_engineer_project_spark.streaming.ingest import (
        stream_incremental_image_dedup,
    )

    docs = _t(spark, "/root/testdata/sf0.001", "documents").select("doc_id")
    src = str(tmp_path / "idocs")
    os.makedirs(src)
    for i in range(3):
        docs.filter(f"doc_id % 3 = {i}").coalesce(1).write.parquet(
            f"{str(tmp_path)}/istage{i}"
        )
        import glob as _glob
        import shutil as _shutil

        part = _glob.glob(f"{str(tmp_path)}/istage{i}/part-*.parquet")[0]
        _shutil.copy(part, f"{src}/batch{i}.parquet")

    root = str(tmp_path / "itbl")
    ck = str(tmp_path / "ick1")
    q = stream_incremental_image_dedup(spark, src, root, ck)
    q.awaitTermination(300)

    def pairs_snap():
        t = BucketedTable(spark, root + "/pairs", ["doc_a", "doc_b"])
        return {
            (r.doc_a, r.doc_b, r.hamming) for r in t.read().collect()
        }

    expect = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in image_phash_pairs(docs).collect()
    }
    assert expect, "fixture produced no phash pairs"
    assert pairs_snap() == expect

    # index: every delivered image exactly once, 4 chunk rows each
    codes = BucketedTable(
        spark, root + "/codes", ["doc_id", "chunk_id"]
    ).read()
    n_docs = docs.count()
    assert codes.count() == 4 * n_docs
    assert codes.select("doc_id").distinct().count() == n_docs

    # fresh-checkpoint replay over the SAME files converges
    q2 = stream_incremental_image_dedup(
        spark, src, root, str(tmp_path / "ick2")
    )
    q2.awaitTermination(300)
    assert pairs_snap() == expect
    assert BucketedTable(
        spark, root + "/codes", ["doc_id", "chunk_id"]
    ).read().count() == 4 * n_docs

    # replayed micro-batch with a recorded txn marker: skipped
    pairs_tbl = BucketedTable(spark, root + "/pairs", ["doc_a", "doc_b"])
    some = pairs_tbl.read().limit(1)
    assert pairs_tbl.upsert(some, txn=(ck + "#pairs", 0)) is False


def test_stream_corpus_mix_equals_one_shot(spark, tmp_path):
    """Streaming temperature mix: the late-bound selection over the
    assignment table accumulated across micro-batches equals the
    one-shot corpus_mix_temperature over ALL delivered docs; a
    fresh-checkpoint replay converges (keyed assignments); a replayed
    txn marker is skipped at the manifest."""
    from cryptocoininsights_data_engineer_project_spark.pipeline.table import (
        BucketedTable,
    )
    from cryptocoininsights_data_engineer_project_spark.queries import (
        REGISTRY,
        _t,
    )
    from cryptocoininsights_data_engineer_project_spark.streaming.ingest import (
        corpus_mix_selection,
        stream_corpus_mix,
    )

    docs = _t(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "source"
    )
    src = str(tmp_path / "mdocs")
    os.makedirs(src)
    for i in range(3):
        docs.filter(f"doc_id % 3 = {i}").coalesce(1).write.parquet(
            f"{str(tmp_path)}/mstage{i}"
        )
        import glob as _glob
        import shutil as _shutil

        part = _glob.glob(f"{str(tmp_path)}/mstage{i}/part-*.parquet")[0]
        _shutil.copy(part, f"{src}/batch{i}.parquet")

    root = str(tmp_path / "mixtbl")
    ck = str(tmp_path / "mck1")
    q = stream_corpus_mix(spark, src, root, ck)
    q.awaitTermination(300)

    def snap():
        return {
            (r.doc_id, r.source, r.keep_ppm)
            for r in corpus_mix_selection(spark, root).collect()
        }

    expect = {
        (r.doc_id, r.source, r.keep_ppm)
        for r in REGISTRY["corpus_mix_temperature"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert expect, "one-shot mix kept nothing"
    assert snap() == expect

    # fresh-checkpoint replay over the SAME files: converges (keyed)
    q2 = stream_corpus_mix(spark, src, root, str(tmp_path / "mck2"))
    q2.awaitTermination(300)
    assert snap() == expect

    # replayed micro-batch txn marker: skipped at the manifest
    assign_tbl = BucketedTable(spark, root + "/assign", ["doc_id"])
    some = assign_tbl.read().limit(1)
    assert assign_tbl.upsert(some, txn=(ck + "#assign", 0)) is False


def test_stream_training_corpus_equals_one_shot(spark, tmp_path):
    """The composed streaming corpus pipeline (VERDICT r12 item 5):
    per-doc text-grain work per micro-batch + late-bound global
    selection over metadata must equal prepare_training_corpus over
    ALL delivered documents — packs, splits, everything; and a
    fresh-checkpoint replay over the same files converges."""
    from cryptocoininsights_data_engineer_project_spark.pipeline.corpus import (
        prepare_training_corpus,
    )
    from cryptocoininsights_data_engineer_project_spark.queries import _t
    from cryptocoininsights_data_engineer_project_spark.streaming.ingest import (
        select_training_corpus,
        stream_training_corpus,
    )

    docs = _t(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    benchmark = docs.filter("doc_id % 17 = 0").select("doc_id", "text")

    src = str(tmp_path / "cdocs")
    os.makedirs(src)
    import glob as _glob
    import shutil as _shutil

    for i in range(3):
        docs.filter(f"doc_id % 3 = {i}").coalesce(1).write.parquet(
            f"{str(tmp_path)}/cstage{i}"
        )
        part = _glob.glob(f"{str(tmp_path)}/cstage{i}/part-*.parquet")[0]
        _shutil.copy(part, f"{src}/batch{i}.parquet")

    root = str(tmp_path / "ctbl")
    q = stream_training_corpus(
        spark, src, benchmark, root, str(tmp_path / "cck1")
    )
    q.awaitTermination(300)

    def snap():
        return {
            (r.doc_id, r.shard, r.pack_id, r.n_tokens, r.split)
            for r in select_training_corpus(spark, root).collect()
        }

    packs, _stats = prepare_training_corpus(docs, benchmark)
    expect = {
        (r.doc_id, r.shard, r.pack_id, r.n_tokens, r.split)
        for r in packs.collect()
    }
    assert expect, "one-shot pipeline packed nothing"
    got = snap()
    assert got == expect

    # fresh-checkpoint replay over the SAME files: converges (keyed
    # meta/bands rows; pairs merge on their own key)
    q2 = stream_training_corpus(
        spark, src, benchmark, root, str(tmp_path / "cck2")
    )
    q2.awaitTermination(300)
    assert snap() == expect


def test_warc_to_training_corpus_stream(spark, tmp_path):
    """The full web-scale path as TWO chained streams: WARC archives
    -> (stream_warc_to_corpus_docs) -> documents-shaped parquet ->
    (stream_training_corpus) -> metadata/fingerprint tables, whose
    late-bound selection equals the one-shot
    prepare_corpus_from_warc over the same archives."""
    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        synth_warc_html_assets,
    )
    from cryptocoininsights_data_engineer_project_spark.pipeline.corpus import (
        prepare_corpus_from_warc,
    )
    from cryptocoininsights_data_engineer_project_spark.queries import _t
    from cryptocoininsights_data_engineer_project_spark.streaming.ingest import (
        select_training_corpus,
        stream_training_corpus,
        stream_warc_to_corpus_docs,
    )

    assets_src = str(tmp_path / "wsrc")
    docs_dir = str(tmp_path / "wdocs")
    table_root = str(tmp_path / "wtbl")

    base = spark.range(40).selectExpr("id AS doc_id")
    assets = synth_warc_html_assets(base)
    # two arrival waves exercise both streams' checkpointing
    assets.filter("asset_id % 2 = 0").write.mode("append").parquet(assets_src)
    q = stream_warc_to_corpus_docs(
        spark, assets_src, docs_dir, str(tmp_path / "wck1")
    )
    q.awaitTermination(300)
    benchmark = (
        _t(spark, "/root/testdata/sf0.001", "documents")
        .filter("doc_id % 17 = 0")
        .select("doc_id", "text")
    )
    q = stream_training_corpus(
        spark, docs_dir, benchmark, table_root, str(tmp_path / "wck2")
    )
    q.awaitTermination(300)

    assets.filter("asset_id % 2 = 1").write.mode("append").parquet(assets_src)
    q = stream_warc_to_corpus_docs(
        spark, assets_src, docs_dir, str(tmp_path / "wck1")
    )
    q.awaitTermination(300)
    q = stream_training_corpus(
        spark, docs_dir, benchmark, table_root, str(tmp_path / "wck2")
    )
    q.awaitTermination(300)

    got = {
        (r.doc_id, r.shard, r.pack_id, r.n_tokens, r.split)
        for r in select_training_corpus(spark, table_root).collect()
    }
    packs, _stats = prepare_corpus_from_warc(assets, benchmark)
    want = {
        (r.doc_id, r.shard, r.pack_id, r.n_tokens, r.split)
        for r in packs.collect()
    }
    assert want, "one-shot WARC pipeline packed nothing"
    assert got == want
