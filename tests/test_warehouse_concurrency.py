"""Concurrent-writer safety for the manifest-committed warehouse
(pipeline/manifest.py + CoinWarehouse): racing writers both land (the
loser retries against the winner's snapshot — no lost buckets), readers
are snapshot-isolated, contention beyond the retry budget fails loudly,
and the date/bucket fact layout prunes time windows (PartitionFilters).

The reference never faces any of this: Airflow serializes its DAG
(coininsights.py:358-363). That degenerate case — writers arriving one
at a time — is every other test in tests/test_pipeline.py; here we
force the races a 100 TB deployment actually has (a streaming candle
maintainer upserting while a batch merge/compact runs)."""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

from cryptocoininsights_data_engineer_project_spark.pipeline import fixtures, manifest
from cryptocoininsights_data_engineer_project_spark.pipeline.coins import (
    CoinWarehouse,
    normalize,
    read_raw_json,
    split_info,
    split_metrics,
)


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw_conc")
    fixtures.write_batches(str(d))
    return str(d)


def _batch(spark, raw_dir, b):
    return normalize(
        read_raw_json(spark, os.path.join(raw_dir, f"raw_coins_batch{b}.json"))
    )


def _run_racing(targets):
    """Run callables on threads behind a barrier; re-raise any error."""
    barrier = threading.Barrier(len(targets))
    errors = []

    def wrap(fn):
        def run():
            try:
                barrier.wait()
                fn()
            except Exception as e:  # noqa: BLE001 - surfaced below
                errors.append(e)

        return run

    threads = [threading.Thread(target=wrap(fn)) for fn in targets]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]


def test_two_upserts_race_no_lost_rows(spark, raw_dir, tmp_path):
    """Two writers upserting DIFFERENT batches concurrently: the CAS
    loser must re-merge against the winner's snapshot, so the final
    table is the union — identical to any serial order (batches 0/1
    overlap on ids c0150-c0299, where either's value is a valid
    keep-latest outcome; ROW COVERAGE must be exact)."""
    wh = CoinWarehouse(spark, str(tmp_path / "wh_race"), n_buckets=8)
    n0, n1 = _batch(spark, raw_dir, 0), _batch(spark, raw_dir, 1)

    _run_racing(
        [
            lambda: wh.upsert_batch(split_info(n0), split_metrics(n0)),
            lambda: wh.upsert_batch(split_info(n1), split_metrics(n1)),
        ]
    )

    fact = wh.fact()
    want_ids = {r["symbol"] for r in n0.select("symbol").collect()} | {
        r["symbol"] for r in n1.select("symbol").collect()
    }
    got_ids = {r["id"] for r in fact.select("id").collect()}
    assert got_ids == want_ids  # no batch's rows were lost
    assert fact.count() == len(want_ids)  # keep-latest: one row per id
    # both commits materialized as distinct manifest versions
    versions = manifest.list_versions(spark, wh.fact_path)
    assert len(versions) == 2 and versions == sorted(versions)


def test_upsert_races_compact(spark, raw_dir, tmp_path):
    """An upsert racing a compaction: exactly one wins each manifest
    slot, the loser retries, and the final table holds every row of
    both operations (compact never changes content; upsert's rows all
    land)."""
    wh = CoinWarehouse(spark, str(tmp_path / "wh_rc"), n_buckets=4)
    n0 = _batch(spark, raw_dir, 0)
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(key, "true")
    try:
        spark.conf.set(key, "false")  # manufacture multi-file partitions
        wh.upsert_batch(split_info(n0), split_metrics(n0))
    finally:
        spark.conf.set(key, old)
    assert any(
        len(fl) > 1
        for fl in manifest.latest_manifest(spark, wh.fact_path)[1][
            "partitions"
        ].values()
    )

    n2 = _batch(spark, raw_dir, 2)
    _run_racing(
        [
            lambda: wh.upsert_batch(split_info(n2), split_metrics(n2)),
            lambda: wh.compact(wh.fact_path),
        ]
    )

    fact = wh.fact()
    want_ids = {r["symbol"] for r in n0.select("symbol").collect()} | {
        r["symbol"] for r in n2.select("symbol").collect()
    }
    assert {r["id"] for r in fact.select("id").collect()} == want_ids
    # batch 2's values won on its ids (it merged last or re-merged)
    day3 = {r["symbol"] for r in n2.select("symbol").collect()}
    got = {r["id"]: r["last_updated"].day for r in fact.collect()}
    assert all(got[i] == 3 for i in day3)


def test_contention_beyond_retry_budget_fails_loudly(
    spark, raw_dir, tmp_path, monkeypatch
):
    """A writer that cannot win the CAS within max_commit_retries must
    raise ConcurrentWriteError — never silently drop its batch."""
    wh = CoinWarehouse(
        spark, str(tmp_path / "wh_loud"), n_buckets=4, max_commit_retries=2
    )
    monkeypatch.setattr(
        manifest, "publish_manifest", lambda *a, **k: False
    )
    n0 = _batch(spark, raw_dir, 0)
    with pytest.raises(manifest.ConcurrentWriteError):
        wh.upsert_batch(split_info(n0), split_metrics(n0))


def test_fact_date_partition_prunes(spark, raw_dir, tmp_path):
    """The date/bucket fact layout: a time-windowed read shows
    PartitionFilters on p_date and scans only matching dates' files;
    the merge path still prunes on bucket alone (merge I/O ∝ delta is
    asserted in test_pipeline.py::test_partition_pruned_merge)."""
    import contextlib
    import io

    wh = CoinWarehouse(spark, str(tmp_path / "wh_date"), n_buckets=4)
    for b in range(3):  # three batches, last_updated days 1/2/3
        nb = _batch(spark, raw_dir, b)
        wh.upsert_batch(split_info(nb), split_metrics(nb))

    parts = manifest.latest_manifest(spark, wh.fact_path)[1]["partitions"]
    dates = {d.split("/")[0] for d in parts}
    assert len(dates) >= 2  # layout really is p_date=<d>/bucket=<k>
    assert all(d.startswith("p_date=") for d in dates)

    snap = wh.fact_snapshot()
    windowed = snap.filter(F.col("p_date") == "2024-01-03")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        windowed.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "p_date" in plan.split("PartitionFilters")[1].split("\n")[0]
    # and the windowed read returns exactly the day-3 rows
    day3_rows = windowed.count()
    assert day3_rows == wh.fact().filter(
        F.to_date("last_updated") == "2024-01-03"
    ).count()
    assert day3_rows > 0


def test_streaming_candle_table_commits_atomically(spark, tmp_path):
    """SnapshotTable (the candle-table fix for ADVICE r4): interrupted
    overwrites leave orphans, not torn tables, and update() re-derives
    after losing a race instead of committing a stale merge."""
    t = manifest.SnapshotTable(spark, str(tmp_path / "cands"))
    df1 = spark.createDataFrame([("e", 1, 10.0)], "k string, ts int, v double")
    t.overwrite(df1)

    # crash-simulation: stage files but never publish → readers unmoved
    manifest.stage_commit_files(
        spark,
        t.path,
        spark.createDataFrame([("x", 9, 99.0)], "k string, ts int, v double"),
        [],
    )
    assert [(r.k, r.ts, r.v) for r in t.read().collect()] == [("e", 1, 10.0)]

    # update(): builder sees the CURRENT snapshot each attempt
    seen = []

    def build(cur):
        seen.append(None if cur is None else cur.count())
        add = spark.createDataFrame(
            [("e2", 2, 20.0)], "k string, ts int, v double"
        )
        return add if cur is None else cur.union(add)

    t.update(build)
    assert seen == [1]
    assert sorted(r.k for r in t.read().collect()) == ["e", "e2"]
    t.vacuum(keep=1, retain_seconds=0)
    assert sorted(r.k for r in t.read().collect()) == ["e", "e2"]


def test_time_travel_history_and_rollback(spark, raw_dir, tmp_path):
    """The manifest log is a commit history: read_version time-travels
    inside the retention window, rollback publishes a NEW version equal
    to an old snapshot (roll-forward undo — nothing deleted), and a
    vacuumed-away version fails loudly instead of reading empty."""
    from pyspark.sql import functions as F

    wh = CoinWarehouse(spark, str(tmp_path / "wh_tt"), n_buckets=4)
    n0 = _batch(spark, raw_dir, 0)
    wh.upsert_batch(split_info(n0), split_metrics(n0))
    v1_rows = sorted(map(str, wh.fact().collect()))

    bump = split_metrics(n0).withColumn(
        "current_price_usd", F.col("current_price_usd") * 2
    ).withColumn("last_updated", F.col("last_updated") + F.expr("INTERVAL 1 DAY"))
    wh.upsert_batch(split_info(n0), bump)
    v2_rows = sorted(map(str, wh.fact().collect()))
    assert v2_rows != v1_rows

    hist = manifest.table_history(spark, wh.fact_path)
    assert [h["version"] for h in hist] == [1, 2]

    # time travel: AS OF 1 returns the pre-bump table
    past = manifest.read_version(spark, wh.fact_path, 1)
    assert sorted(map(str, past.drop("bucket", "p_date").collect())) == v1_rows

    # rollback: version 3 == version 1's content, history intact
    v3 = manifest.rollback(spark, wh.fact_path, 1)
    assert v3 == 3
    assert sorted(map(str, wh.fact().collect())) == v1_rows
    assert [h["version"] for h in manifest.table_history(spark, wh.fact_path)] == [1, 2, 3]

    # retention: vacuum(keep=1) drops old manifests; reading them raises
    manifest.vacuum(spark, wh.fact_path, keep=1, retain_seconds=0)
    with pytest.raises(KeyError, match="version 2"):
        manifest.read_version(spark, wh.fact_path, 2)
    assert sorted(map(str, wh.fact().collect())) == v1_rows


def test_txn_marker_makes_upserts_exactly_once(spark, tmp_path):
    """Delta-style txn markers: an upsert replayed with the same
    (app_id, version) is skipped at the manifest — exactly-once, not
    merely merge-idempotent — while higher versions apply, other
    app_ids are independent, and delete/compact carry the txn map
    forward."""
    from cryptocoininsights_data_engineer_project_spark.pipeline.table import BucketedTable

    t = BucketedTable(spark, str(tmp_path / "txn_tbl"), ["id"], n_buckets=4)
    b0 = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "id string, v double")
    assert t.upsert(b0, txn=("q1", 0)) is True
    v1 = sorted(map(str, t.read().collect()))

    # replay of batch 0 with CHANGED data must be skipped entirely
    b0_replay = spark.createDataFrame([("a", 99.0)], "id string, v double")
    assert t.upsert(b0_replay, txn=("q1", 0)) is False
    assert sorted(map(str, t.read().collect())) == v1

    # the next batch applies
    b1 = spark.createDataFrame([("c", 3.0)], "id string, v double")
    assert t.upsert(b1, txn=("q1", 1)) is True
    assert t.read().count() == 3
    # ...and an out-of-order replay of batch 0 is still skipped
    assert t.upsert(b0_replay, txn=("q1", 0)) is False

    # an unrelated writer's txn namespace is independent
    assert t.upsert(
        spark.createDataFrame([("d", 4.0)], "id string, v double"),
        txn=("q2", 0),
    ) is True
    assert t.read().count() == 4

    # maintenance ops preserve the txn map
    t.compact()
    t.delete_keys(spark.createDataFrame([("d",)], "id string"))
    assert t.upsert(b0_replay, txn=("q1", 0)) is False
    assert t.upsert(b0_replay, txn=("q2", 0)) is False
    assert sorted(r.id for r in t.read().collect()) == ["a", "b", "c"]


# ---------------------------------------------------------------------------
# Crash injection: kill the writer INSIDE the commit protocol — after
# stage_commit_files has renamed fresh parquet files into live partition
# directories, before publish_manifest's CAS. This is the exact window
# where the files are physically present but referenced by no manifest,
# so it is both the crash-safety proof and the reason vacuum's age gate
# exists (a concurrent auto-vacuum must NOT treat a mid-commit file as
# a dead orphan).
# ---------------------------------------------------------------------------

import glob

from cryptocoininsights_data_engineer_project_spark.pipeline.table import BucketedTable


class _InjectedCrash(Exception):
    """Stands in for SIGKILL: the writer's process dies between staging
    its data files and publishing its manifest."""


def _crash_next_publishes(monkeypatch, n_crashes=1):
    """Make the next ``n_crashes`` publish_manifest calls die before the
    CAS; later calls go through. Patching the module attribute covers
    every caller (table.py and coins.py resolve it at call time)."""
    real = manifest.publish_manifest
    calls = {"n": 0}

    def crashing(spark, root, version, m):
        calls["n"] += 1
        if calls["n"] <= n_crashes:
            raise _InjectedCrash(f"injected crash #{calls['n']}")
        return real(spark, root, version, m)

    monkeypatch.setattr(manifest, "publish_manifest", crashing)
    return calls


def _parquet_on_disk(path):
    return {
        os.path.relpath(p, path)
        for p in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    }


def test_upsert_crash_between_stage_and_cas(spark, tmp_path, monkeypatch):
    """Writer dies after its files land in live partition dirs but
    before the manifest CAS: readers keep seeing exactly the prior
    snapshot, the default (age-gated) vacuum leaves the fresh files
    alone — they could belong to an in-flight commit — and only an
    explicit retain_seconds=0 maintenance vacuum reclaims them."""
    t = BucketedTable(spark, str(tmp_path / "crash_upsert"), ["id"], n_buckets=4)
    assert t.upsert(spark.createDataFrame([("a", 1.0), ("b", 2.0)], "id string, v double"))
    before = sorted(map(str, t.read().collect()))
    files_before = _parquet_on_disk(t.path)

    _crash_next_publishes(monkeypatch)
    with pytest.raises(_InjectedCrash):
        t.upsert(spark.createDataFrame([("b", 9.0), ("c", 3.0)], "id string, v double"))

    # no mixed version: reads are byte-identical to the pre-crash table
    assert sorted(map(str, t.read().collect())) == before
    orphans = _parquet_on_disk(t.path) - files_before
    assert orphans  # the crashed commit's files ARE on disk...

    # ...and the age-gated vacuum (auto-vacuum's shape) must NOT delete
    # them: a file this young may belong to a commit that is still
    # in flight. This is the round-5 advice scenario, inverted to green.
    res = t.vacuum(keep=2)
    assert res["data_files"] == 0
    assert orphans <= _parquet_on_disk(t.path)

    # offline maintenance (no writer can be mid-commit) reclaims them
    res = t.vacuum(keep=2, retain_seconds=0)
    assert res["data_files"] == len(orphans)
    assert sorted(map(str, t.read().collect())) == before

    # the writer's retry (process restart) lands cleanly afterwards
    assert t.upsert(spark.createDataFrame([("b", 9.0), ("c", 3.0)], "id string, v double"))
    assert sorted(r.id for r in t.read().collect()) == ["a", "b", "c"]
    assert {r.v for r in t.read().where("id='b'").collect()} == {9.0}


def test_compact_crash_between_stage_and_cas(spark, tmp_path, monkeypatch):
    """Compaction dies mid-commit: the table keeps its pre-compact file
    list and rows; the staged compacted files are vacuumable orphans; a
    re-run compaction succeeds and preserves row content."""
    t = BucketedTable(spark, str(tmp_path / "crash_compact"), ["id"], n_buckets=2)
    # a 3-task stage write leaves multiple files per bucket dir -> compactable
    stage0 = spark.createDataFrame(
        [(f"k{i}", float(i)) for i in range(6)], "id string, v double"
    ).repartition(3)
    t.upsert(stage0)
    assert any(
        len(fl) > 1
        for fl in manifest.latest_manifest(spark, t.path)[1]["partitions"].values()
    )
    rows_before = sorted(map(str, t.read().collect()))
    files_before = _parquet_on_disk(t.path)

    _crash_next_publishes(monkeypatch)
    with pytest.raises(_InjectedCrash):
        t.compact()
    assert sorted(map(str, t.read().collect())) == rows_before
    assert files_before <= _parquet_on_disk(t.path)  # nothing live deleted

    t.vacuum(keep=len(t.history()), retain_seconds=0)  # reclaim staged output only
    assert sorted(map(str, t.read().collect())) == rows_before

    t.compact()
    assert sorted(map(str, t.read().collect())) == rows_before


def test_stream_replay_after_crash_txn_skip(spark, tmp_path, monkeypatch):
    """foreachBatch replay semantics under a sink-side crash: micro-batch
    N's upsert dies between stage and CAS (sink did NOT commit), the
    restarted query re-delivers batch N and it must COMMIT (the txn
    marker was never recorded); a second re-delivery after the
    successful commit must SKIP. Exactly-once, not merely idempotent."""
    t = BucketedTable(spark, str(tmp_path / "crash_replay"), ["id"], n_buckets=2)
    ckpt = "ckpt-A"
    assert t.upsert(
        spark.createDataFrame([("a", 1.0)], "id string, v double"), txn=(ckpt, 0)
    ) is True

    batch1 = spark.createDataFrame([("a", 5.0), ("b", 2.0)], "id string, v double")
    _crash_next_publishes(monkeypatch)
    with pytest.raises(_InjectedCrash):
        t.upsert(batch1, txn=(ckpt, 1))
    # crash BEFORE the CAS: txn 1 is not recorded, table still at batch 0
    assert sorted(map(str, t.read().collect())) == ["Row(id='a', v=1.0)"]

    # restart replays batch 1 -> must apply (not be mistaken for done)
    assert t.upsert(batch1, txn=(ckpt, 1)) is True
    after = sorted(map(str, t.read().collect()))
    assert after == ["Row(id='a', v=5.0)", "Row(id='b', v=2.0)"]

    # duplicate delivery after the successful commit -> clean skip
    assert t.upsert(batch1, txn=(ckpt, 1)) is False
    assert sorted(map(str, t.read().collect())) == after


def test_vacuum_aborts_on_unreadable_retained_manifest(spark, tmp_path):
    """An unreadable manifest INSIDE the retention window means its
    file references are unknown — vacuum must abort loudly, never
    classify those files as orphans (round-5 advice: skipping the
    manifest treated a live commit's files as dead)."""
    t = BucketedTable(spark, str(tmp_path / "vac_abort"), ["id"], n_buckets=2)
    t.upsert(spark.createDataFrame([("a", 1.0)], "id string, v double"))
    t.upsert(spark.createDataFrame([("b", 2.0)], "id string, v double"))
    newest = manifest.list_versions(spark, t.path)[-1]
    mp = os.path.join(t.path, manifest.MANIFEST_DIR, f"m-{newest:012d}.json")
    with open(mp, "wb") as f:
        f.write(b"\x00 not json \x00")
    with pytest.raises(manifest.VacuumError, match=f"version {newest}"):
        t.vacuum(keep=2, retain_seconds=0)
    # nothing was deleted: the older snapshot still reads completely
    assert sorted(r.id for r in manifest.read_version(spark, t.path, newest - 1).collect()) == ["a"]


def test_publish_manifest_rewraps_only_linkless_errno(
    spark, tmp_path, monkeypatch
):
    """The os.link CAS fallback message is reserved for mounts that
    genuinely cannot hard-link (EPERM/EOPNOTSUPP/ENOTSUP); a real I/O
    failure (ENOSPC/EIO/...) must propagate unwrapped so operators see
    the true cause instead of a misleading 'mount lacks hard links'."""
    import errno

    root = str(tmp_path / "errno_gate")

    def _link_raises(code):
        def link(src, dst):
            raise OSError(code, os.strerror(code), dst)

        return link

    monkeypatch.setattr(os, "link", _link_raises(errno.ENOSPC))
    with pytest.raises(OSError) as exc:
        manifest.publish_manifest(spark, root, 1, {"partitions": {}, "schema": "{}"})
    assert exc.value.errno == errno.ENOSPC
    assert "hard-link" not in str(exc.value)

    monkeypatch.setattr(os, "link", _link_raises(errno.EPERM))
    with pytest.raises(OSError, match="hard-link support"):
        manifest.publish_manifest(spark, root, 1, {"partitions": {}, "schema": "{}"})


def test_vacuum_age_gates_empty_partition_dirs(spark, tmp_path):
    """The empty-dir prune is age-gated like files: a partition dir
    freshly mkdir'd by an in-flight stage_commit_files (momentarily
    empty between fs.mkdirs and its first rename) survives vacuum; an
    OLD empty dir is still reclaimed."""
    t = BucketedTable(spark, str(tmp_path / "vac_emptydir"), ["id"], n_buckets=2)
    t.upsert(spark.createDataFrame([("a", 1.0)], "id string, v double"))
    fresh = os.path.join(t.path, "p_date=2099-01-01")
    os.makedirs(fresh)
    t.vacuum(keep=2)  # age-gated (4 h default)
    assert os.path.isdir(fresh)  # young: an in-flight commit may own it
    five_hours_ago = __import__("time").time() - 5 * 3600
    os.utime(fresh, (five_hours_ago, five_hours_ago))
    t.vacuum(keep=2)  # past the age threshold: reclaimed
    assert not os.path.exists(fresh)


def test_vacuum_age_gates_staging_dirs(spark, tmp_path):
    """_staging token dirs are reclaimed per-dir and only past the age
    threshold — a commit still writing its staging files is never swept
    from under it (the old vacuum deleted _staging recursively)."""
    t = BucketedTable(spark, str(tmp_path / "vac_staging"), ["id"], n_buckets=2)
    t.upsert(spark.createDataFrame([("a", 1.0)], "id string, v double"))
    young = os.path.join(t.path, manifest.STAGING_DIR, "tokenyoung")
    os.makedirs(young)
    with open(os.path.join(young, "part-0.parquet"), "wb") as f:
        f.write(b"in-flight")
    t.vacuum(keep=2)  # age-gated: the young staging dir survives
    assert os.path.isdir(young)
    five_hours_ago = __import__("time").time() - 5 * 3600
    os.utime(young, (five_hours_ago, five_hours_ago))
    t.vacuum(keep=2)  # now past the threshold: reclaimed
    assert not os.path.exists(young)


def test_snapshot_diff_cdc_between_versions(spark, tmp_path):
    """snapshot_diff derives a Delta-CDF-style change feed from two
    manifests: inserts/deletes/updates classified, unchanged rows
    carried through rewritten bucket files suppressed, and partitions
    whose file lists are identical pruned before any I/O."""
    t = BucketedTable(spark, str(tmp_path / "cdc"), ["id"], n_buckets=8)
    t.upsert(
        spark.createDataFrame(
            [("a", 1.0), ("b", 2.0), ("c", 3.0), ("d", 4.0)],
            "id string, v double",
        )
    )
    v1 = manifest.list_versions(spark, t.path)[-1]
    # update b, insert e (bucket rewrites carry a/c/d along unchanged
    # whenever they share a bucket with a touched key)
    t.upsert(
        spark.createDataFrame(
            [("b", 20.0), ("e", 5.0)], "id string, v double"
        )
    )
    v2 = manifest.list_versions(spark, t.path)[-1]

    diff = manifest.snapshot_diff(spark, t.path, v1, v2, keys=["id"])
    got = {
        r.id: (r.change_type, r.old, r.new)
        for r in diff.drop("bucket").collect()
    }
    assert set(got) == {"b", "e"}
    assert got["e"][0] == "insert" and got["e"][1] is None
    assert got["e"][2].v == 5.0
    assert got["b"][0] == "update"
    assert (got["b"][1].v, got["b"][2].v) == (2.0, 20.0)

    # delete path: GDPR delete of c, diff v2 -> v3
    t.delete_keys(spark.createDataFrame([("c",)], "id string"))
    v3 = manifest.list_versions(spark, t.path)[-1]
    d2 = manifest.snapshot_diff(spark, t.path, v2, v3, keys=["id"])
    rows = d2.collect()
    assert [(r.id, r.change_type) for r in rows] == [("c", "delete")]
    assert rows[0].old.v == 3.0 and rows[0].new is None

    # identical versions diff to empty (also: self-diff prunes ALL
    # partitions, so the scan side is empty before the join)
    assert manifest.snapshot_diff(spark, t.path, v2, v2, keys=["id"]).count() == 0

    # vacuumed version raises loudly
    t.vacuum(keep=1, retain_seconds=0)
    with pytest.raises(KeyError, match=f"version {v1}"):
        manifest.snapshot_diff(spark, t.path, v1, v3, keys=["id"])
