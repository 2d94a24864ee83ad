"""Stateful streaming sessionization vs. its batch twin."""

from __future__ import annotations

import json
import os

from cryptocoininsights_data_engineer_project_spark.operators.sessions import sessionize
from cryptocoininsights_data_engineer_project_spark.streaming.stateful import (
    stateful_sessionize,
)

BASE = 1_700_000_000  # epoch seconds


def _write_events(path, rows):
    with open(path, "w") as f:
        for eid, (user, sec) in enumerate(rows):
            f.write(
                json.dumps(
                    {
                        "event_id": eid,
                        "user_id": user,
                        "ts": __import__("datetime")
                        .datetime.utcfromtimestamp(BASE + sec)
                        .strftime("%Y-%m-%dT%H:%M:%S"),
                    }
                )
                + "\n"
            )


def test_native_session_window_agrees(spark, sf_dir):
    """Spark's built-in session_window must produce the same sessions
    as our gaps-and-islands operator (same gap semantics: a session
    extends while consecutive events are <= gap apart... note
    session_window closes at STRICTLY gap, our operator splits on
    gap-exceeded — identical boundaries for continuous timestamps)."""
    from pyspark.sql import functions as F

    from cryptocoininsights_data_engineer_project_spark.catalog import table

    events = table(spark, sf_dir, "events").withColumn(
        "tts", F.col("ts").cast("timestamp")
    )
    native = (
        events.groupBy(F.session_window("tts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("tts").alias("start"))
        .select("user_id", "n_events", "start")
    )
    ours = sessionize(events, key="user_id")
    a = {(r["user_id"], r["session_start"].isoformat(), r["n_events"]) for r in ours.collect()}
    b = {(r["user_id"], r["start"].isoformat(), r["n_events"]) for r in native.collect()}
    assert a == b


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    # file1: user 1 & 2, one tight session each
    _write_events(
        raw / "f1.json",
        [(1, 0), (1, 300), (1, 600), (2, 100), (2, 200)],
    )
    # file2 (much later): new sessions for both users — data-driven
    # closure of the file1 sessions
    _write_events(
        raw / "f2.json",
        [(1, 36_000), (1, 36_060), (2, 40_000)],
    )

    schema = "event_id long, user_id long, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(raw))
    )
    q = (
        stateful_sessionize(stream, gap_min=30)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    emitted = {
        (r["user_id"], r["session_start"].isoformat(), r["session_end"].isoformat(), r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }

    # batch twin over the same data
    batch_events = spark.read.schema(schema).json(str(raw))
    gap_us = 30 * 60 * 1_000_000
    batch = sessionize(batch_events, key="user_id", gap_us=gap_us)
    rows = batch.collect()
    last_seq = {}
    max_ts = None
    for r in rows:
        last_seq[r["user_id"]] = max(last_seq.get(r["user_id"], 0), r["session_seq"])
        end = r["session_end"]
        max_ts = end if max_ts is None or end > max_ts else max_ts
    # a session is emitted if it was closed by later data (a newer
    # session exists for the key) OR by the event-time timeout (final
    # watermark = max event time - 10 min passed session_end + gap)
    import datetime

    final_wm = max_ts - datetime.timedelta(minutes=10)
    expected_closed = {
        (r["user_id"], r["session_start"].isoformat(), r["session_end"].isoformat(), r["n_events"])
        for r in rows
        if r["session_seq"] < last_seq[r["user_id"]]
        or r["session_end"] + datetime.timedelta(microseconds=gap_us) <= final_wm
    }
    assert emitted == expected_closed
    # both data-driven closures AND at least one timeout-driven closure
    assert len(emitted) == 3


def test_stateful_twa_matches_batch_formula(spark, tmp_path):
    """The streaming LOCF time-weighted average converges per key to
    the batch formula over all delivered events, across micro-batch
    boundaries (state carries last observation between files)."""
    import json as _json

    from cryptocoininsights_data_engineer_project_spark.streaming.stateful import (
        stateful_time_weighted_avg,
    )

    raw = tmp_path / "twa_raw"
    raw.mkdir()

    def write(path, rows):
        with open(path, "w") as f:
            for eid, (uid, sec, val) in enumerate(rows):
                f.write(
                    _json.dumps(
                        {
                            "event_id": eid + hash(str(path)) % 1000 * 100,
                            "user_id": uid,
                            "ts": f"2024-01-01T00:{sec // 60:02d}:{sec % 60:02d}",
                            "value": val,
                        }
                    )
                    + "\n"
                )

    f1 = [(1, 0, 10.0), (1, 60, 20.0), (2, 0, 5.0)]
    f2 = [(1, 180, 40.0), (2, 120, 15.0), (2, 300, 5.0)]
    write(raw / "f1.json", f1)
    write(raw / "f2.json", f2)

    schema = "event_id long, user_id long, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(raw))
    )
    latest = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            latest[r.user_id] = (r.twa_value, r.n_obs)

    q = (
        stateful_time_weighted_avg(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "twa_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # batch formula on the driver: sum(value_i * dt_i) / total span
    def batch_twa(rows):
        rows = sorted(rows, key=lambda r: r[1])
        num = sum(
            rows[i][2] * (rows[i + 1][1] - rows[i][1])
            for i in range(len(rows) - 1)
        )
        return round(num / (rows[-1][1] - rows[0][1]), 6)

    all_rows = f1 + f2
    for uid in (1, 2):
        rows = [r for r in all_rows if r[0] == uid]
        assert latest[uid][0] == batch_twa(rows), uid
        assert latest[uid][1] == len(rows)


def test_transform_with_state_matches_applyinpandaswithstate(spark, tmp_path):
    """The Spark 4 transformWithStateInPandas sessionizer must emit the
    exact same closed sessions as the applyInPandasWithState form on an
    identical multi-file stream (data-driven AND timer-driven closures).

    transformWithState's state-server protocol needs google.protobuf
    (not shipped in this container) — skipped when absent; the
    applyInPandasWithState twin covers the semantics either way."""
    import pytest

    pytest.importorskip("google.protobuf")
    from cryptocoininsights_data_engineer_project_spark.streaming.stateful import (
        tws_sessionize,
    )

    raw = tmp_path / "raw_tws"
    raw.mkdir()
    _write_events(
        raw / "f1.json",
        [(1, 0), (1, 300), (1, 600), (2, 100), (2, 200)],
    )
    _write_events(
        raw / "f2.json",
        [(1, 36_000), (1, 36_060), (2, 40_000)],
    )
    schema = "event_id long, user_id long, ts timestamp"

    def run(factory, name, ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(raw))
        )
        q = (
            factory(stream, gap_min=30)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return {
            (
                r["user_id"],
                r["session_start"].isoformat(),
                r["session_end"].isoformat(),
                r["n_events"],
            )
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }

    old_api = run(stateful_sessionize, "tws_old", "ck_old")
    new_api = run(tws_sessionize, "tws_new", "ck_new")
    assert new_api == old_api
    assert len(new_api) == 3


def test_stateful_anomaly_matches_batch_prefix(spark, tmp_path):
    """The streaming anomaly detector's prefix z-scores (state carries
    integer moments across micro-batches) must equal a batch
    UNBOUNDED-PRECEDING window computation over the same tick order."""
    import json as _json
    import math

    from cryptocoininsights_data_engineer_project_spark.streaming.stateful import (
        stateful_anomaly_detector,
    )

    raw = tmp_path / "anom_raw"
    raw.mkdir()
    # instrument 'a': stable around 100 with one spike; 'b': drifting
    ticks = []
    for i in range(30):
        ticks.append(("a", i, 100.0 + (i % 5)))
        ticks.append(("b", i, 50.0 + i))
    ticks.append(("a", 30, 400.0))  # the anomaly
    ticks.append(("a", 31, 101.0))

    # two files -> two micro-batches, split mid-stream
    def write(path, rows, base):
        with open(path, "w") as f:
            for j, (sym, sec, val) in enumerate(rows):
                f.write(
                    _json.dumps(
                        {
                            "event_id": base + j,
                            "event_type": sym,
                            "ts": f"2024-01-01T00:{sec // 60:02d}:{sec % 60:02d}",
                            "value": val,
                        }
                    )
                    + "\n"
                )

    # keep event-time order within each key across the file split
    write(raw / "f1.json", ticks[:40], 0)
    write(raw / "f2.json", ticks[40:], 40)

    schema = "event_id long, event_type string, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(raw))
    )
    got = []

    def sink(batch_df, batch_id):
        got.extend(
            (r.event_type, r.event_id, r.price, r.zscore) for r in batch_df.collect()
        )

    q = (
        stateful_anomaly_detector(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "anom_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # batch prefix replay on the driver (exact same integer arithmetic)
    expect = []
    state = {}
    order = sorted(
        enumerate(ticks), key=lambda t: (t[1][0], t[1][1], t[0])
    )  # by (sym, ts, event_id)
    for eid, (sym, _sec, val) in order:
        c = round(val * 100)
        n, s, ss = state.get(sym, (0, 0, 0))
        n, s, ss = n + 1, s + c, ss + c * c
        state[sym] = (n, s, ss)
        if n >= 10:
            mu = s / n
            var = ss / n - mu * mu
            if var > 0:
                z = (c - mu) / math.sqrt(var)
                if abs(z) > 3.0:
                    expect.append((sym, eid, c / 100.0, round(z, 4)))
    assert sorted(got) == sorted(expect)
    # sanity: the planted spike is flagged
    assert any(eid == 60 for _, eid, _, _ in got)


def test_tws_twa_matches_applyinpandaswithstate(spark, tmp_path):
    """The transformWithState TWA must emit the same running values as
    the applyInPandasWithState form on an identical multi-file stream.
    protobuf-gated like the sessionize twin (state-server protocol);
    the fold-level parity below runs regardless."""
    import json as _json

    import pytest

    pytest.importorskip("google.protobuf")
    from cryptocoininsights_data_engineer_project_spark.streaming.stateful import (
        stateful_time_weighted_avg,
        tws_time_weighted_avg,
    )

    raw = tmp_path / "raw_twa_tws"
    raw.mkdir()
    rows1 = [(1, 0, 10.0), (1, 60, 20.0), (2, 0, 5.0)]
    rows2 = [(1, 180, 40.0), (2, 120, 15.0), (2, 300, 5.0)]
    for name, rows in (("f1.json", rows1), ("f2.json", rows2)):
        with open(raw / name, "w") as f:
            for eid, (uid, sec, val) in enumerate(rows):
                f.write(
                    _json.dumps(
                        {
                            "event_id": eid,
                            "user_id": uid,
                            "ts": f"2024-01-01T00:{sec // 60:02d}:{sec % 60:02d}",
                            "value": val,
                        }
                    )
                    + "\n"
                )
    schema = "event_id long, user_id long, ts timestamp, value double"

    def run(factory, ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(raw))
        )
        latest = {}

        def sink(batch_df, _bid):
            for r in batch_df.collect():
                latest[r.user_id] = (r.twa_value, r.n_obs)

        q = (
            factory(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return latest

    assert run(tws_time_weighted_avg, "ck_tws_twa") == run(
        stateful_time_weighted_avg, "ck_aip_twa"
    )


def test_twa_processor_and_group_state_fn_share_fold(spark):
    """Container-runnable API parity: TwaProcessor (transformWithState)
    and make_twa_fn (applyInPandasWithState) driven through FAKE
    state handles over the same micro-batch split must emit identical
    frames — both funnel through _twa_fold, and this pins the plumbing
    on each side of that funnel (state round-trip, emission gating)."""
    import pandas as pd

    from cryptocoininsights_data_engineer_project_spark.streaming.stateful import (
        TwaProcessor,
        make_twa_fn,
    )

    batches = [
        pd.DataFrame(
            {
                "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:01:00"]),
                "event_id": [1, 2],
                "cents": [1000, 2000],
            }
        ),
        pd.DataFrame(
            {
                "ts": pd.to_datetime(["2024-01-01 00:03:00"]),
                "event_id": [3],
                "cents": [4000],
            }
        ),
    ]

    class FakeValueState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    class FakeHandle:
        def __init__(self):
            self.vs = FakeValueState()

        def getValueState(self, name, schema):
            return self.vs

    class FakeGroupState:
        def __init__(self):
            self.v = None
            self.hasTimedOut = False

        @property
        def exists(self):
            return self.v is not None

        @property
        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    proc = TwaProcessor()
    proc.init(FakeHandle())
    gs = FakeGroupState()
    fn = make_twa_fn()
    for b in batches:
        tws_out = list(proc.handleInputRows((7,), iter([b]), None))
        aip_out = list(fn((7,), iter([b]), gs))
        assert len(tws_out) == len(aip_out)
        for a, t in zip(aip_out, tws_out):
            pd.testing.assert_frame_equal(a, t)
        assert proc.state.v == gs.v  # identical state after each batch
    # final value equals the closed-form LOCF integral
    twa = proc.state.v[3] / (100.0 * (proc.state.v[1] - proc.state.v[0]))
    assert round(twa, 6) == round((10.0 * 60 + 20.0 * 120) / 180, 6)


def test_twa_fold_empty_batch_guard():
    """An empty batch with no prior state is a no-op (None state, no
    emit) — safe by construction for any future timeout mode that fires
    the fn without data; with prior state an empty batch preserves it
    and re-emits the running value."""
    from cryptocoininsights_data_engineer_project_spark.streaming.stateful import _twa_fold

    assert _twa_fold(None, []) == (None, None)

    state, emit = _twa_fold(None, [(0, "e0", 100), (1_000_000, "e1", 300)])
    assert emit == (1.0, 2)  # LOCF: 100 cents held over the whole 1 s
    state2, emit2 = _twa_fold(state, [])
    assert state2 == state and emit2 == emit
