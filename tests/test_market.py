"""Hand-pinned fixture tests for the market-analytics family.

The DuckDB oracles mirror each query's algebra, so oracle parity alone
cannot catch a semantic error made identically on both sides (the
mutual_info lesson, ADVICE round 3). These tests pin the SEMANTICS —
OHLC tie-breaks, RSI's flat-market value, drawdown arithmetic, the
EMA recurrence — against values computed by hand on tiny inputs.
"""

from __future__ import annotations

import datetime as dt

import pytest

from cryptocoininsights_data_engineer_project_spark.queries import REGISTRY

UTC = dt.timezone.utc


def _ts(day, h=0, m=0, s=0, us=0):
    return dt.datetime(2024, 1, day, h, m, s, us)


@pytest.fixture(scope="module")
def market_dir(spark, tmp_path_factory):
    """Tiny events table with hand-designed price paths.

    Instrument 'aaa', one hour (2024-01-01 00:xx), four ticks INCLUDING
    a timestamp tie on the open and on the close — OHLC must break ties
    by event_id:
        id=1 ts=00:05.000000 v=10.00 k=2   <- open (tie with id=2, lower id... see below)
        id=2 ts=00:05.000000 v=11.00 k=3      same-instant tick
        id=3 ts=00:20.000000 v=25.00 k=1   <- high
        id=4 ts=00:40.000000 v=8.00  k=4   <- low + close (latest ts)
    Instrument 'bbb': one tick per day over 5 days for the daily-series
    queries: closes 100, 110, 121, 99, 120.
    """
    d = tmp_path_factory.mktemp("market")
    rows = [
        (1, _ts(1, 0, 5), 101, "aaa", 10.0, '{"k": 2}'),
        (2, _ts(1, 0, 5), 101, "aaa", 11.0, '{"k": 3}'),
        (3, _ts(1, 0, 20), 101, "aaa", 25.0, '{"k": 1}'),
        (4, _ts(1, 0, 40), 101, "aaa", 8.0, '{"k": 4}'),
    ] + [
        (10 + i, _ts(1 + i, 12), 202, "bbb", float(v), '{"k": 1}')
        for i, v in enumerate([100, 110, 121, 99, 120])
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.parquet(str(d / "events.parquet"))
    return str(d)


def _rows(spark, name, sf_dir, **filt):
    out = [r.asDict() for r in REGISTRY[name].fn(spark, sf_dir).collect()]
    for k, v in filt.items():
        out = [r for r in out if r[k] == v]
    return out


def test_ohlcv_tie_break_and_bounds(spark, market_dir):
    bars = _rows(spark, "ohlcv_candles", market_dir, event_type="aaa")
    assert len(bars) == 1
    b = bars[0]
    # same-timestamp tie: event_id=1 (10.00) wins open over event_id=2
    assert b["open"] == 10.0
    assert b["high"] == 25.0
    assert b["low"] == 8.0
    assert b["close"] == 8.0
    assert b["volume"] == 2 + 3 + 1 + 4
    assert b["n_trades"] == 4


def test_vwap_is_quantity_weighted(spark, market_dir):
    rows = _rows(spark, "vwap_hourly", market_dir, event_type="aaa")
    assert len(rows) == 1
    # (10*2 + 11*3 + 25*1 + 8*4) / (2+3+1+4) = 110/10
    assert rows[0]["vwap"] == pytest.approx(11.0, abs=1e-9)
    assert rows[0]["volume"] == 10


def test_max_drawdown_peak_to_trough(spark, market_dir):
    rows = _rows(spark, "max_drawdown", market_dir, event_type="bbb")
    assert len(rows) == 1
    # peak 121 -> trough 99: (121-99)/121
    assert rows[0]["max_drawdown"] == pytest.approx((121 - 99) / 121, abs=1e-6)
    assert rows[0]["peak_price"] == 121.0


def test_ema_macd_recurrence_by_hand(spark, market_dir):
    rows = sorted(
        _rows(spark, "ema_macd", market_dir, event_type="bbb"),
        key=lambda r: r["day"],
    )
    assert [r["close"] for r in rows] == [100.0, 110.0, 121.0, 99.0, 120.0]
    # day 1 seeds: ema12 = ema26 = close, macd = signal = 0
    assert rows[0]["ema12"] == 100.0
    assert rows[0]["ema26"] == 100.0
    assert rows[0]["macd"] == 0.0
    # day 2 by hand (in cents): e12 = (2*11000 + 11*10000)/13
    e12 = (2 * 11000 + 11 * 10000) / 13
    e26 = (2 * 11000 + 25 * 10000) / 27
    macd = e12 - e26
    sig = (2 * macd + 8 * 0.0) / 10
    assert rows[1]["ema12"] == pytest.approx(e12 / 100, abs=5e-7)
    assert rows[1]["ema26"] == pytest.approx(e26 / 100, abs=5e-7)
    assert rows[1]["macd"] == pytest.approx(macd / 100, abs=5e-7)
    assert rows[1]["macd_signal"] == pytest.approx(sig / 100, abs=5e-7)


def test_rsi_flat_market_pins_50(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("flat")
    rows = [
        (i, _ts(1 + i, 12), 1, "flat", 50.0, '{"k": 1}') for i in range(20)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(str(d / "events.parquet"))
    out = _rows(spark, "rsi_14", str(d))
    # 20 days, first 14 deltas complete on day 15 -> 6 output rows
    assert len(out) == 6
    assert all(r["rsi14"] == 50.0 for r in out)


def test_corr_perfect_linear(spark, tmp_path_factory):
    """Two instruments whose daily changes are exact multiples ->
    correlation 1; an anti-moving third -> correlation -1."""
    d = tmp_path_factory.mktemp("corr")
    ups = [100, 110, 130, 140, 180]  # chg: 10, 20, 10, 40
    rows = []
    for i, v in enumerate(ups):
        rows.append((100 + i, _ts(1 + i, 12), 1, "xa", float(v), '{"k": 1}'))
        rows.append((200 + i, _ts(1 + i, 12), 1, "xb", float(2 * v), '{"k": 1}'))
        rows.append((300 + i, _ts(1 + i, 12), 1, "xc", float(1000 - v), '{"k": 1}'))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(str(d / "events.parquet"))
    out = {(r["sym_a"], r["sym_b"]): r["corr_chg"] for r in _rows(spark, "corr_pairs", str(d))}
    assert out[("xa", "xb")] == pytest.approx(1.0, abs=1e-6)
    assert out[("xa", "xc")] == pytest.approx(-1.0, abs=1e-6)
    assert out[("xb", "xc")] == pytest.approx(-1.0, abs=1e-6)


def test_anomaly_zscore_flags_planted_outlier(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("anom")
    rows = [(i, _ts(1, 0, 0, i, 0), 1, "t", 100.0 + (i % 3), '{"k": 1}') for i in range(50)]
    rows.append((99, _ts(1, 1), 1, "t", 500.0, '{"k": 1}'))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(str(d / "events.parquet"))
    out = _rows(spark, "anomaly_zscore", str(d))
    assert [r["event_id"] for r in out] == [99]
    assert out[0]["zscore"] > 2.5


def test_obv_signed_accumulation(spark, market_dir):
    rows = sorted(
        _rows(spark, "obv_daily", market_dir, event_type="bbb"),
        key=lambda r: r["day"],
    )
    # closes 100,110,121,99,120 at k=1 each: signs _,+,+,-,+
    assert [r["day_volume"] for r in rows] == [1, 1, 1, 1, 1]
    assert [r["obv"] for r in rows] == [0, 1, 2, 1, 2]


def test_bar_coverage_counts_gaps(spark, market_dir):
    rows = _rows(spark, "bar_coverage", market_dir, event_type="bbb")
    assert len(rows) == 1
    # one tick at 12:00 on each of 5 consecutive days: span is
    # 4 days * 24 h + 1 expected hourly bars, 5 observed
    assert rows[0]["expected_bars"] == 4 * 24 + 1
    assert rows[0]["observed_bars"] == 5
    assert rows[0]["missing_bars"] == 4 * 24 + 1 - 5


def test_cusum_flags_planted_level_shift(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cusum")
    # 10 days at 100, then 10 days at 200: CUSUM peaks at the shift
    vals = [100.0] * 10 + [200.0] * 10
    rows = [
        (i, _ts(1 + i, 12), 1, "shift", v, '{"k": 1}')
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(str(d / "events.parquet"))
    out = _rows(spark, "cusum_changepoint", str(d))
    assert len(out) == 1
    # |cusum| of mean deviations peaks on the last pre-shift day
    assert out[0]["change_day"].day == 10
    # drift = max |cumsum of (x - mean)|: 10 days * $50 below the
    # $150 mean = $500
    assert out[0]["max_drift_dollars"] == pytest.approx(500.0, abs=1e-6)


def test_momentum_rank_orders_cross_section(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("mom")
    rows = []
    # 'up' doubles over 8 days, 'down' halves: on the last day
    # up must rank 1, down 2
    for i in range(8):
        rows.append((100 + i, _ts(1 + i, 12), 1, "up", 100.0 + 10 * i, '{"k": 1}'))
        rows.append((200 + i, _ts(1 + i, 12), 1, "down", 100.0 - 10 * i, '{"k": 1}'))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(str(d / "events.parquet"))
    out = _rows(spark, "momentum_ranks", str(d))
    last = max(r["day"] for r in out)
    ranks = {r["event_type"]: r["momentum_rank"] for r in out if r["day"] == last}
    assert ranks == {"up": 1, "down": 2}
    rets = {r["event_type"]: r["ret_7d"] for r in out if r["day"] == last}
    assert rets["up"] == pytest.approx(0.7, abs=1e-6)
    assert rets["down"] == pytest.approx(-0.7, abs=1e-6)
