"""Time-series semantics on a hand-crafted event log: dense-spine
gap-filling, LOCF carry groups (leading gaps stay null), moving-average
window edges, z-score exactness, and Markov ordering under timestamp ties."""

import datetime as dt

from pyspark.sql import functions as F

import changegen_spark.queries.timeseries as ts


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _on(spark, rows, fn):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).withColumn("props", F.lit(""))
    orig = ts.load_table
    ts.load_table = lambda _spark, _sf, _name: df
    try:
        return fn(spark, "unused").collect()
    finally:
        ts.load_table = orig


def test_resample_gap_fill_and_locf(spark):
    rows = [
        # type "a": hour 0 (two events), hour 3 (one) — hours 1-2 are gaps
        (1, _ts(0), 1, "a", 2.0),
        (2, _ts(0, 30), 1, "a", 4.0),
        (3, _ts(3), 1, "a", 10.0),
        # type "b": only hour 2 — hours 0-1 are LEADING gaps (null LOCF)
        (4, _ts(2), 2, "b", 1.5),
    ]
    got = {(r["event_type"], r["hour"] % 24): r for r in _on(spark, rows, ts.q_resample)}
    # dense spine: both types cover the global hour range 0..3
    assert len(got) == 8
    a0, a1, a2, a3 = (got[("a", h)] for h in range(4))
    assert (a0["n_events"], a0["sum_value_e6"]) == (2, 6_000_000)
    assert a0["avg_value_locf"] == 3_000_000.0
    # gap hours carry hour 0's mean forward, with zero counts
    for g in (a1, a2):
        assert (g["n_events"], g["sum_value_e6"]) == (0, 0)
        assert g["avg_value_locf"] == 3_000_000.0
    assert a3["avg_value_locf"] == 10_000_000.0
    # leading gaps before the first observation have NO value to carry
    assert got[("b", 0)]["avg_value_locf"] is None
    assert got[("b", 1)]["avg_value_locf"] is None
    assert got[("b", 2)]["avg_value_locf"] == 1_500_000.0


def test_moving_avg_window_and_z(spark):
    # one type, hours 0..7, count spike at hour 5
    rows = []
    eid = 0
    counts = [1, 1, 1, 1, 1, 9, 1, 1]
    for h, c in enumerate(counts):
        for i in range(c):
            eid += 1
            rows.append((eid, _ts(h, i), 1, "x", 0.0))
    got = {r["hour"] % 24: r for r in _on(spark, rows, ts.q_moving_avg)}
    assert [got[h]["c"] for h in range(8)] == counts
    # trailing window is min(MA_WINDOW, h+1) buckets wide at the start
    assert got[0]["ma"] == 1.0
    assert got[5]["ma"] == round((1 + 1 + 1 + 1 + 1 + 9) / 6, 6)
    assert got[7]["ma"] == round((1 + 1 + 1 + 9 + 1 + 1) / 6, 6)
    # population stats: mean=2, ex2=(7*1+81)/8=11, var=7 → std=sqrt(7)
    import math

    z5 = (9 - 2.0) / math.sqrt(88 / 8 - 4.0)
    assert got[5]["z"] == round(z5, 6)
    assert got[5]["is_anomaly"] is True
    assert got[0]["is_anomaly"] is False


def test_markov_orders_by_ts_then_event_id(spark):
    rows = [
        # user 1: a -> b -> b (two transitions)
        (1, _ts(1), 1, "a", 0.0),
        (2, _ts(2), 1, "b", 0.0),
        (3, _ts(3), 1, "b", 0.0),
        # user 2: tie on ts — event_id orders a(4) before c(5)
        (5, _ts(1), 2, "c", 0.0),
        (4, _ts(1), 2, "a", 0.0),
        # user 3: single event — no transition
        (6, _ts(1), 3, "a", 0.0),
    ]
    got = {(r["prev_type"], r["next_type"]): r for r in _on(spark, rows, ts.q_markov_transitions)}
    assert set(got) == {("a", "b"), ("b", "b"), ("a", "c")}
    assert got[("a", "b")]["n"] == 1 and got[("a", "c")]["n"] == 1
    # P(next | prev="a") splits the two exact counts
    assert got[("a", "b")]["p"] == 0.5
    assert got[("b", "b")]["p"] == 1.0


def test_seasonal_decompose_matches_independent_impl(spark, sf_dir):
    """r7 decomposition: a sequential Python reimplementation (dict of
    hourly counts, explicit centered-window loop) reproduces trend,
    seasonal, and residual exactly, and the components reconcile:
    c*1e6 == trend + seasonal + residual for every row."""
    from collections import Counter

    from changegen_spark.queries.timeseries import (
        SEAS_HALF,
        SEAS_PERIOD,
        q_seasonal_decompose,
    )
    from changegen_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    hours = Counter(int(r.ts.timestamp() // 3600) for r in ev)
    hs = sorted(hours)
    width = 2 * SEAS_HALF + 1
    rows = {}
    for i, h in enumerate(hs):
        lo, hi = i - SEAS_HALF, i + SEAS_HALF
        if lo < 0 or hi >= len(hs):
            continue
        win = hs[lo : hi + 1]
        # full-window means CONSECUTIVE rows of the hourly frame (the
        # window is row-based, matching the engine)
        trend = round(sum(hours[x] for x in win) * 1e6 / width)
        rows[h] = [hours[h], trend, hours[h] * 1_000_000 - trend]
    seas_acc = {}
    for h, (_, _, det) in rows.items():
        seas_acc.setdefault(h % SEAS_PERIOD, []).append(det)
    seas = {k: round(sum(v) * 1.0 / len(v)) for k, v in seas_acc.items()}

    got = q_seasonal_decompose(spark, sf_dir).collect()
    assert len(got) == len(rows)
    for r in got:
        c, trend, det = rows[r.hour]
        assert r.c == c
        assert r.trend_e6 == trend
        assert r.seasonal_e6 == seas[r.hour % SEAS_PERIOD]
        assert r.residual_e6 == det - seas[r.hour % SEAS_PERIOD]
        assert r.c * 1_000_000 == r.trend_e6 + r.seasonal_e6 + r.residual_e6
