"""Funnel semantics on a hand-crafted event log: strict ordering, the
conversion window, out-of-order steps, and timestamp-tie handling."""

import datetime as dt

from pyspark.sql import functions as F


def _ts(h, m=0, s=0, us=0):
    return dt.datetime(2024, 1, 1, h, m, s, us)


def _funnel_on(spark, rows):
    import changegen_spark.queries.funnels as fu

    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).withColumn("value", F.lit(0.0)).withColumn("props", F.lit(""))
    orig = fu.load_table
    fu.load_table = lambda _spark, _sf, _name: df
    try:
        return {r["user_id"]: r for r in fu.q_funnel(spark, "unused").collect()}
    finally:
        fu.load_table = orig


def test_funnel_semantics(spark):
    rows = [
        # user 1: clean completion view(1h) -> click(2h) -> purchase(3h)
        (1, _ts(1), 1, "view"), (2, _ts(2), 1, "click"), (3, _ts(3), 1, "purchase"),
        # user 2: purchase BEFORE click — step 3 not reached
        (4, _ts(1), 2, "view"), (5, _ts(3), 2, "click"), (6, _ts(2), 2, "purchase"),
        # user 3: purchase outside the 24 h window from the first view
        (7, _ts(1), 3, "view"), (8, _ts(2), 3, "click"),
        (9, _ts(1) + dt.timedelta(hours=25), 3, "purchase"),
        # user 4: view only
        (10, _ts(5), 4, "view"),
        # user 5: no view at all — excluded entirely
        (11, _ts(1), 5, "click"), (12, _ts(2), 5, "purchase"),
        # user 6: click at the SAME timestamp as the view — event_id
        # breaks the tie, (ts,id)=(1h,14) > (1h,13) counts as after
        (13, _ts(1), 6, "view"), (14, _ts(1), 6, "click"),
        (15, _ts(2), 6, "purchase"),
        # user 7: click tied with view but with a SMALLER event_id — not
        # strictly after, and no later click exists
        (17, _ts(1), 7, "view"), (16, _ts(1), 7, "click"),
    ]
    got = _funnel_on(spark, rows)
    assert set(got) == {1, 2, 3, 4, 6, 7}
    assert got[1]["steps_completed"] == 3
    assert got[1]["t_purchase"] == "2024-01-01 03:00:00"
    assert got[2]["steps_completed"] == 2 and got[2]["t_purchase"] is None
    assert got[3]["steps_completed"] == 2
    assert got[4]["steps_completed"] == 1 and got[4]["t_click"] is None
    assert got[6]["steps_completed"] == 3
    assert got[7]["steps_completed"] == 1


def test_funnel_window_boundary(spark):
    """Purchase exactly AT the 24 h boundary counts (<=, microsecond-exact);
    one microsecond past does not."""
    rows = [
        (1, _ts(1), 1, "view"), (2, _ts(2), 1, "click"),
        (3, _ts(1) + dt.timedelta(hours=24), 1, "purchase"),
        (4, _ts(1), 2, "view"), (5, _ts(2), 2, "click"),
        (6, _ts(1) + dt.timedelta(hours=24, microseconds=1), 2, "purchase"),
    ]
    got = _funnel_on(spark, rows)
    assert got[1]["steps_completed"] == 3
    assert got[2]["steps_completed"] == 2


def test_retention_cohorts(spark):
    """Two cohorts a week apart; a member active in weeks 0 and 2 (gap
    week uncounted), the other cohort active in week 0 only."""
    import changegen_spark.queries.funnels as fu
    from pyspark.sql import functions as F

    rows = [
        # user 1: first event Mon 2024-01-01 week, active again 2 weeks on
        (1, _ts(10), 1, "view"),
        (2, dt.datetime(2024, 1, 16, 10), 1, "click"),
        # user 2: same cohort, active only in week 0
        (3, dt.datetime(2024, 1, 3, 9), 2, "view"),
        # user 3: cohort one week later
        (4, dt.datetime(2024, 1, 9, 8), 3, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).withColumn("value", F.lit(0.0)).withColumn("props", F.lit(""))
    orig = fu.load_table
    fu.load_table = lambda _spark, _sf, _name: df
    try:
        got = {
            (r["cohort_week"], r["week_offset"]): r["n_active"]
            for r in fu.q_retention(spark, "unused").collect()
        }
    finally:
        fu.load_table = orig
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_cuped_matches_plain_python_moments(spark, sf_dir):
    """Every CUPED output reproduces from a from-scratch recomputation:
    per-user pre/post cents, pooled theta from exact integer sums, and
    the adjusted means/variances; the adjustment must not move the
    between-variant mean gap by more than |theta|*|mean-x gap| and must
    never INCREASE variance (theta is the pooled OLS optimum... up to
    pooling-vs-per-variant mismatch, so allow a tiny epsilon)."""
    import hashlib
    from decimal import ROUND_HALF_UP, Decimal

    from changegen_spark.queries.funnels import CUPED_CUTOFF, q_cuped
    from changegen_spark.sources.tables import load_table
    import datetime

    cutoff = datetime.datetime.fromisoformat(CUPED_CUTOFF)
    ev = load_table(spark, sf_dir, "events").collect()
    xs, ys = {}, {}
    users = set()
    for e in ev:
        users.add(e.user_id)
        if e.event_type != "purchase":
            continue
        cents = int(Decimal(repr(e.value * 100)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))
        ts = e.ts if isinstance(e.ts, datetime.datetime) else e.ts
        if ts < cutoff:
            xs[e.user_id] = xs.get(e.user_id, 0) + cents
        else:
            ys[e.user_id] = ys.get(e.user_id, 0) + cents
    rows = {}
    for u in users:
        v = "A" if hashlib.md5(str(u).encode()).hexdigest()[:8] < "80000000" else "B"
        rows.setdefault(v, []).append((xs.get(u, 0), ys.get(u, 0)))
    allr = [p for v in rows.values() for p in v]
    n = len(allr)
    sx = sum(x for x, _ in allr); sy = sum(y for _, y in allr)
    sxx = sum(x * x for x, _ in allr); sxy = sum(x * y for x, y in allr)
    den = n * sxx - sx * sx
    theta = (n * sxy - sx * sy) / den if den > 0 else 0.0
    mu = sx / n
    got = {r.variant: r for r in q_cuped(spark, sf_dir).collect()}
    assert set(got) == set(rows)
    for v, pairs in rows.items():
        r = got[v]
        nv = len(pairs)
        assert r.n == nv
        assert r.theta_e6 == round(theta * 1e6)
        m_y = sum(y for _, y in pairs) / nv
        adj = [y - theta * (x - mu) for x, y in pairs]
        m_a = sum(adj) / nv
        assert abs(r.mean_y_e6 - round(m_y * 1e6)) <= 1
        assert abs(r.mean_cuped_e6 - round(m_a * 1e6)) <= 2
        v_y = sum(y * y for _, y in pairs) / nv - m_y * m_y
        v_a = sum(a * a for a in adj) / nv - m_a * m_a
        assert abs(r.var_y_e6 - round(v_y * 1e6)) <= 2
        assert abs(r.var_cuped_e6 - round(v_a * 1e6)) <= 2
    # theta is the POOLED OLS optimum: the pooled adjusted variance can
    # never exceed the pooled raw variance (per-variant CAN at tiny n)
    m_y_all = sy / n
    v_y_all = sum(y * y for _, y in allr) / n - m_y_all * m_y_all
    adj_all = [y - theta * (x - mu) for x, y in allr]
    m_a_all = sum(adj_all) / n
    v_a_all = sum(a * a for a in adj_all) / n - m_a_all * m_a_all
    assert v_a_all <= v_y_all * (1 + 1e-12)
