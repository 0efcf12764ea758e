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
