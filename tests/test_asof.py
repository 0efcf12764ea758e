"""As-of join + binned range join (operators/asof.py): constructed-frame
semantics (ties, no-match, tolerance, interval boundaries) and the plan
shapes that make both operators survive scale."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 0, minute, second, micro)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts(10)),   # after right rows at 5 and 8 → matches 8
            (2, 10, _ts(8)),    # equal ts → inclusive match at 8
            (3, 10, _ts(4)),    # before every right row → no match
            (4, 20, _ts(30)),   # key with a duplicate-ts right pair
            (5, 30, _ts(30)),   # key with no right rows at all
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts(5)),
            (101, 10, _ts(8)),
            (102, 20, _ts(7)),  # duplicate ts with 103
            (103, 20, _ts(7)),
        ],
        "rid long, user_id long, ts timestamp",
    )
    return left, right


def test_asof_backward_inclusive_and_ties(spark, frames):
    from changegen_spark.operators.asof import as_of_join

    left, right = frames
    out = as_of_join(
        left, right, on=["user_id"], ts_col="ts", right_value_cols=["rid"],
        tie_col="rid",
    )
    got = {r["event_id"]: (r["right_rid"], r["gap_us"]) for r in out.collect()}
    assert got[1] == (101, 2 * 60 * 1_000_000)
    assert got[2] == (101, 0)               # inclusive: equal ts matches
    assert got[3] == (None, None)           # nothing at-or-before
    assert got[4] == (103, 23 * 60 * 1_000_000)  # greatest tie_col wins
    assert got[5] == (None, None)           # key absent from right


def test_asof_tolerance_drops_stale_matches(spark, frames):
    from changegen_spark.operators.asof import as_of_join

    left, right = frames
    out = as_of_join(
        left, right, on=["user_id"], ts_col="ts", right_value_cols=["rid"],
        tie_col="rid", tolerance_us=5 * 60 * 1_000_000,
    )
    got = {r["event_id"]: r["right_rid"] for r in out.collect()}
    assert got[1] == 101        # 2 min gap, inside tolerance
    assert got[4] is None       # 23 min gap, dropped


def test_asof_plan_single_shuffle_no_join(spark, frames):
    """The union–sort–window plan must contain no join operator at all and
    exactly one exchange keyed on the as-of keys."""
    from changegen_spark.operators.asof import as_of_join

    left, right = frames
    plan = (
        as_of_join(left, right, on=["user_id"], ts_col="ts",
                   right_value_cols=["rid"], tie_col="rid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_binned_boundaries(spark):
    from changegen_spark.operators.asof import range_join_binned

    left = spark.createDataFrame(
        [(1, 7, _ts(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (7, _ts(5), 1.0),             # == lo → included
            (7, _ts(9, 59, 999999), 2.0), # just inside hi
            (7, _ts(10), 4.0),            # == hi → excluded (exclusive)
            (7, _ts(4, 59, 999999), 8.0), # just below lo → excluded
            (8, _ts(9), 16.0),            # other key → excluded
        ],
        "user_id long, ts timestamp, value double",
    )
    ts_us = F.unix_micros(F.col("ts"))
    out = range_join_binned(
        left, right, on=["user_id"],
        lo_us=ts_us - 300 * 1_000_000, hi_us=ts_us,
        bin_width_us=300 * 1_000_000,
    )
    vals = sorted(r["right_value"] for r in out.collect())
    assert vals == [1.0, 2.0]


def test_range_join_plan_is_equi_join(spark):
    """Binned range join must plan as a hash equi-join on (key, cell) —
    never BroadcastNestedLoop/Cartesian."""
    from changegen_spark.operators.asof import range_join_binned

    left = spark.range(100).select(
        F.col("id").alias("event_id"), (F.col("id") % 5).alias("user_id"),
        F.timestamp_micros(F.col("id") * 60_000_000).alias("ts"),
    )
    right = spark.range(500).select(
        (F.col("id") % 5).alias("user_id"),
        F.timestamp_micros(F.col("id") * 13_000_000).alias("ts"),
        F.col("id").cast("double").alias("value"),
    )
    ts_us = F.unix_micros(F.col("ts"))
    plan = (
        range_join_binned(left, right, on=["user_id"],
                          lo_us=ts_us - 300_000_000, hi_us=ts_us,
                          bin_width_us=300_000_000)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_asof_and_range_queries_match_oracle(spark, sf_dir):
    """Full oracle parity at sf0.001 under the driver's normalization."""
    import duckdb

    from changegen_spark.queries import events as evmod
    from tools.check_oracle import normalize

    con = duckdb.connect()
    con.execute(
        f"CREATE OR REPLACE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    for name in ("q_asof_join", "q_range_join"):
        sdf = normalize(evmod.QUERIES[name](spark, sf_dir).toPandas())
        ddf = normalize(con.execute(evmod.ORACLES[name]).df())
        assert list(sdf.columns) == list(ddf.columns), name
        assert len(sdf) == len(ddf), name
        assert sdf.equals(ddf), f"{name}: value mismatch"


def test_attribution_window_and_ties(spark):
    """Last-touch attribution: picks the latest touch within 24h, ties on
    ts break to the larger event_id, out-of-window and touchless
    purchases report 'unattributed'."""
    import datetime as dt

    import changegen_spark.queries.events as qe
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 2, 12)
    rows = [
        # user 1: click 1h before purchase -> attributed to click
        (1, t0 - dt.timedelta(hours=1), 1, "click", 0.0),
        (2, t0, 1, "purchase", 10.0),
        # user 2: only touch is 25h before -> unattributed
        (3, t0 - dt.timedelta(hours=25), 2, "view", 0.0),
        (4, t0, 2, "purchase", 20.0),
        # user 3: two touches at the SAME ts -> larger event_id (error) wins
        (5, t0 - dt.timedelta(minutes=5), 3, "view", 0.0),
        (6, t0 - dt.timedelta(minutes=5), 3, "error", 0.0),
        (7, t0, 3, "purchase", 30.0),
        # user 4: purchase with no events at all
        (8, t0, 4, "purchase", 40.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).withColumn("props", F.lit(""))
    orig = qe.load_table
    qe.load_table = lambda _s, _d, _n: df
    try:
        got = {
            r["touch_type"]: (r["n_purchases"], r["revenue_e6"])
            for r in qe.q_attribution(spark, "u").collect()
        }
    finally:
        qe.load_table = orig
    assert got == {
        "click": (1, 10_000_000),
        "error": (1, 30_000_000),
        "unattributed": (2, 60_000_000),
    }


def _pandas_asof_oracle(direction, tolerance_us=None):
    """Independent oracle: pandas merge_asof on a deterministic synthetic
    pair of frames (the library the operator's semantics are defined
    against)."""
    import pandas as pd

    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, (i * 7) % 5, base + dt.timedelta(seconds=(i * 37) % 600, microseconds=(i * 13) % 1000))
        for i in range(80)
    ]
    rrows = [
        (1000 + i, (i * 3) % 5, base + dt.timedelta(seconds=(i * 53) % 600, microseconds=(i * 29) % 1000))
        for i in range(60)
    ]
    lp = pd.DataFrame(lrows, columns=["event_id", "user_id", "ts"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["rid", "user_id", "ts"]).sort_values("ts")
    # pre-dedup right per (user, ts) keeping max rid — the operator's tie rule
    rp = rp.sort_values(["ts", "rid"]).groupby(["user_id", "ts"], as_index=False).last()
    rp = rp.sort_values("ts")
    kw = {}
    if tolerance_us is not None:
        kw["tolerance"] = pd.Timedelta(microseconds=tolerance_us)
    merged = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction=direction,
        allow_exact_matches=True, **kw,
    )
    return lrows, rrows, {
        int(r.event_id): (None if pd.isna(r.rid) else int(r.rid))
        for r in merged.itertuples()
    }


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance_us", [None, 120_000_000])
def test_asof_directions_match_pandas_merge_asof(spark, direction, tolerance_us):
    from changegen_spark.operators.asof import as_of_join

    lrows, rrows, expected = _pandas_asof_oracle(direction, tolerance_us)
    left = spark.createDataFrame(lrows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(rrows, "rid long, user_id long, ts timestamp")
    right = (
        right.groupBy("user_id", "ts").agg(F.max("rid").alias("rid"))
    )
    out = as_of_join(
        left, right, on=["user_id"], ts_col="ts",
        right_value_cols=["rid"], tie_col="rid",
        tolerance_us=tolerance_us, direction=direction,
    )
    got = {r.event_id: r.right_rid for r in out.collect()}
    assert got == expected, {
        k: (got[k], expected[k]) for k in got if got[k] != expected[k]
    }


def test_asof_forward_gap_is_nonnegative_right_minus_left(spark, frames):
    from changegen_spark.operators.asof import as_of_join

    left, right = frames
    out = as_of_join(
        left, right, on=["user_id"], ts_col="ts",
        right_value_cols=["rid"], tie_col="rid", direction="forward",
    ).collect()
    by_id = {r.event_id: r for r in out}
    # event 3 at t=4 matches forward to rid 100 at t=5, gap = +60s
    assert by_id[3].right_rid == 100 and by_id[3].gap_us == 60_000_000
    # event 1 at t=10 has no later right row → null
    assert by_id[1].right_rid is None


def test_asof_nearest_keeps_null_and_duplicate_left_rows(spark):
    """The nearest-direction recombination must not drop left rows whose
    attribute columns contain NULL, nor multiply exact-duplicate left rows
    (it joins back/forward candidates on a surrogate key, not on every
    left column)."""
    from changegen_spark.operators.asof import as_of_join

    left = spark.createDataFrame(
        [
            (10, None, _ts(10)),  # NULL attribute column
            (10, "a", _ts(12)),   # exact duplicate pair ↓
            (10, "a", _ts(12)),
        ],
        "user_id long, label string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, _ts(11))], "rid long, user_id long, ts timestamp"
    )
    out = as_of_join(
        left, right, on=["user_id"], ts_col="ts", right_value_cols=["rid"],
        direction="nearest",
    ).collect()
    assert len(out) == 3, out  # no drop, no multiplication
    assert all(r["right_rid"] == 100 for r in out)
    assert sorted(r["gap_us"] for r in out) == [
        60 * 1_000_000, 60 * 1_000_000, 60 * 1_000_000
    ]
    assert sum(r["label"] is None for r in out) == 1
