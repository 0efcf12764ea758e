"""Time-series operators over the events stream: hourly resampling with
gap-fill + last-observation-carried-forward, trailing moving averages with
z-score anomaly flags, and a Markov transition matrix of event sequences.

Beyond-parity surface (the reference has no time-series family); these are
the observability / feature-engineering shapes a training-data pipeline
runs over click/impression logs before joining them to documents.

Determinism: every aggregate is built from exact integers — event counts,
and ``value`` scaled to e6 micro-units per ROW before summation
(``CAST(round(value * 1e6) AS BIGINT)``), so no engine's summation order
can move a bit (the registry's scaled-integer discipline,
queries/__init__).  Double outputs (means, z-scores, probabilities) are
computed from those exact sums and rounded to 6 dp.

Scale design (100 TB event log, 1000 executors):

* The hourly rollup is ONE groupBy((event_type, hour)) with map-side
  partial aggregation — the cardinality after the combine is
  |types| x |hours|, tiny regardless of input rows.
* Gap-filling generates the hour spine with ``sequence()`` per event_type
  (bounded: hours-in-range rows per type), so the dense grid never
  round-trips through the driver; the fill join is an equi-join on the
  rolled-up (tiny) side.
* LOCF uses the portable gaps-and-islands form — a running count of
  non-null observations defines the carry group, then one max per
  (type, group) window — two window passes over the DENSE grid (small),
  never over raw events, and identical semantics in DuckDB (no reliance
  on engine-specific ``IGNORE NULLS``).
* The Markov pass is a per-user ``lag`` window (shuffle keyed by user_id,
  the natural partitioning of a clickstream) followed by a tiny
  (prev, next) aggregate.  Skewed power-users are bounded by their own
  event counts; no cross-user state exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from changegen_spark.sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _hour() -> F.Column:
    # F.expr needs a live SparkContext, so these are built per-call
    return F.expr("CAST(floor(unix_micros(ts) / 3600000000) AS BIGINT)")


def _val_e6() -> F.Column:
    return F.expr("CAST(round(value * 1000000) AS BIGINT)")


def q_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample of the event stream per event_type over the global
    [min, max] hour range, with empty buckets gap-filled (n_events = 0)
    and the hourly mean value carried forward from the last non-empty
    bucket (LOCF; leading gaps stay null).

    Output: (event_type, hour, n_events, sum_value_e6, avg_value_locf)
    where ``hour`` is the epoch-hour bucket (unix seconds / 3600) and
    ``avg_value_locf`` the carried-forward hourly mean of ``value`` in e6
    micro-units (sum_value_e6 / n_events, rounded to 6 dp).
    """
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        F.col("event_type"), _hour().alias("hour")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(_val_e6()).alias("sum_value_e6"),
    )
    # Hour spine: one sequence() row per event_type over the global range —
    # executor-side dense-grid generation, no driver round-trip.
    bounds = ev.agg(
        F.min(_hour()).alias("h0"), F.max(_hour()).alias("h1")
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type", F.explode(F.sequence("h0", "h1")).alias("hour")
    )
    dense = spine.join(hourly, ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("sum_value_e6", F.lit(0)).alias("sum_value_e6"),
        F.when(
            F.col("n_events").isNotNull(),
            F.col("sum_value_e6") / F.col("n_events"),
        ).alias("avg_obs"),
    )
    # Portable LOCF: the running count of non-null observations is the
    # carry group; the group's single observation is its max.
    w = Window.partitionBy("event_type").orderBy("hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    grp = F.count("avg_obs").over(w)
    wg = Window.partitionBy("event_type", "grp")
    return (
        dense.withColumn("grp", grp)
        .withColumn("avg_value_locf", F.round(F.max("avg_obs").over(wg), 6))
        .select(
            "event_type", "hour", "n_events", "sum_value_e6", "avg_value_locf"
        )
        .orderBy("event_type", "hour")
    )


Q_RESAMPLE_SQL = """
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hour,
         CAST(round(value * 1000000) AS BIGINT) AS v6
  FROM events
), hourly AS (
  SELECT event_type, hour, count(*) AS n_events,
         CAST(sum(v6) AS BIGINT) AS sum_value_e6
  FROM ev GROUP BY event_type, hour
), bounds AS (
  SELECT min(hour) AS h0, max(hour) AS h1 FROM ev
), spine AS (
  SELECT t.event_type, CAST(h.h AS BIGINT) AS hour
  FROM (SELECT DISTINCT event_type FROM ev) t
  CROSS JOIN (SELECT unnest(generate_series(h0, h1)) AS h FROM bounds) h
), dense AS (
  SELECT s.event_type, s.hour,
         coalesce(n_events, 0) AS n_events,
         coalesce(sum_value_e6, 0) AS sum_value_e6,
         CASE WHEN n_events IS NOT NULL
              THEN (sum_value_e6 * 1.0) / n_events END AS avg_obs
  FROM spine s LEFT JOIN hourly USING (event_type, hour)
), grpd AS (
  SELECT *, count(avg_obs) OVER (PARTITION BY event_type ORDER BY hour
             ROWS UNBOUNDED PRECEDING) AS grp
  FROM dense
)
SELECT event_type, hour, n_events, sum_value_e6,
       round(max(avg_obs) OVER (PARTITION BY event_type, grp), 6)
         AS avg_value_locf
FROM grpd
ORDER BY event_type, hour
"""


MA_WINDOW = 6  # trailing buckets (current + 5 preceding)
Z_THRESH = 2.0


def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing {MA_WINDOW}-hour moving average of hourly event counts per
    event_type, plus a per-type z-score of each hour's count and an
    anomaly flag at |z| > {Z_THRESH}.

    Mean and std come from the exact integer (sum, sumsq, n) of hourly
    counts — population std, one deterministic double per event_type —
    so the flag cannot flip across engines.  Empty hours inside the range
    count as 0 (the dense spine, as q_resample).
    """
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(F.col("event_type"), _hour().alias("hour")).agg(
        F.count("*").alias("c")
    )
    bounds = ev.agg(F.min(_hour()).alias("h0"), F.max(_hour()).alias("h1"))
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select("event_type", F.explode(F.sequence("h0", "h1")).alias("hour"))
    )
    dense = spine.join(hourly, ["event_type", "hour"], "left").select(
        "event_type", "hour", F.coalesce("c", F.lit(0)).alias("c")
    )
    wma = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-(MA_WINDOW - 1), Window.currentRow)
    )
    wt = Window.partitionBy("event_type")
    n = F.count("*").over(wt)
    s = F.sum("c").over(wt)
    s2 = F.sum(F.col("c") * F.col("c")).over(wt)
    mean = s / n
    std = F.sqrt(s2 / n - mean * mean)
    z = (F.col("c") - mean) / std
    return (
        dense.withColumn(
            "ma", F.round(F.sum("c").over(wma) / F.count("*").over(wma), 6)
        )
        .withColumn("z", F.round(z, 6))
        .withColumn("is_anomaly", (F.abs(z) > Z_THRESH).cast("boolean"))
        .select("event_type", "hour", "c", "ma", "z", "is_anomaly")
        .orderBy("event_type", "hour")
    )


Q_MOVING_AVG_SQL = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hour
  FROM events
), hourly AS (
  SELECT event_type, hour, count(*) AS c FROM ev GROUP BY event_type, hour
), bounds AS (
  SELECT min(hour) AS h0, max(hour) AS h1 FROM ev
), spine AS (
  SELECT t.event_type, CAST(h.h AS BIGINT) AS hour
  FROM (SELECT DISTINCT event_type FROM ev) t
  CROSS JOIN (SELECT unnest(generate_series(h0, h1)) AS h FROM bounds) h
), dense AS (
  SELECT s.event_type, s.hour, coalesce(c, 0) AS c
  FROM spine s LEFT JOIN hourly USING (event_type, hour)
), stats AS (
  SELECT *,
         sum(c) OVER (PARTITION BY event_type ORDER BY hour
                      ROWS {MA_WINDOW - 1} PRECEDING) * 1.0
           / count(*) OVER (PARTITION BY event_type ORDER BY hour
                            ROWS {MA_WINDOW - 1} PRECEDING) AS ma_raw,
         sum(c) OVER (PARTITION BY event_type) * 1.0
           / count(*) OVER (PARTITION BY event_type) AS mean,
         sum(c * c) OVER (PARTITION BY event_type) * 1.0
           / count(*) OVER (PARTITION BY event_type) AS ex2
  FROM dense
)
SELECT event_type, hour, c, round(ma_raw, 6) AS ma,
       round((c - mean) / sqrt(ex2 - mean * mean), 6) AS z,
       abs((c - mean) / sqrt(ex2 - mean * mean)) > {Z_THRESH} AS is_anomaly
FROM stats
ORDER BY event_type, hour
"""


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of per-user event sequences:
    for each (prev_type, next_type) pair, the transition count and the
    row-normalized probability (6 dp).

    Events are ordered per user by the total (ts, event_id) key — the same
    strict ordering contract as q_funnel — so the lag is deterministic
    even under timestamp ties.  Probabilities divide two exact counts.
    """
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    wr = Window.partitionBy("prev_type")
    return (
        trans.withColumn("p", F.round(F.col("n") / F.sum("n").over(wr), 6))
        .select("prev_type", "next_type", "n", "p")
        .orderBy("prev_type", "next_type")
    )


Q_MARKOV_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
), trans AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY prev_type), 6) AS p
FROM trans
ORDER BY prev_type, next_type
"""


RW_SECONDS = 3600  # trailing wall-clock hour


def q_time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed trailing window per user: at every event, the count
    and e6-value sum of that user's events in the PRECEDING WALL-CLOCK
    HOUR (inclusive) — a range frame over event-time seconds, not a row
    frame: sparse/bursty activity changes the answer, rows-between
    can't express it.

    All aggregates are exact integers; ties in the range bound are
    handled identically by both engines (range frames bound by VALUE, so
    same-second events all enter the frame regardless of row order).

    Scale: one shuffle keyed by user_id; the frame is bounded by the
    hour, so state per window never exceeds a user's one-hour burst.
    """
    ev = _events(spark, sf_dir).filter(F.col("user_id") % 25 == 0)
    secs = F.unix_timestamp("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(secs)
        .rangeBetween(-RW_SECONDS, 0)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            F.count("*").over(w).alias("n_1h"),
            F.sum(_val_e6()).over(w).alias("sum_value_e6_1h"),
        )
        .orderBy("user_id", "event_id")
    )


Q_TIME_RANGE_WINDOW_SQL = f"""
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       count(*) OVER (PARTITION BY user_id
                      ORDER BY epoch_us(ts) // 1000000
                      RANGE BETWEEN {RW_SECONDS} PRECEDING AND CURRENT ROW)
         AS n_1h,
       CAST(sum(CAST(round(value * 1000000) AS BIGINT))
            OVER (PARTITION BY user_id
                  ORDER BY epoch_us(ts) // 1000000
                  RANGE BETWEEN {RW_SECONDS} PRECEDING AND CURRENT ROW)
         AS BIGINT) AS sum_value_e6_1h
FROM events WHERE user_id % 25 = 0
ORDER BY user_id, event_id
"""


def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each click picks up the EARLIEST subsequent
    (or simultaneous) view by the same user — the look-ahead twin of
    q_asof_join, via ``as_of_join(direction="forward")``
    (operators/asof.py: backward on negated time, same one-shuffle
    union–sort–window plan).  All three directions are pinned against
    pandas merge_asof in tests/test_asof.py; this query carries the
    forward direction's DuckDB oracle (an argmin join, structurally
    different from the window formulation).  Registered in the
    time-series module so the driver window's family balance is
    unchanged."""
    from changegen_spark.operators.asof import as_of_join
    from changegen_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    out = as_of_join(
        clicks,
        views,
        on=["user_id"],
        ts_col="ts",
        right_value_cols=["view_event_id"],
        tie_col="view_event_id",
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("right_view_event_id").alias("view_event_id"),
        "gap_us",
    ).orderBy("event_id")


Q_ASOF_FORWARD_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), views AS (
  SELECT user_id, ts, max(event_id) AS view_event_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
), cand AS (
  SELECT c.event_id, c.user_id, c.ts, v.view_event_id,
         epoch_us(v.ts) - epoch_us(c.ts) AS gap_us,
         row_number() OVER (
           PARTITION BY c.event_id
           ORDER BY v.ts, v.view_event_id DESC
         ) AS rn
  FROM clicks c JOIN views v
    ON v.user_id = c.user_id AND v.ts >= c.ts
)
SELECT c.event_id, c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       m.view_event_id, m.gap_us
FROM clicks c LEFT JOIN (SELECT * FROM cand WHERE rn = 1) m
  ON m.event_id = c.event_id
ORDER BY c.event_id
"""


HOP_DURATION_S = 2 * 3600
HOP_SLIDE_S = 30 * 60


def q_hopping_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) window aggregation — ``F.window(ts, '2 hours',
    '30 minutes')``: each event lands in duration/slide = 4 overlapping
    windows; per (window_start, event_type) exact count + e6 value sum.
    The tumbling twin is q_event_windows; the hop exercises Spark's
    multi-assignment window expansion (a built-in bounded explode).

    The DuckDB oracle rebuilds the assignment arithmetically: the k-th
    covering window of an event starts at
    ``floor(epoch/slide)*slide - k*slide`` for k in 0..3 — integer
    microsecond math, so the hash gate is exact.

    Scale: the ×4 row expansion happens map-side before one
    (window, type)-keyed aggregation with partial combine — the standard
    cost model of hopping windows (state ∝ windows, input amplification
    = duration/slide).
    """
    from changegen_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    val_e6 = F.round(F.col("value") * 1e6).cast("long")
    return (
        ev.groupBy(
            F.window("ts", f"{HOP_DURATION_S} seconds", f"{HOP_SLIDE_S} seconds").alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.sum(val_e6).alias("sum_value_e6"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value_e6",
        )
        .orderBy("window_start", "event_type")
    )


Q_HOPPING_WINDOWS_SQL = f"""
WITH assigned AS (
  SELECT event_type,
         to_timestamp(((epoch_us(ts) // ({HOP_SLIDE_S} * 1000000))
                       - k.k) * {HOP_SLIDE_S}) AS window_start,
         CAST(round(value * 1e6) AS BIGINT) AS val_e6
  FROM events,
       (SELECT unnest(generate_series(0, {HOP_DURATION_S // HOP_SLIDE_S - 1})) AS k) k
)
SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n, CAST(sum(val_e6) AS BIGINT) AS sum_value_e6
FROM assigned
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --- classical additive seasonal decomposition (r7) ---------------------------
#
# count(hour) = trend + seasonal(hour-of-day) + residual — the moving-
# average decomposition every ops/metrics pipeline runs before alerting
# (a raw z-score fires every midnight; a residual z-score doesn't).
# Exactness: trend is a centered (2·SEAS_HALF+1)-hour mean computed as
# round(sum·1e6 / width) from integer sums; the seasonal component is the
# per-hour-of-day mean of the integer detrended series.  Every division
# runs on bit-identical integer inputs in both engines.
#
# 100 TB shape: ONE groupBy(hour) over the events (map-side combine); all
# windows run over the aggregated hourly frame, whose size is the time
# span (~10^5 rows for a decade of hours), not the event count.

SEAS_HALF = 12  # centered window: ±12 hours → width 25
SEAS_PERIOD = 24  # hour-of-day seasonality


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(hour, hod, c, trend_e6, seasonal_e6, residual_e6) for every hour
    with a FULL centered window (edges are dropped, not padded)."""
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(_hour().alias("hour")).agg(
        F.count("*").alias("c")
    )
    width = 2 * SEAS_HALF + 1
    w = Window.orderBy("hour").rowsBetween(-SEAS_HALF, SEAS_HALF)
    trended = (
        hourly.withColumn("n_win", F.count("*").over(w))
        .withColumn(
            "trend_e6",
            F.round(F.sum("c").over(w) * 1e6 / width).cast("long"),
        )
        .filter(F.col("n_win") == width)
        .withColumn(
            "detrended_e6", F.col("c") * 1_000_000 - F.col("trend_e6")
        )
        .withColumn("hod", F.pmod(F.col("hour"), F.lit(SEAS_PERIOD)).cast("long"))
    )
    seas = trended.groupBy("hod").agg(
        F.round(F.sum("detrended_e6") * 1.0 / F.count("*"))
        .cast("long")
        .alias("seasonal_e6")
    )
    return (
        trended.join(F.broadcast(seas), "hod")
        .select(
            "hour",
            "hod",
            F.col("c").cast("long").alias("c"),
            "trend_e6",
            "seasonal_e6",
            (F.col("detrended_e6") - F.col("seasonal_e6"))
            .cast("long")
            .alias("residual_e6"),
        )
        .orderBy("hour")
    )


Q_SEASONAL_DECOMPOSE_SQL = f"""
WITH hourly AS (
  SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hour,
         count(*) AS c
  FROM events GROUP BY 1
), trended AS (
  SELECT hour, c,
         count(*) OVER w AS n_win,
         CAST(round(sum(c) OVER w * 1e6 / {2 * SEAS_HALF + 1}) AS BIGINT) AS trend_e6
  FROM hourly
  WINDOW w AS (ORDER BY hour ROWS BETWEEN {SEAS_HALF} PRECEDING AND {SEAS_HALF} FOLLOWING)
), full_win AS (
  SELECT hour, c, trend_e6, c * 1000000 - trend_e6 AS detrended_e6,
         CAST(hour % {SEAS_PERIOD} AS BIGINT) AS hod
  FROM trended WHERE n_win = {2 * SEAS_HALF + 1}
), seas AS (
  SELECT hod,
         CAST(round(CAST(sum(detrended_e6) AS BIGINT) * 1.0 / count(*)) AS BIGINT) AS seasonal_e6
  FROM full_win GROUP BY hod
)
SELECT f.hour, f.hod, CAST(f.c AS BIGINT) AS c, f.trend_e6, s.seasonal_e6,
       CAST(f.detrended_e6 - s.seasonal_e6 AS BIGINT) AS residual_e6
FROM full_win f JOIN seas s ON f.hod = s.hod
ORDER BY f.hour
"""


QUERIES = {
    "q_resample": q_resample,
    "q_asof_forward": q_asof_forward,
    "q_hopping_windows": q_hopping_windows,
    "q_moving_avg": q_moving_avg,
    "q_markov_transitions": q_markov_transitions,
    "q_time_range_window": q_time_range_window,
    "q_seasonal_decompose": q_seasonal_decompose,
}

ORACLES = {
    "q_resample": Q_RESAMPLE_SQL,
    "q_asof_forward": Q_ASOF_FORWARD_SQL,
    "q_hopping_windows": Q_HOPPING_WINDOWS_SQL,
    "q_moving_avg": Q_MOVING_AVG_SQL,
    "q_markov_transitions": Q_MARKOV_SQL,
    "q_time_range_window": Q_TIME_RANGE_WINDOW_SQL,
    "q_seasonal_decompose": Q_SEASONAL_DECOMPOSE_SQL,
}
