"""Event-stream operator queries (batch twins of the streaming module).

Tumbling-window aggregation, gap-based sessionization, and hstore/JSON-ish
props parsing (P2 analog).  The streaming variants (readStream + watermark)
live in ``changegen_spark.streaming``; these batch twins define the exact
semantics and feed the duckdb oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from changegen_spark.sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def q_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event_type: count + exact value sum
    (micros-scaled integer)."""
    ev = _events(spark, sf_dir)
    win = F.window("ts", "1 hour")
    val_e6 = F.round(F.col("value") * 1e6).cast("long")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum(val_e6).alias("sum_value_e6"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value_e6",
        )
        .orderBy("window_start", "event_type")
    )


Q_EVENT_WINDOWS_SQL = """
SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n,
       CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS sum_value_e6
FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) per user: the classic
    lag → new-session flag → running sum session id, then per-session agg.
    This is the batch twin of streaming session windows."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") % 10 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > 1800),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = ev.withColumn("new_sess", new_sess).withColumn(
        "session_seq",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
        .orderBy("user_id", "session_seq")
    )


Q_SESSIONIZE_SQL = """
WITH ev AS (SELECT * FROM events WHERE user_id % 10 = 0),
flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessioned AS (
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
FROM sessioned GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


def q_props_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 analog: parse the key→value props string into a map, merge with
    column-derived tags under column precedence (changegen/generator.py:190-203
    semantics on a JSON-ish payload)."""
    ev = _events(spark, sf_dir).filter(F.col("event_id") % 25 == 0)
    k = F.regexp_extract(F.col("props"), r'"k"\s*:\s*(-?\d+)', 1).cast("long")
    return ev.select(
        "event_id",
        "event_type",
        k.alias("k"),
        F.when(k > 50, F.lit("high")).otherwise(F.lit("low")).alias("k_band"),
    ).orderBy("event_id")


Q_PROPS_PARSE_SQL = """
SELECT event_id, event_type,
       CAST(regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1) AS BIGINT) AS k,
       CASE WHEN CAST(regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1) AS BIGINT) > 50
            THEN 'high' ELSE 'low' END AS k_band
FROM events WHERE event_id % 25 = 0 ORDER BY event_id
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click event picks up the most recent
    prior-or-simultaneous view by the same user (union–sort–window plan,
    one shuffle — ``operators/asof.as_of_join``).  The view side is
    pre-deduped to one row per (user, ts) because an ASOF oracle is
    nondeterministic across duplicate timestamps."""
    from changegen_spark.operators.asof import as_of_join

    ev = _events(spark, sf_dir)
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
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("right_view_event_id").alias("view_event_id"),
        "gap_us",
    ).orderBy("event_id")


Q_ASOF_JOIN_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), views AS (
  SELECT user_id, ts, max(event_id) AS view_event_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       v.view_event_id,
       epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND c.ts >= v.ts
ORDER BY c.event_id
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval range join: per error event, count + exact value sum of the
    same user's events in the preceding 5 minutes ``[ts-5m, ts)``.  Binned
    filter-and-refine plan (``operators/asof.range_join_binned``): hash
    equi-join on (user, 5-minute cell), never an inequality nested-loop."""
    from changegen_spark.operators.asof import range_join_binned

    ev = _events(spark, sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    five_min_us = 300 * 1_000_000
    ts_us = F.unix_micros(F.col("ts"))
    joined = range_join_binned(
        errors,
        ev.select("user_id", "ts", "value"),
        on=["user_id"],
        lo_us=ts_us - five_min_us,
        hi_us=ts_us,
        bin_width_us=five_min_us,
    )
    prior = joined.groupBy("event_id").agg(
        F.count("*").alias("n_prior"),
        F.sum(F.round(F.col("right_value") * 1e6).cast("long")).alias(
            "sum_prior_value_e6"
        ),
    )
    return (
        errors.join(prior, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce("n_prior", F.lit(0)).alias("n_prior"),
            F.coalesce("sum_prior_value_e6", F.lit(0)).alias("sum_prior_value_e6"),
        )
        .orderBy("event_id")
    )


Q_RANGE_JOIN_SQL = """
WITH errors AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
)
SELECT e.event_id, e.user_id,
       CAST(count(v.ts) AS BIGINT) AS n_prior,
       CAST(coalesce(sum(CAST(round(v.value * 1e6) AS BIGINT)), 0) AS BIGINT)
         AS sum_prior_value_e6
FROM errors e LEFT JOIN events v
  ON e.user_id = v.user_id
 AND v.ts >= e.ts - INTERVAL 5 MINUTE AND v.ts < e.ts
GROUP BY e.event_id, e.user_id
ORDER BY e.event_id
"""


INCIDENT_HALF_WIDTH_US = 300_000_000  # ±5 min around each incident event
OVERLAP_BUCKET_US = 600_000_000  # 10-min buckets ~ typical session length


def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which user sessions overlapped an incident window?  Set A: 30-min-gap
    sessions of users with ``user_id % 10 = 0`` (the q_sessionize cohort)
    as [first_ts, last_ts] closed intervals.  Set B: incident windows —
    error events with ``event_id % 97 = 0`` widened ±5 min.  Output one
    row per overlapping (session, incident) pair with the exact overlap
    in integer microseconds.

    The join is ``operators.intervals.overlap_join`` — bucketized into
    10-min buckets so Catalyst plans a plain hash equi-join on the bucket
    key instead of the BroadcastNestedLoopJoin a raw overlap predicate
    produces (plan-pinned in tests/test_plans.py).  All endpoints are
    epoch micros (exact longs), so the overlap arithmetic hash-matches
    any engine."""
    from changegen_spark.operators.intervals import overlap_join

    ev = _events(spark, sf_dir).filter(F.col("user_id") % 10 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > 1800),
        F.lit(1),
    ).otherwise(F.lit(0))
    sessions = (
        ev.withColumn("new_sess", new_sess)
        .withColumn(
            "session_seq",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_seq")
        .agg(
            F.min(F.unix_micros("ts")).alias("s_start"),
            F.max(F.unix_micros("ts")).alias("s_end"),
        )
    )
    incidents = (
        _events(spark, sf_dir)
        .filter((F.col("event_type") == "error") & (F.col("event_id") % 97 == 0))
        .select(
            F.col("event_id").alias("incident_id"),
            (F.unix_micros("ts") - F.lit(INCIDENT_HALF_WIDTH_US)).alias("i_start"),
            (F.unix_micros("ts") + F.lit(INCIDENT_HALF_WIDTH_US)).alias("i_end"),
        )
    )
    pairs = overlap_join(
        sessions, incidents, "s_start", "s_end", "i_start", "i_end",
        OVERLAP_BUCKET_US,
    )
    return pairs.select(
        "user_id",
        "session_seq",
        "incident_id",
        (
            F.least("s_end", "i_end") - F.greatest("s_start", "i_start")
        ).alias("overlap_us"),
    ).orderBy("user_id", "session_seq", "incident_id")


Q_INTERVAL_OVERLAP_SQL = f"""
WITH ev AS (SELECT * FROM events WHERE user_id % 10 = 0),
flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM ev
), numbered AS (
  SELECT user_id, ts,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_seq
  FROM flagged
), sessions AS (
  SELECT user_id, session_seq,
         min(epoch_us(ts)) AS s_start, max(epoch_us(ts)) AS s_end
  FROM numbered GROUP BY user_id, session_seq
), incidents AS (
  SELECT event_id AS incident_id,
         epoch_us(ts) - {INCIDENT_HALF_WIDTH_US} AS i_start,
         epoch_us(ts) + {INCIDENT_HALF_WIDTH_US} AS i_end
  FROM events
  WHERE event_type = 'error' AND event_id % 97 = 0
)
SELECT user_id, session_seq, incident_id,
       least(s_end, i_end) - greatest(s_start, i_start) AS overlap_us
FROM sessions JOIN incidents
  ON s_start <= i_end AND i_start <= s_end
ORDER BY user_id, session_seq, incident_id
"""


ATTR_WINDOW_US = 24 * 3600 * 1_000_000  # last-touch lookback


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the user's
    most recent NON-purchase event within the preceding 24 h (ties on the
    timestamp break by the larger event_id — the strict (ts, event_id)
    ordering contract).  Output: per touch type, attributed purchase count
    and e6 revenue — the marketing-analytics composition of the as-of
    join operator (operators/asof.py: union–sort–window, ONE shuffle, no
    join node at all).

    Purchases with no qualifying touch report as 'unattributed'."""
    from changegen_spark.operators.asof import as_of_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_id"),
        F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("rev_e6"),
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "ts", "event_id", F.col("event_type").alias("touch_type")
    )
    attached = as_of_join(
        purchases,
        touches,
        on=["user_id"],
        ts_col="ts",
        right_value_cols=["touch_type"],
        tie_col="event_id",
        tolerance_us=ATTR_WINDOW_US,
    )
    return (
        attached.groupBy(
            F.coalesce(F.col("right_touch_type"), F.lit("unattributed")).alias(
                "touch_type"
            )
        )
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("rev_e6").alias("revenue_e6"),
        )
        .orderBy("touch_type")
    )


Q_ATTRIBUTION_SQL = f"""
WITH purchases AS (
  SELECT user_id, ts, event_id AS purchase_id,
         CAST(round(value * 1000000) AS BIGINT) AS rev_e6
  FROM events WHERE event_type = 'purchase'
), touches AS (
  SELECT user_id, ts, event_id, event_type AS touch_type
  FROM events WHERE event_type != 'purchase'
), attached AS (
  SELECT purchase_id, rev_e6, touch_type FROM (
    SELECT p.purchase_id, p.rev_e6, t.touch_type,
           row_number() OVER (PARTITION BY p.purchase_id
                              ORDER BY t.ts DESC NULLS LAST,
                                       t.event_id DESC NULLS LAST) AS rn
    FROM purchases p
    LEFT JOIN touches t
      ON p.user_id = t.user_id
     AND t.ts <= p.ts
     AND epoch_us(p.ts) - epoch_us(t.ts) <= {ATTR_WINDOW_US}
  ) WHERE rn = 1
)
SELECT coalesce(touch_type, 'unattributed') AS touch_type,
       count(*) AS n_purchases, CAST(sum(rev_e6) AS BIGINT) AS revenue_e6
FROM attached
GROUP BY 1
ORDER BY touch_type
"""


BAL_INIT, BAL_LO, BAL_HI = 100_000_000, 0, 200_000_000
BAL_BASE = 50_000_000  # delta = value_e6 - BASE, so deltas are signed


def q_capped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped account-balance scan per user (``user_id % 50 = 0`` cohort):
    bal_i = clamp(bal_{i-1} + (value_e6 - {BAL_BASE}), [{BAL_LO},
    {BAL_HI}]) in strict (ts, event_id) order.  NOT a window aggregate —
    each step depends on the CLAMPED prior value — so it runs as the
    ``operators/stateful.capped_running_sum`` applyInPandas scan; the
    ORACLE replays the identical recurrence as a DuckDB recursive CTE
    stepping row-by-row, a structurally different execution of the same
    exact-integer semantics."""
    from changegen_spark.operators.stateful import capped_running_sum

    ev = _events(spark, sf_dir).filter(F.col("user_id") % 50 == 0)
    d = ev.select(
        "user_id",
        "ts",
        "event_id",
        (
            F.expr("CAST(round(value * 1000000) AS BIGINT)") - F.lit(BAL_BASE)
        ).alias("d"),
    )
    return capped_running_sum(
        d, ["user_id"], ["ts", "event_id"], "d", BAL_INIT, BAL_LO, BAL_HI
    ).orderBy("user_id")


Q_CAPPED_BALANCE_SQL = f"""
WITH RECURSIVE ev AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         CAST(round(value * 1000000) AS BIGINT) - {BAL_BASE} AS d
  FROM events WHERE user_id % 50 = 0
), step AS (
  SELECT user_id, 0 AS rn, CAST({BAL_INIT} AS BIGINT) AS bal,
         CAST(0 AS BIGINT) AS caps, CAST(0 AS BIGINT) AS floors
  FROM (SELECT DISTINCT user_id FROM ev)
  UNION ALL
  SELECT e.user_id, e.rn,
         greatest({BAL_LO}, least({BAL_HI}, s.bal + e.d)),
         s.caps + CASE WHEN s.bal + e.d > {BAL_HI} THEN 1 ELSE 0 END,
         s.floors + CASE WHEN s.bal + e.d < {BAL_LO} THEN 1 ELSE 0 END
  FROM step s JOIN ev e ON e.user_id = s.user_id AND e.rn = s.rn + 1
)
SELECT user_id, CAST(max(rn) AS BIGINT) AS n_events,
       CAST(max_by(bal, rn) AS BIGINT) AS final_balance,
       CAST(max_by(caps, rn) AS BIGINT) AS n_cap_hits,
       CAST(max_by(floors, rn) AS BIGINT) AS n_floor_hits
FROM step
GROUP BY user_id
ORDER BY user_id
"""


PATH_N = 3
PATH_TOPK = 20


def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the most common length-{PATH_N} event-type sequences
    inside user sessions (30-min gap, ALL users), top-{PATH_TOPK} by
    (count desc, path) — 'what do users do in a row?'.

    Composition: the lag/cumsum sessionizer → per-session ORDERED type
    array (sort by the strict (ts, event_id) key inside the aggregate,
    never by row order) → array-slice {PATH_N}-grams (same guarded
    transform as mlprep.word_ngrams) → one count aggregate."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > 1800),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = ev.withColumn("new_sess", new_sess).withColumn(
        "session_seq",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    seqs = sess.groupBy("user_id", "session_seq").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda x: x["event_type"],
        ).alias("types")
    )
    n = F.size("types")
    grams = seqs.select(
        F.explode(
            F.when(
                n >= PATH_N,
                F.transform(
                    F.sequence(F.lit(1), n - F.lit(PATH_N) + 1),
                    lambda i: F.concat_ws(
                        ">", F.slice(F.col("types"), i, F.lit(PATH_N))
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("path")
    )
    return (
        grams.groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(PATH_TOPK)
    )


Q_TOP_PATHS_SQL = f"""
WITH ev AS (SELECT * FROM events),
flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessioned AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
), seqs AS (
  SELECT user_id, session_seq,
         list(event_type ORDER BY ts, event_id) AS types
  FROM sessioned GROUP BY user_id, session_seq
), grams AS (
  SELECT array_to_string(types[CAST(i AS INT):CAST(i + {PATH_N - 1} AS INT)], '>')
           AS path
  FROM (SELECT types, unnest(generate_series(1, len(types) - {PATH_N - 1})) AS i
        FROM seqs WHERE len(types) >= {PATH_N})
)
SELECT path, count(*) AS n
FROM grams
GROUP BY path
ORDER BY n DESC, path
LIMIT {PATH_TOPK}
"""


PAIR_WINDOW_US = 30 * 60 * 1_000_000  # purchase within 30 min of the view


def q_view_purchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded event-pair join: every (view, purchase) pair of the
    same user with the purchase strictly after the view and within 30
    minutes — the batch twin that defines the semantics of the
    stream-stream join (streaming/events.view_purchase_stream_join, pinned
    equal in tests/test_streaming.py).

    Distinct from the as-of join (q_asof_join: latest single match) and
    the interval-overlap join (q_interval_overlap: precomputed interval
    table): this is the N×M-within-window pair enumeration whose streaming
    form requires watermarked two-sided state.  Gap arithmetic is
    microsecond-exact (unix_micros / epoch_us) so the oracle hash-matches.

    Scale: user-keyed equi-join (the time bound is a cheap residual
    predicate on the matched pairs); both sides shuffle once on user_id —
    never a time-only cross join.  In the streaming twin the same bound
    becomes the state-eviction rule: each side's buffer holds only rows
    younger than watermark + 30 min.
    """
    ev = _events(spark, sf_dir)
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("vts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
        F.col("value"),
    )
    gap = F.unix_micros(F.col("pts")) - F.unix_micros(F.col("vts"))
    return (
        v.join(p, "user_id")
        .filter((gap > 0) & (gap <= PAIR_WINDOW_US))
        .select(
            "user_id",
            "view_id",
            "purchase_id",
            gap.alias("gap_us"),
            F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        )
        .orderBy("view_id", "purchase_id")
    )


Q_VIEW_PURCHASE_PAIRS_SQL = f"""
WITH v AS (
  SELECT user_id, event_id AS view_id, ts AS vts
  FROM events WHERE event_type = 'view'
), p AS (
  SELECT user_id, event_id AS purchase_id, ts AS pts, value
  FROM events WHERE event_type = 'purchase'
)
SELECT v.user_id, v.view_id, p.purchase_id,
       epoch_us(p.pts) - epoch_us(v.vts) AS gap_us,
       CAST(round(p.value * 100) AS BIGINT) AS value_cents
FROM v JOIN p ON p.user_id = v.user_id
WHERE epoch_us(p.pts) - epoch_us(v.vts) > 0
  AND epoch_us(p.pts) - epoch_us(v.vts) <= {PAIR_WINDOW_US}
ORDER BY view_id, purchase_id
"""


QUERIES = {
    "q_event_windows": q_event_windows,
    "q_view_purchase_pairs": q_view_purchase_pairs,
    "q_top_paths": q_top_paths,
    "q_interval_overlap": q_interval_overlap,
    "q_attribution": q_attribution,
    "q_capped_balance": q_capped_balance,
    "q_sessionize": q_sessionize,
    "q_props_parse": q_props_parse,
    "q_asof_join": q_asof_join,
    "q_range_join": q_range_join,
}

ORACLES = {
    "q_event_windows": Q_EVENT_WINDOWS_SQL,
    "q_view_purchase_pairs": Q_VIEW_PURCHASE_PAIRS_SQL,
    "q_interval_overlap": Q_INTERVAL_OVERLAP_SQL,
    "q_attribution": Q_ATTRIBUTION_SQL,
    "q_capped_balance": Q_CAPPED_BALANCE_SQL,
    "q_top_paths": Q_TOP_PATHS_SQL,
    "q_sessionize": Q_SESSIONIZE_SQL,
    "q_props_parse": Q_PROPS_PARSE_SQL,
    "q_asof_join": Q_ASOF_JOIN_SQL,
    "q_range_join": Q_RANGE_JOIN_SQL,
}
