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


QUERIES = {
    "q_event_windows": q_event_windows,
    "q_sessionize": q_sessionize,
    "q_props_parse": q_props_parse,
}

ORACLES = {
    "q_event_windows": Q_EVENT_WINDOWS_SQL,
    "q_sessionize": Q_SESSIONIZE_SQL,
    "q_props_parse": Q_PROPS_PARSE_SQL,
}
