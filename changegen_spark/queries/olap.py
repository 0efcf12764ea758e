"""Multi-dimensional aggregation: CUBE with grouping flags.

Complements the ROLLUP coverage (``q_rollup``) with the full lattice —
every subset of (l_returnflag, l_linestatus) in one pass, disambiguated by
GROUPING flags (a NULL key value vs the all-group NULL is exactly what
``GROUPING()`` exists for).  Spark computes cube lattices with a single
Expand + aggregate (one shuffle, map-side partials over the expanded
rows); the money sum uses scaled-integer cents per registry convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changegen_spark.sources.tables import load_table


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(cents).alias("price_cents"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("l_linestatus"),
            "n",
            "price_cents",
            "g_flag",
            "g_status",
        )
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


Q_CUBE_SQL = """
SELECT coalesce(l_returnflag, '<all>') AS l_returnflag,
       coalesce(l_linestatus, '<all>') AS l_linestatus,
       count(*) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY g_flag, g_status, l_returnflag, l_linestatus
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the lattice slices CUBE/ROLLUP can't pick
    individually: exactly {(flag, status), (flag), (status)} with no grand
    total, via the Spark 4 ``DataFrame.groupingSets`` API.  GROUPING flags
    disambiguate real NULL-like values from aggregation placeholders, as
    in q_cube.  One aggregation pass; Spark expands the sets with a
    partial-aggregate Expand, not three scans."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        li.groupingSets(
            [
                [F.col("l_returnflag"), F.col("l_linestatus")],
                [F.col("l_returnflag")],
                [F.col("l_linestatus")],
            ],
            F.col("l_returnflag"),
            F.col("l_linestatus"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(cents).alias("price_cents"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("l_linestatus"),
            "n",
            "price_cents",
            "g_flag",
            "g_status",
        )
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


Q_GROUPING_SETS_SQL = """
SELECT coalesce(l_returnflag, '<all>') AS l_returnflag,
       coalesce(l_linestatus, '<all>') AS l_linestatus,
       count(*) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
ORDER BY g_flag, g_status, l_returnflag, l_linestatus
"""


QUERIES = {"q_cube": q_cube, "q_grouping_sets": q_grouping_sets}
ORACLES = {"q_cube": Q_CUBE_SQL, "q_grouping_sets": Q_GROUPING_SETS_SQL}
