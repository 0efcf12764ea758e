"""Layout maintenance + row-group pruning audit (sources/layout.py)."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    from changegen_spark.sources.layout import write_clustered, write_scattered
    from changegen_spark.sources.tables import load_table

    # shipdate lands as DATE: the fixture's TIMESTAMP(NANOS) physical type
    # gets no parquet column statistics from Spark's writer (nothing could
    # ever prune on it) — converting at layout time is itself part of the
    # maintenance job
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.to_date("l_shipdate").alias("ship_date"),
        "l_quantity",
        "l_extendedprice",
    )
    base = str(tmp_path_factory.mktemp("layout"))
    clustered = os.path.join(base, "clustered")
    scattered = os.path.join(base, "scattered")
    write_clustered(li, clustered, by="ship_date", partitions=8)
    write_scattered(li, scattered, partitions=8)
    return clustered, scattered


# ~1/80 of the 1995-2001 shipdate (timestamp) domain
PRED = ("1997-03-01", "1997-03-31")


def test_layout_is_invisible_to_results(spark, layouts):
    clustered, scattered = layouts
    lo, hi = PRED
    got = []
    for path in layouts:
        df = spark.read.parquet(path).filter(F.col("ship_date").between(lo, hi))
        got.append(
            df.agg(
                F.count("*").alias("n"),
                F.sum(F.expr("CAST(round(l_extendedprice*100) AS BIGINT)")).alias("s"),
            ).collect()[0]
        )
    assert got[0] == got[1] and got[0].n > 0


def test_clustered_layout_prunes_row_groups_scattered_does_not(layouts):
    from changegen_spark.sources.layout import rowgroup_prune_stats

    from datetime import datetime

    clustered, scattered = layouts
    lo, hi = (datetime.fromisoformat(p).date() for p in PRED)
    cl = rowgroup_prune_stats(clustered, "ship_date", lo, hi)
    sc = rowgroup_prune_stats(scattered, "ship_date", lo, hi)
    # same data on both sides
    assert cl["rows_total"] == sc["rows_total"] > 0
    # scattered: every row group spans the full range -> zero pruning
    assert sc["row_groups_read"] == sc["row_groups"]
    # clustered: a ~1/80-range predicate touches at most a couple of row
    # groups; the rest are skipped from the footer alone
    assert cl["row_groups"] >= 8
    assert cl["row_groups_read"] <= 2
    assert cl["rows_read"] < cl["rows_total"] / 4


def test_filter_is_pushed_to_the_parquet_reader(spark, layouts):
    """The chain of evidence needs both halves: the footer audit above
    shows WHAT a pruning reader may skip; this pin shows Spark's reader
    actually receives the predicate (PushedFilters on the scan node), so
    the row-group skipping happens at scan time rather than post-read."""
    clustered, _ = layouts
    lo, hi = PRED
    plan = (
        spark.read.parquet(clustered)
        .filter(F.col("ship_date").between(lo, hi))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(ship_date" in plan
    assert "LessThanOrEqual(ship_date" in plan
