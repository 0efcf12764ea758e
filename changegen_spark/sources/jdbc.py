"""JDBC source — the reference's live-PostGIS mode (SURVEY §2.1 S1).

Parquet snapshots are this engine's canonical input (reproducible diffs,
object-store-scan parallelism), but parity with the reference means being
able to point at the imposm3 PostGIS database directly.  This module builds
the partitioned-read plan.  The execution path runs LIVE in
tests/test_jdbc_live.py against a real JDBC endpoint (the container's
DuckDB JDBC driver): suffix discovery, the 4-partition read, predicate
pushdown, and snapshot_to_parquet all execute against an actual database.
Only the PostGIS-specific ST_AsBinary export leg remains environmental
(no Postgres server or pg JDBC driver in the container).

Scale rules encoded here:
  * always partition the read (``partitionColumn``/bounds/numPartitions`) —
    an unpartitioned JDBC scan is one executor pulling 100 TB through one
    connection;
  * push the geometry→WKB cast into the dbtable subquery so the transfer
    is binary, not WKT text;
  * discovery-by-suffix matches the reference catalog query
    (``changegen/__main__.py:56-68``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

DISCOVERY_SQL = (
    "SELECT table_name FROM information_schema.tables "
    "WHERE table_schema = '{schema}' AND table_name LIKE '%{suffix}'"
)


def jdbc_table_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = "id",
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    geometry_column: str | None = "geometry",
    fetch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> DataFrameReader:
    """Configured partitioned JDBC reader for one PostGIS table.

    Returns the reader (call ``.load()`` against a live database).  The
    dbtable is a pushdown subquery exporting geometry as WKB.
    """
    cols = "*" if geometry_column is None else (
        f"*, ST_AsBinary({geometry_column}) AS {geometry_column}_wkb"
    )
    dbtable = f"(SELECT {cols} FROM {table}) AS t"
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
        )
        if lower_bound is not None:
            reader = reader.option("lowerBound", str(lower_bound))
        if upper_bound is not None:
            reader = reader.option("upperBound", str(upper_bound))
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader


def discovery_query(suffix: str, schema: str = "public") -> str:
    """The reference's catalog-discovery SQL (information_schema LIKE)."""
    return DISCOVERY_SQL.format(schema=schema, suffix=suffix)


def snapshot_to_parquet(
    spark: SparkSession,
    url: str,
    table: str,
    out_path: str,
    **reader_kwargs,
) -> None:
    """One-time snapshot: partitioned JDBC read → parquet — the ingest step
    that turns the live database into this engine's canonical input."""
    jdbc_table_reader(spark, url, table, **reader_kwargs).load().write.mode(
        "overwrite"
    ).parquet(out_path)
