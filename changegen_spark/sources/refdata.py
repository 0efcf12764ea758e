"""Reference fixture loader: pg_dump archive + ``.pbf`` → pipeline tables.

This is the real-data parity path: the reference's own test fixture
(``test/data/dbdump.tar`` = the conflate database; ``osmdata.osm.pbf`` = the
extract) ingested through this engine's native readers
(``sources/pgdump.py``, ``sources/pbf.py``) and fed to the same pipeline
entry points the reference's golden tests drive
(``test/test_generator.py:101-230``). The pinned goldens:

  * ``new_ways`` × ``original_ways`` (self=True) → 10 create ways, 4 modify ways
  * ``new_points``                               → 213 create nodes
  * ``mod_ways`` (modify_meta)                   → 22 modify ways
  * ``modified_points`` (modify_meta)            → 3 modify nodes
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REF_DUMP = "/root/reference/test/data/dbdump.tar"
REF_PBF = "/root/reference/test/data/osmdata.osm.pbf"

_CACHE: dict[int, dict[str, DataFrame]] = {}

_LONG_COLS = ("id", "osm_id", "parent_osm_id")


def load_reference_tables(
    spark: SparkSession, dump_path: str = REF_DUMP, pbf_path: str = REF_PBF
) -> dict[str, DataFrame]:
    """All fixture tables, geometry parsed, id columns cast, extract decoded.

    Memoized per session: several parity checks each need the set, and the
    pbf decode is one pass with a persisted unified frame."""
    key = id(spark)
    if key in _CACHE:
        return dict(_CACHE[key])

    from changegen_spark.geo.geometry import parse_wkt
    from changegen_spark.sources.pbf import read_pbf_tables
    from changegen_spark.sources.pgdump import list_pgdump_tables, read_pgdump_table

    tables: dict[str, DataFrame] = {}
    for name in list_pgdump_tables(dump_path):
        df = read_pgdump_table(spark, dump_path, name)
        for c in _LONG_COLS:
            if c in df.columns:
                df = df.withColumn(c, F.col(c).cast("long"))
        for gcol in ("geometry", "geom"):
            if gcol in df.columns:
                df = df.withColumn(gcol, parse_wkt(F.col(gcol)))
        # cache: tiny driver-built frames re-joined many times downstream
        tables[name] = df.localCheckpoint(eager=True)

    tables.update(read_pbf_tables(spark, pbf_path))
    _CACHE[key] = tables
    return dict(tables)


def reference_golden_counts(spark: SparkSession) -> DataFrame:
    """Run the four reference golden flows on the real fixture data and
    return (flow, value) counts — the strongest correctness claim available:
    the reference's own goldens reproduced end-to-end from its own data."""
    from changegen_spark.operators.keys import feature_key
    from changegen_spark.pipeline import (
        generate_changes,
        generate_modify_meta,
        generate_modify_points,
    )

    ref = load_reference_tables(spark)

    # 1. create new ways + modify intersecting (test_generator.py:101-127)
    t1 = {
        "new_ways": feature_key(ref["new_ways"], "geometry"),
        "original_ways": ref["original_ways"],
        "pbf_ways": ref["pbf_ways"],
        "pbf_nodes": ref["pbf_nodes"],
        "pbf_relations": ref["pbf_relations"],
    }
    ways_run = generate_changes(
        spark,
        t1,
        self_intersections=True,
        check_collision=False,
        key_col="__fkey",
    )
    ways_counts = ways_run.filter(F.col("kind") == "way").groupBy("change_type").agg(
        F.count("*").alias("value")
    )

    # 2. new points (test_generator.py:164-196)
    t2 = {
        "new_points": ref["new_points"],
        "pbf_ways": ref["pbf_ways"],
        "pbf_nodes": ref["pbf_nodes"],
        "pbf_relations": ref["pbf_relations"],
    }
    pts_run = generate_changes(spark, t2, check_collision=False)
    pts_count = pts_run.filter(
        (F.col("kind") == "node") & (F.col("change_type") == "create")
    ).agg(F.count("*").alias("value"))

    # 3. modify_meta ways (test_generator.py:129-162)
    meta_run = generate_modify_meta(
        spark, {"mod_ways": ref["mod_ways"], "pbf_ways": ref["pbf_ways"]}
    )
    meta_count = meta_run.agg(F.count("*").alias("value"))

    # 4. modify_meta points (test_generator.py:198-230)
    mpts_run = generate_modify_points(
        spark, {"modified_points": ref["modified_points"]}
    )
    mpts_count = mpts_run.agg(F.count("*").alias("value"))

    return (
        ways_counts.select(
            F.concat(F.lit("ways_"), F.col("change_type")).alias("flow"), "value"
        )
        .unionByName(pts_count.select(F.lit("points_create").alias("flow"), "value"))
        .unionByName(meta_count.select(F.lit("meta_modify").alias("flow"), "value"))
        .unionByName(mpts_count.select(F.lit("points_modify").alias("flow"), "value"))
        .orderBy("flow")
    )
