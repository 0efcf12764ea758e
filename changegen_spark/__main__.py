"""CLI entry point — the ``changegen`` command surface, Spark-native.

Parity with the reference CLI (``changegen/__main__.py:71-169``), adapted to
parquet snapshots instead of a live PostGIS connection (SURVEY §7 stack
decision): the "database" is a directory of parquet tables (one per table,
geometry as WKT strings in a ``geometry``/``geom`` column), the "extract" is
a directory with ``nodes``/``ways``/``relations`` parquet (a PBF ingested
once — see FIXTURES.md §6).

    python -m changegen_spark DBDIR \
        --osmsrc EXTRACT_DIR --output changes.osc \
        [--suffix _new] [--existing original_ways] [--deletions deleted_ways] \
        [--modify_meta TABLE] [--id_offset N] [--neg_id] [--self] \
        [--max_nodes_per_way N] [--compress]

Tables are discovered by name suffix, like the reference's
``information_schema … LIKE '%suffix'`` query (``__main__.py:56-68``), and
dispatched by geometry type (Point → node path, LineString → way path,
Polygon → polygon path — ``generator.py:603-756``).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _load_geo_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet table, parsing any WKT geometry column into the
    engine's geometry struct."""
    from changegen_spark.geo.geometry import parse_wkt

    df = spark.read.parquet(path)
    for cand in ("geometry", "geom"):
        if cand in df.columns and dict(df.dtypes)[cand] == "string":
            df = df.withColumn(cand, parse_wkt(F.col(cand)))
    return df


def _split_by_gtype(df: DataFrame, geom_col: str) -> dict[str, DataFrame]:
    """P4 geometry-type dispatch; Multi*/unknown rejected like the reference
    (generator.py:603-606)."""
    gtypes = [
        r["g"]
        for r in df.select(F.col(f"{geom_col}.gtype").alias("g")).distinct().collect()
    ]
    bad = [g for g in gtypes if g not in ("Point", "LineString", "Polygon")]
    if bad:
        raise ValueError(f"unsupported geometry types {bad}: Multi* geometries are not supported")
    return {
        g: df.filter(F.col(f"{geom_col}.gtype") == g)
        for g in ("Point", "LineString", "Polygon")
        if g in gtypes
    }


def build_tables(
    spark: SparkSession,
    dbdir: str,
    osmsrc: str,
    suffix: str,
    existing: str | None,
    deletions: str | None,
) -> dict[str, DataFrame]:
    """Assemble the pipeline's table dict from discovered parquet files."""
    from changegen_spark.geo.geometry import wkt

    tables: dict[str, DataFrame] = {}
    discovered = sorted(glob.glob(os.path.join(dbdir, f"*{suffix}.parquet")))
    if not discovered:
        raise SystemExit(f"no tables matching *{suffix}.parquet in {dbdir}")

    points, lines, polys = [], [], []
    for path in discovered:
        df = _load_geo_table(spark, path)
        geom_col = "geometry" if "geometry" in df.columns else "geom"
        for gtype, part in _split_by_gtype(df, geom_col).items():
            # stable per-feature key: md5 of the WKT (the engine's feature id
            # for tables that carry none — FIXTURES.md §1 has no id column)
            keyed = part.withColumn("__fkey", F.md5(F.to_binary(wkt(F.col(geom_col)), F.lit("utf-8"))))
            if gtype == "Point":
                if "geom" not in keyed.columns:
                    keyed = keyed.withColumnRenamed(geom_col, "geom")
                if "id" not in keyed.columns:
                    keyed = keyed.withColumn("id", F.crc32(F.col("__fkey")))
                points.append(keyed)
            elif gtype == "LineString":
                if "geometry" not in keyed.columns:
                    keyed = keyed.withColumnRenamed(geom_col, "geometry")
                lines.append(keyed)
            else:
                if "geometry" not in keyed.columns:
                    keyed = keyed.withColumnRenamed(geom_col, "geometry")
                polys.append(keyed.withColumnRenamed("__fkey", "name") if "name" not in keyed.columns else keyed)

    from functools import reduce

    if points:
        tables["new_points"] = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), points)
    if lines:
        tables["new_ways"] = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), lines)
    if polys:
        tables["new_polygons"] = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), polys)

    if existing:
        tables["original_ways"] = _load_geo_table(
            spark, os.path.join(dbdir, f"{existing}.parquet")
        )
    if deletions:
        tables["deleted_ways"] = spark.read.parquet(
            os.path.join(dbdir, f"{deletions}.parquet")
        )

    for name in ("nodes", "ways", "relations"):
        path = os.path.join(osmsrc, f"{name}.parquet")
        if os.path.exists(path):
            tables[f"pbf_{name}"] = spark.read.parquet(path)
    if "pbf_ways" not in tables:
        raise SystemExit(f"extract dir {osmsrc} has no ways.parquet")
    return tables


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="changegen_spark",
        description="Generate an OSMChange file from parquet feature tables + an ingested extract.",
    )
    p.add_argument("dbdir", help="directory of parquet tables")
    p.add_argument("--osmsrc", required=True, help="ingested extract dir (nodes/ways/relations parquet)")
    p.add_argument("--output", required=True, help="output .osc path")
    p.add_argument("--suffix", "-s", default="_new", help="new-table name suffix (default _new)")
    p.add_argument("--existing", "-e", default=None, help="existing-ways table name")
    p.add_argument("--deletions", default=None, help="deletion id table name")
    p.add_argument("--modify_meta", default=None, help="modify-meta table name (tags-only update)")
    p.add_argument("--id_offset", type=int, default=0)
    p.add_argument("--neg_id", action="store_true")
    p.add_argument("--self", dest="self_intersections", action="store_true")
    p.add_argument("--max_nodes_per_way", type=int, default=2000)
    p.add_argument("--compress", action="store_true")
    args = p.parse_args(argv)

    from changegen_spark.operators.changes import assemble_changeset
    from changegen_spark.pipeline import (
        generate_changes,
        generate_modify_meta,
    )
    from changegen_spark.session import get_spark
    from changegen_spark.sinks.oscxml import write_osmchange

    spark = get_spark("changegen_spark-cli")
    tables = build_tables(
        spark, args.dbdir, args.osmsrc, args.suffix, args.existing, args.deletions
    )

    parts = []
    if args.modify_meta:
        tables["mod_ways"] = _load_geo_table(
            spark, os.path.join(args.dbdir, f"{args.modify_meta}.parquet")
        )
        parts.append(generate_modify_meta(spark, tables))
    if any(k in tables for k in ("new_ways", "new_points", "new_polygons", "deleted_ways")):
        parts.append(
            generate_changes(
                spark,
                tables,
                id_offset=args.id_offset,
                negative_ids=args.neg_id,
                self_intersections=args.self_intersections,
                node_limit=args.max_nodes_per_way,
                key_col="__fkey",
            )
        )
    if not parts:
        raise SystemExit("nothing to do: no new tables, deletions, or modify_meta")

    elements = assemble_changeset(*parts)
    counts = write_osmchange(elements, args.output, compress=args.compress)
    print(f"wrote {args.output}: {counts}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
