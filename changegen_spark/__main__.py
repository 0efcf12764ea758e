"""CLI entry point — the ``changegen`` command surface, Spark-native.

Parity with the reference CLI (``changegen/__main__.py:71-269``). Two table
sources: parquet snapshots (SURVEY §7 canonical input) or a LIVE database via
``--jdbc URL`` (the reference's primary mode — discovery by suffix and
partitioned reads through ``sources/jdbc.py``; with neither DBDIR nor
``--jdbc``, connection parameters fall back to the standard PG* environment
variables exactly like the reference). In parquet mode the "database" is a
directory of parquet tables (one per table,
geometry as WKT strings in a ``geometry``/``geom`` column), the "extract" is
a directory with ``nodes``/``ways``/``relations`` parquet (ingested from a
``.pbf`` via ``changegen_spark.sources.pbf`` — or pass a ``.pbf`` path
directly as ``--osmsrc`` and it is ingested on the fly).

    python -m changegen_spark DBDIR \
        --osmsrc EXTRACT_DIR_OR_PBF (--output changes.osc | --outdir DIR) \
        [--suffix _new ...] [--existing original_ways ...] \
        [--deletions deleted_ways ...] [--modify_meta] [--hstore_tags COL] \
        [--id_offset N] [--neg_id] [--no_collisions] [--self] \
        [--max_nodes_per_way N|none] [--compress]

Reference-parity behaviors:
  * ``--outdir`` emits ONE ``.osc`` per discovered table (and per deletions
    table), named ``{table}.osc`` (``changegen/__main__.py:232-263``);
    ``--output`` is the merged single-file mode.
  * ``--modify_meta`` is a flag applying to every ``--suffix`` table and is
    incompatible with ``--existing`` (``changegen/__main__.py:229-230``).
  * ID collisions with the extract warn by default and are fatal only under
    ``--no_collisions`` (``changegen/__main__.py:197-208``).
  * ``--hstore_tags`` names an hstore column merged into tags for BOTH new
    and intersection tables (``changegen/generator.py:190-203``).

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
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _parse_geo_columns(df: DataFrame) -> DataFrame:
    """Parse any WKT geometry column into the engine's geometry struct."""
    from changegen_spark.geo.geometry import parse_wkt

    for cand in ("geometry", "geom"):
        if cand in df.columns and dict(df.dtypes)[cand] == "string":
            df = df.withColumn(cand, parse_wkt(F.col(cand)))
    return df


def _load_geo_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet table, parsing any WKT geometry column into the
    engine's geometry struct."""
    return _parse_geo_columns(spark.read.parquet(path))


class ParquetSource:
    """Table source backed by a directory of parquet files (the engine's
    canonical snapshot input)."""

    def __init__(self, spark: SparkSession, dbdir: str) -> None:
        self.spark = spark
        self.dbdir = dbdir

    def discover(self, suffixes: list[str]) -> list[str]:
        return discover_new_tables(self.dbdir, suffixes)

    def load_geo(self, name: str) -> DataFrame:
        return _load_geo_table(self.spark, os.path.join(self.dbdir, f"{name}.parquet"))

    def load_plain(self, name: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.dbdir, f"{name}.parquet"))

    def describe(self) -> str:
        return self.dbdir


class JdbcSource:
    """Table source backed by a live database over JDBC — the reference's
    primary mode (``changegen/__main__.py:165-169``, ``db.py:148-180``).
    Discovery and partitioned reads via ``sources.jdbc.JdbcCatalog``."""

    def __init__(self, catalog) -> None:
        self.catalog = catalog

    def discover(self, suffixes: list[str]) -> list[str]:
        return self.catalog.discover(suffixes)

    def load_geo(self, name: str) -> DataFrame:
        return _parse_geo_columns(self.catalog.load(name))

    def load_plain(self, name: str) -> DataFrame:
        return self.catalog.load(name)

    def describe(self) -> str:
        return self.catalog.url


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


def _with_fkey(part: DataFrame, geom_col: str) -> DataFrame:
    """Stable row-unique feature key (see ``operators/keys.py``)."""
    from changegen_spark.operators.keys import feature_key

    return feature_key(part, geom_col)


def discover_new_tables(dbdir: str, suffixes: list[str]) -> list[str]:
    """Suffix discovery across one or more suffixes (reference allows
    ``--suffix`` multiple times)."""
    names: list[str] = []
    for suffix in suffixes:
        for path in sorted(glob.glob(os.path.join(dbdir, f"*{suffix}.parquet"))):
            name = os.path.basename(path)[: -len(".parquet")]
            if name not in names:
                names.append(name)
    return names


def load_new_parts(
    spark: SparkSession, source, table_names: list[str]
) -> dict[str, DataFrame]:
    """Load + geometry-dispatch the named feature tables into the pipeline's
    ``new_points`` / ``new_ways`` / ``new_polygons`` parts.

    ``source`` is a ParquetSource/JdbcSource (a plain dbdir string is also
    accepted for backward compatibility)."""
    if isinstance(source, str):
        source = ParquetSource(spark, source)
    points, lines, polys = [], [], []
    for name in table_names:
        df = source.load_geo(name)
        geom_col = "geometry" if "geometry" in df.columns else "geom"
        for gtype, part in _split_by_gtype(df, geom_col).items():
            keyed = _with_fkey(part, geom_col)
            if gtype == "Point":
                if "geom" not in keyed.columns:
                    keyed = keyed.withColumnRenamed(geom_col, "geom")
                # no id synthesis: the pipeline's point path falls back to a
                # row-unique feature key when id is absent or NULL (a crc32
                # here would risk 32-bit collisions at scale)
                points.append(keyed)
            elif gtype == "LineString":
                if "geometry" not in keyed.columns:
                    keyed = keyed.withColumnRenamed(geom_col, "geometry")
                lines.append(keyed)
            else:
                if "geometry" not in keyed.columns:
                    keyed = keyed.withColumnRenamed(geom_col, "geometry")
                polys.append(keyed.withColumnRenamed("__fkey", "name") if "name" not in keyed.columns else keyed)

    parts: dict[str, DataFrame] = {}
    if points:
        parts["new_points"] = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), points)
    if lines:
        parts["new_ways"] = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), lines)
    if polys:
        parts["new_polygons"] = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), polys)
    return parts


def load_extract(spark: SparkSession, osmsrc: str) -> dict[str, DataFrame]:
    """Extract tables from an ingested dir — or directly from a ``.pbf``."""
    tables: dict[str, DataFrame] = {}
    if osmsrc.endswith((".pbf", ".osm.pbf")) and os.path.isfile(osmsrc):
        from changegen_spark.sources.pbf import read_pbf_tables

        tables.update(read_pbf_tables(spark, osmsrc))
    else:
        for name in ("nodes", "ways", "relations"):
            path = os.path.join(osmsrc, f"{name}.parquet")
            if os.path.exists(path):
                tables[f"pbf_{name}"] = spark.read.parquet(path)
    if "pbf_ways" not in tables:
        raise SystemExit(f"extract {osmsrc} has no ways (need ways.parquet or a .pbf)")
    return tables


def build_tables(
    spark: SparkSession,
    dbdir: str,
    osmsrc: str,
    suffix: str | list[str],
    existing: str | list[str] | None,
    deletions: str | list[str] | None,
) -> dict[str, DataFrame]:
    """Assemble the pipeline's table dict from discovered parquet files
    (merged single-run mode)."""
    suffixes = [suffix] if isinstance(suffix, str) else list(suffix)
    source = ParquetSource(spark, dbdir) if isinstance(dbdir, str) else dbdir
    names = source.discover(suffixes)
    if not names:
        raise SystemExit(f"no tables matching *{suffixes} in {source.describe()}")
    tables = load_new_parts(spark, source, names)

    for ex in _aslist(existing):
        df = source.load_geo(ex)
        tables["original_ways"] = (
            tables["original_ways"].unionByName(df, allowMissingColumns=True)
            if "original_ways" in tables
            else df
        )
    for dl in _aslist(deletions):
        df = source.load_plain(dl)
        tables["deleted_ways"] = (
            tables["deleted_ways"].unionByName(df, allowMissingColumns=True)
            if "deleted_ways" in tables
            else df
        )
    tables.update(load_extract(spark, osmsrc))
    return tables


def _aslist(v) -> list[str]:
    if v is None:
        return []
    return [v] if isinstance(v, str) else list(v)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="changegen_spark",
        description="Generate an OSMChange file from parquet feature tables + an OSM extract.",
    )
    p.add_argument(
        "dbdir", nargs="?", default=None,
        help="directory of parquet tables (omit when using --jdbc / PG* env vars)",
    )
    p.add_argument("--osmsrc", required=True, help="extract: ingested dir (nodes/ways/relations parquet) or a .pbf file")
    p.add_argument(
        "--jdbc", default=None,
        help="JDBC URL of a live database (reference primary mode, "
        "changegen/__main__.py:165-169); tables are discovered by suffix and "
        "read with partitioned connections. With neither DBDIR nor --jdbc, "
        "a PostgreSQL URL is built from the standard PG* environment "
        "variables like the reference.",
    )
    p.add_argument("--jdbc-driver", default=None, help="JDBC driver class (default inferred from URL)")
    p.add_argument("--jdbc-schema", default=None, help="schema for table discovery (default: public, or main for DuckDB)")
    p.add_argument("--jdbc-partition-column", default="id", help="numeric column used to parallelize JDBC reads")
    p.add_argument("--jdbc-partitions", type=int, default=32, help="number of parallel JDBC read partitions")
    p.add_argument("--jdbc-jar", default=None, help="path to the JDBC driver jar (added to the Spark classpath at launch)")
    p.add_argument("-d", "--debug", action="store_true", help="enable verbose logging (reference -d)")
    p.add_argument("--output", default=None, help="merged single-file output .osc path")
    p.add_argument("--outdir", "-o", default=None, help="directory for per-table {table}.osc outputs (reference mode)")
    p.add_argument("--suffix", "-s", action="append", default=None, help="new-table name suffix (repeatable; default _new)")
    p.add_argument("--existing", "-e", action="append", default=None, help="existing-ways table name (repeatable)")
    p.add_argument("--deletions", action="append", default=None, help="deletion id table name (repeatable)")
    p.add_argument(
        "--modify_meta", "-m", action="store_true",
        help="treat --suffix tables as tags-only <modify> ways instead of creates (reference -m)",
    )
    p.add_argument("--hstore_tags", default=None, help="hstore column merged into tags (new + intersection tables)")
    p.add_argument("--id_offset", type=int, default=0)
    p.add_argument("--neg_id", action="store_true")
    p.add_argument(
        "--no_collisions", action="store_true",
        help="abort (instead of warn) when --id_offset collides with extract ids",
    )
    p.add_argument("--self", dest="self_intersections", action="store_true")
    p.add_argument("--max_nodes_per_way", default="2000", help="int or 'none' for unlimited")
    p.add_argument("--compress", action="store_true")
    p.add_argument(
        "--reference-bytes",
        action="store_true",
        help="byte-compatible output with the reference's actual behavior: "
        "re-emit osm_id as a tag on modified ways and duplicate each "
        "split-chunk's first node instead of sharing the boundary node",
    )
    args = p.parse_args(argv)

    if (args.output is None) == (args.outdir is None):
        raise SystemExit("exactly one of --output or --outdir is required")
    if args.modify_meta and args.existing:
        # changegen/__main__.py:229-230
        raise RuntimeError("--modify_meta cannot be used with --existing.")
    node_limit = (
        2**31 - 1
        if str(args.max_nodes_per_way).lower() == "none"
        else int(args.max_nodes_per_way)
    )
    suffixes = _aslist(args.suffix) or ["_new"]

    from changegen_spark.operators.changes import assemble_changeset
    from changegen_spark.pipeline import (
        generate_changes,
        generate_deletions,
        generate_modify_meta,
    )
    from changegen_spark.session import get_spark
    from changegen_spark.sinks.oscxml import write_osmchange
    from changegen_spark.sources.osm import max_pbf_ids

    spark = get_spark("changegen_spark-cli", jars=args.jdbc_jar)
    if args.debug:
        # reference -d/--debug (changegen/__main__.py:72): verbose logging
        import logging

        logging.basicConfig(level=logging.DEBUG)
        spark.sparkContext.setLogLevel("INFO")

    if args.jdbc is not None or args.dbdir is None:
        from changegen_spark.sources.jdbc import JdbcCatalog, postgres_url_from_env

        url, props = args.jdbc, {}
        if url is None:
            # reference parity: fall back to the standard PG* env vars
            url, props = postgres_url_from_env(dict(os.environ))
        source = JdbcSource(
            JdbcCatalog(
                spark,
                url,
                schema=args.jdbc_schema,
                driver=args.jdbc_driver,
                partition_column=args.jdbc_partition_column,
                num_partitions=args.jdbc_partitions,
                properties=props,
            )
        )
    else:
        source = ParquetSource(spark, args.dbdir)

    extract = load_extract(spark, args.osmsrc)

    # C6 collision guard, reference semantics (__main__.py:197-208): warn by
    # default, fatal only under --no_collisions.
    maxids = max_pbf_ids(extract)
    existing_max = max(maxids.values()) if maxids else 0
    if not args.neg_id and args.id_offset <= existing_max:
        msg = (
            f"Chosen ID offset {args.id_offset} may cause collisions with "
            f"existing OSM IDs (max ids: {maxids})."
        )
        if args.no_collisions:
            print(f"FATAL: {msg}", file=sys.stderr)
            return -1
        print(f"WARNING: {msg}", file=sys.stderr)

    def run_one(tables: dict[str, DataFrame]) -> DataFrame | None:
        """Generate the element frame for one table-set (creates or
        modify-meta), mirroring the reference's per-table generate_changes."""
        if args.modify_meta:
            if "new_ways" not in tables:
                return None
            tables = dict(tables)
            tables["mod_ways"] = tables["new_ways"]
            return generate_modify_meta(
                spark, tables, hstore_col=args.hstore_tags
            )
        if not any(k in tables for k in ("new_ways", "new_points", "new_polygons", "deleted_ways")):
            return None
        return generate_changes(
            spark,
            tables,
            id_offset=args.id_offset,
            negative_ids=args.neg_id,
            self_intersections=args.self_intersections,
            node_limit=node_limit,
            key_col="__fkey",
            hstore_col=args.hstore_tags,
            check_collision=False,  # handled above with warn/fatal semantics
            emit_osm_id_tag=args.reference_bytes,
            split_joiner="duplicate_first" if args.reference_bytes else "shared",
        )

    names = source.discover(suffixes)
    if not names and not args.deletions:
        raise SystemExit(f"nothing to do: no tables matching *{suffixes} in {source.describe()} and no --deletions")

    ex_tables: dict[str, DataFrame] = {}
    for ex in _aslist(args.existing):
        df = source.load_geo(ex)
        ex_tables["original_ways"] = (
            ex_tables["original_ways"].unionByName(df, allowMissingColumns=True)
            if "original_ways" in ex_tables
            else df
        )

    wrote: list[str] = []
    if args.outdir:
        # reference mode: one {table}.osc per new-feature table
        # (changegen/__main__.py:232-251) + one per deletions table (:253-263)
        os.makedirs(args.outdir, exist_ok=True)
        for name in names:
            tables = {**load_new_parts(spark, source, [name]), **ex_tables, **extract}
            elements = run_one(tables)
            if elements is None:
                continue
            out = os.path.join(args.outdir, f"{name}.osc")
            counts = write_osmchange(elements, out, compress=args.compress)
            print(f"wrote {out}: {counts}", file=sys.stderr)
            wrote.append(out)
        for dl in _aslist(args.deletions):
            tables = {
                "deleted_ways": source.load_plain(dl),
                **extract,
            }
            elements = generate_deletions(spark, tables)
            out = os.path.join(args.outdir, f"{dl}.osc")
            counts = write_osmchange(elements, out, compress=args.compress)
            print(f"wrote {out}: {counts}", file=sys.stderr)
            wrote.append(out)
        if not wrote:
            raise SystemExit("nothing to do: no new tables, deletions, or modify_meta")
        return 0

    # merged single-file mode
    parts = []
    tables = {**load_new_parts(spark, source, names), **ex_tables, **extract}
    for dl in _aslist(args.deletions):
        df = source.load_plain(dl)
        tables["deleted_ways"] = (
            tables["deleted_ways"].unionByName(df, allowMissingColumns=True)
            if "deleted_ways" in tables
            else df
        )
    result = run_one(tables)
    if result is not None:
        parts.append(result)
    if not parts:
        raise SystemExit("nothing to do: no new tables, deletions, or modify_meta")

    elements = assemble_changeset(*parts)
    counts = write_osmchange(elements, args.output, compress=args.compress)
    print(f"wrote {args.output}: {counts}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
