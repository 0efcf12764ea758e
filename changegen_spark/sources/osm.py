"""OSM element schemas + deterministic changegen-parity fixtures.

Schemas mirror FIXTURES.md §6 (PBF as three DataFrames) and §1-§5 (the
PostGIS-derived tables).  The fixture synthesizer builds the geometric
layout from FIXTURES.md §8: cardinalities are fixed *by construction* so
golden-count tests are exact:

  * 6 ``original_ways``: horizontal lines (1 km spacing; half offset by
    250 m so crossings alternate vertex-hit / mid-segment insertion);
  * 4 ``new_ways``: vertical lines crossing all 6 → 24 junctions, half at
    existing vertices (x offsets alternate 0 / 500 m against the 1 km
    vertex grid);
  * 25 ``new_points`` / 3 ``modified_points`` with hstore tag strings;
  * 5 ``mod_ways`` with hstore tags + matching PBF ways;
  * 2 ``deleted_ways`` ids present in the PBF;
  * PBF nodes/ways consistent with every osm_id above.

All coordinates are EPSG:3857 inside the reference fixture bbox
(FIXTURES.md: lon −118.48..−117.92, lat 48.436..48.857).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

R = 6378137.0

PBF_NODES_SCHEMA = "id long, lat double, lon double, tags map<string,string>"
PBF_WAYS_SCHEMA = "id long, nds array<long>, tags map<string,string>"
PBF_RELATIONS_SCHEMA = (
    "id long, members array<struct<ref:long,type:string,role:string>>, "
    "tags map<string,string>"
)


def merc(lon: float, lat: float) -> tuple[float, float]:
    return (
        math.radians(lon) * R,
        R * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2)),
    )


def inv_merc(x: float, y: float) -> tuple[float, float]:
    return (
        math.degrees(x / R),
        math.degrees(2 * math.atan(math.exp(y / R)) - math.pi / 2),
    )


# Fixture origin: inside the reference bbox.
_X0, _Y0 = merc(-118.40, 48.50)

N_ORIGINAL_WAYS = 6
N_NEW_WAYS = 4
N_NEW_POINTS = 25
N_MODIFIED_POINTS = 3
N_MOD_WAYS = 5
N_DELETED_WAYS = 2
ORIGINAL_WAY_VERTICES = 11  # 10 segments × 1 km
NEW_WAY_VERTICES = 13  # 12 segments × 500 m


def _ring(coords):
    return [coords]


def _geom(gtype, rings):
    return {"gtype": gtype, "rings": [[{"x": x, "y": y} for (x, y) in r] for r in rings]}


def original_way_coords(i: int) -> list[tuple[float, float]]:
    """Horizontal line i at y = Y0 + i*1000 (+250 for odd i)."""
    y = _Y0 + i * 1000.0 + (250.0 if i % 2 else 0.0)
    return [(_X0 + j * 1000.0, y) for j in range(ORIGINAL_WAY_VERTICES)]


def new_way_coords(j: int) -> list[tuple[float, float]]:
    """Vertical line j at x = X0 + 2000 + j*1500, spanning all originals."""
    x = _X0 + 2000.0 + j * 1500.0
    return [(x, _Y0 - 500.0 + k * 500.0) for k in range(NEW_WAY_VERTICES)]


_FIXTURE_CACHE: dict[int, dict[str, DataFrame]] = {}


def fixture_tables(spark: SparkSession) -> dict[str, DataFrame]:
    """Build every fixture table as a DataFrame (memoized per session —
    several contract queries each need the full set)."""
    cached = _FIXTURE_CACHE.get(id(spark))
    if cached is not None:
        return dict(cached)
    tables = _build_fixture_tables(spark)
    _FIXTURE_CACHE[id(spark)] = tables
    return dict(tables)


def _build_fixture_tables(spark: SparkSession) -> dict[str, DataFrame]:
    from changegen_spark.geo.geometry import GEOMETRY

    geom_schema_part = GEOMETRY.simpleString().replace("struct<", "struct<", 1)

    # --- original_ways + matching PBF ways/nodes ---
    orig_rows, pbf_ways, pbf_nodes = [], [], []
    node_id = 10_000
    for i in range(N_ORIGINAL_WAYS):
        osm_id = 100 + i
        coords = original_way_coords(i)
        nds = []
        for (x, y) in coords:
            node_id += 1
            lon, lat = inv_merc(x, y)
            pbf_nodes.append((node_id, lat, lon, {}))
            nds.append(node_id)
        pbf_ways.append((osm_id, nds, {"highway": "path", "name": f"orig-{i}"}))
        orig_rows.append(
            (
                i + 1,
                osm_id,
                "path",
                f"orig-{i}",
                _geom("LineString", _ring(coords)),
            )
        )
    original_ways = spark.createDataFrame(
        orig_rows,
        f"id int, osm_id long, highway string, name string, geometry {geom_schema_part}",
    )

    # --- mod_ways (modify_meta path): same shape, hstore tags ---
    mod_rows = []
    for i in range(N_MOD_WAYS):
        osm_id = 200 + i
        coords = [(c[0], c[1] + 20_000.0 + i * 1000.0) for c in original_way_coords(0)]
        nds = []
        for (x, y) in coords:
            node_id += 1
            lon, lat = inv_merc(x, y)
            pbf_nodes.append((node_id, lat, lon, {}))
            nds.append(node_id)
        pbf_ways.append((osm_id, nds, {"highway": "track"}))
        mod_rows.append(
            (
                i + 1,
                osm_id,
                "footway",
                f"mod-{i}",
                f'"surface"=>"gravel", "sac_scale"=>"hiking", "name"=>"hstore-{i}"',
                100 + i,
                _geom("LineString", _ring(coords)),
            )
        )
    mod_ways = spark.createDataFrame(
        mod_rows,
        "id int, osm_id long, highway string, name string, tags string, "
        f"parent_osm_id long, geometry {geom_schema_part}",
    )

    # --- deleted_ways: ids present in PBF ---
    deleted_rows = []
    for i in range(N_DELETED_WAYS):
        osm_id = 300 + i
        coords = [(c[0], c[1] + 40_000.0 + i * 1000.0) for c in original_way_coords(0)]
        nds = []
        for (x, y) in coords:
            node_id += 1
            lon, lat = inv_merc(x, y)
            pbf_nodes.append((node_id, lat, lon, {}))
            nds.append(node_id)
        pbf_ways.append((osm_id, nds, {}))
        deleted_rows.append((osm_id,))
    deleted_ways = spark.createDataFrame(deleted_rows, "osm_id long")

    # --- new_ways (create path; no osm_id by design, FIXTURES.md §1) ---
    new_rows = [
        (
            "path",
            f"new-{j}",
            "yes",
            _geom("LineString", _ring(new_way_coords(j))),
        )
        for j in range(N_NEW_WAYS)
    ]
    new_ways = spark.createDataFrame(
        new_rows, f"highway string, name string, foot string, geometry {geom_schema_part}"
    )

    # --- new_points / modified_points ---
    pt_rows = []
    for i in range(N_NEW_POINTS):
        x = _X0 + 200.0 * i + 50.0
        y = _Y0 - 5_000.0 - 100.0 * i
        pt_rows.append(
            (
                i + 1,
                None,
                f"poi-{i}",
                1200 + i,
                f'"amenity"=>"shelter", "ref"=>"P{i}"',
                _geom("Point", _ring([(x, y)])),
            )
        )
    new_points = spark.createDataFrame(
        pt_rows,
        "id int, osm_id long, name string, ele_string int, tags string, "
        f"geom {geom_schema_part}",
    )

    mp_rows = []
    for i in range(N_MODIFIED_POINTS):
        osm_id = 900 + i
        x = _X0 + 300.0 * i
        y = _Y0 - 8_000.0 - 200.0 * i
        lon, lat = inv_merc(x, y)
        node_id += 1
        pbf_nodes.append((osm_id, lat, lon, {"name": f"old-poi-{i}"}))
        mp_rows.append(
            (
                i + 1,
                osm_id,
                f"poi-mod-{i}",
                1500 + i,
                f'"aerodrome"=>"no", "note"=>"modified {i}"',
                _geom("Point", _ring([(x, y)])),
            )
        )
    modified_points = spark.createDataFrame(
        mp_rows,
        "id int, osm_id long, name string, ele_string int, tags string, "
        f"geom {geom_schema_part}",
    )

    # --- new_polygons (polygon/relation path, SURVEY §3.1 step 4) ---
    def square(cx, cy, half):
        return [
            (cx - half, cy - half),
            (cx + half, cy - half),
            (cx + half, cy + half),
            (cx - half, cy + half),
            (cx - half, cy - half),
        ]

    poly_rows = [
        ("meadow", "simple-0", _geom("Polygon", [square(_X0 + 30_000, _Y0, 400)])),
        ("meadow", "simple-1", _geom("Polygon", [square(_X0 + 32_000, _Y0, 300)])),
        (
            "forest",
            "holed-0",
            _geom(
                "Polygon",
                [square(_X0 + 35_000, _Y0, 800), square(_X0 + 35_000, _Y0, 200)],
            ),
        ),
    ]
    new_polygons = spark.createDataFrame(
        poly_rows, f"landuse string, name string, geometry {geom_schema_part}"
    )

    return {
        "original_ways": original_ways,
        "new_ways": new_ways,
        "mod_ways": mod_ways,
        "deleted_ways": deleted_ways,
        "new_points": new_points,
        "modified_points": modified_points,
        "new_polygons": new_polygons,
        "pbf_nodes": spark.createDataFrame(pbf_nodes, PBF_NODES_SCHEMA),
        "pbf_ways": spark.createDataFrame(pbf_ways, PBF_WAYS_SCHEMA),
        "pbf_relations": spark.createDataFrame([], PBF_RELATIONS_SCHEMA),
    }


def max_pbf_ids(tables: dict[str, DataFrame]) -> dict[str, int]:
    """A4/S8: max element ids of the extract (changegen/__main__.py:26-53).

    The three per-kind maxes run as ONE Spark job (union of aggs) — three
    separate .first() calls each paid full job overhead (~2 s apiece in a
    fresh session, measured)."""
    from functools import reduce

    from pyspark.sql import functions as F

    out = {"node": 0, "way": 0, "relation": 0}
    parts = [
        tables[name]
        .agg(F.max("id").alias("m"))
        .select(F.lit(kind).alias("kind"), "m")
        for kind, name in (
            ("node", "pbf_nodes"),
            ("way", "pbf_ways"),
            ("relation", "pbf_relations"),
        )
        if name in tables
    ]
    if parts:
        for r in reduce(lambda a, b: a.unionByName(b), parts).collect():
            out[r["kind"]] = r["m"] if r["m"] is not None else 0
    return out
