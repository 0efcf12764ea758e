"""Real-data parity: the reference's own fixture data through this engine's
native readers + pipeline, pinned to the reference's own goldens
(``test/test_generator.py:101-230``)."""

import pytest
from pyspark.sql import functions as F

DUMP = "/root/reference/test/data/dbdump.tar"
PBF = "/root/reference/test/data/osmdata.osm.pbf"


def test_pgdump_reader_tables():
    """pg_dump custom-archive reader: TOC + COPY decode."""
    from changegen_spark.sources.pgdump import PgDumpArchive

    a = PgDumpArchive(DUMP)
    assert a.version == (1, 13)
    counts = {t.tag: len(a.read_table(t.tag)[1]) for t in a.table_data_entries()}
    assert counts == {
        "deleted_ways": 10,
        "mod_ways": 22,
        "modified_points": 3,
        "new_points": 213,
        "new_ways": 10,
        "original_ways": 2082,
    }


def test_pgdump_ewkb_decode():
    from changegen_spark.sources.pgdump import PgDumpArchive, decode_ewkb

    a = PgDumpArchive(DUMP)
    cols, rows = a.read_table("new_ways")
    w = decode_ewkb(rows[0][cols.index("geometry")])
    assert w.startswith("LINESTRING (")
    # EPSG:3857 web-mercator magnitudes (reference db is 3857)
    x = float(w.split("(")[1].split()[0])
    assert -20037508 < x < 20037508


def test_pbf_reader_spark_counts(spark):
    """Blob-parallel Spark decode matches the extract's element counts and
    id ranges; schema identical to a pre-ingested parquet extract."""
    from changegen_spark.sources.osm import (
        PBF_NODES_SCHEMA,
        PBF_RELATIONS_SCHEMA,
        PBF_WAYS_SCHEMA,
        max_pbf_ids,
    )
    from changegen_spark.sources.pbf import read_pbf_tables

    t = read_pbf_tables(spark, PBF)
    assert t["pbf_nodes"].count() == 81154
    assert t["pbf_ways"].count() == 2953
    assert t["pbf_relations"].count() == 30
    # simpleString: type shape parity (nullability flags differ on built
    # expressions, irrelevant for the parquet/union consumers)
    for kind, schema in (
        ("pbf_nodes", PBF_NODES_SCHEMA),
        ("pbf_ways", PBF_WAYS_SCHEMA),
        ("pbf_relations", PBF_RELATIONS_SCHEMA),
    ):
        assert (
            t[kind].schema.simpleString()
            == spark.createDataFrame([], schema).schema.simpleString()
        )
    assert max_pbf_ids(t) == {
        "node": 9127760345,
        "way": 973217844,
        "relation": 13091234,
    }


def test_pbf_tags_and_refs(spark):
    """Spot-check decoded content: a tagged way with its node refs joining
    to decoded nodes."""
    from changegen_spark.sources.pbf import read_pbf_tables

    t = read_pbf_tables(spark, PBF)
    way = (
        t["pbf_ways"].filter(F.col("id") == 5878084).select("nds", "tags").first()
    )
    assert way["tags"]["name"] == "Onion Ridge Road"
    assert way["nds"][0] == 47673411
    node = t["pbf_nodes"].filter(F.col("id") == 47673411).first()
    assert abs(node["lat"] - 48.501417) < 1e-6
    assert abs(node["lon"] - -118.421129) < 1e-6


def test_pbf_driver_spark_parity(spark):
    """The pure-Python single-process decode and the blob-parallel Spark
    decode agree (same elements, same tag payloads)."""
    from changegen_spark.sources.pbf import iter_pbf_elements, read_pbf_tables

    drv_ways = {
        el[1]: (tuple(el[4]), tuple(zip(el[8], el[9])))
        for el in iter_pbf_elements(PBF)
        if el[0] == "way"
    }
    spk = read_pbf_tables(spark, PBF)["pbf_ways"].collect()
    assert len(spk) == len(drv_ways)
    for row in spk[:200]:
        nds, tags = drv_ways[row["id"]]
        assert tuple(row["nds"]) == nds
        assert dict(tags) == dict(row["tags"])


@pytest.mark.slow
def test_reference_goldens(spark):
    """THE parity pin: all five reference goldens from the real fixture."""
    from changegen_spark.sources.refdata import reference_golden_counts

    got = {r["flow"]: r["value"] for r in reference_golden_counts(spark).collect()}
    assert got == {
        "ways_create": 10,
        "ways_modify": 4,
        "points_create": 213,
        "meta_modify": 22,
        "points_modify": 3,
    }


def test_insertion_index_reference_geojson(spark):
    """test_generator.py:232-252: insertion index 5 for the fixture line and
    probe point (-13176331.8, 6216657.1)."""
    from changegen_spark.operators.ways import insertion_index
    from changegen_spark.sources.geojson import read_feature_collection

    line = read_feature_collection(
        spark, "/root/reference/test/data/test_line_3857.geojson"
    )
    verts = line.select(
        F.lit(1).alias("way_id"),
        F.posexplode(F.col("geometry.rings")[0]).alias("pos", "pt"),
    ).select(
        "way_id",
        "pos",
        F.col("pt.x").alias("x"),
        F.col("pt.y").alias("y"),
        F.lit(-13176331.8).alias("px"),
        F.lit(6216657.1).alias("py"),
    )
    out = insertion_index(verts, ["way_id"], "px", "py").collect()
    assert len(out) == 1
    assert out[0]["insert_idx"] == 5
