"""CLI surface test: parquet DB dir + extract dir → .osc, via the real
``python -m changegen_spark`` entry (invoked in-process for session reuse)."""

import os
import xml.etree.ElementTree as ET

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def cli_dirs(spark, tmp_path_factory):
    """Export the geometry fixtures as WKT-parquet, the CLI's input format."""
    from changegen_spark.geo.geometry import wkt
    from changegen_spark.sources.osm import fixture_tables

    tables = fixture_tables(spark)
    db = str(tmp_path_factory.mktemp("db"))
    ext = str(tmp_path_factory.mktemp("extract"))

    def export(name, df, geom_col):
        out = df.withColumn(geom_col, wkt(F.col(geom_col)))
        out.coalesce(1).write.mode("overwrite").parquet(os.path.join(db, f"{name}.parquet"))

    export("trails_new", tables["new_ways"], "geometry")
    export("pois_new", tables["new_points"], "geom")
    export("original_ways", tables["original_ways"], "geometry")
    tables["deleted_ways"].coalesce(1).write.mode("overwrite").parquet(
        os.path.join(db, "deleted_ways.parquet")
    )
    for name in ("nodes", "ways", "relations"):
        tables[f"pbf_{name}"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(ext, f"{name}.parquet")
        )
    return db, ext


def test_cli_end_to_end(cli_dirs, tmp_path):
    from changegen_spark.__main__ import main

    db, ext = cli_dirs
    out = os.path.join(tmp_path, "changes.osc")
    rc = main(
        [
            db,
            "--osmsrc", ext,
            "--output", out,
            "--suffix", "_new",
            "--existing", "original_ways",
            "--deletions", "deleted_ways",
            "--id_offset", "20000",
        ]
    )
    assert rc == 0
    root = ET.parse(out).getroot()
    # same goldens as the API run, minus polygons (not exported here):
    # 24 junctions + 40 way vertices + 25 POIs = 89 create nodes
    assert len(root.findall("./create/node")) == 89
    assert len(root.findall("./create/way")) == 4
    assert len(root.findall("./modify/way")) == 6
    assert len(root.findall("./delete/way")) == 2
    # tags survived the WKT round-trip and suffix discovery
    names = {
        t.attrib["v"]
        for w in root.findall("./create/way")
        for t in w.findall("tag")
        if t.attrib["k"] == "name"
    }
    assert names == {"new-0", "new-1", "new-2", "new-3"}


def test_cli_rejects_multi_geometries(spark, tmp_path):
    from changegen_spark.__main__ import _split_by_gtype
    from changegen_spark.geo.geometry import GEOMETRY

    df = spark.createDataFrame(
        [({"gtype": "MultiLineString", "rings": [[{"x": 0.0, "y": 0.0}]]},)],
        f"geometry {GEOMETRY.simpleString()}",
    )
    with pytest.raises(ValueError, match="Multi"):
        _split_by_gtype(df, "geometry")
