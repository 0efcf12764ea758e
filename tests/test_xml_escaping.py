"""Sink robustness: XML special characters in tags must be escaped and
survive a parse round-trip (F13 formatting layer)."""

import os
import xml.etree.ElementTree as ET


def test_xml_escaping_roundtrip(spark, tmp_path):
    from changegen_spark.sinks.oscxml import write_osmchange

    nasty = {
        "name": 'Joe\'s "Diner" <best & worst>',
        "note": "line1\nline2",
        "k<>&": "v<>&\"'",
    }
    df = spark.createDataFrame(
        [("create", "node", 1, 1, 48.5, -118.2, None, None, nasty)],
        "change_type string, kind string, id long, version int, lat double, "
        "lon double, nds array<long>, members array<struct<ref:long,type:string,role:string>>, "
        "tags map<string,string>",
    )
    out = os.path.join(tmp_path, "esc.osc")
    write_osmchange(df, out)
    node = ET.parse(out).getroot().find("./create/node")
    got = {t.attrib["k"]: t.attrib["v"] for t in node.findall("tag")}
    assert got == nasty  # parser round-trip proves escaping correctness


def test_wkt_roundtrip(spark):
    from pyspark.sql import functions as F

    from changegen_spark.geo.geometry import parse_wkt, wkt

    cases = [
        "POINT (1.5 -2.25)",
        "LINESTRING (0.0 0.0, 1.0 1.0, 2.5 -3.125)",
        "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 0.0), (1.0 1.0, 2.0 1.0, 1.0 2.0, 1.0 1.0))",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "w string")
    rt = df.select(wkt(parse_wkt(F.col("w"))).alias("rt")).collect()
    assert [r["rt"] for r in rt] == cases
