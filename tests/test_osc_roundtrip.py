"""Sink ↔ source round trip: read(write(changeset)) must equal the
changeset exactly (modulo the sink's canonicalizations: empty→null
collections, 9-dp coordinates)."""

import pytest

import os

from pyspark.sql import functions as F


def _canon(df):
    """Canonical comparable rows."""
    return sorted(
        (
            r["change_type"],
            r["kind"],
            r["id"],
            r["version"],
            None if r["lat"] is None else round(r["lat"], 9),
            None if r["lon"] is None else round(r["lon"], 9),
            tuple(r["nds"] or []),
            tuple((m["ref"], m["type"], m["role"]) for m in (r["members"] or [])),
            tuple(sorted((r["tags"] or {}).items())),
        )
        for r in df.collect()
    )


@pytest.mark.slow
def test_osc_write_read_roundtrip(spark, tmp_path):
    from changegen_spark.pipeline import generate_changes
    from changegen_spark.sinks.oscxml import write_osmchange
    from changegen_spark.sources.osc import read_osmchange
    from changegen_spark.sources.osm import fixture_tables

    cset = generate_changes(
        spark, fixture_tables(spark), id_offset=20_000
    ).localCheckpoint(eager=True)
    path = os.path.join(tmp_path, "rt.osc")
    write_osmchange(cset, path)
    back = read_osmchange(spark, path)

    # delete nodes get lat/lon 0 placeholders in the file; normalize the
    # original the same way before comparing
    norm = cset.withColumn(
        "lat",
        F.when((F.col("kind") == "node") & F.col("lat").isNull(), 0.0).otherwise(F.col("lat")),
    ).withColumn(
        "lon",
        F.when((F.col("kind") == "node") & F.col("lon").isNull(), 0.0).otherwise(F.col("lon")),
    )
    assert _canon(back) == _canon(norm)


def test_osc_gzip_roundtrip(spark, tmp_path):
    from changegen_spark.pipeline import generate_deletions
    from changegen_spark.sinks.oscxml import write_osmchange
    from changegen_spark.sources.osc import read_osmchange
    from changegen_spark.sources.osm import fixture_tables

    dels = generate_deletions(spark, fixture_tables(spark), skip_nodes=False)
    path = os.path.join(tmp_path, "rt.osc.gz")
    write_osmchange(dels, path, compress=True)
    back = read_osmchange(spark, path)
    assert back.count() == dels.count()
    assert {r["version"] for r in back.collect()} == {99}
