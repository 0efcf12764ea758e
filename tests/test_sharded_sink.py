"""Sharded (executor-side) XML sink must be byte-identical to the
driver-side streaming sink."""

import pytest

import os


@pytest.mark.slow
def test_sharded_sink_byte_identical(spark, tmp_path):
    from changegen_spark.sinks.oscxml import write_osmchange, write_osmchange_sharded
    from changegen_spark.sources.osm import fixture_tables
    from changegen_spark.pipeline import generate_changes

    cset = generate_changes(
        spark, fixture_tables(spark), id_offset=20_000
    ).localCheckpoint(eager=True)

    a = os.path.join(tmp_path, "driver.osc")
    b = os.path.join(tmp_path, "sharded.osc")
    ca = write_osmchange(cset, a)
    cb = write_osmchange_sharded(cset, b, shards_per_block=4)
    assert ca == cb
    assert open(a).read() == open(b).read()
