"""M6 determinism audit (SURVEY §7): two independent full-pipeline runs
must produce byte-identical changefiles — id assignment, junction dedup,
ordered reassembly, and the sink sort must all be shuffle-order-proof."""

import pytest

import os


@pytest.mark.slow
def test_pipeline_runs_are_byte_identical(spark, tmp_path):
    from changegen_spark.pipeline import generate_changes
    from changegen_spark.sinks.oscxml import write_osmchange
    from changegen_spark.sources.osm import fixture_tables

    paths = []
    for i in range(2):
        tables = fixture_tables(spark)  # rebuilt from scratch each run
        cset = generate_changes(spark, tables, id_offset=20_000)
        # vary partitioning between runs to shake out order dependence
        cset = cset.repartition(3 + i * 4)
        p = os.path.join(tmp_path, f"run{i}.osc")
        write_osmchange(cset, p)
        paths.append(p)
    a, b = (open(p).read() for p in paths)
    assert a == b
