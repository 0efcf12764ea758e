"""Full CDC cycle: snapshot → generate → write → read → apply → snapshot',
with referential integrity verified on the result."""

import os

from pyspark.sql import functions as F


def test_full_cdc_cycle(spark, tmp_path):
    from changegen_spark.operators.apply import (
        apply_changeset,
        referential_integrity_report,
    )
    from changegen_spark.pipeline import generate_changes
    from changegen_spark.sinks.oscxml import write_osmchange
    from changegen_spark.sources.osc import read_osmchange
    from changegen_spark.sources.osm import fixture_tables

    tables = fixture_tables(spark)
    cset = generate_changes(spark, tables, id_offset=20_000)
    path = os.path.join(tmp_path, "cycle.osc")
    write_osmchange(cset, path)
    applied = read_osmchange(spark, path)

    nodes2, ways2 = apply_changeset(
        tables["pbf_nodes"], tables["pbf_ways"], applied
    )
    nodes2 = nodes2.cache()
    ways2 = ways2.cache()

    n_nodes0 = tables["pbf_nodes"].count()
    n_ways0 = tables["pbf_ways"].count()
    # nodes: +105 created, none deleted
    assert nodes2.count() == n_nodes0 + 105
    # ways: +8 created, −2 deleted, 6 replaced in place
    assert ways2.count() == n_ways0 + 8 - 2
    # deleted ways gone
    deleted = {r["osm_id"] for r in tables["deleted_ways"].collect()}
    assert ways2.filter(F.col("id").isin(list(deleted))).count() == 0
    # modified ways now reference junction nodes (> id_offset)
    mod_ids = [
        r["id"] for r in cset.filter("kind='way' and change_type='modify'").collect()
    ]
    refs = (
        ways2.filter(F.col("id").isin(mod_ids))
        .select(F.explode("nds").alias("ref"))
        .filter(F.col("ref") > 20_000)
        .count()
    )
    assert refs == 6 * 4  # 4 junctions woven into each of 6 ways

    # the applied snapshot is referentially closed (deletions in the fixture
    # skip node expansion, so no dangling refs are introduced)
    dangling = referential_integrity_report(nodes2, ways2)
    assert dangling.count() == 0
