"""Real-data parity contract: the reference's own golden counts, reproduced
end-to-end from its own fixture data.

The inputs are the reference repo's shipped test fixture — the conflate
database as a pg_dump custom archive (read natively by
``sources/pgdump.py``) and the OSM extract as a ``.pbf`` (read natively,
blob-parallel, by ``sources/pbf.py``). The five pinned values are the
reference's hand-verified goldens (``test/test_generator.py:101-230``):
10 create ways + 4 modify ways (new_ways × original_ways, self=True),
213 create nodes (new_points), 22 modify ways (mod_ways, modify_meta),
3 modify nodes (modified_points, modify_meta).

The oracle is a VALUES table of those goldens — this is deliberately a
*pinned* oracle, not a recomputation: the claim under test is agreement
with the reference's published expected output on its real data.
"""

from __future__ import annotations

from changegen_spark.sources.refdata import reference_golden_counts

QUERIES = {
    "q_reference_goldens": lambda spark, sf_dir: reference_golden_counts(spark),
}

ORACLES = {
    "q_reference_goldens": """
        SELECT * FROM (
            VALUES
                ('meta_modify', CAST(22 AS BIGINT)),
                ('points_create', CAST(213 AS BIGINT)),
                ('points_modify', CAST(3 AS BIGINT)),
                ('ways_create', CAST(10 AS BIGINT)),
                ('ways_modify', CAST(4 AS BIGINT))
        ) AS t(flow, value)
        ORDER BY flow
    """,
}
