"""Changeset application — the consuming side of the CDC loop.

``generate_changes`` produces a diff; ``apply_changeset`` folds it back
into the snapshot tables (the role OSM's own updaters play for .osc
files).  With the reader (``sources/osc.py``) this closes the full cycle:
    snapshot → generate → .osc → read → apply → snapshot'

Semantics per element kind:
  * create → insert (id must not collide — caller guarantees via C6);
  * modify → full-row replace by id (version carried);
  * delete → remove by id.

Application is NOT idempotent for creates (same as OSM's own apply):
re-applying a changeset duplicates created rows.  The C6 id-collision
guard exists precisely so a generated changeset can't be double-applied
silently — the second run's ids already exist.

Scale shape: one hash-partitioned anti-join (drop modified/deleted ids)
plus a union per table — the standard upsert/merge plan; at warehouse
scale this is exactly what MERGE INTO compiles to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _upsert(
    base: DataFrame, changes: DataFrame, payload: list[str]
) -> DataFrame:
    """base rows minus (modified ∪ deleted) ids, plus created ∪ modified rows."""
    gone = changes.filter(
        F.col("change_type").isin("modify", "delete")
    ).select("id")
    incoming = changes.filter(
        F.col("change_type").isin("create", "modify")
    ).select("id", *payload)
    return base.join(gone, "id", "left_anti").unionByName(incoming)


def apply_changeset(
    pbf_nodes: DataFrame,
    pbf_ways: DataFrame,
    changeset: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Apply an element changeset to (nodes, ways) snapshot tables.

    Returns the updated (nodes, ways).  Relations pass through unchanged
    snapshots for now (the reference never modifies relations either —
    it only creates them, changegen/generator.py:732-741).
    """
    node_changes = changeset.filter(F.col("kind") == "node").select(
        "change_type",
        "id",
        "lat",
        "lon",
        F.coalesce(F.col("tags"), F.create_map().cast("map<string,string>")).alias("tags"),
    )
    nodes = _upsert(
        pbf_nodes.select("id", "lat", "lon", "tags"),
        node_changes,
        ["lat", "lon", "tags"],
    )

    way_changes = changeset.filter(F.col("kind") == "way").select(
        "change_type",
        "id",
        "nds",
        F.coalesce(F.col("tags"), F.create_map().cast("map<string,string>")).alias("tags"),
    )
    ways = _upsert(
        pbf_ways.select("id", "nds", "tags"),
        way_changes,
        ["nds", "tags"],
    )
    return nodes, ways


def referential_integrity_report(nodes: DataFrame, ways: DataFrame) -> DataFrame:
    """Post-apply audit: way node refs that resolve to no node.

    The changefile format does NOT enforce referential integrity
    (changewriter.py:171-173); after application the snapshot must.  Empty
    result = consistent."""
    refs = ways.select(F.col("id").alias("way_id"), F.explode("nds").alias("ref"))
    return refs.join(nodes.select(F.col("id").alias("ref")), "ref", "left_anti")
