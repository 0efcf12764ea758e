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
    pbf_relations: DataFrame | None = None,
    prune_dangling_members: bool = False,
):
    """Apply an element changeset to snapshot tables.

    Returns (nodes, ways) — or (nodes, ways, relations) when a
    ``pbf_relations`` snapshot is passed.  Relation create/modify/delete
    follow the same upsert semantics as nodes/ways (beyond-parity surface:
    the reference only creates relations, changegen/generator.py:732-741).

    ``prune_dangling_members=True`` makes the apply member-aware: members
    whose (type, ref) target is deleted BY THIS CHANGESET are dropped from
    every surviving relation (member order preserved).  OSM's own .osc
    apply leaves such refs dangling; the prune option trades strictness
    for a consistent post-apply snapshot, and
    :func:`relation_integrity_report` audits whichever you choose.
    """
    def col_or_null(name: str, dtype: str):
        # partial changesets (e.g. relation-only) legitimately omit columns
        if name in changeset.columns:
            return F.col(name).cast(dtype)
        return F.lit(None).cast(dtype)

    node_changes = changeset.filter(F.col("kind") == "node").select(
        "change_type",
        "id",
        col_or_null("lat", "double").alias("lat"),
        col_or_null("lon", "double").alias("lon"),
        F.coalesce(col_or_null("tags", "map<string,string>"), F.create_map().cast("map<string,string>")).alias("tags"),
    )
    nodes = _upsert(
        pbf_nodes.select("id", "lat", "lon", "tags"),
        node_changes,
        ["lat", "lon", "tags"],
    )

    way_changes = changeset.filter(F.col("kind") == "way").select(
        "change_type",
        "id",
        col_or_null("nds", "array<bigint>").alias("nds"),
        F.coalesce(col_or_null("tags", "map<string,string>"), F.create_map().cast("map<string,string>")).alias("tags"),
    )
    ways = _upsert(
        pbf_ways.select("id", "nds", "tags"),
        way_changes,
        ["nds", "tags"],
    )
    if pbf_relations is None:
        return nodes, ways

    member_t = "array<struct<ref:bigint,type:string,role:string>>"
    rel_changes = changeset.filter(F.col("kind") == "relation").select(
        "change_type",
        "id",
        F.coalesce(col_or_null("members", member_t), F.array().cast(member_t)).alias("members"),
        F.coalesce(col_or_null("tags", "map<string,string>"), F.create_map().cast("map<string,string>")).alias("tags"),
    )
    relations = _upsert(
        pbf_relations.select("id", F.col("members").cast(member_t).alias("members"), "tags"),
        rel_changes,
        ["members", "tags"],
    )
    if prune_dangling_members:
        gone = changeset.filter(F.col("change_type") == "delete").select(
            F.col("kind").alias("__mtype"), F.col("id").alias("__mref")
        )
        mem = relations.select(
            "id", F.posexplode_outer("members").alias("pos", "m")
        )
        kept = mem.join(
            gone,
            (F.col("m.type") == F.col("__mtype")) & (F.col("m.ref") == F.col("__mref")),
            "left_anti",
        ).filter(F.col("m").isNotNull())
        rebuilt = kept.groupBy("id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s.getField("m"),
            ).alias("members")
        )
        relations = (
            relations.drop("members")
            .join(rebuilt, "id", "left")
            .withColumn("members", F.coalesce(F.col("members"), F.array().cast(member_t)))
            .select("id", "members", "tags")
        )
    return nodes, ways, relations


def referential_integrity_report(nodes: DataFrame, ways: DataFrame) -> DataFrame:
    """Post-apply audit: way node refs that resolve to no node.

    The changefile format does NOT enforce referential integrity
    (changewriter.py:171-173); after application the snapshot must.  Empty
    result = consistent."""
    refs = ways.select(F.col("id").alias("way_id"), F.explode("nds").alias("ref"))
    return refs.join(nodes.select(F.col("id").alias("ref")), "ref", "left_anti")


def relation_integrity_report(
    nodes: DataFrame, ways: DataFrame, relations: DataFrame
) -> DataFrame:
    """Post-apply audit for relations: members whose (type, ref) target
    does not exist in the corresponding snapshot table.

    Output: (rel_id, mtype, ref) per violation; empty = consistent.  Three
    anti-joins (one per member type), each hash-partitioned on the ref —
    the same scale shape as the way audit."""
    mem = relations.select(
        F.col("id").alias("rel_id"),
        F.explode("members").alias("m"),
    ).select(
        "rel_id", F.col("m.type").alias("mtype"), F.col("m.ref").alias("ref")
    )
    out = []
    for mtype, target in (("node", nodes), ("way", ways), ("relation", relations)):
        out.append(
            mem.filter(F.col("mtype") == mtype).join(
                target.select(F.col("id").alias("ref")), "ref", "left_anti"
            )
        )
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), out)
