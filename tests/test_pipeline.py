"""End-to-end changegen-parity tests, golden-count style (mirrors the
reference's test strategy: exact element-count assertions on the output
changefile, test/test_generator.py:94-230 — but with counts fixed by fixture
construction per FIXTURES.md §8)."""

import gzip
import os
import xml.etree.ElementTree as ET

import pytest
from pyspark.sql import functions as F

# Fixture-derived goldens (see changegen_spark/sources/osm.py docstring):
N_JUNCTIONS = 24          # 4 new ways × 6 original ways, all crossings distinct
N_VERTEX_NODES = 40       # 4×13 vertices − 12 junction-coincident ones
N_POINT_NODES = 25
N_POLY_NODES = 16         # 4 rings × 4 corners
GOLDEN_CREATE_NODES = N_JUNCTIONS + N_VERTEX_NODES + N_POINT_NODES + N_POLY_NODES
GOLDEN_CREATE_WAYS = 4 + 4  # new_ways + polygon rings
GOLDEN_CREATE_RELATIONS = 1
GOLDEN_MODIFY_WAYS = 6
GOLDEN_DELETE_WAYS = 2
ID_OFFSET = 20_000


@pytest.fixture(scope="module")
def tables(spark):
    from changegen_spark.sources.osm import fixture_tables

    return fixture_tables(spark)


@pytest.fixture(scope="module")
def changeset(spark, tables):
    from changegen_spark.pipeline import generate_changes

    return generate_changes(spark, tables, id_offset=ID_OFFSET).cache()


def _counts(df):
    return {
        (r["change_type"], r["kind"]): r["n"]
        for r in df.groupBy("change_type", "kind").agg(F.count("*").alias("n")).collect()
    }


@pytest.mark.slow
def test_golden_counts(changeset):
    c = _counts(changeset)
    assert c[("create", "node")] == GOLDEN_CREATE_NODES
    assert c[("create", "way")] == GOLDEN_CREATE_WAYS
    assert c[("create", "relation")] == GOLDEN_CREATE_RELATIONS
    assert c[("modify", "way")] == GOLDEN_MODIFY_WAYS
    assert c[("delete", "way")] == GOLDEN_DELETE_WAYS


def test_ids_unique_dense_and_collision_free(changeset):
    new_ids = sorted(
        r["id"] for r in changeset.filter(F.col("change_type") == "create").collect()
    )
    n = len(new_ids)
    assert new_ids == list(range(ID_OFFSET + 1, ID_OFFSET + 1 + n))


@pytest.mark.slow
def test_junction_nodes_shared_between_new_and_modified_ways(changeset):
    """The topological heart of changegen: every junction node id appears in
    ≥1 created way AND ≥1 modified way (node-sharing sanity check analog,
    generator.py:870-871)."""
    ways = changeset.filter(F.col("kind") == "way").select(
        "change_type", "id", F.explode("nds").alias("ref")
    )
    created_node_ids = {
        r["id"]
        for r in changeset.filter(
            (F.col("kind") == "node") & (F.col("change_type") == "create")
        ).collect()
    }
    in_create = {
        r["ref"] for r in ways.filter(F.col("change_type") == "create").collect()
    }
    in_modify = {
        r["ref"] for r in ways.filter(F.col("change_type") == "modify").collect()
    }
    shared = in_create & in_modify
    assert len(shared) == N_JUNCTIONS
    assert shared <= created_node_ids


def test_modified_way_structure(changeset, tables):
    """Each modified way keeps its 11 PBF nodes except 2 junction-replaced
    vertices, plus 2 inserted junctions → 13 nds, order preserved."""
    pbf = {r["id"]: r["nds"] for r in tables["pbf_ways"].collect()}
    mods = changeset.filter(
        (F.col("kind") == "way") & (F.col("change_type") == "modify")
    ).collect()
    assert len(mods) == 6
    for row in mods:
        orig = pbf[row["id"]]
        nds = row["nds"]
        assert len(nds) == 13
        kept = [n for n in nds if n in set(orig)]
        assert len(kept) == 9  # 11 − 2 replaced
        # order of surviving original nodes is preserved
        assert kept == [n for n in orig if n in set(kept)]
        junctions = [n for n in nds if n not in set(orig)]
        assert len(junctions) == 4
        assert all(n > ID_OFFSET for n in junctions)


def test_new_way_references_resolve(changeset):
    """Every nd ref of a created way is a created node (self-contained
    changefile for the create block)."""
    created_nodes = {
        r["id"]
        for r in changeset.filter(
            (F.col("kind") == "node") & (F.col("change_type") == "create")
        ).collect()
    }
    refs = {
        r["ref"]
        for r in changeset.filter(
            (F.col("kind") == "way") & (F.col("change_type") == "create")
        )
        .select(F.explode("nds").alias("ref"))
        .collect()
    }
    assert refs <= created_nodes


def test_relation_structure(changeset):
    rels = changeset.filter(F.col("kind") == "relation").collect()
    assert len(rels) == 1
    r = rels[0]
    assert r["tags"]["type"] == "multipolygon"
    assert r["tags"]["landuse"] == "forest"
    roles = [m["role"] for m in r["members"]]
    assert roles == ["outer", "inner"]


def test_way_tags_carry_attributes(changeset):
    w = changeset.filter(
        (F.col("kind") == "way")
        & (F.col("change_type") == "create")
        & F.col("tags").getItem("name").isNotNull()
        & (F.col("tags").getItem("name") == "new-0")
    ).collect()
    assert len(w) == 1
    assert w[0]["tags"]["highway"] == "path"
    assert w[0]["tags"]["foot"] == "yes"


def test_xml_sink_roundtrip(changeset, tmp_path):
    from changegen_spark.sinks.oscxml import write_osmchange

    out = os.path.join(tmp_path, "out.osc")
    counts = write_osmchange(changeset, out)
    tree = ET.parse(out)
    root = tree.getroot()
    assert root.tag == "osmChange"
    assert [c.tag for c in root] == ["create", "modify", "delete"]
    assert len(root.findall("./create/node")) == GOLDEN_CREATE_NODES
    assert len(root.findall("./create/way")) == GOLDEN_CREATE_WAYS
    assert len(root.findall("./create/relation")) == GOLDEN_CREATE_RELATIONS
    assert len(root.findall("./modify/way")) == GOLDEN_MODIFY_WAYS
    assert len(root.findall("./delete/way")) == GOLDEN_DELETE_WAYS
    assert counts["create"] == GOLDEN_CREATE_NODES + GOLDEN_CREATE_WAYS + 1
    # nested children present
    away = root.find("./create/way")
    assert away.find("nd") is not None
    anode = root.find("./modify/way")
    assert anode.attrib["version"] == "2"


def test_xml_sink_gzip(changeset, tmp_path):
    from changegen_spark.sinks.oscxml import write_osmchange

    out = os.path.join(tmp_path, "out.osc.gz")
    write_osmchange(changeset.limit(5), out, compress=True)
    with gzip.open(out, "rt") as f:
        content = f.read()
    assert content.startswith("<?xml")
    assert "</osmChange>" in content


@pytest.mark.slow
def test_way_splitting_end_to_end(spark, tables):
    """Low node_limit forces W3 splitting inside the full pipeline: chunk
    ways share boundary nodes and cover all members."""
    from changegen_spark.pipeline import generate_changes

    cset = generate_changes(
        spark, tables, id_offset=ID_OFFSET, node_limit=10, chunk_size=6
    )
    new_ways = (
        cset.filter((F.col("kind") == "way") & (F.col("change_type") == "create"))
        .filter(F.col("tags").getItem("highway").isNotNull())
        .collect()
    )
    # 4 new ways × 16 members (13 vertices + 3 inserted junctions) → 3 chunks
    # each (polygon ring ways carry landuse, not highway → filtered out)
    line_ways = [w for w in new_ways if w["tags"].get("highway") == "path" and "name" in w["tags"] and w["tags"]["name"].startswith("new-")]
    assert len(line_ways) == 12
    by_name: dict[str, list] = {}
    for w in line_ways:
        by_name.setdefault(w["tags"]["name"], []).append(w["nds"])
    for chunks in by_name.values():
        chunks.sort(key=lambda nds: nds[0] if False else 0)
        assert len(chunks) == 3


def test_modify_meta_flow(spark, tables):
    from changegen_spark.pipeline import generate_modify_meta

    out = generate_modify_meta(spark, tables).collect()
    assert len(out) == 5  # N_MOD_WAYS
    pbf = {r["id"]: r["nds"] for r in tables["pbf_ways"].collect()}
    for row in out:
        assert row["version"] == 2
        assert row["nds"] == pbf[row["id"]]  # node lists reused from extract
        assert row["tags"]["surface"] == "gravel"  # hstore merged
        assert row["tags"]["highway"] == "footway"  # column kept
        assert "osm_id" not in row["tags"]


def test_modify_points_flow(spark, tables):
    from changegen_spark.pipeline import generate_modify_points

    out = generate_modify_points(spark, tables).collect()
    assert len(out) == 3
    for row in out:
        assert row["version"] == 2
        assert 900 <= row["id"] <= 902
        assert row["tags"]["aerodrome"] == "no"


def test_deletions_with_node_expansion(spark, tables):
    from changegen_spark.pipeline import generate_deletions

    out = generate_deletions(spark, tables, skip_nodes=False)
    c = _counts(out)
    assert c[("delete", "way")] == 2
    assert c[("delete", "node")] == 22  # 2 ways × 11 distinct nodes


def test_collision_abort_restores_session_state(spark, tables):
    """The collision guard's fail-fast abort must not leak the pipeline's
    scoped planning conf (whole-stage codegen off for small inputs) or
    leave pool threads running — r3 regression guard for the overlapped
    head's try/finally."""
    import pytest as _pytest

    from changegen_spark.pipeline import generate_changes

    prev = spark.conf.get("spark.sql.codegen.wholeStage")
    with _pytest.raises(ValueError, match="collide"):
        generate_changes(spark, tables, id_offset=0)  # max pbf id > 0
    assert spark.conf.get("spark.sql.codegen.wholeStage") == prev


@pytest.mark.slow
def test_emit_osm_id_tag_reference_compat(spark, tables):
    """emit_osm_id_tag=True re-emits the source osm_id as a tag on modified
    intersecting ways (the reference's actual modify-path output,
    generator.py:812-813); default run excludes it."""
    from changegen_spark.pipeline import generate_changes

    cs = generate_changes(
        spark, tables, id_offset=ID_OFFSET, emit_osm_id_tag=True
    )
    mods = cs.filter(
        (F.col("kind") == "way") & (F.col("change_type") == "modify")
    ).collect()
    assert len(mods) == GOLDEN_MODIFY_WAYS
    for r in mods:
        # a modified way's element id IS the original osm_id
        assert r["tags"].get("osm_id") == str(r["id"])
