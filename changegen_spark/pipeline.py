"""End-to-end changegen pipeline (SURVEY §3.1-§3.3), Spark-first.

The reference's ``generate_changes`` (``changegen/generator.py:496-873``) is
a row-at-a-time loop; here every stage is a whole-DataFrame transform:

  A. junction synthesis — segment grid join (J1/J3) + 6-dp grid dedup (A3)
  B. new-way construction — vertex explode, junction vertex-reuse (J4) or
     fractional insertion (W2/M2), way splitting (W3)
  C. modify intersecting existing ways — PBF node-list join (J5), junction
     replace/insert, version 2 (C2)
  D. point create/modify paths (C1/C2) with tag projection (P1/P2)
  E. polygon paths — closed ways, multipolygon relations (P6/M4/M5)
  F. modify-meta flow (C4)  G. deletion flow (C5/C3/A7)

ID policy (W1, SURVEY §7 risk 1): one union of id requests gets a global
``row_number`` ordered by (kind, stable key) — ids are unique, dense from
``id_offset+1``, deterministic; exact interleaving parity with the
reference's mutable counter is explicitly out of contract.

Scale notes: every join is keyed (grid cell, rounded coordinate, osm_id);
the only single-partition stage is the global id ``row_number`` over the
*id-request keys only* (a changefile ≪ cluster memory by construction —
see ``operators/ids.py`` for the distributed-mode alternative) and the
ordered XML sink.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


# Eager local checkpoints (measured, see SCALE.md): each localCheckpoint
# call pays physical planning + codegen compile at call time whether eager
# or not, and lazy materialization lets multiple consumers race to compute
# the same partitions — eager is strictly better here.  Env flip kept for
# re-measurement.
CHECKPOINT_EAGER = os.environ.get("CHANGEGEN_LAZY_CKPT", "") != "1"

# Input size (bytes, Catalyst plan stats) below which the pipeline plans
# its checkpoint fences WITHOUT whole-stage codegen.  Janino compilation of
# the segment-join subtrees costs ~2-3 s of driver-serial time per fence —
# on a 100 TB run that is noise against minutes of execution (codegen
# stays on), but on an interactive small-diff run it IS the latency floor,
# and interpreted execution of a few thousand rows is equally fast.  The
# same size-adaptive reasoning as AQE, applied to compile time.
SMALL_INPUT_CODEGEN_OFF_BYTES = int(
    os.environ.get("CHANGEGEN_CODEGEN_OFF_BYTES", 256 * 1024 * 1024)
)


def _inputs_are_small(tables: dict) -> bool:
    """True when every input table's Catalyst size estimate sums below the
    interpreted-fence threshold (cheap: optimizer stats, no job)."""
    total = 0
    for df in tables.values():
        if df is None:
            continue
        try:
            total += int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:
            return False  # unknown size: assume big, keep codegen
        if total >= SMALL_INPUT_CODEGEN_OFF_BYTES:
            return False
    return True


@contextlib.contextmanager
def _maybe_interpreted(spark: SparkSession, interpreted: bool):
    """Scoped fence-planning trim for small inputs: whole-stage codegen off
    (Janino compiles of throwaway fence subtrees cost seconds) and
    constraint propagation off (inference over the deep segment-join
    predicates is pure optimizer time; constraints only ADD optimization
    opportunities, never change results — measured ~0.2-0.3 s/fence)."""
    if not interpreted:
        yield
        return
    keys = {
        "spark.sql.codegen.wholeStage": "false",
        "spark.sql.constraintPropagation.enabled": "false",
    }
    prev = {k: spark.conf.get(k) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


@contextlib.contextmanager
def _timed(label: str):
    """Phase timing to stderr when CHANGEGEN_TIMING=1 (perf attribution)."""
    if not os.environ.get("CHANGEGEN_TIMING"):
        yield
        return
    t0 = time.time()
    yield
    print(f"[changegen-timing] {label}: {time.time() - t0:.2f}s", file=sys.stderr)

from changegen_spark.geo.geometry import exterior, g_type, interiors
from changegen_spark.geo.mercator import to_4326_lat, to_4326_lon
from changegen_spark.geo.segments import explode_segments, segment_distance_join
from changegen_spark.operators.ids import check_id_collision
from changegen_spark.operators.tags import merge_hstore_tags, parse_hstore
from changegen_spark.operators.ways import (
    CHUNK_SIZE_DEFAULT,
    NODE_LIMIT_DEFAULT,
    cumulative_fraction,
    line_locate_fraction,
    split_ways,
)

DISTANCE_BUFFER_DEFAULT = 5.0  # changegen/db.py:110 (meters in EPSG:3857)
PRECISION = 6  # COORDINATE_PRECISION, changegen/generator.py:31

# id-request kind ordering (stable across runs)
_K_JUNCTION, _K_VERTEX, _K_POINT, _K_WAY, _K_RELATION = 0, 1, 2, 3, 4


def _tags_map(df: DataFrame, exclude: tuple[str, ...], hstore_col: str | None = None):
    """P1 + P2: attribute columns → tag map, hstore merged under column
    precedence (changegen/generator.py:169-205)."""
    cols = [
        c
        for c in df.columns
        if c not in exclude and c != hstore_col and not c.startswith("__")
    ]
    entries = F.array(
        *[
            F.struct(F.lit(c).alias("key"), F.col(c).cast("string").alias("value"))
            for c in cols
        ]
    )
    kept = F.filter(entries, lambda e: e.value.isNotNull() & (e.value != F.lit("")))
    col_tags = F.map_from_entries(kept)
    if hstore_col is not None and hstore_col in df.columns:
        return merge_hstore_tags(col_tags, parse_hstore(F.col(hstore_col)))
    return col_tags


def _rounded_lonlat(x, y):
    return (
        F.round(to_4326_lon(x), PRECISION),
        F.round(to_4326_lat(y), PRECISION),
    )


class ChangeSet:
    """Accumulates element DataFrames + id requests, then resolves ids."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.requests: list[DataFrame] = []

    def request_ids(self, df: DataFrame, kind: int, skey) -> None:
        self.requests.append(
            df.select(F.lit(kind).alias("korder"), skey.cast("string").alias("skey"))
        )

    def resolve(self, id_offset: int, negative: bool) -> DataFrame:
        """(korder, skey) → new_id, dense from id_offset+1 (W1)."""
        from functools import reduce

        allreq = reduce(lambda a, b: a.unionByName(b), self.requests).distinct()
        w = Window.orderBy("korder", "skey")
        seq = F.row_number().over(w).cast("long") + F.lit(id_offset)
        return allreq.withColumn("new_id", -seq if negative else seq)


def synthesize_junctions(
    new_ways: DataFrame,
    existing_ways: DataFrame,
    key_col: str,
    distance_buffer: float = DISTANCE_BUFFER_DEFAULT,
    self_intersections: bool = False,
    checkpoint: bool = False,
    eager: bool | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Stage A: (junction_nodes keyed by rounded lon/lat, per-pair junctions).

    Junction per (new way, existing way) pair = closest point on the new
    geometry within the buffer (crossings → exact crossing point), then
    6-dp grid dedup; the same cached join yields the intersecting-id list
    (J2) — unlike the reference, the spatial predicate runs once
    (SURVEY §3.3)."""
    lsegs = explode_segments(
        new_ways.select(F.col(key_col).alias("nkey"), exterior(F.col("geometry")).alias("__ring")),
        ["nkey"],
        F.col("__ring"),
        prefix="l",
    )
    rsegs = explode_segments(
        existing_ways.select(F.col("osm_id"), exterior(F.col("geometry")).alias("__ring")),
        ["osm_id"],
        F.col("__ring"),
        prefix="r",
    )
    pairs = segment_distance_join(lsegs, rsegs, distance_buffer, dedup_pairs=False)
    # one junction per (new, existing) pair: the globally closest approach
    best = pairs.groupBy("nkey", "osm_id").agg(
        F.min_by(
            F.struct("cp_x", "cp_y"), F.struct("dist", "lseg", "rseg")
        ).alias("cp"),
        F.min("dist").alias("dist"),
    )
    junctions = best.select(
        "nkey",
        "osm_id",
        F.col("cp.cp_x").alias("jx"),
        F.col("cp.cp_y").alias("jy"),
    )

    if self_intersections:
        # J3 --self (changegen/__main__.py:131-139): junctions among the new
        # features themselves — the same segment grid join, new×new, with
        # identical-feature pairs excluded.  Both directions of a crossing
        # pair appear, so each way receives the junction; the 6-dp grid
        # dedup collapses them to one shared node.  No osm_id: self
        # junctions modify no existing way.
        osegs = explode_segments(
            new_ways.select(
                F.col(key_col).alias("okey"), exterior(F.col("geometry")).alias("__ring")
            ),
            ["okey"],
            F.col("__ring"),
            prefix="r",
        )
        self_pairs = segment_distance_join(
            lsegs, osegs, distance_buffer, dedup_pairs=False
        ).filter(
            F.col("nkey") != F.col("okey")
        )
        self_best = self_pairs.groupBy("nkey", "okey").agg(
            F.min_by(
                F.struct("cp_x", "cp_y"), F.struct("dist", "lseg", "rseg")
            ).alias("cp")
        )
        self_junctions = self_best.select(
            "nkey",
            F.lit(None).cast("long").alias("osm_id"),
            F.col("cp.cp_x").alias("jx"),
            F.col("cp.cp_y").alias("jy"),
        )
        junctions = junctions.unionByName(self_junctions)
    rlon, rlat = _rounded_lonlat(F.col("jx"), F.col("jy"))
    junctions = junctions.withColumn("rlon", rlon).withColumn("rlat", rlat)
    if checkpoint:
        # ONE materialization of the segment-join pipeline; junction_nodes
        # stays a lazy (trivial) agg over the checkpointed rows — a second
        # dedicated checkpoint job cost more than the per-consumer re-agg.
        # (The r1 shape — independent checkpoints of nodes AND junctions —
        # analyzed and executed the whole segment join twice.)
        # eager=False + a caller-side async force lets the materialization
        # job overlap the driver's stage-B/C plan building (r3) — the
        # lineage fence (LogicalRDD) exists either way.
        junctions = junctions.localCheckpoint(
            eager=CHECKPOINT_EAGER if eager is None else eager
        )
    # A3 grid dedup: one node per 6-dp cell
    junction_nodes = junctions.groupBy("rlon", "rlat").agg(
        F.min(to_4326_lon(F.col("jx"))).alias("lon"),
        F.min(to_4326_lat(F.col("jy"))).alias("lat"),
    )
    return junction_nodes, junctions


def _vertices_with_frac(geoms: DataFrame, key_cols: list[str]) -> DataFrame:
    """Explode ring → (key…, pos, x, y, rlon, rlat, frac…)."""
    verts = geoms.select(
        *key_cols, F.posexplode(F.col("__ring")).alias("pos", "__pt")
    ).select(
        *key_cols,
        "pos",
        F.col("__pt.x").alias("x"),
        F.col("__pt.y").alias("y"),
    )
    verts = cumulative_fraction(verts, key_cols)
    rlon, rlat = _rounded_lonlat(F.col("x"), F.col("y"))
    return verts.withColumn("rlon", rlon).withColumn("rlat", rlat)


def build_new_ways(
    cs: ChangeSet,
    new_ways: DataFrame,
    junction_nodes: DataFrame,
    junctions: DataFrame,
    key_col: str,
    tag_exclude: tuple[str, ...] = ("geometry",),
    hstore_col: str | None = None,
    node_limit: int = NODE_LIMIT_DEFAULT,
    chunk_size: int = CHUNK_SIZE_DEFAULT,
) -> dict[str, DataFrame]:
    """Stage B: create-path ways + their nodes.

    Returns dict with 'vertex_nodes' (unmatched vertices needing fresh ids),
    'way_rows' (nkey, chunk, ordered member keys), 'way_tags'.
    Junction handling: a junction equal to a way vertex at 6 dp reuses the
    junction node (J4, generator.py:430-443); otherwise it is inserted at
    its fractional position (W2/M2, generator.py:208-255,458-487)."""
    geoms = new_ways.select(
        F.col(key_col).alias("nkey"), exterior(F.col("geometry")).alias("__ring")
    )
    # verts feeds four downstream joins; truncating its (windowed) lineage
    # keeps every consumer's analysis tree shallow
    verts = _vertices_with_frac(geoms, ["nkey"])
    if os.environ.get("CHANGEGEN_VERTS_CKPT", "1") == "1":
        # no barrier needed: verts derive from new_ways only, so this
        # eager job cannot race the junction materialization
        verts = verts.localCheckpoint(eager=CHECKPOINT_EAGER)

    jn = junction_nodes.select("rlon", "rlat")
    matched = verts.join(jn, ["rlon", "rlat"], "inner").select(
        "nkey", "pos", "frac", "rlon", "rlat",
        F.lit(True).alias("is_junction"),
    )
    unmatched = verts.join(jn, ["rlon", "rlat"], "left_anti")

    # junctions of this way not coincident with any of its vertices → insert.
    # ONE row per (way, 6-dp cell): raw jx/jy from different pair joins can
    # differ in low-order bits within the same cell (e.g. a new way crossing
    # an existing way AND another new way at the same spot — the duplicate
    # case the reference dedups, generator.py:132-142); a plain distinct()
    # would keep both and double every vertex row inside the
    # line_locate_fraction window, corrupting the insertion fraction.
    way_j = (
        junctions.groupBy("nkey", "rlon", "rlat")
        .agg(F.min_by(F.struct("jx", "jy"), F.struct("jx", "jy")).alias("__j"))
        .select("nkey", F.col("__j.jx").alias("jx"), F.col("__j.jy").alias("jy"), "rlon", "rlat")
    )
    to_insert = way_j.join(
        verts.select("nkey", "rlon", "rlat"), ["nkey", "rlon", "rlat"], "left_anti"
    )
    ins_input = verts.select("nkey", "pos", "x", "y").join(
        to_insert.select(
            "nkey",
            F.col("jx").alias("px"),
            F.col("jy").alias("py"),
            F.col("rlon").alias("jrlon"),
            F.col("rlat").alias("jrlat"),
        ),
        "nkey",
    )
    inserted = line_locate_fraction(
        ins_input, ["nkey", "jrlon", "jrlat"], "px", "py"
    ).select(
        "nkey",
        F.col("point_frac").alias("frac"),
        F.col("jrlon").alias("rlon"),
        F.col("jrlat").alias("rlat"),
        F.lit(True).alias("is_junction"),
        F.lit(None).cast("int").alias("pos"),
    )

    # id requests for unmatched vertices
    vkey = F.concat_ws(":", F.col("nkey"), F.col("pos"))
    cs.request_ids(unmatched, _K_VERTEX, vkey)

    members = (
        unmatched.select(
            "nkey", "pos", "frac", "rlon", "rlat", F.lit(False).alias("is_junction")
        )
        .unionByName(matched)
        .unionByName(inserted, allowMissingColumns=True)
    )
    # ordered member list per way (frac, junction-after-vertex tie, pos)
    ordered = members.groupBy("nkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("frac"),
                    F.col("is_junction").cast("int").alias("jflag"),
                    F.coalesce(F.col("pos"), F.lit(0)).alias("pos"),
                    F.col("rlon"),
                    F.col("rlat"),
                    F.col("is_junction"),
                )
            )
        ).alias("mseq")
    )

    # key_col stays IN the tag map when it is a real attribute (e.g. name);
    # synthetic "__"-prefixed keys are dropped by _tags_map automatically.
    way_tags = new_ways.select(
        F.col(key_col).alias("nkey"),
        _tags_map(new_ways, tag_exclude, hstore_col).alias("tags"),
    )

    return {
        "vertex_nodes": unmatched,
        "ordered_members": ordered,
        "way_tags": way_tags,
        "node_limit": node_limit,
        "chunk_size": chunk_size,
    }


def modify_intersecting_ways(
    existing_ways: DataFrame,
    junctions: DataFrame,
    pbf_ways: DataFrame,
    ckpt_barrier=None,
) -> DataFrame:
    """Stage C: rebuild intersecting existing ways with junction nodes.

    ``_modify_existing_way`` (changegen/generator.py:307-377) as set ops:
    PBF node list (J5), junction-at-vertex → node id replacement, otherwise
    fractional insertion.  Ways missing from the extract are skipped, the
    reference's logged case (generator.py:820-822).
    Output: (osm_id, member structs sorted) — ids resolved later."""
    hit_ways = junctions.filter(F.col("osm_id").isNotNull()).select("osm_id").distinct()
    # Polygon intersection-modify is out of contract, matching the
    # reference's logged-unsupported case (changegen/generator.py:836-847):
    # non-LineString existing geometries are excluded from the rebuild.
    lines_only = existing_ways.filter(g_type(F.col("geometry")) == "LineString")
    geoms = lines_only.join(hit_ways, "osm_id", "left_semi").select(
        "osm_id", exterior(F.col("geometry")).alias("__ring")
    )
    verts = _vertices_with_frac(geoms, ["osm_id"])

    nds = pbf_ways.select(
        F.col("id").alias("osm_id"), F.posexplode("nds").alias("pos", "node_id")
    )
    # missing pbf → skipped; checkpoint: same multi-consumer fan-out as the
    # create path
    verts = verts.join(nds, ["osm_id", "pos"], "inner")
    if os.environ.get("CHANGEGEN_VERTS_CKPT", "1") == "1":
        if ckpt_barrier is not None:
            # this subtree consumes the junction frame (hit_ways): wait for
            # its async materialization so a lazy junction checkpoint is
            # never computed twice by racing consumers
            ckpt_barrier()
        verts = verts.localCheckpoint(eager=CHECKPOINT_EAGER)

    # Same one-row-per-(way, cell) dedup as the create path: low-order jx/jy
    # jitter within a 6-dp cell must not duplicate insert candidates.
    way_j = (
        junctions.filter(F.col("osm_id").isNotNull())
        .groupBy("osm_id", "rlon", "rlat")
        .agg(F.min_by(F.struct("jx", "jy"), F.struct("jx", "jy")).alias("__j"))
        .select("osm_id", F.col("__j.jx").alias("jx"), F.col("__j.jy").alias("jy"), "rlon", "rlat")
    )
    matched = verts.join(
        way_j.select("osm_id", "rlon", "rlat").distinct(), ["osm_id", "rlon", "rlat"], "inner"
    ).select("osm_id", "pos", "frac", "rlon", "rlat", F.lit(True).alias("is_junction"))
    unmatched = verts.join(
        way_j.select("osm_id", "rlon", "rlat").distinct(), ["osm_id", "rlon", "rlat"], "left_anti"
    ).select(
        "osm_id", "pos", "frac", "rlon", "rlat",
        F.lit(False).alias("is_junction"), F.col("node_id"),
    )

    to_insert = way_j.join(
        verts.select("osm_id", "rlon", "rlat"), ["osm_id", "rlon", "rlat"], "left_anti"
    )
    ins_input = verts.select("osm_id", "pos", "x", "y").join(
        to_insert.select(
            "osm_id",
            F.col("jx").alias("px"),
            F.col("jy").alias("py"),
            F.col("rlon").alias("jrlon"),
            F.col("rlat").alias("jrlat"),
        ),
        "osm_id",
    )
    inserted = line_locate_fraction(
        ins_input, ["osm_id", "jrlon", "jrlat"], "px", "py"
    ).select(
        "osm_id",
        F.col("point_frac").alias("frac"),
        F.col("jrlon").alias("rlon"),
        F.col("jrlat").alias("rlat"),
        F.lit(True).alias("is_junction"),
        F.lit(None).cast("int").alias("pos"),
        F.lit(None).cast("long").alias("node_id"),
    )

    members = (
        unmatched
        .unionByName(matched.withColumn("node_id", F.lit(None).cast("long")), allowMissingColumns=True)
        .unionByName(inserted)
    )
    return members.groupBy("osm_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("frac"),
                    F.col("is_junction").cast("int").alias("jflag"),
                    F.coalesce(F.col("pos"), F.lit(0)).alias("pos"),
                    F.col("rlon"),
                    F.col("rlat"),
                    F.col("is_junction"),
                    F.col("node_id"),
                )
            )
        ).alias("mseq")
    )


def generate_changes(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    id_offset: int = 0,
    negative_ids: bool = False,
    self_intersections: bool = False,
    distance_buffer: float = DISTANCE_BUFFER_DEFAULT,
    node_limit: int = NODE_LIMIT_DEFAULT,
    chunk_size: int = CHUNK_SIZE_DEFAULT,
    skip_delete_nodes: bool = True,
    check_collision: bool = True,
    key_col: str = "name",
    hstore_col: str | None = None,
    emit_osm_id_tag: bool = False,
    split_joiner: str = "shared",
) -> DataFrame:
    """Full run: create new ways/points/polygons, modify intersecting
    existing ways, apply deletions.  Returns the unified element DataFrame
    (sink-ready, see sinks.oscxml.ELEMENT_SCHEMA).

    ``emit_osm_id_tag=True`` re-emits the source feature's ``osm_id`` field
    as a tag on modified intersecting ways, matching the reference's
    actual output (``_generate_tags_from_feature`` is called with no
    exclude list on the modify path, ``generator.py:812-813``).  Default
    off: the id is join metadata, not cargo (GAPS.md deviation note).
    ``split_joiner="duplicate_first"`` likewise selects the reference's
    byte behavior for over-long way splitting (see operators.ways).
    Together these two flags make the output byte-compatible with the
    reference (the CLI's ``--reference-bytes``)."""
    import concurrent.futures

    from changegen_spark.operators.changes import expand_deleted_ways
    from changegen_spark.sources.osm import max_pbf_ids

    # Overlapped head (r3, measured on scale_smoke 300×200): the max-id
    # scan runs as an EXECUTOR-side job while the driver builds the
    # junction plan — py4j/Catalyst work — removing ~2 s of serial
    # wall-clock.  The junction checkpoint is created LAZY (the LogicalRDD
    # lineage fence exists immediately, bounding every consumer's analysis
    # tree) and materializes inside stage C's eager checkpoint job — the
    # single plan-phase consumer of the junction frame, so no duplicate
    # compute and one fused job instead of two.  Stage B's checkpoint
    # derives from new_ways only and safely runs concurrently.  Collision
    # check stays fail-fast: its result is read before any output exists.
    pool = concurrent.futures.ThreadPoolExecutor(max_workers=4)
    fut_maxids = pool.submit(max_pbf_ids, tables) if check_collision else None

    cs = ChangeSet(spark)
    new_ways = tables.get("new_ways")
    existing = tables.get("original_ways")
    way_key_col = key_col

    # Small inputs: plan the checkpoint fences interpreted (see
    # SMALL_INPUT_CODEGEN_OFF_BYTES) — the conf stays off through the
    # fence-building/materialization section below and is restored before
    # the returned DataFrame is ever executed, so the big final plan (the
    # one a 100 TB run spends its time in) still compiles.
    interp = _inputs_are_small(tables)
    codegen_scope = _maybe_interpreted(spark, interp)
    codegen_scope.__enter__()

    # ONE try/finally spans the whole fence-planning section: any failure
    # (including the collision guard's designed abort) must restore the
    # codegen conf and stop the pool threads, not leak them to the caller.
    try:
        # A: junctions (single evaluation serves J1 closest-points AND J2 ids)
        if new_ways is not None and existing is not None:
            # checkpoint=True truncates lineage inside: every downstream stage
            # re-references the junction frames many times, and the segment-join
            # expression tree is deep — one materialization bounds Catalyst
            # analysis cost for all consumers.
            with _timed("A:junctions(build)"):
                junction_nodes, junctions = synthesize_junctions(
                    new_ways, existing, key_col=way_key_col,
                    distance_buffer=distance_buffer, self_intersections=self_intersections,
                    checkpoint=True, eager=False,
                )
        else:
            junction_nodes = spark.createDataFrame(
                [], "rlon double, rlat double, lon double, lat double"
            )
            junctions = spark.createDataFrame(
                [], "nkey string, osm_id long, jx double, jy double, rlon double, rlat double"
            )
        jkey = F.concat_ws(",", F.col("rlon"), F.col("rlat"))
        cs.request_ids(junction_nodes, _K_JUNCTION, jkey)

        if fut_maxids is not None:
            with _timed("head:max_pbf_ids"):
                maxids = fut_maxids.result()
            check_id_collision(max(maxids.values()), id_offset, negative_ids)

        # B: new ways.  Way splitting happens on the member-KEY sequences, so
        # way ids can be requested in the same single resolve as node ids (the
        # chunk count depends only on member counts, not on resolved ids).
        nb = None
        chunked_members = None
        wkey = F.concat_ws(":", F.col("nkey"), F.col("chunk"))
        # Stages B and C are independent once the junction frame is
        # materialized; each ends in an eager localCheckpoint (a separate Spark
        # job with its own codegen compile).  Running them on two threads
        # overlaps those jobs — py4j releases the GIL on socket IO, and Spark
        # job submission is thread-safe.  cs.request_ids appends under the GIL;
        # resolve() orders by (kind, key), so request order is immaterial.
        def _stage_b():
            nb_ = build_new_ways(
                cs, new_ways, junction_nodes, junctions, key_col=way_key_col,
                hstore_col=hstore_col,
                node_limit=node_limit, chunk_size=chunk_size,
            )
            cm = split_ways(
                nb_["ordered_members"], nds_col="mseq",
                node_limit=node_limit, chunk_size=chunk_size,
                joiner=split_joiner,
            )
            return nb_, cm

        def _stage_c():
            return modify_intersecting_ways(existing, junctions, tables["pbf_ways"])

        # Stages D/E/G below are pure driver-side plan building with no
        # dependency on B/C — they run while the pool's checkpoint jobs
        # execute; the B/C futures are joined just before resolve
        # (request_ids order is immaterial: resolve sorts by kind+key).
        fut_b = fut_c = None
        nb = chunked_members = None
        mod_ways_seq = mod_way_tags = None
        if new_ways is not None:
            fut_b = pool.submit(_stage_b)
        if existing is not None:
            fut_c = pool.submit(_stage_c)

        # D: new points
        pts = None
        new_points = tables.get("new_points")
        if new_points is not None:
            pt_tags = _tags_map(
                new_points,
                exclude=("id", "osm_id", "geom"),
                # point tables historically carry their hstore in "tags"
                # (generator.py:608-621); an explicit --hstore overrides.
                hstore_col=hstore_col if hstore_col is not None else "tags",
            )
            from changegen_spark.geo.geometry import point_xy
            from changegen_spark.operators.keys import feature_key

            # Row key: the id column when present AND non-null; else a
            # row-unique feature hash.  The reference iterates per-FID so a
            # NULL id column (e.g. its own new_points fixture) still yields one
            # create per row — a null key here would silently drop them all.
            src = new_points
            if "id" not in src.columns:
                src = src.withColumn("id", F.lit(None).cast("long"))
            src = feature_key(src, "geom")
            pt_key = F.coalesce(F.col("id").cast("string"), F.col("__fkey"))

            px, py = point_xy(F.col("geom"))
            pts = src.select(
                pt_key.alias("pt_id"),
                to_4326_lon(px).alias("lon"),
                to_4326_lat(py).alias("lat"),
                pt_tags.alias("tags"),
            )
            cs.request_ids(pts, _K_POINT, F.concat(F.lit("pt:"), F.col("pt_id")))

        # E: polygons
        polys = tables.get("new_polygons")
        poly_parts = _build_polygons(cs, polys) if polys is not None else None
        if poly_parts is not None:
            cs.request_ids(poly_parts["rings"], _K_WAY, F.col("ring_key"))
            cs.request_ids(poly_parts["relations"], _K_RELATION, F.col("pkey"))

        # G: deletions
        del_ways = del_nodes = None
        if tables.get("deleted_ways") is not None:
            del_ways, del_nodes = expand_deleted_ways(
                tables["deleted_ways"], tables["pbf_ways"], skip_nodes=skip_delete_nodes
            )

        # join the overlapped B/C stages
        if fut_b is not None:
            with _timed("B:build_new_ways"):
                nb, chunked_members = fut_b.result()
            cs.request_ids(chunked_members, _K_WAY, wkey)
        if fut_c is not None:
            with _timed("C:modify_intersecting"):
                mod_ways_seq = fut_c.result()
            # hstore expansion applies to intersecting-way modifies exactly
            # as it does to new features (generator.py:190-203 → :812).
            mod_excl = (
                ("id", "geometry")
                if emit_osm_id_tag
                else ("id", "osm_id", "geometry")
            )
            mod_way_tags = existing.select(
                F.col("osm_id"),
                _tags_map(
                    existing, exclude=mod_excl, hstore_col=hstore_col
                ).alias("tags"),
            )
    finally:
        pool.shutdown(wait=True)
        codegen_scope.__exit__(None, None, None)

    # --- resolve ids and assemble elements ---
    with _timed("ids:resolve"):
        ids = cs.resolve(id_offset, negative_ids).cache()

    def with_id(df: DataFrame, kind: int, skey) -> DataFrame:
        keyed = df.withColumn("__skey", skey.cast("string"))
        return keyed.join(
            ids.filter(F.col("korder") == kind).withColumnRenamed("skey", "__skey"),
            "__skey",
        ).drop("__skey", "korder")

    empty_tags = F.create_map().cast("map<string,string>")

    junction_node_elems = with_id(junction_nodes, _K_JUNCTION, jkey).select(
        F.lit("create").alias("change_type"),
        F.lit("node").alias("kind"),
        F.col("new_id").alias("id"),
        F.lit(1).alias("version"),
        "lat", "lon",
        empty_tags.alias("tags"),
    )

    vkey = F.concat_ws(":", F.col("nkey"), F.col("pos"))
    vertex_elems = None
    if nb is not None:
        vertex_elems = with_id(nb["vertex_nodes"], _K_VERTEX, vkey).select(
            F.lit("create").alias("change_type"),
            F.lit("node").alias("kind"),
            F.col("new_id").alias("id"),
            F.lit(1).alias("version"),
            to_4326_lat(F.col("y")).alias("lat"),
            to_4326_lon(F.col("x")).alias("lon"),
            empty_tags.alias("tags"),
        )

    point_elems = None
    if pts is not None:
        point_elems = with_id(
            pts, _K_POINT, F.concat(F.lit("pt:"), F.col("pt_id"))
        ).select(
            F.lit("create").alias("change_type"),
            F.lit("node").alias("kind"),
            F.col("new_id").alias("id"),
            F.lit(1).alias("version"),
            "lat", "lon", "tags",
        )

    # new-way member resolution: junction members → junction node ids,
    # vertex members → vertex node ids; nds assembled per (way, chunk)
    jids = with_id(junction_nodes, _K_JUNCTION, jkey).select(
        "rlon", "rlat", F.col("new_id").alias("jid")
    )
    with_id2 = with_id  # single resolve covers every element kind

    new_way_elems = None
    if chunked_members is not None:
        vids = with_id(nb["vertex_nodes"], _K_VERTEX, vkey).select(
            "nkey", "pos", F.col("new_id").alias("vid")
        )
        way_ids = with_id(chunked_members, _K_WAY, wkey).select(
            "nkey", "chunk", F.col("new_id").alias("way_id"), "mseq"
        )
        mem = way_ids.select(
            "nkey", "chunk", "way_id", F.posexplode("mseq").alias("seq", "m")
        ).select(
            "nkey", "chunk", "way_id", "seq",
            F.col("m.rlon").alias("rlon"), F.col("m.rlat").alias("rlat"),
            F.col("m.pos").alias("pos"), F.col("m.is_junction").alias("is_junction"),
        )
        mem = (
            mem.join(jids, ["rlon", "rlat"], "left")
            .join(vids, ["nkey", "pos"], "left")
            .withColumn("node_ref", F.when(F.col("is_junction"), F.col("jid")).otherwise(F.coalesce("vid", "jid")))
        )
        chunk_nds = mem.groupBy("nkey", "chunk", "way_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seq", "node_ref"))),
                lambda s: s.getField("node_ref"),
            ).alias("nds")
        )
        new_way_elems = chunk_nds.join(nb["way_tags"], "nkey").select(
            F.lit("create").alias("change_type"),
            F.lit("way").alias("kind"),
            F.col("way_id").alias("id"),
            F.lit(1).alias("version"),
            "nds", "tags",
        )

    # modified existing ways: junction members → junction ids, vertex
    # members keep their PBF node id unless junction-replaced
    mod_way_elems = None
    if mod_ways_seq is not None:
        mmem = mod_ways_seq.select(
            "osm_id", F.posexplode("mseq").alias("seq", "m")
        ).select(
            "osm_id", "seq",
            F.col("m.rlon").alias("rlon"), F.col("m.rlat").alias("rlat"),
            F.col("m.is_junction").alias("is_junction"),
            F.col("m.node_id").alias("node_id"),
        )
        mmem = mmem.join(jids, ["rlon", "rlat"], "left").withColumn(
            "node_ref", F.when(F.col("is_junction"), F.col("jid")).otherwise(F.col("node_id"))
        )
        mod_nds = mmem.groupBy("osm_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seq", "node_ref"))),
                lambda s: s.getField("node_ref"),
            ).alias("nds")
        )
        mod_way_elems = mod_nds.join(mod_way_tags, "osm_id").select(
            F.lit("modify").alias("change_type"),
            F.lit("way").alias("kind"),
            F.col("osm_id").alias("id"),
            F.lit(2).alias("version"),
            "nds", "tags",
        )

    # deletions (version 99 placeholder, generator.py:919-925)
    del_way_elems = del_node_elems = None
    if del_ways is not None:
        del_way_elems = del_ways.select(
            F.lit("delete").alias("change_type"),
            F.lit("way").alias("kind"),
            F.col("id"),
            F.lit(99).alias("version"),
            empty_tags.alias("tags"),
        )
        del_node_elems = del_nodes.select(
            F.lit("delete").alias("change_type"),
            F.lit("node").alias("kind"),
            F.col("id"),
            F.lit(99).alias("version"),
            F.lit(0.0).alias("lat"),
            F.lit(0.0).alias("lon"),
            empty_tags.alias("tags"),
        )

    with _timed("tail:union"):
        parts = [
        p
        for p in (
            junction_node_elems,
            vertex_elems,
            point_elems,
            new_way_elems,
            mod_way_elems,
            del_way_elems,
            del_node_elems,
        )
        if p is not None
    ]
    if poly_parts is not None:
        parts.extend(_assemble_polygons(poly_parts, with_id2, with_id))

    from changegen_spark.operators.changes import assemble_changeset

    return assemble_changeset(*parts)


def _build_polygons(cs: ChangeSet, polys: DataFrame) -> dict[str, DataFrame]:
    """Stage E prep: explode polygon rings; request node ids.

    Simple polygons (no interiors) → one closed way carrying the tags;
    holed polygons → one way per ring + a type=multipolygon relation with
    outer/inner roles (changegen/generator.py:683-753)."""
    polys = polys.withColumn("__n_int", F.size(F.col("geometry.rings")) - 1)
    base = polys.select(
        F.col("name").alias("pkey"),
        "__n_int",
        F.posexplode(F.col("geometry.rings")).alias("ring_idx", "__ring"),
    )
    # drop the closing duplicate coordinate for node synthesis (M4 inverse)
    base = base.withColumn(
        "__ring", F.slice(F.col("__ring"), 1, F.size(F.col("__ring")) - 1)
    )
    verts = base.select(
        "pkey", "ring_idx", F.posexplode("__ring").alias("pos", "__pt")
    ).select(
        "pkey", "ring_idx", "pos",
        F.col("__pt.x").alias("x"), F.col("__pt.y").alias("y"),
    )
    nkey = F.concat_ws(":", F.lit("poly"), F.col("pkey"), F.col("ring_idx"), F.col("pos"))
    cs.request_ids(verts, _K_POINT, nkey)
    rings = base.select(
        "pkey", "ring_idx", "__n_int",
        F.concat_ws(":", F.lit("polyring"), F.col("pkey"), F.col("ring_idx")).alias("ring_key"),
    )
    relations = polys.filter(F.col("__n_int") > 0).select(
        F.col("name").alias("pkey")
    )
    tags = polys.select(
        F.col("name").alias("pkey"),
        F.col("__n_int"),
        _tags_map(polys, exclude=("geometry", "__n_int")).alias("tags"),
    )
    return {"verts": verts, "rings": rings, "relations": relations, "tags": tags}


def _assemble_polygons(pp, with_id2, with_id) -> list[DataFrame]:
    """Stage E finish: nodes, closed ways, multipolygon relations."""
    empty_tags = F.create_map().cast("map<string,string>")
    nkey = F.concat_ws(":", F.lit("poly"), F.col("pkey"), F.col("ring_idx"), F.col("pos"))
    vid = with_id(pp["verts"], _K_POINT, nkey)
    node_elems = vid.select(
        F.lit("create").alias("change_type"),
        F.lit("node").alias("kind"),
        F.col("new_id").alias("id"),
        F.lit(1).alias("version"),
        to_4326_lat(F.col("y")).alias("lat"),
        to_4326_lon(F.col("x")).alias("lon"),
        empty_tags.alias("tags"),
    )
    # ordered nds per ring, closed by repeating the first node (M4)
    ring_nds = vid.groupBy("pkey", "ring_idx").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "new_id"))),
            lambda s: s.getField("new_id"),
        ).alias("open_nds")
    ).withColumn("nds", F.concat(F.col("open_nds"), F.slice(F.col("open_nds"), 1, 1)))

    rid = with_id2(pp["rings"], _K_WAY, F.col("ring_key")).join(
        ring_nds, ["pkey", "ring_idx"]
    )
    simple_tags = pp["tags"].filter(F.col("__n_int") == 0).select("pkey", "tags")
    way_elems = rid.join(simple_tags, "pkey", "left").select(
        F.lit("create").alias("change_type"),
        F.lit("way").alias("kind"),
        F.col("new_id").alias("id"),
        F.lit(1).alias("version"),
        "nds",
        F.coalesce(F.col("tags"), empty_tags).alias("tags"),
    )

    # relations: members = ring ways with outer/inner roles (M5)
    rel_members = rid.filter(F.col("__n_int") > 0).select(
        "pkey",
        F.struct(
            F.col("new_id").alias("ref"),
            F.lit("way").alias("type"),
            F.when(F.col("ring_idx") == 0, F.lit("outer")).otherwise(F.lit("inner")).alias("role"),
        ).alias("m"),
        "ring_idx",
    )
    rel_members = rel_members.groupBy("pkey").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("ring_idx"), F.col("m")))),
            lambda s: s.getField("m"),
        ).alias("members")
    )
    holed_tags = pp["tags"].filter(F.col("__n_int") > 0).select(
        "pkey",
        F.map_concat(
            F.col("tags"),
            F.create_map(F.lit("type"), F.lit("multipolygon")).cast("map<string,string>"),
        ).alias("tags"),
    )
    rel_elems = (
        with_id2(pp["relations"], _K_RELATION, F.col("pkey"))
        .join(rel_members, "pkey")
        .join(holed_tags, "pkey")
        .select(
            F.lit("create").alias("change_type"),
            F.lit("relation").alias("kind"),
            F.col("new_id").alias("id"),
            F.lit(1).alias("version"),
            "members", "tags",
        )
    )
    return [node_elems, way_elems, rel_elems]


def generate_relation_changes(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    mod_table: str = "mod_relations",
    del_table: str = "deleted_relations",
    hstore_col: str | None = None,
) -> DataFrame:
    """Relation modify/delete flows (beyond-parity surface: the reference
    only CREATES relations, ``changegen/generator.py:732-741``).

    ``mod_table`` rows are keyed by ``osm_id``; tags come from the row's
    attribute columns (hstore merged).  Member lists: a ``members`` column
    on the table replaces the relation's members outright; otherwise the
    extract's member list (``pbf_relations``) is reused — the tags-only
    modify, symmetric with the way ``--modify_meta`` flow.  ``del_table``
    ids emit ``<delete>`` relations (version 99).  Apply-side semantics and
    the member-aware prune live in ``operators/apply.py``.
    """
    from changegen_spark.operators.changes import assemble_changeset

    member_t = "array<struct<ref:bigint,type:string,role:string>>"
    empty_tags = F.create_map().cast("map<string,string>")
    parts: list[DataFrame] = []

    mod = tables.get(mod_table)
    if mod is not None:
        tags = _tags_map(
            mod,
            exclude=("id", "osm_id", "members", "geometry"),
            hstore_col=hstore_col if hstore_col is not None else "tags",
        )
        keyed = mod.select(
            F.col("osm_id"),
            tags.alias("tags"),
            *(
                [F.col("members").cast(member_t).alias("__new_members")]
                if "members" in mod.columns
                else []
            ),
        )
        pbf = tables["pbf_relations"].select(
            F.col("id").alias("osm_id"), F.col("members").cast(member_t).alias("__pbf_members")
        )
        joined = keyed.join(pbf, "osm_id", "inner")  # missing in extract → skipped
        members = (
            F.coalesce(F.col("__new_members"), F.col("__pbf_members"))
            if "members" in mod.columns
            else F.col("__pbf_members")
        )
        parts.append(
            joined.select(
                F.lit("modify").alias("change_type"),
                F.lit("relation").alias("kind"),
                F.col("osm_id").alias("id"),
                F.lit(2).alias("version"),
                members.alias("members"),
                "tags",
            )
        )

    dels = tables.get(del_table)
    if dels is not None:
        ids = dels.select(F.col("osm_id").cast("long").alias("id")).distinct()
        parts.append(
            ids.select(
                F.lit("delete").alias("change_type"),
                F.lit("relation").alias("kind"),
                "id",
                F.lit(99).alias("version"),
                empty_tags.alias("tags"),
            )
        )
    if not parts:
        raise ValueError(f"neither {mod_table} nor {del_table} present in tables")
    return assemble_changeset(*parts)


def generate_modify_meta(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    table_name: str = "mod_ways",
    hstore_col: str | None = None,
) -> DataFrame:
    """C4: --modify_meta flow (changegen/__main__.py:104-113) — reuse the
    extract's node lists, replace tags only; version 2.  Geometry changes
    are out of contract (reference raises, __main__.py:188-192)."""
    mod = tables[table_name]
    tags = _tags_map(
        mod,
        exclude=("id", "osm_id", "parent_osm_id", "geometry", "__fkey"),
        hstore_col=hstore_col if hstore_col is not None else "tags",
    )
    keyed = mod.select(F.col("osm_id"), tags.alias("tags"))
    pbf = tables["pbf_ways"].select(F.col("id").alias("osm_id"), "nds")
    return keyed.join(pbf, "osm_id", "inner").select(  # missing pbf → skipped
        F.lit("modify").alias("change_type"),
        F.lit("way").alias("kind"),
        F.col("osm_id").alias("id"),
        F.lit(2).alias("version"),
        "nds", "tags",
    )


def generate_modify_points(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    table_name: str = "modified_points",
) -> DataFrame:
    """C2 node-modify path (generator.py:608-621): keyed by osm_id,
    version 2, osm_id dropped from tags (P5)."""
    from changegen_spark.geo.geometry import point_xy

    mod = tables[table_name]
    tags = _tags_map(mod, exclude=("id", "osm_id", "geom"), hstore_col="tags")
    px, py = point_xy(F.col("geom"))
    return mod.select(
        F.lit("modify").alias("change_type"),
        F.lit("node").alias("kind"),
        F.col("osm_id").alias("id"),
        F.lit(2).alias("version"),
        to_4326_lat(py).alias("lat"),
        to_4326_lon(px).alias("lon"),
        tags.alias("tags"),
    )


def generate_deletions(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    skip_nodes: bool = True,
) -> DataFrame:
    """C5 standalone deletion flow (changegen/generator.py:876-927)."""
    from changegen_spark.operators.changes import expand_deleted_ways

    empty_tags = F.create_map().cast("map<string,string>")
    ways, nodes = expand_deleted_ways(
        tables["deleted_ways"], tables["pbf_ways"], skip_nodes=skip_nodes
    )
    way_elems = ways.select(
        F.lit("delete").alias("change_type"),
        F.lit("way").alias("kind"),
        F.col("id"),
        F.lit(99).alias("version"),
        empty_tags.alias("tags"),
    )
    node_elems = nodes.select(
        F.lit("delete").alias("change_type"),
        F.lit("node").alias("kind"),
        F.col("id"),
        F.lit(99).alias("version"),
        F.lit(0.0).alias("lat"),
        F.lit(0.0).alias("lon"),
        empty_tags.alias("tags"),
    )
    from changegen_spark.operators.changes import assemble_changeset

    return assemble_changeset(way_elems, node_elems)
