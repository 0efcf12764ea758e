"""Parity pins for the osmpbf Python Data Source
(sources/pbf_datasource.py) against the mapInPandas decode path and the
reference extract's golden counts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

REF_PBF = "/root/reference/test/data/osmdata.osm.pbf"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PBF), reason="reference fixture extract absent"
)


@pytest.fixture(scope="module")
def pbf_df(spark):
    from changegen_spark.sources.pbf_datasource import register

    register(spark)
    return spark.read.format("osmpbf").load(REF_PBF)


def test_datasource_matches_reference_golden_counts(pbf_df):
    counts = {r.kind: r["count"] for r in pbf_df.groupBy("kind").count().collect()}
    assert counts == {"node": 81154, "way": 2953, "relation": 30}


def test_datasource_rows_match_mapinpandas_path(spark, pbf_df):
    """Same rows as read_pbf_unified — one decode, two Spark integration
    shapes.  Compared as per-kind (count, id sum, nds-length sum) plus an
    exact way-row sample, so a silent field drop or reorder fails."""
    from changegen_spark.sources.pbf import read_pbf_unified

    legacy = read_pbf_unified(spark, REF_PBF)

    def digest(df):
        return sorted(
            map(
                tuple,
                df.groupBy("kind").agg(
                    F.count("*").alias("n"),
                    F.sum("id").alias("id_sum"),
                    F.sum(F.size("nds")).alias("nds_len_sum"),
                    F.sum(F.size("tag_keys")).alias("tags_sum"),
                ).collect(),
            )
        )

    assert digest(pbf_df) == digest(legacy)
    sample_new = (
        pbf_df.filter(F.col("kind") == "way").orderBy("id").limit(5).collect()
    )
    sample_old = (
        legacy.filter(F.col("kind") == "way").orderBy("id").limit(5).collect()
    )
    assert [tuple(r) for r in sample_new] == [tuple(r) for r in sample_old]
    legacy.unpersist()


def test_datasource_partitions_per_blob(pbf_df):
    """One input partition per OSMData blob — the parallelism contract."""
    from changegen_spark.sources.pbf import scan_blob_spans
    from changegen_spark.sources.pbf_datasource import OsmPbfReader

    n_blobs = sum(
        1 for btype, _, _ in scan_blob_spans(REF_PBF) if btype == "OSMData"
    )
    reader = OsmPbfReader({"path": REF_PBF})
    assert len(reader.partitions()) == n_blobs
    assert n_blobs > 1  # the fixture genuinely exercises parallel decode


def test_datasource_column_projection(pbf_df):
    got = pbf_df.select("id").filter(F.col("id") < 0).count()
    assert got == 0  # projection executes; extract ids are positive


def test_kinds_option_prunes_decode_and_matches(spark, pbf_df):
    """r10 (r9 verdict #5): .option('kinds', 'way') loads the per-kind
    subset — the decode skips node/relation PrimitiveGroups before
    parsing their bodies — and matches the post-filtered full scan
    exactly.  The subset is relation-scoped and immutable, so
    interleaved scans can never contaminate each other (the pushFilters
    hazard pinned below)."""
    ways = (
        spark.read.format("osmpbf").option("kinds", "way").load(REF_PBF)
    )
    assert ways.count() == 2953
    unpushed = pbf_df.filter(F.col("kind") == "way")
    assert sorted(r.id for r in ways.select("id").collect()) == sorted(
        r.id for r in unpushed.select("id").collect()
    )
    both = (
        spark.read.format("osmpbf")
        .option("kinds", "way,relation")
        .load(REF_PBF)
    )
    counts = {r.kind: r["count"] for r in both.groupBy("kind").count().collect()}
    assert counts == {"way": 2953, "relation": 30}
    # the subset relation stays itself across interleaved full scans
    assert ways.count() == 2953


def test_columns_option_prunes_schema_and_decode(spark, pbf_df):
    """.option('columns', 'kind,id'): the declared schema IS the pruned
    schema (no 10-column scan under a 2-column projection), values match
    the full scan, and the pruned single-process decode is measurably
    cheaper than the full decode on the same blobs (the stringtable +
    tags + refs skip)."""
    pruned = (
        spark.read.format("osmpbf")
        .option("columns", "kind,id")
        .load(REF_PBF)
    )
    assert pruned.columns == ["kind", "id"]
    got = sorted(map(tuple, pruned.collect()))
    want = sorted(map(tuple, pbf_df.select("kind", "id").collect()))
    assert got == want

    # decode-time delta, measured on the raw blobs (no Spark overhead)
    import time

    from changegen_spark.sources.pbf import (
        _blob_raw,
        _decode_primitive_block,
        scan_blob_spans,
    )

    raws = []
    with open(REF_PBF, "rb") as f:
        for btype, off, size in scan_blob_spans(REF_PBF):
            if btype == "OSMData":
                f.seek(off)
                raws.append(_blob_raw(f.read(size)))

    def wall(**kw):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            n = sum(1 for raw in raws for _ in _decode_primitive_block(raw, **kw))
            best = min(best, time.perf_counter() - t0)
        return best, n

    t_full, n_full = wall()
    t_pruned, n_pruned = wall(cols=frozenset(("kind", "id")))
    t_ways, n_ways = wall(
        kinds=frozenset(("way",)), cols=frozenset(("kind", "id"))
    )
    assert n_full == n_pruned == 81154 + 2953 + 30
    assert n_ways == 2953
    assert t_pruned < t_full, (t_pruned, t_full)
    assert t_ways < t_pruned, (t_ways, t_pruned)


def test_options_compose_and_reject_unknown(spark):
    from changegen_spark.sources.pbf_datasource import register

    register(spark)
    combo = (
        spark.read.format("osmpbf")
        .option("kinds", "relation")
        .option("columns", "kind,id,mrefs")
        .load(REF_PBF)
    )
    rows = combo.collect()
    assert combo.columns == ["kind", "id", "mrefs"]
    assert len(rows) == 30 and all(r.kind == "relation" for r in rows)
    assert sum(len(r.mrefs) for r in rows) > 0
    with pytest.raises(Exception, match="unknown columns"):
        spark.read.format("osmpbf").option("columns", "kind,nope").load(
            REF_PBF
        ).collect()
    with pytest.raises(Exception, match="unknown kinds"):
        spark.read.format("osmpbf").option("kinds", "ways").load(
            REF_PBF
        ).collect()


def test_pushfilters_scan_reuse_is_still_broken(spark):
    """Pins the Spark 4.1.2 behavior that keeps pushFilters OUT of this
    source (module docstring): after a kind-filtered scan plans through
    the pushdown worker, an UNFILTERED scan of the same relation reuses
    the pushed read function and silently drops rows.  A throwaway
    format demonstrates it on a 3-row source.  If a Spark upgrade fixes
    the reuse, this test FAILS — the signal to adopt pushFilters for
    the blob-level kind skip."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        EqualTo,
    )

    class _R(DataSourceReader):
        def __init__(self):
            self.only = None

        def pushFilters(self, filters):
            for f in filters:
                if isinstance(f, EqualTo) and f.attribute == ("k",):
                    self.only = f.value
                else:
                    yield f

        def partitions(self):
            return [InputPartition(0)]

        def read(self, _p):
            for k in ("a", "b", "c"):
                if self.only is None or k == self.only:
                    yield (k,)

    from pyspark.sql.datasource import InputPartition

    class _DS(DataSource):
        @classmethod
        def name(cls):
            return "pushreusedemo"

        def schema(self):
            return "k string"

        def reader(self, schema):
            return _R()

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(_DS)
    df = spark.read.format("pushreusedemo").load()
    assert df.count() == 3
    assert df.filter(F.col("k") == "a").count() == 1
    n_after = df.count()
    assert n_after == 1, (
        "Spark no longer reuses the pushed scan for unfiltered queries "
        f"(got {n_after} rows) — pushFilters is now safe to adopt in "
        "OsmPbfReader; see sources/pbf_datasource.py docstring"
    )
