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
