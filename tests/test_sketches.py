"""Mergeability and estimate-sanity pins for the HLL / KMV sketches.

The production contract of queries/sketches.py is that a sketch built on
any partition split of the input and MERGED equals the single-pass sketch
bit-for-bit — that is what lets 1000 executors (or 365 daily shards)
summarize independently.  Merge rules: register-wise max for HLL,
k-smallest-of-union for KMV.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from changegen_spark.queries.sketches import (
    HLL_M,
    KMV_K,
    hll_estimate,
    hll_registers,
    kmv_sketch,
    q_hll_distinct,
    q_kmv_distinct,
)
from changegen_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").cache()


def test_hll_registers_merge_is_exact(spark, lineitem):
    """max-merge of per-split registers == single-pass registers."""
    full = hll_registers(lineitem, "l_returnflag", "l_partkey")
    a = hll_registers(
        lineitem.filter(F.col("l_orderkey") % 2 == 0), "l_returnflag", "l_partkey"
    )
    b = hll_registers(
        lineitem.filter(F.col("l_orderkey") % 2 == 1), "l_returnflag", "l_partkey"
    )
    merged = (
        a.unionByName(b)
        .groupBy("grp", "bucket")
        .agg(F.max("r").alias("r"))
    )
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_hll_estimate_from_merged_registers(spark, lineitem):
    """The estimate folded from merged registers equals the single-pass
    estimate (register state is the whole sketch)."""
    full = hll_estimate(
        hll_registers(lineitem, "l_returnflag", "l_partkey")
    ).collect()
    halves = [
        hll_registers(
            lineitem.filter(F.col("l_orderkey") % 2 == i),
            "l_returnflag",
            "l_partkey",
        )
        for i in (0, 1)
    ]
    merged = hll_estimate(
        halves[0]
        .unionByName(halves[1])
        .groupBy("grp", "bucket")
        .agg(F.max("r").alias("r"))
    ).collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, merged))


def test_hll_estimate_within_expected_error(spark, sf_dir):
    """Standard error of HLL at m=1024 is ~1.04/sqrt(m) ≈ 3.25%; allow 4
    sigma.  Guards the register/rho arithmetic against silent breakage
    (an off-by-one in rho moves estimates ~2x)."""
    rows = q_hll_distinct(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.exact_distinct > 0
        rel = abs(r.est_distinct - r.exact_distinct) / r.exact_distinct
        assert rel < 4 * 1.04 / (HLL_M**0.5), (r, rel)


def test_kmv_merge_is_exact(spark, lineitem):
    """k-smallest of the union of two split sketches == single-pass."""
    full = (
        kmv_sketch(lineitem, "l_returnflag", "l_partkey")
        .select("grp", "h", "rn")
        .collect()
    )
    parts = [
        kmv_sketch(
            lineitem.filter(F.col("l_orderkey") % 2 == i),
            "l_returnflag",
            "l_partkey",
        ).select("grp", "h")
        for i in (0, 1)
    ]
    w = Window.partitionBy("grp").orderBy("h")
    merged = (
        parts[0]
        .unionByName(parts[1])
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .collect()
    )
    assert sorted(map(tuple, full)) == sorted(map(tuple, merged))


def test_kmv_estimate_within_expected_error(spark, sf_dir):
    """KMV relative std error ≈ 1/sqrt(k-2) ≈ 12.7% at k=64; allow 4 sigma."""
    rows = q_kmv_distinct(spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel = abs(r.est_distinct - r.exact_distinct) / r.exact_distinct
        assert rel < 4 / ((KMV_K - 2) ** 0.5), (r, rel)


def test_kmv_two_phase_matches_single_window(spark, lineitem):
    """The salt-spread two-phase top-k is value-identical to the naive
    single global window (the scale optimization changes no bits)."""
    from changegen_spark.queries.sketches import h60

    hashes = lineitem.select(
        F.col("l_returnflag").alias("grp"), h60(F.col("l_partkey")).alias("h")
    ).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    naive = (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .collect()
    )
    two_phase = kmv_sketch(lineitem, "l_returnflag", "l_partkey").collect()
    assert sorted(map(tuple, naive)) == sorted(map(tuple, two_phase))


def test_kmv_jaccard_estimate_within_error(spark, sf_dir):
    """Sketch-Jaccard vs exact: std error ~ sqrt(J(1-J)/k); allow a wide
    5-sigma band (catches rho/rank bugs that move estimates wholesale)."""
    from changegen_spark.queries.sketches import q_kmv_jaccard

    rows = q_kmv_jaccard(spark, sf_dir).collect()
    assert rows
    for r in rows:
        j = r.exact_jaccard
        sigma = max((j * (1 - j) / KMV_K) ** 0.5, 0.02)
        assert abs(r.est_jaccard - j) <= 5 * sigma, (r, sigma)


def test_bottomk_sample_merge_is_exact(spark, lineitem):
    """Bottom-k row samples merge like KMV: k smallest of the union of two
    split samples == the single-pass sample."""
    from pyspark.sql import functions as F2

    from changegen_spark.queries.sketches import SAMPLE_K, bottomk_sample

    def samp(df):
        return bottomk_sample(
            df,
            "l_returnflag",
            ["l_orderkey", "l_linenumber"],
            F2.col("l_quantity").cast("long"),
        ).select("grp", "h", "val")

    full = sorted(map(tuple, samp(lineitem).collect()))
    parts = [
        samp(lineitem.filter(F2.col("l_orderkey") % 2 == i)) for i in (0, 1)
    ]
    w = Window.partitionBy("grp").orderBy("h")
    merged = sorted(
        map(
            tuple,
            parts[0]
            .unionByName(parts[1])
            .withColumn("rn", F2.row_number().over(w))
            .filter(F2.col("rn") <= SAMPLE_K)
            .drop("rn")
            .collect(),
        )
    )
    assert full == merged


def test_sample_quantiles_near_exact(spark, sf_dir):
    from changegen_spark.queries.sketches import q_sample_quantiles

    rows = q_sample_quantiles(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_sample > 0
        assert abs(r.est_median - r.exact_median) <= 8, r
        assert abs(r.est_p90 - r.exact_p90) <= 8, r


def test_bottomk_prefilter_keeps_null_group(spark):
    """A NULL group key must survive the pandas map-side pre-filter
    (dropna=False) — the naive window path keeps NULL groups, so the
    combiner must too."""
    from changegen_spark.queries.sketches import _bottomk_prefilter

    df = spark.createDataFrame(
        [(None, 5), (None, 1), (None, 3), ("a", 2), ("a", 4)],
        "grp string, h long",
    ).coalesce(1)  # one Arrow batch → the per-batch filter is exact here
    out = _bottomk_prefilter(df, 2).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r["h"])
    assert sorted(by_grp[None]) == [1, 3]
    assert sorted(by_grp["a"]) == [2, 4]
