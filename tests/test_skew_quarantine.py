"""Salted-join / two-phase-agg equivalence and quarantine routing tests."""

from pyspark.sql import functions as F


def test_salted_join_matches_plain_join(spark):
    from changegen_spark.operators.skew import salted_join

    # heavy skew: 90% of rows share key 1
    big = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(0, 100).select(
        F.col("id").cast("int").alias("k"), (F.col("id") * 10).alias("w")
    )
    plain = big.join(small, "k").groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    salted = salted_join(big, small, "k", salt=8).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_two_phase_agg_matches_plain_agg(spark):
    from changegen_spark.operators.skew import two_phase_agg

    df = spark.range(0, 5_000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    plain = df.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("s"), F.max("v").alias("m")
    )
    two = two_phase_agg(
        df,
        ["k"],
        {
            "n": (F.count("*"), "sum"),
            "s": (F.sum("v"), "sum"),
            "m": (F.max("v"), "max"),
        },
        salt=8,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, two.collect()))


def test_quarantine_routing(spark):
    from changegen_spark.operators.quarantine import geometry_checks, with_quarantine

    rows = [
        (1, {"gtype": "Point", "rings": [[{"x": 1.0, "y": 2.0}]]}),
        (2, None),  # null geometry
        (3, {"gtype": "MultiPolygon", "rings": [[{"x": 0.0, "y": 0.0}]]}),  # bad type
        (4, {"gtype": "LineString", "rings": [[]]}),  # degenerate
    ]
    df = spark.createDataFrame(
        rows,
        "fid int, geometry struct<gtype:string, rings:array<array<struct<x:double,y:double>>>>",
    )
    good, bad = with_quarantine(df, geometry_checks())
    assert [r["fid"] for r in good.collect()] == [1]
    reasons = {r["fid"]: set(r["__reasons"]) for r in bad.collect()}
    assert reasons[2] == {"null_geometry", "unsupported_type", "degenerate_ring"}
    assert reasons[3] == {"unsupported_type"}
    assert reasons[4] == {"degenerate_ring"}


def test_grid_join_hot_cell_aqe_skew_split(spark):
    """A pathological 100:1 hot grid cell must (a) produce exact results
    and (b) be SPLIT by AQE's skew-join handling rather than funneling
    into a single task — the runtime half of SCALE.md's hot-bucket story
    for the spatial joins (salted_join is the static half).

    Thresholds are lowered so the KB-scale fixture crosses AQE's
    skew-detection bars; what is being pinned is that the grid join's
    plan SHAPE is skew-splittable (a sort-merge equi-join on cell ids
    whose output imposes no distribution requirement) — if a future
    rewrite made the hot cell un-splittable (e.g. a cartesian refine or
    a key-preserving window right after the join), this test fails.
    """
    from changegen_spark.geo.join import grid_distance_join

    lowered = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in lowered}
    for k, v in lowered.items():
        spark.conf.set(k, v)
    try:
        # 300 points inside ONE grid cell (radius 1 → cell size 2), plus
        # 3 isolated 1:1 pairs far apart → 100:1 hot-cell ratio
        hot = [(i, 0.3 + (i % 20) * 1e-4, 0.3 + (i // 20) * 1e-4) for i in range(300)]
        cold_l = [(10_000 + j, 1000.0 + j * 100.0, 0.0) for j in range(3)]
        cold_r = [(20_000 + j, 1000.0 + j * 100.0 + 0.5, 0.0) for j in range(3)]
        left = spark.createDataFrame(hot + cold_l, "pid long, x double, y double")
        right = spark.createDataFrame(hot + cold_r, "pid long, x double, y double")
        df = grid_distance_join(left, right, 1.0)
        rows = df.collect()
        # exact: all hot×hot pairs (every pair within radius) + the 3 cold 1:1s
        assert len(rows) == 300 * 300 + 3
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert "skewed" in plan  # AQEShuffleRead split the hot partition
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
