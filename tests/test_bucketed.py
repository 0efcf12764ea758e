"""Bucketed co-located join: the join over identically-bucketed tables must
plan with NO shuffle (Exchange) on either side."""

from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    from changegen_spark.sources.bucketed import colocate_fact_tables
    from changegen_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    bli, bord = colocate_fact_tables(spark, li, orders, num_buckets=8)

    # disable auto-broadcast so the big-big (sort-merge) case is exercised —
    # that's the join shape bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bli.join(bord, bli.l_orderkey == bord.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count("*").alias("n"))
        result = sorted(map(tuple, joined.collect()))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]  # final AQE plan only
        join_section = plan.split("SortMergeJoin", 1)[-1]
        assert "SortMergeJoin" in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan
        # the join inputs come straight from bucketed scans: no Exchange
        # below the join (the only shuffle allowed is the post-join agg)
        assert join_section.count("Exchange") == 0, join_section
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # and the answer matches the unbucketed plan
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
        "o_orderstatus"
    ).agg(F.count("*").alias("n"))
    assert result == sorted(map(tuple, plain.collect()))
