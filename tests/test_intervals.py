"""Interval-overlap join semantics on hand-crafted intervals: boundary
touch, containment, multi-bucket dedup, and non-overlap."""

from changegen_spark.operators.intervals import overlap_join


def _run(spark, a_rows, b_rows, width):
    a = spark.createDataFrame(a_rows, "aid long, s_start long, s_end long")
    b = spark.createDataFrame(b_rows, "bid long, i_start long, i_end long")
    got = overlap_join(a, b, "s_start", "s_end", "i_start", "i_end", width)
    return sorted((r["aid"], r["bid"]) for r in got.collect())


def test_overlap_semantics(spark):
    a = [
        (1, 0, 100),      # overlaps b1 and touches b2 at the closed endpoint
        (2, 500, 2500),   # long interval spanning many buckets — contains b3
        (3, 9000, 9100),  # overlaps nothing
    ]
    b = [
        (1, 50, 60),
        (2, 100, 150),    # touches a1 exactly at 100 (closed ⇒ overlap)
        (3, 1000, 1010),
        (4, 2600, 2700),  # starts after a2 ends
    ]
    # width much smaller than interval 2 → it registers in ~20 buckets;
    # the distinct must still emit each pair ONCE
    assert _run(spark, a, b, 100) == [(1, 1), (1, 2), (2, 3)]
    # same result at a width larger than every interval
    assert _run(spark, a, b, 5000) == [(1, 1), (1, 2), (2, 3)]


def test_overlap_join_plans_equi_not_nested_loop(spark):
    a = spark.range(100).selectExpr("id aid", "id * 10 s_start", "id * 10 + 5 s_end")
    b = spark.range(100).selectExpr("id bid", "id * 7 i_start", "id * 7 + 3 i_end")
    plan = (
        overlap_join(a, b, "s_start", "s_end", "i_start", "i_end", 50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
