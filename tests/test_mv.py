"""Incremental MV maintenance (queries/mv.py)."""

from pyspark.sql import functions as F


def test_incremental_refresh_equals_full_recompute(spark, sf_dir):
    from changegen_spark.queries.mv import q_mv_refresh

    rows = q_mv_refresh(spark, sf_dir).collect()
    assert rows and all(r.consistent == 1 for r in rows)
    # the audit is not vacuous: both base and delta are non-empty, so the
    # merge genuinely combined two partial aggregates
    assert all(r.n_inc == r.n_full and r.sum_inc == r.sum_full for r in rows)
    assert sum(r.n_full for r in rows) > max(r.n_full for r in rows)


def test_delete_repair_equals_full_recompute_and_moves_a_max(spark, sf_dir):
    """Every group's repaired row equals the from-scratch answer, AND at
    least one group's max actually changed under the delete — i.e. the
    repair path was genuinely exercised on the non-mergeable aggregate,
    not just re-serving MV rows."""
    from changegen_spark.queries.mv import DELETE_PRED, _orders, q_mv_delete_repair

    rows = q_mv_delete_repair(spark, sf_dir).collect()
    assert rows and all(r.consistent == 1 for r in rows)
    base = _orders(spark, sf_dir).filter("is_base")
    mv_max = {
        r.o_orderpriority: r.mx
        for r in base.groupBy("o_orderpriority")
        .agg(F.max("cents").alias("mx"))
        .collect()
    }
    assert any(r.max_rep < mv_max[r.o_orderpriority] for r in rows)


def test_delete_repair_affected_group_filter_is_a_broadcast_semi_join(
    spark, sf_dir
):
    """The scale claim: surviving base rows are filtered to affected
    groups by a broadcast semi-join (the group-id frame is
    group-cardinality-sized), so at 100 TB the repair scan cost is the
    affected groups' rows, with no shuffle of the base table for the
    filter step."""
    from changegen_spark.queries.mv import q_mv_delete_repair

    plan = (
        q_mv_delete_repair(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan


def test_mv_join_refresh_delta_terms_all_exercised(spark, sf_dir):
    """The delta-join decomposition must be exact (consistent=1 on every
    group) AND non-trivially exercised: all three delta terms (new
    order × old shipments, old order × new shipments, new × new) carry
    rows at this sf — otherwise the audit proves less than it claims."""
    from pyspark.sql import functions as F

    from changegen_spark.queries.mv import _join_sides, q_mv_join_refresh

    rows = q_mv_join_refresh(spark, sf_dir).collect()
    assert rows and all(r.consistent == 1 for r in rows)
    assert sum(r.n_inc for r in rows) == sum(r.n_full for r in rows)

    o, li = _join_sides(spark, sf_dir)
    a_old, d_a = o.filter("a_base"), o.filter("NOT a_base")
    b_old, d_b = li.filter("b_base"), li.filter("NOT b_base")
    assert d_a.join(b_old, "o_orderkey").count() > 0
    assert a_old.join(d_b, "o_orderkey").count() > 0
    assert d_a.join(d_b, "o_orderkey").count() > 0


def test_mv_join_delete_antijoin_equals_filter_and_overlap_exercised(
    spark, sf_dir
):
    """The keyed delete path: anti-join maintenance must equal the
    filtered recompute on every group (consistent=1), the two delete
    sets must OVERLAP on some view rows (both-sides-deleted exercised),
    and the plan must be broadcast anti-joins — no cartesian.  The
    B-side predicate is key-determined on purpose: this table carries
    duplicate (orderkey, linenumber) keys, so a row-identity delete is
    ill-defined and the first (l_partkey-keyed) cut removed all copies
    of keys the filter kept — the oracle caught it."""
    from pyspark.sql import functions as F

    from changegen_spark.queries.mv import (
        DELETE_PRED,
        DELETE_PRED_B,
        q_mv_join_delete,
    )
    from changegen_spark.sources.tables import load_table

    rows = q_mv_join_delete(spark, sf_dir).collect()
    assert rows and all(r.consistent == 1 for r in rows)

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.expr(f"CAST({DELETE_PRED} AS INT)").alias("a_del")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.expr(f"CAST({DELETE_PRED_B} AS INT)").alias("b_del"),
    )
    both = o.join(li, "o_orderkey").filter("a_del = 1 AND b_del = 1")
    assert both.count() > 0, "both-sides-deleted rows must exist"

    plan = (
        q_mv_join_delete(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan


def test_mv_join_update_upsert_exact_and_both_sides_exercised(
    spark, sf_dir
):
    """The CDC-update upsert (r13): delete+insert through the delta-join
    algebra must equal the post-update recompute on every group
    (consistent=1), rows whose A AND B images BOTH updated must exist
    (the double-update row must come back exactly once with both new
    values — the overlap the decomposition's second term deliberately
    excludes), the updated-priority and updated-flag groups must be
    non-empty, and the plan must be broadcast anti-joins."""
    from pyspark.sql import functions as F

    from changegen_spark.queries.mv import (
        UPDATE_PRED_A,
        UPDATE_PRED_B,
        UPDATED_FLAG,
        UPDATED_PRIORITY,
        q_mv_join_update,
    )
    from changegen_spark.sources.tables import load_table

    rows = q_mv_join_update(spark, sf_dir).collect()
    assert rows and all(r.consistent == 1 for r in rows)
    # both new-image groups are served from the maintained view
    assert any(
        r.o_orderpriority == UPDATED_PRIORITY and r.n_inc > 0 for r in rows
    )
    assert any(r.l_returnflag == UPDATED_FLAG and r.n_inc > 0 for r in rows)
    # and their intersection (A and B updated on the same view row)
    assert any(
        r.o_orderpriority == UPDATED_PRIORITY
        and r.l_returnflag == UPDATED_FLAG
        and r.n_inc > 0
        for r in rows
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.expr(f"CAST({UPDATE_PRED_A} AS INT)").alias("a_upd")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.expr(f"CAST({UPDATE_PRED_B} AS INT)").alias("b_upd"),
    )
    both = o.join(li, "o_orderkey").filter("a_upd = 1 AND b_upd = 1")
    assert both.count() > 0, "double-updated view rows must exist"

    plan = (
        q_mv_join_update(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan
