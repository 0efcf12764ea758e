"""Incremental materialized-view maintenance (r6 new family).

The 100 TB pattern behind every serving-layer aggregate: keep a
materialized per-group summary current as data arrives WITHOUT
rescanning the base table.  The snapshot tables make the scenario
reproducible — orders before a date cutoff are "the base the MV was
built from", orders on/after it are "the delta that arrived since":

* ``q_mv_refresh``       — insert-only refresh: aggregate the DELTA
  alone, full-outer-merge it into the MV by group key (count/sum are
  self-decomposable: merged = mv + delta).  The refreshed view is
  emitted next to a from-scratch recomputation and a per-group
  consistency flag — the query result itself carries the proof that
  the incremental path equals the full rescan.
* ``q_mv_delete_repair`` — deletes break pure merging for min/max-style
  aggregates (removing the max row needs a look at what remains), so
  production systems repair by recomputing ONLY the groups that lost
  rows.  A deterministic subset of the base is "deleted"; affected
  groups are recomputed from the remaining base rows, untouched groups
  are served verbatim from the MV, and the consistency flag again
  rides in the result.

100 TB shape: the delta aggregate shuffles |delta| rows; the merge
joins two GROUP-CARDINALITY frames (KB-to-MB — broadcastable); the
delete repair rescans only the affected groups' partitions (a semi-join
pushes the group filter to the base scan).  Nothing in either path
touches the full base table except the audit columns, which exist
precisely to prove the shortcut honest and are dropped in production.

Cross-engine: money stays in BIGINT cents throughout — every emitted
aggregate is integer-exact, so the audit equality is bit-level, not
approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changegen_spark.sources.tables import load_table

CUTOFF = "1997-01-01"  # orders before -> MV base; on/after -> delta
# deterministic "deleted rows": a pseudo-random 1/7 of base orders
DELETE_PRED = "o_orderkey % 7 = 3"


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        (F.col("o_orderdate") < CUTOFF).alias("is_base"),
    )


def _agg(df: DataFrame) -> DataFrame:
    return df.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.sum("cents").alias("sum_cents")
    )


def q_mv_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert-only incremental refresh with its own audit: per group,
    the merged (mv + delta-aggregate) counts/sums, the from-scratch
    recomputation, and consistent=1 iff they agree."""
    o = _orders(spark, sf_dir)
    mv = _agg(o.filter("is_base"))
    delta = _agg(o.filter("NOT is_base"))
    merged = (
        mv.selectExpr(
            "o_orderpriority", "n AS n_mv", "sum_cents AS sum_mv"
        )
        .join(
            delta.selectExpr(
                "o_orderpriority", "n AS n_delta", "sum_cents AS sum_delta"
            ),
            "o_orderpriority",
            "full_outer",
        )
        .selectExpr(
            "o_orderpriority",
            "coalesce(n_mv, 0) + coalesce(n_delta, 0) AS n_inc",
            "coalesce(sum_mv, 0) + coalesce(sum_delta, 0) AS sum_inc",
        )
    )
    full = _agg(o).selectExpr(
        "o_orderpriority", "n AS n_full", "sum_cents AS sum_full"
    )
    return (
        merged.join(full, "o_orderpriority", "full_outer")
        .selectExpr(
            "o_orderpriority",
            "n_inc",
            "sum_inc",
            "n_full",
            "sum_full",
            "CAST(n_inc = n_full AND sum_inc = sum_full AS INT) AS consistent",
        )
        .orderBy("o_orderpriority")
    )


_ORDERS_CTE = f"""
o AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderdate < '{CUTOFF}' AS is_base
  FROM orders
)
"""


Q_MV_REFRESH_SQL = f"""
WITH {_ORDERS_CTE},
mv AS (
  SELECT o_orderpriority, count(*) AS n_mv, CAST(sum(cents) AS BIGINT) AS sum_mv
  FROM o WHERE is_base GROUP BY o_orderpriority
), delta AS (
  SELECT o_orderpriority, count(*) AS n_delta, CAST(sum(cents) AS BIGINT) AS sum_delta
  FROM o WHERE NOT is_base GROUP BY o_orderpriority
), merged AS (
  SELECT o_orderpriority,
         coalesce(n_mv, 0) + coalesce(n_delta, 0) AS n_inc,
         coalesce(sum_mv, 0) + coalesce(sum_delta, 0) AS sum_inc
  FROM mv FULL OUTER JOIN delta USING (o_orderpriority)
), full_agg AS (
  SELECT o_orderpriority, count(*) AS n_full, CAST(sum(cents) AS BIGINT) AS sum_full
  FROM o GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       CAST(n_inc AS BIGINT) AS n_inc, CAST(sum_inc AS BIGINT) AS sum_inc,
       CAST(n_full AS BIGINT) AS n_full, sum_full,
       CAST(n_inc = n_full AND sum_inc = sum_full AS INT) AS consistent
FROM merged FULL OUTER JOIN full_agg USING (o_orderpriority)
ORDER BY o_orderpriority
"""


def q_mv_delete_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete repair by affected-group recompute: the MV additionally
    tracks max_cents (NOT mergeable under deletes).  A deterministic 1/7
    of base rows is deleted; groups that lost rows are recomputed from
    the surviving base rows only, untouched groups serve the MV row
    verbatim.  Emitted next to the from-scratch answer + flag.

    (On this grouping every priority class loses rows, so all groups
    take the repair path — the point the audit proves is equality of
    the repair computation, not which groups dodge it; the group-id
    semi-join shape is what scales when most groups DO dodge it.)"""
    o = _orders(spark, sf_dir).filter("is_base")
    mv = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("sum_cents"),
        F.max("cents").alias("max_cents"),
    )
    surviving = o.filter(f"NOT ({DELETE_PRED})")
    affected = (
        o.filter(DELETE_PRED).select("o_orderpriority").distinct()
    )
    repaired_affected = (
        surviving.join(affected, "o_orderpriority", "left_semi")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_rep"),
            F.sum("cents").alias("sum_rep"),
            F.max("cents").alias("max_rep"),
        )
    )
    untouched = mv.join(affected, "o_orderpriority", "left_anti").selectExpr(
        "o_orderpriority", "n AS n_rep", "sum_cents AS sum_rep",
        "max_cents AS max_rep",
    )
    repaired = repaired_affected.unionByName(untouched)
    full = surviving.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_full"),
        F.sum("cents").alias("sum_full"),
        F.max("cents").alias("max_full"),
    )
    return (
        repaired.join(full, "o_orderpriority", "full_outer")
        .selectExpr(
            "o_orderpriority",
            "n_rep",
            "sum_rep",
            "max_rep",
            "n_full",
            "sum_full",
            "max_full",
            "CAST(n_rep = n_full AND sum_rep = sum_full "
            "AND max_rep = max_full AS INT) AS consistent",
        )
        .orderBy("o_orderpriority")
    )


Q_MV_DELETE_REPAIR_SQL = f"""
WITH {_ORDERS_CTE},
base AS (SELECT * FROM o WHERE is_base),
mv AS (
  SELECT o_orderpriority, count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents,
         max(cents) AS max_cents
  FROM base GROUP BY o_orderpriority
), surviving AS (SELECT * FROM base WHERE NOT ({DELETE_PRED})),
affected AS (SELECT DISTINCT o_orderpriority FROM base WHERE {DELETE_PRED}),
repaired AS (
  SELECT s.o_orderpriority, count(*) AS n_rep,
         CAST(sum(s.cents) AS BIGINT) AS sum_rep, max(s.cents) AS max_rep
  FROM surviving s SEMI JOIN affected a ON s.o_orderpriority = a.o_orderpriority
  GROUP BY s.o_orderpriority
  UNION ALL
  SELECT mv.o_orderpriority, mv.n, mv.sum_cents, mv.max_cents
  FROM mv ANTI JOIN affected a ON mv.o_orderpriority = a.o_orderpriority
), full_agg AS (
  SELECT o_orderpriority, count(*) AS n_full,
         CAST(sum(cents) AS BIGINT) AS sum_full, max(cents) AS max_full
  FROM surviving GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       CAST(n_rep AS BIGINT) AS n_rep, sum_rep, max_rep,
       CAST(n_full AS BIGINT) AS n_full, sum_full, max_full,
       CAST(n_rep = n_full AND sum_rep = sum_full AND max_rep = max_full AS INT)
         AS consistent
FROM repaired FULL OUTER JOIN full_agg USING (o_orderpriority)
ORDER BY o_orderpriority
"""


def _join_sides(spark: SparkSession, sf_dir: str):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("o_orderdate") < CUTOFF).alias("a_base"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_returnflag",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
        (F.col("l_shipdate") < CUTOFF).alias("b_base"),
    )
    return o, li


def _join_agg(df: DataFrame, prefix: str) -> DataFrame:
    return df.groupBy("o_orderpriority", "l_returnflag").agg(
        F.count("*").alias(f"n_{prefix}"),
        F.sum("cents").alias(f"sum_{prefix}"),
    )


def q_mv_join_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a materialized JOIN view (r12 — the
    family's missing shape: q_mv_refresh maintains an aggregate, but a
    serving-layer join view under inserts to BOTH sides needs the
    classic delta-join decomposition):

        V_new = V_old ∪ ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB

    A = orders (base/delta by o_orderdate), B = lineitem (by
    l_shipdate) — deltas on the two sides are genuinely independent: a
    post-cutoff shipment of a pre-cutoff order exercises A_old⋈ΔB, a
    new order's same-batch shipments exercise ΔA⋈ΔB.  Emitted per
    (priority, returnflag): the incrementally-maintained view's
    count/sum next to a from-scratch recomputation and consistent=1 —
    the result carries the proof the shortcut is exact.

    100 TB shape: each delta term joins exactly ONE delta side (small,
    broadcastable) against a stored table — never base⋈base; V_old is
    the stored view (reconstructed here only so the audit is
    self-contained) and the union is append-only, so the refresh cost
    is |Δ|-proportional.  Money in BIGINT cents — the audit equality is
    bit-level."""
    o, li = _join_sides(spark, sf_dir)
    a_old, d_a = o.filter("a_base"), o.filter("NOT a_base")
    b_old, d_b = li.filter("b_base"), li.filter("NOT b_base")
    v_old = a_old.join(b_old, "o_orderkey")
    delta = (
        d_a.join(b_old, "o_orderkey")
        .unionByName(a_old.join(d_b, "o_orderkey"))
        .unionByName(d_a.join(d_b, "o_orderkey"))
    )
    inc = _join_agg(
        v_old.unionByName(delta).select(
            "o_orderpriority", "l_returnflag", "cents"
        ),
        "inc",
    )
    full = _join_agg(
        o.join(li, "o_orderkey").select(
            "o_orderpriority", "l_returnflag", "cents"
        ),
        "full",
    )
    return (
        inc.join(full, ["o_orderpriority", "l_returnflag"], "full_outer")
        .selectExpr(
            "o_orderpriority",
            "l_returnflag",
            "CAST(n_inc AS BIGINT) AS n_inc",
            "CAST(sum_inc AS BIGINT) AS sum_inc",
            "CAST(n_full AS BIGINT) AS n_full",
            "CAST(sum_full AS BIGINT) AS sum_full",
            "CAST(n_inc = n_full AND sum_inc = sum_full AS INT) AS consistent",
        )
        .orderBy("o_orderpriority", "l_returnflag")
    )


Q_MV_JOIN_REFRESH_SQL = f"""
WITH a AS (
  SELECT o_orderkey, o_orderpriority, o_orderdate < '{CUTOFF}' AS a_base
  FROM orders
), b AS (
  SELECT l_orderkey AS o_orderkey, l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         l_shipdate < '{CUTOFF}' AS b_base
  FROM lineitem
), v AS (
  SELECT a.o_orderpriority, b.l_returnflag, b.cents
  FROM a JOIN b USING (o_orderkey) WHERE a.a_base AND b.b_base
  UNION ALL
  SELECT a.o_orderpriority, b.l_returnflag, b.cents
  FROM a JOIN b USING (o_orderkey) WHERE NOT a.a_base AND b.b_base
  UNION ALL
  SELECT a.o_orderpriority, b.l_returnflag, b.cents
  FROM a JOIN b USING (o_orderkey) WHERE a.a_base AND NOT b.b_base
  UNION ALL
  SELECT a.o_orderpriority, b.l_returnflag, b.cents
  FROM a JOIN b USING (o_orderkey) WHERE NOT a.a_base AND NOT b.b_base
), inc AS (
  SELECT o_orderpriority, l_returnflag,
         count(*) AS n_inc, CAST(sum(cents) AS BIGINT) AS sum_inc
  FROM v GROUP BY 1, 2
), full_v AS (
  SELECT a.o_orderpriority, b.l_returnflag,
         count(*) AS n_full, CAST(sum(cents) AS BIGINT) AS sum_full
  FROM a JOIN b USING (o_orderkey) GROUP BY 1, 2
)
SELECT o_orderpriority, l_returnflag,
       CAST(n_inc AS BIGINT) AS n_inc, sum_inc,
       CAST(n_full AS BIGINT) AS n_full, sum_full,
       CAST(n_inc = n_full AND sum_inc = sum_full AS INT) AS consistent
FROM inc FULL OUTER JOIN full_v USING (o_orderpriority, l_returnflag)
ORDER BY o_orderpriority, l_returnflag
"""


# deterministic "deleted rows" for the join-view delete path: a 1/7 of
# orders (the aggregate path's predicate, reused) and an independent
# ~1/9 of lineitems.  The B-side predicate is a pure function of the
# lineitem KEY — deliberately: the synthetic lineitem table carries
# duplicate (l_orderkey, l_linenumber) keys (11,785 at sf0.01), so a
# row-identity delete is ill-defined there; CDC deletes are KEYED, and
# a key-determined predicate makes "delete the key" and "filter the
# rows" provably the same set (the first cut of this query keyed the
# delete on l_partkey and the anti-join removed all copies of keys the
# filter kept — the oracle caught it)
DELETE_PRED_B = "(l_orderkey * 7 + l_linenumber) % 9 = 4"


def q_mv_join_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete maintenance of the materialized JOIN view (r12, the other
    half of q_mv_join_refresh's differential story): deletes land on
    BOTH base tables, and the maintained view sheds exactly the rows
    that joined a deleted row on EITHER side —

        V_new = V_old ▷ delA(keys) ▷ delB(row keys)

    two ANTI-joins against the stored view with the (small) delete-key
    sets broadcast; the base tables are never re-joined.  Emitted per
    (priority, returnflag): the anti-join-maintained counts/sums next
    to a from-scratch join over the filtered bases, consistent=1 iff
    bit-equal.

    100 TB shape: each anti-join is a BroadcastHashJoin with the delete
    keys as the build side (CDC delete batches are delta-sized); the
    view-sized side streams through map-side.  The full recompute is
    the audit, not the mechanism."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.expr(f"CAST({DELETE_PRED} AS INT)").alias("a_del"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_linenumber",
        "l_returnflag",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
        F.expr(f"CAST({DELETE_PRED_B} AS INT)").alias("b_del"),
    )
    v_old = o.join(li, "o_orderkey")
    del_a = o.filter("a_del = 1").select("o_orderkey")
    del_b = li.filter("b_del = 1").select("o_orderkey", "l_linenumber")
    v_inc = v_old.join(F.broadcast(del_a), "o_orderkey", "left_anti").join(
        F.broadcast(del_b), ["o_orderkey", "l_linenumber"], "left_anti"
    )
    inc = _join_agg(
        v_inc.select("o_orderpriority", "l_returnflag", "cents"), "inc"
    )
    full = _join_agg(
        o.filter("a_del = 0")
        .join(li.filter("b_del = 0"), "o_orderkey")
        .select("o_orderpriority", "l_returnflag", "cents"),
        "full",
    )
    return (
        inc.join(full, ["o_orderpriority", "l_returnflag"], "full_outer")
        .selectExpr(
            "o_orderpriority",
            "l_returnflag",
            "CAST(n_inc AS BIGINT) AS n_inc",
            "CAST(sum_inc AS BIGINT) AS sum_inc",
            "CAST(n_full AS BIGINT) AS n_full",
            "CAST(sum_full AS BIGINT) AS sum_full",
            "CAST(n_inc = n_full AND sum_inc = sum_full AS INT) AS consistent",
        )
        .orderBy("o_orderpriority", "l_returnflag")
    )


Q_MV_JOIN_DELETE_SQL = f"""
WITH a AS (
  SELECT o_orderkey, o_orderpriority,
         CAST({DELETE_PRED} AS INT) AS a_del
  FROM orders
), b AS (
  SELECT l_orderkey AS o_orderkey, l_linenumber, l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST({DELETE_PRED_B} AS INT) AS b_del
  FROM lineitem
), v_inc AS (
  SELECT a.o_orderpriority, b.l_returnflag, b.cents
  FROM a JOIN b USING (o_orderkey)
  WHERE a.a_del = 0 AND b.b_del = 0
), inc AS (
  SELECT o_orderpriority, l_returnflag,
         count(*) AS n_inc, CAST(sum(cents) AS BIGINT) AS sum_inc
  FROM v_inc GROUP BY 1, 2
), full_v AS (
  SELECT a.o_orderpriority, b.l_returnflag,
         count(*) AS n_full, CAST(sum(cents) AS BIGINT) AS sum_full
  FROM a JOIN b USING (o_orderkey)
  WHERE a.a_del = 0 AND b.b_del = 0
  GROUP BY 1, 2
)
SELECT o_orderpriority, l_returnflag,
       CAST(n_inc AS BIGINT) AS n_inc, sum_inc,
       CAST(n_full AS BIGINT) AS n_full, sum_full,
       CAST(n_inc = n_full AND sum_inc = sum_full AS INT) AS consistent
FROM inc FULL OUTER JOIN full_v USING (o_orderpriority, l_returnflag)
ORDER BY o_orderpriority, l_returnflag
"""


# deterministic CDC UPDATE images (r13, r12 verdict #4): a keyed subset
# of each side changes a NON-KEY attribute — the classic delete+insert
# upsert through the view.  Both predicates are pure functions of the
# row KEY (the q_mv_join_delete lesson: CDC updates are keyed, and a
# key-determined predicate makes "update the key" and "map the rows"
# provably the same set).
UPDATE_PRED_A = "o_orderkey % 13 = 3"  # these orders change priority
UPDATE_PRED_B = "(l_orderkey * 5 + l_linenumber) % 11 = 7"  # flag change
UPDATED_PRIORITY = "0-UPDATED"
UPDATED_FLAG = "U"


def q_mv_join_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE maintenance of the materialized JOIN view (r13 — the
    upsert leg q_mv_join_refresh/delete left unexercised): CDC updates
    land on BOTH base tables as keyed new images (an order's priority
    change, a lineitem's returnflag change), and the view is maintained
    as delete+insert through the delta-join algebra —

        V_new = (V_old ▷ updA_keys ▷ updB_rowkeys)
                ∪ (A'_upd ⋈ B') ∪ ((A' ▷ updA_keys) ⋈ B'_upd)

    two broadcast ANTI-joins shed every stored row that touched an
    updated key on either side; the re-insert terms each join one
    UPDATE-sized side (broadcastable) against a stored table, with the
    post-update images A'/B' so a row whose A AND B both updated comes
    back exactly once with both new values.  Emitted per (priority,
    returnflag): the upsert-maintained counts/sums next to a
    from-scratch join over the post-update bases, consistent=1 iff
    bit-equal.

    100 TB shape: CDC update batches are delta-sized — the anti-join
    build sides and both re-insert probe sides broadcast; the stored
    view streams through map-side, and the base tables are re-joined
    only on the updated keys.  The full recompute is the audit, not the
    mechanism."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.expr(f"CAST({UPDATE_PRED_A} AS INT)").alias("a_upd"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_linenumber",
        "l_returnflag",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
        F.expr(f"CAST({UPDATE_PRED_B} AS INT)").alias("b_upd"),
    )
    # post-update images (what the CDC new-image records carry)
    o_new = o.withColumn(
        "o_orderpriority",
        F.when(F.col("a_upd") == 1, F.lit(UPDATED_PRIORITY)).otherwise(
            F.col("o_orderpriority")
        ),
    )
    li_new = li.withColumn(
        "l_returnflag",
        F.when(F.col("b_upd") == 1, F.lit(UPDATED_FLAG)).otherwise(
            F.col("l_returnflag")
        ),
    )
    v_old = o.join(li, "o_orderkey")  # the stored view (pre-update)
    upd_a = o.filter("a_upd = 1").select("o_orderkey")
    upd_b = li.filter("b_upd = 1").select("o_orderkey", "l_linenumber")
    survivors = v_old.join(F.broadcast(upd_a), "o_orderkey", "left_anti").join(
        F.broadcast(upd_b), ["o_orderkey", "l_linenumber"], "left_anti"
    )
    ins_a = o_new.filter("a_upd = 1").join(li_new, "o_orderkey")
    ins_b = o_new.filter("a_upd = 0").join(
        li_new.filter("b_upd = 1"), "o_orderkey"
    )
    cols = ["o_orderpriority", "l_returnflag", "cents"]
    v_inc = (
        survivors.select(*cols)
        .unionByName(ins_a.select(*cols))
        .unionByName(ins_b.select(*cols))
    )
    inc = _join_agg(v_inc, "inc")
    full = _join_agg(o_new.join(li_new, "o_orderkey").select(*cols), "full")
    return (
        inc.join(full, ["o_orderpriority", "l_returnflag"], "full_outer")
        .selectExpr(
            "o_orderpriority",
            "l_returnflag",
            "CAST(n_inc AS BIGINT) AS n_inc",
            "CAST(sum_inc AS BIGINT) AS sum_inc",
            "CAST(n_full AS BIGINT) AS n_full",
            "CAST(sum_full AS BIGINT) AS sum_full",
            "CAST(n_inc = n_full AND sum_inc = sum_full AS INT) AS consistent",
        )
        .orderBy("o_orderpriority", "l_returnflag")
    )


Q_MV_JOIN_UPDATE_SQL = f"""
WITH a AS (
  SELECT o_orderkey, o_orderpriority,
         CAST({UPDATE_PRED_A} AS INT) AS a_upd
  FROM orders
), b AS (
  SELECT l_orderkey AS o_orderkey, l_linenumber, l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST({UPDATE_PRED_B} AS INT) AS b_upd
  FROM lineitem
), a_new AS (
  SELECT o_orderkey,
         CASE WHEN a_upd = 1 THEN '{UPDATED_PRIORITY}'
              ELSE o_orderpriority END AS o_orderpriority,
         a_upd
  FROM a
), b_new AS (
  SELECT o_orderkey, l_linenumber,
         CASE WHEN b_upd = 1 THEN '{UPDATED_FLAG}'
              ELSE l_returnflag END AS l_returnflag,
         cents, b_upd
  FROM b
), v_inc AS (
  -- survivors: stored rows whose keys no update touched (old images)
  SELECT a.o_orderpriority, b.l_returnflag, b.cents
  FROM a JOIN b USING (o_orderkey)
  WHERE a.a_upd = 0 AND b.b_upd = 0
  UNION ALL
  -- re-insert: updated-A keys re-joined against post-update B
  SELECT a_new.o_orderpriority, b_new.l_returnflag, b_new.cents
  FROM a_new JOIN b_new USING (o_orderkey)
  WHERE a_new.a_upd = 1
  UNION ALL
  -- re-insert: updated-B rows whose A did not update
  SELECT a_new.o_orderpriority, b_new.l_returnflag, b_new.cents
  FROM a_new JOIN b_new USING (o_orderkey)
  WHERE a_new.a_upd = 0 AND b_new.b_upd = 1
), inc AS (
  SELECT o_orderpriority, l_returnflag,
         count(*) AS n_inc, CAST(sum(cents) AS BIGINT) AS sum_inc
  FROM v_inc GROUP BY 1, 2
), full_v AS (
  SELECT a_new.o_orderpriority, b_new.l_returnflag,
         count(*) AS n_full, CAST(sum(cents) AS BIGINT) AS sum_full
  FROM a_new JOIN b_new USING (o_orderkey) GROUP BY 1, 2
)
SELECT o_orderpriority, l_returnflag,
       CAST(n_inc AS BIGINT) AS n_inc, sum_inc,
       CAST(n_full AS BIGINT) AS n_full, sum_full,
       CAST(n_inc = n_full AND sum_inc = sum_full AS INT) AS consistent
FROM inc FULL OUTER JOIN full_v USING (o_orderpriority, l_returnflag)
ORDER BY o_orderpriority, l_returnflag
"""


QUERIES = {
    "q_mv_refresh": q_mv_refresh,
    "q_mv_delete_repair": q_mv_delete_repair,
    "q_mv_join_refresh": q_mv_join_refresh,
    "q_mv_join_delete": q_mv_join_delete,
    "q_mv_join_update": q_mv_join_update,
}

ORACLES = {
    "q_mv_refresh": Q_MV_REFRESH_SQL,
    "q_mv_delete_repair": Q_MV_DELETE_REPAIR_SQL,
    "q_mv_join_refresh": Q_MV_JOIN_REFRESH_SQL,
    "q_mv_join_delete": Q_MV_JOIN_DELETE_SQL,
    "q_mv_join_update": Q_MV_JOIN_UPDATE_SQL,
}
