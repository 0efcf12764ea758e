"""Additional TPC-H-shaped query patterns: correlated EXISTS, HAVING,
outer-join distributions, NOT IN, min-per-group join-back — the relational
shapes a "complete" engine must plan well (all broadcast/semi-join
friendly; Catalyst decorrelates the subqueries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changegen_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --- Q4 shape: EXISTS subquery → semi join ---

def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    # TPC-H Q4's EXISTS predicate is l_commitdate < l_receiptdate; this
    # schema lacks those columns — "shipped after 2000-06-01" keeps the
    # same decorrelated-EXISTS plan shape
    late = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "2000-06-01")
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q04_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '2000-06-01')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- Q13 shape: outer join + distribution of counts ---

def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority != '1-URGENT'
  GROUP BY c_custkey
) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


# --- Q18 shape: HAVING over a grouped join ---

def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(50)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(total_qty AS BIGINT) AS total_qty
FROM (
  SELECT l_orderkey, sum(CAST(l_quantity AS BIGINT)) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING total_qty > 150
) JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey ASC LIMIT 50
"""


# --- Q16 shape: NOT IN (anti join) + count distinct ---

def q16_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_size").isin(5, 10, 15, 20))
    bad_supp = _t(spark, sf_dir, "supplier").filter(
        F.col("s_name").contains("7")
    )
    psupp = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    ok = psupp.join(
        bad_supp, psupp.l_suppkey == bad_supp.s_suppkey, "left_anti"
    )
    return (
        part.join(ok, part.p_partkey == ok.l_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_size"))
    )


Q16_SQL = """
SELECT p_brand, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_size IN (5, 10, 15, 20)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7%')
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_size ASC
"""


# --- Q2 shape: min-per-group join-back (argmin via self-join) ---

def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest supplier per part (price proxy: s_acctbal-min): the
    min-per-group + join-back decorrelation pattern."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    supp = _t(spark, sf_dir, "supplier")
    ps = li.join(supp, li.l_suppkey == supp.s_suppkey).select(
        "l_partkey", "l_suppkey", F.round("s_acctbal", 2).alias("bal")
    )
    mins = ps.groupBy("l_partkey").agg(F.min("bal").alias("min_bal"))
    return (
        ps.join(mins, "l_partkey")
        .filter(F.col("bal") == F.col("min_bal"))
        .filter(F.col("l_partkey") % 20 == 0)
        .select("l_partkey", "l_suppkey", "bal")
        .orderBy("l_partkey", "l_suppkey")
    )


Q02_SQL = """
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), priced AS (
  SELECT l_partkey, l_suppkey, round(s_acctbal, 2) AS bal
  FROM ps JOIN supplier ON l_suppkey = s_suppkey
)
SELECT l_partkey, l_suppkey, bal FROM priced p
WHERE bal = (SELECT min(bal) FROM priced m WHERE m.l_partkey = p.l_partkey)
  AND l_partkey % 20 = 0
ORDER BY l_partkey, l_suppkey
"""


# --- Q6 shape: pure scan + filter + agg (pushdown showcase) ---

def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: single-table scan with every predicate pushable to the
    parquet reader; the whole query is one map-side partial sum.  Money in
    exact cents×discount-percent units (e4)."""
    from changegen_spark.queries.relational import cents

    li = _t(spark, sf_dir, "lineitem")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    out = li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & disc_pct.between(5, 7)
        & (F.col("l_quantity") < 24)
    ).agg(F.sum(cents(F.col("l_extendedprice")) * disc_pct).alias("revenue_e4"))
    return out


Q06_SQL = """
SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                * CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS revenue_e4
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


# --- Q10 shape: 4-way join + top-k by aggregated revenue ---

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue per customer over one quarter —
    fact-fact equi-join on orderkey, broadcast dims (customer, nation),
    top-20 with a total tie-break order."""
    from changegen_spark.queries.relational import cents

    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(cents(F.col("l_extendedprice")) * (100 - disc_pct)).alias("revenue_e4"))
    )
    return (
        rev.join(cust, rev.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .select(
            F.col("c_custkey"),
            F.col("c_name"),
            F.col("revenue_e4"),
            cents(F.col("c_acctbal")).alias("acctbal_cents"),
            F.col("n_name"),
        )
        .orderBy(F.desc("revenue_e4"), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_e4,
       CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents,
       n_name
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue_e4 DESC, c_custkey
LIMIT 20
"""


# --- Q14 shape: join + conditional aggregation ratio ---

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share for one month — lineitem×part
    broadcast join, conditional sum, ratio computed from exact integer
    sums (float division of exact longs is deterministic)."""
    from changegen_spark.queries.relational import cents

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    part = _t(spark, sf_dir, "part")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    rev = cents(F.col("l_extendedprice")) * (100 - disc_pct)
    out = (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0))).alias(
                "promo_revenue_e4"
            ),
            F.sum(rev).alias("total_revenue_e4"),
        )
        .select(
            "promo_revenue_e4",
            "total_revenue_e4",
            F.round(100.0 * F.col("promo_revenue_e4") / F.col("total_revenue_e4"), 6).alias(
                "promo_pct"
            ),
        )
    )
    return out


Q14_SQL = """
WITH agg AS (
  SELECT
    CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                  THEN CAST(round(l_extendedprice*100) AS BIGINT)
                       * (100 - CAST(round(l_discount*100) AS BIGINT))
                  ELSE 0 END) AS BIGINT) AS promo_revenue_e4,
    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
             * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS total_revenue_e4
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
)
SELECT promo_revenue_e4, total_revenue_e4,
       round(100.0 * promo_revenue_e4 / total_revenue_e4, 6) AS promo_pct
FROM agg
"""


QUERIES = {
    "q02_min_cost_supplier": q02_min_cost_supplier,
    "q04_order_priority": q04_order_priority,
    "q13_customer_distribution": q13_customer_distribution,
    "q16_part_supplier": q16_part_supplier,
    "q18_large_orders": q18_large_orders,
    "q06_forecast_revenue": q06_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "q14_promo_revenue": q14_promo_revenue,
}

ORACLES = {
    "q02_min_cost_supplier": Q02_SQL,
    "q04_order_priority": Q04_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q16_part_supplier": Q16_SQL,
    "q18_large_orders": Q18_SQL,
    "q06_forecast_revenue": Q06_SQL,
    "q10_returned_items": Q10_SQL,
    "q14_promo_revenue": Q14_SQL,
}
