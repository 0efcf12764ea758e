"""Relational operator inventory queries (SURVEY §2.1-§2.6, §2.8, §2.9).

TPC-H-shaped workloads over the driver tables, each exercising a family from
the survey: scans+aggregate (A4/A5), equi/semi/anti joins (J-family analogs),
distinct (A1/A2), top-k frequency (A6), global id sequencing (W1), cumulative
windows (W2 analog), way chunking (W3 analog), tag unpivot (P1), change
assembly (C1-C5), deletion expansion (C5/A7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from changegen_spark.operators.ids import assign_sequential_ids
from changegen_spark.operators.ways import CHUNK_SIZE_DEFAULT  # noqa: F401  (doc link)
from changegen_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def cents(col):
    """Exact scaled-integer money: round(x*100) as BIGINT."""
    return F.round(col * 100).cast("long")


# --- q01: scan + groupBy aggregate (TPC-H Q1 shape; A-family, P3 filter) ---

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    tax_pct = F.round(F.col("l_tax") * 100).cast("long")
    ext_c = cents(F.col("l_extendedprice"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(ext_c).alias("sum_base_cents"),
            F.sum(ext_c * (100 - disc_pct)).alias("sum_disc_price_e4"),
            F.sum(ext_c * (100 - disc_pct) * (100 + tax_pct)).alias("sum_charge_e6"),
            F.round(F.avg(F.col("l_quantity").cast("long")), 6).alias("avg_qty"),
            F.round(F.avg(ext_c) / 100, 6).alias("avg_price"),
            F.round(F.avg(disc_pct) / 100, 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_price_e4,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) * (100 + CAST(round(l_tax*100) AS BIGINT))) AS BIGINT) AS sum_charge_e6,
       round(avg(CAST(l_quantity AS BIGINT)), 6) AS avg_qty,
       round(avg(CAST(round(l_extendedprice*100) AS BIGINT)) / 100, 6) AS avg_price,
       round(avg(CAST(round(l_discount*100) AS BIGINT)) / 100, 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- q03: 3-way equi-join + agg + top-k (J-family, A6, sorts/limits §2.6) ---

def q03_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    rev = cents(F.col("l_extendedprice")) * (100 - disc_pct)
    # Join order matters at scale (r7 verdict #4): filter orders through
    # the BUILDING-customer join FIRST, so the expensive lineitem join
    # probes only the ~1/5 of orders that survive — not all of them.
    # Catalyst does not reorder across the aggregate boundary here, so
    # the order is explicit.  No broadcast HINT: at sf the planner
    # broadcasts the filtered customers by size anyway, but at 100 TB the
    # BUILDING slice is billions of rows — a forced broadcast would blow
    # the 8 GB/512M-row cap, while size-based planning (plus AQE) picks
    # sort-merge there (guide §3.1: hint only what cannot be inferred).
    building_orders = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    )
    return (
        li.join(building_orders, li.l_orderkey == building_orders.o_orderkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .agg(F.sum(rev).alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), F.asc("l_orderkey"))
        .limit(10)
    )


Q03_SQL = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, orderdate
ORDER BY revenue_e4 DESC, l_orderkey ASC
LIMIT 10
"""


# --- q05: 6-table join, broadcast dims (J-family; optimizer showcase) ---

def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    rev = cents(F.col("l_extendedprice")) * (100 - disc_pct)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(cust.c_nationkey == sup.s_nationkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(rev).alias("revenue_e4"), F.count("*").alias("n_items"))
        .orderBy("r_name", "n_name")
    )


Q05_SQL = """
SELECT r_name, n_name,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_e4,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


# --- semi/anti joins (J2 analog, J5 missing-id analog) ---

def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


Q_SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
ORDER BY c_custkey
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no high-value order — J5's missing-id reporting shape
    (changegen/generator.py:820-822) as a left_anti join."""
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


Q_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000)
ORDER BY c_custkey
"""


# --- distinct + top-k frequency (A1/A2, A6) ---

def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    )


Q_DISTINCT_SQL = """
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
ORDER BY o_orderstatus, o_orderpriority
"""


def q_topk_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A6: Counter(...).most_common(20) analog (changegen/generator.py:870-871)
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("l_partkey"))
        .limit(20)
    )


Q_TOPK_SQL = """
SELECT l_partkey, count(*) AS n FROM lineitem
GROUP BY l_partkey ORDER BY n DESC, l_partkey ASC LIMIT 20
"""


def q_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (top-3 lineitems by price within each
    (returnflag, linestatus) group, total tie-break) — written as the
    rank<=k window filter so Catalyst's WindowGroupLimit kicks in: each
    map task keeps only its local top-3 per group BEFORE the exchange, so
    the shuffle carries O(k x groups x partitions) rows instead of the
    whole table (plan-pinned in tests/test_plans.py).  The naive shape —
    shuffle everything, sort, filter — dies first at 100 TB; this is the
    built-in partial top-k the brief's "partial aggregation" asks for,
    applied to ordered selection."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag", "l_linestatus").orderBy(
        F.desc("price_cents"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        li.select(
            "l_returnflag",
            "l_linestatus",
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .orderBy("l_returnflag", "l_linestatus", "rk")
    )


Q_GROUP_TOPK_SQL = """
WITH t AS (
  SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
  FROM lineitem
), r AS (
  SELECT *, row_number() OVER (PARTITION BY l_returnflag, l_linestatus
             ORDER BY price_cents DESC, l_orderkey, l_linenumber) AS rk
  FROM t
)
SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, price_cents, rk
FROM r WHERE rk <= 3 ORDER BY l_returnflag, l_linestatus, rk
"""


# --- max-id aggregate (A4 / C6 guard input, changegen/__main__.py:26-53) ---

def q_max_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").agg(
        F.lit("orders").alias("tbl"), F.max("o_orderkey").alias("max_id")
    )
    cust = _t(spark, sf_dir, "customer").agg(
        F.lit("customer").alias("tbl"), F.max("c_custkey").alias("max_id")
    )
    part = _t(spark, sf_dir, "part").agg(
        F.lit("part").alias("tbl"), F.max("p_partkey").alias("max_id")
    )
    return orders.unionByName(cust).unionByName(part).orderBy("tbl")


Q_MAXIDS_SQL = """
SELECT 'orders' AS tbl, max(o_orderkey) AS max_id FROM orders
UNION ALL SELECT 'customer', max(c_custkey) FROM customer
UNION ALL SELECT 'part', max(p_partkey) FROM part
ORDER BY tbl
"""


# --- W1: global dense id assignment with offset ---

def q_global_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    out = assign_sequential_ids(
        part, order_by=["p_partkey"], out_col="new_id", id_offset=1_000_000
    )
    return out.select("p_partkey", "new_id").orderBy("p_partkey")


Q_GLOBAL_IDS_SQL = """
SELECT p_partkey,
       1000000 + CAST(row_number() OVER (ORDER BY p_partkey) AS BIGINT) AS new_id
FROM part WHERE p_size >= 40
ORDER BY p_partkey
"""


def q_global_ids_negative(spark: SparkSession, sf_dir: str) -> DataFrame:
    # --neg_id parity (changegen/__main__.py:116-123)
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 45)
    out = assign_sequential_ids(
        part, order_by=["p_partkey"], out_col="new_id", id_offset=0, negative=True
    )
    return out.select("p_partkey", "new_id").orderBy("p_partkey")


Q_GLOBAL_IDS_NEG_SQL = """
SELECT p_partkey,
       -CAST(row_number() OVER (ORDER BY p_partkey) AS BIGINT) AS new_id
FROM part WHERE p_size >= 45
ORDER BY p_partkey
"""


# --- W2 analog: cumulative fractional position within a group ---

def q_cumulative_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    qty = F.col("l_quantity").cast("long")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    tot = Window.partitionBy("l_orderkey")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.sum(qty).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_qty"),
            F.sum(qty).over(tot).alias("total_qty"),
        )
        .withColumn("frac", F.round(F.col("cum_qty") / F.col("total_qty"), 6))
        .orderBy("l_orderkey", "l_linenumber")
    )


Q_CUMFRAC_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(sum(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_qty,
       CAST(sum(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_orderkey) AS BIGINT) AS total_qty,
       round(CAST(sum(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
            / CAST(sum(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_orderkey) AS DOUBLE), 6) AS frac
FROM lineitem WHERE l_orderkey % 100 = 0
ORDER BY l_orderkey, l_linenumber
"""


# --- W3 analog: chunk assignment with shared boundary (way splitting) ---

def q_way_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk each order's lineitems into groups of ≤3 with the boundary row
    shared (appears in both adjacent chunks) — the relational shadow of
    way splitting (changegen/generator.py:258-304)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    pos = F.row_number().over(w) - 1  # 0-based position within way
    base = li.select("l_orderkey", "l_linenumber", pos.alias("pos"))
    own = base.withColumn("chunk", F.floor(F.col("pos") / 3).cast("int"))
    # boundary rows (last of chunk k, pos % 3 == 2, not the final row) also
    # belong to chunk k+1
    n = Window.partitionBy("l_orderkey")
    dup = (
        base.withColumn("maxpos", F.max("pos").over(n))
        .filter((F.col("pos") % 3 == 2) & (F.col("pos") < F.col("maxpos")))
        .withColumn("chunk", F.floor(F.col("pos") / 3).cast("int") + 1)
        .drop("maxpos")
    )
    return (
        own.unionByName(dup)
        .groupBy("l_orderkey", "chunk")
        .agg(F.count("*").alias("n_nodes"), F.min("pos").alias("first_pos"), F.max("pos").alias("last_pos"))
        .orderBy("l_orderkey", "chunk")
    )


Q_WAY_CHUNK_SQL = """
WITH base AS (
  SELECT l_orderkey, l_linenumber,
         CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1 AS BIGINT) AS pos
  FROM lineitem WHERE l_orderkey % 50 = 0
), own AS (
  SELECT l_orderkey, pos, CAST(pos // 3 AS INT) AS chunk FROM base
), dup AS (
  SELECT b.l_orderkey, b.pos, CAST(b.pos // 3 AS INT) + 1 AS chunk
  FROM base b
  JOIN (SELECT l_orderkey, max(pos) AS maxpos FROM base GROUP BY l_orderkey) m
    ON b.l_orderkey = m.l_orderkey
  WHERE b.pos % 3 = 2 AND b.pos < m.maxpos
), unioned AS (
  SELECT * FROM own UNION ALL SELECT * FROM dup
)
SELECT l_orderkey, chunk, count(*) AS n_nodes,
       CAST(min(pos) AS BIGINT) AS first_pos, CAST(max(pos) AS BIGINT) AS last_pos
FROM unioned GROUP BY l_orderkey, chunk
ORDER BY l_orderkey, chunk
"""


# --- P1: tag unpivot with exclusion list ---

def q_tag_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every column (minus excludes) becomes a (key, value-as-string) tag row
    (changegen/generator.py:169-205)."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    tag_cols = ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"]
    exclude = ("p_retailprice",)  # exclusion-list parity
    kept = [c for c in tag_cols if c not in exclude]
    pairs = F.array(
        *[
            F.struct(F.lit(c).alias("key"), F.col(c).cast("string").alias("value"))
            for c in kept
        ]
    )
    return (
        part.select("p_partkey", F.explode(pairs).alias("t"))
        .select("p_partkey", F.col("t.key").alias("key"), F.col("t.value").alias("value"))
        .filter(F.col("value").isNotNull() & (F.col("value") != ""))
        .orderBy("p_partkey", "key")
    )


Q_TAG_UNPIVOT_SQL = """
SELECT p_partkey, key, value FROM (
  SELECT p_partkey, 'p_name' AS key, CAST(p_name AS VARCHAR) AS value FROM part WHERE p_partkey <= 200
  UNION ALL SELECT p_partkey, 'p_brand', CAST(p_brand AS VARCHAR) FROM part WHERE p_partkey <= 200
  UNION ALL SELECT p_partkey, 'p_type', CAST(p_type AS VARCHAR) FROM part WHERE p_partkey <= 200
  UNION ALL SELECT p_partkey, 'p_size', CAST(p_size AS VARCHAR) FROM part WHERE p_partkey <= 200
) WHERE value IS NOT NULL AND value != ''
ORDER BY p_partkey, key
"""


# --- C1-C5: change assembly + deletion expansion ---

def q_change_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC change-set assembly: orders partitioned into create/modify/delete
    by status, with the version contract (create=1, modify=2, delete=99) and
    the C5 deletion flow dedup (changegen/generator.py:876-927)."""
    from changegen_spark.operators.changes import assemble_changeset, tag_change

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    base = orders.select(F.col("o_orderkey").alias("id"), "o_orderstatus")
    create = tag_change(base.filter(F.col("o_orderstatus") == "O").drop("o_orderstatus"), "create")
    modify = tag_change(base.filter(F.col("o_orderstatus") == "P").drop("o_orderstatus"), "modify")
    delete = tag_change(
        base.filter(F.col("o_orderstatus") == "F").drop("o_orderstatus").distinct(), "delete"
    )
    return (
        assemble_changeset(create, modify, delete)
        .select("change_type", "id", "version")
        .orderBy("change_type", "id")
    )


Q_CHANGE_ASSEMBLY_SQL = """
SELECT change_type, id, version FROM (
  SELECT 'create' AS change_type, o_orderkey AS id, 1 AS version FROM orders
   WHERE o_orderkey % 20 = 0 AND o_orderstatus = 'O'
  UNION ALL
  SELECT 'modify', o_orderkey, 2 FROM orders
   WHERE o_orderkey % 20 = 0 AND o_orderstatus = 'P'
  UNION ALL
  SELECT DISTINCT 'delete', o_orderkey, 99 FROM orders
   WHERE o_orderkey % 20 = 0 AND o_orderstatus = 'F'
)
ORDER BY change_type, id
"""


def q_delete_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 + A7: deletion id list → expand to constituent line ids via join,
    dedup — ways→nodes expansion analog (generator.py:903-923)."""
    deleted = (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 40 == 0))
        .select(F.col("o_orderkey").alias("id"))
        .distinct()
    )
    li = _t(spark, sf_dir, "lineitem")
    nodes = (
        deleted.join(li, deleted.id == li.l_orderkey)
        .select(F.col("l_partkey").alias("node_id"))
        .distinct()
    )
    ways = deleted.select(F.lit("way").alias("kind"), F.col("id").alias("elem_id"))
    node_rows = nodes.select(F.lit("node").alias("kind"), F.col("node_id").alias("elem_id"))
    return ways.unionByName(node_rows).orderBy("kind", "elem_id")


Q_DELETE_EXPANSION_SQL = """
WITH deleted AS (
  SELECT DISTINCT o_orderkey AS id FROM orders
  WHERE o_orderstatus = 'F' AND o_orderkey % 40 = 0
)
SELECT 'way' AS kind, id AS elem_id FROM deleted
UNION ALL
SELECT DISTINCT 'node', l_partkey FROM deleted JOIN lineitem ON id = l_orderkey
ORDER BY kind, elem_id
"""


# --- S6 replacement: id-list lookup as a join (anti-pattern fix) ---

def q_id_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference fetches one row per id in a loop (changegen/db.py:76-83,
    generator.py:806-815); the Spark-native form is a single broadcast join
    of the id list."""
    ids = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 997 == 0)
        .select(F.col("o_orderkey").alias("id"))
    )
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(ids), orders.o_orderkey == ids.id, "left_semi")
        .select("o_orderkey", "o_custkey", "o_orderstatus", F.round(F.col("o_totalprice"), 2).alias("o_totalprice"))
        .orderBy("o_orderkey")
    )


Q_ID_LOOKUP_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
FROM orders WHERE o_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 997 = 0)
ORDER BY o_orderkey
"""


# --- generic snapshot diff (the CDC abstraction of §2.9) ---

def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two deterministic snapshots of orders → change set via
    operators.diff.diff_tables (full-outer join + map-side row hash):
    %7==0 keys exist only in new (create), %5==0 only in old (delete),
    %3==0 carry a modified priority (modify)."""
    from changegen_spark.operators.diff import diff_tables

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        cents(F.col("o_totalprice")).alias("price_cents"),
    )
    old = orders.filter(F.col("o_orderkey") % 7 != 0)
    new = orders.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("0-RERATED")).otherwise(
            F.col("o_orderpriority")
        ),
    )
    return diff_tables(old, new, key="o_orderkey").orderBy("o_orderkey")


Q_SNAPSHOT_DIFF_SQL = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority,
         CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
  FROM orders
), old AS (
  SELECT * FROM base WHERE o_orderkey % 7 != 0
), new AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 3 = 0 THEN '0-RERATED' ELSE o_orderpriority END AS o_orderpriority,
         price_cents
  FROM base WHERE o_orderkey % 5 != 0
)
SELECT coalesce(new.o_orderkey, old.o_orderkey) AS o_orderkey,
       CASE WHEN old.o_orderkey IS NULL THEN 'create'
            WHEN new.o_orderkey IS NULL THEN 'delete'
            ELSE 'modify' END AS change_type,
       CASE WHEN old.o_orderkey IS NULL THEN 1
            WHEN new.o_orderkey IS NULL THEN 99
            ELSE 2 END AS version,
       CASE WHEN new.o_orderkey IS NULL THEN old.o_orderstatus ELSE new.o_orderstatus END AS o_orderstatus,
       CASE WHEN new.o_orderkey IS NULL THEN old.o_orderpriority ELSE new.o_orderpriority END AS o_orderpriority,
       CASE WHEN new.o_orderkey IS NULL THEN old.price_cents ELSE new.price_cents END AS price_cents
FROM old FULL OUTER JOIN new USING (o_orderkey)
WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
   OR (old.o_orderstatus IS DISTINCT FROM new.o_orderstatus)
   OR (old.o_orderpriority IS DISTINCT FROM new.o_orderpriority)
   OR (old.price_cents IS DISTINCT FROM new.price_cents)
ORDER BY o_orderkey
"""


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q_snapshot_diff": q_snapshot_diff,
    "q03_top_orders": q03_top_orders,
    "q05_region_revenue": q05_region_revenue,
    "q_semi_join": q_semi_join,
    "q_anti_join": q_anti_join,
    "q_distinct": q_distinct,
    "q_topk_freq": q_topk_freq,
    "q_group_topk": q_group_topk,
    "q_max_ids": q_max_ids,
    "q_global_ids": q_global_ids,
    "q_global_ids_negative": q_global_ids_negative,
    "q_cumulative_fraction": q_cumulative_fraction,
    "q_way_chunking": q_way_chunking,
    "q_tag_unpivot": q_tag_unpivot,
    "q_change_assembly": q_change_assembly,
    "q_delete_expansion": q_delete_expansion,
    "q_id_lookup_join": q_id_lookup_join,
}

ORACLES = {
    "q01_pricing_summary": Q01_SQL,
    "q_snapshot_diff": Q_SNAPSHOT_DIFF_SQL,
    "q03_top_orders": Q03_SQL,
    "q05_region_revenue": Q05_SQL,
    "q_semi_join": Q_SEMI_SQL,
    "q_anti_join": Q_ANTI_SQL,
    "q_distinct": Q_DISTINCT_SQL,
    "q_topk_freq": Q_TOPK_SQL,
    "q_group_topk": Q_GROUP_TOPK_SQL,
    "q_max_ids": Q_MAXIDS_SQL,
    "q_global_ids": Q_GLOBAL_IDS_SQL,
    "q_global_ids_negative": Q_GLOBAL_IDS_NEG_SQL,
    "q_cumulative_fraction": Q_CUMFRAC_SQL,
    "q_way_chunking": Q_WAY_CHUNK_SQL,
    "q_tag_unpivot": Q_TAG_UNPIVOT_SQL,
    "q_change_assembly": Q_CHANGE_ASSEMBLY_SQL,
    "q_delete_expansion": Q_DELETE_EXPANSION_SQL,
    "q_id_lookup_join": Q_ID_LOOKUP_SQL,
}
