"""Data-quality audit (Deequ-style constraint checks) and market-basket
association rules — the two remaining table-stakes operators of a
production analytics pipeline.

``q_dq_audit`` runs the constraint suite a pipeline gates ingestion on:
primary-key uniqueness, referential integrity across the star schema,
range/domain checks, and derived-column consistency — one row per check
with exact violation counts (integer, engine-exact).

``q_assoc_rules`` mines pairwise association rules from the order
baskets: support, confidence and lift for co-purchased part pairs above
a support floor.  The classic shape: distinct (order, item) → per-order
pair expansion (bounded by basket size squared, NOT by catalog size) →
integer count aggregates; confidence/lift are ratios of exact counts.

Scale design: every check and every rule statistic is a count aggregate
with map-side partial aggregation; the FK checks are left-anti hash
joins on the key (broadcast when the dimension fits).  The basket pair
expansion is the only super-linear term — |orders| x (basket choose 2)
— and baskets are bounded by business reality (~7 lines), so it scales
linearly in orders; a degenerate mega-basket would need the per-order
cap the docstring of _basket_pairs notes.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changegen_spark.sources.tables import load_table


def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-suite audit over the star schema:
    (check_name, n_checked, n_violations, passed)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    documents = load_table(spark, sf_dir, "documents")

    def check(name: str, df: DataFrame, violation: F.Column) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count("*").alias("n_checked"),
            F.count_if(violation).alias("n_violations"),
        )

    pk = orders.agg(
        F.lit("orders_pk_unique").alias("check_name"),
        F.count("*").alias("n_checked"),
        (F.count("*") - F.count_distinct(F.col("o_orderkey"))).alias(
            "n_violations"
        ),
    )
    fk_li = check(
        "lineitem_fk_orders",
        lineitem.join(
            orders.select("o_orderkey"),
            lineitem.l_orderkey == orders.o_orderkey,
            "left",
        ),
        F.col("o_orderkey").isNull(),
    )
    fk_cust = check(
        "orders_fk_customer",
        orders.join(
            customer.select("c_custkey"),
            orders.o_custkey == customer.c_custkey,
            "left",
        ),
        F.col("c_custkey").isNull(),
    )
    qty = check(
        "lineitem_qty_range",
        lineitem,
        (F.col("l_quantity") <= 0) | (F.col("l_quantity") > 100),
    )
    price = check("orders_price_nonneg", orders, F.col("o_totalprice") < 0)
    ts = check(
        "events_ts_bounds",
        events,
        (F.col("ts") < F.lit("2024-01-01").cast("timestamp"))
        | (F.col("ts") >= F.lit("2024-03-01").cast("timestamp")),
    )
    nchars = check(
        "documents_nchars_consistent",
        documents,
        F.col("n_chars") != F.length("text"),
    )
    out = reduce(
        DataFrame.unionByName, [pk, fk_li, fk_cust, qty, price, ts, nchars]
    )
    return out.select(
        "check_name",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).cast("boolean").alias("passed"),
    ).orderBy("check_name")


Q_DQ_AUDIT_SQL = """
SELECT check_name, n_checked, n_violations,
       n_violations = 0 AS passed FROM (
  SELECT 'orders_pk_unique' AS check_name, count(*) AS n_checked,
         count(*) - count(DISTINCT o_orderkey) AS n_violations FROM orders
  UNION ALL
  SELECT 'lineitem_fk_orders', count(*),
         count(*) FILTER (o.o_orderkey IS NULL)
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT 'orders_fk_customer', count(*),
         count(*) FILTER (c.c_custkey IS NULL)
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  UNION ALL
  SELECT 'lineitem_qty_range', count(*),
         count(*) FILTER (l_quantity <= 0 OR l_quantity > 100) FROM lineitem
  UNION ALL
  SELECT 'orders_price_nonneg', count(*),
         count(*) FILTER (o_totalprice < 0) FROM orders
  UNION ALL
  SELECT 'events_ts_bounds', count(*),
         count(*) FILTER (ts < TIMESTAMP '2024-01-01'
                          OR ts >= TIMESTAMP '2024-03-01') FROM events
  UNION ALL
  SELECT 'documents_nchars_consistent', count(*),
         count(*) FILTER (n_chars != length(text)) FROM documents
)
ORDER BY check_name
"""


MIN_PAIR_SUPPORT = 3
ASSOC_TOPK = 100


def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{ASSOC_TOPK} co-purchase pairs by lift (support >=
    {MIN_PAIR_SUPPORT} orders): (part_a, part_b, n_ab, n_a, n_b,
    confidence, lift), ties broken by (part_a, part_b).

    confidence = P(b|a) = n_ab/n_a; lift = P(a,b)/(P(a)P(b)) =
    n_ab*N/(n_a*n_b) — all ratios of exact integer counts, rounded 6 dp.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = load_table(spark, sf_dir, "orders").agg(
        F.count("*").alias("n_orders")
    )
    item = li.groupBy("l_partkey").agg(F.count("*").alias("n_item"))
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= MIN_PAIR_SUPPORT)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b"))
    return (
        pairs.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(F.col("n_ab") / F.col("n_a"), 6).alias("confidence"),
            F.round(
                F.col("n_ab") * F.col("n_orders") / (F.col("n_a") * F.col("n_b")), 6
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(ASSOC_TOPK)
    )


Q_ASSOC_RULES_SQL = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (SELECT count(*) AS n_orders FROM orders),
item AS (
  SELECT l_partkey, count(*) AS n_item FROM li GROUP BY l_partkey
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_ab
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_PAIR_SUPPORT}
)
SELECT part_a, part_b, n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
       round(n_ab * 1.0 / ia.n_item, 6) AS confidence,
       round(n_ab * 1.0 * n_orders / (ia.n_item * 1.0 * ib.n_item), 6) AS lift
FROM pairs
JOIN item ia ON part_a = ia.l_partkey
JOIN item ib ON part_b = ib.l_partkey
CROSS JOIN n
ORDER BY lift DESC, part_a, part_b
LIMIT {ASSOC_TOPK}
"""


def q_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: per-source unigram distribution vs the
    corpus — KL divergence and Pearson chi-square statistic per source,
    the slice-vs-reference comparison a pipeline alarms on when one feed
    starts emitting different data (drifted scrape, broken extractor,
    poisoned source).

    Determinism discipline: all counts are exact integers; each per-token
    term is rounded to an e6 integer BEFORE the per-source sum —
    KL: c_sw * round(1e6 * ln((c_sw·N_c)/(c_cw·N_s))) summed, divided by
    N_s once at the end; chi²: round(1e6·(c_sw−E)²/E) summed — so the
    only order-dependent float op is eliminated and both engines hash
    identically.

    Scale: one tokenize+count shuffle keyed by (source, token) with
    map-side combine; corpus totals are a ~|vocab| frame joined back (at
    real vocabulary sizes, a shuffle join keyed by token; here broadcast).
    Output is |sources| rows — the monitoring artifact itself.
    """
    from changegen_spark.queries.mlprep import _toks

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(_toks(F.col("text"))).alias("w")
    ).filter(F.col("w") != "")
    sw = tok.groupBy("source", "w").agg(F.count("*").alias("c_sw"))
    cw = tok.groupBy("w").agg(F.count("*").alias("c_cw"))
    ns = tok.groupBy("source").agg(F.count("*").alias("n_s"))
    nc = tok.agg(F.count("*").alias("n_c"))
    j = (
        sw.join(cw, "w")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(nc))
    )
    kl_term = F.col("c_sw") * F.round(
        F.log(
            (F.col("c_sw") * F.col("n_c")).cast("double")
            / (F.col("c_cw") * F.col("n_s")).cast("double")
        )
        * 1e6
    ).cast("long")
    expected = (
        F.col("n_s").cast("double")
        * F.col("c_cw").cast("double")
        / F.col("n_c").cast("double")
    )
    chi2_term = F.round(
        (F.col("c_sw").cast("double") - expected)
        * (F.col("c_sw").cast("double") - expected)
        / expected
        * 1e6
    ).cast("long")
    return (
        j.groupBy("source")
        .agg(
            F.max("n_s").alias("n_tokens"),
            F.sum(kl_term).alias("kl_num"),
            F.sum(chi2_term).alias("chi2_sum_e6"),
        )
        .select(
            "source",
            "n_tokens",
            F.round(F.col("kl_num").cast("double") / F.col("n_tokens"), 3)
            .alias("kl_e6"),
            "chi2_sum_e6",
        )
        .orderBy("source")
    )


Q_SOURCE_DRIFT_SQL = """
WITH tok AS (
  SELECT source, w FROM (
    SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS w
    FROM documents)
  WHERE w <> ''
), sw AS (
  SELECT source, w, count(*) AS c_sw FROM tok GROUP BY 1, 2
), cw AS (
  SELECT w, count(*) AS c_cw FROM tok GROUP BY 1
), ns AS (
  SELECT source, count(*) AS n_s FROM tok GROUP BY 1
), nc AS (
  SELECT count(*) AS n_c FROM tok
), terms AS (
  SELECT sw.source, ns.n_s,
         sw.c_sw * CAST(round(ln(CAST(sw.c_sw * nc.n_c AS DOUBLE)
                                / CAST(cw.c_cw * ns.n_s AS DOUBLE)) * 1e6)
                        AS BIGINT) AS kl_term,
         CAST(round((CAST(sw.c_sw AS DOUBLE)
                     - CAST(ns.n_s AS DOUBLE) * CAST(cw.c_cw AS DOUBLE)
                       / CAST(nc.n_c AS DOUBLE))
                    * (CAST(sw.c_sw AS DOUBLE)
                       - CAST(ns.n_s AS DOUBLE) * CAST(cw.c_cw AS DOUBLE)
                         / CAST(nc.n_c AS DOUBLE))
                    / (CAST(ns.n_s AS DOUBLE) * CAST(cw.c_cw AS DOUBLE)
                       / CAST(nc.n_c AS DOUBLE))
                    * 1e6) AS BIGINT) AS chi2_term
  FROM sw JOIN cw USING (w) JOIN ns USING (source) CROSS JOIN nc
)
SELECT source, max(n_s) AS n_tokens,
       round(CAST(sum(kl_term) AS DOUBLE) / max(n_s), 3) AS kl_e6,
       CAST(sum(chi2_term) AS BIGINT) AS chi2_sum_e6
FROM terms GROUP BY source ORDER BY source
"""


K_ANON = 5
_BAND_CENTS = 100_000  # $1000 quasi-identifier balance bands


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer table — the privacy gate a
    release pipeline runs AFTER regex PII scrubbing (q_pii_scrub): group
    by the quasi-identifier tuple (nation, market segment, $1000
    account-balance band) and suppress every group smaller than K_ANON,
    reporting the re-identification risk (1/n) of each released group.

    Balance bands are exact-integer: cents = round(bal·100) then
    truncating div by 100000 — both engines truncate toward zero, so
    the band edges are engine-identical (no float floor at the
    boundary).  One groupBy with map-side combine; scales like any
    count aggregate."""
    from changegen_spark.sources.tables import load_table

    c = load_table(spark, sf_dir, "customer")
    g = (
        c.select(
            "c_nationkey",
            "c_mktsegment",
            F.expr(f"CAST(round(c_acctbal * 100) AS BIGINT) div {_BAND_CENTS}").alias(
                "bal_band"
            ),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count("*").alias("n"))
    )
    suppressed = (F.col("n") < K_ANON).cast("long")
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        "bal_band",
        "n",
        suppressed.alias("suppressed"),
        F.when(F.col("n") >= K_ANON, F.expr("1000000 div n"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("risk_e6"),
        F.when(F.col("n") >= K_ANON, F.col("n")).otherwise(F.lit(0))
        .cast("long")
        .alias("n_released"),
    ).orderBy("c_nationkey", "c_mktsegment", "bal_band")


Q_K_ANONYMITY_SQL = f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) // {_BAND_CENTS} AS bal_band,
         count(*) AS n
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT c_nationkey, c_mktsegment, bal_band, n,
       CAST(n < {K_ANON} AS BIGINT) AS suppressed,
       CAST(CASE WHEN n >= {K_ANON} THEN 1000000 // n ELSE 0 END AS BIGINT) AS risk_e6,
       CAST(CASE WHEN n >= {K_ANON} THEN n ELSE 0 END AS BIGINT) AS n_released
FROM g
ORDER BY c_nationkey, c_mktsegment, bal_band
"""


QUERIES = {
    "q_dq_audit": q_dq_audit,
    "q_assoc_rules": q_assoc_rules,
    "q_source_drift": q_source_drift,
    "q_k_anonymity": q_k_anonymity,
}
ORACLES = {
    "q_dq_audit": Q_DQ_AUDIT_SQL,
    "q_assoc_rules": Q_ASSOC_RULES_SQL,
    "q_source_drift": Q_SOURCE_DRIFT_SQL,
    "q_k_anonymity": Q_K_ANONYMITY_SQL,
}
