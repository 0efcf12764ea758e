"""Iterative graph scoring: fixed-iteration PageRank in exact integer math.

Training-data pipelines rank crawl domains by link authority (PageRank /
harmonic centrality over the web graph) and keep or weight documents by
their host's score.  This module runs the same computation Spark-first on
the graph this dataset carries: the bipartite customer<->supplier graph
projected from orders x lineitem (distinct trading pairs, both directions,
so every node has out-degree >= 1 and no dangling-mass term is needed).

Determinism is the interesting part: float PageRank sums contributions in
nondeterministic order, so Spark and DuckDB would drift in the last ulp.
Every quantity here is therefore a SCALED INTEGER (e9 ranks):

    share(u->v)  = rank_e9(u) div outdeg(u)          -- integer division
    rank_e9'(v)  = 0.15e9 + (85 * sum(shares) + 50) div 100

Integer sums are associative bit-for-bit, so any shuffle order, AQE
re-plan, or engine gives the identical result — the same scaled-integer
discipline the TPC-H money aggregates use (queries/__init__ conventions).

Scale design (100 TB web graph, 1000 executors): the edge list is FENCED
(lazy localCheckpoint) before iterating, so the graph is derived once, not
re-scanned per step.  Ranks carry the static out-degree, so each iteration
is ONE |E|-sized equi-join on ``src`` (pre-bucketing edges by src makes it
map-side) plus one ``groupBy(dst)`` whose integer SUM combines map-side;
re-attaching the out-degree costs a |V|-sized join, skipped on the final
step.  The loop is unrolled a FIXED number of times (3), keeping
Catalyst's plan finite; a production run at higher iteration counts
inserts an eager checkpoint every ~5 iterations to cut lineage, exactly
like operators/dedup's component loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changegen_spark.sources.tables import load_table

PR_ITERS = 3
INIT_E9 = 1_000_000_000  # mean-1 normalization: every node starts at 1.0


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customer->supplier trading pairs, mirrored to make the
    graph undirected-as-two-arcs (no dangling nodes)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("cnode"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("snode"),
        )
        .distinct()
    )
    return pairs.select(
        F.col("cnode").alias("src"), F.col("snode").alias("dst")
    ).unionAll(pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst")))


def pagerank(edges: DataFrame, iters: int = PR_ITERS, fence: bool = True) -> DataFrame:
    """(src, dst) arcs -> (node, rank_e9) after ``iters`` exact-integer
    PageRank steps.  Every node must appear as a src (callers mirror arcs);
    with mirrored arcs the dst set equals the node set, so each step's
    aggregation re-emits every node.

    ``fence`` cuts the edge lineage with a lazy localCheckpoint before
    iterating — the same fence idiom as the pipeline's junction stage.
    Without it every iteration re-derives the edge list from source scans
    (measured at sf0.1: 28 FileScans and zero exchange reuse in the
    3-iteration plan; 0 FileScans with the fence).  Local wall time is
    stage-overhead-bound either way (~4.5 s at sf0.1 on local[32]), but at
    100 TB re-scanning the graph per iteration is the difference between
    an iterative algorithm and an accident."""
    if fence:
        edges = edges.localCheckpoint(eager=False)
    weighted = "w" in edges.columns
    # out-degree generalizes to out-strength (sum of edge weights) on a
    # weighted graph; share(u->v) = (rank * w_uv) div strength_u — still
    # all-integer, so the exactness argument is unchanged.
    if weighted:
        outdeg = edges.groupBy("src").agg(F.sum("w").alias("od"))
        share = F.expr("(rank_e9 * w) div od")
    else:
        outdeg = edges.groupBy("src").agg(F.count("*").alias("od"))
        share = F.expr("rank_e9 div od")
    # ranks CARRIES the (static) out-degree so each iteration needs one
    # |E|-sized join (edges x ranks), not two — re-attaching od after the
    # aggregation is a |V|-sized join, and the final iteration skips it.
    ranks = outdeg.select(
        F.col("src").alias("node"),
        "od",
        F.lit(INIT_E9).cast("long").alias("rank_e9"),
    )
    for it in range(iters):
        sums = (
            edges.join(ranks, edges.src == ranks.node)
            .select(F.col("dst"), share.alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("s"))
        )
        new_rank = F.expr("CAST(150000000 + (85 * s + 50) div 100 AS BIGINT)")
        if it + 1 < iters:
            ranks = sums.join(outdeg, sums.dst == outdeg.src).select(
                F.col("dst").alias("node"), "od", new_rank.alias("rank_e9")
            )
        else:
            ranks = sums.select(
                F.col("dst").alias("node"), new_rank.alias("rank_e9")
            )
    return ranks


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All node ranks after PR_ITERS (3) integer-exact PageRank iterations
    over the mirrored customer<->supplier graph."""
    return pagerank(_edges(spark, sf_dir)).orderBy("node")


def _edges_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trading pairs weighted by distinct order count — hub strength now
    reflects volume, not mere adjacency."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("cnode"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("snode"),
            "o_orderkey",
        )
        .groupBy("cnode", "snode")
        .agg(F.count_distinct("o_orderkey").alias("w"))
    )
    return pairs.select(
        F.col("cnode").alias("src"), F.col("snode").alias("dst"), "w"
    ).unionAll(
        pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst"), "w")
    )


def q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted PageRank: identical recurrence with
    share = (rank * w) div strength — integer-exact like the uniform
    variant."""
    return pagerank(_edges_weighted(spark, sf_dir)).orderBy("node")


def _it_sql(prev: str) -> str:
    return f"""
  SELECT e.dst AS node,
         CAST(150000000 + (85 * sum(r.rank_e9 // o.od) + 50) // 100 AS BIGINT)
           AS rank_e9
  FROM edges e
  JOIN {prev} r ON e.src = r.node
  JOIN outdeg o ON e.src = o.src
  GROUP BY e.dst"""


Q_PAGERANK_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT 'c' || o.o_custkey AS cnode, 's' || l.l_suppkey AS snode
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), edges AS (
  SELECT cnode AS src, snode AS dst FROM pairs
  UNION ALL
  SELECT snode AS src, cnode AS dst FROM pairs
), outdeg AS (
  SELECT src, count(*) AS od FROM edges GROUP BY src
), r0 AS (
  SELECT src AS node, CAST({INIT_E9} AS BIGINT) AS rank_e9 FROM outdeg
), r1 AS ({_it_sql('r0')}
), r2 AS ({_it_sql('r1')}
), r3 AS ({_it_sql('r2')}
)
SELECT node, rank_e9 FROM r3 ORDER BY node
"""


def _it_w_sql(prev: str) -> str:
    return f"""
  SELECT e.dst AS node,
         CAST(150000000 + (85 * sum((r.rank_e9 * e.w) // o.od) + 50) // 100
              AS BIGINT) AS rank_e9
  FROM edges e
  JOIN {prev} r ON e.src = r.node
  JOIN outdeg o ON e.src = o.src
  GROUP BY e.dst"""


Q_PAGERANK_WEIGHTED_SQL = f"""
WITH pairs AS (
  SELECT 'c' || o.o_custkey AS cnode, 's' || l.l_suppkey AS snode,
         count(DISTINCT o.o_orderkey) AS w
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY cnode, snode
), edges AS (
  SELECT cnode AS src, snode AS dst, w FROM pairs
  UNION ALL
  SELECT snode AS src, cnode AS dst, w FROM pairs
), outdeg AS (
  SELECT src, CAST(sum(w) AS BIGINT) AS od FROM edges GROUP BY src
), r0 AS (
  SELECT src AS node, CAST({INIT_E9} AS BIGINT) AS rank_e9 FROM outdeg
), r1 AS ({_it_w_sql('r0')}
), r2 AS ({_it_w_sql('r1')}
), r3 AS ({_it_w_sql('r2')}
)
SELECT node, rank_e9 FROM r3 ORDER BY node
"""


QUERIES = {"q_pagerank": q_pagerank, "q_pagerank_weighted": q_pagerank_weighted}
ORACLES = {
    "q_pagerank": Q_PAGERANK_SQL,
    "q_pagerank_weighted": Q_PAGERANK_WEIGHTED_SQL,
}
