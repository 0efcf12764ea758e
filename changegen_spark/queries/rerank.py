"""MMR diversified re-ranking (r6 new family).

Maximal Marginal Relevance (Carbonell & Goldstein 1998): after a
retrieval stage produces a relevance-ranked candidate pool, greedily
select k results trading relevance against redundancy:

    pick argmax over remaining c of  rel(c) − max_{s ∈ selected} sim(c, s)

(the λ=½ form, scaled by 2 so everything stays integer).  The engine
follows the k-means integer-exact contract: embeddings are e6-quantized
once (BIGINT), relevance and pairwise similarity are EXACT integer dot
products, ties break on vec_id — so the greedy trajectory is fully
deterministic and the oracle can replay it as a k-round unrolled SQL
query (the PageRank/k-means fixed-depth contract shape).

Stages: brute-force relevance scoring (the existing ANN family provides
the scale path for this stage — MMR consumes ANY pool), top-``MMR_POOL``
pool per query, then ``MMR_K − 1`` greedy rounds.

100 TB shape: pool construction is the retrieval problem (banded/IVF
paths elsewhere); the rerank itself touches n_queries × MMR_POOL rows —
per-query constant work, embarrassingly parallel across queries.  Each
greedy round is one broadcast-sized join; the selected set is
checkpointed per round so the plan stays linear in k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from changegen_spark.sources.tables import load_table

MMR_K = 4
MMR_POOL = 16
MMR_QMOD = 100  # queries = vec_id % MMR_QMOD == 0 (the ANN convention)


def _vecs_e6(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = load_table(spark, sf_dir, "embeddings")
    return v.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1e6).cast("long")
        ).alias("v"),
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def q_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``MMR_K`` diversified results per query.  ``rel_dot`` is the
    exact integer relevance; ``mmr_score`` is the objective value at the
    moment of selection (= rel_dot for rank 1)."""
    v = _vecs_e6(spark, sf_dir)
    q = v.filter(F.col("vec_id") % MMR_QMOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "v", _dot("qv", "v").alias("rel"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), "vec_id")
    pool = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MMR_POOL)
        .drop("rn")
        .localCheckpoint(eager=True)
    )

    sel = (
        pool.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "query_id",
            "vec_id",
            "v",
            "rel",
            F.lit(1).cast("long").alias("rank"),
            F.col("rel").alias("mmr_score"),
        )
    )
    for t in range(2, MMR_K + 1):
        rem = pool.join(sel, ["query_id", "vec_id"], "left_anti")
        sims = (
            rem.alias("c")
            .join(
                sel.select(
                    "query_id", F.col("v").alias("sv")
                ).alias("s"),
                "query_id",
            )
            .groupBy("query_id", "vec_id")
            .agg(
                F.first("c.rel").alias("rel"),
                F.first("c.v").alias("v"),
                F.max(_dot(F.col("c.v"), F.col("sv"))).alias("max_sim"),
            )
        )
        scored_t = sims.withColumn("score", F.col("rel") - F.col("max_sim"))
        wt = Window.partitionBy("query_id").orderBy(F.desc("score"), "vec_id")
        pick = (
            scored_t.withColumn("rk", F.row_number().over(wt))
            .filter(F.col("rk") == 1)
            .select(
                "query_id",
                "vec_id",
                "v",
                "rel",
                F.lit(t).cast("long").alias("rank"),
                F.col("score").alias("mmr_score"),
            )
        )
        sel = sel.unionByName(pick).localCheckpoint(eager=True)

    return sel.select(
        "query_id", "rank", "vec_id", F.col("rel").alias("rel_dot"), "mmr_score"
    ).orderBy("query_id", "rank")


def _mmr_sql() -> str:
    vq = (
        "list_transform(embedding,"
        " x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))"
    )

    def dot(a: str, b: str) -> str:
        return (
            f"CAST(list_sum(list_transform(list_zip({a}, {b}),"
            " z -> z[1]*z[2])) AS BIGINT)"
        )

    sql = f"""WITH v AS (SELECT vec_id, {vq} AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id % {MMR_QMOD} = 0),
rel AS (SELECT q.query_id, v.vec_id, v.v, {dot("q.qv", "v.v")} AS rel
        FROM q JOIN v ON v.vec_id <> q.query_id),
pool AS (SELECT query_id, vec_id, v, rel FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, vec_id) AS rn
           FROM rel) WHERE rn <= {MMR_POOL}),
s1 AS (SELECT query_id, vec_id, v, rel, 1 AS rank, rel AS mmr_score FROM (
         SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, vec_id) AS rk
         FROM pool) WHERE rk = 1)"""
    prev = "s1"
    for t in range(2, MMR_K + 1):
        sql += f""",
c{t} AS (SELECT p.query_id, p.vec_id, p.v, p.rel,
                p.rel - max({dot("p.v", "s.v")}) AS score
         FROM pool p JOIN {prev} s USING (query_id)
         WHERE NOT EXISTS (SELECT 1 FROM {prev} x
                           WHERE x.query_id = p.query_id AND x.vec_id = p.vec_id)
         GROUP BY p.query_id, p.vec_id, p.v, p.rel),
p{t} AS (SELECT query_id, vec_id, v, rel, {t} AS rank, score AS mmr_score FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rk
           FROM c{t}) WHERE rk = 1),
s{t} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM p{t})"""
        prev = f"s{t}"
    sql += f"""
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, rel AS rel_dot, mmr_score
FROM {prev} ORDER BY query_id, rank"""
    return sql


QUERIES = {"q_mmr_topk": q_mmr_topk}
ORACLES = {"q_mmr_topk": _mmr_sql()}
