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


def _queries_frame(v: DataFrame) -> DataFrame:
    return v.filter(F.col("vec_id") % MMR_QMOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )


def _top_pool(scored: DataFrame) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MMR_POOL)
        .drop("rn")
        .localCheckpoint(eager=True)
    )


def q_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``MMR_K`` diversified results per query.  ``rel_dot`` is the
    exact integer relevance; ``mmr_score`` is the objective value at the
    moment of selection (= rel_dot for rank 1).  The pool here is the
    EXACT brute-force top-``MMR_POOL`` (corpus×queries) — the small-sf
    baseline; ``q_mmr_topk_lsh`` is the scale path."""
    v = _vecs_e6(spark, sf_dir)
    q = _queries_frame(v)
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "v", _dot("qv", "v").alias("rel"))
    )
    pool = _top_pool(scored)
    return _greedy_rerank(pool)


def _greedy_rerank(pool: DataFrame) -> DataFrame:
    """MMR_K greedy rounds over a (query_id, vec_id, v, rel) pool — shared
    by the exact and the LSH-fed pools; per-query constant work, each
    round one broadcast-sized join, selected set checkpointed."""
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), "vec_id")
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


# --- LSH-fed pool (r7: the retrieval-fed scale path, r6 verdict #3) ---------
#
# The exact form's pool build scores every corpus vector against every
# query (crossJoin → BroadcastNestedLoopJoin): O(n·q) dot products.  The
# scale path draws candidates from OR-amplified sign-LSH band collisions —
# the same banded plan shape as q_hard_negatives_lsh / q_embedding_dedup_lsh
# — so only collided candidates are scored; the greedy rerank is byte-for-
# byte the shared _greedy_rerank.  Band geometry is the measured
# hard-negatives operating point (queries/vectors.py LSH_BANDS, 8 bands ×
# 4 bits): this fixture's top-relevance pairs sit at cos ≲ 0.5 where sign
# planes agree only ~65%/bit, so recall is bought with bands, not bits —
# the 4×8-bit dedup config collides near-NOTHING here (measured recall 0).
# Buckets are computed from the e6-QUANTIZED integers (sign of v[d]) so
# engine and oracle replay the exact same pool; pool recall vs the exact
# pool is pytest-pinned (tests/test_rerank.py).
from changegen_spark.queries.vectors import LSH_BANDS as MMR_BANDS


def _int_bucket(col, dims: list[int]):
    b = F.lit(0)
    for j, d in enumerate(dims):
        b = b + F.when(F.element_at(F.col(col), d + 1) > 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        )
    return b.cast("int")


def _lsh_pool(v: DataFrame, q: DataFrame) -> DataFrame:
    """Top-``MMR_POOL`` per query from sign-LSH band collisions: per band,
    a bucket equi-join with the query side broadcast carrying ids only;
    candidates deduped, vectors re-attached by id, scored exactly."""
    cands = None
    for bdims in MMR_BANDS:
        vb = v.select("vec_id", _int_bucket("v", bdims).alias("bucket"))
        qb = q.select("query_id", _int_bucket("qv", bdims).alias("bucket"))
        pairs = vb.join(F.broadcast(qb), "bucket").select("query_id", "vec_id")
        cands = pairs if cands is None else cands.unionByName(pairs)
    cands = cands.filter(F.col("vec_id") != F.col("query_id")).distinct()
    scored = (
        cands.join(v, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "vec_id", "v", _dot("qv", "v").alias("rel"))
    )
    return _top_pool(scored)


def q_mmr_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR over an LSH-retrieved pool: candidates collide with the query
    in ≥1 of the 8 4-bit sign bands (bucket equi-joins with the query
    side broadcast, ids only), are scored exactly, pooled
    top-``MMR_POOL``, then greedily reranked exactly like ``q_mmr_topk``.
    Corpus-side work is O(n·bands) map + O(collisions) — no
    BroadcastNestedLoopJoin over the corpus (plan-pinned)."""
    v = _vecs_e6(spark, sf_dir).localCheckpoint(eager=True)
    q = _queries_frame(v)
    return _greedy_rerank(_lsh_pool(v, q))


def _bucket_sql(col: str, dims: list[int]) -> str:
    return (
        "("
        + " + ".join(
            f"(CASE WHEN list_extract({col}, {d + 1}) > 0 THEN {1 << j} ELSE 0 END)"
            for j, d in enumerate(dims)
        )
        + ")"
    )


def _mmr_sql(lsh_pool: bool = False) -> str:
    vq = (
        "list_transform(embedding,"
        " x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))"
    )

    def dot(a: str, b: str) -> str:
        return (
            f"CAST(list_sum(list_transform(list_zip({a}, {b}),"
            " z -> z[1]*z[2])) AS BIGINT)"
        )

    if lsh_pool:
        sig = "\n  UNION ALL ".join(
            f"SELECT vec_id, {i} AS band, {_bucket_sql('v', bd)} AS bucket FROM v"
            for i, bd in enumerate(MMR_BANDS)
        )
        qsig = "\n  UNION ALL ".join(
            f"SELECT query_id, {i} AS band, {_bucket_sql('qv', bd)} AS bucket FROM q"
            for i, bd in enumerate(MMR_BANDS)
        )
        pool_ctes = f"""sig AS (
  {sig}
), qsig AS (
  {qsig}
), cand AS (
  SELECT DISTINCT p.query_id, s.vec_id
  FROM sig s JOIN qsig p ON s.band = p.band AND s.bucket = p.bucket
  WHERE s.vec_id <> p.query_id
),
rel AS (SELECT c.query_id, c.vec_id, v.v, {dot("q.qv", "v.v")} AS rel
        FROM cand c JOIN v ON v.vec_id = c.vec_id
        JOIN q ON q.query_id = c.query_id)"""
    else:
        pool_ctes = f"""rel AS (SELECT q.query_id, v.vec_id, v.v, {dot("q.qv", "v.v")} AS rel
        FROM q JOIN v ON v.vec_id <> q.query_id)"""

    sql = f"""WITH v AS (SELECT vec_id, {vq} AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id % {MMR_QMOD} = 0),
{pool_ctes},
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


QUERIES = {"q_mmr_topk": q_mmr_topk, "q_mmr_topk_lsh": q_mmr_topk_lsh}
ORACLES = {
    "q_mmr_topk": _mmr_sql(),
    "q_mmr_topk_lsh": _mmr_sql(lsh_pool=True),
}
