"""Lloyd's k-means over the embeddings table — the clustering stage
production pipelines run before semantic dedup (SemDeDup partitions by
k-means cells), IVF index training, and mixture analysis.  The repo's
IVF quantizer (functions/similarity.py) deliberately uses a medoid rule
to stay oracle-able; this module is the real iterative Lloyd's loop,
made engine-exact so it can carry a FULL SQL oracle (a 3-round unroll,
the fixed-depth contract shape PageRank established).

Integer determinism contract (both engines, any partitioning):
  * vectors quantized once: v[d] = CAST(round(emb[d]·1e6) AS BIGINT);
  * init: the K vectors with smallest (h60(vec_id), vec_id) become
    centroids 0..K-1 in that order (no rand());
  * assignment: argmin of the EXACT integer squared distance, ties to
    the smaller cluster id;
  * update: per-dimension integer division (Σv) div n — Spark ``div``
    and DuckDB ``//`` both truncate toward zero (verified on
    negatives); empty clusters keep their previous centroid;
  * KM_ITERS assign+update rounds, then one final assignment.

100 TB design: per round the plan is one broadcast join of the KB-sized
centroid table against the vectors (map-only distance + argmin via a
single min(struct)) and one posexplode/groupBy hash shuffle of
(cluster, dim) partial sums with map-side combine.  Nothing quadratic;
the only driver-side artifact is the k×dim centroid table (the same
bounded-collect contract as bpe_train / IVF).  The vector frame is
persisted across rounds so the parquet scan happens once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changegen_spark.sources.tables import load_table

K_CLUSTERS = 8
KM_ITERS = 3
KM_DIM = 64


def _vecs_e6(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = load_table(spark, sf_dir, "embeddings")
    return v.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1e6).cast("long")
        ).alias("v"),
    )


def _assign(vecs: DataFrame, cent_df: DataFrame) -> DataFrame:
    """One assignment pass: broadcast centroids, exact integer argmin."""
    d2 = F.aggregate(
        F.zip_with("v", "c", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        vecs.crossJoin(F.broadcast(cent_df))
        .withColumn("d2", d2)
        .groupBy("vec_id")
        .agg(F.min(F.struct("d2", "cluster")).alias("m"))
        .select(
            "vec_id", F.col("m.cluster").alias("cluster"), F.col("m.d2").alias("d2")
        )
    )


def kmeans_fit(
    vecs: DataFrame, k: int = K_CLUSTERS, iters: int = KM_ITERS
) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """Lloyd's loop over a (vec_id, v: array<long>) frame.  Returns the
    final assignment frame (vec_id, cluster, d2) and the final centroid
    table."""
    spark = vecs.sparkSession
    from changegen_spark.queries.sketches import h60

    vecs = vecs.persist()
    try:
        init = (
            vecs.orderBy(h60(F.col("vec_id")), "vec_id").limit(k).collect()
        )
        cents: list[tuple[int, list[int]]] = [
            (i, list(r["v"])) for i, r in enumerate(init)
        ]
        for _ in range(iters):
            cent_df = spark.createDataFrame(
                cents, "cluster INT, c array<bigint>"
            )
            best = _assign(vecs, cent_df)
            upd = (
                best.join(vecs, "vec_id")
                .select("cluster", F.posexplode("v").alias("dim", "val"))
                .groupBy("cluster", "dim")
                .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
                .select("cluster", "dim", F.expr("s div n").alias("cv"))
                .groupBy("cluster")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("dim", "cv"))),
                        lambda x: x["cv"],
                    ).alias("c")
                )
                .collect()
            )
            new = {r["cluster"]: list(r["c"]) for r in upd}
            # empty clusters keep their previous centroid
            cents = [(cid, new.get(cid, old)) for cid, old in cents]
        final = _assign(
            vecs, spark.createDataFrame(cents, "cluster INT, c array<bigint>")
        )
        return final, cents
    finally:
        vecs.unpersist()


def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final k-means assignment per vector with the exact integer
    squared distance (e6-quantized units)."""
    final, _cents = kmeans_fit(_vecs_e6(spark, sf_dir))
    return final.select(
        "vec_id",
        "cluster",
        F.col("d2").alias("dist2_e12"),
    ).orderBy("vec_id")


def _kmeans_sql() -> str:
    from changegen_spark.queries.sketches import _H60_SQL

    h = _H60_SQL.format(x="vec_id")
    vq = (
        "list_transform(embedding,"
        " x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))"
    )
    dist = (
        "CAST(list_sum(list_transform(list_zip(v.v, c.c),"
        " s -> (s[1]-s[2])*(s[1]-s[2]))) AS BIGINT)"
    )
    sql = f"""WITH v AS (SELECT vec_id, {vq} AS v FROM embeddings),
init AS (SELECT vec_id, v, row_number() OVER (ORDER BY {h}, vec_id) AS rn FROM v),
c0 AS (SELECT CAST(rn - 1 AS INT) AS cluster, v AS c FROM init WHERE rn <= {K_CLUSTERS})"""
    prev = "c0"
    for i in range(1, KM_ITERS + 1):
        sql += f""",
a{i} AS (SELECT vec_id, v, cluster,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rk
         FROM (SELECT v.vec_id, v.v, c.cluster, {dist} AS d2
               FROM v CROSS JOIN {prev} c)),
b{i} AS (SELECT vec_id, v, cluster FROM a{i} WHERE rk = 1),
d{i} AS (SELECT cluster, unnest(generate_series(1, {KM_DIM})) AS i, v FROM b{i}),
m{i} AS (SELECT cluster, CAST(i AS INT) AS dim,
         CAST(sum(v[CAST(i AS INT)]) // count(*) AS BIGINT) AS cv
         FROM d{i} GROUP BY cluster, i),
l{i} AS (SELECT cluster, list(cv ORDER BY dim) AS c FROM m{i} GROUP BY cluster),
c{i} AS (SELECT p.cluster, coalesce(l.c, p.c) AS c
         FROM {prev} p LEFT JOIN l{i} l USING (cluster))"""
        prev = f"c{i}"
    sql += f""",
fin AS (SELECT vec_id, cluster, d2,
        row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rk
        FROM (SELECT v.vec_id, c.cluster, {dist} AS d2
              FROM v CROSS JOIN {prev} c))
SELECT vec_id, cluster, d2 AS dist2_e12 FROM fin WHERE rk = 1 ORDER BY vec_id"""
    return sql


QUERIES = {"q_kmeans": q_kmeans}
ORACLES = {"q_kmeans": _kmeans_sql()}
