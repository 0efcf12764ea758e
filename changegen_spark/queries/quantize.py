"""Scalar quantization of embeddings + retrieval-quality audit (r6).

The standard memory-bandwidth play for vector retrieval at scale
(FAISS ``SQ8``): learn per-dimension [min, max] over the corpus, store
each value as one byte, and search on integer byte dot products —
4× smaller than float32, SIMD-friendly, and the audit below measures
exactly what that buys/costs on this corpus.

Integer-exact contract: codes are ``round((x − mn)/(mx − mn)·255)``
(the +,−,/,· chain is correctly-rounded IEEE double in both engines, so
codes are engine-identical); the quantized score is the EXACT integer
dot of centered codes ``Σ (code_a−128)·(code_b−128)``; the exact
baseline is the e6-quantized integer dot (the k-means/MMR contract).
``q_sq8_recall`` reports per-query top-10 overlap between the two
rankings — the recall@10 a production SQ8 deployment would measure
before flipping the switch.

100 TB shape: dimension stats are one 64-row aggregate; quantization is
map-side; the byte codes are what actually ships to the ANN index.  The
brute-force rankings here are the small-sf oracle harness — the banded/
IVF paths elsewhere are the candidate generators at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from changegen_spark.sources.tables import load_table

SQ_K = 10
SQ_QMOD = 100


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def sq8_codes(v: DataFrame) -> DataFrame:
    """(vec_id, cv): centered int8 codes, fully distributed — per-dim
    stats via one tiny aggregate broadcast back onto the exploded frame,
    arrays rebuilt with an explicit position sort (collect_list order is
    never relied on)."""
    ex = v.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))
    stats = ex.groupBy("pos").agg(
        F.min("val").alias("mn"), F.max("val").alias("mx")
    )
    code = F.when(
        F.col("mx") > F.col("mn"),
        F.round((F.col("val") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 255),
    ).otherwise(F.lit(0)).cast("long")
    return (
        ex.join(F.broadcast(stats), "pos")
        .select("vec_id", "pos", (code - 128).alias("c"))
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("cv")
        )
    )


def q_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query top-10 agreement between byte-code retrieval and the
    exact integer-dot baseline."""
    v = load_table(spark, sf_dir, "embeddings")
    e6 = v.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1e6).cast("long")
        ).alias("ev"),
    )
    cv = sq8_codes(v)
    base = e6.join(cv, "vec_id")
    q = base.filter(F.col("vec_id") % SQ_QMOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("ev").alias("qev"),
        F.col("cv").alias("qcv"),
    )
    scored = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            _dot("qev", "ev").alias("s_exact"),
            _dot("qcv", "cv").alias("s_sq8"),
        )
    )
    we = Window.partitionBy("query_id").orderBy(F.desc("s_exact"), "vec_id")
    wq = Window.partitionBy("query_id").orderBy(F.desc("s_sq8"), "vec_id")
    ranked = scored.select(
        "query_id",
        "vec_id",
        F.row_number().over(we).alias("r_exact"),
        F.row_number().over(wq).alias("r_sq8"),
    )
    return (
        ranked.groupBy("query_id")
        .agg(
            F.sum(
                ((F.col("r_exact") <= SQ_K) & (F.col("r_sq8") <= SQ_K)).cast(
                    "long"
                )
            ).alias("n_overlap")
        )
        .select(
            "query_id",
            "n_overlap",
            F.round(F.col("n_overlap") / SQ_K * 1e6)
            .cast("long")
            .alias("recall_e6"),
        )
        .orderBy("query_id")
    )


def _sq8_sql() -> str:
    def dot(a: str, b: str) -> str:
        return (
            f"CAST(list_sum(list_transform(list_zip({a}, {b}),"
            " z -> z[1]*z[2])) AS BIGINT)"
        )

    e6q = (
        "list_transform(embedding,"
        " x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))"
    )
    return f"""
WITH ex AS (
  SELECT vec_id, CAST(i AS INT) AS pos,
         CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS val
  FROM (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings)
), st AS (
  SELECT pos, min(val) AS mn, max(val) AS mx FROM ex GROUP BY pos
), codes AS (
  SELECT vec_id,
         list(CASE WHEN mx > mn
                   THEN CAST(round((val - mn) / (mx - mn) * 255) AS BIGINT)
                   ELSE 0 END - 128 ORDER BY ex.pos) AS cv
  FROM ex JOIN st USING (pos) GROUP BY vec_id
), base AS (
  SELECT e.vec_id, {e6q} AS ev, c.cv
  FROM embeddings e JOIN codes c ON c.vec_id = e.vec_id
), q AS (
  SELECT vec_id AS query_id, ev AS qev, cv AS qcv FROM base
  WHERE vec_id % {SQ_QMOD} = 0
), scored AS (
  SELECT q.query_id, b.vec_id,
         {dot("q.qev", "b.ev")} AS s_exact,
         {dot("q.qcv", "b.cv")} AS s_sq8
  FROM q JOIN base b ON b.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY s_exact DESC, vec_id) AS r_exact,
         row_number() OVER (PARTITION BY query_id ORDER BY s_sq8 DESC, vec_id) AS r_sq8
  FROM scored
)
SELECT query_id,
       CAST(sum(CAST(r_exact <= {SQ_K} AND r_sq8 <= {SQ_K} AS INT)) AS BIGINT) AS n_overlap,
       CAST(round(sum(CAST(r_exact <= {SQ_K} AND r_sq8 <= {SQ_K} AS INT)) / {SQ_K}.0 * 1e6) AS BIGINT) AS recall_e6
FROM ranked GROUP BY query_id
ORDER BY query_id
"""


QUERIES = {"q_sq8_recall": q_sq8_recall}
ORACLES = {"q_sq8_recall": _sq8_sql()}
