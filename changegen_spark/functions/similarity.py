"""Vector similarity search over embedding columns (array<float>).

Two paths, as a 100 TB pipeline needs:
  * brute-force cosine top-k — exact baseline; the query side is tiny and
    broadcast, so the scan side stays partition-parallel with no shuffle
    until the final per-query top-k (a cheap partial top-k under AQE).
  * sign-LSH bucketed top-k — approximate scale path; vectors are bucketed
    by a deterministic bit signature, candidates only join within a bucket.

Dot products use ``F.zip_with`` + ``F.aggregate`` (sequential fold, exactly
reproducible in the SQL oracle); swap in a pandas UDF with numpy for raw
throughput if the built-in fold ever bottlenecks — semantics identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def as_double(a: Column) -> Column:
    """Cast array<float> → array<double> so fold arithmetic is double-exact."""
    return F.transform(a, lambda x: x.cast("double"))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query vector.

    Output: (query_id, vec_id, cos_sim, rank), rank 1..k, self-match
    excluded, ties broken by vec_id.  The queries side is broadcast.
    """
    from pyspark.sql import Window

    v = vectors.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("v")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), as_double(F.col(vec_col)).alias("q")
    )
    scored = v.join(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    scored = scored.withColumn(
        "cos_sim", F.round(cosine(F.col("q"), F.col("v")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


def sign_lsh_bucket(vec: Column, dims: list[int]) -> Column:
    """Deterministic sign-LSH bucket id: bit j = 1 iff vec[dims[j]] > 0.

    A fixed-dim sign signature is the degenerate (axis-aligned) random
    hyperplane LSH — deterministic, oracle-reproducible; production would
    draw random hyperplanes per run seed.
    """
    bits = [
        F.when(F.element_at(vec, d + 1) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j, d in enumerate(dims)
    ]
    return sum(bits[1:], start=bits[0]).cast("long")


def lsh_bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dims: list[int] | None = None,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket.

    At corpus scale the bucket join is an equi-join on the bucket id (hash
    shuffle, AQE-skew-aware) instead of a full scan per query.
    """
    from pyspark.sql import Window

    if dims is None:
        dims = [0, 8, 16, 24, 32, 40, 48, 56]
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        as_double(F.col(vec_col)).alias("v"),
    ).withColumn("bucket", sign_lsh_bucket(F.col("v"), dims))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("q"),
    ).withColumn("bucket", sign_lsh_bucket(F.col("q"), dims))
    scored = v.join(F.broadcast(q), "bucket").filter(F.col("vec_id") != F.col("query_id"))
    scored = scored.withColumn("cos_sim", F.round(cosine(F.col("q"), F.col("v")), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )
