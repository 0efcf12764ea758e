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


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer + probe-top-cells.

    Scale path beyond sign-LSH: vectors partition into ``n_cells`` Voronoi
    cells (trained once, reused across queries); each query scores only the
    vectors of its ``n_probe`` nearest cells — an equi-join on cell id, so
    search cost is (n_probe/n_cells) of a full scan and the shuffle is
    keyed by cell.  Training is a one-time O(iterations · n) job; at 100 TB
    train on a sample and broadcast the centroid table (tiny: cells × dim).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    v = vectors.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("v")
    )
    train = v.withColumn("features", array_to_vector("v"))
    model = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(train)
    assigned = model.transform(train).select(
        "vec_id", "v", F.col("prediction").alias("cell")
    )

    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    cdf = vectors.sparkSession.createDataFrame(
        centroids, "cell int, centroid array<double>"
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), as_double(F.col(vec_col)).alias("q")
    )
    # query → n_probe nearest cells (centroid table is tiny → broadcast)
    qc = q.crossJoin(F.broadcast(cdf)).withColumn(
        "cdist",
        F.aggregate(
            F.zip_with(F.col("q"), F.col("centroid"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("cdist"), F.asc("cell"))
    probes = (
        qc.withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= n_probe)
        .select("query_id", "q", "cell")
    )

    scored = assigned.join(probes, "cell").filter(F.col("vec_id") != F.col("query_id"))
    scored = scored.withColumn("cos_sim", F.round(cosine(F.col("q"), F.col("v")), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


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
