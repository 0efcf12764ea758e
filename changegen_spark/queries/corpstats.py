"""Corpus-law statistics (r7 new family): Zipf rank-frequency slope and
the Heaps vocabulary-growth curve — the two summary numbers a corpus
intake report leads with (is this corpus natural text, boilerplate, or
machine spam?  how fast does its vocabulary saturate?).

Both queries follow the project's cross-engine determinism contract:

* ``q_zipf_fit`` — token frequencies → distributed top-``ZIPF_TOPN``
  (TakeOrderedAndProject, never a global vocab sort) → OLS of ln(freq)
  on ln(rank) where every point is e6-quantized to a BIGINT FIRST, so
  the five sufficient sums (n, Σx, Σy, Σxy, Σxx) are exact integers and
  independent of partial-aggregation order.  The single closing division
  runs on bit-identical integer inputs in both engines, so the IEEE
  double result is bit-identical too.  Natural text reads slope ≈ −1
  (Zipf's law); heavily deduplicated or templated corpora drift shallow.
* ``q_heaps_curve`` — vocabulary growth at ten doc-id checkpoints:
  each token contributes to the bucket of its FIRST document (one
  groupBy(token) → min(doc_id)), buckets cumulate over a 10-row window.
  Checkpoints are doc_id VALUE deciles (``floor(id·10/(max+1))``), not
  count ranks, so there is no global rank/ntile anywhere — the max id
  is a broadcast 1-row aggregate (the q11 threshold pattern).

100 TB shape: one token-count shuffle each (map-side combine), then
KB-sized finishing frames; the top-N is a distributed top-k.  No window
ever touches a corpus-sized frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from changegen_spark.sources.tables import load_table

ZIPF_TOPN = 128  # keeps n·Σxy within BIGINT with wide margin
HEAPS_BUCKETS = 10


def _toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: (n_points, total_tokens, vocab_size, slope_e6,
    intercept_e6) — the least-squares fit of ln(freq) ~ ln(rank) over the
    top-``ZIPF_TOPN`` tokens, every point e6-quantized before summing."""
    toks = _toks(spark, sf_dir)
    freqs = toks.groupBy("tok").agg(F.count("*").alias("f"))
    corpus = freqs.agg(
        F.sum("f").cast("long").alias("total_tokens"),
        F.count("*").cast("long").alias("vocab_size"),
    )
    top = freqs.orderBy(F.desc("f"), "tok").limit(ZIPF_TOPN)
    w = Window.orderBy(F.desc("f"), "tok")  # ZIPF_TOPN rows only
    pts = top.select(
        F.round(F.log(F.row_number().over(w).cast("double")) * 1e6)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("f").cast("double")) * 1e6).cast("long").alias("y"),
    )
    sums = pts.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    # num/den are exact BIGINTs built from identical integer sums in both
    # engines, so the closing double division is bit-identical as well
    out = sums.select(
        "n",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("den"),
        "sx",
        "sy",
    ).select(
        F.col("n").alias("n_points"),
        F.round(F.col("num").cast("double") * 1e6 / F.col("den").cast("double"))
        .cast("long")
        .alias("slope_e6"),
        F.round(
            (
                F.col("sy").cast("double")
                - F.col("num").cast("double")
                / F.col("den").cast("double")
                * F.col("sx").cast("double")
            )
            / F.col("n").cast("double")
        )
        .cast("long")
        .alias("intercept_e6"),
    )
    return out.crossJoin(F.broadcast(corpus)).select(
        "n_points", "total_tokens", "vocab_size", "slope_e6", "intercept_e6"
    )


Q_ZIPF_FIT_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents
), freqs AS (
  SELECT tok, count(*) AS f FROM toks WHERE tok <> '' GROUP BY tok
), corpus AS (
  SELECT CAST(sum(f) AS BIGINT) AS total_tokens,
         CAST(count(*) AS BIGINT) AS vocab_size
  FROM freqs
), top AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS rnk
  FROM freqs ORDER BY f DESC, tok LIMIT {ZIPF_TOPN}
), pts AS (
  SELECT CAST(round(ln(CAST(rnk AS DOUBLE)) * 1e6) AS BIGINT) AS x,
         CAST(round(ln(CAST(f AS DOUBLE)) * 1e6) AS BIGINT) AS y
  FROM top
), sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM pts
), fit AS (
  SELECT n, CAST(n * sxy - sx * sy AS BIGINT) AS num,
         CAST(n * sxx - sx * sx AS BIGINT) AS den, sx, sy
  FROM sums
)
SELECT n AS n_points, total_tokens, vocab_size,
       CAST(round(CAST(num AS DOUBLE) * 1e6 / CAST(den AS DOUBLE)) AS BIGINT) AS slope_e6,
       CAST(round((CAST(sy AS DOUBLE) - CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) AS BIGINT) AS intercept_e6
FROM fit CROSS JOIN corpus
"""


def q_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ten rows (bucket, docs_cum, tokens_cum, vocab_cum): cumulative doc
    count, token count, and DISTINCT vocabulary after each doc-id value
    decile — the Heaps-law growth curve V(n) ≈ K·n^β read off directly."""
    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").alias("mx"))
    toks = _toks(spark, sf_dir)

    def bucket(col):
        return F.floor(col * HEAPS_BUCKETS / (F.col("mx") + 1)).cast("long")

    per_doc = (
        d.join(F.broadcast(mx))
        .groupBy(bucket(F.col("doc_id")).alias("bucket"))
        .agg(F.count("*").cast("long").alias("docs_new"))
    )
    tok_counts = (
        toks.join(F.broadcast(mx))
        .groupBy(bucket(F.col("doc_id")).alias("bucket"))
        .agg(F.count("*").cast("long").alias("tokens_new"))
    )
    first_seen = (
        toks.groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
        .join(F.broadcast(mx))
        .groupBy(bucket(F.col("first_doc")).alias("bucket"))
        .agg(F.count("*").cast("long").alias("vocab_new"))
    )
    joined = (
        per_doc.join(tok_counts, "bucket", "full_outer")
        .join(first_seen, "bucket", "full_outer")
        .na.fill(0, ["docs_new", "tokens_new", "vocab_new"])
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "bucket",
        F.sum("docs_new").over(w).cast("long").alias("docs_cum"),
        F.sum("tokens_new").over(w).cast("long").alias("tokens_cum"),
        F.sum("vocab_new").over(w).cast("long").alias("vocab_cum"),
    ).orderBy("bucket")


Q_HEAPS_CURVE_SQL = f"""
WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents
), tk AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
per_doc AS (
  SELECT CAST(floor(doc_id * {HEAPS_BUCKETS} / (mx + 1)) AS BIGINT) AS bucket,
         count(*) AS docs_new
  FROM documents CROSS JOIN mx GROUP BY 1
), tok_counts AS (
  SELECT CAST(floor(doc_id * {HEAPS_BUCKETS} / (mx + 1)) AS BIGINT) AS bucket,
         count(*) AS tokens_new
  FROM tk CROSS JOIN mx GROUP BY 1
), first_seen AS (
  SELECT CAST(floor(first_doc * {HEAPS_BUCKETS} / (mx + 1)) AS BIGINT) AS bucket,
         count(*) AS vocab_new
  FROM (SELECT tok, min(doc_id) AS first_doc FROM tk GROUP BY tok)
  CROSS JOIN mx GROUP BY 1
), joined AS (
  SELECT coalesce(p.bucket, t.bucket, v.bucket) AS bucket,
         coalesce(p.docs_new, 0) AS docs_new,
         coalesce(t.tokens_new, 0) AS tokens_new,
         coalesce(v.vocab_new, 0) AS vocab_new
  FROM per_doc p
  FULL OUTER JOIN tok_counts t ON p.bucket = t.bucket
  FULL OUTER JOIN first_seen v ON coalesce(p.bucket, t.bucket) = v.bucket
)
SELECT bucket,
       CAST(sum(docs_new) OVER w AS BIGINT) AS docs_cum,
       CAST(sum(tokens_new) OVER w AS BIGINT) AS tokens_cum,
       CAST(sum(vocab_new) OVER w AS BIGINT) AS vocab_cum
FROM joined
WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY bucket
"""


QUERIES = {"q_zipf_fit": q_zipf_fit, "q_heaps_curve": q_heaps_curve}
ORACLES = {
    "q_zipf_fit": Q_ZIPF_FIT_SQL,
    "q_heaps_curve": Q_HEAPS_CURVE_SQL,
}
