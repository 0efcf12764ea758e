"""BM25 ranked retrieval over the documents table.

The lexical-search complement of the vector/ANN family (queries/vectors.py):
score every document against a fixed keyword query with Okapi BM25 and
return the top-k.  This is the retrieval shape a training-data pipeline
uses for targeted corpus slicing ("pull the docs about X") and for
hard-negative mining next to embedding search.

Determinism: BM25 term scores are doubles, and a per-document SUM of
doubles is shuffle-order-dependent in the last ulp — so each term's score
is scaled to an e9 integer FIRST (``CAST(round(s * 1e9) AS BIGINT)``) and
the per-document total is an exact integer sum (the registry's
scaled-integer discipline).  idf/tf inputs are exact counts, avgdl the
ratio of two exact integers, so every engine computes bit-identical term
scores before rounding.

Scale design (100 TB corpus, 1000 executors):

* One tokenize pass; the explode is filtered to the query terms BEFORE
  any shuffle (an in-set predicate on a handful of literals — Catalyst
  pushes it into the generate), so the per-term frequency aggregation
  shuffles only rows mentioning query terms, a vanishing fraction of the
  corpus.
* Document frequencies and corpus stats (N, avgdl) aggregate to a
  literally tiny frame that broadcasts back onto the per-doc scores —
  no corpus-sized join side anywhere.
* Top-k is a ``LIMIT`` over a total order (score desc, doc_id), which
  Spark executes as per-partition top-k + a single-reducer merge of k
  rows per partition — never a global sort of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changegen_spark.queries.mlprep import _toks
from changegen_spark.sources.tables import load_table

BM25_TERMS = ("spark", "join", "fast")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{BM25_TOPK} documents by Okapi BM25 against the fixed query
    ``{BM25_TERMS}``:  score = sum_t idf(t) * tf*(k1+1) /
    (tf + k1*(1 - b + b*dl/avgdl)) with the Robertson-Sparck Jones idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

    Output: (doc_id, n_terms_hit, score_e9) — score in e9 fixed-point,
    ties broken by doc_id ascending.
    """
    docs = load_table(spark, sf_dir, "documents")
    lens = docs.select("doc_id", F.size(_toks(F.col("text"))).alias("dl"))
    stats = lens.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    terms = list(BM25_TERMS)
    tf = (
        docs.select("doc_id", F.explode(_toks(F.col("text"))).alias("w"))
        .filter(F.col("w").isin(terms))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("w").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B)
        + F.lit(BM25_B) * F.col("dl") / (F.col("sum_dl") / F.col("n_docs"))
    )
    term_score = idf * (F.col("tf") * F.lit(BM25_K1 + 1.0)) / (F.col("tf") + norm)
    return (
        tf.join(F.broadcast(df_), "w")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(term_score * 1e9).cast("long").alias("s_e9"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_hit"),
            F.sum("s_e9").alias("score_e9"),
        )
        .orderBy(F.desc("score_e9"), "doc_id")
        .limit(BM25_TOPK)
    )


_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

Q_BM25_SQL = f"""
WITH lens AS (
  SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS dl
  FROM documents
), stats AS (
  SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM lens
), tf AS (
  SELECT doc_id, w, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents)
  WHERE w IN ({_TERMS_SQL})
  GROUP BY doc_id, w
), dfr AS (
  SELECT w, count(*) AS df FROM tf GROUP BY w
), scored AS (
  SELECT tf.doc_id,
         CAST(round(
           ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * (tf * {BM25_K1 + 1.0})
           / (tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl
                                / (sum_dl * 1.0 / n_docs)))
           * 1e9) AS BIGINT) AS s_e9
  FROM tf
  JOIN dfr USING (w)
  JOIN lens ON tf.doc_id = lens.doc_id
  CROSS JOIN stats
)
SELECT doc_id, count(*) AS n_terms_hit, CAST(sum(s_e9) AS BIGINT) AS score_e9
FROM scored
GROUP BY doc_id
ORDER BY score_e9 DESC, doc_id
LIMIT {BM25_TOPK}
"""


QUERIES = {"q_bm25_search": q_bm25_search}
ORACLES = {"q_bm25_search": Q_BM25_SQL}
