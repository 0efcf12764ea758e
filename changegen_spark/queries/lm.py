"""Statistical text modeling over the documents table: duplicate-span
detection, n-gram language-model quality scoring, and BPE tokenization.

Three more pieces of the LLM-corpus toolchain (beyond-parity surface — the
reference has none of these; the family complement of queries/mlprep.py):

* ``q_dup_spans`` — substring-level deduplication à la "Deduplicating
  Training Data Makes Language Models Better" (Lee et al. 2022): find every
  maximal token span whose {DUP_N}-gram content occurs more than once in
  the corpus.  Plan: posexplode n-grams with positions → md5 the gram so
  the corpus-scale groupBy shuffles 16-byte keys instead of strings →
  count>1 → semi-join back → per-doc interval merge (gaps-and-islands,
  one window partitioned by doc).  Never all-pairs; every stage is an
  equi-shuffle keyed by gram hash or doc.
* ``q_lm_score`` — corpus-trained bigram LM with add-1 smoothing scoring
  each document's average negative log-likelihood (the KenLM-style
  perplexity quality signal used by CCNet/Gopher-style filters).  Counts
  are two groupBy aggregations; scoring is two equi-joins (bigram counts,
  unigram counts) plus a broadcast 1-row vocabulary size.
* ``q_bpe_merges`` / ``q_bpe_encode_stats`` — tokenizer training and
  application (functions/bpe.py).  Iterative merge learning is not
  single-statement SQL, so these are rows-only for the driver; the hard
  check is tests/test_bpe.py, which pins the merge list against an
  independent reference implementation.

Oracle determinism: integer outputs exact; ``nll`` rounded to 6 dp and
``ppl`` to 3 dp (double summation order differs across engines only at
~1e-12 relative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from changegen_spark.queries.mlprep import word_ngrams, _toks
from changegen_spark.sources.tables import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# --- duplicate-span detection ------------------------------------------------

DUP_N = 8  # word n-gram order; Lee et al. use 50 BPE tokens — 8 words fits
# the ~54-word synthetic docs while exercising the identical plan shape


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated token spans per document.

    A span is the interval union of all {DUP_N}-token windows whose content
    appears ≥2 times corpus-wide (within- or cross-document).  Because all
    windows have equal length, intervals sorted by start have monotone
    ends, so the union is a lag-based gaps-and-islands: a new island starts
    when the gap to the previous duplicated window exceeds DUP_N-1."""
    docs = _docs(spark, sf_dir)
    grams = docs.select(
        "doc_id",
        F.posexplode(word_ngrams(_toks(F.col("text")), DUP_N)).alias("p0", "ng"),
    ).select(
        "doc_id",
        (F.col("p0") + 1).cast("long").alias("pos"),
        F.md5(F.col("ng")).alias("gh"),  # 16-byte shuffle key, not the string
    )
    dup = grams.groupBy("gh").agg(F.count("*").alias("c")).filter(F.col("c") > 1)
    hits = grams.join(dup.select("gh"), "gh", "left_semi").select("doc_id", "pos")

    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = hits.withColumn(
        "ni",
        F.when(F.col("pos") - F.lag("pos").over(w) <= DUP_N - 1, F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    isl = flagged.withColumn(
        "grp",
        F.sum("ni").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(DUP_N - 1)).alias("span_end"),
            F.count("*").alias("n_dup_grams"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
            "n_dup_grams",
        )
        .orderBy("doc_id", "span_start")
    )


Q_DUP_SPANS_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
), ngr AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         array_to_string(t[CAST(i AS INT):CAST(i AS INT) + {DUP_N - 1}], ' ') AS ng
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - {DUP_N - 1})) AS i
        FROM toks WHERE len(t) >= {DUP_N})
), dup AS (
  SELECT ng FROM ngr GROUP BY ng HAVING count(*) > 1
), hits AS (
  SELECT doc_id, pos FROM ngr WHERE ng IN (SELECT ng FROM dup)
), flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {DUP_N - 1} THEN 0 ELSE 1 END AS ni
  FROM hits
), isl AS (
  SELECT doc_id, pos,
         sum(ni) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
  FROM flagged
)
SELECT doc_id,
       min(pos) AS span_start,
       max(pos) + {DUP_N - 1} AS span_end,
       max(pos) + {DUP_N - 1} - min(pos) + 1 AS span_tokens,
       count(*) AS n_dup_grams
FROM isl
GROUP BY doc_id, grp
ORDER BY doc_id, span_start
"""


# --- bigram LM quality scoring ----------------------------------------------


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average negative log-likelihood under a corpus bigram
    LM with add-1 smoothing:  P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V).

    Unigram counts are over ALL token occurrences (same definition on both
    engines).  Documents with fewer than 2 tokens have no bigrams and are
    absent from the output."""
    docs = _docs(spark, sf_dir)
    toks = _toks(F.col("text"))
    words = docs.select(F.explode(toks).alias("w"))
    uni = words.groupBy("w").agg(F.count("*").alias("cu"))
    vdf = uni.agg(F.count("*").alias("v"))

    bigrams = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(toks) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.struct(
                        F.element_at(toks, i).alias("w1"),
                        F.element_at(toks, i + F.lit(1)).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    bc = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    logp = F.log((F.col("cb") + F.lit(1.0)) / (F.col("cu") + F.col("v")))
    return (
        bigrams.join(bc, ["w1", "w2"])
        .join(uni.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vdf))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(-F.avg(logp), 6).alias("nll"),
            F.round(F.exp(-F.avg(logp)), 3).alias("ppl"),
        )
        .orderBy("doc_id")
    )


Q_LM_SCORE_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
), words AS (
  SELECT doc_id, unnest(t) AS w FROM toks
), uni AS (
  SELECT w, count(*) AS cu FROM words GROUP BY w
), v AS (
  SELECT count(*) AS v FROM uni
), bg AS (
  SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM toks WHERE len(t) >= 2)
), bc AS (
  SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2
)
SELECT doc_id, count(*) AS n_bigrams,
       round(-avg(ln((cb + 1.0) / (cu + v))), 6) AS nll,
       round(exp(-avg(ln((cb + 1.0) / (cu + v)))), 3) AS ppl
FROM bg
JOIN bc USING (w1, w2)
JOIN uni ON bg.w1 = uni.w
CROSS JOIN v
GROUP BY doc_id
ORDER BY doc_id
"""


# --- BPE tokenizer -----------------------------------------------------------

BPE_MERGES = 40


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned merge table (rank, left, right, merged, pair_count).

    Rows-only for the driver (iterative merge learning is not
    single-statement SQL); the independent-implementation parity check is
    tests/test_bpe.py::test_train_matches_reference_implementation."""
    from changegen_spark.functions.bpe import bpe_train, word_counts

    docs = _docs(spark, sf_dir)
    merges = bpe_train(word_counts(docs), num_merges=BPE_MERGES)
    return spark.createDataFrame(
        [(i, l, r, m, c) for i, (l, r, m, c) in enumerate(merges)],
        "rank INT, left STRING, right STRING, merged STRING, pair_count BIGINT",
    ).orderBy("rank")


def q_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document with the corpus-trained merges; per-doc token
    accounting (words, BPE tokens, chars-per-token compression)."""
    from changegen_spark.functions.bpe import bpe_encode_udf, bpe_train, word_counts

    docs = _docs(spark, sf_dir)
    merges = bpe_train(word_counts(docs), num_merges=BPE_MERGES)
    enc = bpe_encode_udf(merges)
    toks = _toks(F.col("text"))
    return (
        docs.select(
            "doc_id",
            F.size(toks).alias("n_words"),
            enc(F.col("text")).alias("bpe"),
            F.length(F.trim(F.col("text"))).alias("n_chars"),
        )
        .select(
            "doc_id",
            "n_words",
            F.size(F.col("bpe")).alias("n_bpe_tokens"),
            F.round(F.col("n_chars") / F.size(F.col("bpe")), 6).alias(
                "chars_per_token"
            ),
        )
        .orderBy("doc_id")
    )


QUERIES = {
    "q_dup_spans": q_dup_spans,
    "q_lm_score": q_lm_score,
    "q_bpe_merges": q_bpe_merges,
    "q_bpe_encode_stats": q_bpe_encode_stats,
}

ORACLES = {
    "q_dup_spans": Q_DUP_SPANS_SQL,
    "q_lm_score": Q_LM_SCORE_SQL,
}
