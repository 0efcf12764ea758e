"""RAG-prep document chunking (r6 new family).

Retrieval pipelines split documents into bounded token chunks before
embedding; the two standard strategies, both exact and engine-portable:

* ``q_chunk_fixed``     — fixed token windows of ``CHUNK_W`` tokens at
  stride ``CHUNK_S`` (overlap = W − S): chunk starts at 0, S, 2S, …
  while start < n_tokens; each chunk carries its token span, its exact
  text fingerprint (md5 of the space-joined tokens, computable
  identically from the token array in both engines), and is emitted with
  a deterministic corpus-unique chunk key.
* ``q_chunk_sentences`` — sentence-aligned chunks by GLOBAL-OFFSET
  bucketing: sentences (split on '.') are assigned to chunk
  ``floor(cum_tokens_before / CHUNK_B)``.  Unlike reset-greedy packing
  (a per-doc sequential recurrence), offset bucketing is a pure window
  sum — embarrassingly parallel, exactly reproducible, and the chunk
  token counts stay within [B − max_sentence, B + max_sentence).

100 TB shape: both are map-side explodes off a per-doc token count —
no shuffle beyond the final presentation sort; chunk keys are derived,
not sequenced, so no global ID coordination.  The row amplification
factor is W/S (fixed) or ~1 (sentences) — the knob a corpus embedding
run sizes its cluster by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changegen_spark.sources.tables import load_table

CHUNK_W = 64  # tokens per fixed chunk
CHUNK_S = 48  # stride (overlap = 16)
CHUNK_B = 80  # token budget per sentence-aligned chunk


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def q_chunk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding fixed-size token windows with overlap.  tok_start/tok_end
    are 0-based [start, end) spans; chunk_hash fingerprints the exact
    token content so downstream dedup/embedding caches can key on it."""
    d = _docs(spark, sf_dir)
    toks = F.array_remove(F.split(F.trim("text"), r"\s+"), "")
    t = d.select("doc_id", toks.alias("toks")).withColumn(
        "n_tok", F.size("toks")
    )
    starts = F.sequence(
        F.lit(0),
        F.floor((F.col("n_tok") - 1) / CHUNK_S).cast("int") * CHUNK_S,
        F.lit(CHUNK_S),
    )
    e = t.filter(F.col("n_tok") > 0).select(
        "doc_id",
        "toks",
        "n_tok",
        F.explode(starts).alias("tok_start"),
    )
    chunk_toks = F.slice(
        "toks", F.col("tok_start") + 1, F.lit(CHUNK_W)
    )
    return e.select(
        "doc_id",
        (F.col("tok_start") / CHUNK_S).cast("long").alias("chunk_id"),
        F.col("tok_start").cast("long"),
        F.least(F.col("tok_start") + CHUNK_W, F.col("n_tok"))
        .cast("long")
        .alias("tok_end"),
        F.size(chunk_toks).cast("long").alias("n_tokens"),
        F.md5(F.array_join(chunk_toks, " ")).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_id")


Q_CHUNK_FIXED_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []
              ELSE string_split_regex(trim(text), '\\s+') END AS toks
  FROM documents
), e AS (
  SELECT doc_id, toks, len(toks) AS n_tok,
         unnest(generate_series(0, CAST(floor((len(toks) - 1) / {CHUNK_S}) AS BIGINT) * {CHUNK_S}, {CHUNK_S})) AS tok_start
  FROM t WHERE len(toks) > 0
), c AS (
  SELECT doc_id, tok_start,
         list_slice(toks, tok_start + 1, least(tok_start + {CHUNK_W}, n_tok)) AS ct,
         n_tok
  FROM e
)
SELECT doc_id,
       CAST(tok_start / {CHUNK_S} AS BIGINT) AS chunk_id,
       CAST(tok_start AS BIGINT) AS tok_start,
       CAST(least(tok_start + {CHUNK_W}, n_tok) AS BIGINT) AS tok_end,
       CAST(len(ct) AS BIGINT) AS n_tokens,
       md5(array_to_string(ct, ' ')) AS chunk_hash
FROM c
ORDER BY doc_id, chunk_id
"""


def q_chunk_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-aligned chunks via global-offset bucketing: sentence s
    (with w_s tokens) goes to chunk floor(Σ_{{j<s}} w_j / B).  One window
    sum per doc (partitioned by doc_id — bounded by document length, not
    corpus size), then a grouped rollup per chunk."""
    d = _docs(spark, sf_dir)
    # sent_idx is the RAW split position (empties keep their slot in the
    # numbering but are filtered after the explode) — this matches the
    # DuckDB oracle, which indexes generate_series over the raw split and
    # filters trim(sent) <> '' afterwards.  Compacting before the explode
    # (array_remove, the pre-r7 shape) desyncs first_sent/last_sent on any
    # text containing '..' or a leading '.'.
    sents = F.transform(F.split(F.col("text"), r"\."), lambda s: F.trim(s))
    e = (
        d.select("doc_id", F.posexplode(sents).alias("sent_idx", "sent"))
        .withColumn(
            "w",
            F.size(F.array_remove(F.split(F.col("sent"), r"\s+"), "")),
        )
        .filter(F.col("w") > 0)
    )
    from pyspark.sql import Window

    cum_before = (
        F.sum("w")
        .over(
            Window.partitionBy("doc_id")
            .orderBy("sent_idx")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        .cast("long")
    )
    b = e.select(
        "doc_id",
        "sent_idx",
        "w",
        F.floor(F.coalesce(cum_before, F.lit(0)) / CHUNK_B).alias("chunk_id"),
    )
    return (
        b.groupBy("doc_id", "chunk_id")
        .agg(
            F.count("*").alias("n_sentences"),
            F.sum("w").cast("long").alias("n_tokens"),
            F.min("sent_idx").cast("long").alias("first_sent"),
            F.max("sent_idx").cast("long").alias("last_sent"),
        )
        .orderBy("doc_id", "chunk_id")
    )


Q_CHUNK_SENTENCES_SQL = f"""
WITH s AS (
  SELECT doc_id, i - 1 AS sent_idx, trim(list_extract(parts, CAST(i AS INT))) AS sent
  FROM (SELECT doc_id, parts, unnest(generate_series(1, len(parts))) AS i
        FROM (SELECT doc_id, string_split(text, '.') AS parts FROM documents))
), w AS (
  SELECT doc_id, sent_idx,
         len(string_split_regex(trim(sent), '\\s+')) AS w
  FROM s WHERE trim(sent) <> ''
), b AS (
  SELECT doc_id, sent_idx, w,
         CAST(floor(coalesce(sum(w) OVER (PARTITION BY doc_id ORDER BY sent_idx
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    / {CHUNK_B}) AS BIGINT) AS chunk_id
  FROM w
)
SELECT doc_id, chunk_id, count(*) AS n_sentences,
       CAST(sum(w) AS BIGINT) AS n_tokens,
       CAST(min(sent_idx) AS BIGINT) AS first_sent,
       CAST(max(sent_idx) AS BIGINT) AS last_sent
FROM b GROUP BY doc_id, chunk_id
ORDER BY doc_id, chunk_id
"""


QUERIES = {
    "q_chunk_fixed": q_chunk_fixed,
    "q_chunk_sentences": q_chunk_sentences,
}

ORACLES = {
    "q_chunk_fixed": Q_CHUNK_FIXED_SQL,
    "q_chunk_sentences": Q_CHUNK_SENTENCES_SQL,
}
