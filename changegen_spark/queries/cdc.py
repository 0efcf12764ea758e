"""Content-defined chunking (CDC) and chunk-level deduplication.

The storage-dedup primitive (Muthitacharoen et al. 2001 LBFS; FastCDC,
USENIX ATC'16) applied to text corpora: chunk boundaries are declared
where a hash of the trailing ``CDC_WIN``-char window satisfies a
probabilistic mask, so boundaries are a function of CONTENT, not
position.  Insert a prefix into a document and every boundary after the
edit re-synchronizes — shifted or concatenated duplicate content still
produces identical chunks, which fixed-size chunking misses entirely and
whole-doc hashing (``q_exact_dedup``) can't see at all.  Together with
MinHash-LSH (similarity), dup-spans (token windows) and winnowing
(selected fingerprints) this completes the dedup family's granularities.

Cross-engine contract: the boundary predicate is
``substr(md5(window), 1, 2) < '08'`` over the lowercased text's trailing
16-char windows (p = 8/256 = 1/32 → ~32-char mean chunks on random
text), and the chunk content hash is md5 of the chunk substring — both
computable identically in DuckDB SQL (positional generate_series
formulation) and in the Arrow-batched Spark UDF (single pass per doc).

Scale design: chunking is MAP-ONLY (one Arrow UDF pass per document —
no positional explode ever hits the engine; the oracle's per-char
explode is the *verification* formulation, not the production one).
The only shuffle is the chunk-hash groupBy for cross-doc dup counting,
keyed on 16-byte hashes — the same shape as exact dedup.  Nothing is
all-pairs; at 100 TB the chunk-hash exchange is the cost, and it
partitions uniformly by construction (hashes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changegen_spark.sources.tables import load_table

CDC_WIN = 16  # rolling-window width in chars
CDC_MASK = "08"  # boundary iff first 2 md5 hex chars < mask → p = 1/32


def cdc_chunks_pandas():
    """text → array<struct<cstart:long, clen:long, chash:string>>:
    content-defined chunks of the lowercased text, 1-based start
    positions, chunk-content md5 (the Spark production path — one Python
    pass per doc over Arrow batches)."""
    import hashlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<cstart:long,clen:long,chash:string>>")
    def chunks(texts):
        md5 = hashlib.md5
        out = []
        for t in texts:
            s = (t or "").lower()
            n = len(s)
            bounds = [
                i
                for i in range(CDC_WIN, n + 1)
                if md5(s[i - CDC_WIN : i].encode()).hexdigest()[:2] < CDC_MASK
            ]
            if not bounds or bounds[-1] != n:
                bounds.append(n)
            res, prev = [], 0
            for b in bounds:
                if b > prev:
                    chunk = s[prev:b]
                    res.append((prev + 1, b - prev, md5(chunk.encode()).hexdigest()))
                    prev = b
            out.append(res)
        return pd.Series(out)

    return chunks


def _doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.explode(cdc_chunks_pandas()(F.col("text"))).alias("c")
    ).select(
        "doc_id",
        F.col("c.cstart").alias("cstart"),
        F.col("c.clen").alias("clen"),
        F.col("c.chash").alias("chash"),
    )


def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document CDC summary + cross-corpus chunk-level duplication:
    chunk count/size stats and the fraction of characters living in
    chunks whose content appears in >= 2 distinct documents."""
    ch = _doc_chunks(spark, sf_dir).localCheckpoint(eager=False)
    shared = (
        ch.groupBy("chash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("chash")
    )
    flagged = ch.join(shared, "chash", "left_semi").groupBy("doc_id").agg(
        F.count("*").alias("n_dup_chunks"),
        F.sum("clen").alias("dup_chars"),
    )
    per_doc = ch.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("clen").alias("n_chars"),
        F.max("clen").alias("max_chunk"),
    )
    return (
        per_doc.join(flagged, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            "n_chars",
            "max_chunk",
            F.coalesce("n_dup_chunks", F.lit(0)).alias("n_dup_chunks"),
            F.round(
                F.coalesce("dup_chars", F.lit(0)) / F.col("n_chars"), 6
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


Q_CDC_CHUNKS_SQL = f"""
WITH lt AS (
  SELECT doc_id, lower(text) AS s, length(lower(text)) AS n FROM documents
  WHERE length(text) > 0
), pos AS (
  SELECT doc_id, s, n, unnest(generate_series({CDC_WIN}, n)) AS i FROM lt
  WHERE n >= {CDC_WIN}
), bnd AS (
  SELECT doc_id, CAST(i AS BIGINT) AS b FROM pos
  WHERE substr(md5(substr(s, CAST(i - {CDC_WIN - 1} AS INT), {CDC_WIN})), 1, 2)
        < '{CDC_MASK}'
  UNION
  SELECT doc_id, CAST(n AS BIGINT) FROM lt
), chunks AS (
  SELECT l.doc_id,
         coalesce(lag(b) OVER (PARTITION BY l.doc_id ORDER BY b), 0) + 1 AS cstart,
         b - coalesce(lag(b) OVER (PARTITION BY l.doc_id ORDER BY b), 0) AS clen,
         md5(substr(l.s,
                    CAST(coalesce(lag(b) OVER (PARTITION BY l.doc_id ORDER BY b), 0) + 1 AS INT),
                    CAST(b - coalesce(lag(b) OVER (PARTITION BY l.doc_id ORDER BY b), 0) AS INT)))
           AS chash
  FROM bnd JOIN lt l ON bnd.doc_id = l.doc_id
), shared AS (
  SELECT chash FROM chunks GROUP BY chash HAVING count(DISTINCT doc_id) >= 2
), flagged AS (
  SELECT doc_id, count(*) AS n_dup_chunks, sum(clen) AS dup_chars
  FROM chunks WHERE chash IN (SELECT chash FROM shared) GROUP BY doc_id
), per_doc AS (
  SELECT doc_id, count(*) AS n_chunks, CAST(sum(clen) AS BIGINT) AS n_chars,
         CAST(max(clen) AS BIGINT) AS max_chunk
  FROM chunks GROUP BY doc_id
)
SELECT p.doc_id, p.n_chunks, p.n_chars, p.max_chunk,
       coalesce(f.n_dup_chunks, 0) AS n_dup_chunks,
       round(CAST(coalesce(f.dup_chars, 0) AS DOUBLE) / p.n_chars, 6) AS dup_frac
FROM per_doc p LEFT JOIN flagged f ON p.doc_id = f.doc_id
ORDER BY p.doc_id
"""


QUERIES = {"q_cdc_chunks": q_cdc_chunks}
ORACLES = {"q_cdc_chunks": Q_CDC_CHUNKS_SQL}
