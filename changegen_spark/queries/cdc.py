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

Cross-engine contract: the boundary predicate is a WINDOWED POLYNOMIAL
rolling hash — ``H(i) = Σ_{d=0..15} code(s[i-d]) · B^d  (mod 2^64)``
over the lowercased text's trailing 16-char windows (B = 1000003),
boundary iff ``H(i) < 2^64/32`` (top 5 bits zero → p = 1/32 → ~32-char
mean chunks) — and the chunk content hash is md5 of the chunk
substring.  The hash is 16 vectorized numpy multiply-adds per document
(uint64 wraparound IS the mod-2^64) on the Spark side and exact HUGEINT
arithmetic in the DuckDB oracle — bit-identical by construction, and
~100× cheaper than the per-position ``hashlib.md5`` it replaced (the r3
verdict's highest per-byte Python cost).

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
CDC_B = 1000003  # polynomial base (prime)
CDC_M = 1 << 64  # modulus: native uint64 wraparound
CDC_THRESH = CDC_M // 32  # boundary iff H < 2^64/32 → p = 1/32


def chunk_rows(df: DataFrame) -> DataFrame:
    """(doc_id, text) → flat (doc_id, cstart, clen, chash) chunk rows in a
    single ``mapInArrow`` pass: whole-batch vectorized boundary hashing and
    native Arrow output arrays — no array<struct> python serialization, no
    downstream explode."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    W = CDC_WIN
    # weights[j] pairs with window offset j (0 = oldest char): B^(W-1-j)
    weights = np.array(
        [pow(CDC_B, W - 1 - j, CDC_M) for j in range(W)], dtype=np.uint64
    )
    thresh = np.uint64(CDC_THRESH)

    def chunks(batches):
        md5 = hashlib.md5
        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            # whole-batch vectorization: one concatenated codepoint array,
            # ONE set of 16 multiply-adds for every window in the batch
            # (per-doc numpy dispatch on ~300-char docs costs more than the
            # math); windows never cross documents because each doc only
            # reads the H indices fully inside its own span.
            texts_l = [(t or "").lower() for t in texts]
            big = np.frombuffer(
                "".join(texts_l).encode("utf-32-le"), dtype=np.uint32
            ).astype(np.uint64)
            N = len(big)
            if N >= W:
                H = np.zeros(N - W + 1, dtype=np.uint64)
                for j in range(W):  # 16 vectorized multiply-adds, mod 2^64
                    H += big[j : j + N - W + 1] * weights[j]
                bmask = H < thresh
            else:
                bmask = np.zeros(0, dtype=bool)
            o_doc, o_start, o_len, o_hash = [], [], [], []
            lo = 0
            for docid, s in zip(doc_ids, texts_l):
                n = len(s)
                if n >= W:
                    # doc-local window end i ∈ [W, n] ↔ global index lo+i-W
                    bounds = (
                        np.nonzero(bmask[lo : lo + n - W + 1])[0] + W
                    ).tolist()
                else:
                    bounds = []
                lo += n
                if not bounds or bounds[-1] != n:
                    bounds.append(n)
                prev = 0
                for b in bounds:
                    if b > prev:
                        o_doc.append(docid)
                        o_start.append(prev + 1)
                        o_len.append(b - prev)
                        o_hash.append(md5(s[prev:b].encode()).hexdigest())
                        prev = b
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_doc, pa.int64()),
                    pa.array(o_start, pa.int64()),
                    pa.array(o_len, pa.int64()),
                    pa.array(o_hash, pa.string()),
                ],
                ["doc_id", "cstart", "clen", "chash"],
            )

    # input contract is already (doc_id, text): callers project before the
    # (possible) spread exchange so only those two columns ever move
    return df.mapInArrow(
        chunks, "doc_id long, cstart long, clen long, chash string"
    )


def _doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from changegen_spark.functions.spread import (
        CDC_BYTES_PER_TASK,
        spread_if_narrow,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # Scale-adaptive parallelism, cost-gated (guide §2, r14): the chunking
    # pass is whole-batch vectorized numpy — cheap per byte — so a task
    # needs megabytes of text before a spread exchange pays for itself.
    # The r13 unconditional spread-to-parallelism was a driver-measured
    # regression here (0.89 s unspread in r12 vs 1.97 s at 32-way / 1.30 s
    # at 8-way in r13); with the 4 MiB/task dial the sf0.1 scan stays
    # unspread and at 100 TB the helper is a no-op (splits >= cores).
    d = spread_if_narrow(d, "doc_id", CDC_BYTES_PER_TASK)
    return chunk_rows(d)


def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document CDC summary + cross-corpus chunk-level duplication:
    chunk count/size stats and the fraction of characters living in
    chunks whose content appears in >= 2 distinct documents."""
    # checkpoint only what the aggregates read (cstart is unused here)
    ch = (
        _doc_chunks(spark, sf_dir)
        .select("doc_id", "clen", "chash")
        .localCheckpoint(eager=False)
    )
    shared = (
        ch.groupBy("chash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("chash")
    )
    # one doc_id aggregation: left-join the shared-hash set (duplicate flag)
    # then fold count/sum/max and the conditional dup sums in a single pass
    # — the r3 shape ran two doc_id groupBys plus a doc_id join.
    dup = F.col("__dup").isNotNull()
    return (
        ch.join(shared.withColumn("__dup", F.lit(1)), "chash", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("clen").alias("n_chars"),
            F.max("clen").alias("max_chunk"),
            F.sum(F.when(dup, 1).otherwise(0)).alias("n_dup_chunks"),
            F.sum(F.when(dup, F.col("clen")).otherwise(0)).alias("dup_chars"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_chars",
            "max_chunk",
            "n_dup_chunks",
            F.round(F.col("dup_chars") / F.col("n_chars"), 6).alias("dup_frac"),
        )
    )


# the oracle's boundary hash: exact HUGEINT polynomial, term d = codepoint
# of the char d positions before the window end, weighted B^d mod 2^64
_ROLL_TERMS = " + ".join(
    f"CAST(unicode(substr(s, CAST(i - {d} AS INT), 1)) AS HUGEINT)"
    f" * {pow(CDC_B, d, CDC_M)}"
    for d in range(CDC_WIN)
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
  WHERE ({_ROLL_TERMS}) % {CDC_M} < {CDC_THRESH}
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
"""


QUERIES = {"q_cdc_chunks": q_cdc_chunks}
ORACLES = {"q_cdc_chunks": Q_CDC_CHUNKS_SQL}
