"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
2003 — the MOSS algorithm).

The third fingerprinting primitive next to the rolling-hash
``q_fingerprint`` (whole-doc canonicalization) and ``q_dup_spans``
(duplicated-window spans): winnowing selects, from every window of
``WINNOW_W`` consecutive positioned ``WINNOW_K``-gram hashes, the minimal
hash (rightmost on ties — "robust winnowing"), yielding a position-aware
fingerprint SET per document with a hard guarantee: any token run of
length >= WINNOW_W + WINNOW_K - 1 shared between two documents shares at
least one selected fingerprint.  That makes the fingerprint join a
zero-false-negative candidate generator for substring-level overlap —
the plagiarism/near-dup detection shape, distinct from whole-doc (exact
dedup) and from per-doc spans (dup_spans).

Scale design: positioned grams are the same Arrow-batched map-only stage
as ``q_dup_spans`` (``lm.pos_gram_hashes_pandas``); selection is a
bounded ROWS window per document (partitioned by doc_id — no global
shuffle beyond the doc_id exchange); the pair join runs on SELECTED
fingerprints only (~2/(W+1) of all grams, the winnowing density bound),
never on all grams.  At 100 TB every stage is map-side or a doc_id/hash
equi-shuffle; there is no all-pairs anything — pair candidates inherit
LSH-band-style locality from the fingerprint equi-join.

Cross-engine contract: gram hashes are lowercase-hex md5 of the
space-joined token gram (Spark: ``lower(hex(gh))`` over the UDF's digest
bytes; DuckDB: ``md5(ng)``), and the per-window argmin tie-break is
encoded identically on both sides (hash asc, then position desc via the
``100000000 - pos`` zero-padded suffix), so the selected sets are
engine-exact.  Reference scope note: the reference engine has no
fingerprinting at all (SURVEY §2.10) — this family is deliberate
beyond-parity surface for the training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from changegen_spark.sources.tables import load_table

WINNOW_K = 4  # word-gram order
WINNOW_W = 5  # hashes per winnowing window; guarantee length = W + K - 1 = 8
MIN_SHARED = 3  # pair-candidate reporting threshold


def _grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, h): positioned word-K-gram lowercase-hex md5 hashes."""
    from changegen_spark.queries.lm import pos_gram_hashes_pandas

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode(pos_gram_hashes_pandas(WINNOW_K)(F.col("text"))).alias("g"),
    ).select(
        "doc_id",
        F.col("g.pos").alias("pos"),
        F.lower(F.hex(F.col("g.gh"))).alias("h"),
    )


def winnow_fingerprints(grams: DataFrame) -> DataFrame:
    """(doc_id, fpos, fh): the distinct selected fingerprints.

    A gram row at position ``pos`` is a full window START iff
    ``pos <= n_grams - W + 1``; the selection is the frame minimum over
    the next W rows with the (h asc, pos desc) tie-break.  Documents with
    fewer than W grams have no full window and are skipped (the MOSS
    short-document convention; pinned in tests)."""
    w_sel = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, WINNOW_W - 1)
    )
    w_cnt = Window.partitionBy("doc_id")
    sel = (
        grams.withColumn("n_grams", F.count("*").over(w_cnt))
        .withColumn(
            "mn",
            F.min(F.struct(F.col("h"), (F.lit(100000000) - F.col("pos")).alias("np"))).over(
                w_sel
            ),
        )
        .filter(F.col("pos") <= F.col("n_grams") - F.lit(WINNOW_W) + F.lit(1))
    )
    return sel.select(
        "doc_id",
        (F.lit(100000000) - F.col("mn.np")).alias("fpos"),
        F.col("mn.h").alias("fh"),
    ).distinct()


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document winnowing summary: gram count, full-window count,
    selected-fingerprint count, and selection density (the winnowing
    bound says density -> 2/(W+1) on random text)."""
    grams = _grams(spark, sf_dir)
    per_doc = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    fp = (
        winnow_fingerprints(grams)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_fp"))
    )
    return (
        per_doc.filter(F.col("n_grams") >= WINNOW_W)
        .join(fp, "doc_id")
        .select(
            "doc_id",
            "n_grams",
            (F.col("n_grams") - F.lit(WINNOW_W) + F.lit(1)).alias("n_windows"),
            "n_fp",
            F.round(
                F.col("n_fp") / (F.col("n_grams") - F.lit(WINNOW_W) + F.lit(1)), 6
            ).alias("fp_density"),
        )
        .orderBy("doc_id")
    )


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing >= MIN_SHARED selected fingerprint HASHES —
    the winnowing candidate join (shared hash values, position-free, as
    MOSS matches them).  Distinct hash values only, so a hash winnowed at
    several positions in one doc counts once per pair."""
    fp = winnow_fingerprints(_grams(spark, sf_dir))
    hv = fp.select("doc_id", "fh").distinct()
    return (
        hv.alias("a")
        .join(
            hv.alias("b"),
            (F.col("a.fh") == F.col("b.fh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= F.lit(MIN_SHARED))
        .orderBy("id_a", "id_b")
    )


_GRAMS_SQL = f"""
toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
), grams AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         md5(array_to_string(t[CAST(i AS INT):CAST(i AS INT) + {WINNOW_K - 1}], ' ')) AS h
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - {WINNOW_K - 1})) AS i
        FROM toks WHERE len(t) >= {WINNOW_K})
), sized AS (
  SELECT doc_id, pos, h, count(*) OVER (PARTITION BY doc_id) AS n_grams,
         min(h || lpad(CAST(100000000 - pos AS VARCHAR), 9, '0'))
             OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS mn
  FROM grams
), fp AS (
  SELECT DISTINCT doc_id,
         100000000 - CAST(substr(mn, 33) AS BIGINT) AS fpos,
         substr(mn, 1, 32) AS fh
  FROM sized WHERE pos <= n_grams - {WINNOW_W} + 1
)"""


Q_WINNOW_FP_SQL = f"""
WITH {_GRAMS_SQL},
counts AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
fpc AS (SELECT doc_id, count(*) AS n_fp FROM fp GROUP BY doc_id)
SELECT c.doc_id, c.n_grams,
       c.n_grams - {WINNOW_W} + 1 AS n_windows,
       fpc.n_fp,
       round(CAST(fpc.n_fp AS DOUBLE) / (c.n_grams - {WINNOW_W} + 1), 6) AS fp_density
FROM counts c JOIN fpc ON c.doc_id = fpc.doc_id
WHERE c.n_grams >= {WINNOW_W}
ORDER BY c.doc_id
"""


Q_WINNOW_PAIRS_SQL = f"""
WITH {_GRAMS_SQL},
hv AS (SELECT DISTINCT doc_id, fh FROM fp)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
FROM hv a JOIN hv b ON a.fh = b.fh AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= {MIN_SHARED}
ORDER BY id_a, id_b
"""


QUERIES = {
    "q_winnow_fingerprints": q_winnow_fingerprints,
    "q_winnow_pairs": q_winnow_pairs,
}
ORACLES = {
    "q_winnow_fingerprints": Q_WINNOW_FP_SQL,
    "q_winnow_pairs": Q_WINNOW_PAIRS_SQL,
}
