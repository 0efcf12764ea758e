"""C4 web-page cleaning (Raffel et al. 2020, §2.2) over the shipped
page fixture — the third published curation rule-set next to Gopher
(queries/curation.py) and CCNet, and the one that operates on PAGE
structure (lines, sentences) rather than token statistics.

* ``q_c4_line_filter`` — the line rules (keep lines ending in terminal
  punctuation with ≥3 words and no "javascript") plus the page gates
  (≥5 sentences after line filtering; no "lorem ipsum"; no ``{``; no
  bad-word hits): every signal and the composite keep flag in ONE
  map-only pass — higher-order functions only, no UDF, no shuffle.
* ``q_c4_span_dedup`` — the dataset-level three-sentence-span dedup:
  any exact span of 3 consecutive sentences that occurs more than once
  across the (gated) corpus keeps its FIRST occurrence (lowest
  (page_id, position)) and every sentence covered by a later occurrence
  is removed.  Shape: sentence explode → span-key hash shuffle with a
  first-writer window → loser index expansion → anti-join → per-page
  reassembly.  Every stage is a hash shuffle with map-side combine —
  the same linear skeleton as q_dup_spans / q_ngram_novelty, nothing
  quadratic, so the plan holds at crawl scale (C4 ran this on ~750 GB
  post-filter; the span key is the only shuffled payload).

The fixture (tools/make_c4_fixture.py) plants every failure mode with
counts the tests pin, including a boilerplate paragraph whose lowest
page_id occurrence sits on a page the page gates DROP — pinning that
"first writer" means first among SURVIVING occurrences, exactly as a
filter-then-dedup pipeline behaves.

Reference parity note: no counterpart in /root/reference (OSM changegen
has no text pipeline); this family is part of the training-data surface
the build adds beyond the reference, like queries/curation.py.
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

C4_FIXTURE = _os.path.abspath(
    _os.path.join(
        _os.path.dirname(__file__), "..", "..", "fixtures", "c4_pages.parquet"
    )
)

C4_MIN_LINE_WORDS = 3
C4_MIN_SENTENCES = 5
C4_BAD_WORDS = ("crummyword", "lousyword")  # stand-in for the published list
SPAN_N = 3
_SEP = "\x01"  # never occurs in fixture text

# terminal-punctuation line rule (RE2-safe: no lookbehind, works
# identically under Java regex and DuckDB)
_TERMINAL_RE = r"[.!?]$"


def _pages(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(C4_FIXTURE)


def _line_signals(d: DataFrame) -> DataFrame:
    """Per-page line-filter + page-gate signals (single projection)."""
    lines = F.split(F.col("text"), "\n")
    trimmed = F.transform(lines, lambda x: F.trim(x))
    kept = F.filter(
        trimmed,
        lambda x: x.rlike(_TERMINAL_RE)
        & (F.size(F.split(x, r"\s+")) >= C4_MIN_LINE_WORDS)
        & ~F.lower(x).contains("javascript"),
    )
    kept_text = F.array_join(kept, " ")
    low = F.lower(F.col("text"))
    n_sent = F.size(F.split(kept_text, r"[.!?]")) - 1
    has_bad = None
    for w in C4_BAD_WORDS:
        c = low.contains(w)
        has_bad = c if has_bad is None else (has_bad | c)
    return d.select(
        "page_id",
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        kept_text.alias("kept_text"),
        n_sent.alias("n_sentences"),
        low.contains("lorem ipsum").cast("long").alias("has_lorem"),
        F.col("text").contains("{").cast("long").alias("has_brace"),
        has_bad.cast("long").alias("has_badword"),
    ).withColumn(
        "keep",
        (
            (F.col("n_sentences") >= C4_MIN_SENTENCES)
            & (F.col("has_lorem") == 0)
            & (F.col("has_brace") == 0)
            & (F.col("has_badword") == 0)
        ).cast("long"),
    )


def q_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line rules + page gates as a scorecard: one map-only scan
    (at 100 TB this runs at I/O speed — no exchange in the plan).
    ``sf_dir`` is unused: the fixture is versioned with the repo."""
    return (
        _line_signals(_pages(spark))
        .drop("kept_text")
        .orderBy("page_id")
    )


_BAD_SQL = " OR ".join(f"contains(lower(text), '{w}')" for w in C4_BAD_WORDS)

# shared CTE: per-page signals, mirrored from _line_signals
_C4_SIGNALS_CTE = f"""
pages AS (
  SELECT * FROM '{C4_FIXTURE}'
), sig AS (
  SELECT page_id,
         CAST(len(string_split(text, chr(10))) AS INT) AS n_lines,
         list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                     x -> regexp_matches(x, '{_TERMINAL_RE}')
                          AND len(string_split_regex(x, '\\s+')) >= {C4_MIN_LINE_WORDS}
                          AND NOT contains(lower(x), 'javascript')) AS kept,
         CAST(contains(lower(text), 'lorem ipsum') AS BIGINT) AS has_lorem,
         CAST(contains(text, '{{') AS BIGINT) AS has_brace,
         CAST({_BAD_SQL} AS BIGINT) AS has_badword
  FROM pages
), gated AS (
  SELECT page_id, n_lines,
         CAST(len(kept) AS INT) AS n_kept_lines,
         array_to_string(kept, ' ') AS kept_text,
         CAST(len(string_split_regex(array_to_string(kept, ' '), '[.!?]')) - 1 AS INT) AS n_sentences,
         has_lorem, has_brace, has_badword
  FROM sig
)
"""

Q_C4_LINE_FILTER_SQL = f"""
WITH {_C4_SIGNALS_CTE}
SELECT page_id, n_lines, n_kept_lines, n_sentences,
       has_lorem, has_brace, has_badword,
       CAST(n_sentences >= {C4_MIN_SENTENCES} AND has_lorem = 0
            AND has_brace = 0 AND has_badword = 0 AS BIGINT) AS keep
FROM gated
ORDER BY page_id
"""


def q_c4_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global three-sentence-span dedup over the C4-gated corpus.

    Emits one row per surviving page: sentence count, how many sentences
    a duplicated span removed, and an md5 fingerprint of the reassembled
    kept text (so the hash gate verifies the exact reassembly without
    shipping page-sized strings through the comparator)."""
    sig = _line_signals(_pages(spark)).filter(
        (F.col("n_sentences") >= C4_MIN_SENTENCES)
        & (F.col("has_lorem") == 0)
        & (F.col("has_brace") == 0)
        & (F.col("has_badword") == 0)
    )
    sarr = F.filter(
        F.transform(F.split(F.col("kept_text"), r"[.!?]"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    sents = sig.select("page_id", sarr.alias("sarr"))
    n = F.size("sarr")
    # spans: 1-based start positions 1..n-2 (guarded: Spark sequence()
    # steps BACKWARD when start > stop, so short pages need an explicit
    # empty array, not sequence(1, n-2))
    spans = sents.select(
        "page_id",
        F.explode(
            F.when(
                n >= SPAN_N,
                F.transform(
                    F.sequence(F.lit(1), n - (SPAN_N - 1)),
                    lambda i: F.struct(
                        i.alias("start"),
                        F.array_join(
                            F.slice("sarr", i, SPAN_N), _SEP
                        ).alias("key"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<start:int,key:string>>"))
        ).alias("sp"),
    ).select("page_id", F.col("sp.start").alias("start"), F.col("sp.key").alias("key"))
    w = Window.partitionBy("key").orderBy("page_id", "start")
    losers = (
        spans.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") > 1)
        .select(
            "page_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (SPAN_N - 1))
            ).alias("idx"),
        )
        .distinct()
    )
    srows = sents.select(
        "page_id", F.posexplode("sarr").alias("idx0", "sent")
    ).select("page_id", (F.col("idx0") + 1).alias("idx"), "sent")
    kept_rows = srows.join(losers, ["page_id", "idx"], "left_anti")
    kept_agg = kept_rows.groupBy("page_id").agg(
        F.count("*").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "sent"))),
                    lambda x: x["sent"],
                ),
                _SEP,
            )
        ).alias("kept_fp"),
    )
    removed = losers.groupBy("page_id").agg(F.count("*").alias("n_removed"))
    base = sents.select("page_id", n.alias("n_sents"))
    return (
        base.join(removed, "page_id", "left")
        .join(kept_agg, "page_id", "left")
        .select(
            "page_id",
            "n_sents",
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            # a page whose every sentence was removed still yields a row
            F.coalesce("kept_fp", F.md5(F.lit(""))).alias("kept_fp"),
        )
        .orderBy("page_id")
    )


Q_C4_SPAN_DEDUP_SQL = f"""
WITH {_C4_SIGNALS_CTE},
surviving AS (
  SELECT page_id,
         list_filter(list_transform(string_split_regex(kept_text, '[.!?]'),
                                    x -> trim(x)), x -> x <> '') AS sarr
  FROM gated
  WHERE n_sentences >= {C4_MIN_SENTENCES} AND has_lorem = 0
        AND has_brace = 0 AND has_badword = 0
), spans AS (
  SELECT page_id, CAST(i AS INT) AS start,
         sarr[CAST(i AS INT)] || chr(1) || sarr[CAST(i AS INT) + 1]
           || chr(1) || sarr[CAST(i AS INT) + 2] AS key
  FROM (SELECT page_id, sarr, unnest(generate_series(1, len(sarr) - {SPAN_N - 1})) AS i
        FROM surviving WHERE len(sarr) >= {SPAN_N})
), ranked AS (
  SELECT page_id, start, key,
         row_number() OVER (PARTITION BY key ORDER BY page_id, start) AS rk
  FROM spans
), losers AS (
  SELECT DISTINCT page_id, CAST(j AS INT) AS idx
  FROM (SELECT page_id, unnest(generate_series(start, start + {SPAN_N - 1})) AS j
        FROM ranked WHERE rk > 1)
), srows AS (
  SELECT page_id, CAST(i AS INT) AS idx, sarr[CAST(i AS INT)] AS sent
  FROM (SELECT page_id, sarr, unnest(generate_series(1, len(sarr))) AS i
        FROM surviving)
), kept AS (
  SELECT s.page_id, s.idx, s.sent
  FROM srows s ANTI JOIN losers l ON s.page_id = l.page_id AND s.idx = l.idx
), kept_agg AS (
  SELECT page_id, CAST(count(*) AS BIGINT) AS n_kept,
         md5(string_agg(sent, chr(1) ORDER BY idx)) AS kept_fp
  FROM kept GROUP BY page_id
), removed AS (
  SELECT page_id, CAST(count(*) AS BIGINT) AS n_removed
  FROM losers GROUP BY page_id
)
SELECT s.page_id, CAST(len(s.sarr) AS INT) AS n_sents,
       coalesce(r.n_removed, 0) AS n_removed,
       coalesce(k.n_kept, 0) AS n_kept,
       coalesce(k.kept_fp, md5('')) AS kept_fp
FROM surviving s
LEFT JOIN removed r ON s.page_id = r.page_id
LEFT JOIN kept_agg k ON s.page_id = k.page_id
ORDER BY s.page_id
"""


QUERIES = {
    "q_c4_line_filter": q_c4_line_filter,
    "q_c4_span_dedup": q_c4_span_dedup,
}

ORACLES = {
    "q_c4_line_filter": Q_C4_LINE_FILTER_SQL,
    "q_c4_span_dedup": Q_C4_SPAN_DEDUP_SQL,
}
