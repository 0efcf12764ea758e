"""Feature-space operators for model training: the hashing trick and
skip-gram context-pair extraction.

* ``q_feature_hash`` — Vowpal/​sklearn-style feature hashing: tokens map to
  a fixed bucket space via a stable hash, so the feature matrix has a
  bounded width with NO vocabulary pass (the property that matters at
  100 TB: one map-side explode + one counting shuffle, no global dictionary
  to build, broadcast, or keep consistent between runs).
* ``q_skipgram_pairs`` — word2vec-style (center, context) pair counts with
  a +-K window.  The scale-relevant shape: contexts come from ARRAY
  OFFSETS on the already-tokenized row (explode over the fixed offset
  list), never from a positional self-join — the join-free plan is what
  survives a 100x corpus, since the only shuffle is the final count.

Both hash/count pipelines are exact integer computations, so the DuckDB
oracles match bit-for-bit.  Registered OUT of the driver's 50-slot window;
q_relational_digest re-verifies them transitively every round (KINDS
entries in queries/digest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changegen_spark.queries.mlprep import _docs, _toks

N_BUCKETS = 64
SKIP_WINDOW = 2
TOP_PAIRS = 200


def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document hashed bag-of-words: (doc_id, bucket, n) with
    bucket = first-8-hex-of-md5(token) mod N_BUCKETS (64) — the same
    stable-hash idiom the sampling and digest operators use, so
    membership is a pure function of the token across engines, runs,
    and retries."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(_toks(F.col("text"))).alias("w")).filter(
        F.col("w") != ""
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast("long")
        % N_BUCKETS
    )
    return (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("doc_id", "bucket")
    )


Q_FEATURE_HASH_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
  FROM documents
)
SELECT doc_id,
       CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % {N_BUCKETS} AS bucket,
       count(*) AS n
FROM toks WHERE w <> ''
GROUP BY doc_id, bucket
ORDER BY doc_id, bucket
"""


def q_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide (center, context) pair counts within a +-SKIP_WINDOW (2)
    token window, top TOP_PAIRS (200) with a total (n desc, w1, w2) order.
    Contexts are taken by array offset on the tokenized row — no
    positional self-join (see module docstring)."""
    d = _docs(spark, sf_dir)
    offs = [o for o in range(-SKIP_WINDOW, SKIP_WINDOW + 1) if o != 0]
    t = d.select(_toks(F.col("text")).alias("t"))
    pairs = t.select(F.posexplode("t").alias("p", "w1"), F.col("t")).select(
        "w1",
        # F.get is 0-based and yields NULL outside the array — exactly the
        # window-clipping semantics at document edges (element_at would
        # throw on 0 and wrap negatives)
        F.explode(
            F.array(*[F.get("t", F.col("p") + F.lit(o)) for o in offs])
        ).alias("w2"),
    )
    counts = (
        pairs.filter(F.col("w2").isNotNull() & (F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "w1", "w2")
        .limit(TOP_PAIRS)
    )
    return counts


Q_SKIPGRAM_SQL = f"""
WITH toks AS (
  SELECT string_split_regex(trim(text), '\\s+') AS t FROM documents
), centers AS (
  SELECT t, unnest(generate_series(1, len(t))) AS p FROM toks
), pairs AS (
  SELECT t[CAST(p AS INT)] AS w1, t[CAST(p + o AS INT)] AS w2
  FROM centers, (SELECT unnest([{", ".join(str(o) for o in range(-SKIP_WINDOW, SKIP_WINDOW + 1) if o != 0)}]) AS o)
  WHERE p + o >= 1 AND p + o <= len(t)
)
SELECT w1, w2, count(*) AS n
FROM pairs WHERE w1 <> '' AND w2 <> ''
GROUP BY w1, w2
ORDER BY n DESC, w1, w2
LIMIT {TOP_PAIRS}
"""


def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization — the step every corpus pipeline runs BEFORE exact
    dedup so near-identical bytes collide: lowercase, strip non-alnum
    (ASCII-level, so Java regex and RE2 agree), collapse whitespace, trim.
    Emits the md5 of the normalized text so the oracle comparison is
    strict on every byte, plus the collision count the dedup would see.
    Map-only + one count shuffle."""
    d = _docs(spark, sf_dir)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    n = d.select("doc_id", norm.alias("norm"))
    dup = n.groupBy("norm").agg(F.count("*").alias("n_same_norm"))
    return (
        n.join(dup, "norm")
        .select(
            "doc_id",
            F.md5("norm").alias("norm_md5"),
            F.length("norm").alias("norm_len"),
            "n_same_norm",
        )
        .orderBy("doc_id")
    )


Q_NORMALIZE_SQL = """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS norm
  FROM documents
), dup AS (
  SELECT norm, count(*) AS n_same_norm FROM n GROUP BY norm
)
SELECT doc_id, md5(norm) AS norm_md5,
       CAST(length(norm) AS INT) AS norm_len, n_same_norm
FROM n JOIN dup USING (norm)
ORDER BY doc_id
"""


PMI_MIN_N = 20  # pair-count floor so log ratios are stable
PMI_TOPK = 50


def q_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of co-occurring word pairs — the
    word-association mining step on top of the skip-gram counts:
    pmi(w1,w2) = ln( n(w1,w2)·N / (n(w1·)·n(·w2)) ) over the SAME
    ±{SKIP_WINDOW} window pair space as q_skipgram_pairs.  All inputs are
    exact integer counts; marginals are pair-sided (center vs context),
    so the identity Σn(w1·) = N holds by construction.

    Top-{PMI_TOPK} by (pmi desc, w1, w2) among pairs with n >=
    {PMI_MIN_N}.  Scale: one pair-count aggregate + two tiny marginal
    aggregates broadcast back — no joins against the corpus."""
    d = _docs(spark, sf_dir)
    offs = [o for o in range(-SKIP_WINDOW, SKIP_WINDOW + 1) if o != 0]
    t = d.select(_toks(F.col("text")).alias("t"))
    pairs = (
        t.select(F.posexplode("t").alias("p", "w1"), F.col("t"))
        .select(
            "w1",
            F.explode(
                F.array(*[F.get("t", F.col("p") + F.lit(o)) for o in offs])
            ).alias("w2"),
        )
        .filter(F.col("w2").isNotNull() & (F.col("w1") != "") & (F.col("w2") != ""))
    )
    counts = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n"))
    m1 = counts.groupBy("w1").agg(F.sum("n").alias("n1"))
    m2 = counts.groupBy("w2").agg(F.sum("n").alias("n2"))
    tot = counts.agg(F.sum("n").alias("nn"))
    pmi = F.log(
        F.col("n").cast("double") * F.col("nn") / (F.col("n1") * F.col("n2"))
    )
    return (
        counts.filter(F.col("n") >= PMI_MIN_N)
        .join(F.broadcast(m1), "w1")
        .join(F.broadcast(m2), "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "n", F.round(pmi, 6).alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(PMI_TOPK)
    )


Q_PMI_SQL = f"""
WITH toks AS (
  SELECT string_split_regex(trim(text), '\\s+') AS t FROM documents
), centers AS (
  SELECT t, unnest(generate_series(1, len(t))) AS p FROM toks
), rawpairs AS (
  SELECT t[CAST(p AS INT)] AS w1, t[CAST(p + o AS INT)] AS w2
  FROM centers, (SELECT unnest([{", ".join(str(o) for o in range(-SKIP_WINDOW, SKIP_WINDOW + 1) if o != 0)}]) AS o)
  WHERE p + o >= 1 AND p + o <= len(t)
), pairs AS (
  SELECT w1, w2 FROM rawpairs WHERE w1 <> '' AND w2 <> ''
), counts AS (
  SELECT w1, w2, count(*) AS n FROM pairs GROUP BY w1, w2
), m1 AS (SELECT w1, CAST(sum(n) AS BIGINT) AS n1 FROM counts GROUP BY w1),
m2 AS (SELECT w2, CAST(sum(n) AS BIGINT) AS n2 FROM counts GROUP BY w2),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM counts)
SELECT w1, w2, n,
       round(ln(CAST(n AS DOUBLE) * nn / (n1 * n2)), 6) AS pmi
FROM counts JOIN m1 USING (w1) JOIN m2 USING (w2) CROSS JOIN tot
WHERE n >= {PMI_MIN_N}
ORDER BY pmi DESC, w1, w2
LIMIT {PMI_TOPK}
"""


NB_BUCKETS = 1024


def q_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear text classifier, trained and applied in one plan:
    predict ``lang = 'en'`` from a hashed bag-of-words with NB-SVM-style
    log-count-ratio weights (Wang & Manning 2012) — the fasttext-shaped
    model-based filter every production corpus pipeline runs (CCNet's
    lang/quality classifiers), reduced to Spark aggregations.

    Train: one explode + one groupBy(bucket) produces per-bucket class
    counts; weight_e6 = round(1e6 * ln((c_en+1)/(c_ot+1))) — rounded to an
    integer BEFORE scoring so the per-doc sum is exact.  The model is
    NB_BUCKETS rows (KB), broadcast back onto the token stream — at
    100 TB the only corpus-sized shuffles are the two counting groupBys
    (bucket-keyed with map-side combine, then doc-keyed); the model state
    never grows with the corpus and needs no vocabulary dictionary.

    Score: sum of weights + doc-prior bias; pred_en = score > 0.  Output
    carries the true label so the result set IS the evaluation table.

    Honest caveat on THIS corpus: the synthetic documents draw from one
    ~31-token vocabulary whose per-lang rates are flat, so lang⊥text has
    ~zero mutual information and NO bag-of-words model can beat the base
    rate here — the oracle checks the exact training/scoring arithmetic,
    and tests/test_features.py proves the learning mechanism (accuracy
    ≥ 0.9) on a planted two-class fixture with real signal.
    """
    d = _docs(spark, sf_dir)
    out = nb_classify(d, (F.col("lang") == "en").cast("int"))
    return out.select(
        "doc_id", "score_e6", F.col("is_pos").alias("is_en"),
        F.col("pred_pos").alias("pred_en"),
    )


def nb_classify(docs: DataFrame, label: F.Column) -> DataFrame:
    """Train-and-score core of q_nb_classifier over any (doc_id, text)
    frame and 0/1 label column: returns (doc_id, score_e6, is_pos,
    pred_pos)."""
    d = docs.withColumn("is_pos", label)
    toks = d.select(
        "doc_id", "is_pos", F.explode(_toks(F.col("text"))).alias("w")
    ).filter(F.col("w") != "")
    bucket = (
        F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast("long")
        % NB_BUCKETS
    )
    tb = toks.select("doc_id", "is_pos", bucket.alias("bucket"))
    weights = tb.groupBy("bucket").agg(
        F.round(
            F.log(
                (F.sum("is_pos") + 1).cast("double")
                / (F.sum(1 - F.col("is_pos")) + 1).cast("double")
            )
            * 1e6
        )
        .cast("long")
        .alias("w_e6")
    )
    prior = d.agg(
        F.round(
            F.log(
                F.sum("is_pos").cast("double")
                / F.sum(1 - F.col("is_pos")).cast("double")
            )
            * 1e6
        )
        .cast("long")
        .alias("bias_e6")
    )
    scores = (
        tb.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("w_e6").alias("s"))
    )
    return (
        d.select("doc_id", "is_pos")
        .join(scores, "doc_id", "left")
        .crossJoin(F.broadcast(prior))
        .select(
            "doc_id",
            (F.coalesce(F.col("s"), F.lit(0)) + F.col("bias_e6")).alias(
                "score_e6"
            ),
            "is_pos",
        )
        .withColumn("pred_pos", (F.col("score_e6") > 0).cast("int"))
        .orderBy("doc_id")
    )


Q_NB_SQL = f"""
WITH toks AS (
  SELECT doc_id, CAST(lang = 'en' AS INT) AS is_en, w
  FROM (SELECT doc_id, lang,
               unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents)
  WHERE w <> ''
), tb AS (
  SELECT doc_id, is_en,
         CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT) % {NB_BUCKETS}
           AS bucket
  FROM toks
), weights AS (
  SELECT bucket,
         CAST(round(ln(CAST(sum(is_en) + 1 AS DOUBLE)
                       / CAST(sum(1 - is_en) + 1 AS DOUBLE)) * 1e6)
              AS BIGINT) AS w_e6
  FROM tb GROUP BY bucket
), prior AS (
  SELECT CAST(round(ln(CAST(sum(CAST(lang = 'en' AS INT)) AS DOUBLE)
                       / CAST(sum(CAST(lang <> 'en' AS INT)) AS DOUBLE)) * 1e6)
              AS BIGINT) AS bias_e6
  FROM documents
), scores AS (
  SELECT tb.doc_id, CAST(sum(w.w_e6) AS BIGINT) AS s
  FROM tb JOIN weights w USING (bucket) GROUP BY tb.doc_id
)
SELECT d.doc_id,
       coalesce(s.s, 0) + p.bias_e6 AS score_e6,
       CAST(d.lang = 'en' AS INT) AS is_en,
       CAST((coalesce(s.s, 0) + p.bias_e6) > 0 AS INT) AS pred_en
FROM documents d
LEFT JOIN scores s ON s.doc_id = d.doc_id
CROSS JOIN prior p
ORDER BY d.doc_id
"""


# --- Unicode NFC normalization ------------------------------------------------
#
# The multilingual twin of q_normalize_text's ASCII pass: canonical
# composition (UAX #15 NFC) so byte-different spellings of the same text
# collide before exact dedup ("é" as e+U+0301 vs U+00E9).  The synthetic
# tables are ASCII, so the query carries its own BMP test corpus —
# declared as CODEPOINT tuples and materialized via chr() on BOTH
# engines, which keeps every source file and SQL string pure ASCII (no
# literal-encoding hazards between Python, Java, and DuckDB parsers).
#
# The oracle is genuinely independent: Spark runs Python's unicodedata
# (CPython's UnicodeData.txt tables) in an Arrow UDF; DuckDB runs
# utf8proc's nfc_normalize.  Two implementations of UAX #15 agreeing
# md5-for-md5 is the strongest cross-check in this family (plus a
# hypothesis sweep in tests/test_features.py over random BMP strings).
NFC_CASES = (
    (1, (0x65, 0x301)),  # e + combining acute -> precomposed
    (2, (0xE9,)),  # already NFC: unchanged
    (3, (0x41, 0x30A)),  # A + ring above
    (4, (0x1100, 0x1161)),  # Hangul jamo pair -> one syllable
    (5, (0x65, 0x323, 0x301)),  # dot-below + acute (canonical order)
    (6, (0x65, 0x301, 0x323)),  # same marks, swapped input order
    (7, (0x212B,)),  # Angstrom sign -> A-ring (singleton)
    (8, (0xFB01,)),  # fi ligature: compatibility char, NFC-invariant
    (9, tuple(ord(c) for c in "plain ascii stays put")),
    (10, (0x6F, 0x302, 0x303)),  # stacked marks on o
    (11, (0x73, 0x323, 0x307)),  # s with dot below + dot above
    (12, (0x3B1, 0x301)),  # Greek alpha + acute
    (13, (0x30, 0x41, 0x300, 0x5A)),  # mark mid-string
    (14, (0x1E0B, 0x323)),  # precomposed d-dot-above + dot-below
)


def nfc_normalize_udf():
    """Arrow-batched NFC normalizer (unicodedata is C-speed; the UDF is
    the standard multilingual-cleaning map stage — row-parallel, no
    shuffle)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s):
        import unicodedata

        return s.map(
            lambda v: unicodedata.normalize("NFC", v) if v is not None else None
        )

    return nfc


def q_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-case NFC audit: md5 of the normalized string (strict on every
    byte), whether normalization changed it, and codepoint counts before
    and after — composition shrinks, invariant cases don't move."""
    rows = [(uid, "".join(chr(c) for c in cps)) for uid, cps in NFC_CASES]
    raw = spark.createDataFrame(rows, "uid long, s string")
    nfc = nfc_normalize_udf()
    return (
        raw.select("uid", "s", nfc("s").alias("n"))
        .select(
            "uid",
            F.md5("n").alias("nfc_md5"),
            F.expr("CAST(n <> s AS INT)").alias("changed"),
            F.length("s").cast("long").alias("n_cp_before"),
            F.length("n").cast("long").alias("n_cp_after"),
        )
        .orderBy("uid")
    )


def _nfc_values_sql() -> str:
    vals = ", ".join(
        f"({uid}, {' || '.join(f'chr({c})' for c in cps)})"
        for uid, cps in NFC_CASES
    )
    return f"""
WITH raw(uid, s) AS (VALUES {vals}),
n AS (SELECT uid, s, nfc_normalize(s) AS n FROM raw)
SELECT uid, md5(n) AS nfc_md5, CAST(n <> s AS INT) AS changed,
       CAST(length(s) AS BIGINT) AS n_cp_before,
       CAST(length(n) AS BIGINT) AS n_cp_after
FROM n ORDER BY uid
"""


QUERIES = {
    "q_feature_hash": q_feature_hash,
    "q_nb_classifier": q_nb_classifier,
    "q_pmi_pairs": q_pmi_pairs,
    "q_skipgram_pairs": q_skipgram_pairs,
    "q_normalize_text": q_normalize_text,
    "q_unicode_nfc": q_unicode_nfc,
}

ORACLES = {
    "q_pmi_pairs": Q_PMI_SQL,
    "q_nb_classifier": Q_NB_SQL,
    "q_feature_hash": Q_FEATURE_HASH_SQL,
    "q_skipgram_pairs": Q_SKIPGRAM_SQL,
    "q_normalize_text": Q_NORMALIZE_SQL,
    "q_unicode_nfc": _nfc_values_sql(),
}
