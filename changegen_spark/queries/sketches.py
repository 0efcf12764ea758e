"""Mergeable distinct-count sketches: HyperLogLog registers and KMV
(k-minimum-values), both oracle-exact.

Beyond-parity surface (the reference has no approximate aggregation; its
only dedup is the 6-dp grid dedup, ``generator.py:137-142``).  At 100 TB a
pipeline cannot afford ``COUNT(DISTINCT)`` per slice — the production shape
is a MERGEABLE sketch: each executor summarizes its partition into a tiny
fixed-size state, states combine associatively (register-wise max for HLL,
k-smallest-of-union for KMV), and the combined state answers the query.
Spark's built-in ``approx_count_distinct`` IS an HLL++ — but its register
layout is opaque and engine-specific, so it can never hash-match a DuckDB
oracle (the registry carries it as the rows-only ``q_approx_distinct``).
These two queries instead build the sketches from first principles on a
cross-engine-deterministic 60-bit hash, so every register value — not just
the estimate — is oracle-checkable:

* shared hash: ``h60(x) = int(md5(cast(x as string))[:15 hex], 16)`` —
  Spark ``conv(substr(md5(..),1,15),16,10)``, DuckDB
  ``CAST('0x'||substr(md5(..),1,15) AS BIGINT)``; 60 bits keeps every
  value exactly representable in both engines' BIGINT and in a double's
  53-bit mantissa only where we never rely on it (all register math is
  integer).
* ``q_hll_distinct`` — m=1024 registers per group; rho from the BINARY
  STRING length (``length(bin(w))``), no float log2 near power-of-two
  boundaries; the harmonic sum is kept as an exact scaled integer
  ``sum(1 << (51 - rho))`` (max 1024·2^51 = 2^61 < 2^63), so the only
  float ops are one division + one multiply (IEEE-identical everywhere)
  plus the standard linear-counting branch for small ranges.
* ``q_kmv_distinct`` — the k=64 smallest distinct hashes per group;
  unbiased estimate (k-1)/U(h_k) with U(h) = h/2^60.  Top-k is two-phase
  (per-salt top-k, then global) so the per-group window never sees more
  than salt_count*k rows — the naive single window would funnel every
  distinct hash of a hot group through one task at corpus scale.

* ``q_kmv_jaccard`` — set similarity BETWEEN groups computed from the
  sketches alone (union sketch ∩ both sides), next to the exact Jaccard.
* ``q_sample_quantiles`` — quantiles from a mergeable bottom-k row
  sample (same merge law, keyed on the row), next to the exact ordered
  statistic.

Mergeability is pinned by tests/test_sketches.py: sketches built on an
arbitrary 2-way split of the input and merged (max / k-smallest-of-union)
are bit-identical to the single-pass sketch.

Scale design (100 TB): both plans are one map pass + groupBy with
map-side partial aggregation; state per group is O(m) / O(k) — kilobytes.
No join, no window over raw data (KMV's windows run on the deduped hash
set, salt-spread).  Registers/thresholds are themselves the persistable
artifact: store them per shard-day, merge across days for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from changegen_spark.sources.tables import load_table

HLL_M = 1024  # registers (p = 10 bucket bits; 50-bit register value)
# alpha_m for m=1024, inlined identically into the Spark literal and the
# oracle SQL so both engines multiply by the same double.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 1024.0)
KMV_K = 64
KMV_SALTS = 64
_TWO60 = float(1 << 60)


def h60(col):
    """Cross-engine 60-bit hash: first 15 hex chars of md5 as a BIGINT."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


_H60_SQL = "CAST(concat('0x', substr(md5(CAST({x} AS VARCHAR)), 1, 15)) AS BIGINT)"


def hll_registers(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(group, bucket, r): register-wise max of rho over the group.

    rho = 1 + leading zeros of the 50-bit register value, computed as
    ``51 - length(bin(w))`` (bin() drops leading zeros in both engines);
    w = 0 — all 50 bits zero — is the rho = 51 sentinel.
    """
    h = h60(F.col(value_col))
    w = F.shiftright(h, 10)
    rho = F.when(w == 0, F.lit(51)).otherwise(51 - F.length(F.bin(w)))
    return (
        df.select(
            F.col(group_col).alias("grp"),
            (h % HLL_M).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate(regs: DataFrame) -> DataFrame:
    """Fold registers to the HLL estimate with linear-counting small-range
    correction.  The harmonic mean denominator is the exact integer
    ``sum(2^(51-r)) + empty*2^51`` (see module docstring)."""
    per_grp = regs.groupBy("grp").agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 51 - r)")).alias("s_used"),
    )
    empty = F.lit(HLL_M) - F.col("n_buckets")
    s = F.col("s_used") + empty.cast("long") * F.lit(1 << 51).cast("long")
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M * float(1 << 51)) / s.cast("double")
    lin = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / empty.cast("double"))
    est = F.when((raw <= F.lit(2.5 * HLL_M)) & (empty > 0), lin).otherwise(raw)
    return per_grp.select(
        "grp",
        empty.alias("n_empty"),
        F.round(est, 3).alias("est_distinct"),
    )


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct parts per lineitem return flag, via first-principles HLL
    registers next to the exact answer (so the row itself documents the
    sketch's error)."""
    li = load_table(spark, sf_dir, "lineitem")
    regs = hll_registers(li, "l_returnflag", "l_partkey")
    est = hll_estimate(regs)
    exact = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.countDistinct("l_partkey").alias("exact_distinct")
    )
    return (
        est.join(exact, "grp")
        .select(
            F.col("grp").alias("l_returnflag"),
            "n_empty",
            "est_distinct",
            "exact_distinct",
        )
        .orderBy("l_returnflag")
    )


Q_HLL_SQL = f"""
WITH h AS (
  SELECT l_returnflag AS grp,
         {_H60_SQL.format(x='l_partkey')} AS h
  FROM lineitem
), rr AS (
  SELECT grp, h % {HLL_M} AS bucket,
         CASE WHEN (h // 1024) = 0 THEN 51
              ELSE 51 - length(bin(h // 1024)) END AS rho
  FROM h
), regs AS (
  SELECT grp, bucket, max(rho) AS r FROM rr GROUP BY grp, bucket
), folded AS (
  SELECT grp, count(*) AS n_buckets,
         sum(1::BIGINT << (51 - r)) AS s_used
  FROM regs GROUP BY grp
), est AS (
  SELECT grp, ({HLL_M} - n_buckets) AS n_empty,
         round(
           CASE WHEN ({HLL_ALPHA * HLL_M * HLL_M * float(1 << 51)!r}
                      / CAST(s_used + ({HLL_M} - n_buckets) * (1::BIGINT << 51)
                             AS DOUBLE)) <= {2.5 * HLL_M}
                     AND ({HLL_M} - n_buckets) > 0
                THEN {float(HLL_M)!r} * ln({float(HLL_M)!r}
                       / CAST({HLL_M} - n_buckets AS DOUBLE))
                ELSE {HLL_ALPHA * HLL_M * HLL_M * float(1 << 51)!r}
                       / CAST(s_used + ({HLL_M} - n_buckets) * (1::BIGINT << 51)
                              AS DOUBLE)
           END, 3) AS est_distinct
  FROM folded
), exact AS (
  SELECT l_returnflag AS grp, count(DISTINCT l_partkey) AS exact_distinct
  FROM lineitem GROUP BY 1
)
SELECT est.grp AS l_returnflag, est.n_empty, est.est_distinct,
       exact.exact_distinct
FROM est JOIN exact USING (grp)
ORDER BY l_returnflag
"""


def _bottomk_prefilter(df: DataFrame, k: int) -> DataFrame:
    """Map-side combine for order statistics: per Arrow batch, keep only
    the k smallest ``h`` per ``grp`` — a strict SUPERSET of each batch's
    contribution to the global per-group k-minimum, so the downstream
    exact window computes identical rows from far fewer inputs.

    This is the combiner Spark applies to sums/counts, hand-built for
    top-k: without it, phase 1 of the two-phase top-k still sorts the
    FULL input in the shuffle (measured: the dominant cost of
    q_sample_quantiles at sf0.1).  After the pre-filter the exchange
    carries ≤ batches·groups·k rows.  Value-identity is pinned by
    tests/test_sketches.py (prefiltered == naive single-window).
    """
    schema = df.schema

    def keep(batches):
        for pdf in batches:
            if len(pdf):
                # dropna=False: a NULL group key is a group like any other
                # (pandas' default silently discards those rows, which
                # would diverge from the naive window path)
                yield (
                    pdf.sort_values("h", kind="mergesort")
                    .groupby("grp", sort=False, dropna=False)
                    .head(k)
                )

    return df.mapInPandas(keep, schema)


def kmv_sketch(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """The KMV_K smallest distinct h60 values per group.

    Plan: Arrow map-side pre-filter (per-batch k smallest per group —
    see ``_bottomk_prefilter``) → salt-spread top-k window → exact global
    top-k window.  The pre-filter shrinks the first exchange from the
    whole distinct-hash set to ≤ batches·groups·k rows; the salt phase
    keeps a hot group from single-tasking even those.
    """
    hashes = df.select(
        F.col(group_col).alias("grp"), h60(F.col(value_col)).alias("h")
    ).distinct()
    cand0 = _bottomk_prefilter(hashes, KMV_K)
    w1 = Window.partitionBy("grp", F.col("h") % KMV_SALTS).orderBy("h")
    cand = (
        cand0.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= KMV_K)
        .drop("rn1")
    )
    w2 = Window.partitionBy("grp").orderBy("h")
    return cand.withColumn("rn", F.row_number().over(w2)).filter(
        F.col("rn") <= KMV_K
    )


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-part estimate per return flag: threshold = the
    k-th smallest hash, estimate = (k-1)/U(h_k); exact answer alongside."""
    li = load_table(spark, sf_dir, "lineitem")
    kth = kmv_sketch(li, "l_returnflag", "l_partkey").filter(
        F.col("rn") == KMV_K
    )
    est = kth.select(
        "grp",
        F.col("h").alias("kmv_threshold"),
        F.round(
            F.lit(float(KMV_K - 1)) * (F.lit(_TWO60) / F.col("h")), 3
        ).alias("est_distinct"),
    )
    exact = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.countDistinct("l_partkey").alias("exact_distinct")
    )
    return (
        est.join(exact, "grp")
        .select(
            F.col("grp").alias("l_returnflag"),
            "kmv_threshold",
            "est_distinct",
            "exact_distinct",
        )
        .orderBy("l_returnflag")
    )


Q_KMV_SQL = f"""
WITH h AS (
  SELECT DISTINCT l_returnflag AS grp,
         {_H60_SQL.format(x='l_partkey')} AS h
  FROM lineitem
), ranked AS (
  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
  FROM h
), kth AS (
  SELECT grp, h AS kmv_threshold,
         round({float(KMV_K - 1)!r} * ({_TWO60!r} / h), 3) AS est_distinct
  FROM ranked WHERE rn = {KMV_K}
), exact AS (
  SELECT l_returnflag AS grp, count(DISTINCT l_partkey) AS exact_distinct
  FROM lineitem GROUP BY 1
)
SELECT kth.grp AS l_returnflag, kth.kmv_threshold, kth.est_distinct,
       exact.exact_distinct
FROM kth JOIN exact USING (grp)
ORDER BY l_returnflag
"""


def q_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set similarity BETWEEN groups from their KMV sketches alone
    (Beyer et al. 2007): for each return-flag pair, J is estimated as the
    fraction of the union sketch (k smallest of K(A) ∪ K(B)) present in
    both sides' sketches — next to the exact Jaccard of the real part
    sets so the row documents the error.

    This is what mergeable sketches buy beyond cardinality: cross-shard /
    cross-day set comparison WITHOUT rescanning either side.  At 100 TB,
    exact Jaccard between two slices is a join over both; the sketch
    estimate is an intersection of two KB artifacts.  The corpus is
    touched once (building the per-group sketches — the same map +
    two-phase top-k as q_kmv_distinct); everything pairwise happens on
    ≤ k rows per group.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sk = kmv_sketch(li, "l_returnflag", "l_partkey").select("grp", "h")
    grps = sk.select("grp").distinct()
    pairs = (
        grps.select(F.col("grp").alias("ga"))
        .join(grps.select(F.col("grp").alias("gb")))
        .filter(F.col("ga") < F.col("gb"))
    )
    cand = (
        pairs.join(sk, F.col("grp") == F.col("ga"))
        .select("ga", "gb", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            pairs.join(sk, F.col("grp") == F.col("gb")).select(
                "ga",
                "gb",
                "h",
                F.lit(0).alias("in_a"),
                F.lit(1).alias("in_b"),
            )
        )
        .groupBy("ga", "gb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("ga", "gb").orderBy("h")
    m = cand.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= KMV_K
    )
    # divisor is the union-sketch SIZE = least(k, |K(A) ∪ K(B)|): dividing
    # by the constant k biases J low whenever the union holds fewer than k
    # hashes (small groups) — Beyer et al. use the realized sketch size
    est = m.groupBy("ga", "gb").agg(
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_inter_sketch"),
        F.count("*").alias("n_union_sketch"),
    )
    parts = li.select("l_returnflag", "l_partkey").distinct()
    pa = parts.select(F.col("l_returnflag").alias("ga"), "l_partkey")
    pb = parts.select(F.col("l_returnflag").alias("gb"), "l_partkey")
    inter = (
        pa.join(pb, "l_partkey")
        .filter(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.count("*").alias("n_inter"))
    )
    sizes = parts.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count("*").alias("n")
    )
    return (
        est.join(inter, ["ga", "gb"])
        .join(sizes.select(F.col("grp").alias("ga"), F.col("n").alias("na")), "ga")
        .join(sizes.select(F.col("grp").alias("gb"), F.col("n").alias("nb")), "gb")
        .select(
            F.col("ga").alias("flag_a"),
            F.col("gb").alias("flag_b"),
            "n_inter_sketch",
            F.round(
                F.col("n_inter_sketch").cast("double")
                / F.col("n_union_sketch").cast("double"),
                6,
            ).alias("est_jaccard"),
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double"),
                6,
            ).alias("exact_jaccard"),
        )
        .orderBy("flag_a", "flag_b")
    )


Q_KMV_JACCARD_SQL = f"""
WITH h AS (
  SELECT DISTINCT l_returnflag AS grp,
         {_H60_SQL.format(x='l_partkey')} AS h
  FROM lineitem
), sk AS (
  SELECT grp, h FROM (
    SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
    FROM h)
  WHERE rn <= {KMV_K}
), grps AS (SELECT DISTINCT grp FROM sk),
pairs AS (
  SELECT a.grp AS ga, b.grp AS gb FROM grps a JOIN grps b ON a.grp < b.grp
), cand AS (
  SELECT ga, gb, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
    SELECT p.ga, p.gb, s.h, 1 AS in_a, 0 AS in_b
    FROM pairs p JOIN sk s ON s.grp = p.ga
    UNION ALL
    SELECT p.ga, p.gb, s.h, 0 AS in_a, 1 AS in_b
    FROM pairs p JOIN sk s ON s.grp = p.gb)
  GROUP BY ga, gb, h
), m AS (
  SELECT ga, gb, in_a, in_b,
         row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
  FROM cand
), est AS (
  SELECT ga, gb, CAST(sum(in_a * in_b) AS BIGINT) AS n_inter_sketch,
         count(*) AS n_union_sketch
  FROM m WHERE rn <= {KMV_K} GROUP BY ga, gb
), parts AS (
  SELECT DISTINCT l_returnflag AS grp, l_partkey FROM lineitem
), inter AS (
  SELECT a.grp AS ga, b.grp AS gb, count(*) AS n_inter
  FROM parts a JOIN parts b ON a.l_partkey = b.l_partkey AND a.grp < b.grp
  GROUP BY 1, 2
), sizes AS (
  SELECT grp, count(*) AS n FROM parts GROUP BY 1
)
SELECT est.ga AS flag_a, est.gb AS flag_b, est.n_inter_sketch,
       round(CAST(est.n_inter_sketch AS DOUBLE)
             / CAST(est.n_union_sketch AS DOUBLE), 6) AS est_jaccard,
       round(CAST(inter.n_inter AS DOUBLE)
             / CAST(sa.n + sb.n - inter.n_inter AS DOUBLE), 6) AS exact_jaccard
FROM est
JOIN inter ON inter.ga = est.ga AND inter.gb = est.gb
JOIN sizes sa ON sa.grp = est.ga
JOIN sizes sb ON sb.grp = est.gb
ORDER BY flag_a, flag_b
"""


SAMPLE_K = 256  # bottom-k row sample size per group


def bottomk_sample(df: DataFrame, group_col: str, key_cols: list, value_col):
    """Mergeable uniform row sample: the SAMPLE_K rows with the smallest
    h60 of the row key, per group.  Same merge law as KMV (k smallest of
    the union), same two-phase salt-spread top-k, but keyed on the ROW
    (not the distinct value), so it is a uniform sample of rows and any
    per-row statistic can be estimated from it."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    base = df.select(
        F.col(group_col).alias("grp"), h.alias("h"), value_col.alias("val")
    )
    cand0 = _bottomk_prefilter(base, SAMPLE_K)
    w1 = Window.partitionBy("grp", F.col("h") % KMV_SALTS).orderBy("h")
    cand = (
        cand0.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= SAMPLE_K)
        .drop("rn1")
    )
    w2 = Window.partitionBy("grp").orderBy("h")
    return cand.withColumn("rn", F.row_number().over(w2)).filter(
        F.col("rn") <= SAMPLE_K
    )


def q_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles from a mergeable bottom-k row sample, next to the exact
    ordered statistic: nearest-rank median/p90 of l_quantity computed on
    the SAMPLE_K-row hash sample per return flag.

    Completes the mergeable-summary set (cardinality: HLL/KMV; frequency:
    count-min; set similarity: KMV-Jaccard; quantiles: THIS): per-shard
    bottom-k samples merge by keeping the k smallest union hashes, so
    distribution summaries compose across days/shards without rescans.
    Estimates use the NEAREST-RANK definition (ceil(p·n)-th sorted sample
    value) — an exact integer pick from exact rows, so both engines agree
    bit-for-bit; the exact side uses the same interpolating percentile as
    q_percentiles.  At 100 TB the sample build is the usual map +
    two-phase top-k; state per group is SAMPLE_K rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = bottomk_sample(
        li,
        "l_returnflag",
        ["l_orderkey", "l_linenumber"],
        F.col("l_quantity").cast("long"),
    )
    wv = Window.partitionBy("grp").orderBy("val", "h")
    ranked = s.withColumn("vr", F.row_number().over(wv))
    sizes = s.groupBy("grp").agg(F.count("*").alias("n_sample"))
    est = (
        ranked.join(sizes, "grp")
        .groupBy("grp", "n_sample")
        .agg(
            F.max(
                F.when(
                    F.col("vr") == F.ceil(F.col("n_sample") * 0.5), F.col("val")
                )
            ).alias("est_median"),
            F.max(
                F.when(
                    F.col("vr") == F.ceil(F.col("n_sample") * 0.9), F.col("val")
                )
            ).alias("est_p90"),
        )
    )
    exact = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.round(
            F.percentile(F.col("l_quantity").cast("double"), F.lit(0.5)), 6
        ).alias("exact_median"),
        F.round(
            F.percentile(F.col("l_quantity").cast("double"), F.lit(0.9)), 6
        ).alias("exact_p90"),
    )
    return (
        est.join(exact, "grp")
        .select(
            F.col("grp").alias("l_returnflag"),
            "n_sample",
            "est_median",
            "est_p90",
            "exact_median",
            "exact_p90",
        )
        .orderBy("l_returnflag")
    )


_H60_ROW_SQL = (
    "CAST(concat('0x', substr(md5(concat_ws('|', CAST(l_orderkey AS VARCHAR), "
    "CAST(l_linenumber AS VARCHAR))), 1, 15)) AS BIGINT)"
)

Q_SAMPLE_QUANTILES_SQL = f"""
WITH base AS (
  SELECT l_returnflag AS grp, {_H60_ROW_SQL} AS h,
         CAST(l_quantity AS BIGINT) AS val
  FROM lineitem
), samp AS (
  SELECT grp, h, val FROM (
    SELECT grp, h, val, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
    FROM base)
  WHERE rn <= {SAMPLE_K}
), ranked AS (
  SELECT grp, val,
         row_number() OVER (PARTITION BY grp ORDER BY val, h) AS vr,
         count(*) OVER (PARTITION BY grp) AS n_sample
  FROM samp
), est AS (
  SELECT grp, n_sample,
         max(CASE WHEN vr = CAST(ceil(n_sample * 0.5) AS BIGINT)
                  THEN val END) AS est_median,
         max(CASE WHEN vr = CAST(ceil(n_sample * 0.9) AS BIGINT)
                  THEN val END) AS est_p90
  FROM ranked GROUP BY grp, n_sample
), exact AS (
  SELECT l_returnflag AS grp,
         round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6)
           AS exact_median,
         round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.9), 6) AS exact_p90
  FROM lineitem GROUP BY 1
)
SELECT est.grp AS l_returnflag, est.n_sample, est.est_median, est.est_p90,
       exact.exact_median, exact.exact_p90
FROM est JOIN exact USING (grp)
ORDER BY l_returnflag
"""


QUERIES = {
    "q_hll_distinct": q_hll_distinct,
    "q_kmv_distinct": q_kmv_distinct,
    "q_kmv_jaccard": q_kmv_jaccard,
    "q_sample_quantiles": q_sample_quantiles,
}
ORACLES = {
    "q_hll_distinct": Q_HLL_SQL,
    "q_kmv_distinct": Q_KMV_SQL,
    "q_kmv_jaccard": Q_KMV_JACCARD_SQL,
    "q_sample_quantiles": Q_SAMPLE_QUANTILES_SQL,
}
