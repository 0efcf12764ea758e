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


def kmv_sketch(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """The KMV_K smallest distinct h60 values per group, two-phase.

    Phase 1 runs the top-k window per (group, h % KMV_SALTS) — evenly
    spread because h is uniform — leaving ≤ KMV_SALTS·KMV_K candidate
    rows per group for the phase-2 global window.  A hot group therefore
    never single-tasks its full distinct-hash set.
    """
    hashes = df.select(
        F.col(group_col).alias("grp"), h60(F.col(value_col)).alias("h")
    ).distinct()
    w1 = Window.partitionBy("grp", F.col("h") % KMV_SALTS).orderBy("h")
    cand = (
        hashes.withColumn("rn1", F.row_number().over(w1))
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


QUERIES = {
    "q_hll_distinct": q_hll_distinct,
    "q_kmv_distinct": q_kmv_distinct,
}
ORACLES = {
    "q_hll_distinct": Q_HLL_SQL,
    "q_kmv_distinct": Q_KMV_SQL,
}
