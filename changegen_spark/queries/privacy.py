"""Differential-privacy release mechanisms (r6 new family).

Three canonical DP building blocks over the synthetic `customer` table,
each with the noise made DETERMINISTIC (and therefore oracle-checkable)
by deriving the uniform draw from the shared cross-engine 60-bit hash
(queries/sketches.h60) of the release key — the standard
inverse-CDF construction with the PRNG replaced by a keyed hash, as a
seeded production release would do for reproducibility:

* ``q_dp_counts``      — per-segment counts + Laplace(1/ε) noise
  (counting query, sensitivity 1);
* ``q_dp_sum_clipped`` — per-segment sums of CLIPPED account balances +
  Laplace(C/ε) noise — the contribution-bounding step that turns an
  unbounded-sensitivity sum into a releasable one (clip cents to
  [0, C]; the released sensitivity is C, not the data maximum);
* ``q_rr_estimate``    — per-segment randomized response over a private
  bit (balance < 0) with a deterministic per-customer coin, and the
  debiased prevalence estimate (obs − (1−p)·n) / ((2p−1)·n).

Laplace inverse CDF: u ∈ [0,1) from the hash, v = u − ½,
noise = −b · sign(v) · ln(1 − 2|v|).  ``ln`` is the one transcendental;
outputs are released as scaled integers (e3 cents / e6 ratios) per the
registry rounding convention, the same treatment the geo/LM families
give their transcendentals.

100 TB shape: everything here is one hash aggregate plus map-side
arithmetic on the KB-sized released table — DP release cost is the
aggregate, the mechanism itself is free.  The privacy accounting story
(ε per release, composition) lives in the docstrings, not enforced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changegen_spark.queries.sketches import _H60_SQL, h60
from changegen_spark.sources.tables import load_table

EPS = 0.5  # ε per release
CLIP_CENTS = 500_000  # $5,000 contribution bound for the clipped sum
RR_P_NUM, RR_P_DEN = 3, 4  # randomized response keeps truth w.p. 3/4

_TWO60 = float(1 << 60)


def _lap_noise(key_col, b: float):
    """Deterministic Laplace(b) noise from the keyed 60-bit hash."""
    u = h60(key_col) / F.lit(_TWO60)
    v = u - F.lit(0.5)
    mag = -F.lit(b) * F.log(F.lit(1.0) - 2.0 * F.abs(v))
    return F.when(v < 0, -mag).otherwise(mag)


def _lap_noise_sql(key_expr: str, b: str) -> str:
    h = _H60_SQL.format(x=key_expr)
    u = f"({h} / {_TWO60!r})"
    v = f"({u} - 0.5)"
    mag = f"(-({b}) * ln(1.0 - 2.0 * abs({v})))"
    return f"(CASE WHEN {v} < 0 THEN -{mag} ELSE {mag} END)"


def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP released per-segment customer counts: exact count (sensitivity
    1) + Laplace(1/ε) noise keyed on 'count|' + segment.  Released as e3
    scaled integers; the exact count rides along for test/eval use only
    (a real release would drop it)."""
    c = load_table(spark, sf_dir, "customer")
    out = c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_exact")
    )
    noise = _lap_noise(F.concat(F.lit("count|"), F.col("segment")), 1.0 / EPS)
    return out.select(
        "segment",
        "n_exact",
        F.round((F.col("n_exact") + noise) * 1e3).cast("long").alias("n_dp_e3"),
    ).orderBy("segment")


Q_DP_COUNTS_SQL = f"""
WITH g AS (
  SELECT c_mktsegment AS segment, count(*) AS n_exact FROM customer GROUP BY 1
)
SELECT segment, CAST(n_exact AS BIGINT) AS n_exact,
       CAST(round((n_exact + {_lap_noise_sql("'count|' || segment", str(1.0 / EPS))}) * 1e3) AS BIGINT) AS n_dp_e3
FROM g ORDER BY segment
"""


def q_dp_sum_clipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP released per-segment balance sums with contribution bounding:
    each customer's (cents) balance is clipped to [0, C] so the sum's
    sensitivity is C, then Laplace(C/ε) noise is added.  The unclipped
    exact sum rides along to show the clipping bias the bound buys."""
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    clipped = F.greatest(F.lit(0), F.least(F.lit(CLIP_CENTS), cents))
    out = c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.sum(cents).alias("sum_exact_cents"),
        F.sum(clipped).alias("sum_clipped_cents"),
    )
    noise = _lap_noise(
        F.concat(F.lit("sum|"), F.col("segment")), CLIP_CENTS / EPS
    )
    return out.select(
        "segment",
        "sum_exact_cents",
        "sum_clipped_cents",
        F.round(F.col("sum_clipped_cents") + noise)
        .cast("long")
        .alias("sum_dp_cents"),
    ).orderBy("segment")


Q_DP_SUM_SQL = f"""
WITH g AS (
  SELECT c_mktsegment AS segment,
         CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_exact_cents,
         CAST(sum(greatest(0, least({CLIP_CENTS}, CAST(round(c_acctbal * 100) AS BIGINT)))) AS BIGINT) AS sum_clipped_cents
  FROM customer GROUP BY 1
)
SELECT segment, sum_exact_cents, sum_clipped_cents,
       CAST(round(sum_clipped_cents + {_lap_noise_sql("'sum|' || segment", str(CLIP_CENTS / EPS))}) AS BIGINT) AS sum_dp_cents
FROM g ORDER BY segment
"""


def q_rr_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomized response over the private bit (balance < 0): each
    customer reports truthfully w.p. p = 3/4, else the flipped bit —
    coin = keyed hash, so local DP with per-record plausible
    deniability, yet reproducible.  The debiased population estimate
    (obs − (1−p)·n)/((2p−1)·n) rides along with the true prevalence."""
    c = load_table(spark, sf_dir, "customer")
    truth = (F.col("c_acctbal") < 0).cast("long")
    keep = (
        h60(F.concat(F.lit("rr|"), F.col("c_custkey"))) % RR_P_DEN < RR_P_NUM
    ).cast("long")
    reported = keep * truth + (1 - keep) * (1 - truth)
    g = c.select(
        F.col("c_mktsegment").alias("segment"),
        truth.alias("t"),
        reported.alias("r"),
    ).groupBy("segment").agg(
        F.count("*").alias("n"),
        F.sum("t").alias("n_true"),
        F.sum("r").alias("n_reported"),
    )
    p = RR_P_NUM / RR_P_DEN
    est = (F.col("n_reported") - (1 - p) * F.col("n")) / (
        (2 * p - 1) * F.col("n")
    )
    return g.select(
        "segment",
        "n",
        "n_true",
        "n_reported",
        F.round(est * 1e6).cast("long").alias("est_prev_e6"),
        F.round(F.col("n_true") / F.col("n") * 1e6)
        .cast("long")
        .alias("true_prev_e6"),
    ).orderBy("segment")


_RR_KEY = "'rr|' || c_custkey"
_RR_COIN = f"({_H60_SQL.format(x=_RR_KEY)} % {RR_P_DEN} < {RR_P_NUM})"

Q_RR_SQL = f"""
WITH bits AS (
  SELECT c_mktsegment AS segment,
         CAST(c_acctbal < 0 AS BIGINT) AS t,
         CASE WHEN {_RR_COIN} THEN CAST(c_acctbal < 0 AS BIGINT)
              ELSE 1 - CAST(c_acctbal < 0 AS BIGINT) END AS r
  FROM customer
), g AS (
  SELECT segment, count(*) AS n,
         CAST(sum(t) AS BIGINT) AS n_true,
         CAST(sum(r) AS BIGINT) AS n_reported
  FROM bits GROUP BY 1
)
SELECT segment, CAST(n AS BIGINT) AS n, n_true, n_reported,
       CAST(round((n_reported - {1 - RR_P_NUM / RR_P_DEN} * n)
                  / ({2 * RR_P_NUM / RR_P_DEN - 1} * n) * 1e6) AS BIGINT) AS est_prev_e6,
       CAST(round(n_true / (1.0 * n) * 1e6) AS BIGINT) AS true_prev_e6
FROM g ORDER BY segment
"""


QUERIES = {
    "q_dp_counts": q_dp_counts,
    "q_dp_sum_clipped": q_dp_sum_clipped,
    "q_rr_estimate": q_rr_estimate,
}

ORACLES = {
    "q_dp_counts": Q_DP_COUNTS_SQL,
    "q_dp_sum_clipped": Q_DP_SUM_SQL,
    "q_rr_estimate": Q_RR_SQL,
}
