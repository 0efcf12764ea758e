"""Distributed linear-model primitives (r6 new family).

The two one-pass patterns every large-scale model-fitting stack reduces
to when the feature count is small and the row count is enormous:

* ``q_ols_fit``     — ordinary least squares by sufficient statistics:
  ONE aggregate pass computes the exact Gram matrix XᵀX and moment
  vector Xᵀy as BIGINT sums; the 3×3 normal-equation solve (Cramer) is
  driver-trivial algebra on those ten integers.  This is how linear
  models are actually fit at 100 TB — the data is touched once, the
  solve never sees it.
* ``q_ols_quality`` — R² / RMSE from the SAME ten sufficient statistics
  (SSE = Σy² − 2bᵀXᵀy + bᵀXᵀXb), so goodness-of-fit costs no second
  pass over the data.
* ``q_stump_split`` — the distributed decision-tree primitive
  (histogram split finding, the core of every GBDT implementation:
  XGBoost approx / LightGBM): per-bin (n, Σy, Σy²) from one aggregate,
  a cumulative scan over the BIN frame (≤50 rows — never the data),
  variance-reduction gain per candidate threshold, argmax with a total
  tie-break.

Model: y = net price (extendedprice·(1−discount), whole dollars) on
x1 = gross price (dollars), x2 = discount (percent units) — a real
relationship (y = x1 − x1·x2/100), so the fit is meaningful: OLS
recovers the dominant linear terms (R² ≈ 0.99 with the interaction as
residual) and the stump finds a genuine high-gain threshold.  Inputs
are exact integers on both engines (round() of the same parquet
doubles), every sum is an exact BIGINT, and only the final algebra —
Cramer determinants, gains — runs in doubles.  The algebra is generated ONCE as engine-neutral SQL
text (the er.py/web.py dialect-bridge pattern, no renames needed here)
so both engines execute the identical IEEE expression tree on identical
integers; e6-rounded on emission.

Overflow audit (why dollars, not cents): Σy² ≤ (1.2e10)·n — safe in
BIGINT through sf100 (n≈6e8 → 7e18 < 2⁶³); cents would overflow at
sf0.1.  At larger scale the accumulators switch to DECIMAL(38,0)
internally (outputs stay BIGINT); the unit choice is the documented
knob.

100 TB shape: q_ols_fit/q_ols_quality are a single map-side-combined
aggregate to ONE row — no shuffle of data rows at all, a full scan and
ten numbers.  q_stump_split shuffles only (bin → three sums): 50 rows
after partial aggregation; the cumulative window runs over that 50-row
bin frame, never the base table (same contract as misc.py's
percentile-histogram).  Growing to F features / B bins per feature is
F·B histogram cells — still KB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from changegen_spark.sources.tables import load_table

# ---------------------------------------------------------------- features

# exact-integer features; identical text runs on both engines
X1 = "CAST(round(l_extendedprice) AS BIGINT)"
X2 = "CAST(round(l_discount * 100) AS BIGINT)"
Y = "CAST(round(l_extendedprice * (1 - l_discount)) AS BIGINT)"
# stump histogram: $2500-wide gross-price bins (≤ ~45 bins)
BIN = "CAST(floor(round(l_extendedprice) / 2500) AS BIGINT)"


def _feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.selectExpr(
        f"{X1} AS x1", f"{X2} AS x2", f"{Y} AS y", f"{BIN} AS bin"
    )


_SUMS = {
    "n": "count(*)",
    "s1": "sum(x1)",
    "s2": "sum(x2)",
    "sy": "sum(y)",
    "s11": "sum(x1 * x1)",
    "s12": "sum(x1 * x2)",
    "s22": "sum(x2 * x2)",
    "s1y": "sum(x1 * y)",
    "s2y": "sum(x2 * y)",
    "syy": "sum(y * y)",
}


def _sums_sql() -> str:
    return ", ".join(f"CAST({e} AS BIGINT) AS {a}" for a, e in _SUMS.items())


# ------------------------------------------------------- shared final algebra


def _d(c: str) -> str:
    return f"CAST({c} AS DOUBLE)"


# Cramer determinants for A·b = c with
#   A = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]],  c = [sy, s1y, s2y]
_M11 = f"({_d('s11')} * {_d('s22')} - {_d('s12')} * {_d('s12')})"
_M12 = f"({_d('s1')} * {_d('s22')} - {_d('s12')} * {_d('s2')})"
_M13 = f"({_d('s1')} * {_d('s12')} - {_d('s11')} * {_d('s2')})"
DET_SQL = f"({_d('n')} * {_M11} - {_d('s1')} * {_M12} + {_d('s2')} * {_M13})"
DET0_SQL = (
    f"({_d('sy')} * {_M11}"
    f" - {_d('s1')} * ({_d('s1y')} * {_d('s22')} - {_d('s12')} * {_d('s2y')})"
    f" + {_d('s2')} * ({_d('s1y')} * {_d('s12')} - {_d('s11')} * {_d('s2y')}))"
)
DET1_SQL = (
    f"({_d('n')} * ({_d('s1y')} * {_d('s22')} - {_d('s12')} * {_d('s2y')})"
    f" - {_d('sy')} * {_M12}"
    f" + {_d('s2')} * ({_d('s1')} * {_d('s2y')} - {_d('s1y')} * {_d('s2')}))"
)
DET2_SQL = (
    f"({_d('n')} * ({_d('s11')} * {_d('s2y')} - {_d('s1y')} * {_d('s12')})"
    f" - {_d('s1')} * ({_d('s1')} * {_d('s2y')} - {_d('s1y')} * {_d('s2')})"
    f" + {_d('sy')} * {_M13})"
)

_BETAS = {
    "b0": f"(CASE WHEN abs(det) > 0.0 THEN det0 / det ELSE 0.0 END)",
    "b1": f"(CASE WHEN abs(det) > 0.0 THEN det1 / det ELSE 0.0 END)",
    "b2": f"(CASE WHEN abs(det) > 0.0 THEN det2 / det ELSE 0.0 END)",
}

# SSE = Σy² − 2·bᵀXᵀy + bᵀ(XᵀX)b, assembled from the same ten sums
SSE_SQL = (
    f"({_d('syy')}"
    f" - 2.0 * (b0 * {_d('sy')} + b1 * {_d('s1y')} + b2 * {_d('s2y')})"
    f" + ({_d('n')} * b0 * b0 + {_d('s11')} * b1 * b1 + {_d('s22')} * b2 * b2"
    f"    + 2.0 * ({_d('s1')} * b0 * b1 + {_d('s2')} * b0 * b2"
    f"             + {_d('s12')} * b1 * b2)))"
)
SST_SQL = f"({_d('syy')} - {_d('sy')} * {_d('sy')} / {_d('n')})"


def _e6(expr: str, alias: str) -> str:
    return f"CAST(round(({expr}) * 1e6) AS BIGINT) AS {alias}"


_FIT_OUT = (
    "n, s1y, s2y, "
    + _e6("b0", "beta0_e6")
    + ", "
    + _e6("b1", "beta1_e6")
    + ", "
    + _e6("b2", "beta2_e6")
)

_QUALITY_OUT = (
    "n, "
    + _e6(f"CASE WHEN {SST_SQL} > 0.0 THEN 1.0 - sse / {SST_SQL} ELSE 0.0 END", "r2_e6")
    + ", "
    + _e6(f"sqrt((CASE WHEN sse > 0.0 THEN sse ELSE 0.0 END) / {_d('n')})", "rmse_e6")
    + ", "
    + _e6(f"{_d('sy')} / {_d('n')}", "mean_y_e6")
)


def _fit_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    sums = _feats(spark, sf_dir).selectExpr(_sums_sql().split(", "))
    dets = sums.selectExpr(
        "*",
        f"{DET_SQL} AS det",
        f"{DET0_SQL} AS det0",
        f"{DET1_SQL} AS det1",
        f"{DET2_SQL} AS det2",
    )
    return dets.selectExpr(
        "*", *[f"{e} AS {a}" for a, e in _BETAS.items()]
    )


def q_ols_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS via one exact-integer aggregate pass + Cramer solve.

    The plan is a full scan → partial aggregate → ONE row; the solve is
    scalar expression work on that row.  No shuffle of data rows, no
    second pass, no driver collect."""
    return _fit_frame(spark, sf_dir).selectExpr(*_FIT_OUT.split(", "))


def q_ols_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R²/RMSE from the sufficient statistics of the SAME single pass
    (SSE by the quadratic-form identity) — goodness-of-fit with zero
    extra data touches."""
    withsse = _fit_frame(spark, sf_dir).selectExpr("*", f"{SSE_SQL} AS sse")
    return withsse.selectExpr(*_QUALITY_OUT.split(", "))


def _cte_sql(out_exprs: str, with_sse: bool = False) -> str:
    sse = f", sse AS (SELECT *, {SSE_SQL} AS sse FROM betas)" if with_sse else ""
    src = "sse" if with_sse else "betas"
    return f"""
WITH feats AS (
  SELECT {X1} AS x1, {X2} AS x2, {Y} AS y FROM lineitem
), sums AS (
  SELECT {_sums_sql()} FROM feats
), dets AS (
  SELECT *, {DET_SQL} AS det, {DET0_SQL} AS det0,
         {DET1_SQL} AS det1, {DET2_SQL} AS det2
  FROM sums
), betas AS (
  SELECT *, {_BETAS['b0']} AS b0, {_BETAS['b1']} AS b1, {_BETAS['b2']} AS b2
  FROM dets
){sse}
SELECT {out_exprs} FROM {src}
"""


Q_OLS_FIT_SQL = _cte_sql(_FIT_OUT)
Q_OLS_QUALITY_SQL = _cte_sql(_QUALITY_OUT, with_sse=True)


# ------------------------------------------------------------- stump split

# gain algebra over cumulative bin sums; operates on columns
#   nl, syl, syyl (left cumulative) and nt, syt, syyt (totals)
_NR = "(nt - nl)"
_SYR = "(syt - syl)"
_SYYR = "(syyt - syyl)"
_SSEL = f"({_d('syyl')} - {_d('syl')} * {_d('syl')} / {_d('nl')})"
_SSER = f"({_d(_SYYR)} - {_d(_SYR)} * {_d(_SYR)} / {_d(_NR)})"
_SSTT = f"({_d('syyt')} - {_d('syt')} * {_d('syt')} / {_d('nt')})"
GAIN_FRAC_SQL = (
    f"(CASE WHEN {_SSTT} > 0.0"
    f" THEN ({_SSTT} - {_SSEL} - {_SSER}) / {_SSTT} ELSE 0.0 END)"
)

_STUMP_OUT = (
    "bin AS split_bin, nl AS n_left, "
    + f"{_NR} AS n_right, "
    + _e6(f"{_d('syl')} / {_d('nl')}", "mean_left_e6")
    + ", "
    + _e6(f"{_d(_SYR)} / {_d(_NR)}", "mean_right_e6")
    + ", "
    + _e6("gain_frac", "gain_frac_e6")
)


def q_stump_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-based best-split finding (the GBDT inner loop): one
    aggregate to ≤45 bin rows, cumulative sums over the BIN frame, exact
    variance-reduction gain per threshold, deterministic argmax
    (gain DESC, bin ASC).  The unpartitioned window is over the bin
    histogram — never the base table."""
    feats = _feats(spark, sf_dir)
    bins = feats.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    tot = bins.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("sy").cast("long").alias("syt"),
        F.sum("syy").cast("long").alias("syyt"),
        F.max("bin").alias("maxbin"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        bins.select(
            "bin",
            F.sum("n").over(w).cast("long").alias("nl"),
            F.sum("sy").over(w).cast("long").alias("syl"),
            F.sum("syy").over(w).cast("long").alias("syyl"),
        )
        .crossJoin(F.broadcast(tot))
        .filter(F.col("bin") < F.col("maxbin"))
    )
    scored = cum.selectExpr("*", f"{GAIN_FRAC_SQL} AS gain_frac")
    return (
        scored.orderBy(F.desc("gain_frac"), F.asc("bin"))
        .limit(1)
        .selectExpr(*_STUMP_OUT.split(", "))
    )


Q_STUMP_SPLIT_SQL = f"""
WITH feats AS (
  SELECT {BIN} AS bin, {Y} AS y FROM lineitem
), bins AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS sy, CAST(sum(y * y) AS BIGINT) AS syy
  FROM feats GROUP BY bin
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(sy) AS BIGINT) AS syt,
         CAST(sum(syy) AS BIGINT) AS syyt, max(bin) AS maxbin
  FROM bins
), cum AS (
  SELECT bin,
         CAST(sum(n) OVER w AS BIGINT) AS nl,
         CAST(sum(sy) OVER w AS BIGINT) AS syl,
         CAST(sum(syy) OVER w AS BIGINT) AS syyl,
         nt, syt, syyt, maxbin
  FROM bins CROSS JOIN tot
  WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), scored AS (
  SELECT *, {GAIN_FRAC_SQL} AS gain_frac
  FROM cum WHERE bin < maxbin
)
SELECT {_STUMP_OUT} FROM scored
ORDER BY gain_frac DESC, bin ASC LIMIT 1
"""


QUERIES = {
    "q_ols_fit": q_ols_fit,
    "q_ols_quality": q_ols_quality,
    "q_stump_split": q_stump_split,
}
ORACLES = {
    "q_ols_fit": Q_OLS_FIT_SQL,
    "q_ols_quality": Q_OLS_QUALITY_SQL,
    "q_stump_split": Q_STUMP_SPLIT_SQL,
}
