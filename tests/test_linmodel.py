"""Distributed linear-model primitives (queries/linmodel.py).

Independent references: numpy lstsq for the OLS solve, a plain-Python
brute-force scan for the stump split — neither shares code (or operation
order) with the engine path, so agreement is evidence, not tautology.
"""

import numpy as np
import pytest


def _rows(spark, sf_dir):
    from changegen_spark.queries.linmodel import _feats

    pdf = _feats(spark, sf_dir).toPandas()
    return (
        pdf["x1"].to_numpy(np.float64),
        pdf["x2"].to_numpy(np.float64),
        pdf["y"].to_numpy(np.float64),
        pdf["bin"].to_numpy(np.int64),
    )


def test_ols_betas_match_numpy_lstsq(spark, sf_dir):
    from changegen_spark.queries.linmodel import q_ols_fit

    row = q_ols_fit(spark, sf_dir).collect()[0]
    x1, x2, y, _ = _rows(spark, sf_dir)
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    # lstsq (QR/SVD) vs Cramer-on-exact-sums: agree to float tolerance
    assert abs(row.beta0_e6 / 1e6 - beta[0]) < 1e-3 * max(1.0, abs(beta[0]))
    assert abs(row.beta1_e6 / 1e6 - beta[1]) < 1e-4 * max(1.0, abs(beta[1]))
    assert abs(row.beta2_e6 / 1e6 - beta[2]) < 1e-4 * max(1.0, abs(beta[2]))
    assert row.n == len(y)


def test_ols_recovers_the_planted_relationship(spark, sf_dir):
    """y = x1 − x1·x2/100: the gross-price slope must be ≈(1 − E[disc])
    and the discount slope strongly negative — the fit carries signal,
    not noise (R² > 0.99)."""
    from changegen_spark.queries.linmodel import q_ols_fit, q_ols_quality

    fit = q_ols_fit(spark, sf_dir).collect()[0]
    assert 0.90 < fit.beta1_e6 / 1e6 < 1.0
    assert fit.beta2_e6 < 0
    q = q_ols_quality(spark, sf_dir).collect()[0]
    assert q.r2_e6 > 990_000
    assert q.rmse_e6 > 0


def test_ols_quality_matches_numpy_residuals(spark, sf_dir):
    from changegen_spark.queries.linmodel import q_ols_quality

    row = q_ols_quality(spark, sf_dir).collect()[0]
    x1, x2, y, _ = _rows(spark, sf_dir)
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    r2 = 1.0 - (resid**2).sum() / ((y - y.mean()) ** 2).sum()
    rmse = float(np.sqrt((resid**2).mean()))
    assert abs(row.r2_e6 / 1e6 - r2) < 1e-5
    assert abs(row.rmse_e6 / 1e6 - rmse) < 1e-2 * max(1.0, rmse)


def test_stump_split_matches_bruteforce(spark, sf_dir):
    """Plain-Python scan over thresholds: for every candidate bin t,
    gain = SST − SSE(y | bin≤t) − SSE(y | bin>t); argmax (gain desc,
    bin asc) must equal the engine's split."""
    from changegen_spark.queries.linmodel import q_stump_split

    row = q_stump_split(spark, sf_dir).collect()[0]
    _, _, y, b = _rows(spark, sf_dir)

    def sse(v):
        return float(((v - v.mean()) ** 2).sum()) if len(v) else 0.0

    sst = sse(y)
    best = None
    for t in sorted(set(b.tolist()))[:-1]:
        left, right = y[b <= t], y[b > t]
        gain = (sst - sse(left) - sse(right)) / sst
        if best is None or gain > best[1] + 1e-12:
            best = (t, gain, len(left), len(right))
    assert row.split_bin == best[0]
    assert abs(row.gain_frac_e6 / 1e6 - best[1]) < 1e-4
    assert (row.n_left, row.n_right) == (best[2], best[3])
    # split is genuinely informative on this data
    assert row.gain_frac_e6 > 500_000


def test_ols_is_one_aggregate_pass_no_join_no_window(spark, sf_dir):
    """The scale contract: the fit plan is scan → partial/final aggregate
    → scalar expression work.  No join, no window, no sort touches the
    data."""
    from changegen_spark.queries.linmodel import q_ols_fit

    plan = (
        q_ols_fit(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "HashAggregate" in plan
    for bad in ("SortMergeJoin", "Window", "CartesianProduct"):
        assert bad not in plan, bad


def test_stump_window_runs_over_bin_frame_only(spark, sf_dir):
    """The cumulative window's input must be the aggregated bin histogram
    (a HashAggregate child), never the raw scan — the misc.py
    percentile-histogram contract."""
    from changegen_spark.queries.linmodel import q_stump_split

    plan = (
        q_stump_split(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    # the window sits above the bin aggregation, so an aggregate must
    # appear below it in the tree (plans print top-down)
    assert plan.index("Window") > plan.index("HashAggregate") or (
        "HashAggregate" in plan.split("Window", 1)[1]
    )


@pytest.mark.parametrize("shuffle_parts", [2, 7])
def test_fit_is_partitioning_invariant(spark, sf_dir, shuffle_parts):
    """Exact-integer sufficient statistics make the result independent of
    physical partitioning — the property that lets the same code run on
    32 or 32,000 tasks."""
    from changegen_spark.queries.linmodel import q_ols_fit

    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
        row = q_ols_fit(spark, sf_dir).collect()[0]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    ref = q_ols_fit(spark, sf_dir).collect()[0]
    assert row.asDict() == ref.asDict()
