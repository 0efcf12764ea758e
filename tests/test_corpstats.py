"""Corpus-law statistics (queries/corpstats.py): independent plain-Python
reimplementations (collections.Counter + math, no shared helpers) are the
expectation for both queries."""

import math
from collections import Counter

from changegen_spark.queries.corpstats import (
    HEAPS_BUCKETS,
    ZIPF_TOPN,
    q_heaps_curve,
    q_zipf_fit,
)
from changegen_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return [
        (r.doc_id, r.text.strip().lower().split())
        for r in load_table(spark, sf_dir, "documents").collect()
    ]


def test_zipf_fit_matches_independent_ols(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    counts = Counter(t for _, toks in docs for t in toks if t)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOPN]
    pts = [
        (round(math.log(i + 1) * 1e6), round(math.log(f) * 1e6))
        for i, (_, f) in enumerate(ranked)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    want_slope = round(num * 1e6 / den)
    want_icpt = round((sy - num / den * sx) / n)

    row = q_zipf_fit(spark, sf_dir).collect()[0]
    assert row.n_points == n
    assert row.total_tokens == sum(counts.values())
    assert row.vocab_size == len(counts)
    assert row.slope_e6 == want_slope
    assert row.intercept_e6 == want_icpt
    # rank-frequency slope is negative (the synthetic fixture reads a
    # shallow −0.18 — real text reads ≈ −1; the DIAGNOSTIC value of the
    # query is exactly that it distinguishes the two)
    assert row.slope_e6 < 0


def test_heaps_curve_matches_independent_scan(spark, sf_dir):
    docs = sorted(_docs(spark, sf_dir))
    mx = max(d for d, _ in docs)

    def bucket(i):
        return i * HEAPS_BUCKETS // (mx + 1)

    want = {b: [0, 0, 0] for b in range(HEAPS_BUCKETS)}
    seen = set()
    for doc_id, toks in docs:
        b = bucket(doc_id)
        want[b][0] += 1
        for t in toks:
            if not t:
                continue
            want[b][1] += 1
            if t not in seen:
                seen.add(t)
                want[b][2] += 1
    cum, expect = [0, 0, 0], []
    for b in range(HEAPS_BUCKETS):
        cum = [c + w for c, w in zip(cum, want[b])]
        expect.append((b, *cum))

    got = [
        (r.bucket, r.docs_cum, r.tokens_cum, r.vocab_cum)
        for r in q_heaps_curve(spark, sf_dir).collect()
    ]
    assert got == expect
    # the curve is concave-ish: vocabulary growth per bucket shrinks from
    # the first to the last decile (Heaps saturation)
    first_new = expect[0][3]
    last_new = expect[-1][3] - expect[-2][3]
    assert last_new < first_new
