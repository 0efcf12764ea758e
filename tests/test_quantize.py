"""SQ8 scalar quantization audit (queries/quantize.py)."""


def test_sq8_codes_match_independent_quantizer(spark, sf_dir):
    """Codes equal a plain-Python re-quantization (per-dim min/max learned
    from the same corpus), and stay within the signed-byte range."""
    from changegen_spark.queries.quantize import sq8_codes
    from changegen_spark.sources.tables import load_table

    v = load_table(spark, sf_dir, "embeddings")
    raw = {r.vec_id: [float(x) for x in r.embedding] for r in v.collect()}
    dims = len(next(iter(raw.values())))
    mn = [min(vec[d] for vec in raw.values()) for d in range(dims)]
    mx = [max(vec[d] for vec in raw.values()) for d in range(dims)]

    def code(x, d):
        if mx[d] <= mn[d]:
            return -128
        # Spark round() is HALF_UP; Python round() is banker's
        from decimal import ROUND_HALF_UP, Decimal

        r = (x - mn[d]) / (mx[d] - mn[d]) * 255
        return int(Decimal(repr(r)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)) - 128

    got = {r.vec_id: list(r.cv) for r in sq8_codes(v).collect()}
    for vid, vec in raw.items():
        want = [code(x, d) for d, x in enumerate(vec)]
        assert got[vid] == want, vid
        assert all(-128 <= c <= 127 for c in got[vid])


def test_sq8_recall_is_high_on_this_corpus(spark, sf_dir):
    """The audit's own verdict: byte codes preserve most of the top-10
    (recall ≥ 0.5 per query, ≥ 0.7 mean) — and never exceed 1."""
    from changegen_spark.queries.quantize import q_sq8_recall

    rows = q_sq8_recall(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_overlap <= 10
        assert r.recall_e6 == r.n_overlap * 100_000
        assert r.recall_e6 >= 500_000, r.query_id
    mean = sum(r.recall_e6 for r in rows) / len(rows)
    assert mean >= 700_000
