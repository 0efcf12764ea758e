"""BM25 scoring pinned against an independent plain-Python implementation
on a hand-crafted corpus (term frequency saturation, length normalization,
idf ordering, tie-breaking)."""

import math

import changegen_spark.queries.search as se


def _ref_bm25(docs, terms, k1=se.BM25_K1, b=se.BM25_B):
    toks = {i: t.split() for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {w: sum(1 for t in toks.values() if w in t) for w in terms}
    out = {}
    for i, t in toks.items():
        s = 0
        hits = 0
        for w in terms:
            tf = t.count(w)
            if tf == 0 or df[w] == 0:
                continue
            hits += 1
            idf = math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
            s += round(
                idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(t) / avgdl))
                * 1e9
            )
        if hits:
            out[i] = (hits, s)
    return out


def test_bm25_matches_reference(spark):
    docs = {
        1: "spark join fast spark spark",          # high tf, short
        2: "join " * 30 + "slow table",             # long doc — normalized down
        3: "fast",                                  # single rare-ish hit
        4: "table scan merge sort",                 # no hits — absent
        5: "spark join fast",                       # all three terms
    }
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = se.load_table
    se.load_table = lambda _s, _d, _n: df
    try:
        rows = se.q_bm25_search(spark, "unused").collect()
    finally:
        se.load_table = orig
    got = {r["doc_id"]: (r["n_terms_hit"], r["score_e9"]) for r in rows}
    assert got == _ref_bm25(docs, se.BM25_TERMS)
    # ranking: the all-terms doc must beat the single-hit doc
    order = [r["doc_id"] for r in rows]
    assert order.index(5) < order.index(3)
    assert 4 not in got
