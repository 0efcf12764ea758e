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


def test_retrieval_eval_detects_coordination_miss(spark, tmp_path):
    """nDCG/MRR must MOVE when BM25's idf·tf ranking disagrees with
    coordination-grade relevance: a doc stuffed with the two rare terms
    (grade 2) outscores the all-three-terms docs (grade 3), so nDCG@10
    < 1, the first grade-3 doc sits at rank 2 (MRR 0.5), and P@10
    counts only the grade-3 docs.  Values checked against an
    independent python nDCG computation."""
    import math
    import os

    from changegen_spark.queries.search import (
        NDCG_K,
        q_retrieval_eval,
    )

    # 'spark' appears everywhere (low idf); 'join'/'fast' are rare and
    # doc 0 repeats them heavily -> top BM25 score at grade 2
    rows = [(0, "join fast " * 20)]
    rows += [(i, "spark join fast") for i in range(1, 4)]
    rows += [(i, "spark spark filler text") for i in range(4, 40)]
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        os.path.join(sf, "documents.parquet")
    )

    got = q_retrieval_eval(spark, sf).collect()[0]
    assert got.k == NDCG_K and got.n_rel3 == 3
    # ranked grades: doc 0 (rel 2) first, the three rel-3 docs next,
    # then grade-1 'spark'-only filler docs complete the top-10
    rels = [2, 3, 3, 3] + [1] * 6
    gains = [(1 << r) - 1 for r in rels]
    disc = [1_000_000 // 1, 630_930, 500_000, 430_677]

    def dcg(gs):
        return sum(
            g * round(1e6 / math.log2(i + 2)) for i, g in enumerate(gs)
        )

    want_dcg = dcg(gains)
    want_idcg = dcg(sorted(gains, reverse=True))
    assert got.dcg_e6 == want_dcg
    assert got.idcg_e6 == want_idcg
    assert got.ndcg_e6 == want_dcg * 1_000_000 // want_idcg
    assert got.ndcg_e6 < 1_000_000  # the coordination miss is visible
    assert got.mrr3_e6 == 500_000  # first grade-3 doc at rank 2
    assert got.p_at_k_rel3_e6 == 3 * 1_000_000 // NDCG_K
    assert disc[0] == 1_000_000  # literal table sanity


def test_bm25_multi_agrees_with_single_query_and_reference(spark):
    """Query 1 of the batch IS the q_bm25_search query: its per-query
    top-k must reproduce bm25_scored's ranking and scores exactly (same
    idf/tf math, same e9 rounding point).  And every query's scores must
    match the independent plain-Python reference on a crafted corpus."""
    docs = {
        1: "spark join fast spark spark",
        2: "join " * 30 + "slow table",
        3: "fast",
        4: "table scan merge sort",
        5: "spark join fast",
        6: "hash batch hash",
        7: "dup merge dup dup",
    }
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    queries = ((1, se.BM25_TERMS), (2, ("hash", "batch")), (5, ("dup", "merge")))
    orig = se.load_table
    se.load_table = lambda _s, _d, _n: df
    try:
        single = se.bm25_scored(spark, "unused", 10).collect()
        multi = se.bm25_multi_scored(spark, "unused", queries, 10).collect()
    finally:
        se.load_table = orig
    m1 = [
        (r["doc_id"], r["n_terms_hit"], r["score_e9"])
        for r in multi
        if r["query_id"] == 1
    ]
    assert m1 == [
        (r["doc_id"], r["n_terms_hit"], r["score_e9"]) for r in single
    ]
    # ranks are 1..k dense per query, ordered by (score desc, doc_id)
    for qid in (1, 2, 5):
        rows = [r for r in multi if r["query_id"] == qid]
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        keys = [(-r["score_e9"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys)
    # per-query scores match the independent reference implementation
    for qid, terms in queries:
        want = _ref_bm25(docs, terms)
        got = {
            r["doc_id"]: (r["n_terms_hit"], r["score_e9"])
            for r in multi
            if r["query_id"] == qid
        }
        assert got == want, (qid, got, want)
