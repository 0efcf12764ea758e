"""MMR rerank (queries/rerank.py) vs an independent plain-Python greedy."""


def _pools_and_expected(spark, sf_dir):
    from changegen_spark.queries.rerank import (
        MMR_K,
        MMR_POOL,
        MMR_QMOD,
        _vecs_e6,
    )

    vecs = {r.vec_id: r.v for r in _vecs_e6(spark, sf_dir).collect()}
    dot = lambda a, b: sum(x * y for x, y in zip(a, b))  # noqa: E731
    expected = {}
    for qid in (i for i in vecs if i % MMR_QMOD == 0):
        rel = {
            c: dot(vecs[qid], vecs[c]) for c in vecs if c != qid
        }
        pool = sorted(rel, key=lambda c: (-rel[c], c))[:MMR_POOL]
        sel = [max(pool, key=lambda c: (rel[c], -c))]
        scores = [rel[sel[0]]]
        while len(sel) < MMR_K:
            best = None
            for c in pool:
                if c in sel:
                    continue
                s = rel[c] - max(dot(vecs[c], vecs[x]) for x in sel)
                k = (s, -c)
                if best is None or k > best[0]:
                    best = (k, c, s)
            sel.append(best[1])
            scores.append(best[2])
        expected[qid] = list(zip(sel, scores))
    return expected


def test_mmr_matches_independent_greedy(spark, sf_dir):
    """The engine's distributed greedy equals a from-scratch Python MMR
    (selection order AND objective values, every query)."""
    from changegen_spark.queries.rerank import q_mmr_topk

    got = {}
    for r in q_mmr_topk(spark, sf_dir).collect():
        got.setdefault(r.query_id, []).append((r.vec_id, r.mmr_score))
    assert got == _pools_and_expected(spark, sf_dir)


def test_mmr_diversifies_vs_pure_relevance(spark, sf_dir):
    """The defining property: the MMR set's worst-case redundancy (max
    pairwise similarity) must not exceed the pure top-k-by-relevance
    set's, and for at least one query it must be strictly lower."""
    from changegen_spark.queries.rerank import (
        MMR_K,
        MMR_QMOD,
        _vecs_e6,
        q_mmr_topk,
    )

    vecs = {r.vec_id: r.v for r in _vecs_e6(spark, sf_dir).collect()}
    dot = lambda a, b: sum(x * y for x, y in zip(a, b))  # noqa: E731

    sel = {}
    for r in q_mmr_topk(spark, sf_dir).collect():
        sel.setdefault(r.query_id, []).append(r.vec_id)

    def max_pair_sim(ids):
        return max(
            dot(vecs[a], vecs[b])
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
        )

    strict = 0
    for qid, ids in sel.items():
        rel = {c: dot(vecs[qid], vecs[c]) for c in vecs if c != qid}
        topk = sorted(rel, key=lambda c: (-rel[c], c))[:MMR_K]
        m_mmr, m_top = max_pair_sim(ids), max_pair_sim(topk)
        assert m_mmr <= m_top, qid
        strict += m_mmr < m_top
    assert strict >= 1


def test_mmr_lsh_pool_recall_vs_exact(spark, sf_dir):
    """r6-verdict #3: the LSH-fed pool must recover a measured floor of
    the exact brute-force pool (mean pool-recall@MMR_POOL >= 0.6 — same
    contract and band geometry as q_hard_negatives_lsh, measured ~0.8 at
    sf0.01), and items common to both reranked top-k lists must carry
    IDENTICAL exact relevance scores (the LSH path approximates only the
    candidate set, never the scoring)."""
    from pyspark.sql import functions as F

    from changegen_spark.queries.rerank import (
        _dot,
        _lsh_pool,
        _queries_frame,
        _top_pool,
        _vecs_e6,
        q_mmr_topk,
        q_mmr_topk_lsh,
    )

    v = _vecs_e6(spark, sf_dir)
    q = _queries_frame(v)
    exact_pool = {}
    rows = _top_pool(
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "v", _dot("qv", "v").alias("rel"))
    ).collect()
    for r in rows:
        exact_pool.setdefault(r.query_id, set()).add(r.vec_id)
    lsh_pool = {}
    for r in _lsh_pool(v, q).collect():
        lsh_pool.setdefault(r.query_id, set()).add(r.vec_id)
    assert exact_pool
    recalls = [
        len(exact_pool[qid] & lsh_pool.get(qid, set())) / len(exact_pool[qid])
        for qid in exact_pool
    ]
    assert sum(recalls) / len(recalls) >= 0.6, recalls

    # rel_dot of common picks must be identical across the two paths
    lsh_rel = {
        (r.query_id, r.vec_id): r.rel_dot
        for r in q_mmr_topk_lsh(spark, sf_dir).collect()
    }
    common = 0
    for r in q_mmr_topk(spark, sf_dir).collect():
        k = (r.query_id, r.vec_id)
        if k in lsh_rel:
            assert lsh_rel[k] == r.rel_dot, k
            common += 1
    assert common >= 1


def test_mmr_lsh_plan_has_no_corpus_nested_loop(spark, sf_dir):
    """The LSH pool build must not plan a BroadcastNestedLoopJoin or
    cartesian over the corpus — bucket equi-joins only (the exact form's
    crossJoin is the documented small-sf baseline)."""
    from changegen_spark.queries.rerank import q_mmr_topk_lsh

    df = q_mmr_topk_lsh(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
