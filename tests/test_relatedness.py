"""DF-pruned TF-IDF document similarity (queries/relatedness.py): an
independent Counter-based reimplementation is the expectation, and the
fixture's planted near-duplicates must surface as rank-1 neighbors."""

import math
from collections import Counter


def _profiles(spark, sf_dir, n):
    from changegen_spark.sources.tables import load_table

    out = {}
    for r in load_table(spark, sf_dir, "documents").collect():
        toks = r.text.strip().split()
        grams = [
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ]
        if grams:
            out[r.doc_id] = Counter(grams)
    return out


def test_related_docs_matches_independent_tfidf(spark, sf_dir):
    from changegen_spark.queries.relatedness import (
        REL_DF_CAP,
        REL_MIN_COS_E6,
        REL_N,
        REL_TOPK,
        q_df_prune_audit,
        q_related_docs,
    )

    profs = _profiles(spark, sf_dir, REL_N)
    n_docs = len(profs)
    df = Counter(t for p in profs.values() for t in p)
    kept = {
        t: round(math.log(n_docs / d) * 1e3)
        for t, d in df.items()
        if 2 <= d <= REL_DF_CAP
    }
    w = {
        doc: {t: tf * kept[t] for t, tf in p.items() if t in kept}
        for doc, p in profs.items()
    }
    n2 = {doc: sum(x * x for x in ws.values()) for doc, ws in w.items()}

    # audit row first — exact integer equality
    a = q_df_prune_audit(spark, sf_dir).collect()[0]
    assert a.n_terms == len(df)
    assert a.n_kept == len(kept)
    assert a.sum_df2_all == sum(d * d for d in df.values())
    assert a.sum_df2_kept == sum(
        d * d for t, d in df.items() if t in kept
    )
    assert a.sum_df2_kept < a.sum_df2_all  # pruning actually bites

    # expectation via inverted index (same shape, independent code)
    inv = {}
    for doc, ws in w.items():
        for t in ws:
            inv.setdefault(t, []).append(doc)
    dots = {}
    for t, docs in inv.items():
        for i, da in enumerate(docs):
            for db in docs[i + 1 :]:
                k = (da, db)
                dots[k] = dots.get(k, 0) + w[da][t] * w[db][t]
    want = {}
    for (da, db), dot in dots.items():
        c = round(dot * 1e6 / (math.sqrt(n2[da]) * math.sqrt(n2[db])))
        if c >= REL_MIN_COS_E6:
            want.setdefault(da, []).append((c, db))
            want.setdefault(db, []).append((c, da))
    expect = []
    for doc in sorted(want):
        top = sorted(want[doc], key=lambda t: (-t[0], t[1]))[:REL_TOPK]
        expect += [
            (doc, r + 1, db, c) for r, (c, db) in enumerate(top)
        ]

    got = [
        (r.doc_id, r.rank, r.rel_doc_id, r.cos_e6)
        for r in q_related_docs(spark, sf_dir).collect()
    ]
    assert got == expect

    # planted near-dups surface in each other's top-k (a doc with several
    # dups cannot give all of them rank 1, so membership is the pin)
    from changegen_spark.queries import all_queries

    dup_pairs = [
        (r[0], r[1])
        for r in all_queries()["q_lsh_pairs"](spark, sf_dir).collect()
    ]
    topk = {}
    for doc, _rank, rel, _c in got:
        topk.setdefault(doc, set()).add(rel)
    hits = sum(
        1
        for a_, b_ in dup_pairs
        if b_ in topk.get(a_, set()) or a_ in topk.get(b_, set())
    )
    assert dup_pairs and hits >= len(dup_pairs) * 0.8


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")


def _boiler_corpus(n_docs, dup_every=10):
    """Synthetic corpus: every doc opens with the SAME boilerplate
    sentence (its trigrams' df == n_docs, far over the cap) and carries a
    unique body; every ``dup_every``-th doc gets a near-duplicate twin
    sharing its rare body trigrams."""
    rows = []
    boiler = "terms of service apply to all content on this site"
    for i in range(n_docs):
        body = " ".join(f"w{i}x{j}" for j in range(12))
        rows.append((i, f"{boiler} {body}"))
        if i % dup_every == 0:
            rows.append((100_000 + i, f"{boiler} {body} trailing extra"))
    return rows


def test_df_cap_keeps_planted_dups_and_bounds_candidates(spark, tmp_path):
    """The absolute-df-cap contract (r7 verdict #2), pinned end to end:
    (a) quality — with boilerplate trigrams over the cap, each planted
    near-dup is still its source's rank-1 neighbor (they pair through
    rare body trigrams the cap keeps); (b) scale — Σ df² over kept terms
    grows ~linearly for 10× docs.  The retired fractional cap kept any
    term with df ≤ n/20, so a term tracking that frequency contributed
    df² ≈ n²/400 — quadratic; the absolute cap bounds every kept term's
    contribution at REL_DF_CAP·df, linear in total postings."""
    from changegen_spark.queries.relatedness import (
        q_df_prune_audit,
        q_related_docs,
    )

    small = tmp_path / "sf_small"
    big = tmp_path / "sf_big"
    _write_docs(spark, str(small), _boiler_corpus(60))
    _write_docs(spark, str(big), _boiler_corpus(600))

    # (a) planted twins rank 1 despite over-cap boilerplate
    got = q_related_docs(spark, str(small)).collect()
    rank1 = {r.doc_id: r.rel_doc_id for r in got if r.rank == 1}
    planted = [(i, 100_000 + i) for i in range(0, 60, 10)]
    for a, b in planted:
        assert rank1.get(a) == b, (a, rank1.get(a))
        assert rank1.get(b) == a, (b, rank1.get(b))

    # (b) kept candidate volume ~linear: 10× docs → ≤ ~12× Σ df²_kept
    s = q_df_prune_audit(spark, str(small)).collect()[0]
    g = q_df_prune_audit(spark, str(big)).collect()[0]
    assert s.sum_df2_kept > 0
    growth = g.sum_df2_kept / s.sum_df2_kept
    assert growth <= 12, growth
    # the boilerplate mass (df = n_docs per trigram) is excluded: the
    # all-terms Σ df² DOES grow quadratically here, the kept one doesn't
    assert g.sum_df2_all / s.sum_df2_all > 50
