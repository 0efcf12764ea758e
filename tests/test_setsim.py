"""Exact prefix-filtered set-similarity join: zero false negatives vs a
brute-force Python reference, threshold boundary exactness, and actual
candidate pruning on a diverse-vocabulary fixture."""

import pytest

from pyspark.sql import functions as F

import changegen_spark.queries.setsim as ss


def _brute(docs, t_num=ss.T_NUM, t_den=ss.T_DEN, k=ss.SHINGLE_K):
    sets = {
        i: ({s[j : j + k] for j in range(len(s) - k + 1)} if len(s) >= k else {s})
        for i, s in ((i, txt.lower()) for i, txt in docs.items())
    }
    out = {}
    ids = sorted(sets)
    for x in ids:
        for y in ids:
            if x >= y:
                continue
            inter = len(sets[x] & sets[y])
            union = len(sets[x] | sets[y])
            if t_den * inter >= t_num * union:
                out[(x, y)] = (inter, union)
    return out


@pytest.mark.slow
def test_setsim_matches_bruteforce(spark):
    docs = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumps over the lazy cat",   # near-dup of 1
        3: "the quick brown fox jumps over the lazy dog",   # exact dup of 1
        4: "completely different content with no overlap",
        5: "pack my box with five dozen liquor jugs",
        6: "short",                                          # < k chars path
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): (r["n_inter"], r["n_union"])
        for r in ss.setsim_join(df, "doc_id", "text").collect()
    }
    assert got == _brute(docs)
    assert (1, 3) in got  # the exact dup, J = 1.0
    assert (1, 2) in got  # the near-dup


def test_setsim_hot_token_pairs_rejected(spark):
    """Every doc shares the hot prefix 'common text here' with every other,
    but each doc's dominant content is unique — no pair may reach J >= 0.7
    even though ALL pairs share tokens (the shared-token join would emit
    all 780 pairs as candidates; the threshold must reject every one)."""
    rows = [
        (
            i,
            "common text here "
            + "".join(chr(97 + ((i * 7 + j) % 26)) for j in range(60)),
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]) for r in ss.setsim_join(df, "doc_id", "text").collect()
    }
    assert got == set(_brute(dict(rows)).keys())


@pytest.mark.slow
def test_setsim_diverse_fixture_collapses_candidates(spark):
    """On the diverse-vocabulary fixture the prefix filter must DEMONSTRATE
    its headline property (not just stay correct): candidates well under
    1% of all-pairs, with every planted near-dup pair still recovered —
    the claim the 30-word ``documents`` vocabulary cannot exercise
    (module docstring honesty note)."""
    docs = spark.read.parquet(ss.SETSIM_FIXTURE)
    n_docs = docs.count()
    all_pairs = n_docs * (n_docs - 1) // 2
    sets = ss.ordered_shingle_sets(docs, "doc_id", "text")
    n_cand = ss.prefix_candidates(sets).count()
    # measured: 26 candidates of 193,753 possible pairs (0.013%, a ~7,000x
    # collapse) — the adversarial `documents` vocabulary leaves ~78% of
    # pairs as candidates on the same algorithm
    assert n_cand < 0.001 * all_pairs, (n_cand, all_pairs)

    got = {
        (r["id_a"], r["id_b"])
        for r in ss.setsim_join(docs, "doc_id", "text").collect()
    }
    # exactly the 15 planted near-dup pairs; the ~15%-mutated borderline
    # docs all fall below t=0.7 with this vocabulary (the DuckDB oracle's
    # unpruned shared-shingle join independently confirms the accept set)
    assert got == {(k + 1, 10_001 + k) for k in range(15)}


def test_typo_pairs_matches_bruteforce(spark):
    """FastSS k=2 blocking + verify must equal an all-pairs Levenshtein
    scan on a typo-rich vocabulary (substitutions, transposition = two
    substitutions, inserts, deletes, and far-apart words)."""

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    words = [
        "spark", "spork", "sprk", "sparks", "shark",
        "table", "cable", "tale", "tables",
        "window", "widow", "meadow",
        "zz", "zx",
    ]
    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    import changegen_spark.queries.setsim as ss2

    orig = ss2.load_table
    ss2.load_table = lambda _s, _d, _n: df
    try:
        got = {
            (r["w1"], r["w2"]): r["dist"]
            for r in ss2.q_typo_pairs(spark, "u").collect()
        }
    finally:
        ss2.load_table = orig
    expected = {
        (a, b): lev(a, b)
        for a in words
        for b in words
        if a < b and lev(a, b) <= ss2.TYPO_MAX_DIST
    }
    assert got == expected
    assert got[("spark", "spork")] == 1
    assert got[("widow", "window")] == 1
    assert got[("cable", "tale")] == 2
