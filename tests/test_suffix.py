"""Prefix-doubling suffix ranks vs a definitional Python sort, tie
semantics for equal suffixes across docs, and planted-repeat mining."""

from pyspark.sql import functions as F

import changegen_spark.queries.suffix as sx


def _ref_ranks(docs: dict[int, str]):
    """Definitional dense rank: sort all suffix strings, ties share."""
    suf = [
        (d, i + 1, s[i:]) for d, s in docs.items() for i in range(len(s))
    ]
    order = sorted({t[2] for t in suf})
    rank = {s: r + 1 for r, s in enumerate(order)}
    return {(d, p): rank[s] for d, p, s in suf}


def _spark_ranks(spark, docs: dict[int, str]):
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, s string"
    )
    return {
        (r["doc_id"], r["pos"]): r["rank"]
        for r in sx.suffix_ranks(df).collect()
    }


def test_suffix_ranks_match_definitional_sort(spark):
    docs = {
        1: "banana",
        2: "bandana",
        3: "a",          # single char (log2 edge)
        4: "anana",      # proper suffix of doc 1's suffix set → exact ties
    }
    assert _spark_ranks(spark, docs) == _ref_ranks(docs)


def test_suffix_ranks_equal_suffixes_share_rank(spark):
    docs = {1: "xyzzy", 2: "zzy"}
    got = _spark_ranks(spark, docs)
    # suffix "zzy" exists at (1,3) and (2,1): dense ties
    assert got[(1, 3)] == got[(2, 1)]
    ref = _ref_ranks(docs)
    assert got == ref


def test_longest_repeats_finds_planted_verbatim_repeat(spark):
    """A long verbatim string planted in two docs must surface as the top
    repeat with its exact length and matching md5."""
    import hashlib

    planted = "the exact same forty-two character sentence!"
    docs = {
        0: "prefix one " + planted + " tail a",
        25: "completely different opening " + planted + " tail b",
        50: "no repeats in this one at all, just filler text",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    import changegen_spark.sources.tables as tables

    orig = tables.load_table
    try:
        import changegen_spark.queries.suffix as mod

        mod.load_table = lambda _s, _d, _n: df
        rows = mod.q_longest_repeats(spark, "u").collect()
    finally:
        mod.load_table = orig
    assert rows
    top = rows[0]
    assert top["lcp"] >= len(planted)
    # the top repeat's text contains the planted sentence: verify via md5
    # of the planted prefix at the reported positions
    a = docs[top["doc_a"]][top["pos_a"] - 1 : top["pos_a"] - 1 + top["lcp"]]
    b = docs[top["doc_b"]][top["pos_b"] - 1 : top["pos_b"] - 1 + top["lcp"]]
    assert a == b
    assert hashlib.md5(a.encode()).hexdigest() == top["repeat_md5"]
    assert planted in (" " + a + " ") or planted in a
