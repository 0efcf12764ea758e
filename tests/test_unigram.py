"""Unigram-LM tokenizer tests: structural invariants on top of the
golden-oracle parity (the engine/gold agreement is the driver's hash
check; these pin the semantics on planted words)."""

from pyspark.sql import functions as F


def test_unigram_vocab_learns_frequent_pieces(spark):
    """A corpus dominated by one repeated word must surface that word (or
    its ≤SUB_MAX prefix) as a low-cost multi-char piece, and every single
    character must stay segmentable."""
    from changegen_spark.functions.bpe import word_counts
    from changegen_spark.functions.unigram import SUB_MAX, _viterbi, unigram_train

    rows = [(i, "spark " * 50 + "z") for i in range(20)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    costs = unigram_train(word_counts(d))
    multi = [s for s in costs if len(s) > 1]
    assert any(s in "spark" for s in multi), sorted(multi)[:10]
    # the dominant word segments into few pieces; a rare word still works
    assert len(_viterbi("spark", costs)) <= 2
    assert _viterbi("z", costs) == ["z"]


def test_unigram_encode_bounds(spark, sf_dir):
    """Per doc: n_words <= n_pieces <= n_chars (every word is >=1 piece,
    every piece is >=1 char)."""
    from changegen_spark.queries.unigram import q_unigram_encode_stats
    from changegen_spark.sources.tables import load_table

    stats = {r.doc_id: r for r in q_unigram_encode_stats(spark, str(sf_dir)).collect()}
    chars = {
        r.doc_id: r.n
        for r in load_table(spark, str(sf_dir), "documents")
        .select(
            "doc_id",
            F.length(F.regexp_replace(F.trim("text"), r"\s+", "")).alias("n"),
        )
        .collect()
    }
    assert stats
    for doc_id, r in stats.items():
        assert r.n_words <= r.n_pieces <= chars[doc_id], (doc_id, tuple(r))


def test_viterbi_implementations_agree_property():
    """Property sweep: the engine's iterative prefix DP and the gold's
    memoized suffix recursion must produce IDENTICAL segmentations for
    random words under random integer cost tables — the two-implementation
    guarantee behind the VALUES oracles, exercised beyond the fixture."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from changegen_spark.functions.unigram import _viterbi
    from changegen_spark.queries.unigram import _gold_segmenter

    alphabet = "abc"

    @settings(max_examples=200, deadline=None)
    @given(
        word=st.text(alphabet=alphabet, min_size=1, max_size=12),
        data=st.data(),
    )
    def check(word, data):
        # random vocabulary: all single chars + random multi-char pieces
        pieces = {c for c in alphabet}
        for ln in (2, 3, 4):
            for _ in range(3):
                s = data.draw(st.text(alphabet=alphabet, min_size=ln, max_size=ln))
                pieces.add(s)
        costs = {
            p: data.draw(st.integers(min_value=1, max_value=10**9))
            for p in sorted(pieces)
        }
        assert _viterbi(word, costs) == _gold_segmenter(costs)(word)

    check()


def test_viterbi_unknown_char_fallback():
    """A word containing a character absent from the cost table must still
    segment (UNK_CHAR_COST fallback) — identically in both implementations —
    instead of crashing the Arrow encode UDF at corpus scale."""
    from changegen_spark.functions.unigram import UNK_CHAR_COST, _viterbi
    from changegen_spark.queries.unigram import _gold_segmenter

    costs = {"a": 5, "b": 7, "ab": 9}  # no 'z' anywhere
    for word in ("zab", "abz", "azb", "zzz", "z"):
        got = _viterbi(word, costs)
        assert got == _gold_segmenter(costs)(word), word
        assert "".join(got) == word
    # known pieces still beat the fallback: 'ab' (9) not 'a'+'b' (12),
    # and the unknown char costs UNK_CHAR_COST exactly once
    assert _viterbi("zab", costs) == ["z", "ab"]
    assert UNK_CHAR_COST > 3 * 10**10
