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
