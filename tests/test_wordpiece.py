"""WordPiece tokenizer: hand-computable merge decisions (incl. the case
where the likelihood score picks a DIFFERENT pair than BPE's raw count
would), greedy longest-match encode semantics, [UNK] behavior, and a
property sweep pinning the engine and gold encoders equal."""

from pyspark.sql import functions as F

from changegen_spark.functions.wordpiece import (
    UNK,
    encode_word,
    wordpiece_train,
)


def _wc(spark, pairs):
    return spark.createDataFrame(pairs, "word string, cnt long")


def test_score_beats_raw_count(spark):
    """'xy' appears 5× and only ever together (count(x)=count(y)=5);
    'ab' appears 8× but a and b are promiscuous (count(a)=count(b)=20).
    BPE would merge (a,##b) first (8 > 5); WordPiece must merge (x,##y):
    score 5/25 = 0.2 over 8/400 = 0.02."""
    wc = _wc(
        spark,
        [("xy", 5), ("ab", 8), ("ac", 6), ("cb", 6), ("ca", 6), ("bc", 6)],
    )
    merges, pieces = wordpiece_train(wc, 1)
    left, right, merged, cnt, score_e9 = merges[0]
    assert (left, right, merged, cnt) == ("x", "##y", "xy", 5)
    assert score_e9 == (10**9 * 5) // (5 * 5)
    assert "xy" in pieces


def test_merge_chain_and_continuation_prefix(spark):
    """Chained merges keep the ## continuation bookkeeping: merging
    (##b, ##c) yields '##bc'; then (a, ##bc) yields 'abc'."""
    wc = _wc(spark, [("abc", 10)])
    merges, pieces = wordpiece_train(wc, 3)
    got = [(m[0], m[1], m[2]) for m in merges]
    # first round: pairs (a,##b) and (##b,##c) both count 10 with equal
    # symbol counts -> tie breaks lexicographically: '##b' < 'a'
    assert got[0] == ("##b", "##c", "##bc")
    assert got[1] == ("a", "##bc", "abc")
    assert len(got) == 2  # single word fully merged; no pair with count>=2 left
    assert {"a", "##b", "##c", "##bc", "abc"} <= pieces


def test_encode_longest_match_and_unk():
    pieces = {"un", "##aff", "##able", "##a", "u", "##n", "##f", "##l", "##e", "##b"}
    assert encode_word("unaffable", pieces) == ["un", "##aff", "##able"]
    # 'z' has no piece anywhere -> whole word is UNK
    assert encode_word("unzable", pieces) == [UNK]
    # initial position must NOT use a continuation piece
    assert encode_word("affable", pieces) == [UNK]


def test_encode_stats_accounting(spark):
    from changegen_spark.queries.wordpiece import q_wordpiece_encode_stats

    rows = q_wordpiece_encode_stats(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.n_unk == 0  # every corpus char is in the trained inventory
        assert r.n_words <= r.n_pieces


def test_engine_and_gold_encoders_agree_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from changegen_spark.queries.wordpiece import _gold_encode

    alphabet = "abz"

    @settings(max_examples=200, deadline=None)
    @given(word=st.text(alphabet=alphabet, min_size=1, max_size=10), data=st.data())
    def check(word, data):
        pieces = set()
        # random inventory; single chars only sometimes, so [UNK] paths
        # are exercised too
        for c in alphabet:
            if data.draw(st.booleans()):
                pieces.add(c)
                pieces.add("##" + c)
        for ln in (2, 3):
            for _ in range(3):
                s = data.draw(st.text(alphabet=alphabet, min_size=ln, max_size=ln))
                pieces.add(s)
                pieces.add("##" + s)
        assert encode_word(word, pieces) == _gold_encode(word, pieces)

    check()
