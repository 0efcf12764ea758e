"""Learning-mechanism pin for the hashed NB-SVM classifier
(queries/features.nb_classify).

The registry query q_nb_classifier trains on the synthetic corpus, whose
lang labels are independent of the text by construction (one flat ~31-token
vocabulary), so its accuracy there is the base rate — the oracle checks the
arithmetic, and THIS test checks the learning: on a planted two-class
corpus with distinct class vocabularies the same plan must separate the
classes nearly perfectly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from changegen_spark.queries.features import nb_classify

POS_WORDS = ["alpha", "bravo", "carbon", "delta", "ember"]
NEG_WORDS = ["zinc", "yttrium", "xenon", "wolfram", "vanadium"]
SHARED = ["the", "data", "table", "row"]


def _planted(spark, n_per_class=40, seed_words=7):
    rows = []
    for i in range(n_per_class):
        # deterministic pseudo-random word picks, no RNG needed
        pos = [POS_WORDS[(i * 3 + j) % len(POS_WORDS)] for j in range(seed_words)]
        neg = [NEG_WORDS[(i * 5 + j) % len(NEG_WORDS)] for j in range(seed_words)]
        sh = [SHARED[(i + j) % len(SHARED)] for j in range(3)]
        rows.append((i, " ".join(pos + sh), 1))
        rows.append((n_per_class + i, " ".join(neg + sh), 0))
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def test_nb_classifier_learns_planted_signal(spark):
    d = _planted(spark)
    out = nb_classify(d, F.col("y")).collect()
    assert len(out) == 80
    acc = sum(1 for r in out if r.pred_pos == r.is_pos) / len(out)
    assert acc >= 0.95, acc


def test_nb_classifier_scores_are_deterministic(spark):
    d = _planted(spark)
    a = sorted(map(tuple, nb_classify(d, F.col("y")).collect()))
    b = sorted(map(tuple, nb_classify(d.repartition(7), F.col("y")).collect()))
    assert a == b


# --- Unicode NFC ------------------------------------------------------------


def test_nfc_pinned_semantics(spark, sf_dir):
    """Composition behavior pinned case-by-case: combining sequences
    shrink, NFC-invariant inputs don't move, and the two input orderings
    of the same mark set (canonical reordering) converge to one result."""
    from changegen_spark.queries.features import q_unicode_nfc

    rows = {r.uid: r for r in q_unicode_nfc(spark, sf_dir).collect()}
    assert rows[1].changed == 1 and rows[1].n_cp_after == 1  # e+acute -> é
    assert rows[2].changed == 0  # already NFC
    assert rows[4].changed == 1 and rows[4].n_cp_after == 1  # jamo -> syllable
    assert rows[7].changed == 1  # Angstrom singleton
    assert rows[8].changed == 0  # fi ligature survives NFC (NFKC would fold)
    assert rows[9].changed == 0  # ASCII passthrough
    assert rows[5].nfc_md5 == rows[6].nfc_md5  # mark order canonicalized
    for r in rows.values():
        assert r.n_cp_after <= r.n_cp_before


def test_nfc_engines_agree_on_random_bmp_strings():
    """Property sweep: CPython's unicodedata (the engine UDF) vs DuckDB's
    utf8proc (the oracle) — two independent UAX #15 implementations —
    agree on random BMP strings heavy in combining marks."""
    import unicodedata

    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    marks = [0x300, 0x301, 0x302, 0x303, 0x308, 0x30A, 0x323, 0x327]
    bases = [ord(c) for c in "aeiousznAEOUS"] + [0x3B1, 0x403, 0x1100, 0x1161]
    cp = st.sampled_from(bases + marks + [0xE9, 0x212B, 0x1E0B, 0x20, 0x41])
    strs = st.lists(cp, min_size=0, max_size=24).map(
        lambda cps: "".join(chr(c) for c in cps)
    )
    con = duckdb.connect()

    @settings(max_examples=300, deadline=None)
    @given(strs)
    def check(s):
        got = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
        assert got == unicodedata.normalize("NFC", s)

    check()
    con.close()
