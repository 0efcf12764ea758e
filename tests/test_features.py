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
