"""Curation-family tests: planted-input semantics for the Gopher rule
set, CCNet terciles, temperature mixing, and n-gram novelty (the oracle
rows pin the corpus values; these pin the DECISIONS on crafted docs)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def docs(spark, tmp_path):
    rows = [
        # passes every Gopher rule: 60 words, mwl in band, stopwords
        (1, " ".join(["the", "a", "table"] * 20), "en", "s1"),
        # too short
        (2, "the a short doc", "en", "s1"),
        # mean word length too long (every word 12 chars)
        (3, " ".join(["abcdefghijkl"] * 60), "en", "s1"),
        # no stopword hits
        (4, " ".join(["zig", "zag"] * 30), "en", "s2"),
        # numeric words → alpha fraction low
        (5, " ".join(["123", "456", "the", "a"] * 15), "en", "s2"),
    ]
    d = spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, t, l, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    p = str(tmp_path / "cur")
    d.coalesce(1).write.parquet(p + "/documents.parquet")
    return p


def test_gopher_rules_decisions(spark, docs):
    from changegen_spark.queries.curation import q_gopher_rules

    got = {r.doc_id: r for r in q_gopher_rules(spark, docs).collect()}
    assert got[1].keep == 1
    assert got[2].keep == 0 and got[2].n_words == 4
    assert got[3].keep == 0 and got[3].mean_word_len == 12.0
    assert got[4].keep == 0 and got[4].n_stop_hits == 0
    assert got[5].keep == 0 and got[5].alpha_word_frac == 0.5


def test_ngram_novelty_first_writer_wins(spark, docs):
    """Doc 1 introduces its bigrams; an identical later doc would score 0.
    Here doc 2 shares the leading 'the a' bigram with doc 1 (doc 1 is the
    first writer), so doc 2's novelty < 1."""
    from changegen_spark.queries.curation import q_ngram_novelty

    got = {r.doc_id: r for r in q_ngram_novelty(spark, docs).collect()}
    assert got[1].novelty_frac == 1.0  # lowest doc_id introduces everything
    assert got[2].n_novel < got[2].n_grams  # 'the a' already seen in doc 1
    assert all(0.0 <= r.novelty_frac <= 1.0 for r in got.values())


def test_mixture_temperature_flattens_skew(spark, docs):
    """alpha=1/2 must give the small source a LARGER share than its token
    share (that is the point of temperature sampling), probabilities sum
    to ~1e6, and contributions never exceed the budget."""
    from changegen_spark.queries.curation import q_mixture_temperature

    rows = q_mixture_temperature(spark, docs).collect()
    by_src = {r.source: r for r in rows}
    tot_tokens = sum(r.n_tokens for r in rows)
    small, big = ("s2", "s1") if by_src["s2"].n_tokens < by_src["s1"].n_tokens else ("s1", "s2")
    assert by_src[small].p_e6 / 1e6 > by_src[small].n_tokens / tot_tokens
    assert by_src[big].p_e6 / 1e6 < by_src[big].n_tokens / tot_tokens
    assert abs(sum(r.p_e6 for r in rows) - 1_000_000) <= len(rows)
    assert sum(r.contrib_tokens for r in rows) <= rows[0].budget_tokens + len(rows)


def test_ccnet_buckets_tercile_contract(spark, sf_dir):
    """Terciles are per-language, ordered by nll: every lang's head bucket
    must have max(nll) <= its tail bucket's min(nll), and sizes differ by
    at most 1 within a lang."""
    from changegen_spark.queries.curation import q_ccnet_buckets

    rows = q_ccnet_buckets(spark, sf_dir).collect()
    assert rows
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r)
    for lang, rs in per_lang.items():
        byb = {}
        for r in rs:
            byb.setdefault(r.tercile, []).append(r.nll)
        ks = sorted(byb)
        for a, b in zip(ks, ks[1:]):
            assert max(byb[a]) <= min(byb[b]), lang
        sizes = [len(v) for v in byb.values()]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)


def test_mixture_sample_realizes_plan_rates(spark, sf_dir):
    """The executed sample's per-source doc fraction must track the plan's
    rate (hash-Bernoulli: binomial tolerance), selection must be exactly
    reproducible run to run, and no source may exceed rate 1."""
    from changegen_spark.queries.curation import (
        q_mixture_sample,
        q_mixture_temperature,
    )
    from changegen_spark.sources.tables import load_table

    plan = {r.source: r for r in q_mixture_temperature(spark, sf_dir).collect()}
    rows = q_mixture_sample(spark, sf_dir).collect()
    rows2 = q_mixture_sample(spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in rows2]  # deterministic
    n_docs = {
        r.source: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    from collections import Counter

    picked = Counter(r.source for r in rows)
    for s, p in plan.items():
        rate = p.contrib_tokens / p.n_tokens
        assert rate <= 1.0 + 1e-9
        frac = picked.get(s, 0) / n_docs[s]
        # binomial 4-sigma band around the rate
        import math

        tol = 4 * math.sqrt(max(rate * (1 - rate), 0.01) / n_docs[s])
        assert abs(frac - rate) <= tol, (s, frac, rate, tol)


def test_compression_ratio_flags_repetitive_text(spark, tmp_path):
    """A pathologically repetitive document must compress far below the
    keep threshold while high-entropy text stays above it."""
    from changegen_spark.queries.curation import ZRATIO_MIN_E6, q_compression_ratio
    import random

    random.seed(3)
    rows = [
        (1, "spam " * 400, "en", "s", 2000),
        (2, " ".join(random.choice("abcdefghijklmnop") * random.randint(1, 3)
                     for _ in range(400)), "en", "s", 1200),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    p = str(tmp_path / "z")
    d.coalesce(1).write.parquet(p + "/documents.parquet")
    got = {r.doc_id: r for r in q_compression_ratio(spark, p).collect()}
    assert got[1].keep == 0 and got[1].ratio_e6 < ZRATIO_MIN_E6 // 3
    assert got[2].keep == 1


def test_ccnet_buckets_matches_ntile_exactly(spark, sf_dir):
    """The de-skewed rank-stitch implementation (range partition +
    broadcast prefix offsets, r5 verdict #3) must be BYTE-IDENTICAL to
    the straightforward per-language ntile(3) it replaced."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from changegen_spark.queries.curation import _docs, q_ccnet_buckets
    from changegen_spark.queries.lm import q_lm_score

    got = q_ccnet_buckets(spark, sf_dir).collect()

    scored = q_lm_score(spark, sf_dir).select("doc_id", "nll", "ppl")
    langs = _docs(spark, sf_dir).select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy("nll", "doc_id")
    bucket = F.ntile(3).over(w)
    want = (
        scored.join(langs, "doc_id")
        .select(
            "doc_id",
            "lang",
            "nll",
            "ppl",
            bucket.cast("long").alias("tercile"),
            F.element_at(
                F.array(F.lit("head"), F.lit("middle"), F.lit("tail")), bucket
            ).alias("bucket"),
        )
        .orderBy("doc_id")
        .collect()
    )
    assert got == want


def test_ccnet_buckets_plan_has_no_per_lang_window(spark, sf_dir):
    """Skew pin: no ntile anywhere, and every row_number Window (the one
    node that sees the full document frame) must partition by the range
    partition id as well as lang, so a dominant language never lands in
    one task.  (Windows partitioned by lang alone do remain — the prefix
    sum over the partitions×langs counts frame — which is KB-sized by
    construction.)"""
    import re

    from changegen_spark.queries.curation import q_ccnet_buckets

    plan = q_ccnet_buckets(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "ntile" not in plan.lower()
    rn_windows = [
        ln for ln in plan.splitlines() if "Window [row_number()" in ln
    ]
    assert rn_windows, "rank window vanished — implementation changed?"
    for ln in rn_windows:
        spec = re.search(r"windowspecdefinition\(([^)]*)\)", ln).group(1)
        assert "__part" in spec, ln
