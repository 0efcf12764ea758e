"""Semantic unit tests for the training-data prep operators (queries/mlprep).

Constructed micro-corpora with hand-computable expectations; the sf0.01
value-hash parity is covered by the oracle gate (tools/check_oracle.py)."""

import pytest
from pyspark.sql import functions as F


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")


def test_word_ngrams_short_doc_is_empty(spark):
    from changegen_spark.queries.mlprep import word_ngrams, _toks

    df = spark.createDataFrame([("a b c",), ("a b c d e f",)], "text string")
    out = df.select(F.size(word_ngrams(_toks(F.col("text")), 5)).alias("n")).collect()
    # 3 tokens < n=5 -> no n-grams (NOT a descending-sequence artifact);
    # 6 tokens -> 2 five-grams
    assert [r.n for r in out] == [0, 2]


def test_decontaminate_flags_planted_overlap(spark, monkeypatch, tmp_path):
    from changegen_spark.queries import mlprep

    # eval doc (id 3: 3 % 19 == 3) shares its only 5-gram with train doc 1;
    # train doc 2 shares nothing.
    rows = [
        (3, "alpha beta gamma delta epsilon", "en", "s", 1),
        (1, "alpha beta gamma delta epsilon zeta", "en", "s", 1),
        (2, "one two three four five six", "en", "s", 1),
    ]
    df = _docs_df(spark, rows)
    monkeypatch.setattr(mlprep, "_docs", lambda s, d: df)
    out = {r.doc_id: r for r in mlprep.q_decontaminate(spark, "ignored").collect()}
    assert set(out) == {1, 2}  # eval doc excluded from the report
    assert out[1].n_ngrams == 2 and out[1].n_contaminated == 1
    assert out[1].contamination_frac == 0.5
    assert out[2].n_contaminated == 0


def test_pii_scrub_counts_and_redacts(spark, monkeypatch):
    from changegen_spark.queries import mlprep

    # doc_id 1: planted email (1%3!=0), phone (1%4!=0), ip (1%5!=0);
    # doc_id 60: 60%3==0, 60%4==0, 60%5==0 -> nothing planted
    df = _docs_df(spark, [(1, "hello world", "en", "s", 1), (60, "plain", "en", "s", 1)])
    monkeypatch.setattr(mlprep, "_docs", lambda s, d: df)
    out = {r.doc_id: r for r in mlprep.q_pii_scrub(spark, "ignored").collect()}
    assert (out[1].n_email, out[1].n_phone, out[1].n_ip) == (1, 1, 1)
    assert (out[60].n_email, out[60].n_phone, out[60].n_ip) == (0, 0, 0)
    # redaction is total: rebuilding the augmented+redacted string must hash equal
    aug_red = (
        df.select(
            "doc_id",
            F.md5(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(
                            mlprep._pii_augmented(F.col("doc_id"), F.col("text")),
                            mlprep.EMAIL_RE,
                            "<EMAIL>",
                        ),
                        mlprep.PHONE_RE,
                        "<PHONE>",
                    ),
                    mlprep.IP_RE,
                    "<IP>",
                )
            ).alias("h"),
        )
        .collect()
    )
    assert {r.doc_id: r.h for r in aug_red}[1] == out[1].redacted_hash
    # and the redacted text for doc 1 contains no raw digits of the planted PII
    txt = df.filter(F.col("doc_id") == 1).select(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    mlprep._pii_augmented(F.col("doc_id"), F.col("text")),
                    mlprep.EMAIL_RE,
                    "<EMAIL>",
                ),
                mlprep.PHONE_RE,
                "<PHONE>",
            ),
            mlprep.IP_RE,
            "<IP>",
        ).alias("t")
    ).collect()[0].t
    assert "<EMAIL>" in txt and "<PHONE>" in txt and "<IP>" in txt
    assert "@example.com" not in txt and "555-" not in txt and "10." not in txt


def test_repetition_hand_computed(spark, monkeypatch):
    from changegen_spark.queries import mlprep

    # "a a a b": 4 tokens, 2 distinct -> dup 0.5; top word a=3/4; bigrams
    # [a a, a a, a b]: top 2/3
    df = _docs_df(spark, [(1, "a a a b", "en", "s", 1)])
    monkeypatch.setattr(mlprep, "_docs", lambda s, d: df)
    r = mlprep.q_repetition(spark, "ignored").collect()[0]
    assert r.n_tokens == 4
    assert r.dup_word_frac == 0.5
    assert r.top_word_frac == 0.75
    assert r.top_bigram_frac == round(2 / 3, 6)


def test_hash_sample_is_deterministic_and_stratified(spark, monkeypatch):
    from changegen_spark.queries import mlprep

    rows = [(i, f"doc {i}", "en", f"src{i % 2}", 1) for i in range(20)]
    df = _docs_df(spark, rows)
    monkeypatch.setattr(mlprep, "_docs", lambda s, d: df)
    a = mlprep.q_hash_sample(spark, "ignored").collect()
    b = mlprep.q_hash_sample(spark, "ignored").collect()
    assert a == b  # pure function of doc_id -> retry/re-run stable
    per_src = {}
    for r in a:
        per_src[r.source] = per_src.get(r.source, 0) + r.strat_keep
    assert per_src == {"src0": 3, "src1": 3}


def test_token_chunks_boundaries(spark, monkeypatch):
    from changegen_spark.queries import mlprep

    # 40 tokens, chunk 32 / stride 16 -> starts 1,17,33 with sizes 32,24,8
    df = _docs_df(spark, [(1, " ".join(f"t{i}" for i in range(40)), "en", "s", 1)])
    monkeypatch.setattr(mlprep, "_docs", lambda s, d: df)
    out = mlprep.q_token_chunks(spark, "ignored").collect()
    assert [(r.chunk_idx, r.n_in_chunk) for r in out] == [(0, 32), (1, 24), (2, 8)]
    # overlapping windows share content: chunk 1 starts at token 17
    assert len({r.chunk_hash for r in out}) == 3


def test_pack_sequences_hand_computed(spark, monkeypatch):
    from changegen_spark.queries import mlprep

    # Budget 64.  Source s: docs of 50, 30, 100 tokens in doc_id order.
    #   doc 1: start 0   -> seq 0 off 0,  spans ceil: tokens 0-49   -> 1 seq
    #   doc 2: start 50  -> seq 0 off 50, tokens 50-79  -> seqs 0-1 -> 2
    #   doc 3: start 80  -> seq 1 off 16, tokens 80-179 -> seqs 1-2 -> 2
    rows = [
        (1, " ".join(["w"] * 50), "en", "s", 1),
        (2, " ".join(["w"] * 30), "en", "s", 1),
        (3, " ".join(["w"] * 100), "en", "s", 1),
        (4, " ".join(["w"] * 10), "en", "other", 1),  # independent stream
    ]
    df = _docs_df(spark, rows)
    monkeypatch.setattr(mlprep, "_docs", lambda s, d: df)
    out = {r.doc_id: r for r in mlprep.q_pack_sequences(spark, "ignored").collect()}
    assert (out[1].seq_id, out[1].offset_in_seq, out[1].n_seqs_spanned) == (0, 0, 1)
    assert (out[2].seq_id, out[2].offset_in_seq, out[2].n_seqs_spanned) == (0, 50, 2)
    assert (out[3].seq_id, out[3].offset_in_seq, out[3].n_seqs_spanned) == (1, 16, 2)
    assert (out[4].seq_id, out[4].offset_in_seq) == (0, 0)  # per-source reset


def test_decontaminate_plan_is_equi_join(spark, sf_dir):
    from changegen_spark.queries.mlprep import q_decontaminate

    plan = q_decontaminate(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_external_decontaminate_against_shipped_artifact(spark):
    """The shipped eval-set artifact (fixtures/evalset_ngrams.parquet,
    tools/make_evalset.py) was built from the sf0.01 held-out split
    (doc_id % 19 = 3): at sf0.01 every eval-split doc with >=5 tokens
    must therefore be FULLY contaminated, and the artifact must broadcast
    (kilobytes against the corpus side)."""
    import os

    from changegen_spark.queries.mlprep import EVALSET_PATH, q_external_decontaminate

    assert os.path.exists(EVALSET_PATH)
    out = q_external_decontaminate(spark, "/root/testdata/sf0.01")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    rows = {r.doc_id: r for r in out.collect()}
    evald = [r for d, r in rows.items() if d % 19 == 3]
    assert evald, "eval split empty at sf0.01?"
    assert all(r.contamination_frac == 1.0 for r in evald)
    # non-eval docs: the small shared vocabulary makes some overlap
    # expected, but not total
    train_fracs = [r.contamination_frac for d, r in rows.items() if d % 19 != 3]
    assert any(f < 1.0 for f in train_fracs)


def test_weighted_sample_exact_pps(spark):
    """PPS systematic sampling: pick counts telescope to exactly m, a
    dominant-weight doc is picked multiple times, and the result is
    partitioning-invariant (the prefix sum is defined by doc_id order,
    not partition boundaries)."""
    import changegen_spark.queries.mlprep as mp

    rows = [(i, "t", "en", "s", 10) for i in range(1, 40)] + [(99, "t", "en", "s", 2000)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = mp._docs
    try:
        mp._docs = lambda _s, _d: df.repartition(7)
        got7 = sorted(map(tuple, mp.q_weighted_sample(spark, "u").collect()))
        mp._docs = lambda _s, _d: df.coalesce(1)
        got1 = sorted(map(tuple, mp.q_weighted_sample(spark, "u").collect()))
    finally:
        mp._docs = orig
    assert got7 == got1
    total = sum(r[3] for r in got7)
    assert total == mp.WS_SAMPLES
    by_id = {r[0]: r[3] for r in got7}
    # doc 99 carries 2000/2390 of the weight -> ~42 of the 50 picks
    assert by_id[99] >= 40


def test_stratified_split_exact_proportions_and_invariance(spark):
    """Every stratum gets exactly floor(.8n)/floor(.9n)-floor(.8n)/rest
    train/val/test rows; assignment is a pure function of doc_id (same
    result under different input partitioning); singleton strata land
    wholly in test (floor rounds both cuts to 0)."""
    import changegen_spark.queries.mlprep as mp

    rows = (
        [(i, "t", "en", "s", 10) for i in range(1, 48)]          # n=47
        + [(100 + i, "t", "de", "s", 10) for i in range(10)]     # n=10
        + [(900, "t", "xx", "s", 10)]                            # n=1
    )
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = mp._docs
    try:
        mp._docs = lambda _s, _d: df.repartition(11)
        got11 = sorted(map(tuple, mp.q_stratified_split(spark, "u").collect()))
        mp._docs = lambda _s, _d: df.coalesce(1)
        got1 = sorted(map(tuple, mp.q_stratified_split(spark, "u").collect()))
    finally:
        mp._docs = orig
    assert got11 == got1

    from collections import Counter

    by = Counter((r[1], r[3]) for r in got11)
    assert by[("en", "train")] == 37   # floor(8*47/10)
    assert by[("en", "val")] == 5      # floor(9*47/10)=42 -> 42-37
    assert by[("en", "test")] == 5
    assert by[("de", "train")] == 8 and by[("de", "val")] == 1 and by[("de", "test")] == 1
    assert by[("xx", "test")] == 1 and ("xx", "train") not in by
    # ranks are a permutation of 1..n within each stratum
    en_ranks = sorted(r[2] for r in got11 if r[1] == "en")
    assert en_ranks == list(range(1, 48))


def test_dsir_weights_partitioning_invariant(spark, sf_dir):
    """The e6-scaled-integer log-ratio design makes per-doc weights exact
    integer sums — repartitioning the input must not move a single bit,
    and the top-k selection must be stable."""
    from changegen_spark.queries.mlprep import q_dsir_weights

    base = {r["doc_id"]: (r["logw_e6"], r["selected"])
            for r in q_dsir_weights(spark, sf_dir).collect()}
    # second evaluation with a different shuffle layout
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        again = {r["doc_id"]: (r["logw_e6"], r["selected"])
                 for r in q_dsir_weights(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    assert base == again
    assert sum(s for _, s in base.values()) == 50


def test_reservoir_sample_statistics_and_invariance(spark):
    """Efraimidis-Spirakis correctness on a planted frame: across 24 salt
    variants, a 200x-weight document must enter the k=5 sample nearly
    always, and any fixed unit-weight document only rarely; the sample is
    identical under arbitrary repartitioning (keys are data-derived, so
    partitioning cannot move the top-k)."""
    from pyspark.sql import functions as F

    from changegen_spark.queries.mlprep import es_sample_keys

    rows = [(i, 200 if i == 7 else 1) for i in range(120)]
    d = spark.createDataFrame(rows, "doc_id long, w long")

    heavy_hits, light_hits = 0, 0
    for s in range(24):
        keyed = d.withColumn("k", es_sample_keys(F.col("doc_id"), F.col("w"), salt=str(s)))
        top = {r.doc_id for r in keyed.orderBy("k", "doc_id").limit(5).collect()}
        heavy_hits += 7 in top
        light_hits += 11 in top
    assert heavy_hits >= 20, heavy_hits   # P(select) ~ 200/319 per slot
    assert light_hits <= 6, light_hits    # unit weight: ~5/319 per draw

    keyed = d.withColumn("k", es_sample_keys(F.col("doc_id"), F.col("w")))
    a = [tuple(r) for r in keyed.orderBy("k", "doc_id").limit(5).collect()]
    b = [
        tuple(r)
        for r in keyed.repartition(13).orderBy("k", "doc_id").limit(5).collect()
    ]
    assert a == b


def test_reservoir_zero_weight_never_sampled(spark):
    """A zero or NULL weight must yield key = +inf (P(select)=0), not the
    NULL key Spark's divide-by-zero produces — ascending orderBy puts
    NULLs FIRST, which would seat weight-0 rows at the head of the sample
    while the DuckDB oracle (inf, sorts last) excludes them (advisor r4)."""
    from pyspark.sql import functions as F

    from changegen_spark.queries.mlprep import es_sample_keys

    rows = [(1, 10), (2, 0), (3, None), (4, 7)]
    d = spark.createDataFrame(rows, "doc_id long, w long")
    keyed = d.withColumn("k", es_sample_keys(F.col("doc_id"), F.col("w")))
    got = {r.doc_id: r.k for r in keyed.collect()}
    assert got[2] == float("inf") and got[3] == float("inf")
    top = [r.doc_id for r in keyed.orderBy("k", "doc_id").limit(2).collect()]
    assert set(top) == {1, 4}


def test_reservoir_sample_plan_is_takeordered(spark, sf_dir):
    """The sampler must be one map + TakeOrderedAndProject — no global
    Sort stage, no Window, no aggregation: the cheapest "k of 100 TB by
    weight" plan."""
    from changegen_spark.queries.mlprep import q_reservoir_sample

    plan = q_reservoir_sample(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan and "HashAggregate" not in plan


def test_fuzzy_decontaminate_matches_independent_minhash(spark, sf_dir):
    """r7 fuzzy decon: an INDEPENDENT plain-Python minhash (hashlib md5,
    loop-built shingles — no shared helpers) over every train/eval doc
    pair reproduces the flagged pairs and their match counts exactly."""
    import hashlib

    from changegen_spark.queries.mlprep import (
        DECON_N,
        FUZZY_K,
        FUZZY_MIN_MATCHES,
        q_fuzzy_decontaminate,
    )
    from changegen_spark.sources.tables import load_table

    docs = {
        r.doc_id: r.text.strip().split()
        for r in load_table(spark, sf_dir, "documents").collect()
    }

    def mh(toks):
        grams = {
            " ".join(toks[i : i + DECON_N])
            for i in range(len(toks) - DECON_N + 1)
        }
        if not grams:
            return None
        return [
            min(
                int(hashlib.md5(f"{k}:{g}".encode()).hexdigest()[:15], 16)
                for g in grams
            )
            for k in range(FUZZY_K)
        ]

    sigs = {d: mh(t) for d, t in docs.items()}
    want = {}
    for td, ts in sigs.items():
        if td % 19 == 3 or ts is None:
            continue
        for ed, es in sigs.items():
            if ed % 19 != 3 or es is None:
                continue
            m = sum(a == b for a, b in zip(ts, es))
            if m >= FUZZY_MIN_MATCHES:
                want[(td, ed)] = m

    got = {
        (r.train_doc_id, r.eval_doc_id): r.matches
        for r in q_fuzzy_decontaminate(spark, sf_dir).collect()
    }
    assert got == want
    # the planted cross-boundary near-dups are the reason this is non-empty
    assert got, "fixture should contain cross-split near-dup leakage"


def test_fuzzy_decontaminate_plan_broadcasts_eval_side(spark, sf_dir):
    """The candidate join must be an equi-join on (k, mh) with the eval
    side broadcast — never a doc x doc comparison."""
    from changegen_spark.queries.mlprep import q_fuzzy_decontaminate

    plan = (
        q_fuzzy_decontaminate(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_padding_waste_matches_independent_batching(spark, sf_dir):
    """r7 padding audit: a sequential Python batcher reproduces both
    policies exactly, and length-bucketed batching strictly reduces the
    padded-slot waste on this corpus (the metric's reason to exist)."""
    from changegen_spark.queries.mlprep import (
        PAD_B,
        PAD_BUCKET,
        q_padding_waste,
    )
    from changegen_spark.sources.tables import load_table

    lens = {
        r.doc_id: (len(r.text.strip().split()) if r.text.strip() else 0)
        for r in load_table(spark, sf_dir, "documents").collect()
    }

    def audit(batches):
        slots = sum(len(b) * max(b) for b in batches if b)
        used = sum(sum(b) for b in batches)
        return (
            len([b for b in batches if b]),
            slots,
            used,
            round((slots - used) * 1e6 / slots),
        )

    arrival = {}
    for d, n in lens.items():
        arrival.setdefault(d // PAD_B, []).append(n)
    by_bucket = {}
    for d, n in sorted(lens.items(), key=lambda kv: (kv[1], kv[0])):
        by_bucket.setdefault(n // PAD_BUCKET, []).append(n)
    bucketed = []
    for _, ns in by_bucket.items():
        bucketed += [ns[i : i + PAD_B] for i in range(0, len(ns), PAD_B)]

    want = {
        "arrival": audit(list(arrival.values())),
        "bucketed": audit(bucketed),
    }
    got = {
        r.policy: (r.n_batches, r.slots, r.used_tokens, r.waste_e6)
        for r in q_padding_waste(spark, sf_dir).collect()
    }
    assert got == want
    assert got["bucketed"][3] < got["arrival"][3]
