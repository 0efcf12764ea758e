"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the noop sink (no driver collect,
no result-size bias) — wall time measures the distributed plan, which is
what must hold at 100 TB.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family — scan/agg, join+topk, multi-join,
# spatial join, dedup-LSH, ANN, temporal joins, sessionization, exact dedup,
# text scan.  (r2: q_lsh_pairs_fast left the headline — the xxhash64
# experiment's premise was disproven once the default signature moved to the
# Arrow UDF, making the "fast" twin the slower redundant variant; it remains
# a contract query.  Its slot carries the as-of + range joins.)
# Per-query wall-clock ceilings (sec, sf0.1 warm): 1.3× the BENCH_r02
# recording, except the two r3-rewritten queries which get the verdict's
# explicit < 4 s targets.  bench.py reports violations in the JSON line
# ("over_budget") so round-over-round drift is visible at the source
# instead of surfacing two rounds later as a verdict regression note.
BUDGETS = {
    "q01_pricing_summary": 2.1,
    "q_snapshot_diff": 2.2,
    "q03_top_orders": 1.6,
    "q05_region_revenue": 1.9,
    "q_distance_join": 1.6,
    "q_grid_dedup": 0.8,
    "q_lsh_pairs": 3.1,
    "q_ann_bruteforce": 2.1,
    "q_asof_join": 1.2,
    "q_range_join": 1.6,
    "q_sessionize": 0.7,
    "q_event_windows": 0.6,
    "q_exact_dedup": 0.6,
    "q_token_count": 0.5,
    "q_way_chunking": 0.7,
    "q_decontaminate": 1.9,
    "q_pack_sequences": 0.6,
    "q_corpus_pipeline": 2.3,
    "q_dup_spans": 2.7,  # r3 Arrow positioned-gram rewrite: ~2.0 s warm
    "q_lm_score": 4.0,
    "q_feature_hash": 1.0,
    # r3 late additions (measured warm min-of-3 at sf0.1: 0.73 / 0.74 / 0.39)
    "q_resample": 1.1,
    "q_hybrid_search": 1.1,
    # r7 re-budget with measurement (r6 verdict #5): code untouched since
    # r3 and the plan is still the pinned bucket equi-join (3 exchanges,
    # no nested-loop), but the 0.39 s r3 reading is unreproducible at any
    # load: r6 judge idle-normalized 0.685, r7 idle bench-context 0.59-0.63,
    # r7 FRESH-session min-of-3 0.9-1.1 — on a ~0.5 s query the moving part
    # is JVM/code-cache state from the 40-query suite around it, not the
    # operator.  Budgeted at the measured bench-context ceiling + headroom.
    "q_interval_overlap": 0.8,
    # late-r3 dedup granularities (measured warm min-of-3: 1.84 / 2.22)
    "q_winnow_pairs": 2.4,
    "q_cdc_chunks": 2.9,
    # r3.4 additions (measured warm min-of-3 at sf0.1: 1.63 / 1.53 / 0.94 /
    # 0.48) — HLL sketch, SemDeDup with adaptive cells + Arrow kernels,
    # map-only phrase retrieval, stream-stream batch twin
    "q_hll_distinct": 2.2,
    "q_semantic_dedup": 2.1,
    "q_phrase_search": 1.3,
    "q_view_purchase_pairs": 0.8,
    # r4 additions (measured warm min-of-3 at sf0.1: 2.20 / 1.15) — DSIR
    # importance-resampling selection and the banded-LSH hard-negative
    # miner (the scale path; the exact variant is the deliberate quadratic)
    "q_dsir_weights": 2.9,
    # r5: 8-band config (recall@5 0.44 → 0.80); measured 1.73 s warm
    "q_hard_negatives_lsh": 2.3,
    # r5 additions (measured warm min-of-3 at sf0.1: 1.21 / 5.64) — the
    # banded-LSH embedding-dedup scale path (the exact theta-join twin
    # measures 10.95 s on the same data: the last all-pairs join, retired
    # from the scale path per the r4 verdict) and the end-to-end near-dup
    # dedup composite (LSH pairs → connected components → keep list)
    "q_embedding_dedup_lsh": 1.7,
    "q_dedup_clusters": 7.3,
    # r5 curation family representatives (measured warm min-of-3 at
    # sf0.1: 1.25 / 1.90) — first-occurrence n-gram novelty (two hash
    # shuffles) and CCNet perplexity terciles (composes the bigram LM)
    "q_ngram_novelty": 1.7,
    # r7 re-budget with measurement (r6 verdict #5): the r6 de-skew
    # (range-partitioned ranks + broadcast stitch) deliberately costs an
    # exchange over the r5 ntile form; the r7 shave merged the offs/totals
    # aggregates into one window-derived meta frame (raw 3.29 → 2.76 at
    # equal calib) but the range-partition window sort dominates.
    # Measured: r6 judge idle-normalized 2.72, r7 idle raw 2.76-3.29 at
    # calib 0.30-0.37 (normalized 2.9-3.05).
    "q_ccnet_buckets": 3.2,
    # r6 (r5 verdict #7): the three tokenizer encode stages — train on
    # the dir's own docs (one word-count shuffle + bounded driver loop)
    # then Arrow-batched encode.  Measured warm min-of-3 at sf0.1:
    # 1.35 / 1.21 / 3.71 (unigram pays 3 Viterbi-EM rounds driver-side).
    "q_bpe_encode_stats": 2.0,
    "q_wordpiece_encode_stats": 1.8,
    "q_unigram_encode_stats": 5.0,
    # r7: LSH-pooled MMR — ~1.1M collided candidates exactly scored + 3
    # checkpointed greedy rounds (the exact pool scores 3.7M).  Measured
    # 2.73 / 3.47 bench-context and 5.75 fresh-session; budgeted on the
    # bench-context ceiling + headroom.
    "q_mmr_topk_lsh": 5.0,
    # r8 (measured warm min-of-3 idle: 4.8 / 2.0 s — related_docs after
    # the Arrow tf pre-count + tfs/w fences; 6.6 s before)
    "q_related_docs": 7.0,
    "q_bt_scores": 3.0,
    # r9 (measured warm min-of-3 idle: 3.41 raw / 3.25 norm at calib
    # 1.05) — two aggregation passes over the judgment log (kappa
    # sufficient statistics + per-pair label cells) vs q_bt_scores' one
    "q_bt_weighted": 4.5,
    # r10 (measured warm min-of-3, fresh session after a bm25 warmup,
    # load 0.23: 1.57 s) — the single filtered-explode tf pass + the
    # broadcast query fan-out + per-query top-k window
    "q_bm25_multi": 2.2,
}

HEADLINE = [
    "q01_pricing_summary",
    "q_snapshot_diff",
    "q03_top_orders",
    "q05_region_revenue",
    "q_distance_join",
    "q_grid_dedup",
    "q_lsh_pairs",
    "q_ann_bruteforce",
    "q_asof_join",
    "q_range_join",
    "q_sessionize",
    "q_event_windows",
    "q_exact_dedup",
    "q_token_count",
    "q_way_chunking",
    # r2: training-data prep family representatives — the n-gram semi-join
    # (decontamination), the per-source prefix-sum packer, and the
    # end-to-end corpus pipeline (dedup → quality → decon → pack).
    "q_decontaminate",
    "q_pack_sequences",
    "q_corpus_pipeline",
    # r2 continuation: substring-level dedup + LM quality scoring
    "q_dup_spans",
    "q_lm_score",
    # r3: vocabulary-free feature hashing (hashing-trick representative;
    # q_pagerank stays a contract query — its local wall time is fixed
    # stage overhead, not data, see queries/graph.py docstring)
    "q_feature_hash",
    # r3 late additions — one per new family: time-series resample+LOCF,
    # hybrid lexical+vector retrieval (runs BM25 inside), and the
    # bucketized interval-overlap join
    "q_resample",
    "q_hybrid_search",
    "q_interval_overlap",
    # late-r3: the two new dedup granularities — winnowing fingerprint
    # pair join and content-defined chunk dedup
    "q_winnow_pairs",
    "q_cdc_chunks",
    # r3.4: one per new family — mergeable distinct sketch, semantic
    # (embedding-cluster) dedup, positional phrase retrieval, and the
    # time-bounded event-pair join (stream-stream twin)
    "q_hll_distinct",
    "q_semantic_dedup",
    "q_phrase_search",
    "q_view_purchase_pairs",
    # r4: one per new family — DSIR data selection and LSH-banded
    # hard-negative mining
    "q_dsir_weights",
    "q_hard_negatives_lsh",
    # r5: the embedding-dedup scale path and the composite near-dup
    # dedup pipeline (the most scale-critical composite in the LLM surface)
    "q_embedding_dedup_lsh",
    "q_dedup_clusters",
    # r5: curation-family representatives
    "q_ngram_novelty",
    "q_ccnet_buckets",
    # r6: tokenizer encode stages (train + Arrow encode; r5 verdict #7)
    "q_bpe_encode_stats",
    "q_wordpiece_encode_stats",
    "q_unigram_encode_stats",
    # r7 (r6 verdict #3): MMR over the LSH-retrieved pool — the scale
    # path's measured row (the exact crossJoin pool stays a contract query)
    "q_mmr_topk_lsh",
    # r8: one per new family — DF-capped TF-IDF relatedness (the corpus
    # ladder measures its candidate scaling; this is its sf0.1 wall) and
    # Bradley-Terry preference aggregation (one log pass + driver MM)
    "q_related_docs",
    "q_bt_scores",
    # r9: reliability-weighted BT — the kappa pass (one global aggregate)
    # plus the per-pair label-cells pass, MM driver-side
    "q_bt_weighted",
    # r10: batched multi-query BM25 — one filtered-explode tf pass fanned
    # out to 8 queries by a broadcast term table (the bm25_ladder below
    # measures the queries-vs-postings scaling claim)
    "q_bm25_multi",
]


# sf1 scale-sensitive subset: the banded near-dup join, the embedding-
# cluster dedup, the substring dedup, and the composed corpus pipeline —
# the queries whose shuffle/candidate volume grows fastest with data.
SF1_QUERIES = [
    "q_lsh_pairs",
    "q_semantic_dedup",
    "q_dup_spans",
    "q_corpus_pipeline",
    # r5: banded-candidate embedding dedup (growth must stay ~<2.5× for
    # 10× data — the whole point of retiring the theta join) and the
    # iterative-component composite (its rounds-to-fixpoint and per-round
    # shuffle are exactly where lineage costs surface at scale)
    "q_embedding_dedup_lsh",
    "q_dedup_clusters",
    # r6: tokenizer encode at corpus scale — text volume is the axis that
    # matters for the encode stages; growth should track ~linear (the
    # train step's word-count shuffle dedups, so its cost grows slower)
    "q_bpe_encode_stats",
    "q_wordpiece_encode_stats",
    "q_unigram_encode_stats",
]
SF1_WARM_RUNS = 2


# Idle-machine value of _calibration_s() on this box, measured across r4/r5
# idle closes (~0.29-0.35 s; GAPS.md).  calib_ratio = measured/IDLE is the
# ambient-load multiplier the whole run is subject to.
IDLE_CALIB_S = 0.30  # r7: min-of-3 sampling reads ~0.29-0.31 idle (the
# old 0.33 was a single-sample figure that included scheduler jitter)


def _calibration_s() -> float:
    """Fixed single-thread CPU work, timed — a load canary.  On an idle
    machine this constant is stable round over round; ambient load (other
    benchmarks, a concurrent pytest) inflates it roughly in proportion to
    how much it inflates every query below, which makes cross-round BENCH
    deltas attributable (r4 verdict: 27 of 30 untouched queries drifted
    +8-25% with no code change — unjudgeable without a canary).

    min-of-3 (r7): single samples wobbled 0.29-0.41 s on a verified-idle
    box — scheduler jitter on a 0.3 s probe is ±20%, which the ratio
    normalization would inject straight into every query.  The minimum is
    the undisturbed reading by construction."""

    def one() -> float:
        t0 = time.perf_counter()
        s = 0
        for i in range(5_000_000):
            s += i * i
        assert s > 0
        return time.perf_counter() - t0

    return round(min(one() for _ in range(3)), 3)


# Idle-machine value of _parallel_calibration_s() on this box (r13,
# r12 verdict #6): the single-thread canary reads ~1.0 while the
# headline drifts ±13% across idle runs with movers concentrated in
# Arrow-UDF-heavy queries — multi-core contention, Python-worker pool
# state, and page cache are invisible to a single-thread probe.  This
# canary runs the same machinery the drifting queries run: 32 Arrow
# pandas-UDF tasks across the executor threads.
IDLE_CALIB_PAR_S = 0.76  # min-of-3 after warm, measured idle at r13 (0.756-0.775 across 4 fresh sessions)


def _parallel_calibration_s(spark) -> float:
    """Fixed 32-task Arrow pandas-UDF micro-job, timed (min-of-3 after
    one warm run) — the MULTI-CORE load canary.  Exercises exactly the
    ambient state the single-thread probe cannot see: task scheduling
    across all executor threads, Arrow serialization, and the Python
    worker pool.  calib_par_ratio = measured/IDLE_CALIB_PAR_S is the
    multiplier to read round-over-round drift in Arrow-UDF-heavy
    queries against."""
    import numpy as np  # noqa: F401 (imported in the UDF body too)
    import pandas as pd
    from pyspark.sql import functions as _F
    from pyspark.sql.functions import pandas_udf

    def _work_body(x):
        import numpy as np
        import pandas as pd

        v = x.to_numpy(dtype="float64") + 1.0
        acc = np.zeros_like(v)
        for _ in range(400):
            acc = np.sqrt(acc + v * 1.0000001)
        return pd.Series(acc)

    # real annotation objects: the module-level `from __future__ import
    # annotations` stringifies inline hints, which pyspark's type-hint
    # inference cannot resolve against this closure's locals
    _work_body.__annotations__ = {"x": pd.Series, "return": pd.Series}
    _work = pandas_udf(_work_body, "double")

    df = spark.range(32 * 200_000, numPartitions=32).select(
        _work(_F.col("id")).alias("y")
    )

    def one() -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    one()  # warm: Python worker spin-up + codegen
    return round(min(one() for _ in range(3)), 3)


def main() -> None:
    from changegen_spark.queries import all_queries
    from changegen_spark.session import get_spark

    load_before = round(os.getloadavg()[0], 2)
    calib_before = _calibration_s()
    # r5 verdict #5: don't bench into a loaded machine silently.  If the
    # canary reads >20% over idle, wait for the transient (a finishing
    # pytest, the driver's own setup) and re-sample, up to twice; if load
    # persists, proceed — the calib_ratio annotation below makes the run
    # self-normalizing rather than unusable.
    for _ in range(2):
        if calib_before <= IDLE_CALIB_S * 1.2:
            break
        time.sleep(20)
        calib_before = _calibration_s()

    spark = get_spark("changegen_spark-bench")
    queries = all_queries()

    # r14 (r13 verdict #3): the multi-core canary no longer runs BEFORE
    # the sweep.  The r13 placement saturated all 32 cores for several
    # seconds immediately before q01, and on a box with post-load
    # throttling the r13 driver's six worst "regressions" were exactly
    # the first six sweep positions — five of them code-untouched.  Both
    # samples now happen after the sweep (and after the over-budget
    # rechecks, which the r13 post-sweep sample was also contaminating).

    # Steady-state methodology (r3: n=3 warm runs, min reported): run each
    # query once to absorb one-time JVM class-load + whole-stage-codegen
    # compilation + page-cache fill, then time three further runs and keep
    # the minimum — that is the repeated-execution throughput a long-lived
    # cluster delivers, and min-of-3 removes the GC/compile jitter that made
    # sub-2 s queries drift 1.1-1.5× between single-sample rounds (r2
    # verdict).  cold_total is also reported.
    WARM_RUNS = 3
    # r7: global JVM warmup — the first few headline queries' "warm" runs
    # used to execute while the C2 compiler was still busy (~first 20 s of
    # the JVM), so WHICH early query blew its budget varied run to run
    # (q01 3.16 s one run, q03 2.60 s the next, both ~0.8-1.6 s once the
    # JVM is hot).  One untimed pass over the first three queries moves
    # that compile work before any timed run.
    for name in HEADLINE[:3]:
        queries[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.time() - t0, 3)
        best = float("inf")
        for _ in range(WARM_RUNS):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    calib_after = _calibration_s()
    # Ambient-load multiplier for THIS run; queries_norm are the timings a
    # judge should compare across rounds (raw timings retained alongside).
    calib_ratio = max(
        1.0, round(((calib_before + calib_after) / 2) / IDLE_CALIB_S, 3)
    )
    timings_norm = {n: round(t / calib_ratio, 3) for n, t in timings.items()}

    # over_budget is evaluated on NORMALIZED time so a loaded driver
    # machine cannot manufacture spurious entries; each entry carries the
    # raw value and the ratio so nothing is hidden.
    over_budget = {
        n: {
            "sec": timings[n],
            "sec_norm": timings_norm[n],
            "budget": BUDGETS[n],
            "calib_ratio": calib_ratio,
        }
        for n in HEADLINE
        if n in BUDGETS and timings_norm[n] > BUDGETS[n]
    }
    # r7 verdict #5: the committed artifact must adjudicate its own
    # transients.  r7 shipped q03 at 1.774 s (over its 1.6 budget); the
    # judge's idle re-measure read 1.121 s — a one-sample trip from
    # intermittent background load.  So every over-budget entry is
    # re-measured AFTER the sweep (fresh min-of-3 with its own
    # calibration sample); both readings land in the artifact, and
    # ``confirmed`` records whether the exceedance reproduced.
    for n, entry in over_budget.items():
        # r8 advice: sample calibration BEFORE AND AFTER the 3 recheck
        # runs and average, matching the sweep's calib_ratio methodology —
        # a lone pre-run sample taken during a transient load spike would
        # deflate sec_norm and flip `confirmed` to false.
        recal_before = _calibration_s()
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            queries[n](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        recal = max(
            1.0,
            round(((recal_before + _calibration_s()) / 2) / IDLE_CALIB_S, 3),
        )
        renorm = round(best / recal, 3)
        entry["recheck"] = {
            "sec": round(best, 3),
            "sec_norm": renorm,
            "calib_ratio": recal,
            "confirmed": renorm > BUDGETS[n],
        }
    # r14: both multi-core canary samples run here — after the sweep AND
    # after the rechecks — so the 32-core Arrow saturation can no longer
    # throttle any timed query (r13 verdict #3).  Two samples ~a minute
    # of queries apart still bracket ambient drift at the tail.
    calib_par_1 = _parallel_calibration_s(spark)
    calib_par_2 = _parallel_calibration_s(spark)
    calib_par_ratio = max(
        1.0,
        round(((calib_par_1 + calib_par_2) / 2) / IDLE_CALIB_PAR_S, 3),
    )
    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    # sf1 section (r3 verdict #8): run the scale-sensitive queries at a
    # 10× replication of sf0.1 every round, so scale regressions surface
    # in BENCH deltas instead of one-off SCALE.md anecdotes.  Growth is
    # warm-min(sf1)/warm-min(sf0.1) — ~1-3× means fixed overhead still
    # amortizing; ~10× means the query went data-bound (watch for >10×:
    # superlinear shuffle/skew).  Skippable via SPARK_GRAFT_SKIP_SF1=1;
    # only runs when the main pass measured the sf0.1 baseline.
    sf1 = None
    if sf_val == 0.1 and not os.environ.get("SPARK_GRAFT_SKIP_SF1"):
        from changegen_spark.sources.scaleup import build_scaled_dir

        sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/changegen_spark_sf1")
        t0 = time.time()
        build_scaled_dir(spark, SF_DIR, sf1_dir, copies=10)
        build_s = round(time.time() - t0, 1)
        sf1_t: dict[str, float] = {}
        for name in SF1_QUERIES:
            fn = queries[name]
            fn(spark, sf1_dir).write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(SF1_WARM_RUNS):
                t0 = time.time()
                fn(spark, sf1_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            sf1_t[name] = round(best, 3)
        sf1 = {
            "queries": sf1_t,
            "total": round(sum(sf1_t.values()), 3),
            "build_s": build_s,
            "growth_vs_sf0_1": {
                n: round(sf1_t[n] / timings[n], 2)
                for n in SF1_QUERIES
                if timings.get(n)
            },
            "warm_runs": SF1_WARM_RUNS,
        }

    # media ladder (r5 verdict #4): the banded image-dedup join at
    # O(10^3) and O(10^4) synthesized assets with planted near-dups
    # (sources/scaleup.build_media_assets — exact controlled Hamming).
    # Records wall growth for 10× assets AND candidate volume per band
    # width: 8×8-bit banding is pigeonhole-complete at ham≤7 but costs
    # ~n²/64 candidates on uncorrelated hashes, 4×16-bit is complete at
    # ham≤3 for ~n²/16384 — the dial SCALE.md documents.
    media = None
    if sf_val == 0.1 and not os.environ.get("SPARK_GRAFT_SKIP_SF1"):
        from changegen_spark.multimodal.assets import dhash_images
        from changegen_spark.queries.media import (
            banded_candidates,
            dup_pairs_from_dhash,
            dup_pairs_mih,
            mih_candidates,
        )
        from changegen_spark.sources.scaleup import build_media_assets

        media_dir = os.environ.get(
            "SPARK_GRAFT_MEDIA_DIR", "/tmp/changegen_spark_media"
        )
        media = {"n": {}, "build_s": 0.0}
        for n_assets in (2_000, 20_000):
            t0 = time.time()
            path = build_media_assets(spark, media_dir, n_assets=n_assets)
            media["build_s"] += time.time() - t0
            assets = spark.read.parquet(path)
            stats = {}
            best = float("inf")
            for i in range(1 + SF1_WARM_RUNS):  # first run is warmup
                t0 = time.time()
                d = dhash_images(assets).filter("ok").select("asset_id", "dhash")
                stats["n_pairs"] = dup_pairs_from_dhash(d, ham=7, band_hex=2).count()
                if i > 0:
                    best = min(best, time.time() - t0)
            stats["wall_s"] = round(best, 3)
            d = dhash_images(assets).filter("ok").select("asset_id", "dhash")
            stats["cand_8bit"] = banded_candidates(d, band_hex=2).count()
            stats["cand_16bit"] = banded_candidates(d, band_hex=4).count()
            # r7 scale path: multi-index Hamming search (complete at ≤3) —
            # candidate volume should grow ~linearly with assets because
            # the random-collision term is n²·66/2^32
            best_mih = float("inf")
            for i in range(1 + SF1_WARM_RUNS):
                t0 = time.time()
                d2 = dhash_images(assets).filter("ok").select("asset_id", "dhash")
                stats["n_pairs_mih"] = dup_pairs_mih(d2).count()
                if i > 0:
                    best_mih = min(best_mih, time.time() - t0)
            stats["wall_mih_s"] = round(best_mih, 3)
            stats["cand_mih"] = mih_candidates(d).count()
            media["n"][str(n_assets)] = stats
        media["build_s"] = round(media["build_s"], 1)
        small, big = media["n"]["2000"], media["n"]["20000"]
        media["growth_wall_10x"] = round(big["wall_s"] / small["wall_s"], 2)
        media["cand_growth_8bit_10x"] = round(
            big["cand_8bit"] / max(small["cand_8bit"], 1), 1
        )
        media["cand_growth_16bit_10x"] = round(
            big["cand_16bit"] / max(small["cand_16bit"], 1), 1
        )
        media["cand_growth_mih_10x"] = round(
            big["cand_mih"] / max(small["cand_mih"], 1), 1
        )
        media["growth_wall_mih_10x"] = round(
            big["wall_mih_s"] / small["wall_mih_s"], 2
        )

    # ER ladder (r6): the blocked Levenshtein join over synthesized
    # people records at 10k and 100k entities, with BOTH blocking
    # schemes — phonetic(last)+initial alone vs + city.  The single-key
    # scheme's pair mass is quadratic in name frequency (its entropy
    # stops scaling with n); the two-field scheme stays ~linear.  The
    # ladder records both so the scale lesson is a measured table.
    er = None
    if sf_val == 0.1 and not os.environ.get("SPARK_GRAFT_SKIP_SF1"):
        from pyspark.sql import functions as _F

        from changegen_spark.queries.er import (
            _inc_refined,
            bcubed_from_pairs,
            er_pairs_for,
            er_pairs_sn,
            er_pairs_sn_multi,
            er_pairs_sn_suffix,
            incremental_assign,
            incremental_assign_margin,
        )
        from changegen_spark.sources.scaleup import build_er_records

        er_dir = os.environ.get("SPARK_GRAFT_ER_DIR", "/tmp/changegen_spark_er")
        # r8 verdict #3: the regime rule's headline numbers must be
        # reproducible from the committed artifact, so the ladder now has
        # the 1M rung — with a documented budget: at 1M, one timed run
        # after the warm run (not min-of-3), name_only is skipped (its
        # refine wall is 364 s — the measured one-off in SCALE.md; paying
        # it per round buys nothing), and CC clusters are skipped (14.9 s
        # one-off, same reasoning).  Recall rides along at every rung:
        # each scheme's pairs are truth-joined against the planted
        # entity_id so quality regime changes (the SN density collapse)
        # are in the artifact, not prose.
        er = {
            "n": {},
            "budget_note": (
                "1M rung: 1 timed run, name_only skipped (364 s one-off "
                "in SCALE.md); clusters at 1M run over the production "
                "sn_suffix_refine pairs (~190k edges), not with_city "
                "(whose 2.9M-edge CC is the 14.9 s one-off) — scheme "
                "field names the edge set per rung"
            ),
        }
        for n_ent in (10_000, 100_000, 1_000_000):
            big = n_ent >= 1_000_000
            runs = 1 if big else SF1_WARM_RUNS
            path = build_er_records(spark, er_dir, n_entities=n_ent)
            ppl = spark.read.parquet(path)
            ta = ppl.select(
                _F.col("rec_id").alias("rec_a"), _F.col("entity_id").alias("ea")
            )
            tb = ppl.select(
                _F.col("rec_id").alias("rec_b"), _F.col("entity_id").alias("eb")
            )
            truth = (
                ta.join(tb, [ta.ea == tb.eb, ta.rec_a < tb.rec_b])
                .select("rec_a", "rec_b")
                .localCheckpoint()
            )
            n_true = truth.count()
            row = {"n_true_pairs": n_true}

            def timed(build):
                # r10 postmortem: time a FRESH frame per run.  A
                # DataFrame whose plan embeds a localCheckpoint fence
                # keeps the materialized RDD across actions, so timing
                # the same object repeatedly re-times only the stages
                # ABOVE the fence — fenced SN schemes under-reported
                # ~1.9× (sn_multi_refine at 1M: 2.3 s same-frame in
                # the r9 artifact vs 4.4 s fresh-frame in the r10
                # artifact; unfenced with_city unchanged).  The warm
                # pass stays: it absorbs JVM codegen compile.  Probe
                # scripts must use get_spark(), not a bare session —
                # the broadcast-threshold difference alone changes the
                # rank-join physical plan ~3× (SCALE.md postmortem).
                build().count()  # warm
                best = float("inf")
                n_pairs = 0
                last = None
                for _ in range(runs):
                    last = build()
                    t0 = time.time()
                    n_pairs = last.count()
                    best = min(best, time.time() - t0)
                # tp is CORRECTNESS, not timing — reusing the last timed
                # frame (fences already materialized) is free and fine
                tp = last.select("rec_a", "rec_b").join(
                    truth, ["rec_a", "rec_b"]
                ).count()
                return {
                    "pairs": n_pairs,
                    "wall_s": round(best, 3),
                    "tp": tp,
                    "precision_pct": round(100 * tp / max(n_pairs, 1), 1),
                    "recall_pct": round(100 * tp / max(n_true, 1), 1),
                }

            if not big:
                row["name_only"] = timed(lambda: er_pairs_for(ppl, ()))
            row["with_city"] = timed(lambda: er_pairs_for(ppl, ("city",)))
            # r8: sorted-neighborhood — the quadratic-proof scheme whose
            # candidate budget is n·(window-1) at ANY key distribution
            row["sorted_neighborhood"] = timed(lambda: er_pairs_sn(ppl))
            # ...city check in the REFINE stage (cuts false matches,
            # cannot reintroduce quadratic candidates)
            row["sn_city_refine"] = timed(
                lambda: er_pairs_sn(ppl, refine_cols=("city",))
            )
            # r9: the production SN point — two passes for recall, city
            # refine for precision (SCALE.md's four-scheme table)
            row["sn_multi_refine"] = timed(
                lambda: er_pairs_sn_multi(ppl, refine_cols=("city",))
            )
            # r10 (r9 verdict #7): the taxonomy-driven third pass — the
            # suffix sort order reaches the block-key-broken class that
            # dominates the 1M misses (SCALE.md taxonomy table)
            row["sn_suffix_refine"] = timed(
                lambda: er_pairs_sn_suffix(ppl, refine_cols=("city",))
            )
            # r10: the batch-append regime — assign the planted arrivals
            # against the base WITHOUT re-clustering.  Fresh frame per
            # timed run (same-frame postmortem); accuracy rides along so
            # the key-collision cost of density is in the artifact.
            base_side = ppl.filter(_F.col("rec_id") < n_ent)
            arr_side = ppl.filter(_F.col("rec_id") >= n_ent)
            # r11 postmortem: the r10 rung timed .count() on the final
            # LEFT JOIN against a grouped-by key — Catalyst ELIMINATES
            # that join for a count (grouped keys are provably unique),
            # so the 0.32 s r10 artifact number never executed the
            # candidate join at all.  A noop sink consumes every column
            # and cannot be join-eliminated.
            def _inc_noop():
                incremental_assign(arr_side, base_side).write.format(
                    "noop"
                ).mode("overwrite").save()

            _inc_noop()  # warm
            best_inc = float("inf")
            for _ in range(runs):
                t0 = time.time()
                _inc_noop()
                best_inc = min(best_inc, time.time() - t0)
            n_arr = arr_side.count()
            inc = incremental_assign(arr_side, base_side)
            j = inc.join(
                arr_side.select("rec_id", "entity_id"), "rec_id"
            )
            row["incremental"] = {
                "arrivals": n_arr,
                "wall_s": round(best_inc, 3),
                "correct": j.filter(
                    "matched_entity = entity_id"
                ).count(),
                "wrong": j.filter(
                    "matched_entity <> -1 AND matched_entity <> entity_id"
                ).count(),
                "unmatched": j.filter("matched_entity = -1").count(),
            }
            # r11 (r10 verdict #1): margin-based abstention — route
            # best-vs-runner-up near-ties to ambiguous (−2) instead of
            # a blind merge.  The per-margin columns ARE the tie
            # measurement the verdict asked for: wrong@margin1 vs
            # wrong@margin0 is exactly the wrong merges whose best and
            # runner-up were tied.  Timed at margin 1 (the shipped
            # operating point); margin 2 accuracy rides along untimed.
            best_m1 = float("inf")
            for _ in range(runs):
                t0 = time.time()
                incremental_assign_margin(
                    arr_side, base_side, margin=1
                ).write.format("noop").mode("overwrite").save()
                best_m1 = min(best_m1, time.time() - t0)
            for mg in (1, 2):
                jm = incremental_assign_margin(
                    arr_side, base_side, margin=mg
                ).join(arr_side.select("rec_id", "entity_id"), "rec_id")
                cell = {
                    "correct": jm.filter(
                        "matched_entity = entity_id"
                    ).count(),
                    "wrong": jm.filter(
                        "matched_entity >= 0 AND matched_entity <> entity_id"
                    ).count(),
                    "ambiguous": jm.filter("matched_entity = -2").count(),
                    "unmatched": jm.filter("matched_entity = -1").count(),
                }
                if mg == 1:
                    cell["wall_s"] = round(best_m1, 3)
                    # taxonomy of the wrongs that SURVIVE margin-1
                    # abstention (margin can only catch ties): either
                    # the true base record never became a candidate
                    # (key/city miss) or it did but a stranger is
                    # strictly closer in edit distance
                    surv = jm.filter(
                        "matched_entity >= 0 AND matched_entity <> entity_id"
                    ).select("rec_id", "entity_id", "lev")
                    truecand = _inc_refined(arr_side, base_side).select(
                        _F.col("a_id").alias("rec_id"),
                        _F.col("b_id").alias("entity_id"),
                        _F.col("lev").alias("true_lev"),
                    )
                    sj = surv.join(
                        truecand, ["rec_id", "entity_id"], "left"
                    )
                    cell["wrong_true_not_candidate"] = sj.filter(
                        "true_lev IS NULL"
                    ).count()
                    cell["wrong_stranger_strictly_closer"] = sj.filter(
                        "true_lev IS NOT NULL AND true_lev > lev"
                    ).count()
                row["incremental"][f"margin{mg}"] = cell
            # r12 (r11 verdict #1): drain the pool — re-probe the
            # margin-1 abstentions against the UPDATED golden names
            # (confident merges flip survivor modes, breaking first-pass
            # ties), so every arrival reaches a terminal disposition.
            # r13 (r12 verdict #1): resolution precision is measured PER
            # ACCEPTANCE POLICY as first-class columns — the r12 'gap'
            # rule resolved 21 parked arrivals at this table's 1M rung
            # with only 10 correct (11 wrong merges where the first pass
            # shipped 0); the shipped default ('toward': the winner's
            # survivor name must move strictly closer than the parked
            # lev) must keep wrong-via-drain at 0.  One re-probe
            # execution feeds all four policies (drain_policy_outcomes).
            from changegen_spark.queries.er import (
                DRAIN_POLICY,
                drain_policy_outcomes,
                resolve_ambiguous,
            )

            am1 = (
                incremental_assign_margin(arr_side, base_side, margin=1)
                .select("rec_id", "matched_entity", "lev")
                .localCheckpoint(eager=True)
            )

            def _resolve_noop():
                resolve_ambiguous(
                    arr_side, base_side, margin=1, assigned=am1
                ).write.format("noop").mode("overwrite").save()

            _resolve_noop()  # warm (codegen compile dominates the cold run)
            t0 = time.time()
            _resolve_noop()
            resolve_wall = round(time.time() - t0, 3)
            dj = (
                drain_policy_outcomes(
                    arr_side, base_side, margin=1, assigned=am1
                )
                .join(arr_side.select("rec_id", "entity_id"), "rec_id")
                .localCheckpoint(eager=True)
            )
            pol_cells = {}
            for prow in (
                dj.groupBy("policy")
                .agg(
                    _F.count(
                        _F.when(_F.col("matched_entity") >= 0, 1)
                    ).alias("resolved"),
                    _F.count(
                        _F.when(
                            (_F.col("matched_entity") >= 0)
                            & (
                                _F.col("matched_entity")
                                == _F.col("entity_id")
                            ),
                            1,
                        )
                    ).alias("resolved_correct"),
                    _F.count(
                        _F.when(_F.col("matched_entity") == -1, 1)
                    ).alias("resolve_new"),
                    _F.count(
                        _F.when(_F.col("matched_entity") == -2, 1)
                    ).alias("still_ambiguous"),
                )
                .collect()
            ):
                pol_cells[prow.policy] = {
                    "resolved": prow.resolved,
                    "resolved_correct": prow.resolved_correct,
                    "resolve_new": prow.resolve_new,
                    "still_ambiguous": prow.still_ambiguous,
                }
            row["incremental"]["margin1"].update(pol_cells[DRAIN_POLICY])
            row["incremental"]["margin1"].update(
                {
                    "resolve_wall_s": resolve_wall,
                    "drain_policy": DRAIN_POLICY,
                    "drain_policies": pol_cells,
                }
            )
            if big:
                # r10 (r9 verdict #6): the pairs→CC→entity stage at the
                # density-regime rung, over the production composition's
                # edge set; single timed run (budget_note)
                from changegen_spark.functions.clustering import (
                    connected_components,
                )

                cpairs = er_pairs_sn_suffix(ppl, refine_cols=("city",))
                st = {}
                t0 = time.time()
                labels = connected_components(
                    cpairs, src="rec_a", dst="rec_b", stats=st
                )
                n_rec = labels.count()
                row["clusters"] = {
                    "scheme": "sn_suffix_refine",
                    "records": n_rec,
                    "cc_rounds": st.get("rounds"),
                    "wall_s": round(time.time() - t0, 3),
                }
            if not big:
                # r7 (r6 verdict #8): the cluster stage — checkpointed
                # connected components over the with_city pairs; rounds
                # track component DIAMETER, the flat-for-10× number
                from changegen_spark.functions.clustering import (
                    connected_components,
                )

                cpairs = er_pairs_for(ppl, ("city",))
                connected_components(cpairs, src="rec_a", dst="rec_b").count()
                st = {}
                t0 = time.time()
                labels = connected_components(
                    cpairs, src="rec_a", dst="rec_b", stats=st
                )
                n_rec = labels.count()
                row["clusters"] = {
                    "scheme": "with_city",
                    "records": n_rec,
                    "cc_rounds": st.get("rounds"),
                    "wall_s": round(time.time() - t0, 3),
                }
            # r12: RETRACTION at scale — the touched-entities-only
            # contract MEASURED, not asserted: delete the same absolute
            # batch (1,000 records) at every rung and time the
            # retraction CORE (rehome_touched: touched members → subset
            # pair regen → subgraph CC → re-head).  If the contract
            # holds, the wall tracks the TOUCHED size (≈ constant across
            # rungs), not the base size; the full-membership snapshot
            # write the fixture-scale stream does is passthrough, not
            # work, and is excluded by construction.
            from changegen_spark.streaming.er import rehome_touched

            membership = (
                ppl.select("rec_id")
                .join(
                    labels.withColumnRenamed("node", "rec_id"),
                    "rec_id",
                    "left",
                )
                .select(
                    "rec_id",
                    _F.coalesce("comp", _F.col("rec_id")).alias("entity"),
                )
                .localCheckpoint(eager=True)
            )
            r_dels = ppl.filter(_F.col("rec_id") < 1000).select("rec_id")
            # r13 (r12 advice): rehome under the SAME pair rule that
            # built the membership above (sn_suffix_refine at big rungs,
            # with_city otherwise) — otherwise the timed subgraph
            # belongs to a pipeline nobody maintains
            if big:
                rung_pairs_fn = lambda p: er_pairs_sn_suffix(  # noqa: E731
                    p, refine_cols=("city",)
                )
            else:
                rung_pairs_fn = lambda p: er_pairs_for(p, ("city",))  # noqa: E731

            def _retract_noop():
                rehome_touched(
                    membership, r_dels, ppl, pairs_fn=rung_pairs_fn
                ).write.format("noop").mode("overwrite").save()

            _retract_noop()  # warm
            t0 = time.time()
            _retract_noop()
            retract_wall = round(time.time() - t0, 3)
            touched_n = (
                membership.join(r_dels, "rec_id")
                .select("entity")
                .distinct()
                .count()
            )
            row["retract"] = {
                "n_deletes": 1000,
                "touched_entities": touched_n,
                "wall_s": retract_wall,
            }
            # r11 (r10 verdict #2): entity-level B³ per scheme — pair
            # recall understates a transitive scheme (cluster-recovered
            # pairs) and pair precision understates chain cost; B³
            # averages per RECORD, the number survivorship actually
            # inherits.  The two production candidates of the regime
            # rule are graded at every rung; untimed (CC rides inside).
            row["bcubed"] = {}
            for scheme, pairs_fn in (
                ("with_city", lambda: er_pairs_for(ppl, ("city",))),
                (
                    "sn_suffix_refine",
                    lambda: er_pairs_sn_suffix(ppl, refine_cols=("city",)),
                ),
            ):
                n_rec, n_pred, n_true, p_e6, r_e6, f1_e6 = bcubed_from_pairs(
                    ppl, pairs_fn()
                )
                row["bcubed"][scheme] = {
                    "b3_precision_pct": round(p_e6 / 1e4, 2),
                    "b3_recall_pct": round(r_e6 / 1e4, 2),
                    "b3_f1_pct": round(f1_e6 / 1e4, 2),
                    "n_pred_clusters": n_pred,
                }
            er["n"][str(n_ent)] = row
        for scheme in ("name_only", "with_city"):
            er[f"growth_wall_10x_{scheme}"] = round(
                er["n"]["100000"][scheme]["wall_s"]
                / er["n"]["10000"][scheme]["wall_s"],
                2,
            )
        # top-decade growth (100k → 1M) for the schemes measured there
        for scheme in (
            "with_city",
            "sorted_neighborhood",
            "sn_multi_refine",
            "sn_suffix_refine",
            "incremental",
        ):
            er[f"growth_wall_100k_1m_{scheme}"] = round(
                er["n"]["1000000"][scheme]["wall_s"]
                / er["n"]["100000"][scheme]["wall_s"],
                2,
            )
        er["growth_wall_10x_clusters"] = round(
            er["n"]["100000"]["clusters"]["wall_s"]
            / er["n"]["10000"]["clusters"]["wall_s"],
            2,
        )
        # the retraction contract in one number: same 1,000-record
        # delete batch at 10× the base should cost ~1× the wall
        er["growth_wall_100k_1m_retract"] = round(
            er["n"]["1000000"]["retract"]["wall_s"]
            / er["n"]["100000"]["retract"]["wall_s"],
            2,
        )
        # r12 (r11 verdict #2): the ADVERSARIAL rung — the standard
        # generator's wrong merges are all exact ties (margin 1 removes
        # every one; both taxonomy columns were zero at every rung), so
        # the strictly-closer-impostor path was unexercised.
        # build_er_adversarial plants twin entities one vowel-edit apart
        # and arrivals one edit from the IMPOSTOR: plain AND margin-1
        # merge them wrongly (gap 1, taxonomy goes non-zero by
        # construction); margin 2 is the measured mitigation (the
        # impostor merges become abstentions).  Accuracy-only cells —
        # the timing story is the main rungs'.
        from changegen_spark.queries.er import _inc_refined as _ir
        from changegen_spark.sources.scaleup import build_er_adversarial

        a_n, a_adv = 100_000, 2_500
        apath = build_er_adversarial(
            spark, er_dir, n_entities=a_n, n_adv=a_adv
        )
        appl = spark.read.parquet(apath)
        abase = appl.filter(_F.col("rec_id") < a_n)
        aarr = appl.filter(_F.col("rec_id") >= a_n)
        adv_lo = a_n + int(a_n * 0.15)  # adversarial arrivals start here
        arow = {"n_entities": a_n, "n_adversarial": a_adv}
        for mg in (0, 1, 2):
            assign = (
                incremental_assign(aarr, abase)
                if mg == 0
                else incremental_assign_margin(aarr, abase, margin=mg)
            )
            jm = assign.join(
                aarr.select("rec_id", "entity_id"), "rec_id"
            ).localCheckpoint(eager=True)
            cell = {
                "correct": jm.filter("matched_entity = entity_id").count(),
                "wrong": jm.filter(
                    "matched_entity >= 0 AND matched_entity <> entity_id"
                ).count(),
                "ambiguous": jm.filter("matched_entity = -2").count(),
                "unmatched": jm.filter("matched_entity = -1").count(),
                "adv_wrong": jm.filter(
                    f"rec_id >= {adv_lo} AND matched_entity >= 0 "
                    "AND matched_entity <> entity_id"
                ).count(),
                "adv_ambiguous": jm.filter(
                    f"rec_id >= {adv_lo} AND matched_entity = -2"
                ).count(),
            }
            if mg == 1:
                surv = jm.filter(
                    "matched_entity >= 0 AND matched_entity <> entity_id"
                ).select("rec_id", "entity_id", "lev")
                truecand = _ir(aarr, abase).select(
                    _F.col("a_id").alias("rec_id"),
                    _F.col("b_id").alias("entity_id"),
                    _F.col("lev").alias("true_lev"),
                )
                sj = surv.join(truecand, ["rec_id", "entity_id"], "left")
                cell["wrong_true_not_candidate"] = sj.filter(
                    "true_lev IS NULL"
                ).count()
                cell["wrong_stranger_strictly_closer"] = sj.filter(
                    "true_lev IS NOT NULL AND true_lev > lev"
                ).count()
            arow[f"margin{mg}"] = cell
            if mg == 2:
                # r13 (r12 verdict #2): drain x adversarial — margin 2
                # parks ~3k arrivals here, 2,500 of them PLANTED
                # impostor ties; measure whether the drain leaks them
                # back in as `resolved` under each policy.  The shipped
                # default must keep adversarial wrongs at 0 post-drain.
                adp = (
                    drain_policy_outcomes(
                        aarr,
                        abase,
                        margin=mg,
                        assigned=assign.select(
                            "rec_id", "matched_entity", "lev"
                        ).localCheckpoint(eager=True),
                    )
                    .join(aarr.select("rec_id", "entity_id"), "rec_id")
                    .localCheckpoint(eager=True)
                )
                dcells = {}
                for prow in (
                    adp.groupBy("policy")
                    .agg(
                        _F.count(
                            _F.when(_F.col("matched_entity") >= 0, 1)
                        ).alias("resolved"),
                        _F.count(
                            _F.when(
                                (_F.col("matched_entity") >= 0)
                                & (
                                    _F.col("matched_entity")
                                    == _F.col("entity_id")
                                ),
                                1,
                            )
                        ).alias("resolved_correct"),
                        _F.count(
                            _F.when(
                                (_F.col("rec_id") >= adv_lo)
                                & (_F.col("matched_entity") >= 0)
                                & (
                                    _F.col("matched_entity")
                                    != _F.col("entity_id")
                                ),
                                1,
                            )
                        ).alias("adv_resolved_wrong"),
                        _F.count(
                            _F.when(_F.col("matched_entity") == -1, 1)
                        ).alias("resolve_new"),
                        _F.count(
                            _F.when(_F.col("matched_entity") == -2, 1)
                        ).alias("still_ambiguous"),
                    )
                    .collect()
                ):
                    dcells[prow.policy] = {
                        "resolved": prow.resolved,
                        "resolved_correct": prow.resolved_correct,
                        "adv_resolved_wrong": prow.adv_resolved_wrong,
                        "resolve_new": prow.resolve_new,
                        "still_ambiguous": prow.still_ambiguous,
                    }
                cell["drain_policy"] = DRAIN_POLICY
                cell["drain_policies"] = dcells
        er["adversarial_100k"] = arow
        # r12 (r11 verdict #3): deep-component CC at bench scale — a
        # 100k-node CHAIN (the versioned-page near-dup model: each
        # revision near-dups its neighbors only), diameter 10^5.  The
        # one-hop propagation needed diameter rounds and silently
        # returned split clusters at max_iter (the r11 hazard);
        # path-halving must converge in ~6 + log2(10^5) ≈ 23 rounds.
        # Single run; rounds + wall + component count in the artifact.
        from changegen_spark.functions.clustering import (
            connected_components as _cc,
        )

        chain_n = 100_000
        chain_edges = spark.range(chain_n - 1).select(
            _F.col("id").alias("id_a"), (_F.col("id") + 1).alias("id_b")
        )
        st = {}
        t0 = time.time()
        n_comp = (
            _cc(chain_edges, max_iter=40, stats=st)
            .select("comp")
            .distinct()
            .count()
        )
        er["deep_cc"] = {
            "chain_nodes": chain_n,
            "rounds": st.get("rounds"),
            "components": n_comp,
            "wall_s": round(time.time() - t0, 3),
            "note": (
                "one-hop min-label needed 10^5 rounds here and returned "
                "SPLIT clusters at any real budget; adaptive path-halving "
                "(clustering.py) converges in 6 one-hop + O(log d) rounds"
            ),
        }

        # r13: SUSTAINED lifecycle throughput — the composed stream
        # (retraction + assignment + pool drain + golden maintenance
        # over ONE maintained store, streaming/er.py lifecycle_stream)
        # has only ever run at fixture scale; this rung drives it at
        # the 100k corpus over 8 interleaved micro-batches (6 arrival
        # batches x ~2.5k + 2 keyed delete batches x ~500) and records
        # what a maintained pipeline operator would watch: per-batch
        # wall (from the batch-keyed snapshot mtimes — zero
        # instrumentation in the stream itself), the parked-pool
        # trajectory (does it drain or accrete under the default
        # 'toward' policy?), terminal-disposition counts, and
        # end-to-end merge PURITY against the planted truth (an
        # arrival is wrong iff its final entity mixes truths).  A
        # second short run with pool_ttl_batches=3 measures the
        # bounded-state dial: aged entries escalate to review instead
        # of riding the carried pool forever.
        import glob as _glob
        import shutil as _sh

        from changegen_spark.streaming.er import (
            lifecycle_stream,
            stage_lifecycle_frames,
        )

        lc_path = build_er_records(spark, er_dir, n_entities=100_000)
        lc_ppl = spark.read.parquet(lc_path)
        lc_base = lc_ppl.filter("rec_id < 100000").select(
            "rec_id", "name", "city"
        )
        n_arr_batches = 6
        arr_frames = [
            lc_ppl.filter("rec_id >= 100000")
            .filter(_F.pmod("rec_id", _F.lit(n_arr_batches)) == i)
            .select(_F.lit("arrive").alias("kind"), "rec_id", "name", "city")
            for i in range(n_arr_batches)
        ]
        del_frames = [
            lc_base.filter(f"rec_id % {mod} = {res}").select(
                _F.lit("delete").alias("kind"),
                "rec_id",
                _F.lit(None).cast("string").alias("name"),
                _F.lit(None).cast("string").alias("city"),
            )
            for mod, res in ((199, 3), (211, 5))
        ]
        # A A D A A D A A — deletes land mid-sequence so later
        # assignment and drain probe a post-retraction golden table
        lc_frames = [
            arr_frames[0],
            arr_frames[1],
            del_frames[0],
            arr_frames[2],
            arr_frames[3],
            del_frames[1],
            arr_frames[4],
            arr_frames[5],
        ]
        lc_stage = os.path.join(er_dir, "lifecycle_events_100k")
        _sh.rmtree(lc_stage, ignore_errors=True)
        stage_lifecycle_frames(
            spark, lc_stage, lc_frames, os.stat(lc_path).st_mtime + 10
        )

        def _lifecycle_run(ttl, tombstone_window=None):
            lc_state = os.path.join(er_dir, "lifecycle_state_100k")
            _sh.rmtree(lc_state, ignore_errors=True)
            t0 = time.time()
            q = lifecycle_stream(
                spark,
                lc_state,
                lc_stage,
                base=lc_base,
                seed_key=lc_path,
                pool_ttl_batches=ttl,
                tombstone_window=tombstone_window,
            )
            q.awaitTermination(1800)
            wall = round(time.time() - t0, 3)
            batches = sorted(
                _glob.glob(lc_state + "/records/batch=*"),
                key=lambda p: int(p.rsplit("=", 1)[1]),
            )
            mts = [os.path.getmtime(p) for p in batches]
            per_batch = [
                round(b - a, 3) for a, b in zip(mts, mts[1:])
            ]
            pool_traj = []
            for p in sorted(
                _glob.glob(lc_state + "/pool/batch=*"),
                key=lambda s: int(s.rsplit("=", 1)[1]),
            ):
                spark.catalog.refreshByPath(p)
                pool_traj.append(spark.read.parquet(p).count())
            statuses = {}
            for p in _glob.glob(lc_state + "/drained/batch=*"):
                spark.catalog.refreshByPath(p)
                for r in (
                    spark.read.parquet(p).groupBy("status").count().collect()
                ):
                    statuses[r.status] = statuses.get(r.status, 0) + r["count"]
            spark.catalog.refreshByPath(batches[-1])
            fin = spark.read.parquet(batches[-1])
            truthed = fin.join(
                lc_ppl.select("rec_id", "entity_id"), "rec_id"
            ).select(
                "rec_id",
                "entity",
                _F.when(_F.col("rec_id") < 100_000, _F.col("rec_id"))
                .otherwise(_F.col("entity_id"))
                .alias("truth"),
            )
            impure = (
                truthed.groupBy("entity")
                .agg(_F.countDistinct("truth").alias("nt"))
                .filter("nt > 1")
            )
            wrong = (
                truthed.join(impure, "entity")
                .filter("rec_id >= 100000")
                .count()
            )
            merged = fin.filter(
                "rec_id >= 100000 AND entity < 100000"
            ).count()
            return {
                "wall_s": wall,
                "per_batch_s": per_batch,
                "pool_after_each_batch": pool_traj,
                "drained_statuses": statuses,
                "arrivals_merged_into_base": merged,
                "wrong_in_impure_entities": wrong,
                "pool_ttl_batches": ttl,
                "tombstone_window": tombstone_window,
            }

        _dial_keys = (
            "wall_s",
            "pool_after_each_batch",
            "drained_statuses",
            "arrivals_merged_into_base",
            "wrong_in_impure_entities",
            "pool_ttl_batches",
            "tombstone_window",
        )
        lrow = _lifecycle_run(None)
        lrow["ttl_run"] = {
            k: v for k, v in _lifecycle_run(3).items() if k in _dial_keys
        }
        # retraction-shadow guard: the purity audit's one wrong merge
        # (arrival after its true entity's retraction, near-twin
        # surviving) must go to 0, at the cost of the shadowed parks
        lrow["tombstone_run"] = {
            k: v
            for k, v in _lifecycle_run(3, tombstone_window=4).items()
            if k in _dial_keys
        }
        er["lifecycle_100k"] = lrow

    # web ladder (r6): URL canonicalization + dedup throughput at 100k
    # and 1M synthesized crawl rows (sources/scaleup.build_web_urls —
    # expression-only generation, every variant canonicalizes to its
    # base).  An exact correctness check rides along: n_pages groups of
    # exactly 2 spellings, 1 doc each — bad_groups must be 0.  The whole
    # stage is map work + one hash shuffle, so growth should track the
    # shuffle, not the canonicalizer.
    web = None
    if sf_val == 0.1 and not os.environ.get("SPARK_GRAFT_SKIP_SF1"):
        from pyspark.sql import functions as _F

        from changegen_spark.queries.web import with_canonical
        from changegen_spark.sources.scaleup import build_web_urls

        web_dir = os.environ.get(
            "SPARK_GRAFT_WEB_DIR", "/tmp/changegen_spark_web"
        )
        web = {"n": {}}
        for n_urls in (100_000, 1_000_000):
            path = build_web_urls(spark, web_dir, n_urls)

            def web_dedup():
                # fresh frame per run (r10 same-frame postmortem)
                return (
                    with_canonical(spark.read.parquet(path))
                    .groupBy("canonical")
                    .agg(
                        _F.count("*").alias("n_urls"),
                        _F.countDistinct("doc_id").alias("n_docs"),
                    )
                )

            bad = web_dedup().filter(
                "n_urls <> 2 OR n_docs <> 1"
            ).count()  # warm
            best = float("inf")
            for _ in range(SF1_WARM_RUNS):
                t0 = time.time()
                web_dedup().write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            web["n"][str(n_urls)] = {
                "wall_s": round(best, 3),
                "urls_per_s": int(n_urls / best),
                "bad_groups": bad,
            }
        web["growth_wall_10x"] = round(
            web["n"]["1000000"]["wall_s"] / web["n"]["100000"]["wall_s"], 2
        )

    # corpus ladder (r8, r7 verdict #2/#6): relatedness + fuzzy-decon
    # candidate volumes at 5k and 50k documents on a purpose-built corpus
    # (sources/scaleup.build_corpus_docs — NEW docs per rung, same
    # boilerplate share and dup rate; build_scaled_dir replication would
    # multiply every term's df by the copy count and measure the wrong
    # regime).  Decisive columns: Σ df²_kept under the absolute
    # REL_DF_CAP (must grow ~linearly) vs under the RETIRED fractional
    # n/20 cap (the measured negative — it keeps the df≈256 phrase pool
    # once n > 5120), and the fuzzy (k,mh) bucket-join candidates with vs
    # without FUZZY_BUCKET_CAP (the boilerplate hot-bucket hazard).
    corpus = None
    if sf_val == 0.1 and not os.environ.get("SPARK_GRAFT_SKIP_SF1"):
        from pyspark.sql import functions as _F

        from changegen_spark.queries.mlprep import (
            fuzzy_decon_candidates,
            q_fuzzy_decontaminate,
        )
        from changegen_spark.queries.relatedness import (
            REL_DF_CAP,
            _term_freqs,
            q_related_docs,
        )
        from changegen_spark.sources.scaleup import build_corpus_docs

        corpus_dir = os.environ.get(
            "SPARK_GRAFT_CORPUS_DIR", "/tmp/changegen_spark_corpus"
        )
        corpus = {"n": {}}
        for n_docs in (5_000, 50_000):
            path = build_corpus_docs(spark, corpus_dir, n_docs)
            st = {}
            # absolute-cap audit + the fractional-cap counterfactual
            tfs = _term_freqs(spark, path)
            nd = tfs.select("doc_id").distinct().count()
            dfr = tfs.groupBy("term").agg(_F.count("*").alias("df"))
            row = dfr.agg(
                _F.sum(
                    _F.when(
                        (_F.col("df") >= 2) & (_F.col("df") <= REL_DF_CAP),
                        _F.col("df") * _F.col("df"),
                    ).otherwise(0)
                ).alias("kept_abs"),
                _F.sum(
                    _F.when(
                        (_F.col("df") >= 2) & (_F.col("df") <= nd // 20),
                        _F.col("df") * _F.col("df"),
                    ).otherwise(0)
                ).alias("kept_frac"),
            ).collect()[0]
            st["sum_df2_abs_cap"] = int(row.kept_abs or 0)
            st["sum_df2_frac_n20"] = int(row.kept_frac or 0)
            best = float("inf")
            for i in range(1 + SF1_WARM_RUNS):
                t0 = time.time()
                q_related_docs(spark, path).write.format("noop").mode(
                    "overwrite"
                ).save()
                if i > 0:
                    best = min(best, time.time() - t0)
            st["related_wall_s"] = round(best, 3)
            st.update(fuzzy_decon_candidates(spark, path))
            best = float("inf")
            for i in range(1 + SF1_WARM_RUNS):
                t0 = time.time()
                q_fuzzy_decontaminate(spark, path).write.format("noop").mode(
                    "overwrite"
                ).save()
                if i > 0:
                    best = min(best, time.time() - t0)
            st["fuzzy_wall_s"] = round(best, 3)
            corpus["n"][str(n_docs)] = st
        small, big = corpus["n"]["5000"], corpus["n"]["50000"]
        corpus["growth_df2_abs_10x"] = round(
            big["sum_df2_abs_cap"] / max(small["sum_df2_abs_cap"], 1), 2
        )
        corpus["growth_df2_frac_10x"] = round(
            big["sum_df2_frac_n20"] / max(small["sum_df2_frac_n20"], 1), 2
        )
        corpus["growth_fuzzy_cand_10x"] = round(
            big["cand_capped"] / max(small["cand_capped"], 1), 2
        )
        corpus["growth_fuzzy_cand_uncapped_10x"] = round(
            big["cand_uncapped"] / max(small["cand_uncapped"], 1), 2
        )
        corpus["growth_related_wall_10x"] = round(
            big["related_wall_s"] / small["related_wall_s"], 2
        )
        corpus["growth_fuzzy_wall_10x"] = round(
            big["fuzzy_wall_s"] / small["fuzzy_wall_s"], 2
        )

    # bm25 ladder (r10, r9 verdict #4): the batched-BM25 scaling claim,
    # measured — wall must track MATCHED POSTINGS, not queries × corpus.
    # Three configs on the sf0.1 documents table: the 8-query base batch;
    # 32 queries over the SAME vocabulary (4× queries, identical tf pass
    # — wall must stay ~flat); 8 queries over a 3× vocabulary (more
    # matched postings — wall may grow, and postings is the column that
    # explains it).  matched_postings = rows of the (doc, term) tf frame,
    # i.e. the only corpus-dependent shuffle.
    bm25 = None
    if sf_val == 0.1 and not os.environ.get("SPARK_GRAFT_SKIP_SF1"):
        from changegen_spark.queries.search import (
            BM25_MULTI,
            BM25_MULTI_TOPK,
            bm25_multi_per_query,
            bm25_multi_scored,
        )

        base_vocab = sorted({t for _q, ts in BM25_MULTI for t in ts})
        wide_vocab = base_vocab + [
            "data", "row", "table", "stream", "key", "value", "column",
            "big", "small", "agg", "the", "a", "line", "scan", "group",
            "customer", "part", "order", "window", "query",
        ]
        q32 = tuple(
            (qid * 4 + k, ts)
            for qid, ts in BM25_MULTI
            for k in range(4)
        )
        # r11 (r10 verdict #5): a real corpus-slicing pipeline runs
        # THOUSANDS of queries at once — 1,000 queries over the same
        # vocabulary.  The corpus-side tf pass is query-count-invariant;
        # what grows is the per-(query, doc) fan-out (the broadcast
        # (query, term) table is 4k rows — nowhere near the broadcast
        # limit) and the per-query top-k shuffle, both proportional to
        # fanout_rows below, NOT to queries × corpus.
        q1000 = tuple(
            (qid * 125 + k, ts)
            for qid, ts in BM25_MULTI
            for k in range(125)
        )
        q8_wide = tuple(
            (i + 1, tuple(wide_vocab[j % len(wide_vocab)]
                          for j in range(i * 4, i * 4 + 4)))
            for i in range(8)
        )
        bm25 = {"configs": {}}
        for key, qset in (
            ("q8_base", BM25_MULTI),
            ("q32_same_vocab", q32),
            ("q1000_same_vocab", q1000),
            ("q8_wide_vocab", q8_wide),
        ):
            frame = bm25_multi_scored(spark, SF_DIR, qset, BM25_MULTI_TOPK)
            # matched postings: the tf frame the corpus explode shuffles
            terms = sorted({t for _q, ts in qset for t in ts})
            from changegen_spark.queries.mlprep import _toks
            from changegen_spark.sources.tables import load_table as _lt
            from pyspark.sql import functions as _F

            postings = (
                _lt(spark, SF_DIR, "documents")
                .select(_F.explode(_toks(_F.col("text"))).alias("w"))
                .filter(_F.col("w").isin(terms))
                .count()
            )
            frame.write.format("noop").mode("overwrite").save()  # warm
            best = float("inf")
            for _ in range(SF1_WARM_RUNS):
                # fresh frame per run, build inside the clock — the
                # headline methodology (r10 same-frame postmortem)
                t0 = time.time()
                bm25_multi_scored(
                    spark, SF_DIR, qset, BM25_MULTI_TOPK
                ).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            bm25["configs"][key] = {
                "n_queries": len(qset),
                "n_terms": len(terms),
                "matched_postings": postings,
                "fanout_rows": bm25_multi_per_query(
                    spark, SF_DIR, qset
                ).count(),
                "wall_s": round(best, 3),
            }
        c = bm25["configs"]
        bm25["wall_growth_4x_queries"] = round(
            c["q32_same_vocab"]["wall_s"] / c["q8_base"]["wall_s"], 2
        )
        bm25["wall_growth_125x_queries"] = round(
            c["q1000_same_vocab"]["wall_s"] / c["q8_base"]["wall_s"], 2
        )
        bm25["fanout_growth_125x_queries"] = round(
            c["q1000_same_vocab"]["fanout_rows"]
            / max(c["q8_base"]["fanout_rows"], 1), 2
        )
        bm25["wall_growth_wide_vocab"] = round(
            c["q8_wide_vocab"]["wall_s"] / c["q8_base"]["wall_s"], 2
        )
        bm25["postings_growth_wide_vocab"] = round(
            c["q8_wide_vocab"]["matched_postings"]
            / max(c["q8_base"]["matched_postings"], 1), 2
        )

    # layout ladder (r6): the optimization no query plan shows — range-
    # clustered vs scattered parquet layout of the SAME sf0.1 lineitem
    # rows, a ~1/80-selectivity date predicate on both.  The decisive
    # number is the FOOTER-level truth (row groups / rows a min/max-
    # pruning reader skips): rows_read is the I/O a cluster pays.  The
    # warm wall is reported too but is NOT the scale signal here — at
    # 600k page-cached rows the scan is scheduling-bound and the
    # clustered copy concentrates all matching rows in ONE task while
    # scattered spreads the (free) read across 32, so wall parity or a
    # small inversion is expected locally; SCALE.md documents it.
    layout = None
    if sf_val == 0.1 and not os.environ.get("SPARK_GRAFT_SKIP_SF1"):
        from pyspark.sql import functions as _F

        from changegen_spark.sources.layout import (
            rowgroup_prune_stats,
            write_clustered,
            write_scattered,
        )
        from changegen_spark.sources.tables import load_table

        lay_dir = os.environ.get(
            "SPARK_GRAFT_LAYOUT_DIR", "/tmp/changegen_spark_layout"
        )
        li = load_table(spark, SF_DIR, "lineitem").select(
            "l_orderkey",
            _F.to_date("l_shipdate").alias("ship_date"),
            "l_quantity",
            "l_extendedprice",
        )
        t0 = time.time()
        paths = {
            "clustered": os.path.join(lay_dir, "clustered"),
            "scattered": os.path.join(lay_dir, "scattered"),
        }
        write_clustered(li, paths["clustered"], by="ship_date", partitions=32)
        write_scattered(li, paths["scattered"], partitions=32)
        build_s = round(time.time() - t0, 1)
        from datetime import date

        lo, hi = date(1997, 3, 1), date(1997, 3, 31)
        layout = {"build_s": build_s, "layouts": {}}
        for kind, path in paths.items():
            q = (
                spark.read.parquet(path)
                .filter(_F.col("ship_date").between("1997-03-01", "1997-03-31"))
                .agg(
                    _F.count("*").alias("n"),
                    _F.sum("l_quantity").alias("s"),
                )
            )
            q.write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(SF1_WARM_RUNS):
                t0 = time.time()
                q.write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            st = rowgroup_prune_stats(path, "ship_date", lo, hi)
            layout["layouts"][kind] = {
                "scan_wall_s": round(best, 3),
                "row_groups": st["row_groups"],
                "row_groups_read": st["row_groups_read"],
                "rows_read": st["rows_read"],
                "rows_total": st["rows_total"],
                "prune_pct": st["prune_pct"],
            }
        cl, sc = layout["layouts"]["clustered"], layout["layouts"]["scattered"]
        layout["io_reduction_x"] = round(
            sc["rows_read"] / max(cl["rows_read"], 1), 1
        )

    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "cold_total": round(sum(cold.values()), 3),
        "warm_runs": WARM_RUNS,
        "over_budget": over_budget,
        # Trustworthiness fields (r4 verdict #2): 1-min loadavg and a fixed
        # single-thread CPU calibration, sampled before and after the run.
        # Compare calib_s across rounds before reading anything into
        # per-query drift; idle baseline for calib_s is ~0.4-0.5 s here.
        "load_1m": {"before": load_before, "after": round(os.getloadavg()[0], 2)},
        "calib_s": {"before": calib_before, "after": calib_after},
        "calib_idle_s": IDLE_CALIB_S,
        "calib_ratio": calib_ratio,
        # r13 (r12 verdict #6): the multi-core Arrow-UDF canary — the
        # single-thread probe cannot see multi-core/Python-worker/page-
        # cache ambient state, which is exactly where the ±13% idle
        # drift in Arrow-UDF-heavy queries lives.  Round-over-round
        # claims should quote value_norm_par when the movers are
        # UDF-heavy.  r14: both samples are POST-sweep/POST-recheck
        # (keys renamed so nobody reads "post1" as a pre-sweep probe).
        "calib_par_s": {
            "post1": calib_par_1,
            "post2": calib_par_2,
        },
        "calib_par_idle_s": IDLE_CALIB_PAR_S,
        "calib_par_ratio": calib_par_ratio,
        # timings divided by calib_ratio — the cross-round comparable view
        "queries_norm": timings_norm,
        "value_norm": round(sum(timings_norm.values()), 3),
        "value_norm_par": round(sum(timings.values()) / calib_par_ratio, 3),
    }
    if sf1 is not None:
        out["sf1"] = sf1
    if media is not None:
        out["media_ladder"] = media
    if er is not None:
        out["er_ladder"] = er
    if layout is not None:
        out["layout_ladder"] = layout
    if web is not None:
        out["web_ladder"] = web
    if corpus is not None:
        out["corpus_ladder"] = corpus
    if bm25 is not None:
        out["bm25_ladder"] = bm25
    # r6 verdict #6: the driver captures only a 2000-char stdout tail, so
    # the artifact must not depend on stdout — write the full JSON to a
    # file next to the repo root as well.  r8 verdict #6: the default
    # target is the NON-committed live path (bench_out.live.json,
    # gitignored) so a driver bench run never leaves the worktree dirty;
    # the committed bench_out.json only updates under an explicit
    # `python bench.py --commit` at round close.
    artifact = (
        "bench_out.json" if "--commit" in sys.argv else "bench_out.live.json"
    )
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, artifact), "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
    except OSError:
        pass  # read-only checkout: stdout line still carries the result
    print(json.dumps(out))
    # r7 verdict #8: the driver captures a bounded stdout TAIL and its
    # parse of the full line has been null/truncated two rounds running.
    # The LAST line is therefore a compact driver-contract summary
    # (metric/value/unit/queries/sf + the artifact path) sized to survive
    # a 2000-char tail; the full artifact lives in bench_out.json.
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": timings,
        "sf": out["sf"],
        "artifact": artifact,
    }
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
