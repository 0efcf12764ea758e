"""Empty-input robustness sweep: representative queries from every family
must run (not crash) against structurally-identical but EMPTY tables.

At 100 TB, empty inputs are not an edge case — a new partition, a filtered
branch, a day with no data.  A query that head()s, collects a first row,
or builds an argmin over zero centroids dies in production at 3am.  One
query per family keeps the sweep fast; new families should add a line.
"""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        from changegen_spark.sources.tables import load_table

        df = load_table(spark, sf_dir, name)
        df.limit(0).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
    return out


# one per family; (name, expected-rows predicate)
CASES = [
    ("q01_pricing_summary", lambda n: n == 0),
    ("q_group_topk", lambda n: n == 0),
    ("q_exact_dedup", lambda n: n == 0),
    ("q_lsh_pairs", lambda n: n == 0),
    ("q_dup_spans", lambda n: n == 0),
    ("q_lm_score", lambda n: n == 0),
    ("q_decontaminate", lambda n: n == 0),
    ("q_sessionize", lambda n: n == 0),
    ("q_view_purchase_pairs", lambda n: n == 0),
    ("q_asof_join", lambda n: n == 0),
    ("q_distance_join", lambda n: n == 0),
    ("q_grid_dedup", lambda n: n == 0),
    ("q_ann_bruteforce", lambda n: n == 0),
    ("q_semantic_dedup", lambda n: n == 0),
    ("q_hll_distinct", lambda n: n == 0),
    ("q_kmv_distinct", lambda n: n == 0),
    ("q_sample_quantiles", lambda n: n == 0),
    ("q_hrw_shards", lambda n: n == 0),
    ("q_source_drift", lambda n: n == 0),
    ("q_nb_classifier", lambda n: n == 0),
    ("q_phrase_search", lambda n: n == 0),
    ("q_bm25_search", lambda n: n == 0),
    ("q_bm25_multi", lambda n: n == 0),
    ("q_pagerank", lambda n: n == 0),
    ("q_funnel", lambda n: n == 0),
    ("q_resample", lambda n: n == 0),
    ("q_bbox_join", lambda n: n >= 0),  # boxes from customer: empty too
    ("q_knn_join", lambda n: n == 0),
    ("q_containment_join", lambda n: n == 0),
    ("q_tile_pyramid", lambda n: n == 0),
    ("q_hopping_windows", lambda n: n == 0),
    ("q_ab_test", lambda n: n == 0),
    ("q_new_vs_returning", lambda n: n == 0),
    ("q_asof_forward", lambda n: n == 0),
    ("q_kmv_jaccard", lambda n: n == 0),
    # round-4 additions: DSIR selection, exact + LSH hard-negative mining,
    # CDC chunking (rewritten Arrow chunker), convex hulls, haversine pairs
    ("q_dsir_weights", lambda n: n == 0),
    ("q_hard_negatives", lambda n: n == 0),
    ("q_hard_negatives_lsh", lambda n: n == 0),
    ("q_cdc_chunks", lambda n: n == 0),
    ("q_convex_hulls", lambda n: n == 0),
    ("q_haversine", lambda n: n == 0),
    ("q_reservoir_sample", lambda n: n == 0),
    ("q_reservoir_per_source", lambda n: n == 0),
    ("q_catalog", lambda n: n == 10),  # catalog row per (empty) table
    # round-5 additions: curation family + the embedding-dedup scale path
    ("q_gopher_rules", lambda n: n == 0),
    ("q_ccnet_buckets", lambda n: n == 0),
    ("q_mixture_temperature", lambda n: n == 0),
    ("q_ngram_novelty", lambda n: n == 0),
    ("q_embedding_dedup_lsh", lambda n: n == 0),
    ("q_dedup_clusters", lambda n: n == 0),
    # r5 second continuation: tokenizer trio completion, clustering,
    # privacy audit (the C4 family reads a fixed fixture, not sf tables)
    ("q_wordpiece_merges", lambda n: n == 0),
    ("q_wordpiece_encode_stats", lambda n: n == 0),
    ("q_kmeans", lambda n: n == 0),
    ("q_k_anonymity", lambda n: n == 0),
    # round-6 additions: DP releases, RAG chunking, rerank/quantize,
    # skew/cardinality planners, CUPED, incremental MV (the ER, web, and
    # NFC families read fixed fixtures, not sf tables — like C4)
    ("q_dp_counts", lambda n: n == 0),
    ("q_chunk_fixed", lambda n: n == 0),
    ("q_chunk_sentences", lambda n: n == 0),
    ("q_mmr_topk", lambda n: n == 0),
    ("q_sq8_recall", lambda n: n == 0),
    ("q_cuped", lambda n: n >= 0),
    ("q_skew_profile", lambda n: n >= 0),
    ("q_join_size_est", lambda n: n >= 0),
    ("q_mv_refresh", lambda n: n == 0),
    ("q_mv_delete_repair", lambda n: n == 0),
    ("q_zipf_fit", lambda n: n <= 1),  # fit row may be null-ish on empty
    ("q_heaps_curve", lambda n: n == 0),
    ("q_feistel_shuffle", lambda n: n == 0),
    ("q_shuffle_shards", lambda n: n == 0),
    ("q_mmr_topk_lsh", lambda n: n == 0),
    ("q_related_docs", lambda n: n == 0),
    ("q_seasonal_decompose", lambda n: n == 0),
    ("q_padding_waste", lambda n: n <= 2),
    ("q_fuzzy_decontaminate", lambda n: n == 0),
    ("q_kcenter_coreset", lambda n: n <= 1),
    ("q_url_blocklist", lambda n: n >= 0),  # fixture-based, sf-independent
    ("q_win_matrix", lambda n: n == 0),
    ("q_bt_scores", lambda n: n == 0),
    ("q_rater_agreement", lambda n: n <= 3),  # pair rows survive, n=0
    ("q_bt_weighted", lambda n: n == 0),  # kappa guard → 0 weights, no games
    ("q_retrieval_eval", lambda n: n == 1),  # guarded zeros row survives
]


@pytest.mark.parametrize("name,pred", CASES, ids=[c[0] for c in CASES])
def test_query_survives_empty_tables(spark, empty_sf_dir, name, pred):
    from changegen_spark.queries import all_queries

    fn = all_queries()[name]
    rows = fn(spark, empty_sf_dir).collect()
    assert pred(len(rows)), (name, len(rows))
