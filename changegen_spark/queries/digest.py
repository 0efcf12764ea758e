"""Transitive re-verification of out-of-window oracle queries.

The driver's CORRECTNESS gate hash-checks only the FIRST 50 registry
entries.  Round 2 rotated the relational/TPC-H family out of that window to
make room for newer families, which meant the driver no longer re-verified
it each round (r2 verdict item #5).  The digest shards close that hole:
in-window queries that compute, for every oracle-backed registry entry
OUTSIDE the window, an order-insensitive content digest of its full
result — and whose DuckDB oracles compute the identical digest over the
same entries' oracle SQL.  Green digest rows therefore transitively
re-verify the whole out-of-window family every round.  Since late r3 the
digest is SHARDED over multiple window slots (``DIGEST_NAMES`` in
``queries/__init__.py``, round-robin assignment; the shard count is
COMPUTED from the registry size as of r11) so no single driver query
unions ~100 subplans.

Digest definition (must be computable identically in Spark SQL and DuckDB
SQL — no driver-side normalization):

* per column, in sorted-column-name order, a canonical string:
  - ``num``  (int/bigint)  → CAST(col AS string)
  - ``e6``   (double)      → CAST(round(col * 1e6) AS bigint) AS string
    (every query already rounds doubles to ≤6 dp by registry convention,
    so the scaled integer is engine-exact)
  - ``str``  (string)      → the value itself
  nulls → ``<null>`` after conversion;
* per row: ``md5(concat_ws('|', cols))``, first 10 hex chars parsed as a
  40-bit integer (Spark ``conv(_,16,10)`` / DuckDB ``CAST('0x'||_ AS
  BIGINT)``) — 40 bits so a BIGINT sum cannot overflow at any row count
  the sf0.01 gate produces (and Spark's wrapping long-sum can never
  diverge from DuckDB's hugeint sum);
* per query: ``(n_rows, sum(row_hash))`` — order-insensitive, so neither
  engine needs a global sort.

The column-kind map is STATIC (generated from the live Spark schemas) so
the DuckDB side can be generated as plain SQL text;
tests/test_digest.py pins the map against the live registry, so a schema
drift fails tests before it can silently desync the two digest sides.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NULL_TOKEN = "<null>"
HASH_HEX_CHARS = 10  # 40-bit row hashes: sum of ~10^6 of them fits BIGINT

# Spark result-schema kinds for every query the digest may cover, sorted
# per-query by column name at use time.  Regenerate with
# tests/test_digest.py::test_kinds_match_live_schemas guidance on failure.
KINDS = {
    "q_convex_hulls": {"user_id": "num", "n_points": "num", "n_hull": "num", "hull_area2_e2": "num"},
    "q_insertion_index": {"l_orderkey": "num", "insert_idx": "num"},
    "q_bpe_merges": {"rank": "num", "left": "str", "right": "str", "merged": "str", "pair_count": "num"},
    "q_bpe_encode_stats": {"doc_id": "num", "n_words": "num", "n_bpe_tokens": "num", "chars_per_token": "e6"},
    "q_simplify_trajectories": {"user_id": "num", "n_points": "num", "n_kept": "num", "keep_ratio_e6": "num"},
    "q_stats_moments": {"l_returnflag": "str", "n": "num", "stddev_qty": "e6", "stddev_price": "e6", "covar_qty_price": "e6", "corr_qty_price": "e6"},
    "q_hstore_parse": {"p_partkey": "num", "brand": "str", "typ": "str", "label": "str", "n_tags": "num"},
    "q_simhash_near_pairs": {"id_a": "num", "id_b": "num", "hamming": "num"},
    "q_simhash": {"doc_id": "num", "simhash": "num"},
    "q_dedup_keep_best": {"doc_id": "num", "cluster": "num", "len": "num", "keep": "num"},
    "q_lsh_pairs": {"id_a": "num", "id_b": "num"},
    "q_minhash_signature": {"doc_id": "num", "sig": "str"},
    "q_exact_dedup": {"h": "str", "keep_id": "num", "n_copies": "num"},
    "q_fingerprint": {"doc_id": "num", "fp": "str", "group_size": "num", "canonical_id": "num"},
    "q_lang_id": {"doc_id": "num", "lang_pred": "str"},
    "q_token_count": {"doc_id": "num", "n_tokens": "num"},
    "q_tfidf_terms": {"lang": "str", "term": "str", "tfidf": "e6", "rank": "num"},
    "q_text_quality": {"doc_id": "num", "n_chars": "num", "n_tokens": "num", "alpha_ratio": "e6", "digit_ratio": "e6", "space_ratio": "e6", "avg_token_len": "e6"},
    "q_regex_tokens": {"doc_id": "num", "n_word_tokens": "num", "n_num_tokens": "num", "n_punct_tokens": "num", "covered_chars": "num"},
    "q_quality_filter": {"doc_id": "num", "len_ok": "num", "tokens_ok": "num", "alpha_ok": "num", "token_len_ok": "num", "keep": "num"},
    "q_haversine": {"pid": "num", "haversine_m": "e6", "planar_3857_m": "e6"},
    "q_point_in_polygon": {"pid": "num", "x10": "num", "y10": "num"},
    "q_geo_measures": {"user_id": "num", "n_points": "num", "path_len_e6": "num", "area2_e2": "num", "min_x10": "num", "max_x10": "num", "min_y10": "num", "max_y10": "num", "centroid_x": "e6", "centroid_y": "e6"},
    "q_jaccard_pairs": {"id_a": "num", "id_b": "num", "jaccard": "e6"},
    "q_dq_audit": {"check_name": "str", "n_checked": "num", "n_violations": "num", "passed": "num"},
    "q_assoc_rules": {"part_a": "num", "part_b": "num", "n_ab": "num", "n_a": "num", "n_b": "num", "confidence": "e6", "lift": "e6"},
    "q_typo_pairs": {"w1": "str", "w2": "str", "dist": "num"},
    "q_setsim_join": {"id_a": "num", "id_b": "num", "n_inter": "num", "n_union": "num", "jaccard": "e6"},
    "q_setsim_diverse": {"id_a": "num", "id_b": "num", "n_inter": "num", "n_union": "num", "jaccard": "e6"},
    "q_winnow_fingerprints": {"doc_id": "num", "n_grams": "num", "n_windows": "num", "n_fp": "num", "fp_density": "e6"},
    "q_winnow_pairs": {"id_a": "num", "id_b": "num", "n_shared": "num"},
    "q_stratified_split": {"doc_id": "num", "lang": "str", "rank": "num", "split": "str"},
    "q_cdc_chunks": {"doc_id": "num", "n_chunks": "num", "n_chars": "num", "max_chunk": "num", "n_dup_chunks": "num", "dup_frac": "e6"},
    "q_lang_confusion": {"lang": "str", "pred": "str", "n": "num"},
    "q_dedup_clusters": {"doc_id": "num", "cluster": "num", "keep": "num"},
    "q_dim_standardize": {"vec_id": "num", "max_abs_z": "e6", "n_clipped": "num", "mean_z": "e6"},
    "q_random_projection": {"vec_id": "num", "l2_orig": "e6", "l2_proj": "e6", "ratio": "e6"},
    "q_suffix_ranks": {"doc_id": "num", "pos": "num", "rank": "num"},
    "q_oov_rate": {"doc_id": "num", "n_tokens": "num", "n_oov": "num", "n_distinct_oov": "num", "oov_rate": "e6"},
    "q_ivm_merge": {"l_returnflag": "str", "l_linestatus": "str", "n": "num", "sum_qty": "num", "sum_cents": "num", "min_cents": "num", "max_cents": "num"},
    "q_longest_repeats": {"doc_a": "num", "pos_a": "num", "doc_b": "num", "pos_b": "num", "lcp": "num", "repeat_md5": "str"},
    "q_percentiles": {"l_returnflag": "str", "median_qty": "e6", "p90_qty": "e6", "avg_qty": "e6"},
    "q_catalog": {"table_name": "str", "n_rows": "num", "n_cols": "num"},
    "q_window_rank": {"o_custkey": "num", "o_orderkey": "num", "price_cents": "num", "price_rank": "num", "prev_price_cents": "num", "running_max_cents": "num"},
    "q_array_ops": {"l_orderkey": "num", "linenumbers_csv": "str", "partkeys_csv": "str", "n_lines": "num", "first_partkey": "num"},
    "q_count_distinct": {"l_returnflag": "str", "n_parts": "num", "n_supps": "num", "n_rows": "num"},
    "q_scalar_funcs": {"o_orderkey": "num", "prio_upper": "str", "prio_num": "num", "status_len": "num", "status_key": "str", "y": "num", "m": "num", "d": "num", "mod97": "num", "abs_delta": "num", "floor_price": "num"},
    "q_rollup": {"l_returnflag": "str", "l_linestatus": "str", "n": "num"},
    "q_set_ops": {"op": "str", "n": "num"},
    "q_pivot": {"l_linestatus": "str", "n_A": "num", "n_N": "num", "n_R": "num"},
    "q_weighted_sample": {"doc_id": "num", "w": "num", "c": "num", "n_picks": "num"},
    "q_bloom_decontaminate": {"doc_id": "num", "n_ngrams": "num", "n_candidates": "num", "n_contaminated": "num"},
    "q_incremental_dedup": {"doc_id": "num", "is_exact_dup": "num", "n_near_dup_docs": "num", "status": "str"},
    "q_zorder_cells": {"zcell": "num", "n_points": "num", "zmin": "num", "zmax": "num"},
    "q_countmin_topk": {"w": "str", "est_count": "num", "true_count": "num"},
    "q_hll_distinct": {"l_returnflag": "str", "n_empty": "num", "est_distinct": "e6", "exact_distinct": "num"},
    "q_phrase_search": {"doc_id": "num", "n_matches": "num", "first_pos": "num"},
    "q_nb_classifier": {"doc_id": "num", "score_e6": "num", "is_en": "num", "pred_en": "num"},
    # displaced from the 50-slot window when q_semantic_dedup joined an
    # in-window module (extensions)
    "q_nearest_neighbor": {"probe_id": "num", "nearest_id": "num", "nearest_dist": "e6"},
    "q_mercator": {"pid": "num", "x3857": "e6", "y3857": "e6", "lon_rt": "e6", "lat_rt": "e6"},
    "q_kmv_distinct": {"l_returnflag": "str", "kmv_threshold": "num", "est_distinct": "e6", "exact_distinct": "num"},
    "q_source_drift": {"source": "str", "n_tokens": "num", "kl_e6": "e6", "chi2_sum_e6": "num"},
    "q_kmv_jaccard": {"flag_a": "str", "flag_b": "str", "n_inter_sketch": "num", "est_jaccard": "e6", "exact_jaccard": "e6"},
    "q_sample_quantiles": {"l_returnflag": "str", "n_sample": "num", "est_median": "num", "est_p90": "num", "exact_median": "e6", "exact_p90": "e6"},
    "q_asof_forward": {"event_id": "num", "user_id": "num", "click_ts": "str", "view_event_id": "num", "gap_us": "num"},
    "q_new_vs_returning": {"day": "str", "n_active": "num", "n_new": "num", "n_returning": "num", "cum_users": "num"},
    "q_hopping_windows": {"window_start": "str", "event_type": "str", "n": "num", "sum_value_e6": "num"},
    "q_ab_test": {"variant": "str", "n_exposed": "num", "n_converted": "num", "cr_e6": "num", "z_stat": "e6"},
    "q_media_mel": {"asset_id": "num", "band": "num", "log_mel_e3": "num"},
    "q_tile_pyramid": {"zoom": "num", "tile_x": "num", "tile_y": "num", "n_points": "num"},
    "q_grid_dedup": {"pid": "num", "lon": "e6", "lat": "e6"},
    "q_bbox_join": {"a_id": "num", "b_id": "num", "overlap_area": "num"},
    "q_self_join": {"a_id": "num", "b_id": "num", "dist": "e6"},
    "q_dwithin_semi": {"osm_id": "num"},
    "q_knn_join": {"probe_id": "num", "rank": "num", "neighbor_id": "num", "dist": "e6"},
    "q_segment_closest_point": {"pid": "num", "cp_x": "e6", "cp_y": "e6", "dist": "e6", "crossing": "num"},
    "q_containment_join": {"poly_id": "num", "pid": "num"},
    "q_window_funcs": {"o_custkey": "num", "o_orderkey": "num", "price_cents": "num", "quartile": "num", "pct_rank": "e6", "cume": "e6", "second_best_orderkey": "num"},
    "q_grouping_sets": {"l_returnflag": "str", "l_linestatus": "str", "n": "num", "price_cents": "num", "g_flag": "num", "g_status": "num"},
    "q_hrw_shards": {"doc_id": "num", "shard_a": "num", "shard_b": "num", "moved": "num"},
    "q_scd2_intervals": {"user_id": "num", "event_id": "num", "event_type": "str", "valid_from": "str", "valid_to": "str", "is_current": "num", "value_e6": "num"},
    "q_media_image_decode": {"asset_id": "num", "fmt": "str", "width": "num", "height": "num", "mean_e6": "num"},
    "q_media_audio_features": {"asset_id": "num", "fmt": "str", "sample_rate": "num", "n_channels": "num", "n_frames": "num", "duration_e6": "num", "rms_e6": "num", "peak_e6": "num", "zero_crossings": "num", "centroid_e3": "num", "rolloff_e3": "num"},
    "q_media_resize": {"asset_id": "num", "fmt": "str", "rwidth": "num", "rheight": "num", "rmean_e6": "num"},
    "q_media_frame_stats": {"asset_id": "num", "frame_idx": "num", "mean_luma_e6": "num"},
    "q_media_motion": {"asset_id": "num", "frame_idx": "num", "mad_e6": "num"},
    "q_pagerank": {"node": "str", "rank_e9": "num"},
    "q_bfs_hops": {"node": "str", "hops": "num"},
    "q_pagerank_weighted": {"node": "str", "rank_e9": "num"},
    "q_pmi_pairs": {"w1": "str", "w2": "str", "n": "num", "pmi": "e6"},
    "q_feature_hash": {"doc_id": "num", "bucket": "num", "n": "num"},
    "q_skipgram_pairs": {"w1": "str", "w2": "str", "n": "num"},
    "q_funnel": {"user_id": "num", "t_view": "str", "t_click": "str", "t_purchase": "str", "steps_completed": "num"},
    "q_normalize_text": {"doc_id": "num", "norm_md5": "str", "norm_len": "num", "n_same_norm": "num"},
    "q_retention": {"cohort_week": "str", "week_offset": "num", "n_active": "num"},
    "q_cube": {"l_returnflag": "str", "l_linestatus": "str", "n": "num", "price_cents": "num", "g_flag": "num", "g_status": "num"},
    "q_dup_spans": {"doc_id": "num", "span_start": "num", "span_end": "num", "span_tokens": "num", "n_dup_grams": "num"},
    "q_lm_score": {"doc_id": "num", "n_bigrams": "num", "nll": "e6", "ppl": "e6"},
    "q_top_paths": {"path": "str", "n": "num"},
    "q_capped_balance": {"user_id": "num", "n_events": "num", "final_balance": "num", "n_cap_hits": "num", "n_floor_hits": "num"},
    "q_attribution": {"touch_type": "str", "n_purchases": "num", "revenue_e6": "num"},
    "q_interval_overlap": {"user_id": "num", "session_seq": "num", "incident_id": "num", "overlap_us": "num"},
    "q_bm25_search": {"doc_id": "num", "n_terms_hit": "num", "score_e9": "num"},
    "q_bm25_multi": {"query_id": "num", "doc_id": "num", "rank": "num", "n_terms_hit": "num", "score_e9": "num"},
    "q_hybrid_search": {"doc_id": "num", "rank_lex": "num", "rank_vec": "num", "rrf_e9": "num"},
    "q_null_semantics": {"n_rows": "num", "n_null_keys": "num", "n_eq_pairs": "num", "n_nullsafe_pairs": "num"},
    "q_gini": {"n_customers": "num", "total_cents": "num", "gini": "e6"},
    "q_mad_outliers": {"event_type": "str", "n": "num", "med_e6": "e6", "mad_e6": "e6", "n_outliers": "num"},
    "q_percentile_binned": {"pct": "num", "bin_idx": "num", "upper_cents": "num", "n_le": "num"},
    "q_profile": {"col_name": "str", "n_rows": "num", "n_null": "num", "n_distinct": "num", "min_s": "str", "max_s": "str"},
    "q_triangle_counts": {"p_partkey": "num", "n_triangles": "num"},
    "q_degree_hist": {"bucket": "num", "n_parts": "num", "min_degree": "num", "max_degree": "num"},
    "q_resample": {"event_type": "str", "hour": "num", "n_events": "num", "sum_value_e6": "num", "avg_value_locf": "e6"},
    "q_moving_avg": {"event_type": "str", "hour": "num", "c": "num", "ma": "e6", "z": "e6", "is_anomaly": "num"},
    "q_time_range_window": {"user_id": "num", "event_id": "num", "ts_s": "str", "n_1h": "num", "sum_value_e6_1h": "num"},
    "q_markov_transitions": {"prev_type": "str", "next_type": "str", "n": "num", "p": "e6"},
    "q01_pricing_summary": {"l_returnflag": "str", "l_linestatus": "str", "sum_qty": "num", "sum_base_cents": "num", "sum_disc_price_e4": "num", "sum_charge_e6": "num", "avg_qty": "e6", "avg_price": "e6", "avg_disc": "e6", "count_order": "num"},
    "q_snapshot_diff": {"o_orderkey": "num", "change_type": "str", "version": "num", "o_orderstatus": "str", "o_orderpriority": "str", "price_cents": "num"},
    "q03_top_orders": {"l_orderkey": "num", "orderdate": "str", "revenue_e4": "num"},
    "q05_region_revenue": {"r_name": "str", "n_name": "str", "revenue_e4": "num", "n_items": "num"},
    "q_semi_join": {"c_custkey": "num", "c_name": "str"},
    "q_anti_join": {"c_custkey": "num", "c_name": "str"},
    "q_distinct": {"o_orderstatus": "str", "o_orderpriority": "str"},
    "q_topk_freq": {"l_partkey": "num", "n": "num"},
    "q_group_topk": {"l_returnflag": "str", "l_linestatus": "str", "l_orderkey": "num", "l_linenumber": "num", "price_cents": "num", "rk": "num"},
    "q_max_ids": {"tbl": "str", "max_id": "num"},
    "q_global_ids": {"p_partkey": "num", "new_id": "num"},
    "q_global_ids_negative": {"p_partkey": "num", "new_id": "num"},
    "q_cumulative_fraction": {"l_orderkey": "num", "l_linenumber": "num", "cum_qty": "num", "total_qty": "num", "frac": "e6"},
    "q_way_chunking": {"l_orderkey": "num", "chunk": "num", "n_nodes": "num", "first_pos": "num", "last_pos": "num"},
    "q_tag_unpivot": {"p_partkey": "num", "key": "str", "value": "str"},
    "q_change_assembly": {"change_type": "str", "id": "num", "version": "num"},
    "q_delete_expansion": {"kind": "str", "elem_id": "num"},
    "q_id_lookup_join": {"o_orderkey": "num", "o_custkey": "num", "o_orderstatus": "str", "o_totalprice": "e6"},
    "q02_min_cost_supplier": {"l_partkey": "num", "l_suppkey": "num", "bal": "e6"},
    "q04_order_priority": {"o_orderpriority": "str", "order_count": "num"},
    "q13_customer_distribution": {"c_count": "num", "custdist": "num"},
    "q16_part_supplier": {"p_brand": "str", "p_size": "num", "supplier_cnt": "num"},
    "q18_large_orders": {"c_name": "str", "c_custkey": "num", "o_orderkey": "num", "orderdate": "str", "total_qty": "num"},
    "q06_forecast_revenue": {"revenue_e4": "num"},
    "q10_returned_items": {"c_custkey": "num", "c_name": "str", "revenue_e4": "num", "acctbal_cents": "num", "n_name": "str"},
    "q14_promo_revenue": {"promo_revenue_e4": "num", "total_revenue_e4": "num", "promo_pct": "e6"},
    "q07_volume_shipping": {"supp_nation": "str", "cust_nation": "str", "l_year": "num", "revenue_e4": "num"},
    "q08_market_share": {"o_year": "num", "nation_revenue_e4": "num", "total_revenue_e4": "num", "mkt_share": "e6"},
    "q09_product_profit": {"nation": "str", "o_year": "num", "profit_e4": "num"},
    "q11_important_stock": {"l_partkey": "num", "value_e2": "num"},
    # displaced by the r5 window rotation (ROTATED_IN in queries/__init__.py)
    "q_view_purchase_pairs": {"user_id": "num", "view_id": "num", "purchase_id": "num", "gap_us": "num", "value_cents": "num"},
    "q_sessionize": {"user_id": "num", "session_seq": "num", "n_events": "num", "session_start": "str", "session_end": "str"},
    "q_props_parse": {"event_id": "num", "event_type": "str", "k": "num", "k_band": "str"},
    "q_asof_join": {"event_id": "num", "user_id": "num", "click_ts": "str", "view_event_id": "num", "gap_us": "num"},
    "q_range_join": {"event_id": "num", "user_id": "num", "n_prior": "num", "sum_prior_value_e6": "num"},
    "q_dsir_weights": {"doc_id": "num", "n_grams": "num", "logw_e6": "num", "selected": "num"},
    "q_decontaminate": {"doc_id": "num", "n_ngrams": "num", "n_contaminated": "num", "contamination_frac": "e6"},
    "q_external_decontaminate": {"doc_id": "num", "n_ngrams": "num", "n_contaminated": "num", "contamination_frac": "e6"},
    "q_corpus_pipeline": {"doc_id": "num", "source": "str", "n_tokens": "num", "contamination_frac": "e6", "seq_id": "num", "offset_in_seq": "num"},
    "q_mixture_plan": {"source": "str", "n_docs": "num", "n_tokens": "num", "budget_tokens": "num", "sample_rate": "e6", "contrib_tokens": "num"},
    "q_pii_scrub": {"doc_id": "num", "n_email": "num", "n_phone": "num", "n_ip": "num", "redacted_hash": "str"},
    "q_repetition": {"doc_id": "num", "n_tokens": "num", "dup_word_frac": "e6", "top_word_frac": "e6", "top_bigram_frac": "e6"},
    "q_hash_sample": {"doc_id": "num", "source": "str", "hkey": "str", "in_bernoulli": "num", "strat_keep": "num"},
    "q_reservoir_sample": {"doc_id": "num", "w": "num", "es_key": "e6"},
    "q_reservoir_per_source": {"source": "str", "doc_id": "num", "w": "num", "es_key": "e6", "rank": "num"},
    "q_token_chunks": {"doc_id": "num", "chunk_idx": "num", "n_in_chunk": "num", "chunk_hash": "str"},
    "q_pack_sequences": {"doc_id": "num", "source": "str", "n_tokens": "num", "seq_id": "num", "offset_in_seq": "num", "n_seqs_spanned": "num"},
    "q_distance_join": {"a_id": "num", "b_id": "num", "dist": "e6"},
    # r5 curation family (queries/curation.py)
    "q_gopher_rules": {"doc_id": "num", "n_words": "num", "mean_word_len": "e6", "alpha_word_frac": "e6", "n_stop_hits": "num", "keep": "num"},
    "q_ccnet_buckets": {"doc_id": "num", "lang": "str", "nll": "e6", "ppl": "e6", "tercile": "num", "bucket": "str"},
    "q_mixture_temperature": {"source": "str", "n_docs": "num", "n_tokens": "num", "p_e6": "num", "budget_tokens": "num", "contrib_tokens": "num", "epochs_e6": "num"},
    "q_ngram_novelty": {"doc_id": "num", "n_grams": "num", "n_novel": "num", "novelty_frac": "e6"},
    "q_mixture_sample": {"doc_id": "num", "source": "str", "doc_tokens": "num", "u_e6": "num", "rate_e6": "num"},
    "q_media_dhash": {"asset_id": "num", "fmt": "str", "dhash": "str"},
    "q_media_dup_pairs": {"id_a": "num", "id_b": "num", "hamming": "num"},
    "q_media_dup_pairs_mih": {"id_a": "num", "id_b": "num", "hamming": "num"},
    "q_media_audio_fingerprint": {"asset_id": "num", "fmt": "str", "afp_frames": "num", "afp": "str"},
    "q_unigram_vocab": {"rank": "num", "piece": "str", "cost_e9": "num"},
    "q_compression_ratio": {"doc_id": "num", "n_bytes": "num", "z_bytes": "num", "ratio_e6": "num", "keep": "num"},
    "q_unigram_encode_stats": {"doc_id": "num", "n_words": "num", "n_pieces": "num", "chars_per_piece": "e6"},
    "q_kmeans": {"vec_id": "num", "cluster": "num", "dist2_e12": "num"},
    "q_k_anonymity": {"c_nationkey": "num", "c_mktsegment": "str", "bal_band": "num", "n": "num", "suppressed": "num", "risk_e6": "num", "n_released": "num"},
    "q_wordpiece_merges": {"rank": "num", "left": "str", "right": "str", "merged": "str", "pair_count": "num", "score_e9": "num"},
    "q_wordpiece_encode_stats": {"doc_id": "num", "n_words": "num", "n_pieces": "num", "n_unk": "num", "chars_per_piece": "e6"},
    "q_c4_line_filter": {"page_id": "num", "n_lines": "num", "n_kept_lines": "num", "n_sentences": "num", "has_lorem": "num", "has_brace": "num", "has_badword": "num", "keep": "num"},
    "q_c4_span_dedup": {"page_id": "num", "n_sents": "num", "n_removed": "num", "n_kept": "num", "kept_fp": "str"},
    "q_media_video_signature": {"asset_id": "num", "fmt": "str", "n_frames": "num", "vsig": "str"},
    "q12_priority_lines": {"l_linestatus": "str", "high_line_count": "num", "low_line_count": "num"},
    "q15_top_supplier": {"s_suppkey": "num", "s_name": "str", "total_revenue_e4": "num"},
    "q17_small_quantity": {"total_cents": "num", "avg_yearly": "e6"},
    "q19_discounted_revenue": {"revenue_e4": "num"},
    "q20_dominant_suppliers": {"s_suppkey": "num", "s_name": "str"},
    "q21_suppliers_waiting": {"s_name": "str", "numwait": "num"},
    "q22_sales_opportunity": {"cntrycode": "str", "numcust": "num", "totacctbal_cents": "num"},
    # r6 rotation: the vector/ANN + event-window family leaves the direct
    # window (displaced by the latent-HUGEINT + never-direct families).
    "q_embed_norm": {"vec_id": "num", "l2_norm": "e6", "dim": "num"},
    "q_hard_negatives": {"anchor_id": "num", "anchor_label": "num", "vec_id": "num", "neg_label": "num", "cos_sim": "e6", "rank": "num"},
    "q_hard_negatives_lsh": {"anchor_id": "num", "anchor_label": "num", "vec_id": "num", "neg_label": "num", "cos_sim": "e6", "rank": "num"},
    "q_label_centroids": {"label": "num", "pos": "num", "centroid_val": "e6", "n_vecs": "num"},
    "q_ann_bruteforce": {"query_id": "num", "vec_id": "num", "cos_sim": "e6", "rank": "num"},
    "q_ann_lsh": {"query_id": "num", "vec_id": "num", "cos_sim": "e6", "rank": "num"},
    "q_ann_pq": {"query_id": "num", "vec_id": "num", "est_d2": "e6", "rank": "num"},
    "q_embedding_dedup": {"id_a": "num", "id_b": "num", "cos_sim": "e6"},
    "q_embedding_dedup_lsh": {"id_a": "num", "id_b": "num", "cos_sim": "e6"},
    "q_semantic_dedup": {"vec_id": "num", "cell": "num", "n_dup_lower": "num", "keep": "num"},
    "q_ann_ivf": {"query_id": "num", "vec_id": "num", "cos_sim": "e6", "rank": "num"},
    "q_event_windows": {"window_start": "str", "event_type": "str", "n": "num", "sum_value_e6": "num"},
    # r6: CUPED variance-reduced experiment readout
    "q_cuped": {"variant": "str", "n": "num", "theta_e6": "num", "mean_y_e6": "num", "mean_cuped_e6": "num", "var_y_e6": "num", "var_cuped_e6": "num", "var_reduction_e6": "num"},
    # r6: SQ8 scalar quantization recall audit (out-of-window from birth)
    "q_sq8_recall": {"query_id": "num", "n_overlap": "num", "recall_e6": "num"},
    # r6: MMR diversified rerank (out-of-window from birth)
    "q_mmr_topk": {"query_id": "num", "rank": "num", "vec_id": "num", "rel_dot": "num", "mmr_score": "num"},
    "q_mmr_topk_lsh": {"query_id": "num", "rank": "num", "vec_id": "num", "rel_dot": "num", "mmr_score": "num"},
    "q_zipf_fit": {"n_points": "num", "total_tokens": "num", "vocab_size": "num", "slope_e6": "num", "intercept_e6": "num"},
    "q_heaps_curve": {"bucket": "num", "docs_cum": "num", "tokens_cum": "num", "vocab_cum": "num"},
    "q_feistel_shuffle": {"doc_id": "num", "epoch": "num", "pos": "num"},
    "q_shuffle_shards": {"epoch": "num", "shard": "num", "n_docs": "num"},
    "q_fuzzy_decontaminate": {"train_doc_id": "num", "eval_doc_id": "num", "matches": "num", "est_jaccard_e6": "num"},
    "q_kcenter_coreset": {"rank": "num", "vec_id": "num", "radius_d2": "num"},
    "q_padding_waste": {"policy": "str", "n_batches": "num", "slots": "num", "used_tokens": "num", "waste_e6": "num"},
    "q_seasonal_decompose": {"hour": "num", "hod": "num", "c": "num", "trend_e6": "num", "seasonal_e6": "num", "residual_e6": "num"},
    "q_url_blocklist": {"host": "str", "n_urls": "num", "matched_rule": "str", "blocked": "num"},
    "q_related_docs": {"doc_id": "num", "rank": "num", "rel_doc_id": "num", "cos_e6": "num"},
    "q_win_matrix": {"item_a": "num", "item_b": "num", "n_games": "num", "wins_a": "num", "winrate_e6": "num"},
    "q_bt_scores": {"item": "num", "n_games": "num", "n_wins": "num", "bt_e6": "num"},
    "q_rater_agreement": {"rater_a": "num", "rater_b": "num", "n": "num", "agree": "num", "kappa_e6": "num"},
    "q_er_pairs_sn": {"rec_a": "num", "rec_b": "num", "lev": "num"},
    "q_er_pairs_sn_multi": {"rec_a": "num", "rec_b": "num", "lev": "num"},
    "q_er_eval_sn_multi": {"n_pred": "num", "n_true": "num", "n_tp": "num", "precision_e6": "num", "recall_e6": "num", "window_recall_e6": "num"},
    "q_er_eval_sn": {"n_pred": "num", "n_true": "num", "n_tp": "num", "precision_e6": "num", "recall_e6": "num", "window_recall_e6": "num"},
    "q_er_pairs_sn_refined": {"rec_a": "num", "rec_b": "num", "lev": "num"},
    "q_bt_weighted": {"item": "num", "n_games_w": "num", "n_wins_w": "num", "bt_e6": "num"},
    "q_pbf_dsv2_stats": {"kind": "str", "n": "num", "max_id": "num"},
    "q_retrieval_eval": {"k": "num", "n_rel3": "num", "dcg_e6": "num", "idcg_e6": "num", "ndcg_e6": "num", "mrr3_e6": "num", "p_at_k_rel3_e6": "num"},
    "q_er_eval_sn_refined": {"n_pred": "num", "n_true": "num", "n_tp": "num", "precision_e6": "num", "recall_e6": "num", "window_recall_e6": "num"},
    "q_er_pairs_sn_suffix": {"rec_a": "num", "rec_b": "num", "lev": "num"},
    "q_er_eval_sn_suffix": {"n_pred": "num", "n_true": "num", "n_tp": "num", "precision_e6": "num", "recall_e6": "num", "window_recall_e6": "num"},
    "q_er_golden": {"entity": "num", "n_members": "num", "n_name_variants": "num", "name": "str", "city": "str"},
    "q_er_golden_full": {"entity": "num", "n_members": "num", "name_mode": "str", "name_longest": "str", "city_latest": "str"},
    "q_er_bcubed": {"n_records": "num", "n_pred_clusters": "num", "n_true_entities": "num", "b3_precision_e6": "num", "b3_recall_e6": "num", "b3_f1_e6": "num"},
    "q_er_incremental": {"rec_id": "num", "matched_entity": "num", "lev": "num", "n_matches": "num"},
    "q_er_incremental_margin": {"rec_id": "num", "matched_entity": "num", "lev": "num", "margin": "num", "n_matches": "num"},
    "q_er_golden_inc": {"entity": "num", "status": "str", "n_members": "num", "name_mode": "str", "name_longest": "str", "city_latest": "str"},
    "q_er_margin_audit": {"lev": "num", "gap": "num", "n": "num"},
    "q_er_ambiguous_resolve": {"rec_id": "num", "matched_entity": "num", "lev": "num", "margin": "num", "n_matches": "num", "status": "str"},
    "q_er_drain_policy": {"policy": "str", "rec_id": "num", "matched_entity": "num", "status": "str"},
    "q_er_shadow_guard": {"rec_id": "num", "matched_entity": "num", "lev": "num", "t_lev": "num", "disposition": "str"},
    "q_er_golden_retract": {"entity": "num", "status": "str", "n_members": "num", "name_mode": "str", "name_longest": "str", "city_latest": "str"},
    "q_er_new_entity_merge": {"rec_id": "num", "new_entity": "num", "n_members": "num"},
    "q_mv_join_refresh": {"o_orderpriority": "str", "l_returnflag": "str", "n_inc": "num", "sum_inc": "num", "n_full": "num", "sum_full": "num", "consistent": "num"},
    "q_mv_join_delete": {"o_orderpriority": "str", "l_returnflag": "str", "n_inc": "num", "sum_inc": "num", "n_full": "num", "sum_full": "num", "consistent": "num"},
    "q_mv_join_update": {"o_orderpriority": "str", "l_returnflag": "str", "n_inc": "num", "sum_inc": "num", "n_full": "num", "sum_full": "num", "consistent": "num"},
    "q_streaming_windows": {"window_start": "str", "event_type": "str", "n": "num", "sum_value_e6": "num"},
    "q_streaming_sessions": {"user_id": "num", "session_start": "str", "session_end": "str", "n_events": "num"},
    "q_streaming_pair_join": {"user_id": "num", "view_id": "num", "purchase_id": "num", "gap_us": "num", "value_cents": "num"},
    "q_streaming_reservoir": {"source": "str", "doc_id": "num", "w": "num", "es_key": "e6", "rank": "num"},
    "q_multimodal_decode": {"asset_id": "num", "width": "num", "height": "num", "n_pixels": "num", "mean_px": "e6", "ok": "num"},
    "q_multimodal_frames": {"asset_id": "num", "frame_idx": "num", "mean_px": "e6"},
    "q_multimodal_features_ann": {"query_id": "num", "vec_id": "num", "cos_sim": "e6", "rank": "num"},
    "q_er_inc_audit": {"key_class": "str", "n_shared_keys": "num", "candidates": "num", "max_key_pairs": "num", "refined": "num"},
    "q_er_chain_audit": {"n_multi_entities": "num", "max_cluster_size": "num", "pairs_checked": "num", "chain_pairs": "num", "max_intra_lev": "num"},
    "q_df_prune_audit": {"n_terms": "num", "n_kept": "num", "sum_df2_all": "num", "sum_df2_kept": "num"},
    # r6: CMS join-cardinality estimate (out-of-window from birth)
    "q_join_size_est": {"n_actual": "num", "est_rows": "num", "overest_e6": "num"},
    # r6: join-key skew diagnostics (out-of-window from birth)
    "q_skew_profile": {"key_col": "str", "n_rows": "num", "n_keys": "num", "max_freq": "num", "top_key": "num", "avg_freq_e6": "num", "entropy_e6": "num", "max_entropy_e6": "num"},
    # r6 new family: RAG chunking (out-of-window from birth)
    "q_chunk_fixed": {"doc_id": "num", "chunk_id": "num", "tok_start": "num", "tok_end": "num", "n_tokens": "num", "chunk_hash": "str"},
    "q_chunk_sentences": {"doc_id": "num", "chunk_id": "num", "n_sentences": "num", "n_tokens": "num", "first_sent": "num", "last_sent": "num"},
    # r6 new family: differential-privacy releases (out-of-window from birth)
    "q_dp_counts": {"segment": "str", "n_exact": "num", "n_dp_e3": "num"},
    "q_dp_sum_clipped": {"segment": "str", "sum_exact_cents": "num", "sum_clipped_cents": "num", "sum_dp_cents": "num"},
    "q_rr_estimate": {"segment": "str", "n": "num", "n_true": "num", "n_reported": "num", "est_prev_e6": "num", "true_prev_e6": "num"},
    # r6 new family: entity resolution (out-of-window from birth)
    "q_er_blocks": {"block_key": "str", "n_records": "num", "n_cand_pairs": "num"},
    "q_er_pairs": {"rec_a": "num", "rec_b": "num", "lev": "num"},
    "q_er_clusters": {"rec_id": "num", "entity": "num"},
    "q_er_eval": {"n_pred": "num", "n_true": "num", "n_tp": "num", "precision_e6": "num", "recall_e6": "num", "block_recall_e6": "num"},
    "q_er_pairs_multi": {"rec_a": "num", "rec_b": "num", "lev": "num"},
    "q_er_eval_multi": {"n_pred": "num", "n_true": "num", "n_tp": "num", "precision_e6": "num", "recall_e6": "num", "block_recall_e6": "num"},
    # r6 new family: web-crawl URL processing (out-of-window from birth)
    "q_url_canonical": {"url_id": "num", "canonical": "str", "had_default_port": "num", "had_fragment": "num", "had_tracking": "num", "changed": "num"},
    "q_host_stats": {"host": "str", "reg_domain": "str", "n_urls": "num", "n_pages": "num", "n_dup_urls": "num"},
    "q_url_dedup": {"canonical": "str", "n_urls": "num", "keep_url_id": "num", "n_docs": "num"},
    "q_url_dedup_eval": {"n_pred": "num", "n_true": "num", "n_tp": "num", "precision_e6": "num", "recall_e6": "num", "designed_loss_pairs": "num"},
    "q_url_params": {"param_key": "str", "n_urls": "num", "n_values": "num"},
    "q_unicode_nfc": {"uid": "num", "nfc_md5": "str", "changed": "num", "n_cp_before": "num", "n_cp_after": "num"},
    # r6 new family: incremental MV maintenance (out-of-window from birth)
    "q_mv_refresh": {"o_orderpriority": "str", "n_inc": "num", "sum_inc": "num", "n_full": "num", "sum_full": "num", "consistent": "num"},
    "q_mv_delete_repair": {"o_orderpriority": "str", "n_rep": "num", "sum_rep": "num", "max_rep": "num", "n_full": "num", "sum_full": "num", "max_full": "num", "consistent": "num"},
    # r6 new family: one-pass linear models (out-of-window from birth)
    "q_ols_fit": {"n": "num", "s1y": "num", "s2y": "num", "beta0_e6": "num", "beta1_e6": "num", "beta2_e6": "num"},
    "q_ols_quality": {"n": "num", "r2_e6": "num", "rmse_e6": "num", "mean_y_e6": "num"},
    "q_stump_split": {"split_bin": "num", "n_left": "num", "n_right": "num", "mean_left_e6": "num", "mean_right_e6": "num", "gain_frac_e6": "num"},
    # r6 new family: semi-structured JSON ingestion (out-of-window from birth)
    "q_json_valid": {"n_total": "num", "n_valid": "num", "n_invalid": "num"},
    "q_json_extract": {"event": "str", "n": "num", "n_amount": "num", "sum_amount_cents": "num", "n_pro": "num", "n_session": "num"},
    "q_json_flatten": {"sku": "str", "n_lines": "num", "total_qty": "num", "revenue_cents": "num"},
    "q_json_schema_profile": {"key": "str", "jtype": "str", "n": "num"},
    # r6: interpolated Kneser-Ney bigrams (lm module, out-of-window)
    "q_kn_bigram": {"w1": "str", "w2": "str", "c12": "num", "c1": "num", "n1r": "num", "n1l": "num", "p_mle_e6": "num", "p_kn_e6": "num"},
}


def kind_of(data_type) -> str:
    """Spark DataType → digest kind (the rule KINDS was generated with)."""
    t = data_type.simpleString()
    if t in ("double", "float"):
        return "e6"
    if t == "string":
        return "str"
    return "num"


def _canon_spark(name: str, kind: str) -> F.Column:
    c = F.col(name)
    if kind == "e6":
        e = F.round(c * 1000000).cast("long").cast("string")
    else:
        e = c.cast("string")
    return F.coalesce(e, F.lit(NULL_TOKEN))


def _canon_duck(name: str, kind: str) -> str:
    q = f'"{name}"'
    if kind == "e6":
        e = f"CAST(CAST(round({q} * 1000000) AS BIGINT) AS VARCHAR)"
    else:
        e = f"CAST({q} AS VARCHAR)"
    return f"coalesce({e}, '{NULL_TOKEN}')"


def _digest_one_spark(name: str, df: DataFrame) -> DataFrame:
    kinds = {f.name: kind_of(f.dataType) for f in df.schema.fields}
    row_str = F.concat_ws(
        "|", *[_canon_spark(c, kinds[c]) for c in sorted(df.columns)]
    )
    h = F.conv(F.substring(F.md5(F.col("s")), 1, HASH_HEX_CHARS), 16, 10).cast("long")
    return df.select(row_str.alias("s")).agg(
        F.lit(name).alias("query_name"),
        F.count("*").alias("n_rows"),
        F.coalesce(F.sum(h), F.lit(0)).alias("hash_sum"),
    )


def q_digest_shard(shard: int):
    """Factory for window digest slot ``shard``: (query_name, n_rows,
    hash_sum) for every oracle-backed registry entry outside the driver's
    50-slot window whose round-robin shard index matches — the whole
    out-of-window family is verified through the DIGEST_NAMES slots
    together (sharded so no single driver query carries ~100 subplans)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from changegen_spark.queries import (
            DIGEST_NAMES,
            all_queries,
            covered_by_digest,
        )

        qs = all_queries()
        names = covered_by_digest()[shard :: len(DIGEST_NAMES)]
        parts = [_digest_one_spark(n, qs[n](spark, sf_dir)) for n in names]
        return reduce(DataFrame.unionByName, parts).orderBy("query_name")

    run.__name__ = f"q_digest_shard_{shard}"
    run.__doc__ = (
        f"Transitive-verification digest shard {shard}: (query_name, "
        "n_rows, hash_sum) for its round-robin third of every "
        "oracle-backed registry entry outside the driver's 50-slot "
        "window, so rotation never leaves a family unverified."
    )
    return run


def _digest_one_duck(name: str, sql: str) -> str:
    kinds = KINDS[name]
    canons = ", ".join(_canon_duck(c, kinds[c]) for c in sorted(kinds))
    return (
        f"SELECT '{name}' AS query_name, count(*) AS n_rows,\n"
        f"       CAST(coalesce(sum(CAST(('0x' || substr(md5(concat_ws('|', {canons})), 1, {HASH_HEX_CHARS})) AS BIGINT)), 0) AS BIGINT) AS hash_sum\n"
        f"FROM (\n{sql.strip().rstrip(';')}\n)"
    )


def build_oracle_sql(covered: list[str], oracles: dict[str, str]) -> str:
    """UNION ALL of the per-query digest aggregates, one subquery per
    covered entry's oracle SQL (the driver executes this as one DuckDB
    statement with the standard table views registered)."""
    missing = [n for n in covered if n not in KINDS]
    if missing:
        raise KeyError(f"digest KINDS map missing entries: {missing}")
    parts = [_digest_one_duck(n, oracles[n]) for n in covered]
    return "\nUNION ALL\n".join(parts) + "\nORDER BY query_name"


QUERIES = {}  # registered explicitly (window slot 0) by queries/__init__.py
ORACLES = {}
