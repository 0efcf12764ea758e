"""Oracle type-hygiene gate (r5 verdict task 1 + 8).

The driver's correctness hash is TYPE-REPRESENTATION-sensitive: a DuckDB
``sum()`` returns HUGEINT, which Arrow surfaces as ``decimal128(38,0)``,
and ``123`` (decimal128) hashes differently from ``123`` (int64) even
when rows/schema/values all match.  Round 5 shipped two red CORRECTNESS
rows (``q_kmv_jaccard``, ``q_countmin_topk``) plus six latent twins from
exactly this class.  This test makes the class impossible to reintroduce:

1. every ``oracle_sql()`` entry must execute on DuckDB without error;
2. no Arrow result column may be decimal128/decimal256 (un-cast HUGEINT);
3. every DOUBLE-typed result column must appear in the frozen allowlist
   below — the documented similarity/recall/measure outputs whose values
   are either ``round(..., <=9)``-stabilized or compared via scaled
   integers elsewhere.  A new double column is a conscious act: add the
   pair here AND make sure the Spark twin emits the identically-rounded
   value (registry rounding convention, GAPS.md).

Full sweep of all oracles at sf0.01 measures ~13 s.
"""

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Frozen (query, column) pairs that legitimately emit DOUBLE.
DOUBLE_ALLOWLIST = {
    ("q01_pricing_summary", "avg_disc"),
    ("q01_pricing_summary", "avg_price"),
    ("q01_pricing_summary", "avg_qty"),
    ("q02_min_cost_supplier", "bal"),
    ("q08_market_share", "mkt_share"),
    ("q14_promo_revenue", "promo_pct"),
    ("q17_small_quantity", "avg_yearly"),
    ("q_ab_test", "z_stat"),
    ("q_ann_bruteforce", "cos_sim"),
    ("q_ann_ivf", "cos_sim"),
    ("q_ann_lsh", "cos_sim"),
    ("q_ann_pq", "est_d2"),
    ("q_assoc_rules", "confidence"),
    ("q_assoc_rules", "lift"),
    ("q_bpe_encode_stats", "chars_per_token"),
    ("q_ccnet_buckets", "nll"),
    ("q_ccnet_buckets", "ppl"),
    ("q_cdc_chunks", "dup_frac"),
    ("q_corpus_pipeline", "contamination_frac"),
    ("q_cumulative_fraction", "frac"),
    # r12 multimodal VALUES oracles: decode mean_px is integer-exact e6
    # half-up, frames mean_px is round(.,6) mirrored by the generator,
    # cos_sim is round(.,6) half-up on both sides (make_media_gold.py)
    ("q_multimodal_decode", "mean_px"),
    # r12 streaming-twin oracle reuse: same column as the batch twin's
    # allowlisted es_key (round(.,9) on both sides)
    ("q_streaming_reservoir", "es_key"),
    ("q_multimodal_frames", "mean_px"),
    ("q_multimodal_features_ann", "cos_sim"),
    ("q_decontaminate", "contamination_frac"),
    ("q_dim_standardize", "max_abs_z"),
    ("q_dim_standardize", "mean_z"),
    ("q_distance_join", "dist"),
    ("q_embed_norm", "l2_norm"),
    ("q_embedding_dedup", "cos_sim"),
    ("q_embedding_dedup_lsh", "cos_sim"),
    ("q_external_decontaminate", "contamination_frac"),
    ("q_geo_measures", "centroid_x"),
    ("q_geo_measures", "centroid_y"),
    ("q_gini", "gini"),
    ("q_gopher_rules", "alpha_word_frac"),
    ("q_gopher_rules", "mean_word_len"),
    ("q_grid_dedup", "lat"),
    ("q_grid_dedup", "lon"),
    ("q_hard_negatives", "cos_sim"),
    ("q_hard_negatives_lsh", "cos_sim"),
    ("q_haversine", "haversine_m"),
    ("q_haversine", "planar_3857_m"),
    ("q_hll_distinct", "est_distinct"),
    ("q_id_lookup_join", "o_totalprice"),
    ("q_jaccard_pairs", "jaccard"),
    ("q_kmv_distinct", "est_distinct"),
    ("q_kmv_jaccard", "est_jaccard"),
    ("q_kmv_jaccard", "exact_jaccard"),
    ("q_knn_join", "dist"),
    ("q_label_centroids", "centroid_val"),
    ("q_lm_score", "nll"),
    ("q_lm_score", "ppl"),
    ("q_mad_outliers", "mad_e6"),
    ("q_mad_outliers", "med_e6"),
    ("q_markov_transitions", "p"),
    ("q_mercator", "lat_rt"),
    ("q_mercator", "lon_rt"),
    ("q_mercator", "x3857"),
    ("q_mercator", "y3857"),
    ("q_mixture_plan", "sample_rate"),
    ("q_moving_avg", "ma"),
    ("q_moving_avg", "z"),
    ("q_nearest_neighbor", "nearest_dist"),
    ("q_ngram_novelty", "novelty_frac"),
    ("q_oov_rate", "oov_rate"),
    ("q_percentiles", "avg_qty"),
    ("q_percentiles", "median_qty"),
    ("q_percentiles", "p90_qty"),
    ("q_pmi_pairs", "pmi"),
    ("q_random_projection", "l2_orig"),
    ("q_random_projection", "l2_proj"),
    ("q_random_projection", "ratio"),
    ("q_repetition", "dup_word_frac"),
    ("q_repetition", "top_bigram_frac"),
    ("q_repetition", "top_word_frac"),
    ("q_resample", "avg_value_locf"),
    ("q_reservoir_per_source", "es_key"),
    ("q_reservoir_sample", "es_key"),
    ("q_sample_quantiles", "exact_median"),
    ("q_sample_quantiles", "exact_p90"),
    ("q_segment_closest_point", "cp_x"),
    ("q_segment_closest_point", "cp_y"),
    ("q_segment_closest_point", "dist"),
    ("q_self_join", "dist"),
    ("q_setsim_diverse", "jaccard"),
    ("q_setsim_join", "jaccard"),
    ("q_source_drift", "kl_e6"),
    ("q_stats_moments", "corr_qty_price"),
    ("q_stats_moments", "covar_qty_price"),
    ("q_stats_moments", "stddev_price"),
    ("q_stats_moments", "stddev_qty"),
    ("q_text_quality", "alpha_ratio"),
    ("q_text_quality", "avg_token_len"),
    ("q_text_quality", "digit_ratio"),
    ("q_text_quality", "space_ratio"),
    ("q_tfidf_terms", "tfidf"),
    ("q_unigram_encode_stats", "chars_per_piece"),
    ("q_window_funcs", "cume"),
    ("q_window_funcs", "pct_rank"),
    ("q_winnow_fingerprints", "fp_density"),
    ("q_wordpiece_encode_stats", "chars_per_piece"),
}


@pytest.fixture(scope="module")
def oracle_schemas():
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    schemas, errors = {}, {}
    for name, sql in entrymod.oracle_sql().items():
        try:
            schemas[name] = con.execute(sql).fetch_arrow_table().schema
        except Exception as exc:  # collected, asserted below
            errors[name] = f"{type(exc).__name__}: {exc}"
    con.close()
    return schemas, errors


def test_every_oracle_executes(oracle_schemas):
    _, errors = oracle_schemas
    assert not errors, f"oracle SQL failed on DuckDB: {errors}"


def test_no_decimal_columns(oracle_schemas):
    """HUGEINT leak guard: un-cast sum() surfaces as decimal128(38,0) and
    fails the driver's type-sensitive value hash.  CAST(... AS BIGINT)."""
    schemas, _ = oracle_schemas
    offenders = [
        (name, f.name, str(f.type))
        for name, schema in schemas.items()
        for f in schema
        if str(f.type).startswith("decimal")
    ]
    assert not offenders, (
        "oracle emits decimal128 (un-cast DuckDB HUGEINT) — wrap the "
        f"aggregate in CAST(... AS BIGINT): {offenders}"
    )


def test_double_columns_are_allowlisted(oracle_schemas):
    """Registry rounding convention: doubles cross engines only when
    explicitly rounded/stabilized; new ones must be added consciously."""
    schemas, _ = oracle_schemas
    offenders = [
        (name, f.name)
        for name, schema in schemas.items()
        for f in schema
        if str(f.type) == "double" and (name, f.name) not in DOUBLE_ALLOWLIST
    ]
    assert not offenders, (
        "new DOUBLE oracle column(s) outside the frozen allowlist — either "
        "emit a scaled integer (e6 convention) or round(...,<=9) on BOTH "
        f"sides and add the pair here: {offenders}"
    )


def test_allowlist_has_no_stale_entries(oracle_schemas):
    """The allowlist must not outlive the queries it documents."""
    schemas, errors = oracle_schemas
    live = {
        (name, f.name)
        for name, schema in schemas.items()
        for f in schema
        if str(f.type) == "double"
    }
    known = set(schemas) | set(errors)
    stale = {
        pair for pair in DOUBLE_ALLOWLIST if pair[0] in known and pair not in live
    }
    assert not stale, f"allowlist entries no longer emitted: {sorted(stale)}"
