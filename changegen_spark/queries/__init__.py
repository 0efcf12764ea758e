"""Driver-facing query inventory.

Each submodule exposes ``QUERIES: dict[str, Callable[(spark, sf_dir), DataFrame]]``
and ``ORACLES: dict[str, str]`` (DuckDB-runnable ANSI SQL).  ``__spark_entry__``
aggregates them.

Determinism rules shared by every query/oracle pair (the driver hashes
values):
  * money/decimal aggregates use scaled-integer arithmetic
    (``round(x*100)`` cents as BIGINT) — bit-exact in any engine;
  * double outputs are rounded (6 dp) inside the query;
  * timestamps are emitted as formatted strings;
  * every top-k has a total tie-break order;
  * aggregate/computed columns are aliased identically on both sides.
"""

from changegen_spark.queries import changegen as _changegen
from changegen_spark.queries import events as _events
from changegen_spark.queries import extensions as _extensions
from changegen_spark.queries import features as _features
from changegen_spark.queries import funnels as _funnels
from changegen_spark.queries import olap as _olap
from changegen_spark.queries import geo as _geo
from changegen_spark.queries import graph as _graph
from changegen_spark.queries import lm as _lm
from changegen_spark.queries import media as _media
from changegen_spark.queries import misc as _misc
from changegen_spark.queries import mlprep as _mlprep
from changegen_spark.queries import mv as _mv
from changegen_spark.queries import ordering as _ordering
from changegen_spark.queries import privacy as _privacy
from changegen_spark.queries import quality as _quality
from changegen_spark.queries import refparity as _refparity
from changegen_spark.queries import quantize as _quantize
from changegen_spark.queries import rerank as _rerank
from changegen_spark.queries import prefs as _prefs
from changegen_spark.queries import relatedness as _relatedness
from changegen_spark.queries import relational as _relational
from changegen_spark.queries import scale as _scale
from changegen_spark.queries import search as _search
from changegen_spark.queries import setsim as _setsim
from changegen_spark.queries import sketches as _sketches
from changegen_spark.queries import suffix as _suffix
from changegen_spark.queries import textops as _textops
from changegen_spark.queries import timeseries as _timeseries
from changegen_spark.queries import tpch_extra as _tpch_extra
from changegen_spark.queries import tpch_full as _tpch_full
from changegen_spark.queries import unigram as _unigram
from changegen_spark.queries import wordpiece as _wordpiece
from changegen_spark.queries import c4 as _c4
from changegen_spark.queries import chunking as _chunking
from changegen_spark.queries import cluster as _cluster
from changegen_spark.queries import corpstats as _corpstats
from changegen_spark.queries import cdc as _cdc
from changegen_spark.queries import curation as _curation
from changegen_spark.queries import er as _er
from changegen_spark.queries import linmodel as _linmodel
from changegen_spark.queries import jsonops as _jsonops
from changegen_spark.queries import vectors as _vectors
from changegen_spark.queries import web as _web
from changegen_spark.queries import winnow as _winnow

# Ordered so the e2e changegen parity family, the vector/ANN family, and the
# streaming batch-twins land inside the driver's CORRECTNESS window (the
# driver checks the first 50 registry entries in insertion order).  The
# relational/TPC-H family is large and interchangeable evidence-wise, so it
# goes last.
MODULES = (
    _changegen,
    _refparity,
    _vectors,
    _extensions,  # 1 oracle (q_ann_ivf) — early so the IVF path keeps a driver row
    _events,
    _mlprep,
    _geo,
    _textops,
    _misc,
    _scale,  # after the window boundary: new r2 additions must not displace
    # the families the driver's 50-entry CORRECTNESS window already carries
    _lm,
    _media,  # real-codec decode parity (r3) — out-of-window, digest-covered
    _graph,  # iterative PageRank (r3) — out-of-window, digest-covered
    _features,  # hashing trick + skip-grams (r3) — out-of-window, digest-covered
    _funnels,  # ordered-sequence funnels (r3) — out-of-window, digest-covered
    _olap,  # CUBE lattice (r3) — out-of-window, digest-covered
    _timeseries,  # resample/LOCF, moving-avg z, Markov (r3) — digest-covered
    _search,  # BM25 ranked retrieval (r3) — digest-covered
    _setsim,  # exact prefix-filtered set-similarity join (r3) — digest-covered
    _quality,  # DQ constraint audit + association rules (r3) — digest-covered
    _winnow,  # MOSS winnowing fingerprints (late r3) — digest-covered
    _cdc,  # content-defined chunking dedup (late r3) — digest-covered
    _suffix,  # prefix-doubling suffix array + exact repeats (late r3)
    _sketches,  # mergeable HLL/KMV distinct sketches (r3.4) — digest-covered
    _curation,  # Gopher rules, CCNet buckets, temperature mix, novelty (r5)
    _unigram,  # unigram-LM tokenizer, golden-oracle-backed (r5)
    _c4,  # C4 page cleaning + 3-sentence-span dedup, fixture-backed (r5)
    _wordpiece,  # WordPiece tokenizer (likelihood merges), golden-backed (r5)
    _cluster,  # Lloyd's k-means, integer-exact, unrolled SQL oracle (r5)
    _er,  # entity resolution: phonetic blocking + Levenshtein refine (r6)
    _privacy,  # DP release mechanisms: Laplace counts/clipped sums, RR (r6)
    _chunking,  # RAG-prep chunking: fixed windows + sentence buckets (r6)
    _rerank,  # MMR diversified top-k, integer-exact, unrolled SQL oracle (r6)
    _quantize,  # SQ8 scalar quantization + recall audit (r6)
    _web,  # web-crawl URL canonicalization + host inventory (r6)
    _mv,  # incremental materialized-view maintenance (r6)
    _linmodel,  # one-pass OLS sufficient stats + GBDT histogram split (r6)
    _jsonops,  # semi-structured JSON ingestion: drift-safe extract/VARIANT (r6)
    _corpstats,  # Zipf slope + Heaps curve corpus laws (r7)
    _ordering,  # Feistel epoch shuffling: sort-free reproducible orders (r7)
    _relatedness,  # DF-pruned TF-IDF doc-doc similarity (r7)
    _prefs,  # pairwise-preference aggregation: win matrix + Bradley-Terry (r8)
    _relational,
    _tpch_extra,
    _tpch_full,
)


def _base_oracles():
    out = {}
    for m in MODULES:
        out.update(m.ORACLES)
    return out


# The transitive-verification digest is SHARDED across three window rows
# (r2-verdict follow-up + r3 housekeeping #0): the covered set grew to ~100
# out-of-window queries, and a single digest row was one ~100-subplan Spark
# job plus one ~100-subquery DuckDB statement — a driver-budget and
# failure-isolation hazard.  Three slots cost two extra window positions
# (the displaced queries are oracle-backed, so they simply join the covered
# set) and cap each digest plan at ~1/3 the size; a broken out-of-window
# query now fails one shard, not the whole transitive check.
DIGEST_NAMES = ("q_relational_digest", "q_digest_shard_b", "q_digest_shard_c")

# Standing window slots (r5 verdict #6): the changegen-parity core never
# rotates out.  These are the queries that prove reference parity — the
# full apply cycle, every change-mode family, the reference's own golden
# counts, and the PBF extract stats — so a pipeline regression can never
# hide in a round where rotation happens to point elsewhere.  They sit
# right after the digest shards, before the rotating set.
STANDING = (
    "q_changegen_apply_cycle",
    "q_changegen_counts",
    "q_changegen_modified_ways",
    "q_changegen_deletions",
    "q_changegen_modify_meta",
    "q_reference_goldens",
    "q_pbf_extract_stats",
)

# The round this rotation ships in.  The rotation pin
# (tests/test_plans.py) enforces the least-recently-direct policy
# against artifacts from rounds STRICTLY BEFORE this one — the
# driver's own artifact for the current round necessarily contains the
# current window, so including it would make the pin self-breaking (the
# r7 postmortem: the suite went red the moment CORRECTNESS_r07.json
# landed).  Bump this constant WITH every rotation.
ROTATION_ROUND = 10

# r10 window rotation (r9 verdict #2): the mechanical LRU proposal,
# verbatim — `python tools/never_direct.py --propose 40`.  It leads
# with q_retrieval_eval (landed after the r9 rotation closed, so it is
# the one remaining never-direct name; this is its first driver row),
# then the least-recently-direct names: the r2-era relational/changegen
# tails (q_distinct, q_topk_freq, q_max_ids, the global-ids pair, way
# chunking/change assembly, five TPC-H queries) and the r2/r3 text/geo/
# events families, all last direct in r1-r3.  Queries added DURING r10
# are inserted at the head (direct verification the round they land,
# the r8/r9 precedent) displacing the LRU tail.  Displaced r9 names
# fall back into the digest-covered set; queries/digest.KINDS carries
# their schemas, so transitive verification stays total.  Dict
# insertion order makes this stable: rotated names are inserted right
# after the standing slots and keep that position when the module
# sweep re-updates them.
ROTATED_IN = (
    # r10-new — direct verification the round it lands (r8/r9 precedent).
    # The 9 r10-new queries displace the LRU tail of the mechanical
    # proposal (q_asof_join, q_sessionize, q_props_parse,
    # q_capped_balance, q_attribution, q_interval_overlap, q_top_paths,
    # q_view_purchase_pairs) — the displaced names fall back to the
    # digest-covered set and stay first in line for the r11 proposal.
    "q_bm25_multi",
    "q_er_pairs_sn_suffix",
    "q_er_eval_sn_suffix",
    "q_er_golden",
    "q_er_bcubed",
    "q_er_incremental",
    "q_er_inc_audit",
    "q_er_chain_audit",
    "q_retrieval_eval",
    "q_distinct",
    "q_topk_freq",
    "q_max_ids",
    "q_global_ids",
    "q_global_ids_negative",
    "q_cumulative_fraction",
    "q_way_chunking",
    "q_change_assembly",
    "q_delete_expansion",
    "q_id_lookup_join",
    "q02_min_cost_supplier",
    "q04_order_priority",
    "q13_customer_distribution",
    "q16_part_supplier",
    "q18_large_orders",
    "q_segment_closest_point",
    "q_lang_confusion",
    "q_quality_filter",
    "q_tfidf_terms",
    "q_token_count",
    "q_text_quality",
    "q_lang_id",
    "q_minhash_signature",
    "q_jaccard_pairs",
    "q_simhash_near_pairs",
    "q_stats_moments",
    "q_tile_pyramid",
    "q_haversine",
    "q_point_in_polygon",
    "q_geo_measures",
    "q_insertion_index",
)


def all_queries():
    """Module-ordered registry with rows-only (no-oracle) queries demoted to
    the end: the driver's CORRECTNESS window is the first 50 entries, and a
    rows-only entry there would occupy a slot a hash-checkable query could
    carry.  Rows-only queries keep their relative order after the demotion
    (they are pytest-covered; the oracle-backed set is the hard signal).

    Slots 0-2 are the digest shards (queries/digest.py): window rows that
    together transitively hash-check every oracle-backed entry OUTSIDE
    the window, so rotation never again leaves a family unverified."""
    from changegen_spark.queries import digest as _digest

    oracles = _base_oracles()
    ordered = {}
    for m in MODULES:
        ordered.update(m.QUERIES)
    out = {
        nm: _digest.q_digest_shard(i) for i, nm in enumerate(DIGEST_NAMES)
    }
    out.update({nm: ordered[nm] for nm in STANDING})
    out.update({nm: ordered[nm] for nm in ROTATED_IN})
    out.update({k: v for k, v in ordered.items() if k in oracles})
    out.update({k: v for k, v in ordered.items() if k not in oracles})
    return out


def covered_by_digest():
    """Oracle-backed registry entries outside the driver's 50-slot window —
    the set the digest shards re-verify transitively.  Shard ``i`` covers
    ``covered_by_digest()[i::len(DIGEST_NAMES)]`` (round-robin, so each
    shard mixes cheap and expensive queries instead of one shard
    inheriting a whole expensive family)."""
    oracles = _base_oracles()
    return [n for n in list(all_queries())[50:] if n in oracles]


def all_oracles():
    from changegen_spark.queries import digest as _digest

    out = _base_oracles()
    covered = covered_by_digest()
    for i, nm in enumerate(DIGEST_NAMES):
        out[nm] = _digest.build_oracle_sql(
            covered[i :: len(DIGEST_NAMES)], out
        )
    return out
