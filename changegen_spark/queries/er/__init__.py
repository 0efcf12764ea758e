"""Entity resolution / record linkage (r6 family, packaged r11).

Fuzzy duplicate-record matching over the shipped people fixture
(fixtures/er_people.parquet, built by tools/make_er.py with planted
typo classes and ground-truth entity_id).  Split along the family's
natural seams (r10 verdict #8) with every public AND test-facing name
re-exported here, so ``changegen_spark.queries.er`` keeps its full
surface and the registry/oracle dicts are byte-identical:

* ``blocking``    — phonetic keys, key-based blocking, pairwise eval;
* ``sn``          — sorted-neighborhood passes (1/2/3 sort orders,
  exact-equality refine), the linear-candidate-budget schemes;
* ``golden``      — survivorship golden records + B-cubed eval;
* ``incremental`` — batch-append assignment, candidate/chain audits.

100 TB shape notes live with each submodule; the scheme-selection
regime rule (key blocking vs SN by density) is in SCALE.md.
"""

from changegen_spark.queries.er.blocking import (  # noqa: F401
    ER_PATH,
    FIXDIR,
    LEV_MAX,
    Q_ER_BLOCKS_SQL,
    Q_ER_CLUSTERS_SQL,
    Q_ER_EVAL_MULTI_SQL,
    Q_ER_EVAL_SQL,
    Q_ER_PAIRS_MULTI_SQL,
    Q_ER_PAIRS_SQL,
    _FIRSTNAME,
    _LASTNAME,
    _people,
    _with_block,
    block_key_sql,
    er_pairs,
    er_pairs_for,
    er_pairs_multikey,
    phonetic_key_sql,
    q_er_blocks,
    q_er_clusters,
    q_er_eval,
    q_er_eval_multi,
    q_er_pairs,
    q_er_pairs_multi,
    second_key_sql,
    with_block,
)
from changegen_spark.queries.er.sn import (  # noqa: F401
    Q_ER_EVAL_SN_MULTI_SQL,
    Q_ER_EVAL_SN_REFINED_SQL,
    Q_ER_EVAL_SN_SQL,
    Q_ER_EVAL_SN_SUFFIX_SQL,
    Q_ER_PAIRS_SN_MULTI_SQL,
    Q_ER_PAIRS_SN_REFINED_SQL,
    Q_ER_PAIRS_SN_SQL,
    Q_ER_PAIRS_SN_SUFFIX_SQL,
    SN_REFINE_COLS,
    SN_WINDOW,
    _sn_keyed,
    _sn_ranked,
    _sn_ranked2,
    _sn_ranked3,
    _sn_suffix_sql_body,
    _sn_union_eval,
    _window_pairs,
    er_pairs_sn,
    er_pairs_sn_multi,
    er_pairs_sn_suffix,
    q_er_eval_sn,
    q_er_eval_sn_multi,
    q_er_eval_sn_refined,
    q_er_eval_sn_suffix,
    q_er_pairs_sn,
    q_er_pairs_sn_multi,
    q_er_pairs_sn_refined,
    q_er_pairs_sn_suffix,
    suffix_key_sql,
)
from changegen_spark.queries.er.golden import (  # noqa: F401
    Q_ER_BCUBED_SQL,
    bcubed_from_pairs,
    Q_ER_GOLDEN_FULL_SQL,
    Q_ER_GOLDEN_SQL,
    q_er_bcubed,
    q_er_golden,
    q_er_golden_full,
)
from changegen_spark.queries.er.resolve import (  # noqa: F401
    ER_AMBIG_PATH,
    Q_ER_AMBIGUOUS_RESOLVE_SQL,
    Q_ER_NEW_ENTITY_MERGE_SQL,
    _ambig_people,
    new_entity_merge,
    q_er_ambiguous_resolve,
    q_er_new_entity_merge,
    reprobe_pool,
    resolve_ambiguous,
    updated_golden_names,
)
from changegen_spark.queries.er.retract import (  # noqa: F401
    Q_ER_GOLDEN_RETRACT_SQL,
    RETRACT_DELETES,
    golden_retract,
    q_er_golden_retract,
)
from changegen_spark.queries.er.incremental import (  # noqa: F401
    INC_MARGIN,
    Q_ER_CHAIN_AUDIT_SQL,
    Q_ER_INC_AUDIT_SQL,
    Q_ER_GOLDEN_INC_SQL,
    Q_ER_INCREMENTAL_MARGIN_SQL,
    Q_ER_INCREMENTAL_SQL,
    Q_ER_MARGIN_AUDIT_SQL,
    _inc_keyed,
    _inc_refined,
    golden_delta,
    incremental_assign,
    incremental_assign_margin,
    q_er_chain_audit,
    q_er_golden_inc,
    q_er_inc_audit,
    q_er_incremental,
    q_er_incremental_margin,
    q_er_margin_audit,
)

QUERIES = {
    "q_er_blocks": q_er_blocks,
    "q_er_pairs": q_er_pairs,
    "q_er_clusters": q_er_clusters,
    "q_er_eval": q_er_eval,
    "q_er_pairs_multi": q_er_pairs_multi,
    "q_er_eval_multi": q_er_eval_multi,
    "q_er_pairs_sn": q_er_pairs_sn,
    "q_er_eval_sn": q_er_eval_sn,
    "q_er_pairs_sn_multi": q_er_pairs_sn_multi,
    "q_er_eval_sn_multi": q_er_eval_sn_multi,
    "q_er_pairs_sn_refined": q_er_pairs_sn_refined,
    "q_er_eval_sn_refined": q_er_eval_sn_refined,
    "q_er_pairs_sn_suffix": q_er_pairs_sn_suffix,
    "q_er_eval_sn_suffix": q_er_eval_sn_suffix,
    "q_er_golden": q_er_golden,
    "q_er_golden_full": q_er_golden_full,
    "q_er_bcubed": q_er_bcubed,
    "q_er_incremental": q_er_incremental,
    "q_er_incremental_margin": q_er_incremental_margin,
    "q_er_golden_inc": q_er_golden_inc,
    "q_er_ambiguous_resolve": q_er_ambiguous_resolve,
    "q_er_new_entity_merge": q_er_new_entity_merge,
    "q_er_golden_retract": q_er_golden_retract,
    "q_er_inc_audit": q_er_inc_audit,
    "q_er_margin_audit": q_er_margin_audit,
    "q_er_chain_audit": q_er_chain_audit,
}

ORACLES = {
    "q_er_blocks": Q_ER_BLOCKS_SQL,
    "q_er_pairs": Q_ER_PAIRS_SQL,
    "q_er_clusters": Q_ER_CLUSTERS_SQL,
    "q_er_eval": Q_ER_EVAL_SQL,
    "q_er_pairs_multi": Q_ER_PAIRS_MULTI_SQL,
    "q_er_eval_multi": Q_ER_EVAL_MULTI_SQL,
    "q_er_pairs_sn": Q_ER_PAIRS_SN_SQL,
    "q_er_eval_sn": Q_ER_EVAL_SN_SQL,
    "q_er_pairs_sn_multi": Q_ER_PAIRS_SN_MULTI_SQL,
    "q_er_eval_sn_multi": Q_ER_EVAL_SN_MULTI_SQL,
    "q_er_pairs_sn_refined": Q_ER_PAIRS_SN_REFINED_SQL,
    "q_er_eval_sn_refined": Q_ER_EVAL_SN_REFINED_SQL,
    "q_er_pairs_sn_suffix": Q_ER_PAIRS_SN_SUFFIX_SQL,
    "q_er_eval_sn_suffix": Q_ER_EVAL_SN_SUFFIX_SQL,
    "q_er_golden": Q_ER_GOLDEN_SQL,
    "q_er_golden_full": Q_ER_GOLDEN_FULL_SQL,
    "q_er_bcubed": Q_ER_BCUBED_SQL,
    "q_er_incremental": Q_ER_INCREMENTAL_SQL,
    "q_er_incremental_margin": Q_ER_INCREMENTAL_MARGIN_SQL,
    "q_er_golden_inc": Q_ER_GOLDEN_INC_SQL,
    "q_er_ambiguous_resolve": Q_ER_AMBIGUOUS_RESOLVE_SQL,
    "q_er_new_entity_merge": Q_ER_NEW_ENTITY_MERGE_SQL,
    "q_er_golden_retract": Q_ER_GOLDEN_RETRACT_SQL,
    "q_er_inc_audit": Q_ER_INC_AUDIT_SQL,
    "q_er_margin_audit": Q_ER_MARGIN_AUDIT_SQL,
    "q_er_chain_audit": Q_ER_CHAIN_AUDIT_SQL,
}
