"""Entity resolution / record linkage (r6 new family).

Fuzzy duplicate-record matching over the shipped people fixture
(fixtures/er_people.parquet, built by tools/make_er.py with planted
typo classes and ground-truth entity_id):

* ``q_er_blocks``   — phonetic blocking-key inventory: block sizes and the
  implied candidate-pair count (the quadratic cost driver a blocking
  design must keep bounded);
* ``q_er_pairs``    — within-block candidate pairs refined by full-name
  Levenshtein ≤ 2 (Spark's JVM ``levenshtein`` vs DuckDB's — the same
  classic DP metric);
* ``q_er_clusters`` — matched pairs → connected components → entity
  assignments (reuses functions/clustering.connected_components, the
  checkpointed min-label propagation);
* ``q_er_eval``     — exact precision/recall against the planted truth,
  including the blocking recall ceiling (class-B first-letter typos land
  in a different block BY DESIGN — single-key phonetic blocking cannot
  see them, and the eval row quantifies that honestly).

The phonetic key is a soundex-style consonant skeleton defined ONCE as a
dialect-parameterized SQL expression (``phonetic_key_sql``) and executed
verbatim on BOTH engines (Spark ``F.expr`` / DuckDB text; the only
dialect difference is DuckDB's explicit ``'g'`` regexp flag).  Classic
test values reproduce (smith/smyth → s530, jackson → j250).

100 TB shape: blocking is a map-side key computation + one hash shuffle
per block key; refine cost is Σ block² — the q_er_blocks inventory is
exactly the skew audit a production linkage run does first.  Transitive
closure is the same bounded-diameter CC used by text dedup.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FIXDIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "fixtures")
)
ER_PATH = os.path.join(FIXDIR, "er_people.parquet")

LEV_MAX = 2  # full-name edit-distance refine threshold


def _rr(duck: bool):
    def rr(s: str, pat: str, rep: str) -> str:
        flag = ", 'g'" if duck else ""
        return f"regexp_replace({s}, '{pat}', '{rep}'{flag})"

    return rr


def phonetic_key_sql(expr: str, duck: bool) -> str:
    """Soundex-style phonetic key of ``expr`` as a SQL expression valid in
    both Spark SQL and DuckDB (dialect toggles only the regexp 'g' flag).

    letter + 3 digits: consonant classes b/f/p/v→1 c/g/j/k/q/s/x/z→2
    d/t→3 l→4 m/n→5 r→6; h/w transparent (equal codes across h/w
    collapse); vowels separate (equal codes across a vowel are kept);
    the first letter's own code is dropped, classic-style."""
    rr = _rr(duck)
    clean = rr(f"lower({expr})", "[^a-z]", "")
    m = rr(clean, "[hw]", "")
    for pat, rep in (
        ("[bfpv]", "1"),
        ("[cgjkqsxz]", "2"),
        ("[dt]", "3"),
        ("l", "4"),
        ("[mn]", "5"),
        ("r", "6"),
        ("[aeiouy]", "0"),
    ):
        m = rr(m, pat, rep)
    for d in "123456":
        m = rr(m, d + "{2,}", d)
    digits = rr(m, "0", "")
    first = f"substr({clean}, 1, 1)"
    tail = (
        f"CASE WHEN {first} IN ('a','e','i','o','u','y','h','w') "
        f"THEN {digits} ELSE substr({digits}, 2) END"
    )
    return f"({first} || substr({tail} || '000', 1, 3))"


_FIRSTNAME = "substr(name, 1, instr(name, ' ') - 1)"
_LASTNAME = "substr(name, instr(name, ' ') + 1)"


def block_key_sql(duck: bool) -> str:
    """Blocking key: phonetic(last name) + '|' + first initial."""
    return (
        phonetic_key_sql(_LASTNAME, duck)
        + f" || '|' || substr({_FIRSTNAME}, 1, 1)"
    )


def _people(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(ER_PATH)


def with_block(people: DataFrame) -> DataFrame:
    """(rec_id, nname, block_key) over any frame with rec_id + name."""
    return people.select(
        "rec_id",
        F.lower("name").alias("nname"),
        F.expr(block_key_sql(duck=False)).alias("block_key"),
    )


def _with_block(spark: SparkSession) -> DataFrame:
    return with_block(_people(spark))


def q_er_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-key inventory: records per block and the implied
    within-block candidate pairs (n·(n-1)/2) — Σ over blocks is the
    refine stage's total comparison count, the number a linkage design
    audits before running (quadratic in the largest block)."""
    return (
        _with_block(spark)
        .groupBy("block_key")
        .agg(F.count("*").alias("n_records"))
        .select(
            "block_key",
            "n_records",
            (F.col("n_records") * (F.col("n_records") - 1) / 2)
            .cast("long")
            .alias("n_cand_pairs"),
        )
        .orderBy(F.desc("n_records"), "block_key")
        .limit(40)
    )


Q_ER_BLOCKS_SQL = f"""
WITH keyed AS (
  SELECT rec_id, {block_key_sql(duck=True)} AS block_key
  FROM '{ER_PATH}'
)
SELECT block_key, count(*) AS n_records,
       CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS n_cand_pairs
FROM keyed GROUP BY block_key
ORDER BY n_records DESC, block_key
LIMIT 40
"""


def er_pairs_for(people: DataFrame, extra_block_cols=()) -> DataFrame:
    """(rec_a, rec_b, lev) matched pairs over ANY (rec_id, name) frame:
    block equi-join + Levenshtein refine.  ``extra_block_cols`` adds
    exact-match fields (e.g. city) to the blocking key — the standard
    lever at population scale, where same-name-different-person mass is
    quadratic in name frequency and a single phonetic key's entropy
    stops scaling with n (the ladder in bench.py measures both
    schemes).  The scale ladder drives this over
    sources/scaleup.build_er_records."""
    extra = list(extra_block_cols)
    k = with_block(people.select("rec_id", "name", *extra))
    if extra:
        k = k.join(people.select("rec_id", *extra), "rec_id")
    a = k.select(
        F.col("rec_id").alias("rec_a"),
        F.col("nname").alias("na"),
        "block_key",
        *extra,
    )
    b = k.select(
        F.col("rec_id").alias("rec_b"),
        F.col("nname").alias("nb"),
        "block_key",
        *extra,
    )
    return (
        a.join(b, ["block_key", *extra])
        .filter(F.col("rec_a") < F.col("rec_b"))
        .select(
            "rec_a",
            "rec_b",
            F.levenshtein("na", "nb").cast("long").alias("lev"),
        )
        .filter(F.col("lev") <= LEV_MAX)
    )


def er_pairs(spark: SparkSession) -> DataFrame:
    return er_pairs_for(_people(spark))


def q_er_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return er_pairs(spark).orderBy("rec_a", "rec_b")


_PAIRS_SQL_BODY = f"""
keyed AS (
  SELECT rec_id, lower(name) AS nname, {block_key_sql(duck=True)} AS block_key
  FROM '{ER_PATH}'
), er_pairs AS (
  SELECT a.rec_id AS rec_a, b.rec_id AS rec_b,
         CAST(levenshtein(a.nname, b.nname) AS BIGINT) AS lev
  FROM keyed a JOIN keyed b
    ON a.block_key = b.block_key AND a.rec_id < b.rec_id
  WHERE levenshtein(a.nname, b.nname) <= {LEV_MAX}
)
"""

Q_ER_PAIRS_SQL = f"""
WITH {_PAIRS_SQL_BODY}
SELECT rec_a, rec_b, lev FROM er_pairs ORDER BY rec_a, rec_b
"""


def q_er_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matched pairs → connected components → (rec_id, entity): the
    transitive-closure step that turns pairwise matches into entity
    groups (entity = min rec_id of the component, dedup-cluster
    convention).  Only records participating in ≥1 match appear."""
    from changegen_spark.functions.clustering import connected_components

    comp = connected_components(er_pairs(spark), src="rec_a", dst="rec_b")
    return comp.select(
        F.col("node").alias("rec_id"), F.col("comp").alias("entity")
    ).orderBy("rec_id")


Q_ER_CLUSTERS_SQL = f"""
WITH RECURSIVE {_PAIRS_SQL_BODY}
, edges AS (
  SELECT rec_a AS a, rec_b AS b FROM er_pairs
  UNION SELECT rec_b, rec_a FROM er_pairs
), reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS rec_id, least(a, min(b)) AS entity
FROM reach GROUP BY a
ORDER BY rec_id
"""


def q_er_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linkage quality vs the planted truth: predicted pairs vs all
    same-entity record pairs.  ``block_recall_e6`` is the ceiling imposed
    by blocking alone (true pairs whose two records share a block key) —
    the honest decomposition: recall lost to blocking (class-B planted
    typos) vs recall lost to the refine threshold."""
    pred = er_pairs(spark).select("rec_a", "rec_b")
    ppl = _with_block(spark).join(
        _people(spark).select("rec_id", "entity_id"), "rec_id"
    )
    a = ppl.select(
        F.col("rec_id").alias("rec_a"),
        F.col("entity_id").alias("ea"),
        F.col("block_key").alias("ba"),
    )
    b = ppl.select(
        F.col("rec_id").alias("rec_b"),
        F.col("entity_id").alias("eb"),
        F.col("block_key").alias("bb"),
    )
    true_pairs = (
        a.join(b, [a.ea == b.eb, a.rec_a < b.rec_b])
        .select("rec_a", "rec_b", (F.col("ba") == F.col("bb")).alias("same_block"))
    )
    n_pred = pred.count()
    n_true = true_pairs.count()
    n_blocked = true_pairs.filter("same_block").count()
    n_tp = pred.join(true_pairs, ["rec_a", "rec_b"]).count()
    e6 = lambda num, den: int(round(1e6 * num / den)) if den else 0  # noqa: E731
    return spark.createDataFrame(
        [
            (
                n_pred,
                n_true,
                n_tp,
                e6(n_tp, n_pred),
                e6(n_tp, n_true),
                e6(n_blocked, n_true),
            )
        ],
        "n_pred long, n_true long, n_tp long, precision_e6 long, "
        "recall_e6 long, block_recall_e6 long",
    )


Q_ER_EVAL_SQL = f"""
WITH {_PAIRS_SQL_BODY}
, truth AS (
  SELECT a.rec_id AS rec_a, b.rec_id AS rec_b,
         ka.block_key = kb.block_key AS same_block
  FROM '{ER_PATH}' a JOIN '{ER_PATH}' b
    ON a.entity_id = b.entity_id AND a.rec_id < b.rec_id
  JOIN keyed ka ON ka.rec_id = a.rec_id
  JOIN keyed kb ON kb.rec_id = b.rec_id
), counts AS (
  SELECT (SELECT count(*) FROM er_pairs) AS n_pred,
         (SELECT count(*) FROM truth) AS n_true,
         (SELECT count(*) FROM truth WHERE same_block) AS n_blocked,
         (SELECT count(*) FROM er_pairs p JOIN truth t
            ON p.rec_a = t.rec_a AND p.rec_b = t.rec_b) AS n_tp
)
SELECT CAST(n_pred AS BIGINT) AS n_pred, CAST(n_true AS BIGINT) AS n_true,
       CAST(n_tp AS BIGINT) AS n_tp,
       CASE WHEN n_pred > 0 THEN CAST(round(1e6 * n_tp / n_pred) AS BIGINT) ELSE 0 END AS precision_e6,
       CASE WHEN n_true > 0 THEN CAST(round(1e6 * n_tp / n_true) AS BIGINT) ELSE 0 END AS recall_e6,
       CASE WHEN n_true > 0 THEN CAST(round(1e6 * n_blocked / n_true) AS BIGINT) ELSE 0 END AS block_recall_e6
FROM counts
"""


def second_key_sql(duck: bool) -> str:
    """Second blocking key: phonetic(FIRST name) + city — orthogonal to
    the primary key's failure mode (a last-name first-letter typo moves a
    record out of its phonetic block but leaves first name and city
    untouched)."""
    return phonetic_key_sql(_FIRSTNAME, duck) + " || '|' || city"


def er_pairs_multikey(people: DataFrame) -> DataFrame:
    """Multi-key blocking (the standard recall lever at population
    scale): candidates from the UNION of two independent blocking keys,
    each an equi-join, refined by the same Levenshtein rule; distinct
    pairs.  Candidate cost is the SUM of the two keys' Σ block² — still
    never a cartesian — and the recall ceiling becomes the union of the
    two keys' coverage: a true pair is lost only if BOTH keys miss it."""
    k2 = people.select(
        "rec_id",
        F.lower("name").alias("nname"),
        F.expr(second_key_sql(duck=False)).alias("block_key"),
    )
    a = k2.select(
        F.col("rec_id").alias("rec_a"), F.col("nname").alias("na"), "block_key"
    )
    b = k2.select(
        F.col("rec_id").alias("rec_b"), F.col("nname").alias("nb"), "block_key"
    )
    pairs2 = (
        a.join(b, "block_key")
        .filter(F.col("rec_a") < F.col("rec_b"))
        .select(
            "rec_a",
            "rec_b",
            F.levenshtein("na", "nb").cast("long").alias("lev"),
        )
        .filter(F.col("lev") <= LEV_MAX)
    )
    return er_pairs_for(people).unionByName(pairs2).distinct()


def q_er_pairs_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return er_pairs_multikey(_people(spark)).orderBy("rec_a", "rec_b")


_MULTI_SQL_BODY = f"""
{_PAIRS_SQL_BODY}, keyed2 AS (
  SELECT rec_id, lower(name) AS nname, {second_key_sql(duck=True)} AS bk
  FROM '{ER_PATH}'
), pairs2 AS (
  SELECT a.rec_id AS rec_a, b.rec_id AS rec_b,
         CAST(levenshtein(a.nname, b.nname) AS BIGINT) AS lev
  FROM keyed2 a JOIN keyed2 b
    ON a.bk = b.bk AND a.rec_id < b.rec_id
  WHERE levenshtein(a.nname, b.nname) <= {LEV_MAX}
), multi AS (
  SELECT rec_a, rec_b, lev FROM er_pairs
  UNION
  SELECT rec_a, rec_b, lev FROM pairs2
)
"""

Q_ER_PAIRS_MULTI_SQL = f"""
WITH {_MULTI_SQL_BODY}
SELECT rec_a, rec_b, lev FROM multi ORDER BY rec_a, rec_b
"""


def q_er_eval_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_er_eval under multi-key blocking: the class-B misses the
    single-key eval quantifies as its designed blocking loss are
    recovered here (first-name-phonetic+city sees through a last-name
    first-letter typo), so recall reaches 1.0 on the fixture; measured
    precision RISES too (the only false pairs are the two the single key
    already admits — the second key added 16 true pairs and zero false
    ones), the measured case for the multi-key lever SCALE.md promises
    at population scale."""
    pred = er_pairs_multikey(_people(spark)).select("rec_a", "rec_b")
    ppl = _people(spark).select(
        "rec_id",
        "entity_id",
        F.expr(block_key_sql(duck=False)).alias("block_key"),
        F.expr(second_key_sql(duck=False)).alias("bk2"),
    )
    a = ppl.select(
        F.col("rec_id").alias("rec_a"),
        F.col("entity_id").alias("ea"),
        F.col("block_key").alias("ba"),
        F.col("bk2").alias("b2a"),
    )
    b = ppl.select(
        F.col("rec_id").alias("rec_b"),
        F.col("entity_id").alias("eb"),
        F.col("block_key").alias("bb"),
        F.col("bk2").alias("b2b"),
    )
    true_pairs = a.join(b, [a.ea == b.eb, a.rec_a < b.rec_b]).select(
        "rec_a",
        "rec_b",
        (
            (F.col("ba") == F.col("bb")) | (F.col("b2a") == F.col("b2b"))
        ).alias("same_block"),
    )
    n_pred = pred.count()
    n_true = true_pairs.count()
    n_blocked = true_pairs.filter("same_block").count()
    n_tp = pred.join(true_pairs, ["rec_a", "rec_b"]).count()
    e6 = lambda num, den: int(round(1e6 * num / den)) if den else 0  # noqa: E731
    return spark.createDataFrame(
        [
            (
                n_pred,
                n_true,
                n_tp,
                e6(n_tp, n_pred),
                e6(n_tp, n_true),
                e6(n_blocked, n_true),
            )
        ],
        "n_pred long, n_true long, n_tp long, precision_e6 long, "
        "recall_e6 long, block_recall_e6 long",
    )


Q_ER_EVAL_MULTI_SQL = f"""
WITH {_MULTI_SQL_BODY}, truth AS (
  SELECT a.rec_id AS rec_a, b.rec_id AS rec_b,
         (ka.block_key = kb.block_key OR k2a.bk = k2b.bk) AS same_block
  FROM '{ER_PATH}' a JOIN '{ER_PATH}' b
    ON a.entity_id = b.entity_id AND a.rec_id < b.rec_id
  JOIN keyed ka ON ka.rec_id = a.rec_id
  JOIN keyed kb ON kb.rec_id = b.rec_id
  JOIN keyed2 k2a ON k2a.rec_id = a.rec_id
  JOIN keyed2 k2b ON k2b.rec_id = b.rec_id
), counts AS (
  SELECT (SELECT count(*) FROM multi) AS n_pred,
         (SELECT count(*) FROM truth) AS n_true,
         (SELECT count(*) FROM truth WHERE same_block) AS n_blocked,
         (SELECT count(*) FROM multi p JOIN truth t
            ON p.rec_a = t.rec_a AND p.rec_b = t.rec_b) AS n_tp
)
SELECT CAST(n_pred AS BIGINT) AS n_pred, CAST(n_true AS BIGINT) AS n_true,
       CAST(n_tp AS BIGINT) AS n_tp,
       CASE WHEN n_pred > 0 THEN CAST(round(1e6 * n_tp / n_pred) AS BIGINT) ELSE 0 END AS precision_e6,
       CASE WHEN n_true > 0 THEN CAST(round(1e6 * n_tp / n_true) AS BIGINT) ELSE 0 END AS recall_e6,
       CASE WHEN n_true > 0 THEN CAST(round(1e6 * n_blocked / n_true) AS BIGINT) ELSE 0 END AS block_recall_e6
FROM counts
"""


# --- sorted-neighborhood blocking (r8) ---------------------------------------

SN_WINDOW = 4  # each record compares against the next w-1 in sort order


def _sn_keyed(people: DataFrame) -> DataFrame:
    """(rec_id, nname, skey): the sorted-neighborhood sort key — blocking
    key, then normalized name, then a zero-padded rec_id so the total
    order is unambiguous and identical in both engines (string order on
    the raw numeric id would diverge).  Components are coalesced to ''
    (r8 advice): concat_ws silently SKIPS a NULL while the oracle's ||
    propagates it, so a NULL name/city would give the record a different
    global sort position per engine and break pair parity."""
    return with_block(people).select(
        "rec_id",
        "nname",
        F.concat_ws(
            "|",
            F.coalesce("block_key", F.lit("")),
            F.coalesce("nname", F.lit("")),
            F.lpad(F.col("rec_id").cast("string"), 12, "0"),
        ).alias("skey"),
    )


def _sn_ranked(people: DataFrame) -> DataFrame:
    """Global dense rank in skey order WITHOUT a single-partition window:
    repartitionByRange on the key (range partitions concatenate to the
    global order) + the ids.py distributed two-phase prefix sum.

    The localCheckpoint fence after the range exchange is CORRECTNESS,
    not caching (r9 postmortem): repartitionByRange samples its
    boundaries with a fresh random seed per execution, and the
    distributed rank executes its input TWICE (per-partition counts,
    then the offset join).  Unfenced, the two executions can see
    different boundaries, so offsets from one partitioning get applied
    to rows of another — ranks stop being a permutation and the SN pair
    set wobbles run to run (measured at 100k: 168318/168318/168300/
    168305 across four counts; byte-stable after the fence)."""
    from changegen_spark.operators.ids import assign_sequential_ids

    k = (
        _sn_keyed(people)
        .repartitionByRange(32, "skey")
        .localCheckpoint(eager=False)
    )
    return assign_sequential_ids(
        k, order_by=["skey"], out_col="rank", mode="distributed"
    ).select("rec_id", "nname", "rank")


def er_pairs_sn(
    people: DataFrame, window: int = SN_WINDOW, refine_cols=()
) -> DataFrame:
    """(rec_a, rec_b, lev): sorted-neighborhood candidate generation
    (Hernández & Stolfo 1995) + the same Levenshtein refine as the
    blocked schemes.  Candidates are EXACTLY Σ min(window-1, n-rank) <
    n·(window-1) — linear by construction at ANY block-size
    distribution.  This is the fix the ER ladder's 1M rung prescribes:
    key-based blocking's block sizes are Θ(n) once the key vocabulary
    saturates (city at the third decade), while SN's candidate budget
    never depends on the key distribution — only its RECALL does (a
    true pair further than window-1 apart in sort order is lost; the
    eval decomposes exactly that).

    Scale shape: one range shuffle for the global order, a broadcast of
    per-partition counts, and a rank+d equi-join — no range/theta join,
    no single-partition stage.

    ``refine_cols``: extra exact-equality attributes checked in the
    REFINE (not the sort key) — they cut false matches (2.94M → 8.4k
    pairs at the 1M rung) and cannot reintroduce quadratic candidates
    (the window already bounded them).  They do NOT fix the density
    recall limit: at name saturation a true duplicate sits beyond the
    window behind same-name strangers (measured recall 0.016 vs key+
    city blocking's 0.634 at 1M — SCALE.md's regime rule); SN is the
    right scheme only while sort-adjacency still implies same-entity,
    which q_er_eval_sn's window ceiling measures."""
    return _window_pairs(_sn_ranked(people), people, window, list(refine_cols))


def _window_pairs(
    ranked: DataFrame, people: DataFrame, window: int, refine: list
) -> DataFrame:
    """rank+d equi-join over one SN pass's ranked frame: each record
    probes the next window-1 ranks, optional exact-equality ``refine``
    attributes filter the candidates, Levenshtein refines the survivors.
    Shared by the single-pass, multi-pass, and refined SN schemes."""
    if refine:
        ranked = ranked.join(people.select("rec_id", *refine), "rec_id")
    ranked = ranked.localCheckpoint(eager=False)
    probes = ranked.select(
        F.col("rec_id").alias("id_a"),
        F.col("nname").alias("na"),
        *[F.col(c).alias(f"{c}_a") for c in refine],
        F.explode(
            F.sequence(F.col("rank") + 1, F.col("rank") + window - 1)
        ).alias("r2"),
    )
    b = ranked.select(
        F.col("rank").alias("r2"),
        F.col("rec_id").alias("id_b"),
        F.col("nname").alias("nb"),
        *[F.col(c).alias(f"{c}_b") for c in refine],
    )
    joined = probes.join(b, "r2")
    for c in refine:
        joined = joined.filter(F.col(f"{c}_a") == F.col(f"{c}_b"))
    return (
        joined.select(
            F.least("id_a", "id_b").alias("rec_a"),
            F.greatest("id_a", "id_b").alias("rec_b"),
            F.levenshtein("na", "nb").cast("long").alias("lev"),
        )
        .filter(F.col("lev") <= LEV_MAX)
    )


def q_er_pairs_sn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return er_pairs_sn(_people(spark)).orderBy("rec_a", "rec_b")


def _sn_ranked2(people: DataFrame) -> DataFrame:
    """Second-pass global rank: CITY-FIRST sort key (city | block_key |
    name | id), same distributed two-phase machinery as _sn_ranked."""
    from changegen_spark.operators.ids import assign_sequential_ids

    keyed2 = with_block(people).join(
        people.select("rec_id", "city"), "rec_id"
    ).select(
        "rec_id",
        "nname",
        F.concat_ws(
            "|",
            F.coalesce("city", F.lit("")),
            F.coalesce("block_key", F.lit("")),
            F.coalesce("nname", F.lit("")),
            F.lpad(F.col("rec_id").cast("string"), 12, "0"),
        ).alias("skey"),
    )
    # same correctness fence as _sn_ranked: the distributed rank
    # double-executes its input, and unfenced range boundaries are
    # re-sampled per execution
    return assign_sequential_ids(
        keyed2.repartitionByRange(32, "skey").localCheckpoint(eager=False),
        order_by=["skey"],
        out_col="rank",
        mode="distributed",
    ).select("rec_id", "nname", "rank")


def er_pairs_sn_multi(
    people: DataFrame, window: int = SN_WINDOW, refine_cols=()
) -> DataFrame:
    """Multi-pass sorted neighborhood (the classical density fix): a
    second pass sorts CITY-FIRST (city | block_key | name | id), so a
    true duplicate hidden behind same-name strangers in the global name
    order becomes adjacent within its city's much smaller name
    neighborhood.  Union of both passes, distinct — candidates still ≤
    2·n·(w−1), linear.  Measured at the 1M rung: recall 0.016 (single
    pass) → 0.563 (two passes); see SCALE.md.

    ``refine_cols`` (r8 verdict #2) composes the two orthogonal fixes:
    multi-pass raises RECALL (more sort orders → more reachable true
    pairs), exact-equality refine raises PRECISION (a window candidate
    must also agree on the refine attributes before Levenshtein).  The
    production operating point is both — at the 1M rung city-refine
    lifts raw precision 0.030 → ≫0.03 at the same ~0.56 recall
    (duplicates share city by fixture construction; a real pipeline
    picks attributes with the same property)."""
    refine = list(refine_cols)
    p1 = _window_pairs(_sn_ranked(people), people, window, refine)
    p2 = _window_pairs(_sn_ranked2(people), people, window, refine)
    return p1.unionByName(p2).distinct()


def q_er_pairs_sn_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return er_pairs_sn_multi(_people(spark)).orderBy("rec_a", "rec_b")


def q_er_eval_sn_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass SN linkage quality vs the planted truth: the window
    ceiling is now the UNION of the two sort orders (a true pair is
    reachable if it sits within window-1 positions in EITHER) — the
    ceiling the city-first pass exists to raise."""
    pred = er_pairs_sn_multi(_people(spark)).select("rec_a", "rec_b")
    return _sn_union_eval(spark, pred)


def _sn_union_eval(
    spark: SparkSession, pred: DataFrame, rankers=None
) -> DataFrame:
    """Quality of ``pred`` against the planted truth with the multi-pass
    union window ceiling (shared by the multi/refined/suffix SN evals —
    refine changes precision, never the reachable-pair ceiling).
    ``rankers`` is the list of sort-pass rank builders whose windows
    union into the ceiling (default: the two-pass name-first +
    city-first orders)."""
    if rankers is None:
        rankers = (_sn_ranked, _sn_ranked2)
    ppl = _people(spark).select("rec_id", "entity_id")
    rcols = []
    for i, ranked in enumerate(rankers, start=1):
        r = ranked(_people(spark)).select(
            "rec_id", F.col("rank").alias(f"r{i}")
        )
        ppl = ppl.join(r, "rec_id")
        rcols.append(f"r{i}")
    a = ppl.select(
        F.col("rec_id").alias("rec_a"),
        F.col("entity_id").alias("ea"),
        *[F.col(c).alias(f"{c}_a") for c in rcols],
    )
    b = ppl.select(
        F.col("rec_id").alias("rec_b"),
        F.col("entity_id").alias("eb"),
        *[F.col(c).alias(f"{c}_b") for c in rcols],
    )
    in_w = None
    for c in rcols:
        this = F.abs(F.col(f"{c}_a") - F.col(f"{c}_b")) <= SN_WINDOW - 1
        in_w = this if in_w is None else (in_w | this)
    true_pairs = a.join(b, [a.ea == b.eb, a.rec_a < b.rec_b]).select(
        "rec_a",
        "rec_b",
        in_w.alias("in_window"),
    )
    n_pred = pred.count()
    n_true = true_pairs.count()
    n_reach = true_pairs.filter("in_window").count()
    n_tp = pred.join(true_pairs, ["rec_a", "rec_b"]).count()
    e6 = lambda num, den: int(round(1e6 * num / den)) if den else 0  # noqa: E731
    return spark.createDataFrame(
        [
            (
                n_pred,
                n_true,
                n_tp,
                e6(n_tp, n_pred),
                e6(n_tp, n_true),
                e6(n_reach, n_true),
            )
        ],
        "n_pred long, n_true long, n_tp long, precision_e6 long, "
        "recall_e6 long, window_recall_e6 long",
    )


_SN_SQL_BODY = f"""
snkeyed AS (
  SELECT rec_id, lower(name) AS nname,
         coalesce({block_key_sql(duck=True)}, '') || '|'
           || coalesce(lower(name), '') || '|'
           || lpad(CAST(rec_id AS VARCHAR), 12, '0') AS skey
  FROM '{ER_PATH}'
), snranked AS (
  SELECT rec_id, nname, row_number() OVER (ORDER BY skey) AS r FROM snkeyed
), sn_pairs AS (
  SELECT least(a.rec_id, b.rec_id) AS rec_a,
         greatest(a.rec_id, b.rec_id) AS rec_b,
         CAST(levenshtein(a.nname, b.nname) AS BIGINT) AS lev
  FROM snranked a JOIN snranked b
    ON b.r > a.r AND b.r <= a.r + {SN_WINDOW - 1}
  WHERE levenshtein(a.nname, b.nname) <= {LEV_MAX}
)
"""

Q_ER_PAIRS_SN_SQL = f"""
WITH {_SN_SQL_BODY}
SELECT rec_a, rec_b, lev FROM sn_pairs ORDER BY rec_a, rec_b
"""

Q_ER_PAIRS_SN_MULTI_SQL = f"""
WITH {_SN_SQL_BODY}
, snkeyed2 AS (
  SELECT rec_id, lower(name) AS nname,
         coalesce(city, '') || '|'
           || coalesce({block_key_sql(duck=True)}, '') || '|'
           || coalesce(lower(name), '')
           || '|' || lpad(CAST(rec_id AS VARCHAR), 12, '0') AS skey
  FROM '{ER_PATH}'
), snranked2 AS (
  SELECT rec_id, nname, row_number() OVER (ORDER BY skey) AS r FROM snkeyed2
), sn_pairs2 AS (
  SELECT least(a.rec_id, b.rec_id) AS rec_a,
         greatest(a.rec_id, b.rec_id) AS rec_b,
         CAST(levenshtein(a.nname, b.nname) AS BIGINT) AS lev
  FROM snranked2 a JOIN snranked2 b
    ON b.r > a.r AND b.r <= a.r + {SN_WINDOW - 1}
  WHERE levenshtein(a.nname, b.nname) <= {LEV_MAX}
)
SELECT DISTINCT rec_a, rec_b, lev FROM (
  SELECT * FROM sn_pairs UNION ALL SELECT * FROM sn_pairs2
) ORDER BY rec_a, rec_b
"""


def q_er_eval_sn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SN linkage quality vs the planted truth, with the recall ceiling
    decomposed the same way q_er_eval does for blocking:
    ``window_recall_e6`` = true pairs within window-1 positions in sort
    order — recall lost to the WINDOW vs lost to the refine threshold."""
    pred = er_pairs_sn(_people(spark)).select("rec_a", "rec_b")
    ranked = _sn_ranked(_people(spark))
    ppl = ranked.join(_people(spark).select("rec_id", "entity_id"), "rec_id")
    a = ppl.select(
        F.col("rec_id").alias("rec_a"),
        F.col("entity_id").alias("ea"),
        F.col("rank").alias("ra"),
    )
    b = ppl.select(
        F.col("rec_id").alias("rec_b"),
        F.col("entity_id").alias("eb"),
        F.col("rank").alias("rb"),
    )
    true_pairs = a.join(b, [a.ea == b.eb, a.rec_a < b.rec_b]).select(
        "rec_a",
        "rec_b",
        (F.abs(F.col("ra") - F.col("rb")) <= SN_WINDOW - 1).alias("in_window"),
    )
    n_pred = pred.count()
    n_true = true_pairs.count()
    n_reach = true_pairs.filter("in_window").count()
    n_tp = pred.join(true_pairs, ["rec_a", "rec_b"]).count()
    e6 = lambda num, den: int(round(1e6 * num / den)) if den else 0  # noqa: E731
    return spark.createDataFrame(
        [
            (
                n_pred,
                n_true,
                n_tp,
                e6(n_tp, n_pred),
                e6(n_tp, n_true),
                e6(n_reach, n_true),
            )
        ],
        "n_pred long, n_true long, n_tp long, precision_e6 long, "
        "recall_e6 long, window_recall_e6 long",
    )


Q_ER_EVAL_SN_SQL = f"""
WITH {_SN_SQL_BODY}
, truth AS (
  SELECT a.rec_id AS rec_a, b.rec_id AS rec_b,
         abs(ra.r - rb.r) <= {SN_WINDOW - 1} AS in_window
  FROM '{ER_PATH}' a JOIN '{ER_PATH}' b
    ON a.entity_id = b.entity_id AND a.rec_id < b.rec_id
  JOIN snranked ra ON ra.rec_id = a.rec_id
  JOIN snranked rb ON rb.rec_id = b.rec_id
), counts AS (
  SELECT (SELECT count(*) FROM sn_pairs) AS n_pred,
         (SELECT count(*) FROM truth) AS n_true,
         (SELECT count(*) FROM truth WHERE in_window) AS n_reach,
         (SELECT count(*) FROM sn_pairs p JOIN truth t
            ON p.rec_a = t.rec_a AND p.rec_b = t.rec_b) AS n_tp
)
SELECT CAST(n_pred AS BIGINT) AS n_pred, CAST(n_true AS BIGINT) AS n_true,
       CAST(n_tp AS BIGINT) AS n_tp,
       CASE WHEN n_pred > 0 THEN CAST(round(1e6 * n_tp / n_pred) AS BIGINT) ELSE 0 END AS precision_e6,
       CASE WHEN n_true > 0 THEN CAST(round(1e6 * n_tp / n_true) AS BIGINT) ELSE 0 END AS recall_e6,
       CASE WHEN n_true > 0 THEN CAST(round(1e6 * n_reach / n_true) AS BIGINT) ELSE 0 END AS window_recall_e6
FROM counts
"""



Q_ER_EVAL_SN_MULTI_SQL = f"""
WITH {_SN_SQL_BODY}
, snkeyed2 AS (
  SELECT rec_id, lower(name) AS nname,
         coalesce(city, '') || '|'
           || coalesce({block_key_sql(duck=True)}, '') || '|'
           || coalesce(lower(name), '')
           || '|' || lpad(CAST(rec_id AS VARCHAR), 12, '0') AS skey
  FROM '{ER_PATH}'
), snranked2 AS (
  SELECT rec_id, nname, row_number() OVER (ORDER BY skey) AS r FROM snkeyed2
), sn_pairs2 AS (
  SELECT least(a.rec_id, b.rec_id) AS rec_a,
         greatest(a.rec_id, b.rec_id) AS rec_b,
         CAST(levenshtein(a.nname, b.nname) AS BIGINT) AS lev
  FROM snranked2 a JOIN snranked2 b
    ON b.r > a.r AND b.r <= a.r + {SN_WINDOW - 1}
  WHERE levenshtein(a.nname, b.nname) <= {LEV_MAX}
), pred AS (
  SELECT DISTINCT rec_a, rec_b FROM (
    SELECT rec_a, rec_b FROM sn_pairs UNION ALL SELECT rec_a, rec_b FROM sn_pairs2
  )
), truth AS (
  SELECT a.rec_id AS rec_a, b.rec_id AS rec_b,
         (abs(ra1.r - rb1.r) <= {SN_WINDOW - 1}
          OR abs(ra2.r - rb2.r) <= {SN_WINDOW - 1}) AS in_window
  FROM '{ER_PATH}' a JOIN '{ER_PATH}' b
    ON a.entity_id = b.entity_id AND a.rec_id < b.rec_id
  JOIN snranked ra1 ON ra1.rec_id = a.rec_id
  JOIN snranked rb1 ON rb1.rec_id = b.rec_id
  JOIN snranked2 ra2 ON ra2.rec_id = a.rec_id
  JOIN snranked2 rb2 ON rb2.rec_id = b.rec_id
), counts AS (
  SELECT (SELECT count(*) FROM pred) AS n_pred,
         (SELECT count(*) FROM truth) AS n_true,
         (SELECT count(*) FROM truth WHERE in_window) AS n_reach,
         (SELECT count(*) FROM pred p JOIN truth t
            ON p.rec_a = t.rec_a AND p.rec_b = t.rec_b) AS n_tp
)
SELECT CAST(n_pred AS BIGINT) AS n_pred, CAST(n_true AS BIGINT) AS n_true,
       CAST(n_tp AS BIGINT) AS n_tp,
       CASE WHEN n_pred > 0 THEN CAST(round(1e6 * n_tp / n_pred) AS BIGINT) ELSE 0 END AS precision_e6,
       CASE WHEN n_true > 0 THEN CAST(round(1e6 * n_tp / n_true) AS BIGINT) ELSE 0 END AS recall_e6,
       CASE WHEN n_true > 0 THEN CAST(round(1e6 * n_reach / n_true) AS BIGINT) ELSE 0 END AS window_recall_e6
FROM counts
"""

# --- multi-pass SN + attribute refine (r8 verdict #2) ------------------------

SN_REFINE_COLS = ("city",)


def q_er_pairs_sn_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production SN operating point: BOTH classical fixes composed —
    two sort passes for recall (a true pair adjacent in either order is
    reachable) and exact-equality city refine for precision (a window
    candidate must share city before Levenshtein).  Candidates stay ≤
    2·n·(w−1) — refine filters inside the already-linear window, so it
    cannot reintroduce quadratic cost at any key distribution."""
    return er_pairs_sn_multi(
        _people(spark), refine_cols=SN_REFINE_COLS
    ).orderBy("rec_a", "rec_b")


def q_er_eval_sn_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Refined multi-pass SN quality vs planted truth.  window_recall_e6
    is the same union-window ceiling as the unrefined eval (refine can
    only drop candidates); the fixture's duplicates share city, so
    recall_e6 must match the unrefined multi eval while precision_e6
    rises — the measured claim SCALE.md's 1M rung re-checks at density."""
    pred = er_pairs_sn_multi(
        _people(spark), refine_cols=SN_REFINE_COLS
    ).select("rec_a", "rec_b")
    return _sn_union_eval(spark, pred)


def _sn_refined_sql_body() -> str:
    bk = block_key_sql(duck=True)
    pair = """
  SELECT least(a.rec_id, b.rec_id) AS rec_a,
         greatest(a.rec_id, b.rec_id) AS rec_b,
         CAST(levenshtein(a.nname, b.nname) AS BIGINT) AS lev
  FROM {r} a JOIN {r} b
    ON b.r > a.r AND b.r <= a.r + {w} AND a.city = b.city
  WHERE levenshtein(a.nname, b.nname) <= {lv}"""
    return f"""
snkeyedr AS (
  SELECT rec_id, lower(name) AS nname, city,
         coalesce({bk}, '') || '|'
           || coalesce(lower(name), '') || '|'
           || lpad(CAST(rec_id AS VARCHAR), 12, '0') AS skey
  FROM '{ER_PATH}'
), snrankedr AS (
  SELECT rec_id, nname, city, row_number() OVER (ORDER BY skey) AS r
  FROM snkeyedr
), snkeyed2r AS (
  SELECT rec_id, lower(name) AS nname, city,
         coalesce(city, '') || '|'
           || coalesce({bk}, '') || '|'
           || coalesce(lower(name), '') || '|'
           || lpad(CAST(rec_id AS VARCHAR), 12, '0') AS skey
  FROM '{ER_PATH}'
), snranked2r AS (
  SELECT rec_id, nname, city, row_number() OVER (ORDER BY skey) AS r
  FROM snkeyed2r
), refined AS (
  SELECT DISTINCT rec_a, rec_b, lev FROM (
    {pair.format(r='snrankedr', w=SN_WINDOW - 1, lv=LEV_MAX)}
    UNION ALL
    {pair.format(r='snranked2r', w=SN_WINDOW - 1, lv=LEV_MAX)}
  )
)"""


Q_ER_PAIRS_SN_REFINED_SQL = f"""
WITH {_sn_refined_sql_body()}
SELECT rec_a, rec_b, lev FROM refined ORDER BY rec_a, rec_b
"""

Q_ER_EVAL_SN_REFINED_SQL = f"""
WITH {_sn_refined_sql_body()}
, truth AS (
  SELECT a.rec_id AS rec_a, b.rec_id AS rec_b,
         (abs(ra1.r - rb1.r) <= {SN_WINDOW - 1}
          OR abs(ra2.r - rb2.r) <= {SN_WINDOW - 1}) AS in_window
  FROM '{ER_PATH}' a JOIN '{ER_PATH}' b
    ON a.entity_id = b.entity_id AND a.rec_id < b.rec_id
  JOIN snrankedr ra1 ON ra1.rec_id = a.rec_id
  JOIN snrankedr rb1 ON rb1.rec_id = b.rec_id
  JOIN snranked2r ra2 ON ra2.rec_id = a.rec_id
  JOIN snranked2r rb2 ON rb2.rec_id = b.rec_id
), counts AS (
  SELECT (SELECT count(*) FROM refined) AS n_pred,
         (SELECT count(*) FROM truth) AS n_true,
         (SELECT count(*) FROM truth WHERE in_window) AS n_reach,
         (SELECT count(*) FROM refined p JOIN truth t
            ON p.rec_a = t.rec_a AND p.rec_b = t.rec_b) AS n_tp
)
SELECT CAST(n_pred AS BIGINT) AS n_pred, CAST(n_true AS BIGINT) AS n_true,
       CAST(n_tp AS BIGINT) AS n_tp,
       CASE WHEN n_pred > 0 THEN CAST(round(1e6 * n_tp / n_pred) AS BIGINT) ELSE 0 END AS precision_e6,
       CASE WHEN n_true > 0 THEN CAST(round(1e6 * n_tp / n_true) AS BIGINT) ELSE 0 END AS recall_e6,
       CASE WHEN n_true > 0 THEN CAST(round(1e6 * n_reach / n_true) AS BIGINT) ELSE 0 END AS window_recall_e6
FROM counts
"""


# --- third SN pass: last-name-suffix key (r9 verdict #7) ---------------------
#
# The 1M missed-pair taxonomy (tools/er_taxonomy.py; table in SCALE.md)
# shows the dominant recall loss of the two-pass composition is the
# generator's class-1 corruption — a substituted FIRST LETTER of the
# last name.  Both existing sort orders are prefixed by the phonetic
# block key, whose leading character IS that letter, so the true pair
# lands arbitrarily far apart in both orders: unreachable at any
# window.  The classical fix (Hernández & Stolfo: passes should use
# INDEPENDENTLY corruptible keys) is a third order keyed on what the
# corruption preserves — city, then the phonetic of the last name MINUS
# its first letter, then the first name: the corrupted pair differs
# only in rec_id under that key, so it sorts adjacent unless strangers
# share all three components.  Candidates stay ≤ 3·n·(w−1), still
# linear at any key distribution.

_SUFFIX_LAST = f"substr({_LASTNAME}, 2)"


def suffix_key_sql(duck: bool) -> str:
    """Third-pass key core: phonetic of the last name with its first
    letter dropped — invariant under the first-letter substitution that
    breaks ``block_key_sql`` (and under interior vowel swaps, which the
    phonetic already absorbs)."""
    return phonetic_key_sql(_SUFFIX_LAST, duck)


def _sn_ranked3(people: DataFrame) -> DataFrame:
    """Third-pass global rank: SUFFIX sort key (city | phonetic(last
    minus first letter) | first name | id), same distributed two-phase
    machinery — and the same correctness fence (the rank
    double-executes its input; unfenced range boundaries re-sample per
    execution)."""
    from changegen_spark.operators.ids import assign_sequential_ids

    keyed3 = people.select(
        "rec_id",
        F.lower("name").alias("nname"),
        F.concat_ws(
            "|",
            F.coalesce("city", F.lit("")),
            F.coalesce(F.expr(suffix_key_sql(duck=False)), F.lit("")),
            F.coalesce(F.expr(f"lower({_FIRSTNAME})"), F.lit("")),
            F.lpad(F.col("rec_id").cast("string"), 12, "0"),
        ).alias("skey"),
    )
    return assign_sequential_ids(
        keyed3.repartitionByRange(32, "skey").localCheckpoint(eager=False),
        order_by=["skey"],
        out_col="rank",
        mode="distributed",
    ).select("rec_id", "nname", "rank")


def er_pairs_sn_suffix(
    people: DataFrame, window: int = SN_WINDOW, refine_cols=()
) -> DataFrame:
    """Three-pass sorted neighborhood: name-first + city-first + the
    suffix order, union, distinct — the pass set whose keys are
    pairwise independently corruptible for this fixture's three
    corruption classes.  Candidates ≤ 3·n·(w−1)."""
    refine = list(refine_cols)
    p1 = _window_pairs(_sn_ranked(people), people, window, refine)
    p2 = _window_pairs(_sn_ranked2(people), people, window, refine)
    p3 = _window_pairs(_sn_ranked3(people), people, window, refine)
    return p1.unionByName(p2).unionByName(p3).distinct()


def q_er_pairs_sn_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r10 production SN operating point: three sort passes for
    recall + city refine for precision."""
    return er_pairs_sn_suffix(
        _people(spark), refine_cols=SN_REFINE_COLS
    ).orderBy("rec_a", "rec_b")


def q_er_eval_sn_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-pass refined SN quality vs planted truth; the window
    ceiling is the union over all THREE sort orders."""
    pred = er_pairs_sn_suffix(
        _people(spark), refine_cols=SN_REFINE_COLS
    ).select("rec_a", "rec_b")
    return _sn_union_eval(
        spark, pred, rankers=(_sn_ranked, _sn_ranked2, _sn_ranked3)
    )


def _sn_suffix_sql_body() -> str:
    bk = block_key_sql(duck=True)
    sk = suffix_key_sql(duck=True)
    first = _FIRSTNAME
    pair = """
  SELECT least(a.rec_id, b.rec_id) AS rec_a,
         greatest(a.rec_id, b.rec_id) AS rec_b,
         CAST(levenshtein(a.nname, b.nname) AS BIGINT) AS lev
  FROM {r} a JOIN {r} b
    ON b.r > a.r AND b.r <= a.r + {w} AND a.city = b.city
  WHERE levenshtein(a.nname, b.nname) <= {lv}"""
    return f"""
snkeyedr AS (
  SELECT rec_id, lower(name) AS nname, city,
         coalesce({bk}, '') || '|'
           || coalesce(lower(name), '') || '|'
           || lpad(CAST(rec_id AS VARCHAR), 12, '0') AS skey
  FROM '{ER_PATH}'
), snrankedr AS (
  SELECT rec_id, nname, city, row_number() OVER (ORDER BY skey) AS r
  FROM snkeyedr
), snkeyed2r AS (
  SELECT rec_id, lower(name) AS nname, city,
         coalesce(city, '') || '|'
           || coalesce({bk}, '') || '|'
           || coalesce(lower(name), '') || '|'
           || lpad(CAST(rec_id AS VARCHAR), 12, '0') AS skey
  FROM '{ER_PATH}'
), snranked2r AS (
  SELECT rec_id, nname, city, row_number() OVER (ORDER BY skey) AS r
  FROM snkeyed2r
), snkeyed3r AS (
  SELECT rec_id, lower(name) AS nname, city,
         coalesce(city, '') || '|'
           || coalesce({sk}, '') || '|'
           || coalesce(lower({first}), '') || '|'
           || lpad(CAST(rec_id AS VARCHAR), 12, '0') AS skey
  FROM '{ER_PATH}'
), snranked3r AS (
  SELECT rec_id, nname, city, row_number() OVER (ORDER BY skey) AS r
  FROM snkeyed3r
), refined3 AS (
  SELECT DISTINCT rec_a, rec_b, lev FROM (
    {pair.format(r='snrankedr', w=SN_WINDOW - 1, lv=LEV_MAX)}
    UNION ALL
    {pair.format(r='snranked2r', w=SN_WINDOW - 1, lv=LEV_MAX)}
    UNION ALL
    {pair.format(r='snranked3r', w=SN_WINDOW - 1, lv=LEV_MAX)}
  )
)"""


Q_ER_PAIRS_SN_SUFFIX_SQL = f"""
WITH {_sn_suffix_sql_body()}
SELECT rec_a, rec_b, lev FROM refined3 ORDER BY rec_a, rec_b
"""

Q_ER_EVAL_SN_SUFFIX_SQL = f"""
WITH {_sn_suffix_sql_body()}
, truth AS (
  SELECT a.rec_id AS rec_a, b.rec_id AS rec_b,
         (abs(ra1.r - rb1.r) <= {SN_WINDOW - 1}
          OR abs(ra2.r - rb2.r) <= {SN_WINDOW - 1}
          OR abs(ra3.r - rb3.r) <= {SN_WINDOW - 1}) AS in_window
  FROM '{ER_PATH}' a JOIN '{ER_PATH}' b
    ON a.entity_id = b.entity_id AND a.rec_id < b.rec_id
  JOIN snrankedr ra1 ON ra1.rec_id = a.rec_id
  JOIN snrankedr rb1 ON rb1.rec_id = b.rec_id
  JOIN snranked2r ra2 ON ra2.rec_id = a.rec_id
  JOIN snranked2r rb2 ON rb2.rec_id = b.rec_id
  JOIN snranked3r ra3 ON ra3.rec_id = a.rec_id
  JOIN snranked3r rb3 ON rb3.rec_id = b.rec_id
), counts AS (
  SELECT (SELECT count(*) FROM refined3) AS n_pred,
         (SELECT count(*) FROM truth) AS n_true,
         (SELECT count(*) FROM truth WHERE in_window) AS n_reach,
         (SELECT count(*) FROM refined3 p JOIN truth t
            ON p.rec_a = t.rec_a AND p.rec_b = t.rec_b) AS n_tp
)
SELECT CAST(n_pred AS BIGINT) AS n_pred, CAST(n_true AS BIGINT) AS n_true,
       CAST(n_tp AS BIGINT) AS n_tp,
       CASE WHEN n_pred > 0 THEN CAST(round(1e6 * n_tp / n_pred) AS BIGINT) ELSE 0 END AS precision_e6,
       CASE WHEN n_true > 0 THEN CAST(round(1e6 * n_tp / n_true) AS BIGINT) ELSE 0 END AS recall_e6,
       CASE WHEN n_true > 0 THEN CAST(round(1e6 * n_reach / n_true) AS BIGINT) ELSE 0 END AS window_recall_e6
FROM counts
"""


# --- survivorship / golden records (r10) -------------------------------------


def q_er_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last ER stage: clusters → ONE canonical record per entity
    (survivorship).  Every source record maps to an entity (its
    connected component over the production 3-pass+refine pairs, or
    itself if unmatched — the full-table convention a downstream
    consumer joins against), then per entity: member count, distinct
    name-variant count, and mode-with-deterministic-tiebreak canonical
    name and city (most frequent value, ties broken by the
    lexicographically smallest — no arrival-order `first()`).

    Scale shape: CC is the checkpointed iteration, then three hash
    aggregations (entity×name, entity×city, entity) — the mode is
    computed as `min(struct(-cnt, value))` per entity, a two-level
    groupBy with map-side partials, NOT a window sort over the full
    table."""
    from changegen_spark.functions.clustering import connected_components

    ppl = _people(spark)
    pairs = er_pairs_sn_suffix(ppl, refine_cols=SN_REFINE_COLS)
    comp = connected_components(pairs, src="rec_a", dst="rec_b").select(
        F.col("node").alias("rec_id"), F.col("comp").alias("ent")
    )
    # nname/city coalesced to '' (r10 advice): the mode tiebreak is
    # min(struct(-cnt, v)) here but ORDER BY cnt DESC, v in the oracle,
    # and the engines disagree on NULL ordering (Spark structs sort NULL
    # fields first, DuckDB defaults NULLS LAST) — a NULL name/city would
    # win the tie on one engine and lose it on the other.  '' sorts
    # first in both.
    mapped = (
        ppl.join(comp, "rec_id", "left")
        .select(
            F.coalesce(F.lower("name"), F.lit("")).alias("nname"),
            F.coalesce("city", F.lit("")).alias("city"),
            F.coalesce("ent", F.col("rec_id")).alias("entity"),
        )
    )
    nc = mapped.groupBy("entity", "nname").agg(F.count("*").alias("cnt"))
    best_name = (
        nc.groupBy("entity")
        .agg(
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("neg"), F.col("nname").alias("v")
                )
            ).alias("b"),
            F.count("*").alias("n_name_variants"),
        )
        .select("entity", F.col("b.v").alias("name"), "n_name_variants")
    )
    cc = mapped.groupBy("entity", "city").agg(F.count("*").alias("cnt"))
    best_city = (
        cc.groupBy("entity")
        .agg(
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("neg"), F.col("city").alias("v")
                )
            ).alias("b")
        )
        .select("entity", F.col("b.v").alias("city"))
    )
    members = mapped.groupBy("entity").agg(F.count("*").alias("n_members"))
    return (
        members.join(best_name, "entity")
        .join(best_city, "entity")
        .select("entity", "n_members", "n_name_variants", "name", "city")
        .orderBy("entity")
    )


Q_ER_GOLDEN_SQL = f"""
WITH RECURSIVE {_sn_suffix_sql_body()}
, edges AS (
  SELECT rec_a AS a, rec_b AS b FROM refined3
  UNION SELECT rec_b, rec_a FROM refined3
), reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
), comp AS (
  SELECT a AS rec_id, least(a, min(b)) AS entity FROM reach GROUP BY a
), mapped AS (
  SELECT coalesce(lower(p.name), '') AS nname, coalesce(p.city, '') AS city,
         coalesce(c.entity, p.rec_id) AS entity
  FROM '{ER_PATH}' p LEFT JOIN comp c ON c.rec_id = p.rec_id
), nc AS (
  SELECT entity, nname, count(*) AS cnt FROM mapped GROUP BY entity, nname
), bn AS (
  SELECT entity, nname, cnt,
         row_number() OVER (PARTITION BY entity ORDER BY cnt DESC, nname) AS rn,
         count(*) OVER (PARTITION BY entity) AS n_name_variants
  FROM nc
), cc2 AS (
  SELECT entity, city, count(*) AS cnt FROM mapped GROUP BY entity, city
), bc AS (
  SELECT entity, city,
         row_number() OVER (PARTITION BY entity ORDER BY cnt DESC, city) AS rn
  FROM cc2
), mem AS (
  SELECT entity, count(*) AS n_members FROM mapped GROUP BY entity
)
SELECT m.entity, m.n_members,
       CAST(bn.n_name_variants AS BIGINT) AS n_name_variants,
       bn.nname AS name, bc.city
FROM mem m
JOIN bn ON bn.entity = m.entity AND bn.rn = 1
JOIN bc ON bc.entity = m.entity AND bc.rn = 1
ORDER BY m.entity
"""


def q_er_bcubed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level linkage quality: B-cubed precision/recall/F1 (Bagga
    & Baldwin 1998) of the production clusters (3-pass SN + city refine
    → CC, singletons mapping to themselves) against the planted
    entity_id.  Pairwise P/R (the eval family above) over-weights big
    clusters quadratically; B³ averages per RECORD: precision(r) =
    |C(r)∩T(r)|/|C(r)|, recall(r) = |C(r)∩T(r)|/|T(r)| — the metric
    that actually moves when a giant wrong merge happens.

    Engine-exact arithmetic: per-(pred,true) cell the contribution is
    n_ct²/|C| summed over cells; both engines compute it as INTEGER
    floor division at e12 scale, REASSOCIATED as n_ct·((n_ct·1e12) div
    n_c) so the largest intermediate is n_ct·1e12 — safe in int64 up to
    ~9.2M-record clusters, not the ~3,035 the naive n_ct²·1e12 ordering
    allows before a silent wrap (r10 advice; with ANSI off Spark wraps
    while DuckDB errors — a silent engine divergence).  The inner floor
    costs < 1 per cell pre-multiplier, < n_ct after it, so the summed
    error is < n — under one e6 ulp after the final division by n·1e6;
    both engines reassociate identically so parity is exact.  Scale
    shape: three hash aggregations (cell, pred-size, true-size) + two
    broadcast-joinable size frames; no window, no driver math beyond
    the final 1-row assembly."""
    from changegen_spark.functions.clustering import connected_components

    ppl = _people(spark)
    pairs = er_pairs_sn_suffix(ppl, refine_cols=SN_REFINE_COLS)
    comp = connected_components(pairs, src="rec_a", dst="rec_b").select(
        F.col("node").alias("rec_id"), F.col("comp").alias("p")
    )
    m = (
        ppl.select("rec_id", "entity_id")
        .join(comp, "rec_id", "left")
        .select(
            "entity_id", F.coalesce("p", F.col("rec_id")).alias("pred")
        )
    )
    cells = m.groupBy("pred", "entity_id").agg(F.count("*").alias("n_ct"))
    psize = m.groupBy("pred").agg(F.count("*").alias("n_c"))
    tsize = m.groupBy("entity_id").agg(F.count("*").alias("n_t"))
    agg = (
        cells.join(psize, "pred")
        .join(tsize, "entity_id")
        .select(
            F.expr("n_ct * (n_ct * CAST(1000000000000 AS BIGINT) div n_c)").alias(
                "pterm"
            ),
            F.expr("n_ct * (n_ct * CAST(1000000000000 AS BIGINT) div n_t)").alias(
                "rterm"
            ),
        )
        .agg(
            F.sum("pterm").alias("sp"),
            F.sum("rterm").alias("sr"),
        )
        .collect()[0]
    )
    n = m.count()
    n_pred = m.select("pred").distinct().count()
    n_true = m.select("entity_id").distinct().count()
    # empty-input guard (the bt_weighted W=0 lesson): no records → all
    # metrics 0 rather than ZeroDivisionError, mirroring SQL's NULL-free
    # CASE discipline
    p_e6 = int(agg.sp // (n * 1_000_000)) if n and agg.sp is not None else 0
    r_e6 = int(agg.sr // (n * 1_000_000)) if n and agg.sr is not None else 0
    f1_e6 = (2 * p_e6 * r_e6) // (p_e6 + r_e6) if (p_e6 + r_e6) else 0
    return spark.createDataFrame(
        [(n, n_pred, n_true, p_e6, r_e6, f1_e6)],
        "n_records long, n_pred_clusters long, n_true_entities long, "
        "b3_precision_e6 long, b3_recall_e6 long, b3_f1_e6 long",
    )


Q_ER_BCUBED_SQL = f"""
WITH RECURSIVE {_sn_suffix_sql_body()}
, edges AS (
  SELECT rec_a AS a, rec_b AS b FROM refined3
  UNION SELECT rec_b, rec_a FROM refined3
), reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
), comp AS (
  SELECT a AS rec_id, least(a, min(b)) AS pred FROM reach GROUP BY a
), mapped AS (
  SELECT p.entity_id, coalesce(c.pred, p.rec_id) AS pred
  FROM '{ER_PATH}' p LEFT JOIN comp c ON c.rec_id = p.rec_id
), cells AS (
  SELECT pred, entity_id, count(*) AS n_ct FROM mapped GROUP BY pred, entity_id
), psize AS (
  SELECT pred, count(*) AS n_c FROM mapped GROUP BY pred
), tsize AS (
  SELECT entity_id, count(*) AS n_t FROM mapped GROUP BY entity_id
), sums AS (
  SELECT sum(n_ct * ((n_ct * CAST(1000000000000 AS BIGINT)) // n_c)) AS sp,
         sum(n_ct * ((n_ct * CAST(1000000000000 AS BIGINT)) // n_t)) AS sr
  FROM cells JOIN psize USING (pred) JOIN tsize USING (entity_id)
), base AS (
  SELECT (SELECT count(*) FROM mapped) AS n,
         (SELECT count(DISTINCT pred) FROM mapped) AS n_pred,
         (SELECT count(DISTINCT entity_id) FROM mapped) AS n_true,
         sp, sr
  FROM sums
), scaled AS (
  -- n > 0 guard matches the Spark side's empty-input guard: zero
  -- records must yield 0 metrics on BOTH engines, not NULL // 0 here
  SELECT n, n_pred, n_true,
         CASE WHEN n > 0 THEN coalesce(sp, 0) // (n * 1000000) ELSE 0 END AS p_e6,
         CASE WHEN n > 0 THEN coalesce(sr, 0) // (n * 1000000) ELSE 0 END AS r_e6
  FROM base
)
SELECT CAST(n AS BIGINT) AS n_records, CAST(n_pred AS BIGINT) AS n_pred_clusters,
       CAST(n_true AS BIGINT) AS n_true_entities,
       CAST(p_e6 AS BIGINT) AS b3_precision_e6, CAST(r_e6 AS BIGINT) AS b3_recall_e6,
       CAST(CASE WHEN p_e6 + r_e6 > 0
                 THEN (2 * p_e6 * r_e6) // (p_e6 + r_e6) ELSE 0 END AS BIGINT)
         AS b3_f1_e6
FROM scaled
"""


def _inc_keyed(df: DataFrame, idcol: str) -> DataFrame:
    """(idcol, bkey): both incremental candidate keys per record, class-
    prefixed ('k1|' = phonetic block key, 'k2|' = city | suffix phonetic
    | first name) so the two key spaces never collide in the join."""
    k1 = F.expr(block_key_sql(duck=False))
    k2 = F.concat_ws(
        "|",
        F.coalesce("city", F.lit("")),
        F.coalesce(F.expr(suffix_key_sql(duck=False)), F.lit("")),
        F.coalesce(F.expr(f"lower({_FIRSTNAME})"), F.lit("")),
    )
    return df.select(
        F.col("rec_id").alias(idcol),
        F.explode(
            F.array(
                F.concat(F.lit("k1|"), F.coalesce(k1, F.lit(""))),
                F.concat(F.lit("k2|"), k2),
            )
        ).alias("bkey"),
    )


def incremental_assign(arrivals: DataFrame, base: DataFrame) -> DataFrame:
    """Core of incremental ER, reused by the batch query and the
    streaming twin (streaming/er.py): each arrival probes ``base``
    through BOTH candidate keys — the phonetic block key and the r10
    suffix key (city | phonetic(last minus first letter) | first) so
    first-letter corruptions still reach their entity — then city +
    Levenshtein refine, and the best match is the deterministic
    min(struct(lev, base_id)); unmatched arrivals get matched_entity
    −1 (a new-entity insert downstream).

    Scale shape: two key-equality hash joins (arrival keys × base keys,
    both sides pre-hashed), distinct candidates, one groupBy-min — no
    window over data, no CC iteration; candidate volume is Σ_k a_k·b_k
    over shared keys, audited by q_er_inc_audit."""
    cand = (
        _inc_keyed(arrivals, "a_id")
        .join(_inc_keyed(base, "b_id"), "bkey")
        .select("a_id", "b_id")
        .distinct()
    )
    a_attrs = arrivals.select(
        F.col("rec_id").alias("a_id"),
        F.lower("name").alias("na"),
        F.col("city").alias("ca"),
    )
    b_attrs = base.select(
        F.col("rec_id").alias("b_id"),
        F.lower("name").alias("nb"),
        F.col("city").alias("cb"),
    )
    refined = (
        cand.join(a_attrs, "a_id")
        .join(b_attrs, "b_id")
        .filter(F.col("ca") == F.col("cb"))
        .select(
            "a_id",
            "b_id",
            F.levenshtein("na", "nb").cast("long").alias("lev"),
        )
        .filter(F.col("lev") <= LEV_MAX)
    )
    best = refined.groupBy("a_id").agg(
        F.min(F.struct("lev", F.col("b_id").alias("v"))).alias("b"),
        F.count("*").alias("n_matches"),
    )
    return (
        arrivals.select(F.col("rec_id").alias("a_id"))
        .join(best, "a_id", "left")
        .select(
            F.col("a_id").alias("rec_id"),
            F.coalesce(F.col("b.v"), F.lit(-1)).cast("long").alias(
                "matched_entity"
            ),
            F.coalesce(F.col("b.lev"), F.lit(-1)).cast("long").alias("lev"),
            F.coalesce("n_matches", F.lit(0)).cast("long").alias("n_matches"),
        )
        .orderBy("rec_id")
    )


def q_er_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ER: assign ARRIVING records to an existing entity
    table without re-clustering the base (the batch-append production
    regime — at 100 TB the base is petabyte-class and never re-CC'd).
    Base = the fixture's original records (rec_id < 400, each its own
    entity); arrivals = the planted duplicates (rec_id ≥ 400).  Logic
    in ``incremental_assign`` (shared with the streaming twin)."""
    ppl = _people(spark)
    return incremental_assign(
        ppl.filter(F.col("rec_id") >= 400), ppl.filter(F.col("rec_id") < 400)
    )


def q_er_inc_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-ER candidate audit — the dial a linkage design
    reads BEFORE running the assignment (q_er_blocks' twin for the
    batch-append regime): per key class, shared-key count, total
    candidate volume Σ_k a_k·b_k, the hottest key's a·b (the skew
    hazard), and the refine survivor count.  Each record emits exactly
    one key per class, so per-class candidates need no dedup; the
    class prefix keeps the two key spaces disjoint in one join."""
    ppl = _people(spark)
    base = ppl.filter(F.col("rec_id") < 400)
    arrivals = ppl.filter(F.col("rec_id") >= 400)
    ak = _inc_keyed(arrivals, "a_id")
    bk = _inc_keyed(base, "b_id")
    sizes = (
        ak.groupBy("bkey")
        .agg(F.count("*").alias("a_cnt"))
        .join(bk.groupBy("bkey").agg(F.count("*").alias("b_cnt")), "bkey")
        .select(
            F.substring("bkey", 1, 2).alias("key_class"),
            "a_cnt",
            "b_cnt",
        )
        .groupBy("key_class")
        .agg(
            F.count("*").alias("n_shared_keys"),
            F.sum(F.col("a_cnt") * F.col("b_cnt")).alias("candidates"),
            F.max(F.col("a_cnt") * F.col("b_cnt")).alias("max_key_pairs"),
        )
    )
    a_attrs = arrivals.select(
        F.col("rec_id").alias("a_id"),
        F.lower("name").alias("na"),
        F.col("city").alias("ca"),
    )
    b_attrs = base.select(
        F.col("rec_id").alias("b_id"),
        F.lower("name").alias("nb"),
        F.col("city").alias("cb"),
    )
    refined = (
        ak.join(bk, "bkey")
        .select(F.substring("bkey", 1, 2).alias("key_class"), "a_id", "b_id")
        .join(a_attrs, "a_id")
        .join(b_attrs, "b_id")
        .filter(
            (F.col("ca") == F.col("cb"))
            & (F.levenshtein("na", "nb") <= LEV_MAX)
        )
        .groupBy("key_class")
        .agg(F.count("*").alias("refined"))
    )
    return (
        sizes.join(refined, "key_class", "left")
        .select(
            "key_class",
            F.col("n_shared_keys").cast("long"),
            F.col("candidates").cast("long"),
            F.col("max_key_pairs").cast("long"),
            F.coalesce("refined", F.lit(0)).cast("long").alias("refined"),
        )
        .orderBy("key_class")
    )


Q_ER_INC_AUDIT_SQL = f"""
WITH base AS (
  SELECT * FROM '{ER_PATH}' WHERE rec_id < 400
), arrivals AS (
  SELECT * FROM '{ER_PATH}' WHERE rec_id >= 400
), akeys AS (
  SELECT rec_id AS a_id, 'k1|' || coalesce({block_key_sql(duck=True)}, '') AS bkey FROM arrivals
  UNION ALL
  SELECT rec_id, 'k2|' || coalesce(city, '') || '|'
         || coalesce({suffix_key_sql(duck=True)}, '') || '|'
         || coalesce(lower({_FIRSTNAME}), '') FROM arrivals
), bkeys AS (
  SELECT rec_id AS b_id, 'k1|' || coalesce({block_key_sql(duck=True)}, '') AS bkey FROM base
  UNION ALL
  SELECT rec_id, 'k2|' || coalesce(city, '') || '|'
         || coalesce({suffix_key_sql(duck=True)}, '') || '|'
         || coalesce(lower({_FIRSTNAME}), '') FROM base
), sizes AS (
  SELECT substr(bkey, 1, 2) AS key_class,
         count(*) AS n_shared_keys,
         sum(a_cnt * b_cnt) AS candidates,
         max(a_cnt * b_cnt) AS max_key_pairs
  FROM (SELECT bkey, count(*) AS a_cnt FROM akeys GROUP BY bkey) a
  JOIN (SELECT bkey, count(*) AS b_cnt FROM bkeys GROUP BY bkey) b USING (bkey)
  GROUP BY 1
), refined AS (
  SELECT substr(k.bkey, 1, 2) AS key_class, count(*) AS refined
  FROM akeys k JOIN bkeys kb USING (bkey)
  JOIN arrivals a ON a.rec_id = k.a_id
  JOIN base b ON b.rec_id = kb.b_id
  WHERE a.city = b.city
    AND levenshtein(lower(a.name), lower(b.name)) <= {LEV_MAX}
  GROUP BY 1
)
SELECT s.key_class, CAST(s.n_shared_keys AS BIGINT) AS n_shared_keys,
       CAST(s.candidates AS BIGINT) AS candidates,
       CAST(s.max_key_pairs AS BIGINT) AS max_key_pairs,
       CAST(coalesce(r.refined, 0) AS BIGINT) AS refined
FROM sizes s LEFT JOIN refined r ON r.key_class = s.key_class
ORDER BY s.key_class
"""


def q_er_chain_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitivity audit of the production clusters: connected
    components happily merge a—b—c where every EDGE passed the lev ≤
    {LEV_MAX} refine but lev(a, c) exceeds it — the classical
    chain-merge hazard that B³ precision pays for silently.  One row:
    multi-member entity count, largest cluster, intra-cluster pairs
    checked (Σ m·(m−1)/2 — the audit's own cost, bounded by cluster
    sizes), how many of those pairs exceed the refine threshold
    (chain pairs), and the worst intra-cluster distance.

    Scale shape: the self-join is keyed on the entity id, so work is
    Σ m² over CLUSTER sizes — the quantity this audit exists to watch;
    a runaway cluster shows up as its own cost before it poisons
    downstream survivorship."""
    from changegen_spark.functions.clustering import connected_components

    ppl = _people(spark)
    pairs = er_pairs_sn_suffix(ppl, refine_cols=SN_REFINE_COLS)
    comp = connected_components(pairs, src="rec_a", dst="rec_b").select(
        F.col("node").alias("rec_id"), F.col("comp").alias("entity")
    )
    m = ppl.join(comp, "rec_id").select(
        "entity", "rec_id", F.lower("name").alias("nname")
    )
    a = m.select(
        "entity", F.col("rec_id").alias("ra"), F.col("nname").alias("na")
    )
    b = m.select(
        "entity", F.col("rec_id").alias("rb"), F.col("nname").alias("nb")
    )
    intra = (
        a.join(b, "entity")
        .filter(F.col("ra") < F.col("rb"))
        .select("entity", F.levenshtein("na", "nb").alias("lev"))
    )
    sizes = m.groupBy("entity").agg(F.count("*").alias("msize"))
    return (
        intra.agg(
            F.count("*").alias("pairs_checked"),
            F.sum((F.col("lev") > LEV_MAX).cast("long")).alias(
                "chain_pairs"
            ),
            F.max("lev").alias("max_intra_lev"),
        )
        .crossJoin(
            F.broadcast(
                sizes.agg(
                    F.count("*").alias("n_multi_entities"),
                    F.max("msize").alias("max_cluster_size"),
                )
            )
        )
        .select(
            F.col("n_multi_entities").cast("long"),
            F.col("max_cluster_size").cast("long"),
            F.col("pairs_checked").cast("long"),
            F.col("chain_pairs").cast("long"),
            F.col("max_intra_lev").cast("long"),
        )
    )


Q_ER_CHAIN_AUDIT_SQL = f"""
WITH RECURSIVE {_sn_suffix_sql_body()}
, edges AS (
  SELECT rec_a AS a, rec_b AS b FROM refined3
  UNION SELECT rec_b, rec_a FROM refined3
), reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
), comp AS (
  SELECT a AS rec_id, least(a, min(b)) AS entity FROM reach GROUP BY a
), m AS (
  SELECT c.entity, p.rec_id, lower(p.name) AS nname
  FROM '{ER_PATH}' p JOIN comp c ON c.rec_id = p.rec_id
), intra AS (
  SELECT a.entity, levenshtein(a.nname, b.nname) AS lev
  FROM m a JOIN m b ON a.entity = b.entity AND a.rec_id < b.rec_id
), sizes AS (
  SELECT entity, count(*) AS msize FROM m GROUP BY entity
)
SELECT CAST((SELECT count(*) FROM sizes) AS BIGINT) AS n_multi_entities,
       CAST((SELECT max(msize) FROM sizes) AS BIGINT) AS max_cluster_size,
       CAST(count(*) AS BIGINT) AS pairs_checked,
       CAST(sum(CASE WHEN lev > {LEV_MAX} THEN 1 ELSE 0 END) AS BIGINT) AS chain_pairs,
       CAST(max(lev) AS BIGINT) AS max_intra_lev
FROM intra
"""


Q_ER_INCREMENTAL_SQL = f"""
WITH base AS (
  SELECT * FROM '{ER_PATH}' WHERE rec_id < 400
), arrivals AS (
  SELECT * FROM '{ER_PATH}' WHERE rec_id >= 400
), akeys AS (
  SELECT rec_id AS a_id, 'k1|' || coalesce({block_key_sql(duck=True)}, '') AS bkey FROM arrivals
  UNION ALL
  SELECT rec_id, 'k2|' || coalesce(city, '') || '|'
         || coalesce({suffix_key_sql(duck=True)}, '') || '|'
         || coalesce(lower({_FIRSTNAME}), '') FROM arrivals
), bkeys AS (
  SELECT rec_id AS b_id, 'k1|' || coalesce({block_key_sql(duck=True)}, '') AS bkey FROM base
  UNION ALL
  SELECT rec_id, 'k2|' || coalesce(city, '') || '|'
         || coalesce({suffix_key_sql(duck=True)}, '') || '|'
         || coalesce(lower({_FIRSTNAME}), '') FROM base
), cand AS (
  SELECT DISTINCT a_id, b_id FROM akeys JOIN bkeys USING (bkey)
), refined AS (
  SELECT c.a_id, c.b_id,
         CAST(levenshtein(lower(a.name), lower(b.name)) AS BIGINT) AS lev
  FROM cand c
  JOIN arrivals a ON a.rec_id = c.a_id
  JOIN base b ON b.rec_id = c.b_id
  WHERE a.city = b.city
    AND levenshtein(lower(a.name), lower(b.name)) <= {LEV_MAX}
), best AS (
  SELECT a_id, b_id, lev,
         row_number() OVER (PARTITION BY a_id ORDER BY lev, b_id) AS rn,
         count(*) OVER (PARTITION BY a_id) AS n_matches
  FROM refined
)
SELECT a.rec_id,
       CAST(coalesce(b.b_id, -1) AS BIGINT) AS matched_entity,
       CAST(coalesce(b.lev, -1) AS BIGINT) AS lev,
       CAST(coalesce(b.n_matches, 0) AS BIGINT) AS n_matches
FROM arrivals a
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.a_id = a.rec_id
ORDER BY a.rec_id
"""


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
    "q_er_bcubed": q_er_bcubed,
    "q_er_incremental": q_er_incremental,
    "q_er_inc_audit": q_er_inc_audit,
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
    "q_er_bcubed": Q_ER_BCUBED_SQL,
    "q_er_incremental": Q_ER_INCREMENTAL_SQL,
    "q_er_inc_audit": Q_ER_INC_AUDIT_SQL,
    "q_er_chain_audit": Q_ER_CHAIN_AUDIT_SQL,
}
