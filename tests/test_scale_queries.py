"""Semantic tests for the scale-pattern operators (queries/scale).

The sf0.01 value parity is covered by the oracle gate; these pin the
properties the oracle cannot express: Bloom one-sidedness and its broadcast
plan, z-order locality, count-min overestimate, SCD2 interval integrity.
"""

import pytest
from pyspark.sql import functions as F


def test_bloom_is_superset_and_confirm_exact(spark, sf_dir):
    from changegen_spark.queries.scale import q_bloom_decontaminate
    from changegen_spark.queries.mlprep import q_decontaminate

    bloom = {r.doc_id: r for r in q_bloom_decontaminate(spark, sf_dir).collect()}
    exact = {r.doc_id: r for r in q_decontaminate(spark, sf_dir).collect()}
    assert set(bloom) == set(exact)
    for doc_id, b in bloom.items():
        e = exact[doc_id]
        # no false negatives: confirmed == exact; candidates may only add
        assert b.n_contaminated == e.n_contaminated
        assert b.n_candidates >= b.n_contaminated
        assert b.n_ngrams == e.n_ngrams


def test_bloom_prefilter_broadcasts(spark, sf_dir):
    from changegen_spark.queries.scale import q_bloom_decontaminate

    plan = q_bloom_decontaminate(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # the three bucket-set semi-joins must be broadcast (map-side filter),
    # never shuffled exchanges of the train side per filter
    assert plan.count("BroadcastHashJoin") >= 3
    assert "LeftSemi" in plan


def test_zorder_key_locality(spark):
    from changegen_spark.queries.scale import zorder_key

    # 32x32 grid: points sharing a z-prefix must be spatially adjacent.
    df = spark.range(1024).select(
        (F.col("id") % 32).cast("int").alias("ix"),
        (F.col("id") / 32).cast("int").alias("iy"),
    )
    keyed = df.select("ix", "iy", zorder_key(F.col("ix"), F.col("iy"), bits=5).alias("z"))
    rows = keyed.collect()
    assert sorted({r.z for r in rows}) == list(range(1024))  # bijective
    # each 16-key z-range (a 4x4 block) spans a bbox of at most 4x4
    by_block = {}
    for r in rows:
        by_block.setdefault(r.z // 16, []).append((r.ix, r.iy))
    for pts in by_block.values():
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        assert max(xs) - min(xs) <= 3 and max(ys) - min(ys) <= 3


def test_zorder_sql_twin_matches(spark):
    from changegen_spark.queries.scale import zorder_key, zorder_key_sql

    import duckdb

    spark_rows = (
        spark.range(500)
        .select(
            (F.col("id") * 7 % 1000).cast("int").alias("ix"),
            (F.col("id") * 13 % 1000).cast("int").alias("iy"),
        )
        .select("ix", "iy", zorder_key(F.col("ix"), F.col("iy")).alias("z"))
        .collect()
    )
    sql = zorder_key_sql("ix", "iy")
    duck = duckdb.sql(
        "SELECT CAST(range * 7 % 1000 AS INT) AS ix, CAST(range * 13 % 1000 AS INT) AS iy,"
        f" {sql} AS z FROM range(500)"
    ).fetchall()
    assert {(r.ix, r.iy): r.z for r in spark_rows} == {(ix, iy): z for ix, iy, z in duck}


def test_countmin_overestimates_only(spark, sf_dir):
    from changegen_spark.queries.scale import q_countmin_topk

    rows = q_countmin_topk(spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(r.est_count >= r.true_count for r in rows)
    # width 16 with a ~30-word vocabulary must actually collide somewhere
    assert any(r.est_count > r.true_count for r in rows)


def test_incremental_dedup_planted(spark, monkeypatch):
    from changegen_spark.queries import scale

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        # corpus (doc_id % 10 < 8)
        (1, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 1),
        (2, base + " end", "en", "s", 1),
        # batch (doc_id % 10 >= 8)
        (18, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 1),  # exact
        (19, base + " fin", "en", "s", 1),  # near (one trailing word differs)
        (28, "completely unrelated words about spark shuffles and parquet", "en", "s", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(scale, "_docs", lambda s, d: df)
    out = {r.doc_id: r for r in scale.q_incremental_dedup(spark, "ignored").collect()}
    assert set(out) == {18, 19, 28}
    assert out[18].status == "dup_exact" and out[18].is_exact_dup == 1
    assert out[19].status == "dup_near" and out[19].n_near_dup_docs >= 1
    assert out[28].status == "keep" and out[28].n_near_dup_docs == 0


def test_scd2_intervals_partition_time(spark, sf_dir):
    from changegen_spark.queries.scale import q_scd2_intervals, SCD2_OPEN_END

    rows = q_scd2_intervals(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user_rows in by_user.values():
        user_rows.sort(key=lambda r: (r.valid_from, r.event_id))
        # exactly one current row per user; intervals chain without gaps
        assert sum(r.is_current for r in user_rows) == 1
        assert user_rows[-1].is_current == 1
        assert user_rows[-1].valid_to == SCD2_OPEN_END
        for a, b in zip(user_rows, user_rows[1:]):
            assert a.valid_to == b.valid_from


def test_hrw_movers_all_land_on_new_shard(spark, sf_dir):
    """The rendezvous-hashing law: growing n shards to n+1 relocates ONLY
    keys whose new-shard weight became the global max — so every moved key
    lands on the NEW shard, and the moved fraction is ~1/(n+1), not
    n/(n+1) like modulo sharding."""
    from changegen_spark.queries.scale import HRW_SHARDS, q_hrw_shards

    rows = q_hrw_shards(spark, sf_dir).collect()
    assert rows
    moved = [r for r in rows if r.moved]
    for r in moved:
        assert r.shard_b == HRW_SHARDS, r  # movers go to the added shard
    # statistical: E[moved] = 1/(n+1) = 1/9; allow a generous band
    frac = len(moved) / len(rows)
    assert 0.0 < frac < 0.3, frac


def test_hrw_assignment_is_balanced(spark, sf_dir):
    from collections import Counter

    from changegen_spark.queries.scale import HRW_SHARDS, q_hrw_shards

    rows = q_hrw_shards(spark, sf_dir).collect()
    counts = Counter(r.shard_a for r in rows)
    assert set(counts) == set(range(HRW_SHARDS))
    # uniform hash → no shard more than 3x the fair share at fixture size
    fair = len(rows) / HRW_SHARDS
    assert max(counts.values()) < 3 * fair


def test_skew_profile_diagnostics(spark, sf_dir):
    """Entropy is bounded by ln(n_keys); the heavy key really is the mode
    (recomputed driver-side); avg frequency reconciles."""
    import math
    from collections import Counter

    from changegen_spark.queries.scale import SKEW_KEY_COLS, q_skew_profile
    from changegen_spark.sources.tables import load_table

    rows = {r.key_col: r for r in q_skew_profile(spark, sf_dir).collect()}
    assert set(rows) == set(SKEW_KEY_COLS)
    li = load_table(spark, sf_dir, "lineitem").select(*SKEW_KEY_COLS).collect()
    for col in SKEW_KEY_COLS:
        r = rows[col]
        freqs = Counter(getattr(x, col) for x in li)
        assert r.n_rows == sum(freqs.values())
        assert r.n_keys == len(freqs)
        assert r.max_freq == max(freqs.values())
        assert r.top_key == min(k for k, f in freqs.items() if f == r.max_freq)
        assert r.entropy_e6 <= r.max_entropy_e6
        n = r.n_rows
        h = math.log(n) - sum(f * math.log(f) for f in freqs.values()) / n
        assert abs(r.entropy_e6 - round(h * 1e6)) <= 1
        assert r.avg_freq_e6 == round(r.n_rows / r.n_keys * 1e6)


def test_skew_profile_plan_has_no_base_table_sort(spark, sf_dir):
    """The profile must stay aggregate-only: no Sort or Window over the
    lineitem scan (the final 3-row orderBy is fine)."""
    from changegen_spark.queries.scale import q_skew_profile

    plan = q_skew_profile(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_join_size_estimate_bounds(spark, sf_dir):
    """CMS inner-product estimate: exact ground truth reproduced, the
    sketch NEVER underestimates (one-sided guarantee), and with the
    given width the overestimate stays within a sane band."""
    from changegen_spark.queries.scale import q_join_size_est
    from changegen_spark.sources.tables import load_table

    r = q_join_size_est(spark, sf_dir).collect()[0]
    orders = load_table(spark, sf_dir, "orders").select("o_custkey").collect()
    cust = load_table(spark, sf_dir, "customer").select("c_custkey").collect()
    from collections import Counter

    fo = Counter(x.o_custkey for x in orders)
    fc = Counter(x.c_custkey for x in cust)
    actual = sum(fo[k] * fc.get(k, 0) for k in fo)
    assert r.n_actual == actual
    assert r.est_rows >= r.n_actual
    assert r.overest_e6 >= 0
    # depth-3 min over width-256 buckets: collisions add ~n_a*n_b/width
    assert r.est_rows <= actual + 3 * len(orders) * len(cust) // 256
