"""Guards for q_relational_digest (queries/digest.py): the static column-
kind map must track the live registry, or the Spark and DuckDB digest
sides would silently canonicalize differently."""

import duckdb
import pytest


def test_digest_shards_hold_first_window_slots():
    from changegen_spark.queries import DIGEST_NAMES, all_oracles, all_queries

    names = list(all_queries())
    assert tuple(names[: len(DIGEST_NAMES)]) == DIGEST_NAMES
    oracles = all_oracles()
    for nm in DIGEST_NAMES:
        assert nm in oracles


def test_digest_shards_partition_covered_set():
    """Round-robin shards must cover every out-of-window oracle query
    exactly once, and each shard must be non-empty (an empty shard would
    be a zero-row driver result — indistinguishable from a broken one)."""
    from changegen_spark.queries import DIGEST_NAMES, covered_by_digest

    covered = covered_by_digest()
    shards = [covered[i :: len(DIGEST_NAMES)] for i in range(len(DIGEST_NAMES))]
    assert all(shards)
    flat = [n for s in shards for n in s]
    assert sorted(flat) == sorted(covered)
    assert len(set(flat)) == len(flat)
    # r11 (r10 verdict #3): the shard count is COMPUTED from the registry
    # size; r12 (r11 verdict #6): window spend is CAPPED at 6 slots and
    # the per-shard budget raised to 60 subqueries (measured ~55 s at 39,
    # so ≤ ~85 s at the ceiling) — registry growth now packs shards
    # instead of displacing another rotating window slot every other
    # round.  Past 50 + 6·60 base oracles the registry build itself
    # raises, forcing an explicit policy decision.
    from changegen_spark.queries import _DIGEST_MAX_SLOTS, _DIGEST_SHARD_CEIL

    assert len(DIGEST_NAMES) <= _DIGEST_MAX_SLOTS
    assert all(len(s) <= _DIGEST_SHARD_CEIL for s in shards), [
        len(s) for s in shards
    ]
    # and the window stays exactly 50 slots
    from changegen_spark.queries import ROTATED_IN, STANDING

    assert len(DIGEST_NAMES) + len(STANDING) + len(ROTATED_IN) == 50


def test_covered_set_matches_kinds_map():
    """Every out-of-window oracle query must have a KINDS entry (else
    build_oracle_sql raises); KINDS may carry extras for queries currently
    inside the window (rotation tolerance)."""
    from changegen_spark.queries import covered_by_digest
    from changegen_spark.queries.digest import KINDS

    covered = covered_by_digest()
    assert len(covered) >= 50
    missing = [n for n in covered if n not in KINDS]
    assert missing == []


@pytest.mark.slow
def test_kinds_match_live_schemas(spark, sf_dir):
    """The embedded kind of every covered column must equal the kind
    derived from the live Spark result schema.  On failure: rerun the
    generator rule (kind_of) over the query's schema and update KINDS."""
    from changegen_spark.queries import all_queries, covered_by_digest
    from changegen_spark.queries.digest import KINDS, kind_of

    qs = all_queries()
    for n in covered_by_digest():
        df = qs[n](spark, sf_dir)
        live = {f.name: kind_of(f.dataType) for f in df.schema.fields}
        assert live == KINDS[n], n


def test_digest_agrees_with_duckdb_on_a_sample(spark, sf_dir):
    """End-to-end digest parity on a 3-query sample at sf0.001: the Spark
    (n_rows, hash_sum) must equal DuckDB's over the same oracle SQL —
    the same comparison the driver's gate performs at sf0.01 via the
    full q_relational_digest row."""
    from changegen_spark.queries import _base_oracles, all_queries
    from changegen_spark.queries.digest import _digest_one_duck, _digest_one_spark

    sample = ["q_rollup", "q_lm_score", "q18_large_orders"]
    qs = all_queries()
    oracles = _base_oracles()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings".split()
    ):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    for n in sample:
        got = _digest_one_spark(n, qs[n](spark, str(sf_dir))).collect()[0]
        want = con.execute(_digest_one_duck(n, oracles[n])).fetchone()
        assert (got.query_name, got.n_rows, got.hash_sum) == want, n


def test_digest_hash_is_order_insensitive_and_value_sensitive(spark):
    from pyspark.sql import functions as F

    from changegen_spark.queries.digest import _digest_one_spark

    a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, s string")
    b = spark.createDataFrame([(2, "y"), (1, "x")], "id long, s string")
    c = spark.createDataFrame([(2, "y"), (1, "z")], "id long, s string")
    da = _digest_one_spark("t", a).collect()[0]
    db = _digest_one_spark("t", b).collect()[0]
    dc = _digest_one_spark("t", c).collect()[0]
    assert (da.n_rows, da.hash_sum) == (db.n_rows, db.hash_sum)
    assert da.hash_sum != dc.hash_sum
