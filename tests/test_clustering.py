"""Connected-components / dedup keep-list unit tests."""


import pytest

def test_connected_components(spark):
    from changegen_spark.functions.clustering import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 1)], "id_a long, id_b long"
    )
    comp = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    # {1,2,3,8,9} merge through 9-1; {5,6} separate
    assert comp[1] == comp[2] == comp[3] == comp[8] == comp[9] == 1
    assert comp[5] == comp[6] == 5


def test_dedup_keep_list(spark):
    from changegen_spark.functions.clustering import dedup_keep_list

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 4)], "id_a long, id_b long")
    rows = {r["doc_id"]: r for r in dedup_keep_list(docs, pairs).collect()}
    assert rows[0]["keep"] and rows[0]["cluster"] == 0
    assert not rows[3]["keep"] and rows[3]["cluster"] == 0
    assert not rows[4]["keep"] and rows[4]["cluster"] == 0
    for solo in (1, 2, 5):
        assert rows[solo]["keep"] and rows[solo]["cluster"] == solo


def test_keep_best_prefers_longest_then_min_id(spark):
    """q_dedup_keep_best keeps the longest cluster member; equal lengths
    break to the smaller doc_id."""
    from pyspark.sql import functions as F

    import changegen_spark.queries.textops as tx

    near = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, near),                      # cluster A, len ties with 2
        (2, near),                      # -> doc 1 kept (min id on tie)
        (3, near + " plus extra tail"), # longest in cluster A -> kept
        (9, "zz completely different unrelated text body here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("s")).withColumn("n_chars", F.length("text"))
    orig = tx._docs
    tx._docs = lambda _s, _d: df
    try:
        got = {r["doc_id"]: r for r in tx.q_dedup_keep_best(spark, "u").collect()}
    finally:
        tx._docs = orig
    assert set(got) == {1, 2, 3}  # doc 9 unclustered
    assert got[3]["keep"] is True
    assert got[1]["keep"] is False and got[2]["keep"] is False


@pytest.mark.slow
def test_cc_deep_chain_converges_and_cap_raises(spark):
    """r11: path-halving engages past HALVE_AFTER one-hop rounds, so a
    deep path graph converges within the default cap (the one-hop
    version needed rounds = diameter and silently returned split
    clusters at the cap); a cap too small to converge must RAISE, never
    return wrong labels."""
    import pytest
    from pyspark.sql import functions as F

    from changegen_spark.functions.clustering import connected_components

    chain = spark.range(999).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    st = {}
    comp = connected_components(chain, stats=st)
    assert comp.select("comp").distinct().count() == 1
    assert comp.count() == 1000
    assert st["rounds"] <= 20
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=4)
