"""Connected-components / dedup keep-list unit tests."""


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
