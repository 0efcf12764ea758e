"""JDBC reader construction tests (no live database in this container —
the reader's option plan is what we can and should pin)."""


def test_jdbc_reader_options(spark):
    from changegen_spark.sources.jdbc import discovery_query, jdbc_table_reader

    reader = jdbc_table_reader(
        spark,
        url="jdbc:postgresql://db:5432/osm",
        table="new_ways",
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=64,
    )
    assert reader is not None  # construction succeeds against a real session
    q = discovery_query("_new")
    assert "LIKE '%_new'" in q and "information_schema.tables" in q


def test_jdbc_dbtable_pushes_wkb_cast(spark):
    from changegen_spark.sources import jdbc as j

    captured = {}

    class FakeReader:
        def format(self, f):
            captured["format"] = f
            return self

        def option(self, k, v):
            captured[k] = v
            return self

    class FakeSpark:
        read = FakeReader()

    j.jdbc_table_reader(
        FakeSpark(), "jdbc:postgresql://x/y", "original_ways",
        partition_column="osm_id", lower_bound=1, upper_bound=99, num_partitions=8,
    )
    assert captured["format"] == "jdbc"
    assert "ST_AsBinary(geometry)" in captured["dbtable"]
    assert captured["partitionColumn"] == "osm_id"
    assert captured["numPartitions"] == "8"
    assert captured["lowerBound"] == "1"
    assert captured["upperBound"] == "99"
