"""Partitioned-dataset sink semantics: dynamic vs static partition
overwrite, compaction file counts and content preservation, and the
maxRecordsPerFile size cap."""

import os

from pyspark.sql import functions as F

from changegen_spark.sinks.dataset import compact_dataset, write_partitioned


def _rows(spark, path):
    return sorted(
        tuple(r) for r in spark.read.parquet(path).select("k", "src", "v").collect()
    )


def test_dynamic_overwrite_keeps_untouched_partitions(spark, tmp_path):
    path = os.path.join(str(tmp_path), "ds")
    base = spark.createDataFrame(
        [(i, f"s{i % 3}", float(i)) for i in range(30)], "k long, src string, v double"
    )
    write_partitioned(base, path, ["src"])
    # rewrite ONLY partition s0 with new content
    patch = spark.createDataFrame([(100, "s0", 1.5)], "k long, src string, v double")
    write_partitioned(patch, path, ["src"])
    got = _rows(spark, path)
    # s1/s2 survived, s0 replaced wholesale
    assert (100, "s0", 1.5) in got
    assert not any(r[1] == "s0" and r[0] != 100 for r in got)
    assert sum(1 for r in got if r[1] == "s1") == 10
    assert sum(1 for r in got if r[1] == "s2") == 10
    # static overwrite of the same patch would have dropped s1/s2 entirely
    write_partitioned(patch, path, ["src"], dynamic=False)
    assert _rows(spark, path) == [(100, "s0", 1.5)]


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    path = os.path.join(str(tmp_path), "ds")
    # 20 tiny files per partition: repartition(20) before a partitioned write
    base = spark.createDataFrame(
        [(i, f"s{i % 2}", float(i)) for i in range(400)], "k long, src string, v double"
    ).repartition(20)
    write_partitioned(base, path, ["src"])
    before = _rows(spark, path)
    n_files_0 = len(spark.read.parquet(path).inputFiles())
    assert n_files_0 >= 20

    stats = compact_dataset(
        spark, path, ["src"], key_col="k", target_rows=100
    )
    assert stats["n_partitions"] == 2
    assert stats["files_before"] == n_files_0
    # 200 rows per partition at 100/file → 2 planned groups per partition;
    # collisions can split once more, never exceed 2x the plan
    assert 4 <= stats["files_after"] <= 8
    assert _rows(spark, path) == before

    # size cap holds: no parquet file carries more than target_rows rows
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name())
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert per_file <= 100
    # staging directory cleaned up
    assert not os.path.exists(path + ".__compacting")


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Incremental batches may add columns over time; mergeSchema reads
    reconcile old and new partitions (missing columns null-filled) — the
    plain-parquet schema-evolution contract the dataset sink relies on."""
    path = os.path.join(str(tmp_path), "ds")
    v1 = spark.createDataFrame(
        [(1, "s0", 1.0), (2, "s1", 2.0)], "k long, src string, v double"
    )
    write_partitioned(v1, path, ["src"])
    # later batch carries a NEW column and touches only partition s2
    v2 = spark.createDataFrame(
        [(3, "s2", 3.0, "en")], "k long, src string, v double, lang string"
    )
    write_partitioned(v2, path, ["src"])
    got = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(got.columns) == {"k", "src", "v", "lang"}
    rows = {r["k"]: r for r in got.collect()}
    assert rows[1]["lang"] is None and rows[3]["lang"] == "en"
    assert len(rows) == 3
