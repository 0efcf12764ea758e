"""Streaming incremental entity resolution (r10).

The batch-append regime of `queries/er.q_er_incremental`, expressed as
Structured Streaming's canonical STREAM-STATIC pattern: arrivals land as
files in a drop directory, each micro-batch joins the (static, broadcast-
sized-keys) base entity table through the two candidate keys, refines,
and emits one assignment row per arrival.  `foreachBatch` is the right
shape here — the per-batch work IS a batch join, and production upserts
its output into the golden table (a MERGE on a transactional table
format, which this sandbox does not ship) — so the sink below is a
pluggable callback and the tests collect to memory.

State: NONE.  Unlike the Elo/HLL/session twins this operator keeps no
streaming state at all — every arrival's assignment depends only on the
static base, so restarts are trivially exactly-once per the file-source
commit log.  At 100 TB the base side is a bucketed table whose keyed
projection is re-derived per batch (or cached); arrivals per trigger are
the small side.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession


def stage_arrival_files(spark: SparkSession, n_files: int = 4) -> str:
    """Write the fixture's arrival records (rec_id ≥ 400) as ``n_files``
    parquet files under a staging drop directory (idempotent) so
    maxFilesPerTrigger=1 yields multiple micro-batches."""
    from changegen_spark.queries.er import ER_PATH, _people

    # the staging key folds in the fixture's size+mtime (r10 advice): a
    # regenerated er_people fixture must invalidate the cached staging
    # dir, or the stream silently replays stale arrivals across sessions
    st = os.stat(ER_PATH)
    stage = os.path.join(
        "/tmp",
        "changegen_spark_er_stream_"
        + hashlib.md5(
            f"{ER_PATH}|{n_files}|{st.st_size}|{st.st_mtime_ns}".encode()
        ).hexdigest()[:8],
    )
    done = os.path.join(stage, "_STAGED")
    if not os.path.exists(done):
        arrivals = _people(spark).filter("rec_id >= 400")
        # deterministic file split: route by rec_id, not round-robin
        (
            arrivals.repartition(n_files, "rec_id")
            .write.mode("overwrite")
            .parquet(stage)
        )
        with open(done, "w") as fh:
            fh.write("ok")
    return stage


def incremental_er_stream(
    spark: SparkSession,
    on_batch,
    n_files: int = 4,
    checkpoint: str | None = None,
    stage_dir: str | None = None,
):
    """Run the stream-static incremental-ER pipeline over the staged
    arrival drop directory; ``on_batch(assignments_df, batch_id)`` is
    invoked per micro-batch with the assignment frame (rec_id,
    matched_entity, lev, n_matches).  Returns the started query (caller
    drives processAllAvailable/stop).  ``stage_dir`` overrides the
    default fixture staging (used by the arrival-order permutation
    parity test: assignment is stateless per arrival, so file-drop
    ORDER must not change the final table)."""
    from changegen_spark.queries.er import _people, incremental_assign

    base = _people(spark).filter("rec_id < 400")
    stage = stage_dir or stage_arrival_files(spark, n_files=n_files)
    schema = spark.read.parquet(stage).schema
    arrivals = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )

    def emit(batch_df: DataFrame, batch_id: int) -> None:
        on_batch(incremental_assign(batch_df, base), batch_id)

    writer = arrivals.writeStream.foreachBatch(emit).trigger(availableNow=True)
    if checkpoint:
        # production restart semantics: the file-source commit log makes
        # re-runs exactly-once (tested); without it Spark uses a fresh
        # temporary checkpoint and reprocesses everything
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
