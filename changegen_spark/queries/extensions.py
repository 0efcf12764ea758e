"""Non-SQL-expressible extension queries (rows-only driver check).

Structured-streaming plans and binary-payload mapInPandas stages have no
DuckDB twin — per the driver contract these queries() entries omit
oracle_sql() and get a rows-only check; semantics are covered by the
module test suites (tests/test_streaming.py, tests/test_multimodal.py) and,
for windowed aggregation, by the batch twin q_event_windows' full oracle.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_COUNTER = itertools.count()


def q_streaming_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream file source → watermark → tumbling-window agg → memory
    sink, run to completion (availableNow).  Deterministic result equal to
    the oracle-checked batch twin q_event_windows."""
    from changegen_spark.streaming.events import (
        run_to_memory_sink,
        stream_events,
        windowed_counts_stream,
    )

    name = f"q_streaming_windows_{next(_COUNTER)}"
    out = run_to_memory_sink(
        windowed_counts_stream(stream_events(spark, sf_dir)), name, mode="complete"
    )
    return out.orderBy("window_start", "event_type")


def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window stateful aggregation over the event stream."""
    from changegen_spark.streaming.events import (
        run_to_memory_sink,
        sessionize_stream,
        stream_events,
    )

    name = f"q_streaming_sessions_{next(_COUNTER)}"
    stream = stream_events(spark, sf_dir).filter(F.col("user_id") % 20 == 0)
    out = run_to_memory_sink(sessionize_stream(stream), name, mode="complete")
    return out.orderBy("user_id", "session_start")


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched binary decode stage over the synthetic asset table."""
    from changegen_spark.multimodal import decode_images, synth_assets

    return decode_images(synth_assets(spark, 100)).orderBy("asset_id")


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (mapInPandas row amplification); frame bytes
    reduced to per-frame stats for a stable comparable result."""
    from changegen_spark.multimodal import sample_frames, synth_assets

    return (
        sample_frames(synth_assets(spark, 100), every=2)
        .select("asset_id", "frame_idx", "mean_px")
        .orderBy("asset_id", "frame_idx")
    )


def q_multimodal_features_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction → ANN hand-off: media embeddings through the
    exact top-k similarity operator."""
    from changegen_spark.functions.similarity import brute_force_topk
    from changegen_spark.multimodal import extract_features, synth_assets

    feats = extract_features(synth_assets(spark, 100), dim=16)
    vectors = feats.withColumnRenamed("asset_id", "vec_id")
    queries = vectors.filter(F.col("vec_id") % 25 == 0).withColumnRenamed(
        "vec_id", "query_id"
    )
    return brute_force_topk(vectors, queries, k=5).orderBy("query_id", "rank")


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbors: k-means coarse quantizer, probe
    the 4 nearest of 8 cells.  Rows-only check (k-means training is not
    SQL-expressible); recall vs brute force is bounded in
    tests/test_similarity.py."""
    from changegen_spark.functions.similarity import ivf_topk
    from changegen_spark.sources.tables import load_table

    v = load_table(spark, sf_dir, "embeddings")
    queries = v.filter(F.col("vec_id") % 100 == 0).withColumnRenamed(
        "vec_id", "query_id"
    )
    return ivf_topk(v, queries, k=10, n_cells=8, n_probe=4).orderBy(
        "query_id", "rank"
    )


def q_lsh_pairs_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates on the xxhash64 production path — identical
    plan to q_lsh_pairs with JVM-intrinsic hashing (no oracle: xxhash64 is
    not reproducible in DuckDB; candidate quality properties are pinned in
    tests, throughput in bench)."""
    from changegen_spark.functions.hashing import minhash_candidates
    from changegen_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    return minhash_candidates(d, hash_fn="xxhash64").orderBy("id_a", "id_b")


def q_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming changefile emission e2e: event stream → foreachBatch →
    per-batch .osc shards → read back with the OSC reader.  Deterministic
    (id stride + synthetic coords) but file-producing → rows-only check."""
    import glob
    import os
    import shutil
    import tempfile
    from functools import reduce

    from changegen_spark.sources.osc import read_osmchange
    from changegen_spark.streaming.events import change_feed, stream_events

    out = tempfile.mkdtemp(prefix="q_change_feed_")
    try:
        stream = stream_events(spark, sf_dir).filter(F.col("event_id") % 50 == 0)
        q = change_feed(stream, out, id_offset=80_000, query_name=f"qcf_{next(_COUNTER)}")
        q.awaitTermination()
        shards = sorted(glob.glob(os.path.join(out, "changes-*.osc")))
        frames = [read_osmchange(spark, s) for s in shards]
        allel = reduce(lambda a, b: a.unionByName(b), frames)
        result = allel.select(
            "id", "kind", "change_type", "version",
            F.element_at("tags", "event_type").alias("event_type"),
            F.element_at("tags", "source_event").cast("long").alias("source_event"),
        ).orderBy("id")
        # read_osmchange materializes rows driver-side (createDataFrame), so
        # the result is independent of the tmpdir lifetime
        return result
    finally:
        shutil.rmtree(out, ignore_errors=True)


QUERIES = {
    "q_change_feed": q_change_feed,
    "q_lsh_pairs_fast": q_lsh_pairs_fast,
    "q_ann_ivf": q_ann_ivf,
    "q_streaming_windows": q_streaming_windows,
    "q_streaming_sessions": q_streaming_sessions,
    "q_multimodal_decode": q_multimodal_decode,
    "q_multimodal_frames": q_multimodal_frames,
    "q_multimodal_features_ann": q_multimodal_features_ann,
}

ORACLES: dict[str, str] = {}
