"""Structured Streaming tests: the streaming plans must produce exactly the
batch twins' results when run to completion over the finite file source
(availableNow trigger) — the core Structured Streaming guarantee."""

from pyspark.sql import functions as F


def test_windowed_counts_stream_matches_batch(spark, sf_dir):
    from changegen_spark.queries.events import q_event_windows
    from changegen_spark.streaming.events import (
        run_to_memory_sink,
        stream_events,
        windowed_counts_stream,
    )

    stream = stream_events(spark, sf_dir)
    # complete mode: emit every window — exact batch parity (append mode
    # would correctly withhold windows the final watermark hasn't closed)
    got = run_to_memory_sink(
        windowed_counts_stream(stream), "t_win_counts", mode="complete"
    ).orderBy("window_start", "event_type")
    expected = q_event_windows(spark, sf_dir)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in expected.collect()]


def test_sessionize_stream_matches_batch_sessionization(spark, sf_dir):
    """session_window must agree with the batch lag/cumsum sessionization on
    session count and per-user event totals."""
    from changegen_spark.queries.events import q_sessionize
    from changegen_spark.streaming.events import (
        run_to_memory_sink,
        sessionize_stream,
        stream_events,
    )

    stream = stream_events(spark, sf_dir).filter(F.col("user_id") % 10 == 0)
    got = run_to_memory_sink(sessionize_stream(stream), "t_sessions", mode="complete")
    batch = q_sessionize(spark, sf_dir)
    g = got.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"), F.sum("n_events").alias("n_events")
    )
    b = batch.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"), F.sum("n_events").alias("n_events")
    )
    assert sorted(tuple(r) for r in g.collect()) == sorted(tuple(r) for r in b.collect())


def test_streaming_plan_is_incremental(spark, sf_dir):
    """The windowed agg must be a genuine streaming plan (isStreaming) with
    a watermark node — i.e., state is bounded for an unbounded source."""
    from changegen_spark.streaming.events import stream_events, windowed_counts_stream

    stream = windowed_counts_stream(stream_events(spark, sf_dir))
    assert stream.isStreaming
    assert "EventTimeWatermark" in stream._jdf.queryExecution().logical().toString()


def test_change_feed_emits_per_batch_changefiles(spark, sf_dir, tmp_path):
    """Streaming changegen: each micro-batch becomes its own parseable
    ordered .osc shard; shard contents reunion to the full event set."""
    import glob
    import os
    import xml.etree.ElementTree as ET

    from changegen_spark.streaming.events import change_feed, stream_events

    stream = stream_events(spark, sf_dir).filter(F.col("event_id") % 100 == 0)
    out = os.path.join(tmp_path, "feed")
    q = change_feed(stream, out, id_offset=50_000)
    q.awaitTermination()

    shards = sorted(glob.glob(os.path.join(out, "changes-*.osc")))
    assert len(shards) >= 1
    total, ids = 0, set()
    for s in shards:
        root = ET.parse(s).getroot()
        nodes = root.findall("./create/node")
        total += len(nodes)
        for n in nodes:
            ids.add(int(n.attrib["id"]))
            assert n.find("tag") is not None
    from changegen_spark.sources.tables import load_table

    expected = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 100 == 0
    ).count()
    assert total == expected
    assert len(ids) == total  # ids unique across shards (batch stride)
