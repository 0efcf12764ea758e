"""Multimodal column tests: Arrow-batched mapInPandas plumbing over binary
payloads — schema, batch shape, error quarantine, feature hand-off to the
similarity operators."""

import hashlib
import struct

from pyspark.sql import functions as F


def test_decode_images(spark):
    from changegen_spark.multimodal import decode_images, synth_assets

    assets = synth_assets(spark, 50)
    decoded = decode_images(assets)
    rows = {r["asset_id"]: r for r in decoded.collect()}
    metas = {r["asset_id"]: r["meta"] for r in assets.filter("kind='image'").collect()}
    assert set(rows) == set(metas)
    for aid, r in rows.items():
        assert r["ok"]
        assert r["width"] == metas[aid]["width"]
        assert r["height"] == metas[aid]["height"]
        assert r["n_pixels"] == r["width"] * r["height"]
        assert 0 < r["mean_px"] < 255


def test_decode_quarantines_bad_payloads(spark):
    from changegen_spark.multimodal import decode_images

    bad = spark.createDataFrame(
        [(1, "image", b"NOTACONTAINER", None)],
        "asset_id long, kind string, payload binary, meta struct<width:int,height:int,sample_rate:int,n_frames:int,codec:string>",
    )
    rows = decode_images(bad).collect()
    assert len(rows) == 1
    assert rows[0]["ok"] is False  # P7: bad row quarantined, task survives


def test_extract_features_feeds_similarity(spark):
    from changegen_spark.functions.similarity import brute_force_topk
    from changegen_spark.multimodal import extract_features, synth_assets

    assets = synth_assets(spark, 30)
    feats = extract_features(assets, dim=16)
    first = feats.first()
    assert len(first["embedding"]) == 16
    assert all(0.0 <= v <= 1.0 for v in first["embedding"])
    # hand-off: the multimodal embeddings run through the ANN operator as-is
    vectors = feats.withColumnRenamed("asset_id", "vec_id")
    queries = vectors.limit(2).withColumnRenamed("vec_id", "query_id")
    topk = brute_force_topk(vectors, queries, k=3)
    assert topk.groupBy("query_id").count().collect()[0]["count"] == 3


def test_sample_frames(spark):
    from changegen_spark.multimodal import sample_frames, synth_assets

    assets = synth_assets(spark, 50)
    frames = sample_frames(assets, every=2)
    metas = {r["asset_id"]: r["meta"] for r in assets.filter("kind='video'").collect()}
    got = frames.groupBy("asset_id").agg(F.count("*").alias("n")).collect()
    assert {r["asset_id"] for r in got} == set(metas)
    for r in got:
        nf = metas[r["asset_id"]]["n_frames"]
        assert r["n"] == (nf + 1) // 2  # every 2nd frame
    f = frames.first()
    assert len(f["frame"]) == metas[f["asset_id"]]["width"] * metas[f["asset_id"]]["height"]


def test_payloads_deterministic():
    from changegen_spark.multimodal.assets import encode_image

    a, b = encode_image(7, 16, 16), encode_image(7, 16, 16)
    assert a == b
    assert a[:4] == b"CGIM"
    assert struct.unpack("<HH", a[4:8]) == (16, 16)
    assert hashlib.md5(a).hexdigest() == hashlib.md5(b).hexdigest()
