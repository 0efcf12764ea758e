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


# --- real PNG decode (pure-Python codec, multimodal/png.py) ------------------


def _checker(w, h):
    return bytes(((x + y) % 2) * 255 for y in range(h) for x in range(w))


def test_png_roundtrip_every_filter_and_color_type():
    from changegen_spark.multimodal.png import decode_png, encode_png

    gray = _checker(13, 7)  # odd sizes exercise stride edges
    for ft in range(5):
        for ct in (0, 2, 4, 6):
            data = encode_png(13, 7, gray, filter_type=ft, color_type=ct)
            w, h, px = decode_png(data)
            assert (w, h) == (13, 7), (ft, ct)
            if ct in (0, 4):
                assert px == gray, (ft, ct)
            else:
                # RGB luma of (v,v,v): (77+150+29)*v >> 8 == v for 0/255
                assert px == gray, (ft, ct)


def test_png_gradient_roundtrip():
    from changegen_spark.multimodal.png import decode_png, encode_png

    gray = bytes((x * 7 + y * 13) % 256 for y in range(32) for x in range(24))
    for ft in (1, 3, 4):  # the arithmetic filters on non-trivial data
        w, h, px = decode_png(encode_png(24, 32, gray, filter_type=ft))
        assert (w, h, px) == (24, 32, gray)


def test_decode_images_parses_actual_png(spark):
    from changegen_spark.multimodal import decode_images
    from changegen_spark.multimodal.png import encode_png

    gray = _checker(16, 16)
    png = encode_png(16, 16, gray, filter_type=4, color_type=2)
    df = spark.createDataFrame(
        [(42, "image", png, None)],
        "asset_id long, kind string, payload binary, meta struct<width:int,height:int,sample_rate:int,n_frames:int,codec:string>",
    )
    r = decode_images(df).collect()[0]
    assert r["ok"] is True
    assert (r["width"], r["height"], r["n_pixels"]) == (16, 16, 256)
    assert r["mean_px"] == ((sum(gray) * 1_000_000 + 128) // 256) / 1e6


def test_decode_images_quarantines_truncated_png(spark):
    from changegen_spark.multimodal import decode_images
    from changegen_spark.multimodal.png import encode_png

    png = encode_png(16, 16, _checker(16, 16))
    for cut in (len(png) - 7, 20, 9):  # mid-IEND, mid-IHDR, mid-signature+1
        df = spark.createDataFrame(
            [(1, "image", png[:cut], None)],
            "asset_id long, kind string, payload binary, meta struct<width:int,height:int,sample_rate:int,n_frames:int,codec:string>",
        )
        rows = decode_images(df).collect()
        assert len(rows) == 1 and rows[0]["ok"] is False, cut


def test_png_rejects_corrupt_crc():
    import pytest

    from changegen_spark.multimodal.png import decode_png, encode_png

    data = bytearray(encode_png(8, 8, _checker(8, 8)))
    data[20] ^= 0xFF  # flip a byte inside IHDR body -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_payloads_deterministic():
    from changegen_spark.multimodal.assets import encode_image

    a, b = encode_image(7, 16, 16), encode_image(7, 16, 16)
    assert a == b
    assert a[:4] == b"CGIM"
    assert struct.unpack("<HH", a[4:8]) == (16, 16)
    assert hashlib.md5(a).hexdigest() == hashlib.md5(b).hexdigest()
