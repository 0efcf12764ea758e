"""Training-shard export: deterministic placement and bytes, manifest
round-trip verification, and tamper detection."""

import glob
import hashlib
import json
import os

from changegen_spark.sinks.shards import (
    verify_training_shards,
    write_training_shards,
)


def _file_md5s(path):
    out = {}
    for p in sorted(glob.glob(os.path.join(path, "shard=*", "*.json"))):
        with open(p, "rb") as f:
            out[os.path.relpath(p, path)] = hashlib.md5(f.read()).hexdigest()
    return out


def test_shard_export_deterministic_and_verifiable(spark, sf_dir, tmp_path):
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text", "lang")
        .filter("doc_id < 60")
    )
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = write_training_shards(docs, p1, "doc_id", n_shards=4)
    m2 = write_training_shards(docs.repartition(7), p2, "doc_id", n_shards=4)

    assert m1 == m2  # manifest independent of input partitioning
    assert m1["total_rows"] == 60
    assert set(m1["shards"]) == {0, 1, 2, 3}
    # shard FILES are byte-identical across runs and input partitionings
    f1, f2 = _file_md5s(p1), _file_md5s(p2)
    assert list(f1.values()) == list(f2.values())
    assert len(f1) == 4  # exactly one file per shard

    chk = verify_training_shards(spark, p1)
    assert chk["ok"], chk

    # tamper with one shard file -> verification must fail.  Hadoop's
    # local-FS .crc sidecar already rejects naive edits (ChecksumException)
    # — remove it to simulate a consistent tamper; the MANIFEST must still
    # catch the changed content.
    victim = sorted(glob.glob(os.path.join(p1, "shard=*", "*.json")))[0]
    crc = os.path.join(os.path.dirname(victim), "." + os.path.basename(victim) + ".crc")
    os.remove(crc)
    with open(victim) as f:
        lines = f.readlines()
    doc = json.loads(lines[0])
    doc["text"] = doc["text"] + " tampered"
    lines[0] = json.dumps(doc) + "\n"
    with open(victim, "w") as f:
        f.writelines(lines)
    assert not verify_training_shards(spark, p1)["ok"]


def test_epoch_shards_reproducible_and_pos_ordered(spark, sf_dir, tmp_path):
    """The Feistel write path (r7 verdict #7): two independent writes of
    the same epoch produce byte-identical shard files regardless of input
    partitioning; per shard, rows ascend by pos; shard membership is
    pos % n_shards; a different epoch is a different permutation."""
    import json as _json

    from changegen_spark.queries.ordering import feistel_pos
    from changegen_spark.sinks.shards import write_epoch_shards

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "lang")
        .filter("doc_id < 64")
    )
    p1, p2, p3 = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "c")
    m1 = write_epoch_shards(docs, p1, "doc_id", epoch=1, n_shards=4)
    m2 = write_epoch_shards(docs.repartition(7), p2, "doc_id", epoch=1, n_shards=4)
    assert m1 == m2
    assert sum(m1["shards"].values()) == 64
    f1, f2 = _file_md5s(p1), _file_md5s(p2)
    assert len(f1) == 4  # one file per shard
    assert list(f1.values()) == list(f2.values())  # byte-identical re-run

    # per-shard pos order + membership, straight off the bytes on disk
    seen_ids = []
    for sh in range(4):
        (fp,) = glob.glob(os.path.join(p1, f"shard={sh}", "*.json"))
        rows = [_json.loads(l) for l in open(fp)]
        poss = [r["pos"] for r in rows]
        assert poss == sorted(poss) and len(set(poss)) == len(poss)
        assert all(p % 4 == sh for p in poss)
        seen_ids += [r["doc_id"] for r in rows]
    assert sorted(seen_ids) == list(range(64))  # a permutation, nothing lost

    # epoch 2 is a DIFFERENT reproducible order
    write_epoch_shards(docs, p3, "doc_id", epoch=2, n_shards=4)
    assert _file_md5s(p3) != f1
    # and pos agrees with the queryable expression for spot ids
    expr = {
        r.doc_id: r.pos
        for r in docs.select(
            "doc_id", feistel_pos("doc_id", 1).alias("pos")
        ).collect()
    }
    (fp,) = glob.glob(os.path.join(p1, "shard=0", "*.json"))
    for r in (_json.loads(l) for l in open(fp)):
        assert expr[r["doc_id"]] == r["pos"]
