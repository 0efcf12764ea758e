"""Native OSM ``.pbf`` ingestion — pure-Python decode, blob-parallel on Spark.

Replaces the "pre-converted parquet extract" assumption: the reference reads
``.pbf`` directly (osmium handler ``changegen/generator.py:35-53``; metadata
scan ``changegen/__main__.py:26-53``); this module gives the Spark engine the
same capability from public format knowledge only (the OSM PBF wire format:
https://wiki.openstreetmap.org/wiki/PBF_Format — varint/zigzag protobuf
encoding, zlib-compressed PrimitiveBlocks, DenseNodes delta coding).

Scale design: a ``.pbf`` is a sequence of independently-decodable Blobs
(≤32 MB each by spec). The driver does ONE cheap sequential pass reading the
4-byte BlobHeader lengths (no decompression) to build a (offset, size) span
list; the spans become a DataFrame and each executor decodes its blobs with
``mapInPandas`` reading the shared file by offset — the blob is the split
unit, so a planet-scale file fans out across the cluster with zero driver
memory. Decoded elements land in a unified frame, persisted once, then
filtered per kind (node/way/relation) — one decode pass, three outputs.

The decoder is pure CPython over ``bytes`` — adequate for extracts; for
planet-scale ingest the same span/mapInPandas scaffold holds and the
per-blob decode body is the swap point for a vectorized (numpy) or native
decoder.
"""

from __future__ import annotations

import os
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# unified mapInPandas output: tags/members as entry arrays (Arrow-friendly);
# map columns are built Spark-side with map_from_entries.
_UNIFIED_SCHEMA = (
    "kind string, id long, lat double, lon double, nds array<long>, "
    "mrefs array<long>, mtypes array<string>, mroles array<string>, "
    "tag_keys array<string>, tag_vals array<string>"
)

_MEMBER_TYPES = ("node", "way", "relation")


# ---------------------------------------------------------------- wire format

def _varint(buf: bytes, i: int) -> tuple[int, int]:
    """Unsigned base-128 varint at buf[i:] → (value, next_index)."""
    shift = 0
    result = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Iterate protobuf (field_no, wire_type, value) triples.

    wt0 → raw varint int; wt2 → bytes view; wt1/wt5 → skipped (returned as
    None; no OSM PBF field we consume uses them)."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
            yield fno, wt, v
        elif wt == 2:
            ln, i = _varint(buf, i)
            yield fno, wt, buf[i : i + ln]
            i += ln
        elif wt == 5:
            yield fno, wt, None
            i += 4
        elif wt == 1:
            yield fno, wt, None
            i += 8
        else:  # pragma: no cover - groups are not used by OSM PBF
            raise ValueError(f"unsupported wire type {wt}")


def _packed(buf: bytes) -> list[int]:
    """Packed repeated varints → list of raw (unsigned) ints."""
    out = []
    i = 0
    n = len(buf)
    while i < n:
        v, i = _varint(buf, i)
        out.append(v)
    return out


def _packed_zigzag_delta(buf: bytes) -> list[int]:
    """Packed sint64 deltas → cumulative absolute values."""
    out = []
    acc = 0
    i = 0
    n = len(buf)
    while i < n:
        v, i = _varint(buf, i)
        acc += _zigzag(v)
        out.append(acc)
    return out


# ---------------------------------------------------------------- file layout

def scan_blob_spans(path: str) -> list[tuple[str, int, int]]:
    """Driver-side span scan: [(blob_type, data_offset, data_size)].

    Reads only the 4-byte lengths + BlobHeaders (a few hundred bytes per
    ~8 MB blob) — no decompression, O(file/blob_size) tiny reads."""
    spans = []
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if len(head) < 4:
                break
            hlen = int.from_bytes(head, "big")
            header = f.read(hlen)
            btype, dsize = "", 0
            for fno, _wt, v in _fields(header):
                if fno == 1:
                    btype = bytes(v).decode("utf-8")
                elif fno == 3:
                    dsize = v
            off = f.tell()
            spans.append((btype, off, dsize))
            f.seek(off + dsize)
    return spans


def _blob_raw(data: bytes) -> bytes:
    """Blob message → decompressed block bytes (raw or zlib)."""
    raw = None
    zdata = None
    for fno, _wt, v in _fields(data):
        if fno == 1:
            raw = bytes(v)
        elif fno == 3:
            zdata = bytes(v)
        # fno 2 = raw_size (advisory); lzma/lz4/zstd (6/7/8) unsupported here
    if raw is not None:
        return raw
    if zdata is not None:
        return zlib.decompress(zdata)
    raise ValueError("Blob carries no raw/zlib payload (unsupported compression?)")


# ------------------------------------------------------------- block decoding

# PrimitiveGroup field number per element kind (osmformat.proto)
_KIND_FNO = {"node": (1, 2), "way": (3,), "relation": (4,)}


def _decode_primitive_block(
    raw: bytes,
    kinds: frozenset | None = None,
    cols: frozenset | None = None,
) -> Iterator[tuple]:
    """PrimitiveBlock → element tuples in _UNIFIED_SCHEMA column order.

    ``kinds`` (element-kind pushdown) and ``cols`` (column pruning) are
    the DataSource-V2 scan hints (sources/pbf_datasource.py; the DSV2
    twin of the reference's per-type filtered scan,
    ``changegen/generator.py:35-53``).  With a ``kinds`` set, groups of
    other kinds are skipped BEFORE their bodies are parsed — and when no
    wanted group exists in the blob, the stringtable is never decoded
    (the dominant cost: utf-8 of every unique tag string).  With a
    ``cols`` set, tag/nds/member/coord decode is skipped for
    unprojected columns; skipped slots yield None (the caller projects
    them away).  Both default to None = decode everything — the
    mapInPandas path and every pre-r10 caller are byte-identical.
    """
    want = cols if cols is not None else None
    need_tags = want is None or "tag_keys" in want or "tag_vals" in want
    need_roles = want is None or "mroles" in want
    need_mtypes = want is None or "mtypes" in want
    need_mrefs = want is None or "mrefs" in want
    need_coords = want is None or "lat" in want or "lon" in want
    need_nds = want is None or "nds" in want

    st_raw = None
    groups: list[bytes] = []
    granularity = 100
    lat_off = 0
    lon_off = 0
    for fno, _wt, v in _fields(raw):
        if fno == 1:  # stringtable — keep raw, decode lazily below
            st_raw = v
        elif fno == 2:
            groups.append(bytes(v))
        elif fno == 17:
            granularity = v
        elif fno == 19:
            lat_off = v
        elif fno == 20:
            lon_off = v

    strings: list[str] | None = None

    def get_strings() -> list[str]:
        nonlocal strings
        if strings is None:
            strings = (
                [
                    bytes(s).decode("utf-8", "replace")
                    for f2, _w2, s in _fields(st_raw)
                    if f2 == 1
                ]
                if st_raw is not None
                else []
            )
        return strings

    scale = 1e-9

    def coord(latv: int, lonv: int) -> tuple[float, float]:
        return (
            scale * (lat_off + granularity * latv),
            scale * (lon_off + granularity * lonv),
        )

    wanted_fnos = (
        None
        if kinds is None
        else frozenset(f for k in kinds for f in _KIND_FNO[k])
    )
    for g in groups:
        for fno, _wt, v in _fields(g):
            if wanted_fnos is not None and fno not in wanted_fnos:
                continue  # kind pushdown: group body never parsed
            if fno == 1:  # plain Node (rare in modern files)
                nid = 0
                keys: list[int] = []
                vals: list[int] = []
                latv = lonv = 0
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        nid = _zigzag(v2)
                    elif f2 == 2 and need_tags:
                        keys = _packed(v2)
                    elif f2 == 3 and need_tags:
                        vals = _packed(v2)
                    elif f2 == 8 and need_coords:
                        latv = _zigzag(v2)
                    elif f2 == 9 and need_coords:
                        lonv = _zigzag(v2)
                lat, lon = coord(latv, lonv) if need_coords else (None, None)
                st = get_strings() if need_tags else ()
                yield (
                    "node", nid, lat, lon, None, None, None, None,
                    [st[k] for k in keys] if need_tags else None,
                    [st[k] for k in vals] if need_tags else None,
                )
            elif fno == 2:  # DenseNodes
                ids: list[int] = []
                lats: list[int] = []
                lons: list[int] = []
                kvs: list[int] = []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        ids = _packed_zigzag_delta(v2)
                    elif f2 == 8 and need_coords:
                        lats = _packed_zigzag_delta(v2)
                    elif f2 == 9 and need_coords:
                        lons = _packed_zigzag_delta(v2)
                    elif f2 == 10 and need_tags:
                        kvs = _packed(v2)
                ki = 0
                nkv = len(kvs)
                st = get_strings() if need_tags and nkv else ()
                for idx, nid in enumerate(ids):
                    if need_tags and nkv:
                        tk: list[str] | None = []
                        tv: list[str] | None = []
                        while ki < nkv and kvs[ki] != 0:
                            tk.append(st[kvs[ki]])
                            tv.append(st[kvs[ki + 1]])
                            ki += 2
                        ki += 1  # skip the 0 delimiter
                    else:
                        tk = [] if need_tags else None
                        tv = [] if need_tags else None
                    lat, lon = (
                        coord(lats[idx], lons[idx])
                        if need_coords
                        else (None, None)
                    )
                    yield ("node", nid, lat, lon, None, None, None, None, tk, tv)
            elif fno == 3:  # Way
                wid = 0
                keys = []
                vals = []
                refs: list[int] | None = None
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        wid = v2
                    elif f2 == 2 and need_tags:
                        keys = _packed(v2)
                    elif f2 == 3 and need_tags:
                        vals = _packed(v2)
                    elif f2 == 8 and need_nds:
                        refs = _packed_zigzag_delta(v2)
                if need_nds and refs is None:
                    refs = []
                st = get_strings() if need_tags else ()
                yield (
                    "way", wid, None, None, refs, None, None, None,
                    [st[k] for k in keys] if need_tags else None,
                    [st[k] for k in vals] if need_tags else None,
                )
            elif fno == 4:  # Relation
                rid = 0
                keys = []
                vals = []
                roles: list[int] = []
                memids: list[int] | None = None
                types: list[int] = []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        rid = v2
                    elif f2 == 2 and need_tags:
                        keys = _packed(v2)
                    elif f2 == 3 and need_tags:
                        vals = _packed(v2)
                    elif f2 == 8 and need_roles:
                        roles = _packed(v2)
                    elif f2 == 9 and need_mrefs:
                        memids = _packed_zigzag_delta(v2)
                    elif f2 == 10 and need_mtypes:
                        types = _packed(v2)
                if need_mrefs and memids is None:
                    memids = []
                st = get_strings() if (need_tags or need_roles) else ()
                yield (
                    "relation", rid, None, None, None,
                    memids,
                    [_MEMBER_TYPES[t] for t in types] if need_mtypes else None,
                    [st[r] for r in roles] if need_roles else None,
                    [st[k] for k in keys] if need_tags else None,
                    [st[k] for k in vals] if need_tags else None,
                )


def iter_pbf_elements(path: str) -> Iterator[tuple]:
    """Single-process decode of every element (driver-side convenience /
    test oracle); the Spark path is :func:`read_pbf_tables`."""
    with open(path, "rb") as f:
        for btype, off, size in scan_blob_spans(path):
            if btype != "OSMData":
                continue
            f.seek(off)
            yield from _decode_primitive_block(_blob_raw(f.read(size)))


# ---------------------------------------------------------------- Spark entry

def read_pbf_unified(spark: SparkSession, path: str) -> DataFrame:
    """Blob-parallel decode → unified element DataFrame (persisted).

    The file must be reachable at the same path on every executor (shared
    storage — the standard cluster layout; trivially true in local mode)."""
    apath = os.path.abspath(path)
    spans = [
        (off, size)
        for btype, off, size in scan_blob_spans(apath)
        if btype == "OSMData"
    ]
    nparts = max(1, min(len(spans), spark.sparkContext.defaultParallelism))
    spans_df = spark.createDataFrame(spans, "off long, size long").repartition(
        nparts, "off"
    )

    def decode(batches):
        import pandas as pd

        cols = [c.split()[0] for c in _UNIFIED_SCHEMA.split(", ")]
        with open(apath, "rb") as f:
            for pdf in batches:
                rows = []
                for off, size in zip(pdf["off"], pdf["size"]):
                    f.seek(int(off))
                    rows.extend(_decode_primitive_block(_blob_raw(f.read(int(size)))))
                yield pd.DataFrame(rows, columns=cols)

    unified = spans_df.mapInPandas(decode, _UNIFIED_SCHEMA)
    # one decode pass serves all three per-kind outputs
    return unified.persist()


def read_pbf_tables(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """``.pbf`` → the engine's extract tables (``pbf_nodes`` /
    ``pbf_ways`` / ``pbf_relations``), schema-identical to a pre-ingested
    parquet extract (``sources/osm.py`` PBF_*_SCHEMA)."""
    u = read_pbf_unified(spark, path)
    tags = F.map_from_arrays(F.col("tag_keys"), F.col("tag_vals")).alias("tags")
    nodes = u.filter(F.col("kind") == "node").select("id", "lat", "lon", tags)
    ways = u.filter(F.col("kind") == "way").select(
        "id", F.col("nds").alias("nds"), tags
    )
    rels = u.filter(F.col("kind") == "relation").select(
        "id",
        F.zip_with(
            F.arrays_zip(
                F.col("mrefs").alias("ref"),
                F.col("mtypes").alias("type"),
            ),
            F.col("mroles"),
            lambda rt, role: F.struct(
                rt.getField("ref").alias("ref"),
                rt.getField("type").alias("type"),
                role.alias("role"),
            ),
        ).alias("members"),
        tags,
    )
    return {"pbf_nodes": nodes, "pbf_ways": ways, "pbf_relations": rels}


def ingest_pbf_to_parquet(spark: SparkSession, path: str, outdir: str) -> dict[str, int]:
    """One-shot ingest: ``.pbf`` → ``{outdir}/{nodes,ways,relations}.parquet``.

    The materialized layout is what every other entry point consumes
    (FIXTURES.md §6) — ingest once, scan many."""
    os.makedirs(outdir, exist_ok=True)
    tables = read_pbf_tables(spark, path)
    counts = {}
    for kind, df in (
        ("nodes", tables["pbf_nodes"]),
        ("ways", tables["pbf_ways"]),
        ("relations", tables["pbf_relations"]),
    ):
        out = os.path.join(outdir, f"{kind}.parquet")
        df.write.mode("overwrite").parquet(out)
        counts[kind] = spark.read.parquet(out).count()
    return counts


def main(argv: list[str] | None = None) -> int:  # pragma: no cover - thin CLI
    import argparse
    import sys

    p = argparse.ArgumentParser(
        prog="changegen_spark.sources.pbf",
        description="Ingest an OSM .pbf into nodes/ways/relations parquet.",
    )
    p.add_argument("pbf")
    p.add_argument("outdir")
    args = p.parse_args(argv)
    from changegen_spark.session import get_spark

    counts = ingest_pbf_to_parquet(get_spark("pbf-ingest"), args.pbf, args.outdir)
    print(f"ingested {args.pbf}: {counts}", file=sys.stderr)
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
