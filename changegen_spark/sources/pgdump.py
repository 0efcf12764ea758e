"""PostgreSQL custom-format dump (``PGDMP``) reader → Spark DataFrames.

The reference consumes a live PostGIS database (``changegen/db.py:39-53``);
its test fixture ships that database as a ``pg_dump -Fc`` archive
(``test/data/dbdump.tar`` — custom format despite the name). No Postgres
runs in this container, so this module reads the archive directly, from
public format knowledge only (PostgreSQL source,
``src/bin/pg_dump/pg_backup_archiver.c`` / ``pg_backup_custom.c``):

  * header: ``PGDMP`` magic, archive version, int/offset sizes, format byte,
    compression, timestamp, dbname/version strings;
  * TOC: per-entry dumpId/desc/tag/defn/copyStmt/… with dependency lists;
  * data blocks: per-table zlib streams chunked as (int length, bytes),
    terminated by a zero-length chunk; payload is COPY text format
    (tab-separated, ``\\N`` nulls, backslash escapes).

Geometry columns arrive as PostGIS EWKB hex; ``decode_ewkb`` converts
Point/LineString/Polygon (+SRID flag, Z dropped) to WKT for the engine's
``parse_wkt`` ingestion path.

Scale note: one dump archive is a single sequential zlib stream per table —
inherently driver-side. That is the correct shape here: a dump is an
ingest-once artifact (like the ``.pbf``); the engine's scan path is the
parquet written from it. For live-DB parallel reads, ``sources/jdbc.py``
is the partitioned path.
"""

from __future__ import annotations

import struct as _struct
import zlib
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class TocEntry:
    dump_id: int
    had_dumper: bool
    tag: str
    desc: str
    section: int
    defn: str
    copy_stmt: str
    namespace: str
    owner: str
    deps: list[int] = field(default_factory=list)
    data_offset: int | None = None


class PgDumpArchive:
    """Minimal reader for ``pg_dump -Fc`` archives (format 1, zlib)."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            self._buf = f.read()
        self._pos = 0
        self._read_header()
        self.toc = self._read_toc()

    # --- primitive readers (pg_backup_archiver.c ReadInt/ReadStr/ReadOffset)

    def _byte(self) -> int:
        b = self._buf[self._pos]
        self._pos += 1
        return b

    def _int(self) -> int:
        sign = self._byte()
        val = 0
        for i in range(self.int_size):
            val |= self._byte() << (8 * i)
        return -val if sign else val

    def _str(self) -> str | None:
        ln = self._int()
        if ln < 0:
            return None
        s = self._buf[self._pos : self._pos + ln].decode("utf-8", "replace")
        self._pos += ln
        return s

    def _offset(self) -> tuple[int, int]:
        flag = self._byte()  # K_OFFSET_POS_NOT_SET / _SET / NO_DATA
        val = 0
        for i in range(self.off_size):
            val |= self._byte() << (8 * i)
        return flag, val

    # --- archive structure

    def _read_header(self) -> None:
        if self._buf[:5] != b"PGDMP":
            raise ValueError(f"{self.path}: not a pg_dump custom archive")
        self._pos = 5
        self.vmaj, self.vmin, self.vrev = self._byte(), self._byte(), self._byte()
        self.version = (self.vmaj, self.vmin)
        self.int_size = self._byte()
        self.off_size = self._byte()
        self.format = self._byte()
        if self.format != 1:
            raise ValueError(f"unsupported archive format {self.format} (want custom=1)")
        self.compression = self._int()
        # create date: sec, min, hour, mday, mon, year, isdst
        self.created = tuple(self._int() for _ in range(7))
        self.dbname = self._str()
        self.remote_version = self._str()
        self.pg_version = self._str()

    def _read_toc(self) -> list[TocEntry]:
        entries = []
        count = self._int()
        for _ in range(count):
            dump_id = self._int()
            had_dumper = bool(self._int())
            _tableoid = self._str()
            _oid = self._str()
            tag = self._str() or ""
            desc = self._str() or ""
            section = self._int() if self.version >= (1, 11) else 0
            defn = self._str() or ""
            _drop = self._str()
            copy_stmt = self._str() or ""
            namespace = self._str() or ""
            _tablespace = self._str() if self.version >= (1, 10) else None
            owner = self._str() or ""
            _with_oids = self._str() if self.version >= (1, 9) else None
            deps: list[int] = []
            while True:
                dep = self._str()
                if dep is None:
                    break
                deps.append(int(dep))
            _flag, off = self._offset()
            entries.append(
                TocEntry(
                    dump_id, had_dumper, tag, desc, section, defn,
                    copy_stmt, namespace, owner, deps,
                    off if off > 0 else None,
                )
            )
        return entries

    # --- data blocks

    def _read_data_at(self, offset: int) -> bytes:
        """Data block at offset: 1-byte block type, dumpId int, then
        (length, bytes) chunks ended by a zero-length chunk; zlib when
        compression != 0."""
        self._pos = offset
        _blk_type = self._byte()  # BLK_DATA = 1
        _dump_id = self._int()
        chunks = []
        while True:
            ln = self._int()
            if ln <= 0:
                break
            chunks.append(self._buf[self._pos : self._pos + ln])
            self._pos += ln
        payload = b"".join(chunks)
        if self.compression != 0:
            return zlib.decompress(payload)
        return payload

    # --- public surface

    def table_data_entries(self) -> list[TocEntry]:
        return [t for t in self.toc if t.desc == "TABLE DATA" and t.data_offset]

    def read_table(self, tag: str) -> tuple[list[str], list[list[str | None]]]:
        """(column_names, rows) for one table's COPY data."""
        entry = next(
            (t for t in self.table_data_entries() if t.tag == tag), None
        )
        if entry is None:
            raise KeyError(f"no TABLE DATA entry for {tag!r} in {self.path}")
        cols = _copy_columns(entry.copy_stmt)
        raw = self._read_data_at(entry.data_offset).decode("utf-8", "replace")
        rows = [
            _split_copy_row(line)
            for line in raw.split("\n")
            if line and line != "\\."
        ]
        return cols, rows


def _copy_columns(copy_stmt: str) -> list[str]:
    """``COPY public.t (a, b, "c") FROM stdin;`` → [a, b, c]."""
    inner = copy_stmt[copy_stmt.index("(") + 1 : copy_stmt.rindex(")")]
    return [c.strip().strip('"') for c in inner.split(",")]


_COPY_ESC = {
    "\\": "\\", "b": "\b", "f": "\f", "n": "\n",
    "r": "\r", "t": "\t", "v": "\v",
}


def _split_copy_row(line: str) -> list[str | None]:
    """COPY text-format row → values (None for ``\\N``)."""
    out: list[str | None] = []
    cur: list[str] = []
    i = 0
    n = len(line)
    is_null = False
    while i <= n:
        if i == n or line[i] == "\t":
            out.append(None if is_null else "".join(cur))
            cur = []
            is_null = False
            i += 1
            continue
        ch = line[i]
        if ch == "\\":
            nxt = line[i + 1] if i + 1 < n else ""
            if nxt == "N" and not cur:
                is_null = True
                i += 2
                continue
            if nxt in _COPY_ESC:
                cur.append(_COPY_ESC[nxt])
                i += 2
                continue
        cur.append(ch)
        i += 1
    return out


# ------------------------------------------------------------------- EWKB

def decode_ewkb(hex_str: str | None) -> str | None:
    """PostGIS EWKB hex → WKT (Point/LineString/Polygon; SRID flag and Z
    dimension handled; Multi* raise — the engine rejects them anyway)."""
    if hex_str is None:
        return None
    buf = bytes.fromhex(hex_str)
    wkt, _ = _wkb_geom(buf, 0)
    return wkt


_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


def _wkb_geom(buf: bytes, pos: int) -> tuple[str, int]:
    little = buf[pos] == 1
    fmt = "<" if little else ">"
    (raw_type,) = _struct.unpack_from(fmt + "I", buf, pos + 1)
    pos += 5
    gtype = raw_type & 0xFFFF
    has_z = bool(raw_type & _EWKB_Z)
    has_m = bool(raw_type & _EWKB_M)
    if raw_type & _EWKB_SRID:
        pos += 4  # skip srid
    dims = 2 + has_z + has_m

    def read_pt(p: int) -> tuple[str, int]:
        vals = _struct.unpack_from(fmt + "d" * dims, buf, p)
        return f"{vals[0]!r} {vals[1]!r}", p + 8 * dims

    if gtype == 1:  # Point
        pt, pos = read_pt(pos)
        return f"POINT ({pt})", pos
    if gtype == 2:  # LineString
        (npts,) = _struct.unpack_from(fmt + "I", buf, pos)
        pos += 4
        pts = []
        for _ in range(npts):
            pt, pos = read_pt(pos)
            pts.append(pt)
        return "LINESTRING (" + ", ".join(pts) + ")", pos
    if gtype == 3:  # Polygon
        (nrings,) = _struct.unpack_from(fmt + "I", buf, pos)
        pos += 4
        rings = []
        for _ in range(nrings):
            (npts,) = _struct.unpack_from(fmt + "I", buf, pos)
            pos += 4
            pts = []
            for _ in range(npts):
                pt, pos = read_pt(pos)
                pts.append(pt)
            rings.append("(" + ", ".join(pts) + ")")
        return "POLYGON (" + ", ".join(rings) + ")", pos
    raise ValueError(f"unsupported WKB geometry type {gtype}")


# ---------------------------------------------------------------- Spark entry

def read_pgdump_table(
    spark: SparkSession,
    path: str,
    table: str,
    geometry_cols: tuple[str, ...] = ("geometry", "geom"),
) -> DataFrame:
    """One dump table → DataFrame (all columns string, EWKB geometry
    columns decoded to WKT — feed through ``geo.geometry.parse_wkt`` or the
    CLI's WKT ingestion)."""
    archive = PgDumpArchive(path)
    cols, rows = archive.read_table(table)
    gidx = [i for i, c in enumerate(cols) if c in geometry_cols]
    conv = []
    for r in rows:
        r = list(r)
        for i in gidx:
            r[i] = decode_ewkb(r[i])
        conv.append(r)
    schema = ", ".join(f"`{c}` string" for c in cols)
    return spark.createDataFrame(conv, schema)


def list_pgdump_tables(path: str) -> list[str]:
    return [t.tag for t in PgDumpArchive(path).table_data_entries()]
