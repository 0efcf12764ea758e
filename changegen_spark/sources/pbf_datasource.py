"""OSM PBF as a registered PySpark Python Data Source:
``spark.read.format("osmpbf").load("extract.osm.pbf")``.

The idiomatic-Spark face of the native decoder (sources/pbf.py,
reference parity: ``changegen/generator.py:35-53`` reads the extract via
libosmium callbacks; here the extract is a first-class table).  PySpark 4's
``pyspark.sql.datasource`` API lets the source own what the mapInPandas
wrapper (``read_pbf_unified``) had to emulate:

* **partition planning** — the driver scans only the blob index (header
  varints, ~µs per blob, no payload decode) and emits one
  ``InputPartition`` per OSMData blob; Spark schedules the ~8k-element
  blobs across executors like any other scan, and a planet file's
  ~10⁴-10⁵ blobs give natural parallelism with no repartition step;
* **schema declaration** — the unified element schema is the source's
  schema; column pruning happens in Spark on top (the decode is
  whole-row either way — PBF is row-group-less);
* **executor-side decode** — each task opens the file itself (shared
  storage, the standard cluster layout) and yields Arrow RecordBatches
  via pandas, so rows never route through the driver.

The mapInPandas path stays (CLI + tests use it); this module is the same
decode exposed the way a Spark user expects a format to look.  Parity is
pinned by tests/test_pbf_datasource.py: identical rows to
``read_pbf_unified`` on the reference's own fixture extract.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from changegen_spark.sources.pbf import (
    _UNIFIED_SCHEMA,
    _blob_raw,
    _decode_primitive_block,
    scan_blob_spans,
)


class PbfBlobPartition(InputPartition):
    """One OSMData blob: (byte offset, size) within the shared-path file."""

    def __init__(self, off: int, size: int):
        self.off = off
        self.size = size


class OsmPbfReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("osmpbf: .load(path) is required")
        import os

        self.path = os.path.abspath(path)

    def partitions(self):
        return [
            PbfBlobPartition(off, size)
            for btype, off, size in scan_blob_spans(self.path)
            if btype == "OSMData"
        ]

    def read(self, partition: PbfBlobPartition):
        with open(self.path, "rb") as f:
            f.seek(partition.off)
            raw = _blob_raw(f.read(partition.size))
        yield from _decode_primitive_block(raw)


class OsmPbfDataSource(DataSource):
    """``format("osmpbf")`` — unified OSM element rows from a .pbf file."""

    @classmethod
    def name(cls) -> str:
        return "osmpbf"

    def schema(self) -> str:
        return _UNIFIED_SCHEMA

    def reader(self, schema) -> OsmPbfReader:
        return OsmPbfReader(self.options)


def register(spark) -> None:
    """Idempotently register the osmpbf format on this session."""
    spark.dataSource.register(OsmPbfDataSource)
