"""OSMChange (.osc) reader — the inverse of ``sinks.oscxml``.

Reading a changefile back as the unified element DataFrame closes the
loop: changefiles become inputs (apply/inspect/diff-of-diffs workflows),
and round-trip tests can assert ``read(write(x)) == x``.

A changefile is a single ordered XML document (≪ cluster data by
construction — see the sink's contract), so the parse is driver-side
iterparse (constant memory) into ``createDataFrame``; the distributed
work on the result is ordinary DataFrame ops.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET
from typing import IO

from pyspark.sql import DataFrame, SparkSession

from changegen_spark.sinks.oscxml import ELEMENT_SCHEMA


def _open(path: str) -> IO[bytes]:
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def read_osmchange(spark: SparkSession, path: str) -> DataFrame:
    """Parse an .osc (optionally gzipped) into the element DataFrame."""
    rows = []
    change_type = None
    with _open(path) as f:
        for event, elem in ET.iterparse(f, events=("start", "end")):
            if event == "start":
                if elem.tag in ("create", "modify", "delete"):
                    change_type = elem.tag
                continue
            if elem.tag not in ("node", "way", "relation"):
                continue
            tags = {t.attrib["k"]: t.attrib["v"] for t in elem.findall("tag")}
            nds = [int(nd.attrib["ref"]) for nd in elem.findall("nd")] or None
            members = [
                {
                    "ref": int(m.attrib["ref"]),
                    "type": m.attrib["type"],
                    "role": m.attrib.get("role", ""),
                }
                for m in elem.findall("member")
            ] or None
            rows.append(
                (
                    change_type,
                    elem.tag,
                    int(elem.attrib["id"]),
                    int(elem.attrib.get("version", 0)),
                    float(elem.attrib["lat"]) if "lat" in elem.attrib else None,
                    float(elem.attrib["lon"]) if "lon" in elem.attrib else None,
                    nds,
                    members,
                    tags,
                )
            )
            elem.clear()  # constant-memory iterparse
    return spark.createDataFrame(rows, ELEMENT_SCHEMA)
