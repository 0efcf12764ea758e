"""Stable per-feature keys for tables that carry no (reliable) id column.

The reference processes each feature independently per OGR FID
(``changegen/generator.py:577-600``), so every row — including exact
duplicates and rows with NULL ids — gets its own identity. The distributed
equivalent: hash the geometry WKT together with EVERY attribute value
(geometry alone conflates stacked routes / duplicate imports), then append a
deterministic occurrence index so even fully identical rows stay distinct
(identical rows are interchangeable, so the index is deterministic in
output terms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def feature_key(df: DataFrame, geom_col: str, out_col: str = "__fkey") -> DataFrame:
    """Attach a row-unique deterministic key column."""
    from changegen_spark.geo.geometry import wkt

    attr_cols = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
        for c in df.columns
        if c != geom_col and not c.startswith("__")
    ]
    base_key = F.md5(
        F.to_binary(
            F.concat_ws("\x1f", wkt(F.col(geom_col)), *attr_cols), F.lit("utf-8")
        )
    )
    keyed = df.withColumn("__bkey", base_key)
    occ = F.row_number().over(Window.partitionBy("__bkey").orderBy("__bkey"))
    return keyed.withColumn(
        out_col, F.concat_ws(":", F.col("__bkey"), occ.cast("string"))
    ).drop("__bkey")
