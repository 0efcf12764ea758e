"""Interval-overlap join: all pairs (a, b) with a.start <= b.end AND
b.start <= a.end, expressed as a bucketized EQUI-join.

Spark has no native interval join: writing the overlap predicate directly
gives Catalyst no equi-key, so it plans a BroadcastNestedLoopJoin (or a
cartesian) — quadratic work that dies at scale.  The standard fix (used by
every range-join-capable engine, e.g. the interval binning in Databricks'
range join optimization) is to discretize time into fixed-width buckets:
each interval registers in every bucket it touches, candidate pairs meet
in their shared bucket through a plain hash join, duplicates from
multi-bucket overlaps collapse with a distinct, and the exact predicate
filters the survivors.

Scale properties: shuffle keys are (bucket), so co-temporal rows land
together — the natural partitioning of time-series data; work is
O(|A| + |B| + candidates), never |A| x |B|.  Bucket width tunes the
trade: wide buckets → more false candidates per bucket; narrow buckets →
more bucket rows per long interval (rows multiply by
interval_len/width).  Pick width ~ the typical interval length.  A hot
bucket (thundering-herd moment) is an AQE-skew-join case, same as any
hot equi-key."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_width: int,
) -> DataFrame:
    """Inner interval-overlap join of ``a`` and ``b`` (closed intervals,
    integer endpoints — e.g. epoch micros).  Column names must be
    disjoint.  Output rows are distinct combined rows of every
    overlapping pair — callers should project ids + endpoints only
    (the distinct that collapses multi-bucket duplicates hashes every
    output column)."""
    w = F.lit(bucket_width).cast("long")
    ab = a.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(a_start) / w).cast("long"),
                F.floor(F.col(a_end) / w).cast("long"),
            )
        ),
    )
    bb = b.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(b_start) / w).cast("long"),
                F.floor(F.col(b_end) / w).cast("long"),
            )
        ),
    )
    return (
        ab.join(bb, "_bucket")
        .filter(
            (F.col(a_start) <= F.col(b_end)) & (F.col(b_start) <= F.col(a_end))
        )
        .drop("_bucket")
        .distinct()
    )
