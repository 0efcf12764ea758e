"""Generic table-diff (CDC) operator — the engine's defining computation
(SURVEY §2.9) abstracted from the OSM pipeline.

The reference derives creates/modifies/deletes from pre-labeled PostGIS
tables; at 100 TB the upstream often has only two snapshots.  ``diff_tables``
computes the change set directly: full outer join on the key, row-hash
comparison for modification detection.

Scale shape: one hash-partitioned shuffle on the key for the join; the
row fingerprint is computed map-side BEFORE the join so modification
detection is a single hash comparison, never a column-by-column one.
The payload columns still ride the exchange: a proxy-shuffle variant
(shuffle only (key, hash), then re-fetch changed payloads with a second
scan + semi-join, guide §8) only pays off when the payload is much wider
than key + 16-byte fingerprint — for narrow rows like q_snapshot_diff's
(~24 B compared columns) the md5 hex alone out-weighs the payload, so
the direct join IS the slim plan (measured disposition, r14).  Bloom
pre-filtering (§3.2) cannot apply at all: rows missing from one side are
the create/delete OUTPUT, so there is no prunable non-matching set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def row_fingerprint(df: DataFrame, cols: list[str]) -> F.Column:
    """Deterministic row hash over the compared columns (null-safe)."""
    return F.md5(
        F.to_binary(
            F.concat_ws(
                "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
            ),
            F.lit("utf-8"),
        )
    )


def diff_tables(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change set between two snapshots keyed by ``key``.

    Returns new-side columns (old-side for deletes) + ``change_type`` ∈
    {create, modify, delete}; unchanged rows are dropped.  Version contract
    matches the changegen pipeline (create=1, modify=2, delete=99).
    """
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c != key]
    o = old.select(
        F.col(key).alias("__k"),
        row_fingerprint(old, compare_cols).alias("__oh"),
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    )
    n = new.select(
        F.col(key).alias("__k"),
        row_fingerprint(new, compare_cols).alias("__nh"),
        *compare_cols,
    )
    j = o.join(n, "__k", "full_outer")
    change = (
        F.when(F.col("__oh").isNull(), F.lit("create"))
        .when(F.col("__nh").isNull(), F.lit("delete"))
        .when(F.col("__oh") != F.col("__nh"), F.lit("modify"))
    )
    out = j.withColumn("change_type", change).filter(F.col("change_type").isNotNull())
    version = (
        F.when(F.col("change_type") == "create", 1)
        .when(F.col("change_type") == "modify", 2)
        .otherwise(99)
    )
    # deletes carry old values; creates/modifies carry new values — branch on
    # the change type, NOT coalesce (a modify-to-NULL must surface the null)
    payload = [
        F.when(F.col("change_type") == "delete", F.col(f"__o_{c}"))
        .otherwise(F.col(c))
        .alias(c)
        for c in compare_cols
    ]
    return out.select(
        F.col("__k").alias(key),
        F.col("change_type"),
        version.alias("version"),
        *payload,
    )
