"""Error-tolerant row processing as a first-class operator (SURVEY §2.2 P7).

The reference wraps each feature in try/except, logs and skips bad rows
(``changegen/generator.py:585,768-772``).  The distributed form must not
silently drop data on a 1000-executor run: rows that fail validation are
ROUTED, not skipped — the pipeline continues on the good branch while the
quarantine branch is preserved for audit (written alongside the output or
counted into run metrics).

Implementation is declarative: each check is a boolean Column, so Catalyst
keeps both branches as cheap filters over one scan (no UDF, no exceptions
in the hot path); ``try_*`` casts/parses supply the per-value error
tolerance inside expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_quarantine(
    df: DataFrame, checks: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split df into (good, quarantined) by named validity checks.

    ``checks`` maps reason-label → boolean Column (True = valid).  The
    quarantine branch carries a ``__reasons`` array naming every failed
    check — the audit trail the reference's log lines provided.
    """
    if not checks:
        return df, df.limit(0).withColumn("__reasons", F.array().cast("array<string>"))
    failed = F.filter(
        F.array(
            *[
                F.when(~F.coalesce(cond, F.lit(False)), F.lit(name)).otherwise(F.lit(None))
                for name, cond in checks.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    tagged = df.withColumn("__reasons", failed)
    good = tagged.filter(F.size("__reasons") == 0).drop("__reasons")
    bad = tagged.filter(F.size("__reasons") > 0)
    return good, bad


def geometry_checks(geom_col: str = "geometry") -> dict[str, Column]:
    """The pipeline's standard geometry validity checks (P3 null filter +
    P4 type dispatch guard + degenerate-ring guard)."""
    g = F.col(geom_col)
    ring = F.element_at(g.getField("rings"), 1)
    return {
        "null_geometry": g.isNotNull() & g.getField("rings").isNotNull(),
        "unsupported_type": g.getField("gtype").isin("Point", "LineString", "Polygon"),
        "degenerate_ring": F.coalesce(F.size(ring) >= 1, F.lit(False)),
    }
