"""As-of (temporal) join and binned range join — time-series operators.

Beyond-reference surface for the event-stream family (the reference has no
time-series joins; these are the standard operators a training-data /
telemetry pipeline needs, per the build brief).  Both are expressed as
shuffle-bounded DataFrame plans — never an inequality-only join, which
Catalyst would execute as a broadcast nested-loop or cartesian product:

* ``as_of_join`` — the union–sort–window formulation: tag both inputs,
  union them, and carry the most recent right-side row forward with
  ``last(ignorenulls=True)`` over a (keys, ts)-ordered window.  ONE shuffle
  on the join keys, zero row amplification, no range probe at all — this is
  the shape that survives 100 TB (an inequality join's bucket probe would
  re-scan; the window scan is a single ordered pass per key).
* ``range_join_binned`` — filter-and-refine for ``right.ts ∈ [lo, hi)``
  interval predicates: bin the right side by fixed-width time cells,
  explode the left interval to the cells it covers (bounded amplification:
  ``(hi-lo)/bin_width + 1`` cells), hash equi-join on (keys, cell), then
  apply the exact predicate.  Each right row lives in exactly one cell, so
  no pair is produced twice and no dedup pass is needed.  Same design as
  the spatial grid join (``geo/join.py``), one dimension down.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_value_cols: list[str],
    tie_col: str | None = None,
    tolerance_us: int | None = None,
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right.ts_col <= left.ts_col`` sharing the ``on`` keys (backward
    as-of, inclusive — Pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
    semantics).  Left rows with no prior right row keep NULLs.

    ``ts_col`` must be a timestamp column present in both inputs.  The
    matched right columns come back as ``right_<name>``.  When several
    right rows share one timestamp, the greatest ``tie_col`` wins
    (deterministic); pass a pre-deduped right side if cross-engine parity
    with an ASOF oracle is required.  ``tolerance_us`` drops matches older
    than the given microsecond gap.
    """
    ts_us = F.unix_micros(F.col(ts_col))
    # Right rows sort BEFORE left rows at an equal timestamp so the
    # inclusive (<=) match sees them; among right rows the tie column
    # ascends so last() keeps the greatest.
    tie = F.col(tie_col) if tie_col is not None else F.lit(0)
    r_tagged = right.select(
        *on,
        ts_us.alias("__ts_us"),
        F.lit(0).alias("__side"),
        tie.alias("__tie"),
        F.struct(
            ts_us.alias("__rts_us"),
            *[F.col(c).alias(c) for c in right_value_cols],
        ).alias("__rval"),
    )
    l_tagged = left.select(
        "*",
        ts_us.alias("__ts_us"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__tie"].dataType).alias("__tie"),
        F.lit(None).cast(r_tagged.schema["__rval"].dataType).alias("__rval"),
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts_us", "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumn("__match", F.last("__rval", ignorenulls=True).over(w))
    out = matched.filter(F.col("__side") == 1)
    if tolerance_us is not None:
        out = out.withColumn(
            "__match",
            F.when(
                F.col("__ts_us") - F.col("__match.__rts_us") <= F.lit(tolerance_us),
                F.col("__match"),
            ),
        )
    gap = F.col("__ts_us") - F.col("__match.__rts_us")
    keep = [c for c in left.columns]
    return out.select(
        *keep,
        *[F.col(f"__match.{c}").alias(f"right_{c}") for c in right_value_cols],
        gap.alias("gap_us"),
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    lo_us: Column,
    hi_us: Column,
    bin_width_us: int,
    right_ts_col: str = "ts",
) -> DataFrame:
    """Inner-join each left interval ``[lo_us, hi_us)`` (microsecond
    expressions over ``left``) to the right rows whose ``right_ts_col``
    falls inside it, sharing the ``on`` keys.  Plan shape: hash equi-join
    on (keys, time cell) + exact refine — never a nested-loop range probe.
    Right columns come back as ``right_<name>``; aggregate downstream.
    """
    l_binned = (
        left.withColumn("__lo_us", lo_us)
        .withColumn("__hi_us", hi_us)
        .withColumn(
            "__cell",
            F.explode(
                F.sequence(
                    F.floor(F.col("__lo_us") / bin_width_us),
                    # hi is exclusive: a hi on a cell boundary contributes
                    # nothing to that cell, but floor((hi-1)/w) needs hi>lo
                    F.floor((F.col("__hi_us") - 1) / bin_width_us),
                )
            ),
        )
    )
    r_ts_us = F.unix_micros(F.col(right_ts_col))
    r_binned = right.select(
        *on,
        r_ts_us.alias("__rts_us"),
        F.floor(r_ts_us / bin_width_us).alias("__cell"),
        F.struct(*[F.col(c) for c in right.columns]).alias("__rrow"),
    )
    joined = l_binned.join(r_binned, [*on, "__cell"], "inner").filter(
        (F.col("__rts_us") >= F.col("__lo_us")) & (F.col("__rts_us") < F.col("__hi_us"))
    )
    keep = [c for c in left.columns]
    rcols = [c for c in right.columns if c not in on]
    return joined.select(
        *keep, *[F.col(f"__rrow.{c}").alias(f"right_{c}") for c in rcols]
    )
