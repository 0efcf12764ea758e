"""Skew-mitigation helpers for 100 TB joins (SURVEY §4 / task brief).

AQE's skew-join splitting covers sort-merge joins at runtime; explicit
salting is still the right tool when (a) the skew is known ahead of time
(hot keys in a junction/LSH-bucket join), or (b) the operator is an
aggregation whose hot groups overwhelm single reducers.

``salted_join`` replicates the small side N ways and scatters the big
side's hot keys across N sub-keys — the classic
broadcast-unfriendly-but-skewed equi-join fix.  ``two_phase_agg`` does
salt → partial agg → final agg for skewed groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's key salted ``salt`` ways.

    The big side gets a deterministic per-row salt (hash-based, no RNG —
    reproducible across retries, which nondeterministic salting is not);
    the small side is exploded ×salt so every (key, salt) bucket matches.
    Shuffle volume for the small side grows ×salt; reducer load for a hot
    key shrinks ÷salt.
    """
    bsalt = (F.abs(F.hash(*[F.col(c) for c in big.columns])) % salt).alias("__salt")
    b = big.withColumn("__salt", bsalt)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = b.join(s, [on, "__salt"], how)
    return out.drop("__salt")


_MERGE = {"sum": F.sum, "min": F.min, "max": F.max}


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, str]],
    salt: int = 16,
) -> DataFrame:
    """Skew-safe aggregation: salt → partial agg per (keys, salt) → final
    merge per keys.  ``aggs`` maps output name → (partial aggregate
    expression, merge op in {'sum','min','max'}); e.g. a count partial
    merges with 'sum'.

    This is what map-side combine already does for hash aggregates — the
    explicit two-phase form exists for operators where a single hot group
    still funnels to one reducer (e.g. collect-heavy aggs).
    """
    partial = df.withColumn(
        "__salt",
        F.abs(F.hash(*[F.col(k) for k in keys], F.monotonically_increasing_id())) % salt,
    ).groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE[merge](f"__p_{name}").alias(name)
            for name, (_, merge) in aggs.items()
        ]
    )
