"""Convex hull (ST_ConvexHull analog) via Andrew's monotone chain —
integer cross-product arithmetic, so hull membership is exact and
deterministic on integer coordinates (collinear boundary points are
dropped: strict turns only).

Row-parallel like geo/simplify.py: one geometry (point set) per row, the
hull computed in an Arrow-batched UDF over the coordinate arrays.
"""

from __future__ import annotations

from pyspark.sql import Column


def convex_hull_indices(xs: list, ys: list) -> list:
    """Indices (into the input order) of the hull vertices in
    counter-clockwise order starting from the lexicographically smallest
    point.  Duplicates collapse; < 3 distinct points return what exists."""
    pts = sorted(range(len(xs)), key=lambda i: (xs[i], ys[i]))
    # drop exact duplicates, keeping the first occurrence
    uniq = []
    for i in pts:
        if not uniq or (xs[i], ys[i]) != (xs[uniq[-1]], ys[uniq[-1]]):
            uniq.append(i)
    if len(uniq) <= 2:
        return uniq

    def cross(o, a, b):
        return (xs[a] - xs[o]) * (ys[b] - ys[o]) - (ys[a] - ys[o]) * (xs[b] - xs[o])

    lower = []
    for i in uniq:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], i) <= 0:
            lower.pop()
        lower.append(i)
    upper = []
    for i in reversed(uniq):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], i) <= 0:
            upper.pop()
        upper.append(i)
    return lower[:-1] + upper[:-1]


def hull_area2(xs: list, ys: list) -> int:
    """Twice the hull area (shoelace over the hull ring) — exact integer
    on integer coordinates."""
    h = convex_hull_indices(xs, ys)
    if len(h) < 3:
        return 0
    s = 0
    for a, b in zip(h, h[1:] + h[:1]):
        s += xs[a] * ys[b] - xs[b] * ys[a]
    return abs(s)


def hull_stats_udf():
    """pandas UDF: (xs, ys) → struct<n_hull:int, hull_area2:long>."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<n_hull:int, hull_area2:long>")
    def hs(xs, ys):
        out = []
        for x, y in zip(xs, ys):
            x, y = [int(v) for v in x], [int(v) for v in y]
            out.append(
                {"n_hull": len(convex_hull_indices(x, y)), "hull_area2": hull_area2(x, y)}
            )
        return pd.DataFrame(out)

    return hs


def hull_stats(xs: Column, ys: Column) -> Column:
    return hull_stats_udf()(xs, ys)
