"""Douglas-Peucker polyline simplification — the geometry-reduction pass
(ST_Simplify analog) a pipeline runs before shipping trajectories or way
geometries downstream.

Recursive max-perpendicular-distance splitting is not expressible as a
Catalyst plan, so the algorithm runs as an Arrow-batched UDF over the
per-geometry coordinate ARRAYS (one row per geometry — the natural unit
of work; a geometry's size is bounded, the number of geometries is not,
so parallelism comes from rows exactly like the codec stages in
multimodal/assets.py).  Iterative stack formulation — no Python recursion
limit on long ways.

Determinism: squared distances compared with exact float arithmetic on
integer-valued coordinates; the first index attaining the maximum wins,
so the kept set is a pure function of the input.
"""

from __future__ import annotations

from pyspark.sql import Column


def simplify_indices(xs: list, ys: list, eps: float) -> list:
    """Indices of the kept vertices (always includes both endpoints).
    Plain-Python reference used by the UDF itself and by tests."""
    n = len(xs)
    if n <= 2:
        return list(range(n))
    keep = [False] * n
    keep[0] = keep[n - 1] = True
    eps2 = eps * eps
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        ax, ay, bx, by = xs[lo], ys[lo], xs[hi], ys[hi]
        dx, dy = bx - ax, by - ay
        den = dx * dx + dy * dy
        best, best_d2 = -1, eps2
        for i in range(lo + 1, hi):
            if den == 0.0:
                d2 = (xs[i] - ax) ** 2 + (ys[i] - ay) ** 2
            else:
                cross = dx * (ys[i] - ay) - dy * (xs[i] - ax)
                d2 = cross * cross / den
            if d2 > best_d2:
                best, best_d2 = i, d2
        if best >= 0:
            keep[best] = True
            stack.append((lo, best))
            stack.append((best, hi))
    return [i for i in range(n) if keep[i]]


def simplify_udf(eps: float):
    """pandas UDF: (array<double> xs, array<double> ys) →
    array<int> kept vertex indices."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def simp(xs, ys):
        return pd.Series(
            [simplify_indices(list(x), list(y), eps) for x, y in zip(xs, ys)]
        )

    return simp


def simplify_arrays(xs: Column, ys: Column, eps: float) -> Column:
    return simplify_udf(eps)(xs, ys)
