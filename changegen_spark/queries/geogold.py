"""Independent Python goldens → inline VALUES oracles for the two
geometry queries whose core algorithm is not SQL (convex hull via
monotone chain, Douglas-Peucker simplification).

Pattern: same as the media family (``queries/media.py``) — an
INDEPENDENT implementation computes the expected outputs and the oracle
is a literal table, so the driver's hash gate checks the Spark plan
end-to-end against separately-derived values instead of a weaker
rows-only count.  Independence here means different algorithms, not just
different code: the hull golden uses Jarvis gift-wrapping (the engine
uses Andrew's monotone chain, ``geo/hull.py``) and the simplification
golden uses the recursive Douglas-Peucker formulation (the engine uses
an explicit iterative stack, ``geo/simplify.py``) — an algorithmic bug
in either side breaks the match.

The goldens read the driver's correctness-scale snapshot
(``/root/testdata/sf0.01`` — the fixed sf of the oracle gate) with
DuckDB + plain Python; no Spark, no changegen_spark.geo imports.
"""

from __future__ import annotations

import functools
import os

GOLD_SF_DIR = "/root/testdata/sf0.01"

SIMPLIFY_EPS = 5.0  # keep in sync with queries/geo.py SIMPLIFY_EPS


def _coords(event_id: int) -> tuple[int, int]:
    """The synthetic trajectory coordinates both queries derive from
    event_id (mirrors the Spark expressions in queries/geo.py)."""
    x = (event_id * 37 + (event_id // 11) * 193) % 1000
    y = (event_id * 61 + (event_id // 13) * 389) % 1000
    return x, y


def _sample_users(sf_dir: str) -> dict[int, list[tuple]]:
    """user_id → [(ts, event_id)] for the user_id % 10 == 0 sample,
    sorted by (ts, event_id)."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT user_id, event_id, ts FROM read_parquet(?) "
        "WHERE user_id % 10 = 0 ORDER BY user_id, ts, event_id",
        [os.path.join(sf_dir, "events.parquet")],
    ).fetchall()
    con.close()
    users: dict[int, list[tuple]] = {}
    for u, e, ts in rows:
        users.setdefault(u, []).append((ts, e))
    return users


# ---- independent convex hull: Jarvis gift-wrapping, integer arithmetic ----


def _hull_jarvis(pts: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Hull vertices (collinear boundary points dropped) by wrapping:
    from each hull vertex pick the candidate every other point lies
    clockwise of, taking the FARTHEST among collinear candidates so
    intermediate collinear points never enter the hull."""
    P = sorted(set(pts))
    if len(P) <= 2:
        return P

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def d2(a, b):
        return (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2

    start = P[0]
    hull, cur = [], start
    while True:
        hull.append(cur)
        nxt = None
        for cand in P:
            if cand == cur:
                continue
            if nxt is None:
                nxt = cand
                continue
            c = cross(cur, nxt, cand)
            if c > 0 or (c == 0 and d2(cur, cand) > d2(cur, nxt)):
                nxt = cand
        cur = nxt
        if cur == start:
            break
    return hull


def _hull_area2(hull: list[tuple[int, int]]) -> int:
    if len(hull) < 3:
        return 0
    s = 0
    for a, b in zip(hull, hull[1:] + hull[:1]):
        s += a[0] * b[1] - b[0] * a[1]
    return abs(s)


# ---- independent Douglas-Peucker: recursive formulation ----


def _dp_recursive(xs: list[float], ys: list[float], eps: float) -> int:
    """Number of kept vertices.  Same numeric contract as the engine
    (d² = cross²/den compared against eps², first argmax wins, strict >)
    but expressed recursively instead of with an explicit stack."""
    n = len(xs)
    if n <= 2:
        return n
    eps2 = eps * eps
    keep = [False] * n
    keep[0] = keep[n - 1] = True

    def rec(lo: int, hi: int) -> None:
        ax, ay, bx, by = xs[lo], ys[lo], xs[hi], ys[hi]
        dx, dy = bx - ax, by - ay
        den = dx * dx + dy * dy
        best, best_d2 = -1, eps2
        for i in range(lo + 1, hi):
            if den == 0.0:
                dd = (xs[i] - ax) ** 2 + (ys[i] - ay) ** 2
            else:
                cr = dx * (ys[i] - ay) - dy * (xs[i] - ax)
                dd = cr * cr / den
            if dd > best_d2:
                best, best_d2 = i, dd
        if best >= 0:
            keep[best] = True
            rec(lo, best)
            rec(best, hi)

    rec(0, n - 1)
    return sum(keep)


# ---- VALUES-oracle builders ----


def convex_hull_values_sql(sf_dir: str = GOLD_SF_DIR) -> str:
    users = _sample_users(sf_dir)
    vals = []
    for u in sorted(users):
        pts = [_coords(e) for _, e in users[u]]
        hull = _hull_jarvis(pts)
        vals.append(f"({u}, {len(pts)}, {len(hull)}, {_hull_area2(hull)})")
    body = ",\n       ".join(vals)
    return (
        "SELECT CAST(user_id AS BIGINT) AS user_id,"
        " CAST(n_points AS INT) AS n_points,"
        " CAST(n_hull AS INT) AS n_hull,"
        " CAST(hull_area2_e2 AS BIGINT) AS hull_area2_e2\n"
        f"FROM (VALUES {body}) AS t(user_id, n_points, n_hull, hull_area2_e2)\n"
        "ORDER BY user_id"
    )


def simplify_values_sql(sf_dir: str = GOLD_SF_DIR) -> str:
    import math

    users = _sample_users(sf_dir)
    vals = []
    for u in sorted(users):
        xs, ys = [], []
        for _, e in users[u]:
            x, y = _coords(e)
            xs.append(float(x))
            ys.append(float(y))
        n = len(xs)
        kept = _dp_recursive(xs, ys, SIMPLIFY_EPS)
        # Spark round() is HALF_UP on positive doubles
        ratio = math.floor(kept * 1_000_000 / n + 0.5)
        vals.append(f"({u}, {n}, {kept}, {ratio})")
    body = ",\n       ".join(vals)
    return (
        "SELECT CAST(user_id AS BIGINT) AS user_id,"
        " CAST(n_points AS INT) AS n_points,"
        " CAST(n_kept AS INT) AS n_kept,"
        " CAST(keep_ratio_e6 AS BIGINT) AS keep_ratio_e6\n"
        f"FROM (VALUES {body}) AS t(user_id, n_points, n_kept, keep_ratio_e6)\n"
        "ORDER BY user_id"
    )


@functools.lru_cache(maxsize=1)
def build_oracles() -> dict[str, str]:
    """Golden oracles, or {} when the testdata snapshot is absent (the
    queries then stay rows-only instead of breaking import).  Memoized:
    all_oracles() is called repeatedly and the goldens are deterministic
    per process."""
    if not os.path.exists(os.path.join(GOLD_SF_DIR, "events.parquet")):
        return {}
    return {
        "q_convex_hulls": convex_hull_values_sql(),
        "q_simplify_trajectories": simplify_values_sql(),
    }
