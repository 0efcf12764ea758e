"""Seeded-random brute-force parity sweeps for the r3 operator family:
interval-overlap join, triangle counting, PPS sampling, and the exact
set-similarity join.  Each case compares the distributed operator against
a straight-line Python implementation on a random instance — the same
independent-reference strategy as test_graph/test_lm, with deterministic
seeds so failures reproduce."""

import random

from pyspark.sql import functions as F


def test_overlap_join_random_instances(spark):
    from changegen_spark.operators.intervals import overlap_join

    rng = random.Random(42)
    for case in range(4):
        a = [
            (i, s, s + rng.randint(0, 400))
            for i, s in ((i, rng.randint(0, 2000)) for i in range(60))
        ]
        b = [
            (i, s, s + rng.randint(0, 100))
            for i, s in ((i, rng.randint(0, 2000)) for i in range(60))
        ]
        width = rng.choice([7, 50, 300, 1000])
        expected = {
            (x[0], y[0])
            for x in a
            for y in b
            if x[1] <= y[2] and y[1] <= x[2]
        }
        da = spark.createDataFrame(a, "aid long, s1 long, e1 long")
        db = spark.createDataFrame(b, "bid long, s2 long, e2 long")
        got = {
            (r["aid"], r["bid"])
            for r in overlap_join(da, db, "s1", "e1", "s2", "e2", width).collect()
        }
        assert got == expected, f"case {case} width {width}"


def test_triangle_counts_random_graphs(spark):
    from changegen_spark.queries.graph import triangle_counts

    rng = random.Random(7)
    for case in range(3):
        n = 25
        edges = sorted(
            {
                (a, b)
                for _ in range(rng.randint(30, 120))
                for a, b in [sorted(rng.sample(range(1, n + 1), 2))]
            }
        )
        eset = set(edges)
        expected = {}
        for i in range(1, n + 1):
            for j in range(i + 1, n + 1):
                for k in range(j + 1, n + 1):
                    if (i, j) in eset and (i, k) in eset and (j, k) in eset:
                        for v in (i, j, k):
                            expected[v] = expected.get(v, 0) + 1
        df = spark.createDataFrame(edges, "p1 long, p2 long")
        got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
        assert got == expected, f"case {case}"


def test_weighted_sample_random_weights(spark):
    import changegen_spark.queries.mlprep as mp

    rng = random.Random(99)
    for case in range(3):
        rows = [
            (i, "t", "en", "s", rng.randint(1, 500)) for i in range(1, 80)
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        # straight-line reference: cumulative weights + ceil arithmetic
        tw = sum(r[4] for r in rows)
        m = mp.WS_SAMPLES
        c = 0
        expected = {}
        for did, _t, _l, _s, w in rows:
            picks = -(-((c + w) * m) // tw) - (-(-(c * m) // tw))
            if picks > 0:
                expected[did] = (w, c, picks)
            c += w
        orig = mp._docs
        mp._docs = lambda _sp, _d: df.repartition(rng.randint(1, 9))
        try:
            got = {
                r["doc_id"]: (r["w"], r["c"], r["n_picks"])
                for r in mp.q_weighted_sample(spark, "u").collect()
            }
        finally:
            mp._docs = orig
        assert got == expected, f"case {case}"
        assert sum(v[2] for v in got.values()) == m


def test_setsim_random_texts(spark):
    import changegen_spark.queries.setsim as ss

    rng = random.Random(5)
    vocab = ["alpha", "bravo", "chnge", "delta", "echos", "fxtrt"]
    docs = {}
    for i in range(30):
        base = [rng.choice(vocab) for _ in range(rng.randint(3, 8))]
        docs[i] = " ".join(base)
        if rng.random() < 0.4:  # planted near-dup with a small edit
            twin = list(base)
            twin[rng.randrange(len(twin))] = rng.choice(vocab)
            docs[100 + i] = " ".join(twin)

    def brute(ds):
        k = ss.SHINGLE_K
        sets = {
            i: ({t[j : j + k] for j in range(len(t) - k + 1)} if len(t) >= k else {t})
            for i, t in ((i, s.lower()) for i, s in ds.items())
        }
        out = set()
        for x in sets:
            for y in sets:
                if x < y:
                    inter = len(sets[x] & sets[y])
                    union = len(sets[x] | sets[y])
                    if ss.T_DEN * inter >= ss.T_NUM * union:
                        out.add((x, y))
        return out

    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in ss.setsim_join(df, "doc_id", "text").collect()
    }
    assert got == brute(docs)
    assert got  # the planted twins guarantee at least one pair


def test_geo_measures_physical_invariants(spark):
    """Physical invariants of the trajectory measures on real data (exact
    values are pinned by the DuckDB oracle gate): path length bounded by
    segments x field diagonal, shoelace area bounded by the field, bbox
    ordered, centroid inside the bbox."""
    import changegen_spark.queries.geo as geo

    rows = geo.q_geo_measures(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        # path length of n points has n-1 segments, each <= field diagonal
        diag_e6 = int((2 * 99.9**2) ** 0.5 * 1e6) + 1
        assert 0 <= r["path_len_e6"] <= (r["n_points"] - 1) * diag_e6
        # shoelace area of any polygon inside the 100x100 field
        assert 0 <= r["area2_e2"] <= 2 * 1000 * 1000
        assert 0 <= r["min_x10"] <= r["max_x10"] <= 999
        assert r["min_x10"] / 10 <= r["centroid_x"] <= r["max_x10"] / 10
        assert r["min_y10"] / 10 <= r["centroid_y"] <= r["max_y10"] / 10


def test_douglas_peucker_reference_cases():
    """DP on hand-computable polylines: collinear collapse, preserved
    zigzag, epsilon monotonicity, and closed-loop (den=0) handling."""
    from changegen_spark.geo.simplify import simplify_indices

    # perfectly collinear -> endpoints only
    xs = [0.0, 1.0, 2.0, 3.0, 4.0]
    ys = [0.0, 1.0, 2.0, 3.0, 4.0]
    assert simplify_indices(xs, ys, 0.1) == [0, 4]
    # one big detour survives; flanking points die at eps=1.0 (their
    # perpendicular distance to the (0,0)-(2,3) chord is sqrt(9/13)~0.83)
    xs = [0.0, 1.0, 2.0, 3.0, 4.0]
    ys = [0.0, 0.0, 3.0, 0.0, 0.0]
    assert simplify_indices(xs, ys, 1.0) == [0, 2, 4]
    assert simplify_indices(xs, ys, 0.5) == [0, 1, 2, 3, 4]
    # zigzag above eps keeps every vertex
    xs = [0.0, 1.0, 2.0, 3.0, 4.0]
    ys = [0.0, 2.0, 0.0, 2.0, 0.0]
    assert simplify_indices(xs, ys, 0.5) == [0, 1, 2, 3, 4]
    # epsilon monotonicity: larger eps keeps a subset
    import random

    rng = random.Random(3)
    xs = [float(i) for i in range(40)]
    ys = [rng.uniform(-3, 3) for _ in range(40)]
    k1 = set(simplify_indices(xs, ys, 0.5))
    k2 = set(simplify_indices(xs, ys, 2.0))
    assert k2 <= k1
    # closed loop: endpoints coincide (den == 0 branch)
    xs = [0.0, 3.0, 3.0, 0.0, 0.0]
    ys = [0.0, 0.0, 3.0, 3.0, 0.0]
    assert simplify_indices(xs, ys, 0.5) == [0, 1, 2, 3, 4]


def test_simplify_trajectories_query(spark):
    from changegen_spark.queries.geo import q_simplify_trajectories

    rows = q_simplify_trajectories(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 2 <= r["n_kept"] <= r["n_points"] or r["n_points"] < 2


def test_point_in_polygon_reference(spark):
    """Crossing-number vs a plain-Python even-odd reference on a grid of
    probe points over the non-convex test pentagon (notch region
    exercises parity)."""
    from changegen_spark.queries.geo import PIP_POLY, _pip_spark

    def ref_inside(px, py):
        inside = False
        n = len(PIP_POLY)
        for i in range(n):
            x1, y1 = PIP_POLY[i]
            x2, y2 = PIP_POLY[(i + 1) % n]
            if (y1 > py) != (y2 > py):
                if y2 - y1 > 0:
                    if (px - x1) * (y2 - y1) < (py - y1) * (x2 - x1):
                        inside = not inside
                else:
                    if (px - x1) * (y2 - y1) > (py - y1) * (x2 - x1):
                        inside = not inside
        return inside

    probes = [(x, y) for x in range(0, 1000, 37) for y in range(0, 1000, 41)]
    df = spark.createDataFrame(probes, "px long, py long")
    got = {
        (r["px"], r["py"]): r["inside"]
        for r in df.select(
            "px", "py", _pip_spark(F.col("px"), F.col("py")).alias("inside")
        ).collect()
    }
    expected = {(x, y): ref_inside(x, y) for x, y in probes}
    assert got == expected
    assert sum(expected.values()) > 20  # the pentagon is actually probed


def test_convex_hull_invariants_and_goldens():
    """Monotone chain: known hulls (square with interior points, collinear
    degenerate) plus random sets checked by independent invariants —
    every input point passes the even-odd interior test against the hull
    ring, hull vertices are input points, and all hull turns are strict."""
    from changegen_spark.geo.hull import convex_hull_indices, hull_area2

    # square + interior noise -> the 4 corners, area 2*100
    xs = [0, 10, 10, 0, 5, 3, 7]
    ys = [0, 0, 10, 10, 5, 4, 2]
    h = convex_hull_indices(xs, ys)
    assert sorted(h) == [0, 1, 2, 3]
    assert hull_area2(xs, ys) == 200
    # collinear -> two endpoints, zero area
    xs, ys = [0, 1, 2, 3], [0, 1, 2, 3]
    assert len(convex_hull_indices(xs, ys)) == 2
    assert hull_area2(xs, ys) == 0

    import random

    rng = random.Random(11)
    for _ in range(5):
        xs = [rng.randint(0, 100) for _ in range(40)]
        ys = [rng.randint(0, 100) for _ in range(40)]
        h = convex_hull_indices(xs, ys)

        def cross(o, a, b):
            return (xs[a] - xs[o]) * (ys[b] - ys[o]) - (ys[a] - ys[o]) * (xs[b] - xs[o])

        # strict convexity at every hull corner
        for i in range(len(h)):
            assert cross(h[i], h[(i + 1) % len(h)], h[(i + 2) % len(h)]) > 0
        # every point inside-or-on: cross products vs each hull edge >= 0
        for p in range(len(xs)):
            assert all(
                cross(h[i], h[(i + 1) % len(h)], p) >= 0
                or (xs[p], ys[p]) in [(xs[v], ys[v]) for v in h]
                for i in range(len(h))
            )


def test_convex_hulls_query(spark):
    from changegen_spark.queries.geo import q_convex_hulls

    rows = q_convex_hulls(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["n_hull"] <= min(r["n_points"], 999)
        assert 0 <= r["hull_area2_e2"] <= 2 * 1000 * 1000


def test_capped_running_sum_vs_reference(spark):
    """The clamped scan equals a straight-line reference, and DIFFERS from
    the naive running-sum-then-clamp whenever a bound was hit mid-stream
    (the reason this is applyInPandas, not a window)."""
    from changegen_spark.operators.stateful import capped_running_sum

    deltas = [50, 80, -200, 30, 100, 100, -50]  # hits floor then ceiling
    rows = [(1, i, d) for i, d in enumerate(deltas)]
    df = spark.createDataFrame(rows, "k long, seq long, d long")
    got = capped_running_sum(df, ["k"], ["seq"], "d", 100, 0, 250).collect()[0]

    bal, caps, floors = 100, 0, 0
    for d in deltas:
        bal += d
        if bal > 250:
            bal, caps = 250, caps + 1
        elif bal < 0:
            bal, floors = 0, floors + 1
    assert (got["final_balance"], got["n_cap_hits"], got["n_floor_hits"]) == (
        bal, caps, floors,
    )
    # the naive formulation (clamp the plain running sum at the end) is a
    # DIFFERENT number — proves the operator isn't window-expressible
    naive = min(250, max(0, 100 + sum(deltas)))
    assert got["final_balance"] != naive


def test_gini_partitioning_invariant_and_known_values(spark):
    """Gini on hand-computable distributions: perfectly equal -> 0,
    maximally concentrated -> (n-1)/n; exact global rank is
    partitioning-invariant (the two-phase pattern)."""
    import changegen_spark.queries.misc as mi
    from pyspark.sql import functions as F

    def run(rows, parts):
        df = spark.createDataFrame(
            [(i, c, r / 100.0) for i, (c, r) in enumerate(rows)],
            "o_orderkey long, o_custkey long, o_totalprice double",
        ).withColumn("o_orderstatus", F.lit("O")).withColumn(
            "o_orderdate", F.current_timestamp()
        ).withColumn("o_orderpriority", F.lit("1-X")).repartition(parts)
        orig = mi.load_table
        mi.load_table = lambda _s, _d, _n: df
        try:
            return mi.q_gini(spark, "u").collect()[0]
        finally:
            mi.load_table = orig

    equal = [(c, 500) for c in range(1, 11)]
    r = run(equal, 3)
    assert r["gini"] == 0.0 and r["n_customers"] == 10
    # all revenue on one customer: Gini = (n-1)/n = 0.9
    conc = [(1, 5000)] + [(c, 0) for c in range(2, 11)]
    r1, r7 = run(conc, 1), run(conc, 7)
    assert r1["gini"] == r7["gini"] == 0.9


def test_hll_and_kmv_registers_vs_python_reference(spark):
    """Sketch registers recomputed by a straight-line Python implementation
    of the same 60-bit md5 hash / bin-length rho / k-min rules must match
    the distributed build exactly, on random multisets."""
    import hashlib

    from changegen_spark.queries.sketches import (
        HLL_M,
        KMV_K,
        hll_registers,
        kmv_sketch,
    )

    def h60(x):
        return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)

    rng = random.Random(7)
    for case in range(3):
        rows = [
            (rng.choice("ABC"), rng.randint(0, 500))
            for _ in range(rng.choice([50, 400, 1500]))
        ]
        df = spark.createDataFrame(rows, "grp string, v long")

        # pure-python HLL registers
        exp_regs = {}
        for g, v in rows:
            h = h60(v)
            bucket, w = h % HLL_M, h >> 10
            rho = 51 if w == 0 else 51 - w.bit_length()
            k = (g, bucket)
            exp_regs[k] = max(exp_regs.get(k, 0), rho)
        got_regs = {
            (r.grp, r.bucket): r.r
            for r in hll_registers(df, "grp", "v").collect()
        }
        assert got_regs == exp_regs, f"case {case}"

        # pure-python KMV sketches
        exp_kmv = {}
        for g in set(r[0] for r in rows):
            hs = sorted({h60(v) for gg, v in rows if gg == g})[:KMV_K]
            exp_kmv[g] = hs
        got_kmv = {}
        for r in kmv_sketch(df, "grp", "v").collect():
            got_kmv.setdefault(r.grp, []).append(r.h)
        assert {g: sorted(v) for g, v in got_kmv.items()} == exp_kmv, f"case {case}"


def test_phrase_search_random_texts_vs_python(spark):
    """Map-only phrase matching vs a straight-line Python scan on random
    word-soup docs with planted phrase occurrences (including overlapping
    and back-to-back plants)."""
    from changegen_spark.queries import search as S

    rng = random.Random(99)
    vocab = ["slow", "hash", "batch", "row", "scan", "join", "key"]
    docs = []
    for i in range(120):
        words = [rng.choice(vocab) for _ in range(rng.randint(0, 30))]
        if i % 3 == 0:  # plant 1-2 occurrences at random positions
            for _ in range(rng.randint(1, 2)):
                p = rng.randint(0, len(words))
                words[p:p] = list(S.PHRASE)
        docs.append((i, " ".join(words)))

    def py_matches(text):
        toks = text.split()
        hits = [
            p + 1
            for p in range(len(toks) - len(S.PHRASE) + 1)
            if tuple(toks[p : p + len(S.PHRASE)]) == S.PHRASE
        ]
        return hits

    expected = {
        i: (len(h), h[0]) for i, t in docs if (h := py_matches(t))
    }
    df = spark.createDataFrame(docs, "doc_id long, text string")
    orig = S.load_table
    S.load_table = lambda _s, _d, _n: df
    try:
        got = {
            r.doc_id: (r.n_matches, r.first_pos)
            for r in S.q_phrase_search(spark, "unused").collect()
        }
    finally:
        S.load_table = orig
    assert got == expected


def test_bbox_overlap_grid_matches_bruteforce(spark):
    """Grid filter-and-refine bbox pairing vs brute force on random
    rectangle sets at several densities (the fixture exercises one)."""
    from pyspark.sql import functions as F2

    from changegen_spark.queries.geo import BBOX_CELL

    rng = random.Random(17)
    for case, (n, max_ext) in enumerate([(40, 300), (80, 4000), (120, 9000)]):
        boxes = []
        for i in range(n):
            cx, cy = rng.randint(0, 50_000), rng.randint(0, 50_000)
            hw, hh = rng.randint(1, max_ext), rng.randint(1, max_ext)
            boxes.append((i, cx - hw, cx + hw, cy - hh, cy + hh))
        expected = {
            (a[0], b[0], (min(a[2], b[2]) - max(a[1], b[1])) * (min(a[4], b[4]) - max(a[3], b[3])))
            for a in boxes
            for b in boxes
            if a[0] < b[0]
            and a[1] <= b[2] and b[1] <= a[2]
            and a[3] <= b[4] and b[3] <= a[4]
        }
        df = spark.createDataFrame(
            boxes, "box_id long, xmin long, xmax long, ymin long, ymax long"
        )

        def cells(d, p):
            out = d.select(*[F2.col(c).alias(f"{p}{c}") for c in d.columns])
            return out.withColumn(
                "__cx",
                F2.explode(F2.sequence(F2.floor(F2.col(f"{p}xmin") / BBOX_CELL), F2.floor(F2.col(f"{p}xmax") / BBOX_CELL))),
            ).withColumn(
                "__cy",
                F2.explode(F2.sequence(F2.floor(F2.col(f"{p}ymin") / BBOX_CELL), F2.floor(F2.col(f"{p}ymax") / BBOX_CELL))),
            )

        pairs = (
            cells(df, "a_")
            .join(cells(df, "b_"), ["__cx", "__cy"])
            .filter(F2.col("a_box_id") < F2.col("b_box_id"))
            .dropDuplicates(["a_box_id", "b_box_id"])
            .filter(
                (F2.col("a_xmin") <= F2.col("b_xmax"))
                & (F2.col("b_xmin") <= F2.col("a_xmax"))
                & (F2.col("a_ymin") <= F2.col("b_ymax"))
                & (F2.col("b_ymin") <= F2.col("a_ymax"))
            )
        )
        iw = F2.least("a_xmax", "b_xmax") - F2.greatest("a_xmin", "b_xmin")
        ih = F2.least("a_ymax", "b_ymax") - F2.greatest("a_ymin", "b_ymin")
        got = {
            (r.a, r.b, r.area)
            for r in pairs.select(
                F2.col("a_box_id").alias("a"),
                F2.col("b_box_id").alias("b"),
                (iw * ih).alias("area"),
            ).collect()
        }
        assert got == expected, f"case {case}"
