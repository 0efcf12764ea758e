"""k-means: full independent numpy Lloyd's implementation as the
expectation (same integer contract, different code shape), partitioning
invariance of the integer determinism claim, and k-anonymity decision
semantics on a planted customer table."""

import hashlib

import duckdb
import numpy as np
import pytest

from changegen_spark.queries.cluster import (
    K_CLUSTERS,
    KM_ITERS,
    q_kmeans,
)

SF = "/root/testdata/sf0.001"


def _h60(x) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)


def _reference_kmeans(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
        " ORDER BY vec_id"
    ).fetchall()
    con.close()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    # quantize exactly like both engines: round-half-away-from-zero on
    # the double value (numpy rounds half-to-even, so go via Decimal-free
    # sign trick)
    emb = np.array([r[1] for r in rows], dtype=np.float64) * 1e6
    v = np.sign(emb) * np.floor(np.abs(emb) + 0.5)
    v = v.astype(np.int64)
    order = np.lexsort((ids, np.array([_h60(i) for i in ids])))
    cents = v[order[:K_CLUSTERS]].copy()
    for _ in range(KM_ITERS):
        d2 = ((v[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # argmin takes first (smallest id) on ties
        for c in range(K_CLUSTERS):
            members = v[assign == c]
            if len(members):
                s = members.sum(axis=0, dtype=np.int64)
                n = len(members)
                # truncate toward zero like Spark div / DuckDB //
                cents[c] = np.sign(s) * (np.abs(s) // n)
    d2 = ((v[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)
    return {
        int(i): (int(a), int(d))
        for i, a, d in zip(ids, assign, d2[np.arange(len(ids)), assign])
    }


def test_kmeans_matches_independent_numpy_impl(spark):
    expected = _reference_kmeans(SF)
    got = {r.vec_id: (r.cluster, r.dist2_e12) for r in q_kmeans(spark, SF).collect()}
    assert got == expected


def test_kmeans_partitioning_invariant(spark):
    """The integer contract means the result is identical under any
    input partitioning — rerun with the vector frame shuffled into 13
    partitions."""
    from changegen_spark.queries.cluster import _vecs_e6, kmeans_fit

    base, cents_a = kmeans_fit(_vecs_e6(spark, SF))
    rep, cents_b = kmeans_fit(_vecs_e6(spark, SF).repartition(13))
    assert cents_a == cents_b
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, rep.collect()))


def test_kmeans_centroid_side_is_broadcast(spark):
    plan = q_kmeans(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the k x dim centroid table must ride a broadcast, never a shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_k_anonymity_decisions(spark, tmp_path):
    from changegen_spark.queries.quality import K_ANON, q_k_anonymity

    rows = []
    # group A: 6 members in band 1 -> released, risk = 1000000 // 6
    rows += [(i, 1, "SEG_A", 1500.0) for i in range(6)]
    # group B: 2 members -> suppressed
    rows += [(10 + i, 2, "SEG_B", 2500.0) for i in range(2)]
    # group C: negative band edge, exactly K members -> released
    rows += [(20 + i, 3, "SEG_C", -500.0) for i in range(K_ANON)]
    d = spark.createDataFrame(
        rows, "c_custkey long, c_nationkey long, c_mktsegment string, c_acctbal double"
    )
    p = str(tmp_path / "ka")
    d.write.parquet(p + "/customer.parquet")
    got = {
        (r.c_nationkey, r.c_mktsegment): r
        for r in q_k_anonymity(spark, p).collect()
    }
    a = got[(1, "SEG_A")]
    assert (a.n, a.suppressed, a.risk_e6, a.n_released) == (6, 0, 166666, 6)
    b = got[(2, "SEG_B")]
    assert (b.n, b.suppressed, b.risk_e6, b.n_released) == (2, 1, 0, 0)
    c = got[(3, "SEG_C")]
    assert (c.n, c.suppressed, c.n_released) == (K_ANON, 0, K_ANON)
    assert c.bal_band == 0  # -50000 cents div 100000 truncates to 0


def test_kcenter_matches_independent_greedy(spark, sf_dir):
    """r7 coreset: a from-scratch O(n*k) Python Gonzalez greedy (list
    arithmetic, no shared helpers) reproduces picks AND radii exactly;
    the radius sequence is non-increasing by construction."""
    from changegen_spark.queries.cluster import KC_K, q_kcenter_coreset
    from changegen_spark.sources.tables import load_table

    vecs = {
        r.vec_id: [round(float(x) * 1e6) for x in r.embedding]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    seed = min(vecs)
    sel = [(1, seed, 0)]
    chosen = {seed}
    mind = {i: d2(v, vecs[seed]) for i, v in vecs.items()}
    for t in range(2, KC_K + 1):
        best = max(
            (m, -i) for i, m in mind.items() if i not in chosen
        )
        pick = -best[1]
        sel.append((t, pick, best[0]))
        chosen.add(pick)
        for i, v in vecs.items():
            m = d2(v, vecs[pick])
            if m < mind[i]:
                mind[i] = m

    got = [
        (r.rank, r.vec_id, r.radius_d2)
        for r in q_kcenter_coreset(spark, sf_dir).collect()
    ]
    assert got == sel
    radii = [r for _, _, r in got[1:]]
    assert radii == sorted(radii, reverse=True)
