"""Property-based tests (hypothesis) for the core algorithmic operators —
the reference has none (SURVEY §5); randomized invariants catch the
edge-window bugs golden counts can't."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@SET
@given(
    n=st.integers(min_value=1, max_value=3000),
    chunk=st.integers(min_value=2, max_value=400),
)
def test_split_ways_properties(sp, n, chunk):
    from changegen_spark.operators.ways import split_ways

    node_limit = chunk * 2  # force splitting whenever n > 2 chunks
    nds = list(range(n))
    df = sp.createDataFrame([("w", nds)], "k string, nds array<long>")
    chunks = {
        r["chunk"]: r["nds"]
        for r in split_ways(df, node_limit=node_limit, chunk_size=chunk).collect()
    }
    ordered = [chunks[i] for i in sorted(chunks)]
    # every node covered, order preserved
    flat = [x for i, c in enumerate(ordered) for x in (c if i == 0 else c[1:])]
    assert flat == nds
    if n <= node_limit:
        assert len(ordered) == 1
    else:
        # boundary sharing between consecutive chunks
        for a, b in zip(ordered, ordered[1:]):
            assert b[0] == a[-1]
        # chunk size bound: ≤ chunk (+1 for the prepended joiner)
        assert all(len(c) <= chunk + 1 for c in ordered)


@SET
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    radius=st.floats(min_value=0.1, max_value=3.0),
)
def test_grid_join_matches_bruteforce(sp, seed, radius):
    from changegen_spark.geo.join import grid_distance_join

    rng = np.random.default_rng(seed)
    pts = rng.uniform(-10, 10, size=(60, 2))
    df = sp.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "pid long, x double, y double",
    )
    got = {
        (r["l_pid"], r["r_pid"])
        for r in grid_distance_join(df, df, radius, exclude_equal=True).collect()
    }
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=2)
    want = {
        (i, j) for i in range(60) for j in range(60) if i != j and d[i, j] <= radius
    }
    assert got == want


@pytest.mark.slow
@SET
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_insertion_index_property(sp, seed):
    """Random polyline + probe point: Spark insertion index equals the
    numpy transcription of the reference algorithm
    (changegen/generator.py:208-255)."""
    from changegen_spark.operators.ways import insertion_index

    rng = np.random.default_rng(seed)
    k = int(rng.integers(3, 15))
    coords = np.cumsum(rng.uniform(0.2, 2.0, size=(k, 2)), axis=0)
    point = coords[int(rng.integers(0, k - 1))] + rng.uniform(-0.4, 0.4, 2)

    seg = np.diff(coords, axis=0)
    slen = np.linalg.norm(seg, axis=1)
    cum = np.concatenate([[0], np.cumsum(slen)])
    t = np.clip(np.einsum("ij,ij->i", point - coords[:-1], seg) / (slen**2), 0, 1)
    proj = coords[:-1] + t[:, None] * seg
    best = int(np.argmin(np.linalg.norm(point - proj, axis=1)))
    pf = (cum[best] + t[best] * slen[best]) / cum[-1]
    vf = cum / cum[-1]
    idx = np.nonzero(vf > pf)[0]
    expected = int(idx[0]) if len(idx) else None

    rows = [
        ("w", i, float(x), float(y), float(point[0]), float(point[1]))
        for i, (x, y) in enumerate(coords)
    ]
    df = sp.createDataFrame(
        rows, "k string, pos int, x double, y double, px double, py double"
    )
    out = insertion_index(df, ["k"], "px", "py").collect()
    got = out[0]["insert_idx"] if out else None
    assert got == expected


@SET
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab "),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=6,
    )
)
@pytest.mark.slow
def test_minhash_identical_docs_always_pair(sp, texts):
    """Identical texts must always share every band; distinct-signature
    pairs must be symmetric and id-ordered."""
    from changegen_spark.functions.hashing import minhash_candidates

    rows = [(i, t) for i, t in enumerate(texts + texts)]  # duplicate corpus
    df = sp.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"]) for r in minhash_candidates(df).collect()
    }
    n = len(texts)
    for i in range(n):
        assert (i, i + n) in pairs  # each doc pairs with its duplicate
    assert all(a < b for a, b in pairs)


@SET
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=8)
)
@pytest.mark.slow
def test_pack_sequences_properties(sp, sizes):
    """Packing invariants for any doc-size sequence: offsets stay inside the
    budget, starts are the running sum, spans cover exactly the token range."""
    from changegen_spark.queries import mlprep

    rows = [
        (i, " ".join(["w"] * n) if n else "", "en", "s", n)
        for i, n in enumerate(sizes)
    ]
    df = sp.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = mlprep._docs
    mlprep._docs = lambda s, d: df
    try:
        out = {r.doc_id: r for r in mlprep.q_pack_sequences(sp, "x").collect()}
    finally:
        mlprep._docs = orig
    B = mlprep.PACK_BUDGET
    start = 0
    for i, n in enumerate(sizes):
        r = out[i]
        assert r.n_tokens == n
        assert 0 <= r.offset_in_seq < B
        assert r.seq_id == start // B
        assert r.offset_in_seq == start % B
        if n == 0:
            assert r.n_seqs_spanned == 0
        else:
            assert r.n_seqs_spanned == (start + n - 1) // B - start // B + 1
        start += n


@pytest.mark.slow
@SET
@given(n=st.integers(min_value=1, max_value=300))
def test_token_chunks_cover_all_tokens(sp, n):
    """Chunk windows tile the token sequence: starts every STRIDE, last
    window reaches the final token, sizes bounded by CHUNK."""
    from changegen_spark.queries import mlprep

    df = sp.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(n)), "en", "s", n)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = mlprep._docs
    mlprep._docs = lambda s, d: df
    try:
        out = sorted(
            mlprep.q_token_chunks(sp, "x").collect(), key=lambda r: r.chunk_idx
        )
    finally:
        mlprep._docs = orig
    S, C = mlprep.STRIDE, mlprep.CHUNK
    assert [r.chunk_idx for r in out] == list(range(len(out)))
    # starts: 1, 1+S, ... <= n; sizes min(C, n-start+1)
    assert len(out) == (n - 1) // S + 1
    for r in out:
        s = r.chunk_idx * S + 1
        assert r.n_in_chunk == min(C, n - s + 1)
    # the last chunk ends exactly at token n
    last = out[-1]
    assert last.chunk_idx * S + last.n_in_chunk == n
