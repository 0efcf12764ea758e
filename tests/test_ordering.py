"""Deterministic epoch shuffling (queries/ordering.py): bijectivity,
cross-epoch decorrelation, and parity with an INDEPENDENT loop-based
Python Feistel (no shared expression builder)."""

from changegen_spark.queries.ordering import (
    EPOCHS,
    FEISTEL_ROUNDS,
    FEISTEL_W,
    SHARDS,
    _MASK,
    _MULT,
    q_feistel_shuffle,
    q_shuffle_shards,
    round_keys,
)


def _py_feistel(n: int, epoch: int) -> int:
    """From-scratch reimplementation: explicit L/R loop."""
    left = (n >> FEISTEL_W) & _MASK
    right = n & _MASK
    for k in round_keys(epoch):
        f = ((right * _MULT + k) & _MASK) ^ (right >> 7)
        left, right = right, (left ^ f) & _MASK
    return (left << FEISTEL_W) + right


def test_feistel_matches_independent_python_and_is_bijective(spark, sf_dir):
    rows = q_feistel_shuffle(spark, sf_dir).collect()
    assert rows
    by_epoch = {}
    for r in rows:
        assert r.pos == _py_feistel(r.doc_id, r.epoch), (r.doc_id, r.epoch)
        by_epoch.setdefault(r.epoch, []).append((r.doc_id, r.pos))
    assert set(by_epoch) == set(range(EPOCHS))
    for e, pairs in by_epoch.items():
        positions = [p for _, p in pairs]
        # bijection: no collisions, all within the 2^(2W) domain
        assert len(set(positions)) == len(positions)
        assert all(0 <= p < 1 << (2 * FEISTEL_W) for p in positions)
    # epochs genuinely reorder: the induced permutations differ pairwise
    orders = {
        e: [d for d, _ in sorted(pairs, key=lambda t: t[1])]
        for e, pairs in by_epoch.items()
    }
    for e1 in range(EPOCHS):
        for e2 in range(e1 + 1, EPOCHS):
            assert orders[e1] != orders[e2], (e1, e2)


def test_feistel_is_invertible_by_construction():
    """Decryption (rounds in reverse) recovers the id — the property that
    makes the permutation a bijection for ANY round function."""
    for epoch in range(EPOCHS):
        for n in [0, 1, 12345, 0xFFFF, 0x10000, 0xFFFFFFFF, 987654321]:
            pos = _py_feistel(n, epoch)
            left = (pos >> FEISTEL_W) & _MASK
            right = pos & _MASK
            for k in reversed(round_keys(epoch)):
                f = ((left * _MULT + k) & _MASK) ^ (left >> 7)
                left, right = (right ^ f) & _MASK, left
            assert (left << FEISTEL_W) + right == n, (epoch, n)


def test_shuffle_shards_balance_and_totals(spark, sf_dir):
    rows = q_shuffle_shards(spark, sf_dir).collect()
    n_docs = q_feistel_shuffle(spark, sf_dir).count() // EPOCHS
    for e in range(EPOCHS):
        counts = [r.n_docs for r in rows if r.epoch == e]
        assert sum(counts) == n_docs
        # uniform-in-expectation: no shard holds more than 2.5x its share
        assert max(counts) <= 2.5 * n_docs / SHARDS
