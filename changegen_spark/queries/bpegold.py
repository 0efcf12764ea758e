"""Independent Python goldens → inline VALUES oracles for the BPE
tokenizer queries (iterative merge learning is not single-statement SQL).

Same pattern as queries/geogold.py (and the media family): a separately
written implementation — Counter-based pair counting and a rank-table
encoder, structured differently from ``functions/bpe.py`` — computes the
expected merge table and per-document encoding stats over the
correctness-scale snapshot, emitted as literal VALUES so the driver's
hash gate checks the Spark plan end-to-end instead of a rows-only count.

Shared contract (documented in functions/bpe.py): whitespace words of
the trimmed text, per-word symbols = characters + ``</w>``, merge =
highest pair count with ties to the lexicographically smallest
(left, right), stop below pair count 2; encoding applies merges lowest
rank first, leftmost non-overlapping.
"""

from __future__ import annotations

import functools
import os
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

GOLD_SF_DIR = "/root/testdata/sf0.01"
EOW = "</w>"
NUM_MERGES = 40  # keep in sync with queries/lm.py BPE_MERGES


def _doc_texts(sf_dir: str) -> list[tuple[int, str]]:
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, text FROM read_parquet(?) ORDER BY doc_id",
        [os.path.join(sf_dir, "documents.parquet")],
    ).fetchall()
    con.close()
    return rows


def _train(word_freq: Counter, num_merges: int) -> list[tuple[str, str, str, int]]:
    vocab: Counter = Counter()
    for w, c in word_freq.items():
        vocab[tuple(w) + (EOW,)] += c
    merges = []
    for _ in range(num_merges):
        pc: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += c
        if not pc:
            break
        best_pair, best_cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best_cnt < 2:
            break
        a, b = best_pair
        ab = a + b
        nv: Counter = Counter()
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == (a, b):
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nv[tuple(out)] += c
        vocab = nv
        merges.append((a, b, ab, best_cnt))
    return merges


def _encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [EOW]
    while True:
        cands = [
            (ranks[p], p)
            for p in zip(sym, sym[1:])
            if p in ranks
        ]
        if not cands:
            return sym
        _, (a, b) = min(cands)
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and (sym[i], sym[i + 1]) == (a, b):
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _round6_half_up(x: float) -> str:
    """Spark round(double, 6): HALF_UP over the shortest decimal repr."""
    return str(
        Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


def merges_values_sql(sf_dir: str = GOLD_SF_DIR) -> str:
    wf: Counter = Counter()
    for _, text in _doc_texts(sf_dir):
        wf.update((text or "").strip().split())
    merges = _train(wf, NUM_MERGES)
    vals = ",\n       ".join(
        f"({i}, {_sq(l)}, {_sq(r)}, {_sq(m)}, {c})"
        for i, (l, r, m, c) in enumerate(merges)
    )
    return (
        'SELECT CAST(rank AS INT) AS rank, "left", "right", merged,'
        " CAST(pair_count AS BIGINT) AS pair_count\n"
        f'FROM (VALUES {vals}) AS t(rank, "left", "right", merged, pair_count)\n'
        "ORDER BY rank"
    )


def encode_stats_values_sql(sf_dir: str = GOLD_SF_DIR) -> str:
    docs = _doc_texts(sf_dir)
    wf: Counter = Counter()
    for _, text in docs:
        wf.update((text or "").strip().split())
    merges = _train(wf, NUM_MERGES)
    ranks = {(l, r): i for i, (l, r, _, _) in enumerate(merges)}
    memo: dict[str, int] = {}
    vals = []
    for doc_id, text in docs:
        words = (text or "").strip().split()
        n_tok = 0
        for w in words:
            if w not in memo:
                memo[w] = len(_encode(w, ranks))
            n_tok += memo[w]
        n_chars = len((text or "").strip())
        if n_tok:
            cpt = _round6_half_up(n_chars / n_tok)
        else:
            cpt = "CAST(NULL AS DOUBLE)"
        vals.append(f"({doc_id}, {len(words)}, {n_tok}, {cpt})")
    body = ",\n       ".join(vals)
    return (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id,"
        " CAST(n_words AS INT) AS n_words,"
        " CAST(n_bpe_tokens AS INT) AS n_bpe_tokens,"
        " CAST(chars_per_token AS DOUBLE) AS chars_per_token\n"
        f"FROM (VALUES {body}) AS t(doc_id, n_words, n_bpe_tokens, chars_per_token)\n"
        "ORDER BY doc_id"
    )


@functools.lru_cache(maxsize=1)
def build_oracles() -> dict[str, str]:
    """Golden oracles, or {} when the testdata snapshot is absent.
    Memoized: all_oracles() is called repeatedly (driver, tests, digest
    construction) and the goldens are deterministic per process."""
    if not os.path.exists(os.path.join(GOLD_SF_DIR, "documents.parquet")):
        return {}
    return {
        "q_bpe_merges": merges_values_sql(),
        "q_bpe_encode_stats": encode_stats_values_sql(),
    }
