"""Build the shipped diverse-vocabulary fixture for the set-similarity join.

The synthetic ``documents`` table draws from a ~30-word vocabulary, which is
ADVERSARIAL for prefix filtering: nearly every pair shares most shingles, so
the candidate set cannot collapse (documented in queries/setsim.py).  That
made the prefix filter's headline property — candidates ≪ all-pairs on
realistic text — an argued claim rather than a demonstrated one (r2-verdict
housekeeping note).  This fixture closes that: a deterministic corpus with a
4,000-word Zipf-sampled vocabulary plus PLANTED near-duplicate pairs, so

* the candidate set measurably collapses (pinned in tests/test_setsim.py),
* recall is exactly verifiable (the DuckDB oracle runs the unpruned
  shared-shingle join over the same fixture — zero false negatives), and
* the planted pairs give a human-auditable expectation.

Output (committed):  fixtures/setsim_docs.parquet — (doc_id, text).
Rerun only if the corpus shape changes:  python tools/make_setsim.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXDIR = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "fixtures"))
OUT = os.path.join(FIXDIR, "setsim_docs.parquet")

VOCAB_SIZE = 12000
N_BASE = 600
N_NEAR_DUP = 15  # planted high-similarity copies (~3% words replaced)
N_BORDER = 8  # planted borderline copies (~15% words replaced)
NEAR_DUP_ID0 = 10_001
BORDER_ID0 = 20_001
SEED = 20260814


def _vocab(rng: np.random.RandomState) -> list[str]:
    """Deterministic pseudo-words, 4-9 letters, all distinct."""
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    out: list[str] = []
    seen = set()
    while len(out) < VOCAB_SIZE:
        n = int(rng.randint(4, 10))
        w = "".join(letters[rng.randint(0, 26, size=n)])
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


def _zipf_probs(n: int) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, n + 1) + 10.0, 0.7)
    return p / p.sum()


def build() -> list[tuple[int, str]]:
    rng = np.random.RandomState(SEED)
    vocab = np.array(_vocab(rng))
    probs = _zipf_probs(VOCAB_SIZE)

    rows: list[tuple[int, str]] = []
    base_words: dict[int, np.ndarray] = {}
    for i in range(1, N_BASE + 1):
        n_words = int(rng.randint(40, 71))
        words = vocab[rng.choice(VOCAB_SIZE, size=n_words, p=probs)]
        base_words[i] = words
        rows.append((i, " ".join(words)))

    def mutate(words: np.ndarray, frac: float) -> np.ndarray:
        out = words.copy()
        n_mut = max(1, int(round(frac * len(out))))
        pos = rng.choice(len(out), size=n_mut, replace=False)
        out[pos] = vocab[rng.choice(VOCAB_SIZE, size=n_mut, p=probs)]
        return out

    for k in range(N_NEAR_DUP):
        src = k + 1
        rows.append((NEAR_DUP_ID0 + k, " ".join(mutate(base_words[src], 0.03))))
    for k in range(N_BORDER):
        src = N_NEAR_DUP + k + 1
        rows.append((BORDER_ID0 + k, " ".join(mutate(base_words[src], 0.15))))
    return rows


def main() -> None:
    rows = build()
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, OUT)
    print(f"wrote {OUT}: {tbl.num_rows} docs")


if __name__ == "__main__":
    main()
