"""Unigram-LM (SentencePiece-style) tokenizer: seed-substring vocabulary,
Viterbi-EM refinement, and a distributed encode stage.

The BPE complement (functions/bpe.py): where BPE grows a vocabulary by
greedy pair merging, the unigram LM starts from a LARGE candidate set and
lets EM concentrate probability on useful pieces (Kudo 2018).  The shared
corpus pass — a (word, cnt) frequency table — is distributed; the EM loop
runs on the driver over a deterministically capped word table (the same
bounded-vocab argument as ``bpe_train``: the collect is top-``max_words``
by (cnt desc, word asc), KB..MB at any corpus size); the learned
(piece → score) table is broadcast back into an Arrow-batched encode UDF.

DETERMINISM CONTRACT (the independent golden in queries/unigram.py must
reproduce it exactly):

* corpus words: whitespace tokens of trimmed text;
* seed vocabulary: every substring of length 1..SUB_MAX of every word,
  weighted by word count, one count per occurrence position; keep ALL
  single characters plus the top (vocab_size - n_chars) multi-character
  substrings by (count desc, substring asc);
* piece scores are INTEGERS: cost_e9(s) = -round(1e9 * ln((c_s + 1) /
  (total + |V|))) — add-1 smoothing, 1e9-scaled; Viterbi runs entirely
  on these ints so no float comparison can tie-break differently;
* Viterbi best segmentation of a word minimizes (total cost, n_tokens,
  token tuple) — the lexicographic tuple makes equal-cost paths
  deterministic;
* one EM round = Viterbi-segment every (capped) word, recount piece
  usage weighted by word count, drop unused multi-char pieces, recompute
  costs over the survivors.  UNI_EM rounds, no early stop.
"""

from __future__ import annotations

# module-level so the iterator-form pandas_udf type hints (stringified
# by `from __future__ import annotations`) resolve at registration time
import pandas as pd  # noqa: F401
from typing import Iterator  # noqa: F401

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUB_MAX = 4  # max candidate piece length
UNI_VOCAB = 60  # seed vocabulary cap (chars always kept on top of this)
UNI_EM = 3  # EM rounds


def _cost_table(counts: dict[str, int]) -> dict[str, int]:
    total = sum(counts.values())
    v = len(counts)
    return {
        s: -round(1e9 * math.log((c + 1) / (total + v)))
        for s, c in counts.items()
    }


# Fallback cost for a single character absent from the cost table.  The
# vocab is seeded from a max_words-capped word table, so at corpus scale a
# document word can contain a character that appears only in excluded
# words; without a fallback dp[n] is None and encode crashes.  The value is
# far above any real piece cost (-1e9*ln(p) tops out ~3e10 even at
# p≈1e-13), so known pieces always win and encode merely degrades to
# char-at-a-time over the unknown span — deterministically, in both the
# engine DP and the golden recursion.
UNK_CHAR_COST = 10**12


def _viterbi(word: str, costs: dict[str, int]) -> list[str]:
    """Min-cost segmentation; ties → fewer tokens, then lexicographically
    smaller token tuple.  Unknown single chars take ``UNK_CHAR_COST`` so a
    segmentation always exists even for out-of-seed characters."""
    n = len(word)
    # dp[i] = (cost, ntok, tokens tuple) for word[:i]
    dp: list[tuple[int, int, tuple[str, ...]]] = [(0, 0, ())] + [None] * n  # type: ignore[list-item]
    for j in range(1, n + 1):
        best = None
        for i in range(max(0, j - SUB_MAX), j):
            piece = word[i:j]
            c = costs.get(piece)
            if c is None and j - i == 1:
                c = UNK_CHAR_COST
            if c is None or dp[i] is None:
                continue
            cand = (dp[i][0] + c, dp[i][1] + 1, dp[i][2] + (piece,))
            if best is None or cand < best:
                best = cand
        dp[j] = best
    return list(dp[n][2])


def seed_counts(wc_rows: list[tuple[str, int]]) -> dict[str, int]:
    """Positional substring counts over the capped word table."""
    counts: dict[str, int] = {}
    for word, cnt in wc_rows:
        for i in range(len(word)):
            for ln in range(1, min(SUB_MAX, len(word) - i) + 1):
                s = word[i : i + ln]
                counts[s] = counts.get(s, 0) + cnt
    return counts


def seed_vocab(counts: dict[str, int], vocab_size: int = UNI_VOCAB) -> dict[str, int]:
    chars = {s: c for s, c in counts.items() if len(s) == 1}
    multi = sorted(
        ((s, c) for s, c in counts.items() if len(s) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(0, vocab_size - len(chars))]
    out = dict(chars)
    out.update(multi)
    return out


def unigram_train(
    wc: DataFrame,
    vocab_size: int = UNI_VOCAB,
    em_rounds: int = UNI_EM,
    max_words: int = 1_000_000,
) -> dict[str, int]:
    """Learn the (piece → cost_e9) table from a distributed (word, cnt)
    frequency table.  Returns the final cost table after ``em_rounds``
    Viterbi-EM rounds (lower cost = more probable piece)."""
    rows = [
        (r["word"], int(r["cnt"]))
        for r in wc.orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    ]
    vocab = seed_vocab(seed_counts(rows), vocab_size)
    costs = _cost_table(vocab)
    for _ in range(em_rounds):
        usage: dict[str, int] = {}
        for word, cnt in rows:
            for piece in _viterbi(word, costs):
                usage[piece] = usage.get(piece, 0) + cnt
        kept = {
            s: usage.get(s, 0)
            for s in costs
            if len(s) == 1 or usage.get(s, 0) > 0
        }
        costs = _cost_table(kept)
    return costs


def unigram_encode_udf(costs: dict[str, int]):
    """Arrow-batched encoder: text → total piece count under the learned
    table (Viterbi per word) — the distributed inference stage; the
    cost table is a broadcast-sized Python closure.

    r13 optimization (guide §4.5): iterator form with a per-TASK
    word → piece-count memo.  Corpus text is Zipf-distributed, so the
    same words recur across every batch; without the memo the encode
    stage paid one full Python Viterbi DP per word OCCURRENCE (~270k at
    sf0.1), with it one per DISTINCT word per task.  ``_MEMO_MAX``
    bounds the dict so an adversarial all-unique-words corpus cannot
    grow task memory without limit (the hot head stays resident either
    way).  Values are unchanged — the memo caches the deterministic
    ``len(_viterbi(w))``."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def encode(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        memo: dict[str, int] = {}
        for texts in batches:
            out = []
            for t in texts:
                n = 0
                for w in (t or "").strip().split():
                    got = memo.get(w)
                    if got is None:
                        got = len(_viterbi(w, costs))
                        if len(memo) < _MEMO_MAX:
                            memo[w] = got
                    n += got
                out.append(n)
            yield pd.Series(out)

    return encode


# Per-task encode-memo entry cap: 1M distinct words ≈ tens of MB — large
# enough that real vocabularies (even 100 TB corpora are << 10M distinct
# words per task's batches) never evict, small enough to bound the worst
# case.  Shared by the unigram/BPE/WordPiece encode UDFs.
_MEMO_MAX = 1_000_000
