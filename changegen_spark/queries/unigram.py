"""Unigram-LM tokenizer queries + independent Python goldens.

``functions/unigram.py`` holds the engine implementation (distributed
word counts, bounded driver EM, Arrow encode stage); this module holds
the registry queries and a SEPARATELY WRITTEN golden implementation
(Counter-based seeding, memoized suffix recursion vs the engine's
iterative prefix DP) whose results are emitted as inline VALUES oracles
— the same two-implementation pattern as queries/bpegold.py, so the
driver's hash gate checks the full Spark path instead of rows-only.

The determinism contract both implementations follow is documented in
functions/unigram.py (integer 1e9-scaled costs, (cost, n_tokens, token
tuple) tie-break, add-1 smoothing, chars always kept).
"""

from __future__ import annotations

import functools
import math
import os
from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changegen_spark.sources.tables import load_table

GOLD_SF_DIR = "/root/testdata/sf0.01"
UNI_TOP = 40  # vocabulary rows emitted by q_unigram_vocab


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# --- registry queries (engine path) ------------------------------------------


def q_unigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned unigram-LM piece table: top UNI_TOP pieces by
    (cost asc = most probable first, piece asc), after UNI_EM Viterbi-EM
    rounds over the corpus word table.  Golden-oracle-backed (independent
    implementation below)."""
    from changegen_spark.functions.bpe import word_counts
    from changegen_spark.functions.unigram import unigram_train

    costs = unigram_train(word_counts(_docs(spark, sf_dir)))
    top = sorted(costs.items(), key=lambda kv: (kv[1], kv[0]))[:UNI_TOP]
    return spark.createDataFrame(
        [(i, s, c) for i, (s, c) in enumerate(top)],
        "rank INT, piece STRING, cost_e9 BIGINT",
    ).orderBy("rank")


def q_unigram_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document with the corpus-trained unigram LM; per-doc
    token accounting (words, unigram pieces, chars-per-piece) — the
    distributed inference stage with the cost table as a broadcast
    closure."""
    from changegen_spark.functions.bpe import word_counts
    from changegen_spark.functions.unigram import unigram_encode_udf, unigram_train

    docs = _docs(spark, sf_dir)
    costs = unigram_train(word_counts(docs))
    enc = unigram_encode_udf(costs)
    toks = F.split(F.trim("text"), r"\s+")
    return (
        docs.select(
            "doc_id",
            F.size(F.array_remove(toks, "")).alias("n_words"),
            enc(F.col("text")).alias("n_pieces"),
            F.length(F.regexp_replace(F.trim("text"), r"\s+", "")).alias("n_chars"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_pieces",
            F.round(F.col("n_chars") / F.col("n_pieces"), 6).alias(
                "chars_per_piece"
            ),
        )
        .orderBy("doc_id")
    )


# --- independent golden implementation ---------------------------------------


def _gold_words(sf_dir: str) -> list[tuple[str, int]]:
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT text FROM read_parquet(?)",
        [os.path.join(sf_dir, "documents.parquet")],
    ).fetchall()
    con.close()
    wf: Counter = Counter()
    for (text,) in rows:
        wf.update((text or "").strip().split())
    return sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:1_000_000]


def _gold_costs(counts: dict[str, int]) -> dict[str, int]:
    total, v = sum(counts.values()), len(counts)
    return {
        s: -round(1e9 * math.log((c + 1) / (total + v))) for s, c in counts.items()
    }


def _gold_train(sf_dir: str) -> dict[str, int]:
    from changegen_spark.functions.unigram import SUB_MAX, UNI_EM, UNI_VOCAB

    words = _gold_words(sf_dir)
    seed: Counter = Counter()
    for w, c in words:
        # reversed loop order vs the engine — same positional counts
        for ln in range(1, SUB_MAX + 1):
            for i in range(0, len(w) - ln + 1):
                seed[w[i : i + ln]] += c
    chars = {s: c for s, c in seed.items() if len(s) == 1}
    room = max(0, UNI_VOCAB - len(chars))
    vocab = dict(chars)
    vocab.update(
        dict(
            sorted(
                ((s, c) for s, c in seed.items() if len(s) > 1),
                key=lambda kv: (-kv[1], kv[0]),
            )[:room]
        )
    )
    costs = _gold_costs(vocab)
    for _ in range(UNI_EM):
        seg = _gold_segmenter(costs)
        usage: Counter = Counter()
        for w, c in words:
            for piece in seg(w):
                usage[piece] += c
        kept = {
            s: usage.get(s, 0) for s in costs if len(s) == 1 or usage.get(s, 0) > 0
        }
        costs = _gold_costs(kept)
    return costs


def _gold_segmenter(costs: dict[str, int]):
    """Memoized SUFFIX recursion (vs the engine's iterative prefix DP) —
    same (cost, n_tokens, token tuple) minimization, including the
    identical unknown-single-char fallback."""
    from changegen_spark.functions.unigram import SUB_MAX, UNK_CHAR_COST

    @functools.lru_cache(maxsize=None)
    def best(word: str, pos: int) -> tuple[int, int, tuple[str, ...]]:
        if pos == len(word):
            return (0, 0, ())
        cands = []
        for ln in range(1, min(SUB_MAX, len(word) - pos) + 1):
            piece = word[pos : pos + ln]
            c = costs.get(piece)
            if c is None and ln == 1:
                c = UNK_CHAR_COST
            if c is None:
                continue
            sc, sn, st = best(word, pos + ln)
            cands.append((c + sc, 1 + sn, (piece,) + st))
        return min(cands)

    return lambda w: list(best(w, 0)[2])


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def vocab_values_sql(sf_dir: str = GOLD_SF_DIR) -> str:
    costs = _gold_train(sf_dir)
    top = sorted(costs.items(), key=lambda kv: (kv[1], kv[0]))[:UNI_TOP]
    vals = ",\n       ".join(
        f"({i}, {_sq(s)}, {c})" for i, (s, c) in enumerate(top)
    )
    return (
        "SELECT CAST(rank AS INT) AS rank, piece, CAST(cost_e9 AS BIGINT) AS cost_e9\n"
        f"FROM (VALUES {vals}) AS t(rank, piece, cost_e9)\nORDER BY rank"
    )


def encode_stats_values_sql(sf_dir: str = GOLD_SF_DIR) -> str:
    import duckdb

    costs = _gold_train(sf_dir)
    seg = _gold_segmenter(costs)
    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, text FROM read_parquet(?) ORDER BY doc_id",
        [os.path.join(sf_dir, "documents.parquet")],
    ).fetchall()
    con.close()
    vals = []
    for doc_id, text in rows:
        words = (text or "").strip().split()
        n_pieces = sum(len(seg(w)) for w in words)
        n_chars = sum(len(w) for w in words)
        if n_pieces:
            # Spark round(double, 6) is HALF_UP over the shortest decimal
            # repr — mirror it exactly (the bpegold convention)
            from decimal import ROUND_HALF_UP, Decimal

            cpp = str(
                Decimal(repr(n_chars / n_pieces)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )
        else:
            cpp = "NULL"
        vals.append(f"({doc_id}, {len(words)}, {n_pieces}, {cpp})")
    return (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_words AS INT) AS n_words,\n"
        "       CAST(n_pieces AS BIGINT) AS n_pieces,\n"
        "       CAST(chars_per_piece AS DOUBLE) AS chars_per_piece\n"
        f"FROM (VALUES {', '.join(vals)}) AS t(doc_id, n_words, n_pieces, chars_per_piece)\n"
        "ORDER BY doc_id"
    )


QUERIES = {
    "q_unigram_vocab": q_unigram_vocab,
    "q_unigram_encode_stats": q_unigram_encode_stats,
}

ORACLES = {
    "q_unigram_vocab": vocab_values_sql(),
    "q_unigram_encode_stats": encode_stats_values_sql(),
}
