"""WordPiece tokenizer queries + independent Python goldens.

``functions/wordpiece.py`` holds the engine (shared distributed word
counts, bounded driver merge loop, Arrow encode stage); this module
holds the registry queries and a SEPARATELY WRITTEN golden
implementation — list-based word states and ``fractions.Fraction``
exact scores vs the engine's tuple-dict vocabulary and cross-multiplied
integer comparison; an ascending-length scanner vs the engine's
descending greedy loop — emitted as inline VALUES oracles, the same
two-implementation pattern as queries/bpegold.py and
queries/unigram.py.  Determinism contract documented in
functions/wordpiece.py.
"""

from __future__ import annotations

import functools
import os
from collections import Counter
from fractions import Fraction

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changegen_spark.sources.tables import load_table

GOLD_SF_DIR = "/root/testdata/sf0.01"
WP_MERGES = 40  # merge rows learned/emitted (BPE/unigram convention)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# --- registry queries (engine path) ------------------------------------------


def q_wordpiece_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned WordPiece merge table: rank, pair, merged piece,
    pair count, and the floor-scaled likelihood score — golden-backed
    by the independent implementation below."""
    from changegen_spark.functions.bpe import word_counts
    from changegen_spark.functions.wordpiece import wordpiece_train

    merges, _pieces = wordpiece_train(word_counts(_docs(spark, sf_dir)), WP_MERGES)
    return spark.createDataFrame(
        [(i, l, r, m, c, s) for i, (l, r, m, c, s) in enumerate(merges)],
        "rank INT, left STRING, right STRING, merged STRING,"
        " pair_count BIGINT, score_e9 BIGINT",
    ).orderBy("rank")


def q_wordpiece_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document with the corpus-trained WordPiece vocab;
    per-doc piece accounting incl. the [UNK] count (the inference stage
    with the piece inventory as a broadcast closure)."""
    from changegen_spark.functions.bpe import word_counts
    from changegen_spark.functions.wordpiece import (
        wordpiece_encode_stats_udf,
        wordpiece_train,
    )

    # r13: the query consumes only (n_pieces, n_unk), so the encode stage
    # returns exactly that struct — no token-string arrays cross the
    # Python↔JVM boundary and the two interpreted array passes
    # (size + filter==UNK) disappear (guide §4.1); equality with the
    # array encoder is pinned in tests/test_lm.py.
    docs = _docs(spark, sf_dir)
    _merges, pieces = wordpiece_train(word_counts(docs), WP_MERGES)
    enc = wordpiece_encode_stats_udf(pieces)
    toks = F.split(F.trim("text"), r"\s+")
    return (
        docs.select(
            "doc_id",
            F.size(F.array_remove(toks, "")).alias("n_words"),
            enc(F.col("text")).alias("st"),
            F.length(F.regexp_replace(F.trim("text"), r"\s+", "")).alias("n_chars"),
        )
        .select(
            "doc_id",
            "n_words",
            F.col("st.n_pieces").alias("n_pieces"),
            F.col("st.n_unk").alias("n_unk"),
            F.round(F.col("n_chars") / F.col("st.n_pieces"), 6).alias(
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


@functools.lru_cache(maxsize=4)
def _gold_train(sf_dir: str):
    """List-of-states trainer (vs the engine's dict-of-tuples)."""
    words = _gold_words(sf_dir)
    states = [[w[0]] + ["##" + ch for ch in w[1:]] for w, _ in words]
    counts = [c for _, c in words]
    inventory = {s for st in states for s in st}
    merges = []
    for _ in range(WP_MERGES):
        pc: Counter = Counter()
        sc: Counter = Counter()
        for st, c in zip(states, counts):
            for s in st:
                sc[s] += c
            for a, b in zip(st, st[1:]):
                pc[(a, b)] += c
        cands = [
            (Fraction(p, sc[a] * sc[b]), (a, b), p)
            for (a, b), p in pc.items()
            if p >= 2
        ]
        if not cands:
            break
        frac, (a, b), p = sorted(cands, key=lambda t: (-t[0], t[1]))[0]
        merged = a + (b[2:] if b[:2] == "##" else b)
        for st in states:
            i = 0
            while i < len(st) - 1:
                if st[i] == a and st[i + 1] == b:
                    st[i : i + 2] = [merged]
                i += 1
        inventory.add(merged)
        score_e9 = (10**9 * p) // (sc[a] * sc[b])
        merges.append((a, b, merged, p, score_e9))
    return merges, inventory


def _gold_encode(word: str, inventory: set) -> list[str]:
    """Ascending-length scan remembering the LAST (longest) match —
    the opposite loop direction from the engine's greedy descent."""
    out = []
    pos = 0
    while pos < len(word):
        hit = None
        for ln in range(1, len(word) - pos + 1):
            piece = word[pos : pos + ln]
            cand = piece if pos == 0 else "##" + piece
            if cand in inventory:
                hit = (ln, cand)
        if hit is None:
            return ["[UNK]"]
        pos += hit[0]
        out.append(hit[1])
    return out


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def merges_values_sql(sf_dir: str = GOLD_SF_DIR) -> str:
    merges, _ = _gold_train(sf_dir)
    vals = ",\n       ".join(
        f"({i}, {_sq(l)}, {_sq(r)}, {_sq(m)}, {c}, {s})"
        for i, (l, r, m, c, s) in enumerate(merges)
    )
    return (
        'SELECT CAST(rank AS INT) AS rank, "left", "right", merged,\n'
        "       CAST(pair_count AS BIGINT) AS pair_count,"
        " CAST(score_e9 AS BIGINT) AS score_e9\n"
        f'FROM (VALUES {vals}) AS t(rank, "left", "right", merged, pair_count, score_e9)\n'
        "ORDER BY rank"
    )


def encode_stats_values_sql(sf_dir: str = GOLD_SF_DIR) -> str:
    import duckdb

    from decimal import ROUND_HALF_UP, Decimal

    _, inventory = _gold_train(sf_dir)
    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, text FROM read_parquet(?) ORDER BY doc_id",
        [os.path.join(sf_dir, "documents.parquet")],
    ).fetchall()
    con.close()
    vals = []
    for doc_id, text in rows:
        words = (text or "").strip().split()
        enc = [_gold_encode(w, inventory) for w in words]
        n_pieces = sum(len(e) for e in enc)
        n_unk = sum(1 for e in enc for t in e if t == "[UNK]")
        n_chars = sum(len(w) for w in words)
        if n_pieces:
            cpp = str(
                Decimal(repr(n_chars / n_pieces)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )
        else:
            cpp = "NULL"
        vals.append(f"({doc_id}, {len(words)}, {n_pieces}, {n_unk}, {cpp})")
    return (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_words AS INT) AS n_words,\n"
        "       CAST(n_pieces AS INT) AS n_pieces, CAST(n_unk AS INT) AS n_unk,\n"
        "       CAST(chars_per_piece AS DOUBLE) AS chars_per_piece\n"
        f"FROM (VALUES {', '.join(vals)}) AS t(doc_id, n_words, n_pieces, n_unk, chars_per_piece)\n"
        "ORDER BY doc_id"
    )


QUERIES = {
    "q_wordpiece_merges": q_wordpiece_merges,
    "q_wordpiece_encode_stats": q_wordpiece_encode_stats,
}

ORACLES = {
    "q_wordpiece_merges": merges_values_sql(),
    "q_wordpiece_encode_stats": encode_stats_values_sql(),
}
