"""Text-analysis operators for large-scale corpus pipelines.

All pure built-in column expressions (JVM-side, whole-stage codegen): at
100 TB these run as map-only stages with zero shuffle.

Operators: token counting, quality scoring, n-gram language ID heuristic,
document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker-word profiles for the heuristic language ID.
# Counting marker substrings is the classic n-gram-profile trick scaled down;
# deterministic and cheap (no model, no UDF).
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " a ", " of "],
    "es": [" el ", " la ", " de "],
    "fr": [" le ", " la ", " et "],
    "de": [" der ", " die ", " und "],
    "zh": [" zh ", " de "],  # placeholder markers for the synthetic corpus
}


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank strings count 0."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("long")


def occurrence_count(text: Column, marker: str) -> Column:
    """Non-overlapping occurrences of a literal substring.

    (len(s) - len(replace(s, m, ''))) / len(m) — identical semantics in any
    SQL engine, which keeps the duckdb oracle exact.
    """
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit(""))))
        / F.lit(len(marker))
    ).cast("long")


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-scoring features: length, alpha/digit/space ratios, mean token length.

    Ratios are rounded to 6 dp so downstream hash comparisons are stable
    across float summation orders.
    """
    n = F.length(text).cast("double")
    alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", "")).cast("double")
    digit = F.length(F.regexp_replace(text, r"[^0-9]", "")).cast("double")
    space = F.length(F.regexp_replace(text, r"[^ ]", "")).cast("double")
    toks = token_count(text).cast("double")
    return {
        "n_chars": n.cast("long"),
        "n_tokens": toks.cast("long"),
        "alpha_ratio": F.round(F.when(n > 0, alpha / n).otherwise(0.0), 6),
        "digit_ratio": F.round(F.when(n > 0, digit / n).otherwise(0.0), 6),
        "space_ratio": F.round(F.when(n > 0, space / n).otherwise(0.0), 6),
        "avg_token_len": F.round(
            F.when(toks > 0, (n - space) / toks).otherwise(0.0), 6
        ),
    }


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-count score per language over ' '-padded lowered text."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return {
        lang: sum(
            (occurrence_count(padded, m) for m in markers), start=F.lit(0).cast("long")
        )
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax marker score, ties broken by language
    code order, 'und' when every score is zero."""
    scores = lang_scores(text)
    pairs = F.array(
        *[
            F.struct(score.alias("score"), F.lit(lang).alias("lang"))
            for lang, score in sorted(scores.items())
        ]
    )
    best = F.array_max(
        F.transform(
            pairs,
            # invert lang for tie-break: max on (score, reversed-lang) picks
            # the alphabetically-first language among ties
            lambda p: F.struct(
                p.score.alias("score"),
                (F.lit(0) - F.ascii(p.lang)).alias("tie"),
                p.lang.alias("lang"),
            ),
        )
    )
    return F.when(best.score > 0, best.lang).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    lowered tokens — the classic 'fingerprint' clustering key for fuzzy
    dedup (Google Refine style)."""
    toks = F.array_sort(
        F.array_distinct(F.split(F.trim(F.lower(text)), r"\s+"))
    )
    return F.md5(F.to_binary(F.concat_ws(" ", toks), F.lit("utf-8")))
