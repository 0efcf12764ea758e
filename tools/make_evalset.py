"""Build the shipped eval-set n-gram artifact for external decontamination.

Real pipelines decontaminate against a VERSIONED eval-set artifact (a file
of n-grams or their hashes shipped alongside the eval suites), not an
in-corpus split recomputed per run.  This script materializes that
artifact once — the distinct word 5-grams of the held-out split
(doc_id % 19 = 3) of the sf0.01 documents fixture — and the result is
committed at fixtures/evalset_ngrams.parquet.  q_external_decontaminate
and its DuckDB oracle both read the file from disk; neither derives the
eval set at query time.

Rerun only when the fixture data or DECON_N changes:
    python tools/make_evalset.py
"""

from __future__ import annotations

import os

import duckdb

DECON_N = 5
SRC = "/root/testdata/sf0.01/documents.parquet"
OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "evalset_ngrams.parquet")


def main() -> None:
    out = os.path.abspath(OUT)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
            FROM '{SRC}' WHERE doc_id % 19 = 3
          )
          SELECT DISTINCT
                 array_to_string(t[CAST(i AS INT):CAST(i + {DECON_N - 1} AS INT)], ' ') AS ng
          FROM (SELECT doc_id, t,
                       unnest(generate_series(1, len(t) - {DECON_N - 1})) AS i
                FROM toks WHERE len(t) >= {DECON_N})
          ORDER BY ng
        ) TO '{out}' (FORMAT PARQUET)
        """
    )
    n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(f"wrote {n} distinct {DECON_N}-grams to {out}")


if __name__ == "__main__":
    main()
