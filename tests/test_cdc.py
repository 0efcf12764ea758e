"""Content-defined chunking: boundary re-synchronization after shifts —
the property fixed-size chunking lacks — plus chunk integrity invariants."""

import hashlib

from pyspark.sql import functions as F

import changegen_spark.queries.cdc as cdc


def _ref_chunks(text: str):
    """Independent reference chunker (same contract, separate code):
    pure-Python big-int polynomial rolling hash — no numpy, so a numpy
    wraparound bug in the production path would be caught here."""
    s = text.lower()
    n = len(s)
    md5 = hashlib.md5

    def H(i):  # i = 1-based window end
        return (
            sum(ord(s[i - 1 - d]) * pow(cdc.CDC_B, d, cdc.CDC_M) for d in range(cdc.CDC_WIN))
            % cdc.CDC_M
        )

    bounds = [i for i in range(cdc.CDC_WIN, n + 1) if H(i) < cdc.CDC_THRESH]
    if not bounds or bounds[-1] != n:
        bounds.append(n)
    out, prev = [], 0
    for b in bounds:
        if b > prev:
            out.append(s[prev:b])
            prev = b
    return out


def _spark_chunks(spark, docs: dict[int, str]):
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    rows = cdc.chunk_rows(df).collect()
    out: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["cstart"])):
        out.setdefault(r["doc_id"], []).append(
            (r["cstart"], r["clen"], r["chash"])
        )
    return out


def test_cdc_matches_reference_and_covers_text(spark):
    import random

    rng = random.Random(7)
    base = " ".join(
        "".join(chr(97 + rng.randrange(26)) for _ in range(rng.randrange(3, 9)))
        for _ in range(120)
    )
    docs = {1: base, 2: "tiny", 3: ""}
    got = _spark_chunks(spark, docs)
    for i in (1, 2):
        ref = _ref_chunks(docs[i])
        assert [c[1] for c in got[i]] == [len(c) for c in ref], i
        assert [c[2] for c in got[i]] == [
            hashlib.md5(c.encode()).hexdigest() for c in ref
        ], i
        # chunks tile the text exactly: starts are the running sum of lens
        pos = 1
        for cstart, clen, _ in got[i]:
            assert cstart == pos
            pos += clen
        assert pos - 1 == len(docs[i])
    assert 3 not in got  # empty text → no chunks


def test_cdc_resynchronizes_after_prefix_insert(spark):
    """Prepending a prefix shifts every character position, yet all chunk
    boundaries strictly after the edit re-synchronize — the shared suffix
    yields identical chunk hashes.  This is the CDC property that makes
    chunk-level dedup catch shifted/concatenated duplicates."""
    import random

    rng = random.Random(13)
    body = " ".join(
        "".join(chr(97 + rng.randrange(26)) for _ in range(rng.randrange(3, 9)))
        for _ in range(200)
    )
    docs = {1: body, 2: "some unrelated preamble text inserted here " + body}
    got = _spark_chunks(spark, docs)
    h1 = [c[2] for c in got[1]]
    h2 = [c[2] for c in got[2]]
    shared = set(h1) & set(h2)
    # all but the first few chunks of each doc must coincide
    assert len(shared) >= len(h1) - 2, (len(shared), len(h1), len(h2))
    # and the shared run is the common SUFFIX of both chunk sequences
    k = 0
    while k < min(len(h1), len(h2)) and h1[-1 - k] == h2[-1 - k]:
        k += 1
    assert k >= len(h1) - 2
