"""RAG chunking invariants (queries/chunking.py)."""


def test_fixed_chunks_cover_and_overlap(spark, sf_dir):
    """Every token of every non-empty doc is covered; consecutive chunks
    overlap by exactly W-S until the tail; spans are consistent with the
    token counts; chunk contents match a direct Python re-chunking."""
    import hashlib

    from changegen_spark.queries.chunking import (
        CHUNK_S,
        CHUNK_W,
        q_chunk_fixed,
    )
    from changegen_spark.sources.tables import load_table

    docs = {
        r.doc_id: r.text.split()
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    by_doc = {}
    for r in q_chunk_fixed(spark, sf_dir).collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, toks in docs.items():
        n = len(toks)
        chunks = by_doc.get(doc_id, [])
        if n == 0:
            assert chunks == []
            continue
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        covered = set()
        for c in chunks:
            assert c.tok_start == c.chunk_id * CHUNK_S
            assert c.tok_end == min(c.tok_start + CHUNK_W, n)
            assert c.n_tokens == c.tok_end - c.tok_start
            covered.update(range(c.tok_start, c.tok_end))
            want = " ".join(toks[c.tok_start : c.tok_start + CHUNK_W])
            assert c.chunk_hash == hashlib.md5(want.encode()).hexdigest()
        assert covered == set(range(n))
        # final chunk must start before the text ends (no empty chunk)
        assert chunks[-1].tok_start < n


def test_sentence_chunks_bucket_by_global_offset(spark, sf_dir):
    """chunk_id = floor(tokens-before / B); chunks are contiguous
    sentence runs and token totals reconcile with the doc."""
    from changegen_spark.queries.chunking import CHUNK_B, q_chunk_sentences
    from changegen_spark.sources.tables import load_table

    # mirror the engine exactly: sentence indices are RAW split positions
    # (empties keep their slot in the numbering but produce no row)
    docs = {
        r.doc_id: [
            (idx, part.strip().split())
            for idx, part in enumerate(r.text.split("."))
            if part.strip()
        ]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    by_doc = {}
    for r in q_chunk_sentences(spark, sf_dir).collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, sents in docs.items():
        rows = sorted(by_doc.get(doc_id, []), key=lambda r: r.chunk_id)
        want = {}
        cum = 0
        for idx, words in sents:
            cid = cum // CHUNK_B
            n_s, n_t, first, last = want.get(cid, (0, 0, idx, idx))
            want[cid] = (n_s + 1, n_t + len(words), min(first, idx), max(idx, last))
            cum += len(words)
        got = {
            r.chunk_id: (r.n_sentences, r.n_tokens, r.first_sent, r.last_sent)
            for r in rows
        }
        assert got == want, doc_id


def test_sentence_chunks_raw_split_indexing_matches_oracle(spark, tmp_path):
    """r6-advice regression: text containing '..' or a leading '.' must
    yield the SAME sent_idx numbering in the engine and the DuckDB oracle
    (raw split positions, empties filtered AFTER indexing).  The shipped
    fixtures contain no such text, so this pins the semantics on an
    adversarial corpus directly."""
    import duckdb

    from changegen_spark.queries.chunking import (
        Q_CHUNK_SENTENCES_SQL,
        q_chunk_sentences,
    )

    texts = [
        (0, "alpha beta.. gamma delta. epsilon"),  # consecutive dots
        (1, ".lead word. two words here.  . tail"),  # leading dot + blank slot
        (2, "one two three"),  # no dot at all
        (3, "..."),  # only empties
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "synth", len(t)) for i, t in texts],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sfadv")
    df.coalesce(1).write.parquet(f"{sf}/documents.parquet")

    got = [
        (r.doc_id, r.chunk_id, r.n_sentences, r.n_tokens, r.first_sent, r.last_sent)
        for r in q_chunk_sentences(spark, sf).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    want = [tuple(r) for r in con.execute(Q_CHUNK_SENTENCES_SQL).fetchall()]
    con.close()
    assert got == want
    # the gap is real: doc 0's second sentence sits at raw index 2 (slot 1
    # is the empty between the two dots), doc 1's first at raw index 1
    assert (0, 0, 2, 5, 0, 2) in got or any(
        r[0] == 0 and r[4] == 0 and r[5] >= 2 for r in got
    )
