"""C4 cleaning family: an INDEPENDENT plain-Python reimplementation of
the full pipeline (line rules → page gates → global 3-sentence-span
dedup) is the expectation for every page, plus targeted pins on the
fixture's planted failure modes (tools/make_c4_fixture.py) — including
the first-writer-on-a-dropped-page edge and the same-page repeat."""

import hashlib
import re

import duckdb
import pytest

from changegen_spark.queries.c4 import (
    C4_FIXTURE,
    C4_MIN_LINE_WORDS,
    C4_MIN_SENTENCES,
    C4_BAD_WORDS,
    SPAN_N,
    q_c4_line_filter,
    q_c4_span_dedup,
)

SEP = "\x01"


def _fixture_rows():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT page_id, text FROM '{C4_FIXTURE}' ORDER BY page_id"
    ).fetchall()
    con.close()
    return rows


def _reference_clean(rows):
    """Independent implementation: dict/loop structure, re module, no
    shared helpers with the Spark code."""
    gated = {}
    signals = {}
    for pid, text in rows:
        lines = text.split("\n")
        kept = []
        for ln in lines:
            t = ln.strip()
            words = re.split(r"\s+", t) if t else []
            if (
                re.search(r"[.!?]$", t)
                and len(words) >= C4_MIN_LINE_WORDS
                and "javascript" not in t.lower()
            ):
                kept.append(t)
        joined = " ".join(kept)
        sents = [s.strip() for s in re.split(r"[.!?]", joined) if s.strip()]
        n_sent = len(re.split(r"[.!?]", joined)) - 1
        low = text.lower()
        flags = {
            "lorem": "lorem ipsum" in low,
            "brace": "{" in text,
            "bad": any(w in low for w in C4_BAD_WORDS),
        }
        signals[pid] = (len(lines), len(kept), n_sent, flags)
        if n_sent >= C4_MIN_SENTENCES and not any(flags.values()):
            gated[pid] = sents
    # global span dedup: first (page, start) occurrence of each key wins
    first = {}
    for pid in sorted(gated):
        sents = gated[pid]
        for i in range(len(sents) - SPAN_N + 1):
            key = SEP.join(sents[i : i + SPAN_N])
            first.setdefault(key, (pid, i))
    removed = {pid: set() for pid in gated}
    for pid in sorted(gated):
        sents = gated[pid]
        for i in range(len(sents) - SPAN_N + 1):
            key = SEP.join(sents[i : i + SPAN_N])
            if first[key] != (pid, i):
                removed[pid].update(range(i, i + SPAN_N))
    out = {}
    for pid, sents in gated.items():
        rm = removed[pid]
        kept_sents = [s for j, s in enumerate(sents) if j not in rm]
        fp = hashlib.md5(SEP.join(kept_sents).encode()).hexdigest()
        out[pid] = (len(sents), len(rm), len(kept_sents), fp)
    return signals, out


@pytest.fixture(scope="module")
def reference():
    return _reference_clean(_fixture_rows())


def test_line_filter_matches_independent_impl(spark, reference):
    signals, _ = reference
    got = {r.page_id: r for r in q_c4_line_filter(spark, "").collect()}
    assert set(got) == set(signals)
    for pid, (n_lines, n_kept, n_sent, flags) in signals.items():
        r = got[pid]
        assert (r.n_lines, r.n_kept_lines, r.n_sentences) == (
            n_lines,
            n_kept,
            n_sent,
        ), pid
        assert (r.has_lorem, r.has_brace, r.has_badword) == (
            int(flags["lorem"]),
            int(flags["brace"]),
            int(flags["bad"]),
        ), pid
        want_keep = int(
            n_sent >= C4_MIN_SENTENCES and not any(flags.values())
        )
        assert r.keep == want_keep, pid


def test_span_dedup_matches_independent_impl(spark, reference):
    _, expected = reference
    got = {r.page_id: r for r in q_c4_span_dedup(spark, "").collect()}
    assert set(got) == set(expected)
    for pid, (n_sents, n_removed, n_kept, fp) in expected.items():
        r = got[pid]
        assert (r.n_sents, r.n_removed, r.n_kept, r.kept_fp) == (
            n_sents,
            n_removed,
            n_kept,
            fp,
        ), pid


def test_planted_expectations(spark, reference):
    from tools.make_c4_fixture import (
        BOILERPLATE,
        BP_PLANT_PAGES,
        BP_SAME_PAGE_TWICE,
        BP_FIRST_ON_DROPPED,
        N_BAD,
        N_BRACE,
        N_LOREM,
        N_PAGES,
        N_SHORT,
        build,
    )

    signals, dedup = reference
    # page gates drop exactly the planted failures (N_LOREM + the moved
    # boilerplate-3 page, braces, bad words, short pages)
    n_dropped = sum(
        1
        for pid, (_, _, n_sent, flags) in signals.items()
        if n_sent < C4_MIN_SENTENCES or any(flags.values())
    )
    assert n_dropped == N_LOREM + 1 + N_BRACE + N_BAD + N_SHORT
    assert len(dedup) == N_PAGES - n_dropped

    # recover the planted page assignments from the generator
    ids, urls, texts = build()
    bp_pages = {
        k: sorted(pid for pid, t in zip(ids, texts) if BOILERPLATE[k][0] in t)
        for k in BP_PLANT_PAGES
    }
    # boilerplate 0: every surviving occurrence after the first loses its
    # full span (>= SPAN_N sentences removed)
    surv0 = [p for p in bp_pages[0] if p in dedup]
    assert len(surv0) == BP_PLANT_PAGES[0]
    assert dedup[surv0[0]][1] == 0  # first writer keeps everything
    for p in surv0[1:]:
        assert dedup[p][1] >= SPAN_N, p

    # boilerplate 3: the lowest-page occurrence sits on a DROPPED page,
    # so the surviving occurrence is a first writer and keeps its span
    bp3 = bp_pages[BP_FIRST_ON_DROPPED]
    assert bp3[0] not in dedup  # moved into the lorem set by the generator
    assert dedup[bp3[1]][1] == 0

    # boilerplate 2, planted twice in one page: both occurrences lose to
    # the earlier page, so at least two spans' worth of sentences go
    twice = bp_pages[BP_SAME_PAGE_TWICE][1]
    assert dedup[twice][1] >= 2 * SPAN_N


def test_span_dedup_plan_shape(spark):
    plan = q_c4_span_dedup(spark, "")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
