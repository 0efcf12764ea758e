"""Build the shipped web-page fixture for the C4 cleaning family.

The synthetic ``documents`` table is single-line word soup with no
sentence punctuation, so the C4 rules (Raffel et al. 2020, §2.2 — line
filtering on terminal punctuation, page gates, and the famous global
three-sentence-span dedup) would all degenerate on it.  Same situation
(and same remedy) as the set-similarity prefix filter: ship a
deterministic fixture that actually exercises every rule, with PLANTED
instances of each failure mode so tests carry exact expectations.

Planted features (all counts are module constants the tests import):

* nav / too-short / "Javascript" lines — dropped by the LINE rules;
* "lorem ipsum" pages, ``{`` pages, bad-word pages, short pages —
  dropped by the PAGE gates;
* boilerplate paragraphs (fixed 3-sentence spans) repeated across many
  pages — the span-dedup target, including one paragraph repeated twice
  WITHIN a single page and one whose first occurrence sits on a page
  that the page gates DROP (so the "first writer" must be the first
  *surviving* page).

Output (committed): fixtures/c4_pages.parquet — (page_id, url, text).
Rerun only if the corpus shape changes:  python tools/make_c4_fixture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXDIR = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "fixtures"))
OUT = os.path.join(FIXDIR, "c4_pages.parquet")

SEED = 20260814
N_PAGES = 480

# word pools for generated sentences (curated: no pool word contains a
# brace, "javascript", a bad word, or any "lorem ipsum" fragment)
_SUBJECTS = [
    "The planner", "A worker", "The scheduler", "Each executor", "The reader",
    "A compactor", "The optimizer", "One shard", "The broker", "A session",
    "The catalog", "Every probe", "The merger", "A courier", "The archive",
]
_VERBS = [
    "merges", "rewrites", "scans", "shuffles", "caches", "prunes",
    "streams", "batches", "sorts", "hashes", "splits", "routes",
]
_OBJECTS = [
    "sorted batches", "cold segments", "row groups", "dense buffers",
    "spilled pages", "late arrivals", "metric frames", "token spans",
    "nested arrays", "sparse deltas", "packed shards", "pivoted tiles",
]
_TAILS = [
    "today", "again", "downstream", "in order", "without waiting",
    "after sunset", "by design", "per epoch", "on demand", "quietly",
]
_ENDS = [".", ".", ".", "!", "?"]

# boilerplate paragraphs: fixed three-sentence spans planted across pages
BOILERPLATE = [
    (
        "This site is maintained by volunteers.",
        "All content is provided as is without warranty.",
        "Contact the editors for corrections.",
    ),
    (
        "Sign up for the weekly digest.",
        "We never share your address with anyone.",
        "Unsubscribe at any time from the footer.",
    ),
    (
        "Comments are moderated before they appear.",
        "Please keep the discussion civil and on topic.",
        "Repeated violations lead to a ban.",
    ),
    (
        "The archive is updated every night.",
        "Older entries move to cold storage after a year.",
        "Request a restore through the support desk.",
    ),
]
# paragraph -> number of pages it is planted into
BP_PLANT_PAGES = {0: 30, 1: 12, 2: 6, 3: 2}
BP_SAME_PAGE_TWICE = 2  # BOILERPLATE[2] appears twice in one of its pages
BP_FIRST_ON_DROPPED = 3  # BOILERPLATE[3]'s lowest-page occurrence is a lorem page

NAV_LINE = "Home About Contact Archive"
SHORT_LINE = "Read more."  # 2 words -> dropped by the >=3 words rule
JS_LINE = "Enable Javascript to view the comment thread."
LOREM_SENT = "Lorem ipsum dolor sit amet consectetur adipiscing elit."
BRACE_LINE = "function render() { return null; }"
BAD_WORDS = ("crummyword", "lousyword")
BAD_SENT = "This page hides one crummyword inside."

# planted page-level failure counts
N_LOREM = 8
N_BRACE = 8
N_BAD = 6
N_SHORT = 10  # pages left with < 5 sentences after line filtering


def _sentence(rng: np.random.RandomState) -> str:
    s = _SUBJECTS[rng.randint(len(_SUBJECTS))]
    v = _VERBS[rng.randint(len(_VERBS))]
    o = _OBJECTS[rng.randint(len(_OBJECTS))]
    t = _TAILS[rng.randint(len(_TAILS))]
    e = _ENDS[rng.randint(len(_ENDS))]
    return f"{s} {v} {o} {t}{e}"


def build() -> tuple[list[int], list[str], list[str]]:
    rng = np.random.RandomState(SEED)
    ids, urls, texts = [], [], []

    # page -> planted boilerplate paragraphs, assigned deterministically:
    # paragraph k goes to pages spaced across the id range
    bp_pages: dict[int, list[int]] = {}
    taken: set[int] = set()
    for k, n in BP_PLANT_PAGES.items():
        step = N_PAGES // (n + 1)
        pages = []
        p = 17 + 13 * k
        while len(pages) < n:
            if p not in taken and p < N_PAGES:
                pages.append(p)
                taken.add(p)
            p += step
            if p >= N_PAGES:
                p = (p % N_PAGES) + 1
        bp_pages[k] = sorted(pages)

    # page-level failure plants on pages with no boilerplate, spread out
    free = [p for p in range(N_PAGES) if p not in taken]
    lorem_pages = set(free[5 : 5 + N_LOREM])
    brace_pages = set(free[40 : 40 + N_BRACE])
    bad_pages = set(free[80 : 80 + N_BAD])
    short_pages = set(free[120 : 120 + N_SHORT])

    # BOILERPLATE[3]'s first occurrence must be on a dropped (lorem) page:
    # move its lowest page into the lorem set
    first_bp3 = bp_pages[BP_FIRST_ON_DROPPED][0]
    lorem_pages.add(first_bp3)

    for pid in range(N_PAGES):
        body_sents = [
            _sentence(rng)
            for _ in range(int(rng.randint(2, 5)) if pid in short_pages else int(rng.randint(6, 14)))
        ]
        if pid in lorem_pages:
            body_sents.insert(int(rng.randint(len(body_sents))), LOREM_SENT)
        if pid in bad_pages:
            body_sents.insert(int(rng.randint(len(body_sents))), BAD_SENT)
        for k, pages in bp_pages.items():
            if pid in pages:
                at = int(rng.randint(len(body_sents) + 1))
                body_sents[at:at] = list(BOILERPLATE[k])
                if k == BP_SAME_PAGE_TWICE and pid == pages[1]:
                    body_sents.extend(BOILERPLATE[k])

        # group sentences into lines of 1-3
        lines, i = [], 0
        while i < len(body_sents):
            n = int(rng.randint(1, 4))
            lines.append(" ".join(body_sents[i : i + n]))
            i += n
        # noise lines dropped by the line rules
        if pid % 3 == 0:
            lines.insert(0, NAV_LINE)
        if pid % 5 == 0:
            lines.append(SHORT_LINE)
        if pid % 7 == 0:
            lines.insert(len(lines) // 2, JS_LINE)
        if pid in brace_pages:
            lines.insert(len(lines) // 2, BRACE_LINE)

        ids.append(pid)
        urls.append(f"https://site{pid % 9}.example.test/page/{pid}")
        texts.append("\n".join(lines))
    return ids, urls, texts


def main() -> None:
    ids, urls, texts = build()
    os.makedirs(FIXDIR, exist_ok=True)
    tbl = pa.table(
        {
            "page_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(tbl, OUT, compression="zstd")
    print(f"wrote {OUT}: {tbl.num_rows} pages")


if __name__ == "__main__":
    main()
