"""Build the shipped web-crawl URL fixture (fixtures/web_urls.parquet).

Web-scale corpus curation starts at the URL frontier: the same page is
fetched under many spellings (case, default ports, fragments, tracking
params, query-param order), and URL canonicalization is the cheap exact
dedup that runs BEFORE any content hashing.  The synthetic tables carry no
URLs, so this fixture ships a deterministic crawl table with planted
variant classes whose ground truth travels as ``doc_id`` (rows with the
same doc_id fetched identical content):

Merge-recoverable classes (canonicalization MUST unify):
  * ``case``      — uppercased scheme and/or mixed-case host;
  * ``port``      — explicit default port (:80 http / :443 https);
  * ``frag``      — fragment appended (#...) — never sent to the server;
  * ``track``     — utm_* / gclid / fbclid / msclkid params injected;
  * ``shuf``      — query parameters reordered;
  * ``emptypath`` — authority with no path vs the same with "/";
  * ``exact``     — byte-identical repeat fetch.

Designed-loss classes (same content, canonicalization KEEPS distinct —
the conservative calls a production canonicalizer makes, quantified
honestly by q_url_dedup_eval instead of hidden):
  * ``scheme``    — http:// vs https:// mirror of the same page;
  * ``www``       — www.host vs bare host.
At most ONE designed-loss row per page, so every recall miss is
attributable to exactly these rows (tests/test_web.py pins it).

Must-not-merge negatives (``neg``, distinct doc_id): same path on a
different host, and same URL shape with a DIFFERENT non-tracking param
value — lookalikes a sloppy canonicalizer would over-merge; q_url_dedup
counts distinct doc_ids per canonical group to prove none did.

Output (committed): fixtures/web_urls.parquet
  (url_id BIGINT, url VARCHAR, doc_id BIGINT, cls VARCHAR)
Rerun only if the corpus shape changes: python tools/make_web.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXDIR = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "fixtures"))
OUT = os.path.join(FIXDIR, "web_urls.parquet")

SEED = 20260815
N_BASE = 400

HOSTS = [
    "www.acme.com",
    "blog.acme.com",
    "docs.acme.com",
    "shop.example.co.uk",
    "news.example.co.uk",
    "data.orgsite.org.uk",
    "mirror.kanga.com.au",
    "labs.nihon.co.jp",
    "cdn.beta.net",
    "portal.gamma.io",
    "forum.delta.org",
    "wiki.epsilon.dev",
    "zeta.com",
    "media.theta.tv",
    "archive.iota.info",
]

PATH_STEMS = ["articles", "p", "research", "threads", "datasets", "guides"]
PARAM_KEYS = ["id", "page", "ref", "sort", "lang", "v"]
TRACKERS = ["utm_source=feed", "utm_medium=social", "utm_campaign=q3",
            "gclid=CjKa81x", "fbclid=IwAR77z", "msclkid=b2e91c"]

# per-class variant counts (one variant row per distinct base page, drawn
# without replacement so classes never stack on the same page twice)
N_CLASS = {
    "case": 60,
    "port": 40,
    "frag": 50,
    "track": 60,
    "shuf": 50,
    "emptypath": 20,
    "exact": 30,
    "scheme": 15,
    "www": 15,
}
N_NEG_HOST = 40   # same path, different host (different doc)
N_NEG_PARAM = 40  # same shape, different id= value (different doc)


def _mixed_case(rng, s: str) -> str:
    return "".join(c.upper() if rng.random() < 0.5 else c for c in s)


def build():
    rng = np.random.default_rng(SEED)
    bases = []  # (scheme, host, path, params: list[str])
    for i in range(N_BASE):
        host = HOSTS[int(rng.integers(len(HOSTS)))]
        scheme = "https" if rng.random() < 0.8 else "http"
        if i % 37 == 0:
            # root pages — the emptypath class draws from these; hosts
            # assigned round-robin WITHOUT randomness so no two root
            # pages can render the same URL (same URL ⇒ same fetch: a
            # crawl table can't map one URL to two contents)
            host = HOSTS[(i // 37) % len(HOSTS)]
            scheme = "https"
            path = "/"
        else:
            stem = PATH_STEMS[int(rng.integers(len(PATH_STEMS)))]
            path = f"/{stem}/{i}" + ("/view" if rng.random() < 0.3 else "")
        n_par = int(rng.integers(0, 4))
        keys = list(rng.choice(PARAM_KEYS, size=n_par, replace=False))
        params = [f"{k}={int(rng.integers(1, 100))}" for k in sorted(keys)]
        bases.append((scheme, host, path, params))

    def render(scheme, host, path, params, frag=""):
        q = ("?" + "&".join(params)) if params else ""
        p = "" if path == "" else path
        return f"{scheme}://{host}{p}{q}{frag}"

    rows = []  # (url, doc_id, cls)
    for doc_id, b in enumerate(bases):
        rows.append((render(*b), doc_id, "base"))

    # draw disjoint page sets per variant class (designed-loss classes get
    # at most one row per page BY CONSTRUCTION: one class per page, one
    # row per class)
    order = rng.permutation(N_BASE)
    cursor = 0
    picks = {}
    for cls, n in N_CLASS.items():
        if cls == "emptypath":
            roots = [i for i in range(N_BASE) if bases[i][2] == "/"]
            picks[cls] = roots[:n]
            continue
        if cls == "shuf":
            multi = [i for i in order if len(bases[i][3]) >= 2]
            picks[cls] = [int(i) for i in multi[:n]]
            continue
        picks[cls] = [int(i) for i in order[cursor : cursor + n]]
        cursor += n

    for cls, pages in picks.items():
        for i in pages:
            scheme, host, path, params = bases[i]
            if cls == "case":
                u = render(scheme.upper(), _mixed_case(rng, host), path, params)
            elif cls == "port":
                port = ":80" if scheme == "http" else ":443"
                u = render(scheme, host + port, path, params)
            elif cls == "frag":
                u = render(scheme, host, path, params, frag=f"#sec{i}")
            elif cls == "track":
                extra = list(rng.choice(TRACKERS, size=int(rng.integers(1, 3)), replace=False))
                merged = list(params)
                for t in extra:
                    merged.insert(int(rng.integers(0, len(merged) + 1)), t)
                u = render(scheme, host, path, merged)
            elif cls == "shuf":
                u = render(scheme, host, path, list(rng.permutation(params)))
            elif cls == "emptypath":
                u = render(scheme, host, "", params)
            elif cls == "exact":
                u = render(scheme, host, path, params)
            elif cls == "scheme":
                u = render("http" if scheme == "https" else "https", host, path, params)
            elif cls == "www":
                h = host[4:] if host.startswith("www.") else "www." + host
                u = render(scheme, h, path, params)
            rows.append((u, i, cls))

    # negatives: genuinely different content, lookalike URLs
    neg_doc = N_BASE
    for i in order[: N_NEG_HOST]:
        scheme, host, path, params = bases[int(i)]
        other = HOSTS[(HOSTS.index(host) + 1) % len(HOSTS)]
        rows.append((render(scheme, other, path, params), neg_doc, "neg"))
        neg_doc += 1
    with_id = [i for i in order if any(p.startswith("id=") for p in bases[int(i)][3])]
    for i in with_id[:N_NEG_PARAM]:
        scheme, host, path, params = bases[int(i)]
        bumped = [
            f"id={int(p[3:]) + 1000}" if p.startswith("id=") else p for p in params
        ]
        rows.append((render(scheme, host, path, bumped), neg_doc, "neg"))
        neg_doc += 1

    # a crawl table maps each URL spelling to ONE content: collisions
    # here would plant fake over-merges the dedup eval then misreports
    url2doc = {}
    for u, d, _ in rows:
        if url2doc.setdefault(u, d) != d:
            raise AssertionError(f"URL maps to two doc_ids: {u}")

    perm = rng.permutation(len(rows))
    urls = [rows[int(k)][0] for k in perm]
    docs = [rows[int(k)][1] for k in perm]
    clss = [rows[int(k)][2] for k in perm]
    table = pa.table(
        {
            "url_id": pa.array(range(len(rows)), pa.int64()),
            "url": pa.array(urls, pa.string()),
            "doc_id": pa.array(docs, pa.int64()),
            "cls": pa.array(clss, pa.string()),
        }
    )
    os.makedirs(FIXDIR, exist_ok=True)
    pq.write_table(table, OUT)
    n_loss = N_CLASS["scheme"] + N_CLASS["www"]
    print(f"wrote {OUT}: {len(rows)} rows, {N_BASE} pages, "
          f"{sum(N_CLASS.values())} variants ({n_loss} designed-loss), "
          f"{N_NEG_HOST + N_NEG_PARAM} negatives")


if __name__ == "__main__":
    build()
