"""Web-crawl URL family (queries/web.py + tools/make_web.py fixture)."""

import urllib.parse

import duckdb
import pytest

from changegen_spark.queries.web import (
    WEB_PATH,
    canonical_sql,
    registered_domain_sql,
)

TRACK_PREFIXES = ("utm_", "gclid=", "fbclid=", "msclkid=")


def canonicalize_reference(url: str) -> str:
    """Independent canonicalizer built on urllib.parse — the from-scratch
    twin of the SQL expression, used as ground truth for every fixture
    URL and the handwritten tricky cases."""
    parts = urllib.parse.urlsplit(url)
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port  # urllib already drops nothing; None if absent
    default = {"http": 80, "https": 443}.get(scheme)
    netloc = host if port is None or port == default else f"{host}:{port}"
    path = parts.path if parts.path else "/"
    kept = [
        p
        for p in parts.query.split("&")
        if p and not any(p.startswith(t) for t in TRACK_PREFIXES)
    ]
    query = "&".join(sorted(kept))
    return urllib.parse.urlunsplit((scheme, netloc, path, query, ""))


TRICKY = [
    "HTTPS://WWW.Example.COM:443/A/b?z=1&a=2#frag",
    "http://host.co.uk:80/",
    "http://host.co.uk:8080/x",  # non-default port kept
    "https://h.io",  # empty path -> /
    "https://h.io/?utm_source=a",  # all params stripped -> no ?
    "https://h.io/p?gclid=1&id=2&fbclid=3&msclkid=4&utm_medium=m",
    "https://h.io/p?b=2&a=1&b=1",  # duplicate keys kept, sorted as strings
    "http://UPPER.NET/path/Case?x=Y",  # path/value case preserved
]


def test_canonicalizer_matches_urllib_reference_on_tricky_cases():
    con = duckdb.connect()
    for url in TRICKY:
        got = con.execute(
            f"SELECT {canonical_sql('u', duck=True)} FROM (SELECT ? AS u)",
            [url],
        ).fetchone()[0]
        assert got == canonicalize_reference(url), url
    con.close()


def test_canonical_spark_equals_duckdb_and_urllib_on_all_fixture_urls(spark):
    """duck=True and duck=False render the SAME function, and both agree
    with the independent urllib implementation, over every fixture URL."""
    from pyspark.sql import functions as F

    sp = {
        r.url: r.c
        for r in spark.read.parquet(WEB_PATH)
        .select("url", F.expr(canonical_sql("url", duck=False)).alias("c"))
        .collect()
    }
    con = duckdb.connect()
    dk = dict(
        con.execute(
            f"SELECT url, {canonical_sql('url', duck=True)} FROM '{WEB_PATH}'"
        ).fetchall()
    )
    con.close()
    assert sp == dk
    for url, c in sp.items():
        assert c == canonicalize_reference(url), url


def test_registered_domain_rule():
    cases = {
        "www.acme.com": "acme.com",
        "shop.example.co.uk": "example.co.uk",
        "data.orgsite.org.uk": "orgsite.org.uk",
        "mirror.kanga.com.au": "kanga.com.au",
        "labs.nihon.co.jp": "nihon.co.jp",
        "zeta.com": "zeta.com",
        "a.b.c.deep.net": "deep.net",
    }
    con = duckdb.connect()
    for host, want in cases.items():
        got = con.execute(
            f"SELECT {registered_domain_sql('h')} FROM (SELECT ? AS h)", [host]
        ).fetchone()[0]
        assert got == want, host
    con.close()


def test_variant_classes_merge_and_designed_loss_stays_distinct(spark):
    """Every merge-recoverable variant shares its base's canonical; every
    designed-loss row (scheme/www) differs from it.  This is the per-row
    form of the eval's aggregate claim."""
    from pyspark.sql import functions as F

    rows = (
        spark.read.parquet(WEB_PATH)
        .select(
            "doc_id", "cls", F.expr(canonical_sql("url", duck=False)).alias("c")
        )
        .collect()
    )
    base = {r.doc_id: r.c for r in rows if r.cls == "base"}
    merge_classes = {"case", "port", "frag", "track", "shuf", "emptypath", "exact"}
    n_merge = n_loss = 0
    for r in rows:
        if r.cls in merge_classes:
            assert r.c == base[r.doc_id], (r.cls, r.c)
            n_merge += 1
        elif r.cls in ("scheme", "www"):
            assert r.c != base[r.doc_id], (r.cls, r.c)
            n_loss += 1
    assert n_merge == 301 and n_loss == 30  # fixture manifest


def test_url_dedup_eval_pins(spark, sf_dir):
    """Precision exactly 1 (the lookalike negatives never merge), every
    recall miss attributed to the designed-loss rows, and no canonical
    group spans two contents."""
    from changegen_spark.queries.web import q_url_dedup, q_url_dedup_eval

    row = q_url_dedup_eval(spark, sf_dir).collect()[0]
    assert row.precision_e6 == 1000000
    assert row.n_true - row.n_tp == row.designed_loss_pairs == 30
    dedup = q_url_dedup(spark, sf_dir).collect()
    assert dedup and max(r.n_docs for r in dedup) == 1


def test_url_canonical_plan_is_map_side_only(spark, sf_dir):
    """The canonicalization stage itself (pre-presentation-sort frame) is
    pure expression work: no Exchange, no Python evaluation — it fuses
    into the scan's whole-stage-codegen span."""
    from changegen_spark.queries.web import with_canonical

    plan = (
        with_canonical(spark.read.parquet(WEB_PATH))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan  # no row- or Arrow-Python stage


def test_scaleup_web_builder_variants_all_canonicalize_to_base(spark):
    """The ladder's built-in correctness check at test scale: every
    synthesized page has exactly two spellings (base + one variant) that
    unify under canonicalization, and no group mixes two pages."""
    from pyspark.sql import functions as F

    from changegen_spark.queries.web import with_canonical
    from changegen_spark.sources.scaleup import build_web_urls

    path = build_web_urls(spark, "/tmp/changegen_spark_web_test", 2_000, parts=4)
    dedup = (
        with_canonical(spark.read.parquet(path))
        .groupBy("canonical")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )
    assert dedup.filter("n_urls <> 2 OR n_docs <> 1").count() == 0
    assert dedup.count() == 1_000


def test_url_blocklist_suffix_semantics(spark, sf_dir):
    """r7 blocklist: exact-or-dot-suffix match, first rule wins; an
    independent Python matcher over the fixture host inventory is the
    expectation, plus planted pins (subdomain blocked with its domain,
    'zeta.com' NOT caught by 'beta.net' — suffix needs the dot)."""
    from changegen_spark.queries.web import BLOCKLIST, q_url_blocklist

    rows = q_url_blocklist(spark, sf_dir).collect()
    assert rows

    def expect(host):
        for r in BLOCKLIST:
            if host == r or host.endswith("." + r):
                return r
        return ""

    for r in rows:
        want = expect(r.host)
        assert r.matched_rule == want, r.host
        assert r.blocked == (1 if want else 0)
    by_host = {r.host: r for r in rows}
    assert by_host["www.blog.acme.com"].matched_rule == "acme.com"
    assert by_host["cdn.beta.net"].blocked == 1
    assert by_host["zeta.com"].blocked == 0  # no accidental substring match
    assert by_host["www.zeta.com"].blocked == 0
    assert all(r.matched_rule != "spam.example" for r in rows)  # dead rule
