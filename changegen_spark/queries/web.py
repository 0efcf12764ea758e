"""Web-crawl URL processing (r6 new family).

The exact-dedup stage every web-scale corpus runs FIRST — before any
content hashing or MinHash — is URL canonicalization: unify the spellings
under which a crawler refetches the same page, then dedup on the canonical
key.  Over the shipped crawl fixture (fixtures/web_urls.parquet, built by
tools/make_web.py with planted variant classes and doc_id ground truth):

* ``q_url_canonical``  — per-URL canonical form + which normalizations
  fired (RFC 3986 §6 conservative subset: lowercase scheme/host, drop
  default port, drop fragment, strip tracking params, sort query params,
  empty path → "/");
* ``q_host_stats``     — per-host crawl inventory: URLs vs canonical
  pages, dup rate, registered domain (public-suffix-lite);
* ``q_url_dedup``      — canonical groups with >1 spelling: keeper
  (min url_id), variant count, and distinct fetched contents per group
  (n_docs=1 everywhere ⟺ canonicalization never over-merged);
* ``q_url_dedup_eval`` — exact pair precision/recall against the doc_id
  truth, with the recall gap attributed to the DESIGNED-loss classes
  (http/https mirrors and www/bare hosts are kept distinct on purpose —
  a canonicalizer that merges those corrupts real sites; the eval shows
  the loss is exactly those rows and nothing else);
* ``q_url_params``     — query-parameter key inventory after tracking
  strip (the frontier-design audit: which params actually carry state).

The canonicalizer is defined ONCE as a dialect-parameterized SQL
expression (``canonical_sql``) executed verbatim on BOTH engines — the
er.py phonetic-key pattern.  Dialect toggles are pure renames
(split/str_split, array_sort/list_sort, array_join/array_to_string,
size/len, filter/list_filter); regexes use character classes (``[?]``,
``[.]``) instead of backslash escapes so the two engines' string-literal
rules can't diverge.

100 TB shape: canonicalization is map-side JVM expression work (no UDF,
no shuffle — whole-stage codegen keeps it in the scan stage); dedup and
host stats are one hash shuffle each on canonical/host.  At crawl scale
the canonical key is ALSO the frontier partitioner, so the dedup shuffle
is the only exchange the stage ever needs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FIXDIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "fixtures")
)
WEB_PATH = os.path.join(FIXDIR, "web_urls.parquet")

# params stripped as non-content-bearing (click/campaign trackers)
_TRACK_PREDICATES = (
    "substr(x, 1, 4) = 'utm_'",
    "substr(x, 1, 6) = 'gclid='",
    "substr(x, 1, 7) = 'fbclid='",
    "substr(x, 1, 8) = 'msclkid='",
)

# registered-domain: last two labels, or last three when the public
# suffix itself is two labels (public-suffix-lite: the multi-part
# suffixes present in crawls this engine targets; extend the alternation
# to extend coverage)
_MULTIPART_SUFFIXES = "co[.]uk|org[.]uk|com[.]au|co[.]jp"


def _d(duck: bool):
    """Dialect function-name map (the only Spark/DuckDB differences)."""
    return {
        "split": "str_split" if duck else "split",
        "sort": "list_sort" if duck else "array_sort",
        "join": "array_to_string" if duck else "array_join",
        "size": "len" if duck else "size",
        "filter": "list_filter" if duck else "filter",
    }


def _parts_sql(url: str, duck: bool) -> dict:
    """Component expressions over a URL column (shared by both dialects)."""
    d = _d(duck)
    scheme = f"lower(regexp_extract({url}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    authority = f"regexp_extract({url}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)"
    host = f"lower(regexp_extract({authority}, '^([^:]*)', 1))"
    port = f"regexp_extract({authority}, ':([0-9]+)$', 1)"
    path_raw = f"regexp_extract({url}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)"
    query_raw = f"regexp_extract({url}, '[?]([^#]*)', 1)"
    not_track = " AND ".join(f"NOT ({p})" for p in _TRACK_PREDICATES)
    kept = (
        f"{d['filter']}({d['split']}({query_raw}, '&'), "
        f"x -> x <> '' AND {not_track})"
    )
    raw_n = f"{d['filter']}({d['split']}({query_raw}, '&'), x -> x <> '')"
    return {
        "scheme": scheme,
        "host": host,
        "port": port,
        "path": f"CASE WHEN {path_raw} = '' THEN '/' ELSE {path_raw} END",
        "qcanon": f"{d['join']}({d['sort']}({kept}), '&')",
        "n_params_raw": f"{d['size']}({raw_n})",
        "n_params_kept": f"{d['size']}({kept})",
        "default_port": (
            f"(({scheme} = 'http' AND {port} = '80') OR "
            f"({scheme} = 'https' AND {port} = '443'))"
        ),
    }


def canonical_sql(url: str, duck: bool) -> str:
    """Canonical URL of ``url`` as one SQL expression, both dialects."""
    p = _parts_sql(url, duck)
    keep_port = f"({p['port']} <> '' AND NOT {p['default_port']})"
    return (
        f"({p['scheme']} || '://' || {p['host']}"
        f" || CASE WHEN {keep_port} THEN ':' || {p['port']} ELSE '' END"
        f" || {p['path']}"
        f" || CASE WHEN {p['qcanon']} <> '' THEN '?' || {p['qcanon']} ELSE '' END)"
    )


def registered_domain_sql(host: str) -> str:
    """Registered domain of a lowercase host (dialect-free)."""
    return (
        f"regexp_extract({host}, "
        f"'([^.]+[.]({_MULTIPART_SUFFIXES})|[^.]+[.][^.]+)$', 1)"
    )


def _crawl(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(WEB_PATH)


def with_canonical(crawl: DataFrame) -> DataFrame:
    """(url_id, url, doc_id, canonical, flag columns) — map-side only."""
    p = _parts_sql("url", duck=False)
    return crawl.select(
        "url_id",
        "url",
        "doc_id",
        "cls",
        F.expr(canonical_sql("url", duck=False)).alias("canonical"),
        F.expr(f"CAST({p['default_port']} AS INT)").alias("had_default_port"),
        F.expr("CAST(instr(url, '#') > 0 AS INT)").alias("had_fragment"),
        F.expr(
            f"CAST({p['n_params_raw']} > {p['n_params_kept']} AS INT)"
        ).alias("had_tracking"),
    )


def q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization audit: every URL's canonical form plus which
    normalization rules fired.  Pure expression work — the plan is a
    single scan-project stage (pinned in tests)."""
    return (
        with_canonical(_crawl(spark))
        .select(
            "url_id",
            "canonical",
            "had_default_port",
            "had_fragment",
            "had_tracking",
            F.expr("CAST(canonical <> url AS INT)").alias("changed"),
        )
        .orderBy("url_id")
    )


def _canon_cte(duck: bool = True) -> str:
    p = _parts_sql("url", duck)
    return f"""
canon AS (
  SELECT url_id, url, doc_id, cls,
         {canonical_sql("url", duck)} AS canonical,
         CAST({p["default_port"]} AS INT) AS had_default_port,
         CAST(instr(url, '#') > 0 AS INT) AS had_fragment,
         CAST({p["n_params_raw"]} > {p["n_params_kept"]} AS INT) AS had_tracking
  FROM '{WEB_PATH}'
)
"""


Q_URL_CANONICAL_SQL = f"""
WITH {_canon_cte()}
SELECT url_id, canonical, had_default_port, had_fragment, had_tracking,
       CAST(canonical <> url AS INT) AS changed
FROM canon ORDER BY url_id
"""


def q_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl inventory: raw URLs vs canonical pages (the dup
    mass canonicalization removes for free), registered domain via the
    public-suffix-lite rule.  One hash aggregate on host."""
    return (
        with_canonical(_crawl(spark))
        .groupBy(F.expr(_parts_sql("url", duck=False)["host"]).alias("host"))
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("canonical").alias("n_pages"),
        )
        .select(
            "host",
            F.expr(registered_domain_sql("host")).alias("reg_domain"),
            "n_urls",
            "n_pages",
            (F.col("n_urls") - F.col("n_pages")).alias("n_dup_urls"),
        )
        .orderBy(F.desc("n_urls"), "host")
    )


Q_HOST_STATS_SQL = f"""
WITH {_canon_cte()},
hs AS (
  SELECT {_parts_sql("url", duck=True)["host"]} AS host,
         count(*) AS n_urls,
         count(DISTINCT canonical) AS n_pages
  FROM canon GROUP BY 1
)
SELECT host, {registered_domain_sql("host")} AS reg_domain,
       n_urls, n_pages, n_urls - n_pages AS n_dup_urls
FROM hs ORDER BY n_urls DESC, host
"""


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical groups that actually deduped (>1 spelling): the keeper
    (min url_id — the frontier convention), how many spellings merged,
    and how many DISTINCT contents the group fetched.  n_docs = 1 on
    every row is the no-over-merge proof: no two different pages were
    unified (the fixture's lookalike negatives try)."""
    return (
        with_canonical(_crawl(spark))
        .groupBy("canonical")
        .agg(
            F.count("*").alias("n_urls"),
            F.min("url_id").alias("keep_url_id"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_urls") > 1)
        .orderBy(F.desc("n_urls"), "canonical")
    )


Q_URL_DEDUP_SQL = f"""
WITH {_canon_cte()}
SELECT canonical, count(*) AS n_urls, min(url_id) AS keep_url_id,
       count(DISTINCT doc_id) AS n_docs
FROM canon GROUP BY canonical HAVING count(*) > 1
ORDER BY n_urls DESC, canonical
"""


def q_url_dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pair precision/recall of canonical-key dedup against the
    doc_id truth, all from C(n,2) group sums (groups are per-page small;
    nothing enumerates pairs).  ``designed_loss_pairs`` recomputes the
    recall gap from the fixture's cls labels alone: per doc, a
    designed-loss row (scheme/www — at most one by construction) misses
    its n-1 siblings.  miss == designed_loss is pinned in tests — every
    lost pair is a documented conservative call, not a bug."""
        # pairs: pred within canonical, truth within doc_id, tp within both
    c = with_canonical(_crawl(spark))
    pairs = lambda n: (F.col(n) * (F.col(n) - 1) / 2).cast("long")  # noqa: E731
    pred = c.groupBy("canonical").agg(F.count("*").alias("n")).agg(
        F.sum(pairs("n")).alias("n_pred")
    )
    true = c.groupBy("doc_id").agg(F.count("*").alias("n")).agg(
        F.sum(pairs("n")).alias("n_true")
    )
    tp = c.groupBy("doc_id", "canonical").agg(F.count("*").alias("n")).agg(
        F.sum(pairs("n")).alias("n_tp")
    )
    loss = (
        c.groupBy("doc_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.expr("CAST(cls IN ('scheme', 'www') AS INT)")
            ).alias("n_loss"),
        )
        .agg(
            F.sum(
                (F.col("n_loss") * (F.col("n") - F.col("n_loss"))
                 + pairs("n_loss"))
            ).cast("long").alias("designed_loss_pairs")
        )
    )
    return (
        pred.crossJoin(true)
        .crossJoin(tp)
        .crossJoin(loss)
        .select(
            "n_pred",
            "n_true",
            "n_tp",
            # zero-guarded exactly like the SQL twin: an empty or
            # no-match crawl yields 0, never NULL/div-by-zero
            F.expr(
                "CASE WHEN n_pred > 0 THEN CAST(round(n_tp * 1e6 / n_pred)"
                " AS BIGINT) ELSE 0 END"
            ).alias("precision_e6"),
            F.expr(
                "CASE WHEN n_true > 0 THEN CAST(round(n_tp * 1e6 / n_true)"
                " AS BIGINT) ELSE 0 END"
            ).alias("recall_e6"),
            "designed_loss_pairs",
        )
    )


Q_URL_DEDUP_EVAL_SQL = f"""
WITH {_canon_cte()},
pred AS (
  SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT) AS n_pred
  FROM (SELECT count(*) AS n FROM canon GROUP BY canonical)
), truth AS (
  SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT) AS n_true
  FROM (SELECT count(*) AS n FROM canon GROUP BY doc_id)
), tp AS (
  SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT) AS n_tp
  FROM (SELECT count(*) AS n FROM canon GROUP BY doc_id, canonical)
), loss AS (
  SELECT CAST(sum(n_loss * (n - n_loss) + n_loss * (n_loss - 1) / 2) AS BIGINT)
         AS designed_loss_pairs
  FROM (SELECT count(*) AS n,
               sum(CAST(cls IN ('scheme', 'www') AS INT)) AS n_loss
        FROM canon GROUP BY doc_id)
)
SELECT n_pred, n_true, n_tp,
       CASE WHEN n_pred > 0 THEN CAST(round(n_tp * 1e6 / n_pred) AS BIGINT) ELSE 0 END AS precision_e6,
       CASE WHEN n_true > 0 THEN CAST(round(n_tp * 1e6 / n_true) AS BIGINT) ELSE 0 END AS recall_e6,
       designed_loss_pairs
FROM pred, truth, tp, loss
"""


def q_url_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-parameter key inventory AFTER tracking strip: per key, how
    many URLs carry it and how many distinct values it takes — the
    frontier-design audit separating state-bearing params (id, page)
    from noise.  Explode of the kept-param array, one hash aggregate."""
    p = _parts_sql("url", duck=False)
    kept = p["qcanon"]
    return (
        _crawl(spark)
        .select(
            "url_id",
            F.explode(
                F.expr(f"filter(split({kept}, '&'), x -> x <> '')")
            ).alias("kv"),
        )
        .select(
            "url_id",
            F.expr("split_part(kv, '=', 1)").alias("param_key"),
            F.expr("split_part(kv, '=', 2)").alias("param_val"),
        )
        .groupBy("param_key")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("param_val").alias("n_values"),
        )
        .orderBy(F.desc("n_urls"), "param_key")
    )


def _q_url_params_sql() -> str:
    kept = _parts_sql("url", duck=True)["qcanon"]
    return f"""
WITH exploded AS (
  SELECT url_id, unnest(list_filter(str_split({kept}, '&'), x -> x <> '')) AS kv
  FROM '{WEB_PATH}'
)
SELECT split_part(kv, '=', 1) AS param_key,
       count(*) AS n_urls,
       count(DISTINCT split_part(kv, '=', 2)) AS n_values
FROM exploded GROUP BY param_key
ORDER BY n_urls DESC, param_key
"""


# --- domain blocklist filtering (r7) -------------------------------------------
#
# Crawl pipelines drop entire domains (spam/adult/malware lists) BEFORE
# any content processing; the standard rule is registrable-suffix match:
# a host is blocked if it equals a rule or ends with "." + rule, first
# matching rule wins.  Pure expression work (one CASE chain per host —
# LIKE has identical semantics in Spark SQL and DuckDB, and the rules
# contain no wildcards), evaluated once per DISTINCT host after the
# per-host aggregate, so at crawl scale the CASE runs on the KB-sized
# host inventory, not per URL.

BLOCKLIST = ("acme.com", "example.co.uk", "beta.net", "spam.example")


def _block_rule_sql(host: str) -> str:
    whens = " ".join(
        f"WHEN {host} = '{r}' OR {host} LIKE '%.{r}' THEN '{r}'"
        for r in BLOCKLIST
    )
    return f"(CASE {whens} ELSE '' END)"


def q_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host blocklist verdicts: (host, n_urls, matched_rule, blocked)
    — matched_rule is '' for allowed hosts; subdomains of a blocked
    registrable domain are blocked with it (suffix rule)."""
    c = _crawl(spark)
    host = _parts_sql("url", duck=False)["host"]
    g = c.groupBy(F.expr(host).alias("host")).agg(
        F.count("*").cast("long").alias("n_urls")
    )
    rule = F.expr(_block_rule_sql("host"))
    return g.select(
        "host",
        "n_urls",
        rule.alias("matched_rule"),
        (rule != "").cast("long").alias("blocked"),
    ).orderBy("host")


Q_URL_BLOCKLIST_SQL = f"""
WITH hs AS (
  SELECT {_parts_sql("url", duck=True)["host"]} AS host, count(*) AS n_urls
  FROM '{WEB_PATH}' GROUP BY 1
)
SELECT host, CAST(n_urls AS BIGINT) AS n_urls,
       {_block_rule_sql("host")} AS matched_rule,
       CAST({_block_rule_sql("host")} <> '' AS BIGINT) AS blocked
FROM hs ORDER BY host
"""


QUERIES = {
    "q_url_canonical": q_url_canonical,
    "q_host_stats": q_host_stats,
    "q_url_dedup": q_url_dedup,
    "q_url_dedup_eval": q_url_dedup_eval,
    "q_url_params": q_url_params,
    "q_url_blocklist": q_url_blocklist,
}

ORACLES = {
    "q_url_canonical": Q_URL_CANONICAL_SQL,
    "q_host_stats": Q_HOST_STATS_SQL,
    "q_url_dedup": Q_URL_DEDUP_SQL,
    "q_url_dedup_eval": Q_URL_DEDUP_EVAL_SQL,
    "q_url_params": _q_url_params_sql(),
    "q_url_blocklist": Q_URL_BLOCKLIST_SQL,
}
