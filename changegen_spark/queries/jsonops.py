"""Semi-structured JSON ingestion (r6 new family).

Raw event feeds land as JSON text with drifting producer schemas — the
first stage of any web/API-scale pipeline is typed extraction that
survives the drift instead of erroring on it.  Over the shipped fixture
(fixtures/json_events.parquet, built by tools/make_json.py with planted
arithmetic-truth drift classes):

* ``q_json_valid``          — validity triage: total / parseable /
  malformed counts (truncated producer writes must be dropped by a
  validity check, never by a crashed job);
* ``q_json_extract``        — typed scalar extraction + aggregation:
  per event type, row counts, amount coverage and exact cents sum
  (amounts arrive as float, int, string, json-null AND missing — the
  extraction path normalizes all five), pro-plan counts, v2-session
  counts;
* ``q_json_flatten``        — nested-array explosion: order items to
  per-SKU line counts / quantities / exact revenue cents (missing
  array ≡ empty array ≡ zero lines);
* ``q_json_schema_profile`` — per-(key, type) histogram across the
  corpus: the drift detector.  Spark side runs on the native VARIANT
  type (parse_json once → try_variant_get / is_variant_null /
  schema_of_variant per key); the oracle classifies with DuckDB's
  json_type.  Both map engine-specific type names onto one canonical
  vocabulary {missing, null, boolean, num_int, num_float, string,
  array, object} — including the missing-vs-json-null distinction
  both engines are careful about and row-oriented code usually drops.

Scalar extraction is dialect-bridged text (get_json_object vs
json_extract_string — the er.py pattern); the classification CASE is
engine-specific by necessity (VARIANT schema strings vs json_type
names) but lands on the same vocabulary, pinned by the planted class
counts in tests.

100 TB shape: validity + extraction are map-side scan work (JVM
expression eval, no UDF); Catalyst CSE parses each payload's VARIANT
once and reuses it across the per-key probes.  The flatten is
explode → one hash shuffle on sku; the profile shuffles (key, type)
pairs — KB of distinct keys regardless of corpus size.  Nothing here
collects, sorts globally, or round-trips through Python.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FIXDIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "fixtures")
)
JSON_PATH = os.path.join(FIXDIR, "json_events.parquet")

# keys profiled by q_json_schema_profile ('user.plan' exercises a nested
# path through both engines' path syntax)
PROFILE_KEYS = ("event", "ts", "user", "user.plan", "amount", "items", "session")

ITEMS_SPARK_SCHEMA = "array<struct<sku:string,qty:bigint,price_cents:bigint>>"
ITEMS_DUCK_SCHEMA = '[{"sku":"VARCHAR","qty":"BIGINT","price_cents":"BIGINT"}]'


def _events(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(JSON_PATH)


def _jx(path: str, duck: bool) -> str:
    """Scalar JSON extraction as text: NULL for missing AND for json
    null; numbers/strings come back as their literal text on BOTH
    engines (no quotes on strings, no type coercion)."""
    fn = "json_extract_string" if duck else "get_json_object"
    return f"{fn}(payload, '$.{path}')"


def _valid(duck: bool) -> str:
    return (
        "json_valid(payload)" if duck else "try_parse_json(payload) IS NOT NULL"
    )


# amount arrives as 12.5 / 12 / "12.50" / null / missing — one TRY_CAST
# normalizes the first three, nulls the rest; exact cents after round
def _cents(duck: bool) -> str:
    return (
        f"CAST(round(TRY_CAST({_jx('amount', duck)} AS DOUBLE) * 100) AS BIGINT)"
    )


def q_json_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus triage: how much of the feed parses at all."""
    ev = _events(spark)
    return ev.selectExpr(
        "CAST(count(*) AS BIGINT) AS n_total",
        f"CAST(sum(CASE WHEN {_valid(False)} THEN 1 ELSE 0 END) AS BIGINT) AS n_valid",
        f"CAST(sum(CASE WHEN {_valid(False)} THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid",
    )


Q_JSON_VALID_SQL = f"""
SELECT CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN {_valid(True)} THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
       CAST(sum(CASE WHEN {_valid(True)} THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid
FROM '{JSON_PATH}'
"""


def _extract_aggs(duck: bool) -> list[str]:
    return [
        "CAST(count(*) AS BIGINT) AS n",
        f"CAST(sum(CASE WHEN TRY_CAST({_jx('amount', duck)} AS DOUBLE) IS NOT NULL"
        " THEN 1 ELSE 0 END) AS BIGINT) AS n_amount",
        f"CAST(sum(coalesce({_cents(duck)}, 0)) AS BIGINT) AS sum_amount_cents",
        f"CAST(sum(CASE WHEN {_jx('user.plan', duck)} = 'pro' THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_pro",
        f"CAST(sum(CASE WHEN {_jx('session', duck)} IS NOT NULL THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_session",
    ]


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed scalar extraction under drift, aggregated per event type."""
    ev = _events(spark).filter(F.expr(_valid(False)))
    return (
        ev.groupBy(F.expr(_jx("event", False)).alias("event"))
        .agg(*[F.expr(e) for e in _extract_aggs(False)])
        .orderBy("event")
    )


Q_JSON_EXTRACT_SQL = f"""
SELECT {_jx('event', True)} AS event, {', '.join(_extract_aggs(True))}
FROM '{JSON_PATH}'
WHERE {_valid(True)}
GROUP BY 1 ORDER BY event
"""


def q_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested order items → per-SKU revenue.  Missing and empty item
    arrays both contribute zero lines (explode drops NULL/empty)."""
    ev = _events(spark).filter(F.expr(_valid(False)))
    items = ev.select(
        F.explode(
            F.from_json(F.expr(_jx("items", False)), ITEMS_SPARK_SCHEMA)
        ).alias("it")
    )
    return (
        items.groupBy(F.col("it.sku").alias("sku"))
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum("it.qty").cast("long").alias("total_qty"),
            F.sum(F.col("it.qty") * F.col("it.price_cents"))
            .cast("long")
            .alias("revenue_cents"),
        )
        .orderBy("sku")
    )


Q_JSON_FLATTEN_SQL = f"""
WITH flat AS (
  -- the CASE guard keeps json_extract off malformed payloads even if the
  -- optimizer evaluates the lateral before the WHERE (observed in DuckDB)
  SELECT u.sku, u.qty, u.price_cents
  FROM '{JSON_PATH}' AS json_events,
       UNNEST(json_transform(
         CASE WHEN {_valid(True)} THEN json_extract(payload, '$.items') END,
         '{ITEMS_DUCK_SCHEMA}')) AS t(u)
  WHERE {_valid(True)}
)
SELECT sku, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(qty) AS BIGINT) AS total_qty,
       CAST(sum(qty * price_cents) AS BIGINT) AS revenue_cents
FROM flat GROUP BY sku ORDER BY sku
"""


# ---- schema profile: engine-specific classifiers, one shared vocabulary

def _spark_jtype(key: str) -> str:
    vg = f"try_variant_get(v, '$.{key}')"
    base = f"regexp_extract(schema_of_variant({vg}), '^[A-Z]+', 0)"
    return f"""
CASE WHEN {vg} IS NULL THEN 'missing'
     WHEN is_variant_null({vg}) THEN 'null'
     WHEN {base} IN ('TINYINT','SMALLINT','INT','BIGINT') THEN 'num_int'
     WHEN {base} IN ('DECIMAL','DOUBLE','FLOAT') THEN 'num_float'
     WHEN {base} = 'STRING' THEN 'string'
     WHEN {base} = 'BOOLEAN' THEN 'boolean'
     WHEN {base} = 'ARRAY' THEN 'array'
     WHEN {base} = 'OBJECT' THEN 'object'
     ELSE 'other' END
"""


def q_json_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(key, type) drift histogram on the native VARIANT path."""
    ev = _events(spark).filter(F.expr(_valid(False)))
    v = ev.selectExpr("parse_json(payload) AS v")
    pairs = ", ".join(
        f"struct('{k}' AS key, ({_spark_jtype(k)}) AS jtype)"
        for k in PROFILE_KEYS
    )
    kt = v.selectExpr(f"inline(array({pairs}))")
    return (
        kt.groupBy("key", "jtype")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("key", "jtype")
    )


_DUCK_JTYPE = """
CASE WHEN jt IS NULL THEN 'missing'
     WHEN jt = 'NULL' THEN 'null'
     WHEN jt IN ('UBIGINT','BIGINT') THEN 'num_int'
     WHEN jt = 'DOUBLE' THEN 'num_float'
     WHEN jt = 'VARCHAR' THEN 'string'
     WHEN jt = 'BOOLEAN' THEN 'boolean'
     WHEN jt = 'ARRAY' THEN 'array'
     WHEN jt = 'OBJECT' THEN 'object'
     ELSE 'other' END
"""

# DuckDB quirk, empirically pinned: json_type with a DYNAMIC path column
# returns SQL NULL for json-null values (indistinguishable from missing);
# with a LITERAL path it returns 'NULL'.  The oracle therefore unrolls
# the key list into literal-path probes.
_KEYED_UNION = "\n  UNION ALL ".join(
    f"SELECT '{k}' AS key, json_type(payload, '$.{k}') AS jt"
    f" FROM '{JSON_PATH}' WHERE json_valid(payload)"
    for k in PROFILE_KEYS
)

Q_JSON_SCHEMA_PROFILE_SQL = f"""
WITH keyed AS (
  {_KEYED_UNION}
)
SELECT key, {_DUCK_JTYPE} AS jtype, CAST(count(*) AS BIGINT) AS n
FROM keyed GROUP BY key, jtype ORDER BY key, jtype
"""


QUERIES = {
    "q_json_valid": q_json_valid,
    "q_json_extract": q_json_extract,
    "q_json_flatten": q_json_flatten,
    "q_json_schema_profile": q_json_schema_profile,
}
ORACLES = {
    "q_json_valid": Q_JSON_VALID_SQL,
    "q_json_extract": Q_JSON_EXTRACT_SQL,
    "q_json_flatten": Q_JSON_FLATTEN_SQL,
    "q_json_schema_profile": Q_JSON_SCHEMA_PROFILE_SQL,
}
