"""Semi-structured JSON ingestion (queries/jsonops.py).

The fixture's drift classes are keyed off rec_id arithmetic
(tools/make_json.py), so every expectation below is recomputed from
first principles — modular arithmetic and plain-Python json parsing —
independent of both engines.
"""

import json

import pyarrow.parquet as pq

from changegen_spark.queries.jsonops import JSON_PATH

N = 720


def _rows():
    t = pq.read_table(JSON_PATH)
    return list(zip(t["rec_id"].to_pylist(), t["payload"].to_pylist()))


def _parsed():
    out = []
    for r, p in _rows():
        try:
            out.append((r, json.loads(p)))
        except json.JSONDecodeError:
            pass
    return out


def test_validity_triage_matches_modular_truth(spark, sf_dir):
    from changegen_spark.queries.jsonops import q_json_valid

    row = q_json_valid(spark, sf_dir).collect()[0]
    n_bad = sum(1 for r in range(1, N + 1) if r % 97 == 0)
    assert (row.n_total, row.n_valid, row.n_invalid) == (N, N - n_bad, n_bad)
    assert n_bad > 0  # the malformed class is genuinely planted


def test_extract_matches_plain_python_parse(spark, sf_dir):
    from changegen_spark.queries.jsonops import q_json_extract

    got = {r.event: r for r in q_json_extract(spark, sf_dir).collect()}
    exp = {}
    for _, d in _parsed():
        e = exp.setdefault(
            d["event"], dict(n=0, n_amount=0, cents=0, pro=0, sess=0)
        )
        e["n"] += 1
        a = d.get("amount")
        if a is not None:  # float, int, or numeric string all count
            e["n_amount"] += 1
            e["cents"] += round(float(a) * 100)
        if d["user"].get("plan") == "pro":
            e["pro"] += 1
        if "session" in d:
            e["sess"] += 1
    assert set(got) == set(exp)
    for ev, e in exp.items():
        g = got[ev]
        assert (g.n, g.n_amount, g.sum_amount_cents, g.n_pro, g.n_session) == (
            e["n"],
            e["n_amount"],
            e["cents"],
            e["pro"],
            e["sess"],
        ), ev
    # drift classes genuinely exercised: some amounts missing/null
    assert any(e["n_amount"] < e["n"] for e in exp.values())


def test_flatten_matches_plain_python_parse(spark, sf_dir):
    from changegen_spark.queries.jsonops import q_json_flatten

    got = {r.sku: r for r in q_json_flatten(spark, sf_dir).collect()}
    exp = {}
    for _, d in _parsed():
        for it in d.get("items", []):
            e = exp.setdefault(it["sku"], dict(n=0, qty=0, rev=0))
            e["n"] += 1
            e["qty"] += it["qty"]
            e["rev"] += it["qty"] * it["price_cents"]
    assert set(got) == set(exp)
    for sku, e in exp.items():
        g = got[sku]
        assert (g.n_lines, g.total_qty, g.revenue_cents) == (
            e["n"],
            e["qty"],
            e["rev"],
        ), sku


def test_schema_profile_counts_match_modular_truth(spark, sf_dir):
    """The drift detector sees exactly the planted classes — including
    the missing-vs-json-null distinction on amount."""
    from changegen_spark.queries.jsonops import q_json_schema_profile

    got = {
        (r.key, r.jtype): r.n
        for r in q_json_schema_profile(spark, sf_dir).collect()
    }
    valid = [r for r in range(1, N + 1) if r % 97 != 0]
    n_valid = len(valid)
    amount_null = sum(1 for r in valid if r % 13 == 0)
    amount_str = sum(1 for r in valid if r % 13 != 0 and r % 11 == 0)
    amount_int = sum(
        1 for r in valid if r % 13 != 0 and r % 11 != 0 and r % 29 == 0
    )
    amount_float = n_valid - amount_null - amount_str - amount_int
    assert got[("amount", "null")] == amount_null
    assert got[("amount", "string")] == amount_str
    assert got[("amount", "num_int")] == amount_int
    assert got[("amount", "num_float")] == amount_float
    assert ("amount", "missing") not in got  # null ≠ missing, both ways
    assert got[("session", "string")] == sum(1 for r in valid if r % 3 == 0)
    assert got[("session", "missing")] == sum(1 for r in valid if r % 3 != 0)
    assert got[("items", "missing")] == sum(1 for r in valid if r % 19 == 0)
    assert got[("items", "array")] == sum(1 for r in valid if r % 19 != 0)
    assert got[("user.plan", "missing")] == sum(
        1 for r in valid if r % 17 == 0
    )
    assert got[("user", "object")] == n_valid
    assert got[("event", "string")] == n_valid
    assert got[("ts", "string")] == n_valid


def test_json_paths_stay_jvm_side(spark, sf_dir):
    """The 100 TB claim: extraction, flatten, and the VARIANT profile are
    all JVM expression work — no Python UDF anywhere in the plans."""
    from changegen_spark.queries.jsonops import (
        q_json_extract,
        q_json_flatten,
        q_json_schema_profile,
    )

    for q in (q_json_extract, q_json_flatten, q_json_schema_profile):
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, q.__name__


def test_fixture_is_rebuild_stable(tmp_path):
    """tools/make_json.py is deterministic: rebuilding yields the shipped
    bytes' logical content (hash of all payloads)."""
    import hashlib
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from make_json import N as BN, payload_for

    assert BN == N
    h = hashlib.md5(
        "\n".join(payload_for(r) for r in range(1, N + 1)).encode()
    ).hexdigest()
    shipped = hashlib.md5(
        "\n".join(p for _, p in _rows()).encode()
    ).hexdigest()
    assert h == shipped
