"""Build the shipped semi-structured JSON fixture (fixtures/json_events.parquet).

Raw API/event feeds arrive as JSON text whose schema DRIFTS across
producer versions — the ingestion reality every 100 TB pipeline's first
stage absorbs.  The synthetic tables carry no JSON payloads, so this
fixture ships a deterministic event log with planted, countable drift
classes (all keyed off rec_id, so the truth is arithmetic, not stored):

  * v2 producer (rec_id % 3 == 0)  — adds a "session" key;
  * amount-as-string (% 11 == 0)   — "12.50" instead of 12.5 (the classic
    stringly-typed number drift);
  * amount json-null (% 13 == 0)   — explicit null, distinct from missing;
  * amount integer (% 29 == 0)     — whole-dollar ints vs decimal floats;
  * user.plan missing (% 17 == 0)  — dropped optional field;
  * items missing (% 19 == 0) / items [] (% 23 == 0) — absent vs empty
    array (flatten must treat both as zero lines);
  * malformed (% 97 == 0)          — truncated payload (producer crash);
    both engines must drop these via validity checks, not errors.

Precedence when classes collide on one rec_id: malformed wins; the other
classes compose (a v2 row can also have a string amount).

All values are hash-derived from rec_id (md5) — rebuilding the fixture
is byte-stable, and every test/oracle expectation can be recomputed from
first principles.

Output (committed): fixtures/json_events.parquet
  (rec_id BIGINT, payload VARCHAR)
Rerun only if the corpus shape changes: python tools/make_json.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import pyarrow as pa
import pyarrow.parquet as pq

FIXDIR = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "fixtures"))
OUT = os.path.join(FIXDIR, "json_events.parquet")

N = 720
EVENTS = ("view", "cart", "purchase", "refund")
PLANS = ("free", "pro", "team")
SKUS = tuple(f"SKU-{i:02d}" for i in range(1, 13))


def _h(rec_id: int, field: str) -> int:
    d = hashlib.md5(f"{rec_id}|{field}".encode()).hexdigest()
    return int(d[:12], 16)


def payload_for(rec_id: int) -> str:
    ev = EVENTS[_h(rec_id, "event") % len(EVENTS)]
    ts = f"2024-03-{1 + _h(rec_id, 'day') % 28:02d}T{_h(rec_id, 'hh') % 24:02d}:00:00"
    user = {"id": 1 + _h(rec_id, "uid") % 200}
    if rec_id % 17 != 0:
        user["plan"] = PLANS[_h(rec_id, "plan") % len(PLANS)]
    doc = {"event": ev, "ts": ts, "user": user}
    # amount: float | int | string | json-null (null wins over the others
    # so each class count is exact; string beats int beats float)
    cents = 100 + _h(rec_id, "amount") % 99901  # 1.00 .. 1000.00
    if rec_id % 13 == 0:
        doc["amount"] = None
    elif rec_id % 11 == 0:
        doc["amount"] = f"{cents // 100}.{cents % 100:02d}"
    elif rec_id % 29 == 0:
        doc["amount"] = cents // 100 * 100 // 100  # whole dollars, int
    else:
        doc["amount"] = cents / 100.0
    if rec_id % 19 == 0:
        pass  # items missing
    elif rec_id % 23 == 0:
        doc["items"] = []
    else:
        k = 1 + _h(rec_id, "nitems") % 4
        doc["items"] = [
            {
                "sku": SKUS[_h(rec_id, f"sku{j}") % len(SKUS)],
                "qty": 1 + _h(rec_id, f"qty{j}") % 5,
                "price_cents": 100 + _h(rec_id, f"pc{j}") % 9901,
            }
            for j in range(k)
        ]
    if rec_id % 3 == 0:
        doc["session"] = f"s{_h(rec_id, 'sess') % 10**8:08d}"
    text = json.dumps(doc, separators=(",", ":"))
    if rec_id % 97 == 0:
        return text[: max(3, len(text) // 2)]  # truncated → malformed
    return text


def build():
    rec_ids = list(range(1, N + 1))
    payloads = [payload_for(r) for r in rec_ids]

    # ---- planted-truth invariants (builder self-audit) ----
    n_bad = sum(1 for r in rec_ids if r % 97 == 0)
    assert n_bad == N // 97, n_bad
    for r, p in zip(rec_ids, payloads):
        if r % 97 == 0:
            try:
                json.loads(p)
                raise AssertionError(f"malformed row {r} parses")
            except json.JSONDecodeError:
                pass
        else:
            d = json.loads(p)
            assert ("session" in d) == (r % 3 == 0)
            assert ("plan" in d["user"]) == (r % 17 != 0)
            if r % 13 == 0:
                assert d["amount"] is None
            elif r % 11 == 0:
                assert isinstance(d["amount"], str)
            elif r % 29 == 0:
                assert isinstance(d["amount"], int)
            else:
                assert isinstance(d["amount"], float)
            if r % 19 == 0:
                assert "items" not in d
            elif r % 23 == 0:
                assert d["items"] == []
            else:
                assert 1 <= len(d["items"]) <= 4
                assert all(
                    isinstance(i["qty"], int) and isinstance(i["price_cents"], int)
                    for i in d["items"]
                )
    # every drift class is non-empty
    for m in (3, 11, 13, 17, 19, 23, 29, 97):
        assert any(r % m == 0 for r in rec_ids), m

    t = pa.table(
        {"rec_id": pa.array(rec_ids, pa.int64()), "payload": pa.array(payloads)}
    )
    os.makedirs(FIXDIR, exist_ok=True)
    pq.write_table(t, OUT)
    print(f"wrote {OUT}: {N} rows ({n_bad} malformed)")


if __name__ == "__main__":
    build()
