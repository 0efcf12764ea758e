"""Build the ambiguity-resolution ER fixture (fixtures/er_ambig.parquet).

The shipped er_people fixture plants zero exact best/runner-up ties, so
margin abstention never fires on it and the re-resolution operator
(queries/er/resolve.py) would have nothing to do.  This fixture plants
the tie patterns the abstain → re-resolve loop exists for, each with a
KNOWN terminal disposition after one batch:

* group R (resolvable tie): arrival ties two base entities at equal
  Levenshtein; a CONFIDENT arrival in the same batch merges into one of
  them and flips its survivor name (mode tie → lexicographic min), so
  the re-probe against the updated golden table breaks the tie;
* group S (stable tie): arrival ties two base entities and nothing in
  the batch touches either — the re-probe sees the identical candidate
  set and the arrival stays parked (still_ambiguous);
* group N (drift-to-new): arrival ties two base entities, and confident
  arrivals flip BOTH survivor names out of Levenshtein/key reach — the
  re-probe finds zero candidates and the arrival becomes a NEW entity;
* group B (resolve via batch-created entity): the tie breaks because a
  −1 arrival (new singleton entity, same batch) plus a survivor flip
  leave exactly one strictly-closest candidate — the re-probe target
  set is the WHOLE updated golden table, new entities included;
* group T (toward-resolve, r13): the tie breaks because the WINNER's
  survivor name moved strictly CLOSER to the parked arrival (its entity
  absorbed a confirming variant) — the one tie-break the default drain
  policy accepts as informative.  Groups R and B break their ties by
  the LOSER drifting away (the winner's lev stays at the parked lev),
  which the r13 'toward' policy rejects as lexicographic noise: at the
  1M bench rung such drift resolutions measured ~50% wrong
  (resolved_correct 10/21, VERDICT r12), worse than the abstention
  they replace.

Every planted relation (tie levs, confident gaps, phonetic-key
equality, survivor flips) is ASSERTED at build time against the same
SQL snippets the queries execute (DuckDB levenshtein + the dialect-
parameterized phonetic key), so a fixture edit that silently breaks a
group fails here, not in a green-looking query.

Layout convention matches er_people: base rec_id < 400 (each its own
entity), arrivals >= 400; ground truth travels as entity_id (-1 for
arrivals that are genuinely new people).

Output (committed): fixtures/er_ambig.parquet
  (rec_id BIGINT, name VARCHAR, city VARCHAR, entity_id BIGINT)
Rerun only if the plant changes: python tools/make_er_ambig.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from changegen_spark.queries.er.blocking import LEV_MAX, block_key_sql
from changegen_spark.queries.er.sn import suffix_key_sql

FIXDIR = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "fixtures"))
OUT = os.path.join(FIXDIR, "er_ambig.parquet")

# --- planted rows -----------------------------------------------------------
# (rec_id, name, city, entity_id)

BASE = [
    # group R: resolvable tie (city avalon)
    (100, "dana meier", "avalon", 100),
    (101, "dana meyer", "avalon", 101),
    # group S: stable tie (city belmore)
    (102, "rene kraus", "belmore", 102),
    (103, "rene krauss", "belmore", 103),
    # group N: drift-to-new (city corwin)
    (104, "paul brand", "corwin", 104),
    (105, "paul brandt", "corwin", 105),
    # group B: resolve via batch-created entity (city delmont)
    (106, "gina moore", "delmont", 106),
    (107, "gina mooro", "delmont", 107),
    # group T: toward-resolve (city tolland, r13) — the tie breaks
    # because entity 130 absorbs a confirming variant that moves its
    # survivor name STRICTLY CLOSER to the parked arrival
    (130, "lena hofman", "tolland", 130),
    (131, "lena hoffmann", "tolland", 131),
    # group C: a CHAIN under the key-blocking pair rule (same phonetic
    # block, lev(300,301) = lev(301,302) = 2, lev(300,302) = 4) — 301 is
    # a BRIDGE record whose retraction must SPLIT the cluster
    # (queries/er/retract.py; the q_er_chain_audit hazard made load-
    # bearing on purpose)
    (300, "mara weber", "fairhope", 300),
    (301, "marra webber", "fairhope", 300),
    (302, "marrah webbber", "fairhope", 300),
]

ARRIVALS = [
    # group R
    (400, "dana maier", "avalon", 100),  # confident -> 100; flips survivor
    (401, "dana meuer", "avalon", 101),  # tie 100/101 -> resolves to 101
    # group S
    (402, "rene krausz", "belmore", 103),  # tie 102/103 -> stays parked
    # group N
    (403, "paul barand", "corwin", 104),  # confident -> 104; flips survivor
    (404, "paul barandt", "corwin", 105),  # confident -> 105; flips survivor
    (405, "paul brandeo", "corwin", 105),  # tie 104/105 -> re-probe dry -> new
    # group B
    (406, "gina mmoore", "delmont", 106),  # confident -> 106; flips survivor
    (407, "gina moora", "delmont", 107),  # tie 106/107 -> resolves to 107
    (408, "gina maura", "delmont", -1),  # no refine survivor -> new singleton
    # boring confident arrival whose name equals its entity's (survivor
    # unchanged): the re-resolution path must not touch it
    (409, "omar veith", "ellsworth", 108),
    # genuinely new person, far from every BASE record — but arriving
    # TWICE in the batch (410/411 are 1-edit variants of each other):
    # naive new-entity insert would create two entities for one person;
    # the −1-pool consolidation operator (queries/er/resolve.py
    # new_entity_merge) must merge them
    (410, "tove lindqvist", "ellsworth", -1),
    (411, "tove lindquist", "ellsworth", -1),
    # group T
    (412, "lena hofmaan", "tolland", 130),  # confident -> 130; flips survivor
    (413, "lena hofmaann", "tolland", 130),  # tie 130/131; winner 130 MOVES
    # TOWARD 413 (surv lev 1 < parked lev 2) -> resolves under 'toward'
]

# filler base entities: unique names, no planted relations — golden-table
# body so the re-probe join runs against more than the planted handful
_FILL_FIRST = (
    "omar yuki marta ivan chloe rasmus petra diego anouk soren "
    "leila bruno freya tomas vera hugo alma nestor ruth caleb"
).split()
_FILL_LAST = (
    "veith okada szabo petrov durand lindgren novak ferreira devries holm "
    "amani costa nylund cerny weiss fontaine berg rios stamm okafor"
).split()
_FILL_CITIES = ("ellsworth fenwick galena harlow delmont").split()


def _rows():
    rows = list(BASE)
    for i in range(20):
        rows.append(
            (
                108 + i,
                f"{_FILL_FIRST[i]} {_FILL_LAST[i]}",
                _FILL_CITIES[i % len(_FILL_CITIES)],
                108 + i,
            )
        )
    rows.extend(ARRIVALS)
    return sorted(rows)


# --- build-time verification of every planted relation -----------------------


def _verify(rows) -> None:
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p (rec_id BIGINT, name VARCHAR, city VARCHAR, "
        "entity_id BIGINT)"
    )
    con.executemany("INSERT INTO p VALUES (?, ?, ?, ?)", rows)

    def lev(a: int, b: int) -> int:
        return con.execute(
            "SELECT levenshtein(lower(x.name), lower(y.name)) FROM p x, p y "
            "WHERE x.rec_id = ? AND y.rec_id = ?",
            [a, b],
        ).fetchone()[0]

    def keys(rid: int):
        return con.execute(
            f"SELECT {block_key_sql(duck=True)}, {suffix_key_sql(duck=True)} "
            "FROM p WHERE rec_id = ?",
            [rid],
        ).fetchone()

    def assert_tie(a, e1, e2):
        l1, l2 = lev(a, e1), lev(a, e2)
        assert l1 == l2 <= LEV_MAX, (a, e1, e2, l1, l2)
        # the tie must actually be REACHABLE: share a candidate key
        ka, k1, k2 = keys(a), keys(e1), keys(e2)
        assert ka[0] == k1[0] == k2[0], (a, "k1 block drift", ka, k1, k2)

    def assert_confident(a, e, others):
        la = lev(a, e)
        assert la <= LEV_MAX, (a, e, la)
        assert keys(a)[0] == keys(e)[0], (a, e, "k1 block drift")
        for o in others:
            assert lev(a, o) > la, (a, "not strictly best vs", o)

    def name(rid: int) -> str:
        return con.execute(
            "SELECT lower(name) FROM p WHERE rec_id = ?", [rid]
        ).fetchone()[0]

    def slev(a: int, nm: str) -> int:
        return con.execute(
            "SELECT levenshtein(lower(name), ?) FROM p WHERE rec_id = ?",
            [nm, a],
        ).fetchone()[0]

    # group R: 400 confident into 100 (vs 101); survivor flips; 401 ties
    # then resolves to 101 strictly
    assert_confident(400, 100, [101])
    assert_tie(401, 100, 101)
    surv100 = min(name(100), name(400))
    assert surv100 == name(400), "group R survivor must flip to the arrival"
    assert slev(401, surv100) > lev(401, 101), "group R tie must break to 101"

    # group S: 402 ties 102/103 and nothing else in belmore arrives
    assert_tie(402, 102, 103)
    assert not [
        r for r in ARRIVALS if r[2] == "belmore" and r[0] != 402
    ], "group S city must stay untouched"

    # group N: both survivors flip, then 405 is out of reach of both
    assert_confident(403, 104, [105])
    assert_confident(404, 105, [104])
    assert_tie(405, 104, 105)
    surv104 = min(name(104), name(403))
    surv105 = min(name(105), name(404))
    assert (surv104, surv105) == (name(403), name(404)), "group N flips"
    assert slev(405, surv104) > LEV_MAX and slev(405, surv105) > LEV_MAX, (
        "group N re-probe must find no refine survivor"
    )

    # group B: 406 confident into 106 flips survivor; 408 has no refine
    # survivor at all (new singleton); 407 ties 106/107 then resolves to
    # 107 strictly, with 408's new entity in the candidate mix but behind
    assert_confident(406, 106, [107])
    assert_tie(407, 106, 107)
    for e in (106, 107):
        assert lev(408, e) > LEV_MAX, (408, e, "must be -1 in pass 1")
    assert keys(408)[0] == keys(106)[0], "408 must share the block key"
    surv106 = min(name(106), name(406))
    assert surv106 == name(406), "group B survivor must flip"
    l_to_107 = lev(407, 107)
    assert slev(407, surv106) > l_to_107, "tie must break"
    assert lev(407, 408) > l_to_107, "the new singleton must rank behind"
    assert lev(407, 408) <= LEV_MAX, "but still be a re-probe candidate"

    # group T: 412 confident into 130 flips the survivor TOWARD 413 —
    # the re-probe winner's lev drops strictly below the parked lev
    # while the runner-up (131, untouched) stays at the parked lev, so
    # gap >= 1 AND the 'toward' evidence rule both hold.  Also pin the
    # CONTRAST: groups R and B break their ties with the winner's lev
    # UNCHANGED (loser drift only), the case 'toward' must reject.
    assert_confident(412, 130, [131])
    assert_tie(413, 130, 131)
    surv130 = min(name(130), name(412))
    assert surv130 == name(412), "group T survivor must flip to the arrival"
    park_t = lev(413, 130)
    assert slev(413, surv130) < park_t, "group T winner must move TOWARD 413"
    assert slev(413, surv130) < lev(413, 131), "and be strictly best"
    assert keys(413)[0] == keys(412)[0], "413 must reach the flipped survivor"
    # contrast pins: R and B winners keep their parked lev exactly
    assert lev(401, 101) == lev(401, 100), "group R winner lev unchanged"
    assert lev(407, 107) == lev(407, 106), "group B winner lev unchanged"
    # tolland is isolated under the retract pair rule (block key + lev,
    # no city refine): no pair may cross between tolland and elsewhere
    stray_t = con.execute(
        f"SELECT count(*) FROM p x JOIN p y ON x.rec_id < y.rec_id "
        f"AND {block_key_sql(duck=True).replace('name', 'x.name')} = "
        f"{block_key_sql(duck=True).replace('name', 'y.name')} "
        f"AND levenshtein(lower(x.name), lower(y.name)) <= {LEV_MAX} "
        "WHERE (x.city = 'tolland') != (y.city = 'tolland')"
    ).fetchone()[0]
    assert stray_t == 0, "no pair may cross into the toward group"

    # group C: the chain must hold under the key-blocking pair rule —
    # one shared phonetic block, adjacent levs within the refine
    # threshold, end-to-end lev beyond it (301 is a true bridge), and
    # NO cross-group pair reaching into fairhope
    assert keys(300)[0] == keys(301)[0] == keys(302)[0]
    assert lev(300, 301) <= LEV_MAX and lev(301, 302) <= LEV_MAX
    assert lev(300, 302) > LEV_MAX, "chain must not short-circuit"
    stray = con.execute(
        f"SELECT count(*) FROM p x JOIN p y ON x.rec_id < y.rec_id "
        f"AND {block_key_sql(duck=True).replace('name', 'x.name')} = "
        f"{block_key_sql(duck=True).replace('name', 'y.name')} "
        f"AND levenshtein(lower(x.name), lower(y.name)) <= {LEV_MAX} "
        "WHERE (x.city = 'fairhope') != (y.city = 'fairhope')"
    ).fetchone()[0]
    assert stray == 0, "no pair may cross into the chain group"

    # boring rows: 409 is the exact name of filler entity 108 (survivor
    # unchanged by the merge); 410/411 must match no BASE record but
    # must match EACH OTHER (the intra-batch new-entity duplicate)
    assert name(409) == name(108)
    for rid in (410, 411):
        worst = con.execute(
            "SELECT min(levenshtein(lower(x.name), lower(y.name))) "
            "FROM p x, p y WHERE x.rec_id = ? AND y.rec_id < 400",
            [rid],
        ).fetchone()[0]
        assert worst > LEV_MAX, (rid, "must be a genuine new person", worst)
    assert lev(410, 411) <= LEV_MAX and keys(410)[0] == keys(411)[0], (
        "the duplicate new arrivals must be mutually reachable"
    )
    con.close()


def main() -> None:
    rows = _rows()
    _verify(rows)
    tbl = pa.table(
        {
            "rec_id": pa.array([r[0] for r in rows], pa.int64()),
            "name": pa.array([r[1] for r in rows], pa.string()),
            "city": pa.array([r[2] for r in rows], pa.string()),
            "entity_id": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    os.makedirs(FIXDIR, exist_ok=True)
    pq.write_table(tbl, OUT, compression="snappy")
    print(f"wrote {OUT}: {tbl.num_rows} rows "
          f"({len(BASE) + 20} base, {len(ARRIVALS)} arrivals)")


if __name__ == "__main__":
    main()
