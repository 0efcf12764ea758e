"""Build the shipped entity-resolution fixture (fixtures/er_people.parquet).

Record linkage needs data with PLANTED duplicate records whose ground truth
is known — the synthetic `customer` table's names are serial strings
("Customer#000000001"), useless for fuzzy matching.  This fixture ships a
deterministic people table with three planted duplicate classes:

* class A (block-preserving typos): vowel swap / doubled consonant /
  interior transposition in the LAST name — same phonetic block, full-name
  Levenshtein <= 2, so the blocking+refine rule must find them;
* class B (block-breaking typos): FIRST-letter substitution in the last
  name — Levenshtein 1 but a different phonetic block, a KNOWN recall loss
  the eval query must quantify (the honest limit of single-key blocking);
* class C (first-name typos): interior transposition in the first name —
  the block key (last-name phonetic + first initial) survives.

Ground truth travels as entity_id.  The builder records the per-class
counts in a manifest row embedded as module constants imported by
tests/test_er.py, so the expected precision/recall is pinned exactly.

Output (committed): fixtures/er_people.parquet
  (rec_id BIGINT, name VARCHAR, city VARCHAR, entity_id BIGINT)
Rerun only if the corpus shape changes: python tools/make_er.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXDIR = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "fixtures"))
OUT = os.path.join(FIXDIR, "er_people.parquet")

SEED = 20260814
N_ENTITIES = 400
N_CLASS_A = 60
N_CLASS_B = 12
N_CLASS_C = 8

FIRST = (
    "james mary robert patricia john jennifer michael linda david elizabeth "
    "william barbara richard susan joseph jessica thomas sarah charles karen "
    "christopher lisa daniel nancy matthew betty anthony sandra mark ashley "
    "donald kimberly steven emily andrew donna joshua michelle kenneth carol "
    "kevin amanda brian melissa george deborah timothy stephanie ronald rebecca "
    "edward sharon jason laura jeffrey cynthia ryan kathleen jacob amy"
).split()
LAST = (
    "smith johnson williams brown jones garcia miller davis rodriguez martinez "
    "hernandez lopez gonzalez wilson anderson thomas taylor moore jackson martin "
    "lee perez thompson white harris sanchez clark ramirez lewis robinson "
    "walker young allen king wright scott torres nguyen hill flores green "
    "adams nelson baker hall rivera campbell mitchell carter roberts gomez "
    "phillips evans turner diaz parker cruz edwards collins reyes stewart "
    "morris morales murphy cook rogers gutierrez ortiz morgan cooper peterson "
    "bailey reed kelly howard ramos kim cox ward richardson watson brooks "
    "chavez wood james bennett gray mendoza ruiz hughes price alvarez castillo "
    "sanders patel myers long ross foster jimenez"
).split()
CITIES = (
    "springfield rivertown lakeside hillcrest fairview oakdale maplewood "
    "cedarburg brookfield elmhurst ashford weston norfield kingsley dover "
    "brighton milton clayton hampton sutton"
).split()

VOWELS = "aeiou"


def _vowel_swap(rng, w: str) -> str:
    # interior vowels only: a position-0 swap would change the first
    # letter, silently breaking the block class A promises to preserve
    idxs = [i for i, ch in enumerate(w) if ch in VOWELS and i >= 1]
    if not idxs:
        return _double_consonant(rng, w)
    i = idxs[int(rng.randint(0, len(idxs)))]
    repl = VOWELS[(VOWELS.index(w[i]) + 1 + int(rng.randint(0, 4))) % 5]
    return w[:i] + repl + w[i + 1 :]


def _double_consonant(rng, w: str) -> str:
    idxs = [i for i, ch in enumerate(w[1:], 1) if ch not in VOWELS]
    if not idxs:
        return w + w[-1]
    i = idxs[int(rng.randint(0, len(idxs)))]
    return w[:i] + w[i] + w[i:]


def _interior_transpose(rng, w: str) -> str:
    if len(w) < 4:
        return _double_consonant(rng, w)
    i = 1 + int(rng.randint(0, len(w) - 2))
    if w[i] == w[i + 1]:
        i = 1 if i > 1 else i + 1
    return w[:i] + w[i + 1] + w[i] + w[i + 2 :]


def _first_letter_sub(rng, w: str) -> str:
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    c = alphabet[int(rng.randint(0, 26))]
    while c == w[0]:
        c = alphabet[int(rng.randint(0, 26))]
    return c + w[1:]


def main() -> None:
    rng = np.random.RandomState(SEED)
    # distinct (first, last) combos per entity so truth pairs are clean
    combos = set()
    entities = []
    while len(entities) < N_ENTITIES:
        f = FIRST[int(rng.randint(0, len(FIRST)))]
        ln = LAST[int(rng.randint(0, len(LAST)))]
        if (f, ln) in combos:
            continue
        combos.add((f, ln))
        entities.append((f, ln, CITIES[int(rng.randint(0, len(CITIES)))]))

    rec_id, names, cities, entity_ids = [], [], [], []
    nid = 0

    def add(name: str, city: str, eid: int) -> None:
        nonlocal nid
        rec_id.append(nid)
        names.append(name)
        cities.append(city)
        entity_ids.append(eid)
        nid += 1

    for eid, (f, ln, city) in enumerate(entities):
        add(f + " " + ln, city, eid)
    # class A: block-preserving last-name typos on entities 0..N_CLASS_A-1
    for eid in range(N_CLASS_A):
        f, ln, city = entities[eid]
        op = (_vowel_swap, _double_consonant, _interior_transpose)[eid % 3]
        add(f + " " + op(rng, ln), city, eid)
    # class B: block-breaking first-letter typo, entities 100..111
    for k in range(N_CLASS_B):
        eid = 100 + k
        f, ln, city = entities[eid]
        add(f + " " + _first_letter_sub(rng, ln), city, eid)
    # class C: first-name interior transposition, entities 200..207
    for k in range(N_CLASS_C):
        eid = 200 + k
        f, ln, city = entities[eid]
        add(_interior_transpose(rng, f) + " " + ln, city, eid)

    os.makedirs(FIXDIR, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "rec_id": pa.array(rec_id, pa.int64()),
                "name": pa.array(names, pa.string()),
                "city": pa.array(cities, pa.string()),
                "entity_id": pa.array(entity_ids, pa.int64()),
            }
        ),
        OUT,
    )
    print(f"wrote {OUT}: {len(rec_id)} records, {N_ENTITIES} entities, "
          f"dups A={N_CLASS_A} B={N_CLASS_B} C={N_CLASS_C}")


if __name__ == "__main__":
    main()
