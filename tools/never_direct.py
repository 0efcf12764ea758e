"""Regenerate the never-direct / least-recently-direct ledger (r8 verdict #8).

The rotation policy needs two computed lists, and hand-maintaining them in
GAPS.md drifted (the r8 verdict counted 20 by hand; the artifacts say 23):

* never-direct: oracle-backed registry names that appear in NO
  CORRECTNESS_r*.json artifact — they have never had a driver row.
* least-recently-direct: every other oracle-backed name, sorted by the most
  recent round it had a driver row (ascending), then registry order.

Rows-only (no-oracle) names are excluded — they can't be hash-checked, so
rotation slots are wasted on them.  DIGEST/STANDING names are reported but
flagged; they occupy permanent window slots and never rotate.

Usage:  python tools/never_direct.py [--max-round N]
  --max-round N   ignore artifacts from rounds > N (the rotation pin's
                  "strictly before ROTATION_ROUND" view; default: all).
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def last_direct_round(repo=".", max_round=None):
    """name -> most recent round with a driver CORRECTNESS row (any status)."""
    last = {}
    for p in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        try:
            rnd = int(os.path.basename(p).split("_r")[1].split(".")[0])
        except (IndexError, ValueError):
            continue
        if max_round is not None and rnd > max_round:
            continue
        for nm in json.load(open(p)):
            last[nm] = max(last.get(nm, 0), rnd)
    return last


def ledger(repo=".", max_round=None):
    from changegen_spark import queries as Q

    oracle_names = set(Q.all_oracles())
    registry = list(Q.all_queries())
    last = last_direct_round(repo, max_round)
    permanent = set(Q.DIGEST_NAMES) | set(Q.STANDING)
    rotatable = [
        nm for nm in registry if nm in oracle_names and nm not in permanent
    ]
    never = [nm for nm in rotatable if nm not in last]
    lru = sorted(
        (nm for nm in rotatable if nm in last),
        key=lambda nm: (last[nm], registry.index(nm)),
    )
    return {"never_direct": never, "lru": lru, "last": last}


def propose(led, slots, min_age_rounds, next_round):
    """A mechanical next-rotation proposal: never-direct names first
    (registry order), then the LRU list, skipping any name whose last
    driver row is younger than ``min_age_rounds`` (the post-exhaustion
    policy pinned in tests/test_plans.py).  Queries NEW this round
    should be prepended by hand — they are never-direct by definition
    but only exist after this listing runs."""
    picked = list(led["never_direct"])
    for nm in led["lru"]:
        if len(picked) >= slots:
            break
        if led["last"][nm] <= next_round - min_age_rounds:
            picked.append(nm)
    return picked[:slots]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-round", type=int, default=None)
    ap.add_argument(
        "--propose",
        type=int,
        metavar="NEXT_ROUND",
        help="print a mechanical ROTATED_IN proposal for round N "
        "(never-direct first, then LRU aged >= 2 rounds)",
    )
    ap.add_argument("--slots", type=int, default=40)
    args = ap.parse_args()
    led = ledger(max_round=args.max_round)
    if args.propose is not None:
        for nm in propose(led, args.slots, 2, args.propose):
            print(f'    "{nm}",')
        return
    print(f"never-direct ({len(led['never_direct'])}):")
    for nm in led["never_direct"]:
        print(f"  {nm}")
    print("least-recently-direct (oldest first):")
    for nm in led["lru"][:40]:
        print(f"  r{led['last'][nm]:02d} {nm}")


if __name__ == "__main__":
    main()
