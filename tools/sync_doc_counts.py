"""Sync the registry-count sentences in README/GAPS/COVERAGE from the live
registry — run after adding queries so the docs can't drift:

    python tools/sync_doc_counts.py
"""

import re
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    from changegen_spark.queries import all_oracles, all_queries, covered_by_digest

    nq, no, nd = len(all_queries()), len(all_oracles()), len(covered_by_digest())
    subs = [
        ("README.md", r"\d+ queries, \d+ with DuckDB", f"{nq} queries, {no} with DuckDB"),
        ("GAPS.md", r"Registry now \d+ queries / \d+ oracle-backed",
         f"Registry now {nq} queries / {no} oracle-backed"),
        ("GAPS.md", r"transitively re-verifies \d+ out-of-window entries",
         f"transitively re-verifies {nd} out-of-window entries"),
        ("COVERAGE.md", r"digest of all \d+ out-of-window oracle queries",
         f"digest of all {nd} out-of-window oracle queries"),
    ]
    for path, pat, rep in subs:
        s = open(path).read()
        s2 = re.sub(pat, rep, s)
        if s2 != s:
            open(path, "w").write(s2)
            print(f"{path}: -> {rep}")
    print(f"registry: {nq} queries, {no} oracles, {nd} digest-covered")


if __name__ == "__main__":
    main()
