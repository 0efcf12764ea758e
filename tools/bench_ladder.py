"""Scale-factor ladder: warm wall time of representative queries at
sf0.001 / sf0.01 / sf0.1, with the 0.01→0.1 growth factor per query.

10× the rows costing well under 10× the time at these sizes means fixed
per-stage overhead (shuffle setup, Python/JVM handoff, plan execution
bootstrap) still dominates — the marginal per-row cost the figure exposes
is what a 1000-executor run multiplies out.  Results are recorded in
SCALE.md ("Measured scaling — query families ladder").

Usage: python tools/bench_ladder.py   (one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

SFS = ["0.001", "0.01", "0.1"]
QUERIES = [
    "q01_pricing_summary",
    "q_exact_dedup",
    "q_lsh_pairs",
    "q_dup_spans",
    "q_lm_score",
    "q_winnow_pairs",
    "q_cdc_chunks",
    "q_ann_bruteforce",
    "q_sessionize",
    "q_group_topk",
]
WARM_RUNS = 3


def main() -> None:
    from changegen_spark.queries import all_queries
    from changegen_spark.session import get_spark

    spark = get_spark("changegen_spark-ladder")
    qs = all_queries()
    out: dict[str, dict[str, float]] = {}
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        for name in QUERIES:
            fn = qs[name]
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(WARM_RUNS):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            out.setdefault(name, {})[sf] = round(best, 3)
    growth = {
        n: round(t["0.1"] / t["0.01"], 2) if t.get("0.01") else None
        for n, t in out.items()
    }
    print(
        json.dumps(
            {
                "metric": "sf_ladder_warm_min",
                "unit": "sec",
                "timings": out,
                "growth_0p01_to_0p1": growth,
                "warm_runs": WARM_RUNS,
            }
        )
    )


if __name__ == "__main__":
    main()
