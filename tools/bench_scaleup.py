"""10× scale-up stress: build an ~sf1-sized dataset by replicating sf0.1
with id offsets (values perturbed deterministically where uniqueness
matters), run the ladder queries, and report 0.1→1 growth factors.

The driver ships sf0.001/0.01/0.1 only; this extends the measured scaling
curve one more decade (lineitem ~600k → ~6M rows, documents 5k → 50k) so
the "sub-linear at small SF" claim is tested where data cost should start
dominating fixed overhead.  Replication preserves distributions and key
relationships (orderkeys/doc_ids get disjoint offset ranges per copy), so
per-query work scales like real data growth for scan/agg/window/text
queries; join fan-outs whose selectivity depends on cross-copy collisions
(l_partkey keeps its original domain) are noted per query where relevant.

Usage: python tools/bench_scaleup.py [copies] [out_dir]
Prints one JSON line; results recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/changegen_spark_sfup"
SRC = "/root/testdata/sf0.1"

QUERIES = [
    "q01_pricing_summary",
    "q_exact_dedup",
    "q_group_topk",
    "q_sessionize",
    "q_hll_distinct",
    "q_sample_quantiles",
    "q_hrw_shards",
    "q_phrase_search",
    "q_nb_classifier",
    "q_token_count",
    "q_lm_score",
    "q_dup_spans",
    # r4 additions: rewritten CDC chunker, de-bottlenecked haversine
    # pairing, DSIR selection, hard-negative mining
    "q_cdc_chunks",
    "q_haversine",
    "q_dsir_weights",
    "q_hard_negatives",
    # late-r4: the LSH scale path replacing the exact quadratic, and the
    # one-map weighted reservoir sampler
    "q_hard_negatives_lsh",
    "q_reservoir_sample",
]
WARM_RUNS = 2


def build(spark) -> None:
    from changegen_spark.sources.scaleup import build_scaled_dir

    build_scaled_dir(spark, SRC, OUT, copies=COPIES)


def main() -> None:
    from changegen_spark.queries import all_queries
    from changegen_spark.session import get_spark

    spark = get_spark("changegen_spark-scaleup")
    t0 = time.time()
    build(spark)
    build_s = round(time.time() - t0, 1)
    qs = all_queries()
    base_t: dict[str, float] = {}
    up_t: dict[str, float] = {}
    for sf_dir, sink in ((SRC, base_t), (OUT, up_t)):
        for name in QUERIES:
            fn = qs[name]
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(WARM_RUNS):
                s = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - s)
            sink[name] = round(best, 3)
    growth = {n: round(up_t[n] / base_t[n], 2) for n in QUERIES}
    print(
        json.dumps(
            {
                "metric": "scaleup_10x_warm_min",
                "unit": "sec",
                "copies": COPIES,
                "build_s": build_s,
                "base_sf0_1": base_t,
                "scaled": up_t,
                "growth_10x": growth,
                "warm_runs": WARM_RUNS,
            }
        )
    )


if __name__ == "__main__":
    main()
