"""Dump the POST-execution (final AQE) plan of registry queries.

`tools/opt_measure.py` captures `explain("formatted")` BEFORE execution,
where `AdaptiveSparkPlan isFinalPlan=false` hides runtime exchange reuse
and AQE join rewrites.  This tool materializes the query through the noop
sink first and then prints the executed plan, so ReusedExchange /
AQEShuffleRead nodes are visible.

Usage: python tools/final_plan.py <query> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    names = sys.argv[1:]
    from changegen_spark.queries import all_queries
    from changegen_spark.session import get_spark

    spark = get_spark("final-plan")
    queries = all_queries()
    for nm in names:
        df = queries[nm](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        print(f"===== {nm} (final adaptive plan) =====")
        print(df._jdf.queryExecution().executedPlan().toString())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
