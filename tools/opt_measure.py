"""Optimization-round helper: time a subset of registry queries with the
bench's exact methodology (noop sink, 1 warm + min-of-3) and dump their
``explain("formatted")`` to plans/r13/<name>_<tag>.txt.

Usage: python tools/opt_measure.py <tag> <query> [query ...]
       (tag = "before" | "after" | anything)

Numbers printed here are for the optimization loop; the committed artifact
numbers come from bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(__file__),
    "..",
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14"),
)


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    from changegen_spark.queries import all_queries
    from changegen_spark.session import get_spark

    spark = get_spark("opt-measure")
    queries = all_queries()
    # global JVM warmup (bench.py does the same with the first 3 headliners)
    for nm in names[:1]:
        queries[nm](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    for nm in names:
        fn = queries[nm]
        df = fn(spark, SF_DIR)
        with open(os.path.join(OUT, f"{nm}_{tag}.txt"), "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        spark.sparkContext.setJobDescription(f"opt:{nm}")
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        cold = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        print(f"{nm:30s} warm_min3={best:.3f}s cold={cold:.3f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
