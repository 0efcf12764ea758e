"""Synthetic scale-up: replicate a snapshot directory N× with disjoint id
ranges to extend the measured scaling curve beyond the shipped sf0.1.

Replication preserves distributions and key relationships (orderkeys /
doc_ids / event_ids / vec_ids get disjoint offset ranges per copy;
documents gain a per-copy marker token so text content is not
byte-identical), so per-query work scales like real data growth for
scan/agg/window/text queries.  Join fan-outs whose selectivity depends on
cross-copy collisions (l_partkey keeps its original domain) are noted in
SCALE.md per query.

Used by tools/bench_scaleup.py (full ladder, one-off) and bench.py's
per-round sf1 section (scale-sensitive headline subset).
"""

from __future__ import annotations

import os
import shutil

# (table, id columns to offset per copy) — offsets keep keys disjoint
OFFSETS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SMALL = ["region", "nation", "customer", "supplier", "part"]
STRIDE = 10_000_000


def build_scaled_dir(spark, src: str, out: str, copies: int = 10) -> None:
    """Materialize the ``copies``× replication of ``src`` under ``out``.
    Idempotent: tables already present are kept (delete ``out`` to force a
    rebuild)."""
    from pyspark.sql import functions as F

    from changegen_spark.sources.tables import load_table

    os.makedirs(out, exist_ok=True)
    for t in SMALL:
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copy(os.path.join(src, f"{t}.parquet"), dst)
    for t, idcols in OFFSETS.items():
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        base = load_table(spark, src, t)
        parts = []
        for c in range(copies):
            d = base
            for col in idcols:
                d = d.withColumn(col, F.col(col) + F.lit(c * STRIDE))
            # perturb content minimally so copies aren't byte-identical
            # documents: suffix a copy marker token (keeps stats shape)
            if t == "documents" and c > 0:
                d = d.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" copymark{c}"))
                )
            # embeddings: ROLL the dimensions by c — exact copies made
            # every vector a true near-dup of its 9 clones (cos = 1.0), a
            # 90%-duplicate regime in which any near-dup query's OUTPUT
            # grows ~quadratically in the copy count and the ladder
            # measures result size, not plan scaling (r5: measured 10.7×
            # for q_embedding_dedup_lsh before this fix, 1.9× after).  A
            # circular shift keeps norms, the per-dim value distribution,
            # and label structure, while cross-copy cosines drop to the
            # unrelated-pair level — "10× more data at the same dup rate".
            if t == "embeddings" and c > 0:
                k = c % 64
                d = d.withColumn(
                    "embedding",
                    F.concat(
                        F.slice("embedding", k + 1, 64 - k),
                        F.slice("embedding", 1, k),
                    ),
                )
            parts.append(d)
        acc = parts[0]
        for p in parts[1:]:
            acc = acc.unionByName(p)
        acc.write.mode("overwrite").parquet(dst)
