"""Scale-adaptive spread of CPU-bound Python scan stages (guide §2).

A ``mapInArrow`` / pandas-UDF pass that lives inside the scan stage
inherits the scan's split count.  Locally (one small parquet file) that
serializes the whole Python pass on one core; on a 100 TB table splits
far exceed the core count and nothing should happen.

r13 spread such scans to ``defaultParallelism`` whenever the scan was
narrower than the session — an unbounded target.  The r13 driver's
8-core-vs-32-core runs showed that over-parallelizes small inputs: 32
Python workers' spin-up + per-task Arrow setup exceed the serialization
they remove (q_cdc_chunks 0.45x, q_dup_spans 0.83x, q_winnow_pairs with
the 8-core run FASTER than the 32-core run).  It won only where the
per-task Python work is heavy (MinHash signatures: q_dedup_clusters
1.31x, q_lsh_pairs 1.27x).

r14: one shared, cost-gated helper.  The target partition count is

    min(defaultParallelism, ceil(scan_bytes / bytes_per_task))

— "give each Python task enough input bytes that its compute dominates
task overhead" — applied only when it exceeds the scan's own estimated
split count.  ``bytes_per_task`` is the per-operator dial, set from the
operator's measured per-byte Python cost (an A/B at the call site): the
heavier the per-byte work, the fewer bytes a task needs to amortize its
fixed overhead.  At scale the clamp makes the helper a no-op: a table
big enough to matter already scans with splits >= cores, so no
repartition (and no extra exchange) ever happens on the 100 TB path.

Sizing uses the scan's input files (public ``DataFrame.inputFiles``), not
``df.rdd.getNumPartitions()`` — the r13 probe forced a full plan-to-RDD
conversion on every query BUILD (inside the bench's timed region) and is
incompatible with Spark Connect (ADVICE r13).  When the input bytes
cannot be determined (in-memory test frames, exotic filesystems) the
helper does nothing, which is the safe default on both ends of the scale.
"""

from __future__ import annotations

import math
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame

# Per-operator bytes-per-task dials (see the call sites for the A/B that
# set each).  Grouped here so the cost model reads in one place: values
# express measured per-byte Python cost — heavier per-byte work => a task
# amortizes its overhead with fewer bytes.
#: MinHash md5 signatures: N_HASHES md5 digests per document — the
#: heaviest per-byte pass; fine-grained spread kept winning (r13 driver:
#: q_dedup_clusters 1.31x, q_lsh_pairs 1.27x at full parallelism).
MINHASH_BYTES_PER_TASK = 16 * 1024
#: Trigram tf counting (relatedness): Arrow pass with a per-doc Counter —
#: r14 canary-guarded A/B on q_related_docs: the ~10-way shape beat the
#: r13 full-parallelism one 8/8 (medians 3.29 vs 3.64 s; a second 4-clean
#: session read 3.90 vs 4.43), so the tf pass sits in the medium regime.
TRIGRAM_BYTES_PER_TASK = 64 * 1024
#: Winnowing selection: pure-Python deque + one md5 per gram — medium
#: cost; the r13 driver measured the 8-way shape (0.98 s) beating the
#: 32-way one (2.21 s) at sf0.1.
WINNOW_BYTES_PER_TASK = 64 * 1024
#: Positioned-gram md5 hashing (dup_spans): medium cost, one md5 per
#: token window but numpy-free; r13 driver had 8-way beating 32-way.
POSGRAM_BYTES_PER_TASK = 64 * 1024
#: CDC chunking: whole-batch vectorized numpy rolling hash + one md5 per
#: ~32-char chunk — cheap per byte; the r13 driver showed the unspread
#: single-split pass (0.89 s) beating both 8-way (1.30 s) and 32-way
#: (1.97 s) at sf0.1, so a task needs megabytes to be worth its overhead.
CDC_BYTES_PER_TASK = 4 * 1024 * 1024


def scan_input_bytes(df: DataFrame) -> int:
    """Total on-disk bytes of the frame's input files, or 0 when unknown
    (in-memory frames, non-local filesystems)."""
    try:
        files = df.inputFiles()
    except Exception:  # pragma: no cover - defensive (Connect, exotic plans)
        return 0
    total = 0
    for uri in files:
        p = urlparse(uri)
        if p.scheme not in ("", "file"):
            return 0
        try:
            total += os.path.getsize(unquote(p.path))
        except OSError:
            return 0
    return total


def spread_if_narrow(
    df: DataFrame, key, bytes_per_task: int, scan_bytes: int | None = None
) -> DataFrame:
    """Hash-repartition ``df`` by ``key`` to the cost-gated target when the
    scan is narrower than that target; identity otherwise (always identity
    at scale — see module docstring).

    ``scan_bytes`` lets call sites that know their input file pass the
    size directly and skip the ``inputFiles`` plan walk.
    """
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    size = scan_input_bytes(df) if scan_bytes is None else scan_bytes
    if size <= 0:
        return df
    target = min(par, math.ceil(size / bytes_per_task))
    try:
        max_split = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
    except (TypeError, ValueError):  # pragma: no cover - non-numeric conf
        max_split = 128 * 1024 * 1024
    est_splits = max(1, math.ceil(size / max_split))
    if target <= est_splits:
        return df
    return df.repartition(target, key)
