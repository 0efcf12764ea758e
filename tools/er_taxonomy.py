#!/usr/bin/env python
"""Truth-tag the SN recall gap: classify every true pair MISSED by the
production composition (multi-pass sorted neighborhood + city refine)
at a given rung of the ER ladder (r9 verdict #7).

For each missed pair the script decides, in priority order:

  lev_gt_max        levenshtein(name_a, name_b) > LEV_MAX — the REFINE
                    rejects the pair under ANY sort order; no extra pass
                    can recover it pairwise.  (These are dup↔dup pairs:
                    two independent 1–2-edit variants of the same base
                    name are up to 4 edits from each other.)  The script
                    also reports how many of these are CLUSTER-recovered:
                    both records already connect to a common neighbor
                    (usually the base record) in the predicted pair set,
                    so connected components still merges them.
  block_key_differs lev ≤ MAX but the phonetic block key differs between
                    the two records (the generator's class-1 first-letter
                    substitution) — both existing sort orders are
                    prefixed by that key, so the records land far apart
                    in BOTH; unreachable at any window.  A third sort
                    order that drops the broken prefix (city |
                    last-name-suffix | first name) reaches exactly this
                    class — measured by the pass3_reaches column.
  same_key_density  lev ≤ MAX and block keys agree, but same-key
                    strangers push the records > window−1 apart in both
                    orders — the classical SN density loss.
  in_window_missed  sanity class; must be 0 (a lev-ok in-window pair is
                    by construction in the prediction).

Usage:  python tools/er_taxonomy.py [--n 1000000] [--window 4]
Prints one JSON object; paste the table into SCALE.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--window", type=int, default=None)
    args = ap.parse_args()

    from changegen_spark.queries.er import (
        LEV_MAX,
        SN_WINDOW,
        _sn_ranked,
        _sn_ranked2,
        _sn_ranked3,
        er_pairs_sn_multi,
        with_block,
    )
    from changegen_spark.sources.scaleup import build_er_records

    window = args.window or SN_WINDOW
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .appName("er-taxonomy")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    er_dir = os.environ.get("SPARK_GRAFT_ER_DIR", "/tmp/changegen_spark_er")
    path = build_er_records(spark, er_dir, n_entities=args.n)
    ppl = spark.read.parquet(path)

    t0 = time.time()
    pred = (
        er_pairs_sn_multi(ppl, window=window, refine_cols=("city",))
        .select("rec_a", "rec_b")
        .localCheckpoint()
    )
    n_pred = pred.count()

    # per-record attributes: entity, block key, normalized name, and the
    # global rank under each of the three sort orders
    blk = with_block(ppl).select("rec_id", "nname", "block_key")
    r1 = _sn_ranked(ppl).select("rec_id", F.col("rank").alias("r1"))
    r2 = _sn_ranked2(ppl).select("rec_id", F.col("rank").alias("r2"))
    r3 = _sn_ranked3(ppl).select("rec_id", F.col("rank").alias("r3"))
    attrs = (
        ppl.select("rec_id", "entity_id")
        .join(blk, "rec_id")
        .join(r1, "rec_id")
        .join(r2, "rec_id")
        .join(r3, "rec_id")
        .localCheckpoint()
    )

    a = attrs.select(*[F.col(c).alias(c + "_a") for c in attrs.columns])
    b = attrs.select(*[F.col(c).alias(c + "_b") for c in attrs.columns])
    truth = a.join(
        b,
        [
            a.entity_id_a == b.entity_id_b,
            a.rec_id_a < b.rec_id_b,
        ],
    ).select(
        F.col("rec_id_a").alias("rec_a"),
        F.col("rec_id_b").alias("rec_b"),
        F.levenshtein("nname_a", "nname_b").alias("lev"),
        (F.col("block_key_a") == F.col("block_key_b")).alias("same_block"),
        (F.abs(F.col("r1_a") - F.col("r1_b")) <= window - 1).alias("w1"),
        (F.abs(F.col("r2_a") - F.col("r2_b")) <= window - 1).alias("w2"),
        (F.abs(F.col("r3_a") - F.col("r3_b")) <= window - 1).alias("w3"),
    )
    n_true = truth.count()

    missed = truth.join(pred, ["rec_a", "rec_b"], "left_anti").localCheckpoint()
    n_missed = missed.count()

    classed = missed.select(
        "rec_a",
        "rec_b",
        "w3",
        "lev",
        F.when(F.col("lev") > LEV_MAX, "lev_gt_max")
        .when(~F.col("same_block"), "block_key_differs")
        .when(F.col("w1") | F.col("w2"), "in_window_missed")
        .otherwise("same_key_density")
        .alias("cls"),
    ).localCheckpoint()
    taxonomy = {
        r["cls"]: {
            "n": r["n"],
            "pass3_reaches": r["p3"],
        }
        for r in classed.groupBy("cls")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("w3").cast("long")).alias("p3"),
        )
        .collect()
    }

    # cluster recovery of the lev>max pairs: both endpoints share a
    # predicted neighbor, so CC merges them even though the pair itself
    # is refine-rejected
    edges = pred.unionByName(
        pred.select(F.col("rec_b").alias("rec_a"), F.col("rec_a").alias("rec_b"))
    )
    lv = classed.filter("cls = 'lev_gt_max'").select("rec_a", "rec_b")
    e1 = edges.select(F.col("rec_a").alias("rec_a"), F.col("rec_b").alias("via"))
    e2 = edges.select(F.col("rec_a").alias("rec_b"), F.col("rec_b").alias("via2"))
    recovered = (
        lv.join(e1, "rec_a")
        .join(e2, [lv.rec_b == e2.rec_b, F.col("via") == F.col("via2")])
        .select(lv.rec_a, lv.rec_b)
        .distinct()
        .count()
    )
    if "lev_gt_max" in taxonomy:
        taxonomy["lev_gt_max"]["cluster_recovered_via_common_neighbor"] = recovered

    out = {
        "n_entities": args.n,
        "window": window,
        "lev_max": LEV_MAX,
        "n_true": n_true,
        "n_pred_multi_refine": n_pred,
        "n_missed": n_missed,
        "recall_pct": round(100 * (n_true - n_missed) / max(n_true, 1), 1),
        "taxonomy": taxonomy,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
