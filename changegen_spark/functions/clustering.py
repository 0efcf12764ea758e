"""Connected components over candidate-pair graphs — the last stage of a
real dedup pipeline (LSH pairs → duplicate CLUSTERS → one kept doc each).

Iterative min-label propagation on DataFrames: each node adopts the
smallest label among itself and its neighbors until fixpoint.  This is the
alternating-large/small-star algorithm's simple cousin — O(diameter)
rounds, each round one shuffle keyed by node id; duplicate clusters in
practice have tiny diameter, so 2-4 rounds.  ``localCheckpoint`` per round
keeps lineage flat (the classic iterative-Spark requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """(node, component) for every node in the edge list; component = min
    node id of the connected component.  ``stats``, if given, receives
    {"rounds": n} — the rounds to fixpoint.

    r11: each round is one-hop min propagation PLUS path-halving
    (comp ← comp's comp), so labels reach distance ~2^k after k rounds
    — convergence is O(log diameter), not O(diameter).  The one-hop
    r5-r10 version needed rounds = diameter, which was fine for the
    measured ER/dedup graphs (diameter ≤ 6) but SILENTLY returned
    split clusters on a deep component once max_iter was hit — and
    deep components are realistic at crawl scale (a versioned-page
    near-dup chain is exactly a path graph).  Non-convergence now
    RAISES instead of silently corrupting downstream survivorship;
    with halving, max_iter=20 covers diameter ~2^20."""
    # materialize the symmetric edge list ONCE, then derive nodes from the
    # checkpointed rows — the r5 shape; deriving nodes from `edges` re-ran
    # the full upstream candidate plan (LSH signatures + band join) a
    # second time before the loop even started
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # sym holds both directions, so column `a` alone covers every node
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "comp", F.col("node")
    )
    rounds = 0
    changed = 0
    for _ in range(max_iter):
        rounds += 1
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("comp").alias("nmin"))
        )
        stepped = labels.join(
            neighbor_min, labels.node == neighbor_min.a, "left"
        ).select(
            "node",
            F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))).alias(
                "scomp"
            ),
            (F.coalesce(F.col("nmin"), F.col("comp")) < F.col("comp")).alias(
                "smoved"
            ),
        )
        # path-halving: comp ← comp's own label.  Every comp value IS a
        # node (it's a min over node ids), so the self-join always hits;
        # the coalesce is for the final fixpoint where comp maps to
        # itself.  This is what turns O(diameter) into O(log diameter).
        ptr = stepped.select(
            F.col("node").alias("pnode"), F.col("scomp").alias("pcomp")
        )
        # carry the moved flag through the checkpoint: the convergence
        # check is then a filter+count over materialized rows instead of
        # an extra new×old join per round (one job saved per round)
        new_labels = (
            stepped.join(ptr, stepped.scomp == ptr.pnode, "left")
            .select(
                "node",
                F.coalesce(F.col("pcomp"), F.col("scomp")).alias("new_comp"),
                (
                    F.col("smoved")
                    | (F.coalesce(F.col("pcomp"), F.col("scomp")) < F.col("scomp"))
                ).alias("moved"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("moved").count()
        labels = new_labels.select("node", F.col("new_comp").alias("comp"))
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(component diameter > ~2^{max_iter}); {changed} labels still "
            "moving — refusing to return silently split clusters"
        )
    if stats is not None:
        stats["rounds"] = rounds
    return labels.select("node", "comp")


def dedup_keep_list(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Full dedup decision: cluster candidate pairs, keep the min-id doc of
    each cluster, pass through unpaired docs.  Output: (doc_id, cluster,
    keep)."""
    comp = connected_components(pairs)
    out = docs.select(F.col(id_col).alias("doc_id")).join(
        comp, F.col("doc_id") == comp.node, "left"
    )
    cluster = F.coalesce(F.col("comp"), F.col("doc_id"))
    return out.select(
        "doc_id",
        cluster.alias("cluster"),
        (F.col("doc_id") == cluster).alias("keep"),
    )
