"""Deterministic training-order operators (r7 new family): reproducible
epoch shuffling WITHOUT a sort, via a Feistel-network bijection.

Reproducible global shuffling is a first-class training-data op: every
epoch needs a different, *replayable* order (elastic restarts, data
ablations, and loss-spike forensics all need "which sample was step k?"
answerable after the fact).  The standard distributed recipe — rank by
a seeded hash — costs a full range-exchange sort per epoch.  A Feistel
permutation gives each id its position by pure expression work instead:

    pos_e(id) = Feistel_4rounds(id, keys[e])   over the 2w-bit domain

The 4-round Feistel network over (L, R) 16-bit halves is a bijection of
[0, 2^32) for ANY round function f (decryption = rounds in reverse), so
positions are guaranteed collision-free; ordering/bucketing by ``pos``
is a deterministic shuffle with NO shuffle exchange — a map-side column.
Positions are sparse in the padded domain (documented contract: they
order and bucket, they are not dense indices).  All arithmetic is +, *,
&, xor, >> on BIGINTs, expressed identically in Spark SQL and DuckDB
(dialect bridge below), so the oracle replays the permutation exactly.

* ``q_feistel_shuffle`` — (doc_id, epoch, pos) for EPOCHS epochs; the
  per-epoch orders are distinct, bijectivity is pytest-pinned against an
  independent Python Feistel.
* ``q_shuffle_shards``  — per-(epoch, shard) doc counts for SHARDS
  hash-free shards (``pos & (SHARDS-1)``): the balance audit a sharded
  export sizes itself by.  One KB-sized aggregate.

100 TB shape: position assignment is expression-only map work fused into
the scan; writers then ``sortWithinPartitions(pos)`` or bucket by a pos
range — no global exchange anywhere.  Domain is 2^32; for >4G rows
widen FEISTEL_W (the construction is width-generic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changegen_spark.sources.tables import load_table

FEISTEL_W = 16  # bits per half; domain = 2^(2W)
FEISTEL_ROUNDS = 4
EPOCHS = 3
SHARDS = 8
_MASK = (1 << FEISTEL_W) - 1
_MULT = 40503  # odd 16-bit mixing multiplier (Knuth-style)


def round_keys(epoch: int) -> list[int]:
    """Per-round 16-bit keys derived from the epoch — plain arithmetic so
    the SQL twin and the independent test reimplementation share them."""
    return [
        (40499 * (epoch * FEISTEL_ROUNDS + r + 1) + 12289) & _MASK
        for r in range(FEISTEL_ROUNDS)
    ]


def _feistel_sql(id_expr: str, epoch: int, duck: bool) -> str:
    """The Feistel position as ONE SQL expression, parameterized only by
    dialect renames (xor/shift spellings) — the er.py/web.py bridge
    pattern, so the arithmetic cannot diverge between engines."""

    def xor(a: str, b: str) -> str:
        return f"xor({a}, {b})" if duck else f"({a} ^ {b})"

    def shr(a: str, n: int) -> str:
        return f"({a} >> {n})" if duck else f"shiftright({a}, {n})"

    def shl(a: str, n: int) -> str:
        return f"({a} << {n})" if duck else f"shiftleft({a}, {n})"

    left = f"({shr(id_expr, FEISTEL_W)} & {_MASK})"
    right = f"({id_expr} & {_MASK})"
    for k in round_keys(epoch):
        fr = xor(f"(({right} * {_MULT} + {k}) & {_MASK})", shr(right, 7))
        left, right = right, f"({xor(left, fr)} & {_MASK})"
    # halves recombine with + (right < 2^W, so + == |)
    return f"({shl(left, FEISTEL_W)} + {right})"


def feistel_pos(id_col: str, epoch: int):
    """Spark Column: the epoch-``epoch`` position of ``id_col``."""
    return F.expr(_feistel_sql(id_col, epoch, duck=False)).cast("long")


def _ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select("doc_id")


def q_feistel_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, epoch, pos) for EPOCHS reproducible epoch orders — pure
    expression work, one row per (doc, epoch), no join, no exchange
    before the presentation sort."""
    d = _ids(spark, sf_dir)
    out = d.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(e).cast("long").alias("epoch"),
                    feistel_pos("doc_id", e).alias("pos"),
                )
                for e in range(EPOCHS)
            ])
        ).alias("s"),
    ).select("doc_id", "s.epoch", "s.pos")
    return out.orderBy("doc_id", "epoch")


def _epoch_union(duck: bool) -> str:
    return "\n  UNION ALL ".join(
        f"SELECT doc_id, CAST({e} AS BIGINT) AS epoch,"
        f" CAST({_feistel_sql('doc_id', e, duck)} AS BIGINT) AS pos"
        " FROM documents"
        for e in range(EPOCHS)
    )


Q_FEISTEL_SHUFFLE_SQL = f"""
{_epoch_union(duck=True)}
ORDER BY doc_id, epoch
"""


def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(epoch, shard) doc counts under ``shard = pos & (SHARDS-1)``
    — the balance audit for position-sharded exports (a Feistel position
    is uniform over the domain, so shards are balanced in expectation
    WITHOUT any hash shuffle of the data)."""
    d = _ids(spark, sf_dir)
    rows = d.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(e).cast("long").alias("epoch"),
                    (feistel_pos("doc_id", e) % SHARDS).cast("long").alias(
                        "shard"
                    ),
                )
                for e in range(EPOCHS)
            ])
        ).alias("s")
    ).select("s.epoch", "s.shard")
    return (
        rows.groupBy("epoch", "shard")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("epoch", "shard")
    )


Q_SHUFFLE_SHARDS_SQL = f"""
WITH positions AS (
  {_epoch_union(duck=True)}
)
SELECT epoch, CAST(pos % {SHARDS} AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs
FROM positions GROUP BY epoch, shard
ORDER BY epoch, shard
"""


QUERIES = {
    "q_feistel_shuffle": q_feistel_shuffle,
    "q_shuffle_shards": q_shuffle_shards,
}
ORACLES = {
    "q_feistel_shuffle": Q_FEISTEL_SHUFFLE_SQL,
    "q_shuffle_shards": Q_SHUFFLE_SHARDS_SQL,
}
