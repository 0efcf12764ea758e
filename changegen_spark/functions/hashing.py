"""MinHash / SimHash / shingling for near-duplicate detection at scale.

Design notes (100 TB): all operators are explode → hash → groupBy pipelines
with map-side partial aggregation; candidate generation is LSH band-bucketing
so the pair space is bucket-local (never O(n²) across the corpus).  Hashes
are md5-based so every step is reproducible in any engine (duckdb oracle
parity) — swap in xxhash64 for production throughput.

MinHash trick: the minimum of md5(seed ‖ shingle) over a shingle set is a
valid permutation-min — md5 acts as the random permutation of the shingle
universe, one permutation per seed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_shingles(text: Column, k: int = 5) -> Column:
    """Distinct character k-grams of the lowered text (array<string>)."""
    s = F.lower(text)
    n = F.length(s)
    return F.array_distinct(
        F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - F.lit(k) + 1),
                lambda i: F.substring(s, i, F.lit(k)),
            ),
        ).otherwise(F.array(s))
    )


def minhash_signature(shingles: Column, num_hashes: int = 8) -> Column:
    """MinHash signature: per seed, min md5 hex over the shingle set
    (array<string> of length num_hashes)."""
    return F.array(
        *[
            F.array_min(
                F.transform(
                    shingles,
                    lambda sh: F.md5(
                        F.to_binary(F.concat(F.lit(f"{seed}:"), sh), F.lit("utf-8"))
                    ),
                )
            )
            for seed in range(num_hashes)
        ]
    )


def lsh_band_hashes(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Band the signature: array<struct<band:int, bh:string>> — docs sharing
    any (band, bh) are near-dup candidates."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.to_binary(
                        F.concat_ws(
                            "|",
                            *[
                                F.element_at(signature, b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ],
                        ),
                        F.lit("utf-8"),
                    )
                ).alias("bh"),
            )
            for b in range(bands)
        ]
    )


def simhash16(tokens: Column) -> Column:
    """16-bit SimHash over a token array.

    Each token hashes to 16 bits (first 4 hex chars of its md5); per bit
    position the signed votes are summed; the fingerprint bit is 1 when the
    sum is positive.  Pure integer arithmetic → identical in the SQL oracle.
    """
    hexd = "0123456789abcdef"

    def bit_of(tok: Column, j: int) -> Column:
        # hex char containing bit j (4 bits per char), value via instr
        ch = F.substring(F.md5(F.to_binary(tok, F.lit("utf-8"))), 1 + j // 4, 1)
        val = F.instr(F.lit(hexd), ch) - 1
        return F.shiftright(val, 3 - (j % 4)) % 2

    bits = []
    for j in range(16):
        votes = F.aggregate(
            tokens,
            F.lit(0),
            lambda acc, t: acc + (bit_of(t, j) * 2 - 1),
        )
        bits.append(F.when(votes > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(1 << (15 - j)))
    return sum(bits[1:], start=bits[0]).cast("long")


def hamming16(a: Column, b: Column) -> Column:
    """Hamming distance between two 16-bit fingerprints via popcount
    (unrolled shifts — bit_count parity with the SQL oracle)."""
    x = a.bitwiseXOR(b)
    bits = [F.shiftright(x, j) % 2 for j in range(16)]
    return sum(bits[1:], start=bits[0]).cast("long")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams of the lowered text (array<string>).

    Word-level shingles (vs char k-grams) are the right granularity when the
    vocabulary is small relative to document length — char shingles saturate
    and every pair collides, blowing up LSH buckets.
    """
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    cnt = F.size(toks)
    return F.array_distinct(
        F.when(
            cnt >= n,
            F.transform(
                F.sequence(F.lit(1), cnt - F.lit(n) + 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(n))),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def minhash_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket_size: int | None = None,
    hash_fn: str = "md5",
) -> DataFrame:
    """End-to-end MinHash-LSH candidate pair generation.

    word-shingle → explode → per-seed min-md5 aggregate (map-side partial
    combine — one shuffle keyed by doc id) → band → self-join per band
    bucket.  Returns (id_a, id_b) with id_a < id_b, distinct.  The self-join
    shuffles on the band hash, so work is proportional to bucket sizes, not
    n²; signature aggregation never materializes per-doc hash arrays.
    """
    if num_hashes % 4 != 0:
        raise ValueError("num_hashes must be a multiple of 4")
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    # No array_distinct before explode: min() is idempotent under duplicate
    # shingles, and skipping the distinct saves an O(n²)-ish array pass.
    # Negative result worth keeping (measured at sf0.1): a "shingle-free"
    # variant hashing token n-tuples directly (xxhash64(seed, t0, t1, t2)
    # over exploded struct triples) was ~2.5× SLOWER than hashing one
    # concatenated shingle string — per-seed hash input triples and the
    # explode row widens.  One string per shingle is the right shape.
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    cnt = F.size(toks)
    raw_shingles = F.when(
        cnt >= ngram,
        F.transform(
            F.sequence(F.lit(1), cnt - F.lit(ngram) + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(ngram))),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    sh = docs.select(
        F.col(id_col).alias("id"), F.explode(raw_shingles).alias("sh")
    )
    if hash_fn == "md5":
        # One md5 yields four independent 8-hex-char (32-bit) hash windows,
        # so num_hashes permutations need num_hashes/4 md5 evaluations per
        # shingle.  The md5s are materialized as projection columns BEFORE
        # the aggregate so each is computed exactly once per shingle row
        # (min-aggs then slice windows out of the same value).  md5 keeps
        # the DuckDB oracle bit-exact.
        n_md5 = num_hashes // 4
        hashed = sh.select(
            "id",
            *[
                F.md5(
                    F.to_binary(F.concat(F.lit(f"{m}:"), F.col("sh")), F.lit("utf-8"))
                ).alias(f"h{m}")
                for m in range(n_md5)
            ],
        )
        sig = hashed.groupBy("id").agg(
            *[
                F.min(
                    F.substring(F.col(f"h{s // 4}"), (s % 4) * 8 + 1, 8)
                ).alias(f"mh{s}")
                for s in range(num_hashes)
            ]
        )
    else:  # xxhash64 — JVM intrinsic, one seeded hash per permutation
        sig = sh.groupBy("id").agg(
            *[
                F.min(F.xxhash64(F.lit(s), F.col("sh"))).alias(f"mh{s}")
                for s in range(num_hashes)
            ]
        )
    return _band_and_pair(sig, num_hashes, bands, max_bucket_size, hash_fn)


def _band_and_pair(
    sig: DataFrame,
    num_hashes: int,
    bands: int,
    max_bucket_size: int | None,
    hash_fn: str,
) -> DataFrame:
    """Band a (id, mh0..mhN) signature frame and self-join per bucket."""
    rows_per_band = num_hashes // bands

    def band_hash(b: int):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        if hash_fn == "xxhash64":
            return F.xxhash64(F.lit(b), *cols).cast("string")
        return F.md5(F.to_binary(F.concat_ws("|", *cols), F.lit("utf-8")))

    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_hash(b).alias("bh"))
                    for b in range(bands)
                ]
            )
        ).alias("b"),
    ).select("id", "b.band", "b.bh")
    if max_bucket_size is not None:
        # Hot-bucket guard (production default at corpus scale): a
        # degenerate bucket of B docs costs B² pair rows; buckets past the
        # cap carry no discriminating signal (boilerplate / empty docs) and
        # are dropped BEFORE the self-join so the blowup never happens.
        sizes = banded.groupBy("band", "bh").agg(F.count("*").alias("__bsz"))
        banded = (
            banded.join(sizes, ["band", "bh"])
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs: |A∩B| / |A∪B|.

    Set sizes via groupBy counts; intersection via shingle equi-join —
    all shuffle-partitioned, no per-pair set materialization on one node.
    """
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(char_shingles(F.col(text_col), k)).alias("sh"),
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("sa").join(pairs, F.col("sa.id") == F.col("id_a"))
    inter = (
        a.join(
            sh.alias("sb"),
            (F.col("sb.id") == F.col("id_b")) & (F.col("sa.sh") == F.col("sb.sh")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .fillna(0, ["n_inter"])
        .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
    )
    return out.select("id_a", "id_b", "jaccard")
