"""Deduplication operators for large-scale (training-data) pipelines.

Four tiers, each with a different cost/recall profile at 100 TB:

- exact         one shuffle on a 60-bit content hash; trivially correct.
- minhash LSH   signature is a narrow per-row map (no shuffle); candidate
                generation is an equi-join on (band_id, band_hash) buckets,
                so the shuffle key space is small and uniform — no
                quadratic blow-up. Verification (exact Jaccard) runs only
                on bucket-collision pairs.
- simhash       one 60-bit signature per row; near-dup pairs via the
                pigeonhole band trick (distance ≤ k ⇒ some chunk of
                ⌈bits/(k+1)⌉ bits is equal), then Hamming verify.
- n-gram Jaccard  inverted-index self-join on shingles (exact, no
                probabilistic step) — the scale-out classic: explode
                distinct shingles, equi-join, count shared, filter.

All of them hash with the portable md5-derived :func:`hash64`, so the
duckdb oracle reproduces signatures bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fink_science_spark.functions.hashing import hash64, minhash_signature, simhash64


def exact_dedup(df: DataFrame, id_col: str, content_col, keep: str = "min") -> DataFrame:
    """Exact dedup on a content expression: one row per distinct content,
    keeping the smallest (or largest) id; reports group size.

    Hash-groupBy on a 60-bit content hash — the grouping key is the hash,
    not the full text, so the shuffle moves ~24 bytes/row regardless of
    document size."""
    agg_id = F.min(id_col) if keep == "min" else F.max(id_col)
    c = F.col(content_col) if isinstance(content_col, str) else content_col
    return (
        df.select(F.col(id_col), hash64(c).alias("__h"))
        .groupBy("__h")
        .agg(agg_id.alias(id_col), F.count("*").alias("n_dups"))
        .drop("__h")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float | None = None,
    shingles_col: str | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH, optionally
    verified with exact Jaccard over ``shingles_col``.

    Returns columns (id_a, id_b[, jaccard]) with id_a < id_b, distinct.

    Scale path: the only shuffle is the equi-join on (band, band_hash);
    band hashes of non-near-dup docs are uniform → no skew. The verify
    step re-joins the token sets ONLY for colliding pairs.
    """
    rows_per_band = num_hashes // bands
    assert rows_per_band * bands == num_hashes

    sig = df.select(
        F.col(id_col).alias("__id"),
        minhash_signature(tokens_col, num_hashes).alias("__sig"),
        F.col(shingles_col or tokens_col).alias("__sh"),
    )

    # one row per (doc, band): the band key is the concatenated slice of
    # the signature — engine-portable (no Spark-specific hash) and
    # collision-free, so the oracle reproduces the exact candidate set.
    # (Production at 100 TB: swap for xxhash64 of the slice to shrink the
    # shuffle key; the operator shape is unchanged.)
    band_rows = sig.select(
        "__id",
        "__sh",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ",",
                        *[
                            F.col("__sig")[i]
                            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__band", "__bh"),
    )

    left = band_rows.select(
        F.col("__id").alias("id_a"), F.col("__sh").alias("__sha"), "__band", "__bh"
    )
    right = band_rows.select(
        F.col("__id").alias("id_b"), F.col("__sh").alias("__shb"), "__band", "__bh"
    )
    pairs = (
        left.join(right, ["__band", "__bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__sha", "__shb")
        .dropDuplicates(["id_a", "id_b"])
    )

    if jaccard_threshold is None:
        return pairs.select("id_a", "id_b")

    inter = F.size(F.array_intersect("__sha", "__shb"))
    union = F.size(F.array_union("__sha", "__shb"))
    jacc = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        pairs.withColumn("jaccard", jacc)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    max_hamming: int = 8,
    bits: int = 60,
    chunks: int = 4,
) -> DataFrame:
    """Near-duplicate pairs whose SimHash Hamming distance ≤ ``max_hamming``.

    Band trick: split the signature into ``chunks`` bit-ranges; any pair
    within distance ≤ chunks-1 must agree on ≥1 chunk (pigeonhole), so the
    candidate join is an equi-join per chunk, then an exact Hamming verify.
    For max_hamming ≥ chunks the guarantee weakens to a recall/cost
    trade-off exactly as in production SimHash systems — callers size
    ``chunks`` = max_hamming+1 for exactness.
    """
    chunk_bits = bits // chunks
    sig = df.select(
        F.col(id_col).alias("__id"), simhash64(tokens_col, bits).alias("__sim")
    )
    chunk_cols = [
        F.shiftright("__sim", c * chunk_bits)
        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
        .alias(f"__c{c}")
        for c in range(chunks)
    ]
    sig = sig.select("__id", "__sim", *chunk_cols)

    candidates = None
    for c in range(chunks):
        left = sig.select(
            F.col("__id").alias("id_a"),
            F.col("__sim").alias("__sima"),
            F.col(f"__c{c}").alias("__k"),
        )
        right = sig.select(
            F.col("__id").alias("id_b"),
            F.col("__sim").alias("__simb"),
            F.col(f"__c{c}").alias("__k"),
        )
        cand = left.join(right, "__k").filter(F.col("id_a") < F.col("id_b"))
        candidates = cand if candidates is None else candidates.unionByName(cand)

    return (
        candidates.dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "hamming", F.bit_count(F.col("__sima").bitwiseXOR(F.col("__simb")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    shingles_col: str,
    threshold: float = 0.5,
    hash_join_key: bool = False,
) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs via an inverted-index self-join.

    explode(distinct shingles) → equi-join on shingle → count shared per
    pair → |A∩B| / (|A|+|B|−|A∩B|) ≥ threshold. No quadratic cross join:
    only pairs sharing ≥1 shingle are ever materialized, and the join key
    (shingle hash) is high-cardinality → well-spread shuffle. Stop-shingle
    skew (a shingle shared by millions of docs) is the known hot spot at
    100 TB; AQE skew-join splitting handles it, and callers can drop
    top-frequency shingles first for a recall-neutral cost cut.
    """
    sets = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(F.col(shingles_col)).alias("__s"),
    ).withColumn("__n", F.size("__s"))

    inv = sets.select("__id", "__n", F.explode("__s").alias("__shingle"))
    if hash_join_key:
        # scale path: 32-bit murmur3 join key shrinks shuffle bytes; a
        # collision can inflate an intersection count, so oracle-checked
        # queries keep the raw shingle key (hash_join_key=False).
        inv = inv.withColumn("__shingle", F.hash("__shingle"))

    a = inv.select(
        F.col("__id").alias("id_a"), F.col("__n").alias("__na"), "__shingle"
    )
    b = inv.select(
        F.col("__id").alias("id_b"), F.col("__n").alias("__nb"), "__shingle"
    )
    shared = (
        a.join(b, "__shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "__na", "__nb")
        .agg(F.count("*").alias("__inter"))
    )
    jacc = F.col("__inter") / (F.col("__na") + F.col("__nb") - F.col("__inter"))
    return (
        shared.withColumn("jaccard", jacc)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def argmin_dedup(df: DataFrame, keys: list[str], order_by: list) -> DataFrame:
    """Keep exactly one row per key group: the first under ``order_by``
    (ties must be broken by a unique column for determinism) — the
    arg-min-per-group dedup used by crossmatch pipelines
    (reference semantics: keep min angDist per objectId,
    ztf/xmatch/processor.py:167-169)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
