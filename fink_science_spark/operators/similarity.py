"""Similarity search over embedding columns (array<float>).

Two tiers:

- :func:`cosine_topk` — exact brute-force top-k. The dot product is a
  JVM-side left fold (``zip_with`` + ``aggregate``) — no Python, no UDF.
  Query side is broadcast (queries ≪ corpus in every real workload), so
  the corpus is scanned exactly once with no shuffle for the join; the
  only shuffle is the per-query top-k window, whose key count = #queries.

- :func:`lsh_bucketed_topk` — the scale path: sign-random-projection LSH.
  Each vector gets a ``nbits``-bit bucket from the signs of dot products
  with deterministic pseudo-random hyperplanes (hash-derived, so both
  engines — and any re-run — agree bit-for-bit). Candidates = bucket
  equi-join, exact cosine refine within bucket. At 100 TB: bucket join
  shuffles on a small uniform key; brute-force comparisons drop by
  ~2^nbits.

Norms/dot products fold left-to-right in both Spark and the duckdb
oracle → bit-identical cosines (validated in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product of two array<double> columns (JVM-side)."""
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def l2_norm_sq(a: Column) -> Column:
    return _fold_sum(F.transform(a, lambda x: x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(l2_norm_sq(a) * l2_norm_sq(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    corpus_vec: str,
    query_id: str,
    query_vec: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self-matches by
    id). Deterministic ties: (cosine desc, corpus id asc).

    Returns (query_id, corpus_id, rank, cos).
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("__qid"),
            F.col(query_vec).cast("array<double>").alias("__qv"),
        )
    )
    c = corpus.select(
        F.col(corpus_id).alias("__cid"),
        F.col(corpus_vec).cast("array<double>").alias("__cv"),
    )
    pairs = c.crossJoin(q).filter(F.col("__cid") != F.col("__qid"))
    scored = pairs.select(
        "__qid", "__cid", cosine(F.col("__qv"), F.col("__cv")).alias("__cos")
    )
    w = Window.partitionBy("__qid").orderBy(F.col("__cos").desc(), F.col("__cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            "rank",
            F.round("__cos", 6).alias("cos"),
        )
    )


def hyperplane_component(bit: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1),
    derived from md5 of "bit,dim" — reproducible in any engine (the
    duckdb oracle inlines the same literals), no RNG state."""
    import hashlib

    h = int(hashlib.md5(f"{bit},{d}".encode()).hexdigest()[:15], 16)
    return (h % 2000) / 1000.0 - 1.0


def lsh_bucket(vec: Column, dim: int, nbits: int = 8) -> Column:
    """Sign-random-projection bucket id: bit j = 1 iff dot(vec, H_j) > 0,
    packed into a BIGINT. H_j components are plan-time literals, so at
    runtime this is ``nbits`` multiply-add folds over the vector, fully
    codegen'd."""
    bits = []
    for j in range(nbits):
        proj = None
        for d in range(dim):
            term = F.element_at(vec, d + 1) * F.lit(hyperplane_component(j, d))
            proj = term if proj is None else proj + term
        bits.append(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    corpus_vec: str,
    query_id: str,
    query_vec: str,
    dim: int,
    k: int = 5,
    nbits: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    exact cosine refine inside. Returns (query_id, corpus_id, rank, cos);
    queries whose bucket holds < k neighbors return fewer rows — the
    standard ANN recall trade-off."""
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("__qid"),
            F.col(query_vec).cast("array<double>").alias("__qv"),
        ).withColumn("__b", lsh_bucket(F.col("__qv"), dim, nbits))
    )
    c = corpus.select(
        F.col(corpus_id).alias("__cid"),
        F.col(corpus_vec).cast("array<double>").alias("__cv"),
    ).withColumn("__b", lsh_bucket(F.col("__cv"), dim, nbits))

    pairs = c.join(q, "__b").filter(F.col("__cid") != F.col("__qid"))
    scored = pairs.select(
        "__qid", "__cid", cosine(F.col("__qv"), F.col("__cv")).alias("__cos")
    )
    w = Window.partitionBy("__qid").orderBy(F.col("__cos").desc(), F.col("__cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            "rank",
            F.round("__cos", 6).alias("cos"),
        )
    )
