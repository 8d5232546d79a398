"""Mergeable-sketch operators: Bloom-filter join pruning, histogram
quantile sketches, and exact heavy hitters via per-partition candidate
pruning.

These are the "small summary of a huge side" family. At 100 TB the
pattern is always the same: reduce one side of the computation to a
compact, map-side-combinable summary (a bitset, a bin-count vector, a
candidate list), move ONLY the summary across the cluster, and keep the
full-size side in a single narrow scan. Every operator here yields an
EXACT final answer — the sketch only prunes or pre-aggregates; it never
approximates the returned values:

- Bloom pruning has false positives, but survivors still pass the real
  join, so the result equals the plain equi-join.
- The histogram quantile is a deterministic estimator (bin upper edge),
  computed identically in the DuckDB oracle — exact reproducibility,
  documented estimation error bounded by one bin width.
- Heavy hitters uses the Misra-Gries pigeonhole guarantee (any key with
  global frequency > N/m exceeds n_p/m in at least one partition) to
  build a candidate superset, then exact-counts only candidates.

Reference parity note: the reference engine has no sketch family; these
back the same curation queries its users run via full joins/sorts
(SURVEY.md "beyond reference" additions for the training-data pipeline).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# Bloom filter: build a bitset from a key column, probe it as a native
# column predicate.
# --------------------------------------------------------------------------


def _bloom_probe(key: Column, m_bits: int, j: int) -> tuple[Column, Column]:
    """(slot, mask) of hash j for ``key`` in an ``m_bits``-bit bitset.

    xxhash64 is engine-internal here (build and probe use the identical
    Spark expression; the oracle never sees the bitset), so we take the
    fast JVM hash rather than the portable md5 family.
    """
    pos = F.pmod(F.xxhash64(F.lit(j), key), F.lit(m_bits))
    slot = F.shiftright(pos, 6)
    # The DataFrame-API shiftleft only takes a literal shift; the SQL
    # function accepts a column one.
    mask = F.call_function(
        "shiftleft", F.lit(1).cast("long"), pos.bitwiseAND(F.lit(63)).cast("int")
    )
    return slot, mask


def bloom_bits_for(n_keys: int, bits_per_key: int = 16, max_bits: int = 1 << 21) -> int:
    """Power-of-two bitset size targeting ``bits_per_key`` (k=4 hashes at
    16 bits/key → ~0.24% false-positive rate), capped at ``max_bits``
    (2 Mbit = 256 KB of broadcast payload)."""
    m = 1 << 10
    while m < n_keys * bits_per_key and m < max_bits:
        m <<= 1
    return m


def build_bloom_bitset(
    df: DataFrame, key_col: str, m_bits: int, k: int = 4
) -> list[int]:
    """Distributed Bloom build: each key explodes to k (slot, mask)
    pairs, a single hash aggregation bit_or's the masks per slot, and the
    driver assembles the ≤ m_bits/64-long bitset.

    Scale shape: the shuffle carries at most m_bits/64 combined rows of
    two longs each (map-side bit_or collapses duplicates), regardless of
    how many keys the build side holds. The driver collect is bounded by
    the bitset size (256 KB at the cap), never by the data — the same
    bounded-summary contract as the ANN query side (SCALING.md).
    """
    key = F.col(key_col).cast("long")
    probes = F.array(
        *[
            F.struct(s.alias("slot"), m.alias("mask"))
            for s, m in (_bloom_probe(key, m_bits, j) for j in range(k))
        ]
    )
    rows = (
        df.select(F.explode(probes).alias("p"))
        .select("p.slot", "p.mask")
        .groupBy("slot")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    bitset = [0] * (m_bits // 64)
    for r in rows:
        bitset[r["slot"]] = r["bits"]
    return bitset


def _long_array_literal(values: list[int]) -> Column:
    """ONE ArrayType(long) Literal from a large Python list, built fast.

    ``F.lit(list)`` creates CreateArray with one child Literal per element
    (slow plan processing), and ``F.lit(np.int64-array)`` folds to one
    Literal but transfers element-by-element over py4j (~1.1 s at the
    8192-long Bloom bitset size — a DRIVER-side constant paid on every
    fresh plan). Fast path: ship the values as ONE py4j byte[] transfer
    and let java.nio.LongBuffer bulk-fill a long[] JVM-side, then wrap
    ``functions.lit(long[])`` (~10 ms). Engine-internal like the xxhash64
    probes; falls back to the numpy literal when no py4j gateway exists
    (e.g. Spark Connect).
    """
    import numpy as np

    from pyspark.sql import SparkSession

    arr = np.asarray(values, dtype=np.int64)
    spark = SparkSession.getActiveSession()
    try:
        jvm = spark._jvm
        gateway = spark._sc._gateway
        bb = jvm.java.nio.ByteBuffer.wrap(bytearray(arr.tobytes()))
        bb.order(jvm.java.nio.ByteOrder.LITTLE_ENDIAN)
        jarr = gateway.new_array(jvm.long, len(arr))
        bb.asLongBuffer().get(jarr)
        return Column(jvm.org.apache.spark.sql.functions.lit(jarr))
    except Exception:  # noqa: BLE001 - no py4j gateway (Connect) → slow path
        return F.lit(arr)


def bloom_might_contain(
    key_col: Column | str, bitset: list[int], m_bits: int, k: int = 4
) -> Column:
    """Native (codegen) membership test: AND over the k probe bits.

    The bitset travels as an array<long> literal inside the plan — it is
    serialized per task with the expression tree, not per row, and the
    probe is pure JVM arithmetic (no Python, no join, no shuffle).

    Deliberately a FLAT conjunction of k element_at checks, NOT a
    ``forall`` over a positions array: higher-order-function lambdas are
    interpreted expressions outside whole-stage codegen, and the
    interpreted probe measured 5× slower on the sf0.1 fact scan (4.6 s
    vs 0.9 s) — the codegen-hostile-HOF lesson of operators/dedup. The
    k literal copies cost plan bytes (≤ k × 256 KB at the size cap),
    which execution never feels.
    """
    if k <= 0:
        # zero probes = no pruning information: pass everything (the
        # join downstream stays exact), matching the vacuous-forall
        # semantics of the original formulation.
        return F.lit(True)
    key = (F.col(key_col) if isinstance(key_col, str) else key_col).cast("long")
    arr = _long_array_literal(bitset)
    pred = None
    for j in range(k):
        slot, mask = _bloom_probe(key, m_bits, j)
        hit = (
            F.element_at(arr, (slot + F.lit(1)).cast("int")).bitwiseAND(mask)
        ) != F.lit(0)
        pred = hit if pred is None else (pred & hit)
    return pred


# --------------------------------------------------------------------------
# Equi-width histogram quantile sketch.
# --------------------------------------------------------------------------


def histogram_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bins: int = 256,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    q_names: tuple[str, ...] = ("p50", "p90", "p99"),
) -> DataFrame:
    """Quantile estimates from an equi-width histogram: per group, the
    upper edge of the first bin whose cumulative count reaches ceil(q*n).

    Why not exact ``percentile``: the exact form shuffles EVERY value to
    its group. The sketch shuffles at most ``groups × bins`` partial
    counts (map-side combined), a constant-size summary at any data
    scale, at the price of a deterministic ≤ one-bin-width estimation
    error. The two-pass shape (global min/max, then binning) is two
    narrow scans — at 100 TB the bounds pass is usually replaced by
    static domain metadata; the operator takes the same plan either way.

    Determinism contract: bucket = least(bins-1, floor((v-lo)/(hi-lo)*bins))
    and edge = lo+(b+1)*(hi-lo)/bins are fixed IEEE-double expression
    trees, reproduced textually in the DuckDB oracle — no float summation
    anywhere, so the result is bit-stable across engines.
    """
    v = F.col(value_col).cast("double")
    bounds = df.agg(
        F.min(v).alias("__lo"), F.max(v).alias("__hi"), F.count(v).alias("__nt")
    )
    binned = (
        df.join(F.broadcast(bounds))
        .withColumn(
            "__bucket",
            F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.floor(
                        (v - F.col("__lo"))
                        / (F.col("__hi") - F.col("__lo"))
                        * F.lit(float(bins))
                    ),
                )
            ).cast("long"),
        )
        .groupBy(group_col, "__bucket", "__lo", "__hi")
        .agg(F.count("*").alias("__c"))
    )
    from pyspark.sql.window import Window

    w_cum = (
        Window.partitionBy(group_col)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    cum = binned.withColumn("__cum", F.sum("__c").over(w_cum)).withColumn(
        "__n", F.sum("__c").over(w_all)
    )
    edge = F.col("__lo") + (F.col("__bucket") + F.lit(1)) * (
        F.col("__hi") - F.col("__lo")
    ) / F.lit(float(bins))
    aggs = [F.max("__n").alias("n")]
    for q, qn in zip(qs, q_names):
        tgt = F.ceil(F.lit(q) * F.col("__n"))
        aggs.append(
            F.round(F.min(F.when(F.col("__cum") >= tgt, edge)), 6).alias(qn)
        )
    return cum.groupBy(group_col).agg(*aggs)


def histogram_quantiles_oracle_sql(
    table: str,
    group_col: str,
    value_col: str,
    bins: int = 256,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    q_names: tuple[str, ...] = ("p50", "p90", "p99"),
) -> str:
    """DuckDB twin of :func:`histogram_quantiles` — textually parallel
    float expressions so the estimates match bit-for-bit."""
    q_cols = ",\n       ".join(
        f"round(min(CASE WHEN cum >= ceiling({q!r} * n) THEN edge END), 6) AS {qn}"
        for q, qn in zip(qs, q_names)
    )
    return f"""
WITH bounds AS (
  SELECT min(CAST({value_col} AS DOUBLE)) AS lo,
         max(CAST({value_col} AS DOUBLE)) AS hi
  FROM {table}
),
binned AS (
  SELECT {group_col},
         CASE WHEN hi = lo THEN 0
              ELSE least({bins - 1}, CAST(floor((CAST({value_col} AS DOUBLE) - lo)
                                         / (hi - lo) * {float(bins)!r}) AS BIGINT))
         END AS bucket,
         lo, hi, count(*) AS c
  FROM {table}, bounds
  GROUP BY 1, 2, 3, 4
),
cum AS (
  SELECT {group_col}, bucket,
         lo + (bucket + 1) * (hi - lo) / {float(bins)!r} AS edge,
         sum(c) OVER (PARTITION BY {group_col} ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum,
         sum(c) OVER (PARTITION BY {group_col})::BIGINT AS n
  FROM binned
)
SELECT {group_col}, max(n)::BIGINT AS n,
       {q_cols}
FROM cum
GROUP BY {group_col}
"""


# --------------------------------------------------------------------------
# Exact heavy hitters with per-partition candidate pruning.
# --------------------------------------------------------------------------


def heavy_hitter_candidates(df: DataFrame, text_col: str, m: int) -> list[str]:
    """Candidate tokens: everything whose LOCAL frequency exceeds
    n_partition/m in any partition.

    Pigeonhole guarantee (Misra-Gries): if a token's global count exceeds
    N/m, then in at least one partition its local count exceeds that
    partition's n_p/m — so this set is a SUPERSET of the true heavy
    hitters under any partitioning, and the exact counting pass below
    makes the final answer partitioning-independent.

    Each partition emits fewer than m candidate rows (a local share
    > 1/m can hold for < m tokens), so the collect is bounded by
    m × num_partitions strings — a driver-side summary, not data.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Vectorized tokenize+count (C-speed): a per-token Python loop
        # measured ~4.4× wall growth at ×4 data purely from interpreter
        # constants; str.split/explode/value_counts keeps the candidate
        # pass linear with a small constant.
        parts = []
        for pdf in batches:
            toks = pdf[text_col].dropna().str.split(" ").explode()
            parts.append(toks[toks != ""].value_counts())
        if not parts:
            yield pd.DataFrame({"token": pd.Series([], dtype="object")})
            return
        counts = pd.concat(parts).groupby(level=0).sum()
        total = int(counts.sum())
        yield pd.DataFrame({"token": counts.index[counts * m > total]})

    rows = (
        df.select(text_col)
        .mapInPandas(gen, schema="token string")
        .distinct()
        .collect()
    )
    return sorted(r["token"] for r in rows)


def heavy_hitters(df: DataFrame, text_col: str, m: int = 35) -> DataFrame:
    """Tokens with global frequency > N/m, with exact counts and shares.

    Two passes over the text, NO full-vocabulary shuffle:
    1. Arrow candidate scan (:func:`heavy_hitter_candidates`) — output
       bounded by m per partition.
    2. Native tokenize → ``isin(candidates)`` filter → hash-aggregate
       count. The filter runs BEFORE the exchange, so the shuffle carries
       only candidate-token partial counts instead of the whole
       vocabulary — at web scale that is the difference between shuffling
       billions of distinct tokens and a few hundred rows.

    The global-threshold filter at the end (cnt*m > N) discards any
    candidate that was only locally hot, making the result exact and
    partitioning-independent.
    """
    cands = heavy_hitter_candidates(df, text_col, m)
    toks = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).filter(F.col("token") != "")
    totals = toks.agg(F.count("*").alias("__nt"))
    return (
        toks.filter(F.col("token").isin(cands))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .join(F.broadcast(totals))
        .filter(F.col("cnt") * F.lit(m) > F.col("__nt"))
        .select(
            "token",
            "cnt",
            F.round(F.col("cnt") / F.col("__nt"), 6).alias("share"),
        )
    )
