"""Query registry, wave 11: the mergeable-sketch family.

Bloom-filter runtime join pruning, histogram quantile sketches, and
exact heavy hitters — the "compact summary of a huge side" operators a
100 TB curation pipeline leans on once full shuffles stop being an
option (operators/sketches.py for the scale arguments). All three
return EXACT answers; the sketch only prunes or pre-aggregates.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fink_science_spark.operators.sketches import (
    bloom_bits_for,
    bloom_might_contain,
    build_bloom_bitset,
    heavy_hitters,
    histogram_quantiles,
    histogram_quantiles_oracle_sql,
)

# --------------------------------------------------------------------------
# bloom_prune_join: revenue of lineitems belonging to urgent high-value
# orders, with the fact side pruned by a Bloom bitset of the dim keys
# BEFORE any join machinery runs.
#
# At 100 TB the dim side (here: filtered orders) is often too large to
# broadcast as a hash table but its KEY SET fits a few hundred KB of
# Bloom bits. The bitset probe is a pure codegen predicate on the fact
# scan, so ~99.8% of non-matching lineitems (fp ≈ 0.24% at 16 bits/key)
# never reach the join exchange. False positives are eliminated by the
# real equi-join that follows — the result is exactly the plain join,
# which is what the oracle checks.
# --------------------------------------------------------------------------

_BLOOM_PRICE_MIN = 150_000.0
_BLOOM_K = 4


def q_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    dim = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > F.lit(_BLOOM_PRICE_MIN))
    ).select("o_orderkey")

    n_keys = dim.count()
    m_bits = bloom_bits_for(max(n_keys, 1))
    bitset = build_bloom_bitset(dim, "o_orderkey", m_bits, k=_BLOOM_K)

    pruned = lineitem.filter(
        bloom_might_contain("l_orderkey", bitset, m_bits, k=_BLOOM_K)
    )
    return (
        pruned.join(dim, pruned.l_orderkey == dim.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_BLOOM_PRUNE_JOIN = f"""
SELECT l_returnflag,
       count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN (SELECT o_orderkey FROM orders
      WHERE o_orderpriority = '1-URGENT'
        AND o_totalprice > {_BLOOM_PRICE_MIN!r}) dim
  ON l_orderkey = o_orderkey
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# --------------------------------------------------------------------------
# sketch_quantiles: per-returnflag p50/p90/p99 of extended price from a
# 256-bin equi-width histogram — groups × bins partial counts cross the
# wire instead of every value (operators/sketches.py for the exact-IEEE
# determinism contract shared with the oracle).
# --------------------------------------------------------------------------

_HQ_BINS = 256


def q_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return histogram_quantiles(
        lineitem, "l_returnflag", "l_extendedprice", bins=_HQ_BINS
    ).orderBy("l_returnflag")


ORACLE_SKETCH_QUANTILES = (
    histogram_quantiles_oracle_sql(
        "lineitem", "l_returnflag", "l_extendedprice", bins=_HQ_BINS
    )
    + "ORDER BY l_returnflag"
)

# --------------------------------------------------------------------------
# heavy_hitters: corpus tokens with global share > 1/m, exact counts.
# Candidate pass bounds the shuffle to per-partition-hot tokens (the
# Misra-Gries pigeonhole superset); the global filter restores exactness.
# --------------------------------------------------------------------------

_HH_M = 35


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return heavy_hitters(docs, "text", m=_HH_M).orderBy("token")


ORACLE_HEAVY_HITTERS = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
t AS (SELECT token FROM toks WHERE token <> ''),
tot AS (SELECT count(*) AS nt FROM t)
SELECT token, count(*)::BIGINT AS cnt,
       round(count(*) / (SELECT nt FROM tot), 6) AS share
FROM t
GROUP BY token
HAVING count(*) * {_HH_M} > (SELECT nt FROM tot)
ORDER BY token
"""

# --------------------------------------------------------------------------

QUERIES_EXT10: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "bloom_prune_join": q_bloom_prune_join,
    "sketch_quantiles": q_sketch_quantiles,
    "heavy_hitters": q_heavy_hitters,
}

ORACLES_EXT10: dict[str, str] = {
    "bloom_prune_join": ORACLE_BLOOM_PRUNE_JOIN,
    "sketch_quantiles": ORACLE_SKETCH_QUANTILES,
    "heavy_hitters": ORACLE_HEAVY_HITTERS,
}
