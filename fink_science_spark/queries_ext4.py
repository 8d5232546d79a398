"""Query registry, wave 5: the remote-service crossmatch pipeline
(pluggable-transport cdsxmatch shape), bucketed co-located joins, and
partition-pruned scans — storage-layout operators that decide shuffle and
scan cost at 100 TB, each with a duckdb oracle.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fink_science_spark.operators.remote import local_table_resolver, service_xmatch
from fink_science_spark.queries import _t

_SCRATCH = "/root/repo/_scratch"
_XMATCH_RADIUS = 10.0


# --------------------------------------------------------------------------
# Remote-service crossmatch (§2.1 HTTP source / §2.3 remote service join)
# --------------------------------------------------------------------------


def q_remote_xmatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full cdsxmatch pipeline (reference:
    ztf/xmatch/processor.py:124-195): batch positions through a transport,
    arg-min dedup the returned candidates, left join back, "Unknown" fill.
    Transport here is the deterministic local resolver (supplier table as
    the 'remote catalog', loaded once per worker via ExecutorRegistry);
    production swaps in the HTTP POST callable — the pipeline is
    transport-agnostic by construction."""
    sup_path = os.path.join(sf_dir, "supplier.parquet")

    def load_catalog():
        import pandas as pd

        return pd.read_parquet(sup_path, columns=["s_suppkey", "s_acctbal"])

    transport = local_table_resolver(
        load_catalog,
        registry_key=f"supplier_catalog:{sup_path}",
        coord_col="c_acctbal",
        name_col="s_suppkey",
        ref_coord_col="s_acctbal",
        radius=_XMATCH_RADIUS,
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    out = service_xmatch(
        cust, "c_custkey", ["c_acctbal"], transport, out_col="xmatch"
    )
    return out.select(
        "c_custkey", "xmatch", F.round("xmatch_dist", 6).alias("xmatch_dist")
    )


ORACLE_REMOTE_XMATCH = f"""
WITH cand AS (
  SELECT c_custkey, s_suppkey::VARCHAR AS name,
         abs(c_acctbal - s_acctbal) AS dist
  FROM customer, supplier
  WHERE abs(c_acctbal - s_acctbal) <= {_XMATCH_RADIUS}
),
best AS (
  SELECT c_custkey, name, dist FROM (
    SELECT *, row_number() OVER (PARTITION BY c_custkey
                                 ORDER BY dist ASC, name ASC) AS rn
    FROM cand
  ) WHERE rn = 1
)
SELECT c.c_custkey,
       coalesce(b.name, 'Unknown') AS xmatch,
       round(b.dist, 6)            AS xmatch_dist
FROM customer c LEFT JOIN best b USING (c_custkey)
"""


# --------------------------------------------------------------------------
# Bucketed co-located join (§4 partitioning: shuffle-free fact joins)
# --------------------------------------------------------------------------


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table join: both fact tables written bucketed+sorted by
    the join key, then joined WITHOUT a shuffle (bucket pruning replaces
    the exchange — the storage-layout answer to repeated big joins at
    100 TB; see test_plans for the no-Exchange assertion)."""
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    lt, ot = f"b_lineitem_{tag}", f"b_orders_{tag}"

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    (
        li.write.mode("overwrite")
        .option("path", os.path.join(_SCRATCH, lt))
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(lt)
    )
    (
        orders.write.mode("overwrite")
        .option("path", os.path.join(_SCRATCH, ot))
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(ot)
    )
    jl, jo = spark.table(lt), spark.table(ot)
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        jl.join(jo, jl.l_orderkey == jo.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.round(revenue, 2).alias("revenue"), F.count("*").alias("n_items"))
    )


ORACLE_BUCKETED_JOIN = """
SELECT o_orderstatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# Partition-pruned scan (§4 partition pruning)
# --------------------------------------------------------------------------


def q_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout: events written partitionBy(event_type),
    read back with a partition filter — the scan touches ONE partition
    directory (PartitionFilters in the plan), the disk-layout form of the
    reference's manual dec-band pruning (SURVEY §4 partition pruning)."""
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    path = os.path.join(_SCRATCH, f"events_by_type_{tag}")
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "value", "event_type")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    return back.groupBy("user_id").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )


ORACLE_PARTITIONED_SCAN = """
SELECT user_id, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events WHERE event_type = 'purchase'
GROUP BY user_id
"""


QUERIES_EXT4: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "remote_xmatch": q_remote_xmatch,
    "bucketed_join": q_bucketed_join,
    "partitioned_scan": q_partitioned_scan,
}

ORACLES_EXT4: dict[str, str] = {
    "remote_xmatch": ORACLE_REMOTE_XMATCH,
    "bucketed_join": ORACLE_BUCKETED_JOIN,
    "partitioned_scan": ORACLE_PARTITIONED_SCAN,
}
