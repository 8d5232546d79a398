"""As-of (nearest-earlier) join — the time-series alignment operator.

Spark has no ASOF JOIN; the distributed-native formulation is the
union-and-scan trick: tag both sides, union on a common schema, sort each
key partition once by (time, side), and carry the right side's payload
forward with ``last(..., ignorenulls=True)`` over an unbounded-preceding
frame. One shuffle on the key, one ordered scan — no range join, no
per-row probe. Ties (right.ts == left.ts) match, mirroring standard
ASOF `<=` semantics (and DuckDB's ASOF JOIN, which the oracle uses).

This generalizes the reference's "last measurement in the same filter,
walking back" lookback (get_last_alert,
ztf/fast_transient_rate/processor.py:33-115) from within-row history
arrays to ACROSS-table alignment — the join a training-data pipeline
needs to attach the latest prior feature snapshot to each example.

At 100 TB: both sides shuffle once on the key; per-key data is
time-bounded; the window scan is streaming (no buffering beyond the
carried payload).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the right row with the largest
    ``right_ts <= left_ts`` within the same ``key`` (backward as-of).

    Returns all left columns + one ``asof_{v}`` per right value column +
    ``asof_ts`` (the matched right timestamp; null when no match and
    ``how='left'``). ``how='inner'`` drops unmatched left rows."""
    lcols = left.columns
    l = left.withColumn("__t", F.col(left_ts)).withColumn("__side", F.lit(0))
    for v in right_values:
        l = l.withColumn(f"__rv_{v}", F.lit(None).cast(right.schema[v].dataType))
    l = l.withColumn("__rt", F.lit(None).cast(right.schema[right_ts].dataType))

    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(v).alias(f"__rv_{v}") for v in right_values],
        F.col(right_ts).alias("__rt"),
    )
    for c in lcols:
        if c not in (key,):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l.select(
        *lcols, "__t", "__side", *[f"__rv_{v}" for v in right_values], "__rt"
    ).unionByName(
        r.select(
            *lcols, "__t", "__side", *[f"__rv_{v}" for v in right_values], "__rt"
        )
    )

    # right rows sort BEFORE left rows at equal time (__side desc), so a
    # right row at exactly left_ts is visible to that left row (<=)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t").asc(), F.col("__side").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *lcols,
        "__side",
        *[
            F.last(f"__rv_{v}", ignorenulls=True).over(w).alias(f"asof_{v}")
            for v in right_values
        ],
        F.last("__rt", ignorenulls=True).over(w).alias("asof_ts"),
    )
    out = carried.filter(F.col("__side") == 0).drop("__side")
    if how == "inner":
        out = out.filter(F.col("asof_ts").isNotNull())
    return out
