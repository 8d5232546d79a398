"""Alert-shaped nested data model built from a flat event stream.

The reference's primary table is one row per alert: a ``candidate`` struct
(current measurement) plus a ``prv_candidates`` array<struct> (the
embedded, time-ordered history) — FIXTURES.md §1, consumed via nested
field access everywhere (e.g. candidate.ra, ztf/xmatch/processor.py:271).
The driver's synthetic testdata is flat, so this module materializes the
same nested shape from ``events``: per key, the latest event becomes
``candidate`` and all earlier events become ``prv_candidates`` (oldest →
newest) — after which every history operator (concat_col and the array
kernel) runs on the REAL nested layout the reference processes.

One shuffle (groupBy key + sorted collect_list), then pure array slicing.
At 100 TB this is the standard sessionization shape: uniform key spread,
bounded per-key history, map-side partial collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_alerts(
    events: DataFrame,
    key: str,
    order: str,
    fields: list[str],
) -> DataFrame:
    """One nested alert row per key: ``candidate`` = struct of the latest
    event's fields, ``prv_candidates`` = array<struct> of all earlier
    events in ascending ``order``. Keys with a single event get an empty
    (not null) history, matching the alert contract."""
    struct_col = F.struct(F.col(order).alias(order), *[F.col(f) for f in fields])
    grouped = events.groupBy(key).agg(
        F.array_sort(F.collect_list(struct_col)).alias("__all")
    )
    return grouped.select(
        F.col(key),
        F.element_at("__all", -1).alias("candidate"),
        F.slice("__all", 1, F.size("__all") - 1).alias("prv_candidates"),
    )
