"""Local differential-oracle harness: run a Spark query and its duckdb
oracle SQL side-by-side and compare order-insensitively.

Mirrors the driver's correctness gate (row-count + schema-insensitive,
column-name-sorted, order-insensitive value comparison) so every operator
is verified locally before it is ever claimed in ``__spark_entry__``.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register each parquet table as a view, as the driver does."""
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon(v):
    """Canonicalize a cell for comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse representational noise AND -0.0/+0.0: round() preserves
        # the zero sign, and the row-sort key stringifies cells, so a -0.0
        # on one side misaligns the sorted row pairing even though
        # -0.0 == 0.0 (surfaced by photometry_conversion at sf0.1)
        return round(v, 9) + 0.0
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except ImportError:  # pragma: no cover
        pass
    return v


def _sort_key(row):
    return tuple(
        (x is None, str(type(x)), str(x)) for x in row
    )


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def compare(name: str, spark_df, con, oracle_sql: str) -> CompareResult:
    spark_cols = sorted(spark_df.columns)
    spark_rows = [
        tuple(_canon(r[c]) for c in spark_cols) for r in spark_df.collect()
    ]

    rel = con.execute(oracle_sql)
    duck_cols_raw = [d[0] for d in rel.description]
    order = sorted(range(len(duck_cols_raw)), key=lambda i: duck_cols_raw[i])
    duck_cols = [duck_cols_raw[i] for i in order]
    duck_rows = [
        tuple(_canon(row[i]) for i in order) for row in rel.fetchall()
    ]

    if spark_cols != duck_cols:
        return CompareResult(
            name, False, len(spark_rows), len(duck_rows),
            f"column mismatch: spark={spark_cols} oracle={duck_cols}",
        )
    if len(spark_rows) != len(duck_rows):
        return CompareResult(
            name, False, len(spark_rows), len(duck_rows), "row count mismatch"
        )
    s = sorted(spark_rows, key=_sort_key)
    d = sorted(duck_rows, key=_sort_key)
    for i, (a, b) in enumerate(zip(s, d)):
        if a != b:
            return CompareResult(
                name, False, len(spark_rows), len(duck_rows),
                f"first diff at sorted row {i}: spark={a!r} oracle={b!r}",
            )
    return CompareResult(name, True, len(spark_rows), len(duck_rows))
