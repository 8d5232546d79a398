"""Z-order (Morton) keys — the multi-column data-layout lever at 100 TB.

Parquet prunes row groups by per-column min/max statistics, but a table
sorted by one column has random scatter in every other column, so
filters on the second dimension prune nothing. Interleaving the bits of
two bucketed dimensions into one sort key clusters BOTH dimensions at
once: after `repartitionByRange(morton) + sortWithinPartitions(morton)`
every row group covers a small (dim1, dim2) bounding box and filters on
EITHER column skip most of the file (the Delta/Iceberg OPTIMIZE ZORDER
technique, expressed as plain Spark: the key is just a column, the
layout is just a sorted write).

The interleave is pure integer arithmetic (shifts as multiplies/divides,
bit tests as mod — no engine-specific bit intrinsics), so the key is
bit-identical in Spark and DuckDB and the key computation itself is
oracle-checkable. Layout effectiveness (row-group bounding boxes) is
asserted from parquet footer statistics in
tests/test_operators_unit.py::test_zorder_layout_clusters_row_groups.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_key(a: Column, b: Column, bits: int = 8) -> Column:
    """Interleave the low ``bits`` of two non-negative int columns:
    result bit 2i = bit i of ``a``, bit 2i+1 = bit i of ``b``.

    Shifts are floor(x / 2^i) — explicit floor, because a bare
    CAST(double AS BIGINT) TRUNCATES in Spark but ROUNDS in DuckDB, the
    classic silent cross-engine divergence."""
    acc = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.floor(a.cast("long") / F.lit(2**i)).cast("long") % 2
        bbit = F.floor(b.cast("long") / F.lit(2**i)).cast("long") % 2
        acc = acc + abit * F.lit(2 ** (2 * i)) + bbit * F.lit(2 ** (2 * i + 1))
    return acc


def morton_key_sql(a: str, b: str, bits: int = 8) -> str:
    """SQL twin: identical arithmetic (explicit floor), identical order."""
    terms = []
    for i in range(bits):
        abit = f"(CAST(floor(CAST(({a}) AS BIGINT) / {2**i}) AS BIGINT) % 2)"
        bbit = f"(CAST(floor(CAST(({b}) AS BIGINT) / {2**i}) AS BIGINT) % 2)"
        terms.append(f"{abit} * {2 ** (2 * i)} + {bbit} * {2 ** (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
