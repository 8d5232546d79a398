"""Exact cross-engine arithmetic idioms — the canonical home.

Money sums accumulate as exact integer cents / basis-point micro-units
and ratios round half-up at 6 decimals via the shared floor idiom, so
no registered query ever depends on float accumulation order (the
snapshot_diff lesson: a double revenue sum diverged between engines at
sf0.1). Each helper has a DuckDB-SQL twin with the IDENTICAL arithmetic
shape — new queries should take both from here rather than re-deriving
the expressions, so the rounding contract cannot drift per file.
(Earlier waves carry local copies that predate this module; they are
textually identical.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def halfup6(col: Column) -> Column:
    """Round-half-up at 6 decimals — engine-agnostic for ratios of
    exact integers (never Python round(): banker's, nor F.round on a
    .xxx5 boundary of a float sum)."""
    return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def halfup6_sql(expr: str) -> str:
    """The DuckDB twin of :func:`halfup6`, identical op order."""
    return f"floor({expr} * 1e6 + 0.5) / 1e6"


def cents(col: str) -> Column:
    """Exact integer cents of a 2-dp money double (half-up)."""
    return F.floor(F.col(col) * F.lit(100) + F.lit(0.5)).cast("long")


def cents_sql(col: str) -> str:
    """The DuckDB twin of :func:`cents`, identical op order."""
    return f"CAST(floor({col} * 100 + 0.5) AS BIGINT)"


def rev_micro() -> Column:
    """lineitem revenue l_extendedprice*(1-l_discount) in exact
    1e-4-dollar micro-units: price_cents * (100 - disc_cents)."""
    return cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))


REV_MICRO_SQL = (
    f"{cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})"
)
