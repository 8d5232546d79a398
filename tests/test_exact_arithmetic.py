"""Property-based cross-engine parity for the canonical exact-arithmetic
idioms (functions/exact.py): for ANY 2-dp money value and any integer
ratio inputs, the Spark expression and its DuckDB SQL twin must produce
bit-identical results. This pins the contract the differential oracles
rely on everywhere — engine-free on the DuckDB side, pure-Python
reference on the other — so a drift in either twin's text breaks here
before it breaks a 200-query parity sweep.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fink_science_spark.functions.exact import cents_sql, halfup6_sql

# 2-dp money doubles as shipped in the fixtures (value = cents / 100.0)
money = st.integers(min_value=-(10**9), max_value=10**9).map(
    lambda c: c / 100.0
)


def _duck(expr_sql: str, **params):
    # CAST every param to DOUBLE/BIGINT: a bare literal like 2.675
    # parses as DECIMAL(4,3) and would exercise DuckDB's exact decimal
    # path instead of the double arithmetic the oracles actually run on
    # parquet columns — the whole point is pinning the DOUBLE behavior
    con = duckdb.connect()
    try:
        cols = ", ".join(
            f"CAST({v!r} AS {'DOUBLE' if isinstance(v, float) else 'BIGINT'})"
            f" AS {k}"
            for k, v in params.items()
        )
        return con.execute(
            f"SELECT {expr_sql} AS out FROM (SELECT {cols})"
        ).fetchone()[0]
    finally:
        con.close()


@settings(max_examples=300, deadline=None)
@given(money)
def test_cents_sql_matches_python_floor_halfup(v):
    got = _duck(cents_sql("m"), m=v)
    expected = math.floor(v * 100 + 0.5)  # same double ops, same order
    assert got == expected


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=-(10**12), max_value=10**12),
    st.integers(min_value=1, max_value=10**12),
)
def test_halfup6_sql_matches_python_reference(num, den):
    got = _duck(halfup6_sql("a / b"), a=num, b=den)
    expected = math.floor(num / den * 1e6 + 0.5) / 1e6
    assert got == expected


@settings(max_examples=200, deadline=None)
@given(money, st.integers(min_value=0, max_value=10))
def test_rev_micro_sql_is_exact_integer(price, disc_pct):
    from fink_science_spark.functions.exact import REV_MICRO_SQL

    got = _duck(
        REV_MICRO_SQL, l_extendedprice=abs(price), l_discount=disc_pct / 100.0
    )
    price_cents = math.floor(abs(price) * 100 + 0.5)
    assert got == price_cents * (100 - disc_pct)


@pytest.mark.parametrize(
    "value,expected_cents",
    [
        (0.005, 1),       # half-up at the boundary, not banker's
        (0.015, 2),       # 0.015 stores as 0.01499999... -> *100+0.5
        (-0.005, 0),      # floor(+0.5) on negatives: -0.5+0.5 = 0
        (2.675, 268),
    ],
)
def test_cents_boundary_pins(value, expected_cents):
    got = _duck(cents_sql("m"), m=value)
    assert got == expected_cents == math.floor(value * 100 + 0.5)
