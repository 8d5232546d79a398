"""Differential-oracle parity for every registered query — the local
mirror of the driver's correctness gate. Runs at sf0.001 for speed;
set SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.01 to run the t2 scale."""

from __future__ import annotations

import os

import pytest

from fink_science_spark.oracle import compare, duckdb_connection

PARITY_SF = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")


def _registry():
    import __spark_entry__ as entrymod

    return entrymod.queries(), entrymod.oracle_sql()


QUERIES, ORACLES = _registry()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb_connection(PARITY_SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, oracle_con):
    df = QUERIES[name](spark, PARITY_SF)
    if name not in ORACLES:
        # rows-only check (non-SQL-expressible operator)
        assert df.count() >= 0
        return
    res = compare(name, df, oracle_con, ORACLES[name])
    assert res.ok, f"{name}: {res.detail} (spark={res.spark_rows} oracle={res.oracle_rows})"
    assert res.spark_rows > 0, f"{name}: empty result weakens the check"
