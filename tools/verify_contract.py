#!/usr/bin/env python
"""Drive the driver contract end-to-end on a VANILLA SparkSession — the
repo's /verify recipe as a single command (see .claude/skills/verify).

Vanilla session on purpose: the external driver builds its own session,
so this catches dependencies on our tuned factory (Arrow configs,
nanosAsLong, shuffle width). Runs entry(), every queries()[name] vs its
oracle_sql()[name] at the given SF through the same comparison the
local harness uses, and asserts session state is not leaked.

Usage: python tools/verify_contract.py [sf_dir] [name_substring ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    from fink_science_spark.oracle import compare, duckdb_connection

    print("entry rows:", len(entrymod.entry(spark).collect()), flush=True)
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb_connection(sf)
    bad = []
    run = 0
    for name in sorted(qs):
        if only and not any(pat in name for pat in only):
            continue
        run += 1
        try:
            df = qs[name](spark, sf)
            if name in osql:
                r = compare(name, df, con, osql[name])
                if not r.ok:
                    bad.append((name, r.detail[:200]))
            else:
                assert df.count() >= 0
        except Exception as ex:  # noqa: BLE001 - collect every failure
            bad.append((name, repr(ex)[:200]))
    assert spark.conf.get("spark.sql.shuffle.partitions") == "8", (
        "session config leaked"
    )
    for name, detail in bad:
        print(f"FAIL {name}: {detail}", flush=True)
    print(f"contract: {run} queries at {sf}, {len(bad)} failures", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
