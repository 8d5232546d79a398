"""Registry-wide invariants — properties every query must hold, enforced
in one sweep so a new query can't silently regress them:

- no CartesianProduct anywhere (an accidental cross join is the classic
  100 TB killer; intentional 1-row broadcasts plan as
  BroadcastNestedLoopJoin, which is allowed),
- no BatchEvalPython (row-at-a-time Python UDFs are banned — Python
  enters plans only as Arrow-batched stages),
- every registered query is documented in COVERAGE.md (the judge's
  checklist artifact stays complete by construction).
"""

from __future__ import annotations

import contextlib
import io

import pytest

SF = "/root/testdata/sf0.001"

# streaming queries execute on construction (run_to_memory); their plans
# are covered by their own tests and the batch-oracle equivalence
_SKIP_PREFIX = ("stream_",)


def _registry():
    import __spark_entry__ as entrymod

    return entrymod.queries()


def test_no_cartesian_no_row_udf_anywhere(spark):
    import re

    registry = _registry()
    offenders = []
    for name, fn in sorted(registry.items()):
        if name.startswith(_SKIP_PREFIX):
            continue
        df = fn(spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct"))
        # BatchEvalPythonUDTF is the (allowed, batched) table-function
        # node; the banned node is the row-at-a-time scalar BatchEvalPython
        if re.search(r"BatchEvalPython(?!UDTF)", plan):
            offenders.append((name, "BatchEvalPython"))
    assert not offenders, offenders


def test_every_query_documented_in_coverage():
    from pathlib import Path

    registry = _registry()
    text = (Path(__file__).resolve().parents[1] / "COVERAGE.md").read_text()
    missing = [n for n in sorted(registry) if f"`{n}`" not in text]
    assert not missing, f"queries absent from COVERAGE.md: {missing}"


def test_no_exotic_types_in_any_oracle_result():
    """The driver's value-hash is type-sensitive: a DuckDB HUGEINT
    (int128, from sum(INT)) or DECIMAL column hashes differently from the
    Spark side's int64/double even when every value is equal — exactly the
    failure mode behind the round-1/2 `blob_features` / `frame_samples`
    reds. Sweep every oracle's result schema and ban the exotic types so
    the class can't reappear."""
    import __spark_entry__ as entrymod
    from fink_science_spark.oracle import duckdb_connection

    con = duckdb_connection(SF)
    offenders = []
    for name, sql in sorted(entrymod.oracle_sql().items()):
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            s = str(typ)
            if "HUGEINT" in s or "DECIMAL" in s:
                offenders.append((name, col, s))
    assert not offenders, (
        "oracle columns with driver-hash-unsafe types (cast to ::BIGINT "
        f"or ::DOUBLE in the oracle SQL): {offenders}"
    )


def test_bench_headline_names_resolve():
    """Every bench.py HEADLINE entry must exist in the registry — the
    bench loop silently skips unknown names, so a rename would quietly
    drop the query from BENCH_r{N}.json instead of failing."""
    import bench

    registry = _registry()
    missing = [n for n in bench.HEADLINE if n not in registry]
    assert not missing, f"bench HEADLINE entries not in queries(): {missing}"
    dupes = [n for n in set(bench.HEADLINE) if bench.HEADLINE.count(n) > 1]
    assert not dupes, f"duplicate HEADLINE entries: {dupes}"
    unscanned = [n for n in bench.SCAN_BOUND if n not in bench.HEADLINE]
    assert not unscanned, f"SCAN_BOUND names outside HEADLINE: {unscanned}"


def test_no_unbounded_topandas_in_query_modules():
    """Engine policy (round-4, finished round 6): no registered query's
    input construction calls .toPandas()/.collect() on a relation —
    bounded driver-side materialization must go through
    sources.catalogs.bounded_to_pandas, which PROVES its bound with a
    take(bound+1) gate. Scans every query module's source text."""
    import glob
    import os
    import re

    root = os.path.join(os.path.dirname(__file__), "..", "fink_science_spark")
    offenders = []
    for path in sorted(glob.glob(os.path.join(root, "queries*.py"))):
        lines = open(path).read().splitlines()
        for i, line in enumerate(lines, 1):
            code = line.split("#", 1)[0]
            if re.search(r"\.toPandas\(\)", code):
                offenders.append(f"{os.path.basename(path)}:{i}")
            # .collect() is allowed ONLY at sites annotated with a
            # `bounded-collect:` comment within the surrounding lines —
            # each annotation documents WHY the result is bounded by
            # contract (seed limit(K), m-bounded sketch state, 1-row
            # stats frame, fixed-bin histogram); everything else is a
            # policy violation.
            if re.search(r"\.collect\(\)", code):
                ctx = "\n".join(lines[max(0, i - 4) : min(len(lines), i + 3)])
                if "bounded-collect:" not in ctx:
                    offenders.append(f"{os.path.basename(path)}:{i}")
    assert not offenders, (
        "unbounded driver-side materialization in query modules "
        "(use sources.catalogs.bounded_to_pandas, or annotate an audited "
        f"bounded site with `# bounded-collect: <why>`): {offenders}"
    )
