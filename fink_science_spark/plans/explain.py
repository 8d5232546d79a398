"""Plan-inspection helpers: assert the physical plan is the one we want.

"Correct but 10× slower" is a bug at 100 TB; these helpers make plan
properties (pushdown, pruning, broadcast, codegen) testable facts instead
of hopes. Used by the test suite after every operator lands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert the parquet scan carries PushedFilters containing each
    fragment (predicate pushdown reached the source)."""
    plan = formatted_plan(df)
    assert "PushedFilters: [" in plan, f"no pushed filters in plan:\n{plan}"
    for frag in fragments:
        assert frag in plan, f"filter {frag!r} not pushed; plan:\n{plan}"


def assert_read_schema_only(df: DataFrame, table_fragment: str, cols: set[str]) -> None:
    """Assert column pruning: the scan's ReadSchema mentions no column
    outside ``cols``."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line and table_fragment in plan:
            read = line.split("ReadSchema:")[1]
            for token in read.replace("struct<", "").split(","):
                name = token.split(":")[0].strip().strip(">")
                if name and not name.startswith("struct"):
                    assert name in cols, f"unpruned column {name}; plan line: {line}"


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"expected broadcast join; plan:\n{plan}"
    )


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"


def codegen_stage_count(df: DataFrame) -> int:
    return formatted_plan(df).count("WholeStageCodegen")
