"""Plan-inspection helpers: assert that a DataFrame's physical plan has
the shape you'd want on a 1000-executor cluster (filters pushed to the
scan, dims broadcast, codegen spans present).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters fragments of every scan in the plan."""
    plan = formatted_plan(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    pf = pushed_filters(df)
    assert fragment in pf, f"filter {fragment!r} not pushed; scans show:\n{pf}"

def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        "no broadcast join in plan:\n" + plan[:2000]
    )


def count_shuffles(df: DataFrame) -> int:
    return physical_plan(df).count("Exchange")
