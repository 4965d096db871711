"""Physical-plan audits: make "is this the plan you'd want at 100 TB?"
checkable in tests instead of a manual .explain() read.

Used by tests/test_plans.py to pin the scale-critical properties of the
headline queries: filters reach the parquet scan, small dims broadcast,
shuffle counts don't regress, Python only at declared UDF seams.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (AQE pre-execution
    view). Broadcast exchanges are excluded — they're the cheap kind."""
    plan = simple_plan(df)
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df) or "BroadcastNestedLoopJoin" in simple_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan in the plan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan — column-pruning evidence."""
    return re.findall(r"ReadSchema: (\S+)", formatted_plan(df))


def python_eval_nodes(df: DataFrame) -> int:
    """Count of Python-evaluation operators (UDF seams). Hot paths should
    keep this at the declared seam count, not grow per refactor."""
    plan = simple_plan(df)
    return sum(plan.count(op) for op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"))
