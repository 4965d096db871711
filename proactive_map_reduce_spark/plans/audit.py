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
    """Number of hash/range shuffle exchanges — the data-volume shuffles
    that dominate at 100 TB. Broadcast exchanges are excluded (cheap),
    and so are the OTHER two shuffle kinds, which have their own counter
    (``exchange_counts``) and their own pinned budgets:
    SinglePartition (post-aggregation tiny-data funnels, e.g. a global
    top-k limit) and RoundRobinPartitioning (``ensure_parallelism``'s
    conditional local-fixture repartition, absent at production split
    counts — blending it in here would mis-describe the 100 TB plan)."""
    plan = simple_plan(df)
    return len(re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning)", plan))


def exchange_counts(df: DataFrame) -> dict[str, int]:
    """Every shuffle-exchange kind in the static plan, separately:
    {'hash': hash/range, 'single': SinglePartition, 'roundrobin':
    RoundRobinPartitioning}. A refactor that sneaks in a global funnel
    or a stray repartition() regresses a class-specific pinned budget
    even when the hash/range count is unchanged."""
    plan = simple_plan(df)
    return {
        "hash": len(re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning)", plan)),
        "single": len(re.findall(r"\bExchange SinglePartition", plan)),
        "roundrobin": len(re.findall(r"\bExchange RoundRobinPartitioning", plan)),
    }


def has_broadcast_join(df: DataFrame) -> bool:
    plan = simple_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


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
