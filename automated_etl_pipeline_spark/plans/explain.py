"""Physical-plan inspection helpers — the engine's scale contract made
checkable.

A query that is correct at sf0.01 but mis-planned (filter not pushed to
the scan, dim join shuffling instead of broadcasting, top-k as a global
sort) fails at 100 TB, so plan *shape* is asserted in tests exactly
like result values are (tests/test_plans.py). These helpers expose the
executed plan string and the properties worth asserting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The (possibly adaptive) executed physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(plan: str) -> str:
    """The PushedFilters fragments of every scan node in the plan."""
    return "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)


def read_schemas(plan: str) -> str:
    """The ReadSchema fragments — what each scan actually reads; a
    2-column projection reading 16 columns is a pruning failure."""
    return "\n".join(l for l in plan.splitlines() if "ReadSchema" in l)


def count_node(plan: str, node: str) -> int:
    """Occurrences of a physical operator (e.g. 'BroadcastHashJoin',
    'SortMergeJoin', 'Exchange hashpartitioning', 'HashAggregate',
    'TakeOrderedAndProject', 'BatchEvalPython')."""
    return plan.count(node)


def uses_python_udf(plan: str) -> bool:
    """True if any row-at-a-time Python evaluation appears — the slow
    path that must never show up in JVM-expressible operators."""
    return "BatchEvalPython" in plan or "PythonUDF" in plan
