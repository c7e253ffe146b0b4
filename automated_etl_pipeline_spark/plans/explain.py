"""Physical-plan inspection helpers — the engine's scale contract made
checkable.

A query that is correct at sf0.01 but mis-planned (filter not pushed to
the scan, dim join shuffling instead of broadcasting, top-k as a global
sort) fails at 100 TB, so plan *shape* is asserted in tests exactly
like result values are (tests/test_plans.py). These helpers expose the
executed plan string and the properties worth asserting.
"""

from __future__ import annotations

import re

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


# --- forced-broadcast guard (the 100-TB OOM class) -------------------

# Tables whose row count scales with SF: a FORCED broadcast hint on an
# un-reduced scan of any of these overrides AQE's size check and ships
# the whole table to every executor — fine at sf0.1, OOM at 100 TB.
# Identified in the analyzed plan by a column only that table has.
_SF_SCALING_MARKERS = {
    "l_orderkey#": "lineitem",
    "o_orderkey#": "orders",
    "c_custkey#": "customer",
    "p_partkey#": "part",
    "s_suppkey#": "supplier",
    "doc_id#": "documents",
    "vec_id#": "embeddings",
    "event_id#": "events",
}

# Logical nodes that reduce (or bound) cardinality between the hint and
# the scan, making the broadcast size independent of —or sub-linear in—
# total data size: filters, aggregates, limits, samples, dedup.
_REDUCING_NODES = (
    "Filter",
    "Aggregate",
    "GlobalLimit",
    "LocalLimit",
    "Limit",
    "Sample",
    "Deduplicate",
    "Intersect",
    "Except",
)


def _node_depth_and_name(line: str) -> tuple[int, str]:
    """(tree depth as prefix length, node text) for one analyzed-plan
    line. Tree prefixes are '[ :]*' runs ending in ':- ' or '+- '
    (3 chars per level); the root line has no prefix (depth -1)."""
    m = re.match(r"^([ :]*)[+:]- (.*)$", line)
    if m:
        return len(m.group(1)), m.group(2)
    return -1, line.strip()


def forced_broadcast_violations(df: DataFrame) -> list[str]:
    """SF-scaling tables broadcast-hinted with NO cardinality-reducing
    node (Filter/Aggregate/Limit/...) between the hint and the scan, in
    the ANALYZED logical plan (before AQE — this is exactly the forced
    hint a user wrote, not a runtime broadcast AQE chose from measured
    sizes, which is always legitimate).

    Returns the offending table names ([] = clean). The repo rule
    (tests/test_plans.py): only fixed-cardinality dims (region/nation)
    or reduced slices may carry an explicit broadcast hint."""
    text = df._jdf.queryExecution().analyzed().toString()
    lines = text.splitlines()
    parsed = [_node_depth_and_name(l) for l in lines]
    out: list[str] = []
    for i, (d, name) in enumerate(parsed):
        if not (name.startswith("ResolvedHint") and "broadcast" in name):
            continue
        j = i + 1
        while j < len(lines) and parsed[j][0] > d:
            jd, jname = parsed[j]
            if jname.startswith("Relation ["):
                table = next(
                    (t for k, t in _SF_SCALING_MARKERS.items() if k in jname),
                    None,
                )
                if table is not None:
                    # ancestor walk relation -> hint: is any ancestor
                    # a reducing node?
                    reduced = False
                    cur = jd
                    for k in range(j - 1, i, -1):
                        kd, kname = parsed[k]
                        if kd < cur:
                            cur = kd
                            if kname.startswith(_REDUCING_NODES):
                                reduced = True
                                break
                    if not reduced:
                        out.append(table)
            j += 1
    return out
