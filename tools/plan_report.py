"""Plan audit: one-line physical-plan summary per gate query.

Usage: python tools/plan_report.py [sf_dir]

Prints, per query: hash/broadcast/range exchange counts, join
strategies, aggregate count, TakeOrderedAndProject presence, and
whether any row-wise Python evaluation leaked in. The quick way to
spot a query whose plan regressed (a dim join gone sort-merge, a
top-k gone global-sort) before it costs anything at scale.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from automated_etl_pipeline_spark.plans.explain import executed_plan  # noqa: E402
from automated_etl_pipeline_spark.session import get_spark  # noqa: E402


def summarize(plan: str) -> str:
    marks = []
    for node, label in (
        ("Exchange hashpartitioning", "xchg"),
        ("Exchange rangepartitioning", "range-xchg"),
        ("BroadcastHashJoin", "bhj"),
        ("SortMergeJoin", "smj"),
        ("BroadcastNestedLoopJoin", "BNLJ!"),
        ("HashAggregate", "agg"),
        ("TakeOrderedAndProject", "topk"),
        ("Window", "win"),
        ("Generate explode", "explode"),
    ):
        n = plan.count(node)
        if n:
            marks.append(f"{label}x{n}")
    if "BatchEvalPython" in plan or "PythonUDF" in plan:
        marks.append("PYTHON-UDF!")
    return " ".join(marks) or "scan-only"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entry

    # no console progress bars: the \r fragments glue onto report lines
    # when redirected to a file (VERDICT r12 harness nit #2)
    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = entry.queries()
    for name in sorted(qs):
        try:
            print(f"{name:32s} {summarize(executed_plan(qs[name](spark, sf_dir)))}")
        except Exception as ex:  # noqa: BLE001
            print(f"{name:32s} ERROR {str(ex)[:80]}")
    spark.stop()


if __name__ == "__main__":
    main()
