"""Slowly-changing-dimension type 2 history (warehouse modeling layer).

The reference's warehouse contract is append-only accumulation
(spark-bq-dag.py:120-126 WRITE_APPEND); the question every consumer of
an append table eventually asks is "what was the attribute value AT
time t?".  SCD-2 answers it by collapsing a change stream into
validity intervals: one row per (key, run of identical attributes)
with ``[valid_from, valid_to)`` bounds, ``valid_to IS NULL`` marking
the current version (Kimball's type-2 dimension).

Dataflow — classic gaps-and-islands, all relational:
  change flag (null-safe lag inequality) → running sum = run id →
  per-run aggregate → lead(valid_from) = exclusive upper bound.

Scale: one shuffle on the key columns; both windows and the aggregate
reuse that partitioning (Catalyst plans a single Exchange), and runs
compress the output to O(actual changes), not O(events).  Skewed keys
(one entity with millions of updates) are the operator's hazard — the
per-key window is sequential — but dimension keys are low-churn by
definition; a pathological key indicates upstream duplication, which
exact dedup (queries_llm dedup_exact) removes first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    updates: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak: str,
    version_col: str = "version",
) -> DataFrame:
    """Collapse a change stream into SCD-2 rows.

    Returns one row per (key, run of identical ``attr_cols`` values in
    ``ts_col`` order, ties broken by ``tiebreak`` for determinism):
    key columns, attribute columns, ``version`` (1-based, chronological
    per key), ``valid_from`` (first ts of the run), ``valid_to`` (next
    run's valid_from; NULL for the current version) and ``n_updates``
    (rows collapsed into the run).
    """
    order = [F.col(ts_col), F.col(tiebreak)]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    chg: Column = F.lit(False)
    for a in attr_cols:
        # eqNullSafe: NULL->value and value->NULL are real changes,
        # NULL->NULL is not — plain != would silently drop all three
        chg = chg | ~F.lag(F.col(a)).over(w).eqNullSafe(F.col(a))
    # first row per key: lag is NULL on every attr -> eqNullSafe False
    # for non-null attrs, but all-NULL attrs need the explicit flag
    chg = chg | (F.row_number().over(w) == F.lit(1))
    runs = updates.withColumn(
        "__run",
        F.sum(F.when(chg, 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    agg = runs.groupBy(*key_cols, "__run").agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_updates"),
        # attrs are constant within a run by construction
        *[F.min(a).alias(a) for a in attr_cols],
    )
    w2 = Window.partitionBy(*key_cols).orderBy("__run")
    return agg.select(
        *key_cols,
        *attr_cols,
        F.col("__run").alias(version_col),
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_updates",
    )


def current_version(history: DataFrame) -> DataFrame:
    """The live row per key from an SCD-2 table."""
    return history.filter(F.col("valid_to").isNull())
