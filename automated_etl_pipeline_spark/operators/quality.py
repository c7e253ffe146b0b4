"""Declarative data-quality checks (the S5 NOT-NULL load contract of
io/sinks.py generalized to an expectation suite).

Every check compiles to aggregate expressions, so an arbitrary list of
checks over one table costs exactly ONE scan + one (tiny) aggregate —
never a job per check. Results come back as rows
(check_name, passed, n_violations), making the suite itself a
DataFrame: pipeline stages can gate on it, sinks can log it, and the
oracle can recompute it in SQL.

At 100 TB the one-pass property is the whole point: a 20-check suite
on a fact table is one map-side pass with a single-row reduce; the
uniqueness check rides the same aggregate via
count(col) - count(DISTINCT col) (exact; swap in
approx_count_distinct for a cheaper inexact gate).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    violations: Column  # aggregate expression counting violating rows


def not_null(col: str) -> Check:
    return Check(f"not_null_{col}", F.count(F.when(F.col(col).isNull(), 1)))


def in_range(col: str, lo: Any, hi: Any) -> Check:
    return Check(
        f"in_range_{col}",
        F.count(F.when((F.col(col) < lo) | (F.col(col) > hi), 1)),
    )


def accepted_values(col: str, values: list) -> Check:
    return Check(
        f"accepted_values_{col}",
        F.count(F.when(~F.col(col).isin(*values), 1)),
    )


def unique(col: str) -> Check:
    """Non-null duplicates: count(col) - count(DISTINCT col)."""
    return Check(
        f"unique_{col}", F.count(F.col(col)) - F.countDistinct(F.col(col))
    )


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """One aggregate pass → (check_name, passed, n_violations) rows."""
    agg = df.agg(
        *[c.violations.cast("long").alias(c.name) for c in checks]
    )
    stacked = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c.name).alias("check_name"),
                        F.col(c.name).alias("n_violations"),
                    )
                    for c in checks
                ]
            )
        ).alias("r")
    )
    return stacked.select(
        "r.check_name",
        (F.col("r.n_violations") == 0).alias("passed"),
        "r.n_violations",
    )


def fk_audit(
    child: DataFrame,
    fk_col: str,
    parent: DataFrame,
    pk_col: str,
    label: str,
) -> DataFrame:
    """One-row referential-integrity audit of ``child.fk -> parent.pk``:
    total child rows, distinct non-NULL FK values, orphan ROWS (child
    rows whose key has no parent), and NULL-FK rows reported
    separately.

    Scale shape: the child reduces to (fk, cnt) FIRST (map-side
    partial agg — the shuffle carries one row per distinct key, not
    per child row), the parent reduces to its distinct keys, and the
    orphan check is a join of the two REDUCED frames; orphan rows are
    recovered by summing cnt.  The child fact table is scanned once
    and never joined at row grain — at 100 TB this is the difference
    between auditing and re-running the pipeline.  NULL FKs count as
    orphans (a NULL reference resolves to no parent) AND are broken
    out in ``n_null_rows``; ``n_distinct_keys`` counts non-NULL keys
    only, matching SQL ``COUNT(DISTINCT fk)`` semantics so the audit
    and any SQL cross-check agree on tables containing NULL FKs
    (ADVICE r8).  Audits that treat NULL as "intentionally absent"
    should filter first.
    """
    counts = child.groupBy(F.col(fk_col).alias("__k")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    keys = parent.select(F.col(pk_col).alias("__k")).distinct()
    joined = counts.join(keys.withColumn("__hit", F.lit(1)), "__k", "left")
    return joined.agg(
        F.lit(label).alias("fk"),
        F.sum("__cnt").alias("n_rows"),
        F.count(F.when(F.col("__k").isNotNull(), 1)).alias(
            "n_distinct_keys"
        ),
        F.coalesce(
            F.sum(F.when(F.col("__hit").isNull(), F.col("__cnt"))), F.lit(0)
        ).alias("n_orphan_rows"),
        F.coalesce(
            F.sum(F.when(F.col("__k").isNull(), F.col("__cnt"))), F.lit(0)
        ).alias("n_null_rows"),
    )


def fd_audit(
    df: DataFrame, det_col: str, dep_col: str, label: str
) -> DataFrame:
    """One-row functional-dependency audit of ``det -> dep``: does the
    determinant column functionally determine the dependent?  Reports
    distinct determinant keys, how many keys violate (map to >1
    dependent value), and the worst fan-out.  Same reduce-first shape
    as fk_audit: one (det, dep) distinct-pair shuffle (map-side
    partial), then per-key counts on the reduced frame — the fact
    table is never carried past the first reduction.  NULL dependents
    count as a value via a sentinel (NULL vs non-NULL for one key IS
    a violation)."""
    pairs = df.select(
        F.col(det_col).alias("__x"),
        F.coalesce(F.col(dep_col).cast("string"), F.lit("<<NULL>>")).alias(
            "__y"
        ),
    ).distinct()
    per_key = pairs.groupBy("__x").agg(F.count(F.lit(1)).alias("__ny"))
    return per_key.agg(
        F.lit(label).alias("fd"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("__ny") > 1, 1).otherwise(0)).alias(
            "n_violating_keys"
        ),
        F.max("__ny").alias("max_fanout"),
    )
