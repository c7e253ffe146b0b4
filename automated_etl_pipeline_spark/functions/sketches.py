"""Approximate-distinct sketches: HyperLogLog build / merge / estimate.

The reference computes exact grouped counts in batch (ml_project.py's
grouped aggregations); at 100 TB the matching warehouse pattern is
*mergeable pre-aggregation*: build a tiny HLL sketch per partition/day,
persist it, and answer "distinct users last N days" by merging N
sketches instead of rescanning N days of raw data.

Spark ships Apache DataSketches HLL as built-in JVM aggregates
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``,
Spark >= 3.5) — whole-stage-codegen friendly, no Python in the path.

Key property (pinned by tests/test_sketches.py): HLL union is lossless
— register-wise max — so ``estimate(merge(part_sketches)) ==
estimate(sketch(whole))`` EXACTLY, not approximately, as long as every
sketch uses the same ``lg_k``.  The approximation error is only vs the
true distinct count (~1.04/sqrt(2^lg_k) relative standard error;
lg_k=12 → ~1.6%).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_build(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lg_k: int = 12,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Per-group HLL sketch of ``value_col`` — the persistable partial.

    At scale this is the map-side/daily pre-aggregation: one ~2^lg_k-
    byte binary per group, stored alongside the rollup keys."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias(sketch_col)
    )


def hll_merge(
    partials: DataFrame,
    group_cols: Sequence[str],
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Merge partial sketches to a coarser grouping (drop some keys):
    register-wise max — associative, commutative, lossless for union."""
    return partials.groupBy(*group_cols).agg(
        F.hll_union_agg(sketch_col).alias(sketch_col)
    )


def hll_estimate(
    sketches: DataFrame,
    sketch_col: str = "hll_sketch",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Distinct-count estimate from a sketch column."""
    return sketches.withColumn(
        out_col, F.hll_sketch_estimate(F.col(sketch_col))
    ).drop(sketch_col)


def approx_distinct_rollup(
    df: DataFrame,
    fine_cols: Sequence[str],
    coarse_cols: Sequence[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Build fine-grained sketches, merge them up to ``coarse_cols``,
    estimate — the end-to-end two-level rollup (e.g. fine = [priority,
    month], coarse = [priority]): the raw table is scanned ONCE at the
    fine grain; every coarser answer comes from sketch merges."""
    parts = hll_build(df, fine_cols, value_col, lg_k)
    return hll_estimate(hll_merge(parts, coarse_cols))
