"""Range join — match points to intervals (value ∈ [lo, hi]) without
a quadratic plan.

Spark plans a raw ``l.v BETWEEN r.lo AND r.hi`` join as
BroadcastNestedLoopJoin (every point × every interval) — fine for a
handful of intervals, catastrophic for many. The scalable formulation
is the standard bin-and-filter (a.k.a. grid) join:

1. pick a bin width (≈ median interval length);
2. each interval explodes to the bins it overlaps — an interval of
   length L lands in ~L/width + 1 bins;
3. each point maps to exactly one bin (``floor(v / width)``);
4. equi-join on the bin (hash join, shuffles only on bin id), then
   re-check the exact BETWEEN predicate.

Cost: the equi-join touches only point-interval pairs sharing a bin —
O(points + intervals × avg_bins + true_matches) instead of
O(points × intervals). Skewed bins (a bin holding many intervals or
points) are ordinary hash-join skew: AQE splits them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Rows of ``points`` × matching ``intervals`` where
    ``value_col ∈ [lo_col, hi_col]`` (closed bounds), via bin-and-
    filter. ``how='left'`` keeps unmatched points with NULL interval
    columns."""
    if how not in ("inner", "left"):
        raise ValueError("range_join supports inner/left")
    shared = set(points.columns) & set(intervals.columns)
    if shared:
        # A shared name would leave ambiguous duplicates after the join
        # (and the left-mode NULL-fill would clobber the point column).
        raise ValueError(
            f"points/intervals column names must be disjoint; shared: {sorted(shared)}"
            " — alias one side (e.g. intervals.select(F.col(c).alias('i_'+c)))"
        )
    b = F.lit(float(bin_width))
    binned_i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / b).cast("long"),
                F.floor(F.col(hi_col) / b).cast("long"),
            )
        ),
    )
    cond = (
        (F.col(value_col) >= F.col(lo_col))
        & (F.col(value_col) <= F.col(hi_col))
    )
    if how == "inner":
        binned_p = points.withColumn(
            "__bin", F.floor(F.col(value_col) / b).cast("long")
        )
        return binned_p.join(binned_i, on="__bin", how="inner").filter(cond).drop(
            "__bin"
        )
    # left: track points by a row id, not value equality — value-based
    # anti-joins mis-handle NULL columns (null-unsafe equality) and
    # duplicate point rows. monotonically_increasing_id is partition-
    # dependent, so the stamped frame is checkpointed to pin the ids
    # for both the matched and missing branches.
    pts = points.withColumn(
        "__rid", F.monotonically_increasing_id()
    ).localCheckpoint()
    binned_p = pts.withColumn("__bin", F.floor(F.col(value_col) / b).cast("long"))
    joined = binned_p.join(binned_i, on="__bin", how="inner").filter(cond).drop("__bin")
    missing = pts.join(joined.select("__rid"), on="__rid", how="left_anti")
    for c in intervals.columns:
        missing = missing.withColumn(c, F.lit(None).cast(intervals.schema[c].dataType))
    return joined.drop("__rid").unionByName(missing.drop("__rid"))
