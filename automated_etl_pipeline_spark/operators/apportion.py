"""Exact-quota stratified sampling via largest-remainder apportionment.

Mixture construction for a training corpus is usually specified as
"exactly N documents, allocated across sources proportional to weight
W" — not as per-row probabilities.  Bernoulli/`sampleBy` gives quotas
only in expectation; this operator gives them exactly:

  1. reduce to one row per group: total weight + row count (the only
     pass over the fact table until the final take);
  2. Hamilton/largest-remainder apportionment ON THE REDUCED FRAME:
     base = floor(N * w_g / W), then the groups with the largest
     fractional remainders absorb the leftover N - sum(base), ties
     broken by group key — sum(quota) == N exactly, allocation error
     per group < 1 doc (the classic apportionment optimality);
  3. take exactly quota_g rows per group, ordered by md5(id) — a
     deterministic pseudo-random order, so re-runs and late shards
     agree with no RNG state.

The windows in step 2 run over the group frame (bounded by group
cardinality); step 3 shuffles the fact table once on the group key
with an optional literal ``pretrim_cap`` so the rank-filter rewrites
to WindowGroupLimit (map-side top-cap per group BEFORE the shuffle —
cap at any upper bound for max(quota), e.g. N).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def largest_remainder_quotas(
    df: DataFrame,
    group_cols: list[str],
    weight_col: str,
    total: int,
) -> DataFrame:
    """One row per group: (group, n_group, quota), sum(quota) == total
    (unless a group's quota would exceed its row count — then it is
    capped at the count and the shortfall is NOT redistributed; pick
    total <= corpus size for exact sums).  All arithmetic on the
    reduced frame; shares are double but derived from identical
    integer sums in any engine, so quotas are deterministic."""
    g = df.groupBy(*group_cols).agg(
        F.sum(F.col(weight_col).cast("double")).alias("__w"),
        F.count(F.lit(1)).alias("n_group"),
    )
    everything = Window.partitionBy()  # the reduced group frame only
    share = F.lit(total) * F.col("__w") / F.sum("__w").over(everything)
    with_share = g.withColumn("__base", F.floor(share).cast("long")).withColumn(
        "__rem", share - F.floor(share)
    )
    deficit = F.lit(total) - F.sum("__base").over(everything)
    rk = F.row_number().over(
        Window.orderBy(F.desc("__rem"), *group_cols)  # bounded frame
    )
    return (
        with_share.withColumn(
            "quota",
            F.least(
                F.col("__base")
                + F.when(rk <= deficit, 1).otherwise(0),
                F.col("n_group"),
            ),
        )
        .select(*group_cols, "n_group", "quota")
    )


def quota_stratified_sample(
    df: DataFrame,
    quotas: DataFrame,
    group_cols: list[str],
    id_col: str,
    pretrim_cap: int | None = None,
) -> DataFrame:
    """Take exactly ``quota`` rows per group (md5(id)-ordered — the
    deterministic-sample recipe).  ``pretrim_cap``: any literal upper
    bound on max(quota) turns the first rank-filter into a
    WindowGroupLimit map-side pre-trim, so a billion-row group ships
    cap x partitions rows, not a billion, through the exchange.
    A cap below max(quota) would silently undersample, so the plan
    carries a LAZY per-row guard (``assert_true`` on the already-
    present broadcast quotas join) that fails the job loudly at
    execution — no extra driver-side job, no eager recomputation of
    the quotas lineage (ADVICE r8 + r9 code review)."""
    order = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    ranked = df.withColumn("__rk", F.row_number().over(w))
    if pretrim_cap is not None:
        ranked = ranked.filter(F.col("__rk") <= pretrim_cap)
    joined = ranked.join(F.broadcast(quotas), group_cols)
    keep = F.col("__rk") <= F.col("quota")
    if pretrim_cap is not None:
        # guard lives INSIDE the filter predicate so column pruning
        # cannot eliminate it; assert_true returns NULL on success, so
        # the conjunct is a no-op until a violating group appears —
        # and every over-quota group has surviving pretrimmed rows
        # (quota <= n_group), so the violation always reaches it
        keep = keep & F.assert_true(
            F.col("quota") <= F.lit(pretrim_cap),
            F.concat(
                F.lit(f"pretrim_cap={pretrim_cap} is below quota="),
                F.col("quota").cast("string"),
                F.lit(": the pre-trim would silently undersample"),
            ),
        ).isNull()
    return joined.filter(keep).drop("__rk", "n_group", "quota")
