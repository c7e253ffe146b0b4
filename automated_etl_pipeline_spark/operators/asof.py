"""As-of (point-in-time) join — the canonical "operator Spark lacks"
(time-series enrichment: for each left event, the most recent right
row at-or-before it, per key).

Spark has no ASOF JOIN (DuckDB/kdb/Pandas do — DuckDB's native one is
this operator's oracle). The naive formulations are disastrous at
scale: a theta-join ``l.ts >= r.ts`` explodes quadratically before a
per-row argmax; a Python loop isn't distributed at all.

The Spark-first formulation is union + last_value:
1. tag right rows 0 and left rows 1, union them (right's payload
   columns ride along, NULL on left rows);
2. one window per key ordered by (ts, tag): running
   ``last_value(payload, ignoreNulls)`` carries the latest right
   payload forward onto every subsequent row;
3. keep the left rows.

Cost: ONE shuffle on the key (the window), zero joins, no row
explosion — the same shape as sessionization, and exactly what a
1000-executor cluster wants: partition by key, sort within partition.
Ties: a right row at ts == left ts is visible to it (ASOF >=
semantics) because tag orders right(0) before left(1). Right-side
(key, ts) duplicates must be pre-aggregated (``dedup_right``) or the
carried value is partition-order-dependent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    dedup_right: str = "last",
    direction: str = "backward",
) -> DataFrame:
    """Left rows + the right ``payload_cols`` as-of each left row's
    ``ts_col``, matched per ``key_cols`` (NULL payload when no right
    row qualifies). ``dedup_right``: 'last'|'max'|'min' picks the
    survivor among right rows sharing (key, ts) — 'max'/'min'
    aggregate each payload column; 'last' requires uniqueness and
    asserts nothing (cheapest).

    ``direction``: 'backward' (default) carries the LATEST right row
    at-or-before each left row — DuckDB ``ASOF JOIN ON l.ts >= r.ts``;
    'forward' carries the EARLIEST right row at-or-after — DuckDB
    ``ASOF JOIN ON l.ts <= r.ts``.  Forward is the same single-shuffle
    union+window plan with the within-partition sort reversed: walking
    ts descending, the most recently seen right row is the smallest
    ts >= the current left row."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = list(key_cols)
    pays = list(payload_cols)
    if dedup_right in ("max", "min"):
        agg = F.max if dedup_right == "max" else F.min
        right = right.groupBy(*keys, ts_col).agg(
            *[agg(c).alias(c) for c in pays]
        )

    l_cols = [c for c in left.columns]
    # the payload rides in ONE struct: right rows carry a non-null
    # struct (even if every payload field inside is NULL), left rows a
    # NULL struct — so last(ignorenulls) skips only "no row here", never
    # a legitimately-NULL payload value (ASOF semantics)
    pay_struct = F.struct(*[F.col(c).alias(c) for c in pays])
    null_struct = F.lit(None).cast(
        T.StructType([T.StructField(c, right.schema[c].dataType) for c in pays])
    )
    tagged_r = right.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__tag"),
        pay_struct.alias("__p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in l_cols],
    )
    tagged_l = left.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__tag"),
        null_struct.alias("__p"),
        *[F.col(c).alias(f"__l_{c}") for c in l_cols],
    )
    # NULL-ts semantics, pinned identically in BOTH directions: a right
    # row with NULL ts is at no point in time, so it can never be
    # "at-or-before/after" anything — drop it; a left row with NULL ts
    # has no match and gets a NULL payload (enforced by sorting NULLs
    # FIRST under either direction, before any right row can be
    # carried). Without this pin the default sort-null placement (asc =
    # nulls first, desc = nulls last) silently breaks the documented
    # forward/backward mirror property on NULL-ts rows.
    tagged_r = tagged_r.filter(F.col("__ts").isNotNull())
    unioned = tagged_r.unionByName(tagged_l)
    # ties: right(0) sorts before left(1) in BOTH directions, so a
    # right row at exactly the left ts is visible to it (>= / <=)
    order = (
        [F.col("__ts").asc_nulls_first(), F.col("__tag").asc()]
        if direction == "backward"
        else [F.col("__ts").desc_nulls_first(), F.col("__tag").asc()]
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "__tag",
        *[F.col(f"__l_{c}") for c in l_cols],
        F.last("__p", ignorenulls=True).over(w).alias("__c"),
    )
    return carried.filter(F.col("__tag") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in l_cols],
        *[F.col("__c").getField(c).alias(c) for c in pays],
    )
