"""Z-order (Morton) clustering — multi-column data layout for file
skipping.

Sorting by (a, b) clusters perfectly on ``a`` and not at all on ``b``;
interleaving the bits of both columns' ranks clusters on BOTH, so
min/max statistics prune files for predicates on either column (the
layout behind Delta/Iceberg OPTIMIZE ZORDER; Morton 1966).

Dataflow: per column, rank rows into 2^bits quantile buckets
(``ntile`` over a total order — ties broken by a unique key so the
assignment is deterministic and oracle-checkable); interleave the
bucket bits into one integer; range-partition + sort by it at write
time.

Scale: exact ntile is a global window (single-partition sort) — right
for oracle parity here, wrong at 100 TB, where the bucket boundaries
come from approxQuantile cutpoints (driver-size array, broadcast) and
bucketing becomes a per-row binary search; the interleave and the
write path are unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BITS = 8


def interleave2(a: Column, b: Column, bits: int = DEFAULT_BITS) -> Column:
    """Morton-interleave two ``bits``-bit ints (a's bits land on the
    odd positions): deterministic integer arithmetic only."""
    z = F.lit(0)
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def with_zvalue(
    df: DataFrame,
    cols: Sequence[str],
    tiebreak: str,
    bits: int = DEFAULT_BITS,
    out_col: str = "zvalue",
) -> DataFrame:
    """Adds the z-value of two columns' ntile(2^bits) ranks."""
    if len(cols) != 2:
        raise ValueError("v1 z-ordering interleaves exactly 2 columns")
    if not 1 <= bits <= 31:
        # ranks are cast to long below, so shifts reach bit 2*31+1 = 63
        # at most; past 31 the interleaved value would overflow
        raise ValueError(f"bits must be in [1, 31] (got {bits})")
    n = 1 << bits
    ranks = [
        (F.ntile(n).over(Window.orderBy(F.col(c), F.col(tiebreak))) - 1).cast("long")
        for c in cols
    ]
    return df.withColumn(out_col, interleave2(ranks[0], ranks[1], bits))


def zorder_repartition(
    df: DataFrame,
    cols: Sequence[str],
    tiebreak: str,
    n_files: int,
    bits: int = DEFAULT_BITS,
) -> DataFrame:
    """Layout pass before a write: range-partition + sort by z-value so
    every output file covers a compact rectangle of the (a, b) space —
    min/max pruning then works for either column's predicates."""
    z = with_zvalue(df, cols, tiebreak, bits)
    return z.repartitionByRange(n_files, "zvalue").sortWithinPartitions("zvalue")
