"""Z-order (Morton) clustering — multi-column data layout for file
skipping.

Sorting by (a, b) clusters perfectly on ``a`` and not at all on ``b``;
interleaving the bits of both columns' ranks clusters on BOTH, so
min/max statistics prune files for predicates on either column (the
layout behind Delta/Iceberg OPTIMIZE ZORDER; Morton 1966).

Dataflow: per column, rank rows into 2^bits quantile buckets, then
interleave the bucket bits into one integer; range-partition + sort by
it at write time.

Scale (the default path): bucket boundaries come from
``approxQuantile`` — a single-pass Greenwald-Khanna sketch, merged on
the driver into a 2^bits-1 element cutpoint array (a few KiB), then
applied per-row as a *binary-search tree of literal comparisons*
(depth = bits, stays inside whole-stage codegen).  No global sort, no
window, no shuffle: the plan is scan → project, which survives 100 TB.

``exact=True`` computes EXACT quantile-bucket ranks without a
single-partition window (the r13 plan-sweep rule 4 fix): 0-based
global ranks via the two-phase range-partition + offset construction
(``operators/ranks.global_ranks``), then the closed-form balanced
tile ``bucket = rank * 2^bits div N`` — deterministic, DuckDB-
mirrorable (same closed form over ``row_number``), and never funnels
the table through one task.  Still costs two materialized range
shuffles, so real layout work keeps the approxQuantile default.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 8
# approxQuantile relative error: at 1e-3 the cutpoint rank is within
# 0.1% of exact — far finer than the 1/256 bucket width it feeds.
DEFAULT_EPS = 1e-3


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


def _bucket_tree(col: Column, cuts: Sequence[float], lo: int, hi: int) -> Column:
    """Binary search over sorted cutpoints as a nested-CASE tree.

    Buckets ``lo..hi``; ``cuts[i]`` is the boundary between bucket i
    and i+1 (values <= cuts[i] fall at or below bucket i).  Each row
    evaluates only ``log2(hi-lo+1)`` comparisons, all on literals, so
    the whole thing compiles into one codegen stage.
    """
    if lo == hi:
        return F.lit(lo)
    mid = (lo + hi) // 2
    return F.when(col <= F.lit(cuts[mid]), _bucket_tree(col, cuts, lo, mid)).otherwise(
        _bucket_tree(col, cuts, mid + 1, hi)
    )


def quantile_bucket(
    df: DataFrame, col: str, bits: int = DEFAULT_BITS, eps: float = DEFAULT_EPS
) -> Column:
    """Scale-safe quantile bucketing: 2^bits-1 approxQuantile cutpoints
    (driver-size, effectively broadcast as literals) + per-row binary
    search.  NULLs land in bucket 0."""
    n = 1 << bits
    probs = [i / n for i in range(1, n)]
    cuts = df.stat.approxQuantile(col, probs, eps)
    c = F.col(col)
    return F.when(c.isNull(), F.lit(0)).otherwise(
        _bucket_tree(c, cuts, 0, n - 1).cast("long")
    )


def with_zvalue(
    df: DataFrame,
    cols: Sequence[str],
    tiebreak: str,
    bits: int = DEFAULT_BITS,
    out_col: str = "zvalue",
    exact: bool = False,
    eps: float = DEFAULT_EPS,
) -> DataFrame:
    """Adds the z-value of two columns' 2^bits quantile-bucket ranks.

    Default (``exact=False``) uses approxQuantile cutpoints + binary
    search — no window, no global sort, scales to arbitrary input.
    ``exact=True`` computes exact balanced buckets (ties broken by
    ``tiebreak`` so the assignment is deterministic and
    oracle-checkable) from two-phase distributed global ranks —
    ``bucket = rank0 * 2^bits div N`` — never a single-partition
    window (plan-sweep rule 4).
    """
    if len(cols) != 2:
        raise ValueError("v1 z-ordering interleaves exactly 2 columns")
    if not 1 <= bits <= 31:
        # ranks are cast to long below, so shifts reach bit 2*31+1 = 63
        # at most; past 31 the interleaved value would overflow
        raise ValueError(f"bits must be in [1, 31] (got {bits})")
    n = 1 << bits
    if exact:
        from automated_etl_pipeline_spark.operators.ranks import global_ranks

        out = df
        total = None
        for i, c in enumerate(cols):
            out, total = global_ranks(out, [c, tiebreak], f"__zr{i}")
        ranks = [
            F.expr(f"__zr{i} * {n} div {total}").cast("long")
            for i in range(2)
        ]
        return out.withColumn(
            out_col, interleave2(ranks[0], ranks[1], bits)
        ).drop("__zr0", "__zr1")
    ranks = [quantile_bucket(df, c, bits, eps) for c in cols]
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
    min/max pruning then works for either column's predicates.  Uses
    the scale-safe cutpoint path: the only shuffle is the final
    range-partition by zvalue, which is what the write needs anyway."""
    z = with_zvalue(df, cols, tiebreak, bits)
    return z.repartitionByRange(n_files, "zvalue").sortWithinPartitions("zvalue")
