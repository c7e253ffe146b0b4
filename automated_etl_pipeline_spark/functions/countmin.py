"""Count-min sketch: mergeable frequency estimation in bounded space.

Where Misra-Gries (functions/heavy_hitters.py) answers "which keys are
heavy", count-min answers "how often does THIS key occur" for any key,
with one-sided error: estimates never undercount, and overcount at
most eps*N with probability 1-delta for width w = e/eps, depth d =
ln(1/delta) (Cormode & Muthukrishnan 2005).  The sketch is a d x w
counter grid; inserting a key increments one counter per row (row r's
position from a pairwise-independent hash), and the estimate is the
MIN over the key's d counters.

Why it scales: the grid is CONTENT-INDEPENDENT fixed state — d*w
BIGINT cells no matter how many items stream through — and addition
commutes, so per-partition partial grids merge by cell-wise sum.
That is exactly a Spark partial+final aggregation: explode d (row,
pos) cells per item, groupBy the <= d*w distinct cells with map-side
combine, and every task emits at most d*w partial rows regardless of
input size (the same shape as similarity/gram.py's reduction).

Portability: positions use the engine-portable md5 double-hashing of
operators/bloom.py (h1 + r*h2 mod w — Kirsch-Mitzenmacher), so a
DuckDB oracle rebuilds the identical grid and the gate hash-compares
estimates, not just invariants.

The pinned demo grid (d=4, w=256) is deliberately small relative to
the ~16k distinct shingles it sketches, so collisions — and the
one-sided overestimate the tests assert — are actually exercised;
production sizing is w = e/eps for the tolerated absolute error
eps*N (e.g. eps=1e-6 -> w ~ 2.7M cells ~ 22 MB, still driver-safe).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from automated_etl_pipeline_spark.functions.hashutil import md5_double_hash

DEPTH = 4
WIDTH = 256


def _cells(item: Column) -> list[Column]:
    """One (row, pos) struct per sketch row for ``item``."""
    h1, h2 = md5_double_hash(item)
    return [
        F.struct(
            F.lit(r).alias("r"), ((h1 + F.lit(r) * h2) % WIDTH).alias("pos")
        )
        for r in range(DEPTH)
    ]


def cm_build(items: DataFrame, col: str) -> DataFrame:
    """Build the sketch over every row of ``items[col]`` (bag
    semantics — duplicates count).  Returns the non-zero cells as
    ``(r int, pos bigint, cnt bigint)``; absent cells are zero."""
    return (
        items.filter(F.col(col).isNotNull())
        .select(F.explode(F.array(*_cells(F.col(col)))).alias("cell"))
        .groupBy(
            F.col("cell.r").cast("int").alias("r"),
            F.col("cell.pos").cast("bigint").alias("pos"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cm_estimate(probes: DataFrame, col: str, sketch: DataFrame) -> DataFrame:
    """Point estimates for each distinct probe key: min over the key's
    DEPTH counters (0 when a cell was never touched).  The sketch is
    at most DEPTH*WIDTH rows, so it rides a broadcast join."""
    cells = probes.select(
        F.col(col), F.explode(F.array(*_cells(F.col(col)))).alias("cell")
    ).select(
        col,
        F.col("cell.r").cast("int").alias("r"),
        F.col("cell.pos").cast("bigint").alias("pos"),
    )
    return (
        cells.join(F.broadcast(sketch), ["r", "pos"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_estimate"))
    )
