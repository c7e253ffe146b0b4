"""Two-phase global ranks and offsets — ordered global numbering that
never plans a single-partition window.

The pattern (shared by the suffix array's dense ranks / block offsets
and the CCNet partitioner's rank cuts; extracted in the r10 review —
three hand-maintained copies of the subtlest determinism-critical
construction in the codebase were one localCheckpoint-placement fix
away from drifting apart):

1. ``repartitionByRange`` by the order columns;
2. MATERIALIZE the frame (``localCheckpoint(eager=True)``) —
   ``spark_partition_id`` is only stable on a materialized frame;
   plan branches may otherwise recompute different placements;
3. stamp the partition id and collect the bounded per-pid totals
   (one row per shuffle partition — the only driver
   materialization);
4. per-pid keyed window + broadcast exclusive per-pid offsets.

Distinct from ``operators/prefix.py``'s bucketed two-phase form,
which avoids ``spark_partition_id`` entirely at the cost of requiring
an order-aligned integer bucket column: use THAT when a deterministic
order-derived bucket exists (time-series cumulation); use this when
globally numbering arbitrary tuples.

NEVER use a constant-key window instead: Catalyst constant-folds a
literal partition key into an EMPTY partition spec — a warning-loud
single-partition WindowExec (caught in the suffix array's offset
pass, r10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def partition_offsets(
    df: DataFrame, order_cols: list[str], weight_col: str | None = None
) -> tuple[DataFrame, DataFrame, int]:
    """(parts, off_df, total): ``df`` range-partitioned by
    ``order_cols`` with a stable ``__pid`` column, a broadcastable
    (``__pid``, ``__off``) table of per-pid EXCLUSIVE offsets (row
    counts, or sums of ``weight_col``), and the grand total.

    ``df`` must not already contain ``__pid``/``__off``.
    """
    clash = {"__pid", "__off"} & set(df.columns)
    if clash:
        raise ValueError(
            f"partition_offsets appends {sorted(clash)} — rename first"
        )
    spark = df.sparkSession
    try:
        p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except ValueError:
        # AQE deployments may set this conf to 'auto' (r10 ADVICE) —
        # fall back to the cluster's default parallelism rather than
        # blowing up every rank-based operator.
        p = spark.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(p, *[F.col(c) for c in order_cols])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    agg = F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)
    totals = (
        parts.groupBy("__pid").agg(agg.alias("__t")).orderBy("__pid").collect()
    )
    offsets, acc = {}, 0
    for row in totals:
        offsets[row["__pid"]] = acc
        acc += row["__t"]
    off_df = spark.createDataFrame(
        [(int(pid), int(off)) for pid, off in offsets.items()],
        "__pid int, __off long",
    )
    return parts, off_df, int(acc)


def global_ranks(
    df: DataFrame, order_cols: list[str], out_col: str = "__rank"
) -> tuple[DataFrame, int]:
    """(ranked, total): 0-based global rank of ``df``'s rows under the
    natural sort of ``order_cols`` (which must be unique per row) —
    per-pid keyed ``row_number`` plus the exclusive pid offset."""
    parts, off_df, total = partition_offsets(df, order_cols)
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    ranked = (
        parts.join(F.broadcast(off_df), "__pid")
        .withColumn(
            out_col,
            (F.row_number().over(w) - F.lit(1) + F.col("__off")).cast("long"),
        )
        .drop("__pid", "__off")
    )
    return ranked, total
