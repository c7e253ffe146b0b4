"""Per-key window family smoke (VERDICT r8 ask #7): locf gap-fill,
rolling 24h z-scores, and CUSUM at 2M/8M/32M rows with a planted hot
key — wall, shuffle, spill, and a plan assertion that every Window
operator is keyed (no global single-partition window sneaks in).

What the numbers must show at 100 TB:

- locf / rolling: windows partition by user_id, so per-key state is
  each key's own hourly span / 24h event density; doubling rows (at
  fixed per-key density) doubles keys, not per-task state.  The hot
  key (2% of all rows on ONE user) bounds the worst task.
- cusum: the ordered prefix sum is keyed by event_type (LOW
  cardinality) — per-series work is inherently sequential, so its
  per-task frame grows linearly with rows/type.  That is a property
  of the statistic, not the plan; the smoke REPORTS the growth
  honestly, and the 100 TB escape hatch is the two-phase prefix sum
  (per-partition totals + broadcast offsets — the pack_sequences
  pattern, queries_llm.py) when one series stops fitting a task.

Window-plan assertion: every `Window` node in the executed plan text
must name its partition key (user_id / event_type).  A Window with an
empty partition spec pulls the whole frame through one task — the
regression this smoke exists to catch (the reduced-frame global
windows some GATES use on purpose are bounded by key cardinality and
never appear in these three shapes).

Usage: python tools/scale_smoke_windows.py [n_rows ...]
Defaults: 2_000_000 8_000_000 32_000_000.

Methodology per SCALE_SMOKE_r06/r08: input localCheckpoint'd so the
operator is timed (not the generator); one fresh session per size;
metrics via the SQLMetrics walker (tools/metrics_report.py).
"""

from __future__ import annotations

import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from automated_etl_pipeline_spark.session import get_spark
from tools.metrics_report import report, summarize

HOT_SHARE = 0.02  # one planted user holds 2% of ALL rows
ROWS_PER_USER = 1000  # cold users: keys scale with data size
SPAN_US = 30 * 86_400_000_000  # 30-day event-time span


def synth_events(spark, n_rows: int):
    """events-shaped frame: planted hot user 0, uniform cold users,
    2-dp values, ts uniform over 30 days, 8 event types."""
    n_hot = int(n_rows * HOT_SHARE)
    n_users = max(n_rows // ROWS_PER_USER, 10)
    base = F.lit(1704067200000000)  # 2024-01-01 in epoch micros
    step_cold = SPAN_US // max(n_rows - n_hot, 1)
    step_hot = SPAN_US // max(n_hot, 1)
    cold = spark.range(n_rows - n_hot).select(
        (F.col("id") % n_users + 1).alias("user_id"),
        F.timestamp_micros(base + F.col("id") * step_cold).alias("ts"),
        ((F.col("id") * 37 % 10000) / 100.0).alias("value"),
        (F.col("id") % 8).cast("string").alias("event_type"),
        F.col("id").alias("event_id"),
    )
    hot = spark.range(n_hot).select(
        F.lit(0).cast("long").alias("user_id"),
        F.timestamp_micros(base + F.col("id") * step_hot).alias("ts"),
        ((F.col("id") * 53 % 10000) / 100.0).alias("value"),
        (F.col("id") % 8).cast("string").alias("event_type"),
        (F.col("id") + n_rows).alias("event_id"),
    )
    return cold.unionByName(hot).repartition(32)


def locf_shape(events):
    hourly = events.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.max_by("value", "ts").alias("last_val"))
    span = hourly.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    spine = span.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("h"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = spine.join(hourly, ["user_id", "h"], "left").withColumn(
        "locf", F.last("last_val", ignorenulls=True).over(w)
    )
    return filled.groupBy(F.pmod("user_id", F.lit(50)).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum(F.floor(F.col("locf") * 100).cast("bigint")).alias("sum_cents"),
    )


def rolling_shape(events):
    win = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-86_400_000_000, 0)
    )
    xc = F.floor(F.col("value") * 100).cast("bigint")
    w = events.select("user_id", xc.alias("xc"), "ts").select(
        "user_id",
        "xc",
        F.sum("xc").over(win).alias("sc"),
        F.sum(F.col("xc") * F.col("xc")).over(win).alias("s2c"),
        F.count(F.lit(1)).over(win).alias("n"),
    )
    sd, s2d = F.col("sc").cast("double"), F.col("s2c").cast("double")
    var = (s2d - sd * sd / F.col("n")) / (F.col("n") - 1)
    z = F.when(
        (F.col("n") >= 5) & (var > 0),
        F.abs(F.col("xc").cast("double") - sd / F.col("n")) / F.sqrt(var),
    )
    return (
        w.select("user_id", z.alias("z"))
        .groupBy(F.pmod("user_id", F.lit(20)).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("z") > 1.6, 1).otherwise(0)).alias("n_anom"),
        )
    )


def rolling_retract_shape(events):
    """Same statistic as rolling_shape, via the linear retraction plan
    (operators/rolling.py) — the measured fix for the hot-key
    sliding-frame blowup."""
    from automated_etl_pipeline_spark.operators.rolling import (
        trailing_integer_moments,
    )

    base = events.select(
        "user_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("xc"),
        F.unix_micros("ts").alias("us"),
    )
    w = trailing_integer_moments(
        base, "user_id", "us", "xc", window_span=86_400_000_000
    )
    sd, s2d = F.col("sc").cast("double"), F.col("s2c").cast("double")
    var = (s2d - sd * sd / F.col("n")) / (F.col("n") - 1)
    z = F.when(
        (F.col("n") >= 5) & (var > 0),
        F.abs(F.col("xc").cast("double") - sd / F.col("n")) / F.sqrt(var),
    )
    return (
        w.select("user_id", z.alias("z"))
        .groupBy(F.pmod("user_id", F.lit(20)).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("z") > 1.6, 1).otherwise(0)).alias("n_anom"),
        )
    )


def cusum_shape(events):
    e = events.withColumn(
        "v", F.floor(F.col("value") * 1_000_000).cast("bigint")
    )
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = e.join(F.broadcast(m), "event_type").select(
        "event_type",
        F.sum(F.col("v") * F.col("n") - F.col("s")).over(w).alias("cusum"),
    )
    return c.groupBy("event_type").agg(
        F.max(F.abs(F.col("cusum"))).alias("peak"),
        F.count(F.lit(1)).alias("n"),
    )


def cusum_twophase_shape(events):
    """Same CUSUM statistic via the bucketed two-phase prefix sum
    (operators/prefix.py) — the escape hatch for series that stop
    fitting one task; within-bucket windows bound per-task state at
    one day of one type."""
    from automated_etl_pipeline_spark.operators.prefix import (
        bucketed_prefix_sum,
    )

    e = events.withColumn(
        "v", F.floor(F.col("value") * 1_000_000).cast("bigint")
    )
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    dev = e.join(F.broadcast(m), "event_type").select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        "event_id",
        (F.col("v") * F.col("n") - F.col("s")).alias("d"),
    )
    c = bucketed_prefix_sum(
        dev, "event_type", "us", "event_id", "d",
        bucket_us=86_400_000_000, out_col="cusum",
    )
    return c.groupBy("event_type").agg(
        F.max(F.abs(F.col("cusum"))).alias("peak"),
        F.count(F.lit(1)).alias("n"),
    )


SHAPES = {
    "locf": locf_shape,
    "rolling": rolling_shape,
    "retract": rolling_retract_shape,
    "cusum": cusum_shape,
    "cusum2p": cusum_twophase_shape,
}
KEYED_BY = {
    "locf": "user_id",
    "rolling": "user_id",
    "retract": "user_id",
    "cusum": "event_type",
    "cusum2p": "event_type",
}


_WINDOW_NODE = re.compile(
    r"\b(Window|WindowGroupLimit|RunningWindowFunction)\b"
)


def assert_windows_keyed(df, key: str, shape: str) -> int:
    """Every Window node in the executed plan must carry the shape's
    partition key in its text; returns the number of Window nodes.

    Node detection is a word-boundary regex, NOT prefix-stripping:
    ``lstrip("+-: *")`` stops at the first character outside its set,
    so a codegen-tagged line like ``*(3) WindowGroupLimit ...`` kept
    its ``(3) `` prefix and silently escaped the startswith check —
    exactly the nodes this assertion exists to audit (r9 ADVICE)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_windows = 0
    for line in plan.splitlines():
        if _WINDOW_NODE.search(line):
            n_windows += 1
            assert key in line, (
                f"{shape}: unkeyed Window operator (single-partition "
                f"hazard): {line.strip()[:200]}"
            )
    return n_windows


def run_size(
    n_rows: int, shapes: dict | None = None, partitions: int | None = None
) -> None:
    for shape, fn in (shapes or SHAPES).items():
        spark = get_spark(
            f"win-smoke-{shape}-{n_rows}", shuffle_partitions=partitions
        )
        events = synth_events(spark, n_rows).localCheckpoint()
        out = fn(events)
        t0 = time.perf_counter()
        tree = report(out)  # collect + walk SQLMetrics
        wall = time.perf_counter() - t0
        s = summarize(tree)
        n_win = assert_windows_keyed(out, KEYED_BY[shape], shape)
        print(
            f"{n_rows:>10,} {shape:<8} wall={wall:6.1f}s "
            f"shuffle={s['shuffle_bytes_written']:>13,}B "
            f"spill={s['spill_bytes']:>11,}B "
            f"widest={s['widest_operator_rows']:>12,} "
            f"windows={n_win} keyed=ok"
        )
        spark.stop()


def main() -> None:
    args = sys.argv[1:]
    shapes = None
    if "--shapes" in args:
        i = args.index("--shapes")
        names = args[i + 1].split(",")
        del args[i : i + 2]
        shapes = {n: SHAPES[n] for n in names}
    partitions = None
    if "--partitions" in args:
        i = args.index("--partitions")
        partitions = int(args[i + 1])
        del args[i : i + 2]
    sizes = [int(a) for a in args] or [2_000_000, 8_000_000, 32_000_000]
    for n in sizes:
        run_size(n, shapes, partitions)


if __name__ == "__main__":
    main()
