"""Hot-key SCD-2 smoke: plain vs chunked on a pathological key.

Builds a synthetic change stream with ONE key holding ``hot_frac`` of
all rows (the exact shape SCALE_SMOKE_r06 named as the per-key-window
residual risk) plus a cold majority of normal keys, then times
``scd2_history`` (single sequential task for the hot key) against
``scd2_history_chunked`` (range-chunked + boundary stitch) in
alternating fresh sessions and checks the two outputs agree.

Usage: python tools/scale_smoke_scd.py [n_rows] [hot_frac] [reps]
Defaults: 4_000_000 rows, 0.5 hot fraction, 2 reps each.

Methodology per SCALE_SMOKE_r06: medians of alternating fresh-session
reps (single-rep timings swing up to 2x under contention); the
equality check runs once, in the last session.
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from automated_etl_pipeline_spark.session import get_spark


def synth_updates(spark, n_rows: int, hot_frac: float, n_cold_keys: int = 2000):
    """Change stream: key 0 holds hot_frac of rows; run length ~64
    rows per attribute value so both operators see real run
    compression; ts spreads the hot key across the full range (the
    chunked path's range partitioner needs ts variety, which any real
    change stream has)."""
    n_hot = int(n_rows * hot_frac)
    hot = spark.range(n_hot).select(
        F.lit(0).alias("k"),
        F.col("id").alias("seq"),
        F.col("id").alias("ts"),
        F.concat(F.lit("v"), (F.col("id") / 64).cast("long")).alias("attr"),
    )
    cold = spark.range(n_rows - n_hot).select(
        (F.col("id") % n_cold_keys + 1).cast("long").alias("k"),
        F.col("id").alias("seq"),
        (F.col("id") / n_cold_keys).cast("long").alias("ts"),
        F.concat(F.lit("v"), (F.col("id") / (64 * n_cold_keys)).cast("long")).alias(
            "attr"
        ),
    )
    return hot.unionByName(cold)


def run_once(which: str, n_rows: int, hot_frac: float) -> float:
    from automated_etl_pipeline_spark.operators.scd import (
        scd2_history,
        scd2_history_chunked,
    )

    spark = get_spark(f"scd-smoke-{which}")
    up = synth_updates(spark, n_rows, hot_frac)
    up = up.localCheckpoint()  # time the operator, not the generator
    fn = scd2_history if which == "plain" else scd2_history_chunked
    t0 = time.perf_counter()
    fn(up, ["k"], ["attr"], ts_col="ts", tiebreak="seq").write.format(
        "noop"
    ).mode("overwrite").save()
    wall = time.perf_counter() - t0
    spark.stop()
    return round(wall, 2)


def check_equal(n_rows: int, hot_frac: float) -> dict:
    from automated_etl_pipeline_spark.operators.scd import (
        scd2_history,
        scd2_history_chunked,
    )

    spark = get_spark("scd-smoke-eq")
    up = synth_updates(spark, n_rows, hot_frac).localCheckpoint()
    a = scd2_history(up, ["k"], ["attr"], ts_col="ts", tiebreak="seq")
    b = scd2_history_chunked(up, ["k"], ["attr"], ts_col="ts", tiebreak="seq")
    out = {
        "rows_plain": a.count(),
        "rows_chunked": b.count(),
        "diff": a.exceptAll(b).count() + b.exceptAll(a).count(),
    }
    spark.stop()
    return out


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    walls: dict[str, list[float]] = {"plain": [], "chunked": []}
    for _ in range(reps):  # alternate to cancel slow-host drift
        for which in ("plain", "chunked"):
            walls[which].append(run_once(which, n_rows, hot_frac))
    eq = check_equal(n_rows, hot_frac)
    print(
        {
            "n_rows": n_rows,
            "hot_frac": hot_frac,
            "plain_reps": walls["plain"],
            "chunked_reps": walls["chunked"],
            "plain_median": statistics.median(walls["plain"]),
            "chunked_median": statistics.median(walls["chunked"]),
            **eq,
        }
    )


if __name__ == "__main__":
    main()
