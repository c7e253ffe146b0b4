"""Heavy-hitters smoke: sketch-first vs exact full GROUP BY on a
wide-vocabulary skewed stream — wall AND shuffle volume, measured.

The sketch's 100-TB claim is not local wall clock (a local[32] JVM
hash-aggregates a few million distinct keys happily) — it is SHUFFLE
VOLUME and bounded memory: the exact path shuffles one partial-agg row
per distinct key per map task, the sketch path shuffles at most k rows
per partition plus the recount of a handful of confirmed candidates.
So this smoke reports both numbers via the SQLMetrics walker
(tools/metrics_report.py), plus the equality check that the sketch
output IS the exact phi-heavy set.

Stream: ``n_hot_items`` planted items each holding ``hot_share`` of
rows; the remainder spread uniformly over ``n_rows // 4`` distinct
cold keys (the wide vocabulary that makes the exact path's shuffle
proportional to data size).

Usage: python tools/scale_smoke_hh.py [n_rows] [reps]
Defaults: 8_000_000 rows, 2 reps each, phi=0.01.

Methodology per SCALE_SMOKE_r06: medians of alternating fresh-session
reps; equality + metrics measured once in a final session.
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from automated_etl_pipeline_spark.session import get_spark

PHI = 0.01
N_HOT_ITEMS = 8
HOT_SHARE = 0.02  # per item -> 16% of rows in hot keys overall


def synth_stream(spark, n_rows: int):
    n_hot = int(n_rows * HOT_SHARE * N_HOT_ITEMS)
    n_vocab = max(n_rows // 4, 1000)
    hot = spark.range(n_hot).select(
        (F.col("id") % N_HOT_ITEMS).alias("x")
    )
    cold = spark.range(n_rows - n_hot).select(
        (F.col("id") % n_vocab + 1000).alias("x")
    )
    return hot.unionByName(cold).repartition(32)


def exact_hh(df, phi: float):
    total = df.agg(F.count(F.lit(1)).alias("__n"))
    return (
        df.groupBy("x")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= phi * F.col("__n"))
        .select("x", "cnt")
    )


def run_once(which: str, n_rows: int) -> float:
    from automated_etl_pipeline_spark.functions.heavy_hitters import heavy_hitters

    spark = get_spark(f"hh-smoke-{which}")
    df = synth_stream(spark, n_rows).localCheckpoint()
    t0 = time.perf_counter()
    out = heavy_hitters(df, "x", PHI) if which == "sketch" else exact_hh(df, PHI)
    out.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    spark.stop()
    return round(wall, 2)


def metrics_and_equality(n_rows: int) -> dict:
    from automated_etl_pipeline_spark.functions.heavy_hitters import heavy_hitters
    from tools.metrics_report import report, summarize

    spark = get_spark("hh-smoke-metrics")
    df = synth_stream(spark, n_rows).localCheckpoint()
    sk = heavy_hitters(df, "x", PHI)
    ex = exact_hh(df, PHI)
    got = {(r["x"], r["cnt"]) for r in sk.collect()}
    want = {(r["x"], r["cnt"]) for r in ex.collect()}
    m_sk = summarize(report(heavy_hitters(df, "x", PHI)))
    m_ex = summarize(report(exact_hh(df, PHI)))
    spark.stop()
    return {
        "equal": got == want,
        "n_heavy": len(want),
        "sketch_shuffle_bytes": m_sk["shuffle_bytes_written"],
        "exact_shuffle_bytes": m_ex["shuffle_bytes_written"],
        "sketch_spill": m_sk["spill_bytes"],
        "exact_spill": m_ex["spill_bytes"],
    }


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    walls: dict[str, list[float]] = {"sketch": [], "exact": []}
    for _ in range(reps):
        for which in ("sketch", "exact"):
            walls[which].append(run_once(which, n_rows))
    info = metrics_and_equality(n_rows)
    print(
        {
            "n_rows": n_rows,
            "phi": PHI,
            "sketch_reps": walls["sketch"],
            "exact_reps": walls["exact"],
            "sketch_median": statistics.median(walls["sketch"]),
            "exact_median": statistics.median(walls["exact"]),
            **info,
        }
    )


if __name__ == "__main__":
    main()
