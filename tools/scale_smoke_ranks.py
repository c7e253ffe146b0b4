"""bucketed_global_ranks vs global_ranks scale smoke (r13).

The rule-4 rewrites replaced single-partition windows with distributed
exact ranks; this measures the two constructions' walls at 1x/4x/16x
row replication (sf0.1 orders base) so the choice between them is a
recorded number, not a guess: bucketed (no checkpoint, 2 light jobs)
should hold a lower fixed cost and the same linear marginal.

Usage: python tools/scale_smoke_ranks.py [sf_dir]
"""

from __future__ import annotations

import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from automated_etl_pipeline_spark.operators.ranks import (  # noqa: E402
    bucketed_global_ranks,
    global_ranks,
)
from automated_etl_pipeline_spark.session import get_spark  # noqa: E402


def replicate(spark, sf_dir: str, rep: int):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    if rep == 1:
        return orders
    return orders.crossJoin(
        spark.range(rep).select(F.col("id").alias("__r"))
    ).select(
        (F.col("o_orderkey") * rep + F.col("__r")).alias("o_orderkey"),
        "o_totalprice",
    )


def wall(fn) -> float:
    reps = []
    for _ in range(3):
        gc.collect()
        t0 = time.time()
        fn()
        reps.append(time.time() - t0)
    return sorted(reps)[1]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        "ranks-smoke",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    print(f"# ranks constructions smoke, base={sf_dir} (medians of 3)")
    print("| rep | rows | bucketed | global_ranks (checkpointing) |")
    print("|---|---|---|---|")
    for rep in (1, 4, 16):
        df = replicate(spark, sf_dir, rep).localCheckpoint(eager=True)
        n = df.count()

        def run_bucketed():
            bucketed_global_ranks(
                df, ["o_totalprice", "o_orderkey"], "__rk"
            ).write.format("noop").mode("overwrite").save()

        def run_global():
            ranked, _ = global_ranks(df, ["o_totalprice", "o_orderkey"], "__rk")
            ranked.write.format("noop").mode("overwrite").save()

        wb = wall(run_bucketed)
        wg = wall(run_global)
        print(f"| {rep}x | {n:,} | {wb:.2f} s | {wg:.2f} s |")
    spark.stop()


if __name__ == "__main__":
    main()
