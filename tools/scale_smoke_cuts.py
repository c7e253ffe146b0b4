"""Skew-aware vs linspace cuts for bucketed_global_ranks (r14,
VERDICT r13 ask #4).

Default linspace cuts are correct under any skew (cut-invariance is
property-tested) but collapse work onto 1-2 hot buckets when the order
key is heavy-tailed — a partitioned window wearing most of the
single-task cost rule 4 was built to kill.  This measures, on a
Zipf-distributed key at 1x/4x/16x replication (sf0.1 orders base):

- max-bucket-share (the fraction of rows landing in the biggest
  bucket) under linspace_cuts vs quantile_cuts — the work-balance
  number that decides whether the within-bucket window parallelizes;
- the rank-construction wall under each cut provider;
- a value-equality spot check (cut-invariance at scale, not just in
  the unit test).

Zipf key: value = floor(base_key^1.7) on a md5-shuffled dense key —
deterministic, heavy-tailed low end with extreme outliers at the top
(the shape of byte sizes, degree counts, token frequencies).

Usage: python tools/scale_smoke_cuts.py [sf_dir]
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
    linspace_cuts,
    order_bucket,
    quantile_cuts,
)
from automated_etl_pipeline_spark.session import get_spark  # noqa: E402

N_BUCKETS = 32


def zipf_frame(spark, sf_dir: str, rep: int):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey")
    if rep > 1:
        orders = orders.crossJoin(
            spark.range(rep).select(F.col("id").alias("__r"))
        ).select(
            (F.col("o_orderkey") * rep + F.col("__r")).alias("o_orderkey")
        )
    # heavy tail: uniform md5 u in [0,1) pushed through 2^(30u) —
    # values span 1..2^30 with most mass in the low decades (log-
    # uniform, the shape of byte sizes / degree counts / token
    # frequencies).  Linspace's first cut at 2^30/32 = 2^25 captures
    # every row with u < 25/30 — ~83% of the table in bucket 0.
    u = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    return orders.select(
        F.col("o_orderkey").alias("tid"),
        F.floor(F.pow(F.lit(2.0), u * 30.0)).cast("long").alias("v"),
    ).localCheckpoint(eager=True)


def max_share(df, cuts, n) -> float:
    counts = (
        df.withColumn("__b", order_bucket("v", cuts))
        .groupBy("__b")
        .count()
        .collect()
    )
    return max(r["count"] for r in counts) / n


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
        "cuts-smoke",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    print(f"# linspace vs quantile cuts, zipf key, base={sf_dir}")
    print(
        "| rep | rows | max-share linspace | max-share quantile | "
        "wall linspace | wall quantile | ranks equal |"
    )
    print("|---|---|---|---|---|---|---|")
    for rep in (1, 4, 16):
        df = zipf_frame(spark, sf_dir, rep)
        n = df.count()
        lin = linspace_cuts(df, "v", N_BUCKETS)
        qua = quantile_cuts(df, "v", N_BUCKETS)
        ms_lin = max_share(df, lin, n)
        ms_qua = max_share(df, qua, n)

        def run(cuts):
            bucketed_global_ranks(
                df, ["v", "tid"], cuts=cuts
            ).write.format("noop").mode("overwrite").save()

        w_lin = wall(lambda: run(lin))
        w_qua = wall(lambda: run(qua))
        # cut-invariance spot check at scale: checksum of rank*tid
        chk = []
        for cuts in (lin, qua):
            r = (
                bucketed_global_ranks(df, ["v", "tid"], cuts=cuts)
                .agg(F.sum(F.col("__rank") * F.col("tid")).cast("long"))
                .collect()[0][0]
            )
            chk.append(r)
        print(
            f"| {rep}x | {n:,} | {ms_lin:.3f} | {ms_qua:.3f} "
            f"| {w_lin:.2f} s | {w_qua:.2f} s | "
            f"{'yes' if chk[0] == chk[1] else 'NO: ' + str(chk)} |"
        )
        df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
