"""Incremental-MV refresh scale smoke (r14).

``mv_incremental_refresh`` proves the fold CORRECT; this measures the
claim that justifies the operator: refresh cost tracks the DELTA, not
the table.

Per shape R in (1, 4, 16): orders (sf0.1) replicated Rx into a
manifest-table source (one append per replica), MV = per-priority
(count, decimal revenue) refreshed to current.  Then ONE fixed-size
delta (sf0.1 orders with shifted keys, ~150k rows regardless of R)
lands and we measure:

- incremental refresh wall (read_changes scans just the delta files,
  fold ships one partial row per group);
- the full-recompute twin (what a rewrite/unrecorded-delete fallback
  pays, and what a format without change feeds pays EVERY refresh).

Expected: incremental flat as R grows; recompute grows with R.

Usage: python tools/scale_smoke_mv.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from automated_etl_pipeline_spark.io.manifest import (  # noqa: E402
    commit_append,
    read_table,
)
from automated_etl_pipeline_spark.io.mv import IncrementalAggView  # noqa: E402
from automated_etl_pipeline_spark.session import get_spark  # noqa: E402


def run_shape(spark, sf_dir: str, rep: int) -> dict:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    src = tempfile.mkdtemp(prefix="mv_smoke_src_")
    mv = tempfile.mkdtemp(prefix="mv_smoke_mv_")
    try:
        for r in range(rep):
            commit_append(
                orders.withColumn(
                    "o_orderkey", F.col("o_orderkey") * (rep + 1) + r
                ).repartition(4),
                src,
                f"a{r}",
            )
        view = IncrementalAggView(
            src,
            mv,
            ["o_orderpriority"],
            sum_cols={"rev": "o_totalprice"},
        )
        view.refresh(spark)
        n_rows = read_table(spark, src).count()

        delta = orders.withColumn(
            "o_orderkey", -F.col("o_orderkey")
        ).repartition(4)
        commit_append(delta, src, "delta")
        t0 = time.perf_counter()
        res = view.refresh(spark)
        w_incr = time.perf_counter() - t0
        assert res["mode"] == "incremental", res

        t0 = time.perf_counter()
        full = (
            read_table(spark, src)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                    "rev"
                ),
            )
        )
        full_rows = {
            (r["o_orderpriority"], r["n"], str(r["rev"])) for r in full.collect()
        }
        w_full = time.perf_counter() - t0
        mv_rows = {
            (r["o_orderpriority"], r["n"], str(r["rev"]))
            for r in view.read(spark)
            .select(
                "o_orderpriority",
                "n",
                F.col("rev").cast("decimal(38,2)").cast("string").alias("rev"),
            )
            .collect()
        }
        equal = {(p, n, float(s)) for p, n, s in mv_rows} == {
            (p, n, float(s)) for p, n, s in full_rows
        }
        return {
            "rep": rep,
            "rows": n_rows,
            "w_incr": w_incr,
            "w_full": w_full,
            "equal": equal,
        }
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(mv, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    print("rep rows_before_delta incr_refresh_s full_recompute_s mv_equals_full")
    for rep in (1, 4, 16, 64):
        r = run_shape(spark, sf_dir, rep)
        print(
            f"{r['rep']}x {r['rows']} {r['w_incr']:.2f} "
            f"{r['w_full']:.2f} {r['equal']}"
        )


if __name__ == "__main__":
    main()
