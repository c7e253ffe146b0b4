"""HLL sketch build/merge/estimate (functions/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_etl_pipeline_spark.functions.sketches import (
    approx_distinct_rollup,
    hll_build,
    hll_estimate,
    hll_merge,
)
from automated_etl_pipeline_spark.io.sources import load_testdata

SF = "/root/testdata/sf0.001"


def test_merged_estimate_stays_in_error_envelope(spark):
    """The merge contract (see sketches.py docstring): estimates are
    NOT merge-shape-invariant (HIP vs composite estimator — measured:
    merged-from-months 1302 vs single-pass 1292 at sf0.01), but the
    error bound IS: merging per-month partials must land within the
    same ~5% (3-sigma at lg_k=12) envelope of the exact count as the
    single-pass sketch.  Run at sf0.01 — at sf0.001 everything stays
    in exact coupon mode and the test would prove nothing."""
    orders = load_testdata(spark, "/root/testdata/sf0.01", ["orders"])["orders"]
    fine = hll_build(
        orders.withColumn("m", F.date_format("o_orderdate", "yyyy-MM")),
        ["o_orderpriority", "m"],
        "o_custkey",
    )
    merged = {
        r.o_orderpriority: r.approx_distinct
        for r in hll_estimate(hll_merge(fine, ["o_orderpriority"])).collect()
    }
    single = {
        r.o_orderpriority: r.approx_distinct
        for r in hll_estimate(
            hll_build(orders, ["o_orderpriority"], "o_custkey")
        ).collect()
    }
    exact = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert len(merged) == 5
    for k, n in exact.items():
        assert abs(merged[k] - n) / n < 0.05, ("merged", k, merged[k], n)
        assert abs(single[k] - n) / n < 0.05, ("single", k, single[k], n)
        # and the two estimators agree with each other well inside 2x
        # the envelope — they answer the same question
        assert abs(merged[k] - single[k]) / n < 0.05, (k, merged[k], single[k])


def test_estimate_within_error_bound(spark):
    """lg_k=12 → ~1.6% relative standard error; assert a loose 5%
    bound per group against the exact distinct count."""
    orders = load_testdata(spark, SF, ["orders"])["orders"]
    est = {
        r.o_orderpriority: r.approx_distinct
        for r in approx_distinct_rollup(
            orders.withColumn("m", F.date_format("o_orderdate", "yyyy-MM")),
            ["o_orderpriority", "m"],
            ["o_orderpriority"],
            "o_custkey",
        ).collect()
    }
    exact = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(est[k] - n) / n < 0.05, (k, est[k], n)


def test_sketch_size_bounded(spark):
    """The persistable partial is small (the point of the pattern):
    a lg_k=12 dense sketch is ~2-3 KB regardless of input rows."""
    orders = load_testdata(spark, SF, ["orders"])["orders"]
    sizes = [
        len(r.hll_sketch)
        for r in hll_build(orders, ["o_orderstatus"], "o_custkey").collect()
    ]
    assert all(s < 8192 for s in sizes) and len(sizes) > 0
