"""Bucketed two-phase prefix sums — operators/prefix.py.

Pins row-for-row equality with the single-window running sum,
including the cases that decide correctness: ties on the order column
(broken by the tiebreak), values straddling bucket boundaries, hot
keys, and negative measures (the CUSUM deviation use case).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from automated_etl_pipeline_spark.operators.prefix import bucketed_prefix_sum


def _naive(df):
    w = (
        Window.partitionBy("k")
        .orderBy("us", "tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("prefix", F.sum("x").over(w))


def _assert_equal(spark, rows, bucket_us):
    df = spark.createDataFrame(rows, "k long, us long, tb long, x long")
    got = {
        (r.k, r.us, r.tb): r.prefix
        for r in bucketed_prefix_sum(df, "k", "us", "tb", "x", bucket_us).collect()
    }
    want = {(r.k, r.us, r.tb): r.prefix for r in _naive(df).collect()}
    assert got == want


def test_matches_single_window_across_bucket_boundaries(spark):
    rows = [
        (k, (i * 137 + k) % 10_000, i, (i * 97 + k) % 40 - 20)
        for k in range(4)
        for i in range(500)
    ]
    _assert_equal(spark, rows, bucket_us=1_000)


def test_order_ties_resolved_by_tiebreak(spark):
    rows = [(1, 100, 2, 5), (1, 100, 1, 3), (1, 100, 3, 7), (1, 50, 9, 1)]
    df = spark.createDataFrame(rows, "k long, us long, tb long, x long")
    out = {
        (r.us, r.tb): r.prefix
        for r in bucketed_prefix_sum(df, "k", "us", "tb", "x", 1_000).collect()
    }
    assert out[(50, 9)] == 1
    assert out[(100, 1)] == 4
    assert out[(100, 2)] == 9
    assert out[(100, 3)] == 16


def test_hot_key_and_exact_boundary_values(spark):
    # values landing exactly ON bucket boundaries + one dominant key
    hot = [(0, i * 250, i, (i % 7) - 3) for i in range(2_000)]  # hits k*1000
    cold = [(k, k * 999, 0, k) for k in range(1, 10)]
    _assert_equal(spark, hot + cold, bucket_us=1_000)


def test_negative_order_values(spark):
    rows = [(1, us, i, 1) for i, us in enumerate([-2500, -1000, -1, 0, 999, 1000])]
    _assert_equal(spark, rows, bucket_us=1_000)


def test_null_key_and_null_order_rows_kept_like_single_window(spark):
    # the single-window plan keeps NULL keys as their own partition and
    # sorts NULL order values first; the null-safe join must preserve
    # both (a plain equi-join silently dropped them — r9 code review)
    rows = [
        (None, 10, 1, 5),
        (None, 20, 1, 7),
        (1, None, 1, 3),
        (1, 5, 1, 4),
        (1, 2000, 1, 9),
    ]
    df = spark.createDataFrame(rows, "k long, us long, tb long, x long")
    out = bucketed_prefix_sum(df, "k", "us", "tb", "x", 1_000)
    got = {
        (r.k, r.us): r.prefix for r in out.collect()
    }
    assert len(got) == 5  # nothing dropped
    assert got[(None, 10)] == 5 and got[(None, 20)] == 12
    # NULL order sorts first within its key, exactly like the window
    assert got[(1, None)] == 3
    assert got[(1, 5)] == 7
    assert got[(1, 2000)] == 16
    want = {(r.k, r.us): r.prefix for r in _naive(df).collect()}
    assert got == want


def test_reserved_output_name_clash_fails_loudly(spark):
    df = spark.createDataFrame([(1, 1, 1, 1, 1)], "k long, us long, tb long, x long, prefix long")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="rename"):
        bucketed_prefix_sum(df, "k", "us", "tb", "x", 10)
