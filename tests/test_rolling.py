"""Retraction-based trailing-window moments — operators/rolling.py.

The operator exists because Spark re-aggregates sliding RANGE frames
per row (O(n*f) on a hot key — measured in SCALE_SMOKE_r09.md); these
tests pin that the linear retraction plan computes BIT-IDENTICAL
moments to the naive ``rangeBetween(-w, 0)`` frame, including the two
boundary cases that decide correctness:

- an event exactly w micros old still counts (inclusive lower bound);
- same-timestamp events on one key see each other (RANGE-tie
  semantics, not row-prefix semantics).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from automated_etl_pipeline_spark.operators.rolling import (
    trailing_integer_moments,
)

W_US = 1_000  # tiny window so boundaries are easy to plant


def _naive(df, window_us=W_US):
    win = (
        Window.partitionBy("user_id")
        .orderBy(F.col("us"))
        .rangeBetween(-window_us, 0)
    )
    return df.select(
        "user_id",
        "us",
        "xc",
        F.sum("xc").over(win).alias("sc"),
        F.sum(F.col("xc") * F.col("xc")).over(win).alias("s2c"),
        F.count(F.lit(1)).over(win).alias("n"),
    )


def _assert_equal(spark, rows, window_us=W_US):
    df = spark.createDataFrame(rows, "user_id long, us long, xc long")
    got = {
        (r.user_id, r.us, r.xc): (r.sc, r.s2c, r.n)
        for r in trailing_integer_moments(
            df, "user_id", "us", "xc", window_us
        ).collect()
    }
    want = {
        (r.user_id, r.us, r.xc): (r.sc, r.s2c, r.n)
        for r in _naive(df, window_us).collect()
    }
    assert got == want


def test_matches_sliding_frame_on_dense_random_series(spark):
    # deterministic pseudo-random series: multiple keys, ragged gaps
    rows = [
        (k, 10_000 + (i * 137 + k * 31) % 5_000, (i * 97 + k) % 50 - 10)
        for k in range(5)
        for i in range(400)
    ]
    # de-duplicate (key, us) collisions by nudging — ties are tested
    # separately with exact planted values
    seen, uniq = set(), []
    for k, us, x in rows:
        while (k, us) in seen:
            us += 1
        seen.add((k, us))
        uniq.append((k, us, x))
    _assert_equal(spark, uniq)


def test_boundary_event_exactly_window_old_still_counts(spark):
    rows = [(1, 0, 7), (1, W_US, 5)]  # second frame = [0, W_US] inclusive
    df = spark.createDataFrame(rows, "user_id long, us long, xc long")
    out = {
        r.us: (r.sc, r.n)
        for r in trailing_integer_moments(df, "user_id", "us", "xc", W_US).collect()
    }
    assert out[W_US] == (12, 2)  # includes the w-old event
    rows2 = [(1, 0, 7), (1, W_US + 1, 5)]  # one micro past the window
    df2 = spark.createDataFrame(rows2, "user_id long, us long, xc long")
    out2 = {
        r.us: (r.sc, r.n)
        for r in trailing_integer_moments(df2, "user_id", "us", "xc", W_US).collect()
    }
    assert out2[W_US + 1] == (5, 1)


def test_same_timestamp_events_see_each_other(spark):
    rows = [(1, 100, 3), (1, 100, 4), (1, 100, 5)]
    df = spark.createDataFrame(rows, "user_id long, us long, xc long")
    out = trailing_integer_moments(df, "user_id", "us", "xc", W_US).collect()
    assert all(r.sc == 12 and r.n == 3 for r in out)  # RANGE-tie semantics
    _assert_equal(spark, rows)


def test_hot_key_matches_too(spark):
    # one key holds most rows (the scale motivation); equality must
    # hold regardless of skew
    hot = [(0, i * 3, (i % 11) - 5) for i in range(2_000)]
    cold = [(k, 50 + k * 7, k) for k in range(1, 20)]
    _assert_equal(spark, hot + cold)


def test_reserved_output_name_clash_fails_loudly(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, 1, 1, 1)], "user_id long, us long, xc long, n long"
    )
    with _pytest.raises(ValueError, match="rename"):
        trailing_integer_moments(df, "user_id", "us", "xc", 10)
