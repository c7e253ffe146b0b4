"""As-of join unit tests (operators/asof.py): tie handling,
no-predecessor NULLs, right-duplicate dedup."""

from __future__ import annotations

from datetime import datetime

from automated_etl_pipeline_spark.operators.asof import asof_join


def ts(s: int):
    return datetime(2024, 1, 1, 0, 0, s)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(1, ts(5), "a"), (1, ts(10), "b"), (2, ts(3), "c"), (3, ts(9), "d")],
        "k long, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, ts(4), 40.0), (1, ts(10), 100.0), (2, ts(7), 70.0)],
        "k long, t timestamp, v double",
    )
    got = {
        (r.k, r.tag): r.v
        for r in asof_join(left, right, ["k"], "t", ["v"]).collect()
    }
    assert got[(1, "a")] == 40.0   # strictly-before match
    assert got[(1, "b")] == 100.0  # ts == left ts is visible (>= semantics)
    assert got[(2, "c")] is None   # right row is later -> no predecessor
    assert got[(3, "d")] is None   # key absent from right


def test_asof_right_dup_dedup_max(spark):
    left = spark.createDataFrame([(1, ts(9), "x")], "k long, t timestamp, tag string")
    right = spark.createDataFrame(
        [(1, ts(4), 1.0), (1, ts(4), 9.0)], "k long, t timestamp, v double"
    )
    got = asof_join(left, right, ["k"], "t", ["v"], dedup_right="max").collect()
    assert got[0].v == 9.0
