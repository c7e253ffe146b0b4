"""As-of join unit tests (operators/asof.py): tie handling,
no-predecessor NULLs, right-duplicate dedup."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

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


def test_asof_forward_semantics(spark):
    """direction='forward': earliest right row at-or-after each left
    row; ts == left ts is visible (<= semantics); no successor → NULL."""
    left = spark.createDataFrame(
        [(1, ts(5), "a"), (1, ts(10), "b"), (2, ts(9), "c"), (3, ts(1), "d")],
        "k long, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, ts(7), 70.0), (1, ts(10), 100.0), (2, ts(4), 40.0)],
        "k long, t timestamp, v double",
    )
    got = {
        (r.k, r.tag): r.v
        for r in asof_join(
            left, right, ["k"], "t", ["v"], direction="forward"
        ).collect()
    }
    assert got[(1, "a")] == 70.0   # earliest at-or-after, not the latest
    assert got[(1, "b")] == 100.0  # ts == left ts is visible (<= semantics)
    assert got[(2, "c")] is None   # right row is earlier -> no successor
    assert got[(3, "d")] is None   # key absent from right


def test_asof_null_ts_pinned_both_directions(spark):
    """NULL-ts semantics are direction-independent (ADVICE r4): a
    NULL-ts left row gets a NULL payload in BOTH directions, and a
    NULL-ts right row matches nothing in BOTH directions — the
    forward/backward mirror property holds on NULL-ts rows."""
    left = spark.createDataFrame(
        [(1, None, "nl"), (1, ts(5), "a")], "k long, t timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, None, 999.0), (1, ts(5), 50.0)], "k long, t timestamp, v double"
    )
    for direction in ("backward", "forward"):
        got = {
            r.tag: r.v
            for r in asof_join(
                left, right, ["k"], "t", ["v"], direction=direction
            ).collect()
        }
        assert got["nl"] is None, direction  # NULL-ts left row: no match
        assert got["a"] == 50.0, direction   # NULL-ts right row invisible
        assert len(got) == 2, direction      # left rows all preserved


def test_asof_right_dup_dedup_max(spark):
    left = spark.createDataFrame([(1, ts(9), "x")], "k long, t timestamp, tag string")
    right = spark.createDataFrame(
        [(1, ts(4), 1.0), (1, ts(4), 9.0)], "k long, t timestamp, v double"
    )
    got = asof_join(left, right, ["k"], "t", ["v"], dedup_right="max").collect()
    assert got[0].v == 9.0


# ---------------- range join ----------------


def test_range_join_inner_and_left(spark):
    from automated_etl_pipeline_spark.operators.rangejoin import range_join

    points = spark.createDataFrame(
        [(1, 5.0), (2, 25.0), (3, 999.0)], "pid long, v double"
    )
    ivals = spark.createDataFrame(
        [(10, 0.0, 10.0), (20, 4.0, 30.0)], "b int, lo double, hi double"
    )
    inner = {(r.pid, r.b) for r in range_join(points, ivals, "v", "lo", "hi", 10.0).collect()}
    assert inner == {(1, 10), (1, 20), (2, 20)}  # overlapping intervals both match
    left = range_join(points, ivals, "v", "lo", "hi", 10.0, how="left")
    got = {(r.pid, r.b) for r in left.collect()}
    assert got == {(1, 10), (1, 20), (2, 20), (3, None)}  # unmatched point kept


def test_range_join_no_nested_loop(spark):
    from automated_etl_pipeline_spark.operators.rangejoin import range_join
    from automated_etl_pipeline_spark.plans.explain import executed_plan

    points = spark.range(1000).select(F.col("id").cast("double").alias("v"))
    ivals = spark.createDataFrame(
        [(i, i * 10.0, i * 10.0 + 15.0) for i in range(50)],
        "b int, lo double, hi double",
    )
    plan = executed_plan(range_join(points, ivals, "v", "lo", "hi", 10.0))
    assert "BroadcastNestedLoopJoin" not in plan  # the naive BETWEEN plan


def test_asof_null_payload_not_skipped(spark):
    """A right row whose payload is legitimately NULL must win over an
    older non-null row (ASOF picks the latest ROW, not the latest
    non-null VALUE)."""
    left = spark.createDataFrame([(1, ts(9), "x")], "k long, t timestamp, tag string")
    right = spark.createDataFrame(
        [(1, ts(4), 5.0), (1, ts(7), None)], "k long, t timestamp, v double"
    )
    got = asof_join(left, right, ["k"], "t", ["v"]).collect()
    assert got[0].v is None


def test_range_join_left_null_point_column_not_duplicated(spark):
    from automated_etl_pipeline_spark.operators.rangejoin import range_join

    points = spark.createDataFrame([(None, 5.0)], "pid long, v double")
    ivals = spark.createDataFrame([(10, 0.0, 10.0)], "b int, lo double, hi double")
    got = range_join(points, ivals, "v", "lo", "hi", 10.0, how="left").collect()
    assert len(got) == 1 and got[0].b == 10  # matched once, not re-added


# ---------------- z-order ----------------


def test_interleave2_bit_patterns(spark):
    from automated_etl_pipeline_spark.operators.zorder import interleave2

    df = spark.createDataFrame(
        [(0b1010, 0b0101), (0, 0), (255, 255)], "a int, b int"
    )
    got = [r.z for r in df.select(interleave2(F.col("a"), F.col("b")).alias("z")).collect()]
    # a bits on odd positions, b bits on even: 1010/0101 -> 10011001_2 x2
    assert got[0] == 0b10011001
    assert got[1] == 0
    assert got[2] == (1 << 16) - 1  # all 16 bits set


def test_zorder_clusters_both_columns(spark):
    """Within a z-bucket, BOTH columns' value ranges are narrow —
    unlike a plain sort where the secondary column spans everything."""
    from automated_etl_pipeline_spark.operators.zorder import with_zvalue

    n = 4096
    df = spark.range(n).select(
        F.col("id").alias("rid"),
        (F.col("id") % 64).alias("x"),
        F.floor(F.col("id") / 64).alias("y"),
    )
    z = with_zvalue(df, ["x", "y"], tiebreak="rid", bits=8)
    spread = (
        z.groupBy(F.floor(F.col("zvalue") / 4096).alias("bucket"))
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .agg(F.max("sx").alias("mx"), F.max("sy").alias("my"))
        .first()
    )
    # 16 buckets over a 64x64 grid: each bucket is a quadrant-ish
    # rectangle, so neither column spans more than half the domain
    assert spread.mx <= 32 and spread.my <= 32
