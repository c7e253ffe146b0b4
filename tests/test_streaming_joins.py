"""Stream-stream interval join: streamed result == batch result, both
through the same interval_join code path (streaming/joins.py)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from automated_etl_pipeline_spark.io.sources import load_testdata
from automated_etl_pipeline_spark.streaming.joins import interval_join

SF = "/root/testdata/sf0.001"


def _events(spark):
    return load_testdata(spark, SF, ["events"])["events"].select(
        "event_id", "ts", "user_id", "event_type"
    )


def _batch_pairs(events):
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    return interval_join(
        purchases, views, interval="1 hour", left_prefix="p", right_prefix="v"
    ).select("user_id", "p_event_id", "v_event_id")


def test_interval_join_stream_matches_batch_multibatch(spark, tmp_path):
    """Ordered multi-file arrival with maxFilesPerTrigger=1: several
    micro-batches, watermark advancing between them — state eviction is
    exercised (delay 2h > 1h interval, in-order arrival ⇒ lossless)."""
    events = _events(spark)
    drop = str(tmp_path / "join_drop")
    # write ts-ordered sequential files (mtime order = event-time order)
    from pyspark.sql import Window

    w_ts = Window.orderBy("ts")
    bucketed = events.withColumn("b", F.ntile(4).over(w_ts))
    for b in range(1, 5):
        bucketed.filter(F.col("b") == b).drop("b").coalesce(1).write.mode(
            "append"
        ).parquet(drop)
        time.sleep(1.1)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(drop)
    )
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = stream.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    pairs = interval_join(
        purchases,
        views,
        interval="1 hour",
        watermark_delay="2 hours",
        left_prefix="p",
        right_prefix="v",
    ).select("user_id", "p_event_id", "v_event_id")
    q = (
        pairs.writeStream.format("memory")
        .queryName("ij_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)

    got = {
        (r.user_id, r.p_event_id, r.v_event_id)
        for r in spark.sql("SELECT * FROM ij_pairs").collect()
    }
    want = {
        (r.user_id, r.p_event_id, r.v_event_id)
        for r in _batch_pairs(events).collect()
    }
    assert got == want and len(got) > 0


def test_interval_join_outer_key_never_null(spark):
    """ADVICE r4: with how='right_outer'/'full_outer', right-only rows
    must keep their key (coalesce(lf.key, rf.key)), not emit NULL."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "p1")],
        "user_id long, ts string, name string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 09:30:00", "v1"),   # matches
            (7, "2024-01-01 09:30:00", "v7"),   # right-only key
        ],
        "user_id long, ts string, name string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r.user_id, r.l_name, r.r_name)
        for r in interval_join(
            left, right, interval="1 hour", how="full_outer"
        ).collect()
    }
    assert (7, None, "v7") in got      # key preserved on right-only row
    assert (1, "p1", "v1") in got
    assert not any(k is None for k, _, _ in got)


def test_interval_join_rejects_bad_how(spark):
    import pytest

    left = spark.createDataFrame([(1,)], "user_id long").withColumn(
        "ts", F.current_timestamp()
    )
    with pytest.raises(ValueError, match="how must be one of"):
        interval_join(left, left, how="cross")


def test_interval_join_batch_bounds(spark):
    """Batch-path semantic pins: every matched view is within [p.ts-1h,
    p.ts] for its purchase, and boundary equality (v.ts == p.ts) joins."""
    events = _events(spark)
    rows = _batch_pairs(events).collect()
    assert len(rows) > 0
    ts = {r.event_id: r.ts for r in events.collect()}
    for r in rows:
        dt = (ts[r.p_event_id] - ts[r.v_event_id]).total_seconds()
        assert 0 <= dt <= 3600
