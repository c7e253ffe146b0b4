"""Structured Streaming tests: file stream → watermark window → memory
sink, checked against the identical batch computation."""

from __future__ import annotations

from automated_etl_pipeline_spark.io.sources import load_testdata
from automated_etl_pipeline_spark.streaming.windows import (
    read_events_stream,
    run_to_memory_sink,
    windowed_counts,
)

SF = "/root/testdata/sf0.001"


def test_stream_matches_batch_window_agg(spark, tmp_path):
    # Materialize events as a microsecond-timestamp parquet drop zone
    # (the raw testdata file is TIMESTAMP(NANOS), which the streaming
    # file source can't scan without the same normalization batch uses).
    events = load_testdata(spark, SF, ["events"])["events"]
    drop = str(tmp_path / "drops")
    events.write.parquet(drop)

    stream = read_events_stream(spark, drop, max_files_per_trigger=2)
    assert stream.isStreaming
    q = run_to_memory_sink(windowed_counts(stream), "win_counts")
    q.awaitTermination(120)

    got = {
        (r.window_start, r.n_events)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    want = {
        (r.window_start, r.n_events)
        for r in windowed_counts(events).collect()  # same code, batch path
    }
    assert got == want and len(got) > 0
