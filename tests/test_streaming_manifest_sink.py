"""streaming/manifest_sink.py: exactly-once micro-batch commits into
a manifest table — replay no-ops, checkpoint resume, restart safety."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from automated_etl_pipeline_spark.io.manifest import (
    current_version,
    manifest_files,
    read_table,
)
from automated_etl_pipeline_spark.streaming.manifest_sink import (
    manifest_batch_committer,
    run_stream_to_manifest,
)


@pytest.fixture()
def dirs():
    made = [tempfile.mkdtemp(prefix=f"msink_{n}_") for n in ("drop", "tbl", "st")]
    yield made
    for d in made:
        shutil.rmtree(d, ignore_errors=True)


def _part(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def test_drain_commits_one_version_per_batch(spark, dirs):
    drop, tbl, st = dirs
    for i, (lo, hi) in enumerate([(0, 5), (5, 12), (12, 20)]):
        _part(spark, lo, hi).coalesce(1).write.mode("append").parquet(drop)
    schema = spark.read.parquet(drop).schema
    v = run_stream_to_manifest(spark, drop, schema, tbl, st)
    assert v == 3  # one commit per file at maxFilesPerTrigger=1
    got = sorted(r["k"] for r in read_table(spark, tbl).collect())
    assert got == list(range(20))


def test_replayed_batch_id_is_noop(spark, dirs):
    """The at-least-once half: foreachBatch re-delivery of an
    already-committed batch_id (crash between publish and checkpoint
    advance) must not double-append."""
    drop, tbl, st = dirs
    commit = manifest_batch_committer(tbl, "q")
    commit(_part(spark, 0, 10), 0)
    v = current_version(tbl)
    files = manifest_files(tbl)
    commit(_part(spark, 0, 10), 0)  # replay, same batch_id
    assert current_version(tbl) == v
    assert manifest_files(tbl) == files
    assert read_table(spark, tbl).count() == 10
    commit(_part(spark, 10, 15), 1)  # the NEXT batch still lands
    assert read_table(spark, tbl).count() == 15


def test_empty_batch_burns_no_version(spark, dirs):
    _, tbl, _ = dirs
    commit = manifest_batch_committer(tbl, "q")
    commit(_part(spark, 0, 3), 0)
    commit(_part(spark, 0, 3).filter(F.lit(False)), 1)
    assert current_version(tbl) == 1


def test_checkpoint_resume_ingests_only_new_files(spark, dirs):
    drop, tbl, st = dirs
    _part(spark, 0, 6).coalesce(1).write.mode("append").parquet(drop)
    schema = spark.read.parquet(drop).schema
    assert run_stream_to_manifest(spark, drop, schema, tbl, st) == 1
    _part(spark, 6, 9).coalesce(1).write.mode("append").parquet(drop)
    # SAME checkpoint: the source skips already-seen files
    assert run_stream_to_manifest(spark, drop, schema, tbl, st) == 2
    got = sorted(r["k"] for r in read_table(spark, tbl).collect())
    assert got == list(range(9))


def test_double_start_fresh_checkpoint_same_query_noops(spark, dirs):
    """A scheduler double-start (fresh checkpoint, same query name,
    same config) re-delivers every file under already-committed
    batch_ids — the run_id ledger absorbs all of it."""
    drop, tbl, st = dirs
    for lo, hi in [(0, 4), (4, 8)]:
        _part(spark, lo, hi).coalesce(1).write.mode("append").parquet(drop)
    schema = spark.read.parquet(drop).schema
    assert run_stream_to_manifest(spark, drop, schema, tbl, st) == 2
    st2 = tempfile.mkdtemp(prefix="msink_st2_")
    try:
        assert run_stream_to_manifest(spark, drop, schema, tbl, st2) == 2
    finally:
        shutil.rmtree(st2, ignore_errors=True)
    assert read_table(spark, tbl).count() == 8


def test_sink_feeds_incremental_mv(spark, dirs):
    """The composition the two r14 features exist for: a streaming
    ingest commits versioned batches, and the incremental MV tails
    them by version — each refresh folds only the newly committed
    batch, and the MV always equals a full recompute."""
    from automated_etl_pipeline_spark.io.mv import IncrementalAggView

    drop, tbl, st = dirs
    mv_root = tempfile.mkdtemp(prefix="msink_mv_")
    try:
        def part(lo, hi):
            return spark.range(lo, hi).select(
                (F.col("id") % 3).alias("g"),
                (F.col("id") * 2).cast("decimal(18,2)").alias("amt"),
            )

        view = IncrementalAggView(
            tbl, mv_root, ["g"], sum_cols={"amt_sum": "amt"}
        )
        part(0, 10).coalesce(1).write.mode("append").parquet(drop)
        schema = spark.read.parquet(drop).schema
        run_stream_to_manifest(spark, drop, schema, tbl, st)
        assert view.refresh(spark)["mode"] == "incremental"

        part(10, 30).coalesce(1).write.mode("append").parquet(drop)
        run_stream_to_manifest(spark, drop, schema, tbl, st)
        res = view.refresh(spark)
        assert res["mode"] == "incremental" and res["from"] == 1

        got = {
            (r["g"], r["n"], float(r["amt_sum"]))
            for r in view.read(spark).collect()
        }
        want = {
            (r["g"], r["n"], float(r["amt_sum"]))
            for r in read_table(spark, tbl)
            .groupBy("g")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("amt").cast("decimal(18,2)")).alias("amt_sum"),
            )
            .collect()
        }
        assert got == want
    finally:
        shutil.rmtree(mv_root, ignore_errors=True)
