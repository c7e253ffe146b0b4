"""Streaming CDC upsert (streaming/cdc.py): the drained snapshot must
equal the batch merge chain, stay exact when change files arrive in a
scrambled order (version LWW commutativity), and preserve unmatched
base rows."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from automated_etl_pipeline_spark.operators.merge import merge_upsert
from automated_etl_pipeline_spark.streaming.cdc import run_cdc_merge_stream


@pytest.fixture()
def tmpdirs():
    drop = tempfile.mkdtemp(prefix="cdc_test_drop_")
    state = tempfile.mkdtemp(prefix="cdc_test_state_")
    yield drop, state
    shutil.rmtree(drop, ignore_errors=True)
    shutil.rmtree(state, ignore_errors=True)


def _base(spark):
    rows = [(k, f"v0_{k}", 0) for k in range(20)]
    return spark.createDataFrame(rows, "k long, payload string, version long")


def _batches(spark):
    # overlapping key sets across versions, staged out of order
    specs = [
        (3, [2, 4, 6, 8]),
        (1, [0, 2, 4, 6, 8, 10, 12]),
        (2, [4, 8, 12, 16]),
    ]
    return [
        spark.createDataFrame(
            [(k, f"v{v}_{k}", v) for k in keys],
            "k long, payload string, version long",
        )
        for v, keys in specs
    ]


def test_stream_matches_batch_merge_chain(spark, tmpdirs):
    drop, state = tmpdirs
    base = _base(spark)
    batches = _batches(spark)
    for b in batches:
        b.coalesce(1).write.mode("append").parquet(drop)
    final = run_cdc_merge_stream(
        spark, base, drop, base.schema, ["k"], "version", state
    )
    expected = base
    for b in batches:
        expected = merge_upsert(expected, b, ["k"], version_col="version")
    assert sorted(map(tuple, final.collect())) == sorted(
        map(tuple, expected.collect())
    )


def test_final_state_is_per_key_max_version(spark, tmpdirs):
    drop, state = tmpdirs
    base = _base(spark)
    for b in _batches(spark):
        b.coalesce(1).write.mode("append").parquet(drop)
    final = run_cdc_merge_stream(
        spark, base, drop, base.schema, ["k"], "version", state
    )
    got = {r["k"]: (r["version"], r["payload"]) for r in final.collect()}
    assert len(got) == 20  # unmatched base rows survive
    # key 4 was touched by versions 1, 2, 3 -> version 3 wins
    assert got[4] == (3, "v3_4")
    # key 12 by versions 1 and 2 -> 2 wins; key 16 only by 2
    assert got[12] == (2, "v2_12")
    assert got[16] == (2, "v2_16")
    # untouched odd keys keep the base payload
    assert got[7] == (0, "v0_7")


def test_single_trigger_multi_version_batch_still_lww(spark, tmpdirs):
    """All change files in ONE micro-batch (maxFilesPerTrigger high):
    merge_upsert's window must pick the max version within the single
    union too — the degenerate batching the file source may produce."""
    drop, state = tmpdirs
    base = _base(spark)
    for b in _batches(spark):
        b.coalesce(1).write.mode("append").parquet(drop)
    final = run_cdc_merge_stream(
        spark,
        base,
        drop,
        base.schema,
        ["k"],
        "version",
        state,
        max_files_per_trigger=100,
    )
    got = {r["k"]: r["version"] for r in final.collect()}
    assert got[4] == 3 and got[12] == 2 and got[0] == 1 and got[1] == 0


def test_leftover_checkpoint_is_rejected(spark, tmpdirs):
    """r12 ADVICE: a reused state_root would let the file source skip
    already-seen change files while the snapshot re-seeds from base —
    silent update loss.  The runner must refuse to start."""
    import os

    import pytest

    drop, state = tmpdirs
    base = _base(spark)
    for b in _batches(spark):
        b.coalesce(1).write.mode("append").parquet(drop)
    run_cdc_merge_stream(
        spark, base, drop, base.schema, ["k"], "version", state
    )
    assert os.path.exists(os.path.join(state, "ckpt"))
    with pytest.raises(ValueError, match="leftover checkpoint"):
        run_cdc_merge_stream(
            spark, base, drop, base.schema, ["k"], "version", state
        )
