"""io/mv.py: incremental materialized-view maintenance over the
manifest change feed — fold-equals-recompute, fallback on non-append
commits, idempotent and conflict-safe refreshes."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from automated_etl_pipeline_spark.io.manifest import (
    commit_append,
    commit_delete,
    commit_rewrite,
    current_version,
    read_table,
)
from automated_etl_pipeline_spark.io.mv import IncrementalAggView


@pytest.fixture()
def roots():
    src = tempfile.mkdtemp(prefix="mv_src_")
    mv = tempfile.mkdtemp(prefix="mv_mv_")
    yield src, mv
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(mv, ignore_errors=True)


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 3).alias("g"),
        F.col("id").alias("k"),
        (F.col("id") * 10).cast("decimal(18,2)").alias("amt"),
    )


def _view(src, mv):
    return IncrementalAggView(src, mv, ["g"], sum_cols={"amt_sum": "amt"})


def _mv_state(spark, view):
    return {
        (r["g"], r["n"], float(r["amt_sum"]))
        for r in view.read(spark).collect()
    }


def _recompute(spark, src):
    return {
        (r["g"], r["n"], float(r["amt_sum"]))
        for r in read_table(spark, src)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("amt").cast("decimal(18,2)")).alias("amt_sum"),
        )
        .collect()
    }


def test_incremental_refresh_equals_full_recompute(spark, roots):
    src, mv = roots
    view = _view(src, mv)
    for i, (lo, hi) in enumerate([(0, 10), (10, 25), (25, 40)]):
        commit_append(_rows(spark, lo, hi), src, f"a{i}")
        res = view.refresh(spark)
        assert res["mode"] == "incremental"
        assert _mv_state(spark, view) == _recompute(spark, src)


def test_noop_when_source_unchanged(spark, roots):
    src, mv = roots
    view = _view(src, mv)
    commit_append(_rows(spark, 0, 10), src, "a0")
    assert view.refresh(spark)["mode"] == "incremental"
    mv_v = current_version(mv)
    res = view.refresh(spark)
    assert res["mode"] == "noop"
    assert current_version(mv) == mv_v  # no empty commit


def test_fallback_to_full_after_source_rewrite(spark, roots):
    src, mv = roots
    view = _view(src, mv)
    commit_append(_rows(spark, 0, 10), src, "a0")
    view.refresh(spark)
    base = current_version(src)
    commit_rewrite(
        read_table(spark, src).filter(F.col("k") < 5),
        src,
        "compact",
        expected_base=base,
    )
    commit_append(_rows(spark, 50, 55), src, "a1")
    res = view.refresh(spark)
    assert res["mode"] == "full"
    assert _mv_state(spark, view) == _recompute(spark, src)


def test_fallback_to_full_after_source_delete(spark, roots):
    src, mv = roots
    view = _view(src, mv)
    commit_append(_rows(spark, 0, 12), src, "a0")
    view.refresh(spark)
    commit_delete(
        spark.createDataFrame([(2,), (7,)], "k long"), src, "d0", ["k"]
    )
    res = view.refresh(spark)
    assert res["mode"] == "full"
    assert _mv_state(spark, view) == _recompute(spark, src)
    # and the feed is tailable again afterwards
    commit_append(_rows(spark, 100, 105), src, "a1")
    assert view.refresh(spark)["mode"] == "incremental"
    assert _mv_state(spark, view) == _recompute(spark, src)


def test_watermark_recovered_from_mv_manifest(spark, roots):
    """A brand-new view object over an existing MV table resumes from
    the stored watermark — no side state."""
    src, mv = roots
    commit_append(_rows(spark, 0, 10), src, "a0")
    _view(src, mv).refresh(spark)
    commit_append(_rows(spark, 10, 20), src, "a1")
    fresh = _view(src, mv)
    assert fresh.last_refreshed_source_version() == 1
    res = fresh.refresh(spark)
    assert res["mode"] == "incremental" and res["from"] == 1
    assert _mv_state(spark, fresh) == _recompute(spark, src)


def test_refresh_schema_stable_across_many_folds(spark, roots):
    """Re-aggregating widened decimals would drift the sum type on
    every refresh; the pinned partial scale must keep refresh N's
    schema identical to refresh 1's."""
    src, mv = roots
    view = _view(src, mv)
    commit_append(_rows(spark, 0, 5), src, "a0")
    view.refresh(spark)
    schema0 = view.read(spark).schema.simpleString()
    for i in range(1, 4):
        commit_append(_rows(spark, 5 * i, 5 * i + 5), src, f"a{i}")
        view.refresh(spark)
    assert view.read(spark).schema.simpleString() == schema0


def test_concurrent_refresher_conflict_resolves(spark, roots):
    """A refresh racing another refresher's MV commit must not corrupt
    the MV: the loser re-reads the winner's watermark and lands on a
    noop (or a further increment), never a double fold."""
    src, mv = roots
    view_a = _view(src, mv)
    view_b = _view(src, mv)
    commit_append(_rows(spark, 0, 10), src, "a0")
    view_a.refresh(spark)
    commit_append(_rows(spark, 10, 20), src, "a1")
    view_b.refresh(spark)  # B wins the v2 fold
    res = view_a.refresh(spark)  # A must see B's work and noop
    assert res["mode"] == "noop"
    assert _mv_state(spark, view_a) == _recompute(spark, src)


def test_cdf_refresh_folds_retractions_incrementally(spark, roots):
    """A recorded delete refreshes as negative partials — no full
    recompute — and the MV still equals recomputation, including the
    disappearance of fully retracted groups."""
    src, mv = roots
    view = _view(src, mv)
    commit_append(_rows(spark, 0, 12), src, "a0")
    view.refresh(spark)
    # g == 1 <=> k % 3 == 1: retract ALL of group 1 plus part of 2
    commit_delete(
        spark.createDataFrame(
            [(k,) for k in (1, 4, 7, 10, 2)], "k long"
        ),
        src,
        "d0",
        ["k"],
        record_changes=True,
    )
    res = view.refresh(spark)
    assert res["mode"] == "incremental_cdf"
    assert _mv_state(spark, view) == _recompute(spark, src)
    assert 1 not in {g for (g, _, _) in _mv_state(spark, view)}
    # and a subsequent plain append still folds incrementally
    commit_append(_rows(spark, 100, 104), src, "a1")
    assert view.refresh(spark)["mode"] == "incremental"
    assert _mv_state(spark, view) == _recompute(spark, src)


def test_unrecorded_delete_still_falls_back_to_full(spark, roots):
    src, mv = roots
    view = _view(src, mv)
    commit_append(_rows(spark, 0, 10), src, "a0")
    view.refresh(spark)
    commit_delete(
        spark.createDataFrame([(3,)], "k long"), src, "d0", ["k"]
    )
    res = view.refresh(spark)
    assert res["mode"] == "full"
    assert _mv_state(spark, view) == _recompute(spark, src)


def test_cdf_first_refresh_from_scratch_matches_recompute(spark, roots):
    """last == 0 with a recorded delete in range: the signed delta IS
    the whole state; net-zero groups must not linger."""
    src, mv = roots
    commit_append(_rows(spark, 0, 9), src, "a0")
    commit_delete(
        spark.createDataFrame(
            [(k,) for k in (2, 5, 8)], "k long"  # all of g == 2
        ),
        src,
        "d0",
        ["k"],
        record_changes=True,
    )
    view = _view(src, mv)
    res = view.refresh(spark)
    assert res["mode"] == "incremental_cdf"
    assert _mv_state(spark, view) == _recompute(spark, src)
    assert 2 not in {g for (g, _, _) in _mv_state(spark, view)}


def test_cdf_net_zero_count_with_nonzero_sum_still_folds(spark, roots):
    """Review r14: a delta whose COUNT nets to zero can still move the
    SUM (retract an old 10, insert a new 1000).  The signed partial
    must survive to the fold — dropping it leaves the MV silently
    stale."""
    src, mv = roots
    view = _view(src, mv)
    commit_append(_rows(spark, 0, 4), src, "a0")  # g1 = {k=1, amt=10}
    view.refresh(spark)
    commit_append(  # new g1 row with a different amount
        spark.createDataFrame(
            [(1, 100, 1000)], "g long, k long, amt long"
        ).select("g", "k", F.col("amt").cast("decimal(18,2)").alias("amt")),
        src,
        "a1",
    )
    commit_delete(  # retract the ORIGINAL g1 row (k=1, amt=10)
        spark.createDataFrame([(1,)], "k long"),
        src,
        "d0",
        ["k"],
        record_changes=True,
    )
    res = view.refresh(spark)
    assert res["mode"] == "incremental_cdf"
    assert _mv_state(spark, view) == _recompute(spark, src)
    g1 = {(g, n, s) for (g, n, s) in _mv_state(spark, view) if g == 1}
    assert g1 == {(1, 1, 1000.0)}


def test_full_recompute_pins_the_watermark_version(spark, roots, monkeypatch):
    """Review r14: the full-recompute fallback must read the snapshot
    AT the watermark it stamps — a concurrent commit landing mid-
    refresh would otherwise be folded twice (once inside the unpinned
    recompute, again by the next incremental refresh)."""
    import automated_etl_pipeline_spark.io.mv as mv_mod

    src, mv = roots
    view = _view(src, mv)
    commit_append(_rows(spark, 0, 10), src, "a0")
    view.refresh(spark)
    commit_append(_rows(spark, 10, 20), src, "a1")

    real_read_changes = mv_mod.read_changes

    def sneaky(spark_, root_, lo, hi):
        # a concurrent append lands AFTER the refresh captured src_v,
        # then the range is declared unrepresentable (forces full)
        commit_append(_rows(spark, 50, 55), src, "sneak")
        raise ValueError("forced full for the race simulation")

    def refuse_cdf(spark_, root_, lo, hi):
        raise ValueError("no CDF either")

    monkeypatch.setattr(mv_mod, "read_changes", sneaky)
    monkeypatch.setattr(mv_mod, "read_changes_cdf", refuse_cdf)
    res = view.refresh(spark)
    assert res["mode"] == "full"
    monkeypatch.setattr(mv_mod, "read_changes", real_read_changes)
    from automated_etl_pipeline_spark.io.manifest import read_changes_cdf

    monkeypatch.setattr(mv_mod, "read_changes_cdf", read_changes_cdf)
    # the sneak commit must be folded exactly ONCE, by this refresh
    res2 = view.refresh(spark)
    assert res2["mode"] == "incremental"
    assert _mv_state(spark, view) == _recompute(spark, src)


def test_count_alias_cannot_collide_with_key(spark, roots):
    src, mv = roots
    with pytest.raises(ValueError, match="count_alias"):
        IncrementalAggView(src, mv, ["n"], count_alias="n")
