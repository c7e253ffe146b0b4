"""Robust (median/MAD) outlier statistics — operators/robust.py.

The registry gate (`quality_mad_outliers`) value-checks the stats
plan against DuckDB on the uniform synthetic corpus, where the
outlier count is legitimately zero.  These tests pin the behavior the
operator exists for, on a contaminated frame the gate's data cannot
produce:

- a planted heavy tail is caught completely (every planted point
  beyond the cut flagged, nothing clean flagged);
- the threshold itself is contamination-proof (adding the tail moves
  the MAD cut by ~nothing, while the mean/stddev cut provably
  collapses — the breakdown-point claim, measured not asserted);
- `mad_filter` drops exactly the flagged rows and keeps degenerate
  (MAD=0) groups intact;
- the approx=True path agrees with the exact path on n_outliers for
  a tail this far out (GK epsilon moves the median by < eps*range).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from automated_etl_pipeline_spark.operators.robust import (
    MAD_SIGMA,
    mad_filter,
    robust_group_stats,
)


def _contaminated(spark, n_clean: int = 500, n_tail: int = 25):
    """Uniform core [100, 200) + a planted far tail at 10_000+i."""
    clean = [(i, "g", 100.0 + (i * 37 % 100)) for i in range(n_clean)]
    tail = [(n_clean + i, "g", 10_000.0 + i) for i in range(n_tail)]
    return spark.createDataFrame(
        clean + tail, "id long, grp string, x double"
    )


def test_planted_tail_fully_caught_nothing_clean_flagged(spark):
    df = _contaminated(spark)
    stats = robust_group_stats(df, "x", ["grp"], z_cut=3.0).collect()[0]
    assert stats["n_outliers"] == 25
    # median/MAD computed over 525 rows but anchored in the clean core
    assert 100 <= stats["med"] <= 200
    kept = mad_filter(df, "x", ["grp"], z_cut=3.0)
    kept_ids = {r.id for r in kept.collect()}
    assert kept_ids == set(range(500))  # exactly the clean core


def test_threshold_is_contamination_proof_where_mean_stddev_is_not(spark):
    clean = _contaminated(spark, n_tail=0)
    dirty = _contaminated(spark, n_tail=25)

    def mad_cut(df):
        s = robust_group_stats(df, "x", ["grp"]).collect()[0]
        return s["med"] + 3.0 * MAD_SIGMA * s["mad"]

    def sigma_cut(df):
        r = df.agg(F.mean("x").alias("m"), F.stddev("x").alias("s")).collect()[0]
        return r["m"] + 3.0 * r["s"]

    # 4.7% contamination moves the robust cut by < 5% ...
    assert abs(mad_cut(dirty) - mad_cut(clean)) / mad_cut(clean) < 0.05
    # ... while the same tail blows the sigma cut out by an order of
    # magnitude (the estimator is dragged by the garbage it should cut)
    assert sigma_cut(dirty) > 3_000
    assert sigma_cut(clean) < 400

    # Masking, the textbook failure: one enormous outlier inflates
    # sigma until 24 moderate outliers fall back INSIDE the 3-sigma
    # cut.  MAD's cut doesn't move, so it flags all 25.
    clean_rows = [(i, "g", 100.0 + (i * 37 % 100)) for i in range(500)]
    masked = spark.createDataFrame(
        clean_rows
        + [(500 + i, "g", 600.0 + i) for i in range(24)]  # moderate
        + [(990, "g", 50_000.0)],  # enormous
        "id long, grp string, x double",
    )
    n_sigma = masked.where(F.col("x") > sigma_cut(masked)).count()
    assert n_sigma == 1  # sigma sees only the enormous one
    s = robust_group_stats(masked, "x", ["grp"]).collect()[0]
    assert s["n_outliers"] == 25  # MAD sees all of them


def test_degenerate_mad_zero_group_kept_whole(spark):
    # >50% identical values -> MAD = 0; the filter must not divide by
    # zero or drop the group.
    df = spark.createDataFrame(
        [(i, "d", 5.0) for i in range(10)] + [(10, "d", 9.0)],
        "id long, grp string, x double",
    )
    assert mad_filter(df, "x", ["grp"]).count() == 11
    s = robust_group_stats(df, "x", ["grp"]).collect()[0]
    assert s["mad"] == 0.0


def test_multi_group_independence(spark):
    # a tail in one group must not affect the other group's cut
    a = [(i, "a", 100.0 + (i % 50)) for i in range(200)]
    b = [(1000 + i, "b", 100.0 + (i % 50)) for i in range(200)]
    tail = [(5000 + i, "a", 50_000.0) for i in range(10)]
    df = spark.createDataFrame(a + b + tail, "id long, grp string, x double")
    rows = {
        r["grp"]: r
        for r in robust_group_stats(df, "x", ["grp"]).collect()
    }
    assert rows["a"]["n_outliers"] == 10
    assert rows["b"]["n_outliers"] == 0
    # group a's median includes its 10 tail rows (they shift the rank,
    # not the scale) — still within a couple of core values of b's
    assert rows["a"]["med"] == pytest.approx(rows["b"]["med"], abs=3.0)


def test_approx_path_agrees_on_far_tail(spark):
    df = _contaminated(spark)
    exact = robust_group_stats(df, "x", ["grp"]).collect()[0]
    approx = robust_group_stats(df, "x", ["grp"], approx=True).collect()[0]
    assert approx["n_outliers"] == exact["n_outliers"] == 25
    assert approx["med"] == pytest.approx(exact["med"], rel=0.01)


def test_null_values_kept_uniformly(spark):
    # NULL x must survive the filter in BOTH normal (MAD > 0) and
    # degenerate (MAD = 0) groups — an outlier filter never silently
    # judges missing values (ADVICE r8).
    normal = [(i, "n", 100.0 + (i * 37 % 100)) for i in range(20)]
    degen = [(100 + i, "d", 5.0) for i in range(10)]
    nulls = [(900, "n", None), (901, "d", None)]
    df = spark.createDataFrame(
        normal + degen + nulls, "id long, grp string, x double"
    )
    kept_ids = {r.id for r in mad_filter(df, "x", ["grp"]).collect()}
    assert {900, 901} <= kept_ids
    assert kept_ids == set(range(20)) | {100 + i for i in range(10)} | {900, 901}


def test_int_median_and_stats_ignore_nulls(spark):
    """r10 review: engine-default NULL ordering diverges (Spark NULLS
    FIRST vs DuckDB NULLS LAST ascending), so the integer median path
    must drop NULLs before ranking — median of non-nulls, n_rows =
    non-null count, all-null groups emit no row."""
    from automated_etl_pipeline_spark.operators.robust import (
        int_group_median2,
        robust_group_stats_int,
    )

    df = spark.createDataFrame(
        [("a", None), ("a", 10), ("a", 20), ("b", None), ("b", None)],
        "g string, v int",
    )
    med = {
        r.g: r.med2
        for r in int_group_median2(df, "v", ["g"]).collect()
    }
    assert med == {"a": 30}  # (10+20); group b (all-null) absent
    stats = robust_group_stats_int(df, "v", ["g"]).collect()
    assert len(stats) == 1 and stats[0].g == "a" and stats[0].n_rows == 2
