"""Behavioral invariants for the round-8 analytics wave.

The registry gates value-hash each construction against DuckDB on the
real testdata; these tests pin the STATISTICAL behavior the operators
exist for, on planted frames the testdata cannot produce: a CUSUM
peak must land at a planted level shift, KS must separate a planted
distribution change from a null split, Gini must span its analytic
extremes, and the weighted median must collapse to the plain median
under equal weights and to the dominant point under a dominant
weight."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window


def _cusum_peak(spark, values):
    """Replicates the cusum_change_point core on a single series."""
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "i long, v double"
    )
    mu = df.agg(
        (F.sum(F.col("v").cast("decimal(18,6)")).cast("double")
         / F.count(F.lit(1))).alias("mu")
    ).collect()[0]["mu"]
    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    c = df.select(
        "i",
        F.sum((F.col("v") - F.lit(mu)).cast("decimal(18,6)"))
        .over(w)
        .alias("cusum"),
    )
    row = c.orderBy(F.abs(F.col("cusum")).desc(), F.col("i").desc()).first()
    return row["i"], abs(float(row["cusum"]))


def test_cusum_peak_lands_at_planted_shift(spark):
    # level 10 for 200 points, then level 20: the |CUSUM| peak is
    # exactly at the last pre-shift index (the change point)
    series = [10.0] * 200 + [20.0] * 100
    i, mag = _cusum_peak(spark, series)
    assert i == 199
    # peak magnitude = n1*n2/n * |delta| = 200*100/300 * 10
    assert mag == pytest.approx(200 * 100 / 300 * 10, rel=1e-6)


def test_cusum_flat_series_has_no_peak(spark):
    i, mag = _cusum_peak(spark, [5.0] * 100)
    assert mag == pytest.approx(0.0, abs=1e-9)


def _ks(spark, a_vals, b_vals):
    rows = [(int(v), 1, 0) for v in a_vals] + [(int(v), 0, 1) for v in b_vals]
    df = spark.createDataFrame(rows, "bin long, ca int, cb int")
    bins = df.groupBy("bin").agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = bins.select(
        F.sum("ca").over(wcum).alias("cna"),
        F.sum("cb").over(wcum).alias("cnb"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"),
    )
    return cum.agg(
        F.max(
            F.abs(
                F.col("cna").cast("double") / F.col("na")
                - F.col("cnb").cast("double") / F.col("nb")
            )
        ).alias("ks")
    ).collect()[0]["ks"]


def test_ks_separates_shifted_distribution_from_null_split(spark):
    base = [i % 50 for i in range(2000)]
    null_ks = _ks(spark, base, base)  # identical distributions
    shifted = [(i % 50) + 25 for i in range(2000)]  # half-range shift
    drift_ks = _ks(spark, base, shifted)
    assert null_ks == pytest.approx(0.0, abs=1e-12)
    assert drift_ks == pytest.approx(0.5, abs=0.02)  # 25/50 overlap gone


def _gini(spark, spends):
    df = spark.createDataFrame(
        [(i, float(s)) for i, s in enumerate(spends)], "ck long, s double"
    )
    w = Window.partitionBy()
    r = df.select(
        F.col("s").cast("decimal(18,2)").alias("s"),
        F.row_number().over(Window.orderBy("s", "ck")).alias("i"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(F.col("s").cast("decimal(18,2)")).over(w).alias("tot"),
    )
    row = r.agg(
        (
            F.lit(2.0)
            * F.sum(F.col("i").cast("decimal(18,0)") * F.col("s")).cast("double")
            / (F.first("n") * F.first("tot").cast("double"))
            - (F.first("n") + F.lit(1.0)) / F.first("n")
        ).alias("g")
    ).collect()[0]
    return float(row["g"])


def test_gini_spans_analytic_extremes(spark):
    n = 100
    assert _gini(spark, [7.0] * n) == pytest.approx(0.0, abs=1e-9)
    # one owner of everything: G = (n-1)/n
    concentrated = [0.01] * (n - 1) + [1_000_000.0]
    assert _gini(spark, concentrated) == pytest.approx((n - 1) / n, abs=0.01)


def test_weighted_median_reductions(spark):
    from pyspark.sql import functions as F  # noqa: F811

    def wmedian(pairs):
        df = spark.createDataFrame(
            [(float(v), int(q), i) for i, (v, q) in enumerate(pairs)],
            "price double, qty long, id long",
        )
        w = Window.orderBy("price", "id")
        c = df.select(
            "price",
            F.sum("qty").over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cum"),
            F.sum("qty").over(Window.partitionBy()).alias("tot"),
        )
        return c.agg(
            F.min(F.when(F.col("cum") * 2 >= F.col("tot"), F.col("price")))
            .alias("m")
        ).collect()[0]["m"]

    # equal weights -> plain lower median
    assert wmedian([(v, 1) for v in [1, 2, 3, 4, 5]]) == 3.0
    assert wmedian([(v, 1) for v in [1, 2, 3, 4]]) == 2.0  # lower median
    # dominant weight -> the dominant point regardless of other values
    assert wmedian([(1, 1), (2, 1), (99, 100), (100, 1)]) == 99.0
