"""Largest-remainder apportionment + exact-quota take
(operators/apportion.py).  The registry gate value-checks one
allocation; these pin the invariants on adversarial weight shapes."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from automated_etl_pipeline_spark.operators.apportion import (
    largest_remainder_quotas,
    quota_stratified_sample,
)


def _frame(spark, sizes: dict[str, int], weights: dict[str, float]):
    rows = []
    i = 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append((i, g, weights[g]))
            i += 1
    return spark.createDataFrame(rows, "id long, grp string, w double")


@pytest.mark.parametrize(
    "sizes,weights,total",
    [
        # skewed weights, plenty of rows
        ({"a": 50, "b": 50, "c": 50}, {"a": 1.0, "b": 2.0, "c": 7.0}, 37),
        # near-uniform: remainders decide almost everything
        ({"a": 40, "b": 40, "c": 40, "d": 40},
         {"a": 1.0, "b": 1.0001, "c": 0.9999, "d": 1.0}, 10),
        # a dominant group
        ({"a": 30, "b": 200}, {"a": 0.01, "b": 10.0}, 100),
    ],
)
def test_quota_sums_exactly_and_errors_below_one(spark, sizes, weights, total):
    df = _frame(spark, sizes, weights)
    q = {r["grp"]: r["quota"] for r in
         largest_remainder_quotas(df, ["grp"], "w", total).collect()}
    assert sum(q.values()) == total
    # Hamilton optimality: every quota within 1 of its exact share
    tw = sum(sizes[g] * weights[g] for g in sizes)
    for g in sizes:
        share = total * sizes[g] * weights[g] / tw
        assert abs(q[g] - share) < 1.0, (g, q[g], share)


def test_quota_capped_at_group_size(spark):
    # group a: huge weight but only 3 rows -> capped at 3 (documented:
    # the shortfall is not redistributed)
    df = _frame(spark, {"a": 3, "b": 50}, {"a": 1000.0, "b": 1.0})
    q = {r["grp"]: r["quota"] for r in
         largest_remainder_quotas(df, ["grp"], "w", 20).collect()}
    assert q["a"] == 3


def test_take_is_exact_and_deterministic(spark):
    df = _frame(spark, {"a": 80, "b": 120}, {"a": 3.0, "b": 1.0})
    quotas = largest_remainder_quotas(df, ["grp"], "w", 50)
    want = {r["grp"]: r["quota"] for r in quotas.collect()}

    def take(pretrim):
        s = quota_stratified_sample(df, quotas, ["grp"], "id",
                                    pretrim_cap=pretrim)
        got = s.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("id").alias("ck"),
        ).collect()
        return {r["grp"]: (r["n"], r["ck"]) for r in got}

    r1, r2 = take(None), take(50)  # with and without the pre-trim
    assert r1 == r2  # pre-trim changes the plan, never the sample
    for g, (n, _) in r1.items():
        assert n == want[g]


def test_pretrim_plan_uses_window_group_limit(spark):
    df = _frame(spark, {"a": 80, "b": 120}, {"a": 3.0, "b": 1.0})
    quotas = largest_remainder_quotas(df, ["grp"], "w", 50)
    plan = quota_stratified_sample(
        df, quotas, ["grp"], "id", pretrim_cap=50
    )._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_pretrim_cap_below_max_quota_fails_loudly(spark):
    # a cap below max(quota) would silently undersample; the plan's
    # lazy in-filter assert must fail the job at execution instead
    # (ADVICE r8; made lazy per r9 code review — no eager driver job,
    # no double computation of the quotas lineage)
    df = _frame(spark, {"a": 80, "b": 120}, {"a": 3.0, "b": 1.0})
    quotas = largest_remainder_quotas(df, ["grp"], "w", 50)
    max_q = max(r["quota"] for r in quotas.collect())
    bad = quota_stratified_sample(
        df, quotas, ["grp"], "id", pretrim_cap=max_q - 1
    )  # construction stays lazy — no error yet
    with pytest.raises(Exception, match="undersample"):
        bad.collect()
