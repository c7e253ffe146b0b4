"""Scale-tooling tests: bucketed co-located joins (no Exchange) and
salted skew joins (result parity with the plain join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_etl_pipeline_spark.io.bucketing import read_table, write_bucketed
from automated_etl_pipeline_spark.io.sources import load_testdata
from automated_etl_pipeline_spark.operators.skew import (
    salted_join,
    salted_join_hybrid,
)
from automated_etl_pipeline_spark.plans.explain import executed_plan

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark):
    t = load_testdata(spark, SF, ["orders", "customer"])
    write_bucketed(t["orders"], "b_orders", ["o_custkey"], 4)
    write_bucketed(t["customer"], "b_customer", ["c_custkey"], 4)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_table(spark, "b_orders").join(
            read_table(spark, "b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located read
        # parity with the unbucketed join
        want = t["orders"].join(
            t["customer"], t["orders"].o_custkey == t["customer"].c_custkey
        )
        assert joined.count() == want.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


@pytest.fixture(scope="module")
def skewed(spark):
    # power-law: key 0 holds half of all rows
    big = spark.range(0, 20_000).select(
        F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    return big, small


def test_salted_join_parity(spark, skewed):
    big, small = skewed
    plain = big.join(small, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    )
    salted = salted_join(big, small, "k", salt=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    )
    assert plain.collect() == salted.collect()


def test_salted_join_spreads_hot_key(spark, skewed):
    big, small = skewed
    spread = (
        big.withColumn("__salt", (F.rand(42) * 8).cast("int"))
        .filter(F.col("k") == 0)
        .groupBy("__salt")
        .count()
    )
    rows = spread.collect()
    assert len(rows) == 8  # the hot key now occupies 8 sub-partitions
    counts = [r["count"] for r in rows]
    assert max(counts) < sum(counts) * 0.3  # roughly uniform


def test_salted_join_hybrid_parity(spark, skewed):
    big, small = skewed
    plain = big.join(small, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    )
    hybrid = salted_join_hybrid(big, small, "k", salt=4, hot_min_count=1_000).agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    )
    assert plain.collect() == hybrid.collect()
