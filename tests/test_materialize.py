"""plans/materialize.py — stat-clean materialization for iterative
algorithms (the r11 suffix-array planning-blowup fix)."""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_etl_pipeline_spark.plans.materialize import materialize


def _size_bits(df) -> int:
    s = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    return int(s).bit_length()


def test_materialize_preserves_data_and_schema(spark):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k long, v string"
    )
    out = materialize(df.withColumn("k2", F.col("k") * 2))
    assert out.schema.simpleString() == "struct<k:bigint,v:string,k2:bigint>"
    got = {(r["k"], r["v"], r["k2"]) for r in out.collect()}
    assert got == {(i, f"v{i}", 2 * i) for i in range(100)}


def test_materialize_bounds_stats_in_iterative_join_loop(spark):
    """A localCheckpoint-only loop squares the preserved sizeInBytes
    stat every round (bit-length grows geometrically until Catalyst
    planning is BigInt-multiplication-bound); materialize must pin it
    at the 64-bit default regardless of round count."""
    cur = materialize(
        spark.createDataFrame([(i, 1) for i in range(50)], "k long, r long")
    )
    for _ in range(4):
        shifted = cur.select(
            (F.col("k") + 1).alias("k"), F.col("r").alias("r2")
        )
        cur = materialize(
            cur.join(shifted, "k", "left").select(
                "k", (F.col("r") + F.coalesce("r2", F.lit(0))).alias("r")
            )
        )
        assert _size_bits(cur) <= 64
    # data sanity after 4 rounds: r doubles once per round where a
    # neighbor exists; row count unchanged
    assert cur.count() == 50
