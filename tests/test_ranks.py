"""operators/ranks.py — the shared two-phase global-rank/offset
construction (extracted r10) plus the r10-ADVICE conf-robustness fix."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_etl_pipeline_spark.operators.ranks import (
    global_ranks,
    partition_offsets,
)


def test_global_ranks_matches_sorted_order(spark):
    rows = [(v,) for v in [9, 3, 7, 1, 5, 8, 2, 6, 0, 4]]
    df = spark.createDataFrame(rows, "v long")
    ranked, total = global_ranks(df, ["v"])
    assert total == 10
    got = {r["v"]: r["__rank"] for r in ranked.collect()}
    assert got == {v: v for v in range(10)}


def test_partition_offsets_rejects_reserved_columns(spark):
    df = spark.createDataFrame([(1, 2)], "__pid int, v long")
    with pytest.raises(ValueError, match="__pid"):
        partition_offsets(df, ["v"])


def test_partition_offsets_weighted_total(spark):
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "k long, w long"
    )
    _, off_df, total = partition_offsets(df, ["k"], weight_col="w")
    assert total == sum(range(1, 7))
    offs = sorted(r["__off"] for r in off_df.collect())
    assert offs[0] == 0 and all(a <= b for a, b in zip(offs, offs[1:]))


def test_non_numeric_shuffle_conf_falls_back(spark, monkeypatch):
    """r10 ADVICE: deployments with spark.sql.shuffle.partitions='auto'
    (AQE-managed) must not blow up every rank-based operator — the
    helper falls back to defaultParallelism."""
    conf_cls = type(spark.conf)
    real_get = conf_cls.get

    def fake_get(self, key, default=None):
        if key == "spark.sql.shuffle.partitions":
            return "auto"
        return real_get(self, key) if default is None else real_get(
            self, key, default
        )

    monkeypatch.setattr(conf_cls, "get", fake_get)
    df = spark.createDataFrame([(v,) for v in [3, 1, 2]], "v long")
    ranked, total = global_ranks(df, ["v"])
    assert total == 3
    assert [r["v"] for r in ranked.orderBy("__rank").collect()] == [1, 2, 3]
