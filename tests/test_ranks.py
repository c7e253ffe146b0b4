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


def test_bucketed_global_ranks_matches_global_ranks(spark):
    """The materialization-free sibling (r13) must agree with
    global_ranks row-for-row on a frame with duplicates on the bucket
    column (ties resolved by the tiebreak), NULLs (bucket 0, ASC NULLS
    FIRST), and values straddling cut boundaries."""
    from automated_etl_pipeline_spark.operators.ranks import (
        bucketed_global_ranks,
    )

    rows = [(None, 0), (5, 1), (5, 2), (1, 3), (9, 4), (1, 5), (7, 6),
            (None, 7), (3, 8), (9, 9), (0, 10), (2, 11)]
    df = spark.createDataFrame(rows, "v long, tid long")
    got = {
        r["tid"]: r["__rank"]
        for r in bucketed_global_ranks(df, ["v", "tid"], n_buckets=4).collect()
    }
    ref, total = global_ranks(df, ["v", "tid"])
    want = {r["tid"]: r["__rank"] for r in ref.collect()}
    assert got == want and len(got) == total == 12


def test_bucketed_global_ranks_cut_invariance(spark):
    """Cutpoints only balance work: wildly different cut sets must
    yield the identical rank assignment."""
    from automated_etl_pipeline_spark.operators.ranks import (
        bucketed_global_ranks,
    )

    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate([42, 7, 7, 99, -3, 0, 42, 13])],
        "v long, tid long",
    )
    a = {
        r["tid"]: r["__rank"]
        for r in bucketed_global_ranks(
            df, ["v", "tid"], cuts=[0.0, 10.0, 50.0]
        ).collect()
    }
    b = {
        r["tid"]: r["__rank"]
        for r in bucketed_global_ranks(
            df, ["v", "tid"], cuts=[7.0]
        ).collect()
    }
    c = {
        r["tid"]: r["__rank"]
        for r in bucketed_global_ranks(df, ["v", "tid"], cuts=[]).collect()
    }
    assert a == b == c


def test_bucketed_global_ranks_rejects_reserved_columns(spark):
    from automated_etl_pipeline_spark.operators.ranks import (
        bucketed_global_ranks,
    )

    df = spark.createDataFrame([(1, 2)], "__b int, v long")
    with pytest.raises(ValueError, match="__b"):
        bucketed_global_ranks(df, ["v"])


def test_exact_zvalue_fused_matches_per_column_ranks(spark):
    """The fused z-rank construction must equal independently computed
    per-column global ranks pushed through the same closed-form tile."""
    from automated_etl_pipeline_spark.operators.ranks import global_ranks
    from automated_etl_pipeline_spark.operators.zorder import (
        interleave2,
        with_zvalue,
    )

    rows = [(i, (i * 37) % 50, float((i * 61) % 83)) for i in range(200)]
    df = spark.createDataFrame(rows, "rid long, a long, b double")
    got = {
        r["rid"]: r["zvalue"]
        for r in with_zvalue(
            df, ["a", "b"], tiebreak="rid", bits=4, exact=True
        ).collect()
    }
    r0, total = global_ranks(df, ["a", "rid"], "__r0")
    r1, _ = global_ranks(r0, ["b", "rid"], "__r1")
    ref = r1.withColumn(
        "zref",
        interleave2(
            F.expr(f"__r0 * 16 div {total}").cast("long"),
            F.expr(f"__r1 * 16 div {total}").cast("long"),
            4,
        ),
    )
    want = {r["rid"]: r["zref"] for r in ref.collect()}
    assert got == want and len(got) == 200


def test_quantile_cuts_balance_zipf_and_preserve_ranks(spark):
    """Skew-aware cuts (r13 VERDICT ask #4): under a Zipf-ish column,
    linspace cuts collapse nearly everything into bucket 0 while
    quantile cuts keep every bucket's share near 1/n_buckets — and the
    rank VALUES are identical under both cut sets (cut-invariance)."""
    from automated_etl_pipeline_spark.operators.ranks import (
        bucketed_global_ranks,
        linspace_cuts,
        order_bucket,
        quantile_cuts,
    )

    n, n_buckets = 4000, 8
    # deterministic heavy tail: 95% of the mass is DISTINCT values in a
    # dense low range, 5% are 1e9-scale outliers — the shape (key with
    # outliers) where linspace's min/max spread collapses the head
    head = int(n * 0.95)
    rows = [((tid * 37) % head, tid) for tid in range(head)] + [
        (10**9 + tid, tid) for tid in range(head, n)
    ]
    df = spark.createDataFrame(rows, "v long, tid long").repartition(8)

    lin = linspace_cuts(df, "v", n_buckets)
    qua = quantile_cuts(df, "v", n_buckets)
    assert qua == sorted(set(qua)), "quantile cuts must be strictly monotone"

    def max_share(cuts):
        counts = (
            df.withColumn("__b", order_bucket("v", cuts))
            .groupBy("__b")
            .count()
            .collect()
        )
        return max(r["count"] for r in counts) / n

    # linspace puts the Zipf head (small v, huge mass) in one bucket
    assert max_share(lin) > 0.5
    # quantile cuts bound the max bucket near 1/n_buckets (ties on the
    # single heaviest value can push one bucket past it, hence 2/n)
    assert max_share(qua) <= 2.0 / n_buckets

    a = {
        r["tid"]: r["__rank"]
        for r in bucketed_global_ranks(
            df, ["v", "tid"], cuts=lin
        ).collect()
    }
    b = {
        r["tid"]: r["__rank"]
        for r in bucketed_global_ranks(
            df, ["v", "tid"], cuts=qua
        ).collect()
    }
    assert a == b and len(a) == n


def test_bucketed_global_ranks_constant_column_falls_back(spark):
    """A constant first order column yields no cuts; the r13-ADVICE
    degeneracy must not become a silent single-task window — the
    operator warns and falls back to global_ranks, with identical
    values."""
    from automated_etl_pipeline_spark.operators.ranks import (
        bucketed_global_ranks,
    )

    df = spark.createDataFrame(
        [(7, i) for i in range(20)], "v long, tid long"
    )
    with pytest.warns(RuntimeWarning, match="falling back"):
        got = {
            r["tid"]: r["__rank"]
            for r in bucketed_global_ranks(df, ["v", "tid"]).collect()
        }
    ref, _ = global_ranks(df, ["v", "tid"])
    assert got == {r["tid"]: r["__rank"] for r in ref.collect()}


def test_bucketed_global_ranks_rejects_non_numeric_order(spark):
    """A string first order column would silently collapse to one
    bucket (cast-to-double NULLs) — must fail loudly instead."""
    from automated_etl_pipeline_spark.operators.ranks import (
        bucketed_global_ranks,
    )

    df = spark.createDataFrame([("a", 1), ("b", 2)], "s string, tid long")
    with pytest.raises(TypeError, match="NUMERIC first order"):
        bucketed_global_ranks(df, ["s", "tid"])
