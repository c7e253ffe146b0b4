"""ml/quality_filter.py — model-based quality filtering (r11)."""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_etl_pipeline_spark.ml.quality_filter import (
    fit_quality_classifier,
    text_feature_frame,
)


def test_text_features_exact(spark):
    df = spark.createDataFrame(
        [(0, "aa bb aa"), (1, None), (2, "")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in text_feature_frame(df).collect()}
    assert got[0]["n_tokens"] == 3.0
    assert got[0]["n_chars"] == 8.0
    assert abs(got[0]["distinct_ratio"] - 2 / 3) < 1e-12
    assert abs(got[0]["avg_word_len"] - 8 / 3) < 1e-12
    for d in (1, 2):
        assert got[d]["n_tokens"] == 0.0
        assert got[d]["distinct_ratio"] == 0.0
        assert got[d]["avg_word_len"] == 0.0


def test_classifier_separates_and_preserves_mass(spark):
    # separable weak labels: positives are long docs, negatives short
    rows = [(i, float(40 + i), 1.0) for i in range(30)] + [
        (100 + i, float(3 + i % 5), 0.0) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens double, label double")
    m = fit_quality_classifier(df, label_col="label", feature_cols=["n_tokens"])
    scored = m.score(df)
    agg = scored.agg(
        F.sum("p_quality").alias("sp"),
        F.sum("label").alias("sy"),
        F.min(F.when(F.col("label") == 1.0, F.col("p_quality"))).alias("minpos"),
        F.max(F.when(F.col("label") == 0.0, F.col("p_quality"))).alias("maxneg"),
        # closed bounds: near-separable data can saturate the float64
        # sigmoid to exactly 0.0/1.0 (r11 ADVICE) — that is a valid
        # probability, not an invariant breach
        F.sum(
            F.when((F.col("p_quality") < 0) | (F.col("p_quality") > 1), 1)
            .otherwise(0)
        ).alias("oob"),
    ).collect()[0]
    # IRLS intercept score equation: predicted mass == observed mass
    assert abs(agg["sp"] - agg["sy"]) / agg["sy"] < 1e-3
    # separable data: every positive scores above every negative
    assert agg["minpos"] > agg["maxneg"]
    assert agg["oob"] == 0


def test_irls_fit_invariants_on_testdata(spark):
    """The float IRLS layer the registry gate no longer carries (it
    scores with pinned literals now): fit on real testdata features
    with the weak label and assert the score-equation mass balance
    plus probability bounds — the old gate's invariant columns,
    relocated here per the r12 contract change."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    feats = text_feature_frame(docs).join(
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            (F.col("lang") == "en").cast("double").alias("label"),
        ),
        "doc_id",
    ).localCheckpoint(eager=True)
    m = fit_quality_classifier(feats, label_col="label")
    agg = m.score(feats).agg(
        F.sum("p_quality").alias("sp"),
        F.sum("label").alias("sy"),
        F.sum(
            F.when((F.col("p_quality") < 0) | (F.col("p_quality") > 1), 1)
            .otherwise(0)
        ).alias("oob"),
    ).collect()[0]
    assert agg["sy"] > 0
    assert abs(agg["sp"] - agg["sy"]) / agg["sy"] < 1e-3
    assert agg["oob"] == 0


def test_pinned_literals_mirror_module_constants():
    """The gate's DuckDB oracle hard-codes the pinned coefficients as
    SQL literals; this pins them against the module constants so a
    coefficient refresh cannot drift one side silently."""
    import re

    from automated_etl_pipeline_spark.ml.quality_filter import (
        PINNED_COEF_E6,
        PINNED_TAU_LOGIT_E6,
    )
    from automated_etl_pipeline_spark.queries_llm import (
        _QUALITY_FILTER_ORACLE,
    )

    sql = _QUALITY_FILTER_ORACLE
    assert (
        str(PINNED_COEF_E6["intercept"] - PINNED_TAU_LOGIT_E6) + " * len(t)"
        in sql
    )
    assert f"{PINNED_COEF_E6['n_tokens']} * len(t) * len(t)" in sql
    assert re.search(
        rf"-\s*{abs(PINNED_COEF_E6['n_chars'])} \* n_chars \* len\(t\)", sql
    )
    assert f"{PINNED_COEF_E6['distinct_ratio']} * len(list_distinct(t))" in sql
    assert re.search(
        rf"-\s*{abs(PINNED_COEF_E6['avg_word_len'])} \* n_chars", sql
    )


def test_pinned_gate_counts_on_testdata(spark):
    import automated_etl_pipeline_spark.queries_llm  # noqa: F401  (registers)
    from automated_etl_pipeline_spark.queries import QUERIES

    rows = QUERIES["quality_classifier_filter"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 4
    assert sum(r["n_docs"] for r in rows) == 500
    # non-degenerate selection: keeps some, drops some, in every bucket
    assert all(0 < r["n_kept"] < r["n_docs"] for r in rows)
