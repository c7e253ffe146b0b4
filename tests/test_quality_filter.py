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
        F.sum(
            F.when((F.col("p_quality") <= 0) | (F.col("p_quality") >= 1), 1)
            .otherwise(0)
        ).alias("oob"),
    ).collect()[0]
    # IRLS intercept score equation: predicted mass == observed mass
    assert abs(agg["sp"] - agg["sy"]) / agg["sy"] < 1e-3
    # separable data: every positive scores above every negative
    assert agg["minpos"] > agg["maxneg"]
    assert agg["oob"] == 0


def test_gate_invariants_hold_on_testdata(spark):
    import automated_etl_pipeline_spark.queries_llm  # noqa: F401  (registers)
    from automated_etl_pipeline_spark.queries import QUERIES

    rows = QUERIES["quality_classifier_filter"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 4
    assert all(r["probs_in_range"] for r in rows)
    assert all(r["mass_preserved"] for r in rows)
    assert sum(r["n_docs"] for r in rows) == 500
