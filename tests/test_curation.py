"""Invariants for the corpus-curation gates (repetition flags, mixture
weights, train/val/test split) beyond the DuckDB value gate: bounds,
conservation, and the temperature-flattening property."""

from __future__ import annotations

import __spark_entry__ as entry_mod

from tests.conftest import SF_SMOKE


def test_repetition_fractions_bounded_and_flag_consistent(spark):
    rows = entry_mod.queries()["repetition_quality_flags"](
        spark, SF_SMOKE
    ).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.top_bigram_frac <= 1.0
        assert 0.0 <= r.dup_trigram_frac <= 1.0
        assert r.flagged == (
            r.top_bigram_frac > 0.18 or r.dup_trigram_frac > 0.30
        )


def test_mixture_weights_flatten_toward_uniform(spark):
    rows = entry_mod.queries()["source_mixture_weights"](
        spark, SF_SMOKE
    ).collect()
    assert len(rows) >= 2
    assert abs(sum(r.mixture_weight for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-4
    # w/p = p^(alpha-1)/S is strictly decreasing in p for alpha < 1:
    # smaller sources always get the larger oversample factor
    ordered = sorted(rows, key=lambda r: r.token_share)
    factors = [r.oversample_factor for r in ordered]
    assert factors == sorted(factors, reverse=True)
    # and any source below uniform share is strictly upweighted
    # (p < 1/n <= crossover, by the power-mean bound on S)
    for r in rows:
        if r.token_share < 1.0 / len(rows) - 1e-9:
            assert r.oversample_factor > 1.0, r


def test_split_conserves_docs_and_tokens(spark):
    from automated_etl_pipeline_spark.io.sources import load_testdata
    from pyspark.sql import functions as F

    rows = entry_mod.queries()["split_train_val_test"](
        spark, SF_SMOKE
    ).collect()
    docs = load_testdata(spark, SF_SMOKE, ["documents"])["documents"]
    tot = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.split("text", " "))).alias("tok"),
    ).first()
    assert sum(r.n_docs for r in rows) == tot.n
    assert sum(r.n_tokens for r in rows) == tot.tok
    by_split = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    assert set(by_split) == {"train", "val", "test"}
    # md5 buckets are near-uniform: 90/5/5 within wide tolerance at 500 docs
    assert 0.80 <= by_split["train"] / tot.n <= 0.97
