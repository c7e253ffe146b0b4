"""BPE tokenizer (functions/tokenize.py): training determinism,
classic-example merges, round-trip fidelity on real testdata, and
unicode/edge frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_etl_pipeline_spark.functions.tokenize import (
    EOW,
    detokenize_expr,
    fidelity_report,
    learn_bpe_merges,
    make_encode_udf,
    tokenize_documents,
    word_freq,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tiny(spark):
    # The Sennrich paper's classic frame: "low" x5, "lower" x2,
    # "newest" x6, "widest" x3 — first merges are e+s, es+t, est+</w>.
    words = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    return spark.createDataFrame(
        [(" ".join(words),)], "text string"
    )


def test_learn_bpe_classic_merges(tiny):
    # This implementation attaches EOW to the final character (the
    # word-final "t" is the distinct symbol "t"+EOW), so the paper's
    # three merges (e+s, es+t, est+eow) collapse into two; merge 3
    # is then the most frequent remaining pair, (l,o) at count 7.
    merges = learn_bpe_merges(word_freq(tiny), n_merges=3)
    assert merges == [("e", "s"), ("es", "t" + EOW), ("l", "o")]


def test_learn_bpe_deterministic(tiny):
    m1 = learn_bpe_merges(word_freq(tiny), n_merges=8)
    m2 = learn_bpe_merges(word_freq(tiny), n_merges=8)
    assert m1 == m2


def test_encode_applies_merge_priority(tiny, spark):
    merges = learn_bpe_merges(word_freq(tiny), n_merges=4)
    df = spark.createDataFrame([("newest",)], "text string")
    toks = df.select(
        make_encode_udf(merges)(F.col("text")).alias("t")
    ).collect()[0].t
    # merges: (e,s), (es,t+EOW), (l,o), then the count-6 tie between
    # (e,w)/(n,e)/(w,est+EOW) breaks lexicographically to (e,w) —
    # so newest -> n ew est+EOW
    assert merges[3] == ("e", "w")
    assert toks == ["n", "ew", "est" + EOW]


def test_roundtrip_on_testdata_documents(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merges = learn_bpe_merges(word_freq(docs), n_merges=50)
    rep = fidelity_report(docs, merges).collect()[0]
    assert rep.n_docs == docs.count()
    assert rep.n_roundtrip_ok == rep.n_docs  # lossless by construction
    assert rep.n_tokens >= rep.n_words  # merges never cross words
    # merges actually compress: strictly fewer tokens than characters
    n_chars = docs.select(
        F.sum(F.length(F.replace("text", F.lit(" "), F.lit("")))).alias("c")
    ).collect()[0].c
    assert rep.n_tokens < n_chars


def test_roundtrip_unicode_and_edges(spark):
    rows = [
        ("héllo wörld",),
        ("emoji 🙂 and 家 mixed",),
        ("double  space collapses",),  # declared normalization
        ("x",),
    ]
    df = spark.createDataFrame(rows, "text string")
    merges = learn_bpe_merges(word_freq(df), n_merges=10)
    out = tokenize_documents(df, merges).select(
        "text", detokenize_expr("tokens").alias("back")
    ).collect()
    for r in out:
        assert r.back == " ".join(w for w in r.text.split(" ") if w)


def test_unseen_chars_stay_single_char_tokens(tiny, spark):
    merges = learn_bpe_merges(word_freq(tiny), n_merges=8)
    df = spark.createDataFrame([("zq",)], "text string")
    toks = df.select(
        make_encode_udf(merges)(F.col("text")).alias("t")
    ).collect()[0].t
    assert toks == ["z", "q" + EOW]  # open vocabulary: no OOV failure


def test_null_text_stays_null(tiny, spark):
    merges = learn_bpe_merges(word_freq(tiny), n_merges=2)
    df = spark.createDataFrame([(None,), ("low",)], "text string")
    got = tokenize_documents(df, merges).select("tokens").collect()
    assert got[0].tokens is None and got[1].tokens is not None


def test_train_cap_guard(tiny):
    with pytest.raises(ValueError, match="driver budget"):
        learn_bpe_merges(word_freq(tiny), n_merges=1, max_words=2)


def test_reserved_marker_in_input_rejected(spark):
    # In-band marker text must be rejected loudly, never silently
    # corrupted on round-trip (the textbook "</w>" scheme's flaw).
    df = spark.createDataFrame([("bad" + EOW + "word ok",)], "text string")
    with pytest.raises(ValueError, match="reserved end-of-word"):
        learn_bpe_merges(word_freq(df), n_merges=1)
