"""BM25 ranking unit tests (functions/ranking.py)."""

from __future__ import annotations

from automated_etl_pipeline_spark.functions.ranking import bm25_topk


def test_bm25_ordering_properties(spark):
    df = spark.createDataFrame(
        [
            (1, "spark query engine spark spark"),   # tf-heavy on rare term
            (2, "spark is nice"),                    # one rare term
            (3, "the a of and or but"),              # no query terms
            (4, "query query query query query"),    # tf-heavy on common term
            (5, "query time"),
            (6, "query again"),
        ],
        "doc_id long, text string",
    )
    got = bm25_topk(df, ["spark", "query"], k=10).collect()
    ids = [r.doc_id for r in got]
    assert 3 not in ids                      # no-match docs never scored
    assert ids[0] == 1                       # rare term + high tf wins
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)
    # 'spark' (df=2) is rarer than 'query' (df=4) -> doc 2 beats doc 5/6
    assert ids.index(2) < ids.index(5)


def test_udtf_split_sentences_sql_surface(spark):
    from automated_etl_pipeline_spark.functions.python_udfs import register_all

    register_all(spark)
    df = spark.createDataFrame(
        [(1, "first one. second one. third"), (2, "only")], "doc_id long, text string"
    )
    df.createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT doc_id, s.sentence_idx, s.sentence "
        "FROM udtf_docs, LATERAL split_sentences(text) s ORDER BY doc_id, sentence_idx"
    ).collect()
    got = [(r.doc_id, r.sentence_idx, r.sentence) for r in rows]
    assert got == [
        (1, 0, "first one"),
        (1, 1, "second one"),
        (1, 2, "third"),
        (2, 0, "only"),
    ]
