"""r11 review regressions: token-budget gates on degenerate corpora.

A source whose every document is empty/NULL text has zero available
tokens; both the Spark side and the DuckDB oracle must plan 0 for it
(not NULL vs division-by-zero), and a source whose every doc earns
zero repeats must still appear in mixture_epoch_materialize with
zero counts (the explode drops its rows; the oracle keeps them)."""

from __future__ import annotations

import duckdb
import pytest


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("budget_edge")
    docs = spark.createDataFrame(
        [
            (0, "a b c d", "en", "srcA", 7),
            (1, "e f", "en", "srcA", 3),
            (2, "", "de", "srcZERO", 0),
            (3, None, "de", "srcZERO", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def _oracle(sql: str, edge_dir: str):
    con = duckdb.connect()
    # Spark writes the table as a directory of part files
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" '{edge_dir}/documents.parquet/*.parquet'"
    )
    return con.execute(sql).fetchall()


def test_token_budget_plan_zero_token_source(spark, edge_dir):
    import automated_etl_pipeline_spark.queries_llm as qllm
    from automated_etl_pipeline_spark.queries import ORACLES, QUERIES

    got = [
        tuple(r) for r in QUERIES["token_budget_plan"](spark, edge_dir).collect()
    ]
    want = _oracle(ORACLES["token_budget_plan"], edge_dir)
    assert got == want
    by_src = {r[0]: r for r in got}
    assert by_src["srcZERO"][1:] == (0, 0, 0, 0)  # avail/ppm/alloc/epochs
    assert by_src["srcA"][4] > 0  # epochs_x1000


def test_mixture_materialize_keeps_zero_rep_source(spark, edge_dir):
    from automated_etl_pipeline_spark.queries import ORACLES, QUERIES

    got = [
        tuple(r)
        for r in QUERIES["mixture_epoch_materialize"](spark, edge_dir).collect()
    ]
    want = _oracle(ORACLES["mixture_epoch_materialize"], edge_dir)
    assert got == want
    by_src = {r[0]: r for r in got}
    # the zero-token source must be PRESENT with zero counts
    assert by_src["srcZERO"] == ("srcZERO", 0, 0)
    assert by_src["srcA"][1] > 0
