"""Golden end-to-end pipeline test (SURVEY.md §5.2): the reference ETL
(spark_etl_job.py top-to-bottom) on a fixture with every data quirk."""

from __future__ import annotations

import datetime

from automated_etl_pipeline_spark.etl.football import (
    FootballEtlConfig,
    build_football_star,
    clean_results,
    run,
)
from automated_etl_pipeline_spark.io.sinks import validate_not_null


def test_clean_results_filter_and_types(spark, football_csv):
    cfg = FootballEtlConfig(input_path=football_csv)
    df = clean_results(spark, cfg)
    rows = df.collect()
    # equality filter kept only FIFA World Cup rows (P5)
    assert len(rows) == 4
    assert all(r.tournament == "FIFA World Cup" for r in rows)
    # F4 intent: initcap applied (reference discarded this result)
    assert {r.home_team for r in rows} == {"Brazil", "Uruguay", "Germany"}
    # F1: mixed formats parsed; ambiguous 03-02-1900 → dd-MM-yyyy wins
    dates = {r.date for r in rows}
    assert datetime.date(1900, 2, 3) in dates
    assert datetime.date(2014, 7, 13) in dates


def test_clean_results_null_fills(spark, football_csv):
    cfg = FootballEtlConfig(input_path=football_csv, tournament_filter=None)
    df = clean_results(spark, cfg)
    fr = df.filter(df.city == "Paris").first()
    assert fr.home_score == -1  # F3 intent: numeric fill
    assert fr.neutral is False  # F3 intent: boolean fill
    sp = df.filter(df.city == "Madrid").first()
    assert sp.away_score == -1


def test_star_outputs_satisfy_required_contract(spark, football_csv):
    """The four output tables with every column NOT NULL — the BigQuery
    'mode: REQUIRED' load contract (spark-bq-dag.py:64-120)."""
    star = run(spark, FootballEtlConfig(input_path=football_csv))
    assert set(star) == {"date_dim", "game_dim", "fact", "results"}
    for name, df in star.items():
        validate_not_null(df)  # raises on violation
    # fact joins to dims with no orphans
    fact, date_dim, game_dim = star["fact"], star["date_dim"], star["game_dim"]
    assert fact.join(date_dim, "date_id", "left_anti").count() == 0
    assert fact.join(game_dim, "game_id", "left_anti").count() == 0
    # dims deduplicated: 2014-06-15 appears twice in fixture WC rows? dates unique per row here
    assert date_dim.count() == date_dim.select("date").distinct().count()
