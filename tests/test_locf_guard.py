"""The LOCF spine-span guard must actually FIRE.

r10 code review: the original guard computed assert_true into a
column that was immediately dropped, so Catalyst column-pruning
removed the AssertTrue expression and the guard was dead — a user
spanning >= 100000 hours would silently truncate the oracle's 5-digit
numbers-table spine while Spark generated the full sequence.  The
assert is now folded into the sequence's upper-bound expression
(load-bearing, unprunable); this test plants a 150000-hour span and
pins that the job raises instead of diverging quietly.
"""

from __future__ import annotations

import duckdb
import pytest

import automated_etl_pipeline_spark.queries_ext as qx


def _plant_events(tmp_path, span_hours: int) -> str:
    d = tmp_path / "sf_guard"
    d.mkdir()
    duckdb.sql(
        f"""
        COPY (
          SELECT 1::BIGINT AS event_id,
                 TIMESTAMP '2024-01-01 00:00:00' AS ts,
                 1::BIGINT AS user_id, 'view' AS event_type,
                 1.0::DOUBLE AS value, '{{}}' AS props
          UNION ALL
          SELECT 2, TIMESTAMP '2024-01-01 00:00:00'
                    + INTERVAL {span_hours} HOUR,
                 1, 'view', 2.0, '{{}}'
        ) TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    return str(d)


def test_locf_span_guard_fires(spark, tmp_path):
    sf_dir = _plant_events(tmp_path, 150_000)
    with pytest.raises(Exception, match="numbers table"):
        qx._locf_filled(spark, sf_dir).collect()


def test_locf_span_guard_passes_in_bounds(spark, tmp_path):
    sf_dir = _plant_events(tmp_path, 99_998)
    rows = qx._locf_filled(spark, sf_dir).count()
    assert rows == 99_999  # dense spine: h0..h1 inclusive
