"""Registry smoke: every queries() entry runs at sf0.001 with a stable
schema. Full DuckDB equivalence runs via tools/check_correctness.py
(and the driver's t2 gate)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

from tests.conftest import SF_SMOKE

ALL = sorted(entry_mod.queries())


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 5
    assert df.columns == ["o_orderpriority", "n_orders", "sum_total", "avg_total"]


@pytest.mark.parametrize("name", ALL)
def test_query_runs(spark, name):
    df = entry_mod.queries()[name](spark, SF_SMOKE)
    assert df.columns  # schema resolves
    assert df.count() >= 0


def test_every_oracle_has_query():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
