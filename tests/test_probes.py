"""Diagnostic probe gates vs their DuckDB oracles (r12).

The 16 r10 per-stage probe gates (locf/rolling/mad/ks/incr) left the
driver registry once their parents were driver-green (VERDICT r11 ask
#2) — they now live in ``queries.PROBES`` and this test keeps every
one oracle-checked on each pytest run, same three-axis contract as
tools/check_correctness.py (rows + sorted columns + normalized
values), at sf0.001 for speed with one sf0.01 smoke on a rotating
member.
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import pytest

import automated_etl_pipeline_spark.queries_ext  # noqa: F401  (registers)
import automated_etl_pipeline_spark.queries_llm  # noqa: F401  (registers)
from automated_etl_pipeline_spark.queries import PROBE_ORACLES, PROBES
from tools.check_correctness import fetch_oracle, normalize, register_views

SF_DIR = "/root/testdata/sf0.001"


def _oracle_rows(sf_dir: str, sql: str) -> tuple[list[str], list[tuple]]:
    # same view setup + fetch protocol as the real t2 gate replica —
    # shared code, not a reimplementation (r12 review)
    con = duckdb.connect()
    try:
        register_views(con, sf_dir)
        return fetch_oracle(con, sql)
    finally:
        con.close()


def _check_against(spark, name: str, sf_dir: str, fn, oracle: str) -> None:
    """Three-axis compare of one (callable, oracle) pair — shared with
    tests/test_retired_gates.py."""
    sdf = fn(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = [tuple(r[c] for c in spark_cols) for r in sdf.collect()]
    oracle_cols, oracle_rows = _oracle_rows(sf_dir, oracle)
    assert spark_cols == oracle_cols, f"{name}: column mismatch"
    assert len(spark_rows) == len(oracle_rows), f"{name}: rowcount mismatch"
    a, b = normalize(spark_rows), normalize(oracle_rows)
    diff = [(x, y) for x, y in zip(a, b) if x != y][:2]
    assert a == b, f"{name}: values differ, first: {diff}"


def _check(spark, name: str, sf_dir: str) -> None:
    _check_against(spark, name, sf_dir, PROBES[name], PROBE_ORACLES[name])


def test_probe_registry_shape():
    assert len(PROBES) == 16
    assert set(PROBES) == set(PROBE_ORACLES)


@pytest.mark.parametrize("name", sorted(PROBES))
def test_probe_matches_oracle(spark, name):
    _check(spark, name, SF_DIR)


def test_one_probe_at_gate_scale(spark):
    # one member at the driver's sf0.01 gate scale per run; all 16 at
    # sf0.01 every run would be pure re-proof of a solved problem.
    # The member ROTATES with the round: the driver appends one
    # CORRECTNESS_r*.json per round, so the index advances every round
    # and cycles the full set in 16 rounds (r12 review: an md5 of the
    # constant name list picked the same member forever).
    names = sorted(PROBES)
    rounds = len(list(Path(__file__).resolve().parents[1].glob(
        "CORRECTNESS_r*.json"
    )))
    _check(spark, names[rounds % len(names)], "/root/testdata/sf0.01")


def test_probe_scale_rules_sweep(spark):
    """The four registry plan rules hold for the probe gates too (r13,
    same closure as tests/test_retired_gates.py): leaving the driver
    registry must not exempt a gate from the scale discipline."""
    from automated_etl_pipeline_spark.plans.explain import (
        executed_plan,
        forced_broadcast_violations,
        unpartitioned_window_violations,
    )

    bad = {}
    for name, fn in PROBES.items():
        df = fn(spark, SF_DIR)
        flags = []
        if forced_broadcast_violations(df):
            flags.append("forced-broadcast")
        if unpartitioned_window_violations(df):
            flags.append("unbounded-global-window")
        plan = executed_plan(df)
        if "CartesianProduct" in plan:
            flags.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            flags.append("BatchEvalPython")
        if flags:
            bad[name] = flags
    assert not bad, f"scale-rule violations in probe gates: {bad}"
