"""Retired registry gates vs their DuckDB oracles (r13).

VERDICT r12 ask #2: at 225 gates / ~50 driver-sampled per round,
worst-case rotation staleness hit 4.5 rounds, so the 26 solved
single-purpose gates whose semantics a parent registry gate subsumes
(``queries.RETIRED_SUBSUMED`` names each parent) left the driver
registry.  Retirement does NOT weaken their contract: every retiree
keeps its full three-axis oracle check (rows + sorted columns +
normalized values — the exact tools/check_correctness.py compare) on
each pytest run at sf0.001, with one rotating member re-checked at the
driver's sf0.01 gate scale.  If a parent goes driver-red, flip its
retirees back to ``@query`` so the rotation localizes the stage.
"""

from __future__ import annotations

from pathlib import Path

import pytest

import automated_etl_pipeline_spark.queries_ext  # noqa: F401  (registers)
import automated_etl_pipeline_spark.queries_llm  # noqa: F401  (registers)
import automated_etl_pipeline_spark.queries_ml  # noqa: F401  (registers)
from automated_etl_pipeline_spark.queries import (
    QUERIES,
    RETIRED,
    RETIRED_ORACLES,
    RETIRED_SUBSUMED,
)
from tests.test_probes import _check_against  # shared t2 protocol

SF_DIR = "/root/testdata/sf0.001"


def test_retired_registry_shape():
    # 26 r13 + 21 r14 (incl. zone_map_file_skipping) + 10 r15 (m4,
    # manifest lifecycle diagnostics, bloom semi-join, scd2 time
    # travel, hll rollup, incr join view, compaction planner —
    # VERDICT r14 ask #3's <=180 registry target)
    assert len(RETIRED) == 57
    # every retiree has a FULL oracle (no weak rows-only contracts here)
    assert set(RETIRED) == set(RETIRED_ORACLES) == set(RETIRED_SUBSUMED)
    # no name is simultaneously live and retired
    assert not set(RETIRED) & set(QUERIES)


def test_every_subsuming_parent_is_a_live_gate():
    """The retirement justification must stay true: each documented
    parent is still a driver-registry gate (a retired or deleted parent
    would orphan the retiree's coverage claim)."""
    for name, parents in RETIRED_SUBSUMED.items():
        toks = [
            t
            for t in parents.replace("(", " ").replace(")", " ")
            .replace("+", " ")
            .split()
            if "_" in t
        ]
        assert toks, f"{name}: no parent gate named"
        for t in toks:
            assert t in QUERIES, f"{name}: parent {t} not in live registry"


@pytest.mark.parametrize("name", sorted(RETIRED))
def test_retired_matches_oracle(spark, name):
    _check_against(
        spark, name, SF_DIR, RETIRED[name], RETIRED_ORACLES[name]
    )


def test_one_retired_at_gate_scale(spark):
    # rotate one member through the driver's sf0.01 gate scale per
    # round (same scheme as tests/test_probes.py — the round count
    # advances the index)
    names = sorted(RETIRED)
    rounds = len(
        list(Path(__file__).resolve().parents[1].glob("CORRECTNESS_r*.json"))
    )
    name = names[rounds % len(names)]
    _check_against(
        spark, name, "/root/testdata/sf0.01", RETIRED[name], RETIRED_ORACLES[name]
    )


def test_retired_scale_rules_sweep(spark):
    """Retirement must not become a scale-rule escape hatch: the same
    four rules tests/test_plans.py asserts registry-wide (no forced
    broadcast of an unreduced SF-scaling table, no CartesianProduct,
    no BatchEvalPython, no partition-less Window over unbounded input)
    hold for every retired gate on every pytest run."""
    from automated_etl_pipeline_spark.plans.explain import (
        executed_plan,
        forced_broadcast_violations,
        unpartitioned_window_violations,
    )

    bad = {}
    for name, fn in RETIRED.items():
        df = fn(spark, SF_DIR)
        flags = []
        viol = forced_broadcast_violations(df)
        if viol:
            flags.append(f"forced-broadcast:{viol}")
        wviol = unpartitioned_window_violations(df)
        if wviol:
            flags.append(f"unbounded-global-window:{wviol}")
        plan = executed_plan(df)
        if "CartesianProduct" in plan:
            flags.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            flags.append("BatchEvalPython")
        if flags:
            bad[name] = flags
    assert not bad, f"scale-rule violations in retired gates: {bad}"
