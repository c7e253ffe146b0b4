"""Sign random projection (similarity/rproj.py): the distortion and
reproducibility properties the cross-engine gate can't express.

The gate (emb_random_projection) pins the exact arithmetic against
DuckDB; here the MEASURED Johnson-Lindenstrauss behavior is pinned on
planted data — the operator's reason to exist is that projected
distances track true distances, and that is a property of the specific
seeded matrix, so it is deterministic and assertable, not a flaky
sample."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from automated_etl_pipeline_spark.similarity.rproj import (
    project_embeddings,
    sign_matrix,
)


def test_sign_matrix_is_deterministic_and_balanced():
    m1 = sign_matrix(64, 16, seed=7)
    assert m1 == sign_matrix(64, 16, seed=7)
    assert m1 != sign_matrix(64, 16, seed=8)
    flat = [s for row in m1 for s in row]
    assert set(flat) == {1.0, -1.0}
    # md5 nibble parity is unbiased: the 1024 signs should be near-balanced
    assert 0.40 <= (flat.count(1.0) / len(flat)) <= 0.60


def test_jl_distortion_measured(spark):
    """All pairwise distances of 40 seeded Gaussian vectors, true vs
    projected (64 -> 16): the median distortion ratio must sit near 1
    and the worst case inside the envelope this matrix actually
    achieves (measured once, asserted forever — a changed matrix
    derivation or scaling bug shows up as a distortion shift)."""
    rng = np.random.default_rng(41)
    vecs = rng.normal(size=(40, 64))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    proj = {
        r["vec_id"]: np.array(r["proj"])
        for r in project_embeddings(df, out_dim=16, seed=7).collect()
    }
    ratios = []
    for i in range(40):
        for j in range(i + 1, 40):
            true_d = np.linalg.norm(vecs[i] - vecs[j])
            proj_d = np.linalg.norm(proj[i] - proj[j])
            ratios.append(proj_d / true_d)
    ratios = np.array(ratios)
    assert 0.9 <= float(np.median(ratios)) <= 1.1
    assert float(ratios.min()) > 0.4 and float(ratios.max()) < 1.7
    # JL theory for d'=16: eps ~ sqrt(ln(n)/d') ~ 0.48 — the measured
    # spread must be consistent with, not wildly outside, that envelope
    assert float((np.abs(ratios - 1) < 0.5).mean()) > 0.9


def test_projection_plan_is_jvm_only(spark):
    from automated_etl_pipeline_spark.plans.explain import executed_plan

    df = spark.createDataFrame(
        [(0, [float(i) for i in range(64)])],
        "vec_id long, embedding array<double>",
    )
    plan = executed_plan(project_embeddings(df))
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "Exchange"):
        assert bad not in plan, bad
