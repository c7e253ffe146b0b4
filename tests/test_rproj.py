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


def test_projected_prefilter_ann_recall_floor(spark):
    """The projection's job in the ANN stack: rank candidates by
    PROJECTED cosine, keep the top 3k, rerank exactly — recall vs the
    exact top-k.  On STRUCTURED data (planted blobs, the scenario a
    prefilter exists for): true neighbors are genuinely closer, and a
    16-d projection must keep them in the 3k prefix.  (On structureless
    data — the testdata embeddings, where no cosine gap exceeds noise —
    recall measured 0.4: JL preserves distances within eps, not
    orderings finer than eps, and that negative result is part of the
    operator's documentation.)  Deterministic: fixed matrix, fixed
    seed, so the measured floor is pinned."""
    rng = np.random.default_rng(17)
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # sigma=0.05: same-blob cosines ~0.99 vs cross-blob ~0 — the
    # separation is at the structure scale the projection provably
    # preserves; the sub-eps WITHIN-blob ordering is the exact
    # rerank's job, not the prefilter's (sigma=0.25 noise-balls
    # measured recall 0.55 — ordering finer than eps is not JL's
    # contract)
    raw = [
        centers[c] + 0.05 * rng.normal(size=64)
        for c in range(10)
        for _ in range(50)
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(raw)],
        "vec_id long, embedding array<double>",
    )
    proj = project_embeddings(df, out_dim=16, seed=7).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in proj}
    projs = {r["vec_id"]: np.array(r["proj"]) for r in proj}
    q, k = 0, 20

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    exact = sorted(
        (i for i in vecs if i != q), key=lambda i: -cos(vecs[i], vecs[q])
    )[:k]
    by_proj = sorted(
        (i for i in projs if i != q), key=lambda i: -cos(projs[i], projs[q])
    )[:3 * k]
    rerank = sorted(by_proj, key=lambda i: -cos(vecs[i], vecs[q]))[:k]
    recall = len(set(rerank) & set(exact)) / k
    # measured 1.0 on this corpus/matrix; the floor leaves room only
    # for genuine derivation changes, not noise (everything is seeded)
    assert recall >= 0.9, recall
