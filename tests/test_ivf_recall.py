"""Measured IVF recall/nprobe curve (VERDICT r7 stretch ask #8) — the
companion to the measured MinHash S-curve (test_dedup_similarity).

The existing IVF tests pin only the exhaustive end (all cells probed =
brute force).  Here a planted-blob corpus sweeps nprobe at fixed k and
pins the whole curve against the operator's EXACT analytic form:
probe-then-rerank returns the true top-k RESTRICTED to the probed
cells, so

    recall(nprobe) == |true_topk ∩ probed_cells| / k   (identity, not a bound)

plus monotone non-decreasing in nprobe and exactly 1.0 when every cell
is probed.  The corpus is built so the curve actually rises: the
query's own blob holds fewer members than k, forcing true neighbors to
spill into adjacent cells that only higher nprobe reaches.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from automated_etl_pipeline_spark.similarity.ivf import cell_centroids, ivf_topk

DIM = 16
K = 20
N_CELLS = 8


def _corpus(seed: int = 23):
    """(vec_id, label, embedding): 8 Gaussian blobs; blob 0 (the
    query's) has only 10 members — fewer than k=20 — and blobs sit
    close enough (unit-sphere directions with sigma=0.35) that the
    query's true top-20 spreads over several cells."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(N_CELLS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(N_CELLS):
        n = 10 if c == 0 else 80
        pts = centers[c] + 0.35 * rng.normal(size=(n, DIM))
        for p in pts:
            rows.append((vid, c, [float(x) for x in p]))
            vid += 1
    return rows


def _true_topk(rows, query_vec_id: int, k: int) -> list[int]:
    vecs = {i: np.array(v) for i, _, v in rows}
    q = vecs[query_vec_id]

    def cos(a, b):
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    scored = sorted(
        ((cos(v, q), -i) for i, v in vecs.items()), reverse=True
    )[:k]
    return [-ni for _, ni in scored]


def test_ivf_recall_curve_matches_cell_coverage(spark):
    rows = _corpus()
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    ).cache()
    truth = _true_topk(rows, query_vec_id=0, k=K)
    cell_of = {i: c for i, c, _ in rows}

    # probed-cell order is a pure function of centroid cosine — compute
    # it once the same way the operator does, then sweep
    q_vec = [v for i, _, v in rows if i == 0][0]
    from automated_etl_pipeline_spark.similarity.brute_force import cosine

    cent = (
        cell_centroids(emb)
        .select(
            "label",
            F.round(
                cosine(F.col("centroid"), F.lit(q_vec).cast("array<double>")), 6
            ).alias("s"),
        )
        .orderBy(F.desc("s"), F.asc("label"))
        .collect()
    )
    probe_order = [r["label"] for r in cent]

    recalls = []
    for nprobe in range(1, N_CELLS + 1):
        got = {
            r["vec_id"]
            for r in ivf_topk(emb, query_vec_id=0, k=K, nprobe=nprobe).collect()
        }
        recall = len(got & set(truth)) / K
        probed = set(probe_order[:nprobe])
        coverage = sum(1 for i in truth if cell_of[i] in probed) / K
        # the analytic identity: rerank is exact within probed cells
        assert recall == coverage, (nprobe, recall, coverage)
        recalls.append(recall)

    # the curve is monotone, ends exhaustive, and actually RISES (the
    # planted small home blob guarantees nprobe=1 cannot reach k=20
    # true neighbors)
    assert all(b >= a for a, b in zip(recalls, recalls[1:]))
    assert recalls[-1] == 1.0
    assert recalls[0] < 1.0
    # measured on this seed: 0.2 at nprobe=1 — the nearest cell holds a
    # real share of the top-k but nowhere near all of it
    assert recalls[0] >= 0.1
    emb.unpersist()
