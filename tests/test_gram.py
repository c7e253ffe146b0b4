"""gram_upper_triangle (similarity/gram.py): numpy equality on the
exact integer Gram, then the full PCA loop it exists to power —
driver-side eigendecomposition of the collected d x d matrix and a
JVM-expression projection of every vector onto the top components."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from automated_etl_pipeline_spark.similarity.gram import gram_upper_triangle
from automated_etl_pipeline_spark.similarity.quantize import with_int8

DIM = 64
N = 120


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(11)
    # anisotropic data so PCA has real structure: variance decays by axis
    scales = np.linspace(3.0, 0.2, DIM)
    data = rng.standard_normal((N, DIM)) * scales
    rows = [(i, [float(x) for x in data[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _py_codes(vecs: np.ndarray) -> np.ndarray:
    amax = np.abs(vecs).max(axis=1, keepdims=True)
    scale = np.where(amax == 0, 0.0, 127.0 / amax)
    return np.floor(vecs * scale + 0.5).astype(np.int64)


def test_gram_matches_numpy_exactly(spark, emb_df):
    vecs = np.array(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in emb_df.orderBy("vec_id").collect()
        ]
    )
    q = _py_codes(vecs)
    expected = q.T @ q  # exact integer Gram
    got = gram_upper_triangle(emb_df, dim=DIM).collect()
    assert len(got) == DIM * (DIM + 1) // 2
    for r in got:
        assert r["gram"] == expected[r["i"], r["j"]], (r["i"], r["j"])


def test_pca_projection_loop(spark, emb_df):
    """The end-to-end pattern the Gram reduction serves: collect the
    d x d matrix (bounded), eigendecompose on the driver, project all
    rows through the top-k eigenvectors as pure column expressions,
    and check the distributed variances match numpy's and decay in
    component order."""
    rows = gram_upper_triangle(emb_df, dim=DIM).collect()
    G = np.zeros((DIM, DIM), dtype=np.float64)
    for r in rows:
        G[r["i"], r["j"]] = r["gram"]
        G[r["j"], r["i"]] = r["gram"]
    evals, evecs = np.linalg.eigh(G)
    order = np.argsort(evals)[::-1]
    top = evecs[:, order[:3]]  # d x 3

    q = with_int8(emb_df, "embedding").select("vec_id", "q_codes")
    proj_cols = [
        F.aggregate(
            F.zip_with(
                "q_codes",
                F.array(*[F.lit(float(top[d, k])) for d in range(DIM)]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias(f"pc{k}")
        for k in range(3)
    ]
    got = q.select("vec_id", *proj_cols).orderBy("vec_id").collect()

    codes = _py_codes(
        np.array(
            [
                np.asarray(r["embedding"], dtype=np.float64)
                for r in emb_df.orderBy("vec_id").collect()
            ]
        )
    )
    expected = codes @ top  # N x 3
    got_mat = np.array([[r["pc0"], r["pc1"], r["pc2"]] for r in got])
    assert np.allclose(got_mat, expected, rtol=1e-9, atol=1e-6)

    # component variances decay (PCA ordering) and match the
    # eigenvalues of the Gram up to the mean-offset (data is ~centered)
    var = got_mat.var(axis=0)
    assert var[0] > var[1] > var[2]
    # raw second moments equal eigenvalues / N exactly in exact
    # arithmetic; allow float slack
    second_moments = (got_mat**2).mean(axis=0)
    assert np.allclose(second_moments, evals[order[:3]] / N, rtol=1e-6)


def test_zero_vector_contributes_nothing(spark):
    rows = [(0, [0.0] * DIM), (1, [1.0] + [0.0] * (DIM - 1))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["i"], r["j"]): r["gram"] for r in gram_upper_triangle(df, dim=DIM).collect()}
    assert got[(0, 0)] == 127 * 127
    assert all(v == 0 for k, v in got.items() if k != (0, 0))
