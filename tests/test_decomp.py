"""Unit tests for the power-iteration PCA operator.

The q115 oracle pins Spark-vs-DuckDB equality; these pin the MATH on a
crafted corpus with a known dominant direction, against numpy's exact
eigendecomposition (up to the eigenvector sign, which power iteration
fixes only implicitly via the start vector).
"""

from __future__ import annotations

import numpy as np
import pytest

from redshift_avro_spark.operators.decomp import pca_power_projection

_DIM = 8


def _corpus(n=60, seed=7):
    rng = np.random.default_rng(seed)
    t = rng.normal(size=n)
    base = np.zeros((n, _DIM))
    base[:, 0] = 3.0 * t          # dominant direction = axis 0
    base[:, 1] = 0.3 * rng.normal(size=n)
    base += 0.01 * rng.normal(size=(n, _DIM))
    return base.astype(np.float32)


def test_projection_matches_numpy_pca(spark):
    x = _corpus()
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: r.pc1
        for r in pca_power_projection(
            df, id_col="vec_id", vec_col="embedding", dim=_DIM, iterations=20
        ).collect()
    }
    xd = x.astype(np.float64)
    mu = xd.mean(axis=0)
    cov = (xd.T @ xd) / len(xd) - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    v = vecs[:, -1]
    want = (xd - mu) @ v
    got_arr = np.array([got[i] for i in range(len(xd))])
    # sign is convention-free: align before comparing
    if np.dot(got_arr, want) < 0:
        want = -want
    assert np.allclose(got_arr, want, atol=1e-4)
    # the dominant direction is axis 0, so pc1 must track column 0
    corr = np.corrcoef(got_arr, xd[:, 0])[0, 1]
    assert abs(corr) > 0.999


def test_validation(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="iterations"):
        pca_power_projection(df, id_col="vec_id", vec_col="embedding", dim=2, iterations=0)
    with pytest.raises(ValueError, match="not in embeddings"):
        pca_power_projection(df, id_col="nope", vec_col="embedding", dim=2)
