"""Distributed PCA (ops/pca.py): moment-pass exactness vs numpy,
orthonormal deterministic components, projection parity, whitening."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from elasticsearch_assets_ray.ops.pca import (
    covariance,
    fit_pca,
    pca_project,
)


@pytest.fixture(scope="module")
def emb():
    rng = np.random.RandomState(11)
    # anisotropic data: known dominant directions
    base = rng.randn(600, 16)
    scales = np.array([10, 6, 3] + [1] * 13, dtype=np.float64)
    x = base * scales
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(600), pa.int64()),
        "embedding": pa.array(list(x), pa.list_(pa.float64())),
    }))
    return x, ds


def test_covariance_matches_numpy(emb):
    x, ds = emb
    mean, cov, n = covariance(ds)
    assert n == 600
    np.testing.assert_allclose(mean, x.mean(axis=0), atol=1e-10)
    np.testing.assert_allclose(cov, np.cov(x, rowvar=False), atol=1e-8)


def test_fit_components_orthonormal_ordered_deterministic(emb):
    x, ds = emb
    m1 = fit_pca(ds, k=5)
    m2 = fit_pca(ds, k=5)
    np.testing.assert_allclose(m1.components, m2.components)
    np.testing.assert_allclose(m1.components @ m1.components.T,
                               np.eye(5), atol=1e-10)
    assert (np.diff(m1.eigvals) <= 1e-9).all()  # descending
    # dominant axis aligns with the largest-scale coordinate
    assert int(np.argmax(np.abs(m1.components[0]))) == 0
    # sign convention: that entry is positive
    for row in m1.components:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_projection_parity_and_whitening(emb):
    x, ds = emb
    m = fit_pca(ds, k=4)
    out = pca_project(ds, k=4).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    p = np.stack(out["projected"].to_numpy())
    want = (x - x.mean(axis=0)) @ m.components.T
    np.testing.assert_allclose(p, want, atol=1e-8)
    # projected variance per axis == eigvals
    np.testing.assert_allclose(p.var(axis=0, ddof=1), m.eigvals[:4],
                               rtol=1e-6)
    w = pca_project(ds, k=4, whiten=True).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    pw = np.stack(w["projected"].to_numpy())
    np.testing.assert_allclose(pw.var(axis=0, ddof=1), np.ones(4),
                               rtol=1e-5)
