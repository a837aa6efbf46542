"""Distributed PCA / whitening over an embedding column — the
dimensionality-reduction step embedding-heavy curation pipelines run
before clustering or ANN (and the whitening trick that improves cosine
retrieval on anisotropic embedding spaces).

Shape — the textbook one-exchange moment computation:

- **Moments are a single streaming pass**: each batch emits ``(n, Σx,
  XᵀX)`` partials (one float64 matmul per batch — d×d is tiny next to
  the data, 64×64 = 32 KB); the driver folds them and forms the
  covariance ``(ΣXᵀX − n·μμᵀ)/(n−1)``.  This is corpus-size-independent
  driver state — the same posture as every sketch in the repo.
- **Eigendecomposition is driver-side** (``numpy.linalg.eigh`` on d×d).
- **Projection / whitening streams**: the fitted ``(μ, components,
  eigvals)`` broadcast once via ``ray.put``; each batch is one matmul.

Sign convention (eigh's vector signs are arbitrary): each component is
flipped so its largest-|entry| coordinate is positive — projections are
deterministic across runs and platforms up to fp noise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _embedding_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(batch.num_rows, -1)


def moment_partials(ds, col: str = "embedding"):
    """Dataset of per-batch ``(n, sum, xtx)`` rows (flattened)."""

    def fn(batch: pa.Table) -> pa.Table:
        x = _embedding_matrix(batch, col)
        d = x.shape[1]
        return pa.table({
            "n": pa.array([x.shape[0]], pa.int64()),
            "d": pa.array([d], pa.int64()),
            "sum": pa.array([x.sum(axis=0)], pa.list_(pa.float64())),
            "xtx": pa.array([(x.T @ x).ravel()], pa.list_(pa.float64())),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def covariance(ds, col: str = "embedding"):
    """(mean, cov, n) from one streaming moment pass."""
    rows = [ray.get(r) for r in moment_partials(ds, col).to_arrow_refs()]
    t = pa.concat_tables([r for r in rows if r.num_rows])
    if t.num_rows == 0:
        raise ValueError("empty dataset")
    d = int(t.column("d")[0].as_py())
    n = int(np.sum(t.column("n").to_numpy()))
    s = np.zeros(d)
    xtx = np.zeros((d, d))
    for row in t.to_pylist():
        s += np.asarray(row["sum"])
        xtx += np.asarray(row["xtx"]).reshape(d, d)
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    return mean, cov, n


class PCAModel:
    def __init__(self, mean: np.ndarray, components: np.ndarray,
                 eigvals: np.ndarray, n: int):
        self.mean = mean            # (d,)
        self.components = components  # (k, d) rows = principal axes
        self.eigvals = eigvals      # (k,) variance per axis, desc
        self.n = n


def fit_pca(ds, k: int, col: str = "embedding") -> PCAModel:
    mean, cov, n = covariance(ds, col)
    w, v = np.linalg.eigh(cov)          # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T               # (k, d)
    # deterministic signs: largest-|entry| coordinate positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(mean, comps, np.maximum(w[order], 0.0), n)


class PCAProject:
    """map_batches callable: center → project (→ optionally whiten by
    1/√eigval).  One matmul per batch against the broadcast model."""

    def __init__(self, model_ref, col: str = "embedding",
                 id_col: str = "vec_id", whiten: bool = False,
                 eps: float = 1e-12):
        self.model_ref = model_ref
        self.col = col
        self.id_col = id_col
        self.whiten = whiten
        self.eps = eps
        self._m: PCAModel | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._m is None:
            self._m = ray.get(self.model_ref)
        m = self._m
        x = _embedding_matrix(batch, self.col)
        p = (x - m.mean) @ m.components.T
        if self.whiten:
            p = p / np.sqrt(m.eigvals + self.eps)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "projected": pa.array(list(p), pa.list_(pa.float64())),
        })


def pca_project(ds, k: int, col: str = "embedding",
                id_col: str = "vec_id", whiten: bool = False,
                train_ds=None):
    """Fit on ``train_ds`` (default ``ds``), broadcast, stream
    projections."""
    model = fit_pca(train_ds if train_ds is not None else ds, k, col)
    ref = ray.put(model)
    return ds.map_batches(
        PCAProject(ref, col=col, id_col=id_col, whiten=whiten),
        batch_format="pyarrow", zero_copy_batch=True,
    )
