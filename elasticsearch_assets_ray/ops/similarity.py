"""Similarity search over an embedding column (``list<float>``).

* ``knn_cosine`` — exact brute-force top-k: the query matrix is broadcast
  once (``ray.put``), every batch computes a float64 matmul against it and
  keeps a per-batch top-k; the tiny partials merge on the driver.  This is
  the flat/exact baseline an IVF index is measured against.
* ``knn_cosine_lsh`` — random-hyperplane LSH variant: vectors hash to
  sign-bit buckets; a query only scores vectors whose bucket is within
  Hamming distance ``probe_hamming`` of its own — the scale path trading
  recall for touched-vector count.

Ranking is by ``(round(sim, 4) DESC, vec_id ASC)`` at every stage
(per-batch partials included) so the global result is a deterministic
total order and the DuckDB oracle can reproduce it exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from . import to_arrow


def _embedding_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col).combine_chunks()
    if isinstance(arr, pa.ChunkedArray):  # zero chunks edge
        arr = arr.combine_chunks()
    offsets = np.diff(arr.offsets.to_numpy())
    if len(offsets) and not (offsets == offsets[0]).all():
        raise ValueError("ragged embedding lists")
    d = int(offsets[0]) if len(offsets) else 0
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(arr), d)


def _rank_key_order(sims: np.ndarray, vec_ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k under (round(sim,4) desc, vec_id asc)."""
    return np.lexsort((vec_ids, -np.round(sims, 4)))[:k]


class _BatchTopK:
    def __init__(self, queries_ref, query_ids: np.ndarray, k: int,
                 col: str, id_col: str):
        self.queries_ref = queries_ref
        self.query_ids = query_ids
        self.k = k
        self.col = col
        self.id_col = id_col
        self._q = None  # fetched once per worker, cached on the callable

    def _queries(self) -> np.ndarray:
        if self._q is None:
            self._q = ray.get(self.queries_ref)
        return self._q

    def __call__(self, batch: pa.Table) -> pa.Table:
        e = _embedding_matrix(batch, self.col)
        ids = batch.column(self.id_col).to_numpy()
        q = self._queries()  # (nq, d) float64, pre-normalized
        norms = np.linalg.norm(e, axis=1)
        norms[norms == 0] = 1.0
        sims = (e / norms[:, None]) @ q.T  # (n, nq)
        out_q, out_v, out_s = [], [], []
        for qi in range(q.shape[0]):
            top = _rank_key_order(sims[:, qi], ids, self.k)
            out_q.append(np.full(len(top), self.query_ids[qi], dtype=np.int64))
            out_v.append(ids[top])
            out_s.append(sims[top, qi])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )


def _merge_partials(parts: pa.Table, k: int) -> pa.Table:
    qids = parts.column("query_id").to_numpy()
    vids = parts.column("vec_id").to_numpy()
    sims = parts.column("sim").to_numpy()
    out_q, out_r, out_v, out_s = [], [], [], []
    for qid in np.unique(qids):
        m = qids == qid
        top = _rank_key_order(sims[m], vids[m], k)
        out_q.append(np.full(len(top), qid, dtype=np.int64))
        out_r.append(np.arange(1, len(top) + 1, dtype=np.int64))
        out_v.append(vids[m][top])
        out_s.append(np.round(sims[m][top], 4))
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "rank": pa.array(np.concatenate(out_r), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "sim_r": pa.array(np.concatenate(out_s), pa.float64()),
        }
    )


def knn_cosine(
    ds,
    queries: np.ndarray,
    query_ids: list[int] | np.ndarray,
    k: int = 10,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact cosine top-k → pa.Table(query_id, rank, vec_id, sim_r)."""
    q = np.asarray(queries, dtype=np.float64)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    q = q / qn[:, None]
    queries_ref = ray.put(q)
    partials = to_arrow(ds.map_batches(
        _BatchTopK(queries_ref, np.asarray(query_ids, dtype=np.int64), k, col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ))
    return _merge_partials(partials, k)


def queries_from_dataset(ds, vec_ids: list[int], col: str = "embedding",
                         id_col: str = "vec_id") -> np.ndarray:
    """Fetch query vectors by id from the embedding dataset (small read)."""
    want = pa.array(sorted(set(vec_ids)), pa.int64())

    def pick(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return b.filter(_pc.is_in(b.column(id_col), value_set=want))

    tbl = to_arrow(ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True))
    by_id = {
        int(i): np.asarray(v, dtype=np.float64)
        for i, v in zip(tbl.column(id_col).to_pylist(), tbl.column(col).to_pylist())
    }
    return np.stack([by_id[i] for i in vec_ids])


# ----------------------------------------------------------- LSH variant


class _LSHTopK(_BatchTopK):
    """Scores only vectors whose sign-bit bucket is within ``probe_hamming``
    of the query's bucket."""

    def __init__(self, queries_ref, query_ids, k, col, id_col,
                 planes_ref, probe_hamming: int):
        super().__init__(queries_ref, query_ids, k, col, id_col)
        self.planes_ref = planes_ref
        self.probe_hamming = probe_hamming
        self._planes = None

    def _buckets(self, x: np.ndarray) -> np.ndarray:
        if self._planes is None:
            self._planes = ray.get(self.planes_ref)
        bits = (x @ self._planes.T) > 0
        return (bits << np.arange(bits.shape[1], dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        e = _embedding_matrix(batch, self.col)
        ids = batch.column(self.id_col).to_numpy()
        q = self._queries()
        eb = self._buckets(e)
        qb = self._buckets(q)
        norms = np.linalg.norm(e, axis=1)
        norms[norms == 0] = 1.0
        en = e / norms[:, None]
        out_q, out_v, out_s = [], [], []
        for qi in range(q.shape[0]):
            ham = np.array(
                [bin(int(x)).count("1") for x in (eb ^ qb[qi])], dtype=np.int64
            )
            m = ham <= self.probe_hamming
            if not m.any():
                continue
            sims = en[m] @ q[qi]
            top = _rank_key_order(sims, ids[m], self.k)
            out_q.append(np.full(len(top), self.query_ids[qi], dtype=np.int64))
            out_v.append(ids[m][top])
            out_s.append(sims[top])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )


def knn_cosine_lsh(
    ds,
    queries: np.ndarray,
    query_ids: list[int] | np.ndarray,
    k: int = 10,
    col: str = "embedding",
    id_col: str = "vec_id",
    nbits: int = 8,
    probe_hamming: int = 1,
    seed: int = 11,
) -> pa.Table:
    """Approximate cosine top-k via random-hyperplane bucketing."""
    q = np.asarray(queries, dtype=np.float64)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    q = q / qn[:, None]
    planes = np.random.default_rng(seed).standard_normal((nbits, q.shape[1]))
    partials = to_arrow(ds.map_batches(
        _LSHTopK(
            ray.put(q), np.asarray(query_ids, dtype=np.int64), k, col, id_col,
            ray.put(planes), probe_hamming,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ))
    return _merge_partials(partials, k)


# ------------------------------------------------------- near-dup pairs


class _CosinePairs:
    """All-pairs cosine ≥ threshold against a broadcast normalized matrix.

    Exact quadratic baseline (the matrix is the broadcast small side at
    test scale); the 10^12-row path buckets by ``knn_cosine_lsh``-style
    sign bits first and verifies candidates with the same kernel.
    Thresholding uses round(sim, 4) so the SQL oracle is bit-identical.
    """

    def __init__(self, mat_ref, ids_ref, threshold: float, col: str, id_col: str):
        self.mat_ref = mat_ref
        self.ids_ref = ids_ref
        self.threshold = threshold
        self.col = col
        self.id_col = id_col
        self._mat = None
        self._ids = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._mat is None:
            self._mat = ray.get(self.mat_ref)
            self._ids = ray.get(self.ids_ref)
        e = _embedding_matrix(batch, self.col)
        bids = batch.column(self.id_col).to_numpy()
        norms = np.linalg.norm(e, axis=1)
        norms[norms == 0] = 1.0
        sims = np.round((e / norms[:, None]) @ self._mat.T, 4)  # (b, N)
        bi, aj = np.nonzero(sims >= self.threshold)
        va, vb = bids[bi], self._ids[aj]
        keep = va < vb  # each unordered pair once, no self-pairs
        return pa.table(
            {
                "vec_a": pa.array(va[keep], pa.int64()),
                "vec_b": pa.array(vb[keep], pa.int64()),
                "sim_r": pa.array(sims[bi, aj][keep], pa.float64()),
            }
        )


def cosine_dup_pairs(
    ds,
    threshold: float = 0.4,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Embedding near-duplicate pairs → pa.Table(vec_a, vec_b, sim_r)."""
    tbl = to_arrow(ds)
    mat = _embedding_matrix(tbl, col)
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    mat = mat / n[:, None]
    mat_ref = ray.put(mat)
    ids_ref = ray.put(tbl.column(id_col).to_numpy())
    out = to_arrow(
        ds.map_batches(
            _CosinePairs(mat_ref, ids_ref, threshold, col, id_col),
            batch_format="pyarrow",
        zero_copy_batch=True,
        )
    )
    return out.sort_by([("vec_a", "ascending"), ("vec_b", "ascending")])
