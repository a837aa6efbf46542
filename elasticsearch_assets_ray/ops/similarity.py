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
    similarity: float | None = None,
) -> pa.Table:
    """Exact cosine top-k → pa.Table(query_id, rank, vec_id, sim_r).

    ``similarity`` is the ES 8.8 ``knn.similarity`` cutoff: hits below
    the minimum similarity drop.  The cut applies on the serving-rounded
    grid (``sim_r``) AFTER ranking — rows are (sim desc, id asc) per
    query, so the filter keeps a PREFIX and ranks stay ES-exact; pick
    off-grid thresholds (e.g. 0.305) to make rounded vs raw comparison
    indistinguishable."""
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
    out = _merge_partials(partials, k)
    if similarity is not None:
        import pyarrow.compute as _pc

        out = out.filter(
            _pc.greater_equal(out.column("sim_r"), similarity)
        )
    return out


def knn_cosine_multi(
    ds,
    queries: np.ndarray,
    clause_ks: list[int],
    boosts_e1: list[int],
    k: int = 10,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """ES multiple-``knn``-clause search (ES 8.7): each clause retrieves
    its own global top-``clause_ks[i]``; a doc's combined score sums
    ``boost × sim`` over the clauses whose top-k it made; final ranking
    (score desc, id asc) cut to ``k``.

    One data pass: every clause vector rides the same broadcast query
    matrix (one matmul per batch).  Scores are integer e5 units
    (``boost_e1 × round(sim,4)·10⁴``) so the combined sum is exact and
    oracle-hash-safe — boosts therefore come in TENTHS (``boosts_e1``).
    → pa.Table(rank, vec_id, score_e5)."""
    if len(clause_ks) != len(queries) or len(boosts_e1) != len(queries):
        raise ValueError("one k and one boost per clause")
    kmax = max(clause_ks)
    base = knn_cosine(ds, queries, list(range(len(clause_ks))),
                      k=kmax, col=col, id_col=id_col)
    qid = base.column("query_id").to_numpy()
    rank = base.column("rank").to_numpy()
    vid = base.column("vec_id").to_numpy()
    sim_e4 = np.rint(base.column("sim_r").to_numpy() * 1e4).astype(np.int64)
    ks = np.asarray(clause_ks, dtype=np.int64)
    bs = np.asarray(boosts_e1, dtype=np.int64)
    keep = rank <= ks[qid]
    contrib = bs[qid[keep]] * sim_e4[keep]
    uvid, inv = np.unique(vid[keep], return_inverse=True)
    score = np.zeros(len(uvid), dtype=np.int64)
    np.add.at(score, inv, contrib)
    top = np.lexsort((uvid, -score))[:k]
    return pa.table({
        "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
        "vec_id": pa.array(uvid[top], pa.int64()),
        "score_e5": pa.array(score[top], pa.int64()),
    })


def _vec_filter_mask(batch: pa.Table, spec: dict):
    """Arrow-compute mask for a kNN pre-filter spec over a metadata
    column of the vector table: ``{"col", "in": [values]}`` (ES terms
    filter) or ``{"col", "range": (lo, hi)}`` (inclusive, None = open)."""
    import pyarrow.compute as _pc

    c = batch.column(spec["col"])
    if "in" in spec:
        return _pc.is_in(
            c, value_set=pa.array(spec["in"], type=c.type)
        )
    lo, hi = spec["range"]
    m = None
    if lo is not None:
        m = _pc.greater_equal(c, lo)
    if hi is not None:
        m2 = _pc.less_equal(c, hi)
        m = m2 if m is None else _pc.and_(m, m2)
    if m is None:
        raise ValueError("range filter needs at least one bound")
    return m


class _FilteredTopK(_BatchTopK):
    """ES kNN-search ``filter`` semantics: PRE-filter — the predicate
    restricts the candidate set before scoring, so the top-k is exact
    over the survivors (never a post-filtered short list)."""

    def __init__(self, queries_ref, query_ids, k, col, id_col, spec):
        super().__init__(queries_ref, query_ids, k, col, id_col)
        self.spec = spec

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(_vec_filter_mask(batch, self.spec))
        if batch.num_rows == 0:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            })
        return super().__call__(batch)


def knn_cosine_filtered(
    ds,
    queries: np.ndarray,
    query_ids: list[int] | np.ndarray,
    filter_spec: dict,
    k: int = 10,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact cosine top-k with an ES kNN ``filter`` (pre-filtering:
    candidates are restricted BEFORE the similarity cut, so results are
    the true top-k among matching vectors — the ES 8 kNN-search filter
    contract).  Same streaming shape as :func:`knn_cosine`: the filter
    mask is one Arrow kernel per batch, the query matrix ships once via
    ``ray.put``."""
    if "col" not in filter_spec or (
        "in" not in filter_spec and "range" not in filter_spec
    ):
        raise ValueError(
            "filter_spec needs 'col' plus 'in' or 'range'"
        )
    if "range" in filter_spec and "in" not in filter_spec:
        lo, hi = filter_spec["range"]
        if lo is None and hi is None:
            raise ValueError("range filter needs at least one bound")
    q = np.asarray(queries, dtype=np.float64)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    q = q / qn[:, None]
    queries_ref = ray.put(q)
    partials = to_arrow(ds.map_batches(
        _FilteredTopK(queries_ref, np.asarray(query_ids, dtype=np.int64),
                      k, col, id_col, filter_spec),
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
        self.planes_ref = planes_ref  # (n_tables, nbits, dim)
        self.probe_hamming = probe_hamming
        self._planes = None

    def _bits(self, x: np.ndarray) -> np.ndarray:
        """→ (n, n_tables, nbits) sign bits."""
        if self._planes is None:
            self._planes = ray.get(self.planes_ref)
        L, b, dim = self._planes.shape
        return (x @ self._planes.reshape(L * b, dim).T > 0).reshape(
            len(x), L, b
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        e = _embedding_matrix(batch, self.col)
        ids = batch.column(self.id_col).to_numpy()
        q = self._queries()
        eb = self._bits(e)  # (n, L, b)
        qb = self._bits(q)  # (nq, L, b)
        norms = np.linalg.norm(e, axis=1)
        norms[norms == 0] = 1.0
        en = e / norms[:, None]
        out_q, out_v, out_s = [], [], []
        for qi in range(q.shape[0]):
            # candidate if ANY table's bucket is within probe_hamming —
            # multi-table union recall, vectorized bit compare (no
            # per-value popcount loop)
            ham = (eb != qb[qi][None, :, :]).sum(axis=2)  # (n, L)
            m = (ham <= self.probe_hamming).any(axis=1)
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
    probe_hamming: int = 2,
    n_tables: int = 4,
    seed: int = 11,
) -> pa.Table:
    """Approximate cosine top-k via random-hyperplane bucketing —
    ``n_tables`` independent hash tables, candidate = within
    ``probe_hamming`` bits of the query in ANY table (union recall
    ``1-(1-r1)^L``; single-table recall at the mid-similarity neighbors
    typical of raw web embeddings is low, measured in BASELINE.md)."""
    q = np.asarray(queries, dtype=np.float64)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    q = q / qn[:, None]
    planes = np.random.default_rng(seed).standard_normal(
        (n_tables, nbits, q.shape[1])
    )
    partials = to_arrow(ds.map_batches(
        _LSHTopK(
            ray.put(q), np.asarray(query_ids, dtype=np.int64), k, col, id_col,
            ray.put(planes), probe_hamming,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ))
    return _merge_partials(partials, k)


# ----------------------------------------------------------- IVF variant


def kmeans_fit(sample: np.ndarray, k: int, iters: int = 10,
               seed: int = 13) -> np.ndarray:
    """Deterministic spherical k-means (Lloyd's, fixed iterations, seeded
    init) over unit-normalized vectors → (k, d) unit centroids.  The
    coarse quantizer of an IVF index; sample-sized, runs on the driver."""
    x = np.asarray(sample, dtype=np.float64)
    n = np.linalg.norm(x, axis=1)
    n[n == 0] = 1.0
    x = x / n[:, None]
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = x[m].sum(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cent[c] = v / nv
    return cent


def build_ivf(
    ds,
    out_dir: str,
    n_clusters: int = 64,
    col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 10_000,
    seed: int = 13,
):
    """Partition the embedding table by coarse-quantizer cluster →
    hive-partitioned parquet (``out_dir/cluster=<c>/``) + ``centroids.npy``.

    The scan side of IVF: a query reading only its ``nprobe`` closest
    clusters touches ``~nprobe/n_clusters`` of the corpus via literal
    parquet partition pruning — no full scan.  Assignment is one
    broadcast-centroids ``map_batches`` pass.
    """
    from pathlib import Path

    sample_tbl = to_arrow(ds.limit(sample_size))
    sample = _embedding_matrix(sample_tbl, col)
    cent = kmeans_fit(sample, n_clusters, seed=seed)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        e = _embedding_matrix(batch, col)
        nn = np.linalg.norm(e, axis=1)
        nn[nn == 0] = 1.0
        cl = np.argmax((e / nn[:, None]) @ c.T, axis=1)
        return batch.append_column("cluster", pa.array(cl.astype(np.int32)))

    # few upstream blocks → few files per cluster dir (a 64-block input
    # would write 64 tiny files into EVERY cluster partition)
    ds.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    ).repartition(8).write_parquet(out_dir, partition_cols=["cluster"])
    np.save(str(Path(out_dir) / "_centroids.npy"), cent)
    return out_dir


def knn_cosine_ivf(
    ivf_dir: str,
    queries: np.ndarray,
    query_ids: list[int] | np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Approximate cosine top-k over an IVF layout: probe each query's
    ``nprobe`` nearest clusters only (parquet partition pruning), exact
    scoring within the probed subset → pa.Table(query_id, rank, vec_id,
    sim_r).  Self-queries always hit (a vector's own cluster is its
    nearest centroid by construction)."""
    from pathlib import Path

    import pyarrow.dataset as pds_mod

    import ray.data as rd

    cent = np.load(str(Path(ivf_dir) / "_centroids.npy"))
    q = np.asarray(queries, dtype=np.float64)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    qnorm = q / qn[:, None]
    probes = np.argsort(-(qnorm @ cent.T), axis=1)[:, :nprobe]
    clusters = sorted({int(c) for row in probes for c in row})
    # literal pruning: ONE read over only the probed clusters' files
    # (pyarrow infers the hive `cluster` partition column, as a string)
    files: list[str] = []
    for c in clusters:
        d = Path(ivf_dir) / f"cluster={c}"
        if d.exists():
            files.extend(sorted(str(f) for f in d.glob("*.parquet")))
    if not files:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "sim_r": pa.array([], pa.float64()),
            }
        )
    ds = rd.read_parquet(files)
    # per-query candidate restriction: a vector only scores against the
    # queries probing its cluster
    qids = np.asarray(query_ids, dtype=np.int64)
    q_ref = ray.put((qnorm, qids, probes.astype(np.int64)))

    def score(batch: pa.Table) -> pa.Table:
        qn_, qi_, probes_arr = ray.get(q_ref)
        e = _embedding_matrix(batch, col)
        ids = batch.column(id_col).to_numpy()
        cl = np.asarray(
            [int(c) for c in batch.column("cluster").to_pylist()], dtype=np.int64
        )
        nn = np.linalg.norm(e, axis=1)
        nn[nn == 0] = 1.0
        en = e / nn[:, None]
        # (nq, B) membership in one vectorized comparison against the
        # (nq, nprobe) probe matrix — no per-query set/list conversions
        member = (cl[None, :, None] == probes_arr[:, None, :]).any(axis=2)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qn_)):
            m = member[qi]
            if not m.any():
                continue
            sims = en[m] @ qn_[qi]
            top = _rank_key_order(sims, ids[m], k)
            out_q.append(np.full(len(top), qi_[qi], dtype=np.int64))
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

    partials = to_arrow(
        ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    )
    if partials.num_rows == 0 or "query_id" not in partials.column_names:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "sim_r": pa.array([], pa.float64()),
            }
        )
    return _merge_partials(partials, k)


# ------------------------------------------------------- near-dup pairs


class _BlockPairScorer:
    """Actor-pool stage scoring one (block_i, block_j) pair per input row:
    loads the two normalized row-blocks (per-actor cache — each block is
    read once per actor, not once per pair), computes the cross matmul,
    and emits pairs with ``round(sim, 4) >= threshold``.

    Per-task memory = 2 blocks, never the corpus; the quadratic work of
    EXACT all-pairs is tiled across the cluster instead of broadcast.
    """

    CACHE_BLOCKS = 4  # bounds per-actor memory to a handful of blocks

    def __init__(self, block_dir: str, threshold: float):
        self.block_dir = block_dir
        self.threshold = threshold
        # small FIFO cache: row-major pair order revisits the same bi for
        # consecutive pairs, so a few entries capture the reuse without
        # letting a long-lived actor accumulate the whole corpus
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _load(self, b: int) -> tuple[np.ndarray, np.ndarray]:
        if b not in self._cache:
            import os

            import pyarrow.parquet as pq

            d = f"{self.block_dir}/block={b}"
            if not os.path.exists(d):
                # a residue class with no vec_ids writes no partition dir
                entry = (np.empty(0, np.int64), np.empty((0, 0)))
            else:
                t = pq.read_table(d)
                ids = t.column("vec_id").to_numpy()
                mat = _embedding_matrix(t, "embedding")
                order = np.argsort(ids, kind="stable")
                entry = (ids[order], mat[order])
            while len(self._cache) >= self.CACHE_BLOCKS:
                self._cache.pop(next(iter(self._cache)))
            self._cache[b] = entry
        return self._cache[b]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        for bi, bj in zip(
            batch.column("bi").to_pylist(), batch.column("bj").to_pylist()
        ):
            ids_i, mi = self._load(int(bi))
            ids_j, mj = self._load(int(bj))
            if len(ids_i) == 0 or len(ids_j) == 0:
                continue
            sims = np.round(mi @ mj.T, 4)
            keep = sims >= self.threshold
            if bi == bj:
                keep &= ids_i[:, None] < ids_j[None, :]
            ii, jj = np.nonzero(keep)
            if len(ii) == 0:
                continue
            va, vb = ids_i[ii], ids_j[jj]
            out_a.append(np.minimum(va, vb))
            out_b.append(np.maximum(va, vb))
            out_s.append(sims[ii, jj])
        if not out_a:
            return pa.table(
                {
                    "vec_a": pa.array([], pa.int64()),
                    "vec_b": pa.array([], pa.int64()),
                    "sim_r": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "vec_a": pa.array(np.concatenate(out_a), pa.int64()),
                "vec_b": pa.array(np.concatenate(out_b), pa.int64()),
                "sim_r": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )


BROADCAST_PAIRS_MAX_ROWS = 100_000  # ≲50 MB matrix at d=64 — a true small side


def _cosine_dup_pairs_broadcast(ds, threshold: float, col: str, id_col: str) -> pa.Table:
    """Small-side path: the normalized matrix IS broadcastable — ship it
    once via ``ray.put`` and let every batch matmul against it (the
    standard broadcast-small-side join shape).  Only called under
    ``BROADCAST_PAIRS_MAX_ROWS``; the block-tiled path handles the rest."""
    tbl = to_arrow(ds)
    mat = _embedding_matrix(tbl, col)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]
    ids_all = tbl.column(id_col).to_numpy()
    mat_ref, ids_ref = ray.put(mat), ray.put(ids_all)

    def score(batch: pa.Table) -> pa.Table:
        m, ids = ray.get(mat_ref), ray.get(ids_ref)
        e = _embedding_matrix(batch, col)
        bids = batch.column(id_col).to_numpy()
        nn = np.linalg.norm(e, axis=1)
        nn[nn == 0] = 1.0
        sims = np.round((e / nn[:, None]) @ m.T, 4)
        bi, aj = np.nonzero(sims >= threshold)
        va, vb = bids[bi], ids[aj]
        keep = va < vb
        return pa.table(
            {
                "vec_a": pa.array(va[keep], pa.int64()),
                "vec_b": pa.array(vb[keep], pa.int64()),
                "sim_r": pa.array(sims[bi, aj][keep], pa.float64()),
            }
        )

    out = to_arrow(ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True))
    if out.num_rows == 0 or "vec_a" not in out.column_names:
        out = pa.table(
            {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
                "sim_r": pa.array([], pa.float64()),
            }
        )
    return out.sort_by([("vec_a", "ascending"), ("vec_b", "ascending")])


def cosine_dup_pairs(
    ds,
    threshold: float = 0.4,
    col: str = "embedding",
    id_col: str = "vec_id",
    block_rows: int = 4096,
    concurrency: int = 4,
    work_dir: str | None = None,
    broadcast_max_rows: int = BROADCAST_PAIRS_MAX_ROWS,
) -> pa.Table:
    """EXACT embedding near-duplicate pairs → pa.Table(vec_a, vec_b, sim_r).

    Two physical plans, same result (identical rounding/kernels, tested):

    * ≤ ``broadcast_max_rows``: the normalized matrix is a TRUE small
      side → one ``ray.put`` broadcast, per-batch matmul (fast path; no
      spill, no extra exchange);
    * above it: block-tiled all-pairs — normalized vectors spill to
      hash-blocked parquet (one exchange, ``block = vec_id % n_blocks``),
      then every block pair ``(i <= j)`` is scored by an actor-pool
      stage holding at most two blocks in memory.  No full-matrix
      broadcast, no O(N) driver state; the O(N²/blocks²) tile count is
      the inherent cost of an exact all-pairs answer (the approximate
      scale path is :func:`cosine_dup_pairs_lsh`).
    """
    import shutil
    import tempfile

    import ray.data as rd

    n = ds.count()
    if n == 0:
        return pa.table(
            {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
                "sim_r": pa.array([], pa.float64()),
            }
        )
    if n <= broadcast_max_rows:
        return _cosine_dup_pairs_broadcast(ds, threshold, col, id_col)
    n_blocks = max(1, -(-n // block_rows))
    tmp = work_dir or tempfile.mkdtemp(prefix="esray_cosblocks_")
    try:
        def norm(batch: pa.Table) -> pa.Table:
            e = _embedding_matrix(batch, col)
            ids = batch.column(id_col).to_numpy()
            norms = np.linalg.norm(e, axis=1)
            norms[norms == 0] = 1.0
            en = e / norms[:, None]
            return pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(list(en), pa.list_(pa.float64())),
                    "block": pa.array(
                        (ids % n_blocks).astype(np.int32)
                    ),
                }
            )

        ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
            tmp, partition_cols=["block"]
        )
        pairs = [
            {"bi": i, "bj": j}
            for i in range(n_blocks)
            for j in range(i, n_blocks)
        ]
        out = to_arrow(
            rd.from_items(pairs).map_batches(
                _BlockPairScorer,
                fn_constructor_args=(tmp, threshold),
                batch_format="pyarrow",
                batch_size=max(1, len(pairs) // max(1, min(concurrency, len(pairs)))),
                concurrency=min(concurrency, len(pairs)),
                num_cpus=1,
            )
        )
    finally:
        if work_dir is None:
            shutil.rmtree(tmp, ignore_errors=True)
    if out.num_rows == 0 or "vec_a" not in out.column_names:
        out = pa.table(
            {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
                "sim_r": pa.array([], pa.float64()),
            }
        )
    return out.sort_by([("vec_a", "ascending"), ("vec_b", "ascending")])


def cosine_dup_pairs_lsh(
    ds,
    threshold: float = 0.4,
    col: str = "embedding",
    id_col: str = "vec_id",
    nbits: int | None = None,
    bands: int = 32,
    seed: int = 11,
) -> pa.Table:
    """Approximate near-dup pairs: multi-band sign-bit LSH candidates →
    exact cosine verification of candidates only (the 10^12-row path;
    recall < 1 by design — a pair is a candidate iff it shares a bucket
    in AT LEAST ONE of ``bands`` independent hyperplane bands, so recall
    is ``1-(1-p^nbits)^bands`` with ``p = 1 - θ/π``).

    ``nbits=None`` sizes each band's bucket count to the corpus
    (``2^nbits ≈ n/64`` → mean occupancy ~64, min 8 bits): candidate-pair
    volume per band, and with it verify-exchange traffic, stays roughly
    LINEAR in n instead of quadratic-in-occupancy.  ``bands`` is the
    recall knob (each band adds an independent chance to catch a pair at
    a linear cost multiple).  Sign-LSH is intrinsically weak at LOW
    similarity thresholds — the per-bit collision gap between a
    τ≈0.4 pair (p≈0.63) and a random pair (p=0.5) is small — so recall
    at mid thresholds stays modest at any affordable band count
    (measured in BASELINE.md); it is strong in the τ≥0.8 regime real
    dedup runs use.  Use the exact tiled path for mid-threshold jobs.

    Candidate emission reuses the dedup machinery's bucketed pair
    exchange; verification joins candidate pairs back to their two
    vectors via a pair-keyed exchange — the only broadcast is the
    candidate doc→pairs map (output-scale, not corpus-scale).
    """
    import math as _math

    from .dedup import _bucketed_emit_pairs, _canonical_pairs, to_arrow as _ta  # noqa: F401

    # dimension probe from one batch (cheap: first block only)
    probe = ds.limit(1).take_all()
    if not probe:
        return pa.table(
            {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
                "sim_r": pa.array([], pa.float64()),
            }
        )
    dim = len(probe[0][col])
    if nbits is None:
        n = ds.count()
        nbits = max(8, min(48, _math.ceil(_math.log2(max(n, 64) / 64))))
    planes = np.random.default_rng(seed).standard_normal((bands, nbits, dim))
    planes_ref = ray.put(planes)

    def bucket_rows(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        L, b, d = pl.shape
        e = _embedding_matrix(batch, col)
        ids = batch.column(id_col).to_numpy()
        bits = (e @ pl.reshape(L * b, d).T > 0).reshape(len(e), L, b)
        key = (bits << np.arange(b, dtype=np.uint64)[None, None, :]).sum(
            axis=2, dtype=np.uint64
        )
        # salt the band index into the key so bands never cross-collide
        key |= np.arange(L, dtype=np.uint64)[None, :] << np.uint64(48)
        return pa.table(
            {
                "band_key": pa.array(key.reshape(-1), pa.uint64()),
                "doc_id": pa.array(np.repeat(ids, L), pa.int64()),
            }
        )

    rows = ds.map_batches(bucket_rows, batch_format="pyarrow", zero_copy_batch=True)
    cand = to_arrow(_bucketed_emit_pairs(rows, "band_key", None))
    if cand.num_rows == 0:
        return pa.table(
            {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
                "sim_r": pa.array([], pa.float64()),
            }
        )
    pairs_np = np.unique(cand.column("pair").to_numpy())

    from .dedup import doc_pairs_map

    map_ref = ray.put(doc_pairs_map(pairs_np))

    def emit_vecs(batch: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        e = _embedding_matrix(batch, col)
        ids = batch.column(id_col).to_numpy()
        norms = np.linalg.norm(e, axis=1)
        norms[norms == 0] = 1.0
        en = e / norms[:, None]
        out_p: list[np.ndarray] = []
        out_v: list[np.ndarray] = []
        out_e: list[np.ndarray] = []
        for i, d in enumerate(ids):
            ps = m.get(int(d))
            if ps is None:
                continue
            out_p.append(ps)
            out_v.append(np.full(len(ps), d, dtype=np.int64))
            out_e.append(np.repeat(en[i][None, :], len(ps), axis=0))
        if not out_p:
            return pa.table(
                {
                    "pair": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], pa.list_(pa.float64())),
                }
            )
        return pa.table(
            {
                "pair": pa.array(np.concatenate(out_p), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "embedding": pa.array(list(np.concatenate(out_e, axis=0)), pa.list_(pa.float64())),
            }
        )

    from .dedup import _add_bucket

    def verify_group(g: pa.Table) -> pa.Table:
        pair = g.column("pair").to_numpy()
        ids = g.column("vec_id").to_numpy()
        mat = _embedding_matrix(g, "embedding")
        order = np.lexsort((ids, pair))
        pair, ids, mat = pair[order], ids[order], mat[order]
        starts = np.nonzero(np.concatenate([[True], pair[1:] != pair[:-1]]))[0]
        ends = np.concatenate([starts[1:], [len(pair)]])
        out_a, out_b, out_s = [], [], []
        for lo, hi in zip(starts.tolist(), ends.tolist()):
            if hi - lo != 2:  # a vector was missing/empty → unverifiable
                continue
            s = float(np.round(mat[lo] @ mat[lo + 1], 4))
            if s >= threshold:
                out_a.append(int(ids[lo]))
                out_b.append(int(ids[lo + 1]))
                out_s.append(s)
        return pa.table(
            {
                "vec_a": pa.array(out_a, pa.int64()),
                "vec_b": pa.array(out_b, pa.int64()),
                "sim_r": pa.array(out_s, pa.float64()),
            }
        )

    verified = (
        ds.map_batches(emit_vecs, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(_add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(verify_group, batch_format="pyarrow", zero_copy_batch=True)
    )
    out = to_arrow(verified)
    if out.num_rows == 0 or "vec_a" not in out.column_names:
        return pa.table(
            {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
                "sim_r": pa.array([], pa.float64()),
            }
        )
    return out.sort_by([("vec_a", "ascending"), ("vec_b", "ascending")])


# --------------------------------------------------- product quantization
# The 100-TB memory answer for embedding search: 64-dim float32 vectors
# (256 B) compress to m uint8 codes (8 B at m=8 — 32×), and queries scan
# CODES with per-subspace lookup tables (ADC) instead of touching raw
# vectors; a small exact re-rank on the top candidates restores
# precision.  Deterministic throughout (seeded per-subspace Lloyd's).


def pq_fit(
    sample: np.ndarray, m: int = 8, k_codes: int = 256,
    iters: int = 10, seed: int = 13,
) -> np.ndarray:
    """Per-subspace codebooks over UNIT-normalized vectors →
    (m, k_codes, d/m) float64.  Euclidean Lloyd's per subspace (the
    standard PQ fit; on unit vectors the ADC inner-product tables then
    approximate cosine)."""
    x = np.asarray(sample, dtype=np.float64)
    n = np.linalg.norm(x, axis=1)
    n[n == 0] = 1.0
    x = x / n[:, None]
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.default_rng(seed)
    k_eff = min(k_codes, len(x))
    books = np.empty((m, k_eff, sub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * sub:(j + 1) * sub]
        cent = xs[rng.choice(len(xs), size=k_eff, replace=False)].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2) \
                if len(xs) * k_eff * sub <= 50_000_000 else None
            if d2 is None:  # chunked distance for big samples
                assign = np.empty(len(xs), dtype=np.int64)
                for lo in range(0, len(xs), 4096):
                    blk = xs[lo:lo + 4096]
                    dd = ((blk[:, None, :] - cent[None, :, :]) ** 2).sum(2)
                    assign[lo:lo + len(blk)] = np.argmin(dd, axis=1)
            else:
                assign = np.argmin(d2, axis=1)
            for c in range(k_eff):
                msk = assign == c
                if msk.any():
                    cent[c] = xs[msk].mean(axis=0)
        books[j] = cent
    return books


def pq_encode(x_unit: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Unit vectors → (n, m) uint8/uint16 codes (argmin L2 per subspace)."""
    m, k_eff, sub = books.shape
    codes = np.empty((len(x_unit), m), dtype=np.uint16)
    for j in range(m):
        xs = x_unit[:, j * sub:(j + 1) * sub]
        # ||x - c||² = ||x||² − 2x·c + ||c||²; argmin over c
        dots = xs @ books[j].T
        c2 = (books[j] ** 2).sum(axis=1)
        codes[:, j] = np.argmin(c2[None, :] - 2.0 * dots, axis=1)
    return codes


class _PQBatchTopK:
    """map_batches stage: encode the batch, ADC-score every query via
    per-subspace lookup tables, keep the per-batch top candidates WITH
    their true vectors (tiny: queries × refine·k rows per batch) so the
    driver's exact re-rank needs no second corpus pass."""

    def __init__(self, books_ref, tables_ref, qids, keep, col, id_col):
        self.books_ref = books_ref
        self.tables_ref = tables_ref
        self.qids = qids
        self.keep = keep
        self.col = col
        self.id_col = id_col
        self._books = None
        self._tables = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._books is None:
            self._books = ray.get(self.books_ref)
            self._tables = ray.get(self.tables_ref)  # (q, m, k)
        e = _embedding_matrix(batch, self.col)
        nn = np.linalg.norm(e, axis=1)
        nn[nn == 0] = 1.0
        eu = e / nn[:, None]
        codes = pq_encode(eu, self._books)
        ids = batch.column(self.id_col).to_numpy()
        nq, m, _k = self._tables.shape
        out_q, out_v, out_s, out_vecs = [], [], [], []
        approx = np.zeros((nq, len(eu)), dtype=np.float64)
        for j in range(m):
            approx += self._tables[:, j, codes[:, j]]
        for qi in range(nq):
            s = approx[qi]
            top = np.argsort(-s, kind="stable")[: self.keep]
            out_q.append(np.full(len(top), self.qids[qi], dtype=np.int64))
            out_v.append(ids[top].astype(np.int64))
            out_s.append(s[top])
            out_vecs.append(eu[top])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "approx": pa.array(np.concatenate(out_s), pa.float64()),
            "vec": pa.array(
                list(np.concatenate(out_vecs)),
                pa.list_(pa.float64()),
            ),
        })


def knn_cosine_pq(
    ds,
    queries: np.ndarray,
    query_ids: list[int] | np.ndarray,
    k: int = 10,
    m: int = 8,
    k_codes: int = 256,
    refine: int = 8,
    col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 10_000,
    seed: int = 13,
) -> pa.Table:
    """Approximate cosine top-k via PRODUCT QUANTIZATION with exact
    re-rank: a driver-side seeded codebook fit over a sample, ONE
    streaming pass that scans uint8 codes per batch (ADC lookup-table
    sums — no raw-vector math in the hot loop), per-batch top
    ``refine·k`` candidates carried WITH their unit vectors, and an
    exact-cosine re-rank of the global candidate pool.  Output shape =
    :func:`knn_cosine` (query_id, rank, vec_id, sim_r); recall measured
    against the exact twin in the approx_recall pipeline."""
    sample_tbl = to_arrow(ds.limit(sample_size))
    sample = _embedding_matrix(sample_tbl, col)
    books = pq_fit(sample, m=m, k_codes=k_codes, seed=seed)
    q = np.asarray(queries, dtype=np.float64)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    qu = q / qn[:, None]
    mm, k_eff, sub = books.shape
    tables = np.empty((len(qu), mm, k_eff), dtype=np.float64)
    for j in range(mm):
        tables[:, j, :] = qu[:, j * sub:(j + 1) * sub] @ books[j].T
    stage = _PQBatchTopK(
        ray.put(books), ray.put(tables),
        np.asarray(query_ids, dtype=np.int64), refine * k, col, id_col,
    )
    parts = to_arrow(ds.map_batches(
        stage, batch_format="pyarrow", zero_copy_batch=True
    ))
    # exact re-rank of the global candidate pool (per query: the best
    # refine·k by approx score, then true cosine, then the k cut)
    qids = parts.column("query_id").to_numpy()
    vids = parts.column("vec_id").to_numpy()
    appr = parts.column("approx").to_numpy()
    vecs = parts.column("vec")
    out_q, out_r, out_v, out_s = [], [], [], []
    for qi, qid in enumerate(np.asarray(query_ids, dtype=np.int64)):
        msk = np.nonzero(qids == qid)[0]
        pool = msk[np.argsort(-appr[msk], kind="stable")[: refine * k]]
        cand_vecs = np.array(
            [vecs[int(i)].as_py() for i in pool], dtype=np.float64
        )
        sims = cand_vecs @ qu[qi]
        top = _rank_key_order(sims, vids[pool], k)
        out_q.append(np.full(len(top), qid, dtype=np.int64))
        out_r.append(np.arange(1, len(top) + 1, dtype=np.int64))
        out_v.append(vids[pool][top])
        out_s.append(np.round(sims[top], 4))
    return pa.table({
        "query_id": pa.array(np.concatenate(out_q), pa.int64()),
        "rank": pa.array(np.concatenate(out_r), pa.int64()),
        "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
        "sim_r": pa.array(np.concatenate(out_s), pa.float64()),
    })


def semdedup_pairs(
    ds,
    threshold: float = 0.4,
    n_clusters: int = 16,
    probes: int = 3,
    col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 10_000,
    seed: int = 13,
) -> pa.Table:
    """SemDeDup-style cluster-pruned embedding near-dup pairs (Abbas et
    al. 2023, arXiv:2303.09540: k-means the embedding space, then look
    for semantic duplicates only WITHIN each cluster) with MULTI-PROBE
    assignment: every vector joins its ``probes`` closest clusters, so
    near-threshold pairs straddling a cluster boundary still co-occur
    somewhere (measured at sf0.01/16 clusters: recall 0.39 → 0.92 for
    probes 1 → 3 at the mid 0.4 threshold — single-probe is the weak
    default the LSH ops already taught us to avoid).  Candidate work is
    Σ|cluster|² ≈ probes²/n_clusters of exact; the only exchange is one
    groupby on the cluster id.  Remaining cross-cluster misses are the
    (measured) recall loss — see ``approx_recall`` / BASELINE.md.

    Same kernels and conventions as :func:`cosine_dup_pairs` (round to
    4 THEN threshold, ``vec_a < vec_b``), same deterministic spherical
    k-means as :func:`build_ivf` — so recall against the exact twin is
    attributable to clustering alone."""
    sample_tbl = to_arrow(ds.limit(sample_size))
    sample = _embedding_matrix(sample_tbl, col)
    cent = kmeans_fit(sample, n_clusters, seed=seed)
    p_eff = min(probes, n_clusters)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        e = _embedding_matrix(batch, col)
        nn = np.linalg.norm(e, axis=1)
        nn[nn == 0] = 1.0
        en = e / nn[:, None]
        sims = en @ c.T
        top = np.argpartition(-sims, p_eff - 1, axis=1)[:, :p_eff]
        n = len(en)
        rep = np.repeat(np.arange(n), p_eff)
        return pa.table({
            "vec_id": batch.column(id_col).take(
                pa.array(rep, pa.int64())),
            "unit": pa.array(list(en[rep]), pa.list_(pa.float64())),
            "cluster": pa.array(top.ravel().astype(np.int32), pa.int32()),
        })

    def per_cluster(g: pa.Table) -> pa.Table:
        ids = g.column("vec_id").to_numpy()
        flat = g.column("unit").combine_chunks().flatten().to_numpy(
            zero_copy_only=False)
        m = flat.reshape(len(ids), -1)
        sims = np.round(m @ m.T, 4)
        ai, bj = np.nonzero(sims >= threshold)
        keep = ids[ai] < ids[bj]
        return pa.table({
            "vec_a": pa.array(ids[ai][keep].astype(np.int64), pa.int64()),
            "vec_b": pa.array(ids[bj][keep].astype(np.int64), pa.int64()),
            "sim_r": pa.array(sims[ai, bj][keep], pa.float64()),
        })

    out = to_arrow(
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cluster")
        .map_groups(per_cluster, batch_format="pyarrow")
    )
    if out.num_rows == 0 or "vec_a" not in out.column_names:
        return pa.table({
            "vec_a": pa.array([], pa.int64()),
            "vec_b": pa.array([], pa.int64()),
            "sim_r": pa.array([], pa.float64()),
        })
    # multi-probe can surface the same pair in several clusters — dedup
    # on the (a, b) key (output is pair-scale, driver-side is fine)
    a = out.column("vec_a").to_numpy()
    b = out.column("vec_b").to_numpy()
    s = out.column("sim_r").to_numpy()
    order = np.lexsort((b, a))
    a, b, s = a[order], b[order], s[order]
    first = np.ones(len(a), dtype=bool)
    first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return pa.table({
        "vec_a": pa.array(a[first], pa.int64()),
        "vec_b": pa.array(b[first], pa.int64()),
        "sim_r": pa.array(s[first], pa.float64()),
    })
