"""Cluster-aware train/test splitting with a leakage guard — the
correct way to split an LLM training corpus that contains
near-duplicates (a random per-doc split leaks test content into train
through near-dup pairs; splitting whole duplicate CLUSTERS atomically
makes cross-split leakage structurally impossible).

Pieces:

- :func:`cluster_split` — every document's split key is the canonical
  (min-id) member of its near-dup cluster (unpaired docs are their own
  cluster), assigned to test iff ``knuth_hash(split_key) < rate·2³²``
  (the repo's deterministic, SQL-expressible sampling hash,
  ops/sampling.py).  All members of a cluster share the split key, so
  the whole cluster lands on one side.
- :func:`split_leakage` — the guard, measured rather than assumed: the
  number of near-dup pairs whose endpoints straddle the split (zero by
  construction for the same pair set) plus per-split doc counts.

Scale shape: component labels come from the distributed
label-propagation CC (ops/cluster.py — fixed-bucket exchanges).  The
(node → label) map is pair-graph-sized, not corpus-sized; it broadcasts
once via ``ray.put`` as two sorted int64 arrays and every batch looks
up with ``np.searchsorted`` (the broadcast-small-side recipe).  For a
graph too big for one broadcast, bucket-join the labels instead — the
assignment is a plain equi-join on doc_id; this module takes the
broadcast path and documents the assumption (near-dup graph nodes ≪
corpus)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .cluster import connected_components
from .sampling import knuth_hash_u32

_MOD = np.uint64(1) << np.uint64(32)


def _label_arrays(pairs, a_col: str, b_col: str):
    """CC labels → (sorted nodes, aligned labels) numpy pair."""
    labels = connected_components(pairs, a_col, b_col)
    parts = [ray.get(r) for r in labels.to_arrow_refs()]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    t = pa.concat_tables(parts)
    nodes = t.column("node").to_numpy().astype(np.int64)
    labs = t.column("label").to_numpy().astype(np.int64)
    order = np.argsort(nodes)
    return nodes[order], labs[order]


class _Assign:
    """map_batches callable: doc_id → (split_key, split)."""

    def __init__(self, map_ref, threshold: int, id_col: str):
        self.map_ref = map_ref
        self.threshold = np.uint64(threshold)
        self.id_col = id_col
        self._m = None

    def _map(self):
        if self._m is None:
            self._m = ray.get(self.map_ref)
        return self._m

    def __call__(self, batch: pa.Table) -> pa.Table:
        nodes, labs = self._map()
        ids = batch.column(self.id_col).to_numpy().astype(np.int64)
        key = ids.copy()
        if len(nodes):
            pos = np.searchsorted(nodes, ids)
            pos_c = np.clip(pos, 0, len(nodes) - 1)
            found = nodes[pos_c] == ids
            key[found] = labs[pos_c[found]]
        is_test = knuth_hash_u32(key) < self.threshold
        split = np.where(is_test, "test", "train")
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "split_key": pa.array(key, pa.int64()),
            "split": pa.array(split, pa.string()),
        })


def cluster_split(
    ds,
    pairs,
    test_rate: float,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
):
    """Assignment Dataset ``(doc_id, split_key, split)`` over ``ds``,
    with whole near-dup clusters (from ``pairs``) kept on one side.
    ``test_rate`` converts to the exact integer hash threshold
    ``int(rate·2³²)`` (the wire/SQL form)."""
    nodes, labs = _label_arrays(pairs, a_col, b_col)
    ref = ray.put((nodes, labs))
    thresh = int(test_rate * float(_MOD))
    return ds.map_batches(
        _Assign(ref, thresh, id_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def split_leakage(
    assign_ds,
    pairs,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> pa.Table:
    """The guard: per-split doc counts + the number of near-dup pairs
    straddling the split.  The assignment is re-broadcast as a sorted
    (doc_id → is_test) array; the pair scan streams."""
    parts = [ray.get(r) for r in assign_ds.to_arrow_refs()]
    t = pa.concat_tables([p for p in parts if p.num_rows])
    ids = t.column("doc_id").to_numpy().astype(np.int64)
    is_test = np.asarray(
        [s == "test" for s in t.column("split").to_pylist()], dtype=bool)
    order = np.argsort(ids)
    ids, is_test = ids[order], is_test[order]
    ref = ray.put((ids, is_test))

    def scan(batch: pa.Table) -> pa.Table:
        sids, stest = ray.get(ref)
        a = batch.column(a_col).to_numpy().astype(np.int64)
        b = batch.column(b_col).to_numpy().astype(np.int64)
        ta = stest[np.searchsorted(sids, a)]
        tb = stest[np.searchsorted(sids, b)]
        return pa.table({
            "cross": pa.array([int((ta != tb).sum())], pa.int64()),
        })

    if isinstance(pairs, pa.Table):
        import ray.data as rd

        pairs = rd.from_arrow(pairs)
    cross = pairs.map_batches(
        scan, batch_format="pyarrow", zero_copy_batch=True
    ).sum("cross") or 0
    return pa.table({
        "n_train": pa.array([int((~is_test).sum())], pa.int64()),
        "n_test": pa.array([int(is_test.sum())], pa.int64()),
        "cross_pairs": pa.array([int(cross)], pa.int64()),
    })
