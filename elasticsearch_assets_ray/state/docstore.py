"""Key→document state storage over the per-partition doc store.

Ray-Data-native analogue of the reference's ``elasticsearch_state_storage``
(``/root/reference/asset/elasticsearch_state_storage/api.js:6-33``): a
per-worker cached key→record lookup, there backed by ES ``mget`` (chunk
2500 / concurrency 10, ``schema.js:18-29``), here backed by the index's
partition-sharded docmeta Parquet.  The cache unit is a *partition* (one
docmeta file), not a row — random doc_id lookups at 10^12 scale touch a
bounded set of hot partitions and each partition file is one sequential
columnar read.

``DocStoreHydrator`` is the map_batches actor-pool stage that joins top-k
results back to document metadata (the reference's mget-style point join,
SURVEY.md §2.5) — broadcast-free: each actor holds its own LRU of loaded
partitions.
"""

from __future__ import annotations

from collections import OrderedDict
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class DocStore:
    """mget-style lookup: global doc_id → docmeta row, partition-LRU cached.

    ``columns`` restricts what is read/returned (projection pushdown into
    the docmeta parquet read).
    """

    def __init__(
        self,
        index_dir: str | Path,
        columns: list[str] | None = None,
        cache_partitions: int = 64,
    ):
        from ..index.build import IndexInfo

        info = IndexInfo(index_dir)
        self._index_dir = index_dir  # path only: instances stay picklable
        parts = sorted(info.manifest.partitions, key=lambda p: p.doc_base)
        self._bases = np.array([p.doc_base for p in parts], dtype=np.int64)
        self._ends = np.array(
            [p.doc_base + p.num_rows for p in parts], dtype=np.int64
        )
        self._pids = np.array([p.partition_id for p in parts], dtype=np.int64)
        self.columns = columns
        self.cache_partitions = cache_partitions
        self._cache: OrderedDict[int, pa.Table] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def _partition_table(self, pid: int) -> pa.Table:
        t = self._cache.get(pid)
        if t is not None:
            self.hits += 1
            self._cache.move_to_end(pid)
            return t
        from ..index.build import docmeta_path

        self.misses += 1
        t = pq.read_table(docmeta_path(self._index_dir, pid), columns=self.columns)
        self._cache[pid] = t
        while len(self._cache) > self.cache_partitions:
            self._cache.popitem(last=False)
        return t

    def count(self) -> int:
        """Cached-partition row count (the reference cache's ``count()``)."""
        return sum(t.num_rows for t in self._cache.values())

    def mget(self, doc_ids) -> pa.Table:
        """Fetch docmeta rows for ``doc_ids``, returned in request order."""
        ids = np.asarray(doc_ids, dtype=np.int64)
        if len(ids) == 0:
            # empty table with the right schema — footer-only read, never
            # a full partition load (and no crash on a zero-partition index)
            if len(self._pids) == 0:
                return pa.table({})
            from ..index.build import docmeta_path

            schema = pq.read_schema(docmeta_path(self._index_dir, int(self._pids[0])))
            if self.columns is not None:
                schema = pa.schema([schema.field(c) for c in self.columns])
            return schema.empty_table()
        slot = np.searchsorted(self._bases, ids, side="right") - 1
        if (slot < 0).any() or (ids >= self._ends[slot]).any():
            bad = ids[(slot < 0) | (ids >= self._ends[np.maximum(slot, 0)])]
            raise KeyError(f"doc_ids out of range: {bad[:5].tolist()}")
        order = np.argsort(slot, kind="stable")
        pieces: list[pa.Table] = []
        positions: list[np.ndarray] = []
        i = 0
        while i < len(order):
            j = i
            s = slot[order[i]]
            while j < len(order) and slot[order[j]] == s:
                j += 1
            sel = order[i:j]
            part = self._partition_table(int(self._pids[s]))
            offsets = ids[sel] - self._bases[s]
            pieces.append(part.take(pa.array(offsets)))
            positions.append(sel)
            i = j
        combined = pa.concat_tables(pieces)
        inv = np.empty(len(ids), dtype=np.int64)
        inv[np.concatenate(positions)] = np.arange(len(ids))
        return combined.take(pa.array(inv))

    def get(self, doc_id: int) -> dict:
        return self.mget([doc_id]).to_pylist()[0]


class CorpusTextReader:
    """Global doc_id → original document TEXT, read back from the corpus
    parquet files via the manifest's partition lineage (path + row-group
    span + row slice) — the ``_source`` fetch ES performs for highlight /
    hydrate.  Partition-LRU cached like :class:`DocStore`; a top-k
    hydration touches at most k partitions, each one projected columnar
    read of the text column."""

    def __init__(self, index_dir: str | Path, cache_partitions: int = 16):
        from ..index.build import IndexInfo

        info = IndexInfo(index_dir)
        self.text_col = info.manifest.text_col
        parts = sorted(info.manifest.partitions, key=lambda p: p.doc_base)
        self._plans = {p.partition_id: p for p in parts}
        self._bases = np.array([p.doc_base for p in parts], dtype=np.int64)
        self._ends = np.array(
            [p.doc_base + p.num_rows for p in parts], dtype=np.int64
        )
        self._pids = np.array([p.partition_id for p in parts], dtype=np.int64)
        self.cache_partitions = cache_partitions
        self._cache: OrderedDict[int, pa.Table] = OrderedDict()

    def _partition_text(self, pid: int) -> pa.Table:
        t = self._cache.get(pid)
        if t is not None:
            self._cache.move_to_end(pid)
            return t
        p = self._plans[pid]
        pf = pq.ParquetFile(p.path)
        t = pf.read_row_groups(
            list(range(p.row_group_start, p.row_group_end)),
            columns=[self.text_col],
        )
        if p.row_start >= 0:
            t = t.slice(p.row_start, p.row_end - p.row_start)
        self._cache[pid] = t
        while len(self._cache) > self.cache_partitions:
            self._cache.popitem(last=False)
        return t

    def mget(self, doc_ids) -> list[str]:
        """Original text per global doc_id, in request order."""
        ids = np.asarray(doc_ids, dtype=np.int64)
        if len(ids) == 0:
            return []
        slot = np.searchsorted(self._bases, ids, side="right") - 1
        if (slot < 0).any() or (ids >= self._ends[np.maximum(slot, 0)]).any():
            bad = ids[(slot < 0) | (ids >= self._ends[np.maximum(slot, 0)])]
            raise KeyError(f"doc_ids out of range: {bad[:5].tolist()}")
        out: list[str] = []
        for i, d in enumerate(ids.tolist()):
            part = self._partition_text(int(self._pids[slot[i]]))
            out.append(part.column(self.text_col)[d - int(self._bases[slot[i]])].as_py())
        return out


class DocStoreHydrator:
    """Actor-pool stage: join a results batch (``doc_id`` column) with doc
    metadata columns.  Store loaded once per actor (``__init__``), reused
    per batch — the ST1 expensive-init pattern."""

    def __init__(self, index_dir: str, columns: list[str] | None = None):
        # mget joins positionally — no need to force doc_id into the
        # parquet projection just to drop it again
        self.store = DocStore(index_dir, columns=columns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        meta = self.store.mget(batch.column("doc_id").to_numpy())
        for name in meta.column_names:
            if name != "doc_id" and name not in batch.column_names:
                batch = batch.append_column(name, meta.column(name))
        return batch


def hydrate_dataset(results_ds, index_dir: str | Path, columns: list[str],
                    concurrency: int = 2):
    """Hydrate a Dataset of scored results with doc-store columns."""
    return results_ds.map_batches(
        DocStoreHydrator,
        fn_constructor_args=(str(index_dir), columns),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        num_cpus=1,
    )


class CachedStateStorage:
    """Read-through, write-overlay key→record cache — the reference's
    ``ESCachedStateStorage`` surface (``api.js:6-33``: ``get/mget`` read
    through the backing store into a per-worker cache, ``set/mset``
    write the cache and optionally persist).

    Backing store here is the :class:`DocStore`; ``mset`` writes a local
    overlay (persist-to-index is not meaningful for derived docmeta — a
    real sink would flush the overlay to its own parquet, which
    ``flush_overlay`` does).  Named instances are independent
    (``test/elasticsearch_state_storage-spec.js:96-149``).
    """

    def __init__(self, index_dir: str | Path, columns: list[str] | None = None,
                 cache_partitions: int = 64):
        self.store = DocStore(index_dir, columns=columns,
                              cache_partitions=cache_partitions)
        self.overlay: dict[int, dict] = {}

    def count(self) -> int:
        # overlay entries whose doc also sits in a cached partition are
        # ONE record, not two
        cached = self.store.count()
        if not self.overlay or cached == 0:
            return len(self.overlay) + cached
        overlap = 0
        ids = np.asarray(sorted(self.overlay), dtype=np.int64)
        slot = np.searchsorted(self.store._bases, ids, side="right") - 1
        ok = (slot >= 0) & (ids < self.store._ends[np.maximum(slot, 0)])
        for i in np.nonzero(ok)[0]:
            if int(self.store._pids[slot[i]]) in self.store._cache:
                overlap += 1
        return len(self.overlay) + cached - overlap

    def set(self, doc_id: int, record: dict) -> None:
        self.overlay[int(doc_id)] = dict(record)

    def mset(self, records: list[dict], key: str = "doc_id") -> None:
        for r in records:
            self.set(int(r[key]), {k: v for k, v in r.items() if k != key})

    def get(self, doc_id: int) -> dict:
        hit = self.overlay.get(int(doc_id))
        if hit is not None:
            return {"doc_id": int(doc_id), **hit}
        return self.store.get(int(doc_id))

    def mget(self, doc_ids) -> list[dict]:
        out: list[dict | None] = []
        missing: list[int] = []
        for d in doc_ids:
            hit = self.overlay.get(int(d))
            out.append({"doc_id": int(d), **hit} if hit is not None else None)
            if hit is None:
                missing.append(int(d))
        if missing:
            fetched = iter(self.store.mget(missing).to_pylist())
            out = [o if o is not None else next(fetched) for o in out]
        return out

    def flush_overlay(self, path: str | Path) -> int:
        """Persist the overlay as parquet (the ``mset`` persist option)."""
        import pyarrow.parquet as pq

        if not self.overlay:
            return 0
        rows = [{"doc_id": k, **v} for k, v in sorted(self.overlay.items())]
        pq.write_table(pa.Table.from_pylist(rows), path)
        return len(rows)
