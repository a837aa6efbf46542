"""Delete semantics for built indexes — the bulk sink's ``delete`` action
(``/root/reference/asset/elasticsearch_index_selector/index.js:63-69``:
an action row with no payload) applied to our immutable segments.

Lucene-style: segments never rewrite; deletions accumulate in per-shard
tombstone files (sorted doc_id arrays, atomically replaced) that scorers
load alongside the segment and mask out at query time.  Idempotent and
monotonic — applying the same deletes twice is a no-op; a rebuilt shard
starts with an empty tombstone set.

``apply_delete_actions`` consumes an action-columns Dataset (the
IndexSelector output shape) so the reference pipeline
``index_selector → bulk`` maps to ``IndexSelector → apply_delete_actions``.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pyarrow as pa


def deletes_path(index_dir: str | Path, shard_id: int) -> Path:
    return Path(index_dir) / "deletes" / f"shard-{shard_id:05d}.npy"


def load_deletes(index_dir: str | Path, shard_id: int) -> np.ndarray:
    """Sorted deleted doc_ids of one shard (empty array when none)."""
    p = deletes_path(index_dir, shard_id)
    if not p.exists():
        return np.empty(0, dtype=np.int64)
    return np.load(p)


def delete_docs(index_dir: str | Path, doc_ids) -> dict[int, int]:
    """Tombstone the given global doc_ids.  Returns {shard_id: n_deleted}.

    Driver-side: the per-shard routing reuses the manifest's doc ranges
    (the same searchsorted the DocStore uses); writes are atomic
    (tmp + rename) and merge with existing tombstones.
    """
    from .build import IndexInfo

    info = IndexInfo(index_dir)
    ids = np.unique(np.asarray(doc_ids, dtype=np.int64))
    if len(ids) == 0:
        return {}
    shards = sorted(info.manifest.shards.values(), key=lambda s: s.doc_base)
    bases = np.array([s.doc_base for s in shards], dtype=np.int64)
    ends = np.array([s.doc_base + s.num_docs for s in shards], dtype=np.int64)
    slot = np.searchsorted(bases, ids, side="right") - 1
    if (slot < 0).any() or (ids >= ends[np.maximum(slot, 0)]).any():
        bad = ids[(slot < 0) | (ids >= ends[np.maximum(slot, 0)])]
        raise KeyError(f"doc_ids out of range: {bad[:5].tolist()}")
    out: dict[int, int] = {}
    for s_idx in np.unique(slot):
        shard = shards[int(s_idx)]
        new = ids[slot == s_idx]
        p = deletes_path(index_dir, shard.shard_id)
        merged = np.union1d(load_deletes(index_dir, shard.shard_id), new)
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = p.with_name(f".tmp-{os.getpid()}-{p.name}")
        with open(tmp, "wb") as fh:
            np.save(fh, merged)
        os.replace(tmp, p)
        out[shard.shard_id] = len(new)
    return out


def apply_delete_actions(actions_ds, index_dir: str | Path,
                         doc_id_col: str = "doc_id") -> dict[int, int]:
    """Apply the ``delete`` rows of an action-columns Dataset (the
    IndexSelector output: an ``action`` column) to the index."""
    import pyarrow.compute as pc

    from ..ops import to_arrow

    tbl = to_arrow(
        actions_ds.map_batches(
            lambda b: b.filter(pc.equal(b.column("action"), "delete")).select(
                [doc_id_col]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    if tbl.num_rows == 0:
        return {}
    return delete_docs(index_dir, tbl.column(doc_id_col).to_numpy())


def dropped_archive_path(index_dir: str | Path, shard_id: int) -> Path:
    return Path(index_dir) / "deletes" / f"shard-{shard_id:05d}.dropped.npz"


def load_dropped_archive(index_dir: str | Path, shard_id: int) -> np.ndarray:
    """Doc ids already PHYSICALLY removed by compaction (guards stats
    against double subtraction; survives clear_deletes)."""
    p = dropped_archive_path(index_dir, shard_id)
    if not p.exists():
        return np.empty(0, dtype=np.int64)
    with np.load(p) as z:
        return z["ids"]


def load_dropped_tokens(index_dir: str | Path, shard_id: int) -> int:
    """Cumulative dl mass of the shard's compacted-away docs (stored with
    the archive so the build's stats write is O(1), no docmeta rescan)."""
    p = dropped_archive_path(index_dir, shard_id)
    if not p.exists():
        return 0
    with np.load(p) as z:
        return int(z["tokens"][0])


def save_dropped_archive(index_dir: str | Path, shard_id: int,
                         ids: np.ndarray, dropped_tokens: int) -> None:
    p = dropped_archive_path(index_dir, shard_id)
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.with_name(p.name + f".tmp-{os.getpid()}.npz")
    np.savez(tmp, ids=np.asarray(ids, dtype=np.int64),
             tokens=np.array([int(dropped_tokens)], dtype=np.int64))
    os.replace(tmp, p)


def clear_dropped_archive(index_dir: str | Path, shard_id: int) -> None:
    p = dropped_archive_path(index_dir, shard_id)
    if p.exists():
        os.remove(p)


def clear_deletes_shard(index_dir, shard_id: int) -> None:
    """Remove one shard's tombstone file (post-compaction)."""
    p = deletes_path(index_dir, shard_id)
    if p.exists():
        os.remove(p)


def clear_deletes(index_dir: str | Path) -> None:
    """Drop every PENDING tombstone (un-delete).  Compaction archives
    (``*.dropped.npy`` — the already-physically-removed ids that guard
    the stats against double subtraction) are preserved."""
    d = Path(index_dir) / "deletes"
    if not d.exists():
        return
    for p in d.glob("shard-*.npy"):
        if ".dropped" not in p.name:
            os.remove(p)
