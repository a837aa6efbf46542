"""Segment compaction — physically removing tombstoned docs.

The tombstone layer (``deletes.py``) is the Lucene model: segments stay
immutable, deletions mask at query time.  Compaction is the matching
merge step: every shard with tombstones rewrites its segment WITHOUT the
deleted postings (df/cf/max_tf recomputed, empty terms dropped), then
clears its tombstones.  One Ray task per dirty shard; clean shards are
untouched byte-for-byte.

Stats semantics follow Elasticsearch: after a merge, df AND the corpus
stats (N, avgdl, total_tokens) reflect live documents only, so a
compacted index scores exactly like an index of the surviving docs
(rank+score identical to an oracle over the live corpus with original
doc ids — tested).  Mask-at-query-time serving keeps pre-delete df/N,
so scores legitimately drift at compaction, like an ES segment merge.
Docmeta rows for deleted docs are retained (archive; the doc store can
still hydrate them) — only postings and stats change.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from .build import IndexInfo, segment_dir, write_segment_atomic
from .codec import decode_postings_many, encode_postings_many
from .deletes import (
    clear_deletes_shard,
    load_deletes,
    load_dropped_archive,
    load_dropped_tokens,
    save_dropped_archive,
)


def compact_shard(index_dir: str | Path, shard_id: int,
                  block_size: int, codec: str) -> dict:
    """Rewrite one shard's segment without its tombstoned docs.
    Returns a summary row; no-op when the shard has no tombstones."""
    index_dir = Path(index_dir)
    deleted = load_deletes(index_dir, shard_id)
    # ids dropped by an EARLIER compaction: tombstoning them again is a
    # valid (idempotent) delete call, but they must not be double-counted
    # against the stats — their docmeta rows are retained as an archive
    already = load_dropped_archive(index_dir, shard_id)
    deleted = np.setdiff1d(deleted, already)
    if len(deleted) == 0:
        clear_deletes_shard(index_dir, shard_id)
        return {"shard_id": shard_id, "dropped_postings": 0,
                "dropped_terms": 0, "dropped_docs": 0, "dropped_tokens": 0}
    # dl mass of the deleted docs (for the stats refresh)
    from .build import docmeta_path

    info = IndexInfo(index_dir)
    deleted_tokens = 0
    for pid in info.manifest.shards[shard_id].partition_ids:
        dm = pq.read_table(docmeta_path(index_dir, pid), columns=["doc_id", "dl"])
        m = np.isin(dm.column("doc_id").to_numpy(), deleted)
        deleted_tokens += int(dm.column("dl").to_numpy()[m].sum())
    seg_path = segment_dir(index_dir, shard_id) / "segment.parquet"
    seg = pq.read_table(seg_path)
    blobs = seg.column("postings").to_pylist()
    doc_flat, tf_flat, offs = decode_postings_many(blobs)
    live = ~np.isin(doc_flat.astype(np.int64), deleted)
    # per-term new offsets after the mask
    counts = np.diff(offs)
    term_idx = np.repeat(np.arange(len(blobs), dtype=np.int64), counts)
    new_counts = np.bincount(term_idx[live], minlength=len(blobs))
    keep_terms = new_counts > 0
    doc_new = doc_flat[live]
    tf_new = tf_flat[live]
    new_offs_all = np.zeros(len(blobs) + 1, dtype=np.int64)
    np.cumsum(new_counts, out=new_offs_all[1:])
    # drop empty terms: compact the offset table
    kept_rows = np.nonzero(keep_terms)[0]
    offs_kept = np.zeros(len(kept_rows) + 1, dtype=np.int64)
    np.cumsum(new_counts[kept_rows], out=offs_kept[1:])
    # reorder flat streams so kept terms are contiguous (they already
    # are — masking preserves order and empty terms contribute nothing)
    new_blobs = encode_postings_many(doc_new, tf_new, offs_kept, block_size, codec)
    tf64 = tf_new.astype(np.int64)
    dfs = np.diff(offs_kept)
    cfs = (
        np.add.reduceat(tf64, offs_kept[:-1])
        if len(kept_rows) else np.empty(0, np.int64)
    )
    maxtf = (
        np.maximum.reduceat(tf64, offs_kept[:-1])
        if len(kept_rows) else np.empty(0, np.int64)
    )
    take_idx = pa.array(kept_rows, pa.int64())
    cols = {
        "term": seg.column("term").take(take_idx),
        "df": pa.array(dfs, pa.int64()),
        "cf": pa.array(cfs, pa.int64()),
        "max_tf": pa.array(maxtf, pa.int64()),
        "postings": pa.array(new_blobs, pa.large_binary()),
    }
    if "positions" in seg.column_names:
        # positional sidecar: drop deleted docs' position spans and
        # re-encode (a row-level take would keep stale spans)
        from .codec import decode_positions, encode_positions_many

        kept_pos: list[np.ndarray] = []
        kept_tfs: list[np.ndarray] = []
        # shingle_positions=False layouts store EMPTY blobs for shingle
        # terms — carry the emptiness through compaction unchanged
        empty_rows: set[int] = set()
        for t in range(len(blobs)):
            lo, hi = int(offs[t]), int(offs[t + 1])
            t_tfs = tf_flat[lo:hi].astype(np.int64)
            blob = seg.column("positions")[t].as_py()
            if len(blob) == 0 and int(t_tfs.sum()) > 0:
                empty_rows.add(t)
                kept_tfs.append(t_tfs[live[lo:hi]])
                continue
            pos = decode_positions(blob, t_tfs)
            tok_keep = np.repeat(live[lo:hi], t_tfs)
            kept_pos.append(pos[tok_keep])
            kept_tfs.append(t_tfs[live[lo:hi]])
        pos_flat = (
            np.concatenate(kept_pos) if kept_pos else np.empty(0, np.uint64)
        )
        tfs_flat_kept = (
            np.concatenate(kept_tfs) if kept_tfs else np.empty(0, np.int64)
        )
        skip_kept = (
            np.fromiter(
                (int(r) in empty_rows for r in kept_rows),
                dtype=bool, count=len(kept_rows),
            )
            if empty_rows else None
        )
        cols["positions"] = pa.array(
            encode_positions_many(
                pos_flat, tfs_flat_kept, offs_kept, skip=skip_kept
            ),
            pa.large_binary(),
        )
    # extra columns (e.g. a `shard` partition echo) are preserved
    for name in seg.column_names:
        if name not in cols:
            cols[name] = seg.column(name).take(take_idx)
    out = pa.table(cols)
    import shutil

    # replace the old segment (tiny non-atomic window: a crash between
    # rmtree and write leaves the shard segment missing, which the build
    # resume path treats as "not done" and rebuilds from the corpus)
    final = segment_dir(index_dir, shard_id)
    shutil.rmtree(final, ignore_errors=True)
    write_segment_atomic(index_dir, shard_id, out)
    save_dropped_archive(
        index_dir, shard_id, np.union1d(already, deleted),
        load_dropped_tokens(index_dir, shard_id) + deleted_tokens,
    )
    clear_deletes_shard(index_dir, shard_id)
    return {
        "shard_id": shard_id,
        "dropped_postings": int((~live).sum()),
        "dropped_terms": int((~keep_terms).sum()),
        "dropped_docs": int(len(deleted)),
        "dropped_tokens": deleted_tokens,
    }


def compact_index(index_dir: str | Path, block_size: int | None = None,
                  codec: str | None = None) -> pa.Table:
    """Compact every shard that has tombstones (one Ray task per dirty
    shard) → summary table (shard_id, dropped_postings, dropped_terms,
    dropped_docs, dropped_tokens).

    Stats (N, avgdl, total_tokens) are refreshed to live documents (ES
    merge semantics — see the module docstring); already-compacted doc
    ids are tracked in a per-shard archive so re-deleting a gone doc can
    never subtract it from the stats twice."""
    info = IndexInfo(index_dir)
    block_size = block_size or info.manifest.block_size
    codec = codec or info.manifest.postings_codec
    dirty = [
        sid for sid in info.shard_ids()
        if len(load_deletes(index_dir, sid))
    ]
    if not dirty:
        return pa.table(
            {
                "shard_id": pa.array([], pa.int32()),
                "dropped_postings": pa.array([], pa.int64()),
                "dropped_terms": pa.array([], pa.int64()),
                "dropped_docs": pa.array([], pa.int64()),
                "dropped_tokens": pa.array([], pa.int64()),
            }
        )
    idx = str(index_dir)

    def work(batch: pa.Table) -> pa.Table:
        rows = [
            compact_shard(idx, int(s), block_size, codec)
            for s in batch.column("shard_id").to_pylist()
        ]
        return pa.table(
            {
                "shard_id": pa.array([r["shard_id"] for r in rows], pa.int32()),
                "dropped_postings": pa.array(
                    [r["dropped_postings"] for r in rows], pa.int64()
                ),
                "dropped_terms": pa.array(
                    [r["dropped_terms"] for r in rows], pa.int64()
                ),
                "dropped_docs": pa.array(
                    [r["dropped_docs"] for r in rows], pa.int64()
                ),
                "dropped_tokens": pa.array(
                    [r["dropped_tokens"] for r in rows], pa.int64()
                ),
            }
        )

    from ..ops import to_arrow

    out = to_arrow(
        rd.from_items([{"shard_id": s} for s in dirty])
        .map_batches(work, batch_format="pyarrow", batch_size=1)
    ).sort_by("shard_id")

    # stats refresh (ES semantics: live docs only).  Recomputed from the
    # manifest totals minus ALL per-shard dropped archives — the same
    # formula build_index uses — rather than subtracting only this run's
    # drops: a prior compact run that crashed after some shard tasks
    # finished (archives written, tombstones cleared) but before this
    # refresh leaves those shards invisible to `dirty`, and an
    # incremental subtraction would never account for them.
    import json

    from .manifest import STATS_NAME, atomic_write_text

    n_docs = info.manifest.total_docs
    total_tokens = sum(s.total_tokens for s in info.manifest.shards.values())
    for sid in info.manifest.shards:
        arch = load_dropped_archive(index_dir, sid)
        if len(arch) == 0:
            continue
        n_docs -= len(arch)
        total_tokens -= load_dropped_tokens(index_dir, sid)
    stats = {
        "num_docs": n_docs,
        "total_tokens": total_tokens,
        "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
        "num_shards": info.stats.num_shards,
    }
    atomic_write_text(Path(index_dir) / STATS_NAME, json.dumps(stats, indent=1))
    return out
