"""ES data-plane bulk operations — ``_reindex``, ``_delete_by_query``,
``_update_by_query`` — over a Parquet corpus + built index.

This is the closest analogue to the reference's actual job: moving and
mutating index data in bulk (``/root/reference/asset/elasticsearch_reader``
streams an index out, ``asset/elasticsearch_bulk/index.js`` streams
actions back in, and the two composed are exactly ES ``_reindex``).  The
reference delegates the heavy lifting to Elasticsearch's own task
machinery; here each operation is an embarrassingly-parallel set of Ray
tasks over corpus/docmeta partitions — no shuffle anywhere:

* ``reindex``      — per-SOURCE-FILE task: filtered, transformed,
  written to a deterministic destination name (tmp+rename, skip when
  present), so a crashed run resumes by skipping finished files and the
  output is byte-identical to a cold run.
* ``delete_by_query`` — distributed docmeta scan (the compiled Lucene
  expression pushed into the Parquet read) → per-shard tombstones
  (Lucene-style: segments never rewrite; ``index/deletes.py``).
* ``update_by_query`` — Lucene/ES semantics exactly: an update is a
  DELETE of the old doc plus an APPEND of the new version.  Per
  index-partition task writes the transformed matched rows as new
  corpus files; ``build_index`` append-adopts them (new doc ids above
  resident, ``manifest.plan_append``); the old ids are tombstoned LAST
  so a crash mid-run re-executes idempotently (same dest names, same
  victim set) rather than losing data.  Between the append build and
  the tombstone write both versions are briefly visible — the same
  window ES has between ``_update_by_query`` batches and the next
  refresh.

Index statistics (df/cf/avgdl) keep counting tombstoned docs until a
``compact_index`` — Lucene's documented behavior for deletes, asserted
by the byquery tests (post-compaction ≡ cold build over survivors).
"""

from __future__ import annotations

import glob as _glob
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pds
import pyarrow.parquet as pq
import ray

from ..sources.query import compile_query


def _corpus_files(src: str | Path) -> list[str]:
    src = str(src)
    if src.endswith(".parquet"):
        return [src]
    return sorted(_glob.glob(os.path.join(src, "*.parquet")))


def _atomic_write(tbl: pa.Table, dest: str) -> None:
    tmp = f"{dest}.tmp-{os.getpid()}"
    pq.write_table(tbl, tmp)
    os.replace(tmp, dest)


# --------------------------------------------------------------- matching


@ray.remote
def _match_meta_task(paths: list[str], query: str) -> np.ndarray:
    """Matched doc_ids of a chunk of docmeta partitions — the compiled
    expression is pushed into the Parquet scan (row-group pruning)."""
    expr = compile_query(query)
    t = pds.dataset(paths).to_table(filter=expr, columns=["doc_id"])
    return t.column("doc_id").to_numpy().astype(np.int64)


def match_meta_ids(
    index_dir: str | Path, query: str, partitions_per_task: int = 16
) -> np.ndarray:
    """All doc_ids whose DOCMETA row matches a Lucene filter query —
    the ``_delete_by_query`` / ``_update_by_query`` match phase as a
    partition-parallel column-pruned scan (work ∝ partitions)."""
    from .build import IndexInfo, docmeta_path

    info = IndexInfo(index_dir)
    parts = sorted(info.manifest.partitions, key=lambda p: p.doc_base)
    paths = [str(docmeta_path(index_dir, p.partition_id)) for p in parts]
    futs = [
        _match_meta_task.remote(paths[i: i + partitions_per_task], query)
        for i in range(0, len(paths), partitions_per_task)
    ]
    got = [g for g in ray.get(futs) if len(g)]
    if not got:
        return np.empty(0, dtype=np.int64)
    return np.sort(np.concatenate(got))


def drop_dead_ids(index_dir: str | Path, ids: np.ndarray) -> np.ndarray:
    """Remove already-tombstoned doc_ids from a matched set.  The
    docmeta scan sees dead docs (their rows are retained as the doc
    store's archive); a by-query operation must act on LIVE docs only —
    ES never matches a deleted doc, and an update that re-matched one
    would resurrect it."""
    from .build import IndexInfo
    from .deletes import load_deletes

    if not len(ids):
        return ids
    info = IndexInfo(index_dir)
    shards = sorted(info.manifest.shards.values(), key=lambda s: s.doc_base)
    dead_parts = [
        d for s in shards for d in (load_deletes(index_dir, s.shard_id),)
        if len(d)
    ]
    if not dead_parts:
        return ids
    dead = np.concatenate(dead_parts)
    dead.sort()
    pos = np.searchsorted(dead, ids)
    hit = (pos < len(dead)) & (dead[np.minimum(pos, len(dead) - 1)] == ids)
    return ids[~hit]


# --------------------------------------------------------- delete_by_query


def delete_by_query(
    index_dir: str | Path,
    query: str | None = None,
    doc_ids=None,
) -> dict:
    """ES ``_delete_by_query``: tombstone every doc matching the query
    (or an explicit id array).  Returns the ES-shaped response body.
    Idempotent — re-running the same query deletes 0 more docs only in
    the sense that tombstones merge; ``deleted`` reports the match
    count (ES counts matched-and-deleted per run the same way when
    versions don't move)."""
    from .deletes import delete_docs

    if (query is None) == (doc_ids is None):
        raise ValueError("exactly one of query / doc_ids")
    ids = match_meta_ids(index_dir, query) if query is not None else (
        np.unique(np.asarray(doc_ids, dtype=np.int64))
    )
    ids = drop_dead_ids(index_dir, ids)
    per_shard = delete_docs(index_dir, ids) if len(ids) else {}
    return {
        "deleted": int(len(ids)),
        "version_conflicts": 0,
        "batches": len(per_shard),
        "per_shard": {int(k): int(v) for k, v in per_shard.items()},
    }


# ------------------------------------------------------------------ reindex


@ray.remote
def _reindex_file_task(
    src: str, dest: str, query: str | None, transform, columns
) -> int:
    """One source file → one destination file, atomic and idempotent.

    Skip-if-exists makes a re-run after a crash resume from the finished
    set; the destination name is a pure function of the source name, so
    the resumed output is byte-identical to a cold run."""
    if os.path.exists(dest):
        return -pq.read_metadata(dest).num_rows  # negative = skipped
    scan = pds.dataset(src)
    kw = {"columns": list(columns)} if columns else {}
    tbl = scan.to_table(
        filter=compile_query(query) if query else None, **kw
    )
    if transform is not None:
        tbl = transform(tbl)
    _atomic_write(tbl, dest)
    return tbl.num_rows


def reindex(
    src: str | Path,
    dest_corpus: str | Path,
    *,
    query: str | None = None,
    transform=None,
    columns=None,
) -> dict:
    """ES ``_reindex``: stream every source doc matching ``query``
    through ``transform`` (a ``pa.Table → pa.Table`` callable — the
    painless-script seat) into a new corpus directory, one Ray task per
    source file, no shuffle.  Build the destination index afterwards
    with ``build_index(dest_corpus, ...)`` (ES: reindex does not copy
    settings/mappings either).

    Returns ``{"created": n, "files": k, "resumed_files": j}``.
    """
    files = _corpus_files(src)
    if not files:
        raise FileNotFoundError(f"no parquet files under {src}")
    dest_corpus = Path(dest_corpus)
    dest_corpus.mkdir(parents=True, exist_ok=True)
    futs = [
        _reindex_file_task.remote(
            f,
            str(dest_corpus / f"reindex-{Path(f).stem}.parquet"),
            query,
            transform,
            columns,
        )
        for f in files
    ]
    got = ray.get(futs)
    return {
        "created": int(sum(abs(g) for g in got)),
        "files": len(files),
        "resumed_files": int(sum(1 for g in got if g < 0)),
    }


# ---------------------------------------------------------- update_by_query


@ray.remote
def _ubq_partition_task(
    part: dict, query: str, transform, dest: str, read_columns,
    dead: np.ndarray,
) -> np.ndarray:
    """One index partition: write the transformed matched LIVE rows as a
    new corpus file (atomic, skip-if-exists) and return the matched OLD
    doc_ids.  The id computation re-runs even on skip so a resumed run
    still tombstones the full victim set."""
    pf = pq.ParquetFile(part["path"])
    tbl = pf.read_row_groups(
        list(range(part["row_group_start"], part["row_group_end"])),
        columns=read_columns,
    )
    if part.get("row_start", -1) >= 0:
        tbl = tbl.slice(part["row_start"], part["row_end"] - part["row_start"])
    both = pa.table(
        {**{c: tbl.column(c) for c in tbl.column_names},
         "__rowidx": pa.array(np.arange(tbl.num_rows, dtype=np.int64))}
    )
    hit = pds.dataset(both).to_table(filter=compile_query(query))
    rel = hit.column("__rowidx").to_numpy().astype(np.int64)
    ids = part["doc_base"] + rel
    if len(dead):
        pos = np.searchsorted(dead, ids)
        tomb = (pos < len(dead)) & (
            dead[np.minimum(pos, len(dead) - 1)] == ids
        )
        hit, ids = hit.filter(pa.array(~tomb)), ids[~tomb]
    if len(ids) == 0:
        return ids
    if not os.path.exists(dest):
        out = hit.drop_columns(["__rowidx"])
        out = transform(out)
        _atomic_write(out, dest)
    return ids


def update_by_query(
    corpus_dir: str | Path,
    index_dir: str | Path,
    *,
    query: str,
    transform,
    tag: str,
    config=None,
    read_columns=None,
) -> dict:
    """ES ``_update_by_query``: apply ``transform`` to every doc
    matching ``query``.  Lucene semantics — the new version is APPENDED
    (new corpus files ``ubq-<tag>-*``, adopted by the incremental
    append build) and the old doc ids are tombstoned LAST.

    ``tag`` names the update (ES task id); it keys the destination
    files, making a crashed run resumable: finished partition files are
    skipped, the victim set is recomputed, the append build no-ops on
    already-built shards, and tombstone merge is idempotent.

    ``corpus_dir`` must be the directory the index was built from (the
    append plan fingerprints it).  Returns the ES-shaped response.
    """
    from .build import IndexInfo, build_index
    from .deletes import delete_docs, load_deletes

    corpus_dir = Path(corpus_dir)
    info = IndexInfo(index_dir)
    parts = sorted(info.manifest.partitions, key=lambda p: p.doc_base)
    # only original-corpus partitions: docs already written by THIS tag
    # must not match again (idempotent re-run), and ES applies one
    # update pass per task, not a fixpoint
    parts = [
        p for p in parts if not Path(p.path).name.startswith(f"ubq-{tag}-")
    ]
    shard_dead = {
        sid: load_deletes(index_dir, sid) for sid in info.manifest.shards
    }
    futs = [
        _ubq_partition_task.remote(
            {
                "path": p.path,
                "row_group_start": p.row_group_start,
                "row_group_end": p.row_group_end,
                "row_start": p.row_start,
                "row_end": p.row_end,
                "doc_base": p.doc_base,
            },
            query,
            transform,
            str(corpus_dir / f"ubq-{tag}-{p.partition_id:05d}.parquet"),
            read_columns,
            shard_dead.get(p.shard_id, np.empty(0, np.int64)),
        )
        for p in parts
    ]
    got = [g for g in ray.get(futs) if len(g)]
    victims = (
        np.sort(np.concatenate(got)) if got else np.empty(0, np.int64)
    )
    build_index(str(corpus_dir), index_dir, config)
    if len(victims):
        delete_docs(index_dir, victims)
    return {
        "updated": int(len(victims)),
        "version_conflicts": 0,
        "batches": int(sum(1 for g in got if len(g))),
    }
