"""Point-in-time (PIT) snapshots + sliced scroll — the ES export
surface the reference is BUILT ON: its readers page an index out with
``scroll``/``search_after`` and fan out via *sliced* scroll
(``/root/reference/asset/elasticsearch_reader/elasticsearch_id_slicer``
splits the keyspace exactly so each worker can scroll its slice
independently; ``asset/elasticsearch_reader/reader.js`` pages with
``full_response`` envelopes).

Semantics implemented:

* ``PointInTime`` — pins the visible doc set AT OPEN: the partition
  list (appends after open are invisible) and the per-shard tombstone
  arrays (deletes after open stay visible).  An ``_update_by_query``
  (append + tombstone) is therefore invisible in both directions —
  exactly ES's PIT contract ("the search sees the index as it was").
  Divergence (disclosed): ES pins segment FILES; we pin manifest rows,
  so an in-place corpus-file rewrite (the modified-file rebuild path)
  invalidates open PITs.
* ``pit_export`` — the scale path: one Ray Data pipeline over the
  pinned partitions (``map_batches`` over partition descriptors; the
  pinned tombstones ride the object store via one ``ray.put``), each
  task a projected row-group read + compiled-filter + slice mask.  No
  shuffle; output order is deterministic (_doc order: partitions by
  doc_base, rows in position order) — ES scroll's default sort.
* ``scroll_pages`` — API-parity pager: ``batch_size`` rows per page in
  _doc order, resumable from an opaque cursor (= last doc_id seen,
  i.e. ``search_after`` on ``_doc``), one partition read at a time.
* Sliced scroll — ES slices on a field hash (default ``_id``); here
  ``slice_field`` (default the configured id column, else the internal
  doc id) with membership ``value % max == id``: slices are disjoint
  and their union is exactly the full scroll.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pds
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..sources.query import compile_query


class PointInTime:
    """A pinned snapshot of one index: partition lineage + tombstones
    captured at open.  Cheap (no data read) and immutable."""

    def __init__(self, index_dir: str | Path):
        from ..index.build import IndexInfo
        from ..index.deletes import load_deletes

        info = IndexInfo(index_dir)
        self.index_dir = str(index_dir)
        self.id_col = info.manifest.id_col
        self.parts = [
            {
                "partition_id": p.partition_id,
                "path": p.path,
                "row_group_start": p.row_group_start,
                "row_group_end": p.row_group_end,
                "row_start": p.row_start,
                "row_end": p.row_end,
                "doc_base": p.doc_base,
                "num_rows": p.num_rows,
            }
            for p in sorted(info.manifest.partitions, key=lambda p: p.doc_base)
        ]
        dead_parts = [
            load_deletes(index_dir, sid) for sid in info.manifest.shards
        ]
        dead_parts = [d for d in dead_parts if len(d)]
        self.dead = (
            np.sort(np.concatenate(dead_parts))
            if dead_parts else np.empty(0, np.int64)
        )
        h = hashlib.md5()
        for p in self.parts:
            h.update(f"{p['partition_id']}:{p['doc_base']}:{p['num_rows']};".encode())
        h.update(self.dead.tobytes())
        self.pit_id = h.hexdigest()[:16]

    def live_count(self) -> int:
        return sum(p["num_rows"] for p in self.parts) - len(self.dead)


def _read_partition_live(
    part: dict,
    dead: np.ndarray,
    query: str | None,
    columns,
    slice_id: int | None,
    slice_max: int | None,
    slice_field: str | None,
) -> pa.Table:
    """One pinned partition → its live, filtered, sliced rows with a
    ``_doc`` column (the internal doc id), in position order."""
    import re as _re

    pf = pq.ParquetFile(part["path"])
    read_cols = None
    if columns is not None:
        need = set(columns)
        if slice_field:
            need.add(slice_field)
        if query:  # fields a Lucene clause references (col-pruned read)
            need |= set(_re.findall(r"([A-Za-z_][\w.]*)\s*:", query))
        read_cols = [c for c in pf.schema_arrow.names if c in need]
    tbl = pf.read_row_groups(
        list(range(part["row_group_start"], part["row_group_end"])),
        columns=read_cols,
    )
    if part.get("row_start", -1) >= 0:
        tbl = tbl.slice(part["row_start"], part["row_end"] - part["row_start"])
    ids = part["doc_base"] + np.arange(tbl.num_rows, dtype=np.int64)
    keep = np.ones(tbl.num_rows, dtype=bool)
    if len(dead):
        pos = np.searchsorted(dead, ids)
        keep &= ~(
            (pos < len(dead)) & (dead[np.minimum(pos, len(dead) - 1)] == ids)
        )
    if slice_max is not None:
        sv = (
            tbl.column(slice_field).to_numpy().astype(np.int64)
            if slice_field else ids
        )
        keep &= (sv % slice_max) == slice_id
    tbl = tbl.append_column("_doc", pa.array(ids, pa.int64()))
    if query:
        idx = pa.table({
            **{c: tbl.column(c) for c in tbl.column_names},
            "__keep": pa.array(keep),
        })
        hit = pds.dataset(idx).to_table(
            filter=compile_query(query) & (pds.field("__keep") == True)  # noqa: E712
        )
        tbl = hit.drop_columns(["__keep"])
    elif not keep.all():
        tbl = tbl.filter(pa.array(keep))
    if columns is not None:
        tbl = tbl.select([c for c in columns if c in tbl.column_names]
                         + (["_doc"] if "_doc" not in columns else []))
    return tbl


def pit_export(
    pit: PointInTime,
    *,
    query: str | None = None,
    columns=None,
    slice_id: int | None = None,
    slice_max: int | None = None,
    slice_field: str | None = "__default__",
):
    """The scale path: a Ray Data Dataset of the PIT's live docs (one
    map task per pinned partition, pinned tombstones broadcast via ONE
    ``ray.put``), deterministic _doc order."""
    if (slice_id is None) != (slice_max is None):
        raise ValueError("slice_id and slice_max go together")
    if slice_field == "__default__":
        slice_field = pit.id_col
    dead_ref = ray.put(pit.dead)
    desc = pa.table({
        "j": pa.array(range(len(pit.parts)), pa.int64()),
    })
    parts = pit.parts

    def work(batch: pa.Table) -> pa.Table:
        dead = ray.get(dead_ref)
        outs = [
            _read_partition_live(
                parts[int(j)], dead, query, columns,
                slice_id, slice_max, slice_field,
            )
            for j in batch.column("j").to_pylist()
        ]
        keep = [o for o in outs if o.num_rows]
        if not keep:
            # zero-row table with the REAL schema (filter/slice never
            # change columns), so downstream concat stays uniform
            return outs[0].slice(0, 0)
        return pa.concat_tables(keep, promote_options="default")

    return rd.from_arrow(desc).map_batches(
        work, batch_format="pyarrow", batch_size=4, zero_copy_batch=True
    )


def scroll_pages(
    pit: PointInTime,
    *,
    query: str | None = None,
    columns=None,
    batch_size: int = 1000,
    slice_id: int | None = None,
    slice_max: int | None = None,
    slice_field: str | None = "__default__",
    after: int | None = None,
):
    """API-parity pager (ES ``scroll`` / ``search_after`` on ``_doc``):
    yields ``pa.Table`` pages of ≤ batch_size rows in _doc order.  The
    cursor is the last ``_doc`` of the previous page (pass as
    ``after`` to resume a dropped scroll)."""
    if slice_field == "__default__":
        slice_field = pit.id_col
    buf: list[pa.Table] = []
    buffered = 0
    cursor = -1 if after is None else after
    for part in pit.parts:
        if part["doc_base"] + part["num_rows"] <= cursor + 1:
            continue
        t = _read_partition_live(
            part, pit.dead, query, columns, slice_id, slice_max, slice_field
        )
        if cursor >= part["doc_base"]:
            ids = t.column("_doc").to_numpy()
            t = t.slice(int(np.searchsorted(ids, cursor, side="right")))
        if not t.num_rows:
            continue
        buf.append(t)
        buffered += t.num_rows
        while buffered >= batch_size:
            whole = pa.concat_tables(buf, promote_options="default")
            yield whole.slice(0, batch_size)
            whole = whole.slice(batch_size)
            buf, buffered = ([whole] if whole.num_rows else []), whole.num_rows
    if buffered:
        yield pa.concat_tables(buf, promote_options="default")
