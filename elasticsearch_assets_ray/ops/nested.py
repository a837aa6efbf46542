"""ES *nested* documents over Ray Data — array-of-objects columns as
first-class ``list<struct>`` Arrow data.

ES's ``nested`` mapping stores an array of objects so that a query can
require several conditions to hold inside the SAME element — the
nested-vs-flattened-object distinction (a flattened ``object`` field
would match a parent whose conditions are satisfied by DIFFERENT
elements).  The reference's data model is schema-free JSON docs
(``/root/reference/asset/elasticsearch_reader/reader.js:14-28``), so
arrays of objects are a routine payload; here they are typed columns.

Pieces:

- :func:`nest_events` — build the nested dataset from the flat events
  table: one parent row per ``user_id`` whose ``events`` column is a
  ``list<struct{event_id, ts, event_type, value_u}>`` of that user's
  events in (ts, event_id) order.  ONE fixed-bucket exchange (the
  ``ops/eql.py`` custom-operator recipe: a user's rows land in exactly
  one bucket, so each group builds its parents independently) — no
  per-key groupby, no driver state.  ``value`` is carried as integer
  MICRO-units (the repo's float-safety invariant: the column is
  decimal-gridded, so ``round(value * 1e6)`` is exact on both the
  Arrow and SQL sides).
- :func:`nested_match` — the ``nested`` query in filter context:
  parents with ≥1 element satisfying ALL conditions within the same
  element.  Pure streaming ``map_batches`` (Arrow ``list_flatten`` /
  ``list_parent_indices`` + compute kernels; no shuffle).
- :func:`nested_stats` — ``nested`` agg + stats sub-agg per parent:
  count and micro-unit sum over the MATCHING elements of each parent.
  Streaming; one output row per parent with ≥1 match.
- :func:`reverse_nested_counts` — nested ``terms`` buckets +
  ``reverse_nested``: per element key, the number of PARENT docs with
  ≥1 matching element carrying that key.  Per-batch (key, parent)
  dedup is exact because each parent is exactly one row of the nested
  dataset; partials then fold in one tiny key-cardinality groupby.

Scale shape: the build is one n_buckets exchange (work ∝ data, buckets
sized to the cluster); queries/aggs never shuffle — they stream over
the nested blocks with vectorized kernels, and only key-cardinality
partials cross the wire.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import epoch_us

N_BUCKETS = 64

# condition ops → Arrow compute kernels (per-element, vectorized)
_OPS = {
    "==": pc.equal,
    "!=": pc.not_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
    "<": pc.less,
    "<=": pc.less_equal,
}


def nest_events(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
    n_buckets: int = N_BUCKETS,
):
    """Flat events → nested parents: ``Dataset(user_id, n_events,
    events: list<struct{event_id, ts, event_type, value_u}>)``.
    Elements are in (ts, event_id) order within each parent; parents
    are unique across the dataset (a key's rows land in one bucket)."""

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy().astype(np.int64)
        vu = np.round(
            batch.column(value_col).to_numpy().astype(np.float64) * 1e6
        ).astype(np.int64)
        return pa.table({
            "key": pa.array(keys, pa.int64()),
            "bucket": pa.array((keys % n_buckets).astype(np.int32)),
            "ts": pa.array(epoch_us(batch.column(ts_col)), pa.int64()),
            "id": pa.array(
                batch.column(id_col).to_numpy().astype(np.int64)),
            "etype": batch.column(type_col),
            "value_u": pa.array(vu, pa.int64()),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        key = g.column("key").to_numpy()
        ts = g.column("ts").to_numpy()
        ids = g.column("id").to_numpy()
        order = np.lexsort((ids, ts, key))
        key = key[order]
        if len(key) == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "events": pa.array([], pa.large_list(pa.struct([
                    ("event_id", pa.int64()), ("ts", pa.int64()),
                    ("event_type", pa.string()),
                    ("value_u", pa.int64()),
                ]))),
            })
        elems = pa.StructArray.from_arrays(
            [
                pa.array(ids[order], pa.int64()),
                pa.array(ts[order], pa.int64()),
                g.column("etype").combine_chunks().take(
                    pa.array(order, pa.int64())),
                g.column("value_u").take(pa.array(order, pa.int64()))
                .combine_chunks(),
            ],
            names=["event_id", "ts", "event_type", "value_u"],
        )
        heads = np.concatenate([[0], np.nonzero(key[1:] != key[:-1])[0] + 1])
        offsets = np.concatenate([heads, [len(key)]]).astype(np.int64)
        lists = pa.LargeListArray.from_arrays(pa.array(offsets), elems)
        return pa.table({
            "user_id": pa.array(key[heads], pa.int64()),
            "n_events": pa.array(np.diff(offsets), pa.int64()),
            "events": lists,
        })

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow",
                    zero_copy_batch=True)
    )


def _element_mask(col, conds: list[tuple]) -> tuple:
    """(flat elements mask, parent row indices) for one batch's nested
    column under the per-element conjunction ``conds`` =
    ``[(field, op, value), ...]``."""
    flat = pc.list_flatten(col)
    parents = pc.list_parent_indices(col).to_numpy()
    if not conds:
        return np.ones(len(flat), dtype=bool), parents
    mask = None
    for field, op, value in conds:
        vals = pc.struct_field(flat, field)
        m = _OPS[op](vals, value)
        mask = m if mask is None else pc.and_(mask, m)
    return mask.to_numpy(zero_copy_only=False), parents


def nested_match(nds, conds: list[tuple], events_col: str = "events"):
    """ES ``nested`` query (filter context): parent rows with ≥1
    element satisfying ALL of ``conds`` within the SAME element.
    Streaming — one vectorized flatten + kernel pass per batch."""

    def fn(batch: pa.Table) -> pa.Table:
        mask, parents = _element_mask(batch.column(events_col), conds)
        hit = np.unique(parents[mask])
        out = batch.drop_columns([events_col])
        return out.take(pa.array(hit, pa.int64()))

    return nds.map_batches(fn, batch_format="pyarrow",
                           zero_copy_batch=True)


def nested_stats(
    nds,
    conds: list[tuple],
    value_field: str = "value_u",
    events_col: str = "events",
    key_col: str = "user_id",
):
    """ES ``nested`` agg + stats sub-agg: per parent, the count and
    integer-unit sum of ``value_field`` over its MATCHING elements —
    one row per parent with ≥1 match.  Streaming; sums are exact
    integer micro-units (order-independent, SQL-bit-safe)."""

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(events_col)
        mask, parents = _element_mask(col, conds)
        vals = pc.struct_field(pc.list_flatten(col), value_field)
        v = vals.to_numpy(zero_copy_only=False).astype(np.int64)
        p, v = parents[mask], v[mask]
        n = batch.num_rows
        cnt = np.bincount(p, minlength=n).astype(np.int64)
        sm = np.bincount(p, weights=v.astype(np.float64), minlength=n)
        # bincount weights go through float64 — exact only under 2^53;
        # redo the sum in int64 via add.at to keep the integer-unit
        # invariant airtight at scale
        sm_i = np.zeros(n, dtype=np.int64)
        np.add.at(sm_i, p, v)
        keep = cnt > 0
        del sm
        return pa.table({
            key_col: batch.column(key_col).take(
                pa.array(np.nonzero(keep)[0], pa.int64())),
            "n_matching": pa.array(cnt[keep], pa.int64()),
            "sum_value_u": pa.array(sm_i[keep], pa.int64()),
        })

    return nds.map_batches(fn, batch_format="pyarrow",
                           zero_copy_batch=True)


def reverse_nested_counts(
    nds,
    key_field: str = "event_type",
    conds: list[tuple] | None = None,
    events_col: str = "events",
):
    """Nested ``terms`` buckets + ``reverse_nested``: per distinct
    element ``key_field`` value, the number of PARENT docs having ≥1
    matching element with that value.  Per-batch (key, parent) pairs
    dedup locally (parents are unique rows, so local dedup is globally
    exact); key-cardinality partials fold in one small groupby."""

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(events_col)
        mask, parents = _element_mask(col, conds or [])
        keys = pc.struct_field(pc.list_flatten(col), key_field)
        d = pc.dictionary_encode(keys)
        d = d.combine_chunks() if isinstance(d, pa.ChunkedArray) else d
        kidx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dico = d.dictionary
        comp = parents[mask] * np.int64(len(dico)) + kidx[mask]
        uniq = np.unique(comp)
        ki = uniq % len(dico)
        per_key = np.bincount(ki, minlength=len(dico)).astype(np.int64)
        nz = np.nonzero(per_key)[0]
        return pa.table({
            "key": dico.take(pa.array(nz, pa.int64())),
            "doc_count": pa.array(per_key[nz], pa.int64()),
        })

    from ray.data.aggregate import Sum

    part = nds.map_batches(fn, batch_format="pyarrow",
                           zero_copy_batch=True)
    return part.groupby("key").aggregate(
        Sum("doc_count", alias_name="doc_count"))


def flattened_not_nested(
    nds, conds: list[tuple], events_col: str = "events"
):
    """The nested-vs-flattened-object distinction made concrete: parent
    rows where EVERY condition holds in SOME element (what ES's
    flattened ``object`` mapping would match) but NO single element
    satisfies all of them (so the ``nested`` query does NOT match).
    Streaming — one flatten, one kernel pass per condition."""

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(events_col)
        flat = pc.list_flatten(col)
        parents = pc.list_parent_indices(col).to_numpy()
        n = batch.num_rows
        flattened_ok = np.ones(n, dtype=bool)
        nested_mask = np.ones(len(flat), dtype=bool)
        for field, op, value in conds:
            m = _OPS[op](pc.struct_field(flat, field), value)
            m = m.to_numpy(zero_copy_only=False)
            flattened_ok &= np.bincount(parents[m], minlength=n) > 0
            nested_mask &= m
        nested_ok = np.bincount(parents[nested_mask], minlength=n) > 0
        keep = np.nonzero(flattened_ok & ~nested_ok)[0]
        out = batch.drop_columns([events_col])
        return out.take(pa.array(keep, pa.int64()))

    return nds.map_batches(fn, batch_format="pyarrow",
                           zero_copy_batch=True)
