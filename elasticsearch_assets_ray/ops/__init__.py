"""Reusable Ray Data operator stages (dedup, similarity, text stats,
routing) and small Dataset utilities."""

from __future__ import annotations

import pyarrow as pa

import ray


def to_arrow(ds) -> pa.Table:
    """Materialize a (small, post-aggregation) Dataset as one Arrow table.

    Zero-copy from the object store (``to_arrow_refs``); only for results
    that are driver-sized by construction — never the raw corpus.
    """
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows > 0]
    if not tables:
        return pa.Table.from_batches([], schema=ds.schema().base_schema)
    return pa.concat_tables(tables).combine_chunks()
