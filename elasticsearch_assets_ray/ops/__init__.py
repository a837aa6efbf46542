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
    tables = list(ray.get(ds.to_arrow_refs()))
    if not tables:
        return pa.table({})
    non_empty = [t for t in tables if t.num_rows > 0]
    if not non_empty:
        return tables[0]
    return pa.concat_tables(non_empty).combine_chunks()
