"""Reusable Ray Data operator stages (dedup, similarity, text stats,
routing) and small Dataset utilities."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

_UNIT_TO_US = {"s": 1_000_000, "ms": 1_000, "us": 1}


def epoch_us(ts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Epoch microseconds from a timestamp column of ANY storage unit.

    ``cast(ts, int64)`` alone is unit-dependent (a ms- or ns-unit parquet
    column would silently shift every derived window/index name by 10^3);
    this derives the scale from the column's own unit."""
    t = ts.type
    if not pa.types.is_timestamp(t):
        raise TypeError(f"expected a timestamp column, got {t}")
    v = pc.cast(ts, pa.int64())
    if isinstance(v, pa.ChunkedArray):
        v = v.combine_chunks()
    v = v.to_numpy(zero_copy_only=False)
    if t.unit == "ns":
        return v // 1_000
    return v * _UNIT_TO_US[t.unit]


def epoch_ms(ts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Epoch milliseconds (floor) from a timestamp column of any unit."""
    return epoch_us(ts) // 1_000


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
