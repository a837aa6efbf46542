"""Filtered/projected Parquet reads — the reference reader's query
surface (date range + lucene query + fields projection) on Ray Data.

Mirrors ``buildQuery``
(``/root/reference/asset/elasticsearch_reader/reader.js:9-30``): a slice
fetch issues ``index, range: ts >= start AND ts < end, query, _source:
fields`` — here every piece becomes scan pushdown into
``ray.data.read_parquet``: the range and compiled query prune row groups
via Parquet statistics, ``columns=`` prunes columns at the reader.

Date inputs accept ISO-8601 strings, epoch milliseconds, and
``datetime`` objects (the reference's M6 normalization,
``asset/utils.js:6-54``).
"""

from __future__ import annotations

import datetime as dt

import pyarrow.compute as pc

import ray.data as rd

from .query import compile_query


def parse_date(v) -> dt.datetime:
    """ISO string / epoch-ms int / datetime → naive UTC datetime."""
    if isinstance(v, dt.datetime):
        return v
    if isinstance(v, (int, float)):
        return dt.datetime.utcfromtimestamp(v / 1000.0)
    if isinstance(v, str):
        s = v.replace("Z", "+00:00")
        d = dt.datetime.fromisoformat(s)
        if d.tzinfo is not None:
            d = d.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return d
    raise TypeError(f"cannot parse date from {v!r}")


def read_filtered(
    path: str,
    *,
    start=None,
    end=None,
    date_field: str = "ts",
    query: str | None = None,
    fields: list[str] | None = None,
    full_response: bool = False,
    index_name: str | None = None,
    id_field: str | None = None,
    **read_kwargs,
):
    """``read_parquet`` with the reference reader's filter surface.

    ``start`` is inclusive, ``end`` exclusive (``reader.js:9-13``:
    ``gte/lt``).  ``fields`` projects columns at the scan.  Returns a
    streaming :class:`ray.data.Dataset`.

    ``full_response`` mirrors the reference's raw-envelope mode
    (``reader.js:7,13-14``: the whole hit with ``_index``/``_type``/
    ``_version``/``_id`` instead of bare ``_source``): the hit metadata
    arrives as extra columns — ``_index`` (``index_name`` or the source
    path), ``_type`` (``"_doc"``), ``_version`` (1), and ``_id`` from
    ``id_field`` when given.
    """
    expr = None
    if start is not None:
        expr = pc.field(date_field) >= parse_date(start)
    if end is not None:
        e = pc.field(date_field) < parse_date(end)
        expr = e if expr is None else expr & e
    if query:
        q = compile_query(query)
        expr = q if expr is None else expr & q
    kwargs = dict(read_kwargs)
    if expr is not None:
        kwargs["filter"] = expr
    if fields is not None:
        kwargs["columns"] = list(fields)
        if full_response and id_field and id_field not in kwargs["columns"]:
            kwargs["columns"] = kwargs["columns"] + [id_field]
    ds = rd.read_parquet(path, **kwargs)
    if not full_response:
        return ds
    idx = index_name or str(path)

    def envelope(batch):
        import pyarrow as pa

        n = batch.num_rows
        batch = batch.append_column("_index", pa.array([idx] * n, pa.string()))
        batch = batch.append_column("_type", pa.array(["_doc"] * n, pa.string()))
        batch = batch.append_column("_version", pa.array([1] * n, pa.int64()))
        if id_field is not None:
            batch = batch.append_column(
                "_id", pc.cast(batch.column(id_field), pa.string())
            )
        return batch

    return ds.map_batches(envelope, batch_format="pyarrow", zero_copy_batch=True)
