"""ES ingest pipelines — the ``_ingest`` processor chain, rebuilt as
vectorized Arrow batch transforms.

The reference's job model is reader → transform → sink (its
``elasticsearch_index_selector`` is itself one such processor:
``/root/reference/asset/elasticsearch_index_selector/index.js`` rewrites
every record into an action+payload pair); ES hosts the generic version
as ingest pipelines.  Here a pipeline is a list of ES-shaped processor
specs compiled ONCE into a chain of ``pa.Table → pa.Table`` kernels, so
``ds.map_batches(pipeline, batch_format="pyarrow")`` streams it with
zero per-row Python — the processor registry below covers the
documented core (set/remove/rename/convert/case/trim/gsub/split/join/
append/date/script/json/dissect/drop) plus per-processor ``if``
conditions (a Lucene filter expression over the batch, applied as a
vectorized if_else merge).

Divergences (disclosed): ``script`` is the repo's ScriptExpr numeric
subset, not painless; ``if`` conditions are Lucene filter syntax
(``sources.query``), not painless; ``date`` parses ISO-8601 via Arrow's
strptime.  ``on_failure`` handlers are not modeled — a processor error
raises (fail-fast, the reference's own bulk-retry philosophy).
"""

from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pds

from ..sources.query import compile_query


def _col_idx(t: pa.Table, name: str) -> int:
    i = t.column_names.index(name) if name in t.column_names else -1
    if i < 0:
        raise KeyError(f"ingest: field {name!r} not in batch")
    return i


def _set_or_append(t: pa.Table, name: str, arr) -> pa.Table:
    if name in t.column_names:
        return t.set_column(t.column_names.index(name), name, arr)
    return t.append_column(name, arr)


_CONVERTERS = {
    "integer": pa.int64(),
    "long": pa.int64(),
    "double": pa.float64(),
    "float": pa.float64(),
    "string": pa.string(),
    "boolean": pa.bool_(),
}


def _compile_one(kind: str, p: dict):
    """One ES processor spec → a ``pa.Table → pa.Table`` kernel."""
    f = p.get("field")
    tgt = p.get("target_field", f)
    if kind == "set":
        if "copy_from" in p:
            src = p["copy_from"]
            return lambda t: _set_or_append(t, f, t.column(src))
        val = p["value"]
        return lambda t: _set_or_append(
            t, f, pa.array([val] * t.num_rows)
        )
    if kind == "remove":
        fields = f if isinstance(f, list) else [f]
        return lambda t: t.drop_columns(
            [c for c in fields if c in t.column_names]
        )
    if kind == "rename":
        return lambda t: t.set_column(
            _col_idx(t, f), tgt, t.column(f)
        )
    if kind == "convert":
        ty = _CONVERTERS[p["type"]]
        return lambda t: _set_or_append(
            t, tgt, pc.cast(t.column(f), ty)
        )
    if kind == "lowercase":
        return lambda t: _set_or_append(t, tgt, pc.utf8_lower(t.column(f)))
    if kind == "uppercase":
        return lambda t: _set_or_append(t, tgt, pc.utf8_upper(t.column(f)))
    if kind == "trim":
        return lambda t: _set_or_append(
            t, tgt, pc.utf8_trim_whitespace(t.column(f))
        )
    if kind == "gsub":
        pat, rep = p["pattern"], p["replacement"]
        return lambda t: _set_or_append(
            t, tgt,
            pc.replace_substring_regex(t.column(f), pat, rep),
        )
    if kind == "split":
        sep = p["separator"]
        return lambda t: _set_or_append(
            t, tgt, pc.split_pattern_regex(t.column(f), sep)
        )
    if kind == "join":
        sep = p["separator"]
        return lambda t: _set_or_append(
            t, tgt, pc.binary_join(t.column(f), sep)
        )
    if kind == "append":
        val = p["value"]
        def _append(t: pa.Table) -> pa.Table:
            col = t.column(f)
            if not pa.types.is_list(col.type) and not pa.types.is_large_list(col.type):
                raise TypeError(f"append: {f!r} is not a list column")
            extra = pa.array([[val]] * t.num_rows, type=col.type)
            return _set_or_append(t, tgt, _list_concat(col, extra))
        return _append
    if kind == "date":
        fmt = p.get("format", "%Y-%m-%dT%H:%M:%S")
        unit = p.get("unit", "us")
        return lambda t: _set_or_append(
            t, tgt, pc.strptime(t.column(f), format=fmt, unit=unit)
        )
    if kind == "script":
        from ..search.funcscore import ScriptExpr

        expr = ScriptExpr(p["source"])
        out = p.get("target_field") or "script_value"
        def _script(t: pa.Table) -> pa.Table:
            env = {
                name: t.column(name).to_numpy(zero_copy_only=False)
                .astype(np.float64)
                for name in expr.fields
            }
            env["_score"] = np.zeros(t.num_rows)
            return _set_or_append(t, out, pa.array(expr(env), pa.float64()))
        return _script
    if kind == "json":
        def _json(t: pa.Table) -> pa.Table:
            vals = [
                json.loads(v) if v is not None else None
                for v in t.column(f).to_pylist()
            ]
            return _set_or_append(t, tgt, pa.array(vals))
        return _json
    if kind == "dissect":
        # "%{a} - %{b}" → named-group regex (non-greedy fields)
        pattern = p["pattern"]
        parts = re.split(r"%\{(\w+)\}", pattern)
        rx = ""
        names = []
        for i, seg in enumerate(parts):
            if i % 2 == 0:
                rx += re.escape(seg)
            else:
                names.append(seg)
                rx += f"(?P<{seg}>.*?)" if i < len(parts) - 2 else f"(?P<{seg}>.*)"
        return lambda t: _dissect(t, f, rx, names)
    if kind == "drop":
        cond = p["if"]
        expr = compile_query(cond)
        def _drop(t: pa.Table) -> pa.Table:
            keep = pds.dataset(t).to_table(
                filter=~expr, columns=t.column_names
            )
            return keep
        return _drop
    raise ValueError(f"unknown ingest processor {kind!r}")


def _list_concat(a, b):
    """Elementwise list concat (append processor): one lexsort over
    (row, intra-row sequence) interleaves both value buffers — fully
    vectorized, values move once."""
    a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    b = b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b
    av, bv = a.flatten(), b.flatten()
    ao = np.asarray(a.offsets, dtype=np.int64)
    bo = np.asarray(b.offsets, dtype=np.int64)
    alen, blen = np.diff(ao), np.diff(bo)
    row_a = np.repeat(np.arange(len(alen), dtype=np.int64), alen)
    row_b = np.repeat(np.arange(len(blen), dtype=np.int64), blen)
    seq_a = np.arange(len(av), dtype=np.int64) - np.repeat(ao[:-1], alen)
    seq_b = (np.arange(len(bv), dtype=np.int64) - np.repeat(bo[:-1], blen)
             + np.repeat(alen, blen))
    row = np.concatenate([row_a, row_b])
    seq = np.concatenate([seq_a, seq_b])
    take = np.lexsort((seq, row))
    allv = pa.concat_arrays([av, bv])
    out_off = np.concatenate(([0], np.cumsum(alen + blen)))
    return pa.ListArray.from_arrays(pa.array(out_off, pa.int32()),
                                    allv.take(pa.array(take)))


def _dissect(t: pa.Table, field: str, rx: str, names: list[str]) -> pa.Table:
    ex = pc.extract_regex(t.column(field), rx)
    for name in names:
        t = _set_or_append(t, name, pc.struct_field(ex, name))
    return t


class IngestPipeline:
    """ES-shaped pipeline: ``[{"set": {...}}, {"gsub": {...}}, ...]``.
    Compiled once; callable over Arrow batches (pass directly to
    ``Dataset.map_batches``).  ``simulate`` mirrors the
    ``_ingest/pipeline/_simulate`` API."""

    def __init__(self, processors: list[dict]):
        self.steps = []
        for spec in processors:
            (kind, params), = spec.items()
            kernel = _compile_one(kind, params)
            cond = params.get("if") if kind != "drop" else None
            self.steps.append((kind, kernel, cond))

    def __call__(self, batch: pa.Table) -> pa.Table:
        for kind, kernel, cond in self.steps:
            if cond is None:
                batch = kernel(batch)
                continue
            # conditional processor: run on matching rows, merge back
            # (vectorized if_else per touched column)
            expr = compile_query(cond)
            idx = batch.append_column(
                "__row", pa.array(np.arange(batch.num_rows, dtype=np.int64))
            )
            hit = pds.dataset(idx).to_table(filter=expr)
            if hit.num_rows == 0:
                continue
            rows = hit.column("__row").to_numpy()
            changed = kernel(hit.drop_columns(["__row"]))
            for name in changed.column_names:
                old = (batch.column(name)
                       if name in batch.column_names else None)
                scattered = _scatter(old, rows, changed.column(name),
                                     batch.num_rows)
                if old is not None:
                    batch = batch.set_column(
                        batch.column_names.index(name), name, scattered
                    )
                else:
                    batch = batch.append_column(name, scattered)
        return batch

    def simulate(self, docs: pa.Table) -> pa.Table:
        """The ``_simulate`` API: run the pipeline over sample docs."""
        return self(docs)


def _scatter(old, rows: np.ndarray, new_col, n: int):
    """Scatter ``new_col`` (len == len(rows)) into ``old`` (len n) at
    ``rows`` — untouched rows keep their value (or null when the column
    is new).  One concat + one take, no row loop."""
    new_col = (new_col.combine_chunks()
               if isinstance(new_col, pa.ChunkedArray) else new_col)
    if old is not None:
        old = (old.combine_chunks()
               if isinstance(old, pa.ChunkedArray) else old)
        if old.type != new_col.type:
            new_col = new_col.cast(old.type)
        base = old
    else:
        base = pa.array([None] * n, type=new_col.type)
    comb = pa.concat_arrays([base, new_col])
    take = np.arange(n, dtype=np.int64)
    take[rows] = n + np.arange(len(rows))
    return comb.take(pa.array(take))
