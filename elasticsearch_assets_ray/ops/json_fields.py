"""Dynamic JSON fields: extract typed columns out of a JSON-string
column — the schema-less side of the reference's data model
(``DataEntity._source`` is arbitrary JSON,
``/root/reference/asset/elasticsearch_reader/reader.js:14-28``; SURVEY
§1.3 maps rare dynamic fields to a JSON-encoded string column, and
this op is what turns such a field back into doc values — the ES
dynamic-mapping / runtime-field analogue).

Hot path stays vectorized: a RE2 ``extract_regex`` kernel pulls
scalar values for the overwhelmingly common flat shapes
(``{"k": 87, ...}``); only rows the regex can't decide (escaped
strings, nested objects, the key appearing inside another string)
fall back to exact ``json.loads`` — correctness is always
json-semantics, the regex is just the fast lane (fallback is
per-miss, not per-row)."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

# the fast lane only applies to rows that are provably a FLAT object of
# escape-free simple pairs — anything else (nested objects/arrays,
# escaped strings) takes the exact json.loads lane, so a nested "k"
# can never masquerade as a top-level one
_FLAT_RX = (
    r'^\{\s*(?:"[^"\\]*"\s*:\s*'
    r'(?:-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?|"[^"\\]*"|true|false|null)'
    r"\s*(?:,\s*)?)*\}$"
)


def extract_json_number(
    col: "pa.ChunkedArray | pa.Array", key: str
) -> pa.Array:
    """JSON-string column → int64/float64 array of ``key``'s numeric
    value (null where absent / non-numeric / null input)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # fast lane: key directly followed by a number literal
    pat = (
        '"' + key + '"\\s*:\\s*'
        "(?P<v>-?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?)(?P<after>\\s*[,}])"
    )
    flat = pc.match_substring_regex(col, _FLAT_RX)
    ex = pc.extract_regex(col, pat)
    vals = pc.struct_field(ex, "v")
    vals = pc.if_else(pc.fill_null(flat, False), vals,
                      pa.nulls(len(vals), vals.type))
    # exact lane: any non-null input row the fast lane didn't decide —
    # non-flat shapes (nested objects, escaped strings) AND flat rows
    # where the key is genuinely absent
    need = pc.and_(pc.is_valid(col), pc.is_null(vals))
    py_vals: dict[int, object] = {}
    if pc.any(need).as_py():
        idx = pc.indices_nonzero(need).to_pylist()
        for i in idx:
            try:
                obj = json.loads(col[i].as_py())
            except (TypeError, ValueError):
                continue
            v = obj.get(key) if isinstance(obj, dict) else None
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                continue
            py_vals[i] = v
    svals = vals.to_pylist()
    out = []
    is_float = False
    for i, s in enumerate(svals):
        if i in py_vals:
            v = py_vals[i]
        elif s is None:
            v = None
        else:
            v = float(s) if any(c in s for c in ".eE") else int(s)
        if isinstance(v, float):
            is_float = True
        out.append(v)
    return pa.array(
        out, pa.float64() if is_float else pa.int64()
    )


def extract_json_string(
    col: "pa.ChunkedArray | pa.Array", key: str
) -> pa.Array:
    """JSON-string column → string array of ``key``'s string value
    (null where absent / non-string); same fast-lane / exact-lane
    split — the fast lane only accepts escape-free string literals."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    pat = '"' + key + '"\\s*:\\s*"(?P<v>[^"\\\\]*)"(?P<after>\\s*[,}])'
    flat = pc.match_substring_regex(col, _FLAT_RX)
    ex = pc.extract_regex(col, pat)
    vals = pc.struct_field(ex, "v")
    vals = pc.if_else(pc.fill_null(flat, False), vals,
                      pa.nulls(len(vals), vals.type))
    need = pc.and_(pc.is_valid(col), pc.is_null(vals))
    py_vals: dict[int, object] = {}
    if pc.any(need).as_py():
        for i in pc.indices_nonzero(need).to_pylist():
            try:
                obj = json.loads(col[i].as_py())
            except (TypeError, ValueError):
                continue
            v = obj.get(key) if isinstance(obj, dict) else None
            if isinstance(v, str):
                py_vals[i] = v
    svals = vals.to_pylist()
    out = [py_vals.get(i, s) for i, s in enumerate(svals)]
    return pa.array(out, pa.string())


def add_json_field(ds, src_col: str, key: str, out_col: str,
                   kind: str = "number"):
    """Dataset stage: append ``out_col`` extracted from the JSON-string
    ``src_col`` — one vectorized ``map_batches`` pass, no shuffle."""
    fn = extract_json_number if kind == "number" else extract_json_string

    def stage(batch: pa.Table) -> pa.Table:
        return batch.append_column(out_col, fn(batch.column(src_col), key))

    return ds.map_batches(stage, batch_format="pyarrow",
                          zero_copy_batch=True)
