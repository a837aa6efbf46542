"""Index-selection and routing operators — the reference's
``elasticsearch_index_selector`` + ``elasticsearch_bulk`` semantics as
columnar Ray Data stages.

The reference doubles each record array into an interleaved bulk list
(``[actionMeta, record, ...]``, ``/root/reference/asset/elasticsearch_index_selector/index.js:60-138``);
columnar processing carries the same information as routing COLUMNS
(``target_index``, ``action``, ``_id``) with no row doubling, and the
"send" becomes a partitioned parquet write keyed by those columns.

Timeseries index naming (``index.js:7-36``): daily/monthly/yearly slice
the ISO date to 10/7/4 chars with ``-`` → ``.``; weekly is
``floor(epoch_ms / 604800000)`` weeks since the epoch.

Multisend routing (``asset/elasticsearch_bulk/index.js:98-152``): the
FIRST character of ``_id`` selects the destination cluster through a
``connection_map``; ``multisend_index_append`` suffixes the index name
with that character.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

GRANULARITIES = ("daily", "monthly", "yearly", "weekly")
_STRFTIME = {"daily": "%Y.%m.%d", "monthly": "%Y.%m", "yearly": "%Y"}
WEEK_MS = 604_800_000  # index.js:7-9


def timeseries_index_name(ts: pa.Array | pa.ChunkedArray, prefix: str,
                          granularity: str) -> pa.Array:
    """Vectorized index-name derivation from a timestamp column."""
    if granularity not in GRANULARITIES:
        raise ValueError(f"granularity must be one of {GRANULARITIES}")
    if granularity == "weekly":
        from . import epoch_ms

        weeks = pa.array(epoch_ms(ts) // WEEK_MS, pa.int64())
        return pc.binary_join_element_wise(
            pa.scalar(prefix + "-"), pc.cast(weeks, pa.string()), ""
        )
    name = pc.strftime(ts, format=_STRFTIME[granularity])
    return pc.binary_join_element_wise(pa.scalar(prefix + "-"), name, "")


@dataclass(frozen=True)
class IndexSelectorConfig:
    """Mirror of the reference op's config surface
    (``asset/elasticsearch_index_selector/index.js:141-289``) for the
    columnar equivalent; validated eagerly like its crossValidation.

    Update/upsert body semantics (``index.js:92-128``):

    * ``upsert`` action → ``upsert_doc`` = the whole record (inserted
      when the key is absent);
    * non-empty ``update_fields`` → ``update_doc`` = projection of those
      fields (in the configured order);
    * else a ``script`` / ``script_file`` → ``script`` body with
      ``params`` = ``{key: record[field]}`` for each configured
      ``(key, field)``, skipping falsy record values (the reference's
      ``if (record[field])`` guard);
    * else → ``update_doc`` = the whole record (full-document merge).
    """

    index: str
    action: str = "index"  # index | create | update | upsert | delete
    date_field: str | None = None
    timeseries: str | None = None  # daily | monthly | yearly | weekly
    id_field: str | None = None
    update_fields: tuple[str, ...] = field(default_factory=tuple)
    script: str | None = None
    script_file: str | None = None
    script_params: tuple[tuple[str, str], ...] = field(default_factory=tuple)
    update_retry_on_conflict: int = 0

    def __post_init__(self) -> None:
        if self.action not in ("index", "create", "update", "upsert", "delete"):
            raise ValueError(f"unknown action {self.action!r}")
        if self.timeseries is not None:
            if self.timeseries not in GRANULARITIES:
                raise ValueError(f"unknown timeseries {self.timeseries!r}")
            if self.date_field is None:
                # index.js:275-282 crossValidation
                raise ValueError("timeseries requires date_field")
        if self.update_fields and self.action not in ("update", "upsert"):
            raise ValueError("update_fields requires update/upsert action")
        if (self.script or self.script_file or self.script_params) and (
            self.action not in ("update", "upsert")
        ):
            raise ValueError("script options require update/upsert action")
        if self.script and self.script_file:
            raise ValueError("script and script_file are mutually exclusive")


def _json_compact(obj) -> str:
    import json

    return json.dumps(obj, separators=(",", ":"), ensure_ascii=False)


class IndexSelector:
    """map_batches stage appending ``target_index``, ``action`` and
    (optionally) ``_id`` routing columns, plus — for update/upsert
    actions — the JSON body columns ``update_doc`` / ``upsert_doc`` /
    ``script`` (the columnar equivalent of the reference's interleaved
    ``[{update: meta}, {doc|upsert|script}]`` bulk rows,
    ``index.js:92-131``) and ``retry_on_conflict`` when configured."""

    def __init__(self, config: IndexSelectorConfig):
        self.cfg = config

    def _bodies(self, batch: pa.Table) -> dict[str, pa.Array]:
        cfg = self.cfg
        records = batch.to_pylist()
        out: dict[str, pa.Array] = {}
        if cfg.action == "upsert":
            out["upsert_doc"] = pa.array(
                [_json_compact(r) for r in records], pa.string()
            )
        if cfg.update_fields:
            out["update_doc"] = pa.array(
                [
                    _json_compact({f: r.get(f) for f in cfg.update_fields})
                    for r in records
                ],
                pa.string(),
            )
        elif cfg.script or cfg.script_file:
            key = "source" if cfg.script else "file"
            src = cfg.script or cfg.script_file
            scripts = []
            for r in records:
                params = {
                    k: r[f]
                    for k, f in cfg.script_params
                    if r.get(f)  # reference skips falsy values
                }
                scripts.append(_json_compact({key: src, "params": params}))
            out["script"] = pa.array(scripts, pa.string())
        else:
            out["update_doc"] = pa.array(
                [_json_compact(r) for r in records], pa.string()
            )
        if cfg.update_retry_on_conflict > 0:
            out["retry_on_conflict"] = pa.array(
                [cfg.update_retry_on_conflict] * batch.num_rows, pa.int32()
            )
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if self.cfg.timeseries:
            idx = timeseries_index_name(
                batch.column(self.cfg.date_field), self.cfg.index, self.cfg.timeseries
            )
        else:
            idx = pa.array([self.cfg.index] * n, pa.string())
        bodies = (
            self._bodies(batch) if self.cfg.action in ("update", "upsert") else {}
        )
        batch = batch.append_column("target_index", idx)
        batch = batch.append_column(
            "action", pa.array([self.cfg.action] * n, pa.string())
        )
        if self.cfg.id_field is not None:
            batch = batch.append_column(
                "_id", pc.cast(batch.column(self.cfg.id_field), pa.string())
            )
        for name, arr in bodies.items():
            batch = batch.append_column(name, arr)
        return batch


def parse_connection_map(connection_map: dict[str, str]) -> dict[str, str]:
    """Expand ``{"a,b": "es1", "*": "es2"}`` to a char→connection map
    (``asset/elasticsearch_bulk/index.js:26-43``)."""
    out: dict[str, str] = {}
    for chars, conn in connection_map.items():
        if chars == "*":
            out["*"] = conn
            continue
        for ch in chars.split(","):
            ch = ch.strip()
            if len(ch) != 1:
                raise ValueError(f"connection_map selector {ch!r} must be 1 char")
            if ch in out:
                raise ValueError(f"duplicate selector {ch!r}")
            out[ch] = conn
    return out


def route_batch(batch: pa.Table, connection_map: dict[str, str],
                id_col: str = "_id", index_append: bool = False) -> pa.Table:
    """Append ``connection`` (and optionally suffix ``target_index``) from
    the first character of the id column — the multisend router."""
    charmap = parse_connection_map(connection_map)
    fallback = charmap.get("*")
    ids = batch.column(id_col).to_pylist()
    conns = []
    for i in ids:
        ch = i[0] if i else ""
        conn = charmap.get(ch, fallback)
        if conn is None:
            raise KeyError(f"no connection for id selector {ch!r}")
        conns.append(conn)
    batch = batch.append_column("connection", pa.array(conns, pa.string()))
    if index_append:
        suffixed = [
            f"{idx}-{i[0]}" if i else idx
            for idx, i in zip(batch.column("target_index").to_pylist(), ids)
        ]
        batch = batch.set_column(
            batch.column_names.index("target_index"),
            "target_index",
            pa.array(suffixed, pa.string()),
        )
    return batch


def sha_route_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Derive the routing id from content: first hex char of sha256(text)
    (deterministic id generation for corpora without natural keys; the
    generator's ``id_start_key`` analogue)."""
    from ..index.build import sha_nbytes_arrow

    shas, _ = sha_nbytes_arrow(batch.column(text_col))
    return batch.append_column(
        "_id", pa.array([h[0] for h in shas], pa.string())
    )


def multisend_write(ds, out_dir: str, connection_map: dict[str, str],
                    index_append: bool = False):
    """The bulk sink: route every row to its connection, then write
    parquet partitioned by (connection, target_index) — resumable output,
    one directory per destination, never one giant file."""
    routed = ds.map_batches(
        lambda b: route_batch(b, connection_map, index_append=index_append),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    routed.write_parquet(out_dir, partition_cols=["connection", "target_index"])
    return out_dir
