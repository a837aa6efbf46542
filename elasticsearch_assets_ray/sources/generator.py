"""Mock-data generator source — the reference's
``elasticsearch_data_generator`` (``/root/reference/asset/
elasticsearch_data_generator/index.js:9-96``) as a Ray Data source.

Chunk planning reproduces the reference slicer exactly:

* ``once`` mode counts a ``total`` down in chunks of the *downstream
  op's* batch size (``index.js:59-78`` — the sink's ``size``
  back-propagates into planning), terminating when exhausted;
* ``persistent`` mode yields constant ``chunk`` forever
  (``index.js:80-82``);
* one generator slicer regardless of requested parallelism
  (``index.js:84-96``).

Row synthesis is the deterministic ``make_gen_docs`` fixture (F4, seeded
per-chunk) — unlike the reference's unseeded mocker, identical runs
produce identical rows, which is what makes resume/replay testable.
``id_start_key`` forces the first id character (``default_schema.js:96-103``),
enabling the multisend routing demo.
"""

from __future__ import annotations

import hashlib
import json
import re
from collections.abc import Iterator
from pathlib import Path

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..corpus.synth import make_gen_docs

# ----------------------------------------------------- custom schema DSL
#
# The reference accepts a user schema via a ``json_schema`` file path
# (mocker-data-generator DSL, ``index.js:9-29``).  Our deterministic
# equivalent: a dict of ``field -> spec`` where spec is one of
#   {"type": "integer", "min": a, "max": b}
#   {"type": "choice", "values": [...]}
#   {"type": "const", "value": x}
#   {"type": "randexp", "pattern": "[0-9a-f]{8}"}   (char-class DSL)
#   {"type": "date_between", "start": iso, "end": iso}  (epoch-ms ISO)
#   {"type": "ip" | "ipv6" | "uuid"}
# loaded either from a dict or a JSON file path (the reference surface).

_CLASS_RE = re.compile(r"\[([^\]]+)\]\{(\d+)\}|\[([^\]]+)\]|(\\w)|(.)")


def _expand_class(spec: str) -> str:
    out = []
    i = 0
    while i < len(spec):
        if i + 2 < len(spec) and spec[i + 1] == "-":
            lo, hi = spec[i], spec[i + 2]
            out.extend(chr(c) for c in range(ord(lo), ord(hi) + 1))
            i += 3
        else:
            out.append(spec[i])
            i += 1
    return "".join(out)


def randexp_strings(pattern: str, n: int, rng: np.random.Generator) -> list[str]:
    """Deterministic mini-randexp: literal chars, ``[class]``,
    ``[class]{n}`` and ``\\w`` — the subset the reference's id patterns
    use (``default_schema.js:50-64``)."""
    parts: list[tuple[str, int]] = []  # (alphabet, count); literal = (c, 1)
    for m in _CLASS_RE.finditer(pattern):
        cls_n, cnt, cls_1, word, lit = m.groups()
        if cls_n is not None:
            parts.append((_expand_class(cls_n), int(cnt)))
        elif cls_1 is not None:
            parts.append((_expand_class(cls_1), 1))
        elif word is not None:
            parts.append(
                ("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_", 1)
            )
        else:
            parts.append((lit, 0))  # literal: count 0 marks verbatim
    out = []
    for _ in range(n):
        s = []
        for alpha, cnt in parts:
            if cnt == 0:
                s.append(alpha)
            else:
                idx = rng.integers(0, len(alpha), cnt)
                s.append("".join(alpha[j] for j in idx))
        out.append("".join(s))
    return out


def load_schema(schema: dict | str | Path) -> dict:
    """Accept a schema dict or a JSON file path (the reference's
    ``json_schema`` config surface)."""
    if isinstance(schema, (str, Path)):
        p = Path(schema)
        if not p.exists():
            raise FileNotFoundError(f"json_schema file not found: {schema}")
        schema = json.loads(p.read_text())
    if not isinstance(schema, dict) or not schema:
        raise ValueError("schema must be a non-empty dict of field -> spec")
    return schema


def make_docs_from_schema(
    schema: dict | str | Path,
    n_rows: int,
    seed: int = 42,
    id_start_key: str | None = None,
) -> pa.Table:
    """Generate ``n_rows`` docs from a user schema, deterministically.

    ``id_start_key`` forces the first character of the ``id`` field
    (``default_schema.js:96-103``) — requires an ``id`` field."""
    schema = load_schema(schema)
    if id_start_key and "id" not in schema:
        raise ValueError("id_start_key requires an 'id' field in the schema")
    rng = np.random.default_rng(seed)
    cols: dict[str, pa.Array] = {}
    for fname, spec in schema.items():
        t = spec.get("type")
        if t == "integer":
            cols[fname] = pa.array(
                rng.integers(spec["min"], spec["max"], n_rows), pa.int64()
            )
        elif t == "choice":
            vals = spec["values"]
            cols[fname] = pa.array(
                [vals[i] for i in rng.integers(0, len(vals), n_rows)]
            )
        elif t == "const":
            cols[fname] = pa.array([spec["value"]] * n_rows)
        elif t == "randexp":
            cols[fname] = pa.array(randexp_strings(spec["pattern"], n_rows, rng))
        elif t == "date_between":
            import datetime as dt

            def _utc_ms(v: str) -> float:
                d = dt.datetime.fromisoformat(v)
                if d.tzinfo is None:
                    # naive ISO = UTC, NOT process-local time — keeps
                    # generation deterministic across machines/TZ settings
                    d = d.replace(tzinfo=dt.timezone.utc)
                return d.timestamp() * 1000

            lo = _utc_ms(spec["start"])
            hi = _utc_ms(spec["end"])
            ms = rng.integers(int(lo), int(hi), n_rows)
            cols[fname] = pa.array(
                [
                    dt.datetime.fromtimestamp(m / 1000, dt.timezone.utc).strftime(
                        "%Y-%m-%dT%H:%M:%S.%f"
                    )[:-3] + "+00:00"
                    for m in ms
                ]
            )
        elif t == "ip":
            cols[fname] = pa.array(
                [".".join(str(x) for x in rng.integers(1, 255, 4)) for _ in range(n_rows)]
            )
        elif t == "ipv6":
            cols[fname] = pa.array(
                [":".join(f"{x:04x}" for x in rng.integers(0, 65536, 8)) for _ in range(n_rows)]
            )
        elif t == "uuid":
            cols[fname] = pa.array(
                [hashlib.md5(f"{seed}:{fname}:{i}".encode()).hexdigest() for i in range(n_rows)]
            )
        else:
            raise ValueError(f"unknown spec type {t!r} for field {fname!r}")
    if id_start_key:
        ids = cols["id"].to_pylist()
        cols["id"] = pa.array([id_start_key + s[1:] if s else id_start_key for s in ids])
    return pa.table(cols)


def once_slices(total: int, chunk: int) -> Iterator[int]:
    """Counts for ``once`` lifecycle: chunks of ``chunk`` summing to
    ``total`` (last one smaller); the reference emits null after — here
    the iterator just ends."""
    if total < 0 or chunk < 1:
        raise ValueError("need total >= 0, chunk >= 1")
    remaining = total
    while remaining > 0:
        n = min(chunk, remaining)
        yield n
        remaining -= n


def persistent_slices(chunk: int) -> Iterator[int]:
    """Constant-size chunks forever (persistent lifecycle)."""
    if chunk < 1:
        raise ValueError("chunk must be >= 1")
    while True:
        yield chunk


def read_generated(
    total: int,
    chunk: int = 500,
    seed: int = 42,
    id_start_key: str | None = None,
    stress_test: bool = False,
    schema: dict | str | Path | None = None,
):
    """Bounded generated Dataset: one block per planned chunk.

    ``stress_test`` repeats the first generated doc (the reference's
    write-perf mode, ``index.js:36-49``) — rows are identical, planning
    unchanged.  ``schema``: user schema dict or JSON file path (the
    reference's ``json_schema`` surface); None = the default mock doc.
    """
    if schema is not None:
        schema = load_schema(schema)  # validate once, on the driver

    def make(count: int, s: int) -> pa.Table:
        if schema is not None:
            return make_docs_from_schema(schema, count, seed=s,
                                         id_start_key=id_start_key)
        return make_gen_docs(count, seed=s, id_start_key=id_start_key)

    plan = [
        {"slice_id": i, "count": n, "offset": sum_}
        for i, (n, sum_) in enumerate(
            (n, s) for n, s in _with_offsets(once_slices(total, chunk))
        )
    ]

    def gen(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            tbl = make(row["count"], seed + row["slice_id"])
            if stress_test and tbl.num_rows:
                tbl = pa.concat_tables([tbl.slice(0, 1)] * tbl.num_rows)
            out.append(tbl)
        return pa.concat_tables(out) if out else make(0, seed)

    return rd.from_items(plan).map_batches(
        gen, batch_format="pyarrow", zero_copy_batch=True, batch_size=1
    )


def _with_offsets(counts):
    off = 0
    for n in counts:
        yield n, off
        off += n
