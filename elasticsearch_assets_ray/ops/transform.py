"""ES *transforms* (the ``_transform`` API): ``pivot`` (a continuous
groupby materialized into a destination index) and ``latest`` (the
newest document per key), with CHECKPOINTED incremental runs — the ES
data-plane feature that turns an append-only event stream into a
maintained aggregate without recomputing history.

Reference scope: the reference asset suite moves raw docs between
indexes (``/root/reference/asset/elasticsearch_bulk``); ES itself owns
transforms.  Restated here Ray-Data-first:

- **Partials, not rows.**  A checkpoint aggregates ONLY the new input
  files into per-key associative partials ``(n, Σ, min, max)`` (or the
  per-key argmax row for ``latest``) and appends them as a new
  GENERATION of per-bucket parquet — work ∝ new data, the property a
  100 TB daily increment needs (the same generation-append contract as
  ``index/global_merge``).
- **Fixed-bucket placement.**  Keys route by FNV-1a hash mod
  ``n_buckets`` (the repo's bucketed-reduction pattern — never a
  per-key groupby); a bucket's generations merge independently, so
  ``render`` is ``n_buckets`` parallel tasks and a small concat.
- **Crash-idempotent checkpoints.**  A generation's tag is the md5 of
  its sorted new-file list; parquet lands via tmp+rename and the
  manifest (which records processed inputs) replaces LAST — a crashed
  checkpoint re-runs to byte-identical files and only then commits.
- **Exact floats.**  ``sum_e6`` aggregates ``rint(col·1e6)`` int64
  micro-units (decimal-gridded sources sum exactly, order-free);
  ``avg_e6`` is ONE exact-int IEEE division at render (the repo's
  float-safety invariant).  Raw-float ``sum`` is deliberately absent.

Agg fns: ``count``, ``sum_e6``, ``min``, ``max``, ``avg_e6``.
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

AGG_FNS = ("count", "sum_e6", "min", "max", "avg_e6")
_SEP = "\x1f"  # composite-key joiner (never in contract key values)


def _fnv1a64_str(vals) -> np.ndarray:
    from ..index.global_merge import _fnv1a64_vec

    return _fnv1a64_vec(pa.array(list(vals), pa.string()))


def _spec_fingerprint(kind: str, group_by, aggs, key=None, sort_on=None,
                      fields=None, n_buckets: int = 0) -> str:
    blob = json.dumps(
        {"kind": kind, "group_by": list(group_by or ()),
         "aggs": {k: list(v) for k, v in (aggs or {}).items()},
         "key": key, "sort_on": sort_on, "fields": list(fields or ()),
         "n_buckets": n_buckets},
        sort_keys=True,
    )
    return hashlib.md5(blob.encode()).hexdigest()


def _manifest_path(dest: str | Path) -> Path:
    return Path(dest) / "_transform.json"


def _load_manifest(dest: str | Path) -> dict | None:
    p = _manifest_path(dest)
    if not p.exists():
        return None
    with open(p) as f:
        return json.load(f)


def _commit_manifest(dest: str | Path, man: dict) -> None:
    p = _manifest_path(dest)
    tmp = p.with_suffix(".json.tmp")
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1, sort_keys=True)
    os.replace(tmp, p)


def _input_files(src) -> list[str]:
    if isinstance(src, (list, tuple)):
        return sorted(str(s) for s in src)
    p = Path(src)
    if p.is_dir():
        return sorted(str(f) for f in p.glob("*.parquet"))
    return [str(p)]


def _new_files(files: list[str], man: dict | None) -> list[str]:
    seen = (man or {}).get("inputs", {})
    out = []
    for f in files:
        st = os.stat(f)
        cur = [st.st_size, int(st.st_mtime_ns)]
        if f in seen:
            if seen[f] != cur:
                raise ValueError(
                    f"input {f} changed since its checkpoint — transforms "
                    "assume append-only sources; delete the dest to reset"
                )
            continue
        out.append(f)
    return out


def _columns_for(group_by, aggs) -> list[str]:
    cols = list(group_by)
    for col, _fn in aggs.values():
        if col is not None and col not in cols:
            cols.append(col)
    return cols


def _pivot_partial(batch: pa.Table, group_by, aggs, n_buckets) -> pa.Table:
    """One batch → per-key partial rows (vectorized: composite key
    factorize + bincount/reduceat per agg)."""
    import pandas as pd

    n = batch.num_rows
    if n == 0:
        return None
    keys = [
        batch.column(g).to_numpy(zero_copy_only=False).astype(str)
        for g in group_by
    ]
    comp = keys[0]
    for kx in keys[1:]:
        comp = np.char.add(np.char.add(comp, _SEP), kx)
    uk, inv = np.unique(comp, return_inverse=True)
    first = np.zeros(len(uk), dtype=np.int64)
    first[inv[::-1]] = np.arange(n - 1, -1, -1)  # first row of each key
    data = {
        g: pa.array(batch.column(g).to_numpy(zero_copy_only=False)[first])
        for g in group_by
    }
    data["_bucket"] = pa.array(
        (_fnv1a64_str(uk) % np.uint64(n_buckets)).astype(np.int32)
    )
    cnt = np.bincount(inv, minlength=len(uk)).astype(np.int64)
    for name, (col, fn) in aggs.items():
        if fn == "count":
            data[f"{name}__n"] = pa.array(cnt)
            continue
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        if fn in ("sum_e6", "avg_e6"):
            u = np.rint(v * 1e6).astype(np.int64)
            data[f"{name}__s"] = pa.array(
                np.bincount(inv, weights=u, minlength=len(uk)).astype(
                    np.int64
                )
            )
            if fn == "avg_e6":
                data[f"{name}__n"] = pa.array(cnt)
        elif fn in ("min", "max"):
            o = np.argsort(inv, kind="stable")
            bounds = np.searchsorted(inv[o], np.arange(len(uk)))
            red = (np.minimum if fn == "min" else np.maximum).reduceat(
                v[o], bounds
            )
            data[f"{name}__{fn[1]}"] = pa.array(red)  # __i / __a
        else:
            raise ValueError(f"unknown agg fn {fn!r}")
    return pa.table(data)


def _merge_pivot_partials(tbl: pa.Table, group_by, aggs) -> pa.Table:
    """Fold partial rows to one row per key (associative)."""
    import pandas as pd

    df = tbl.to_pandas()
    spec = {}
    for name, (_col, fn) in aggs.items():
        if fn == "count":
            spec[f"{name}__n"] = "sum"
        elif fn == "sum_e6":
            spec[f"{name}__s"] = "sum"
        elif fn == "avg_e6":
            spec[f"{name}__s"] = "sum"
            spec[f"{name}__n"] = "sum"
        elif fn == "min":
            spec[f"{name}__i"] = "min"
        elif fn == "max":
            spec[f"{name}__a"] = "max"
    g = df.groupby(list(group_by), sort=True, as_index=False).agg(spec)
    return pa.Table.from_pandas(g, preserve_index=False)


def _write_gen_buckets(parts_ds, dest: str, gen: str) -> int:
    """Partial-rows Dataset (carrying ``_bucket``) → one generation file
    per bucket via a bucketed EXCHANGE (``groupby(_bucket).map_groups``)
    with the write INSIDE the group task — no driver materialization of
    the partials (rows ∝ distinct keys can exceed driver memory at
    100 TB).  Deterministic names + tmp/rename keep a crashed or retried
    checkpoint idempotent: the manifest commits only after every bucket
    landed, and a re-run recomputes the same generation tag and
    overwrites value-identical files."""

    def write_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "rows": pa.array([], pa.int64())})
        b = int(group.column("_bucket")[0].as_py())
        sub = group.drop_columns(["_bucket"])
        bdir = os.path.join(dest, f"bucket={b}")
        os.makedirs(bdir, exist_ok=True)
        tmp = os.path.join(bdir, f"gen-{gen}.parquet.in")
        pq.write_table(sub, tmp)
        os.replace(tmp, os.path.join(bdir, f"gen-{gen}.parquet"))
        return pa.table({"bucket": pa.array([b], pa.int32()),
                         "rows": pa.array([sub.num_rows], pa.int64())})

    stats = parts_ds.groupby("_bucket").map_groups(
        write_group, batch_format="pyarrow"
    )
    return int(stats.count())


@ray.remote
def _render_bucket_task(paths: list[str], group_by: list[str],
                        aggs: dict) -> pa.Table:
    """Render one bucket: merge every generation's partials, derive the
    final agg values (avg = ONE exact-int division)."""
    tbl = pa.concat_tables([pq.read_table(p) for p in paths])
    m = _merge_pivot_partials(tbl, group_by, aggs).to_pandas()
    out = m[list(group_by)].copy()
    for name, (_col, fn) in aggs.items():
        if fn == "count":
            out[name] = m[f"{name}__n"].astype(np.int64)
        elif fn == "sum_e6":
            out[name] = m[f"{name}__s"].astype(np.int64)
        elif fn == "avg_e6":
            out[name] = m[f"{name}__s"].to_numpy() / m[
                f"{name}__n"].to_numpy()
        elif fn == "min":
            out[name] = m[f"{name}__i"]
        elif fn == "max":
            out[name] = m[f"{name}__a"]
    return pa.Table.from_pandas(out, preserve_index=False)


def pivot_transform(
    src,
    dest: str | Path,
    group_by: list[str],
    aggs: dict[str, tuple[str | None, str]],
    n_buckets: int = 16,
) -> dict:
    """Run (or incrementally CHECKPOINT) an ES pivot transform.

    ``aggs``: ``{out_name: (src_col | None, fn)}`` with fn ∈
    :data:`AGG_FNS`.  Returns ``{"new_files": int, "generation": tag}``
    (``new_files == 0`` ⇔ nothing to do — a no-op checkpoint)."""
    import ray.data as rd

    dest = str(dest)
    for name, (col, fn) in aggs.items():
        if fn not in AGG_FNS:
            raise ValueError(f"unknown agg fn {fn!r} for {name!r}")
        if fn != "count" and col is None:
            raise ValueError(f"agg {name!r} ({fn}) needs a source column")
    fp = _spec_fingerprint("pivot", group_by, aggs, n_buckets=n_buckets)
    man = _load_manifest(dest)
    if man is not None and man["fingerprint"] != fp:
        raise ValueError(
            "transform spec changed since the dest was created — delete "
            "the dest to reset (ES requires a new transform id too)"
        )
    files = _input_files(src)
    new = _new_files(files, man)
    if not new:
        return {"new_files": 0, "generation": None}
    gen = hashlib.md5(("\n".join(new)).encode()).hexdigest()[:10]
    ds = rd.read_parquet(new, columns=_columns_for(group_by, aggs))
    os.makedirs(dest, exist_ok=True)
    _write_gen_buckets(
        ds.map_batches(
            lambda t: _pivot_partial(t, tuple(group_by), aggs, n_buckets),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        dest, gen,
    )
    man = man or {"fingerprint": fp, "inputs": {}, "generations": []}
    for f in new:
        st = os.stat(f)
        man["inputs"][f] = [st.st_size, int(st.st_mtime_ns)]
    man["generations"].append(gen)
    _commit_manifest(dest, man)
    return {"new_files": len(new), "generation": gen}


def render_pivot(
    dest: str | Path,
    group_by: list[str],
    aggs: dict[str, tuple[str | None, str]],
) -> pa.Table:
    """Materialize the transform's current state: ``n_buckets`` parallel
    per-bucket merges (generations fold associatively), small concat,
    rows (group_by asc)."""
    dest = Path(dest)
    futs = []
    for bdir in sorted(dest.glob("bucket=*")):
        paths = sorted(str(p) for p in bdir.glob("gen-*.parquet"))
        if paths:
            futs.append(_render_bucket_task.remote(
                paths, list(group_by), aggs
            ))
    if not futs:
        return pa.table({})
    tbls = ray.get(futs)
    out = pa.concat_tables(tbls)
    import pandas as pd

    df = out.to_pandas().sort_values(list(group_by)).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


# ----------------------------------------------------------- latest

def _latest_partial(batch: pa.Table, key: str, sort_on: str,
                    fields: list[str], n_buckets: int,
                    tie_on: str | None) -> pa.Table:
    """Per-batch argmax row per key: winner by (sort value, tie value)
    — the tiebreak column (a unique id) makes the reduction
    deterministic and associative across batches and generations."""
    n = batch.num_rows
    if n == 0:
        return None
    kv = batch.column(key).to_numpy(zero_copy_only=False).astype(str)
    sv = batch.column(sort_on).to_numpy(zero_copy_only=False)
    if np.issubdtype(np.asarray(sv).dtype, np.datetime64):
        sv = sv.astype("datetime64[us]").astype(np.int64)
    sv = sv.astype(np.float64)
    tie = (
        batch.column(tie_on).to_numpy(zero_copy_only=False)
        .astype(np.float64)
        if tie_on is not None else np.arange(n, dtype=np.float64)
    )
    uk, inv = np.unique(kv, return_inverse=True)
    # lexsort puts each key's (sort, tie)-max LAST in its run
    order = np.lexsort((tie, sv, inv))
    last = np.searchsorted(inv[order], np.arange(len(uk)),
                           side="right") - 1
    win = order[last]
    data = {key: pa.array(kv[win])}
    data["_sort"] = pa.array(sv[win])
    data["_tie"] = pa.array(tie[win])
    data["_bucket"] = pa.array(
        (_fnv1a64_str(uk) % np.uint64(n_buckets)).astype(np.int32)
    )
    for f in fields:
        data[f] = batch.column(f).take(pa.array(win))
    return pa.table(data)


@ray.remote
def _latest_bucket_task(paths: list[str], key: str,
                        fields: list[str]) -> pa.Table:
    tbl = pa.concat_tables([pq.read_table(p) for p in paths])
    kv = tbl.column(key).to_numpy(zero_copy_only=False).astype(str)
    sv = tbl.column("_sort").to_numpy()
    tie = tbl.column("_tie").to_numpy() if "_tie" in tbl.column_names \
        else np.arange(len(kv))
    uk, inv = np.unique(kv, return_inverse=True)
    order = np.lexsort((tie, sv, inv))
    last = np.searchsorted(inv[order], np.arange(len(uk)),
                           side="right") - 1
    win = order[last]
    cols = {key: pa.array(kv[win]), "_sort": pa.array(sv[win])}
    for f in fields:
        cols[f] = tbl.column(f).take(pa.array(win))
    return pa.table(cols)


def latest_transform(
    src,
    dest: str | Path,
    key: str,
    sort_on: str,
    fields: list[str],
    tie_on: str | None = None,
    n_buckets: int = 16,
) -> dict:
    """Run (or incrementally CHECKPOINT) an ES ``latest`` transform: the
    newest row per ``key`` by ``sort_on``.  Ties on the sort value break
    on ``tie_on`` (pass a unique id column for determinism — ES leaves
    sort-value ties unspecified; disclosed)."""
    import ray.data as rd

    dest = str(dest)
    fp = _spec_fingerprint("latest", None, None, key=key, sort_on=sort_on,
                           fields=[*fields, str(tie_on)],
                           n_buckets=n_buckets)
    man = _load_manifest(dest)
    if man is not None and man["fingerprint"] != fp:
        raise ValueError("transform spec changed — delete the dest to reset")
    files = _input_files(src)
    new = _new_files(files, man)
    if not new:
        return {"new_files": 0, "generation": None}
    gen = hashlib.md5(("\n".join(new)).encode()).hexdigest()[:10]
    cols = [key, sort_on, *fields]
    if tie_on is not None and tie_on not in cols:
        cols.append(tie_on)
    ds = rd.read_parquet(new, columns=cols)
    os.makedirs(dest, exist_ok=True)
    _write_gen_buckets(
        ds.map_batches(
            lambda t: _latest_partial(t, key, sort_on, list(fields),
                                      n_buckets, tie_on),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        dest, gen,
    )
    man = man or {"fingerprint": fp, "inputs": {}, "generations": []}
    for f in new:
        st = os.stat(f)
        man["inputs"][f] = [st.st_size, int(st.st_mtime_ns)]
    man["generations"].append(gen)
    _commit_manifest(dest, man)
    return {"new_files": len(new), "generation": gen}


def render_latest(
    dest: str | Path, key: str, fields: list[str]
) -> pa.Table:
    """Materialize the latest-transform state (rows key asc)."""
    dest = Path(dest)
    futs = []
    for bdir in sorted(dest.glob("bucket=*")):
        paths = sorted(str(p) for p in bdir.glob("gen-*.parquet"))
        if paths:
            futs.append(_latest_bucket_task.remote(
                paths, key, list(fields)
            ))
    if not futs:
        return pa.table({})
    out = pa.concat_tables(ray.get(futs))
    import pandas as pd

    df = out.to_pandas().sort_values(key).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)
