"""Term-partitioned global index: the literal groupby-on-term merge with
explicit salting for skewed terms.

The serving layout (`build.py`) is doc-range sharded — the implicit salt
that bounds every merge unit.  This module produces the OTHER layout the
north rule describes: posting parts shuffled BY TERM into a global,
term-partitioned index, with hot terms (df above a threshold — think
``import``, ``return``) split across ``term#saltN`` sub-keys so no merge
group ever exceeds a bounded doc range:

    read doc-range segments          (term, shard_id, df, postings)
      → df pre-pass                  (per-batch partial df + bucketed
                                      reduce → hot-term set, broadcast
                                      via ray.put — the reference's
                                      count-probe pattern,
                                      ``slicer.js:469-482``)
      → salt map                     vectorized: cold term → salt −1;
                                      hot term → salt shard_id % n_salts
      → groupby(bucket)              ONE fixed-small-cardinality exchange
                                      on ``md5(term) % n_buckets`` (the
                                      output partition key) — never a
                                      per-term groupby: term cardinality
                                      is the corpus vocabulary, and
                                      per-key groupbys at that
                                      cardinality are pathological in
                                      Ray Data (measured ~5-10× slower
                                      than the bucketed-reduction
                                      pattern used here)
      → in-bucket run walk           sort (term, salt, shard) once, walk
                                      equal-(term,salt) runs vectorized;
                                      ordered concat (shard order = doc
                                      order), one blob per salt part
      → write_parquet                hash(term)-bucketed directory layout

Query-side un-salting: a term's postings are the ordered concatenation of
its salt parts (salt = shard_id % n, shards ascending ⇒ doc ids
ascending across parts) — verified byte-equivalent in tests.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .build import IndexInfo
from .codec import decode_postings_many, encode_postings_many

HOT_DF_FRACTION = 0.10  # df above this fraction of the corpus → salted


# FNV-1a 64-bit — the DEFAULT bucket hash for new layouts: fully
# vectorizable (column-wise numpy over the Arrow string buffer, no
# per-term Python even for distinct terms) and library-version-stable
# (defined here, not borrowed from a hash library whose seed could
# drift).  Persisted layouts record their hash in ``term_hash``; md5
# remains the read path for layouts that predate the key.
_FNV_OFF = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_U64_MASK = 0xFFFFFFFFFFFFFFFF


def _fnv1a64(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for c in data:
        h = ((h ^ c) * 0x100000001B3) & _U64_MASK
    return h


def _term_bucket(term: str, n_buckets: int, algo: str = "md5") -> int:
    if algo == "fnv1a64":
        return _fnv1a64(term.encode()) % n_buckets
    return int.from_bytes(hashlib.md5(term.encode()).digest()[:4], "little") % n_buckets


def _fnv1a64_vec(arr: pa.Array) -> np.ndarray:
    """FNV-1a 64 of every string in an Arrow utf8 array, vectorized
    column-wise over the value buffer: max_len passes (token clip bounds
    it at 64), each a numpy xor-multiply over all remaining terms."""
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if arr.null_count:
        raise ValueError("term column must not contain nulls")
    arr = arr.cast(pa.large_utf8())
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                         count=n + 1, offset=arr.offset * 8)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts = offs[:-1]
    lens = (offs[1:] - starts).astype(np.int64)
    h = np.full(n, _FNV_OFF, dtype=np.uint64)
    if lens.max(initial=0) == 0:
        return h
    alive = np.nonzero(lens > 0)[0]
    j = 0
    with np.errstate(over="ignore"):  # uint64 wrap IS the algorithm
        while len(alive):
            c = data[starts[alive] + j].astype(np.uint64)
            h[alive] = (h[alive] ^ c) * _FNV_PRIME
            j += 1
            alive = alive[lens[alive] > j]
    return h


def _term_buckets_vec(term_col: "pa.Array | pa.ChunkedArray",
                      n_buckets: int, algo: str = "md5") -> np.ndarray:
    """Vectorized ``_term_bucket`` over a string column.  fnv1a64 hashes
    the distinct dictionary with pure numpy (no per-term Python at all);
    md5 (pre-``term_hash`` layouts) keeps the per-DISTINCT-term loop."""
    if isinstance(term_col, pa.ChunkedArray):
        term_col = term_col.combine_chunks()
    enc = term_col.dictionary_encode()
    if algo == "fnv1a64":
        db = (_fnv1a64_vec(enc.dictionary) % np.uint64(n_buckets)).astype(
            np.int32
        )
    else:
        dict_terms = enc.dictionary.to_pylist()
        db = np.fromiter(
            (_term_bucket(t, n_buckets) for t in dict_terms),
            np.int32, len(dict_terms),
        )
    return db[enc.indices.to_numpy()]


def merge_global_postings(
    index_dir: str | Path,
    out_dir: str | Path,
    n_salts: int = 8,
    n_buckets: int = 16,
    hot_df_fraction: float = HOT_DF_FRACTION,
    block_size: int = 128,
    store_norms: bool = False,
    params=None,
    _append_only_shards: list[int] | None = None,
    _append_hot_terms: list[str] | None = None,
    _append_gen_dir: str | Path | None = None,
    _append_term_hash: str | None = None,
):
    """Doc-range segments → term-partitioned global index.

    Returns the output Dataset's row count (one row per (term, salt)).
    Output layout: ``out_dir/bucket=<hash(term) % n_buckets>/*.parquet``
    with rows (term, salt, df, cf, postings) — never one giant file.

    ``store_norms=True`` additionally materializes each posting's doc
    LENGTH as a parallel ``dls`` binary column (``<u4`` per posting) —
    the serving tier computes the BM25 tf-norm
    ``tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))`` once at actor load from
    (tf, dl) and the CURRENT avgdl in ``_globalmeta.json``
    (:class:`search.term_engine.TermPartitionedEngine`).  Storing dl
    instead of the baked norm (layout v2; v1 baked float64 norms) is
    what makes :func:`append_global_postings` exact: an append shifts
    avgdl, and norms derived at load follow it, where baked norms would
    silently serve stale impacts."""
    import json as _json

    from ..config import BM25Params

    params = params or BM25Params()
    info = IndexInfo(index_dir)
    out_dir = Path(out_dir)

    # A term-partitioned layout merged from segments with un-compacted
    # deletes would serve deleted docs and bake pre-delete df/num_docs
    # into _globalmeta.json — silently disagreeing with the
    # doc-partitioned engine, which masks tombstones at query time
    # (engine.py).  Refuse rather than diverge.
    from .deletes import load_deletes

    dirty = [
        sid for sid in info.shard_ids() if len(load_deletes(index_dir, sid))
    ]
    if dirty:
        raise ValueError(
            f"index has pending delete tombstones in shards {dirty}; run "
            "compact_index(index_dir) before merge_global_postings so the "
            "term-partitioned layout reflects live documents only"
        )

    # carry the positional sidecar when the source index has one: position
    # spans restart ABSOLUTE at each doc boundary, so per-(term,salt) part
    # blobs byte-concatenate in the same (shard asc ⇒ doc asc) order the
    # postings merge uses — no re-encode (the property store_positions was
    # designed for; serving re-sorts hot-term salt parts by doc at load)
    import pyarrow.dataset as _pds

    seg_schema = _pds.dataset(str(Path(index_dir) / "segments")).schema
    store_positions = "positions" in seg_schema.names
    cols = ["term", "df", "cf", "postings", "shard"]
    if store_positions:
        # tfs segment the position stream at serve time — ship them along
        cols.append("positions")
    if _append_only_shards is not None:
        # append path: read ONLY the new shards' segment files (explicit
        # paths — work proportional to the appended data); the hive
        # `shard` key is rebuilt from each file's path
        from .build import segment_dir as _segdir

        paths = [
            str(_segdir(index_dir, sid) / "segment.parquet")
            for sid in _append_only_shards
        ]
        data_cols = [c for c in cols if c != "shard"]
        seg = rd.read_parquet(paths, columns=data_cols, include_paths=True)

        def path_to_shard(batch: pa.Table) -> pa.Table:
            import re as _re

            shards = [
                _re.search(r"shard=(\d+)", p).group(1)
                for p in batch.column("path").to_pylist()
            ]
            return batch.drop_columns(["path"]).append_column(
                "shard", pa.array(shards, pa.string())
            )

        seg = seg.map_batches(
            path_to_shard, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        seg = rd.read_parquet(str(Path(index_dir) / "segments"), columns=cols)

    if store_norms:
        import pyarrow.parquet as _pq

        avgdl = info.stats.avgdl
        k1, b = params.k1, params.b
        shard_bases = {
            s.shard_id: s.doc_base for s in info.manifest.shards.values()
        }
        dm_paths = {
            sid: [str(p) for p in info.docmeta_paths(sid)]
            for sid in info.shard_ids()
        }
        index_dir_s = str(index_dir)

        def add_norms(batch: pa.Table) -> pa.Table:
            from .codec import decode_postings_many

            cache = add_norms.__dict__.setdefault("_dls", {})

            def dls_of(sid: int) -> np.ndarray:
                a = cache.get(sid)
                if a is None:
                    parts = [
                        _pq.read_table(p, columns=["dl"]).column("dl").to_numpy()
                        for p in dm_paths[sid]
                    ]
                    a = cache[sid] = (
                        np.concatenate(parts).astype(np.float64)
                        if parts else np.zeros(0)
                    )
                return a

            shards = batch.column("shard").to_numpy()
            blobs = batch.column("postings").to_pylist()
            doc_flat, tf_flat, offs = decode_postings_many(blobs)
            counts = np.diff(offs)
            dl_flat = np.empty(len(doc_flat), dtype=np.float64)
            for sid in np.unique(shards):
                sel = np.repeat(shards == sid, counts)
                dl = dls_of(int(sid))
                dl_flat[sel] = dl[
                    (doc_flat[sel] - np.uint64(shard_bases[int(sid)])).astype(np.int64)
                ]
            dl_blobs = [
                dl_flat[offs[i]:offs[i + 1]].astype("<u4").tobytes()
                for i in range(len(blobs))
            ]
            return batch.append_column(
                "dls", pa.array(dl_blobs, pa.large_binary())
            )

        seg = seg.map_batches(add_norms, batch_format="pyarrow", zero_copy_batch=True)

    # df pre-pass: global df per term via per-batch PARTIAL sums + one
    # fixed-64-bucket exchange (NOT a per-term groupby — vocabulary
    # cardinality).  Only the tiny hot set reaches the driver.
    import pyarrow.compute as pc

    from ..ops import to_arrow

    hot_cut = hot_df_fraction * info.stats.num_docs
    # bucket routing is a PERSISTED layout contract: fresh merges take
    # the vectorized default; appends must reuse the layout's recorded
    # hash or new parts would land in the wrong buckets
    term_hash = (
        (_append_term_hash or "md5") if _append_gen_dir is not None
        else "fnv1a64"
    )

    def partial_df(batch: pa.Table) -> pa.Table:
        term = batch.column("term").combine_chunks()
        enc = term.dictionary_encode()
        codes = enc.indices.to_numpy()
        nd = len(enc.dictionary)
        df = np.bincount(
            codes, weights=batch.column("df").to_numpy(), minlength=nd
        ).astype(np.int64)
        return pa.table(
            {
                "term": enc.dictionary,
                "df": pa.array(df),
                # transient exchange key (never persisted) — always the
                # vectorized hash regardless of the layout's term_hash
                "dfb": pa.array(
                    _term_buckets_vec(enc.dictionary, 64, "fnv1a64"),
                    pa.int32(),
                ),
            }
        )

    def reduce_df(g: pa.Table) -> pa.Table:
        term = g.column("term").combine_chunks()
        enc = term.dictionary_encode()
        codes = enc.indices.to_numpy()
        df = np.bincount(
            codes, weights=g.column("df").to_numpy(), minlength=len(enc.dictionary)
        ).astype(np.int64)
        hot = df >= hot_cut
        return pa.table(
            {"term": enc.dictionary.filter(pa.array(hot)),
             "df": pa.array(df[hot])}
        )

    if _append_hot_terms is not None:
        # appends reuse the layout's recorded hot set so new parts salt
        # consistently with existing ones (placement property only)
        hot_terms = list(_append_hot_terms)
    else:
        hot_tbl = to_arrow(
            seg.map_batches(partial_df, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("dfb")
            .map_groups(reduce_df, batch_format="pyarrow", zero_copy_batch=True)
        )
        hot_terms = hot_tbl.column("term").to_pylist() if hot_tbl.num_rows else []
    hot_ref = ray.put(sorted(hot_terms))

    def add_keys(batch: pa.Table) -> pa.Table:
        """salt (−1 = unsalted cold term; shard % n_salts for hot terms)
        and the output bucket key — all vectorized, no per-row Python."""
        hot = ray.get(hot_ref)
        term = batch.column("term")
        # `shard` is a zero-padded hive partition string (e.g. "00003")
        shards = (
            batch.column("shard").combine_chunks().cast(pa.int64()).to_numpy()
        )
        if hot:
            mask = pc.is_in(
                term, value_set=pa.array(hot, pa.string())
            ).to_numpy(zero_copy_only=False)
        else:
            mask = np.zeros(batch.num_rows, dtype=bool)
        salt = np.where(mask, shards % n_salts, -1).astype(np.int32)
        batch = batch.append_column("salt", pa.array(salt, pa.int32()))
        return batch.append_column(
            "bucket",
            pa.array(_term_buckets_vec(term, n_buckets, term_hash),
                     pa.int32()),
        )

    def merge_bucket(g: pa.Table) -> pa.Table:
        # one sort per bucket, then walk equal-(term, salt) runs
        # vectorized; within a run parts arrive from ascending shard ids
        # ⇒ ascending doc ranges, so concatenation preserves doc order
        order = pc.sort_indices(
            g,
            sort_keys=[("term", "ascending"), ("salt", "ascending"),
                       ("shard", "ascending")],
        )
        g = g.take(order)
        enc = g.column("term").combine_chunks().dictionary_encode()
        tcodes = enc.indices.to_numpy()
        salt = g.column("salt").to_numpy()
        change = np.concatenate(
            [[True], (tcodes[1:] != tcodes[:-1]) | (salt[1:] != salt[:-1])]
        )
        run_starts = np.nonzero(change)[0]
        blobs = g.column("postings").to_pylist()
        doc_flat, tf_flat, offs = decode_postings_many(blobs)
        run_offs = np.concatenate([offs[run_starts], [offs[-1]]])
        new_blobs = encode_postings_many(doc_flat, tf_flat, run_offs, block_size)
        take = pa.array(run_starts, pa.int64())
        cols = {
            "term": g.column("term").take(take),
            "salt": pa.array(salt[run_starts], pa.int32()),
            "df": pa.array(
                np.add.reduceat(g.column("df").to_numpy(), run_starts).astype(np.int64)
            ),
            "cf": pa.array(
                np.add.reduceat(g.column("cf").to_numpy(), run_starts).astype(np.int64)
            ),
            "bucket": g.column("bucket").take(take),
            "postings": pa.array(new_blobs, pa.large_binary()),
        }
        for side in ("norms", "dls", "positions"):
            if side in g.column_names:
                nb = g.column(side).to_pylist()
                run_ends = np.concatenate([run_starts[1:], [len(nb)]])
                cols[side] = pa.array(
                    [b"".join(nb[s:e]) for s, e in zip(run_starts, run_ends)],
                    pa.large_binary(),
                )
        return pa.table(cols)

    merged = (
        seg.map_batches(add_keys, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")  # fixed n_buckets-key exchange, not per-term
        .map_groups(merge_bucket, batch_format="pyarrow", zero_copy_batch=True)
    )
    if _append_only_shards is not None:
        # append mode: parts land in a STAGING generation dir; the caller
        # (append_global_postings) commits it into the meta afterwards —
        # a crash between write and commit leaves an invisible dir, never
        # duplicate postings (readers only see committed generations)
        merged.write_parquet(str(Path(_append_gen_dir)),
                             partition_cols=["bucket"])
        return out_dir
    merged.write_parquet(str(out_dir), partition_cols=["bucket"])
    meta = {
        "layout_version": 2,  # v2: per-posting dls, norms derived at load
        "term_hash": term_hash,
        "n_salts": n_salts,
        "n_buckets": n_buckets,
        "hot_df_fraction": hot_df_fraction,
        "block_size": block_size,
        "store_norms": store_norms,
        "store_positions": store_positions,
        "index_phrases": bool(
            getattr(info.manifest, "index_phrases", False)
        ),
        "shingle_positions": bool(
            getattr(info.manifest, "shingle_positions", True)
        ),
        "source_index": str(index_dir),
        "num_docs": info.stats.num_docs,
        "avgdl": info.stats.avgdl,
        "k1": params.k1,
        "b": params.b,
        "analyzer": info.manifest.analyzer,
        "min_token_len": info.manifest.min_token_len,
        "max_token_len": info.manifest.max_token_len,
        # append lineage: which source shards this layout covers, and the
        # hot set whose salting new appends must reuse (salting is a
        # placement property — reusing a stale hot set never affects
        # results, only part sizes)
        "merged_shards": sorted(info.shard_ids()),
        "hot_terms": sorted(hot_terms),
        # per-shard segment fingerprints: an in-place shard REBUILD (the
        # modified-corpus-file path) or compaction changes bytes without
        # changing the shard id set — appends must detect it and force a
        # full re-merge rather than serve half-stale parts
        "shard_fps": _shard_fps(index_dir, info.shard_ids()),
    }
    (out_dir / "_globalmeta.json").write_text(_json.dumps(meta, indent=1))
    return out_dir


def _shard_fps(index_dir: str | Path, shard_ids) -> dict:
    import os as _os

    out = {}
    for sid in shard_ids:
        p = Path(index_dir) / "segments" / f"shard={sid:05d}" / "segment.parquet"
        st = _os.stat(p)
        out[str(sid)] = [st.st_size, st.st_mtime_ns]
    return out


def append_global_postings(index_dir: str | Path, global_dir: str | Path):
    """Incrementally extend a term-partitioned layout with the source
    index's shards that were built AFTER the last merge (the persistent
    indexer's append path) — NO re-merge of existing buckets.

    Only the new shards' segments flow through the salt/bucket exchange;
    their (term, salt) part rows land as additional parquet files in the
    same ``bucket=<h>`` directories.  Serving already merges multi-row
    runs per term at actor load (and re-sorts postings by doc id there),
    so old and new parts coexist without rewrite; df per term is the sum
    across part rows.  Because the layout stores per-posting doc LENGTHS
    (v2) rather than baked norms, the post-append avgdl in
    ``_globalmeta.json`` reaches the scorer at load time and served BM25
    scores stay bit-exact vs a full re-merge (tested).

    The work is proportional to the APPENDED data: at 10^12 docs a daily
    increment re-shuffles only that day's segments, never the corpus.
    Compaction (physical deletes) invalidates doc ids → full re-merge;
    the pending-tombstone guard enforces it."""
    import json as _json

    meta = _load_globalmeta(global_dir)
    if int(meta.get("layout_version", 1)) < 2:
        raise ValueError(
            "append requires a layout-v2 global index (per-posting dls); "
            "rebuild with merge_global_postings(...)"
        )
    info = IndexInfo(index_dir)
    from .deletes import load_deletes

    dirty = [
        sid for sid in info.shard_ids() if len(load_deletes(index_dir, sid))
    ]
    if dirty:
        raise ValueError(
            f"index has pending delete tombstones in shards {dirty}; "
            "compact_index + full merge_global_postings instead of append"
        )
    done = set(meta["merged_shards"])
    new_shards = sorted(set(info.shard_ids()) - done)
    if not done <= set(info.shard_ids()):
        raise ValueError(
            "global layout references shards missing from the source index "
            "(compacted or rebuilt?) — full merge_global_postings required"
        )
    old_fps = meta.get("shard_fps", {})
    cur_fps = _shard_fps(index_dir, sorted(done))
    stale = [sid for sid in sorted(done) if old_fps.get(str(sid)) != cur_fps[str(sid)]]
    if stale:
        raise ValueError(
            f"shards {stale} were rewritten in place since the last merge "
            "(modified-file rebuild or compaction) — full "
            "merge_global_postings required"
        )
    out_dir = Path(global_dir)
    if not new_shards:
        return out_dir
    # garbage-collect staging dirs a crashed append left uncommitted
    import shutil as _sh

    committed = set(meta.get("generations", []))
    for p in out_dir.glob("_gen-*"):
        if p.name not in committed:
            _sh.rmtree(p)
    gen_name = f"_gen-{new_shards[0]:05d}-{new_shards[-1]:05d}"
    merge_global_postings(
        index_dir,
        out_dir,
        n_salts=int(meta["n_salts"]),
        n_buckets=int(meta["n_buckets"]),
        hot_df_fraction=float(meta["hot_df_fraction"]),
        block_size=int(meta["block_size"]),
        store_norms=bool(meta["store_norms"]),
        _append_only_shards=new_shards,
        _append_hot_terms=list(meta.get("hot_terms", [])),
        _append_gen_dir=out_dir / gen_name,
        _append_term_hash=meta.get("term_hash", "md5"),
    )
    # commit: ONE atomic meta replace makes the generation visible
    meta["generations"] = sorted(committed | {gen_name})
    meta["merged_shards"] = sorted(done | set(new_shards))
    meta["num_docs"] = info.stats.num_docs
    meta["avgdl"] = info.stats.avgdl
    meta["shard_fps"] = {
        **old_fps, **_shard_fps(index_dir, new_shards)
    }
    _write_meta(out_dir, meta)
    return out_dir


def _write_meta(out_dir: Path, meta: dict) -> None:
    import json as _json
    import os as _os

    tmp = out_dir / "_globalmeta.json.tmp"
    tmp.write_text(_json.dumps(meta, indent=1))
    _os.replace(tmp, out_dir / "_globalmeta.json")


def _bucket_paths(global_dir: str | Path, b: int, meta: dict | None = None
                  ) -> list[str]:
    """Data dirs holding bucket ``b``: the base layout plus every
    COMMITTED append generation.  Uncommitted ``_gen-*`` staging dirs
    (a crashed append) are invisible — the commit is the atomic meta
    replace listing the generation."""
    global_dir = Path(global_dir)
    if meta is None:
        meta = _load_globalmeta(global_dir)
    out = []
    base = global_dir / f"bucket={b}"
    if base.exists():
        out.append(str(base))
    for g in meta.get("generations", []):
        p = global_dir / g / f"bucket={b}"
        if p.exists():
            out.append(str(p))
    return out


def refresh_global_postings(
    index_dir: str | Path, global_dir: str | Path, **merge_kwargs
):
    """Keep a term-partitioned layout current with its source index:
    append when the delta is append-only; full re-merge into a temp dir
    + two-rename swap (with crash recovery, see below) when appends
    can't represent it (compaction, in-place shard rewrites, or no
    layout yet).  The persistent indexer calls this per tick.

    Pending tombstones can be represented by NEITHER an append nor a
    re-merge (the merge guard refuses them): the existing layout is kept
    AS OF its last merge (stale until compaction, with a warning) rather
    than crashing the persistent loop; with no existing layout the
    error propagates.

    The swap is rename(out → out.old) + rename(tmp → out) + rmtree(old)
    — POSIX offers no atomic non-empty-directory exchange, so a crash
    between the renames can leave ``out`` missing with ``out.old``
    intact; the next call restores ``out.old`` before proceeding."""
    import shutil as _sh
    import warnings as _warn

    out = Path(global_dir)
    old = out.with_name(out.name + ".old")
    if not out.exists() and old.exists():
        # crash recovery: a previous swap died between its two renames
        old.rename(out)
    has_layout = (out / "_globalmeta.json").exists()

    from .build import IndexInfo as _II
    from .deletes import load_deletes as _ld

    info = _II(index_dir)
    if any(len(_ld(index_dir, sid)) for sid in info.shard_ids()):
        if has_layout:
            _warn.warn(
                "source index has pending delete tombstones; the "
                "term-partitioned layout stays as of its last merge "
                "until compact_index runs",
                stacklevel=2,
            )
            return out
        raise ValueError(
            "cannot build a term-partitioned layout over pending delete "
            "tombstones; run compact_index first"
        )
    if has_layout:
        try:
            return append_global_postings(index_dir, out)
        except ValueError:
            pass  # not representable as an append — fall through
    tmp = out.with_name(out.name + ".merge-tmp")
    if tmp.exists():
        _sh.rmtree(tmp)
    merge_kwargs.setdefault("store_norms", True)
    merge_global_postings(index_dir, tmp, **merge_kwargs)
    if old.exists():
        _sh.rmtree(old)
    if out.exists():
        out.rename(old)
    tmp.rename(out)
    if old.exists():
        _sh.rmtree(old)
    return out


def _load_globalmeta(global_dir: str | Path) -> dict:
    import json as _json

    p = Path(global_dir) / "_globalmeta.json"
    if not p.exists():
        raise FileNotFoundError(f"no _globalmeta.json in {global_dir}")
    return _json.loads(p.read_text())


def read_term_postings(global_dir: str | Path, term: str,
                       n_buckets: int = 16) -> tuple[np.ndarray, np.ndarray]:
    """Un-salt: a term's global postings = salt parts in ascending salt
    order (salt ordering follows shard ordering ⇒ doc order)."""
    import pyarrow.dataset as pds

    from .codec import decode_postings

    try:
        meta = _load_globalmeta(global_dir)
    except FileNotFoundError:
        meta = None
    algo = (meta or {}).get("term_hash", "fnv1a64" if meta is None else "md5")
    b = _term_bucket(term, n_buckets, algo)
    if meta is not None:
        paths = _bucket_paths(global_dir, b, meta)
    else:
        # layouts without meta (norms-less merges in tests): base only,
        # written by a fresh merge ⇒ the vectorized default hash
        paths = [str(Path(global_dir) / f"bucket={b}")]
    # a list of DIRS needs the union-of-datasets form
    dset = pds.dataset([pds.dataset(p) for p in paths])
    tbl = dset.to_table(filter=pds.field("term") == term)
    if tbl.num_rows == 0:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    order = np.argsort(tbl.column("salt").to_numpy(), kind="stable")
    ids_parts, tf_parts = [], []
    for i in order.tolist():
        d, t = decode_postings(tbl.column("postings")[i].as_py())
        ids_parts.append(d)
        tf_parts.append(t)
    ids = np.concatenate(ids_parts)
    tfs = np.concatenate(tf_parts)
    o = np.argsort(ids, kind="stable")
    return ids[o], tfs[o]
