"""Term-partitioned global index: the literal groupby-on-term merge with
explicit salting for skewed terms.

The serving layout (`build.py`) is doc-range sharded — the implicit salt
that bounds every merge unit.  This module produces the OTHER layout the
north rule describes: posting parts shuffled BY TERM into a global,
term-partitioned index, with hot terms (df above a threshold — think
``import``, ``return``) split across ``term#saltN`` sub-keys so no merge
group ever exceeds a bounded doc range:

    read doc-range segments          (term, shard_id, df, postings)
      → df pre-pass                  (cheap aggregate → hot-term set,
                                      broadcast via ray.put — the
                                      reference's count-probe pattern,
                                      ``slicer.js:469-482``)
      → salt map                     cold term → "term"; hot term →
                                     "term#<shard_id % n_salts>"
      → groupby(salted_term)         THE term-keyed aggregate-sort shuffle
      → map_groups(merge parts)      ordered concat (shard order = doc
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


def _term_bucket(term: str, n_buckets: int) -> int:
    return int.from_bytes(hashlib.md5(term.encode()).digest()[:4], "little") % n_buckets


def merge_global_postings(
    index_dir: str | Path,
    out_dir: str | Path,
    n_salts: int = 8,
    n_buckets: int = 16,
    hot_df_fraction: float = HOT_DF_FRACTION,
    block_size: int = 128,
    store_norms: bool = False,
    params=None,
):
    """Doc-range segments → term-partitioned global index.

    Returns the output Dataset's row count (one row per (term, salt)).
    Output layout: ``out_dir/bucket=<hash(term) % n_buckets>/*.parquet``
    with rows (term, salt, df, cf, postings) — never one giant file.

    ``store_norms=True`` additionally materializes each posting's BM25
    tf-norm ``tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))`` (float64, the exact
    expression the doc-partitioned dense scorer evaluates) as a parallel
    ``norms`` binary column, with k1/b/avgdl baked at merge time and
    recorded in ``_globalmeta.json`` — the precomputed-impact layout that
    lets a TERM-partitioned serving tier score without doc lengths
    (:class:`search.term_engine.TermPartitionedEngine`)."""
    import json as _json

    from ..config import BM25Params

    params = params or BM25Params()
    info = IndexInfo(index_dir)
    out_dir = Path(out_dir)

    seg = rd.read_parquet(
        str(Path(index_dir) / "segments"),
        columns=["term", "df", "cf", "postings", "shard"],
    )

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
            tf = tf_flat.astype(np.float64)
            norm_flat = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl_flat / avgdl))
            norm_blobs = [
                norm_flat[offs[i]:offs[i + 1]].astype("<f8").tobytes()
                for i in range(len(blobs))
            ]
            return batch.append_column(
                "norms", pa.array(norm_blobs, pa.large_binary())
            )

        seg = seg.map_batches(add_norms, batch_format="pyarrow", zero_copy_batch=True)

    # df pre-pass: global df per term (small aggregate), hot set broadcast
    from ray.data.aggregate import Sum

    from ..ops import to_arrow

    df_tbl = to_arrow(seg.groupby("term").aggregate(Sum("df", alias_name="df")))
    hot_cut = hot_df_fraction * info.stats.num_docs
    hot_terms = frozenset(
        t
        for t, d in zip(
            df_tbl.column("term").to_pylist(), df_tbl.column("df").to_pylist()
        )
        if d >= hot_cut
    )
    hot_ref = ray.put(hot_terms)

    def add_salt(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        terms = batch.column("term").to_pylist()
        shards = batch.column("shard").to_pylist()
        keys = [
            f"{t}#{int(s) % n_salts}" if t in hot else t
            for t, s in zip(terms, shards)
        ]
        return batch.append_column("salted_term", pa.array(keys, pa.string()))

    def merge_group(g: pa.Table) -> pa.Table:
        # parts arrive from ascending shard ids ⇒ ascending doc ranges
        g = g.sort_by([("shard", "ascending")])
        term = g.column("term")[0].as_py()
        key = g.column("salted_term")[0].as_py()
        salt = int(key.rsplit("#", 1)[1]) if "#" in key and key != term else -1
        doc_flat, tf_flat, offs = decode_postings_many(
            g.column("postings").to_pylist()
        )
        blob = encode_postings_many(
            doc_flat, tf_flat, np.array([0, len(doc_flat)], dtype=np.int64),
            block_size,
        )[0]
        cols = {
            "term": pa.array([term], pa.string()),
            "salt": pa.array([salt], pa.int32()),
            "df": pa.array([int(sum(g.column("df").to_pylist()))], pa.int64()),
            "cf": pa.array([int(sum(g.column("cf").to_pylist()))], pa.int64()),
            "bucket": pa.array([_term_bucket(term, n_buckets)], pa.int32()),
            "postings": pa.array([blob], pa.large_binary()),
        }
        if "norms" in g.column_names:
            cols["norms"] = pa.array(
                [b"".join(g.column("norms").to_pylist())], pa.large_binary()
            )
        return pa.table(cols)

    merged = (
        seg.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("salted_term")  # the term-keyed aggregate-sort shuffle
        .map_groups(merge_group, batch_format="pyarrow", zero_copy_batch=True)
    )
    merged.write_parquet(str(out_dir), partition_cols=["bucket"])
    meta = {
        "n_salts": n_salts,
        "n_buckets": n_buckets,
        "hot_df_fraction": hot_df_fraction,
        "block_size": block_size,
        "store_norms": store_norms,
        "num_docs": info.stats.num_docs,
        "avgdl": info.stats.avgdl,
        "k1": params.k1,
        "b": params.b,
        "analyzer": info.manifest.analyzer,
        "min_token_len": info.manifest.min_token_len,
        "max_token_len": info.manifest.max_token_len,
    }
    (out_dir / "_globalmeta.json").write_text(_json.dumps(meta, indent=1))
    return out_dir


def read_term_postings(global_dir: str | Path, term: str,
                       n_buckets: int = 16) -> tuple[np.ndarray, np.ndarray]:
    """Un-salt: a term's global postings = salt parts in ascending salt
    order (salt ordering follows shard ordering ⇒ doc order)."""
    import pyarrow.dataset as pds

    from .codec import decode_postings

    b = _term_bucket(term, n_buckets)
    dset = pds.dataset(str(Path(global_dir) / f"bucket={b}"))
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
