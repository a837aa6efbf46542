"""Dataset-native training-data curation: quality gate → exact dedup →
near-dup drop, with NO driver-side keep/drop sets.

The composition (the reference's closest primitive is ES ``create`` =
put-if-absent, ``/root/reference/asset/elasticsearch_index_selector/index.js:83-84``;
the rest is the standard corpus-curation stack):

1. **One shared tokenize pass** over the corpus emits per-doc rows
   ``(doc_id, lang, token_count, quality, sha256, shingles:list<uint64>)``
   — every downstream gate reads these rows; the text is tokenized
   exactly once.  The rows are spilled to partitioned parquet (consumed
   by two branches; a parquet spill is the resumable 100-TB shape, not an
   object-store pin of the whole corpus).
2. **Near-dup branch**: explode the shingle lists (vectorized offsets
   kernel) → bucketed pair emission/count (`ops.dedup`) → ``doc_b`` of
   every Jaccard ≥ threshold pair becomes a drop row.
3. **Survivor branch**: one sha-bucketed exchange keeps the min-id row
   per content hash (exact dedup) and filters the quality gate as a
   column predicate.
4. **Anti-join**: survivors ∪ drop rows, keyed by ``doc_id % 64``; each
   bucket group filters its survivors against its drop ids vectorized.

Every gate is a Dataset→Dataset stage; the only driver materialization
is the final (survivor-sized) result.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..analysis.tokenizer import _STOPWORDS
from ..ops import dedup as dd
from ..ops import textstats as ts_ops

_DIGITS_RE = re.compile(r"^[0-9]+$")

N_JOIN_BUCKETS = 64


class CurationStats:
    """map_batches stage: the shared tokenize pass (step 1 above).

    Fully vectorized: ONE Arrow-kernel tokenize per batch feeds token /
    stopword / digit counts (per-distinct-term flags + bincounts), the
    shingle polynomial (``ops.dedup.shingles_from_codes``), and the
    quality score; sha256 runs over zero-copy Arrow buffer slices."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 keep_cols: tuple[str, ...] = ("lang",), shingle_n: int = 3):
        self.text_col, self.id_col = text_col, id_col
        self.keep_cols = keep_cols
        self.shingle_n = shingle_n
        self._hash_cache: dict = {}
        self._flag_cache: dict = {}

    def _term_flags(self, terms: list[str]) -> tuple[np.ndarray, np.ndarray]:
        sw = np.empty(len(terms), dtype=bool)
        dg = np.empty(len(terms), dtype=bool)
        cache = self._flag_cache
        for i, t in enumerate(terms):
            f = cache.get(t)
            if f is None:
                f = cache[t] = (t in _STOPWORDS, bool(_DIGITS_RE.match(t)))
            sw[i], dg[i] = f
        return sw, dg

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..index.build import sha_nbytes_arrow, tokenize_codes_arrow

        text = batch.column(self.text_col)
        n = batch.num_rows
        terms, codes, doc_rel, dls = tokenize_codes_arrow(text, "simple", 1, 64, {})
        tc = np.asarray(dls, dtype=np.int64)
        sw_mask, dg_mask = self._term_flags(terms)
        if len(codes):
            sw = np.bincount(doc_rel[sw_mask[codes]], minlength=n).astype(np.int64)
            dg = np.bincount(doc_rel[dg_mask[codes]], minlength=n).astype(np.int64)
        else:
            sw = np.zeros(n, dtype=np.int64)
            dg = np.zeros(n, dtype=np.int64)
        quality = ts_ops.quality_score(tc, dg, sw)
        shas, _ = sha_nbytes_arrow(text)
        d, h = dd.shingles_from_codes(
            terms, codes, doc_rel, self.shingle_n, self._hash_cache
        )
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(np.bincount(d, minlength=n), out=offsets[1:])
        shingles = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(h, pa.uint64())
        )
        cols = {"doc_id": batch.column(self.id_col)}
        for c in self.keep_cols:
            cols[c] = batch.column(c)
        cols.update(
            {
                "token_count": pa.array(tc),
                "quality": pa.array(quality),
                "sha": pa.array(shas, pa.string()),
                "shingles": shingles,
            }
        )
        return pa.table(cols)


def _explode_shingles(batch: pa.Table) -> pa.Table:
    arr = batch.column("shingles").combine_chunks()
    offs = arr.offsets.to_numpy()
    counts = np.diff(offs).astype(np.int64)
    doc = np.repeat(batch.column("doc_id").to_numpy(), counts)
    return pa.table(
        {
            "doc_id": pa.array(doc, pa.int64()),
            "shingle": pa.array(arr.values.to_numpy(zero_copy_only=False), pa.uint64()),
            "sz": pa.array(np.repeat(counts, counts), pa.int64()),
        }
    )


_OUT_TYPES = {
    "doc_id": pa.int64(),
    "lang": pa.string(),
    "token_count": pa.int64(),
    "side": pa.int8(),
    "jbucket": pa.int32(),
}


def _tagged(doc_id: np.ndarray, lang, token_count, side: int) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(doc_id, pa.int64()),
            "lang": lang if lang is not None else pa.array([""] * len(doc_id), pa.string()),
            "token_count": token_count
            if token_count is not None
            else pa.array(np.zeros(len(doc_id), np.int64)),
            "side": pa.array(np.full(len(doc_id), side, np.int8)),
            "jbucket": pa.array((doc_id % N_JOIN_BUCKETS).astype(np.int32)),
        }
    )


def _empty_tagged() -> pa.Table:
    return pa.table({c: pa.array([], t) for c, t in _OUT_TYPES.items()})


SPILL_MANIFEST = "_SPILL_MANIFEST.json"


def _spill_fingerprint(files: list[str], text_col: str, id_col: str,
                       shingle_n: int, keep_cols: tuple[str, ...]) -> dict:
    import os

    return {
        "text_col": text_col,
        "id_col": id_col,
        "shingle_n": shingle_n,
        "keep_cols": list(keep_cols),
        "files": {
            os.path.basename(f): [os.path.getmtime(f), os.path.getsize(f)]
            for f in files
        },
    }


def spill_curation_stats(
    input_path: str,
    spill_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    keep_cols: tuple[str, ...] = ("lang",),
    resume: bool = True,
) -> str:
    """The tokenize pass as a RESUMABLE checkpoint: one Ray task per
    input parquet file writes ``spill_dir/stats-<file>`` atomically
    (tmp + rename, presence = done — the index build's crash-resume
    shape); a killed run re-does only the missing files.  A fingerprint
    manifest (input file mtimes/sizes + tokenize params) guards against
    resuming across a changed corpus or config — any mismatch clears the
    spill and re-runs everything."""
    import glob
    import json
    import os
    import shutil

    files = (
        sorted(glob.glob(os.path.join(input_path, "*.parquet")))
        if os.path.isdir(input_path) else [input_path]
    )
    if not files:
        raise FileNotFoundError(f"no parquet under {input_path}")
    fp = _spill_fingerprint(files, text_col, id_col, shingle_n, keep_cols)
    man_path = os.path.join(spill_dir, SPILL_MANIFEST)
    if os.path.exists(man_path) and resume:
        old = json.loads(open(man_path).read())
        if old != fp:
            shutil.rmtree(spill_dir)
    elif os.path.exists(spill_dir) and not resume:
        shutil.rmtree(spill_dir)
    os.makedirs(spill_dir, exist_ok=True)
    if not os.path.exists(man_path):
        # manifest first: outputs are only trusted under a matching
        # fingerprint, so a half-written spill never masquerades as done
        with open(man_path + ".tmp", "w") as f:
            json.dump(fp, f)
        os.replace(man_path + ".tmp", man_path)
    pending = [
        f for f in files
        if not os.path.exists(
            os.path.join(spill_dir, f"stats-{os.path.basename(f)}")
        )
    ]
    if pending:
        import ray as _ray

        @_ray.remote
        def one_file(src: str) -> str:
            import pyarrow.parquet as pq

            cols = [id_col, text_col, *[c for c in keep_cols]]
            t = pq.read_table(src, columns=cols)
            out = CurationStats(text_col, id_col, keep_cols, shingle_n)(t)
            dst = os.path.join(
                spill_dir, f"stats-{os.path.basename(src)}"
            )
            pq.write_table(out, dst + ".tmp")
            os.replace(dst + ".tmp", dst)
            return dst

        _ray.get([one_file.remote(f) for f in pending])
    return spill_dir


def curate(
    ds,
    spill_dir: str,
    min_quality: float = 0.55,
    jacc_threshold: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
    input_path: str | None = None,
):
    """→ Dataset(doc_id, lang, token_count): curated survivors.

    ``spill_dir``: directory for the shared-stats parquet spill (caller
    owns cleanup — at scale this intermediate doubles as a resumable
    checkpoint of the tokenize pass).  Pass ``input_path`` (the corpus
    parquet file/dir ``ds`` was read from) to run the tokenize pass
    through :func:`spill_curation_stats` — per-file tasks with
    presence-based crash resume; without it the spill is a plain
    one-shot Dataset write."""
    if input_path is not None:
        spill_curation_stats(input_path, spill_dir, text_col, id_col)
    else:
        ds.map_batches(
            CurationStats(text_col, id_col), batch_format="pyarrow",
            zero_copy_batch=True,
        ).write_parquet(spill_dir)
    # column-pruned reads per branch: the survivor branch must never pay
    # the shingle-list decode, the near-dup branch never the stats.  Few,
    # larger blocks: the per-doc rows are small and every downstream
    # exchange pays per-block task overhead (measured: 64-block inputs
    # made the 4 sort exchanges dominate wall time at ~300ms of actual
    # CPU) — at larger corpus scale Ray splits blocks dynamically anyway.
    from pathlib import Path

    read_blocks = max(4, min(16, len(list(Path(spill_dir).glob("*.parquet")))))
    stats = rd.read_parquet(
        spill_dir,
        columns=["doc_id", "lang", "token_count", "quality", "sha"],
        override_num_blocks=read_blocks,
    )

    # near-dup branch: doc_b of every Jaccard >= threshold pair
    shingle_rows = rd.read_parquet(
        spill_dir, columns=["doc_id", "shingles"], override_num_blocks=read_blocks
    ).map_batches(_explode_shingles, batch_format="pyarrow", zero_copy_batch=True)
    pairs = dd._bucketed_emit_pairs(shingle_rows, "shingle", max_shingle_df,
                                    carry_sz=True)

    def finish(pair: np.ndarray, common: np.ndarray, szsum: np.ndarray) -> pa.Table:
        jacc = common / (szsum - common)
        drop = (pair[jacc >= jacc_threshold] & np.int64(0xFFFFFFFF)).astype(np.int64)
        drop = np.unique(drop)
        return _tagged(drop, None, None, side=1)

    drops = dd._bucketed_pair_counts(pairs, finish, carry_szsum=True)

    def norm_tagged(b: pa.Table) -> pa.Table:
        # an all-filtered upstream can emit empty blocks with upstream
        # schema; pin the union schema
        if b.num_rows == 0 or "side" not in b.column_names:
            return _empty_tagged()
        return b.select(list(_OUT_TYPES))

    drops = drops.map_batches(norm_tagged, batch_format="pyarrow", zero_copy_batch=True)

    # survivor branch: min-id per sha (exact dedup) + quality gate
    def add_sha_bucket(b: pa.Table) -> pa.Table:
        bucket = [int(s[:2], 16) for s in b.column("sha").to_pylist()]
        return b.append_column("sbucket", pa.array(bucket, pa.int32()))

    def keep_first(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            g, sort_keys=[("sha", "ascending"), ("doc_id", "ascending")]
        )
        g = g.take(order)
        shas = g.column("sha").to_pylist()
        first = [i == 0 or shas[i] != shas[i - 1] for i in range(len(shas))]
        g = g.filter(pa.array(first))
        g = g.filter(pc.greater_equal(g.column("quality"), min_quality))
        ids = g.column("doc_id").to_numpy()
        return _tagged(ids, g.column("lang"), g.column("token_count"), side=0)

    survivors = (
        stats
        .map_batches(add_sha_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("sbucket")
        .map_groups(keep_first, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(norm_tagged, batch_format="pyarrow", zero_copy_batch=True)
    )

    # anti-join: survivors minus drop ids, co-located by doc_id bucket
    def anti(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy()
        ids = g.column("doc_id").to_numpy()
        drop_ids = ids[side == 1]
        keep = (side == 0) & ~np.isin(ids, drop_ids)
        out = g.filter(pa.array(keep))
        return out.select(["doc_id", "lang", "token_count"])

    return (
        survivors.union(drops)
        .groupby("jbucket")
        .map_groups(anti, batch_format="pyarrow", zero_copy_batch=True)
    )
