"""Deduplication stages: exact (sha256), n-gram Jaccard (exact),
MinHash+LSH and SimHash (near-dup).

The reference's closest primitive is ES ``create`` = put-if-absent
("first writer wins", ``/root/reference/asset/elasticsearch_index_selector/index.js:83-84``);
everything else here is the standard large-corpus dedup toolbox built
Ray-Data-first:

* **exact**: hash-partition on ``sha256(text)`` → keep min-id per group.
  One all-to-all keyed by an uniformly-distributed hash — no skew by
  construction.
* **n-gram Jaccard (exact)**: shingle → inverted shingle index
  (groupby-shingle) → co-occurrence pair counts (groupby-pair) →
  ``|A∩B| / (|A|+|B|-|A∩B|)``.  Exact, two shuffles; hot shingles can be
  df-capped (``max_shingle_df``) at scale — capping is disclosed, not
  silent, via the returned stats.
* **MinHash+LSH**: shingle→minhash→band→bucket-groupby candidates, then
  exact-Jaccard verification of candidates only.  The probabilistic scale
  path for the same question the exact pipeline answers.
* **SimHash**: 64-bit signature; near-dup candidates via 16-bit band
  blocking, verified by Hamming distance.

All hashes derive from md5/sha256 (process-stable; Python ``hash()`` is
salted and must never reach a shuffle key).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from . import to_arrow
from .textstats import clipped_tokens

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _stable_hash64(s: str) -> np.uint64:
    return np.uint64(int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little"))


# ---------------------------------------------------------------- exact


def sha256_batch(batch: pa.Table, text_col: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    from ..index.build import sha_nbytes_arrow

    shas, _ = sha_nbytes_arrow(batch.column(text_col))
    return pa.table(
        {"doc_id": batch.column(id_col), "content_sha256": pa.array(shas, pa.string())}
    )


def _sha_bucket(shas: list[str]) -> pa.Array:
    # first hex byte → 256 buckets; sha is uniform so buckets balance
    return pa.array([int(h[:2], 16) for h in shas], pa.int32())


def exact_dedup_groups(ds, text_col: str = "text", id_col: str = "doc_id"):
    """→ Dataset(content_sha256, keep_id, dup_count): one row per distinct
    content; ``keep_id`` = smallest doc id (the deterministic survivor).

    Hash-bucketed reduction (one exchange over 256 keys, vectorized
    pandas groupby inside each bucket) — same result as a per-sha groupby
    without per-key task overhead."""

    def add(b: pa.Table) -> pa.Table:
        t = sha256_batch(b, text_col, id_col)
        return t.append_column("bucket", _sha_bucket(t.column("content_sha256").to_pylist()))

    def reduce_bucket(g: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "content_sha256": g.column("content_sha256").to_pylist(),
                "doc_id": g.column("doc_id").to_numpy(),
            }
        )
        out = df.groupby("content_sha256", sort=True).agg(
            keep_id=("doc_id", "min"), dup_count=("doc_id", "size")
        ).reset_index()
        return pa.table(
            {
                "content_sha256": pa.array(out["content_sha256"], pa.string()),
                "keep_id": pa.array(out["keep_id"].to_numpy(), pa.int64()),
                "dup_count": pa.array(out["dup_count"].to_numpy(), pa.int64()),
            }
        )

    return (
        ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pyarrow", zero_copy_batch=True)
    )


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """→ Dataset of surviving full rows (first-by-id per content hash)."""

    def add_sha(b: pa.Table) -> pa.Table:
        from ..index.build import sha_nbytes_arrow

        shas, _ = sha_nbytes_arrow(b.column(text_col))
        b = b.append_column("__sha", pa.array(shas, pa.string()))
        return b.append_column("bucket", _sha_bucket(shas))

    def keep_first(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("__sha", "ascending"), (id_col, "ascending")]
        )
        g = g.take(order)
        shas = g.column("__sha").to_pylist()
        first = [i == 0 or shas[i] != shas[i - 1] for i in range(len(shas))]
        return g.filter(pa.array(first)).drop_columns(["__sha", "bucket"])

    return (
        ds.map_batches(add_sha, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(keep_first, batch_format="pyarrow", zero_copy_batch=True)
    )


# generation files are written KEY-SORTED in small row groups so state
# reads prune on parquet row-group min/max statistics — a wave touches
# only the row groups its keys can live in, keeping per-wave state IO
# ∝ wave size (not corpus size) as generations accumulate
_STATE_ROW_GROUP = 8192


def _read_state_pruned(path: str, columns: list[str], key_col: str,
                       keys_sorted: np.ndarray):
    """Read only the row groups of a KEY-SORTED generation file whose
    [min, max] key range intersects the sorted probe keys (parquet
    row-group statistics; strings and uint64 both compare correctly —
    tested).  Returns None when no group survives."""
    import pyarrow.parquet as _pq

    pf = _pq.ParquetFile(path)
    md = pf.metadata
    ci = pf.schema_arrow.get_field_index(key_col)
    groups = []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(ci).statistics
        if st is None or not st.has_min_max:
            groups.append(rg)
            continue
        i = int(np.searchsorted(keys_sorted, st.min))
        if i < len(keys_sorted) and keys_sorted[i] <= st.max:
            groups.append(rg)
    if not groups:
        return None
    return pf.read_row_groups(groups, columns=columns)


def incremental_exact_dedup(
    ds,
    state_dir: str,
    run_tag: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Exact dedup of a NEW document wave against a PERSISTED signature
    store — the production daily-increment posture: a 100 TB corpus's
    prior waves are never re-scanned, only the signature buckets the new
    wave's hashes route to are read (column-pruned), and the new wave's
    winners append as one generation.

    State layout: ``{state_dir}/bucket=BBB/gen-{run_tag}.parquet`` with
    winner rows ``(content_sha256, doc_id)`` — 256 sha-prefix buckets
    (the ``exact_dedup`` exchange key), so each group task touches one
    directory.  Commit is atomic per bucket (tmp + rename, deterministic
    name) and REPLAY-SAFE: a re-run of the same ``run_tag`` reads the
    state WITHOUT its own generation, recomputes identical verdicts and
    rewrites the same winner files byte-identically (the transform /
    index-append generation pattern, ``ops/transform.py`` /
    ``index/global_merge.py``).

    Winner = the FIRST occurrence in processing order: earlier
    generations beat this wave; within the wave, smallest ``id_col``.
    Returns ``Dataset(doc_id, content_sha256, keep, dup_of)`` — one row
    per input doc; ``dup_of`` = the winner's doc id for ``keep=False``
    rows, null for winners."""
    import os

    sdir = str(state_dir)

    def add(b: pa.Table) -> pa.Table:
        t = sha256_batch(b, text_col, id_col)
        return t.append_column(
            "bucket", _sha_bucket(t.column("content_sha256").to_pylist())
        )

    def verdict(g: pa.Table) -> pa.Table:
        bucket = int(g.column("bucket")[0].as_py())
        bdir = os.path.join(sdir, f"bucket={bucket:03d}")
        own = f"gen-{run_tag}.parquet"
        order = pc.sort_indices(
            g, sort_keys=[("content_sha256", "ascending"),
                          ("doc_id", "ascending")]
        )
        g = g.take(order)
        sha_arr = np.asarray(g.column("content_sha256").to_pylist(),
                             dtype=object)
        shas = sha_arr.tolist()
        ids = g.column("doc_id").to_numpy()
        n = len(shas)
        # prior-state winners, ROW-GROUP-PRUNED by the wave's sha range
        # (gen files are sha-sorted in _STATE_ROW_GROUP-row groups, so
        # reads stay ∝ wave size as generations accumulate)
        probe = np.unique(sha_arr) if n else sha_arr
        parts_h: list[np.ndarray] = []
        parts_d: list[np.ndarray] = []
        if os.path.isdir(bdir) and n:
            for f in sorted(os.listdir(bdir)):
                # replay safety: this run's own (possibly partial)
                # generation is NOT prior state
                if not f.endswith(".parquet") or f == own:
                    continue
                t = _read_state_pruned(
                    os.path.join(bdir, f),
                    ["content_sha256", "doc_id"], "content_sha256",
                    probe,
                )
                if t is not None and t.num_rows:
                    parts_h.append(np.asarray(
                        t.column("content_sha256").to_pylist(),
                        dtype=object))
                    parts_d.append(t.column("doc_id").to_numpy())
        if parts_h:
            hh = np.concatenate(parts_h)
            dd = np.concatenate(parts_d).astype(np.int64)
            o2 = np.lexsort((dd, hh))
            hh, dd = hh[o2], dd[o2]
            first = np.ones(len(hh), dtype=bool)
            first[1:] = hh[1:] != hh[:-1]
            sk, sv = hh[first], dd[first]  # min id per sha
        else:
            sk = np.empty(0, dtype=object)
            sv = np.empty(0, dtype=np.int64)
        if len(sk):
            pos = np.searchsorted(sk, sha_arr)
            posc = np.minimum(pos, len(sk) - 1)
            in_state = sk[posc] == sha_arr
        else:
            posc = np.zeros(n, dtype=np.int64)
            in_state = np.zeros(n, dtype=bool)
        # in-batch runs (rows are (sha, id)-sorted): a run is wholly in
        # state or wholly not, so the run-start row IS the batch winner
        first = np.ones(n, dtype=bool)
        first[1:] = sha_arr[1:] != sha_arr[:-1]
        run_start = np.maximum.accumulate(
            np.where(first, np.arange(n), 0))
        keep = first & ~in_state
        dup_of = np.where(
            in_state, sv[posc] if len(sk) else 0, ids[run_start]
        ).astype(np.int64)
        has_dup = ~keep
        # commit this wave's winners as one atomic generation file
        os.makedirs(bdir, exist_ok=True)
        import pyarrow.parquet as _pq

        kt = pa.table({
            "content_sha256": pa.array(
                [shas[i] for i in range(n) if keep[i]], pa.string()),
            "doc_id": pa.array(ids[keep], pa.int64()),
        })
        tmp = os.path.join(bdir, f".{own}.tmp")
        _pq.write_table(kt, tmp, row_group_size=_STATE_ROW_GROUP)
        os.replace(tmp, os.path.join(bdir, own))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "content_sha256": pa.array(shas, pa.string()),
            "keep": pa.array(keep),
            "dup_of": pa.array(
                [int(dup_of[i]) if has_dup[i] else None for i in range(n)],
                pa.int64()),
        })

    return (
        ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(verdict, batch_format="pyarrow", zero_copy_batch=True)
    )


# ------------------------------------------------------- shingles / jaccard


_SHINGLE_A = np.uint64(0x9E3779B97F4A7C15)  # odd mixing constant


def shingle_hashes_from_tokens(
    toks: list[str], n: int = 3, _cache: dict | None = None
) -> np.ndarray:
    """Sorted distinct uint64 hashes of the token list's n-gram shingles.

    Vectorized: per-token md5 hashes (memoized in ``_cache`` — tokens
    repeat heavily across a corpus) combined with a degree-(n-1)
    polynomial in odd constants over uint64 wraparound; one numpy pass
    per document instead of one md5 per shingle."""
    if len(toks) < n:
        return np.empty(0, dtype=np.uint64)
    cache = _cache if _cache is not None else {}
    th = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            h = cache[t] = _stable_hash64(t)
        th[i] = h
    acc = th[: len(toks) - n + 1].copy()
    for j in range(1, n):
        acc *= _SHINGLE_A
        acc += th[j : len(toks) - n + 1 + j]
    return np.unique(acc)


def doc_shingle_hashes(
    text: str, n: int = 3, _cache: dict | None = None
) -> np.ndarray:
    """Shingle hashes of the doc's contract tokenization (see
    :func:`shingle_hashes_from_tokens`)."""
    return shingle_hashes_from_tokens(clipped_tokens(text), n, _cache)


def batch_shingle_hashes(
    text: "pa.Array | pa.ChunkedArray", n: int, hash_cache: dict
) -> tuple[np.ndarray, np.ndarray, int]:
    """Every doc's DISTINCT shingle hashes in one vectorized pass →
    (doc_rel, hashes, n_docs), sorted by (doc, hash).

    Tokenization runs through the index build's Arrow kernel
    (``tokenize_codes_arrow``); per-token md5 hashes are computed once
    per DISTINCT term (memoized across batches); the n-gram polynomial
    and the per-doc dedupe are flat numpy over the whole batch.  Values
    are identical to :func:`doc_shingle_hashes` per doc (tested)."""
    from ..index.build import tokenize_codes_arrow

    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_docs = len(text)
    terms, codes, doc_rel, _ = tokenize_codes_arrow(text, "simple", 1, 64, {})
    d, h = shingles_from_codes(terms, codes, doc_rel, n, hash_cache)
    return d, h, n_docs


def shingles_from_codes(
    terms: list[str], codes: np.ndarray, doc_rel: np.ndarray, n: int,
    hash_cache: dict,
) -> tuple[np.ndarray, np.ndarray]:
    """Core of :func:`batch_shingle_hashes` over pre-tokenized codes —
    lets a stage that already tokenized (e.g. curation stats) reuse the
    pass."""
    m = len(codes) - n + 1
    if m <= 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    th_vocab = np.empty(len(terms), dtype=np.uint64)
    for i, t in enumerate(terms):
        hh = hash_cache.get(t)
        if hh is None:
            hh = hash_cache[t] = _stable_hash64(t)
        th_vocab[i] = hh
    th = th_vocab[codes]
    with np.errstate(over="ignore"):
        acc = th[:m].copy()
        for j in range(1, n):
            acc *= _SHINGLE_A
            acc += th[j : m + j]
    valid = doc_rel[:m] == doc_rel[n - 1 :]
    h = acc[valid]
    d = doc_rel[:m][valid]
    order = np.lexsort((h, d))
    d, h = d[order], h[order]
    if len(d):
        dup = np.concatenate([[False], (d[1:] == d[:-1]) & (h[1:] == h[:-1])])
        d, h = d[~dup], h[~dup]
    return d, h


class _ShingleRows:
    """Doc → one row per distinct shingle hash, carrying ``sz`` = the
    doc's distinct-shingle count on every row — |A| is known at emission
    time, so no per-doc size lookup (driver array or join) is ever needed
    downstream."""

    def __init__(self, text_col: str, id_col: str, n: int):
        self.text_col, self.id_col, self.n = text_col, id_col, n
        self._cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        d, h, n_docs = batch_shingle_hashes(
            batch.column(self.text_col), self.n, self._cache
        )
        ids = np.asarray(batch.column(self.id_col).to_pylist(), dtype=np.int64)
        assert n_docs == len(ids)
        counts = np.bincount(d, minlength=n_docs).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids[d], pa.int64()),
                "shingle": pa.array(h, pa.uint64()),
                "sz": pa.array(counts[d], pa.int64()),
            }
        )


_PAIR_FIELDS = {
    "doc_a": pa.int64(),
    "doc_b": pa.int64(),
    "common": pa.int64(),
    "jacc": pa.float64(),
    "hamming": pa.int64(),
}


def _canonical_pairs(out: pa.Table, cols: list[str]) -> pa.Table:
    """An all-filtered pipeline yields empty blocks carrying upstream
    schema; normalize to the declared output schema."""
    if out.num_rows == 0 and out.column_names != cols:
        return pa.table({c: pa.array([], _PAIR_FIELDS[c]) for c in cols})
    return out


def _pair_key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.int64) << np.int64(32)) | b.astype(np.int64)


N_PAIR_BUCKETS = 64


def _add_bucket(batch: pa.Table) -> pa.Table:
    pair = batch.column("pair").to_numpy()
    return batch.append_column(
        "bucket", pa.array((pair % N_PAIR_BUCKETS).astype(np.int32))
    )


def _bucketed_pair_counts(pairs_ds, finish_fn, carry_szsum: bool = False):
    """Aggregate duplicate pair rows WITHOUT a per-key groupby: hash rows
    into a fixed bucket count, groupby(bucket) (tiny key cardinality, one
    all-to-all), then a vectorized ``np.unique(return_counts)`` inside
    each bucket group — where a per-pair sort aggregate took 8.5 s on
    1.3M rows, this takes well under a second.  ``finish_fn(pair, count)
    → pa.Table`` (or ``finish_fn(pair, count, szsum)`` with
    ``carry_szsum``; every duplicate of a pair carries the same szsum, so
    any representative works) runs inside the group so only survivors
    leave the stage."""

    def reduce_bucket(g: pa.Table) -> pa.Table:
        pair = g.column("pair").to_numpy()
        if carry_szsum:
            uniq, first, counts = np.unique(
                pair, return_index=True, return_counts=True
            )
            szsum = g.column("szsum").to_numpy()[first]
            return finish_fn(uniq, counts.astype(np.int64), szsum)
        uniq, counts = np.unique(pair, return_counts=True)
        return finish_fn(uniq, counts.astype(np.int64))

    return (
        pairs_ds.map_batches(_add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pyarrow", zero_copy_batch=True)
    )


def _emit_pairs_keyed(g: pa.Table, key_col: str,
                      max_group: int | None) -> pa.Table:
    """All C(run, 2) pairs of each equal-key run of (key, doc) rows —
    the `_bucketed_emit_pairs` in-bucket kernel as a standalone (sorted
    run walk, one triu kernel per distinct run length, duplicate
    (key, doc) rows dropped, runs above ``max_group`` skipped)."""
    key = g.column(key_col).to_numpy()
    doc = g.column("doc_id").to_numpy()
    order = np.lexsort((doc, key))
    key, doc = key[order], doc[order]
    if len(key):
        dup = (key[1:] == key[:-1]) & (doc[1:] == doc[:-1])
        if dup.any():
            keepm = np.concatenate([[True], ~dup])
            key, doc = key[keepm], doc[keepm]
    if not len(key):
        return pa.table({"pair": pa.array([], pa.int64())})
    starts = np.nonzero(np.concatenate([[True], key[1:] != key[:-1]]))[0]
    lens = np.diff(np.concatenate([starts, [len(key)]]))
    keep = lens >= 2
    if max_group is not None:
        keep &= lens <= max_group
    kept_starts, kept_lens = starts[keep], lens[keep]
    out: list[np.ndarray] = []
    for length in np.unique(kept_lens).tolist():
        runs = kept_starts[kept_lens == length]
        idx = runs[:, None] + np.arange(length)
        dm = doc[idx]
        ai, bi = np.triu_indices(length, k=1)
        out.append(_pair_key(dm[:, ai].ravel(), dm[:, bi].ravel()))
    pairs = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
    return pa.table({"pair": pa.array(pairs, pa.int64())})


def _emit_pairs(g: pa.Table, max_group: int | None) -> pa.Table:
    ids = np.unique(g.column("doc_id").to_numpy())
    if len(ids) < 2 or (max_group is not None and len(ids) > max_group):
        return pa.table({"pair": pa.array([], pa.int64())})
    ai, bi = np.triu_indices(len(ids), k=1)
    return pa.table({"pair": pa.array(_pair_key(ids[ai], ids[bi]), pa.int64())})


def _bucketed_emit_pairs(rows_ds, key_col: str, max_group: int | None,
                         carry_sz: bool = False):
    """Co-occurrence pair emission without a per-key groupby: bucket the
    key space (fixed small cardinality → cheap exchange), then inside
    each bucket sort once and walk equal-key runs vectorized.  Equivalent
    to ``groupby(key).map_groups(_emit_pairs)`` but with 64 groups
    instead of one per distinct shingle/band.  With ``carry_sz`` the rows
    carry a per-doc ``sz`` column and each emitted pair carries
    ``szsum = sz_a + sz_b`` — sizes travel WITH the pairs, so the finish
    stage never needs a per-doc lookup (no O(N) driver state)."""

    def add_bucket(b: pa.Table) -> pa.Table:
        k = b.column(key_col).to_numpy()
        return b.append_column(
            "bucket", pa.array((k % np.uint64(N_PAIR_BUCKETS)).astype(np.int32))
        )

    def emit(g: pa.Table) -> pa.Table:
        key = g.column(key_col).to_numpy()
        doc = g.column("doc_id").to_numpy()
        sz = g.column("sz").to_numpy() if carry_sz else None
        order = np.lexsort((doc, key))
        key, doc = key[order], doc[order]
        if carry_sz:
            sz = sz[order]
        # drop duplicate (key, doc) rows up front so every run has
        # distinct docs — lets the pair kernel below batch runs by length
        dup = (key[1:] == key[:-1]) & (doc[1:] == doc[:-1])
        if dup.any():
            keepm = np.concatenate([[True], ~dup])
            key, doc = key[keepm], doc[keepm]
            if carry_sz:
                sz = sz[keepm]
        starts = np.nonzero(np.concatenate([[True], key[1:] != key[:-1]]))[0]
        lens = np.diff(np.concatenate([starts, [len(key)]]))
        keep = lens >= 2
        if max_group is not None:
            keep &= lens <= max_group
        kept_starts, kept_lens = starts[keep], lens[keep]
        out: list[np.ndarray] = []
        out_sz: list[np.ndarray] = []
        # vectorized across runs: one triu kernel per DISTINCT run length
        # (dozens of lengths, not 10^5 runs — the former per-run Python
        # loop was the stage's hot spot)
        for length in np.unique(kept_lens).tolist():
            runs = kept_starts[kept_lens == length]
            idx = runs[:, None] + np.arange(length)
            dm = doc[idx]
            ai, bi = np.triu_indices(length, k=1)
            out.append(_pair_key(dm[:, ai].ravel(), dm[:, bi].ravel()))
            if carry_sz:
                sm = sz[idx]
                out_sz.append((sm[:, ai] + sm[:, bi]).ravel())
        pairs = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
        cols = {"pair": pa.array(pairs, pa.int64())}
        if carry_sz:
            szsum = np.concatenate(out_sz) if out_sz else np.empty(0, np.int64)
            cols["szsum"] = pa.array(szsum, pa.int64())
        return pa.table(cols)

    return (
        rows_ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(emit, batch_format="pyarrow", zero_copy_batch=True)
    )


def jaccard_pairs_ds(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.4,
    max_shingle_df: int | None = None,
):
    """Exact n-gram Jaccard similar pairs as a streaming Dataset
    (doc_a, doc_b, common, jacc) — see :func:`jaccard_pairs`.

    Single pass, no driver state: shingle rows carry |A| (``sz``), pair
    rows carry ``szsum = |A|+|B|``, so the finish stage computes
    ``jacc = common / (szsum - common)`` entirely inside its bucket.
    """
    shingles = ds.map_batches(
        _ShingleRows(text_col, id_col, n), batch_format="pyarrow"
    )
    pairs = _bucketed_emit_pairs(shingles, "shingle", max_shingle_df, carry_sz=True)

    def finish(pair: np.ndarray, common: np.ndarray, szsum: np.ndarray) -> pa.Table:
        a = (pair >> np.int64(32)).astype(np.int64)
        b = (pair & np.int64(0xFFFFFFFF)).astype(np.int64)
        jacc = common / (szsum - common)
        keep = jacc >= threshold
        return pa.table(
            {
                "doc_a": pa.array(a[keep], pa.int64()),
                "doc_b": pa.array(b[keep], pa.int64()),
                "common": pa.array(common[keep], pa.int64()),
                "jacc": pa.array(jacc[keep], pa.float64()),
            }
        )

    return _bucketed_pair_counts(pairs, finish, carry_szsum=True)


def jaccard_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.4,
    max_shingle_df: int | None = None,
):
    """Exact n-gram Jaccard similar pairs → pa.Table(doc_a, doc_b, common, jacc).

    Requires doc ids < 2^31 (pair key packing).  ``max_shingle_df`` drops
    shingle groups larger than the cap (scale valve; None = exact).
    """
    out = to_arrow(
        jaccard_pairs_ds(ds, text_col, id_col, n, threshold, max_shingle_df)
    )
    out = _canonical_pairs(out, ["doc_a", "doc_b", "common", "jacc"])
    return out.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


# ------------------------------------------------------------ minhash/LSH


def _sigs_reduceat(a: np.ndarray, b: np.ndarray, flat: np.ndarray,
                   starts: np.ndarray, chunk: int = 8) -> np.ndarray:
    """Per-doc MinHash signatures: min over each doc's shingle segment of
    the universal hashes ``a*h + b`` (uint64 wraparound) →
    (n_docs, num_perm).

    Computed ``chunk`` permutations at a time so the intermediate
    (chunk × n_shingles) product stays cache-resident — the full
    (num_perm × n_shingles) matrix round-trips DRAM and measures ~4×
    slower at typical batch shapes."""
    num_perm = len(a)
    out = np.empty((len(starts), num_perm), np.uint64)
    with np.errstate(over="ignore"):
        for i in range(0, num_perm, chunk):
            vals = a[i:i + chunk, None] * flat[None, :] + b[i:i + chunk, None]
            out[:, i:i + chunk] = np.minimum.reduceat(vals, starts, axis=1).T
    return out


class MinHashBands:
    """Doc → (band_key, doc_id) rows.  Permutations are universal hashes
    ``a*h + b`` over uint64 wraparound, seeded deterministically."""

    def __init__(self, text_col: str, id_col: str, n: int, num_perm: int,
                 bands: int, seed: int = 7):
        assert num_perm % bands == 0
        self.text_col, self.id_col, self.n = text_col, id_col, n
        self.num_perm, self.bands = num_perm, bands
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 61, num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 1 << 61, num_perm, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray | None:
        h = doc_shingle_hashes(text, self.n)
        if len(h) == 0:
            return None
        # (num_perm, n_shingles) wraparound products; min per row
        vals = (self.a[:, None] * h[None, :] + self.b[:, None]) & _MASK64
        return vals.min(axis=1)

    def signatures_batch(self, texts, cache: dict) -> tuple[np.ndarray, np.ndarray]:
        """All signatures in one kernel: every doc's shingle hashes from
        the vectorized batch pass, one (num_perm × total) product,
        ``minimum.reduceat`` at doc boundaries.  Returns (kept doc
        positions, (n_kept, num_perm))."""
        if isinstance(texts, list):
            texts = pa.array(texts, pa.string())
        d, flat, n_docs = batch_shingle_hashes(texts, self.n, cache)
        counts = np.bincount(d, minlength=n_docs)
        pos = np.nonzero(counts > 0)[0]
        if len(flat) == 0:
            return pos, np.empty((0, self.num_perm), np.uint64)
        starts = np.concatenate([[0], np.cumsum(counts[pos])[:-1]])
        sigs = _sigs_reduceat(self.a, self.b, flat, starts)  # (n_kept, num_perm)
        return pos, sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col).to_pylist(), dtype=np.int64)
        if not hasattr(self, "_cache"):
            self._cache: dict = {}
        pos, sigs = self.signatures_batch(
            batch.column(self.text_col), self._cache
        )
        acc = _band_keys(sigs, self.bands)
        return pa.table(
            {
                "band_key": pa.array(acc.reshape(-1), pa.uint64()),
                "doc_id": pa.array(np.repeat(ids[pos], self.bands), pa.int64()),
            }
        )


def _band_keys(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, num_perm) signatures → (n_docs, bands) uint64 band keys:
    a vectorized polynomial mix over each band's r values, salted by band
    index.  ANY deterministic function of the band slice works: equal
    band vectors always collide (recall is unaffected), unequal ones that
    spuriously collide only add candidates that exact verification
    removes.  This replaces one md5 call per (doc, band) — formerly the
    signature stage's hot spot."""
    n, num_perm = sigs.shape
    r = num_perm // bands
    bv = sigs.reshape(n, bands, r)
    with np.errstate(over="ignore"):
        acc = np.full((n, bands), np.uint64(0x9E3779B97F4A7C15))
        for j in range(r):
            acc = acc * _SHINGLE_A + bv[:, :, j]
        acc ^= np.arange(1, bands + 1, dtype=np.uint64)[None, :] * np.uint64(
            0xFF51AFD7ED558CCD
        )
        # avalanche so low bits (the bucket key) mix the whole value
        acc ^= acc >> np.uint64(33)
        acc = acc * np.uint64(0xC4CEB9FE1A85EC53)
        acc ^= acc >> np.uint64(29)
    return acc


class MinHashSpill:
    """The ONE tokenize pass of the spill-based MinHash pipeline: per doc
    emit ``(doc_id, sig list<uint64>, shingles list<uint64>)``.

    The output is written to partitioned parquet once and consumed three
    times with column pruning — band keys + candidates from ``sig``,
    signature pre-filter from ``sig``, exact verification from
    ``shingles`` — so no stage ever re-tokenizes the corpus (the former
    verify path re-tokenized every candidate doc; at 1M docs that made
    verification ~2/3 of a 182 s run).  Docs with fewer than ``n`` tokens
    emit empty lists and drop out of every downstream stage naturally."""

    def __init__(self, mh: "MinHashBands"):
        self.mh = mh
        self._cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        mh = self.mh
        ids = np.asarray(
            batch.column(mh.id_col).to_pylist(), dtype=np.int64
        )
        text = batch.column(mh.text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        d, flat, n_docs = batch_shingle_hashes(text, mh.n, self._cache)
        counts = np.bincount(d, minlength=n_docs).astype(np.int64)
        sh_offs = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(counts, out=sh_offs[1:])
        shingles = pa.ListArray.from_arrays(
            pa.array(sh_offs, pa.int32()), pa.array(flat, pa.uint64())
        )
        pos = np.nonzero(counts > 0)[0]
        if len(pos):
            sigs = _sigs_reduceat(mh.a, mh.b, flat, sh_offs[pos])
        else:
            sigs = np.empty((0, mh.num_perm), np.uint64)
        sig_counts = np.zeros(n_docs, dtype=np.int64)
        sig_counts[pos] = mh.num_perm
        sig_offs = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(sig_counts, out=sig_offs[1:])
        sig_arr = pa.ListArray.from_arrays(
            pa.array(sig_offs, pa.int32()),
            pa.array(sigs.reshape(-1), pa.uint64()),
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sig": sig_arr,
                "shingles": shingles,
            }
        )


def doc_pairs_map(cand_pairs: np.ndarray) -> dict[int, np.ndarray]:
    """doc → array of packed pairs it participates in, vectorized: sort
    the doubled (doc, pair) rows once and slice per-doc runs (a per-pair
    Python setdefault loop took ~40 s at millions of candidates)."""
    a = (cand_pairs >> np.int64(32)).astype(np.int64)
    b = (cand_pairs & np.int64(0xFFFFFFFF)).astype(np.int64)
    docs2 = np.concatenate([a, b])
    pairs2 = np.concatenate([cand_pairs, cand_pairs])
    order = np.argsort(docs2, kind="stable")
    docs2, pairs2 = docs2[order], pairs2[order]
    if len(docs2) == 0:
        return {}
    starts = np.nonzero(np.concatenate([[True], docs2[1:] != docs2[:-1]]))[0]
    ends = np.concatenate([starts[1:], [len(docs2)]])
    return {
        int(docs2[lo]): pairs2[lo:hi]
        for lo, hi in zip(starts.tolist(), ends.tolist())
    }


class _CandidateShingleRows:
    """For each doc that participates in ≥1 candidate pair, re-emit its
    distinct shingle hashes once PER PAIR it belongs to, keyed by the
    pair.  The broadcast small side is the candidate doc→pairs map
    (O(#candidate pairs)), never the corpus."""

    def __init__(self, doc_pairs_ref, text_col: str, id_col: str, n: int):
        self.doc_pairs_ref = doc_pairs_ref
        self.text_col, self.id_col, self.n = text_col, id_col, n
        self._map = None
        self._cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._map is None:
            self._map = ray.get(self.doc_pairs_ref)
        out_pair: list[np.ndarray] = []
        out_sh: list[np.ndarray] = []
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        for i, d in enumerate(ids):
            pairs = self._map.get(int(d))
            if pairs is None:
                continue
            h = doc_shingle_hashes(texts[i], self.n, self._cache)
            if len(h) == 0:
                continue
            out_pair.append(np.repeat(pairs, len(h)))
            out_sh.append(np.tile(h, len(pairs)))
        pair = np.concatenate(out_pair) if out_pair else np.empty(0, np.int64)
        sh = np.concatenate(out_sh) if out_sh else np.empty(0, np.uint64)
        return pa.table(
            {
                "pair": pa.array(pair, pa.int64()),
                "shingle": pa.array(sh, pa.uint64()),
            }
        )


def verify_pairs_jaccard(ds, cand_pairs: np.ndarray, text_col: str = "text",
                         id_col: str = "doc_id", n: int = 3,
                         threshold: float = 0.4):
    """Exact-Jaccard verification of candidate pairs WITHOUT whole-corpus
    driver state → Dataset(doc_a, doc_b, jacc).

    A pair's keyed rows are A's distinct shingles ++ B's distinct
    shingles, so per pair ``total = |A| + |B|`` and shingle values seen
    twice = ``|A ∩ B|``; ``jacc = common / (total - common)``.  One
    pair-hash-bucketed exchange; per-bucket work is one lexsort +
    run-length kernels.  The only broadcast is the candidate doc→pairs
    map (the small side by construction — candidates are the output
    scale, not the corpus scale).
    """
    doc_pairs_ref = ray.put(doc_pairs_map(cand_pairs))

    rows = ds.map_batches(
        _CandidateShingleRows(doc_pairs_ref, text_col, id_col, n),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def reduce_bucket(g: pa.Table) -> pa.Table:
        pair = g.column("pair").to_numpy()
        sh = g.column("shingle").to_numpy()
        order = np.lexsort((sh, pair))
        p, s = pair[order], sh[order]
        uniq, total = np.unique(p, return_counts=True)
        # duplicate (pair, shingle) adjacency == shingle present in BOTH
        # docs (each doc's shingles are distinct)
        dup = (p[1:] == p[:-1]) & (s[1:] == s[:-1])
        common = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(common, np.searchsorted(uniq, p[1:][dup]), 1)
        jacc = common / (total - common)
        keep = jacc >= threshold
        up = uniq[keep]
        return pa.table(
            {
                "doc_a": pa.array((up >> np.int64(32)).astype(np.int64), pa.int64()),
                "doc_b": pa.array((up & np.int64(0xFFFFFFFF)).astype(np.int64), pa.int64()),
                "jacc": pa.array(jacc[keep], pa.float64()),
            }
        )

    return (
        rows.map_batches(_add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pyarrow", zero_copy_batch=True)
    )


def _jaccard_reduce_bucket(threshold: float):
    """Shared in-bucket reducer for pair-keyed (pair, shingle) rows: one
    lexsort; duplicate (pair, shingle) adjacency == shingle present in
    BOTH docs (each doc's shingles are distinct)."""

    def reduce_bucket(g: pa.Table) -> pa.Table:
        pair = g.column("pair").to_numpy()
        sh = g.column("shingle").to_numpy()
        order = np.lexsort((sh, pair))
        p, s = pair[order], sh[order]
        uniq, total = np.unique(p, return_counts=True)
        dup = (p[1:] == p[:-1]) & (s[1:] == s[:-1])
        common = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(common, np.searchsorted(uniq, p[1:][dup]), 1)
        jacc = common / (total - common)
        keep = jacc >= threshold
        up = uniq[keep]
        return pa.table(
            {
                "doc_a": pa.array((up >> np.int64(32)).astype(np.int64), pa.int64()),
                "doc_b": pa.array((up & np.int64(0xFFFFFFFF)).astype(np.int64), pa.int64()),
                "jacc": pa.array(jacc[keep], pa.float64()),
            }
        )

    return reduce_bucket


class _SpillPairRows:
    """Candidate docs' spilled shingle lists → (pair, shingle) rows, all
    vectorized: the per-(doc, pair) row blocks are built with grouped
    repeat/gather index arithmetic — no per-doc Python emission loops,
    and no tokenization (the shingles were spilled by the one shared
    tokenize pass)."""

    def __init__(self, doc_pairs_ref):
        self.doc_pairs_ref = doc_pairs_ref
        self._map = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._map is None:
            self._map = ray.get(self.doc_pairs_ref)
        mp = self._map
        ids = batch.column("doc_id").to_numpy()
        arr = batch.column("shingles").combine_chunks()
        offs = arr.offsets.to_numpy().astype(np.int64)
        vals = arr.values.to_numpy(zero_copy_only=False)
        sel = [i for i, d in enumerate(ids.tolist()) if int(d) in mp]
        if not sel:
            return pa.table(
                {"pair": pa.array([], pa.int64()),
                 "shingle": pa.array([], pa.uint64())}
            )
        sel = np.asarray(sel, dtype=np.int64)
        pair_lists = [mp[int(ids[i])] for i in sel.tolist()]
        n_pairs = np.fromiter((len(p) for p in pair_lists), np.int64, len(sel))
        all_pairs = np.concatenate(pair_lists)
        sz = offs[sel + 1] - offs[sel]
        # block per (doc, pair): start = doc's shingle offset, len = sz
        block_starts = np.repeat(offs[sel], n_pairs)
        block_lens = np.repeat(sz, n_pairs)
        total = int(block_lens.sum())
        if total == 0:
            return pa.table(
                {"pair": pa.array([], pa.int64()),
                 "shingle": pa.array([], pa.uint64())}
            )
        cum = np.cumsum(block_lens)
        intra = np.arange(total, dtype=np.int64) - np.repeat(
            cum - block_lens, block_lens
        )
        idx = np.repeat(block_starts, block_lens) + intra
        out_pair = np.repeat(all_pairs, block_lens)
        return pa.table(
            {
                "pair": pa.array(out_pair, pa.int64()),
                "shingle": pa.array(vals[idx], pa.uint64()),
            }
        )


def verify_pairs_jaccard_spill(spill_ds, cand_pairs: np.ndarray,
                               threshold: float = 0.4):
    """Exact-Jaccard verification of candidate pairs from SPILLED shingle
    rows → Dataset(doc_a, doc_b, jacc).  Semantics identical to
    :func:`verify_pairs_jaccard` (tested pair-identical) but reads the
    one-pass spill instead of re-tokenizing candidate docs, and emits
    pair rows with vectorized index arithmetic."""
    doc_pairs_ref = ray.put(doc_pairs_map(cand_pairs))
    rows = spill_ds.map_batches(
        _SpillPairRows(doc_pairs_ref), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return (
        rows.map_batches(_add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(
            _jaccard_reduce_bucket(threshold),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )


def prefilter_pairs_sig(spill_ds, cand_pairs: np.ndarray, num_perm: int,
                        est_cut: float) -> np.ndarray:
    """Signature-agreement pre-filter: estimated Jaccard of each
    candidate pair = fraction of agreeing MinHash components — free
    (signatures already exist in the spill) and unbiased with std
    ``sqrt(J(1-J)/num_perm)``.  Pairs with estimate < ``est_cut`` are
    dropped BEFORE the exact shingle exchange, cutting verification
    volume; with the default 4σ margin below the threshold the survivor
    set is (overwhelmingly) a superset of the true-positive set, and the
    exact verify that follows keeps the output exact-thresholded."""
    doc_pairs_ref = ray.put(doc_pairs_map(cand_pairs))

    def emit_sig_rows(batch: pa.Table) -> pa.Table:
        mp = ray.get(doc_pairs_ref)
        ids = batch.column("doc_id").to_numpy()
        arr = batch.column("sig").combine_chunks()
        offs = arr.offsets.to_numpy().astype(np.int64)
        vals = arr.values.to_numpy(zero_copy_only=False)
        sel = [i for i, d in enumerate(ids.tolist())
               if int(d) in mp and offs[i + 1] > offs[i]]
        if not sel:
            return pa.table(
                {"pair": pa.array([], pa.int64()),
                 "slot": pa.array([], pa.int32()),
                 "val": pa.array([], pa.uint64())}
            )
        sel = np.asarray(sel, dtype=np.int64)
        pair_lists = [mp[int(ids[i])] for i in sel.tolist()]
        n_pairs = np.fromiter((len(p) for p in pair_lists), np.int64, len(sel))
        all_pairs = np.concatenate(pair_lists)
        # per (doc, pair) block: the doc's full signature (num_perm rows)
        out_pair = np.repeat(all_pairs, num_perm)
        block_starts = np.repeat(offs[sel], n_pairs)
        idx = (
            np.repeat(block_starts, num_perm)
            + np.tile(np.arange(num_perm, dtype=np.int64), len(all_pairs))
        )
        slots = np.tile(
            np.arange(num_perm, dtype=np.int32), len(all_pairs)
        )
        return pa.table(
            {
                "pair": pa.array(out_pair, pa.int64()),
                "slot": pa.array(slots, pa.int32()),
                "val": pa.array(vals[idx], pa.uint64()),
            }
        )

    def reduce_bucket(g: pa.Table) -> pa.Table:
        pair = g.column("pair").to_numpy()
        slot = g.column("slot").to_numpy()
        val = g.column("val").to_numpy()
        order = np.lexsort((val, slot, pair))
        p, s, v = pair[order], slot[order], val[order]
        uniq = np.unique(p)
        # both docs of a pair emit every slot → each (pair, slot) run has
        # exactly 2 rows; agreement = duplicate (pair, slot, val) adjacency
        agree_adj = (p[1:] == p[:-1]) & (s[1:] == s[:-1]) & (v[1:] == v[:-1])
        agree = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(agree, np.searchsorted(uniq, p[1:][agree_adj]), 1)
        est = agree / float(num_perm)
        keep = est >= est_cut
        return pa.table({"pair": pa.array(uniq[keep], pa.int64())})

    rows = spill_ds.map_batches(
        emit_sig_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    out = to_arrow(
        rows.map_batches(_add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pyarrow", zero_copy_batch=True)
    )
    if out.num_rows == 0 or "pair" not in out.column_names:
        return np.empty(0, dtype=np.int64)
    return out.column("pair").to_numpy()


def minhash_lsh_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.4,
    max_band_group: int | None = None,
    spill_dir: str | None = None,
    prefilter_sigma: float = 4.0,
):
    """MinHash+LSH candidate pairs, exact-Jaccard verified →
    pa.Table(doc_a, doc_b, jacc).

    One shared tokenize pass spills ``(doc_id, sig, shingles)`` to
    partitioned parquet (:class:`MinHashSpill`); band keys + candidates,
    the signature pre-filter, and exact verification all read the spill
    with column pruning — the corpus text is tokenized exactly once.
    Candidates are pre-filtered by MinHash-estimated Jaccard
    (:func:`prefilter_pairs_sig`) at ``threshold − prefilter_sigma·σ``
    (σ = sqrt(t(1−t)/num_perm); ``prefilter_sigma=None`` disables) before
    the exact shingle exchange.  No per-doc shingle-set dict ever
    materializes on the driver.

    ``spill_dir``: where the one-pass spill lands (a shared URI on a real
    cluster); default a fresh /tmp directory, removed on return.

    ``max_band_group`` is the scale valve (the jaccard ``max_shingle_df``
    analogue): a band bucket of B docs emits B·(B−1)/2 candidate pairs,
    so template-heavy corpora (boilerplate-identical bands) go quadratic
    without a cap.  Groups above the cap are DROPPED — their members are
    typically exact/near-exact duplicates that ``exact_dedup`` already
    catches; capping is disclosed, not silent."""
    import shutil
    import tempfile

    import ray.data as rd

    mh = MinHashBands(text_col, id_col, n, num_perm, bands)
    owned = spill_dir is None
    if owned:
        spill_dir = tempfile.mkdtemp(prefix="minhash_spill_")
    try:
        ds.map_batches(
            MinHashSpill(mh),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=512,  # bounds the (num_perm × shingles) sig matrix
        ).write_parquet(spill_dir)

        def to_band_rows(batch: pa.Table) -> pa.Table:
            arr = batch.column("sig").combine_chunks()
            offs = arr.offsets.to_numpy().astype(np.int64)
            counts = np.diff(offs)
            keep = counts == num_perm
            ids = batch.column("doc_id").to_numpy()[keep]
            if not len(ids):
                return pa.table(
                    {"band_key": pa.array([], pa.uint64()),
                     "doc_id": pa.array([], pa.int64())}
                )
            sigs = (
                arr.values.to_numpy(zero_copy_only=False)[
                    np.repeat(offs[:-1][keep], num_perm)
                    + np.tile(np.arange(num_perm, dtype=np.int64), len(ids))
                ]
            ).reshape(len(ids), num_perm)
            acc = _band_keys(sigs, bands)
            return pa.table(
                {
                    "band_key": pa.array(acc.reshape(-1), pa.uint64()),
                    "doc_id": pa.array(np.repeat(ids, bands), pa.int64()),
                }
            )

        sig_ds = rd.read_parquet(spill_dir, columns=["doc_id", "sig"])
        band_rows = sig_ds.map_batches(
            to_band_rows, batch_format="pyarrow", zero_copy_batch=True
        )
        raw_pairs = _bucketed_emit_pairs(band_rows, "band_key", max_band_group)
        candidates = _bucketed_pair_counts(
            raw_pairs, lambda pair, _c: pa.table({"pair": pa.array(pair, pa.int64())})
        )
        cand = to_arrow(candidates)
        if cand.num_rows == 0:
            return _canonical_pairs(pa.table({}), ["doc_a", "doc_b", "jacc"])
        cand_pairs = cand.column("pair").to_numpy()
        if prefilter_sigma is not None:
            sigma = float(np.sqrt(threshold * (1.0 - threshold) / num_perm))
            est_cut = threshold - prefilter_sigma * sigma
            if est_cut > 0:
                cand_pairs = prefilter_pairs_sig(
                    rd.read_parquet(spill_dir, columns=["doc_id", "sig"]),
                    cand_pairs, num_perm, est_cut,
                )
        if len(cand_pairs) == 0:
            return _canonical_pairs(pa.table({}), ["doc_a", "doc_b", "jacc"])
        out = to_arrow(
            verify_pairs_jaccard_spill(
                rd.read_parquet(spill_dir, columns=["doc_id", "shingles"]),
                cand_pairs, threshold,
            )
        )
        out = _canonical_pairs(out, ["doc_a", "doc_b", "jacc"])
        return out.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])
    finally:
        if owned:
            shutil.rmtree(spill_dir, ignore_errors=True)


def incremental_minhash_pairs(
    ds,
    state_dir: str,
    run_tag: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.4,
    max_band_group: int | None = None,
    n_band_buckets: int = 64,
    n_spill_buckets: int = 64,
):
    """MinHash+LSH near-duplicate pairs of a NEW document wave against
    itself AND every prior wave, without re-banding prior corpora — the
    incremental analogue of :func:`minhash_lsh_pairs` (the daily-
    increment posture next to :func:`incremental_exact_dedup`).

    Persistent state under ``state_dir`` (a shared URI on a real
    cluster), appended as one atomic generation per bucket per run:

    - ``spill/bucket=BBB/gen-{tag}.parquet`` — the wave's one-pass
      spill rows ``(doc_id, sig, shingles)``, bucketed by
      ``doc_id % n_spill_buckets`` so exact verification later reads
      ONLY the buckets containing candidate docs (column-pruned);
    - ``bands/bucket=BB/gen-{tag}.parquet`` — ``(band_key, doc_id)``
      rows bucketed by ``band_key % n_band_buckets``; each candidate
      task reads its bucket's prior generations (its own excluded —
      replay safety) and emits exactly the pairs with ≥ 1 NEW member.

    Band keys depend only on the document (never on wave boundaries),
    so within a colliding band group ``old ∪ new`` the pairs
    ``new×old ∪ C(new, 2)`` are precisely the pairs earlier waves could
    not have emitted — the UNION of all waves' outputs equals the batch
    :func:`minhash_lsh_pairs` over the union corpus (tested), pair for
    pair and jacc for jacc.  ``max_band_group`` caps on the UNION group
    size (the batch op's cap semantics).  Re-running a ``run_tag``
    rewrites its generations byte-identically and returns the same
    pairs.  → pa.Table(doc_a, doc_b, jacc), pairs with ≥1 wave member,
    exact-Jaccard ≥ threshold."""
    import os

    import ray.data as rd

    sdir = str(state_dir)
    mh = MinHashBands(text_col, id_col, n, num_perm, bands)
    spill_root = os.path.join(sdir, "spill")
    bands_root = os.path.join(sdir, "bands")
    own = f"gen-{run_tag}.parquet"

    # ---- stage 1: spill the wave, committed per doc bucket ----------
    def add_spill_bucket(batch: pa.Table) -> pa.Table:
        t = MinHashSpill(mh)(batch)
        b = (t.column("doc_id").to_numpy() % n_spill_buckets).astype(
            np.int32)
        return t.append_column("sbucket", pa.array(b, pa.int32()))

    def commit_spill(g: pa.Table) -> pa.Table:
        import pyarrow.parquet as _pq

        bucket = int(g.column("sbucket")[0].as_py())
        bdir = os.path.join(spill_root, f"bucket={bucket:03d}")
        os.makedirs(bdir, exist_ok=True)
        g = g.sort_by("doc_id").drop_columns(["sbucket"])
        tmp = os.path.join(bdir, f".{own}.tmp")
        _pq.write_table(g, tmp)
        os.replace(tmp, os.path.join(bdir, own))
        return g.select(["doc_id", "sig"])

    wave_sigs = (
        ds.map_batches(add_spill_bucket, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=512)
        .groupby("sbucket")
        .map_groups(commit_spill, batch_format="pyarrow",
                    zero_copy_batch=True)
    )

    # ---- stage 2: band rows, candidates vs state, commit bands ------
    def to_band_rows(batch: pa.Table) -> pa.Table:
        arr = batch.column("sig").combine_chunks()
        offs = arr.offsets.to_numpy().astype(np.int64)
        counts = np.diff(offs)
        keep = counts == num_perm
        ids = batch.column("doc_id").to_numpy()[keep]
        if not len(ids):
            return pa.table(
                {"band_key": pa.array([], pa.uint64()),
                 "doc_id": pa.array([], pa.int64()),
                 "bucket": pa.array([], pa.int32())}
            )
        sigs = (
            arr.values.to_numpy(zero_copy_only=False)[
                np.repeat(offs[:-1][keep], num_perm)
                + np.tile(np.arange(num_perm, dtype=np.int64), len(ids))
            ]
        ).reshape(len(ids), num_perm)
        acc = _band_keys(sigs, bands).reshape(-1)
        return pa.table(
            {
                "band_key": pa.array(acc, pa.uint64()),
                "doc_id": pa.array(np.repeat(ids, bands), pa.int64()),
                "bucket": pa.array(
                    (acc % np.uint64(n_band_buckets)).astype(np.int32),
                    pa.int32()),
            }
        )

    def cand_task(g: pa.Table) -> pa.Table:
        import pyarrow.parquet as _pq

        bucket = int(g.column("bucket")[0].as_py())
        bdir = os.path.join(bands_root, f"bucket={bucket:02d}")
        new_key = g.column("band_key").to_numpy()
        new_doc = g.column("doc_id").to_numpy()
        old_key = np.empty(0, np.uint64)
        old_doc = np.empty(0, np.int64)
        probe = np.unique(new_key)
        if os.path.isdir(bdir) and len(probe):
            parts_k, parts_d = [], []
            for f in sorted(os.listdir(bdir)):
                if not f.endswith(".parquet") or f == own:
                    continue
                # gen files are band_key-sorted → row-group pruning by
                # the wave's key range keeps state IO ∝ wave size
                t = _read_state_pruned(
                    os.path.join(bdir, f), ["band_key", "doc_id"],
                    "band_key", probe,
                )
                if t is not None and t.num_rows:
                    parts_k.append(t.column("band_key").to_numpy())
                    parts_d.append(t.column("doc_id").to_numpy())
            if parts_k:
                old_key = np.concatenate(parts_k)
                old_doc = np.concatenate(parts_d)
        # commit this wave's band rows (atomic, deterministic content)
        os.makedirs(bdir, exist_ok=True)
        order = np.lexsort((new_doc, new_key))
        kt = pa.table({
            "band_key": pa.array(new_key[order], pa.uint64()),
            "doc_id": pa.array(new_doc[order], pa.int64()),
        })
        tmp = os.path.join(bdir, f".{own}.tmp")
        _pq.write_table(kt, tmp, row_group_size=_STATE_ROW_GROUP)
        os.replace(tmp, os.path.join(bdir, own))
        # restrict old rows to band keys with ≥1 new member, then emit
        # all union-group pairs and drop the old-old ones
        if len(old_key):
            m = np.isin(old_key, new_key)
            old_key, old_doc = old_key[m], old_doc[m]
        key = np.concatenate([new_key, old_key])
        doc = np.concatenate([new_doc, old_doc])
        if not len(key):
            return pa.table({"pair": pa.array([], pa.int64())})
        grp = pa.table({
            "band_key": pa.array(key, pa.uint64()),
            "doc_id": pa.array(doc, pa.int64()),
        })
        pairs_t = _emit_pairs_keyed(grp, "band_key", max_band_group)
        pair = pairs_t.column("pair").to_numpy()
        if len(pair) and len(old_doc):
            olds = np.unique(old_doc)
            a = (pair >> np.int64(32)).astype(np.int64)
            b = pair & np.int64(0xFFFFFFFF)
            both_old = np.isin(a, olds) & np.isin(b, olds)
            pair = pair[~both_old]
        return pa.table({"pair": pa.array(pair, pa.int64())})

    band_rows = wave_sigs.map_batches(
        to_band_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    raw = band_rows.groupby("bucket").map_groups(
        cand_task, batch_format="pyarrow", zero_copy_batch=True
    )
    cand = to_arrow(raw)
    if cand.num_rows == 0:
        return _canonical_pairs(pa.table({}), ["doc_a", "doc_b", "jacc"])
    cand_pairs = np.unique(cand.column("pair").to_numpy())

    # ---- stage 3: exact verify from the TOUCHED spill buckets only --
    members = np.unique(np.concatenate([
        (cand_pairs >> np.int64(32)).astype(np.int64),
        (cand_pairs & np.int64(0xFFFFFFFF)).astype(np.int64),
    ]))
    touched = np.unique(members % n_spill_buckets)
    files: list[str] = []
    for b in touched:
        bdir = os.path.join(spill_root, f"bucket={int(b):03d}")
        if os.path.isdir(bdir):
            files.extend(
                os.path.join(bdir, f)
                for f in sorted(os.listdir(bdir)) if f.endswith(".parquet")
            )
    spill_ds = rd.read_parquet(files, columns=["doc_id", "shingles"])
    out = to_arrow(
        verify_pairs_jaccard_spill(spill_ds, cand_pairs, threshold)
    )
    out = _canonical_pairs(out, ["doc_a", "doc_b", "jacc"])
    return out.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


# --------------------------------------------------------------- simhash


def simhash64_batch(batch: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id",
                    _hash_cache: dict | None = None) -> pa.Table:
    """64-bit SimHash per doc (tf-weighted token-hash bit votes).

    Vectorized over the whole batch: one Arrow tokenize, per-(doc, term)
    tfs from a composite-key ``np.unique``, md5 once per DISTINCT term,
    and a single scatter-add of ±tf bit votes — values identical to the
    per-doc formulation (integer votes commute)."""
    from ..index.build import tokenize_codes_arrow

    n = batch.num_rows
    ids = batch.column(id_col)
    terms, codes, doc_rel, _ = tokenize_codes_arrow(
        batch.column(text_col), "simple", 1, 64, {}
    )
    sigs = np.zeros(n, dtype=np.uint64)
    if len(codes):
        nv = len(terms)
        cache = _hash_cache if _hash_cache is not None else {}
        th = np.empty(nv, dtype=np.uint64)
        for i, t in enumerate(terms):
            h = cache.get(t)
            if h is None:
                h = cache[t] = _stable_hash64(t)
            th[i] = h
        key = doc_rel * np.int64(nv) + codes
        uk, tf = np.unique(key, return_counts=True)
        d = (uk // nv).astype(np.int64)
        t_idx = (uk % nv).astype(np.int64)
        bit_idx = np.arange(64, dtype=np.uint64)
        bits = ((th[t_idx][:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
        contrib = (bits * 2 - 1) * tf[:, None].astype(np.int64)
        votes = np.zeros((n, 64), dtype=np.int64)
        np.add.at(votes, d, contrib)
        sigs = (
            ((votes > 0).astype(np.uint64) << bit_idx[None, :]).sum(axis=1)
        ).astype(np.uint64)
    return pa.table({"doc_id": ids, "simhash": pa.array(sigs, pa.uint64())})


def simhash_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3):
    """SimHash near-dup pairs via 16-bit band blocking + Hamming verify →
    pa.Table(doc_a, doc_b, hamming)."""
    sigs = ds.map_batches(
        lambda b: simhash64_batch(b, text_col, id_col), batch_format="pyarrow"
    )

    def band_rows(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        s = batch.column("simhash").to_numpy()
        out_k, out_d, out_s = [], [], []
        for bnd in range(4):
            band = (s >> np.uint64(16 * bnd)) & np.uint64(0xFFFF)
            out_k.append(band | (np.uint64(bnd) << np.uint64(16)))
            out_d.append(d)
            out_s.append(s)
        return pa.table(
            {
                "band_key": pa.array(np.concatenate(out_k), pa.uint64()),
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                "simhash": pa.array(np.concatenate(out_s), pa.uint64()),
            }
        )

    def emit_verified(g: pa.Table) -> pa.Table:
        d = g.column("doc_id").to_numpy()
        s = g.column("simhash").to_numpy()
        order = np.argsort(d, kind="stable")
        d, s = d[order], s[order]
        keep = np.concatenate([[True], d[1:] != d[:-1]])
        d, s = d[keep], s[keep]
        if len(d) < 2:
            return pa.table({"pair": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        ai, bi = np.triu_indices(len(d), k=1)
        ham = np.array(
            [bin(int(x)).count("1") for x in (s[ai] ^ s[bi])], dtype=np.int64
        )
        ok = ham <= max_hamming
        return pa.table(
            {
                "pair": pa.array(_pair_key(d[ai[ok]], d[bi[ok]]), pa.int64()),
                "hamming": pa.array(ham[ok], pa.int64()),
            }
        )

    def min_per_pair(g: pa.Table) -> pa.Table:
        pair = g.column("pair").to_numpy()
        ham = g.column("hamming").to_numpy()
        order = np.argsort(pair, kind="stable")
        pair, ham = pair[order], ham[order]
        starts = np.nonzero(np.concatenate([[True], pair[1:] != pair[:-1]]))[0]
        uniq = pair[starts]
        mins = np.minimum.reduceat(ham, starts)
        a = (uniq >> np.int64(32)).astype(np.int64)
        b = (uniq & np.int64(0xFFFFFFFF)).astype(np.int64)
        return pa.table(
            {
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(b, pa.int64()),
                "hamming": pa.array(mins.astype(np.int64), pa.int64()),
            }
        )

    pairs = to_arrow(
        sigs.map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("band_key")
        .map_groups(emit_verified, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(_add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(min_per_pair, batch_format="pyarrow", zero_copy_batch=True)
    )
    pairs = _canonical_pairs(pairs, ["doc_a", "doc_b", "hamming"])
    return pairs.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])
