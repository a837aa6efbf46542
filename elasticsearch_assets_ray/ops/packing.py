"""Sequence packing — the training-data step that maps a document
corpus onto fixed-size context windows.

Two standard forms:

- **concat-and-chunk** (:func:`pack_concat_chunk`, the GPT-style
  pretraining layout): all documents concatenate into one global token
  stream in id order and the stream chunks into ``chunk_tokens``-sized
  windows; each doc's placement is ``(start_tok, first_chunk,
  last_chunk)``.  EXACT and order-deterministic, so it is
  SQL-reproducible (a window cumulative sum) and resumable — the
  per-file offset table is tiny and recomputable.
- **greedy first-fit bins** (:func:`pack_greedy_bins`): whole documents
  pack into ``chunk_tokens``-capacity bins without splitting (the
  no-truncation fine-tuning layout) — first-fit-decreasing WITHIN each
  file partition (bins never span files, the property that keeps the
  op shuffle-free and each bin's members co-read); docs longer than the
  capacity get singleton oversize bins.  Sequential by nature, so
  rows-only (property-tested, not SQL-oracled).

Ray-Data shape: token counting is two RE2 kernels per batch
(``count_substring_regex``); the global prefix offsets come from one
per-file reduce pass (one integer per file → driver prefix sum →
broadcast back), so the whole op is two column-pruned streaming passes
and never materializes per-doc state on the driver — the same planner
pattern as the index build's file manifest.  The id-ordered-files
assumption (sorted file list ⇔ ascending doc ids, the corpus layout
contract) is VERIFIED in pass 1 via per-file id ranges, not assumed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

# the contract "simple" analyzer, counted: all [a-z0-9]+ runs of the
# lowercased text, minus the (rare) runs longer than 64 chars — two RE2
# kernels, mirroring the oracle's token CTE exactly
_TOKEN_RX = "[a-z0-9]+"
_LONG_RX = "[a-z0-9]{65,}"


def token_counts_arrow(texts) -> np.ndarray:
    """Per-doc token counts of the contract 'simple' analyzer — two
    ``count_substring_regex`` kernels, no token materialization."""
    low = pc.utf8_lower(texts)
    n = pc.count_substring_regex(low, _TOKEN_RX).to_numpy(
        zero_copy_only=False).astype(np.int64)
    long = pc.count_substring_regex(low, _LONG_RX).to_numpy(
        zero_copy_only=False).astype(np.int64)
    return n - long


@ray.remote
def _file_token_sums(path: str, text_col: str, id_col: str) -> tuple:
    """Pass 1: (token sum, min id, max id, n rows) of one file —
    one integer quadruple per file crosses the wire."""
    t = pq.read_table(path, columns=[text_col, id_col])
    n = token_counts_arrow(t.column(text_col))
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    return (int(n.sum()), int(ids.min()), int(ids.max()), len(ids))


@ray.remote
def _file_pack_rows(path: str, text_col: str, id_col: str,
                    start_offset: int, chunk_tokens: int) -> pa.Table:
    """Pass 2: per-doc placement rows of one file given its global
    token offset (in-file cumulative sum; ids re-sorted in-file so the
    stream order is the id order even if row order isn't)."""
    t = pq.read_table(path, columns=[text_col, id_col])
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    n = token_counts_arrow(t.column(text_col))
    order = np.argsort(ids)
    ids, n = ids[order], n[order]
    end = start_offset + np.cumsum(n)
    start = end - n
    first = start // chunk_tokens
    last = np.maximum(end - 1, start) // chunk_tokens
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_tok": pa.array(n, pa.int64()),
        "start_tok": pa.array(start, pa.int64()),
        "first_chunk": pa.array(first, pa.int64()),
        "last_chunk": pa.array(last, pa.int64()),
    })


def _corpus_files(source) -> list[str]:
    import os

    if isinstance(source, (list, tuple)):
        return [str(p) for p in source]
    source = str(source)
    if source.endswith(".parquet"):
        return [source]
    return sorted(
        os.path.join(source, f) for f in os.listdir(source)
        if f.endswith(".parquet")
    )


def pack_concat_chunk(
    source,
    chunk_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Concat-and-chunk packing map over a parquet corpus (file path,
    directory, or explicit file list): one row per doc with its global
    token offset and the context-window span it lands in.  Two
    streaming passes; driver state is one integer per file."""
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    files = _corpus_files(source)
    sums = ray.get([
        _file_token_sums.remote(f, text_col, id_col) for f in files
    ])
    # verify the id-ordered-files contract instead of assuming it
    for (_, lo, hi, _), (_, lo2, _, _) in zip(sums, sums[1:]):
        if lo2 <= hi:
            raise ValueError(
                "corpus files are not id-ordered — pack_concat_chunk "
                f"needs ascending id ranges (got {hi} then {lo2})"
            )
    offsets = np.concatenate([[0], np.cumsum([s[0] for s in sums])])
    parts = ray.get([
        _file_pack_rows.remote(f, text_col, id_col, int(offsets[i]),
                               chunk_tokens)
        for i, f in enumerate(files)
    ])
    return pa.concat_tables(parts)


@ray.remote
def _file_greedy_bins(path: str, text_col: str, id_col: str,
                      capacity: int, file_idx: int) -> pa.Table:
    """First-fit-decreasing bin packing of one file's docs (bins never
    span files — the co-location contract that keeps the op
    shuffle-free).  Bin ids are (file_idx << 32) | local bin."""
    t = pq.read_table(path, columns=[text_col, id_col])
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    n = token_counts_arrow(t.column(text_col))
    order = np.lexsort((ids, -n))  # decreasing size, id-ascending ties
    bins_free: list[int] = []
    assign = np.empty(len(ids), dtype=np.int64)
    for j in order:
        need = int(n[j])
        placed = -1
        for b, free in enumerate(bins_free):
            if free >= need:
                placed = b
                break
        if placed < 0:
            bins_free.append(capacity)
            placed = len(bins_free) - 1
            # oversize docs get a singleton bin (standard no-split rule)
            if need > capacity:
                bins_free[placed] = 0
                assign[j] = placed
                continue
        bins_free[placed] -= need
        assign[j] = placed
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_tok": pa.array(n, pa.int64()),
        "bin_id": pa.array((np.int64(file_idx) << 32) | assign,
                           pa.int64()),
    })


def pack_greedy_bins(
    source,
    capacity: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """First-fit-decreasing whole-document packing into
    ``capacity``-token bins, per file partition (no shuffle; bins are
    co-read units).  Rows: (doc_id, n_tok, bin_id)."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    files = _corpus_files(source)
    parts = ray.get([
        _file_greedy_bins.remote(f, text_col, id_col, capacity, i)
        for i, f in enumerate(files)
    ])
    return pa.concat_tables(parts)
