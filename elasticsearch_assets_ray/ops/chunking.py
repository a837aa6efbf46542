"""Overlapping-window document chunking — the RAG / long-context
preprocessing step (split every document into fixed-size token windows
with stride overlap, keeping provenance spans).  Complements
``ops/packing.py``: packing concatenates docs INTO windows for
pretraining; chunking splits docs into OVERLAPPING windows for
retrieval/embedding.

Chunk rule (pinned so the SQL oracle is exact): for a doc of ``n``
tokens, chunks start at ``k·stride`` for ``k = 0 .. ceil(max(n-window,
0)/stride)`` — i.e. ``1 + ceil(max(n-window,0)/stride)`` chunks; each
spans ``[start, min(start+window, n))``.  A doc with ``0 < n ≤ window``
yields exactly one chunk; empty docs yield none.  The final chunk
always reaches the last token; a trailing chunk may be shorter than
``window`` but never starts past ``n-1``.

Pure streaming ``map_batches``: one Arrow tokenize, vectorized
expansion (repeat + cumulative offsets), one ``binary_join`` per batch.
No shuffle, no driver state — chunk output order is irrelevant
(provenance columns carry identity)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class WindowChunker:
    def __init__(self, window: int, stride: int, text_col: str = "text",
                 id_col: str = "doc_id", analyzer: str = "simple"):
        if stride <= 0 or window <= 0 or stride > window:
            raise ValueError("need 0 < stride <= window")
        self.window = window
        self.stride = stride
        self.text_col = text_col
        self.id_col = id_col
        self.analyzer = analyzer

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..index.build import tokenize_codes_arrow

        W, S = self.window, self.stride
        terms, codes, rel, dls = tokenize_codes_arrow(
            batch.column(self.text_col), self.analyzer, 1, 64, {}
        )
        n = np.asarray(dls, dtype=np.int64)
        doc_ids = batch.column(self.id_col).to_numpy().astype(np.int64)
        m = np.where(n > 0, 1 + (np.maximum(n - W, 0) + S - 1) // S, 0)
        if m.sum() == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "chunk_idx": pa.array([], pa.int64()),
                "start_tok": pa.array([], pa.int64()),
                "end_tok": pa.array([], pa.int64()),
                "text_chunk": pa.array([], pa.string()),
            })
        cdoc = np.repeat(np.arange(len(n)), m)  # batch-row per chunk
        # chunk_idx within doc: position since the row's first chunk
        offs = np.zeros(len(n) + 1, dtype=np.int64)
        offs[1:] = np.cumsum(m)
        cidx = np.arange(len(cdoc), dtype=np.int64) - offs[cdoc]
        start = cidx * S
        end = np.minimum(start + W, n[cdoc])
        # gather token slices: flat token array with per-doc offsets
        tok_off = np.zeros(len(n) + 1, dtype=np.int64)
        tok_off[1:] = np.cumsum(n)
        tok = pc.take(pa.array(terms, pa.string()),
                      pa.array(codes, pa.int64()))
        # list offsets per chunk over a REORDERED token array: build the
        # gather index chunk-by-chunk, fully vectorized via repeat+arange
        lens = end - start
        gidx = np.repeat(tok_off[cdoc] + start, lens) + (
            np.arange(int(lens.sum()), dtype=np.int64)
            - np.repeat(np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
        )
        flat = pc.take(tok, pa.array(gidx, pa.int64()))
        l_off = np.zeros(len(cdoc) + 1, dtype=np.int64)
        l_off[1:] = np.cumsum(lens)
        lists = pa.LargeListArray.from_arrays(
            pa.array(l_off, pa.int64()),
            flat.combine_chunks() if isinstance(flat, pa.ChunkedArray)
            else flat,
        )
        return pa.table({
            "doc_id": pa.array(doc_ids[cdoc], pa.int64()),
            "chunk_idx": pa.array(cidx, pa.int64()),
            "start_tok": pa.array(start, pa.int64()),
            "end_tok": pa.array(end, pa.int64()),
            "text_chunk": pc.binary_join(lists, " "),
        })


def chunk_windows(ds, window: int, stride: int, text_col: str = "text",
                  id_col: str = "doc_id", analyzer: str = "simple"):
    return ds.map_batches(
        WindowChunker(window, stride, text_col, id_col, analyzer),
        batch_format="pyarrow", zero_copy_batch=True,
    )
