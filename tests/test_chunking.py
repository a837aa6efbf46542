"""Overlapping-window chunking (ops/chunking.py): span rule, overlap,
short/empty docs, brute parity."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from elasticsearch_assets_ray.ops.chunking import WindowChunker, chunk_windows
from elasticsearch_assets_ray.ops.textstats import clipped_tokens


def brute(docs, W, S):
    rows = []
    for did, text in docs:
        toks = clipped_tokens(text)
        n = len(toks)
        if n == 0:
            continue
        m = 1 + max(0, -(-(max(n - W, 0)) // S))
        for k in range(m):
            s, e = k * S, min(k * S + W, n)
            rows.append((did, k, s, e, " ".join(toks[s:e])))
    return rows


@pytest.mark.parametrize("W,S", [(4, 2), (5, 5), (8, 3), (100, 10)])
def test_chunking_matches_brute(W, S):
    docs = [
        (0, " ".join(f"t{i}" for i in range(17))),
        (1, "a b c"),
        (2, ""),
        (3, " ".join(f"w{i}" for i in range(100))),
        (4, "solo"),
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    }))
    got = chunk_windows(ds, W, S).to_pandas()
    got = sorted(map(tuple, got[["doc_id", "chunk_idx", "start_tok",
                                 "end_tok", "text_chunk"]].values))
    assert got == sorted(brute(docs, W, S)), (W, S)
    # coverage: every token index of every non-empty doc is in >=1 chunk
    for did, text in docs:
        n = len(clipped_tokens(text))
        cov = set()
        for d, k, s, e, _ in got:
            if d == did:
                cov |= set(range(s, e))
        assert cov == set(range(n)), did


def test_chunker_validates_params():
    with pytest.raises(ValueError):
        WindowChunker(4, 5)  # stride > window
    with pytest.raises(ValueError):
        WindowChunker(0, 0)
