"""Hybrid retrieval: Reciprocal Rank Fusion (the ES 8.8+ ``rrf``
retriever) over any set of ranked result lists — the standard way to
combine BM25 text ranks with kNN vector ranks without score
calibration.

``score(d) = Σ_retrievers 1 / (rank_constant + rank_r(d))`` over the
retrievers that ranked ``d`` inside their rank window; ties break
doc_id ascending.  ES defaults: ``rank_constant=60``,
``rank_window_size`` bounds each retriever's contribution depth.

The fusion is engine-agnostic (it consumes rank lists), so both
serving engines and the Dataset kNN ops feed it unchanged — and it is
exactly SQL-reproducible (the contract oracle recomputes both rank
lists and the fusion in DuckDB).
"""

from __future__ import annotations


def rrf_fuse(
    rankings: list[list[int]],
    k: int = 10,
    rank_constant: int = 60,
) -> list[tuple[int, float]]:
    """Fuse ranked doc-id lists → top-k [(doc_id, rrf_score)].

    Each ranking is a doc-id list in rank order (rank = index + 1);
    callers cap each list at their rank window.  Duplicate ids within
    one ranking keep only their best rank (defensive; rankings are
    normally already unique)."""
    scores: dict[int, float] = {}
    for ranking in rankings:
        seen: set[int] = set()
        for r, d in enumerate(ranking, start=1):
            if d in seen:
                continue
            seen.add(d)
            scores[d] = scores.get(d, 0.0) + 1.0 / (rank_constant + r)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
