"""_rank_eval metrics (search/rank_eval.py): hand-computed fixtures for
every metric, rated-but-not-retrieved recall/IDCG, and degenerate
inputs.  The SQL-oracle twin runs via the rank_eval contract pipeline."""

import math

import pytest

from elasticsearch_assets_ray.search.rank_eval import rank_eval


def _one(requests, **kw):
    t = rank_eval(requests, **kw)
    return {c: t.column(c)[0].as_py() for c in t.column_names}


def test_hand_computed_all_metrics():
    # hits [5, 3, 9]; rated: 3 → 2, 7 → 1 (7 never retrieved)
    r = _one(
        [{"id": 0, "hits": [5, 3, 9], "ratings": {3: 2, 7: 1}}], k=10
    )
    assert r["precision_k"] == round(1 / 3, 6)
    assert r["recall_k"] == 0.5
    assert r["mrr"] == 0.5
    dcg = 3.0 / math.log2(3)
    assert r["dcg_k"] == round(dcg, 6)
    idcg = 3.0 / math.log2(2) + 1.0 / math.log2(3)
    assert r["ndcg_k"] == round(dcg / idcg, 6)
    # ERR with gmax=2: R = (2^g - 1)/4 → [0, 3/4, 0]
    err = (3 / 4) * 1.0 / 2
    assert r["err_k"] == round(err, 6)


def test_perfect_ranking_is_ndcg_1():
    r = _one(
        [{"id": 1, "hits": [1, 2, 3], "ratings": {1: 2, 2: 1, 3: 1}}]
    )
    assert r["ndcg_k"] == 1.0
    assert r["precision_k"] == 1.0 and r["recall_k"] == 1.0
    assert r["mrr"] == 1.0


def test_k_truncation_and_threshold():
    hits = list(range(20))
    ratings = {15: 2}  # only a sub-k doc is relevant
    r = _one([{"id": 2, "hits": hits, "ratings": ratings}], k=10)
    assert r["precision_k"] == 0.0 and r["mrr"] == 0.0
    assert r["recall_k"] == 0.0 and r["dcg_k"] == 0.0
    # raise threshold: grade-1 docs stop counting as relevant
    r2 = _one(
        [{"id": 3, "hits": [4], "ratings": {4: 1}}],
        relevant_threshold=2,
    )
    assert r2["precision_k"] == 0.0 and r2["recall_k"] == 0.0
    assert r2["dcg_k"] == 1.0  # dcg still uses the graded gain


def test_degenerate_inputs():
    r = _one([{"id": 4, "hits": [], "ratings": {}}])
    assert all(
        r[m] == 0.0
        for m in ("precision_k", "recall_k", "mrr", "dcg_k", "ndcg_k",
                  "err_k")
    )
    # multiple requests keep row order
    t = rank_eval([
        {"id": 7, "hits": [1], "ratings": {1: 1}},
        {"id": 5, "hits": [2], "ratings": {}},
    ])
    assert t.column("query_id").to_pylist() == [7, 5]
