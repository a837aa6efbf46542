"""ES ``_rank_eval`` — ranking-quality evaluation over rated search
results (the API the reference's users would point at an index to
validate relevance before bulk-exporting it).

Mirrors the ES request shape: each request carries an ordered hit list
and a ``{doc: grade}`` ratings dict (docs rated but NOT retrieved still
count — that is what recall and the ideal DCG are about).  Metrics per
request, ES definitions:

* ``precision_k``  — relevant retrieved / retrieved (grade ≥ threshold)
* ``recall_k``     — relevant retrieved / total rated relevant
* ``mrr``          — 1/rank of the first relevant hit (0 when none)
* ``dcg_k``        — Σ (2^g − 1) / log2(rank + 1)
* ``ndcg_k``       — dcg / ideal dcg (ideal = rated grades desc,
  doc-id-asc tie order, top k) — 0 when nothing is rated
* ``err_k``        — expected reciprocal rank, R = (2^g − 1) / 2^gmax

Evaluation is per-request numpy over top-k arrays — this is an
assessment API over a handful of queries, not a data-plane stage; the
heavy side (producing the ranked lists) is the engines' existing
batched search.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ideal_gains(ratings: dict[int, int], k: int) -> np.ndarray:
    if not ratings:
        return np.empty(0, dtype=np.float64)
    docs = np.fromiter(ratings.keys(), dtype=np.int64, count=len(ratings))
    grades = np.fromiter(ratings.values(), dtype=np.int64, count=len(ratings))
    order = np.lexsort((docs, -grades))
    top = grades[order][:k]
    return top[top > 0].astype(np.float64)


def rank_eval(
    requests: list[dict],
    *,
    k: int = 10,
    relevant_threshold: int = 1,
    gmax: int | None = None,
    round_to: int = 6,
) -> pa.Table:
    """Each request: ``{"id": qid, "hits": [doc, ...], "ratings":
    {doc: grade}}``.  Returns one row per request with every metric.
    ``gmax`` defaults to the max grade seen across all requests (ES
    ERR uses the per-metric configured max)."""
    if gmax is None:
        gmax = max(
            (g for r in requests for g in r["ratings"].values()),
            default=1,
        ) or 1
    rows = {
        "query_id": [], "precision_k": [], "recall_k": [], "mrr": [],
        "dcg_k": [], "ndcg_k": [], "err_k": [],
    }
    for req in requests:
        ratings = req["ratings"]
        hits = np.asarray(req["hits"][:k], dtype=np.int64)
        grades = np.array(
            [ratings.get(int(d), 0) for d in hits], dtype=np.float64
        )
        n = len(hits)
        ranks = np.arange(1, n + 1, dtype=np.float64)
        rel = grades >= relevant_threshold
        n_rel_total = sum(
            1 for g in ratings.values() if g >= relevant_threshold
        )
        precision = float(rel.sum() / n) if n else 0.0
        recall = float(rel.sum() / n_rel_total) if n_rel_total else 0.0
        first = np.nonzero(rel)[0]
        mrr = float(1.0 / ranks[first[0]]) if len(first) else 0.0
        gains = (np.exp2(grades) - 1.0) / np.log2(ranks + 1.0)
        dcg = float(gains.sum())
        ideal = _ideal_gains(ratings, k)
        idcg = float(
            ((np.exp2(ideal) - 1.0)
             / np.log2(np.arange(1, len(ideal) + 1) + 1.0)).sum()
        ) if len(ideal) else 0.0
        ndcg = dcg / idcg if idcg > 0 else 0.0
        r_probs = (np.exp2(grades) - 1.0) / (2.0 ** gmax)
        # prod_{i<r}(1 - R_i) via shifted cumulative product
        carry = np.concatenate(([1.0], np.cumprod(1.0 - r_probs)[:-1]))
        err = float((r_probs * carry / ranks).sum())
        rows["query_id"].append(int(req["id"]))
        rows["precision_k"].append(round(precision, round_to))
        rows["recall_k"].append(round(recall, round_to))
        rows["mrr"].append(round(mrr, round_to))
        rows["dcg_k"].append(round(dcg, round_to))
        rows["ndcg_k"].append(round(ndcg, round_to))
        rows["err_k"].append(round(err, round_to))
    return pa.table({
        "query_id": pa.array(rows["query_id"], pa.int64()),
        **{m: pa.array(rows[m], pa.float64())
           for m in ("precision_k", "recall_k", "mrr", "dcg_k",
                     "ndcg_k", "err_k")},
    })
