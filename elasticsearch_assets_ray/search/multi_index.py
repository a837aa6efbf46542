"""Cross-index search (the ES multi-index ``_search`` target
``index1,index2,...``) with ``dfs_query_then_fetch`` EXACTNESS.

ES's default query_then_fetch scores each index with its LOCAL
df/N/avgdl, so merged rankings are only approximately comparable; the
``dfs_query_then_fetch`` search type pre-gathers GLOBAL term/collection
statistics so scores are identical to one index holding the union.
This engine implements the exact mode: the coordinator sums dfs across
the member indexes, every shard actor adopts the combined (N, avgdl)
via the live-refresh stats hook, and the idf dict ships with each
query — so results are BIT-IDENTICAL to a single index built over the
concatenated corpus (the contract oracle IS the single-index BM25 SQL).

Hits return as (index_ordinal, doc_id, score); doc ids stay in each
member's own id space (the caller hydrates per member — orig ids are
the cross-index join key, exactly the ES `_index` + `_id` envelope).
"""

from __future__ import annotations

import math

import numpy as np
import ray

from .engine import QueryEngine, merge_topk


class MultiIndexEngine:
    """Search N :class:`QueryEngine` members as one logical index."""

    def __init__(self, engines: list[QueryEngine]):
        if not engines:
            raise ValueError("need at least one member engine")
        self.engines = engines
        self.n = sum(e.info.stats.num_docs for e in engines)
        total = sum(e.info.stats.total_tokens for e in engines)
        self.avgdl = total / self.n if self.n else 0.0
        # dfs_query_then_fetch: every member's actors score under the
        # COMBINED stats (the add_shards stats hook with no new shards)
        ray.get([
            a.add_shards.remote([], self.avgdl, self.n)
            for e in engines for a in e.actors
        ])
        self._round = engines[0].params.round_decimals

    def dfs(self, terms: list[str]) -> dict[str, int]:
        out = {t: 0 for t in terms}
        for e in self.engines:
            for t, df in e.dfs(terms).items():
                out[t] += df
        return out

    def idfs(self, terms: list[str]) -> dict[str, float]:
        dfs = self.dfs(terms)
        return {
            t: math.log(1.0 + (self.n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            for t in terms
        }

    def search(
        self, query: str, k: int = 10,
        indices_boost: list[float] | None = None,
    ) -> list[tuple[int, int, float]]:
        """BM25 top-k across every member → [(index_ordinal, doc_id,
        score)] under the standard serving tie contract (rounded score
        desc, then member ordinal asc, then doc asc — a deterministic
        total order; single-member it coincides with QueryEngine).

        ``indices_boost`` (the ES option, one multiplier per member in
        ordinal order) scales each member's scores BEFORE the rounded
        merge — the ES semantics of boosting hits from more-important
        indexes."""
        terms = self.engines[0]._analyze(query)
        if not terms:
            return []
        if indices_boost is not None and len(indices_boost) != len(
                self.engines):
            raise ValueError("indices_boost needs one value per member")
        idf = self.idfs(terms)
        futs = [
            (ei, a.topk.remote([(0, terms, k)], idf))
            for ei, e in enumerate(self.engines) for a in e.actors
        ]
        parts = []
        for ei, f in futs:
            res = ray.get(f)
            ids, sc = res[0][1], res[0][2]
            if indices_boost is not None:
                sc = sc * float(indices_boost[ei])
            # pack the member ordinal above the doc id so the standard
            # merge's doc-ascending tie break becomes (member, doc)
            parts.append(((np.int64(ei) << np.int64(48)) | ids, sc))
        ids, sc = merge_topk(parts, k, self._round)
        mask = np.int64((1 << 48) - 1)
        return [
            (int(d >> 48), int(d & mask), float(s))
            for d, s in zip(ids, sc)
        ]
