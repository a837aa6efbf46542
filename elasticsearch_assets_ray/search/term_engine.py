"""BM25 serving over the TERM-partitioned global index.

The doc-partitioned engine (`search.engine`) routes every query to every
shard actor; this engine is the other classical layout: postings live
with their TERM (the groupby-on-term merge output,
``index/global_merge.py``), so a query touches ONLY the bucket actors
owning its terms — the per-query fan-out is bounded by the query's term
count, not the cluster size.  The trade: scoring needs each posting's
document length, which lives with the DOC partitions — resolved by the
precomputed-impact trick (``store_norms=True`` at merge time bakes
``tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))`` per posting, float64, k1/b/avgdl
frozen at merge), so serving is a pure gather + weighted merge:

    query → analyze (manifest-recorded analyzer + clip)
          → terms grouped by bucket → ONLY those bucket actors fetch
            (term, df, doc_ids, norms) with salt parts un-salted
          → coordinator: contributions emitted in sorted-term order,
            stable sort by doc, segmented sum → exact BM25 scores
          → top-k (score desc, doc_id asc; rounded-tie aware)

Score identity: the per-posting norm is the exact float64 expression the
dense doc-partitioned scorer evaluates, idf uses the same formula, and
the per-doc accumulation order (sorted terms) matches — rank AND score
identical to ``BM25Oracle`` (tested).

Partitioning assumption (custom-operator contract): a hot term's salt
parts all live in ITS bucket — fetching a term is one actor call; the
per-actor memory bound is its buckets' total postings (hash-balanced
across ``n_buckets``).
"""

from __future__ import annotations

import json
import math
from pathlib import Path

import numpy as np
import pyarrow.dataset as pds

import ray

from ..analysis.tokenizer import clip_tokens, get_analyzer
from ..index.codec import decode_postings


def _load_meta(global_dir: str | Path) -> dict:
    p = Path(global_dir) / "_globalmeta.json"
    if not p.exists():
        raise FileNotFoundError(
            f"no _globalmeta.json in {global_dir} — build the layout with "
            "merge_global_postings(...)"
        )
    return json.loads(p.read_text())


class _BucketCore:
    """Holds a set of term-hash buckets in memory: term → un-salted
    (doc_ids, norms, df)."""

    def __init__(self, global_dir: str, bucket_ids: list[int]):
        self.terms: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
        meta = _load_meta(global_dir)
        if not meta.get("store_norms"):
            raise ValueError(
                "term-partitioned serving needs store_norms=True at merge time"
            )
        for b in bucket_ids:
            d = Path(global_dir) / f"bucket={b}"
            if not d.exists():
                continue
            tbl = pds.dataset(str(d)).to_table(
                columns=["term", "salt", "postings", "norms", "df"]
            )
            by_term: dict[str, list[tuple[int, bytes, bytes, int]]] = {}
            for i in range(tbl.num_rows):
                t = tbl.column("term")[i].as_py()
                by_term.setdefault(t, []).append(
                    (
                        tbl.column("salt")[i].as_py(),
                        tbl.column("postings")[i].as_py(),
                        tbl.column("norms")[i].as_py(),
                        tbl.column("df")[i].as_py(),
                    )
                )
            for t, parts in by_term.items():
                parts.sort(key=lambda p: p[0])
                ids_parts, norm_parts, df = [], [], 0
                for _, blob, nblob, pdf in parts:
                    d_ids, _tfs = decode_postings(blob)
                    ids_parts.append(d_ids)
                    norm_parts.append(np.frombuffer(nblob, dtype="<f8"))
                    df += pdf
                ids = np.concatenate(ids_parts)
                norms = np.concatenate(norm_parts)
                order = np.argsort(ids, kind="stable")
                self.terms[t] = (ids[order].astype(np.int64), norms[order], df)

    def fetch(self, terms: list[str]):
        """→ {term: (doc_ids, norms, df)} for the terms this core owns."""
        return {t: self.terms[t] for t in terms if t in self.terms}


@ray.remote
class TermBucketActor(_BucketCore):
    """Ray actor wrapper: buckets load once, queries gather from it."""


class TermPartitionedEngine:
    """Distributed BM25 top-k over the term-partitioned layout."""

    def __init__(self, global_dir: str | Path, num_actors: int = 4,
                 round_decimals: int | None = None):
        self.global_dir = str(global_dir)
        self.meta = _load_meta(global_dir)
        if not self.meta.get("store_norms"):
            raise ValueError(
                "term-partitioned serving needs store_norms=True at merge time"
            )
        self.n = int(self.meta["num_docs"])
        self.round_decimals = round_decimals
        n_buckets = int(self.meta["n_buckets"])
        num_actors = max(1, min(num_actors, n_buckets))
        groups: list[list[int]] = [[] for _ in range(num_actors)]
        self._actor_of_bucket: dict[int, int] = {}
        for b in range(n_buckets):
            groups[b % num_actors].append(b)
            self._actor_of_bucket[b] = b % num_actors
        self.actors = [
            TermBucketActor.remote(self.global_dir, g) for g in groups
        ]
        name = self.meta.get("analyzer", "code")
        self._analyzer = get_analyzer("code" if name == "per_lang" else name)
        self._clip = (
            int(self.meta.get("min_token_len", 1)),
            int(self.meta.get("max_token_len", 64)),
        )
        self._n_buckets = n_buckets

    def _analyze(self, query: str) -> list[str]:
        return sorted(set(clip_tokens(self._analyzer(query), *self._clip)))

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        from ..index.global_merge import _term_bucket

        terms = self._analyze(query)
        if not terms:
            return []
        by_actor: dict[int, list[str]] = {}
        for t in terms:
            a = self._actor_of_bucket[_term_bucket(t, self._n_buckets)]
            by_actor.setdefault(a, []).append(t)
        futs = [
            self.actors[a].fetch.remote(ts) for a, ts in by_actor.items()
        ]
        fetched: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
        for part in ray.get(futs):
            fetched.update(part)
        # contributions in SORTED term order — the accumulation-order pin
        # that keeps scores bit-identical to the dense scorer / oracle
        d_parts: list[np.ndarray] = []
        c_parts: list[np.ndarray] = []
        for t in terms:
            got = fetched.get(t)
            if got is None:
                continue
            ids, norms, df = got
            idf = math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))
            d_parts.append(ids)
            c_parts.append(idf * norms)
        if not d_parts:
            return []
        d_all = np.concatenate(d_parts)
        c_all = np.concatenate(c_parts)
        order = np.argsort(d_all, kind="stable")
        d_all, c_all = d_all[order], c_all[order]
        starts = np.nonzero(np.concatenate([[True], d_all[1:] != d_all[:-1]]))[0]
        docs = d_all[starts]
        scores = np.add.reduceat(c_all, starts)
        cut = np.lexsort((docs, -scores))
        if self.round_decimals is None or len(cut) <= k:
            cut = cut[:k]
        else:
            r = self.round_decimals
            kth_r = np.round(scores[cut[k - 1]], r) if k else None
            c = k
            while c < len(cut) and np.round(scores[cut[c]], r) == kth_r:
                c += 1
            cut = cut[:c]
        return list(zip(docs[cut].tolist(), scores[cut].tolist()))

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []


class TermBulkScorer:
    """Dataset stage over an existing :class:`TermPartitionedEngine`'s
    bucket actors — the term-partitioned mirror of
    ``engine.DistributedBulkScorer``: each query batch gathers postings
    from ONLY the buckets its terms hash to and merges on the task.

    Input batch: (query_id:int64, query:string[, k:int32]).
    Output: (query_id:int64, rank:int32, doc_id:int64, score:float64).
    """

    def __init__(self, engine: "TermPartitionedEngine"):
        # plain picklables + actor handles; tasks talk straight to the
        # long-lived bucket actors
        self.eng = engine

    def __call__(self, batch):
        import pyarrow as pa

        qids = batch.column("query_id").to_pylist()
        texts = batch.column("query").to_pylist()
        ks = (
            batch.column("k").to_pylist()
            if "k" in batch.column_names
            else [10] * len(qids)
        )
        o_qid, o_rank, o_doc, o_score = [], [], [], []
        for qid, q, k in zip(qids, texts, ks):
            for r, (d, s) in enumerate(self.eng.search(q, k=int(k))):
                o_qid.append(qid)
                o_rank.append(r + 1)
                o_doc.append(d)
                o_score.append(s)
        return pa.table(
            {
                "query_id": pa.array(o_qid, pa.int64()),
                "rank": pa.array(o_rank, pa.int32()),
                "doc_id": pa.array(o_doc, pa.int64()),
                "score": pa.array(o_score, pa.float64()),
            }
        )


def score_queries_dataset_term(queries_ds, engine: "TermPartitionedEngine",
                               batch_size: int = 256):
    """Bulk-score a query Dataset against the term-partitioned engine."""
    return queries_ds.map_batches(
        TermBulkScorer(engine),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
