"""ES *retriever tree* (the 8.14+ ``retriever`` search-request syntax):
one declarative tree whose LEAVES produce ranked lists and whose
COMPOUND nodes fuse them — the API surface that superseded ad-hoc
hybrid-search request plumbing.

Supported nodes (the GA set):

- ``{"standard": {"query": <match text>}}`` — BM25 serving (either
  engine), ranks under the contract order (rounded score desc, orig id
  asc);
- ``{"standard": {"query_string": <q>}}`` — the full ``q=`` Lucene
  grammar (``search/qs.py``) as the leaf;
- ``{"knn": {"query_vector_id": vid, "k": n}}`` or the ES form
  ``{"knn": {"query_vector": [floats...], "k": n, "similarity": s}}``
  — exact cosine ranks over an embeddings table
  (``ops/similarity.knn_cosine``; vec_id is the document id space,
  like the ES dense_vector field on the same index).  Search is
  EXACT, so ES's ``num_candidates`` recall knob is accepted and
  ignored; ``similarity`` drops hits below the cutoff (ES 8.8);
- ``{"rrf": {"retrievers": [...], "rank_constant": 60,
  "rank_window_size": 50}}`` — reciprocal rank fusion of any child
  nodes, NESTED arbitrarily: an inner rrf's fused ranking feeds the
  outer fusion by its rank positions, exactly the ES composition.

Every leaf is exact and deterministic, so a single-level tree is
SQL-oracled (``retriever_tree`` pipeline) and nesting is covered by
composition tests (outer-of-inner ≡ manual two-stage fusion by
construction — the same function computes both).
"""

from __future__ import annotations

import numpy as np

from .hybrid import rrf_fuse


class RetrieverContext:
    """Lazily-built leaf resources: the text engine, the orig-id
    docstore mapping, and the embeddings table for knn leaves."""

    def __init__(self, engine, index_dir: str, embeddings_path: str | None
                 = None):
        self.engine = engine
        self.index_dir = index_dir
        self.embeddings_path = embeddings_path
        self._store = None
        self._emb = None

    def ranked(self, hits: list[tuple[int, float]],
               depth: int) -> list[tuple[int, float]]:
        """Engine hits → (orig id, score) rows under the contract order
        (round(score,4) desc, orig asc), capped at ``depth``."""
        from ..state.docstore import DocStore

        if not hits:
            return []
        if self._store is None:
            # corpora indexed without an explicit id column carry no
            # orig_id docmeta (internal ids ARE the original ids) —
            # fall back to the identity mapping.  Detection is
            # STRUCTURAL (a footer-only schema read of the first
            # docmeta partition): a probe-read-and-catch here would
            # silently degrade any transient IO failure on an index
            # that DOES carry orig_id into wrong `_id`s.
            import pyarrow.parquet as _pq

            from ..index.build import docmeta_path

            store = DocStore(self.index_dir, columns=["doc_id"])
            schema = _pq.read_schema(
                docmeta_path(self.index_dir, int(store._pids[0])))
            if "orig_id" in schema.names:
                store = DocStore(self.index_dir,
                                 columns=["doc_id", "orig_id"])
            self._store = store
        ids = np.array([d for d, _ in hits], dtype=np.int64)
        sc = np.array([s for _, s in hits], dtype=np.float64)
        got = self._store.mget(ids)
        orig = (got.column("orig_id") if "orig_id" in got.schema.names
                else got.column("doc_id")).to_numpy().astype(np.int64)
        top = np.lexsort((orig, -np.round(sc, 4)))[:depth]
        return [(int(orig[i]), float(sc[i])) for i in top]

    def orig_ids(self, hits: list[tuple[int, float]],
                 depth: int) -> list[int]:
        return [d for d, _ in self.ranked(hits, depth)]

    def knn_ranked(self, query, depth: int,
                   similarity: float | None = None
                   ) -> list[tuple[int, float]]:
        """``query``: an embeddings-table row id (query_vector_id) or a
        raw vector (the ES query_vector form) → ``[(vec_id, sim_r)]``
        in rank order (serving-rounded cosine similarities — the ES
        knn ``_score``)."""
        import ray.data as rd

        from ..ops import similarity as sim

        if self.embeddings_path is None:
            raise ValueError("knn retriever needs an embeddings_path")
        if self._emb is None:
            self._emb = rd.read_parquet(self.embeddings_path)
        if isinstance(query, (list, tuple, np.ndarray)):
            q = np.asarray([query], dtype=np.float64)
            qid = [0]
        else:
            qid = [int(query)]
            q = sim.queries_from_dataset(self._emb, qid)
        out = sim.knn_cosine(self._emb, q, qid, k=depth,
                             similarity=similarity)
        return list(zip(out.column("vec_id").to_pylist(),
                        out.column("sim_r").to_pylist()))

    def knn_ranks(self, query, depth: int,
                  similarity: float | None = None) -> list[int]:
        return [d for d, _ in self.knn_ranked(query, depth, similarity)]


def execute_retriever(
    spec: dict, ctx: RetrieverContext, k: int = 10
) -> list[tuple[int, float]]:
    """Execute a retriever tree → ranked ``[(orig_doc_id, score)]``.
    Leaf scores are the leaf's own (BM25 / cosine); an ``rrf`` node's
    scores are the fused reciprocal-rank sums."""
    if len(spec) != 1:
        raise ValueError("a retriever node has exactly one key")
    kind, body = next(iter(spec.items()))
    if kind == "rrf":
        children = body["retrievers"]
        if not children:
            raise ValueError("rrf retriever needs children")
        rc = int(body.get("rank_constant", 60))
        window = int(body.get("rank_window_size", 50))
        rankings = [
            _rank_list(child, ctx, window) for child in children
        ]
        return rrf_fuse(rankings, k=k, rank_constant=rc)
    if kind == "standard":
        if "query_string" in body:
            hits = ctx.engine.search_query_string(
                body["query_string"], k=1 << 30
            )
        else:
            hits = ctx.engine.search(body["query"], k=1 << 30)
        return ctx.ranked(hits, k)
    if kind == "knn":
        # top-level knn leaf scores = serving-rounded cosine sims (the
        # ES knn _score); under an rrf parent only the RANKS feed the
        # fusion, so compound results are unchanged
        return ctx.knn_ranked(_knn_query(body), int(body.get("k", k)),
                              similarity=body.get("similarity"))[:k]
    raise ValueError(f"unknown retriever kind {kind!r}")


def _knn_query(body: dict):
    """The knn leaf's query: raw ``query_vector`` (ES form) wins over
    the corpus-keyed ``query_vector_id``."""
    if "query_vector" in body:
        return list(body["query_vector"])
    return int(body["query_vector_id"])


def _rank_list(spec: dict, ctx: RetrieverContext, window: int
               ) -> list[int]:
    """A child node's rank list, capped at the parent's window."""
    kind, body = next(iter(spec.items()))
    if kind == "standard":
        if "query_string" in body:
            hits = ctx.engine.search_query_string(
                body["query_string"], k=1 << 30
            )
        else:
            hits = ctx.engine.search(body["query"], k=1 << 30)
        return ctx.orig_ids(hits, window)
    if kind == "knn":
        return ctx.knn_ranks(_knn_query(body), window,
                             similarity=body.get("similarity"))
    if kind == "rrf":
        fused = execute_retriever(spec, ctx, k=window)
        return [d for d, _ in fused]
    raise ValueError(f"unknown retriever kind {kind!r}")
