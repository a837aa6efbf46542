"""Benchmark decontamination — flag training documents that share any
word n-gram with a benchmark/test set (the GPT-3 appendix-C / Llama
"n-gram overlap" decontamination family: a training doc containing a
verbatim benchmark n-gram leaks the test set into the model).

Ray-Data-first shape:

1. The benchmark side is SMALL by definition (test sets are thousands
   of rows, not billions) — its distinct n-gram strings build in one
   driver-side pass and broadcast ONCE via ``ray.put`` (object-store
   deduped per node, never re-shipped per batch).
2. The training scan is a stateful ``map_batches`` stage
   (:class:`Decontaminator`): the broadcast gram array resolves once
   per actor in ``__init__``; each batch does ONE Arrow tokenize
   (the index build's RE2 kernel), builds its n-gram strings from n
   zero-copy slices (``binary_join_element_wise``), dedups (doc, gram)
   pairs with a dictionary-encode + lexsort, and membership-tests
   against the SORTED benchmark array with one searchsorted — fully
   vectorized, no per-row Python.
3. Gram identity is the exact STRING (hash-free — collisions can't
   create false contamination), matching the SQL oracle verbatim.

Docs shorter than n tokens report ``n_grams = n_hits = 0`` and
``contaminated = False`` (nothing to leak).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..index.build import tokenize_codes_arrow

DEFAULT_N = 3  # contract-sized; production decontamination uses 8–13


def benchmark_ngrams(
    bench: pa.Table,
    n: int = DEFAULT_N,
    text_col: str = "text",
    analyzer: str = "simple",
    clip: tuple[int, int] = (1, 64),
) -> np.ndarray:
    """Distinct n-gram strings of the benchmark table, SORTED (the
    searchsorted membership contract).  One Arrow tokenize — the same
    kernel the scan stage uses, so both sides see identical grams."""
    gram, _ = _doc_grams(bench.column(text_col), n, analyzer, clip)
    if len(gram) == 0:
        return np.empty(0, dtype=object)
    return np.unique(gram.to_numpy(zero_copy_only=False))


def _doc_grams(
    texts: pa.ChunkedArray | pa.Array, n: int, analyzer: str,
    clip: tuple[int, int],
) -> tuple[pa.Array, np.ndarray]:
    """(gram strings, per-gram doc-REL index) for one batch of texts —
    n-grams never cross a document boundary."""
    import pyarrow.compute as pc

    terms, codes, rel, _dls = tokenize_codes_arrow(
        texts, analyzer, clip[0], clip[1], {}
    )
    ntok = len(codes)
    if ntok < n:
        return pa.array([], pa.string()), np.empty(0, np.int64)
    rel = np.asarray(rel, dtype=np.int64)
    m = ntok - n + 1
    same_doc = rel[:m] == rel[n - 1:]
    tok = pc.take(pa.array(terms, pa.string()), pa.array(codes, pa.int64()))
    parts = [tok.slice(i, m) for i in range(n)]
    gram = pc.binary_join_element_wise(*parts, " ")
    if not same_doc.all():
        gram = pc.filter(gram, pa.array(same_doc))
    return gram, rel[:m][same_doc]


class Decontaminator:
    """Stateful ``map_batches`` stage: per-doc benchmark-overlap counts.

    ``grams_ref`` is the ``ray.put`` handle of the SORTED benchmark
    n-gram array — resolved once per actor here, not per batch."""

    def __init__(
        self,
        grams_ref,
        n: int = DEFAULT_N,
        text_col: str = "text",
        id_col: str = "doc_id",
        analyzer: str = "simple",
        clip: tuple[int, int] = (1, 64),
    ):
        import ray

        self.grams = (
            ray.get(grams_ref)
            if isinstance(grams_ref, ray.ObjectRef) else grams_ref
        )
        self.n = n
        self.text_col = text_col
        self.id_col = id_col
        self.analyzer = analyzer
        self.clip = clip

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column(self.id_col).to_numpy()
        gram, rel = _doc_grams(
            batch.column(self.text_col), self.n, self.analyzer, self.clip
        )
        n_grams = np.zeros(len(doc_ids), dtype=np.int64)
        n_hits = np.zeros(len(doc_ids), dtype=np.int64)
        if len(rel):
            # distinct (doc, gram) pairs: dictionary-encode + lexsort
            enc = pa.chunked_array([gram]).combine_chunks() \
                .dictionary_encode()
            gc = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.lexsort((gc, rel))
            rs, gs = rel[order], gc[order]
            first = np.ones(len(gs), dtype=bool)
            first[1:] = (rs[1:] != rs[:-1]) | (gs[1:] != gs[:-1])
            rs, gs = rs[first], gs[first]
            np.add.at(n_grams, rs, 1)
            if len(self.grams):
                dict_np = enc.dictionary.to_numpy(zero_copy_only=False)
                pos = np.clip(
                    np.searchsorted(self.grams, dict_np),
                    0, len(self.grams) - 1,
                )
                dict_hit = self.grams[pos] == dict_np
                np.add.at(n_hits, rs[dict_hit[gs]], 1)
        return pa.table({
            "doc_id": pa.array(doc_ids.astype(np.int64), pa.int64()),
            "n_grams": pa.array(n_grams),
            "n_hits": pa.array(n_hits),
            "contaminated": pa.array(n_hits > 0),
        })


def decontaminate(
    ds,
    bench: pa.Table,
    n: int = DEFAULT_N,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "simple",
    clip: tuple[int, int] = (1, 64),
    concurrency: int = 4,
    batch_size: int = 2048,
):
    """Per-doc benchmark-overlap report over a training ``Dataset``:
    ``(doc_id, n_grams, n_hits, contaminated)`` — distinct in-doc
    n-grams, how many of them appear in the benchmark, and the leak
    flag.  The benchmark gram set broadcasts once; the scan streams.

    ``concurrency`` is capped at cluster CPUs − 1: an actor pool that
    pins EVERY CPU starves the upstream read tasks and the pipeline
    deadlocks (observed at concurrency=4 on a 4-CPU session)."""
    import ray

    if ray.is_initialized():
        avail = int(ray.cluster_resources().get("CPU", 2))
        concurrency = max(1, min(concurrency, avail - 1))
    grams_ref = ray.put(benchmark_ngrams(bench, n, text_col, analyzer, clip))
    return ds.map_batches(
        Decontaminator,
        fn_constructor_kwargs=dict(
            grams_ref=grams_ref, n=n, text_col=text_col, id_col=id_col,
            analyzer=analyzer, clip=clip,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
