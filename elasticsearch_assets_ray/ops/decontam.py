"""Benchmark decontamination — the standard LLM training-data hygiene
pass: flag (and drop) training documents that share at least
``min_overlap`` DISTINCT word n-grams with any document of a
benchmark/eval set, so evaluation data never leaks into training (the
n-gram-overlap methodology described publicly in the GPT-3/PaLM papers'
contamination appendices).

Ray-Data shape: the benchmark side is SMALL (an eval set) — its distinct
n-gram strings broadcast once via ``ray.put`` and every ``map_batches``
task membership-tests its batch's grams against them with one Arrow
``is_in`` kernel (no shuffle, no join; the corpus streams).  Work per
batch is one Arrow tokenize + n-1 zero-copy slices + one join kernel —
the same cost profile as the index build's tokenize pass, so the op runs
at corpus-build throughput at any scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..index.build import tokenize_codes_arrow


def doc_ngrams_arrow(
    texts: "pa.Array | pa.ChunkedArray",
    n: int,
    analyzer: str = "simple",
    clip: tuple[int, int] = (1, 64),
) -> tuple[pa.Array, np.ndarray]:
    """Word n-grams of every document, vectorized: one Arrow tokenize
    (document order preserved), n-1 zero-copy slices joined by one
    ``binary_join_element_wise`` kernel, doc-boundary crossings masked.
    Returns (gram strings, parallel doc-relative indexes)."""
    terms, codes, doc_rel, _ = tokenize_codes_arrow(
        texts, analyzer, clip[0], clip[1], {}
    )
    ntok = len(codes)
    if ntok < n:
        return pa.array([], pa.string()), np.empty(0, np.int64)
    tok = pc.take(pa.array(terms, pa.string()),
                  pa.array(codes, pa.int64()))
    m = ntok - n + 1
    parts = [tok.slice(i, m) for i in range(n)]
    gram = pc.binary_join_element_wise(*parts, " ")
    doc_rel = np.asarray(doc_rel, dtype=np.int64)
    same_doc = doc_rel[:m] == doc_rel[n - 1:]
    if not same_doc.all():
        keep = pa.array(same_doc)
        gram = pc.filter(gram, keep)
    return gram, doc_rel[:m][same_doc]


def benchmark_gram_ref(
    bench_texts: "pa.Array | list[str]",
    n: int,
    analyzer: str = "simple",
    clip: tuple[int, int] = (1, 64),
):
    """Distinct n-grams of the benchmark set → one ``ray.put`` handle
    (broadcast once, read zero-copy by every task — never re-shipped per
    batch)."""
    if isinstance(bench_texts, list):
        bench_texts = pa.array(bench_texts, pa.string())
    grams, _ = doc_ngrams_arrow(bench_texts, n, analyzer, clip)
    return ray.put(pc.unique(grams))


def contamination_counts(
    texts: "pa.Array | pa.ChunkedArray",
    bench_grams: pa.Array,
    n: int,
    analyzer: str = "simple",
    clip: tuple[int, int] = (1, 64),
) -> np.ndarray:
    """Per-document count of DISTINCT n-grams shared with the benchmark
    set (the batch kernel behind :func:`decontaminate`)."""
    ndocs = (
        texts.length() if isinstance(texts, pa.ChunkedArray) else len(texts)
    )
    out = np.zeros(ndocs, dtype=np.int64)
    grams, gdoc = doc_ngrams_arrow(texts, n, analyzer, clip)
    if len(grams) == 0 or len(bench_grams) == 0:
        return out
    hit = pc.is_in(grams, value_set=bench_grams).to_numpy(
        zero_copy_only=False
    )
    if not hit.any():
        return out
    # distinct (doc, gram) pairs among the hits: dictionary-encode the
    # hit grams (batch-local codes) and unique the composite key
    hg = pc.filter(grams, pa.array(hit))
    enc = hg.dictionary_encode() if not isinstance(hg, pa.ChunkedArray) \
        else hg.combine_chunks().dictionary_encode()
    codes = enc.indices.to_numpy().astype(np.int64)
    nd = np.int64(len(enc.dictionary))
    pairs = np.unique(gdoc[hit] * nd + codes)
    np.add.at(out, (pairs // nd), 1)
    return out


def decontaminate(
    ds,
    bench_ref,
    n: int = 3,
    min_overlap: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "simple",
    clip: tuple[int, int] = (1, 64),
):
    """Dataset → (id, n_contaminated, contaminated) per document.

    ``bench_ref`` is the :func:`benchmark_gram_ref` handle; a doc is
    contaminated when it shares ≥ ``min_overlap`` distinct ``n``-grams
    with the benchmark set.  Filter training data with
    ``ds.filter`` over the flag, or join the counts back for auditing.
    """

    def fn(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        counts = contamination_counts(
            batch.column(text_col), bench, n, analyzer, clip
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_contaminated": pa.array(counts, pa.int64()),
                "contaminated": pa.array(counts >= min_overlap),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
