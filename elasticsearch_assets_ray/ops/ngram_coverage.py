"""Duplicate n-gram span coverage — the exact-substring-dedup signal
(Lee et al. 2021, "Deduplicating Training Data Makes Language Models
Better", arXiv:2107.06499): for every document, the fraction of its
token positions covered by at least one word n-gram that ALSO occurs in
another document.  High coverage ⇒ the doc is largely boilerplate /
near-copy; curation pipelines drop or trim on it (the RefinedWeb /
Dolma "duplicate n-gram coverage" family).  Unlike MinHash (whole-doc
similarity) this catches PARTIAL copies — a unique page wrapping a
copied paragraph.

Ray-Data-first shape, two fixed-bucket exchanges, no driver state:

1. ``map_batches`` extract: one Arrow tokenize per batch, n-gram rows
   ``(doc_id, pos, gram, bucket)`` built from n zero-copy slices;
   the route bucket comes from a token-hash polynomial (distinct-term
   FNV, O(n) vectorized combines) but gram IDENTITY inside a bucket is
   the exact STRING — hash collisions can co-locate grams, never merge
   them.
2. ``groupby(bucket).map_groups``: per bucket, factorize gram strings,
   count DISTINCT docs per gram (one lexsort), emit the (doc_id, pos)
   rows of grams seen in ≥ 2 docs.
3. union with per-doc token-count rows, ``groupby(doc bucket)``: per
   doc, interval-union the covered spans ``[pos, pos+n)`` (sorted
   positions, Σ min(n, gap)) and divide by the token count — one exact
   integer IEEE division, so the DuckDB oracle hash-matches.

Docs with fewer than n tokens (or no duplicated grams) report coverage
0.0 — they appear in the output (the per-doc token-count rows guarantee
it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..index.build import in_doc_positions, tokenize_codes_arrow

_POLY = np.uint64(0x9E3779B97F4A7C15)  # odd → bijective mixing mod 2^64


_POLY2 = np.uint64(0xC2B2AE3D27D4EB4F)  # second, independent channel


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — derives the second hash
    channel's per-term values from the fnv ones (uint64 in/out)."""
    with np.errstate(over="ignore"):
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _gram_rows(
    batch: pa.Table, n: int, analyzer: str, clip: tuple[int, int],
    text_col: str, id_col: str, n_buckets: int,
    gram_identity: str = "exact",
) -> pa.Table:
    import pyarrow.compute as pc

    from ..index.global_merge import _fnv1a64_vec

    hash_id = gram_identity == "hash128"
    terms, codes, rel, dls = tokenize_codes_arrow(
        batch.column(text_col), analyzer, clip[0], clip[1], {}
    )
    doc_ids = batch.column(id_col).to_numpy()
    nd = len(doc_ids)
    id_cols_dl = (
        {"g1": pa.array(np.zeros(nd, np.int64)),
         "g2": pa.array(np.zeros(nd, np.int64))}
        if hash_id else {"gram": pa.array([""] * nd, pa.string())}
    )
    out_dl = pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "kind": pa.array(np.zeros(nd, np.int8)),
        "val": pa.array(np.asarray(dls, dtype=np.int64)),
        **id_cols_dl,
        "bucket": pa.array(
            np.asarray(doc_ids, np.int64) % n_buckets, pa.int32()
        ),
    })
    ntok = len(codes)
    if ntok < n:
        return out_dl
    rel = np.asarray(rel, dtype=np.int64)
    pos = in_doc_positions(rel)
    m = ntok - n + 1
    same_doc = rel[:m] == rel[n - 1:]
    th = _fnv1a64_vec(pa.array(terms, pa.string()))
    h_tok = th[codes]
    with np.errstate(over="ignore"):
        g = np.zeros(m, dtype=np.uint64)
        for i in range(n):
            g = g * _POLY + h_tok[i: i + m]
    keep = same_doc
    if hash_id:
        # 128-bit identity: two independent polynomial channels over
        # per-term hashes (fnv / splitmix64∘fnv, distinct odd
        # multipliers) — 16 wire bytes per occurrence instead of the
        # exact gram string.  Random-input collision odds ≈ K²/2^129
        # over K distinct grams; adversarial inputs can collide by
        # construction (polynomial hashes) — use gram_identity="exact"
        # when that matters.
        h2_tok = _splitmix64(th)[codes]
        with np.errstate(over="ignore"):
            g2 = np.zeros(m, dtype=np.uint64)
            for i in range(n):
                g2 = g2 * _POLY2 + h2_tok[i: i + m]
        g2 = g2[keep]
        gram = None
    else:
        # exact gram strings (identity) + hashed route bucket (placement)
        tok = pc.take(pa.array(terms, pa.string()),
                      pa.array(codes, pa.int64()))
        parts = [tok.slice(i, m) for i in range(n)]
        gram = pc.binary_join_element_wise(*parts, " ")
        if not keep.all():
            gram = pc.filter(gram, pa.array(keep))
    g = g[keep]
    gdoc = doc_ids[rel[:m][keep]]
    gpos = pos[:m][keep]
    id_cols = (
        {"g1": pa.array(g.view(np.int64)),
         "g2": pa.array(g2.view(np.int64))}
        if hash_id else {"gram": gram}
    )
    grams_tbl = pa.table({
        "doc_id": pa.array(gdoc.astype(np.int64), pa.int64()),
        "kind": pa.array(np.ones(len(g), np.int8)),
        "val": pa.array(gpos.astype(np.int64)),
        **id_cols,
        "bucket": pa.array(
            (g % np.uint64(n_buckets)).astype(np.int32), pa.int32()
        ),
    })
    return pa.concat_tables([out_dl, grams_tbl])


def _gram_sort_keys(group: pa.Table) -> tuple:
    """Gram-identity sort keys for a gram-bucket group: the exact-string
    path dictionary-encodes once; the hash128 path sorts its two int64
    channels directly (no string materialization anywhere)."""
    if "gram" in group.column_names:
        enc = group.column("gram").combine_chunks().dictionary_encode()
        return (enc.indices.to_numpy(zero_copy_only=False)
                .astype(np.int64),)
    return (group.column("g1").to_numpy(), group.column("g2").to_numpy())


def _run_boundaries(keys: tuple, order: np.ndarray) -> np.ndarray:
    """Boolean new-run mask over sorted order for composite keys."""
    first = keys[0][order]
    new = np.ones(len(first), dtype=bool)
    new[1:] = first[1:] != first[:-1]
    for kx in keys[1:]:
        kxo = kx[order]
        new[1:] |= kxo[1:] != kxo[:-1]
    return new


def _dup_gram_positions(group: pa.Table) -> pa.Table:
    """Per gram-bucket: (doc_id, pos) rows of grams occurring in ≥ 2
    DISTINCT docs — gram identity is the exact string (factorized once)
    or the two hash128 channels, per :func:`_gram_sort_keys`."""
    keys = _gram_sort_keys(group)
    doc = group.column("doc_id").to_numpy()
    pos = group.column("val").to_numpy()
    order = np.lexsort((doc,) + keys)
    new_gram = _run_boundaries(keys, order)
    ds_ = doc[order]
    new_pair = new_gram.copy()
    new_pair[1:] |= ds_[1:] != ds_[:-1]
    # distinct docs per gram = pairs per gram run
    gram_starts = np.nonzero(new_gram)[0]
    run_lens = np.diff(np.concatenate([gram_starts, [len(ds_)]]))
    pair_cum = np.cumsum(new_pair)
    docs_per_gram = np.diff(
        np.concatenate([pair_cum[gram_starts] - new_pair[gram_starts],
                        [pair_cum[-1]]])
    )
    dup = np.empty(len(ds_), dtype=bool)
    dup[order] = np.repeat(docs_per_gram >= 2, run_lens)
    return pa.table({
        "doc_id": pa.array(doc[dup].astype(np.int64), pa.int64()),
        "pos": pa.array(pos[dup].astype(np.int64), pa.int64()),
    })


def _coverage_group(group: pa.Table, n: int) -> pa.Table:
    """Per doc-bucket: interval-union of [pos, pos+n) spans per doc +
    the per-doc token counts → coverage rows."""
    doc = group.column("doc_id").to_numpy()
    kind = group.column("kind").to_numpy()
    val = group.column("val").to_numpy()
    dlm = kind == 0
    dl_doc, dl_val = doc[dlm], val[dlm]
    cov_doc, cov_pos = doc[~dlm], val[~dlm]
    covered = np.zeros(len(dl_doc), dtype=np.int64)
    if len(cov_doc):
        order = np.lexsort((cov_pos, cov_doc))
        d_s, p_s = cov_doc[order], cov_pos[order]
        # de-dup identical (doc, pos) then Σ min(n, next - pos)
        first = np.ones(len(d_s), dtype=bool)
        first[1:] = (d_s[1:] != d_s[:-1]) | (p_s[1:] != p_s[:-1])
        d_s, p_s = d_s[first], p_s[first]
        gap = np.full(len(p_s), n, dtype=np.int64)
        same = d_s[1:] == d_s[:-1]
        gap[:-1][same] = np.minimum(n, p_s[1:][same] - p_s[:-1][same])
        per_doc = np.zeros(len(dl_doc), dtype=np.int64)
        sorter = np.argsort(dl_doc)
        idx = sorter[np.searchsorted(dl_doc, d_s, sorter=sorter)]
        np.add.at(per_doc, idx, gap)
        covered = per_doc
    frac = np.zeros(len(dl_doc), dtype=np.float64)
    okd = dl_val > 0
    frac[okd] = covered[okd] / dl_val[okd]
    return pa.table({
        "doc_id": pa.array(dl_doc.astype(np.int64), pa.int64()),
        "n_tokens": pa.array(dl_val.astype(np.int64), pa.int64()),
        "covered_tokens": pa.array(covered, pa.int64()),
        "coverage": pa.array(frac, pa.float64()),
    })


def _loser_gram_positions(group: pa.Table) -> pa.Table:
    """Per gram-bucket: every (doc_id, pos) OCCURRENCE of a gram that
    occurs ≥ 2 times (in-doc repeats count — the suffix-dedup view),
    EXCEPT the global first occurrence (min (doc_id, pos)); a gram lands
    wholly in one bucket, so the in-bucket winner IS the global one."""
    keys = _gram_sort_keys(group)
    doc = group.column("doc_id").to_numpy()
    pos = group.column("val").to_numpy()
    order = np.lexsort((pos, doc) + keys)
    first = _run_boundaries(keys, order)
    starts = np.nonzero(first)[0]
    # winners of singleton grams aren't losers; winners of dup grams
    # keep their copy; everything else is removed
    lose = np.ones(len(first), dtype=bool)
    lose[starts] = False  # winner of each run
    keep_idx = order[lose]
    return pa.table({
        "doc_id": pa.array(doc[keep_idx].astype(np.int64), pa.int64()),
        "pos": pa.array(pos[keep_idx].astype(np.int64), pa.int64()),
    })


def _strip_group(group: pa.Table, n: int, analyzer: str,
                 clip: tuple[int, int]) -> pa.Table:
    """Per doc-bucket: re-tokenize the bucket's docs, blank every token
    position covered by a loser occurrence's [pos, pos+n) span, emit the
    kept token stream re-joined — all integer/string ops, no floats."""
    import pyarrow.compute as pc

    kind = group.column("kind").to_numpy()
    docm = kind == 0
    docs = group.filter(pa.array(docm))
    rem_doc = group.column("doc_id").to_numpy()[~docm]
    rem_pos = group.column("val").to_numpy()[~docm]
    doc_ids = docs.column("doc_id").to_numpy().astype(np.int64)
    order = np.argsort(doc_ids)
    docs = docs.take(pa.array(order, pa.int64()))
    doc_ids = doc_ids[order]
    terms, codes, rel, dls = tokenize_codes_arrow(
        docs.column("text"), analyzer, clip[0], clip[1], {}
    )
    dls = np.asarray(dls, dtype=np.int64)
    offsets = np.zeros(len(doc_ids) + 1, dtype=np.int64)
    offsets[1:] = np.cumsum(dls)
    removed = np.zeros(int(offsets[-1]) + 1, dtype=np.int64)
    if len(rem_doc):
        di = np.searchsorted(doc_ids, rem_doc)
        start = offsets[di] + rem_pos
        end = offsets[di] + np.minimum(rem_pos + n, dls[di])
        np.add.at(removed, start, 1)
        np.add.at(removed, end, -1)
    rm_mask = np.cumsum(removed[:-1]) > 0
    keep = ~rm_mask
    tok = pc.take(pa.array(terms, pa.string()),
                  pa.array(codes, pa.int64()))
    kept_tok = pc.filter(tok, pa.array(keep))
    kept_per_doc = np.zeros(len(doc_ids), dtype=np.int64)
    rel = np.asarray(rel, dtype=np.int64)
    np.add.at(kept_per_doc, rel[keep], 1)
    k_off = np.zeros(len(doc_ids) + 1, dtype=np.int64)
    k_off[1:] = np.cumsum(kept_per_doc)
    lists = pa.LargeListArray.from_arrays(
        pa.array(k_off, pa.int64()),
        kept_tok.combine_chunks() if isinstance(kept_tok, pa.ChunkedArray)
        else kept_tok,
    )
    joined = pc.binary_join(lists, " ")
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "n_tokens": pa.array(dls, pa.int64()),
        "removed_tokens": pa.array(dls - kept_per_doc, pa.int64()),
        "text_dedup": joined,
    })


def exact_substring_dedup(
    ds,
    n: int = 5,
    analyzer: str = "simple",
    clip: tuple[int, int] = (1, 64),
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    gram_identity: str = "exact",
):
    """Exact-substring deduplication (the REMOVAL step of Lee et al.
    2021, arXiv:2107.06499, at word-n-gram granularity): every n-gram
    occurring more than once in the corpus keeps exactly its FIRST
    occurrence (global (doc_id, pos) minimum); every other occurrence's
    [pos, pos+n) span is cut from its document, and documents re-emit
    as the kept token stream (+ counts).  Token-join output is exact
    for whitespace-joined corpora; for general text, spans should map
    back through character offsets (disclosed).

    Shape: the coverage op's gram exchange (exact string identity,
    hashed routing) emits loser occurrences; a second doc-keyed exchange
    co-locates them with their documents, which re-tokenize once and
    strip spans with one diff+cumsum pass.  No floats anywhere — the
    oracle comparison is exact strings and integers.

    ``gram_identity="hash128"`` replaces the exact gram strings on the
    wire with a 128-bit two-channel polynomial hash (16 bytes per
    occurrence vs the n-token string — ~4× less exchange volume at
    n=5, and the in-bucket factorize becomes an integer lexsort);
    random-input collision odds ≈ K²/2^129 over K distinct grams,
    disclosed in :func:`_gram_rows`."""

    def extract(batch: pa.Table) -> pa.Table:
        return _gram_rows(batch, n, analyzer, clip, text_col, id_col,
                          n_buckets, gram_identity)

    rows = ds.map_batches(extract, batch_format="pyarrow",
                          zero_copy_batch=True)
    losers = rows.filter(expr="kind == 1").groupby("bucket").map_groups(
        _loser_gram_positions, batch_format="pyarrow"
    )

    def docs_to_union(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "kind": pa.array(np.zeros(len(ids), np.int8)),
            "val": pa.array(np.full(len(ids), -1, np.int64)),
            "text": batch.column(text_col),
            "bucket": pa.array((ids % n_buckets).astype(np.int32),
                               pa.int32()),
        })

    def losers_to_union(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "kind": pa.array(np.ones(len(ids), np.int8)),
            "val": batch.column("pos"),
            "text": pa.array([""] * len(ids), pa.string()),
            "bucket": pa.array((ids % n_buckets).astype(np.int32),
                               pa.int32()),
        })

    union = ds.map_batches(
        docs_to_union, batch_format="pyarrow", zero_copy_batch=True
    ).union(losers.map_batches(
        losers_to_union, batch_format="pyarrow", zero_copy_batch=True
    ))
    return union.groupby("bucket").map_groups(
        lambda g: _strip_group(g, n, analyzer, clip),
        batch_format="pyarrow",
    )


def duplicate_ngram_coverage(
    ds,
    n: int = 5,
    analyzer: str = "simple",
    clip: tuple[int, int] = (1, 64),
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    gram_identity: str = "exact",
):
    """Dataset of documents → per-doc duplicate-n-gram coverage rows
    (doc_id, n_tokens, covered_tokens, coverage).  Two fixed-bucket
    exchanges (gram buckets, then doc buckets); every kernel is
    lexsort/reduceat-vectorized.  ``n_buckets`` caps any single group's
    memory at ~corpus_grams/n_buckets — raise it for larger corpora.
    ``gram_identity="hash128"``: 16-byte hashed gram identity instead of
    exact strings (collision bound disclosed in :func:`_gram_rows`)."""

    def extract(batch: pa.Table) -> pa.Table:
        return _gram_rows(batch, n, analyzer, clip, text_col, id_col,
                          n_buckets, gram_identity)

    rows = ds.map_batches(extract, batch_format="pyarrow",
                          zero_copy_batch=True)
    # expression filters — vectorized block pruning, never per-row Python
    grams = rows.filter(expr="kind == 1")
    dls = rows.filter(expr="kind == 0")
    covered = grams.groupby("bucket").map_groups(
        _dup_gram_positions, batch_format="pyarrow"
    )

    def cov_to_union(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "kind": pa.array(np.ones(batch.num_rows, np.int8)),
            "val": batch.column("pos"),
            "bucket": pa.array(
                (batch.column("doc_id").to_numpy() % n_buckets)
                .astype(np.int32), pa.int32()
            ),
        })

    def dl_to_union(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id", "kind", "val", "bucket"])

    union = dls.map_batches(
        dl_to_union, batch_format="pyarrow", zero_copy_batch=True
    ).union(covered.map_batches(
        cov_to_union, batch_format="pyarrow", zero_copy_batch=True
    ))
    return union.groupby("bucket").map_groups(
        lambda g: _coverage_group(g, n), batch_format="pyarrow"
    )
