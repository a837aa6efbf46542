"""Repetition / boilerplate signals for training-data curation — the
Gopher (Rae et al. 2021, arXiv:2112.11446 §A1.1) and C4 (Raffel et al.
2020) repetition family: documents dominated by repeated lines or
n-grams are low-quality for LM training and get filtered before
tokenization.

Ray-Data-first shape: one stateless ``map_batches`` stage (no shuffle —
every metric is per-document), Arrow-kernel tokenize + numpy run-length
counting inside the batch.  The per-batch cost is one ``lexsort`` over
the batch's token stream per n-gram order — no Python loops over rows
or tokens.

Metric definitions (pinned here because published filters vary; the
DuckDB oracle in pipelines/contract.py mirrors these EXACTLY):

- words = non-empty ``\\s+``-split tokens of ``lower(text)``; lines =
  ``\\n``-split segments of the raw text (empties kept — a blank line
  is a line).
- ``dup_word_frac``   = (n_words − n_distinct_words) / n_words
- ``top_unigram_frac``  = max word count / n_words
- ``top_bigram_frac``   = max bigram count / (n_words − 1)
- ``top_trigram_frac``  = max trigram count / (n_words − 2)
  (n-grams never span documents; a doc with < n words scores 0.0)
- ``dup_line_frac``   = (n_lines − n_distinct_lines) / n_lines
- ``dup_line_char_frac`` = Σ over repeated occurrences (beyond each
  line's first) of len(line), / Σ len(line) over all lines (0.0 when
  the text is empty)

Every fraction is ONE IEEE division of exact integers, so numpy and
DuckDB produce bit-identical doubles (the oracle hash-compares).

Reference scope note: the reference engine
(/root/reference/asset/elasticsearch_index_selector/index.js) ships
records to ES unexamined; content-quality filtering is out of its
scope.  These operators are part of this repo's training-data-pipeline
surface (assignment §"beyond the reference").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _flat_tokens(col: pa.ChunkedArray | pa.Array, pattern: str,
                 lower: bool) -> tuple[np.ndarray, np.ndarray]:
    """→ (doc_idx per token, token code per token) with empty tokens
    dropped; codes are batch-local dictionary indices."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if lower:
        col = pc.utf8_lower(col)
    lists = pc.split_pattern_regex(col, pattern)
    flat = pc.list_flatten(lists)
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return doc_idx[keep], codes[keep]


def _per_doc_top_and_distinct(
    doc_idx: np.ndarray, cols: list[np.ndarray], n_docs: int
) -> tuple[np.ndarray, np.ndarray]:
    """For each doc: (max run count, distinct count) of the tuple rows
    ``cols`` — one lexsort, run-length detection, two reduceats."""
    top = np.zeros(n_docs, dtype=np.int64)
    distinct = np.zeros(n_docs, dtype=np.int64)
    if len(doc_idx) == 0:
        return top, distinct
    order = np.lexsort(tuple(reversed(cols)) + (doc_idx,))
    d = doc_idx[order]
    change = np.zeros(len(d), dtype=bool)
    change[0] = True
    change[1:] = d[1:] != d[:-1]
    for c in cols:
        cs = c[order]
        change[1:] |= cs[1:] != cs[:-1]
    starts = np.nonzero(change)[0]
    run_len = np.diff(np.concatenate([starts, [len(d)]]))
    run_doc = d[starts]
    # per-doc segments over the runs (runs sorted by doc)
    doc_change = np.zeros(len(run_doc), dtype=bool)
    doc_change[0] = True
    doc_change[1:] = run_doc[1:] != run_doc[:-1]
    seg_starts = np.nonzero(doc_change)[0]
    seg_docs = run_doc[seg_starts]
    top[seg_docs] = np.maximum.reduceat(run_len, seg_starts)
    seg_counts = np.diff(np.concatenate([seg_starts, [len(run_doc)]]))
    distinct[seg_docs] = seg_counts
    return top, distinct


def _ngram_cols(doc_idx: np.ndarray, codes: np.ndarray,
                n: int) -> tuple[np.ndarray, list[np.ndarray]]:
    """Within-doc n-gram rows as (doc_idx, [code_0..code_{n-1}])."""
    if len(codes) < n:
        e = np.empty(0, np.int64)
        return e, [e] * n
    valid = np.ones(len(codes) - (n - 1), dtype=bool)
    for j in range(1, n):
        valid &= doc_idx[j:len(doc_idx) - (n - 1 - j)] == \
            doc_idx[: len(doc_idx) - (n - 1)]
    base = doc_idx[: len(doc_idx) - (n - 1)][valid]
    cols = [codes[j: len(codes) - (n - 1 - j)][valid] for j in range(n)]
    return base, cols


class RepetitionStats:
    """``map_batches`` stage: text batch → per-doc repetition metrics
    (schema: id, n_words, n_lines, dup_word_frac, top_unigram_frac,
    top_bigram_frac, top_trigram_frac, dup_line_frac,
    dup_line_char_frac)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        text = batch.column(self.text_col)

        w_doc, w_codes = _flat_tokens(text, r"\s+", lower=True)
        n_words = np.bincount(w_doc, minlength=n_docs).astype(np.int64)
        top1, dist1 = _per_doc_top_and_distinct(w_doc, [w_codes], n_docs)
        b_doc, b_cols = _ngram_cols(w_doc, w_codes, 2)
        top2, _ = _per_doc_top_and_distinct(b_doc, b_cols, n_docs)
        t_doc, t_cols = _ngram_cols(w_doc, w_codes, 3)
        top3, _ = _per_doc_top_and_distinct(t_doc, t_cols, n_docs)

        def frac(num: np.ndarray, den: np.ndarray) -> np.ndarray:
            out = np.zeros(n_docs, dtype=np.float64)
            ok = den > 0
            out[ok] = num[ok] / den[ok]  # one exact-int IEEE division
            return out

        dup_word = frac(n_words - dist1, n_words)
        top_uni = frac(top1, n_words)
        top_bi = frac(top2, np.maximum(n_words - 1, 0))
        top_tri = frac(top3, np.maximum(n_words - 2, 0))

        # lines: raw text split on \n, empties KEPT (a blank line is a
        # line) — mirror: string_split(text, chr(10)) in the oracle
        tcol = text.combine_chunks() if isinstance(
            text, pa.ChunkedArray) else text
        l_lists = pc.split_pattern(tcol, "\n")
        l_flat = pc.list_flatten(l_lists)
        l_counts = pc.list_value_length(l_lists).to_numpy(
            zero_copy_only=False)
        l_doc = np.repeat(np.arange(n_docs, dtype=np.int64), l_counts)
        l_enc = l_flat.dictionary_encode()
        l_codes = l_enc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        l_len = pc.utf8_length(l_flat).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_lines = l_counts.astype(np.int64)
        _ltop, l_dist = _per_doc_top_and_distinct(l_doc, [l_codes], n_docs)
        dup_line = frac(n_lines - l_dist, n_lines)
        # chars in repeated occurrences beyond each line's first: per
        # (doc, line) run of length c and line length l → (c−1)·l
        tot_chars = np.zeros(n_docs, dtype=np.int64)
        np.add.at(tot_chars, l_doc, l_len)
        dup_chars = np.zeros(n_docs, dtype=np.int64)
        if len(l_doc):
            order = np.lexsort((l_codes, l_doc))
            d_s, c_s, ln_s = l_doc[order], l_codes[order], l_len[order]
            change = np.zeros(len(d_s), dtype=bool)
            change[0] = True
            change[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
            starts = np.nonzero(change)[0]
            run_len = np.diff(np.concatenate([starts, [len(d_s)]]))
            extra = (run_len - 1) * ln_s[starts]
            np.add.at(dup_chars, d_s[starts], extra)
        dup_line_chars = frac(dup_chars, tot_chars)

        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_words": pa.array(n_words, pa.int64()),
            "n_lines": pa.array(n_lines, pa.int64()),
            "dup_word_frac": pa.array(dup_word, pa.float64()),
            "top_unigram_frac": pa.array(top_uni, pa.float64()),
            "top_bigram_frac": pa.array(top_bi, pa.float64()),
            "top_trigram_frac": pa.array(top_tri, pa.float64()),
            "dup_line_frac": pa.array(dup_line, pa.float64()),
            "dup_line_char_frac": pa.array(dup_line_chars, pa.float64()),
        })


# Gopher-style default thresholds (Rae et al. 2021 Table A1 uses 0.2 /
# 0.18 / 0.16 for top 2/3/4-gram char fractions and 0.3/0.2 for
# duplicate line/line-char fractions; ours are COUNT fractions — pinned
# defaults below, overridable)
GOPHER_DEFAULTS = {
    "max_dup_word_frac": 0.5,
    "max_top_unigram_frac": 0.12,
    "max_top_bigram_frac": 0.08,
    "max_top_trigram_frac": 0.06,
    "max_dup_line_frac": 0.30,
    "max_dup_line_char_frac": 0.20,
    "min_words": 5,
}


class GopherRepetitionFilter(RepetitionStats):
    """``map_batches`` stage: metrics + per-rule booleans + ``keep`` —
    the composable repetition gate of a Gopher-style quality pipeline.
    Rule semantics: a doc is kept iff EVERY fraction is ≤ its cap and
    n_words ≥ min_words (boundary docs pass — caps are inclusive, so an
    exactly-threshold doc survives, matching the oracle's ``<=``)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 **thresholds):
        super().__init__(text_col, id_col)
        unknown = set(thresholds) - set(GOPHER_DEFAULTS)
        if unknown:
            raise ValueError(f"unknown thresholds: {sorted(unknown)}")
        self.th = {**GOPHER_DEFAULTS, **thresholds}

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = super().__call__(batch)
        th = self.th
        rules = {
            "ok_dup_word": pc.less_equal(
                m.column("dup_word_frac"), th["max_dup_word_frac"]),
            "ok_top_unigram": pc.less_equal(
                m.column("top_unigram_frac"), th["max_top_unigram_frac"]),
            "ok_top_bigram": pc.less_equal(
                m.column("top_bigram_frac"), th["max_top_bigram_frac"]),
            "ok_top_trigram": pc.less_equal(
                m.column("top_trigram_frac"), th["max_top_trigram_frac"]),
            "ok_dup_line": pc.less_equal(
                m.column("dup_line_frac"), th["max_dup_line_frac"]),
            "ok_dup_line_chars": pc.less_equal(
                m.column("dup_line_char_frac"),
                th["max_dup_line_char_frac"]),
            "ok_min_words": pc.greater_equal(
                m.column("n_words"), th["min_words"]),
        }
        keep = None
        for arr in rules.values():
            keep = arr if keep is None else pc.and_(keep, arr)
        for name, arr in rules.items():
            m = m.append_column(name, arr)
        return m.append_column("keep", keep)


def repetition_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset → per-doc repetition metrics (streaming, no shuffle)."""
    return ds.map_batches(
        RepetitionStats(text_col, id_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def gopher_repetition_filter(ds, text_col: str = "text",
                             id_col: str = "doc_id", **thresholds):
    """Dataset → metrics + rule booleans + ``keep`` per doc."""
    return ds.map_batches(
        GopherRepetitionFilter(text_col, id_col, **thresholds),
        batch_format="pyarrow", zero_copy_batch=True,
    )
