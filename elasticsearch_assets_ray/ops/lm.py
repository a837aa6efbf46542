"""N-gram language-model perplexity scoring over Ray Data — the
CCNet-style quality gate for LLM training corpora (score every document
under a reference LM, drop the high-perplexity tail).

The reference engine has no LM stage; this is part of the
training-data-pipeline surface this repo adds on top of the reference's
operator set.  The data model matches its schema-free doc streams
(``/root/reference/asset/elasticsearch_reader/reader.js:14-28``): any
string field can be scored.

Model: unigram LM with add-one smoothing over a deterministic training
slice.  ``p(t) = (c_t + 1) / (T + V + 1)`` where ``c_t`` is the term's
training count, ``T`` total training tokens and ``V`` the training
vocabulary size; unseen terms take ``c_t = 0`` (the ``+1`` in the
denominator is the OOV cell).  Per-doc score is the length-normalized
negative log-likelihood ``log_ppl = -(Σ_tokens ln p(t)) / n_tokens`` —
monotone in perplexity, reported rounded (float-safety invariant:
rounding happens AFTER all continuous math).

Scale shape:

- **Counting** is partial-aggregate inside ``map_batches`` (one Arrow
  tokenize + ``bincount`` per batch) followed by a fixed-``n_buckets``
  exchange with a vectorized fnv1a64 term hash and an in-bucket
  dictionary-encode + ``bincount`` reduce — the repo's
  bucketed-reduction recipe; no per-key groupby, work ∝ data.
- **The model broadcasts once** (``ray.put`` of the sorted term array +
  counts); every scoring actor fetches it a single time and looks terms
  up with ``np.searchsorted`` over each batch's DISTINCT dictionary —
  per-distinct, not per-token.  A 100 TB-corpus vocabulary is pruned
  with ``min_count`` (frequency-floor pruning, the standard KenLM
  practice) so the broadcast stays worker-heap-sized; pruned terms fold
  into the OOV cell.
- **Scoring** streams: no shuffle, one batch in → one score row set out.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..index.global_merge import _fnv1a64_vec

N_BUCKETS = 64


def train_unigram_counts(
    ds,
    text_col: str = "text",
    analyzer: str = "simple",
    n_buckets: int = N_BUCKETS,
):
    """Term → training count as a Dataset, via per-batch partials + one
    fixed-bucket exchange (each term lands in exactly one bucket, so the
    in-bucket sum is the exact global count)."""
    from ..index.build import tokenize_codes_arrow

    def partial(batch: pa.Table) -> pa.Table:
        terms, codes, _doc_rel, _dls = tokenize_codes_arrow(
            batch.column(text_col), analyzer, 1, 64, {}
        )
        cnt = np.bincount(codes, minlength=len(terms)).astype(np.int64)
        ta = pa.array(terms, pa.string())
        bucket = (_fnv1a64_vec(ta) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({
            "term": ta,
            "c": pa.array(cnt, pa.int64()),
            "bucket": pa.array(bucket, pa.int32()),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        enc = g.column("term").combine_chunks().dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        c = g.column("c").to_numpy()
        tot = np.bincount(idx, weights=c.astype(np.float64),
                          minlength=len(enc.dictionary))
        # counts are int64 partials; float64 bincount is exact < 2^53,
        # redo in int64 to keep the integer invariant airtight
        tot_i = np.zeros(len(enc.dictionary), dtype=np.int64)
        np.add.at(tot_i, idx, c)
        del tot
        return pa.table({
            "term": enc.dictionary,
            "c": pa.array(tot_i, pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow", zero_copy_batch=True)
    )


class UnigramLM:
    """Fitted model: sorted term array, counts, totals.  ``logp_terms``
    vectorizes ``ln((c+1)/(T+V+1))`` over a distinct-term list."""

    def __init__(self, terms: np.ndarray, counts: np.ndarray,
                 total_tokens: int, vocab_size: int):
        self.terms = terms          # sorted, dtype=object / str
        self.counts = counts        # int64, aligned with terms
        self.total_tokens = int(total_tokens)
        self.vocab_size = int(vocab_size)

    @classmethod
    def fit(cls, counts_ds, min_count: int = 1) -> "UnigramLM":
        """Collect the (term, count) table and finalize the model.
        ``T``/``V`` are computed BEFORE pruning, so a frequency floor
        only moves tail terms into the OOV cell without changing the
        distribution's normalizer."""
        tab = counts_ds.to_arrow_refs()
        parts = [ray.get(r) for r in tab]
        t = pa.concat_tables([p for p in parts if p.num_rows])
        terms = np.asarray(t.column("term").to_pylist(), dtype=object)
        counts = t.column("c").to_numpy().astype(np.int64)
        order = np.argsort(terms)
        terms, counts = terms[order], counts[order]
        total, vocab = int(counts.sum()), len(terms)
        if min_count > 1:
            keep = counts >= min_count
            terms, counts = terms[keep], counts[keep]
        return cls(terms, counts, total, vocab)

    def logp_terms(self, distinct: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(self.terms, distinct)
        pos_c = np.clip(pos, 0, len(self.terms) - 1)
        found = self.terms[pos_c] == distinct if len(self.terms) else (
            np.zeros(len(distinct), dtype=bool))
        c = np.where(found, self.counts[pos_c], 0).astype(np.float64)
        denom = float(self.total_tokens + self.vocab_size + 1)
        return np.log((c + 1.0) / denom)


class PerplexityScorer:
    """map_batches callable: per-doc length-normalized neg-log-likelihood
    under a broadcast :class:`UnigramLM`.  One Arrow tokenize per batch;
    model lookup per DISTINCT term; per-doc sums via weighted bincount
    (deterministic token order).  Zero-token docs are dropped (no
    defined perplexity)."""

    def __init__(self, model_ref, text_col: str = "text",
                 id_col: str = "doc_id", analyzer: str = "simple",
                 round_decimals: int = 4):
        self.model_ref = model_ref
        self.text_col = text_col
        self.id_col = id_col
        self.analyzer = analyzer
        self.round_decimals = round_decimals
        self._lm: UnigramLM | None = None

    def _model(self) -> UnigramLM:
        if self._lm is None:
            self._lm = ray.get(self.model_ref)
        return self._lm

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..index.build import tokenize_codes_arrow

        lm = self._model()
        n = batch.num_rows
        terms, codes, doc_rel, dls = tokenize_codes_arrow(
            batch.column(self.text_col), self.analyzer, 1, 64, {}
        )
        ntok = np.asarray(dls, dtype=np.int64)
        if len(codes):
            logp = lm.logp_terms(np.asarray(terms, dtype=object))
            s = np.bincount(doc_rel, weights=logp[codes], minlength=n)
        else:
            s = np.zeros(n, dtype=np.float64)
        keep = np.nonzero(ntok > 0)[0]
        lp = -s[keep] / ntok[keep]
        return pa.table({
            "doc_id": batch.column(self.id_col).take(
                pa.array(keep, pa.int64())),
            "n_tokens": pa.array(ntok[keep], pa.int64()),
            "log_ppl_r": pa.array(
                np.round(lp, self.round_decimals), pa.float64()),
        })


def perplexity_scores(
    ds,
    train_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "simple",
    min_count: int = 1,
    n_buckets: int = N_BUCKETS,
):
    """Train on ``train_ds`` (counting exchange), broadcast the model
    once, stream scores over ``ds``."""
    counts = train_unigram_counts(train_ds, text_col=text_col,
                                  analyzer=analyzer, n_buckets=n_buckets)
    lm = UnigramLM.fit(counts, min_count=min_count)
    ref = ray.put(lm)
    return ds.map_batches(
        PerplexityScorer(ref, text_col=text_col, id_col=id_col,
                         analyzer=analyzer),
        batch_format="pyarrow", zero_copy_batch=True,
    )


class LogRatioScorer:
    """map_batches callable: per-doc length-normalized log importance
    ratio ``(Σ ln p_target(t) − Σ ln p_raw(t)) / n`` under two broadcast
    unigram LMs — positive means more target-like.  Same vectorization
    as :class:`PerplexityScorer` (one tokenize, per-distinct lookups,
    weighted-bincount doc sums)."""

    def __init__(self, models_ref, text_col: str = "text",
                 id_col: str = "doc_id", analyzer: str = "simple",
                 round_decimals: int = 4):
        self.models_ref = models_ref
        self.text_col = text_col
        self.id_col = id_col
        self.analyzer = analyzer
        self.round_decimals = round_decimals
        self._lms = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..index.build import tokenize_codes_arrow

        if self._lms is None:
            self._lms = ray.get(self.models_ref)
        lm_t, lm_r = self._lms
        n = batch.num_rows
        terms, codes, doc_rel, dls = tokenize_codes_arrow(
            batch.column(self.text_col), self.analyzer, 1, 64, {}
        )
        ntok = np.asarray(dls, dtype=np.int64)
        if len(codes):
            ta = np.asarray(terms, dtype=object)
            diff = lm_t.logp_terms(ta) - lm_r.logp_terms(ta)
            s = np.bincount(doc_rel, weights=diff[codes], minlength=n)
        else:
            s = np.zeros(n, dtype=np.float64)
        keep = np.nonzero(ntok > 0)[0]
        lr = s[keep] / ntok[keep]
        return pa.table({
            "doc_id": batch.column(self.id_col).take(
                pa.array(keep, pa.int64())),
            "n_tokens": pa.array(ntok[keep], pa.int64()),
            "log_ratio_r": pa.array(
                np.round(lr, self.round_decimals), pa.float64()),
        })


def importance_weights(
    ds,
    target_ds,
    raw_ds=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "simple",
    min_count: int = 1,
    n_buckets: int = N_BUCKETS,
):
    """DSIR-style data selection weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling") with
    unigram LMs in place of hashed-n-gram features: train a TARGET LM
    on ``target_ds`` and a RAW LM on ``raw_ds`` (default: ``ds``
    itself), broadcast both once, and stream the per-doc
    length-normalized log importance ratio over ``ds``.  Selecting the
    top of the ranking importance-resamples the corpus toward the
    target distribution."""
    lm_t = UnigramLM.fit(
        train_unigram_counts(target_ds, text_col=text_col,
                             analyzer=analyzer, n_buckets=n_buckets),
        min_count=min_count)
    lm_r = UnigramLM.fit(
        train_unigram_counts(raw_ds if raw_ds is not None else ds,
                             text_col=text_col, analyzer=analyzer,
                             n_buckets=n_buckets),
        min_count=min_count)
    ref = ray.put((lm_t, lm_r))
    return ds.map_batches(
        LogRatioScorer(ref, text_col=text_col, id_col=id_col,
                       analyzer=analyzer),
        batch_format="pyarrow", zero_copy_batch=True,
    )
