"""Linear quality classifier over hashed n-gram features — the
fasttext-style filter every large LLM corpus pipeline trains (label a
modest seed set, fit a linear text classifier, score the whole corpus
and keep the high-quality tail; the GPT-3 / LLaMA / CCNet recipe).

The reference engine has no model stage; like :mod:`.lm` (perplexity /
DSIR), this extends the training-data surface over the reference's
schema-free doc streams
(``/root/reference/asset/elasticsearch_reader/reader.js:14-28``).

Architecture — built for the 100 TB asymmetry of the problem:

- **Labeled training data is never corpus-scale** (quality seeds are
  thousands-to-millions of docs), so training runs DRIVER-SIDE over a
  deterministic Knuth-hash sample of the labeled set, capped at
  ``max_train`` docs — the same sample-then-fit shape as
  ``similarity.kmeans_fit`` (IVF's coarse quantizer).  Featurization of
  the sample is distributed (one Arrow tokenize + vectorized FNV
  hashing per batch); only the sparse feature rows travel to the
  driver, never text.
- **Scoring is the corpus-scale part and streams**: the fitted weight
  vector broadcasts once (``ray.put``), :class:`QualityScorer` is a
  stateless ``map_batches`` stage — one tokenize, integer gathers, one
  ``bincount`` per batch; no shuffle, no driver state.
- **Features**: hashing-trick unigrams + bigrams into ``dim`` buckets
  (vectorized FNV-1a 64 over the batch's DISTINCT terms, bigrams as an
  xor-multiply hash combine — no bigram strings are materialized),
  L1-normalized per doc (tf / n_tokens, the fasttext mean-of-features
  form).
- **Optimizer**: full-batch logistic regression, gradient descent with
  L2 — every reduction is a ``bincount`` / ``reduceat`` over arrays in
  a pinned order, so refitting the same sample is bit-deterministic
  (tested), with no SGD ordering noise.

Float safety: scores are continuous-valued math → rounded AFTER the
sigmoid (the repo invariant); training metrics (accuracy / AUC /
logloss) are measured on a held-out hash split and reported, not
hash-compared.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..index.global_merge import _fnv1a64_vec

_FNV_PRIME = np.uint64(1099511628211)
_KNUTH = np.uint64(2654435761)


def _hash_features(
    texts, analyzer: str, dim: int, bigrams: bool
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One batch's text column → per-doc L1-normalized sparse rows as
    flat ``(doc_rel, bucket, value)`` arrays (doc_rel ascending).  One
    Arrow tokenize; term hashes computed per DISTINCT term; bigrams
    hash-combine adjacent token hashes within a doc (no strings)."""
    from ..index.build import tokenize_codes_arrow

    n = len(texts)
    terms, codes, doc_rel, dls = tokenize_codes_arrow(
        texts, analyzer, 1, 64, {}
    )
    ntok = np.asarray(dls, dtype=np.int64)
    if len(codes) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float64))
    th = _fnv1a64_vec(pa.array(terms, pa.string()))
    tok_h = th[codes]
    tok_doc = np.asarray(doc_rel, dtype=np.int64)
    buckets = [tok_h % np.uint64(dim)]
    docs = [tok_doc]
    if bigrams and len(tok_h) > 1:
        same = tok_doc[1:] == tok_doc[:-1]
        with np.errstate(over="ignore"):
            bg = (tok_h[:-1] * _FNV_PRIME) ^ tok_h[1:]
        buckets.append(bg[same] % np.uint64(dim))
        docs.append(tok_doc[:-1][same])
    bucket = np.concatenate(buckets).astype(np.int64)
    doc = np.concatenate(docs)
    # per-(doc, bucket) counts via one sort-free composite-key unique
    key = doc * np.int64(dim) + bucket
    uk, counts = np.unique(key, return_counts=True)
    u_doc = uk // np.int64(dim)
    u_bucket = uk % np.int64(dim)
    val = counts.astype(np.float64) / ntok[u_doc].astype(np.float64)
    return u_doc, u_bucket, val


class QualityClassifier:
    """Fitted model: weights over ``dim`` hashed-feature buckets + bias
    + the held-out metrics measured at fit time."""

    def __init__(self, w: np.ndarray, b: float, dim: int, analyzer: str,
                 bigrams: bool, metrics: dict):
        self.w = w.astype(np.float64)
        self.b = float(b)
        self.dim = int(dim)
        self.analyzer = analyzer
        self.bigrams = bool(bigrams)
        self.metrics = dict(metrics)

    def score_rows(self, doc: np.ndarray, bucket: np.ndarray,
                   val: np.ndarray, n_docs: int) -> np.ndarray:
        z = np.bincount(doc, weights=val * self.w[bucket],
                        minlength=n_docs) + self.b
        return 1.0 / (1.0 + np.exp(-np.clip(z, -500.0, 500.0)))


def _auc(y: np.ndarray, s: np.ndarray) -> float:
    """Exact ROC AUC via the rank-sum form with midrank ties."""
    pos = int(y.sum())
    neg = len(y) - pos
    if pos == 0 or neg == 0:
        return float("nan")
    order = np.argsort(s, kind="stable")
    ranks = np.empty(len(s), np.float64)
    sv = s[order]
    ranks[order] = np.arange(1, len(s) + 1, dtype=np.float64)
    # midranks for tied scores
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        if j > i:
            ranks[order[i:j + 1]] = 0.5 * (i + 1 + j + 1)
        i = j + 1
    return float((ranks[y == 1].sum() - pos * (pos + 1) / 2.0)
                 / (pos * neg))


def fit_quality_classifier(
    labeled_ds,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "simple",
    dim: int = 1 << 18,
    bigrams: bool = True,
    max_train: int = 100_000,
    holdout_frac: float = 0.2,
    iters: int = 200,
    lr: float = 2.0,
    l2: float = 1e-6,
) -> QualityClassifier:
    """Fit the classifier on a deterministic hash-sample of a labeled
    dataset (``label_col`` ∈ {0, 1}).

    The sample keeps ids with ``(id·2654435761) mod 2³² <
    ⌊p·2³²⌋`` (the repo's deterministic-sampling rule) with ``p``
    sized from a cheap count so the expectation is ``max_train``; the
    holdout split reuses the same hash stream at a second threshold, so
    membership is a pure function of the id on both sides.  Features
    are computed distributed; only sparse rows reach the driver."""
    total = labeled_ds.count()
    p = min(1.0, max_train / max(1, total))
    thresh = np.uint64(int(p * (1 << 32)))
    hold_t = np.uint64(int(p * holdout_frac * (1 << 32)))

    def featurize(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (ids * _KNUTH) % np.uint64(1 << 32)
        keep = np.nonzero(h < thresh)[0]
        if len(keep) == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "label": pa.array([], pa.int8()),
                "hold": pa.array([], pa.bool_()),
                "idx": pa.array([], pa.list_(pa.int64())),
                "val": pa.array([], pa.list_(pa.float64())),
            })
        sub = batch.take(pa.array(keep, pa.int64()))
        doc, bucket, val = _hash_features(
            sub.column(text_col), analyzer, dim, bigrams)
        offsets = np.concatenate(
            [[0], np.cumsum(np.bincount(doc, minlength=sub.num_rows))]
        ).astype(np.int64)
        return pa.table({
            "doc_id": sub.column(id_col).cast(pa.int64()),
            "label": sub.column(label_col).cast(pa.int8()),
            "hold": pa.array(h[keep] < hold_t),
            "idx": pa.LargeListArray.from_arrays(
                offsets, pa.array(bucket, pa.int64())).cast(
                pa.list_(pa.int64())),
            "val": pa.LargeListArray.from_arrays(
                offsets, pa.array(val, pa.float64())).cast(
                pa.list_(pa.float64())),
        })

    parts = [
        ray.get(r) for r in labeled_ds.map_batches(
            featurize, batch_format="pyarrow", zero_copy_batch=True
        ).to_arrow_refs()
    ]
    parts = [x for x in parts if x.num_rows]
    if not parts:
        raise ValueError("empty training split")
    t = pa.concat_tables(parts)
    # pin a global order so every refit reduces identically
    t = t.sort_by("doc_id")
    y = t.column("label").to_numpy().astype(np.float64)
    hold = t.column("hold").to_numpy().astype(bool)
    idx_col = t.column("idx").combine_chunks()
    val_col = t.column("val").combine_chunks()
    indptr = idx_col.offsets.to_numpy().astype(np.int64)
    idx = idx_col.values.to_numpy().astype(np.int64)
    val = val_col.values.to_numpy()
    n = len(y)
    row_len = np.diff(indptr)
    rows = np.repeat(np.arange(n, dtype=np.int64), row_len)

    tr = ~hold
    tr_rows_mask = tr[rows]
    r_tr = rows[tr_rows_mask]
    i_tr = idx[tr_rows_mask]
    v_tr = val[tr_rows_mask]
    y_tr = y[tr]
    # compact train row numbering
    remap = np.cumsum(tr.astype(np.int64)) - 1
    r_tr = remap[r_tr]
    n_tr = int(tr.sum())
    if n_tr == 0:
        raise ValueError("empty training split")

    w = np.zeros(dim, np.float64)
    b = 0.0
    for _ in range(iters):
        z = np.bincount(r_tr, weights=v_tr * w[i_tr], minlength=n_tr) + b
        z = np.clip(z, -500.0, 500.0)
        pr = 1.0 / (1.0 + np.exp(-z))
        g = (pr - y_tr) / n_tr
        gw = np.bincount(i_tr, weights=g[r_tr] * v_tr, minlength=dim)
        w -= lr * (gw + l2 * w)
        b -= lr * float(g.sum())

    def split_metrics(mask: np.ndarray) -> dict:
        m_rows = mask[rows]
        remap2 = np.cumsum(mask.astype(np.int64)) - 1
        rr = remap2[rows[m_rows]]
        nm = int(mask.sum())
        if nm == 0:
            return {"n": 0}
        z = np.bincount(rr, weights=val[m_rows] * w[idx[m_rows]],
                        minlength=nm) + b
        z = np.clip(z, -500.0, 500.0)
        pr = 1.0 / (1.0 + np.exp(-z))
        ym = y[mask]
        eps = 1e-12
        return {
            "n": nm,
            "accuracy": float(((pr >= 0.5) == (ym == 1.0)).mean()),
            "auc": _auc(ym, pr),
            "logloss": float(-(ym * np.log(pr + eps)
                               + (1 - ym) * np.log(1 - pr + eps)).mean()),
            "base_rate": float(ym.mean()),
        }

    metrics = {
        "train": split_metrics(tr),
        "holdout": split_metrics(hold),
        "sampled_docs": n,
        "sample_rate": p,
    }
    return QualityClassifier(w, b, dim, analyzer, bigrams, metrics)


class QualityScorer:
    """``map_batches`` callable: per-doc quality probability under a
    broadcast :class:`QualityClassifier` — one tokenize + one bincount
    per batch, streaming (no shuffle).  Zero-token docs score the bias
    sigmoid (an empty doc is all-prior)."""

    def __init__(self, model_ref, text_col: str = "text",
                 id_col: str = "doc_id", round_decimals: int = 4):
        self.model_ref = model_ref
        self.text_col = text_col
        self.id_col = id_col
        self.round_decimals = round_decimals
        self._clf: QualityClassifier | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._clf is None:
            self._clf = ray.get(self.model_ref)
        clf = self._clf
        doc, bucket, val = _hash_features(
            batch.column(self.text_col), clf.analyzer, clf.dim,
            clf.bigrams)
        s = clf.score_rows(doc, bucket, val, batch.num_rows)
        return pa.table({
            "doc_id": batch.column(self.id_col),
            "quality_r": pa.array(
                np.round(s, self.round_decimals), pa.float64()),
        })


def quality_scores(
    ds,
    clf: QualityClassifier,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_decimals: int = 4,
):
    """Broadcast the fitted model once and stream scores over ``ds``."""
    ref = ray.put(clf)
    return ds.map_batches(
        QualityScorer(ref, text_col=text_col, id_col=id_col,
                      round_decimals=round_decimals),
        batch_format="pyarrow", zero_copy_batch=True,
    )
