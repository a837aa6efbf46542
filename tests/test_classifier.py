"""Hashed-ngram linear quality classifier (ops/classifier.py)."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from elasticsearch_assets_ray.ops.classifier import (
    QualityScorer,
    _auc,
    _hash_features,
    fit_quality_classifier,
    quality_scores,
)


def _two_vocab_corpus(n: int = 600, seed: int = 7):
    """Separable synthetic task: class 1 draws from a 'clean' vocab,
    class 0 mixes in 'junk' tokens — the linear model must learn the
    vocab split from hashed features."""
    rng = np.random.default_rng(seed)
    clean = [f"sig{i}" for i in range(30)]
    junk = [f"jnk{i}" for i in range(30)]
    common = [f"com{i}" for i in range(40)]
    rows = []
    for d in range(n):
        y = d % 2
        k = rng.integers(30, 60)
        vocab = common + (clean if y else junk)
        toks = rng.choice(vocab, size=k)
        rows.append({"doc_id": d, "text": " ".join(toks), "label": y})
    return rows


def test_auc_exact():
    y = np.array([1, 1, 0, 0, 1], np.float64)
    s = np.array([0.9, 0.8, 0.7, 0.2, 0.1])
    # pairs: (1:.9,0:.7)+, (1:.9,0:.2)+, (1:.8,.7)+, (1:.8,.2)+,
    # (1:.1,.7)-, (1:.1,.2)- → 4/6
    assert abs(_auc(y, s) - 4 / 6) < 1e-12
    # ties take half credit
    y = np.array([1, 0], np.float64)
    s = np.array([0.5, 0.5])
    assert _auc(y, s) == 0.5


def test_hash_features_shape_and_l1():
    t = pa.array(["a b c a", "", "x y"])
    doc, bucket, val = _hash_features(t, "simple", 1 << 10, True)
    assert doc.min() == 0 and doc.max() == 2
    # doc 0: 4 tokens → unigram mass 1.0 + bigram mass 3/4
    m0 = val[doc == 0].sum()
    assert abs(m0 - (1.0 + 3 / 4)) < 1e-12
    # empty doc contributes no rows
    assert not np.any(doc == 1)
    m2 = val[doc == 2].sum()
    assert abs(m2 - (1.0 + 1 / 2)) < 1e-12
    # unigram-only mode
    _, _, v1 = _hash_features(t, "simple", 1 << 10, False)
    assert abs(v1.sum() - 2.0) < 1e-12


def test_fit_learns_separable_task(ray_session):
    rows = _two_vocab_corpus()
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    clf = fit_quality_classifier(ds, max_train=10_000, dim=1 << 14,
                                 iters=300)
    m = clf.metrics["holdout"]
    assert m["n"] > 30
    assert m["accuracy"] >= 0.95, clf.metrics
    assert m["auc"] >= 0.98, clf.metrics
    # scoring streams and matches the driver-side model
    scored = quality_scores(ds, clf).to_arrow_refs()
    import ray as _ray

    t = pa.concat_tables([_ray.get(r) for r in scored]).sort_by("doc_id")
    s = t.column("quality_r").to_numpy()
    y = np.array([r["label"] for r in rows], np.float64)
    acc = float((((s >= 0.5).astype(float)) == y).mean())
    assert acc >= 0.95


def test_fit_is_deterministic(ray_session):
    rows = _two_vocab_corpus(n=300)
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    a = fit_quality_classifier(ds, dim=1 << 12, iters=50)
    b = fit_quality_classifier(ds, dim=1 << 12, iters=50)
    assert np.array_equal(a.w, b.w)
    assert a.b == b.b
    assert a.metrics == b.metrics


def test_sampling_cap(ray_session):
    rows = _two_vocab_corpus(n=400)
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    clf = fit_quality_classifier(ds, max_train=100, dim=1 << 12, iters=10)
    # expectation 100 of 400; Knuth-hash keep is a ~p coin per id
    assert 40 <= clf.metrics["sampled_docs"] <= 180
    assert clf.metrics["sample_rate"] == 0.25


def test_scorer_handles_zero_token_docs(ray_session):
    import ray as _ray

    rows = [{"doc_id": 0, "text": "sig1 sig2", "label": 1},
            {"doc_id": 1, "text": "", "label": 0},
            {"doc_id": 2, "text": "jnk1", "label": 0}] * 40
    for i, r in enumerate(rows):
        r = r.copy()
        r["doc_id"] = i
        rows[i] = r
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    clf = fit_quality_classifier(ds, dim=1 << 10, iters=50)
    ref = _ray.put(clf)
    out = QualityScorer(ref)(pa.Table.from_pylist(rows[:3]))
    s = out.column("quality_r").to_numpy()
    assert len(s) == 3
    # empty doc scores the bias prior
    prior = 1.0 / (1.0 + np.exp(-clf.b))
    assert abs(s[1] - round(prior, 4)) < 1e-9


def test_empty_training_split_raises(ray_session):
    ds = rd.from_arrow(pa.Table.from_pylist(
        [{"doc_id": 1, "text": "a", "label": 1}]))
    with pytest.raises(ValueError):
        # sample rate so small nothing survives
        fit_quality_classifier(ds, max_train=0, dim=1 << 8, iters=1)
