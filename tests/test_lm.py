"""Unigram-LM perplexity op (ops/lm.py): counting-exchange exactness,
per-doc score parity vs a pure-Python reference, OOV handling, and the
min_count frequency floor (prunes lookup, keeps the normalizer)."""
import math

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from elasticsearch_assets_ray.ops.lm import (
    PerplexityScorer,
    UnigramLM,
    perplexity_scores,
    train_unigram_counts,
)
from elasticsearch_assets_ray.ops.textstats import clipped_tokens

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "the five boxing wizards jump quickly",
    "sphinx of black quartz judge my vow",
    "how vexingly quick daft zebras jump",
    "the dog and the fox and the zebra",
    "",  # zero-token doc must be dropped
    "unseen-token-only xylophone qqq",
]


@pytest.fixture(scope="module")
def docs_ds():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(DOCS)), pa.int64()),
        "text": pa.array(DOCS, pa.string()),
    }))


def _brute_counts(texts):
    c = {}
    for t in texts:
        for tok in clipped_tokens(t):
            c[tok] = c.get(tok, 0) + 1
    return c


def test_train_counts_exact(docs_ds):
    got = train_unigram_counts(docs_ds, n_buckets=4).to_pandas()
    want = _brute_counts(DOCS)
    assert dict(zip(got["term"], got["c"])) == want
    assert len(got) == len(want)  # each term exactly once across buckets


def test_scores_match_python_reference(docs_ds):
    train_texts = [DOCS[i] for i in range(0, len(DOCS), 2)]
    cnt = _brute_counts(train_texts)
    T, V = sum(cnt.values()), len(cnt)

    def brute(doc):
        toks = clipped_tokens(doc)
        if not toks:
            return None
        s = sum(math.log((cnt.get(t, 0) + 1.0) / (T + V + 1.0))
                for t in toks)
        return round(-s / len(toks), 4)

    train = docs_ds.map_batches(
        lambda b: b.filter(
            pa.compute.equal(pa.compute.bit_wise_and(b.column("doc_id"), 1),
                             0)),
        batch_format="pyarrow")
    got = perplexity_scores(docs_ds, train).to_pandas()
    got = dict(zip(got["doc_id"], got["log_ppl_r"]))
    for i, d in enumerate(DOCS):
        want = brute(d)
        if want is None:
            assert i not in got  # zero-token doc dropped
        else:
            assert got[i] == pytest.approx(want, abs=1e-9), i


def test_oov_scores_below_seen():
    """A doc of only unseen terms scores strictly worse (higher neg-LL)
    than a doc of frequent seen terms."""
    lm = UnigramLM(np.array(["a", "b"], dtype=object),
                   np.array([10, 5], dtype=np.int64), 15, 2)
    lp = lm.logp_terms(np.array(["a", "zzz"], dtype=object))
    assert lp[0] > lp[1]
    assert lp[1] == pytest.approx(math.log(1.0 / 18.0))


def test_dsir_ranks_target_like_docs_up():
    """Importance weights: docs drawn from the target vocabulary score
    above docs from a disjoint vocabulary, and the math matches a pure
    Python reference."""
    from elasticsearch_assets_ray.ops.lm import importance_weights

    target_texts = ["alpha beta gamma delta"] * 4
    raw_texts = target_texts + ["omega psi chi phi"] * 4
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(raw_texts)), pa.int64()),
        "text": pa.array(raw_texts, pa.string()),
    }))
    target = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(target_texts)), pa.int64()),
        "text": pa.array(target_texts, pa.string()),
    }))
    got = importance_weights(ds, target).to_pandas()
    got = dict(zip(got["doc_id"], got["log_ratio_r"]))
    # target-like docs (0-3) all outrank off-target docs (4-7)
    assert min(got[i] for i in range(4)) > max(got[i] for i in range(4, 8))

    # exact parity vs brute force on doc 0 and doc 4
    cnt_t = _brute_counts(target_texts)
    cnt_r = _brute_counts(raw_texts)
    Tt, Vt = sum(cnt_t.values()), len(cnt_t)
    Tr, Vr = sum(cnt_r.values()), len(cnt_r)
    for i in (0, 4):
        toks = clipped_tokens(raw_texts[i])
        s = sum(
            math.log((cnt_t.get(t, 0) + 1.0) / (Tt + Vt + 1.0))
            - math.log((cnt_r.get(t, 0) + 1.0) / (Tr + Vr + 1.0))
            for t in toks)
        assert got[i] == pytest.approx(round(s / len(toks), 4), abs=1e-9)


def test_min_count_prunes_lookup_not_normalizer(docs_ds):
    counts = train_unigram_counts(docs_ds, n_buckets=4)
    full = UnigramLM.fit(counts, min_count=1)
    pruned = UnigramLM.fit(
        train_unigram_counts(docs_ds, n_buckets=4), min_count=2)
    assert pruned.total_tokens == full.total_tokens
    assert pruned.vocab_size == full.vocab_size
    assert len(pruned.terms) < len(full.terms)
    # a pruned tail term scores exactly like OOV
    tail = [t for t, c in _brute_counts(DOCS).items() if c == 1][0]
    lp = pruned.logp_terms(np.array([tail], dtype=object))[0]
    assert lp == pytest.approx(
        math.log(1.0 / (full.total_tokens + full.vocab_size + 1)))
    # a kept term is unchanged
    kept = [t for t, c in _brute_counts(DOCS).items() if c >= 2][0]
    assert pruned.logp_terms(np.array([kept], dtype=object))[0] == (
        full.logp_terms(np.array([kept], dtype=object))[0])
