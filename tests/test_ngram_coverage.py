"""Duplicate n-gram span coverage: brute-force parity on adversarial
fixtures (overlapping spans, exact copies, short/empty docs, cross-doc
boundary grams).  Oracle bit-exactness runs in test_contract."""

import collections
import re

import pyarrow as pa
import pytest

from elasticsearch_assets_ray.ops.ngram_coverage import (
    duplicate_ngram_coverage,
)


def _brute(texts, n):
    def toks(s):
        return [t for t in re.split(r"[^a-z0-9]+", s.lower())
                if t and len(t) <= 64]

    docs = [toks(t) for t in texts]
    grams = collections.defaultdict(set)
    for d, ts in enumerate(docs):
        for i in range(len(ts) - n + 1):
            grams[tuple(ts[i:i + n])].add(d)
    out = {}
    for d, ts in enumerate(docs):
        cov = set()
        for i in range(len(ts) - n + 1):
            if len(grams[tuple(ts[i:i + n])]) >= 2:
                cov.update(range(i, i + n))
        out[d] = (len(ts), len(cov),
                  len(cov) / len(ts) if ts else 0.0)
    return out


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "lorem ipsum the quick brown fox jumps away now",
    "totally unique content here nothing shared at all",
    "the quick brown fox jumps over the lazy dog",   # exact copy
    "tiny doc", "",
    "a b c d e a b c d e a b c d e",                 # self-repeat only
    "x a b c d e x",                                  # shares the run
    "over the lazy dog and then over the lazy dog again padder",
    "and then over the lazy dog walks",
]


@pytest.mark.parametrize("n", [2, 5])
def test_coverage_brute_parity(n, ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
    }))
    out = {r["doc_id"]: (r["n_tokens"], r["covered_tokens"], r["coverage"])
           for r in duplicate_ngram_coverage(ds, n=n, n_buckets=4)
           .take_all()}
    want = _brute(TEXTS, n)
    assert out == want
    # every doc appears exactly once, including empty/short ones
    assert sorted(out) == list(range(len(TEXTS)))
