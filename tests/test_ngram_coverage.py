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


def test_exact_substring_dedup_handcrafted():
    """Removal semantics: the global first occurrence of a repeated
    n-gram survives, every other occurrence's span is cut; overlapping
    cut spans union; unique docs pass through untouched."""
    import pyarrow as pa
    import ray.data as rd

    from elasticsearch_assets_ray.ops.ngram_coverage import (
        exact_substring_dedup,
    )

    boiler = "alpha beta gamma delta epsilon"  # the 5-gram to repeat
    docs = [
        (0, f"{boiler} one two three"),           # winner (min doc,pos)
        (1, f"zero {boiler} tail"),               # loser: pos 1..5 cut
        (2, f"{boiler} mid {boiler}"),            # loser twice
        (3, "u1 u2 u3 u4 u5 u6"),                 # unique, untouched
        (4, "short doc"),                          # < n tokens
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    }))
    out = exact_substring_dedup(ds, n=5).to_pandas().set_index("doc_id")
    assert out.loc[0, "text_dedup"] == f"{boiler} one two three"
    assert out.loc[0, "removed_tokens"] == 0
    assert out.loc[1, "text_dedup"] == "zero tail"
    assert out.loc[1, "removed_tokens"] == 5
    # doc 2: both occurrences lose (winner is doc 0) -> only "mid" stays
    assert out.loc[2, "text_dedup"] == "mid"
    assert out.loc[2, "removed_tokens"] == 10
    assert out.loc[3, "text_dedup"] == "u1 u2 u3 u4 u5 u6"
    assert out.loc[4, "text_dedup"] == "short doc"
    assert out["n_tokens"].to_dict() == {0: 8, 1: 7, 2: 11, 3: 6, 4: 2}


def test_exact_substring_dedup_in_doc_repeat_and_overlap():
    """In-doc repeats count as duplicates (suffix-dedup view): the
    second occurrence inside the SAME doc is cut; overlapping repeated
    grams union their spans instead of double-cutting."""
    import pyarrow as pa
    import ray.data as rd

    from elasticsearch_assets_ray.ops.ngram_coverage import (
        exact_substring_dedup,
    )

    # "a b a b a b" with n=2: grams (a b) x3 at 0,2,4 ... plus (b a) x2
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["a b a b a b"], pa.string()),
    }))
    out = exact_substring_dedup(ds, n=2).to_pandas()
    # winners: (a b)@0 and (b a)@1 survive; losers (a b)@2 cut {2,3},
    # (b a)@3 cut {3,4}, (a b)@4 cut {4,5}: kept = positions {0,1}
    assert out.loc[0, "text_dedup"] == "a b"
    assert out.loc[0, "removed_tokens"] == 4


@pytest.mark.parametrize("n", [2, 5])
def test_hash128_identity_matches_exact(n, ray_session):
    """gram_identity="hash128" (16-byte two-channel polynomial keys on
    the wire) produces IDENTICAL coverage and removal output to the
    exact-string path on the adversarial fixture set."""
    import ray.data as rd

    from elasticsearch_assets_ray.ops.ngram_coverage import (
        exact_substring_dedup,
    )

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
    }))

    def norm(pipe):
        rows = sorted(pipe.take_all(), key=lambda r: r["doc_id"])
        return rows

    a = norm(duplicate_ngram_coverage(ds, n=n, n_buckets=4))
    b = norm(duplicate_ngram_coverage(ds, n=n, n_buckets=4,
                                      gram_identity="hash128"))
    assert a == b
    c = norm(exact_substring_dedup(ds, n=n, n_buckets=4))
    d = norm(exact_substring_dedup(ds, n=n, n_buckets=4,
                                   gram_identity="hash128"))
    assert c == d
