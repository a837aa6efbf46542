"""Repetition metrics (Gopher/C4 family) and PII redaction: brute-force
parity on adversarial fixtures, filter-rule edges, and Dataset wiring.
Oracle bit-exactness vs DuckDB runs in test_contract."""

import collections
import random

import numpy as np
import pyarrow as pa

from elasticsearch_assets_ray.ops.pii import DEFAULT_PATTERNS, PIIRedactor
from elasticsearch_assets_ray.ops.repetition import (
    GOPHER_DEFAULTS,
    GopherRepetitionFilter,
    RepetitionStats,
)


def _brute(text):
    words = [w for w in text.lower().split() if w]
    n = len(words)
    lines = text.split("\n")

    def topf(k):
        grams = [tuple(words[i:i + k]) for i in range(n - k + 1)]
        den = max(n - (k - 1), 0)
        if not grams or den == 0:
            return 0.0
        return collections.Counter(grams).most_common(1)[0][1] / den

    lc = collections.Counter(lines)
    tot = sum(len(x) for x in lines)
    dupc = sum((c - 1) * len(x) for x, c in lc.items())
    return dict(
        n_words=n, n_lines=len(lines),
        dup_word_frac=(n - len(set(words))) / n if n else 0.0,
        top_unigram_frac=topf(1), top_bigram_frac=topf(2),
        top_trigram_frac=topf(3),
        dup_line_frac=(len(lines) - len(lc)) / len(lines),
        dup_line_char_frac=dupc / tot if tot else 0.0,
    )


FIXTURES = [
    "a b c a b c a b c", "x", "", "  ", "\n\n", "a\n\n\na",
    "one two three\none two three\nfour",
    "spam spam spam spam", "Hello HELLO hello world",
    "w1 w2 w1 w2 w1 w2 w1", "tab\tsep  words\nline two\nline two",
    "singleword\nsingleword", "a b\nc d\na b\nc d\na b",
]


def test_repetition_brute_parity():
    rng = random.Random(11)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    texts = list(FIXTURES)
    for _ in range(60):
        t = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
        t += ("\n" + rng.choice(["aa bb", "cc", ""])) * rng.randint(0, 4)
        texts.append(t)
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = RepetitionStats()(batch).to_pylist()
    for row, text in zip(out, texts):
        want = _brute(text)
        for k, v in want.items():
            assert row[k] == v, (repr(text)[:50], k, row[k], v)


def test_gopher_filter_rules_and_boundary():
    # a doc EXACTLY at a cap passes (inclusive <=, mirrors the oracle)
    th = dict(max_top_unigram_frac=0.5, max_dup_word_frac=1.0,
              max_top_bigram_frac=1.0, max_top_trigram_frac=1.0,
              min_words=2)
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["x y x y", "x x x y", "x"], pa.string()),
    })
    out = GopherRepetitionFilter(**th)(batch).to_pylist()
    assert out[0]["top_unigram_frac"] == 0.5 and out[0]["keep"]
    assert out[1]["top_unigram_frac"] == 0.75 and not out[1]["keep"]
    assert not out[1]["ok_top_unigram"]
    assert not out[2]["keep"] and not out[2]["ok_min_words"]
    import pytest

    with pytest.raises(ValueError):
        GopherRepetitionFilter(nope=1)
    assert set(GOPHER_DEFAULTS) >= {"min_words"}


def test_pii_redactor_categories():
    texts = [
        "contact john.doe+x@example.co.uk or 192.168.0.1 now",
        "call +1 (415) 555-0123 ext 42",
        "no pii here at all",
        "a@b.io a@b.io 10.0.0.255",
        "",
        'json {"k": 69, "v": 12.5}',
    ]
    b = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = PIIRedactor()(b).to_pylist()
    assert out[0]["text"] == "contact <EMAIL> or <IP> now"
    assert out[0]["n_email"] == 1 and out[0]["n_ipv4"] == 1
    assert out[1]["text"] == "call <PHONE> ext <NUM>"
    assert out[2]["text"] == texts[2] and out[2]["n_number"] == 0
    assert out[3]["n_email"] == 2 and out[3]["n_ipv4"] == 1
    assert out[4]["text"] == ""
    # numbers inside JSON props get caught by the generic pass
    assert out[5]["n_number"] == 3  # 69, 12, 5 (decimal splits on '.')
    # sentinels contain no digits → later patterns never re-match
    assert all("<" in s or not any(c.isdigit() for c in s)
               for _, _, s in DEFAULT_PATTERNS)


def test_dataset_wrappers(ray_session):
    import ray.data as rd

    from elasticsearch_assets_ray.ops.pii import pii_redact
    from elasticsearch_assets_ray.ops.repetition import (
        gopher_repetition_filter,
        repetition_stats,
    )

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(FIXTURES)), pa.int64()),
        "text": pa.array(FIXTURES, pa.string()),
    }))
    t = pa.Table.from_pylist(repetition_stats(ds).take_all())
    assert t.num_rows == len(FIXTURES)
    t2 = pa.Table.from_pylist(gopher_repetition_filter(ds).take_all())
    assert "keep" in t2.column_names
    t3 = pa.Table.from_pylist(pii_redact(ds).take_all())
    assert t3.num_rows == len(FIXTURES)
