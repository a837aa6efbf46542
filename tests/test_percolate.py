"""Percolator edge semantics (oracle bit-exactness runs in
test_contract; this covers the stage contract)."""

import numpy as np
import pyarrow as pa
import pytest

from elasticsearch_assets_ray.ops.percolate import Percolator, required_terms


def _batch(texts, langs=None, ids=None):
    n = len(texts)
    cols = {
        "doc_id": pa.array(ids or list(range(n)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }
    if langs:
        cols["lang"] = pa.array(langs, pa.string())
    return pa.table(cols)


def test_leaf_families():
    p = Percolator({
        "phrase": '"big cat"',
        "boolq": "dog AND cat NOT bird",
        "pref": "ca*",
        "wild": "d?g",
        "fuzz": "caat~1",
        "meta": "lang:de AND dog",
        "exists": "_exists_:lang AND bird",
        "plus": "+dog cat",
    }, analyzer="simple")
    out = p(_batch(
        ["big cat sat", "dog and cat", "dog bird cat", "a dog"],
        langs=["en", "de", "de", None],
    ))
    pairs = sorted(zip(out.column("doc_id").to_pylist(),
                       out.column("query").to_pylist()))
    assert (0, "phrase") in pairs and (1, "phrase") not in pairs
    assert (1, "boolq") in pairs and (2, "boolq") not in pairs
    assert {d for d, q in pairs if q == "pref"} == {0, 1, 2}
    assert {d for d, q in pairs if q == "wild"} == {1, 2, 3}
    assert {d for d, q in pairs if q == "fuzz"} == {0, 1, 2}  # cat~1
    assert {d for d, q in pairs if q == "meta"} == {1, 2}
    assert {d for d, q in pairs if q == "exists"} == {2}  # lang null on 3
    assert {d for d, q in pairs if q == "plus"} == {1, 2, 3}


def test_empty_and_degenerate():
    p = Percolator({"q": "cat", "gone": "!!!"})  # 'gone' analyzes away
    out = p(_batch([]))
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "query"]
    out = p(_batch(["no match here"]))
    assert out.num_rows == 0
    # repeated-token phrase positions
    p2 = Percolator({"rep": '"cat cat"'})
    out = p2(_batch(["cat cat cat", "cat dog cat"]))
    assert out.column("doc_id").to_pylist() == [0]
    # missing metadata column matches nothing (lenient mapping)
    p3 = Percolator({"m": "nosuch:x cat"})
    out = p3(_batch(["cat"]))
    assert out.column("doc_id").to_pylist() == [0]  # OR: text side matches
    p4 = Percolator({"m": "nosuch:x AND cat"})
    assert p4(_batch(["cat"])).num_rows == 0


def test_slop_rejected():
    p = Percolator({"s": '"a b"~2'})
    with pytest.raises(ValueError):
        p(_batch(["a x b"]))


def test_ids_passthrough_dtype():
    p = Percolator({"q": "cat"})
    out = p(_batch(["cat", "dog"], ids=[100, 200]))
    assert out.column("doc_id").to_pylist() == [100]


QUERIES = {
    "phrase": '"big cat"',
    "boolq": "dog AND cat NOT bird",
    "pref": "ca*",
    "wild": "d?g",
    "fuzz": "caat~1",
    "meta": "lang:de AND dog",
    "metaonly": "lang:fr",
    "exists": "_exists_:lang AND bird",
    "plus": "+dog cat",
    "ortext": "zebra OR yak",
    "mixedor": "nosuch:x cat",
}


def test_required_terms_extraction():
    from elasticsearch_assets_ray.analysis.tokenizer import get_analyzer

    an = get_analyzer("simple")

    def req(q, default_operator="or"):
        from elasticsearch_assets_ray.search.qs import parse_query_string

        return required_terms(
            parse_query_string(q, an, default_operator, default_field="text")
        )

    assert req('"big cat"') == {"big"}  # longest phrase token
    assert req("dog AND cat NOT bird") in ({"dog"}, {"cat"})
    assert req("zebra OR yak") == {"zebra", "yak"}
    assert req("ca*") is None  # prefix atom — not a term requirement
    assert req("caat~1") is None
    assert req("lang:fr") is None  # pure metadata
    assert req("lang:de AND dog") == {"dog"}  # conjunction keeps exact side
    assert req("nosuch:x cat") is None  # OR poisoned by meta side
    assert req("+dog cat") in ({"dog"}, {"cat"}, {"dog", "cat"})

    from elasticsearch_assets_ray.ops.percolate import required_atoms
    from elasticsearch_assets_ray.search.qs import parse_query_string

    def atoms(q):
        return required_atoms(
            parse_query_string(q, an, "or", default_field="text")
        )

    assert atoms("ca*") == {("prefix", "ca")}
    assert atoms("d?g") == {("prefix", "d")}
    assert atoms("*og") is None  # no literal anchor
    assert atoms("dog OR ca*") == {("term", "dog"), ("prefix", "ca")}
    # conjunction prefers the term atom over the prefix atom
    assert atoms("ca* AND dog") == {("term", "dog")}


def test_prune_index_and_parity():
    pruned = Percolator(QUERIES)
    full = Percolator(QUERIES, prune=False)
    # always-candidates = the queries with no anchorable requirement;
    # pref/wild anchor on their literal prefixes now
    assert set(pruned._always) == {"fuzz", "metaonly", "mixedor"}
    assert "dog" in pruned._term_to_q and "bird" in pruned._term_to_q
    assert pruned._prefix_to_q.get("ca") == ["pref"]
    assert pruned._prefix_to_q.get("d") == ["wild"]
    batches = [
        _batch(["big cat sat", "dog and cat", "dog bird cat", "a dog"],
               langs=["en", "de", "de", None]),
        _batch(["zebra crossing", "nothing relevant", "yak milk"],
               langs=["fr", "fr", None]),
        _batch([]),
        _batch(["caat dag cat"], langs=["de"]),
    ]
    for b in batches:
        want = sorted(zip(full(b).column("doc_id").to_pylist(),
                          full(b).column("query").to_pylist()))
        got = sorted(zip(pruned(b).column("doc_id").to_pylist(),
                         pruned(b).column("query").to_pylist()))
        assert got == want


def test_dsl_standing_queries_match_string_equivalents():
    """JSON DSL standing queries (incl. a nested wrapper) percolate
    identically to their query_string twins — same trees, same
    mini-index evaluation, same pruning machinery."""
    from elasticsearch_assets_ray.search.dsl import wrap_query

    dsl = {
        "boolq": {"bool": {
            "must": [{"match": {"text": {"query": "dog cat",
                                         "operator": "and"}}}],
            "must_not": [{"match": {"text": "bird"}}]}},
        "phrase": wrap_query({"match_phrase": {"text": "big cat"}}),
        "metaq": {"bool": {
            "must": [{"match": {"text": "dog"}}],
            "filter": [{"term": {"lang": "de"}}]}},
    }
    twin = {
        "boolq": "dog AND cat NOT bird",
        "phrase": '"big cat"',
        "metaq": "dog AND lang:de",
    }
    docs = ["big cat sat", "dog and cat", "dog bird cat", "a dog"]
    langs = ["en", "de", "de", None]
    a = Percolator(dsl, analyzer="simple")(_batch(docs, langs=langs))
    b = Percolator(twin, analyzer="simple")(_batch(docs, langs=langs))
    pa_ = sorted(zip(a.column("doc_id").to_pylist(),
                     a.column("query").to_pylist()))
    pb = sorted(zip(b.column("doc_id").to_pylist(),
                    b.column("query").to_pylist()))
    assert pa_ == pb and len(pa_) > 0
    # DSL trees feed the same pruning index (term extraction works)
    p = Percolator(dsl, analyzer="simple")
    assert "dog" in p._term_to_q or "cat" in p._term_to_q
