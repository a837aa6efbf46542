"""query_string (classic Lucene syntax): parser semantics + engine
parity vs a brute-force scorer over the analyzed corpus + doc values."""

import math
import pathlib

import numpy as np
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.analysis.tokenizer import clip_tokens, code_tokens
from elasticsearch_assets_ray.search.qs import (
    coerce_meta_bound,
    meta_pred_mask,
    parse_query_string,
)
from elasticsearch_assets_ray.search.sqs import eval_tree


def _an(s):
    return clip_tokens(code_tokens(s), 1, 64)


def P(q, **kw):
    return parse_query_string(q, _an, default_field="content", **kw)


def test_parser_shapes():
    assert P("foo") == ("term", "foo")
    assert P("foo bar") == ("or", ("term", "foo"), ("term", "bar"))
    assert P("foo bar", default_operator="and") == \
        ("and", ("term", "foo"), ("term", "bar"))
    assert P("foo AND bar OR baz") == \
        ("or", ("and", ("term", "foo"), ("term", "bar")), ("term", "baz"))
    assert P("foo && bar || baz") == P("foo AND bar OR baz")
    assert P("foo NOT bar") == \
        ("andnot", ("term", "foo"), ("term", "bar"))
    assert P("foo !bar") == P("foo NOT bar") == P("foo -bar")
    assert P("foo AND NOT bar") == P("foo AND -bar") == \
        ("andnot", ("term", "foo"), ("term", "bar"))
    # occur modifiers: + gates the doc set, score stays the clause sum
    assert P("+foo bar") == \
        ("filter", ("or", ("term", "foo"), ("term", "bar")), ("term", "foo"))
    # field scoping
    assert P("lang:python foo") == \
        ("or", ("metaterm", "lang", "python"), ("term", "foo"))
    assert P("content:foo") == ("term", "foo")  # default field = text
    assert P("lang:(python java)") == \
        ("or", ("metaterm", "lang", "python"), ("metaterm", "lang", "java"))
    assert P('repo:"org1/repo2"') == ("metaterm", "repo", "org1/repo2")
    # ranges: bracket inclusivity per bound, cmp forms, open bounds
    assert P("n_chars:[100 TO 200]") == \
        ("metarange", "n_chars", "100", "200", True, True)
    assert P("n_chars:{100 TO 200]") == \
        ("metarange", "n_chars", "100", "200", False, True)
    assert P("n_chars:[100 TO *]") == \
        ("metarange", "n_chars", "100", None, True, False)
    assert P("n_chars:>=100") == \
        ("metarange", "n_chars", "100", None, True, False)
    assert P("n_chars:<200") == \
        ("metarange", "n_chars", None, "200", False, False)
    # boosts: words, phrases, groups
    assert P("foo^2 bar") == \
        ("or", ("boost", ("term", "foo"), 2.0), ("term", "bar"))
    assert P('"foo bar"^1.5') == \
        ("boost", ("phrase", ["foo", "bar"], 0), 1.5)
    assert P("(foo bar)^3") == \
        ("boost", ("or", ("term", "foo"), ("term", "bar")), 3.0)
    assert P('"foo bar"~2') == ("phrase", ["foo", "bar"], 2)
    # wildcards: trailing-star lowers to prefix, others stay wildcard
    assert P("que*") == ("prefix", "que")
    assert P("qu*ry") == ("wildcard", "qu*ry")
    assert P("te?t") == ("wildcard", "te?t")
    assert P("merge~1") == ("fuzzy", "merge", 1)
    assert P("merge~") == ("fuzzy", "merge", 2)
    # _exists_ pseudo-field
    assert P("_exists_:lang foo") == \
        ("or", ("metaexists", "lang"), ("term", "foo"))
    assert P("_exists_:lang^2") == ("boost", ("metaexists", "lang"), 2.0)
    # lenient empties
    assert P("") is None
    assert P("NOT foo") is None
    assert P("-foo") is None


def test_meta_pred_mask():
    v = np.array([10.0, 20.0, 30.0, np.nan])
    assert meta_pred_mask(v, ("term", "20")).tolist() == \
        [False, True, False, False]
    assert meta_pred_mask(v, ("range", "10", "30", False, True)).tolist() == \
        [False, True, True, False]
    assert meta_pred_mask(v, ("range", None, "20", False, False)).tolist() == \
        [True, False, False, False]
    s = np.array(["a", "b", None], dtype=object)
    assert meta_pred_mask(s, ("term", "b")).tolist() == [False, True, False]
    # keyword ranges unsupported → match nothing (disclosed)
    assert not meta_pred_mask(s, ("range", "a", "z", True, True)).any()
    # ISO date bounds coerce to epoch micros
    us = coerce_meta_bound("2024-01-02")
    assert us == (1_704_067_200 + 86_400) * 1e6
    assert coerce_meta_bound("2024-01-02T00:00:00Z") == us
    assert coerce_meta_bound("not a date") is None


@pytest.fixture(scope="module")
def qs_index(small_corpus, tmp_path_factory):
    from elasticsearch_assets_ray.config import IndexConfig
    from elasticsearch_assets_ray.index.build import build_index

    idx = tmp_path_factory.mktemp("qsidx") / "idx"
    return build_index(
        small_corpus, idx,
        IndexConfig(partition_target_docs=50, shard_target_docs=100,
                    store_positions=True,
                    meta_cols=("repo", "path", "lang", "n_chars"),
                    derived_meta=("n_chars=len_of:content",)),
    )


@pytest.fixture(scope="module")
def qs_corpus(small_corpus, qs_index):
    m = qs_index.manifest
    toks, langs, n_chars = [], [], []
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        t = pq.read_table(f, columns=["content", "lang"])
        for txt, lg in zip(t.column("content").to_pylist(),
                           t.column("lang").to_pylist()):
            toks.append(clip_tokens(code_tokens(txt),
                                    m.min_token_len, m.max_token_len))
            langs.append(lg)
            n_chars.append(len(txt))
    return toks, langs, n_chars


def _brute_qs(corpus, tree, k1=1.2, b=0.75):
    """Brute-force query_string scorer: text leaves over analyzed docs,
    docmeta leaves over raw columns — evaluated through the SHARED
    eval_tree walker (so boost/filter nodes exercise the same code both
    engines run)."""
    toks, langs, n_chars = corpus
    n = len(toks)
    dl = np.array([len(t) for t in toks], dtype=np.float64)
    avgdl = dl.mean()
    meta = {
        "lang": np.array(langs, dtype=object),
        "n_chars": np.array(n_chars, dtype=np.float64),
    }

    def idf(t):
        df = sum(1 for tk in toks if t in tk)
        return math.log(1 + (n - df + 0.5) / (df + 0.5))

    def bm25(t):
        w = idf(t)
        ids, sc = [], []
        for d, tk in enumerate(toks):
            tf = tk.count(t)
            if tf:
                ids.append(d)
                sc.append(w * tf * (k1 + 1)
                          / (tf + k1 * (1 - b + b * dl[d] / avgdl)))
        return np.array(ids, np.int64), np.array(sc, np.float64)

    def leaf(node):
        if node[0] == "term":
            return bm25(node[1])
        if node[0] == "phrase":
            ptoks, slop = node[1], node[2]
            assert slop == 0
            w = sum(idf(t) for t in ptoks)
            L = len(ptoks)
            ids, sc = [], []
            for d, tk in enumerate(toks):
                pf = sum(1 for i in range(len(tk) - L + 1)
                         if tk[i:i + L] == ptoks)
                if pf:
                    ids.append(d)
                    sc.append(w * pf * (k1 + 1)
                              / (pf + k1 * (1 - b + b * dl[d] / avgdl)))
            return np.array(ids, np.int64), np.array(sc, np.float64)
        if node[0] == "prefix":
            ids = [d for d, tk in enumerate(toks)
                   if any(t.startswith(node[1]) for t in tk)]
            return np.array(ids, np.int64), np.ones(len(ids), np.float64)
        if node[0] == "wildcard":
            import re as _re

            rx = _re.compile(
                "".join(".*" if c == "*" else "." if c == "?"
                        else _re.escape(c) for c in node[1]) + r"\Z")
            ids = [d for d, tk in enumerate(toks)
                   if any(rx.match(t) for t in tk)]
            return np.array(ids, np.int64), np.ones(len(ids), np.float64)
        if node[0] in ("metaterm", "metarange", "metaexists"):
            if node[1] not in meta:  # unmapped field matches nothing
                return np.empty(0, np.int64), np.empty(0, np.float64)
            if node[0] == "metaterm":
                pred = ("term", node[2])
            elif node[0] == "metaexists":
                pred = ("exists",)
            else:
                pred = ("range",) + tuple(node[2:])
            mask = meta_pred_mask(meta[node[1]], pred)
            ids = np.nonzero(mask)[0].astype(np.int64)
            return ids, np.ones(len(ids), np.float64)
        raise AssertionError(node)

    return eval_tree(tree, leaf)


QS_CASES = [
    ("merge AND data OR import", "or"),
    ("merge data NOT import", "or"),
    ("lang:python merge", "or"),
    ("lang:python AND merge", "or"),
    ('"def merge"^2 data', "or"),
    ("n_chars:[400 TO 900] merge", "or"),
    ("n_chars:>=800 AND merge", "or"),
    ("(merge data)^0.5 OR import", "or"),
    ("+merge data -import", "or"),
    ("me?ge data", "or"),
    ("m*rge^3 data", "or"),
    ("lang:(python go) AND merge", "or"),
    ("merge data", "and"),
    ("lang:zzz merge", "or"),        # no docs match the meta term
    ("nosuchfield:zzz merge", "or"),  # unmapped field matches nothing
    ("_exists_:lang AND merge", "or"),
    ("_exists_:nosuchfield merge", "or"),
]


def test_qs_engines_match_brute_force(qs_index, qs_corpus, ray_session,
                                      tmp_path):
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.engine import QueryEngine
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    out = tmp_path / "global_qs"
    merge_global_postings(qs_index.index_dir, out, n_salts=2,
                          n_buckets=4, store_norms=True)
    eng = QueryEngine(qs_index.index_dir, num_actors=2)
    teng = TermPartitionedEngine(out, num_actors=2)
    try:
        for q, op in QS_CASES:
            tree = P(q, default_operator=op)
            got = eng.search_query_string(q, k=1000, default_operator=op)
            got_t = teng.search_query_string(q, k=1000, default_operator=op)
            if tree is None:
                assert got == [] and got_t == []
                continue
            ids, sc = _brute_qs(qs_corpus, tree)
            order = np.lexsort((ids, -sc))
            want = [(int(ids[i]), float(sc[i])) for i in order]
            assert [d for d, _ in got] == [d for d, _ in want], (q, op)
            for (_, s1), (_, s2) in zip(got, want):
                assert abs(s1 - s2) < 1e-9, (q, op)
            assert [d for d, _ in got_t] == [d for d, _ in got], (q, op)
            for (_, s1), (_, s2) in zip(got_t, got):
                assert abs(s1 - s2) < 1e-9, (q, op)
    finally:
        eng.shutdown()
        teng.shutdown()


def test_validate_query_api():
    from elasticsearch_assets_ray.search.qs import validate_query

    assert validate_query("hash AND join") == {"valid": True}
    assert validate_query("lang:py AND (a OR b)^2") == {"valid": True}
    assert validate_query("zzz") == {"valid": True}  # matches nothing: valid
    bad = validate_query("lang:[TO 5]", meta_fields={"lang"})
    assert bad["valid"] is False and "bad range" in bad["error"]
    unk = validate_query("nofield:3", meta_fields={"lang"})
    assert unk["valid"] is False and "unknown field" in unk["error"]
