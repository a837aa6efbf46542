"""simple_query_string: parser semantics + engine parity vs a
brute-force scorer over the analyzed corpus."""

import math
import pathlib
import re

import numpy as np
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.analysis.tokenizer import clip_tokens, code_tokens
from elasticsearch_assets_ray.search.sqs import (
    eval_tree,
    parse_simple_query_string,
)


def _an(s):
    return clip_tokens(code_tokens(s), 1, 64)


def test_parser_shapes():
    p = parse_simple_query_string
    assert p("foo", _an) == ("term", "foo")
    assert p("foo bar", _an) == ("or", ("term", "foo"), ("term", "bar"))
    assert p("foo bar", _an, "and") == \
        ("and", ("term", "foo"), ("term", "bar"))
    assert p("foo + bar | baz", _an) == \
        ("or", ("and", ("term", "foo"), ("term", "bar")), ("term", "baz"))
    assert p("foo (bar | baz)", _an) == \
        ("or", ("term", "foo"),
         ("or", ("term", "bar"), ("term", "baz")))
    assert p("foo -bar", _an) == \
        ("andnot", ("term", "foo"), ("term", "bar"))
    # leading negation attaches once a positive arrives
    assert p("-bar foo", _an) == \
        ("andnot", ("term", "foo"), ("term", "bar"))
    assert p('"big table scan"', _an) == \
        ("phrase", ["big", "table", "scan"], 0)
    assert p('"big table"~2', _an) == ("phrase", ["big", "table"], 2)
    # single-token quoted collapses to a term
    assert p('"foo"', _an) == ("term", "foo")
    assert p("que*", _an) == ("prefix", "que")
    assert p("merge~1", _an) == ("fuzzy", "merge", 1)
    assert p("merge~2 data", _an) == \
        ("or", ("fuzzy", "merge", 2), ("term", "data"))
    # multi-token fuzzy unit: distance applies to the LAST token
    assert p("hash-join~1", _an) == \
        ("or", ("term", "hash"), ("fuzzy", "join", 1))
    # '-' inside a word is NOT negation; the analyzer splits it
    assert p("hash-join", _an) == \
        ("or", ("term", "hash"), ("term", "join"))
    # pure-negative / empty queries match nothing
    assert p("-foo", _an) is None
    assert p("", _an) is None
    assert p("()", _an) is None


def test_eval_tree_algebra():
    leaves = {
        "a": (np.array([1, 2, 3]), np.array([1.0, 1.0, 1.0])),
        "b": (np.array([2, 3, 4]), np.array([0.5, 0.5, 0.5])),
    }
    fn = lambda n: leaves[n[1]]  # noqa: E731
    ids, sc = eval_tree(("and", ("term", "a"), ("term", "b")), fn)
    assert ids.tolist() == [2, 3] and sc.tolist() == [1.5, 1.5]
    ids, sc = eval_tree(("or", ("term", "a"), ("term", "b")), fn)
    assert ids.tolist() == [1, 2, 3, 4]
    assert sc.tolist() == [1.0, 1.5, 1.5, 0.5]
    ids, sc = eval_tree(("andnot", ("term", "a"), ("term", "b")), fn)
    assert ids.tolist() == [1] and sc.tolist() == [1.0]


def test_apply_minimum_should_match_lucene_shapes():
    """Request-level msm reads the root as a Lucene BooleanQuery: a
    pure conjunction has ZERO optional clauses, so any m ≥ 1 matches
    nothing (Lucene rewrites minShouldMatch > should-count to
    MatchNoDocsQuery); an OR spine or single optional clause under
    m = 1 is the plain query."""
    from elasticsearch_assets_ray.search.sqs import (
        apply_minimum_should_match,
    )

    leaves = {
        "a": (np.array([1, 2, 3]), np.array([1.0, 1.0, 1.0])),
        "b": (np.array([2, 3, 4]), np.array([0.5, 0.5, 0.5])),
    }
    fn = lambda n: leaves[n[1]]  # noqa: E731
    or_tree = ("or", ("term", "a"), ("term", "b"))
    and_tree = ("and", ("term", "a"), ("term", "b"))
    # m=1 over an OR spine / a single leaf: no-op
    assert apply_minimum_should_match(or_tree, 1) is or_tree
    assert apply_minimum_should_match(("term", "a"), 1) == ("term", "a")
    # m=1 over 'a AND b' (+a +b, zero should clauses): matches nothing
    ids, _ = eval_tree(apply_minimum_should_match(and_tree, 1), fn)
    assert ids.tolist() == []
    ids, _ = eval_tree(apply_minimum_should_match(and_tree, 2), fn)
    assert ids.tolist() == []
    # m=2 over the OR spine: both must match, scores still sum
    ids, sc = eval_tree(apply_minimum_should_match(or_tree, 2), fn)
    assert ids.tolist() == [2, 3] and sc.tolist() == [1.5, 1.5]
    # required wrapper passes through to its optional (scored) side
    ids, _ = eval_tree(
        apply_minimum_should_match(
            ("filter", and_tree, ("term", "a")), 1), fn)
    assert ids.tolist() == []


@pytest.fixture(scope="module")
def pos_index(small_corpus, tmp_path_factory):
    from elasticsearch_assets_ray.config import IndexConfig
    from elasticsearch_assets_ray.index.build import build_index

    idx = tmp_path_factory.mktemp("sqsidx") / "idx"
    return build_index(
        small_corpus, idx,
        IndexConfig(partition_target_docs=50, shard_target_docs=100,
                    store_positions=True),
    )


@pytest.fixture(scope="module")
def corpus_toks(small_corpus, pos_index):
    m = pos_index.manifest
    texts = []
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        texts.extend(
            pq.read_table(f, columns=["content"]).column("content").to_pylist()
        )
    return [clip_tokens(code_tokens(t), m.min_token_len, m.max_token_len)
            for t in texts]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_sqs(toks, tree, k1=1.2, b=0.75):
    """Brute-force sqs scorer over analyzed docs."""
    n = len(toks)
    dl = np.array([len(t) for t in toks], dtype=np.float64)
    avgdl = dl.mean()

    def idf(t):
        df = sum(1 for tk in toks if t in tk)
        return math.log(1 + (n - df + 0.5) / (df + 0.5))

    def leaf(node):
        if node[0] == "term":
            t = node[1]
            w = idf(t)
            ids, sc = [], []
            for d, tk in enumerate(toks):
                tf = tk.count(t)
                if tf:
                    ids.append(d)
                    sc.append(w * tf * (k1 + 1)
                              / (tf + k1 * (1 - b + b * dl[d] / avgdl)))
            return np.array(ids, np.int64), np.array(sc, np.float64)
        if node[0] == "phrase":
            ptoks, slop = node[1], node[2]
            assert slop == 0, "brute oracle covers exact phrases"
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
        if node[0] == "fuzzy":
            base, fz = node[1], node[2]
            vocab = sorted({t for tk in toks for t in tk})
            exps = sorted(
                ((d, t) for t in vocab
                 if (d := _lev(base, t)) <= fz),
            )[:50]  # the deterministic (dist, term) cap
            acc: dict[int, float] = {}
            # sorted-term accumulation, matching both engines
            for t, dist in sorted((t, d) for d, t in exps):
                w = (idf(t)
                     * (1.0 - dist / max(1, min(len(base), len(t)))))
                for dd, tk in enumerate(toks):
                    tf = tk.count(t)
                    if tf:
                        acc[dd] = acc.get(dd, 0.0) + (
                            w * tf * (k1 + 1)
                            / (tf + k1 * (1 - b + b * dl[dd] / avgdl)))
            ids = np.array(sorted(acc), np.int64)
            return ids, np.array([acc[i] for i in ids], np.float64)
        raise AssertionError(node)

    return eval_tree(tree, leaf)


QUERIES = [
    ("merge data", "or"),
    ("merge data", "and"),
    ('"def merge" | data', "or"),
    ("merge + data -import", "or"),
    ("imp* merge", "or"),
    ("(merge | data) + imp*", "or"),
    ("-merge data", "or"),
    ("zzz qqq", "or"),
    ("merg~1", "or"),
    ("merg~1 + data", "or"),
    ('merge~2 | "def merge"', "or"),
    ("zzzzzzzz~1", "or"),
]


def test_sqs_engines_match_brute_force(pos_index, corpus_toks, ray_session, tmp_path):
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.engine import QueryEngine
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    out = tmp_path / "global_sqs"
    merge_global_postings(pos_index.index_dir, out, n_salts=2,
                          n_buckets=4, store_norms=True)
    eng = QueryEngine(pos_index.index_dir, num_actors=2)
    teng = TermPartitionedEngine(out, num_actors=2)
    try:
        for q, op in QUERIES:
            tree = parse_simple_query_string(q, _an, op)
            got = eng.search_simple_query_string(q, k=1000,
                                                 default_operator=op)
            got_t = teng.search_simple_query_string(q, k=1000,
                                                    default_operator=op)
            if tree is None:
                assert got == [] and got_t == []
                continue
            ids, sc = _brute_sqs(corpus_toks, tree)
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


COMPOUND_CASES = [
    ("dismax", (["merge data", '"def merge"', "imp*"], 0.3)),
    ("dismax", (["merge", "data"], 0.0)),
    ("boosting", ("merge data", "import", 0.4)),
    ("boosting", ("merge | data", "zzz", 0.5)),
    ("constscore", ("merge | imp*", 2.5)),
]


def test_compound_queries_match_brute_force(pos_index, corpus_toks,
                                            ray_session, tmp_path):
    """dis_max / boosting / constant_score: both engines vs the brute
    scorer (the compound nodes evaluate in the SHARED eval_tree, so the
    brute oracle exercises the same walker over brute leaves)."""
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.engine import QueryEngine
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    out = tmp_path / "global_compound"
    merge_global_postings(pos_index.index_dir, out, n_salts=2,
                          n_buckets=4, store_norms=True)
    eng = QueryEngine(pos_index.index_dir, num_actors=2)
    teng = TermPartitionedEngine(out, num_actors=2)
    try:
        for kind, args in COMPOUND_CASES:
            if kind == "dismax":
                qs, tie = args
                got = eng.search_dis_max(qs, tie_breaker=tie, k=1000)
                got_t = teng.search_dis_max(qs, tie_breaker=tie, k=1000)
                subtrees = tuple(
                    t for q in qs
                    if (t := parse_simple_query_string(q, _an, "or"))
                    is not None
                )
                tree = ("dismax", tie, subtrees)
            elif kind == "boosting":
                pos_q, neg_q, nb = args
                got = eng.search_boosting(pos_q, neg_q, nb, k=1000)
                got_t = teng.search_boosting(pos_q, neg_q, nb, k=1000)
                tree = ("boosting",
                        parse_simple_query_string(pos_q, _an, "or"),
                        parse_simple_query_string(neg_q, _an, "or"), nb)
            else:
                fq, boost = args
                got = eng.search_constant_score(fq, boost=boost, k=1000)
                got_t = teng.search_constant_score(fq, boost=boost, k=1000)
                tree = ("constscore",
                        parse_simple_query_string(fq, _an, "or"), boost)
            ids, sc = _brute_sqs(corpus_toks, tree)
            order = np.lexsort((ids, -sc))
            want = [(int(ids[i]), float(sc[i])) for i in order]
            assert [d for d, _ in got] == [d for d, _ in want], (kind, args)
            for (_, s1), (_, s2) in zip(got, want):
                assert abs(s1 - s2) < 1e-9, (kind, args)
            assert [d for d, _ in got_t] == [d for d, _ in got], (kind, args)
            for (_, s1), (_, s2) in zip(got_t, got):
                assert abs(s1 - s2) < 1e-9, (kind, args)
    finally:
        eng.shutdown()
        teng.shutdown()
