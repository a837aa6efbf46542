"""ES intervals query — kernel unit tests, randomized brute-force
parity, engine serving parity (doc ↔ term engines), and scoring checks.

The naive evaluator here is an INDEPENDENT formulation: full
match-set enumeration by itertools.product over child minimal sets,
minimality by pairwise containment scan — no sweeps, no DP.
"""

import itertools
import pathlib
import random

import numpy as np
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.analysis.tokenizer import clip_tokens, code_tokens
from elasticsearch_assets_ray.config import BM25Params, IndexConfig
from elasticsearch_assets_ray.index.build import build_index
from elasticsearch_assets_ray.search.engine import QueryEngine
from elasticsearch_assets_ray.search import intervals as iv


# ------------------------------------------------------- naive evaluator


def _naive_minimal(matches):
    """Minimal antichain of a set of inclusive (s, e) intervals —
    pairwise containment scan."""
    ms = sorted(set(matches))
    return [
        (s, e) for s, e in ms
        if not any(
            (s2, e2) != (s, e) and s2 >= s and e2 <= e for s2, e2 in ms
        )
    ]


def _naive_eval(node, pos_of):
    """Per-doc reference: minimal intervals of ``node`` over
    term -> positions.  Exponential enumeration (test-scale only)."""
    if "term" in node:
        return [(p, p) for p in sorted(pos_of.get(node["term"], []))]
    kind = "any_of" if "any_of" in node else "all_of"
    spec = node[kind]
    children = [_naive_eval(c, pos_of) for c in spec["intervals"]]
    if kind == "any_of":
        out = _naive_minimal([se for c in children for se in c])
    else:
        ordered = spec.get("ordered", False)
        max_gaps = spec.get("max_gaps", -1)
        if any(not c for c in children):
            out = []
        else:
            best_w: dict = {}
            for tup in itertools.product(*children):
                if ordered and not all(
                    tup[i + 1][0] > tup[i][1] for i in range(len(tup) - 1)
                ):
                    continue
                s = min(a for a, _ in tup)
                e = max(b for _, b in tup)
                w = sum(b - a + 1 for a, b in tup)
                if best_w.get((s, e), -1) < w:
                    best_w[(s, e)] = w
            out = [
                (s, e) for s, e in _naive_minimal(best_w)
                if max_gaps < 0 or (e - s + 1) - best_w[(s, e)] <= max_gaps
            ]
    f = spec.get("filter")
    if f:
        rel, sub = next(iter(f.items()))
        fset = _naive_eval(sub, pos_of)
        base = rel[4:] if rel.startswith("not_") else rel
        def rel_ok(s, e):
            if base == "containing":
                return any(s <= fs and fe <= e for fs, fe in fset)
            if base == "contained_by":
                return any(fs <= s and e <= fe for fs, fe in fset)
            if base == "overlapping":
                return any(s <= fe and fs <= e for fs, fe in fset)
            if base == "before":
                return any(e < fs for fs, _fe in fset)
            return any(s > fe for _fs, fe in fset)  # after
        neg = rel.startswith("not_")
        out = [(s, e) for s, e in out if rel_ok(s, e) != neg]
    return out


def _streams(doc_pos):
    out = {}
    for t, per_doc in doc_pos.items():
        docs, pos = [], []
        for d in sorted(per_doc):
            for p in sorted(per_doc[d]):
                docs.append(d)
                pos.append(p)
        out[t] = (np.array(docs, np.int64), np.array(pos, np.int64))
    return out


# ---------------------------------------------------------------- kernel


def test_term_and_any_of_minimality():
    st = _streams({"a": {0: [1, 5]}, "b": {0: [2]}})
    d, s, e = iv.eval_intervals({"term": "a"}, st)
    assert s.tolist() == [1, 5] and (e == s).all()
    # any_of over a phrase and a term: the unit term at 2 makes the
    # containing phrase window [1,2] non-minimal
    phrase = {"all_of": {"intervals": [{"term": "a"}, {"term": "b"}],
                         "ordered": True, "max_gaps": 0}}
    d, s, e = iv.eval_intervals(phrase, st)
    assert list(zip(s.tolist(), e.tolist())) == [(1, 2)]
    union = {"any_of": {"intervals": [phrase, {"term": "b"}]}}
    d, s, e = iv.eval_intervals(union, st)
    assert list(zip(s.tolist(), e.tolist())) == [(2, 2)]


def test_ordered_max_gaps():
    st = _streams({"a": {0: [0, 10]}, "b": {0: [3, 11]}})
    tree = {"all_of": {"intervals": [{"term": "a"}, {"term": "b"}],
                       "ordered": True, "max_gaps": 1}}
    d, s, e = iv.eval_intervals(tree, st)
    # [0,3] has gaps 4-2=2 > 1; [10,11] gaps 0
    assert list(zip(s.tolist(), e.tolist())) == [(10, 11)]
    tree["all_of"]["max_gaps"] = 2
    d, s, e = iv.eval_intervals(tree, st)
    assert list(zip(s.tolist(), e.tolist())) == [(0, 3), (10, 11)]


def test_unordered_allows_overlap():
    # same position shared by both children: window [4,4], gaps -1
    st = _streams({"a": {0: [4]}, "b": {0: [4]}})
    tree = {"all_of": {"intervals": [{"term": "a"}, {"term": "b"}],
                       "ordered": False, "max_gaps": 0}}
    d, s, e = iv.eval_intervals(tree, st)
    assert list(zip(s.tolist(), e.tolist())) == [(4, 4)]
    # ordered requires strict separation
    tree["all_of"]["ordered"] = True
    d, s, e = iv.eval_intervals(tree, st)
    assert len(d) == 0


def test_filters():
    st = _streams({"a": {0: [0, 10]}, "b": {0: [3, 13]}, "x": {0: [2, 20]}})
    near = {"all_of": {"intervals": [{"term": "a"}, {"term": "b"}],
                       "ordered": True, "max_gaps": 5}}
    d, s, e = iv.eval_intervals(near, st)
    assert list(zip(s.tolist(), e.tolist())) == [(0, 3), (10, 13)]
    for rel, want in [
        ("containing", [(0, 3)]),
        ("not_containing", [(10, 13)]),
        ("overlapping", [(0, 3)]),
        ("not_overlapping", [(10, 13)]),
        ("before", [(0, 3), (10, 13)]),   # x@20 starts after both end
        ("after", [(10, 13)]),            # only [10,13] starts after x@2
    ]:
        t = {"all_of": {**near["all_of"], "filter": {rel: {"term": "x"}}}}
        d, s, e = iv.eval_intervals(t, st)
        assert list(zip(s.tolist(), e.tolist())) == want, rel
    big = {"all_of": {"intervals": [{"term": "a"}, {"term": "x"}],
                      "ordered": False, "max_gaps": -1}}
    t = {"all_of": {"intervals": [{"term": "b"}],
                    "ordered": True,
                    "filter": {"contained_by": big}}}
    d, s, e = iv.eval_intervals(t, st)
    # big minimal windows: [0,2], [2,10] (x@2,a@10), [10,20] — b@3 sits
    # inside [2,10] and b@13 inside [10,20]
    assert list(zip(s.tolist(), e.tolist())) == [(3, 3), (13, 13)]


def test_walkers_and_rewrites():
    tree = {"all_of": {"intervals": [
        {"term": "a"},
        {"any_of": {"intervals": [{"term": "b"}, {"term": "c"}]}},
    ], "ordered": True, "max_gaps": 2,
        "filter": {"not_containing": {"term": "x"}}}}
    assert iv.leaf_terms(tree) == ["a", "b", "c"]
    assert iv.all_terms(tree) == {"a", "b", "c", "x"}
    assert iv.requirement_sets(tree) == [
        frozenset({"a"}), frozenset({"b", "c"})
    ]
    pos = {"all_of": {**tree["all_of"],
                      "filter": {"containing": {"term": "x"}}}}
    assert iv.requirement_sets(pos) == [
        frozenset({"a"}), frozenset({"b", "c"}), frozenset({"x"})
    ]
    # desugar match → all_of over analyzed terms
    m = {"match": {"query": "A b", "ordered": True, "max_gaps": 1,
                   "filter": {"before": {"match": {"query": "z"}}}}}
    got = iv.desugar(m, lambda q: q.lower().split())
    assert got["all_of"]["intervals"] == [{"term": "a"}, {"term": "b"}]
    assert got["all_of"]["max_gaps"] == 1
    assert got["all_of"]["filter"]["before"]["all_of"]["intervals"] == [
        {"term": "z"}
    ]
    # prefix → any_of of expansions
    p = {"all_of": {"intervals": [
        {"prefix": {"prefix": "im", "max_expansions": 2}},
        {"term": "z"},
    ], "ordered": True}}
    got = iv.rewrite_multi(
        p, lambda spec, m_: [spec["prefix"] + "a", spec["prefix"] + "b"][:m_]
    )
    assert got["all_of"]["intervals"][0] == {
        "any_of": {"intervals": [{"term": "ima"}, {"term": "imb"}]}
    }
    # wildcard / fuzzy / regexp rules route through the same dispatcher
    w = {"wildcard": {"pattern": "s?a*", "max_expansions": 7}}
    seen = []
    iv.rewrite_multi(w, lambda spec, m_: seen.append((spec, m_)) or ["x"])
    f = {"fuzzy": {"term": "jion", "fuzziness": 2}}
    iv.rewrite_multi(f, lambda spec, m_: seen.append((spec, m_)) or ["x"])
    r = {"regexp": {"pattern": "(a|b).*"}}
    iv.rewrite_multi(r, lambda spec, m_: seen.append((spec, m_)) or ["x"])
    assert seen == [
        ({"wildcard": "s?a*"}, 7),
        ({"fuzzy": "jion", "fuzziness": 2, "prefix_length": 0}, 50),
        ({"regexp": "(a|b).*"}, 50),
    ]


def test_kernel_matches_brute_force_randomized():
    rng = random.Random(42)
    terms = ["a", "b", "c", "d"]

    def rand_tree(depth):
        r = rng.random()
        if depth >= 2 or r < 0.35:
            return {"term": rng.choice(terms)}
        kids = [rand_tree(depth + 1) for _ in range(rng.randint(2, 3))]
        node: dict
        if r < 0.55:
            node = {"any_of": {"intervals": kids}}
        else:
            node = {"all_of": {"intervals": kids,
                               "ordered": rng.random() < 0.5,
                               "max_gaps": rng.choice([-1, 0, 1, 3])}}
        if rng.random() < 0.4:
            rel = rng.choice(list(iv._FILTER_KEYS))
            node[next(iter(node))]["filter"] = {rel: rand_tree(depth + 1)}
        return node

    for trial in range(200):
        tree = rand_tree(0)
        doc_pos = {}
        for t in terms:
            per = {}
            for d in range(3):
                ps = sorted(rng.sample(range(12), rng.randint(0, 4)))
                if ps:
                    per[d] = ps
            if per:
                doc_pos[t] = per
        st = _streams(doc_pos)
        gd, gs, ge = iv.eval_intervals(tree, st)
        got = {}
        for d, s, e in zip(gd.tolist(), gs.tolist(), ge.tolist()):
            got.setdefault(d, []).append((s, e))
        for d in range(3):
            pos_of = {t: doc_pos.get(t, {}).get(d, []) for t in terms}
            want = _naive_eval(tree, pos_of)
            assert got.get(d, []) == want, (trial, tree, d, pos_of)


# ----------------------------------------------------------- engine tier


INTERVAL_QUERIES = [
    {"match": {"query": "return data", "ordered": True, "max_gaps": 0}},
    {"match": {"query": "def merge", "ordered": True, "max_gaps": 3}},
    {"match": {"query": "merge segment block", "ordered": False,
               "max_gaps": 6}},
    {"all_of": {"intervals": [
        {"term": "def"},
        {"any_of": {"intervals": [{"term": "merge"}, {"term": "data"}]}},
    ], "ordered": True, "max_gaps": 4}},
    {"match": {"query": "the data", "ordered": True, "max_gaps": 5,
               "filter": {"not_containing": {"term": "def"}}}},
    {"all_of": {"intervals": [{"term": "data"}],
                "ordered": True,
                "filter": {"contained_by": {"match": {
                    "query": "def return", "ordered": True,
                    "max_gaps": 10}}}}},
    {"all_of": {"intervals": [
        {"prefix": {"prefix": "im", "max_expansions": 50}},
        {"term": "data"},
    ], "ordered": True, "max_gaps": 4}},
    # wildcard / fuzzy multi-term rules (ES intervals wrappers)
    {"all_of": {"intervals": [
        {"wildcard": {"pattern": "i?p*", "max_expansions": 50}},
        {"term": "data"},
    ], "ordered": True, "max_gaps": 6}},
    {"all_of": {"intervals": [
        {"fuzzy": {"term": "dada", "fuzziness": 2}},
        {"term": "def"},
    ], "ordered": False, "max_gaps": 8}},
]


@pytest.fixture(scope="module")
def pos_index(small_corpus, tmp_path_factory):
    idx = tmp_path_factory.mktemp("ividx") / "idx"
    return build_index(
        small_corpus, idx,
        IndexConfig(partition_target_docs=50, shard_target_docs=100,
                    store_positions=True),
    )


def _texts(small_corpus):
    texts = []
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        texts.extend(
            pq.read_table(f, columns=["content"]).column("content").to_pylist()
        )
    return texts


def test_engine_intervals_match_brute_force(pos_index, small_corpus):
    texts = _texts(small_corpus)
    m = pos_index.manifest
    dl = (
        pq.read_table(pos_index.index_dir / "docmeta",
                      columns=["doc_id", "dl"])
        .sort_by("doc_id").column("dl").to_numpy()
    )
    eng = QueryEngine(pos_index.index_dir, num_actors=2)
    params = BM25Params()

    def analyze(q):
        return clip_tokens(code_tokens(q), m.min_token_len, m.max_token_len)

    try:
        for raw in INTERVAL_QUERIES:
            tree = iv.desugar(raw, analyze)
            tree = iv.rewrite_multi(tree, eng._expand_span_multi)
            oracle = {}
            for d, text in enumerate(texts):
                toks = analyze(text)
                pos_of = {}
                for i, t in enumerate(toks):
                    pos_of.setdefault(t, []).append(i)
                n_min = len(_naive_eval(tree, pos_of))
                if n_min:
                    oracle[d] = n_min
            got = dict(eng.search_intervals(raw, k=1000))
            assert set(got) == set(oracle), raw
            if not oracle:
                continue
            leaves = iv.leaf_terms(tree)
            idf = eng.idfs(sorted(set(leaves)))
            idf_sum = sum(idf[t] for t in leaves)
            avgdl = pos_index.stats.avgdl
            for d, pf in oracle.items():
                expect = (
                    idf_sum * pf * (params.k1 + 1.0)
                    / (pf + params.k1
                       * (1.0 - params.b + params.b * dl[d] / avgdl))
                )
                assert abs(got[d] - expect) < 1e-9, (raw, d)
        # exact ordered match with max_gaps=0 ≡ match_phrase
        got = eng.search_intervals(INTERVAL_QUERIES[0], k=1000)
        want = eng.search_phrase("return data", k=1000)
        assert got == want
    finally:
        eng.shutdown()


def test_engine_intervals_empty_and_absent(pos_index):
    eng = QueryEngine(pos_index.index_dir, num_actors=1)
    try:
        assert eng.search_intervals(
            {"match": {"query": "zzqqnotaterm data", "ordered": True}},
            k=5) == []
        assert eng.search_intervals(
            {"prefix": {"prefix": "zzqqnope", "max_expansions": 5}},
            k=5) == []
    finally:
        eng.shutdown()


def test_global_intervals_match_doc_engine(pos_index, tmp_path):
    from elasticsearch_assets_ray.index.global_merge import (
        merge_global_postings,
    )
    from elasticsearch_assets_ray.search.term_engine import (
        TermPartitionedEngine,
    )

    out = tmp_path / "global_iv"
    merge_global_postings(pos_index.index_dir, out, n_salts=3, n_buckets=4,
                          store_norms=True)
    geng = TermPartitionedEngine(out, num_actors=2)
    gated = TermPartitionedEngine(out, num_actors=2)
    gated.CACHE_MAX_POSTINGS = 0
    gated.PHRASE_GATE_FRAC = 10.0
    deng = QueryEngine(pos_index.index_dir, num_actors=2)
    try:
        for raw in INTERVAL_QUERIES:
            want = deng.search_intervals(raw, k=1000)
            for eng in (geng, gated):
                got = eng.search_intervals(raw, k=1000)
                assert [d for d, _ in got] == [d for d, _ in want], raw
                for (_, s1), (_, s2) in zip(got, want):
                    assert abs(s1 - s2) < 1e-9, raw
    finally:
        geng.shutdown()
        gated.shutdown()
        deng.shutdown()
