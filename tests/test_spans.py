"""Lucene span queries (span_term / span_or / span_near / span_first /
span_not / span_multi) — kernel unit tests, brute-force parity on the
doc-partitioned engine, and doc↔term engine agreement.

The reference passes span queries through to Elasticsearch untranslated
(lucene passthrough); ``search/spans.py`` documents the exact semantics
this repo serves (tf = distinct top-level match starts; unordered-near
output spans are minimal-per-start).  The naive evaluator here is an
INDEPENDENT formulation (tuple enumeration, no DP, no sweep).
"""

import pathlib

import numpy as np
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.analysis.tokenizer import clip_tokens, code_tokens
from elasticsearch_assets_ray.config import BM25Params, IndexConfig
from elasticsearch_assets_ray.index.build import build_index
from elasticsearch_assets_ray.search.engine import QueryEngine
from elasticsearch_assets_ray.search import spans as sp


# ---------------------------------------------------------------- kernel


def _streams(doc_pos: dict[str, dict[int, list[int]]]):
    """term -> {doc: positions} into kernel streams."""
    out = {}
    for t, per_doc in doc_pos.items():
        docs, pos = [], []
        for d in sorted(per_doc):
            for p in sorted(per_doc[d]):
                docs.append(d)
                pos.append(p)
        out[t] = (np.array(docs, np.int64), np.array(pos, np.int64))
    return out


def test_kernel_term_or_first():
    st = _streams({
        "a": {0: [1, 5], 2: [0]},
        "b": {0: [3], 1: [7]},
    })
    d, s, e = sp.eval_spans({"span_term": "a"}, st)
    assert d.tolist() == [0, 0, 2] and s.tolist() == [1, 5, 0]
    assert (e - s == 1).all()
    d, s, e = sp.eval_spans(
        {"span_or": [{"span_term": "a"}, {"span_term": "b"}]}, st
    )
    assert list(zip(d.tolist(), s.tolist())) == [
        (0, 1), (0, 3), (0, 5), (1, 7), (2, 0)
    ]
    d, s, e = sp.eval_spans(
        {"span_first": {"match": {"span_term": "a"}, "end": 2}}, st
    )
    assert list(zip(d.tolist(), s.tolist())) == [(0, 1), (2, 0)]


def test_kernel_near_ordered_gap_budget():
    st = _streams({"a": {0: [0, 10]}, "b": {0: [2, 11]}, "c": {0: [4, 12]}})
    tree = {"span_near": {"clauses": [
        {"span_term": "a"}, {"span_term": "b"}, {"span_term": "c"}],
        "slop": 2, "in_order": True}}
    d, s, e = sp.eval_spans(tree, st)
    # chains: 0→2→4 (gaps 1+1=2 ok), 10→11→12 (gaps 0 ok), 0→2→12 (gap
    # 1+9 no), 0→11→12 (10+0 no) ...
    assert list(zip(s.tolist(), e.tolist())) == [(0, 5), (10, 13)]
    tree["span_near"]["slop"] = 1
    d, s, e = sp.eval_spans(tree, st)
    assert list(zip(s.tolist(), e.tolist())) == [(10, 13)]


def test_kernel_near_ordered_requires_non_overlap():
    # b at the same position as a: ordered near needs end_i <= start_{i+1}
    st = _streams({"a": {0: [4]}, "b": {0: [4]}})
    tree = {"span_near": {"clauses": [{"span_term": "a"}, {"span_term": "b"}],
                          "slop": 10, "in_order": True}}
    d, _s, _e = sp.eval_spans(tree, st)
    assert len(d) == 0


def test_kernel_near_unordered_window():
    st = _streams({"a": {0: [5]}, "b": {0: [2, 9]}})
    tree = {"span_near": {"clauses": [{"span_term": "a"}, {"span_term": "b"}],
                          "slop": 2, "in_order": False}}
    d, s, e = sp.eval_spans(tree, st)
    # windows: start 2 → minimal [2,5] width 4 - 2 = 2 ok; start 5 →
    # minimal [5,9] width 5 - 2 = 3 > 2 no; start 9 → nothing after
    assert list(zip(s.tolist(), e.tolist())) == [(2, 6)]
    tree["span_near"]["slop"] = 3
    d, s, e = sp.eval_spans(tree, st)
    assert list(zip(s.tolist(), e.tolist())) == [(2, 6), (5, 10)]


def test_kernel_near_unordered_rejects_non_unit():
    st = _streams({"a": {0: [0]}, "b": {0: [1]}, "c": {0: [3]}})
    inner = {"span_near": {"clauses": [{"span_term": "a"}, {"span_term": "b"}],
                           "slop": 0, "in_order": True}}
    tree = {"span_near": {"clauses": [inner, {"span_term": "c"}],
                          "slop": 5, "in_order": False}}
    with pytest.raises(ValueError, match="unit-length"):
        sp.eval_spans(tree, st)


def test_kernel_not_pre_post():
    st = _streams({"a": {0: [2, 8]}, "x": {0: [4]}})
    base = {"span_not": {"include": {"span_term": "a"},
                         "exclude": {"span_term": "x"}, "pre": 0, "post": 0}}
    d, s, _ = sp.eval_spans(base, st)
    assert s.tolist() == [2, 8]  # x at 4 overlaps neither unit span
    wide = {"span_not": {"include": {"span_term": "a"},
                         "exclude": {"span_term": "x"}, "pre": 0, "post": 2}}
    # post=2: exclude kills include when excl.start < incl.end + 2 →
    # a@2 (end 3): 4 < 5 and 5 > 2 → killed; a@8: 4 < 11? yes, but
    # excl.end 5 > 8 - 0? no → survives
    d, s, _ = sp.eval_spans(wide, st)
    assert s.tolist() == [8]
    pre = {"span_not": {"include": {"span_term": "a"},
                        "exclude": {"span_term": "x"}, "pre": 5, "post": 0}}
    # pre=5: a@8: excl.end 5 > 8-5=3 and excl.start 4 < 9 → killed
    d, s, _ = sp.eval_spans(pre, st)
    assert s.tolist() == [2]


def test_kernel_containing_within():
    # big = ordered near a..b (slop 3); little = x
    st = _streams({"a": {0: [0, 10]}, "b": {0: [3, 12]}, "x": {0: [2, 20]}})
    big = {"span_near": {"clauses": [{"span_term": "a"}, {"span_term": "b"}],
                         "slop": 3, "in_order": True}}
    d, s, e = sp.eval_spans(big, st)
    assert list(zip(s.tolist(), e.tolist())) == [(0, 4), (10, 13)]
    # containing: only [0,4) encloses x@2; [10,13) holds no x
    d, s, e = sp.eval_spans(
        {"span_containing": {"big": big, "little": {"span_term": "x"}}}, st)
    assert list(zip(s.tolist(), e.tolist())) == [(0, 4)]
    # within: x@2 sits inside [0,4); x@20 inside nothing
    d, s, e = sp.eval_spans(
        {"span_within": {"big": big, "little": {"span_term": "x"}}}, st)
    assert list(zip(s.tolist(), e.tolist())) == [(2, 3)]
    # both sides are required + scoring constituents
    tree = {"span_containing": {"big": big, "little": {"span_term": "x"}}}
    assert sp.leaf_terms(tree) == ["a", "b", "x"]
    assert sp.all_terms(tree) == {"a", "b", "x"}
    assert sp.requirement_sets(tree) == [
        frozenset({"a"}), frozenset({"b"}), frozenset({"x"})
    ]


def test_kernel_requirements_and_leaves():
    tree = {"span_near": {"clauses": [
        {"span_term": "a"},
        {"span_or": [{"span_term": "b"}, {"span_term": "c"}]},
        {"span_not": {"include": {"span_term": "d"},
                      "exclude": {"span_term": "x"}, "pre": 0, "post": 0}},
    ], "slop": 1, "in_order": True}}
    assert sp.leaf_terms(tree) == ["a", "b", "c", "d"]
    assert sp.all_terms(tree) == {"a", "b", "c", "d", "x"}
    assert sp.requirement_sets(tree) == [
        frozenset({"a"}), frozenset({"b", "c"}), frozenset({"d"})
    ]


def test_rewrite_multi():
    tree = {"span_near": {"clauses": [
        {"span_multi": {"prefix": "im", "max_expansions": 3}},
        {"span_term": "z"},
    ], "slop": 0, "in_order": True}}
    got = sp.rewrite_multi(
        tree, lambda spec, m: [spec["prefix"] + "a", spec["prefix"] + "b"][:m]
    )
    assert got["span_near"]["clauses"][0] == {
        "span_or": [{"span_term": "ima"}, {"span_term": "imb"}]
    }
    # wildcard / regexp / fuzzy wrappers dispatch through the same hook
    from elasticsearch_assets_ray.search.spans import expand_multi_spec

    calls = []
    fns = dict(
        prefix_fn=lambda p, m: calls.append(("p", p, m)) or ["x"],
        wildcard_fn=lambda p, m: calls.append(("w", p, m)) or ["x"],
        regexp_fn=lambda p, m: calls.append(("r", p, m)) or ["x"],
        fuzzy_fn=lambda t, f, pl, m: calls.append(("f", t, f, pl, m)) or ["x"],
    )
    expand_multi_spec({"wildcard": "a*b"}, 5, **fns)
    expand_multi_spec({"regexp": "a.b"}, 5, **fns)
    expand_multi_spec({"fuzzy": "abc", "fuzziness": 2}, 5, **fns)
    assert calls == [("w", "a*b", 5), ("r", "a.b", 5), ("f", "abc", 2, 0, 5)]
    with pytest.raises(ValueError, match="span_multi needs"):
        expand_multi_spec({"nope": 1}, 5, **fns)


# ------------------------------------------------------- naive evaluator


def _naive_spans(node, pos_of: dict[str, list[int]]):
    """Independent per-doc reference: returns a sorted set of (start,
    end) spans.  Tuple enumeration (exponential, test-scale only)."""
    if "span_term" in node:
        return sorted((p, p + 1) for p in pos_of.get(node["span_term"], []))
    if "span_or" in node:
        out = set()
        for c in node["span_or"]:
            out.update(_naive_spans(c, pos_of))
        return sorted(out)
    if "span_first" in node:
        m = _naive_spans(node["span_first"]["match"], pos_of)
        return [se for se in m if se[1] <= node["span_first"]["end"]]
    for kind in ("span_containing", "span_within"):
        if kind in node:
            spec = node[kind]
            big = _naive_spans(spec["big"], pos_of)
            little = _naive_spans(spec["little"], pos_of)
            if kind == "span_containing":
                return [(s, e) for s, e in big
                        if any(s <= s2 and e2 <= e for s2, e2 in little)]
            return [(s, e) for s, e in little
                    if any(s2 <= s and e <= e2 for s2, e2 in big)]
    if "span_not" in node:
        spec = node["span_not"]
        inc = _naive_spans(spec["include"], pos_of)
        exc = _naive_spans(spec["exclude"], pos_of)
        pre, post = spec.get("pre", 0), spec.get("post", 0)
        return [
            (s, e) for s, e in inc
            if not any(s2 < e + post and e2 > s - pre for s2, e2 in exc)
        ]
    spec = node["span_near"]
    children = [_naive_spans(c, pos_of) for c in spec["clauses"]]
    if any(not c for c in children):
        return []
    slop = spec.get("slop", 0)
    out = set()
    if spec.get("in_order", True):
        def rec(i, prev_end, gap, origin):
            if i == len(children):
                out.add((origin, prev_end))
                return
            for s, e in children[i]:
                if i == 0:
                    rec(1, e, 0, s)
                elif s >= prev_end and gap + (s - prev_end) <= slop:
                    rec(i + 1, e, gap + (s - prev_end), s if i == 0 else origin)
        rec(0, 0, 0, 0)
    else:
        import itertools

        n = len(children)
        best: dict[int, int] = {}
        for tup in itertools.product(*children):
            ps = [s for s, _ in tup]
            if len(set(ps)) != n:
                continue
            mn, mx = min(ps), max(ps)
            if (mx - mn + 1) - n <= slop:
                if mn not in best or mx + 1 < best[mn]:
                    best[mn] = mx + 1
        out = set(best.items())
    return sorted(out)


def _naive_freqs(tree, texts, m):
    """doc -> tf (distinct top-level starts) over analyzed texts."""
    freqs = {}
    for d, text in enumerate(texts):
        toks = clip_tokens(code_tokens(text), m.min_token_len,
                           m.max_token_len)
        pos_of: dict[str, list[int]] = {}
        for i, t in enumerate(toks):
            pos_of.setdefault(t, []).append(i)
        spans_ = _naive_spans(tree, pos_of)
        starts = {s for s, _ in spans_}
        if starts:
            freqs[d] = len(starts)
    return freqs


TREES = [
    # 2-term exact near == phrase semantics
    {"span_near": {"clauses": [{"span_term": "return"},
                               {"span_term": "data"}],
                   "slop": 0, "in_order": True}},
    # or-group inside ordered near with budget
    {"span_near": {"clauses": [
        {"span_term": "def"},
        {"span_or": [{"span_term": "merge"}, {"span_term": "data"}]},
    ], "slop": 2, "in_order": True}},
    # unordered near
    {"span_near": {"clauses": [{"span_term": "merge"},
                               {"span_term": "segment"},
                               {"span_term": "block"}],
                   "slop": 4, "in_order": False}},
    # span_not with pre/post over a nested near
    {"span_not": {
        "include": {"span_near": {"clauses": [{"span_term": "the"},
                                              {"span_term": "the"}],
                                  "slop": 1, "in_order": True}},
        "exclude": {"span_term": "def"}, "pre": 1, "post": 1}},
    # span_first over an or
    {"span_first": {"match": {"span_or": [{"span_term": "import"},
                                          {"span_term": "def"}]},
                    "end": 3}},
    # nested ordered near (non-unit child)
    {"span_near": {"clauses": [
        {"span_near": {"clauses": [{"span_term": "def"},
                                   {"span_term": "merge"}],
                       "slop": 1, "in_order": True}},
        {"span_term": "data"},
    ], "slop": 5, "in_order": True}},
    # or-group with an absent member still matches on the live one
    {"span_near": {"clauses": [
        {"span_or": [{"span_term": "zzqqnotaterm"}, {"span_term": "merge"}]},
        {"span_term": "data"},
    ], "slop": 3, "in_order": True}},
    # containing: near windows that enclose a unit span
    {"span_containing": {
        "big": {"span_near": {"clauses": [{"span_term": "the"},
                                          {"span_term": "data"}],
                              "slop": 4, "in_order": True}},
        "little": {"span_or": [{"span_term": "merge"},
                               {"span_term": "segment"}]}}},
    # within: unit spans enclosed by a near window
    {"span_within": {
        "big": {"span_near": {"clauses": [{"span_term": "def"},
                                          {"span_term": "return"}],
                              "slop": 8, "in_order": True}},
        "little": {"span_term": "data"}}},
]


@pytest.fixture(scope="module")
def pos_index(small_corpus, tmp_path_factory):
    idx = tmp_path_factory.mktemp("spanidx") / "idx"
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


def test_spans_match_brute_force_and_bm25(pos_index, small_corpus):
    texts = _texts(small_corpus)
    m = pos_index.manifest
    dl = (
        pq.read_table(pos_index.index_dir / "docmeta",
                      columns=["doc_id", "dl"])
        .sort_by("doc_id").column("dl").to_numpy()
    )
    eng = QueryEngine(pos_index.index_dir, num_actors=2)
    params = BM25Params()
    try:
        for tree in TREES:
            oracle = _naive_freqs(tree, texts, m)
            got = dict(eng.search_spans(tree, k=1000))
            assert set(got) == set(oracle), tree
            if not oracle:
                continue
            leaves = sp.leaf_terms(tree)
            idf = eng.idfs(sorted(set(leaves)))
            idf_sum = sum(idf[t] for t in leaves)
            avgdl = pos_index.stats.avgdl
            for d, pf in oracle.items():
                expect = (
                    idf_sum * pf * (params.k1 + 1.0)
                    / (pf + params.k1
                       * (1.0 - params.b + params.b * dl[d] / avgdl))
                )
                assert abs(got[d] - expect) < 1e-9, (tree, d)
        # 2-term exact near ≡ match_phrase (same pf, same idf sum)
        got = eng.search_spans(TREES[0], k=1000)
        want = eng.search_phrase("return data", k=1000)
        assert got == want
        # span_multi: prefix expansion == explicit or of the expansions
        multi = {"span_near": {"clauses": [
            {"span_multi": {"prefix": "im", "max_expansions": 50}},
            {"span_term": "data"},
        ], "slop": 4, "in_order": True}}
        expanded = {"span_near": {"clauses": [
            {"span_or": [{"span_term": t}
                         for t in eng.expand_prefix("im", 50)]},
            {"span_term": "data"},
        ], "slop": 4, "in_order": True}}
        assert eng.search_spans(multi, k=100) == eng.search_spans(
            expanded, k=100
        )
    finally:
        eng.shutdown()


def test_spans_requires_positions(small_index):
    eng = QueryEngine(small_index.index_dir, num_actors=1)
    try:
        import ray

        with pytest.raises(ray.exceptions.RayTaskError,
                           match="store_positions"):
            eng.search_spans({"span_term": "def"}, k=5)
    finally:
        eng.shutdown()


def test_spans_absent_and_empty(pos_index):
    eng = QueryEngine(pos_index.index_dir, num_actors=1)
    try:
        assert eng.search_spans(
            {"span_near": {"clauses": [{"span_term": "zzqqnotaterm"},
                                       {"span_term": "def"}],
                           "slop": 1, "in_order": True}}, k=5) == []
        assert eng.search_spans(
            {"span_multi": {"prefix": "zzqqnope", "max_expansions": 10}},
            k=5) == []
    finally:
        eng.shutdown()


def test_global_spans_match_doc_engine(pos_index, tmp_path):
    """Span serving on the TERM-partitioned layout is rank+score
    identical to the shard-actor engine, on the plain AND the forced
    remote-gate (candidate-subset fetch) paths."""
    from elasticsearch_assets_ray.index.global_merge import (
        merge_global_postings,
    )
    from elasticsearch_assets_ray.search.term_engine import (
        TermPartitionedEngine,
    )

    out = tmp_path / "global_spans"
    merge_global_postings(pos_index.index_dir, out, n_salts=3, n_buckets=4,
                          store_norms=True)
    geng = TermPartitionedEngine(out, num_actors=2)
    gated = TermPartitionedEngine(out, num_actors=2)
    gated.CACHE_MAX_POSTINGS = 0
    gated.PHRASE_GATE_FRAC = 10.0
    deng = QueryEngine(pos_index.index_dir, num_actors=2)
    multi = {"span_near": {"clauses": [
        {"span_multi": {"prefix": "im", "max_expansions": 50}},
        {"span_term": "data"},
    ], "slop": 4, "in_order": True}}
    try:
        for tree in TREES + [multi]:
            want = deng.search_spans(tree, k=1000)
            for eng in (geng, gated):
                got = eng.search_spans(tree, k=1000)
                assert [d for d, _ in got] == [d for d, _ in want], tree
                for (_, s1), (_, s2) in zip(got, want):
                    assert abs(s1 - s2) < 1e-9, tree
    finally:
        geng.shutdown()
        gated.shutdown()
        deng.shutdown()


# ------------------------------------------------- span_field_masking


def test_resolve_masks_and_keys():
    tree = {"span_near": {"clauses": [
        {"span_term": "hash"},
        {"span_field_masking": {"query": {"span_term": "tabl"},
                                "query_field": "stem", "field": "text"}},
    ], "slop": 2, "in_order": True}}
    got = sp.resolve_masks(tree, "text")
    c0, c1 = got["span_near"]["clauses"]
    assert c0 == {"span_term": "hash"}
    assert c1 == {"span_term": sp.mask_key("stem", "tabl")}
    assert sp.split_mask_key(c1["span_term"]) == ("stem", "tabl")
    assert sp.split_mask_key("plain") == (None, "plain")
    # masking as a field other than the search field is rejected
    bad = {"span_field_masking": {"query": {"span_term": "x"},
                                  "query_field": "stem", "field": "other"}}
    with pytest.raises(ValueError, match="masks as"):
        sp.resolve_masks(bad, "text")
    # query_field == outer field degrades to a plain leaf
    same = sp.resolve_masks(
        {"span_field_masking": {"query": {"span_term": "x"},
                                "query_field": "text", "field": "text"}},
        "text")
    assert same == {"span_term": "x"}
    # unresolved masking nodes fail loud at rewrite time
    with pytest.raises(ValueError, match="resolve_masks"):
        sp.rewrite_multi(bad, lambda p, m: [])
    # span_multi specs carry their source field through the mask
    multi = sp.resolve_masks(
        {"span_field_masking": {
            "query": {"span_multi": {"prefix": "qu", "max_expansions": 5}},
            "query_field": "stem", "field": "text"}},
        "text")
    assert multi["span_multi"] == {"prefix": "qu", "max_expansions": 5,
                                   "field": "stem"}


MASK_TEXTS = [
    "merging tables with hash keys",          # stem: merg tabl with hash key
    "the merge table uses a hash key",
    "sorted values inside the table scan",
    "hash table merge hash table",
    "scan value scan value slow scan",
    "query rows query rowing",
]


@pytest.fixture(scope="module")
def mask_field_indexes(tmp_path_factory):
    """Aligned (simple, stem) field indexes over the same tiny corpus."""
    import pyarrow as pa

    root = tmp_path_factory.mktemp("maskidx")
    src = root / "docs.parquet"
    pq.write_table(
        pa.table({"doc_id": list(range(len(MASK_TEXTS))),
                  "text": MASK_TEXTS}),
        src,
    )
    dirs = {}
    for field, analyzer in (("text", "simple"), ("stem", "stem")):
        out = root / f"idx_{field}"
        build_index(
            src, out,
            IndexConfig(analyzer=analyzer, text_col="text", lang_col=None,
                        id_col="doc_id", meta_cols=(),
                        partition_target_docs=2,
                        shard_target_docs=4, store_positions=True),
        )
        dirs[field] = str(out)
    return dirs


MASK_TREES = [
    # stem 'tabl' covers 'table'/'tables' occurrences after 'hash'
    {"span_near": {"clauses": [
        {"span_term": "hash"},
        {"span_field_masking": {"query": {"span_term": "tabl"},
                                "query_field": "stem", "field": "text"}},
    ], "slop": 1, "in_order": True}},
    # masked or-group, unordered
    {"span_near": {"clauses": [
        {"span_field_masking": {
            "query": {"span_or": [{"span_term": "merg"},
                                  {"span_term": "sort"}]},
            "query_field": "stem", "field": "text"}},
        {"span_term": "hash"},
    ], "slop": 4, "in_order": False}},
    # span_not: masked include slot, text exclude
    {"span_not": {
        "include": {"span_near": {"clauses": [
            {"span_term": "scan"},
            {"span_field_masking": {"query": {"span_term": "valu"},
                                    "query_field": "stem",
                                    "field": "text"}},
        ], "slop": 0, "in_order": True}},
        "exclude": {"span_term": "slow"}, "pre": 1, "post": 1}},
    # span_multi expanding in the STEM dictionary
    {"span_near": {"clauses": [
        {"span_field_masking": {
            "query": {"span_multi": {"prefix": "ro", "max_expansions": 5}},
            "query_field": "stem", "field": "text"}},
        {"span_term": "query"},
    ], "slop": 2, "in_order": False}},
]


def _naive_masked_freqs(tree, texts):
    """doc -> tf over (simple, stem) token streams, via the naive span
    evaluator on field-qualified keys."""
    from elasticsearch_assets_ray.analysis.tokenizer import (
        simple_tokens,
        stem_tokens,
    )

    freqs = {}
    for d, text in enumerate(texts):
        pos_of: dict[str, list[int]] = {}
        for i, t in enumerate(simple_tokens(text)):
            pos_of.setdefault(t, []).append(i)
        for i, t in enumerate(stem_tokens(text)):
            pos_of.setdefault(sp.mask_key("stem", t), []).append(i)
        resolved = sp.resolve_masks(tree, "text")

        def expand(spec, mx):
            f = spec.get("field")
            prefix = spec["prefix"]
            terms = sorted(
                {t for t in pos_of
                 if sp.split_mask_key(t)[0] == f
                 and sp.split_mask_key(t)[1].startswith(prefix)}
            )[:mx]
            return terms

        resolved = sp.rewrite_multi(resolved, expand)
        spans_ = _naive_spans(resolved, pos_of)
        starts = {s for s, _ in spans_}
        if starts:
            freqs[d] = len(starts)
    return freqs


def test_masked_spans_doc_engine_vs_naive(mask_field_indexes):
    from elasticsearch_assets_ray.search.multifield import MultiFieldEngine

    eng = MultiFieldEngine(mask_field_indexes, num_actors=2)
    try:
        for tree in MASK_TREES:
            got = dict(eng.search_spans(tree, field="text", k=100))
            want = _naive_masked_freqs(tree, MASK_TEXTS)
            assert set(got) == set(want), tree
        # canary: a stem-only term on the TEXT field matches nothing —
        # proof streams really fetch from the sibling index
        naked = {"span_near": {"clauses": [
            {"span_term": "hash"}, {"span_term": "tabl"},
        ], "slop": 1, "in_order": True}}
        assert eng.search_spans(naked, field="text", k=100) == []
        assert dict(eng.search_spans(MASK_TREES[0], field="text", k=100))
    finally:
        eng.shutdown()


def test_masked_spans_term_engine_parity(mask_field_indexes, tmp_path):
    """Masked span serving from TWO term-partitioned layouts is
    rank+score identical to the multi-field shard engine, plain and
    forced-gated."""
    from elasticsearch_assets_ray.index.global_merge import (
        merge_global_postings,
    )
    from elasticsearch_assets_ray.search.multifield import MultiFieldEngine
    from elasticsearch_assets_ray.search.term_engine import (
        TermPartitionedEngine,
    )

    gdirs = {}
    for f, d in mask_field_indexes.items():
        out = tmp_path / f"glb_{f}"
        merge_global_postings(d, out, n_salts=2, n_buckets=4,
                              store_norms=True)
        gdirs[f] = out
    deng = MultiFieldEngine(mask_field_indexes, num_actors=2)
    geng = TermPartitionedEngine(gdirs["text"], num_actors=2)
    gstem = TermPartitionedEngine(gdirs["stem"], num_actors=1)
    gated = TermPartitionedEngine(gdirs["text"], num_actors=2)
    gated.CACHE_MAX_POSTINGS = 0
    gated.PHRASE_GATE_FRAC = 10.0
    try:
        for tree in MASK_TREES:
            want = deng.search_spans(tree, field="text", k=100)
            for eng in (geng, gated):
                got = eng.search_spans(
                    tree, k=100, mask_engines={"stem": gstem},
                    outer_field="text")
                assert [d for d, _ in got] == [d for d, _ in want], tree
                for (_, s1), (_, s2) in zip(got, want):
                    assert abs(s1 - s2) < 1e-9, tree
    finally:
        deng.shutdown()
        geng.shutdown()
        gstem.shutdown()
        gated.shutdown()


def test_span_multi_kinds_match_explicit_or(pos_index):
    """wildcard / regexp / fuzzy span_multi wrappers ≡ the explicit
    span_or of their deterministic global expansions, on both engines."""
    from elasticsearch_assets_ray.index.global_merge import (
        merge_global_postings,
    )
    from elasticsearch_assets_ray.search.term_engine import (
        TermPartitionedEngine,
    )
    import tempfile

    eng = QueryEngine(pos_index.index_dir, num_actors=2)
    gdir = tempfile.mkdtemp(prefix="spanmulti_glb_")
    merge_global_postings(pos_index.index_dir, gdir, n_salts=2,
                          n_buckets=4, store_norms=True)
    geng = TermPartitionedEngine(gdir, num_actors=2)
    specs = [
        ({"wildcard": "i?p*"}, eng.expand_wildcard("i?p*", 50)),
        ({"regexp": "(im|da).*"}, eng.expand_regexp("(im|da).*", 50)),
        ({"fuzzy": "dada", "fuzziness": 2},
         eng.expand_fuzzy_capped("dada", 2, 0, 50)),
    ]
    try:
        for spec, expansion in specs:
            assert expansion, spec  # fixture vocabulary must hit
            multi = {"span_near": {"clauses": [
                {"span_multi": {**spec, "max_expansions": 50}},
                {"span_term": "data"},
            ], "slop": 4, "in_order": True}}
            explicit = {"span_near": {"clauses": [
                {"span_or": [{"span_term": t} for t in expansion]},
                {"span_term": "data"},
            ], "slop": 4, "in_order": True}}
            want = eng.search_spans(explicit, k=100)
            assert eng.search_spans(multi, k=100) == want, spec
            got = geng.search_spans(multi, k=100)
            assert [d for d, _ in got] == [d for d, _ in want], spec
            for (_, s1), (_, s2) in zip(got, want):
                assert abs(s1 - s2) < 1e-9, spec
        # term engine expansions agree with the doc engine's
        assert geng.expand_wildcard("i?p*", 50) == eng.expand_wildcard(
            "i?p*", 50)
        assert geng.expand_regexp("(im|da).*", 50) == eng.expand_regexp(
            "(im|da).*", 50)
        assert geng.expand_fuzzy_capped("dada", 2, 0, 50) == (
            eng.expand_fuzzy_capped("dada", 2, 0, 50))
    finally:
        eng.shutdown()
        geng.shutdown()


def test_span_multi_masked_wildcard(mask_field_indexes):
    """A masked span_multi WILDCARD expands in the sibling field's
    dictionary (stem terms), on the multi-field engine."""
    from elasticsearch_assets_ray.search.multifield import MultiFieldEngine

    eng = MultiFieldEngine(mask_field_indexes, num_actors=2)
    tree = {"span_near": {"clauses": [
        {"span_field_masking": {
            "query": {"span_multi": {"wildcard": "tab*",
                                     "max_expansions": 5}},
            "query_field": "stem", "field": "text"}},
        {"span_term": "hash"},
    ], "slop": 4, "in_order": False}}
    try:
        got = dict(eng.search_spans(tree, field="text", k=100))
        want = _naive_masked_freqs(
            {"span_near": {"clauses": [
                {"span_field_masking": {
                    "query": {"span_term": "tabl"},
                    "query_field": "stem", "field": "text"}},
                {"span_term": "hash"},
            ], "slop": 4, "in_order": False}}, MASK_TEXTS)
        assert set(got) == set(want)
        assert got  # non-degenerate
    finally:
        eng.shutdown()


def test_range_expand_and_span_multi_range(pos_index):
    """range_expand_sorted bound semantics + span_multi range wrapper ≡
    explicit or, both engines."""
    import tempfile

    from elasticsearch_assets_ray.index.global_merge import (
        merge_global_postings,
    )
    from elasticsearch_assets_ray.search.engine import range_expand_sorted
    from elasticsearch_assets_ray.search.term_engine import (
        TermPartitionedEngine,
    )

    tl = ["aa", "ab", "b", "ba", "c"]
    assert range_expand_sorted(tl, gte="ab", lte="ba") == ["ab", "b", "ba"]
    assert range_expand_sorted(tl, gt="ab", lt="ba") == ["b"]
    assert range_expand_sorted(tl, gte="ab") == ["ab", "b", "ba", "c"]
    assert range_expand_sorted(tl, lt="b") == ["aa", "ab"]
    assert range_expand_sorted(tl, gte="ab", lte="ba", cap=2) == ["ab", "b"]

    eng = QueryEngine(pos_index.index_dir, num_actors=2)
    gdir = tempfile.mkdtemp(prefix="spanrange_glb_")
    merge_global_postings(pos_index.index_dir, gdir, n_salts=2,
                          n_buckets=4, store_norms=True)
    geng = TermPartitionedEngine(gdir, num_actors=2)
    try:
        expansion = eng.expand_range_capped(gte="da", lte="df",
                                            max_expansions=50)
        assert expansion
        assert geng.expand_range_capped(gte="da", lte="df",
                                        max_expansions=50) == expansion
        multi = {"span_near": {"clauses": [
            {"span_multi": {"range": {"gte": "da", "lte": "df"},
                            "max_expansions": 50}},
            {"span_term": "merge"},
        ], "slop": 6, "in_order": False}}
        explicit = {"span_near": {"clauses": [
            {"span_or": [{"span_term": t} for t in expansion]},
            {"span_term": "merge"},
        ], "slop": 6, "in_order": False}}
        want = eng.search_spans(explicit, k=100)
        assert eng.search_spans(multi, k=100) == want
        got = geng.search_spans(multi, k=100)
        assert [d for d, _ in got] == [d for d, _ in want]
    finally:
        eng.shutdown()
        geng.shutdown()
