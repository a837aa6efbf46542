"""ES JSON query DSL translation (search/dsl.py) + the wrapper query.

Tree-shape tests are pure (no Ray); the engine tests compare
``search_dsl`` hits between BOTH serving engines and — for the
qs-expressible cases — against ``search_query_string``, whose tree
evaluation is already brute-force-verified in test_qs.py."""
from __future__ import annotations

import pathlib

import pytest

from elasticsearch_assets_ray.search.dsl import (
    DslError,
    dsl_to_tree,
    search_dsl,
    wrap_query,
)


def _an(s):
    return [t for t in s.lower().replace(",", " ").split() if t]


def T(q, **kw):
    kw.setdefault("default_field", "content")
    return dsl_to_tree(q, _an, **kw)


def test_leaf_shapes():
    assert T({"match": {"content": "Merge"}}) == ("term", "merge")
    assert T({"match": {"content": "merge data"}}) == (
        "or", ("term", "merge"), ("term", "data"))
    assert T({"match": {"content": {"query": "merge data",
                                    "operator": "and"}}}) == (
        "and", ("term", "merge"), ("term", "data"))
    # match on a non-default field = docmeta equality (keyword)
    assert T({"match": {"lang": "python"}}) == ("metaterm", "lang", "python")
    # term is NOT analyzed beyond lowercasing on the text field
    assert T({"term": {"content": "MERGE"}}) == ("term", "merge")
    assert T({"term": {"lang": {"value": "go", "boost": 2.0}}}) == (
        "boost", ("metaterm", "lang", "go"), 2.0)
    assert T({"terms": {"lang": ["go", "python"]}}) == (
        "or", ("metaterm", "lang", "go"), ("metaterm", "lang", "python"))
    assert T({"match_phrase": {"content": "merge data"}}) == (
        "phrase", ["merge", "data"], 0)
    assert T({"match_phrase": {"content": {"query": "merge data",
                                           "slop": 2}}}) == (
        "phrase", ["merge", "data"], 2)
    # single-token zero-slop phrase lowers to a term (the qs convention)
    assert T({"match_phrase": {"content": "merge"}}) == ("term", "merge")
    assert T({"range": {"n_chars": {"gte": 100, "lt": 300}}}) == (
        "metarange", "n_chars", "100", "300", True, False)
    assert T({"exists": {"field": "lang"}}) == ("metaexists", "lang")
    assert T({"prefix": {"content": "mer"}}) == ("prefix", "mer")
    assert T({"wildcard": {"content": "me*"}}) == ("prefix", "me")
    assert T({"wildcard": {"content": "m?rge"}}) == ("wildcard", "m?rge")
    assert T({"fuzzy": {"content": {"value": "mrge", "fuzziness": 1}}}) == (
        "fuzzy", "mrge", 1)
    assert T({"fuzzy": {"content": "mrge"}}) == ("fuzzy", "mrge", 2)


def test_bool_shapes():
    m = ("term", "merge")
    d = ("term", "data")
    lang = ("metaterm", "lang", "go")
    # pure should = required OR
    assert T({"bool": {"should": [{"match": {"content": "merge"}},
                                  {"match": {"content": "data"}}]}}) == (
        "or", m, d)
    # must + should: should becomes an OPTIONAL score boost
    got = T({"bool": {"must": [{"match": {"content": "merge"}}],
                      "should": [{"match": {"content": "data"}}]}})
    assert got == ("filter", ("or", m, d), m)
    # must + should with minimum_should_match=1: both required
    got = T({"bool": {"must": [{"match": {"content": "merge"}}],
                      "should": [{"match": {"content": "data"}}],
                      "minimum_should_match": 1}})
    assert got == ("filter", ("filter", ("or", m, d), m), d)
    # filter context gates without scoring
    got = T({"bool": {"must": [{"match": {"content": "merge"}}],
                      "filter": [{"term": {"lang": "go"}}]}})
    assert got == ("filter", m, lang)
    # filter-only: all filter docs at score 0
    assert T({"bool": {"filter": [{"term": {"lang": "go"}}]}}) == (
        "constscore", lang, 0.0)
    # filter + optional should
    got = T({"bool": {"filter": [{"term": {"lang": "go"}}],
                      "should": [{"match": {"content": "data"}}]}})
    assert got == ("filter", ("or", ("constscore", lang, 0.0), d), lang)
    # must_not
    got = T({"bool": {"must": [{"match": {"content": "merge"}}],
                      "must_not": [{"match": {"content": "data"}}]}})
    assert got == ("andnot", m, d)
    # must_not with no positive clause matches nothing
    assert T({"bool": {"must_not": [{"match": {"content": "x"}}]}}) is None


def test_compound_shapes():
    m = ("term", "merge")
    d = ("term", "data")
    assert T({"dis_max": {"queries": [{"match": {"content": "merge"}},
                                      {"match": {"content": "data"}}],
                          "tie_breaker": 0.3}}) == ("dismax", 0.3, (m, d))
    assert T({"boosting": {"positive": {"match": {"content": "merge"}},
                           "negative": {"match": {"content": "data"}},
                           "negative_boost": 0.2}}) == (
        "boosting", m, d, 0.2)
    assert T({"constant_score": {"filter": {"match": {"content": "merge"}},
                                 "boost": 2.5}}) == ("constscore", m, 2.5)
    qs = T({"query_string": {"query": "merge AND data"}})
    assert qs == ("and", m, d)
    sqs = T({"simple_query_string": {"query": "merge + data"}})
    assert sqs == ("and", m, d)


def test_wrapper_roundtrip_and_nesting():
    inner = {"bool": {"must": [{"match": {"content": "merge data"}}],
                      "filter": [{"range": {"n_chars": {"gte": 10}}}]}}
    assert T(wrap_query(inner)) == T(inner)
    # wrapper inside a bool inside a wrapper
    nested = wrap_query({"bool": {"must": [wrap_query(inner)],
                                  "must_not": [
                                      {"term": {"lang": "zz"}}]}})
    got = T(nested)
    assert got == ("andnot", T(inner), ("metaterm", "lang", "zz"))


def test_errors_and_lenient_cases():
    assert T({"match_all": {}}) == (
        "constscore", ("metaexists", "doc_id"), 1.0)
    assert T({"match_all": {"boost": 0.5}}) == (
        "constscore", ("metaexists", "doc_id"), 0.5)
    assert T({"match_none": {}}) is None
    with pytest.raises(DslError):
        T({"regexp": {"content": "a.*b"}})
    with pytest.raises(DslError):
        T({"match": {"a": "x", "b": "y"}})
    # "75%" of one should truncates to 0 required (Lucene float32
    # percentage) — the clause stays, optional
    assert T({"bool": {"minimum_should_match": "75%",
                       "should": [{"match": {"content": "x"}}]}}) == (
        "term", "x")
    # a string integer is a valid spec; above the clause count →
    # MatchNoDocsQuery (None), not an error
    assert T({"bool": {"minimum_should_match": "75",
                       "should": [{"match": {"content": "x"}}]}}) is None
    with pytest.raises(DslError):
        T({"wrapper": {"query": "!!! not base64 !!!"}})
    with pytest.raises(DslError):
        T({"range": {"content": {"gte": 1}}})
    with pytest.raises(DslError):
        T({"term": {"nofield": "x"}}, meta_fields={"lang"})
    # analyzed-away queries match nothing, not an error
    assert T({"match": {"content": "   "}}) is None
    assert T({"dis_max": {"queries": []}}) is None


@pytest.fixture(scope="module")
def dsl_index(small_corpus, tmp_path_factory):
    from elasticsearch_assets_ray.config import IndexConfig
    from elasticsearch_assets_ray.index.build import build_index

    idx = tmp_path_factory.mktemp("dslidx") / "idx"
    return build_index(
        small_corpus, idx,
        IndexConfig(partition_target_docs=50, shard_target_docs=100,
                    store_positions=True,
                    meta_cols=("repo", "path", "lang", "n_chars"),
                    derived_meta=("n_chars=len_of:content",)),
    )


# (DSL query, equivalent query_string or None) — the qs equivalents
# pin semantics to the brute-force-verified string grammar
DSL_CASES = [
    ({"match": {"content": "merge data"}}, "merge data"),
    ({"match": {"content": {"query": "merge data", "operator": "and"}}},
     "merge AND data"),
    ({"match_phrase": {"content": "def merge"}}, '"def merge"'),
    ({"term": {"lang": "python"}}, "lang:python"),
    ({"range": {"n_chars": {"gte": 400, "lte": 900}}},
     "n_chars:[400 TO 900]"),
    ({"bool": {"must": [{"match": {"content": "merge"}}],
               "must_not": [{"match": {"content": "import"}}]}},
     "merge NOT import"),
    ({"constant_score": {"filter": {"match": {"content": "merge"}},
                         "boost": 2.0}}, None),
    ({"bool": {"must": [{"match": {"content": "merge"}}],
               "filter": [{"term": {"lang": "python"}}]}}, None),
    ({"bool": {"filter": [{"range": {"n_chars": {"gte": 400}}}],
               "should": [{"match": {"content": "merge"}}]}}, None),
    ({"dis_max": {"queries": [{"match": {"content": "merge"}},
                              {"match": {"content": "data"}}],
                  "tie_breaker": 0.5}}, None),
    ({"fuzzy": {"content": {"value": "mergi", "fuzziness": 1}}},
     "mergi~1"),
    ({"prefix": {"content": "mer"}}, "mer*"),
]


def test_search_dsl_engines_agree(dsl_index, ray_session, tmp_path):
    from elasticsearch_assets_ray.index.global_merge import (
        merge_global_postings,
    )
    from elasticsearch_assets_ray.search.engine import QueryEngine
    from elasticsearch_assets_ray.search.term_engine import (
        TermPartitionedEngine,
    )

    out = tmp_path / "global_dsl"
    merge_global_postings(dsl_index.index_dir, out, n_salts=2,
                          n_buckets=4, store_norms=True)
    eng = QueryEngine(dsl_index.index_dir, num_actors=2)
    teng = TermPartitionedEngine(out, num_actors=2)
    try:
        any_hits = 0
        for q, qs in DSL_CASES:
            wrapped = wrap_query(q)  # every case also runs wrapped
            got = search_dsl(eng, q, k=1000)
            got_w = search_dsl(eng, wrapped, k=1000)
            got_t = search_dsl(teng, q, k=1000)
            assert got == got_w, q
            assert [d for d, _ in got] == [d for d, _ in got_t], q
            for (_, s1), (_, s2) in zip(got, got_t):
                assert abs(s1 - s2) < 1e-9, q
            if qs is not None:
                want = eng.search_query_string(qs, k=1000)
                assert [d for d, _ in got] == [d for d, _ in want], (q, qs)
                for (_, s1), (_, s2) in zip(got, want):
                    assert abs(s1 - s2) < 1e-9, (q, qs)
            any_hits += len(got)
        assert any_hits > 0
    finally:
        eng.shutdown()
        teng.shutdown()


def test_filter_context_scores_zero_contribution(dsl_index, ray_session):
    """A bool filter clause gates the doc set but must NOT add the
    constant 1.0 a scored meta clause would."""
    from elasticsearch_assets_ray.search.engine import QueryEngine

    eng = QueryEngine(dsl_index.index_dir, num_actors=2)
    try:
        scored = search_dsl(eng, {"bool": {
            "must": [{"match": {"content": "merge"}},
                     {"term": {"lang": "python"}}]}}, k=1000)
        filtered = search_dsl(eng, {"bool": {
            "must": [{"match": {"content": "merge"}}],
            "filter": [{"term": {"lang": "python"}}]}}, k=1000)
        assert [d for d, _ in scored] == [d for d, _ in filtered]
        assert len(filtered) > 0
        for (_, s_scored), (_, s_filt) in zip(scored, filtered):
            assert abs((s_scored - 1.0) - s_filt) < 1e-9
        only_filter = search_dsl(eng, {"bool": {
            "filter": [{"term": {"lang": "python"}}]}}, k=10_000)
        assert len(only_filter) > 0
        assert all(s == 0.0 for _, s in only_filter)
    finally:
        eng.shutdown()


def test_bool_msm_m_of_n_shape():
    a, b, c = ("term", "a1"), ("term", "b1"), ("term", "c1")
    got = T({"bool": {"should": [{"match": {"content": "a1"}},
                                 {"match": {"content": "b1"}},
                                 {"match": {"content": "c1"}}],
             "minimum_should_match": 2}})
    assert got == ("msm", 2, (a, b, c))
    # msm=1 stays the plain OR fold
    got = T({"bool": {"should": [{"match": {"content": "a1"}},
                                 {"match": {"content": "b1"}}],
             "minimum_should_match": 1}})
    assert got == ("or", a, b)
    # must + msm=2 shoulds: gated like the msm=1 case, msm node inside
    m = ("term", "m1")
    got = T({"bool": {"must": [{"match": {"content": "m1"}}],
                      "should": [{"match": {"content": "a1"}},
                                 {"match": {"content": "b1"}},
                                 {"match": {"content": "c1"}}],
                      "minimum_should_match": 2}})
    msm = ("msm", 2, (a, b, c))
    assert got == ("filter", ("filter", ("or", m, msm), m), msm)
    # Lucene spec forms (Queries.calculateMinShouldMatch): percentage
    # truncates, negative counts missing-allowed, conditionals pick the
    # right-most applicable clause
    got = T({"bool": {"should": [{"match": {"content": "a1"}},
                                 {"match": {"content": "b1"}},
                                 {"match": {"content": "c1"}}],
             "minimum_should_match": "75%"}})
    assert got == ("msm", 2, (a, b, c))  # int(3 * .75) = 2
    got = T({"bool": {"should": [{"match": {"content": "a1"}},
                                 {"match": {"content": "b1"}},
                                 {"match": {"content": "c1"}}],
             "minimum_should_match": -1}})
    assert got == ("msm", 2, (a, b, c))  # 3 + (-1)
    # -1 of a single should → 0 required → optional-should bool has no
    # required side at all → plain OR of the shoulds
    got = T({"bool": {"should": [{"match": {"content": "a1"}},
                                 {"match": {"content": "b1"}}],
             "minimum_should_match": -1}})
    assert got == ("or", a, b)
    # conditional: n=3 ≤ 4 → ALL required
    got = T({"bool": {"should": [{"match": {"content": "a1"}},
                                 {"match": {"content": "b1"}},
                                 {"match": {"content": "c1"}}],
             "minimum_should_match": "4<90%"}})
    assert got == ("msm", 3, (a, b, c))
    # msm above the clause count → the WHOLE bool matches nothing, even
    # with a must present (Lucene MatchNoDocsQuery rewrite)
    assert T({"bool": {"must": [{"match": {"content": "m1"}}],
                       "should": [{"match": {"content": "a1"}}],
                       "minimum_should_match": 2}}) is None
    with pytest.raises(DslError):
        T({"bool": {"should": [{"match": {"content": "x"}}],
                    "minimum_should_match": "nonsense"}})


def test_calculate_min_should_match_lucene_table():
    """The Lucene Queries.calculateMinShouldMatch contract, including
    the float32 percentage boundary cases (100% of n must be n)."""
    from elasticsearch_assets_ray.search.sqs import (
        calculate_min_should_match as calc,
    )

    assert calc(5, 3) == 3
    assert calc(5, -2) == 3
    assert calc(3, -5) == 0          # floored at 0
    assert calc(4, "3") == 3
    assert calc(4, "-1") == 3
    assert calc(4, "75%") == 3
    assert calc(5, "100%") == 5      # float32 rounds exactly like Java
    assert calc(3, "100%") == 3
    assert calc(7, "100%") == 7
    assert calc(4, "-25%") == 3      # 4 + int(-1.0)
    assert calc(9, "-25%") == 7      # 9 + int(-2.25)
    assert calc(10, "33%") == 3
    assert calc(0, "50%") == 0
    # conditionals: "num<spec" — n at or under num → ALL optional
    # clauses required; above → spec applies; multiple conditions pick
    # the right-most whose bound is exceeded
    assert calc(2, "3<90%") == 2
    assert calc(3, "3<90%") == 3
    assert calc(10, "3<90%") == 9
    assert calc(2, "2<-25% 9<-3") == 2
    assert calc(8, "2<-25% 9<-3") == 6
    assert calc(12, "2<-25% 9<-3") == 9
    import pytest as _pytest

    with _pytest.raises(ValueError):
        calc(3, "1<")
    with _pytest.raises(ValueError):
        calc(3, "abc")


def test_msm_engine_semantics(dsl_index, ray_session):
    """msm 2-of-3: doc set = docs matching ≥2 terms; score = sum of
    ALL matching terms' BM25 — composed from single-term searches."""
    from elasticsearch_assets_ray.search.engine import QueryEngine

    eng = QueryEngine(dsl_index.index_dir, num_actors=2)
    try:
        terms = ["merge", "data", "import"]
        single = {
            t: dict(eng.search_query_string(t, k=10_000)) for t in terms
        }
        want = {}
        for d in set().union(*[s.keys() for s in single.values()]):
            hits = [single[t][d] for t in terms if d in single[t]]
            if len(hits) >= 2:
                want[d] = sum(hits)
        got = dict(search_dsl(eng, {"bool": {
            "should": [{"match": {"content": t}} for t in terms],
            "minimum_should_match": 2}}, k=10_000))
        assert set(got) == set(want) and len(want) > 0
        for d, s in got.items():
            assert abs(s - want[d]) < 1e-9
        # m greater than the clause count matches nothing
        assert search_dsl(eng, {"bool": {
            "should": [{"match": {"content": t}} for t in terms],
            "minimum_should_match": 4}}, k=10) == []
    finally:
        eng.shutdown()


def test_match_all_and_msm_param_on_engines(dsl_index, ray_session,
                                            tmp_path):
    from elasticsearch_assets_ray.index.global_merge import (
        merge_global_postings,
    )
    from elasticsearch_assets_ray.search.engine import QueryEngine
    from elasticsearch_assets_ray.search.term_engine import (
        TermPartitionedEngine,
    )

    out = tmp_path / "global_ma"
    merge_global_postings(dsl_index.index_dir, out, n_salts=2,
                          n_buckets=4, store_norms=True)
    eng = QueryEngine(dsl_index.index_dir, num_actors=2)
    teng = TermPartitionedEngine(out, num_actors=2)
    try:
        n = dsl_index.manifest.total_docs
        got = search_dsl(eng, {"match_all": {}}, k=10 * n)
        got_t = search_dsl(teng, {"match_all": {}}, k=10 * n)
        assert len(got) == n and len(got_t) == n
        assert all(s == 1.0 for _, s in got)
        # match_all inside a filter-context bool
        f = search_dsl(eng, {"bool": {
            "must": [{"match_all": {}}],
            "filter": [{"term": {"lang": "python"}}]}}, k=10 * n)
        assert 0 < len(f) < n and all(s == 1.0 for _, s in f)
        # request-level minimum_should_match ≡ the explicit DSL msm
        want = search_dsl(eng, {"bool": {
            "should": [{"match": {"content": t}}
                       for t in ("merge", "data", "import")],
            "minimum_should_match": 2}}, k=1000)
        got_q = eng.search_query_string("merge data import", k=1000,
                                        minimum_should_match=2)
        got_s = eng.search_simple_query_string("merge data import",
                                               k=1000,
                                               minimum_should_match=2)
        got_qt = teng.search_query_string("merge data import", k=1000,
                                          minimum_should_match=2)
        assert got_q == want and got_s == want
        assert [d for d, _ in got_qt] == [d for d, _ in want]
        for (_, s1), (_, s2) in zip(got_qt, want):
            assert abs(s1 - s2) < 1e-9
        # m above the clause count matches nothing
        assert eng.search_query_string("merge data", k=10,
                                       minimum_should_match=3) == []
    finally:
        eng.shutdown()
        teng.shutdown()


def test_span_json_normalization_and_engines(dsl_index, ray_session,
                                             tmp_path):
    from elasticsearch_assets_ray.index.global_merge import (
        merge_global_postings,
    )
    from elasticsearch_assets_ray.search.dsl import normalize_span
    from elasticsearch_assets_ray.search.engine import QueryEngine
    from elasticsearch_assets_ray.search.term_engine import (
        TermPartitionedEngine,
    )

    f = "content"
    es_q = {"span_near": {
        "clauses": [
            {"span_term": {f: "def"}},
            {"span_or": {"clauses": [{"span_term": {f: {"value": "merge"}}},
                                     {"span_term": {f: "data"}}]}},
            {"span_multi": {"match": {"prefix": {f: {"value": "par"}}}}},
        ],
        "slop": 4, "in_order": True,
    }}
    native = normalize_span(es_q, f)
    assert native == {"span_near": {
        "clauses": [
            {"span_term": "def"},
            {"span_or": [{"span_term": "merge"}, {"span_term": "data"}]},
            {"span_multi": {"prefix": "par"}},
        ], "slop": 4, "in_order": True}}
    nn = normalize_span({"span_not": {
        "include": {"span_term": {f: "merge"}},
        "exclude": {"span_term": {f: "data"}}, "dist": 2}}, f)
    assert nn["span_not"]["pre"] == 2 and nn["span_not"]["post"] == 2
    with pytest.raises(DslError):
        normalize_span({"span_term": {"otherfield": "x"}}, f)
    with pytest.raises(DslError):
        normalize_span({"span_multi": {"match": {"term": {f: "x"}}}}, f)

    out = tmp_path / "global_span"
    merge_global_postings(dsl_index.index_dir, out, n_salts=2,
                          n_buckets=4, store_norms=True)
    eng = QueryEngine(dsl_index.index_dir, num_actors=2)
    teng = TermPartitionedEngine(out, num_actors=2)
    try:
        got = search_dsl(eng, es_q, k=1000)
        want = eng.search_spans(native, k=1000)
        assert got == want and len(got) > 0
        got_w = search_dsl(eng, wrap_query(es_q), k=1000)
        assert got_w == got
        got_t = search_dsl(teng, es_q, k=1000)
        assert [d for d, _ in got_t] == [d for d, _ in got]
    finally:
        eng.shutdown()
        teng.shutdown()


def test_dedicated_kind_dispatch(dsl_index, ray_session):
    from elasticsearch_assets_ray.search.engine import (
        QueryEngine,
        pinned_search,
    )

    eng = QueryEngine(dsl_index.index_dir, num_actors=2)
    try:
        # more_like_this with ES percentage msm
        seed = eng.search("merge data", k=1)[0][0]
        got = search_dsl(eng, {"more_like_this": {
            "like": [{"_id": int(seed)}],
            "min_term_freq": 1, "min_doc_freq": 2,
            "minimum_should_match": "30%"}}, k=20)
        want = eng.more_like_this(int(seed), k=20, min_term_freq=1,
                                  min_doc_freq=2,
                                  minimum_should_match=0.3)
        assert got == want and len(got) > 0
        # pinned
        organic = {"match": {"content": "merge data"}}
        pins = [int(d) for d, _ in eng.search("import", k=3)]
        got = search_dsl(eng, {"pinned": {"ids": pins,
                                          "organic": organic}}, k=10)
        want = pinned_search(eng, pins, "merge data", k=10)
        assert got == want
        assert [d for d, _ in got[:len(pins)]] == pins
        # function_score (repo-form function spec)
        spec = {"type": "field_value_factor", "field": "n_chars",
                "factor": 0.001, "modifier": "none", "missing": 1.0}
        got = search_dsl(eng, {"function_score": {
            "query": {"match": {"content": "merge"}},
            "functions": [spec], "score_mode": "sum",
            "boost_mode": "sum"}}, k=15)
        want = eng.search_function_score_multi(
            "merge", [spec], score_mode="sum", boost_mode="sum", k=15)
        assert got == want and len(got) > 0
        with pytest.raises(DslError):
            search_dsl(eng, {"pinned": {"ids": [1], "organic": {
                "wildcard": {"content": "a*"}}}}, k=5)
        # match_phrase_prefix (exact, then slop → lucene mode)
        got = search_dsl(eng, {"match_phrase_prefix": {
            "content": {"query": "def mer", "max_expansions": 10}}},
            k=20)
        want = eng.search_phrase_prefix("def mer", k=20,
                                        max_expansions=10)
        assert got == want and len(got) > 0
        got = search_dsl(eng, {"match_phrase_prefix": {
            "content": {"query": "def mer", "slop": 2}}}, k=20)
        want = eng.search_phrase_prefix("def mer", k=20, slop=2,
                                        slop_mode="lucene")
        assert got == want and len(got) > 0
        # shorthand form
        assert search_dsl(
            eng, {"match_phrase_prefix": {"content": "def mer"}}, k=20,
        ) == eng.search_phrase_prefix("def mer", k=20)
        with pytest.raises(DslError):
            search_dsl(eng, {"match_phrase_prefix": {
                "lang": "pyth"}}, k=5)  # meta field → not wired
    finally:
        eng.shutdown()


def test_terms_set_dispatch_parity(dsl_index, ray_session):
    from elasticsearch_assets_ray.search.engine import QueryEngine

    eng = QueryEngine(dsl_index.index_dir, num_actors=2)
    try:
        body = {"terms_set": {"content": {
            "terms": ["merge", "data", "import"],
            "minimum_should_match_field": "n_chars"}}}
        got = search_dsl(eng, body, k=10)
        want = eng.search_terms_set(["merge", "data", "import"],
                                    "n_chars", k=10)
        assert got == want  # n_chars >> 3, so typically empty — parity
        with pytest.raises(DslError):
            search_dsl(eng, {"terms_set": {"content": {
                "terms": ["x"]}}}, k=5)
    finally:
        eng.shutdown()



def test_normalize_span_field_masking():
    """ES JSON span_field_masking (leaves on their REAL field, wrapper
    carries the masked-as field) → the native masked tree with
    query_field resolved from the inner leaves."""
    from elasticsearch_assets_ray.search.dsl import normalize_span

    got = normalize_span({"span_near": {"clauses": [
        {"span_term": {"text": "hash"}},
        {"span_field_masking": {"query": {"span_term": {"stem": "tabl"}},
                                "field": "text"}},
    ], "slop": 3, "in_order": True}}, "text")
    assert got == {"span_near": {"clauses": [
        {"span_term": "hash"},
        {"span_field_masking": {"query": {"span_term": "tabl"},
                                "query_field": "stem", "field": "text"}},
    ], "slop": 3, "in_order": True}}
    # legacy name + nested or-group + span_multi leaf field discovery
    got = normalize_span({"field_masking_span": {
        "query": {"span_or": {"clauses": [
            {"span_term": {"stem": "merg"}},
            {"span_multi": {"match": {"prefix": {"stem": "quer"}},
                            "max_expansions": 10}}]}},
        "field": "text"}}, "text")
    assert got == {"span_field_masking": {
        "query": {"span_or": [
            {"span_term": "merg"},
            {"span_multi": {"prefix": "quer", "max_expansions": 10}}]},
        "query_field": "stem", "field": "text"}}
    # a leaf on a foreign field OUTSIDE a mask still raises
    with pytest.raises(DslError):
        normalize_span({"span_term": {"stem": "tabl"}}, "text")


def test_normalize_function_sugar():
    """ES per-function JSON sugar → the repo-normalized funcscore
    specs, byte-equal to the contract's FSM shapes."""
    from elasticsearch_assets_ray.search.dsl import normalize_function

    assert normalize_function(
        {"field_value_factor": {"field": "n_chars", "factor": 0.01,
                                "modifier": "log1p"}}) == {
        "type": "field_value_factor", "field": "n_chars",
        "factor": 0.01, "modifier": "log1p"}
    assert normalize_function(
        {"gauss": {"n_chars": {"origin": 300.0, "scale": 100.0}}}) == {
        "type": "decay", "function": "gauss", "field": "n_chars",
        "origin": 300.0, "scale": 100.0}
    assert normalize_function(
        {"weight": 2.0, "filter": {"term": {"lang": "de"}}}) == {
        "type": "weight", "weight": 2.0,
        "filter": {"field": "lang", "term": "de"}}
    assert normalize_function(
        {"weight": 3.0,
         "filter": {"range": {"n_chars": {"gte": 350}}}}) == {
        "type": "weight", "weight": 3.0,
        "filter": {"field": "n_chars", "range": [350, None, True, True]}}
    assert normalize_function(
        {"script_score": {"script": {"source": "_score * 2"}}}) == {
        "type": "script_score", "script": "_score * 2"}
    assert normalize_function(
        {"random_score": {"seed": 42, "field": "orig_id"},
         "weight": 0.5}) == {
        "type": "random_score", "seed": 42, "field": "orig_id",
        "weight": 0.5}
    # already-normalized specs pass through untouched
    spec = {"type": "field_value_factor", "field": "n_chars"}
    assert normalize_function(spec) == spec
    with pytest.raises(DslError):
        normalize_function({"nosuch_function": {}})
    with pytest.raises(DslError):
        normalize_function({"weight": 1.0,
                            "filter": {"match": {"text": "x"}}})
