"""ES search-request execution (search/request.py): hits paging +
aggs dispatch vs direct engine calls, on both serving engines."""
from __future__ import annotations

import pytest

from elasticsearch_assets_ray.search.dsl import DslError
from elasticsearch_assets_ray.search.request import (
    dsl_to_clause_query,
    execute_request,
)


def test_clause_query_translation():
    f = "content"
    assert dsl_to_clause_query({"match": {f: "a b"}}, f) == {
        "should": "a b"}
    assert dsl_to_clause_query(
        {"match": {f: {"query": "a b", "operator": "and"}}}, f) == {
        "must": "a b"}
    assert dsl_to_clause_query({"term": {"lang": "go"}}, f) == {
        "filter_meta": {"lang": "go"}}
    assert dsl_to_clause_query({"terms": {"lang": ["go", "py"]}}, f) == {
        "filter_meta": {"lang": ["go", "py"]}}
    assert dsl_to_clause_query(
        {"range": {"n_chars": {"gte": 10, "lte": 20}}}, f) == {
        "filter_range": {"n_chars": (10, 20)}}
    got = dsl_to_clause_query({"bool": {
        "must": [{"match": {f: {"query": "x", "operator": "and"}}}],
        "filter": [{"term": {"lang": "go"}},
                   {"range": {"n_chars": {"gte": 1}}}],
        "should": [{"match": {f: "y z"}}],
        "must_not": [{"match": {f: "w"}}],
    }}, f)
    assert got == {"must": "x", "should": "y z", "must_not": "w",
                   "filter_meta": {"lang": "go"},
                   "filter_range": {"n_chars": (1, None)}}
    # keyword-field match lowers to term equality
    assert dsl_to_clause_query({"match": {"lang": "go"}}, f) == {
        "filter_meta": {"lang": "go"}}
    for bad in [
        None,                                        # implicit match_all
        {"match_phrase": {f: "a b"}},                # phrases
        {"bool": {"must": [{"match": {f: "a b"}}]}},  # OR inside must
        {"bool": {"should": [{"term": {"lang": "go"}}]}},  # meta should
        {"bool": {"must_not": [{"term": {"lang": "go"}}]}},
        {"range": {"n_chars": {"gt": 5}}},           # exclusive bound
        {"bool": {"should": [{"match": {f: "a"}},
                             {"match": {f: "b"}}],
                  "minimum_should_match": 2}},       # m over clauses
        {"wildcard": {f: "a*"}},
        # keyword-field match under should: a required filter_meta
        # entry would AND-gate the OR branch (round-5 guard)
        {"bool": {"should": [{"match": {f: "a"}},
                             {"match": {"lang": "fr"}}]}},
        # multi-token operator-and match in should/must_not contexts:
        # token-independent clause strings would widen / over-exclude
        {"bool": {"should": [{"match": {
            f: {"query": "a b", "operator": "and"}}}]}},
        {"bool": {"must_not": [{"match": {
            f: {"query": "a b", "operator": "and"}}}]}},
    ]:
        with pytest.raises(DslError):
            dsl_to_clause_query(bad, f)


@pytest.fixture(scope="module")
def req_engines(small_corpus, tmp_path_factory, ray_session):
    from elasticsearch_assets_ray.config import IndexConfig
    from elasticsearch_assets_ray.index.build import build_index
    from elasticsearch_assets_ray.index.global_merge import (
        merge_global_postings,
    )
    from elasticsearch_assets_ray.search.engine import QueryEngine
    from elasticsearch_assets_ray.search.term_engine import (
        TermPartitionedEngine,
    )

    tmp = tmp_path_factory.mktemp("reqidx")
    idx = tmp / "idx"
    build_index(
        small_corpus, idx,
        IndexConfig(partition_target_docs=50, shard_target_docs=100,
                    store_positions=True,
                    meta_cols=("repo", "path", "lang", "n_chars"),
                    derived_meta=("n_chars=len_of:content",)),
    )
    gdir = tmp / "global"
    merge_global_postings(idx, gdir, n_salts=2, n_buckets=4,
                          store_norms=True)
    eng = QueryEngine(idx, num_actors=2)
    teng = TermPartitionedEngine(gdir, num_actors=2)
    yield eng, teng
    eng.shutdown()
    teng.shutdown()


BODY = {
    "query": {"bool": {
        "must": [{"match": {"content": {"query": "merge",
                                        "operator": "and"}}}],
        "filter": [{"range": {"n_chars": {"gte": 100}}}],
    }},
    "from": 2,
    "size": 3,
    "aggs": {
        "langs": {"terms": {"field": "lang", "size": 3},
                  "aggs": {"len": {"stats": {"field": "n_chars"}}}},
        "present": {"value_count": {"field": "n_chars"}},
    },
}


def test_execute_request_both_engines(req_engines):
    eng, teng = req_engines
    a = execute_request(eng, BODY)
    b = execute_request(teng, BODY)
    # paging: from=2 size=3 slices the ranked list
    full = execute_request(eng, {**BODY, "from": 0, "size": 100})
    assert a["hits"]["total"]["value"] == full["hits"]["total"]["value"]
    assert a["hits"]["hits"] == full["hits"]["hits"][2:5]
    assert a["hits"]["max_score"] == full["hits"]["max_score"]
    assert len(a["hits"]["hits"]) <= 3
    # engines agree on ids and (rounded-path) scores
    assert [h["_id"] for h in a["hits"]["hits"]] == \
        [h["_id"] for h in b["hits"]["hits"]]
    # aggs dispatch equals the direct engine call
    clause = dsl_to_clause_query(BODY["query"], "content")
    want = eng.aggregate(clause, "lang", stats_on="n_chars", size=3)
    assert a["aggregations"]["langs"]["buckets"] == want
    m = eng.metric_aggs(clause, "n_chars")
    assert a["aggregations"]["present"]["value"] == m["value_count"]
    assert a["aggregations"]["langs"]["buckets"] == \
        b["aggregations"]["langs"]["buckets"]
    assert a["hits"]["total"]["value"] > 0
    assert len(a["aggregations"]["langs"]["buckets"]) > 0


def test_execute_request_shapes(req_engines):
    eng, _ = req_engines
    # no query: empty hits, aggs refuse (need an explicit query)
    empty = execute_request(eng, {"size": 5})
    assert empty["hits"]["hits"] == [] and \
        empty["hits"]["total"]["value"] == 0
    with pytest.raises(DslError):
        execute_request(eng, {"aggs": {"x": {"terms": {"field": "lang"}}}})
    # date_histogram dispatch runs (created_at absent here → n_chars
    # range query with a terms agg only)
    out = execute_request(eng, {
        "query": {"match": {"content": "merge"}},
        "size": 0,
        "aggs": {"l": {"terms": {"field": "lang"}}},
    })
    assert out["hits"]["hits"] == [] and \
        out["aggregations"]["l"]["buckets"]
    with pytest.raises(DslError):
        execute_request(eng, {
            "query": {"match": {"content": "merge"}},
            "aggs": {"x": {"avg": {"field": "n_chars"},
                           "aggs": {"y": {"stats": {
                               "field": "n_chars"}}}}},
        })  # metric kinds take no sub-aggregations


def test_more_agg_kinds_dispatch(req_engines):
    eng, teng = req_engines
    body = {
        "query": {"match": {"content": "merge"}},
        "size": 0,
        "aggs": {
            "lens": {"histogram": {"field": "n_chars", "interval": 200}},
            "bands": {"range": {"field": "n_chars",
                                "ranges": [{"to": 400},
                                           {"from": 400, "to": 800},
                                           {"from": 800}]}},
            "nlang": {"cardinality": {"field": "lang"}},
        },
    }
    a = execute_request(eng, body)
    b = execute_request(teng, body)
    clause = dsl_to_clause_query(body["query"], "content")
    assert a["aggregations"]["lens"]["buckets"] == \
        eng.histogram(clause, "n_chars", 200.0)
    assert a["aggregations"]["bands"]["buckets"] == \
        eng.range_agg(clause, "n_chars",
                      [{"to": 400}, {"from": 400, "to": 800},
                       {"from": 800}])
    assert a["aggregations"]["nlang"]["value"] == \
        eng.cardinality(clause, "lang")
    assert a["aggregations"] == b["aggregations"]
    assert a["aggregations"]["nlang"]["value"] > 0
    # metric kinds: avg/sum/min/max/stats/extended_stats/percentiles
    body2 = {
        "query": {"match": {"content": "merge"}},
        "size": 0,
        "aggs": {
            "m_avg": {"avg": {"field": "n_chars"}},
            "m_sum": {"sum": {"field": "n_chars"}},
            "m_min": {"min": {"field": "n_chars"}},
            "m_max": {"max": {"field": "n_chars"}},
            "m_stats": {"stats": {"field": "n_chars"}},
            "m_ext": {"extended_stats": {"field": "n_chars"}},
            "m_pct": {"percentiles": {"field": "n_chars",
                                      "percents": [25, 50, 75]}},
        },
    }
    a2 = execute_request(eng, body2)
    b2 = execute_request(teng, body2)
    st = eng.extended_stats(clause, "n_chars")
    assert a2["aggregations"]["m_avg"]["value"] == st["avg"]
    assert a2["aggregations"]["m_sum"]["value"] == st["sum"]
    assert a2["aggregations"]["m_min"]["value"] == st["min"]
    assert a2["aggregations"]["m_max"]["value"] == st["max"]
    assert a2["aggregations"]["m_stats"] == {
        k: st[k] for k in ("count", "min", "max", "avg", "sum")}
    assert a2["aggregations"]["m_ext"] == st
    want_pct = eng.percentiles(clause, "n_chars",
                               percents=[25.0, 50.0, 75.0])
    assert a2["aggregations"]["m_pct"]["values"] == {
        str(float(p)): v for p, v in want_pct.items()}
    assert a2["aggregations"] == b2["aggregations"]
    assert st["count"] > 0


def test_retriever_body(req_engines, small_corpus):
    from elasticsearch_assets_ray.search.retriever import RetrieverContext

    eng, _ = req_engines
    ctx = RetrieverContext(eng, str(eng.info.index_dir))
    body = {"retriever": {"rrf": {
        "retrievers": [
            {"standard": {"query": "merge data"}},
            {"standard": {"query_string": "import AND merge"}},
        ],
        "rank_constant": 60, "rank_window_size": 20,
    }}, "size": 5}
    out = execute_request(eng, body, retriever_ctx=ctx)
    assert len(out["hits"]["hits"]) == 5
    from elasticsearch_assets_ray.search.retriever import execute_retriever

    want = execute_retriever(body["retriever"], ctx, k=5)
    assert [h["_id"] for h in out["hits"]["hits"]] == \
        [d for d, _ in want]
    with pytest.raises(DslError):
        execute_request(eng, {**body, "query": {"match_all": {}}},
                        retriever_ctx=ctx)
    with pytest.raises(DslError):
        execute_request(eng, body)  # no ctx


def test_knn_raw_query_vector(req_engines):
    """The ES knn form (raw query_vector): querying with row 3's own
    vector must rank row 3 first and agree with query_vector_id=3."""
    import pyarrow.parquet as pq

    from elasticsearch_assets_ray.search.retriever import (
        RetrieverContext,
        execute_retriever,
    )

    eng, _ = req_engines
    path = "/root/testdata/sf0.001/embeddings.parquet"
    ctx = RetrieverContext(eng, str(eng.info.index_dir),
                           embeddings_path=path)
    vec = pq.read_table(path, columns=["vec_id", "embedding"]) \
        .to_pylist()
    row3 = next(r for r in vec if r["vec_id"] == 3)
    by_vec = execute_retriever(
        {"knn": {"query_vector": row3["embedding"], "k": 8,
                 "num_candidates": 100}}, ctx, k=8)
    by_id = execute_retriever(
        {"knn": {"query_vector_id": 3, "k": 8}}, ctx, k=8)
    assert [d for d, _ in by_vec] == [d for d, _ in by_id]
    assert by_vec[0][0] == 3
    # similarity cutoff keeps a prefix
    cut = execute_retriever(
        {"knn": {"query_vector": row3["embedding"], "k": 8,
                 "similarity": 0.999}}, ctx, k=8)
    assert [d for d, _ in cut] == \
        [d for d, _ in by_vec][:len(cut)] and len(cut) >= 1


def test_knn_body(req_engines):
    """ES 8 top-level knn section: dispatches to the retriever knn leaf
    (query_vector_id form), pages like hits, refuses query/aggs
    combination."""
    from elasticsearch_assets_ray.search.retriever import (
        RetrieverContext,
        execute_retriever,
    )

    eng, _ = req_engines
    ctx = RetrieverContext(
        eng, str(eng.info.index_dir),
        embeddings_path="/root/testdata/sf0.001/embeddings.parquet",
    )
    body = {"knn": {"query_vector_id": 3, "k": 7}, "size": 5}
    out = execute_request(eng, body, retriever_ctx=ctx)
    want = execute_retriever({"knn": {"query_vector_id": 3, "k": 7}},
                             ctx, k=7)
    assert [h["_id"] for h in out["hits"]["hits"]] == \
        [d for d, _ in want][:5]
    assert len(out["hits"]["hits"]) == 5
    # paging slices the ranked list
    page2 = execute_request(eng, {**body, "from": 2}, retriever_ctx=ctx)
    assert [h["_id"] for h in page2["hits"]["hits"]] == \
        [d for d, _ in want][2:7]
    with pytest.raises(DslError):
        execute_request(eng, {**body, "query": {"match_all": {}}},
                        retriever_ctx=ctx)
    with pytest.raises(DslError):
        execute_request(eng, body)  # no ctx


def test_highlight_section(req_engines):
    """ES highlight body section: text-match queries get per-hit tagged
    fragments from the positional-sidecar highlighter; non-match query
    kinds raise."""
    eng, teng = req_engines
    body = {
        "query": {"match": {"content": "merge data"}},
        "size": 5,
        "highlight": {"fields": {"content": {
            "fragment_size": 80, "number_of_fragments": 2,
            "pre_tags": ["<b>"], "post_tags": ["</b>"]}}},
    }
    out = execute_request(eng, body)
    assert out["hits"]["hits"]
    want = {r["doc_id"]: r for r in eng.search_highlight(
        "merge data", k=5, pre_tag="<b>", post_tag="</b>",
        fragment_size=80, number_of_fragments=2)}
    n_hl = 0
    for h in out["hits"]["hits"]:
        r = want.get(h["_id"])
        if r is not None and r["n_matches"]:
            assert h["highlight"]["content"] == r["fragments"]
            assert any("<b>" in f for f in h["highlight"]["content"])
            n_hl += 1
    assert n_hl > 0
    # number_of_fragments=0 → the whole tagged field
    body0 = {**body, "highlight": {"fields": {"content": {
        "number_of_fragments": 0}}}}
    out0 = execute_request(eng, body0)
    h0 = next(h for h in out0["hits"]["hits"] if "highlight" in h)
    assert len(h0["highlight"]["content"]) == 1
    assert "<em>" in h0["highlight"]["content"][0]
    # engines agree on the rendered fragments
    out_t = execute_request(teng, body)
    assert [h.get("highlight") for h in out["hits"]["hits"]] == \
        [h.get("highlight") for h in out_t["hits"]["hits"]]
    # non-match query kinds raise rather than highlight wrong terms
    with pytest.raises(DslError):
        execute_request(eng, {
            "query": {"fuzzy": {"content": {"value": "mergi"}}},
            "highlight": {"fields": {"content": {}}}})


def test_source_section(req_engines):
    """ES _source filtering: page hits carry docmeta fields hydrated by
    point reads — a list selects columns, true returns every docmeta
    column; engines agree."""
    eng, teng = req_engines
    body = {
        "query": {"match": {"content": "merge"}},
        "size": 4,
        "_source": ["lang", "n_chars"],
    }
    out = execute_request(eng, body)
    assert out["hits"]["hits"]
    for h in out["hits"]["hits"]:
        assert set(h["_source"]) == {"lang", "n_chars"}
        assert isinstance(h["_source"]["n_chars"], int)
    out_t = execute_request(teng, body)
    assert [(h["_id"], h["_source"]) for h in out["hits"]["hits"]] == \
        [(h["_id"], h["_source"]) for h in out_t["hits"]["hits"]]
    # _source: true → all docmeta columns; string form selects one
    all_cols = execute_request(eng, {**body, "_source": True})
    assert {"lang", "n_chars"} <= set(all_cols["hits"]["hits"][0]["_source"])
    one = execute_request(eng, {**body, "_source": "lang"})
    assert set(one["hits"]["hits"][0]["_source"]) == {"lang"}
    # absent/false → no _source key
    off = execute_request(eng, {k: v for k, v in body.items()
                                if k != "_source"})
    assert "_source" not in off["hits"]["hits"][0]


def test_sort_section(req_engines):
    """ES body-level sort: hits order by the doc-values column, ties
    doc-ascending, exact totals, engines agree; composes with _source;
    multi-key sorts raise."""
    eng, teng = req_engines
    body = {
        "query": {"match": {"content": "merge"}},
        "size": 6,
        "sort": [{"n_chars": "desc"}],
        "_source": ["n_chars"],
    }
    a = execute_request(eng, body)
    b = execute_request(teng, body)
    hits = a["hits"]["hits"]
    assert hits and a["hits"]["total"]["relation"] == "eq"
    vals = [h["sort"][0] for h in hits]
    assert vals == sorted(vals, reverse=True)
    for h in hits:
        assert h["_score"] is None
        assert h["_source"]["n_chars"] == h["sort"][0]
    assert [(h["_id"], h["sort"]) for h in hits] == \
        [(h["_id"], h["sort"]) for h in b["hits"]["hits"]]
    # totals equal the score-path totals for the same query
    plain = execute_request(eng, {"query": body["query"], "size": 1})
    assert a["hits"]["total"]["value"] == plain["hits"]["total"]["value"]
    # asc + paging: from=2 slices the same ranking
    asc = execute_request(eng, {**body, "sort": "n_chars", "size": 50})
    vals_asc = [h["sort"][0] for h in asc["hits"]["hits"]]
    assert vals_asc == sorted(vals_asc)
    page = execute_request(eng, {**body, "sort": "n_chars", "from": 2,
                                 "size": 3})
    assert [h["_id"] for h in page["hits"]["hits"]] == \
        [h["_id"] for h in asc["hits"]["hits"][2:5]]
    # ties break doc-ascending
    ids_by_val: dict = {}
    for h in asc["hits"]["hits"]:
        ids_by_val.setdefault(h["sort"][0], []).append(h["_id"])
    for ids in ids_by_val.values():
        assert ids == sorted(ids)
    # _score entry = plain relevance path
    scored = execute_request(eng, {"query": body["query"], "size": 3,
                                   "sort": "_score"})
    assert scored["hits"]["hits"][0]["_score"] is not None
    with pytest.raises(DslError):
        execute_request(eng, {**body, "sort": [{"n_chars": "desc"},
                                               {"lang": "asc"}]})


def test_search_after_min_score_fields(req_engines):
    """search_after ([sort_value, doc_id] cursor, pushed into the shard
    cut) pages identically to from/size; min_score trims hits AND
    totals; `fields` returns array-valued docmeta."""
    eng, teng = req_engines
    base = {
        "query": {"match": {"content": "merge"}},
        "sort": "n_chars",
        "size": 4,
    }
    first = execute_request(eng, base)
    assert len(first["hits"]["hits"]) == 4
    cursor = [first["hits"]["hits"][-1]["sort"][0],
              first["hits"]["hits"][-1]["_id"]]
    nxt = execute_request(eng, {**base, "search_after": cursor})
    contiguous = execute_request(eng, {**base, "size": 8})
    assert [h["_id"] for h in first["hits"]["hits"]] + \
        [h["_id"] for h in nxt["hits"]["hits"]] == \
        [h["_id"] for h in contiguous["hits"]["hits"]]
    assert nxt["hits"]["total"]["value"] == \
        first["hits"]["total"]["value"]  # totals unaffected by cursor
    nxt_t = execute_request(teng, {**base, "search_after": cursor})
    assert [(h["_id"], h["sort"]) for h in nxt["hits"]["hits"]] == \
        [(h["_id"], h["sort"]) for h in nxt_t["hits"]["hits"]]
    with pytest.raises(DslError):
        execute_request(eng, {**base, "search_after": cursor, "from": 2})
    # min_score trims hits and totals
    full = execute_request(eng, {"query": base["query"], "size": 50})
    scores = [h["_score"] for h in full["hits"]["hits"]]
    cut = scores[len(scores) // 2]
    trimmed = execute_request(eng, {"query": base["query"], "size": 50,
                                    "min_score": cut})
    want = [s for s in scores if s >= cut]
    assert [h["_score"] for h in trimmed["hits"]["hits"]] == want
    assert trimmed["hits"]["total"]["value"] == len(want)
    # fields: array-valued docmeta
    f = execute_request(eng, {"query": base["query"], "size": 3,
                              "fields": ["lang", "n_chars"]})
    for h in f["hits"]["hits"]:
        assert isinstance(h["fields"]["lang"], list)
        assert len(h["fields"]["n_chars"]) == 1


def test_rescore_collapse_suggest_sections(req_engines):
    """The rescore / collapse / suggest body sections dispatch to the
    dedicated engine entry points with ES-shaped responses; engines
    agree."""
    from elasticsearch_assets_ray.search.engine import (
        rescore_with_phrase,
    )

    eng, teng = req_engines
    # rescore
    body = {
        "query": {"match": {"content": "merge data"}},
        "size": 5,
        "rescore": {"window_size": 20, "query": {
            "rescore_query": {"match_phrase": {"content": "merge data"}},
            "rescore_weight": 2.0, "score_mode": "total"}},
    }
    out = execute_request(eng, body)
    want = rescore_with_phrase(eng, "merge data", "merge data", k=5,
                               window_size=20, rescore_weight=2.0)
    assert [(h["_id"], h["_score"]) for h in out["hits"]["hits"]] == \
        [(d, s) for d, s in want]
    assert out["hits"]["hits"]
    # collapse
    cbody = {
        "query": {"match": {"content": "merge"}},
        "size": 3,
        "collapse": {"field": "lang", "inner_hits": {"size": 2}},
    }
    cout = execute_request(eng, cbody)
    rows = eng.search_collapse("merge", "lang", k_groups=3, inner_size=2)
    assert cout["hits"]["hits"]
    first = cout["hits"]["hits"][0]
    assert first["fields"]["lang"] == [rows[0]["group"]]
    assert first["_id"] == rows[0]["doc_id"]
    assert len(first["inner_hits"]["hits"]["hits"]) <= 2
    cout_t = execute_request(teng, cbody)
    assert [(h["_id"], h["fields"]) for h in cout["hits"]["hits"]] == \
        [(h["_id"], h["fields"]) for h in cout_t["hits"]["hits"]]
    # suggest (term suggester over a misspelling)
    sbody = {"suggest": {"fix": {"text": "merg", "term": {"size": 3}}}}
    sout = execute_request(eng, sbody)
    entries = sout["suggest"]["fix"]
    assert entries and entries[0]["text"] == "merg"
    assert any(o["text"] == "merge" for o in entries[0]["options"])
    assert sout["hits"]["hits"] == []  # no query → empty hits
    with pytest.raises(DslError):
        execute_request(eng, {"suggest": {"x": {"text": "a"}}})


def test_execute_count(req_engines):
    """ES _count: exact totals for a query body; match_all counts the
    corpus; engines agree."""
    from elasticsearch_assets_ray.search.request import execute_count

    eng, teng = req_engines
    body = {"query": {"match": {"content": "merge"}}}
    got = execute_count(eng, body)
    want = execute_request(eng, {**body, "size": 0})
    assert got["count"] == want["hits"]["total"]["value"] > 0
    assert got == execute_count(teng, body)
    all_docs = execute_count(eng, {})
    assert all_docs["count"] >= got["count"]
    assert all_docs == execute_count(eng, None)


def test_after_mask_unit():
    """search_after survivor mask on raw values: string fields compare
    lexically (dense sort codes can't meet a scalar cursor), NaNs sort
    last both directions and a NaN cursor advances the NaN tail."""
    import numpy as np

    from elasticsearch_assets_ray.search.engine import _after_mask

    ids = np.array([1, 2, 3, 4, 5], dtype=np.int64)
    v = np.array(["de", "en", "es", "go", "py"], dtype=object)
    m = _after_mask(v, ids, ("es", 3), desc=False)
    assert list(v[m]) == ["go", "py"]
    m = _after_mask(v, ids, ("es", 3), desc=True)
    assert list(v[m]) == ["de", "en"]
    # tie advances by doc id
    vt = np.array(["es", "es", "es"], dtype=object)
    m = _after_mask(vt, np.array([1, 2, 3]), ("es", 2), desc=False)
    assert list(np.array([1, 2, 3])[m]) == [3]
    # NaNs survive any non-NaN cursor (missing:_last), both directions
    vn = np.array([1.0, 2.0, np.nan, np.nan])
    idn = np.array([1, 2, 3, 4], dtype=np.int64)
    m = _after_mask(vn, idn, (2.0, 2), desc=False)
    assert list(idn[m]) == [3, 4]
    m = _after_mask(vn, idn, (1.0, 1), desc=True)
    assert list(idn[m]) == [3, 4]
    # a NaN cursor advances through the NaN tail by doc id
    m = _after_mask(vn, idn, (float("nan"), 3), desc=False)
    assert list(idn[m]) == [4]


def test_sort_string_field_cursor(req_engines):
    """Body sort on a KEYWORD field with search_after: pages are
    contiguous and engines agree (the pre-fix code compared dense sort
    codes against the raw cursor and returned wrong pages)."""
    eng, teng = req_engines
    base = {"query": {"match": {"content": "merge"}},
            "sort": [{"lang": "asc"}], "size": 3}
    first = execute_request(eng, base)
    assert len(first["hits"]["hits"]) == 3
    cur = [first["hits"]["hits"][-1]["sort"][0],
           first["hits"]["hits"][-1]["_id"]]
    nxt = execute_request(eng, {**base, "search_after": cur})
    contiguous = execute_request(eng, {**base, "size": 6})
    assert [h["_id"] for h in first["hits"]["hits"]] + \
        [h["_id"] for h in nxt["hits"]["hits"]] == \
        [h["_id"] for h in contiguous["hits"]["hits"]]
    nxt_t = execute_request(teng, {**base, "search_after": cur})
    assert [(h["_id"], h["sort"]) for h in nxt["hits"]["hits"]] == \
        [(h["_id"], h["sort"]) for h in nxt_t["hits"]["hits"]]


def test_collapse_source_composition_and_highlight_guard(req_engines):
    """collapse/rescore hits hydrate _source/fields (engine-doc-id
    space); highlight off the relevance path raises."""
    eng, _ = req_engines
    out = execute_request(eng, {
        "query": {"match": {"content": "merge"}},
        "size": 3,
        "collapse": {"field": "lang"},
        "_source": ["n_chars"],
    })
    assert out["hits"]["hits"]
    for h in out["hits"]["hits"]:
        assert set(h["_source"]) == {"n_chars"}
    rs = execute_request(eng, {
        "query": {"match": {"content": "merge data"}},
        "size": 3,
        "rescore": {"window_size": 10, "query": {
            "rescore_query": {"match_phrase": {"content": "merge data"}}}},
        "fields": ["lang"],
    })
    assert rs["hits"]["hits"] and all(
        "lang" in h["fields"] for h in rs["hits"]["hits"])
    for body in (
        {"query": {"match": {"content": "merge"}}, "sort": "n_chars",
         "highlight": {"fields": {"content": {}}}},
        {"query": {"match": {"content": "merge"}},
         "collapse": {"field": "lang"},
         "highlight": {"fields": {"content": {}}}},
    ):
        with pytest.raises(DslError):
            execute_request(eng, body)


def test_suggest_shared_text_form(req_engines):
    """ES's shared-text suggest body ({suggest: {text, name: {...}}})."""
    eng, _ = req_engines
    out = execute_request(eng, {"suggest": {
        "text": "merg", "fix": {"term": {"size": 3}}}})
    entries = out["suggest"]["fix"]
    assert entries and entries[0]["text"] == "merg"
    assert any(o["text"] == "merge" for o in entries[0]["options"])


def test_knn_scores_are_similarities(req_engines):
    """Top-level knn hits carry cosine similarities, not 0.0."""
    from elasticsearch_assets_ray.search.retriever import RetrieverContext

    eng, _ = req_engines
    ctx = RetrieverContext(
        eng, str(eng.info.index_dir),
        embeddings_path="/root/testdata/sf0.001/embeddings.parquet")
    out = execute_request(eng, {"knn": {"query_vector_id": 3, "k": 5}},
                          retriever_ctx=ctx)
    hits = out["hits"]["hits"]
    assert hits[0]["_id"] == 3 and hits[0]["_score"] == pytest.approx(1.0)
    scores = [h["_score"] for h in hits]
    assert scores == sorted(scores, reverse=True) and scores[-1] < 1.0
    with pytest.raises(DslError):
        execute_request(eng, {"knn": {"query_vector_id": 3},
                              "_source": ["lang"]}, retriever_ctx=ctx)
