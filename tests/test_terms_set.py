"""terms_set (per-doc minimum_should_match_field), match_bool_prefix,
and the pinned query: brute-force semantics on the shard engine, parity
on the term-partitioned engine."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.config import IndexConfig
from elasticsearch_assets_ray.index.build import build_index
from elasticsearch_assets_ray.index.global_merge import merge_global_postings
from elasticsearch_assets_ray.search.engine import (
    PINNED_BASE,
    QueryEngine,
    pinned_search,
)
from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

DOCS = [
    "alpha beta gamma",        # req 1
    "alpha beta",              # req 2
    "alpha",                   # req 2 → can't reach 2 of the set
    "beta gamma delta",        # req 3 → needs all three
    "alpha beta gamma delta",  # req 3
    "epsilon zeta",            # req 1 → no set terms at all
    "alpha alpha beta",        # req 0 → floor is still >= 1 match
    "gamma",                   # req 1
]
REQ = [1, 2, 2, 3, 3, 1, 0, 1]


GRP = ["x", "y", None, "x", "y", "x", "x", "y"]


@pytest.fixture(scope="module")
def ts_index(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("tsidx")
    tbl = pa.table({
        "doc_id": pa.array(range(len(DOCS)), pa.int64()),
        "text": pa.array(DOCS, pa.string()),
        "req": pa.array(REQ, pa.int64()),
        "grp": pa.array(GRP, pa.string()),
    })
    pq.write_table(tbl, d / "corpus.parquet", row_group_size=3)
    cfg = IndexConfig(
        analyzer="simple", text_col="text", lang_col=None, id_col="doc_id",
        meta_cols=("req", "grp"), partition_target_docs=3,
        shard_target_docs=3, store_positions=True,
    )
    info = build_index(str(d), d / "idx", cfg)
    merge_global_postings(d / "idx", d / "glb", n_salts=2, n_buckets=4,
                          store_norms=True)
    return info, d / "glb"


def test_terms_set_semantics_and_parity(ts_index, ray_session):
    info, glb = ts_index
    eng = QueryEngine(info.index_dir, num_actors=2)
    teng = TermPartitionedEngine(glb, num_actors=2)
    try:
        got = eng.search_terms_set(["alpha", "beta", "gamma"], "req", k=20)
        ids = [d for d, _ in got]
        # doc0: 3>=1 ✓; doc1: 2>=2 ✓; doc2: 1>=2 ✗; doc3: 2>=3 ✗;
        # doc4: 3>=3 ✓; doc5: 0 matches ✗; doc6: 2>=0 ✓ (>=1 floor);
        # doc7: 1>=1 ✓
        assert set(ids) == {0, 1, 4, 6, 7}
        # scores are the BM25 sum over matched terms — must equal a bool
        # should query's scores for the same matched docs
        bool_sc = dict(eng.search_bool(should=["alpha", "beta", "gamma"],
                                       k=20))
        for d, s in got:
            assert abs(s - bool_sc[d]) < 1e-9
        assert teng.search_terms_set(["alpha", "beta", "gamma"],
                                     "req", k=20) == got
        # string form analyzes
        assert eng.search_terms_set("alpha beta gamma", "req", k=20) == got
        # absent terms contribute nothing
        got2 = eng.search_terms_set(["alpha", "zzz_absent"], "req", k=20)
        assert {d for d, _ in got2} == {0, 6}  # count 1: req<=1 docs w/ alpha
        assert teng.search_terms_set(["alpha", "zzz_absent"], "req",
                                     k=20) == got2
    finally:
        eng.shutdown()
        teng.shutdown()


def test_match_bool_prefix_semantics_and_parity(ts_index, ray_session):
    info, glb = ts_index
    eng = QueryEngine(info.index_dir, num_actors=2)
    teng = TermPartitionedEngine(glb, num_actors=2)
    try:
        got = eng.search_match_bool_prefix("epsilon ga", k=20)
        # docs matching "epsilon" (BM25) OR prefix "ga*" (constant 1.0)
        ids = {d for d, _ in got}
        assert ids == {0, 3, 4, 5, 7}  # gamma docs + epsilon doc
        sc = dict(got)
        # prefix-only docs score exactly the constant 1.0
        assert sc[7] == 1.0 and sc[0] == 1.0
        # the epsilon doc scores BM25(epsilon) — no prefix match
        # (1e-16-level float-association difference vs the dense search
        # path is expected: the sqs algebra sums sparse-aligned)
        assert abs(sc[5] - dict(eng.search("epsilon", k=5))[5]) < 1e-9
        tgot = teng.search_match_bool_prefix("epsilon ga", k=20)
        assert [d for d, _ in tgot] == [d for d, _ in got]
        for (_, s1), (_, s2) in zip(tgot, got):
            assert abs(s1 - s2) < 1e-9  # float association only
        # single-token query: pure prefix
        p = eng.search_match_bool_prefix("alp", k=20)
        assert {d for d, _ in p} == {0, 1, 2, 4, 6}
        assert all(s == 1.0 for _, s in p)
        assert teng.search_match_bool_prefix("alp", k=20) == p
    finally:
        eng.shutdown()
        teng.shutdown()


def test_multi_terms_agg(ts_index, ray_session):
    info, glb = ts_index
    eng = QueryEngine(info.index_dir, num_actors=2)
    teng = TermPartitionedEngine(glb, num_actors=2)
    try:
        # docs matching "alpha": 0,1,2,4,6 — doc 2 has grp=None → omitted
        got = eng.multi_terms("alpha", ["grp", "req"])
        want = {("x", 1): 1, ("x", 0): 1, ("y", 2): 1, ("y", 3): 1}
        assert {tuple(r["key"]): r["doc_count"] for r in got} == want
        # default order: doc_count desc, key asc (tuple lexicographic)
        keys = [tuple(r["key"]) for r in got]
        assert keys == sorted(keys)
        assert teng.multi_terms("alpha", ["grp", "req"]) == got
        # stats sub-agg over a numeric column
        got2 = eng.multi_terms("beta", ["grp", "req"], stats_on="req")
        for r in got2:
            assert r["sum"] == r["key"][1] * r["doc_count"]
        assert teng.multi_terms("beta", ["grp", "req"],
                                stats_on="req") == got2
        import pytest as _pt

        with _pt.raises(ValueError):
            eng.multi_terms("alpha", ["grp"])
    finally:
        eng.shutdown()
        teng.shutdown()


def test_adjacency_matrix(ts_index, ray_session):
    info, glb = ts_index
    eng = QueryEngine(info.index_dir, num_actors=2)
    teng = TermPartitionedEngine(glb, num_actors=2)
    try:
        filters = {"ab": "alpha", "bg": "beta gamma", "none": "zzznope"}
        got = eng.adjacency_matrix(filters)
        want = [
            {"key": "ab", "doc_count": 5},          # 0,1,2,4,6
            {"key": "ab&bg", "doc_count": 4},       # 0,1,4,6
            {"key": "bg", "doc_count": 6},          # 0,1,3,4,6,7
        ]
        assert got == want  # zero buckets (none, none&*) omitted
        assert teng.adjacency_matrix(filters) == want
        assert [r["key"] for r in got] == sorted(r["key"] for r in got)
    finally:
        eng.shutdown()
        teng.shutdown()


def test_pinned_search(ts_index, ray_session):
    info, glb = ts_index
    eng = QueryEngine(info.index_dir, num_actors=2)
    teng = TermPartitionedEngine(glb, num_actors=2)
    try:
        for e in (eng, teng):
            got = pinned_search(e, [7, 2], "alpha beta", k=5)
            assert [d for d, _ in got[:2]] == [7, 2]
            assert got[0][1] == PINNED_BASE and got[1][1] == PINNED_BASE - 1
            organic = [d for d, _ in got[2:]]
            assert 7 not in organic and 2 not in organic
            assert organic == [
                d for d, _ in e.search("alpha beta", k=7)
                if d not in (7, 2)
            ][: len(organic)]
        # nonexistent pinned ids drop on the shard engine
        got = pinned_search(eng, [999, 0], "alpha", k=3)
        assert [d for d, _ in got[:1]] == [0]
        assert 999 not in {d for d, _ in got}
        # duplicates keep first position only
        got = pinned_search(eng, [1, 1, 0], "gamma", k=4)
        assert [d for d, _ in got[:2]] == [1, 0]
    finally:
        eng.shutdown()
        teng.shutdown()


def test_sampler_and_diversified(ts_index, ray_session):
    from elasticsearch_assets_ray.search.sampler import (
        _occurrence_index,
        sampler_agg,
    )

    np.testing.assert_array_equal(
        _occurrence_index(np.array(["a", "b", "a", "a", "b"])),
        [0, 0, 1, 2, 1],
    )
    info, glb = ts_index
    eng = QueryEngine(info.index_dir, num_actors=2)
    teng = TermPartitionedEngine(glb, num_actors=2)
    try:
        # plain sampler: top-3 ranked docs for "alpha beta", grouped by grp
        full = [d for d, _ in eng.search("alpha beta", k=100)]
        got = sampler_agg(eng, "alpha beta", "grp", info.index_dir,
                          sample_size=3)
        sample = full[:3]
        want_counts: dict = {}
        for d in sample:
            g = GRP[d]
            if g is not None:
                want_counts[g] = want_counts.get(g, 0) + 1
        assert {r["key"]: r["doc_count"] for r in got} == want_counts
        # diversified on grp, max 1 per value: walk ranks keeping first
        # of each grp; grp=None docs are skipped
        got2 = sampler_agg(eng, "alpha beta", "grp", info.index_dir,
                           sample_size=5, dedup_on="grp",
                           max_docs_per_value=1)
        seen, kept = set(), []
        for d in full:
            g = GRP[d]
            if g is None or g in seen:
                continue
            seen.add(g)
            kept.append(d)
        want2: dict = {}
        for d in kept[:5]:
            want2[GRP[d]] = want2.get(GRP[d], 0) + 1
        assert {r["key"]: r["doc_count"] for r in got2} == want2
        # parity on the term engine (source_index docmeta)
        from elasticsearch_assets_ray.search.term_engine import _load_meta

        src = _load_meta(glb)["source_index"]
        assert sampler_agg(teng, "alpha beta", "grp", src,
                           sample_size=3) == got
        assert sampler_agg(teng, "alpha beta", "grp", src, sample_size=5,
                           dedup_on="grp", max_docs_per_value=1) == got2
    finally:
        eng.shutdown()
        teng.shutdown()


def test_adjacency_matrix_bool_filters(ts_index, ray_session):
    """Full bool-clause dict filters in adjacency_matrix — now on BOTH
    engines (the term engine evaluates them through its bool
    machinery)."""
    info, glb = ts_index
    eng = QueryEngine(info.index_dir, num_actors=2)
    teng = TermPartitionedEngine(glb, num_actors=2)
    try:
        filters = {
            "a_not_b": {"must": "alpha", "must_not": "beta"},
            "bg": "beta gamma",
            "ab_and": {"must": "alpha beta"},
        }
        got = eng.adjacency_matrix(filters)
        assert teng.adjacency_matrix(filters) == got
        assert all(r["doc_count"] >= 1 for r in got)
        by = {r["key"]: r["doc_count"] for r in got}
        # a doc without beta can never intersect the beta-conjunction
        assert "a_not_b&ab_and" not in by
        assert by["ab_and"] <= by["bg"]
    finally:
        eng.shutdown()
        teng.shutdown()


def test_random_sampler_parity_and_brute(ts_index, ray_session):
    """random_sampler: deterministic Knuth-hash sample, engine parity,
    brute-force buckets, p=1 degeneracy, probability validation."""
    from elasticsearch_assets_ray.search.sampler import random_sample_mask

    info, glb = ts_index
    eng = QueryEngine(info.index_dir, num_actors=2)
    teng = TermPartitionedEngine(glb, num_actors=2)
    try:
        matched = np.array(sorted(
            d for d, _ in eng.search_bool(should="alpha beta gamma",
                                          k=1 << 30)
        ), dtype=np.int64)
        seed = next(
            s for s in range(64)
            if 0 < random_sample_mask(matched, 0.5, s).sum() < len(matched)
        )
        a = eng.random_sampler("alpha beta gamma", "grp", 0.5, seed=seed)
        b = teng.random_sampler("alpha beta gamma", "grp", 0.5, seed=seed)
        assert a == b
        keep = matched[random_sample_mask(matched, 0.5, seed)]
        want: dict = {}
        for d in keep.tolist():
            if GRP[d] is not None:  # terms aggs omit missing keys
                want[GRP[d]] = want.get(GRP[d], 0) + 1
        rows = [{"key": k, "doc_count": c, "doc_count_scaled": c * 2}
                for k, c in want.items()]
        rows.sort(key=lambda r: (-r["doc_count"], r["key"]))
        assert a == rows
        # p = 1 keeps every matched doc (scaled == raw)
        full = eng.random_sampler("alpha beta gamma", "grp", 1.0)
        n_keyed = sum(1 for d in matched.tolist() if GRP[d] is not None)
        assert sum(r["doc_count"] for r in full) == n_keyed
        assert all(r["doc_count_scaled"] == r["doc_count"] for r in full)
        assert teng.random_sampler("alpha beta gamma", "grp", 1.0) == full
        with pytest.raises(ValueError):
            eng.random_sampler("alpha", "grp", 0.0)
    finally:
        eng.shutdown()
        teng.shutdown()


def test_synonym_query_semantics_and_parity(ts_index, ray_session):
    """Lucene SynonymQuery: blended df (max over members), summed member
    tfs before saturation; singleton-slot degeneracy == plain match;
    engine parity."""
    import math

    info, glb = ts_index
    from elasticsearch_assets_ray.config import BM25Params

    eng = QueryEngine(info.index_dir, num_actors=2,
                      params=BM25Params(round_decimals=4))
    teng = TermPartitionedEngine(glb, num_actors=2, round_decimals=4)
    try:
        syn = {"alpha": ["gamma"]}
        a = eng.search_synonyms("alpha", syn, k=20)
        b = teng.search_synonyms("alpha", syn, k=20)
        assert a == b
        # brute: slot (alpha, gamma) — tf = tf_alpha + tf_gamma,
        # df = max(df_alpha, df_gamma)
        toks = [d.split() for d in DOCS]
        dls = [len(t) for t in toks]
        avgdl = sum(dls) / len(dls)
        df = max(sum("alpha" in t for t in toks),
                 sum("gamma" in t for t in toks))
        idf = math.log(1 + (len(DOCS) - df + 0.5) / (df + 0.5))
        want = []
        for d, t in enumerate(toks):
            tf = t.count("alpha") + t.count("gamma")
            if tf:
                sc = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75
                                                   + 0.75 * dls[d] / avgdl))
                want.append((d, sc))
        want.sort(key=lambda x: (-round(x[1], 4), x[0]))
        assert [d for d, _ in a] == [d for d, _ in want]
        for (_, ga), (_, wa) in zip(a, want):
            assert ga == pytest.approx(wa, abs=1e-12)
        # no synonyms → singleton slots == the plain match query (ranks
        # exact; scores to 1 ulp — the factor association differs)
        ps = eng.search_synonyms("alpha beta", {}, k=20)
        qs_ = eng.search("alpha beta", k=20)
        assert [d for d, _ in ps] == [d for d, _ in qs_]
        for (_, g1), (_, g2) in zip(ps, qs_):
            assert g1 == pytest.approx(g2, abs=1e-9)
        # pre-built slot-list form, mixed singleton/group
        c = eng.search_synonyms([["alpha", "gamma"], "beta"], k=20)
        assert c == teng.search_synonyms([["alpha", "gamma"], "beta"], k=20)
        assert eng.search_synonyms("zzz", {}, k=5) == []
        assert teng.search_synonyms("zzz", {"zzz": ["qqq"]}, k=5) == []
    finally:
        eng.shutdown()
        teng.shutdown()


def test_terms_lookup_parity_and_brute(ts_index, ray_session):
    """ES terms-lookup query: term list from a stored doc's text, ANY
    match at constant boost, lookup doc included (ES contract)."""
    info, glb = ts_index
    eng = QueryEngine(info.index_dir, num_actors=2)
    teng = TermPartitionedEngine(glb, num_actors=2)
    try:
        a = eng.search_terms_lookup(0, boost=1.5)  # alpha beta gamma
        b = teng.search_terms_lookup(0, boost=1.5)
        assert a == b
        toks0 = set(DOCS[0].split())
        want = [(d, 1.5) for d, t in enumerate(DOCS)
                if toks0 & set(t.split())]
        assert a == want
        assert 0 in {d for d, _ in a}  # the lookup doc itself matches
        assert 5 not in {d for d, _ in a}  # epsilon zeta shares nothing
        # k cut is a doc-ascending prefix
        assert eng.search_terms_lookup(0, k=3, boost=1.5) == want[:3]
    finally:
        eng.shutdown()
        teng.shutdown()


def test_graph_explore_parity_and_brute(ts_index, ray_session):
    """ES _graph/explore depth-1: JLH vertices + in-sample distinct-doc
    co-occurrence edges; engine parity and brute-force edge counts."""
    from elasticsearch_assets_ray.search.graph import graph_explore

    info, glb = ts_index
    eng = QueryEngine(info.index_dir, num_actors=2)
    teng = TermPartitionedEngine(glb, num_actors=2)
    try:
        va, ea = graph_explore(eng, "alpha", vertices_size=4,
                               sample_size=10, min_edge_doc_count=1)
        vb, eb = graph_explore(teng, "alpha", vertices_size=4,
                               sample_size=10, min_edge_doc_count=1)
        assert va == vb and ea == eb
        # vertices come from the significant_text scoring (same sample)
        sig = eng.significant_text("alpha", size=4, sample_size=10)
        assert va == sig
        # brute edges: distinct-doc co-occurrence among vertex terms in
        # the sample (= all alpha docs here, fewer than sample_size)
        sample = [set(DOCS[d].split()) for d in range(len(DOCS))
                  if "alpha" in DOCS[d].split()]
        vt = sorted(v["key"] for v in va)
        want = []
        for i, a in enumerate(vt):
            for b in vt[i + 1:]:
                c = sum(1 for s in sample if a in s and b in s)
                if c >= 1:
                    want.append({"source": a, "target": b, "doc_count": c})
        want.sort(key=lambda e: (-e["doc_count"], e["source"], e["target"]))
        assert ea == want
        # min_edge_doc_count filters
        _, e2 = graph_explore(eng, "alpha", vertices_size=4,
                              sample_size=10, min_edge_doc_count=3)
        assert all(e["doc_count"] >= 3 for e in e2)
        assert graph_explore(eng, "zzz_nope") == ([], [])
    finally:
        eng.shutdown()
        teng.shutdown()


def test_retriever_tree_nesting_and_leaves(ts_index, ray_session):
    """ES retriever tree: leaf semantics, engine parity, and NESTED rrf
    == manual two-stage fusion."""
    from elasticsearch_assets_ray.search.hybrid import rrf_fuse
    from elasticsearch_assets_ray.search.retriever import (
        RetrieverContext,
        execute_retriever,
    )

    info, glb = ts_index
    eng = QueryEngine(info.index_dir, num_actors=2)
    teng = TermPartitionedEngine(glb, num_actors=2)
    try:
        ctx = RetrieverContext(eng, info.index_dir)
        tctx = RetrieverContext(teng, info.index_dir)
        # standard leaf == plain search under the contract order
        leaf = {"standard": {"query": "alpha beta"}}
        a = execute_retriever(leaf, ctx, k=5)
        assert [d for d, _ in a] == [d for d, _ in eng.search("alpha beta", k=5)]
        # single-level rrf: engine parity + manual fusion
        spec = {"rrf": {"retrievers": [
            {"standard": {"query": "alpha beta"}},
            {"standard": {"query": "gamma delta"}},
        ], "rank_constant": 60, "rank_window_size": 5}}
        f1 = execute_retriever(spec, ctx, k=8)
        assert f1 == execute_retriever(spec, tctx, k=8)
        r1 = [d for d, _ in eng.search("alpha beta", k=5)]
        r2 = [d for d, _ in eng.search("gamma delta", k=5)]
        assert f1 == rrf_fuse([r1, r2], k=8)
        # NESTED: outer rrf over (inner rrf, a text leaf) == manual
        nested = {"rrf": {"retrievers": [
            spec,
            {"standard": {"query": "epsilon"}},
        ], "rank_constant": 10, "rank_window_size": 4}}
        got = execute_retriever(nested, ctx, k=8)
        inner_ids = [d for d, _ in execute_retriever(spec, ctx, k=4)]
        eps = [d for d, _ in eng.search("epsilon", k=4)]
        assert got == rrf_fuse([inner_ids, eps], k=8, rank_constant=10)
        with pytest.raises(ValueError):
            execute_retriever({"bm42": {}}, ctx)
        with pytest.raises(ValueError):
            execute_retriever({"rrf": {"retrievers": []}}, ctx)
        with pytest.raises(ValueError):
            execute_retriever(
                {"knn": {"query_vector_id": 0}}, ctx
            )  # no embeddings_path
    finally:
        eng.shutdown()
        teng.shutdown()
