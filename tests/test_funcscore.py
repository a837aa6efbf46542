"""function_score with a FUNCTIONS LIST: script expression compiler,
kernel semantics, and shard-engine vs term-engine parity (plus a
non-circular hand brute for the base cases)."""

import math
import pathlib

import numpy as np
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.analysis.tokenizer import clip_tokens, code_tokens
from elasticsearch_assets_ray.search.funcscore import (
    ScriptError,
    ScriptExpr,
    combine_function_score,
    spec_fields,
)


def test_script_expr():
    e = ScriptExpr("log(1 + n_chars) * 0.5 + _score")
    assert e.fields == ["n_chars"]
    env = {"n_chars": np.array([0.0, math.e - 1]),
           "_score": np.array([2.0, 3.0])}
    out = e(env)
    assert abs(out[0] - 2.0) < 1e-12
    assert abs(out[1] - 3.5) < 1e-12
    # doc['field'] form, two-arg fns, unary minus, precedence
    e2 = ScriptExpr("max(doc['a'], 2) * -min(b, 0.5) + pow(2, 3)")
    assert set(e2.fields) == {"a", "b"}
    out2 = e2({"a": np.array([1.0, 4.0]), "b": np.array([0.0, 1.0]),
               "_score": np.zeros(2)})
    assert out2.tolist() == [2 * -0.0 + 8.0, 4 * -0.5 + 8.0]
    # constant expression broadcasts over candidates
    e3 = ScriptExpr("1 + 2 * 3")
    assert e3({"_score": np.zeros(3)}).tolist() == [7.0, 7.0, 7.0]
    with pytest.raises(ScriptError):
        ScriptExpr("__import__('os')")
    with pytest.raises(ScriptError):
        ScriptExpr("a ; b")


def test_spec_fields():
    specs = [
        {"type": "field_value_factor", "field": "dl"},
        {"type": "script_score", "script": "log(1 + n_chars) + _score"},
        {"type": "weight", "weight": 2.0,
         "filter": {"field": "lang", "term": "de"}},
        {"type": "random_score", "seed": 7},
    ]
    assert spec_fields(specs) == ["dl", "n_chars", "lang", "orig_id"]


def test_kernel_hand_computed():
    """Non-circular: tiny arrays, every mode hand-checked."""
    base = np.array([1.0, 2.0, 4.0])
    vals = {
        "x": np.array([3.0, 0.0, 1.0]),
        "lang": np.array(["de", "en", "de"], dtype=object),
    }
    vo = lambda f: vals[f]  # noqa: E731
    fvf = {"type": "field_value_factor", "field": "x", "factor": 1.0,
           "modifier": "none"}
    wde = {"type": "weight", "weight": 10.0,
           "filter": {"field": "lang", "term": "de"}}
    # multiply/multiply: docs 0,2 get x*10; doc 1 gets x (=0)
    out = combine_function_score(base, [fvf, wde], vo, "multiply", "multiply")
    assert out.tolist() == [1 * 30.0, 2 * 0.0, 4 * 10.0]
    # sum/sum: factor = x (+10 where de)
    out = combine_function_score(base, [fvf, wde], vo, "sum", "sum")
    assert out.tolist() == [1 + 13.0, 2 + 0.0, 4 + 11.0]
    # avg: weighted (w=1 for fvf, w=10 for weight-fn): (x + 10*1)/11 on de
    out = combine_function_score(base, [fvf, wde], vo, "avg", "replace")
    assert abs(out[0] - (3 + 10) / 11) < 1e-12
    assert out[1] == 0.0  # only fvf applies: 0/1
    assert abs(out[2] - (1 + 10) / 11) < 1e-12
    # first: fvf wins everywhere (listed first, no filter)
    out = combine_function_score(base, [fvf, wde], vo, "first", "replace")
    assert out.tolist() == [3.0, 0.0, 1.0]
    # max/min across applied functions only
    out = combine_function_score(base, [fvf, wde], vo, "max", "replace")
    assert out.tolist() == [10.0, 0.0, 10.0]
    out = combine_function_score(base, [fvf, wde], vo, "min", "replace")
    assert out.tolist() == [3.0, 0.0, 1.0]
    # max_boost caps the factor before boost_mode
    out = combine_function_score(base, [fvf, wde], vo, "multiply",
                                 "multiply", max_boost=5.0)
    assert out.tolist() == [5.0, 0.0, 20.0]
    # boost_mode avg / max / min
    out = combine_function_score(base, [fvf], vo, "multiply", "avg")
    assert out.tolist() == [(1 + 3) / 2, (2 + 0) / 2, (4 + 1) / 2]
    # docs matching NO function keep base untouched
    only_de = {"type": "field_value_factor", "field": "x",
               "filter": {"field": "lang", "term": "de"}}
    out = combine_function_score(base, [only_de], vo, "multiply", "multiply")
    assert out.tolist() == [3.0, 2.0, 4.0]  # doc 1 untouched
    # random_score: deterministic knuth hash of (id + seed) / 2^32
    vals["orig_id"] = np.array([0, 1, 2], dtype=np.int64)
    rs = {"type": "random_score", "seed": 5, "field": "orig_id"}
    out = combine_function_score(base, [rs], vo, "multiply", "replace")
    want = ((np.array([5, 6, 7], dtype=np.uint64) * np.uint64(2654435761))
            % (np.uint64(1) << np.uint64(32))).astype(float) / 2**32
    assert np.allclose(out, want)


def _an(s):
    return clip_tokens(code_tokens(s), 1, 64)


@pytest.fixture(scope="module")
def fs_index(small_corpus, tmp_path_factory):
    from elasticsearch_assets_ray.config import IndexConfig
    from elasticsearch_assets_ray.index.build import build_index

    idx = tmp_path_factory.mktemp("fsidx") / "idx"
    return build_index(
        small_corpus, idx,
        IndexConfig(partition_target_docs=50, shard_target_docs=100,
                    meta_cols=("repo", "path", "lang", "n_chars"),
                    derived_meta=("n_chars=len_of:content",)),
    )


FS_CASES = [
    ("merge data",
     [{"type": "field_value_factor", "field": "n_chars",
       "factor": 0.01, "modifier": "log1p"},
      {"type": "decay", "function": "gauss", "field": "n_chars",
       "origin": 500.0, "scale": 200.0}],
     "sum", "multiply", None),
    ("merge data",
     [{"type": "weight", "weight": 2.0,
       "filter": {"field": "lang", "term": "python"}},
      {"type": "weight", "weight": 1.5,
       "filter": {"field": "lang", "term": "go"}}],
     "multiply", "sum", None),
    ("import merge",
     [{"type": "script_score",
       "script": "log(1 + n_chars) * 0.1 + _score * 0.5"}],
     "multiply", "replace", None),
    ("merge",
     [{"type": "random_score", "seed": 42, "field": "doc_id",
       "weight": 0.5}],
     "sum", "sum", None),
    ("merge data import",
     [{"type": "field_value_factor", "field": "n_chars",
       "modifier": "sqrt", "weight": 2.0},
      {"type": "weight", "weight": 3.0,
       "filter": {"field": "n_chars", "range": [600, None, True, False]}}],
     "avg", "multiply", None),
    ("merge data",
     [{"type": "field_value_factor", "field": "n_chars",
       "modifier": "sqrt"},
      {"type": "weight", "weight": 4.0}],
     "first", "multiply", 20.0),
]


def test_function_score_multi_engine_parity(fs_index, ray_session, tmp_path):
    """Shard engine vs term engine vs a brute recomputation (base BM25
    from a brute scorer; kernel shared — what's verified non-circularly
    is the match set, the base scores and BOTH hydration paths)."""
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.engine import QueryEngine
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    # brute doc-value arrays, id-aligned: docmeta partitions concatenated
    # in doc_base order put internal id i at row i
    m = fs_index.manifest
    from elasticsearch_assets_ray.index.build import docmeta_path

    parts = sorted(m.partitions, key=lambda p: p.doc_base)
    metas = [pq.read_table(docmeta_path(fs_index.index_dir, p.partition_id))
             for p in parts]
    import pyarrow as pa

    meta_tbl = pa.concat_tables(metas)
    langs = np.array(meta_tbl.column("lang").to_pylist(), dtype=object)
    n_chars_v = meta_tbl.column("n_chars").to_numpy().astype(np.float64)
    internal = meta_tbl.column("doc_id").to_numpy().astype(np.int64)
    assert (internal == np.arange(len(internal))).all()

    out = tmp_path / "global_fs"
    merge_global_postings(fs_index.index_dir, out, n_salts=2,
                          n_buckets=4, store_norms=True)
    eng = QueryEngine(fs_index.index_dir, num_actors=2)
    teng = TermPartitionedEngine(out, num_actors=2)
    try:
        for q, specs, sm, bm, mb in FS_CASES:
            got = eng.search_function_score_multi(
                q, specs, score_mode=sm, boost_mode=bm, max_boost=mb,
                k=1000)
            got_t = teng.search_function_score_multi(
                q, specs, score_mode=sm, boost_mode=bm, max_boost=mb,
                k=1000)
            assert [d for d, _ in got_t] == [d for d, _ in got], (q, sm, bm)
            for (_, s1), (_, s2) in zip(got_t, got):
                assert abs(s1 - s2) < 1e-9, (q, sm, bm)
            # brute base: BM25 disjunction over the analyzed corpus,
            # then the kernel over raw corpus arrays
            base_hits = eng.search(q, k=100000)
            ids = np.array([d for d, _ in base_hits], dtype=np.int64)
            base = np.array([s for _, s in base_hits], dtype=np.float64)
            cols = {"lang": langs[ids], "n_chars": n_chars_v[ids],
                    "doc_id": ids}
            want = combine_function_score(
                base, specs, lambda f: cols[f], sm, bm, mb)
            order = np.lexsort((ids, -want))
            want_rank = [(int(ids[i]), float(want[i])) for i in order]
            assert [d for d, _ in got] == [d for d, _ in want_rank][:len(got)], (q, sm, bm)
            for (_, s1), (_, s2) in zip(got, want_rank):
                assert abs(s1 - s2) < 1e-9, (q, sm, bm)
    finally:
        eng.shutdown()
        teng.shutdown()


def test_rank_feature_kernel():
    """rank_feature saturation/log/sigmoid values; NaN / non-positive
    feature contributes 0 (the doc doesn't match the clause)."""
    base = np.array([1.0, 1.0, 1.0, 1.0])
    feat = np.array([250.0, np.nan, 0.0, 750.0])

    def vo(f):
        assert f == "nc"
        return feat

    out = combine_function_score(
        base,
        [{"type": "rank_feature", "field": "nc", "function": "saturation",
          "pivot": 250.0, "weight": 2.0}],
        vo, score_mode="sum", boost_mode="sum",
    )
    assert abs(out[0] - (1.0 + 2.0 * 0.5)) < 1e-12
    assert out[1] == 1.0 and out[2] == 1.0  # missing / zero → base
    assert abs(out[3] - (1.0 + 2.0 * 0.75)) < 1e-12
    out = combine_function_score(
        base,
        [{"type": "rank_feature", "field": "nc", "function": "log",
          "scaling_factor": 1.0}],
        vo, score_mode="sum", boost_mode="sum",
    )
    assert abs(out[0] - (1.0 + math.log(251.0))) < 1e-12
    assert out[1] == 1.0
    out = combine_function_score(
        base,
        [{"type": "rank_feature", "field": "nc", "function": "sigmoid",
          "pivot": 250.0, "exponent": 2.0}],
        vo, score_mode="sum", boost_mode="sum",
    )
    assert abs(out[0] - 1.5) < 1e-12  # v == pivot → 0.5
    assert abs(out[3] - (1.0 + 0.9 / 1.0)) < 1e-12  # 750²/(750²+250²)=0.9


def test_distance_feature_kernel():
    base = np.zeros(3)
    feat = np.array([300.0, 350.0, np.nan])

    def vo(f):
        return feat

    out = combine_function_score(
        base,
        [{"type": "distance_feature", "field": "nc", "origin": 300.0,
          "pivot": 50.0, "weight": 3.0}],
        vo, score_mode="sum", boost_mode="sum",
    )
    assert abs(out[0] - 3.0) < 1e-12        # at origin → pivot/pivot = 1
    assert abs(out[1] - 1.5) < 1e-12        # dist 50 → 0.5
    assert out[2] == 0.0                    # missing → no contribution


def test_feature_spec_fields():
    assert spec_fields(
        [{"type": "rank_feature", "field": "nc"},
         {"type": "distance_feature", "field": "created_at",
          "origin": 0.0, "pivot": 1.0}]
    ) == ["nc", "created_at"]


def test_script_expr_comparisons_and_mod():
    """The script-QUERY grammar extensions: %, one comparison level —
    1.0/0.0 results, C-style remainder (fmod, not floored mod)."""
    env = {"a": np.array([-7.0, 7.0, 6.0, 5.0]),
           "b": np.array([3.0, 3.0, 3.0, 3.0]),
           "_score": np.zeros(4)}
    assert ScriptExpr("a % b")(env).tolist() == [-1.0, 1.0, 0.0, 2.0]
    assert ScriptExpr("a % b >= 1")(env).tolist() == [0.0, 1.0, 0.0, 1.0]
    assert ScriptExpr("a == 7")(env).tolist() == [0.0, 1.0, 0.0, 0.0]
    assert ScriptExpr("a != 7")(env).tolist() == [1.0, 0.0, 1.0, 1.0]
    assert ScriptExpr("a + 1 < b")(env).tolist() == [1.0, 0.0, 0.0, 0.0]
    # old grammar unchanged (no comparison tokens)
    assert np.allclose(ScriptExpr("a * 2 - b")(env),
                       env["a"] * 2 - env["b"])


def test_script_query_engine_parity(fs_index, ray_session, tmp_path):
    """ES script query (filter context): shard engine vs term layout vs
    a brute doc-values recomputation."""
    from elasticsearch_assets_ray.index.build import docmeta_path
    from elasticsearch_assets_ray.index.global_merge import (
        merge_global_postings,
    )
    from elasticsearch_assets_ray.search.engine import QueryEngine
    from elasticsearch_assets_ray.search.term_engine import (
        TermPartitionedEngine,
    )

    m = fs_index.manifest
    parts = sorted(m.partitions, key=lambda p: p.doc_base)
    metas = [pq.read_table(docmeta_path(fs_index.index_dir, p.partition_id))
             for p in parts]
    import pyarrow as pa

    meta_tbl = pa.concat_tables(metas)
    n_chars_v = meta_tbl.column("n_chars").to_numpy().astype(np.float64)

    out = tmp_path / "global_script"
    merge_global_postings(fs_index.index_dir, out, n_salts=2,
                          n_buckets=4, store_norms=True)
    eng = QueryEngine(fs_index.index_dir, num_actors=2)
    teng = TermPartitionedEngine(out, num_actors=2)
    try:
        for src, pred in [
            ("doc['n_chars'].value % 5 == 2", lambda v: v % 5 == 2),
            ("sqrt(doc['n_chars'].value) > 25",
             lambda v: np.sqrt(v) > 25),
            ("doc['n_chars'].value * 2 - 100 <= 500",
             lambda v: v * 2 - 100 <= 500),
        ]:
            want = np.nonzero(pred(n_chars_v))[0].tolist()
            got = eng.search_script_query(src, k=1 << 30)
            got_t = teng.search_script_query(src, k=1 << 30)
            assert [d for d, _ in got] == want, src
            assert got_t == got, src
            assert all(s == 1.0 for _, s in got)
            # k-cut = smallest ids prefix
            assert eng.search_script_query(src, k=3) == got[:3]
    finally:
        eng.shutdown()
        teng.shutdown()
