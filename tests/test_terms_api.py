"""_terms_enum (both engines: pagination, prefix, brute parity),
scripted_metric (both engines, finalize, brute parity), and
search-template rendering.  Oracle twins run via the contract
pipelines."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.search.template import render_template

WORDS = ["alpha", "alder", "algae", "beta", "bolt", "gamma", "gleam",
         "delta", "dune"]


@pytest.fixture(scope="module")
def engines(tmp_path_factory, ray_session):
    from elasticsearch_assets_ray.config import BM25Params, IndexConfig
    from elasticsearch_assets_ray.index.build import build_index
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.engine import QueryEngine
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    tmp = tmp_path_factory.mktemp("tapi")
    src = tmp / "docs.parquet"
    rng = np.random.default_rng(9)
    n = 180
    texts = [
        " ".join(WORDS[j] for j in rng.integers(0, len(WORDS),
                                                rng.integers(2, 10)))
        for _ in range(n)
    ]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        src,
    )
    cfg = IndexConfig(
        analyzer="simple", text_col="text", lang_col=None, id_col="doc_id",
        meta_cols=("n_chars",), partition_target_docs=24,
        shard_target_docs=60, store_positions=True,
    )
    idx = tmp / "idx"
    build_index(str(src), idx, cfg)
    gdir = tmp / "global"
    merge_global_postings(idx, gdir, n_salts=2, n_buckets=4,
                          hot_df_fraction=0.5, store_norms=True)
    eng = QueryEngine(idx, num_actors=2, params=BM25Params(round_decimals=4))
    teng = TermPartitionedEngine(gdir, num_actors=2, round_decimals=4)
    yield eng, teng, texts
    teng.shutdown()
    eng.shutdown()


def _brute_terms(texts, prefix, after=None):
    from collections import Counter

    df = Counter()
    for t in texts:
        for w in set(t.split()):
            df[w] += 1
    terms = sorted(
        w for w in df
        if w.startswith(prefix) and (after is None or w > after)
    )
    return [(w, df[w]) for w in terms]


def test_terms_enum_parity_and_pagination(engines):
    eng, teng, texts = engines
    for prefix in ("", "al", "g", "zz"):
        want_all = _brute_terms(texts, prefix)
        got = eng.terms_enum(prefix, size=4)
        assert got == want_all[:4], prefix
        assert teng.terms_enum(prefix, size=4) == want_all[:4], prefix
    # paginate with after-cursor: pages concatenate to the full list
    pages, after = [], None
    while True:
        page = eng.terms_enum("", size=3, after=after)
        if not page:
            break
        pages.extend(page)
        after = page[-1][0]
    assert pages == _brute_terms(texts, "")
    assert teng.terms_enum("", size=50) == _brute_terms(texts, "")


def test_scripted_metric_parity(engines):
    eng, teng, texts = engines
    hits = [i for i, t in enumerate(texts)
            if {"alpha", "beta"} & set(t.split())]
    chars = np.array([len(texts[i]) for i in hits], dtype=np.float64)
    want_sum = float((chars * 3 + 1).sum())
    r = eng.scripted_metric("alpha beta", map_script="n_chars * 3 + 1")
    assert r == {"value": want_sum, "doc_count": len(hits)}
    rg = teng.scripted_metric("alpha beta", map_script="n_chars * 3 + 1")
    assert rg == r
    # combine variants + finalize reduce-script
    for combine, want in (
        ("count", float(len(hits))),
        ("min", float((chars * 3 + 1).min())),
        ("max", float((chars * 3 + 1).max())),
        ("avg", float((chars * 3 + 1).sum() / len(hits))),
    ):
        assert eng.scripted_metric(
            "alpha beta", map_script="n_chars * 3 + 1", combine=combine
        )["value"] == pytest.approx(want)
    f = eng.scripted_metric(
        "alpha beta", map_script="n_chars * 3 + 1",
        combine="sum", finalize="value * 2 + n",
    )
    assert f["value"] == want_sum * 2 + len(hits)
    assert teng.scripted_metric(
        "alpha beta", map_script="n_chars * 3 + 1",
        combine="sum", finalize="value * 2 + n",
    ) == f
    # no matches
    z = eng.scripted_metric("zzz", map_script="n_chars")
    assert z == {"value": 0.0, "doc_count": 0}


def test_categorize_keys_vectorized():
    import pyarrow as pa

    from elasticsearch_assets_ray.search.categorize import categorize_keys

    texts = pa.array([
        "Error 404 at /api/user/123: timeout after 30ms",
        "Error 500 at /api/order/9: timeout after 2ms",
        "ok",
        "",
        "a b c d e f g h",
    ])
    keys = categorize_keys(texts, max_tokens=5).to_pylist()
    # digit-bearing tokens are the variable parts — dropped
    assert keys[0] == "Error at api user timeout"
    assert keys[1] == "Error at api order timeout"
    assert keys[2] == "ok" and keys[3] == ""
    assert keys[4] == "a b c d e"


def test_categorize_text_engine_parity(engines):
    eng, teng, texts = engines
    want = {}
    for i, t in enumerate(texts):
        if not ({"alpha", "beta"} & set(t.split())):
            continue
        key = " ".join(t.split()[:3])
        want[key] = want.get(key, 0) + 1
    rows = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    expect = [{"key": k, "doc_count": v} for k, v in rows]
    got = eng.categorize_text("alpha beta", max_tokens=3)
    assert got == expect
    assert teng.categorize_text("alpha beta", max_tokens=3) == expect
    assert eng.categorize_text("alpha beta", max_tokens=3, size=2) == expect[:2]
    assert eng.categorize_text("zzz") == []


def test_frequent_item_sets_brute_parity(engines):
    from collections import Counter

    eng, _, texts = engines
    df = Counter()
    pair = Counter()
    for t in texts:
        toks = sorted(set(t.split()))
        df.update(toks)
        for i, a in enumerate(toks):
            for b in toks[i + 1:]:
                pair[(a, b)] += 1
    ms = 30
    want = [{"items": [t], "support": c} for t, c in df.items() if c >= ms]
    want += [{"items": [a, b], "support": c}
             for (a, b), c in pair.items() if c >= ms]
    want.sort(key=lambda r: (-r["support"], r["items"]))
    got = eng.frequent_item_sets(minimum_support=ms)
    assert got == want and any(len(r["items"]) == 2 for r in got)
    # minimum_set_size=2 drops the singles; size caps
    got2 = eng.frequent_item_sets(minimum_support=ms, minimum_set_size=2)
    assert got2 == [r for r in want if len(r["items"]) == 2]
    assert eng.frequent_item_sets(minimum_support=ms, size=3) == want[:3]
    # term-partitioned twin: identical buckets
    teng = engines[1]
    assert teng.frequent_item_sets(minimum_support=ms) == want
    assert teng.frequent_item_sets(
        minimum_support=ms, minimum_set_size=2) == got2


def test_variable_width_histogram_engine_parity(engines):
    eng, teng, texts = engines
    a = eng.variable_width_histogram("alpha beta", "n_chars", buckets=4)
    b = teng.variable_width_histogram("alpha beta", "n_chars", buckets=4)
    assert a == b and len(a) == 4
    n_hits = sum(1 for t in texts if {"alpha", "beta"} & set(t.split()))
    assert sum(x["doc_count"] for x in a) == n_hits
    assert eng.variable_width_histogram("zzz", "n_chars") == []


def test_msearch_matches_individual(engines):
    eng, _, _ = engines
    reqs = [
        {"query": "alpha beta", "k": 7},
        {"phrase": "gamma delta", "k": 5},
        {"query": "dune", "k": 4},
        {"bool": {"must": "alpha", "must_not": "beta"}, "k": 6},
        {"query": "nosuchterm", "k": 3},
    ]
    got = eng.msearch(reqs)
    assert got[0] == eng.search("alpha beta", k=7)
    assert got[1] == eng.search_phrase("gamma delta", k=5)
    assert got[2] == eng.search("dune", k=4)
    assert got[3] == eng.search_bool(must="alpha", must_not="beta", k=6)
    assert got[4] == []
    with pytest.raises(ValueError):
        eng.msearch([{"nope": 1}])


def test_fuzzy_transpositions_osa():
    from elasticsearch_assets_ray.search.engine import fuzzy_expand_sorted

    terms = sorted(["abcd", "acbd", "abdc", "bacd", "dbca", "abcde"])
    # adjacent swap: 1 edit with OSA, 2 with plain Levenshtein
    plain = dict(fuzzy_expand_sorted(terms, "abcd", max_edits=2))
    osa = dict(fuzzy_expand_sorted(terms, "abcd", max_edits=2,
                                   transpositions=True))
    assert plain["acbd"] == 2 and osa["acbd"] == 1
    assert plain["abdc"] == 2 and osa["abdc"] == 1
    assert plain["bacd"] == 2 and osa["bacd"] == 1
    assert plain["abcd"] == 0 and osa["abcd"] == 0
    assert plain["abcde"] == 1 and osa["abcde"] == 1
    # non-adjacent rearrangement is NOT a single swap
    assert osa["dbca"] == 2
    # max_edits=1: OSA admits the swap, plain does not
    assert "acbd" in dict(fuzzy_expand_sorted(
        terms, "abcd", 1, transpositions=True))
    assert "acbd" not in dict(fuzzy_expand_sorted(terms, "abcd", 1))


def test_fuzzy_transpositions_engine_threading(engines):
    eng, teng, _ = engines
    # "laphа"-style swap against the fixture vocab: "ablha"? use real
    # vocab: "alpha" with an adjacent swap → "aplha"
    got_plain = dict(eng.expand_fuzzy("aplha", fuzziness=1))
    got_osa = dict(eng.expand_fuzzy("aplha", fuzziness=1,
                                    transpositions=True))
    assert "alpha" not in got_plain and got_osa.get("alpha") == 1


def test_render_template():
    assert render_template("lang:{{lang}}", {"lang": "py"}) == "lang:py"
    assert render_template("a {{missing}} b", {}) == "a  b"
    t = "x{{#f}} AND lang:{{lang}}{{/f}}{{^f}} (unfiltered){{/f}}"
    assert render_template(t, {"f": True, "lang": "go"}) == "x AND lang:go"
    assert render_template(t, {}) == "x (unfiltered)"
    nested = "{{#a}}1{{#b}}2{{/b}}{{/a}}"
    assert render_template(nested, {"a": 1, "b": 1}) == "12"
    assert render_template(nested, {"a": 1}) == "1"
    assert render_template(nested, {}) == ""


def test_knn_multi_brute_parity(ray_session, tmp_path):
    import ray.data as rd

    from elasticsearch_assets_ray.ops.similarity import knn_cosine_multi

    rng = np.random.default_rng(4)
    n, d = 120, 8
    emb = rng.normal(0, 1, (n, d))
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(emb.tolist(),
                              pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(t)
    qs = emb[[0, 3]]
    got = knn_cosine_multi(ds, qs, clause_ks=[7, 5], boosts_e1=[10, 5],
                           k=6)
    # brute
    u = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    score = {}
    for ci, (qi, kc, b) in enumerate([(0, 7, 10), (3, 5, 5)]):
        sims = np.round(u @ u[qi], 4)
        order = np.lexsort((np.arange(n), -sims))[:kc]
        for v in order:
            score[v] = score.get(v, 0) + b * int(np.rint(sims[v] * 1e4))
    want = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:6]
    assert list(zip(got.column("vec_id").to_pylist(),
                    got.column("score_e5").to_pylist())) == want


def test_sparse_vector_parity_and_brute(engines):
    """ES ``sparse_vector``: both engines vs a Counter brute (score =
    Σ w·tf, exact floats — binary-exact weights make every sum exact)."""
    from collections import Counter

    eng, teng, texts = engines
    cases = [
        {"alpha": 1.5, "beta": 0.25},
        {"gamma": 2.0, "dune": 0.5, "nosuchtok": 4.0},
        {"bolt": 1.0},
        {},
    ]
    for qv in cases:
        got = eng.search_sparse_vector(qv, k=12)
        got_t = teng.search_sparse_vector(qv, k=12)
        # brute over raw texts (simple analyzer == whitespace here)
        score = Counter()
        for d, t in enumerate(texts):
            c = Counter(t.split())
            s = sum(w * c[tok] for tok, w in qv.items() if c[tok])
            if s:
                score[d] = s
        want = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))
        if want:
            # keep the kth rounded tie class, as the engines do
            kth = round(want[min(11, len(want) - 1)][1], 4)
            want = [kv for i, kv in enumerate(want)
                    if i < 12 or round(kv[1], 4) == kth]
        assert got == [(d, float(s)) for d, s in want], qv
        assert got_t == got, qv


def test_count_api_both_engines(engines):
    """ES _count: exact bool-dict match counts, incl. docmeta range
    filters, identical on both engines and to a brute force."""
    eng, teng, texts = engines
    toks = [set(t.split()) for t in texts]
    nch = [len(t) for t in texts]
    for q, brute in [
        (dict(must="alpha"),
         sum(1 for ts in toks if "alpha" in ts)),
        (dict(must="alpha", must_not="beta"),
         sum(1 for ts in toks if "alpha" in ts and "beta" not in ts)),
        (dict(must="alpha", filter_range={"n_chars": (20, 40)}),
         sum(1 for ts, c in zip(toks, nch)
             if "alpha" in ts and 20 <= c <= 40)),
    ]:
        assert eng.count(q) == brute, q
        assert teng.count(q) == brute, q
