"""Extended ES query surface on the shard-actor engine: wildcard, fuzzy,
keyword-metadata filters, and terms/stats aggregations — each checked
against a brute-force oracle over the analyzed corpus.

The reference delegates all of these to Elasticsearch's query DSL
(``/root/reference/asset/elasticsearch_reader/reader.js`` passes the
compiled query through untouched); here they execute natively on our
postings + docmeta."""

import pathlib
import re

import numpy as np
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.analysis.tokenizer import clip_tokens, code_tokens
from elasticsearch_assets_ray.config import BM25Params
from elasticsearch_assets_ray.search.engine import QueryEngine


@pytest.fixture(scope="module")
def corpus_docs(small_corpus, small_index):
    m = small_index.manifest
    texts, langs = [], []
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        t = pq.read_table(f, columns=["content", "lang"])
        texts.extend(t.column("content").to_pylist())
        langs.extend(t.column("lang").to_pylist())
    toks = [clip_tokens(code_tokens(t), m.min_token_len, m.max_token_len)
            for t in texts]
    return toks, langs


@pytest.fixture(scope="module")
def engine(small_index):
    eng = QueryEngine(small_index.index_dir, num_actors=2)
    yield eng
    eng.shutdown()


def _wild_rx(pattern: str):
    return re.compile(
        "".join(".*" if c == "*" else "." if c == "?" else re.escape(c)
                for c in pattern) + r"\Z"
    )


def test_wildcard_constant_score(engine, corpus_docs):
    toks, _ = corpus_docs
    for pattern in ["me*e", "d?ta", "*cursor", "imp*", "no*match*xx"]:
        rx = _wild_rx(pattern)
        expect = [d for d, ts in enumerate(toks) if any(rx.match(t) for t in ts)]
        res = engine.search_wildcard(pattern, k=7)
        assert [d for d, _ in res] == expect[:7], pattern
        assert all(s == 1.0 for _, s in res)


def test_wildcard_reversed_dictionary_parity():
    """The lazy reversed-dictionary walk for leading-wildcard patterns
    must be result-identical to the full-dictionary scan (incl. cap
    semantics: first N matches in term order)."""
    from elasticsearch_assets_ray.search.engine import (
        trailing_wildcard_literal,
        wildcard_expand_sorted,
    )

    terms = sorted({"cat", "bat", "rat", "ratify", "concat", "carat",
                    "dog", "catalog", "scatter", "a", "xing", "ring",
                    "kingring", "t"})
    rev = sorted(t[::-1] for t in terms)
    for pat in ["*at", "?at", "*cat", "*a*", "*", "*at*", "*r?t", "x*",
                "*ing", "*g", "c*t", "*zzz", "*t"]:
        plain = wildcard_expand_sorted(terms, pat)
        assert wildcard_expand_sorted(terms, pat, rev_list=rev) == plain, pat
        for cap in (1, 2, 3):
            assert (
                wildcard_expand_sorted(terms, pat, cap, rev_list=rev)
                == plain[:cap]
            ), pat
    assert trailing_wildcard_literal("*at") == "at"
    assert trailing_wildcard_literal("*a*") == ""
    assert trailing_wildcard_literal("?x") == "x"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a):
        cur = [i + 1]
        for j, cb in enumerate(b):
            cur.append(min(prev[j] + (ca != cb), prev[j + 1] + 1, cur[j] + 1))
        prev = cur
    return prev[-1]


def test_fuzzy_expansion_matches_bruteforce(engine, corpus_docs):
    toks, _ = corpus_docs
    vocab = sorted({t for ts in toks for t in ts})
    for term, d in [("merge", 1), ("dta", 1), ("cursor", 2)]:
        expect = sorted(
            (t, _lev(term, t)) for t in vocab if _lev(term, t) <= d
        )
        got = engine.expand_fuzzy(term, fuzziness=d, max_expansions=10_000)
        assert got == sorted(expect, key=lambda kv: (kv[1], kv[0])), term


def test_fuzzy_scoring_weighted_bm25(engine, corpus_docs, small_index):
    toks, _ = corpus_docs
    params = BM25Params()
    avgdl = small_index.stats.avgdl
    term, fz = "merge", 1
    exps = engine.expand_fuzzy(term, fuzziness=fz, max_expansions=10_000)
    idf = engine.idfs([t for t, _ in exps])
    weights = {
        t: idf[t] * (1.0 - dist / max(1, min(len(term), len(t))))
        for t, dist in exps
    }
    dl = np.array([len(ts) for ts in toks], dtype=np.float64)
    scores = np.zeros(len(toks))
    for t in sorted(weights):
        for d, ts in enumerate(toks):
            tf = ts.count(t)
            if tf:
                scores[d] += weights[t] * tf * (params.k1 + 1) / (
                    tf + params.k1 * (1 - params.b + params.b * dl[d] / avgdl)
                )
    order = np.lexsort((np.arange(len(toks)), -scores))
    expect = [(int(d), scores[d]) for d in order[:5] if scores[d] > 0]
    got = engine.search_fuzzy(term, fuzziness=fz, max_expansions=10_000, k=5)
    assert [d for d, _ in got] == [d for d, _ in expect]
    for (d1, s1), (_, s2) in zip(got, expect):
        assert abs(s1 - s2) < 1e-9


def test_fuzzy_prefix_length_and_cap(engine):
    # prefix_length pins the exact prefix: every expansion shares it
    for t, dist in engine.expand_fuzzy("merge", fuzziness=2, prefix_length=3,
                                       max_expansions=10_000):
        assert t.startswith("mer"), t
    # the cap keeps the (dist asc, term asc) head
    full = engine.expand_fuzzy("merge", fuzziness=2, max_expansions=10_000)
    capped = engine.expand_fuzzy("merge", fuzziness=2, max_expansions=3)
    assert capped == sorted(full, key=lambda kv: (kv[1], kv[0]))[:3]


def test_bool_meta_filter(engine, corpus_docs, small_index):
    toks, langs = corpus_docs
    params = BM25Params()
    avgdl = small_index.stats.avgdl
    term = "data"
    allowed = ["python", "go"]
    idf = engine.idfs([term])
    dl = np.array([len(ts) for ts in toks], dtype=np.float64)
    scores = np.zeros(len(toks))
    for d, ts in enumerate(toks):
        tf = ts.count(term)
        if tf and langs[d] in allowed:
            scores[d] = idf[term] * tf * (params.k1 + 1) / (
                tf + params.k1 * (1 - params.b + params.b * dl[d] / avgdl)
            )
    order = np.lexsort((np.arange(len(toks)), -scores))
    expect = [int(d) for d in order[:5] if scores[d] > 0]
    got = engine.search_bool(must=term, filter_meta={"lang": allowed}, k=5)
    assert [d for d, _ in got] == expect
    # filter-only semantics: docs outside the lang set never appear
    got_all = engine.search_bool(must=term, filter_meta={"lang": allowed}, k=1000)
    assert all(langs[d] in allowed for d, _ in got_all)


def test_aggregate_terms_and_stats(engine, corpus_docs):
    toks, langs = corpus_docs
    q = "merge data"
    qterms = {"merge", "data"}
    match = [d for d, ts in enumerate(toks) if qterms & set(ts)]
    expect: dict = {}
    for d in match:
        g = langs[d]
        c, s, mn, mx = expect.get(g, (0, 0.0, float("inf"), float("-inf")))
        dl = float(len(toks[d]))
        expect[g] = (c + 1, s + dl, min(mn, dl), max(mx, dl))
    buckets = engine.aggregate(q, group_by="lang", stats_on="dl")
    assert [b["key"] for b in buckets] == [
        g for g, _ in sorted(expect.items(), key=lambda kv: (-kv[1][0], kv[0]))
    ]
    for b in buckets:
        c, s, mn, mx = expect[b["key"]]
        assert b["doc_count"] == c
        assert abs(b["sum"] - s) < 1e-9
        assert b["min"] == mn and b["max"] == mx
        assert abs(b["avg"] - s / c) < 1e-9
    # count-only variant
    counts = engine.aggregate(q, group_by="lang")
    assert {b["key"]: b["doc_count"] for b in counts} == {
        g: v[0] for g, v in expect.items()
    }


def test_more_like_this_bruteforce(engine, corpus_docs, small_index):
    import math

    toks, _ = corpus_docs
    params = BM25Params()
    avgdl = small_index.stats.avgdl
    n = small_index.stats.num_docs
    dfs: dict = {}
    for ts in toks:
        for t in set(ts):
            dfs[t] = dfs.get(t, 0) + 1

    def idf(t):
        return math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))

    for src in [3, 42, 250]:
        tf = {}
        for t in toks[src]:
            tf[t] = tf.get(t, 0) + 1
        cand = [(-(c * idf(t)), t) for t, c in tf.items()
                if c >= 2 and dfs.get(t, 0) >= 5]
        cand.sort()
        sel = sorted(t for _, t in cand[:10])
        msm = max(1, int(len(sel) * 0.3))
        dl = np.array([len(ts) for ts in toks], dtype=np.float64)
        scores = np.zeros(len(toks))
        for d, ts in enumerate(toks):
            hits = sum(1 for t in sel if t in ts)
            if d == src or hits < msm:
                continue
            for t in sel:
                f = ts.count(t)
                if f:
                    scores[d] += idf(t) * f * (params.k1 + 1) / (
                        f + params.k1 * (1 - params.b + params.b * dl[d] / avgdl)
                    )
        order = np.lexsort((np.arange(len(toks)), -scores))
        expect = [int(d) for d in order[:5] if scores[d] > 0]
        got = engine.more_like_this(
            src, k=5, max_query_terms=10, min_term_freq=2, min_doc_freq=5,
            minimum_should_match=0.3,
        )
        assert [d for d, _ in got] == expect, src


def test_search_after_pagination(engine):
    """Page 1 + search_after page 2 == the top-2k of one big search, for
    every query; cursor filtering happens before shard-local top-k, so
    pages never lose docs (the deep-pagination correctness property)."""
    for q in ["merge data", "import", "parse config value"]:
        full = engine.search(q, k=20)
        if len(full) < 12:
            continue
        page1 = engine.search(q, k=10)
        last_doc, last_score = page1[-1]
        # cursor order = the sort keys (score, doc_id), as in ES
        page2 = engine.search(q, k=10, search_after=(last_score, last_doc))
        assert page1 + page2 == full[: len(page1) + len(page2)], q
        # a cursor mid-tie-class resumes strictly after its doc id
        assert all(d not in {x for x, _ in page1} for d, _ in page2)


def test_multi_match_bruteforce(small_corpus, small_index, tmp_path_factory):
    """multi_match over (content, path) field indexes vs a brute-force
    per-field BM25 combine — best_fields (DisMax + tie_breaker) and
    most_fields (sum), with boosts; per-field analyzers, df and avgdl."""
    import math
    import pathlib

    from elasticsearch_assets_ray.config import IndexConfig
    from elasticsearch_assets_ray.index.build import build_index
    from elasticsearch_assets_ray.search.multifield import MultiFieldEngine

    # second field index: same corpus, same partition plan, path column
    pidx = build_index(
        small_corpus,
        tmp_path_factory.mktemp("pathidx") / "idx",
        IndexConfig(partition_target_docs=50, shard_target_docs=100,
                    text_col="path", lang_col=None, meta_cols=()),
    )
    texts, paths = [], []
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        t = pq.read_table(f, columns=["content", "path"])
        texts.extend(t.column("content").to_pylist())
        paths.extend(t.column("path").to_pylist())
    field_toks = {
        "content": [clip_tokens(code_tokens(t), 1, 64) for t in texts],
        "path": [clip_tokens(code_tokens(p), 1, 64) for p in paths],
    }
    params = BM25Params()
    n = len(texts)

    def field_scores(field, qterms):
        toks = field_toks[field]
        dl = np.array([len(ts) for ts in toks], dtype=np.float64)
        avgdl = dl.sum() / n
        sc = np.zeros(n)
        for t in sorted(set(qterms)):
            df = sum(1 for ts in toks if t in ts)
            if df == 0:
                continue
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for d, ts in enumerate(toks):
                tf = ts.count(t)
                if tf:
                    sc[d] += idf * tf * (params.k1 + 1) / (
                        tf + params.k1 * (1 - params.b + params.b * dl[d] / avgdl)
                    )
        return sc

    eng = MultiFieldEngine(
        {"content": str(small_index.index_dir), "path": str(pidx.index_dir)},
        num_actors=2,
    )
    try:
        for q in ["merge data", "src module import"]:
            qt = clip_tokens(code_tokens(q), 1, 64)
            sc_c = field_scores("content", qt)
            sc_p = field_scores("path", qt) * 2.0  # boost
            for mm, tie, combine in [
                ("best_fields", 0.0, lambda a, b: np.maximum(a, b)),
                ("best_fields", 0.3,
                 lambda a, b: np.maximum(a, b) + 0.3 * (a + b - np.maximum(a, b))),
                ("most_fields", 0.0, lambda a, b: a + b),
            ]:
                comb = combine(sc_c, sc_p)
                order = np.lexsort((np.arange(n), -comb))
                expect = [(int(d), comb[d]) for d in order[:8] if comb[d] > 0]
                got = eng.multi_match(
                    q, fields={"content": 1.0, "path": 2.0}, type=mm,
                    tie_breaker=tie, k=8,
                )
                assert [d for d, _ in got] == [d for d, _ in expect], (q, mm, tie)
                for (_, s1), (_, s2) in zip(got, expect):
                    assert abs(s1 - s2) < 1e-9, (q, mm, tie)
        # cross_fields: TERM-centric — blended df (max across fields),
        # per-field tf/dl/avgdl/boost, DisMax + tie per term, sum terms
        boosts = {"content": 1.0, "path": 2.0}
        dls = {f: np.array([len(ts) for ts in field_toks[f]], dtype=np.float64)
               for f in boosts}
        avgdls = {f: dls[f].sum() / n for f in boosts}
        for q in ["merge data", "src module import"]:
            qt = clip_tokens(code_tokens(q), 1, 64)
            for tie in (0.0, 0.3):
                comb = np.zeros(n)
                for t in sorted(set(qt)):
                    blend = max(
                        sum(1 for ts in field_toks[f] if t in ts)
                        for f in boosts
                    )
                    if blend == 0:
                        continue
                    idf = math.log(1.0 + (n - blend + 0.5) / (blend + 0.5))
                    per = []
                    for f, boost in boosts.items():
                        sc = np.zeros(n)
                        for d, ts in enumerate(field_toks[f]):
                            tf = ts.count(t)
                            if tf:
                                sc[d] = boost * idf * tf * (params.k1 + 1) / (
                                    tf + params.k1 * (1 - params.b
                                    + params.b * dls[f][d] / avgdls[f]))
                        per.append(sc)
                    M = np.stack(per)
                    best = M.max(axis=0)
                    comb += best + tie * (M.sum(axis=0) - best)
                order = np.lexsort((np.arange(n), -comb))
                expect = [(int(d), comb[d]) for d in order[:8] if comb[d] > 0]
                got = eng.multi_match(q, fields=boosts, type="cross_fields",
                                      tie_breaker=tie, k=8)
                assert [d for d, _ in got] == [d for d, _ in expect], (q, tie)
                for (_, s1), (_, s2) in zip(got, expect):
                    assert abs(s1 - s2) < 1e-9, (q, tie)
    finally:
        eng.shutdown()


def test_bool_range_filter(engine, corpus_docs):
    """filter_range on a numeric docmeta column (dl): inclusive gte/lte
    bounds gate without scoring, open bounds work."""
    toks, _ = corpus_docs
    term = "data"
    lo, hi = 30, 80
    got = engine.search_bool(must=term, filter_range={"dl": (lo, hi)}, k=1000)
    expect = {d for d, ts in enumerate(toks)
              if term in ts and lo <= len(ts) <= hi}
    assert {d for d, _ in got} == expect
    got_open = engine.search_bool(must=term, filter_range={"dl": (None, hi)},
                                  k=1000)
    assert {d for d, _ in got_open} == {
        d for d, ts in enumerate(toks) if term in ts and len(ts) <= hi
    }


def test_ids_and_exists_queries(engine, small_index):
    # ids: constant score, sorted, out-of-range ids dropped
    got = engine.search_ids([5, 2, 399, 2, 10**9])
    assert got == [(2, 1.0), (5, 1.0), (399, 1.0)]
    assert engine.search_ids([]) == []
    assert engine.search_ids([7, 3, 1], k=2) == [(1, 1.0), (3, 1.0)]
    # exists: every doc has a non-null lang in this corpus
    got = engine.search_exists("lang", k=6)
    assert got == [(d, 1.0) for d in range(6)]


def test_ids_query_masks_tombstones(small_corpus, tmp_path):
    from elasticsearch_assets_ray.config import IndexConfig
    from elasticsearch_assets_ray.index.build import build_index
    from elasticsearch_assets_ray.index.deletes import delete_docs

    idx = tmp_path / "idx"
    build_index(small_corpus, idx,
                IndexConfig(partition_target_docs=50, shard_target_docs=100))
    delete_docs(idx, [5, 7])
    eng = QueryEngine(idx, num_actors=2)
    try:
        assert eng.search_ids([4, 5, 6, 7, 8]) == [
            (4, 1.0), (6, 1.0), (8, 1.0)
        ]
    finally:
        eng.shutdown()


def test_aggregate_over_bool_query(engine, corpus_docs):
    """Aggregations accept a full bool-clause dict as the query (ES: any
    query under a terms agg) — brute-force parity incl. filters."""
    toks, langs = corpus_docs
    q = dict(must="data", must_not="window", filter_meta={"lang": ["python", "go", "c"]})
    match = [
        d for d, ts in enumerate(toks)
        if "data" in ts and "window" not in ts
        and langs[d] in ("python", "go", "c")
    ]
    expect: dict = {}
    for d in match:
        g = langs[d]
        c, s = expect.get(g, (0, 0.0))
        expect[g] = (c + 1, s + len(toks[d]))
    buckets = engine.aggregate(q, group_by="lang", stats_on="dl")
    assert {b["key"]: (b["doc_count"], b["sum"]) for b in buckets} == expect
    # bucket order: count desc, key asc
    assert [b["key"] for b in buckets] == [
        g for g, _ in sorted(expect.items(), key=lambda kv: (-kv[1][0], kv[0]))
    ]


def test_regexp_constant_score(engine, corpus_docs):
    toks, _ = corpus_docs
    for pattern in ["me[a-z]+e", "d.ta", "(imp|exp)ort(s|ed)?",
                    "[a-z]{3}sor", "zz+x?"]:
        rx = re.compile(pattern + r"\Z")
        expect = [d for d, ts in enumerate(toks)
                  if any(rx.match(t) for t in ts)]
        res = engine.search_regexp(pattern, k=7)
        assert [d for d, _ in res] == expect[:7], pattern
        assert all(s == 1.0 for _, s in res)


def test_regexp_expand_sorted_kernel():
    from elasticsearch_assets_ray.search.engine import regexp_expand_sorted

    terms = sorted(["abc", "ab", "a", "abd", "bcd", "zebra", "zzz"])
    # quantifier right after the literal run: "ab*" must still match "a"
    assert regexp_expand_sorted(terms, "ab*") == ["a", "ab"]
    assert regexp_expand_sorted(terms, "ab.") == ["abc", "abd"]
    assert regexp_expand_sorted(terms, "ab?c") == ["abc"]
    # alternation has no literal prefix — full-dictionary scan
    assert regexp_expand_sorted(terms, "(zebra|bcd)") == ["bcd", "zebra"]
    assert regexp_expand_sorted(terms, "ab.", cap=1) == ["abc"]
    assert regexp_expand_sorted(terms, "q+") == []


def test_apply_decay_formulas():
    from elasticsearch_assets_ray.search.engine import apply_decay

    v = np.array([0.0, 10.0, 20.0, 40.0])
    # gauss: value at origin = 1, at origin±scale = decay
    g = apply_decay(v, "gauss", origin=10.0, scale=10.0, decay=0.5)
    assert abs(g[1] - 1.0) < 1e-12
    assert abs(g[0] - 0.5) < 1e-12 and abs(g[2] - 0.5) < 1e-12
    # exp: decay^(d/scale)
    e = apply_decay(v, "exp", origin=0.0, scale=10.0, decay=0.5)
    assert np.allclose(e, [1.0, 0.5, 0.25, 0.0625])
    # linear hits zero at s = scale/(1-decay) and stays there
    ln = apply_decay(v, "linear", origin=0.0, scale=10.0, decay=0.5)
    assert np.allclose(ln, [1.0, 0.5, 0.0, 0.0])
    # offset carves a flat top
    o = apply_decay(v, "gauss", origin=10.0, scale=10.0, offset=10.0,
                    decay=0.5)
    assert abs(o[0] - 1.0) < 1e-12 and abs(o[2] - 1.0) < 1e-12
    import pytest as _pt
    with _pt.raises(ValueError):
        apply_decay(v, "gauss", 0.0, 0.0)
    with _pt.raises(ValueError):
        apply_decay(v, "gauss", 0.0, 1.0, decay=1.0)
    with _pt.raises(ValueError):
        apply_decay(v, "triangle", 0.0, 1.0)


def test_decay_score_bruteforce(engine, corpus_docs):
    import math

    toks, _ = corpus_docs
    n = len(toks)
    dl = np.array([len(t) for t in toks], dtype=np.float64)
    avgdl = dl.mean()
    k1, b = 1.2, 0.75

    def idf(t):
        df = sum(1 for tk in toks if t in tk)
        return math.log(1 + (n - df + 0.5) / (df + 0.5))

    for fn, og, sc, of, bm in [
        ("gauss", 12.0, 6.0, 0.0, "multiply"),
        ("exp", 0.0, 20.0, 2.0, "sum"),
        ("linear", 15.0, 10.0, 0.0, "multiply"),
    ]:
        qterms = ["merge", "data"]
        base = {}
        for t in sorted(qterms):
            w = idf(t)
            for d, tk in enumerate(toks):
                tf = tk.count(t)
                if tf:
                    base[d] = base.get(d, 0.0) + (
                        w * tf * (k1 + 1)
                        / (tf + k1 * (1 - b + b * dl[d] / avgdl)))
        from elasticsearch_assets_ray.search.engine import apply_decay
        want = []
        for d, s in base.items():
            f = float(apply_decay(np.array([dl[d]]), fn, og, sc, of, 0.5)[0])
            want.append((d, s * f if bm == "multiply" else s + f))
        want.sort(key=lambda p: (-p[1], p[0]))
        got = engine.search_decay_score(
            "merge data", field="dl", function=fn, origin=og, scale=sc,
            offset=of, boost_mode=bm, k=10,
        )
        assert [d for d, _ in got] == [d for d, _ in want[:10]], fn
        for (_, s1), (_, s2) in zip(got, want):
            assert abs(s1 - s2) < 1e-9, fn


def test_combined_fields_bruteforce(small_corpus, small_index,
                                    tmp_path_factory):
    """ES combined_fields vs a hand brute: ONE pseudo-field — blended
    tf/dl, union df, Σ w_f·avgdl_f — scored with plain BM25.  A term
    hitting both fields must count ONCE in df and saturate through one
    tf curve (the term-centric BM25F semantics)."""
    import math
    import pathlib

    from elasticsearch_assets_ray.config import IndexConfig
    from elasticsearch_assets_ray.index.build import build_index
    from elasticsearch_assets_ray.search.multifield import MultiFieldEngine

    pidx = build_index(
        small_corpus,
        tmp_path_factory.mktemp("cfpathidx") / "idx",
        IndexConfig(partition_target_docs=50, shard_target_docs=100,
                    text_col="path", lang_col=None, meta_cols=()),
    )
    texts, paths = [], []
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        t = pq.read_table(f, columns=["content", "path"])
        texts.extend(t.column("content").to_pylist())
        paths.extend(t.column("path").to_pylist())
    toks_of = {
        "content": [clip_tokens(code_tokens(t), 1, 64) for t in texts],
        "path": [clip_tokens(code_tokens(p), 1, 64) for p in paths],
    }
    w = {"content": 1.0, "path": 2.0}
    params = BM25Params()
    n = len(texts)
    dl_c = np.array(
        [w["content"] * len(toks_of["content"][d])
         + w["path"] * len(toks_of["path"][d]) for d in range(n)],
        dtype=np.float64,
    )
    avgdl_c = sum(
        w[f] * (sum(len(ts) for ts in toks_of[f]) / n)
        for f in sorted(w)
    )

    def brute(qterms):
        sc = np.zeros(n)
        for t in sorted(set(qterms)):
            tf_c = np.array(
                [w["content"] * toks_of["content"][d].count(t)
                 + w["path"] * toks_of["path"][d].count(t)
                 for d in range(n)], dtype=np.float64)
            df = int(np.count_nonzero(tf_c > 0))
            if df == 0:
                continue
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            m = tf_c > 0
            sc[m] += idf * tf_c[m] * (params.k1 + 1) / (
                tf_c[m] + params.k1
                * (1 - params.b + params.b * dl_c[m] / avgdl_c))
        return sc

    eng = MultiFieldEngine(
        {"content": str(small_index.index_dir), "path": str(pidx.index_dir)},
        num_actors=2,
    )
    try:
        for q in ["merge data", "src module import"]:
            qt = clip_tokens(code_tokens(q), 1, 64)
            sc = brute(qt)
            order = np.lexsort((np.arange(n), -sc))
            expect = [(int(d), sc[d]) for d in order[:8] if sc[d] > 0]
            got = eng.combined_fields(q, fields=w, k=8)
            assert [d for d, _ in got] == [d for d, _ in expect], q
            for (_, s1), (_, s2) in zip(got, expect):
                assert abs(s1 - s2) < 1e-9, q
        # analyzer-mismatch guard: ES requires one shared analyzer
        import pytest as _pt
        eng2 = None
        try:
            idx2 = build_index(
                small_corpus,
                tmp_path_factory.mktemp("cfwhite") / "idx",
                IndexConfig(partition_target_docs=50,
                            shard_target_docs=100, analyzer="text",
                            text_col="path", lang_col=None, meta_cols=()),
            )
            eng2 = MultiFieldEngine(
                {"content": str(small_index.index_dir),
                 "path": str(idx2.index_dir)}, num_actors=1)
            with _pt.raises(ValueError, match="shared analyzer"):
                eng2.combined_fields("merge data", fields=w, k=5)
        finally:
            if eng2 is not None:
                eng2.shutdown()
    finally:
        eng.shutdown()


def test_query_rules_criteria_and_fold():
    from elasticsearch_assets_ray.search.rules import (
        apply_ruleset,
        criterion_matches,
    )

    meta = {"user_query": "hash join", "user_country": "DE-BY", "n": 7}
    assert criterion_matches({"type": "always"}, meta)
    assert criterion_matches(
        {"type": "exact", "metadata": "user_query",
         "values": ["x", "hash join"]}, meta)
    assert not criterion_matches(
        {"type": "exact", "metadata": "user_query", "values": ["hash"]},
        meta)
    assert criterion_matches(
        {"type": "prefix", "metadata": "user_country", "values": ["DE"]},
        meta)
    assert criterion_matches(
        {"type": "suffix", "metadata": "user_country", "values": ["BY"]},
        meta)
    assert criterion_matches(
        {"type": "contains", "metadata": "user_query", "values": ["sh j"]},
        meta)
    assert criterion_matches(
        {"type": "gte", "metadata": "n", "values": [7]}, meta)
    assert not criterion_matches(
        {"type": "gt", "metadata": "n", "values": [7]}, meta)
    assert not criterion_matches(
        {"type": "exact", "metadata": "missing", "values": ["x"]}, meta)

    ruleset = [
        {"type": "pinned",
         "criteria": [{"type": "always"}],
         "actions": {"ids": [5, 9]}},
        {"type": "pinned",   # ALL criteria must match — this one misses
         "criteria": [{"type": "always"},
                      {"type": "exact", "metadata": "user_query",
                       "values": ["nope"]}],
         "actions": {"ids": [1]}},
        {"type": "pinned",   # dedup keeps 9's first position
         "criteria": [{"type": "always"}],
         "actions": {"ids": [9, 12]}},
        {"type": "exclude",
         "criteria": [{"type": "always"}],
         "actions": {"ids": [12, 77]}},
    ]
    pinned, excluded = apply_ruleset(ruleset, meta)
    assert pinned == [5, 9]          # 12 pinned-then-excluded drops
    assert excluded == {12, 77}
