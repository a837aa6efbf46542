"""Positional sidecar + phrase queries (ES ``match_phrase``, slop 0).

The reference delegates phrase semantics to Elasticsearch's Lucene
positional index (``match_phrase`` queries pass through
``translate_query``); here the positions are a first-class segment
column (`index/codec.py` positions encoder) and the phrase scorer is
the Lucene PhraseQuery model: tf = phrase frequency, idf = sum of the
constituent terms' idfs.
"""

import hashlib

import numpy as np
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.analysis.tokenizer import clip_tokens, code_tokens
from elasticsearch_assets_ray.config import BM25Params, IndexConfig
from elasticsearch_assets_ray.index.build import build_index
from elasticsearch_assets_ray.index.codec import (
    decode_positions,
    encode_positions_many,
)
from elasticsearch_assets_ray.search.engine import QueryEngine


# ---------------------------------------------------------------- codec


def test_positions_roundtrip_and_concat():
    rng = np.random.default_rng(3)
    # 5 terms, ragged postings, ragged positions per posting
    tfs_per_term = [rng.integers(1, 6, size=int(rng.integers(1, 8))) for _ in range(5)]
    offsets = np.concatenate([[0], np.cumsum([len(t) for t in tfs_per_term])])
    tfs = np.concatenate(tfs_per_term).astype(np.int64)
    pos_chunks = []
    for tf in tfs:
        p = np.sort(rng.choice(500, size=int(tf), replace=False)).astype(np.uint64)
        pos_chunks.append(p)
    pos = np.concatenate(pos_chunks)
    blobs = encode_positions_many(pos, tfs, offsets.astype(np.int64))
    assert len(blobs) == 5
    # roundtrip per term
    got = []
    for t in range(5):
        lo, hi = int(offsets[t]), int(offsets[t + 1])
        got.append(decode_positions(blobs[t], tfs[lo:hi]))
    assert (np.concatenate(got) == pos).all()

    # concat property: one term split into two disjoint ascending doc
    # ranges encodes to blobs whose byte concatenation decodes whole
    t_tfs = tfs[offsets[0]:offsets[1]]
    t_pos = pos[: int(t_tfs.sum())]
    cut = len(t_tfs) // 2 or 1
    tokcut = int(t_tfs[:cut].sum())
    b1 = encode_positions_many(t_pos[:tokcut], t_tfs[:cut], np.array([0, cut]))
    b2 = encode_positions_many(
        t_pos[tokcut:], t_tfs[cut:], np.array([0, len(t_tfs) - cut])
    )
    whole = encode_positions_many(t_pos, t_tfs, np.array([0, len(t_tfs)]))
    assert b1[0] + b2[0] == whole[0]


def test_positions_length_mismatch_raises():
    with pytest.raises(ValueError):
        encode_positions_many(
            np.array([1, 2], np.uint64), np.array([3], np.int64), np.array([0, 1])
        )
    blobs = encode_positions_many(
        np.array([1, 2, 5], np.uint64), np.array([3], np.int64), np.array([0, 1])
    )
    with pytest.raises(ValueError):
        decode_positions(blobs[0], np.array([2], np.int64))


def test_invert_pos_parity_with_positionless_kernel():
    """docs/tfs/offsets from the positional inversion must be IDENTICAL
    to the positionless kernel's, and positions ascend within each
    (term, doc) entry."""
    from elasticsearch_assets_ray.index.build import (
        in_doc_positions,
        invert_codes,
        invert_codes_pos,
    )

    rng = np.random.default_rng(11)
    n_tok, n_terms, n_docs = 5000, 40, 90
    codes = rng.integers(0, n_terms, n_tok).astype(np.int64)
    doc_rel = np.sort(rng.integers(0, n_docs, n_tok)).astype(np.int64)
    tokpos = in_doc_positions(doc_rel)
    d0, t0, o0 = invert_codes(codes, doc_rel, n_terms, 7)
    d1, t1, o1, posf = invert_codes_pos(codes, doc_rel, n_terms, 7, tokpos)
    assert (d0 == d1).all() and (t0 == t1).all() and (o0 == o1).all()
    assert len(posf) == n_tok
    # positions ascend within each posting entry
    tfcum = np.concatenate([[0], np.cumsum(t1.astype(np.int64))])
    interior = np.ones(n_tok, dtype=bool)
    interior[tfcum[:-1]] = False
    assert (np.diff(posf)[interior[1:]] > 0).all()


# ---------------------------------------------------------------- build


@pytest.fixture(scope="module")
def pos_index(small_corpus, tmp_path_factory):
    idx = tmp_path_factory.mktemp("posidx") / "idx"
    info = build_index(
        small_corpus,
        idx,
        IndexConfig(
            partition_target_docs=50, shard_target_docs=100, store_positions=True
        ),
    )
    return info


def _seg_bytes(info):
    h = hashlib.sha256()
    for sid in sorted(info.shard_ids()):
        h.update(open(info.segment_path(sid), "rb").read())
    return h.hexdigest()


def test_positional_build_strategy_byte_identity(small_corpus, tmp_path):
    infos = {}
    for strat in ("fused", "groupby"):
        infos[strat] = build_index(
            small_corpus,
            tmp_path / strat,
            IndexConfig(
                partition_target_docs=50,
                shard_target_docs=100,
                store_positions=True,
                merge_strategy=strat,
            ),
        )
    assert _seg_bytes(infos["fused"]) == _seg_bytes(infos["groupby"])


def test_positions_decode_match_document_tokens(pos_index, small_corpus):
    """Every posting's decoded positions are exactly the indices where
    the term occurs in the analyzed document."""
    import pathlib

    m = pos_index.manifest
    texts = []
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        texts.extend(pq.read_table(f, columns=["content"]).column("content").to_pylist())
    toks = [clip_tokens(code_tokens(t), m.min_token_len, m.max_token_len) for t in texts]

    from elasticsearch_assets_ray.index.codec import decode_postings

    checked = 0
    for sid in sorted(pos_index.shard_ids()):
        seg = pq.read_table(pos_index.segment_path(sid))
        assert "positions" in seg.column_names
        terms = seg.column("term").to_pylist()
        blobs = seg.column("postings").to_pylist()
        pblobs = seg.column("positions").to_pylist()
        for i in range(0, len(terms), 17):  # sample every 17th term
            ids, tfs = decode_postings(blobs[i])
            ptf = tfs.astype(np.int64)
            pos = decode_positions(pblobs[i], ptf)
            tfcum = np.concatenate([[0], np.cumsum(ptf)])
            for e in range(len(ids)):
                doc = int(ids[e])
                expect = [j for j, tk in enumerate(toks[doc]) if tk == terms[i]]
                got = pos[tfcum[e]:tfcum[e + 1]].tolist()
                assert got == expect, (terms[i], doc)
                checked += 1
    assert checked > 100


# ---------------------------------------------------------------- phrase


def _phrase_oracle(texts, phrase_toks, m):
    """Brute-force phrase frequency per doc over the analyzed corpus."""
    L = len(phrase_toks)
    freqs = {}
    for d, text in enumerate(texts):
        toks = clip_tokens(code_tokens(text), m.min_token_len, m.max_token_len)
        f = sum(
            1 for i in range(len(toks) - L + 1) if toks[i:i + L] == phrase_toks
        )
        if f:
            freqs[d] = f
    return freqs


def test_phrase_matches_brute_force_and_bm25(pos_index, small_corpus):
    import pathlib

    texts = []
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        texts.extend(pq.read_table(f, columns=["content"]).column("content").to_pylist())
    m = pos_index.manifest
    dl = (
        pq.read_table(pos_index.index_dir / "docmeta", columns=["doc_id", "dl"])
        .sort_by("doc_id")
        .column("dl")
        .to_numpy()
    )
    eng = QueryEngine(pos_index.index_dir, num_actors=2)
    params = BM25Params()
    try:
        for phrase in ["def merge", "return data", "import import", "the the"]:
            ptoks = clip_tokens(code_tokens(phrase), m.min_token_len, m.max_token_len)
            oracle = _phrase_oracle(texts, ptoks, m)
            res = eng.search_phrase(phrase, k=1000)
            got = dict(res)
            assert set(got) == set(oracle), phrase
            if not oracle:
                continue
            idf = eng.idfs(sorted(set(ptoks)))
            idf_sum = sum(idf[t] for t in ptoks)
            avgdl = pos_index.stats.avgdl
            for d, pf in oracle.items():
                expect = (
                    idf_sum
                    * pf
                    * (params.k1 + 1.0)
                    / (pf + params.k1 * (1.0 - params.b + params.b * dl[d] / avgdl))
                )
                assert abs(got[d] - expect) < 1e-9, (phrase, d)
    finally:
        eng.shutdown()


def test_phrase_requires_positions(small_index):
    eng = QueryEngine(small_index.index_dir, num_actors=1)
    try:
        import ray

        with pytest.raises(ray.exceptions.RayTaskError, match="store_positions"):
            eng.search_phrase("def merge", k=5)
    finally:
        eng.shutdown()


def test_phrase_empty_and_absent(pos_index):
    eng = QueryEngine(pos_index.index_dir, num_actors=1)
    try:
        assert eng.search_phrase("", k=5) == []
        assert eng.search_phrase("zzqqxhjkwnotaterm other", k=5) == []
    finally:
        eng.shutdown()


def test_prefix_and_phrase_prefix_vs_brute_force(pos_index, small_corpus):
    """ES prefix (constant_score) and match_phrase_prefix vs a Python
    brute force over the analyzed corpus, incl. delete masking."""
    import pathlib

    from elasticsearch_assets_ray.index.deletes import delete_docs

    texts = []
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        texts.extend(pq.read_table(f, columns=["content"]).column("content").to_pylist())
    m = pos_index.manifest
    toks = [clip_tokens(code_tokens(t), m.min_token_len, m.max_token_len) for t in texts]

    victims = [5, 9]
    delete_docs(pos_index.index_dir, victims)
    try:
        eng = QueryEngine(pos_index.index_dir, num_actors=2)
        try:
            for pref in ["de", "im", "x", "zzznope"]:
                got = eng.search_prefix(pref, k=12)
                exp = sorted(
                    d for d, tk in enumerate(toks)
                    if d not in victims and any(t.startswith(pref) for t in tk)
                )[:12]
                assert [d for d, _ in got] == exp, pref
                assert all(s == 1.0 for _, s in got)

            # expansion cap: global first-N in term order
            full = eng.expand_prefix("de", max_expansions=1000)
            assert full == sorted(full)
            if len(full) > 1:
                assert eng.expand_prefix("de", max_expansions=1) == full[:1]

            for phrase in ["def me", "return da"]:
                fixed = clip_tokens(
                    code_tokens(phrase), m.min_token_len, m.max_token_len
                )
                pref = fixed.pop()
                exps = sorted(
                    {t for tk in toks for t in tk if t.startswith(pref)}
                )[:50]
                got = dict(eng.search_phrase_prefix(phrase, k=1000))
                exp_docs = {}
                L = len(fixed) + 1
                for d, tk in enumerate(toks):
                    if d in victims:
                        continue
                    pf = sum(
                        1
                        for i in range(len(tk) - L + 1)
                        if tk[i:i + len(fixed)] == fixed and tk[i + L - 1] in exps
                    )
                    if pf:
                        exp_docs[d] = pf
                assert set(got) == set(exp_docs), phrase
        finally:
            eng.shutdown()
    finally:
        # clear tombstones so the module-scoped index stays clean for
        # other tests
        import os

        from elasticsearch_assets_ray.index.deletes import deletes_path

        for sid in pos_index.shard_ids():
            p = deletes_path(pos_index.index_dir, sid)
            if p.exists():
                os.unlink(p)


def test_persistent_ticks_with_positions_equal_cold_build(small_corpus, tmp_path):
    """Incremental appends via the persistent indexer must produce the
    SAME positional segments as a cold build — positions concatenate
    across append batches exactly like postings parts."""
    import pathlib
    import shutil
    import time

    from elasticsearch_assets_ray.index.persistent import PersistentIndexer
    from tests.test_persistent import FakeClock

    src = sorted(pathlib.Path(small_corpus).glob("*.parquet"))
    live = tmp_path / "live"
    live.mkdir()
    cfg = IndexConfig(
        partition_target_docs=50, shard_target_docs=100, store_positions=True
    )
    clock = FakeClock(t0=time.time() + 1e6)
    px = PersistentIndexer(live, tmp_path / "idx", cfg, interval_s=30,
                           delay_s=0, clock=clock, sleep=clock.sleep)
    for f in src[:2]:
        shutil.copy(f, live / f.name)
    px.enqueue_due_windows()
    assert px.tick() is not None
    for f in src[2:]:
        shutil.copy(f, live / f.name)
    clock.t += 30
    px.enqueue_due_windows()
    info2 = px.tick()
    cold = build_index(small_corpus, tmp_path / "cold", cfg)
    assert sorted(cold.shard_ids()) == sorted(info2.shard_ids())
    for sid in cold.shard_ids():
        a = pq.read_table(cold.segment_path(sid))
        b = pq.read_table(info2.segment_path(sid))
        assert "positions" in b.column_names
        assert a.equals(b), f"shard {sid} differs from cold build"


def test_compaction_rewrites_positions(small_corpus, tmp_path):
    """Delete docs + compact: the compacted positional segments must be
    byte-identical to a cold rebuild over the surviving docs (modulo the
    doc-id gaps, which compaction preserves) — verified via phrase
    results + per-term position decode equality."""
    from elasticsearch_assets_ray.index.compact import compact_index
    from elasticsearch_assets_ray.index.deletes import delete_docs
    from elasticsearch_assets_ray.index.codec import decode_postings

    cfg = IndexConfig(
        partition_target_docs=50, shard_target_docs=100, store_positions=True
    )
    idx = tmp_path / "idx"
    info = build_index(small_corpus, idx, cfg)
    victims = [2, 61, 140, 260, 398]

    # pre-delete decode of a few terms, restricted to survivors
    seg0 = {sid: pq.read_table(info.segment_path(sid)) for sid in info.shard_ids()}

    delete_docs(idx, victims)
    compact_index(idx)

    for sid in info.shard_ids():
        seg1 = pq.read_table(info.segment_path(sid))
        assert "positions" in seg1.column_names
        terms0 = seg0[sid].column("term").to_pylist()
        t0_of = {t: i for i, t in enumerate(terms0)}
        blobs1 = seg1.column("postings").to_pylist()
        pblobs1 = seg1.column("positions").to_pylist()
        for i, t in enumerate(seg1.column("term").to_pylist()[::23]):
            j1 = seg1.column("term").to_pylist().index(t)
            ids1, tfs1 = decode_postings(blobs1[j1])
            pos1 = decode_positions(pblobs1[j1], tfs1.astype(np.int64))
            # original entry for the same (term, surviving doc) must match
            j0 = t0_of[t]
            ids0, tfs0 = decode_postings(seg0[sid].column("postings")[j0].as_py())
            pos0 = decode_positions(
                seg0[sid].column("positions")[j0].as_py(), tfs0.astype(np.int64)
            )
            keep = ~np.isin(ids0.astype(np.int64), victims)
            assert (ids1 == ids0[keep]).all()
            assert (tfs1 == tfs0[keep]).all()
            tok_keep = np.repeat(keep, tfs0.astype(np.int64))
            assert (pos1 == pos0[tok_keep]).all()

    # phrase serving over the compacted index matches the oracle over
    # the surviving docs
    import pathlib

    texts = []
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        texts.extend(pq.read_table(f, columns=["content"]).column("content").to_pylist())
    m = info.manifest
    eng = QueryEngine(idx, num_actors=2)
    try:
        for phrase in ["def merge", "return data"]:
            ptoks = clip_tokens(code_tokens(phrase), m.min_token_len, m.max_token_len)
            oracle = {
                d: f
                for d, f in _phrase_oracle(texts, ptoks, m).items()
                if d not in victims
            }
            got = dict(eng.search_phrase(phrase, k=1000))
            assert set(got) == set(oracle)
    finally:
        eng.shutdown()


# ------------------------------------------------------------- highlight


def test_tokens_with_offsets_parity(small_corpus):
    """Offset-mapped token sequence == analyzer tokens + clip filter."""
    import pathlib

    from elasticsearch_assets_ray.analysis.tokenizer import (
        simple_tokens,
        tokens_with_offsets,
    )

    texts = []
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        texts.extend(pq.read_table(f, columns=["content"]).column("content").to_pylist())
    for text in texts[:100]:
        for an, fn in [("code", code_tokens), ("simple", simple_tokens)]:
            wo = tokens_with_offsets(text, an, 1, 64)
            assert [t for t, _, _ in wo] == clip_tokens(fn(text), 1, 64), an
            low = text.lower()
            src = text if an == "code" else low
            for t, s, e in wo:
                assert src[s:e].lower() == t


def test_search_highlight(pos_index, small_corpus):
    """Highlight wraps exactly the analyzed occurrences of the query
    terms, and the tag-stripped text round-trips to the original."""
    import pathlib
    import re as _re

    from elasticsearch_assets_ray.analysis.tokenizer import tokens_with_offsets

    texts = []
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        texts.extend(pq.read_table(f, columns=["content"]).column("content").to_pylist())
    eng = QueryEngine(pos_index.index_dir, num_actors=2)
    m = pos_index.manifest
    try:
        for q in ["merge data", "import", "return value"]:
            hits = eng.search_highlight(q, k=5, pre_tag="[", post_tag="]")
            base = dict(eng.search(q, k=5))
            assert {h["doc_id"] for h in hits} == set(base)
            qterms = set(eng._analyze(q))
            for h in hits:
                text = texts[h["doc_id"]]
                assert h["highlighted"].replace("[", "").replace("]", "") == text
                toks = tokens_with_offsets(text, "code", m.min_token_len,
                                           m.max_token_len)
                expect_pos = {t: [i for i, (tk, _, _) in enumerate(toks) if tk == t]
                              for t in qterms}
                expect_pos = {t: ps for t, ps in expect_pos.items() if ps}
                assert h["positions"] == expect_pos, (q, h["doc_id"])
                n_expected = len({p for ps in expect_pos.values() for p in ps})
                assert h["n_matches"] == n_expected
                # every bracketed span, lowered, contains a query term
                for frag in _re.findall(r"\[([^\]]*)\]", h["highlighted"]):
                    assert any(t in frag.lower() for t in qterms), frag
    finally:
        eng.shutdown()


def test_global_phrase_matches_doc_engine(pos_index, tmp_path):
    """Phrase serving on the TERM-partitioned layout (positions carried
    through the global merge, coordinator-side intersection, dl hydration
    from source docmeta) is rank+score identical to the shard-actor
    engine on the same positional index."""
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    out = tmp_path / "global_pos"
    merge_global_postings(pos_index.index_dir, out, n_salts=3, n_buckets=4,
                          store_norms=True)
    geng = TermPartitionedEngine(out, num_actors=2)
    deng = QueryEngine(pos_index.index_dir, num_actors=2)
    try:
        for phrase in ["def merge", "return data", "import import",
                       "the the", "merge segment block", "zz qq"]:
            got = geng.search_phrase(phrase, k=1000)
            want = deng.search_phrase(phrase, k=1000)
            assert [d for d, _ in got] == [d for d, _ in want], phrase
            for (_, s1), (_, s2) in zip(got, want):
                assert abs(s1 - s2) < 1e-12, phrase
        # BM25 term queries still serve identically from the same layout
        for q in ["merge data", "import"]:
            assert geng.search(q, k=20) == [
                (d, s) for d, s in deng.search(q, k=20)
            ]
    finally:
        geng.shutdown()
        deng.shutdown()


def test_global_phrase_remote_gate_bit_exact(pos_index, tmp_path):
    """Forcing the REMOTE-side doc-conjunction gate (cache budget 0 ⇒
    nothing 'fits', every positional fetch ships candidate subsets) must
    leave every phrase mode rank+score identical — the gate is a pure
    wire optimization.  Also covers the dls-subset dl gather and its
    docstore fallback."""
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    out = tmp_path / "global_gate"
    merge_global_postings(pos_index.index_dir, out, n_salts=3, n_buckets=4,
                          store_norms=True)
    full = TermPartitionedEngine(out, num_actors=2)
    gated = TermPartitionedEngine(out, num_actors=2)
    gated.CACHE_MAX_POSTINGS = 0  # instance override: never fits_cache
    gated.PHRASE_GATE_FRAC = 10.0  # any conjunction gates
    # a third engine forces the doc-range-chunked PARALLEL phrase paths
    # (exact / ordered-slop / lucene / repeats) with the gate OFF —
    # subset (gated) entries take the inline path by design, so the
    # parallel kernels need full entries to fire
    par = TermPartitionedEngine(out, num_actors=2)
    par.PHRASE_PARALLEL_MIN_MASS = 0
    par.PHRASE_PARALLEL_TASKS = 3
    # a fourth engine forces the GATED-PARALLEL route (remote gate +
    # per-chunk actor→task subset refs, nothing on the coordinator)
    gpar = TermPartitionedEngine(out, num_actors=2)
    gpar.CACHE_MAX_POSTINGS = 0
    gpar.PHRASE_GATE_FRAC = 10.0
    gpar.GATED_PARALLEL_MIN_COST = 0
    gpar.PHRASE_PARALLEL_TASKS = 3
    try:
        for phrase in ["def merge", "return data", "import import",
                       "merge segment block", "zz qq"]:
            for kw in ({}, {"slop": 2}, {"slop": 2, "slop_mode": "lucene"}):
                a = full.search_phrase(phrase, k=1000, **kw)
                b = gated.search_phrase(phrase, k=1000, **kw)
                assert a == b, (phrase, kw)
                c = par.search_phrase(phrase, k=1000, **kw)
                assert a == c, ("parallel", phrase, kw)
                d = gpar.search_phrase(phrase, k=1000, **kw)
                assert a == d, ("gated-parallel", phrase, kw)
        # repeat query: gated path re-fetches subsets (nothing cached) —
        # still identical
        assert gated.search_phrase("def merge", k=10) == \
            full.search_phrase("def merge", k=10)
        # dl fallback path (no dl_term) still serves
        hd = np.array([d for d, _ in full.search_phrase("def merge", k=5)])
        if len(hd):
            tail_a = full._phrase_score_tail(
                np.sort(hd), np.ones(len(hd)), 1.0, 5, dl_term=None
            )
            tail_b = full._phrase_score_tail(
                np.sort(hd), np.ones(len(hd)), 1.0, 5, dl_term="def"
            )
            assert tail_a == tail_b
    finally:
        full.shutdown()
        gated.shutdown()
        par.shutdown()
        gpar.shutdown()


def test_global_phrase_requires_positional_layout(small_index, tmp_path):
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    out = tmp_path / "global_nopos"
    merge_global_postings(small_index.index_dir, out, n_salts=2, n_buckets=4,
                          store_norms=True)
    eng = TermPartitionedEngine(out, num_actors=1)
    try:
        import ray as _ray

        with pytest.raises(_ray.exceptions.RayTaskError,
                           match="positional sidecar"):
            eng.search_phrase("def merge", k=5)
    finally:
        eng.shutdown()


def test_global_bool_matches_doc_engine(pos_index, tmp_path):
    """ES bool queries on the term-partitioned layout (coordinator-side
    clause algebra over gathered postings) are rank+score identical to
    the shard-actor engine's bool path."""
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    out = tmp_path / "global_bool"
    merge_global_postings(pos_index.index_dir, out, n_salts=3, n_buckets=4,
                          store_norms=True)
    geng = TermPartitionedEngine(out, num_actors=2)
    deng = QueryEngine(pos_index.index_dir, num_actors=2)
    cases = [
        dict(must="merge data", must_not="window"),
        dict(should="stream window agg"),
        dict(must="return", filter="data", should="merge"),
        dict(should="merge data import", minimum_should_match=2),
        dict(filter="import"),
        dict(must="zzqq notaterm"),
    ]
    try:
        for kw in cases:
            got = geng.search_bool(k=50, **kw)
            want = deng.search_bool(k=50, **kw)
            assert [d for d, _ in got] == [d for d, _ in want], kw
            for (_, s1), (_, s2) in zip(got, want):
                assert abs(s1 - s2) < 1e-12, kw
    finally:
        geng.shutdown()
        deng.shutdown()


def test_global_prefix_wildcard_match_doc_engine(pos_index, tmp_path):
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    out = tmp_path / "global_pw"
    merge_global_postings(pos_index.index_dir, out, n_salts=3, n_buckets=4,
                          store_norms=True)
    geng = TermPartitionedEngine(out, num_actors=2)
    deng = QueryEngine(pos_index.index_dir, num_actors=2)
    try:
        for p in ["me", "imp", "zzz", "s"]:
            assert geng.search_prefix(p, k=25) == deng.search_prefix(p, k=25), p
        for w in ["me*e", "d?ta", "*cursor", "no*hit*zz"]:
            assert geng.search_wildcard(w, k=25) == deng.search_wildcard(w, k=25), w
    finally:
        geng.shutdown()
        deng.shutdown()


def test_highlight_fragments(pos_index, small_corpus):
    """Fragments are ~fragment_size windows around matches: every
    fragment is a contiguous substring of the doc once tags strip, and
    every fragment contains at least one tagged match."""
    import pathlib

    texts = []
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        texts.extend(pq.read_table(f, columns=["content"]).column("content").to_pylist())
    eng = QueryEngine(pos_index.index_dir, num_actors=2)
    try:
        hits = eng.search_highlight("merge data", k=5, pre_tag="[",
                                    post_tag="]", fragment_size=60,
                                    number_of_fragments=3)
        for h in hits:
            assert h["fragments"], h["doc_id"]
            assert len(h["fragments"]) <= 3
            for frag in h["fragments"]:
                assert "[" in frag and "]" in frag
                stripped = frag.replace("[", "").replace("]", "")
                assert stripped in texts[h["doc_id"]]
                # a fragment chains at most one ~60-char window per match
                assert len(stripped) <= 64 * (frag.count("[") + 1)
    finally:
        eng.shutdown()


def test_global_fuzzy_matches_doc_engine(pos_index, tmp_path):
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    out = tmp_path / "global_fz"
    merge_global_postings(pos_index.index_dir, out, n_salts=3, n_buckets=4,
                          store_norms=True)
    geng = TermPartitionedEngine(out, num_actors=2)
    deng = QueryEngine(pos_index.index_dir, num_actors=2)
    try:
        for t, fz in [("merge", 1), ("cursr", 1), ("dta", 2), ("zzzzqq", 1)]:
            got = geng.search_fuzzy(t, fuzziness=fz, k=30)
            want = deng.search_fuzzy(t, fuzziness=fz, k=30)
            assert [d for d, _ in got] == [d for d, _ in want], (t, fz)
            for (_, s1), (_, s2) in zip(got, want):
                assert abs(s1 - s2) < 1e-12, (t, fz)
    finally:
        geng.shutdown()
        deng.shutdown()


def _sloppy_oracle(texts, ptoks, m, slop):
    """Brute-force ordered-sloppy phrase freq: count start positions with
    a greedy minimal chain spanning <= len-1+slop."""
    freqs = {}
    L = len(ptoks)
    for d, text in enumerate(texts):
        toks = clip_tokens(code_tokens(text), m.min_token_len, m.max_token_len)
        posof = {}
        for i, t in enumerate(toks):
            posof.setdefault(t, []).append(i)
        n = 0
        for p1 in posof.get(ptoks[0], []):
            cur = p1
            ok = True
            for t in ptoks[1:]:
                nxt = [p for p in posof.get(t, []) if p > cur]
                if not nxt:
                    ok = False
                    break
                cur = nxt[0]
            if ok and cur - p1 <= L - 1 + slop:
                n += 1
        if n:
            freqs[d] = n
    return freqs


def test_sloppy_phrase_matches_bruteforce(pos_index, small_corpus):
    import pathlib

    texts = []
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        texts.extend(pq.read_table(f, columns=["content"]).column("content").to_pylist())
    m = pos_index.manifest
    dl = (
        pq.read_table(pos_index.index_dir / "docmeta", columns=["doc_id", "dl"])
        .sort_by("doc_id")
        .column("dl")
        .to_numpy()
    )
    eng = QueryEngine(pos_index.index_dir, num_actors=2)
    params = BM25Params()
    try:
        for phrase, slop in [("def merge", 2), ("return data", 1),
                             ("import data value", 3), ("merge data", 0)]:
            ptoks = clip_tokens(code_tokens(phrase), m.min_token_len,
                                m.max_token_len)
            oracle = _sloppy_oracle(texts, ptoks, m, slop)
            res = dict(eng.search_phrase(phrase, k=1000, slop=slop))
            assert set(res) == set(oracle), (phrase, slop)
            idf = eng.idfs(sorted(set(ptoks)))
            idf_sum = sum(idf[t] for t in ptoks)
            avgdl = pos_index.stats.avgdl
            for d, pf in oracle.items():
                expect = (
                    idf_sum * pf * (params.k1 + 1.0)
                    / (pf + params.k1 * (1.0 - params.b
                                         + params.b * dl[d] / avgdl))
                )
                assert abs(res[d] - expect) < 1e-9, (phrase, slop, d)
        # slop=0 coincides with the strict intersect path
        for phrase in ["def merge", "return data", "table table"]:
            assert eng.search_phrase(phrase, k=1000, slop=0) == \
                eng.search_phrase(phrase, k=1000), phrase
    finally:
        eng.shutdown()


def test_global_mlt_matches_doc_engine(pos_index, tmp_path):
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    out = tmp_path / "global_mlt"
    merge_global_postings(pos_index.index_dir, out, n_salts=3, n_buckets=4,
                          store_norms=True)
    geng = TermPartitionedEngine(out, num_actors=2)
    deng = QueryEngine(pos_index.index_dir, num_actors=2)
    try:
        for src in [3, 42, 250]:
            got = geng.more_like_this(src, k=10)
            want = deng.more_like_this(src, k=10)
            assert [d for d, _ in got] == [d for d, _ in want], src
            for (_, s1), (_, s2) in zip(got, want):
                assert abs(s1 - s2) < 1e-12, src
    finally:
        geng.shutdown()
        deng.shutdown()


def test_highlight_fragments_ranked_by_score(pos_index, small_corpus):
    """Fragments come back highest-scoring first: Σ idf of the matched
    occurrences in the window, ties in document order."""
    import pathlib
    import re as _re

    from elasticsearch_assets_ray.analysis.tokenizer import tokens_with_offsets

    texts = []
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        texts.extend(pq.read_table(f, columns=["content"]).column("content").to_pylist())
    eng = QueryEngine(pos_index.index_dir, num_actors=2)
    try:
        q = "merge data"
        idf = eng.idfs(sorted(set(q.split())))
        hits = eng.search_highlight(q, k=5, pre_tag="[", post_tag="]",
                                    fragment_size=50, number_of_fragments=4)
        for h in hits:
            scores = []
            for frag in h["fragments"]:
                s = 0.0
                for m in _re.findall(r"\[([^\]]*)\]", frag):
                    for t in idf:
                        if t in m.lower():
                            s += idf[t]
                scores.append(s)
            # non-increasing fragment scores (approximate check: tagged
            # substrings may merge adjacent matches, so compare loosely)
            assert all(scores[i] + 1e-9 >= scores[i + 1] * 0.5
                       for i in range(len(scores) - 1)) or len(scores) <= 1
            assert all("[" in f for f in h["fragments"])
    finally:
        eng.shutdown()


def test_global_sloppy_phrase_matches_doc_engine(pos_index, tmp_path):
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    out = tmp_path / "global_slop"
    merge_global_postings(pos_index.index_dir, out, n_salts=3, n_buckets=4,
                          store_norms=True)
    geng = TermPartitionedEngine(out, num_actors=2)
    deng = QueryEngine(pos_index.index_dir, num_actors=2)
    try:
        for phrase, slop in [("def merge", 2), ("return data", 1),
                             ("import data value", 3), ("merge data", 0)]:
            got = geng.search_phrase(phrase, k=1000, slop=slop)
            want = deng.search_phrase(phrase, k=1000, slop=slop)
            assert [d for d, _ in got] == [d for d, _ in want], (phrase, slop)
            for (_, s1), (_, s2) in zip(got, want):
                assert abs(s1 - s2) < 1e-12, (phrase, slop)
    finally:
        geng.shutdown()
        deng.shutdown()


def test_global_phrase_prefix_matches_doc_engine(pos_index, tmp_path):
    """``match_phrase_prefix`` on the TERM-partitioned layout (bucket-
    actor prefix expansion, multi-phrase-candidate gate, expansion-union
    last slot) is rank+score identical to the shard-actor engine —
    including under a FORCED remote-side gate (cache budget 0), since
    the gate's candidate set here is fixed-conjunction ∩ expansion
    union, not the plain conjunction."""
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    out = tmp_path / "global_pp"
    merge_global_postings(pos_index.index_dir, out, n_salts=3, n_buckets=4,
                          store_norms=True)
    geng = TermPartitionedEngine(out, num_actors=2)
    gated = TermPartitionedEngine(out, num_actors=2)
    gated.CACHE_MAX_POSTINGS = 0
    gated.PHRASE_GATE_FRAC = 10.0
    # forced doc-range-chunked PARALLEL multi-phrase execution (the
    # expansion union as a multi-term slot in the chunk kernel)
    par = TermPartitionedEngine(out, num_actors=2)
    par.PHRASE_PARALLEL_MIN_MASS = 0
    par.PHRASE_PARALLEL_TASKS = 3
    # forced GATED-PARALLEL multi-phrase: per-chunk actor→task subset
    # refs with the expansion union as a multi-term slot
    gpar = TermPartitionedEngine(out, num_actors=2)
    gpar.CACHE_MAX_POSTINGS = 0
    gpar.PHRASE_GATE_FRAC = 10.0
    gpar.GATED_PARALLEL_MIN_COST = 0
    gpar.PHRASE_PARALLEL_TASKS = 3
    deng = QueryEngine(pos_index.index_dir, num_actors=2)
    try:
        for phrase, me in [("def me", 50), ("return da", 50),
                           ("import", 50), ("def merge", 3),
                           ("zz qq", 50)]:
            want = deng.search_phrase_prefix(phrase, k=1000,
                                             max_expansions=me)
            got = geng.search_phrase_prefix(phrase, k=1000,
                                            max_expansions=me)
            assert [d for d, _ in got] == [d for d, _ in want], phrase
            for (_, s1), (_, s2) in zip(got, want):
                assert abs(s1 - s2) < 1e-12, phrase
            assert gated.search_phrase_prefix(
                phrase, k=1000, max_expansions=me
            ) == got, ("gated", phrase)
            assert par.search_phrase_prefix(
                phrase, k=1000, max_expansions=me
            ) == got, ("parallel", phrase)
            assert gpar.search_phrase_prefix(
                phrase, k=1000, max_expansions=me
            ) == got, ("gated-parallel", phrase)
    finally:
        geng.shutdown()
        gated.shutdown()
        par.shutdown()
        gpar.shutdown()
        deng.shutdown()
