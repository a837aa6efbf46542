"""Lucene-exact sloppy phrase: hand-computed matcher values, random
parity vs the naive reference transcription, and cross-engine identity
on adversarial reordered fixtures."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.search.sloppy import (
    check_no_repeats,
    lucene_sloppy_freq,
    sloppy_freq_reference,
    sloppy_freqs_for_candidates,
)


def _freq(slots, slop):
    return lucene_sloppy_freq([np.array(s, dtype=np.int64) for s in slots], slop)


def test_matcher_hand_computed():
    # exact adjacency weighs 1.0
    assert _freq([[0], [1]], 0) == 1.0
    assert _freq([[0], [1]], 3) == 1.0
    # reversed pair: matchLength 2 → needs slop ≥ 2, weighs 1/3
    # (the ES docs' example: "foo bar" slop 2 matches "bar foo")
    assert _freq([[1], [0]], 1) == 0.0
    assert _freq([[1], [0]], 2) == pytest.approx(1.0 / 3.0)
    # two exact occurrences accumulate: "a b a b"
    assert _freq([[0, 2], [1, 3]], 0) == 2.0
    # "a a b": the tightest alignment wins, one match of weight 1.0
    assert _freq([[0, 1], [2]], 2) == 1.0
    # one-position gap: matchLength 1 → 1/2
    assert _freq([[0], [2]], 1) == pytest.approx(0.5)
    # absent slot → 0
    assert _freq([[0], []], 4) == 0.0
    # single-term phrase: every occurrence is an exact match
    assert _freq([[3, 9, 17]], 2) == 3.0
    # three terms reordered: a@2 b@0 c@1 → effs 2, -1, -1; ml = 3
    assert _freq([[2], [0], [1]], 2) == 0.0
    assert _freq([[2], [0], [1]], 3) == pytest.approx(0.25)


def test_matcher_matches_reference_on_random_docs():
    rng = np.random.default_rng(29)
    for trial in range(300):
        nslots = int(rng.integers(2, 5))
        slots = []
        for _ in range(nslots):
            npos = int(rng.integers(1, 7))
            slots.append(sorted(set(rng.integers(0, 25, npos).tolist())))
        slop = int(rng.integers(0, 6))
        got = lucene_sloppy_freq(
            [np.array(s, dtype=np.int64) for s in slots], slop
        )
        want = sloppy_freq_reference(slots, slop)
        assert got == pytest.approx(want), (slots, slop)


def test_repeats_matcher_hand_computed():
    """Lucene repeat semantics: slots of one repeat group occupy DISTINCT
    token positions; collisions advance the lesser phrase position."""
    from elasticsearch_assets_ray.search.sloppy import (
        lucene_sloppy_freq_repeats,
        repeat_groups_of,
    )

    def f(slots, slop, groups):
        return lucene_sloppy_freq_repeats(
            [np.array(s, dtype=np.int64) for s in slots], slop, groups
        )

    # "a a" over doc "a a a": matches (0,1) and (1,2), both exact
    assert f([[0, 1, 2], [0, 1, 2]], 0, [[0, 1]]) == pytest.approx(2.0)
    # "a a" over a single-position doc: the two slots cannot take
    # distinct positions → no match at ANY slop
    for slop in range(6):
        assert f([[3], [3]], slop, [[0, 1]]) == 0.0
    # "data config data" over itself: one exact match
    assert f([[0, 2], [1], [0, 2]], 0, [[0, 2]]) == pytest.approx(1.0)
    # "a b a" over "a b" (one a): impossible
    assert f([[0], [1], [0]], 4, [[0, 2]]) == 0.0
    # "a b a" over "a b a a": ml-0 match plus a slopped one
    got = f([[0, 2, 3], [1], [0, 2, 3]], 2, [[0, 2]])
    assert got >= 1.0
    # groups helper
    assert repeat_groups_of(["data", "config", "data"]) == [[0, 2]]
    assert repeat_groups_of(["a", "b"]) == []


def test_repeat_plan_multi_term_grouping():
    """Lucene gatherRptGroups, hasMultiTermRpts branch: groups come from
    TERM-CONNECTIVITY over repeating terms (unionTermGroups)."""
    from elasticsearch_assets_ray.search.sloppy import repeat_plan

    # single-term phrases: per-term groups, multi=False
    assert repeat_plan(["data", "config", "data"]) == ([[0, 2]], False)
    assert repeat_plan(["a", "b"]) == ([], False)
    # a multi-term slot WITHOUT repeats: no groups, multi=True
    assert repeat_plan([["a", "b"], "c"]) == ([], True)
    # repeated term among alternatives (the match_phrase_prefix shape)
    assert repeat_plan([["a", "x"], "b", "a"]) == ([[0, 2]], True)
    # transitive connectivity: slot0 {a,b}, slot1 {b,c}, slot2 {c} —
    # a repeats nowhere alone but b links 0-1 and c links 1-2 → ONE group
    assert repeat_plan([["a", "b"], ["b", "c"], ["c"]]) == (
        [[0, 1, 2]], True)
    # two independent repeat chains stay separate groups
    assert repeat_plan([["a"], ["a"], ["b", "z"], ["b"]]) == (
        [[0, 1], [2, 3]], True)


def test_repeats_matcher_multi_term_hand_computed():
    """Hand-walked Lucene multi-term repeat machinery (complex init +
    shared main loop) on MultiPhraseQuery-shaped slots; slot position
    arrays are the alternatives' unions."""
    from elasticsearch_assets_ray.search.sloppy import (
        lucene_sloppy_freq_repeats,
        repeat_plan,
    )

    def f(slots, slop, phrase):
        groups, multi = repeat_plan(phrase)
        assert multi
        return lucene_sloppy_freq_repeats(
            [np.array(s, dtype=np.int64) for s in slots], slop, groups,
            multi_term=multi,
        )

    # phrase (a|b) a over "a b a": a=[0,2] b=[1]; slot unions
    # [0,1,2] / [0,2].  One exact window ("b a" at tokens 1-2) — the
    # init collision (both streams at token 0) advances slot1 to a@2.
    ph = [["a", "b"], ["a"]]
    for slop in range(4):
        assert f([[0, 1, 2], [0, 2]], slop, ph) == pytest.approx(1.0)
    # phrase (a|b) (a|c) over "c a b a c": unions [1,2,3] / [0,1,3,4].
    # Exact "b a" (tokens 2-3) and "a c" (tokens 3-4); the reversed
    # "c a" window (tokens 0-1) needs slop ≥ 2 and weighs 1/3.
    ph = [["a", "b"], ["a", "c"]]
    assert f([[1, 2, 3], [0, 1, 3, 4]], 0, ph) == pytest.approx(2.0)
    assert f([[1, 2, 3], [0, 1, 3, 4]], 1, ph) == pytest.approx(2.0)
    assert f([[1, 2, 3], [0, 1, 3, 4]], 2, ph) == pytest.approx(2.0 + 1 / 3)
    # phrase (a|b) a over "a b": both streams collide at token 0, the
    # lesser (slot1) has nowhere to advance → no match at any slop
    # (Lucene's conservative union-collision outcome)
    ph = [["a", "b"], ["a"]]
    for slop in range(5):
        assert f([[0, 1], [0]], slop, ph) == 0.0


def test_repeats_matcher_multi_init_equals_simple_on_pure_repeats():
    """When every repeated term's position list is shared verbatim (the
    single-term-repeat regime), the multi-term init must land on the
    same state as the simple init — a dead alternative (absent from the
    doc) must not change results."""
    from elasticsearch_assets_ray.search.sloppy import (
        lucene_sloppy_freq_repeats,
        repeat_plan,
    )

    rng = np.random.default_rng(47)
    g_simple, m0 = repeat_plan(["a", "b", "a"])
    g_multi, m1 = repeat_plan([["a", "x"], "b", "a"])
    assert (g_simple, m0) == ([[0, 2]], False)
    assert (g_multi, m1) == ([[0, 2]], True)
    for _ in range(200):
        a_pos = sorted(set(rng.integers(0, 20, rng.integers(1, 6)).tolist()))
        b_pos = sorted(set(rng.integers(0, 20, rng.integers(1, 6)).tolist()))
        slots = [np.array(a_pos, dtype=np.int64),
                 np.array(b_pos, dtype=np.int64),
                 np.array(a_pos, dtype=np.int64)]
        slop = int(rng.integers(0, 6))
        simple = lucene_sloppy_freq_repeats(slots, slop, g_simple)
        multi = lucene_sloppy_freq_repeats(slots, slop, g_multi,
                                           multi_term=True)
        assert simple == pytest.approx(multi), (a_pos, b_pos, slop)


def test_lockstep_matches_scalar_on_random_batches():
    """The vectorized lockstep engine ≡ the per-doc heap matcher on
    random multi-doc batches (skewed position counts, docs missing from
    some slots, duplicate effective positions)."""
    from elasticsearch_assets_ray.search.sloppy import (
        sloppy_freqs_for_candidates,
    )

    rng = np.random.default_rng(37)
    for trial in range(60):
        nslots = int(rng.integers(2, 5))
        ndocs = int(rng.integers(1, 40))
        slot_docs, slot_pos = [], []
        per_doc: dict[int, list[np.ndarray]] = {
            d: [np.empty(0, np.int64)] * nslots for d in range(ndocs)
        }
        for s in range(nslots):
            ds, ps = [], []
            for d in range(ndocs):
                # skew: occasional hot doc with many positions
                npos = int(rng.integers(0, 40 if rng.random() < 0.1 else 6))
                if npos == 0:
                    continue
                pos = np.unique(rng.integers(0, 60, npos)).astype(np.int64)
                per_doc[d][s] = pos
                ds += [d] * len(pos)
                ps += pos.tolist()
            slot_docs.append(np.array(ds, dtype=np.int64))
            slot_pos.append(np.array(ps, dtype=np.int64))
        slop = int(rng.integers(0, 8))
        docs, tfs = sloppy_freqs_for_candidates(slot_docs, slot_pos, slop)
        got = dict(zip(docs.tolist(), tfs.tolist()))
        for d in range(ndocs):
            slots = per_doc[d]
            want = (
                0.0 if any(len(p) == 0 for p in slots)
                else lucene_sloppy_freq(slots, slop)
            )
            assert got.get(d, 0.0) == pytest.approx(want), (trial, d, slop)


def test_candidates_helper():
    # doc 5 contains both, doc 7 only slot 0
    d0 = np.array([5, 5, 7], dtype=np.int64)
    p0 = np.array([0, 4, 1], dtype=np.int64)
    d1 = np.array([5], dtype=np.int64)
    p1 = np.array([1], dtype=np.int64)
    docs, tfs = sloppy_freqs_for_candidates([d0, d1], [p0, p1], 0)
    assert docs.tolist() == [5] and tfs.tolist() == [1.0]
    with pytest.raises(ValueError):
        check_no_repeats(["data", "config", "data"])
    check_no_repeats(["data", ["config", "cfg"]])


@pytest.fixture(scope="module")
def slop_corpus(tmp_path_factory, ray_session):
    """Adversarial fixture: reordered, gapped and repeated occurrences of
    a two-term phrase, plus random filler."""
    from elasticsearch_assets_ray.config import IndexConfig
    from elasticsearch_assets_ray.index.build import build_index
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings

    tmp = tmp_path_factory.mktemp("slopcorpus")
    rng = np.random.default_rng(41)
    filler = ["kappa", "theta", "mu", "nu"]
    special = [
        "alpha beta",                      # exact
        "beta alpha",                      # reversed (ml 2)
        "alpha kappa beta",                # gap 1 (ml 1)
        "alpha kappa kappa beta",          # gap 2 (ml 2)
        "beta kappa alpha",                # reversed + gap (ml 3)
        "alpha beta kappa alpha beta",     # two exact
        "alpha beta beta alpha",           # mixed
    ]
    texts = []
    for i in range(160):
        if i < len(special) * 4:
            texts.append(special[i % len(special)])
        else:
            texts.append(
                " ".join(
                    filler[j]
                    for j in rng.integers(0, len(filler), rng.integers(3, 10))
                )
            )
    src = tmp / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts),
            }
        ),
        src,
    )
    idx = tmp / "idx"
    build_index(
        str(src), idx,
        IndexConfig(
            analyzer="simple", text_col="text", lang_col=None, id_col="doc_id",
            meta_cols=(), partition_target_docs=16, shard_target_docs=48,
            store_positions=True,
        ),
    )
    gdir = tmp / "global"
    merge_global_postings(idx, gdir, n_salts=2, n_buckets=4,
                          hot_df_fraction=0.5, store_norms=True)
    return idx, gdir, texts


def test_lucene_slop_engines_and_semantics(slop_corpus, ray_session):
    from elasticsearch_assets_ray.config import BM25Params
    from elasticsearch_assets_ray.search.engine import QueryEngine
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    idx, gdir, texts = slop_corpus
    eng = QueryEngine(idx, num_actors=2, params=BM25Params(round_decimals=4))
    teng = TermPartitionedEngine(gdir, num_actors=2, round_decimals=4)
    try:
        for slop in [1, 2, 3, 4]:
            a = eng.search_phrase("alpha beta", k=50, slop=slop,
                                  slop_mode="lucene")
            b = teng.search_phrase("alpha beta", k=50, slop=slop,
                                   slop_mode="lucene")
            assert a == b, slop
            # every hit's tf must equal the naive reference on its text
            hits = dict(a)
            for d, _ in a:
                toks = texts[d].split()
                slots = [
                    [i for i, t in enumerate(toks) if t == "alpha"],
                    [i for i, t in enumerate(toks) if t == "beta"],
                ]
                assert sloppy_freq_reference(slots, slop) > 0
        # reordering is admitted at slop 2 but not by the ordered mode
        lucene_docs = {d for d, _ in eng.search_phrase(
            "alpha beta", k=50, slop=2, slop_mode="lucene")}
        ordered_docs = {d for d, _ in eng.search_phrase(
            "alpha beta", k=50, slop=2)}
        reversed_docs = {d for d, t in enumerate(texts) if t == "beta alpha"}
        assert reversed_docs <= lucene_docs
        assert not (reversed_docs & ordered_docs)
        # weighting: an exact doc outscores a same-length reversed doc
        exact_d = texts.index("alpha beta")
        rev_d = texts.index("beta alpha")
        sc = dict(eng.search_phrase("alpha beta", k=50, slop=2,
                                    slop_mode="lucene"))
        assert sc[exact_d] > sc[rev_d]
        # repeated phrase terms: both engines serve identically and every
        # hit matches the per-doc repeats matcher on its own text
        from elasticsearch_assets_ray.search.sloppy import (
            lucene_sloppy_freq_repeats,
        )

        for phrase, slop in [("alpha beta alpha", 2), ("beta beta", 3),
                             ("alpha beta alpha", 4)]:
            ptoks = phrase.split()
            ra = eng.search_phrase(phrase, k=100, slop=slop,
                                   slop_mode="lucene")
            rb = teng.search_phrase(phrase, k=100, slop=slop,
                                    slop_mode="lucene")
            assert ra == rb, (phrase, slop)
            groups = [[i for i, t in enumerate(ptoks) if t == u]
                      for u in dict.fromkeys(ptoks)
                      if ptoks.count(u) > 1]
            hit_docs = {d for d, _ in ra}
            for d, text in enumerate(texts):
                toks = text.split()
                slots = [
                    np.array([i for i, t in enumerate(toks) if t == pt],
                             dtype=np.int64)
                    for pt in ptoks
                ]
                want = (
                    0.0 if any(len(s) == 0 for s in slots)
                    else lucene_sloppy_freq_repeats(slots, slop, groups)
                )
                assert (want > 0) == (d in hit_docs), (phrase, slop, d)
        # distinct-position law: "beta beta" can never match a
        # single-beta doc, any slop
        single = texts.index("alpha kappa beta")
        assert single not in {
            d for d, _ in eng.search_phrase("beta beta", k=200, slop=6,
                                            slop_mode="lucene")
        }
    finally:
        eng.shutdown()
        teng.shutdown()


def test_lucene_slop_multi_term_repeat_slots(slop_corpus, ray_session):
    """Multi-term repeat SLOTS (MultiPhraseQuery alternatives sharing a
    term) through the shard engine's lucene slop path: every hit/miss
    must agree with the multi-term collision machine run per doc on its
    own text."""
    from elasticsearch_assets_ray.config import BM25Params
    from elasticsearch_assets_ray.search.engine import QueryEngine
    from elasticsearch_assets_ray.search.sloppy import (
        lucene_sloppy_freq_repeats,
        repeat_plan,
    )

    idx, gdir, texts = slop_corpus
    eng = QueryEngine(idx, num_actors=2, params=BM25Params(round_decimals=4))
    try:
        cases = [
            ([["alpha", "theta"], "beta", "alpha"], 2),
            ([["alpha", "kappa"], "alpha"], 3),
            ([["beta", "mu"], ["beta", "nu"]], 2),
            ([["alpha", "beta"], ["alpha"]], 1),
        ]
        for phrase, slop in cases:
            got = eng.search_phrase(phrase, k=300, slop=slop,
                                    slop_mode="lucene")
            groups, multi = repeat_plan(phrase)
            assert multi, phrase
            hit_docs = {d for d, _ in got}
            for d, text in enumerate(texts):
                toks = text.split()
                slots = []
                for alts in phrase:
                    alts = [alts] if isinstance(alts, str) else alts
                    ps = sorted({i for i, t in enumerate(toks)
                                 if t in alts})
                    slots.append(np.array(ps, dtype=np.int64))
                want = (
                    0.0 if any(len(s) == 0 for s in slots)
                    else lucene_sloppy_freq_repeats(
                        slots, slop, groups, multi_term=multi)
                )
                assert (want > 0) == (d in hit_docs), (phrase, slop, d, text)
    finally:
        eng.shutdown()


@pytest.fixture(scope="module")
def prefix_slop_corpus(tmp_path_factory, ray_session):
    """Tiny corpus whose 'da' prefix expands to several terms (dart,
    data, datum) with 'data' also a FIXED phrase term — the multi-term
    repeat regime for match_phrase_prefix with slop."""
    from elasticsearch_assets_ray.config import IndexConfig
    from elasticsearch_assets_ray.index.build import build_index
    from elasticsearch_assets_ray.index.global_merge import (
        merge_global_postings,
    )

    tmp = tmp_path_factory.mktemp("prefixslop")
    texts = [
        "data dart config",
        "dart data",
        "data config dart",
        "config data datum",
        "datum dart data",
        "data data dart",
        "config config kappa",
        "dart kappa data config",
        "data datum",
        "kappa config dart",
        "datum data dart config",
        "data kappa kappa dart",
    ] * 3
    src = tmp / "docs.parquet"
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
        }),
        src,
    )
    idx = tmp / "idx"
    build_index(
        str(src), idx,
        IndexConfig(
            analyzer="simple", text_col="text", lang_col=None,
            id_col="doc_id", meta_cols=(), partition_target_docs=8,
            shard_target_docs=12, store_positions=True,
        ),
    )
    gdir = tmp / "global"
    merge_global_postings(idx, gdir, n_salts=2, n_buckets=4,
                          hot_df_fraction=0.5, store_norms=True)
    return idx, gdir, texts


def test_phrase_prefix_slop_engines_and_reference(prefix_slop_corpus,
                                                  ray_session):
    """match_phrase_prefix with slop: both engines agree rank+score in
    BOTH slop modes, and lucene-mode hits match the multi-term repeat
    matcher run per doc on its own text (expansion 'data' repeats the
    fixed term → collision machinery)."""
    from elasticsearch_assets_ray.config import BM25Params
    from elasticsearch_assets_ray.search.engine import QueryEngine
    from elasticsearch_assets_ray.search.sloppy import (
        lucene_sloppy_freq_repeats,
        repeat_plan,
    )
    from elasticsearch_assets_ray.search.term_engine import (
        TermPartitionedEngine,
    )

    idx, gdir, texts = prefix_slop_corpus
    eng = QueryEngine(idx, num_actors=2, params=BM25Params(round_decimals=4))
    teng = TermPartitionedEngine(gdir, num_actors=2, round_decimals=4)
    try:
        expans = {"da": ["dart", "data", "datum"], "conf": ["config"]}
        for query, slop, mode in [
            (["data", "da"], 1, "lucene"),
            (["data", "da"], 2, "lucene"),
            (["data", "da"], 2, "ordered"),
            (["config", "da"], 2, "lucene"),
            (["config", "da"], 3, "ordered"),
            (["dart", "conf"], 2, "lucene"),
        ]:
            a = eng.search_phrase_prefix(query, k=100, slop=slop,
                                         slop_mode=mode)
            b = teng.search_phrase_prefix(query, k=100, slop=slop,
                                          slop_mode=mode)
            assert a == b, (query, slop, mode)
            if mode != "lucene":
                continue
            phrase = [[t] for t in query[:-1]] + [expans[query[-1]]]
            groups, multi = repeat_plan(phrase)
            hit_docs = {d for d, _ in a}
            for d, text in enumerate(texts):
                toks = text.split()
                slots = [
                    np.array(sorted({i for i, t in enumerate(toks)
                                     if t in alts}), dtype=np.int64)
                    for alts in phrase
                ]
                want = (
                    0.0 if any(len(s) == 0 for s in slots)
                    else lucene_sloppy_freq_repeats(
                        slots, slop, groups, multi_term=multi)
                )
                assert (want > 0) == (d in hit_docs), (query, slop, d, text)
        # slop=0 exact path unchanged: same results as before the slop
        # params existed (chain vs slices parity)
        a0 = eng.search_phrase_prefix(["data", "da"], k=100)
        b0 = teng.search_phrase_prefix(["data", "da"], k=100)
        assert a0 == b0 and a0
    finally:
        eng.shutdown()
        teng.shutdown()


def test_lockstep_repeats_matches_scalar_on_random_batches():
    """The vectorized repeats collision machine ≡ the per-doc scalar
    matcher, across random docs, group shapes, inits and slops."""
    from elasticsearch_assets_ray.search.sloppy import (
        lockstep_sloppy_freqs_repeats,
        lucene_sloppy_freq_repeats,
        repeat_plan,
    )

    rng = np.random.default_rng(61)
    phrases = [
        ["a", "b", "a"],                    # single-term repeat
        ["a", "a"],                         # adjacent repeat
        ["a", "b", "a", "a"],               # triple group
        [["a", "x"], "b", "a"],             # multi-term, dead-or-live alt
        [["a", "b"], ["a", "c"]],           # multi-term both slots
        [["a", "b"], ["b", "c"], ["c"]],    # transitive one-group
        [["a"], ["a"], ["b", "z"], ["b"]],  # two groups
    ]
    vocab = "abcxz"
    for phrase in phrases:
        groups, multi = repeat_plan(phrase)
        assert groups
        for trial in range(60):
            ndocs = int(rng.integers(1, 6))
            docs_slots = []
            for _ in range(ndocs):
                # random token stream over the vocab; slot positions =
                # union of the slot's alternatives' occurrences
                toks = rng.choice(list(vocab), size=int(rng.integers(2, 18)))
                slots = []
                for alts in phrase:
                    alts = [alts] if isinstance(alts, str) else alts
                    ps = [i for i, t in enumerate(toks) if t in alts]
                    slots.append(np.array(ps, dtype=np.int64))
                if any(len(s) == 0 for s in slots):
                    continue  # not a candidate (conjunction gate)
                docs_slots.append(slots)
            if not docs_slots:
                continue
            nslots = len(phrase)
            flat = [np.concatenate([d[s] for d in docs_slots])
                    for s in range(nslots)]
            lo = np.zeros((len(docs_slots), nslots), dtype=np.int64)
            hi = np.zeros_like(lo)
            off = [0] * nslots
            for di, d in enumerate(docs_slots):
                for s in range(nslots):
                    lo[di, s] = off[s]
                    off[s] += len(d[s])
                    hi[di, s] = off[s]
            slop = int(rng.integers(0, 5))
            got = lockstep_sloppy_freqs_repeats(
                flat, lo, hi, slop, groups, multi_term=multi)
            for di, d in enumerate(docs_slots):
                want = lucene_sloppy_freq_repeats(
                    d, slop, groups, multi_term=multi)
                assert got[di] == pytest.approx(want), (
                    phrase, slop, [list(map(int, s)) for s in d])
