"""Suggester ranking semantics (engine parity + oracle bit-exactness
run in test_contract; this covers the mode/edge logic)."""

import pytest

from elasticsearch_assets_ray.search.suggest import (
    rank_completions,
    rank_term_suggestions,
)


def test_term_modes():
    cands = [("table", 1), ("tale", 1), ("the", 2)]
    dfs = {"table": 50, "tale": 3, "the": 80}
    # missing: token present in the index → no suggestions
    assert rank_term_suggestions("tble", cands, dfs, 4, 5, "missing") == []
    # absent token: score desc (dist/len), df desc, term asc
    got = rank_term_suggestions("tble", cands, dfs, 0, 5, "missing")
    assert [g["suggestion"] for g in got] == ["table", "tale", "the"]
    assert got[0]["score"] == 1 - 1 / 4 and got[0]["freq"] == 50
    # equal score (table/tale both dist 1, min len 4): df breaks the tie
    assert got[0]["score"] == got[1]["score"]
    # popular: only candidates strictly more frequent than the input
    got = rank_term_suggestions("tble", cands, dfs, 40, 5, "popular")
    assert [g["suggestion"] for g in got] == ["table", "the"]
    # always: suggests even for present tokens
    got = rank_term_suggestions("tble", cands, dfs, 999, 2, "always")
    assert len(got) == 2  # size cap
    # zero-df candidates never suggest
    got = rank_term_suggestions("tble", [("tbl", 1)], {"tbl": 0}, 0, 5,
                                "always")
    assert got == []
    # self never suggests
    got = rank_term_suggestions("table", [("table", 0)], dfs, 0, 5,
                                "always")
    assert got == []
    with pytest.raises(ValueError):
        rank_term_suggestions("x", [], {}, 0, 5, "bogus")


def test_completions():
    got = rank_completions(["scan", "scale", "schema"],
                           {"scan": 10, "scale": 30, "schema": 10}, 2)
    assert [g["suggestion"] for g in got] == ["scale", "scan"]
    assert got[0]["freq"] == 30
    # df-0 terms drop
    assert rank_completions(["sc"], {"sc": 0}, 5) == []


def test_rrf_fuse():
    from elasticsearch_assets_ray.search.hybrid import rrf_fuse

    got = rrf_fuse([[1, 2, 3], [3, 1]], k=10)
    # doc 1: 1/61 + 1/62; doc 3: 1/63 + 1/61; doc 2: 1/62
    s1 = 1 / 61 + 1 / 62
    s3 = 1 / 63 + 1 / 61
    assert [d for d, _ in got] == [1, 3, 2]
    assert abs(got[0][1] - s1) < 1e-15 and abs(got[1][1] - s3) < 1e-15
    # tie on score -> doc id ascending
    got = rrf_fuse([[5], [7]], k=10)
    assert [d for d, _ in got] == [5, 7]
    # k cut and duplicate-id defensiveness
    assert len(rrf_fuse([[1, 2, 3, 1]], k=2)) == 2
    assert rrf_fuse([[4, 4]], k=5)[0][1] == 1 / 61


def test_explain_matches_search(small_index, ray_session, tmp_path):
    """ES _explain: per-term breakdown must total to the exact score
    search ranks the doc with — both engines."""
    from elasticsearch_assets_ray.index.global_merge import (
        merge_global_postings,
    )
    from elasticsearch_assets_ray.search.engine import QueryEngine
    from elasticsearch_assets_ray.search.term_engine import (
        TermPartitionedEngine,
    )

    q = "merge data import"
    eng = QueryEngine(small_index.index_dir, num_actors=2)
    merge_global_postings(small_index.index_dir, tmp_path / "g",
                          n_salts=2, n_buckets=4, store_norms=True)
    teng = TermPartitionedEngine(tmp_path / "g", num_actors=2)
    try:
        hits = eng.search(q, k=5)
        assert hits
        for d, s in hits:
            ex = eng.explain(q, d)
            assert ex["matched"] and abs(ex["score"] - s) < 1e-9
            assert abs(sum(r["contribution"]
                           for r in ex["terms"].values()) - s) < 1e-12
            ex_t = teng.explain(q, d)
            assert abs(ex_t["score"] - s) < 1e-9
            assert ex_t["terms"].keys() == ex["terms"].keys()
        # a doc matching nothing
        miss = eng.explain("zzzz qqqq", hits[0][0])
        assert not miss["matched"] and miss["score"] == 0.0
    finally:
        eng.shutdown()
        teng.shutdown()


def test_phrase_suggester_collate_unit():
    """collate drops zero-match suggestions; prune keeps + flags; the
    collate callback runs lazily in rank order."""
    from elasticsearch_assets_ray.search.suggest import suggest_phrase

    SEP = "\x1f"
    counts = {"big": 50, "cat": 40, "bat": 30,
              "big" + SEP + "cat": 20, "big" + SEP + "bat": 10}

    def analyze(s):
        return s.lower().split()

    def expand_fuzzy(tok, max_edits, prefix_length, num_candidates):
        return {"cct": [("cat", 1), ("bat", 1)],
                "big": [("big", 0)]}.get(tok, [])

    def cfs(terms):
        return {t: counts.get(t, 0) for t in terms}

    base = dict(analyze=analyze, expand_fuzzy=expand_fuzzy, cfs=cfs,
                total_tokens=125, shingle_sep=SEP, size=5)
    plain = suggest_phrase("big cct", **base)
    assert [d["text"] for d in plain] == ["big cat", "big bat"]

    calls = []

    def collate(words):
        calls.append(words)
        return words == ("big", "cat")

    got = suggest_phrase("big cct", **base, collate_match=collate)
    assert [d["text"] for d in got] == ["big cat"]
    assert calls == [("big", "cat"), ("big", "bat")]

    pruned = suggest_phrase("big cct", **base, collate_match=collate,
                            collate_prune=True)
    assert [(d["text"], d["collate_match"]) for d in pruned] == [
        ("big cat", True), ("big bat", False)]

    # size-capped laziness: size=1 stops after the first survivor
    calls.clear()
    one = suggest_phrase("big cct", **base | {"size": 1},
                         collate_match=collate)
    assert [d["text"] for d in one] == ["big cat"]
    assert calls == [("big", "cat")]
