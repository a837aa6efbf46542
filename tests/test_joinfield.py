"""ES join-field queries (search/joinfield.py): kernel semantics +
shard-actor vs term-partitioned engine parity — with shard sizes chosen
so families STRADDLE shard boundaries (the associative-partial
correctness the co-location assumption must not hide).  The DuckDB
oracle twins run via the has_child / has_parent contract pipelines."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.search.joinfield import (
    children_rows,
    finish_has_child,
    group_child_scores,
)

FAM = 5  # parent_id = doc_id - doc_id % FAM


def test_group_child_scores_excludes_parent_rows():
    parents = np.array([0, 0, 0, 5, 5], dtype=np.int64)
    gids = np.array([0, 1, 2, 5, 6], dtype=np.int64)  # 0 and 5 are parents
    r = np.array([9.0, 1.0, 2.0, 9.0, 3.0])
    got = group_child_scores(parents, gids, r)
    assert got == {0: (2, 3.0, 1.0, 2.0), 5: (1, 3.0, 3.0, 3.0)}
    assert group_child_scores(parents[:1], gids[:1], r[:1]) == {}


def test_finish_has_child_modes_bounds_and_order():
    merged = {0: (2, 3.0, 1.0, 2.0), 5: (1, 3.0, 3.0, 3.0),
              10: (4, 2.0, 0.1, 1.2)}
    rows = finish_has_child(merged, "sum")
    assert rows == [(0, 3.0, 2), (5, 3.0, 1), (10, 2.0, 4)]  # tie: id asc
    assert finish_has_child(merged, "avg")[0] == (5, 3.0, 1)
    assert finish_has_child(merged, "max")[0][0] == 5
    assert finish_has_child(merged, "min")[0] == (5, 3.0, 1)
    assert [r[0] for r in finish_has_child(merged, "none")] == [0, 5, 10]
    assert all(r[1] == 1.0 for r in finish_has_child(merged, "none"))
    assert [r[0] for r in finish_has_child(merged, "sum", min_children=2)] \
        == [0, 10]
    assert [r[0] for r in
            finish_has_child(merged, "sum", max_children=2)] == [0, 5]
    assert len(finish_has_child(merged, "sum", k=1)) == 1
    with pytest.raises(ValueError):
        finish_has_child(merged, "product")


def test_children_rows_score_mapping():
    ids = np.array([1, 2, 6], dtype=np.int64)
    parents = np.array([0, 0, 5], dtype=np.int64)
    got = children_rows(ids, parents, {0: 2.5, 5: 7.0})
    assert got == [(6, 7.0), (1, 2.5), (2, 2.5)]
    got = children_rows(ids, parents, {0: 2.5}, score=False)
    assert got == [(1, 1.0), (2, 1.0)]
    assert children_rows(ids, parents, {}) == []


@pytest.fixture(scope="module")
def join_engines(tmp_path_factory, ray_session):
    from elasticsearch_assets_ray.config import BM25Params, IndexConfig
    from elasticsearch_assets_ray.index.build import build_index
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.engine import QueryEngine
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    tmp = tmp_path_factory.mktemp("join")
    src = tmp / "docs.parquet"
    rng = np.random.default_rng(5)
    n = 160
    words = ["alpha", "beta", "gamma", "delta"]
    texts = [
        " ".join(words[j] for j in rng.integers(0, 4, rng.integers(2, 9)))
        for _ in range(n)
    ]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
        }),
        src,
    )
    cfg = IndexConfig(
        analyzer="simple", text_col="text", lang_col=None, id_col="doc_id",
        meta_cols=("parent_id", "grp", "val", "opt"),
        derived_meta=(f"parent_id=group_of:doc_id:{FAM}",
                      "grp=mod_of:doc_id:3:0", "val=mod_of:doc_id:7:0",
                      "opt=nullable_mod:doc_id:5:4"),
        # shard size NOT a multiple of the family size → families
        # straddle shard boundaries; the associative merge must still
        # be exact
        partition_target_docs=13, shard_target_docs=39,
    )
    idx = tmp / "idx"
    build_index(str(src), idx, cfg)
    gdir = tmp / "global"
    merge_global_postings(idx, gdir, n_salts=2, n_buckets=4,
                          hot_df_fraction=0.5, store_norms=True)
    eng = QueryEngine(idx, num_actors=3, params=BM25Params(round_decimals=4))
    teng = TermPartitionedEngine(gdir, num_actors=2, round_decimals=4)
    yield eng, teng, texts, n
    teng.shutdown()
    eng.shutdown()


def _brute_has_child(eng, texts, n, mode, mn=1, mx=None):
    hits = dict(eng.search_bool(should="alpha beta", k=1 << 30,
                                minimum_should_match=1))
    fam: dict = {}
    for d, s in hits.items():
        if d % FAM == 0:
            continue
        fam.setdefault(d - d % FAM, []).append(round(s, 4))
    rows = []
    for p, ss in fam.items():
        if len(ss) < mn or (mx is not None and len(ss) > mx):
            continue
        v = {"none": 1.0, "sum": sum(ss), "avg": sum(ss) / len(ss),
             "min": min(ss), "max": max(ss)}[mode]
        rows.append((p, round(v, 4), len(ss)))
    rows.sort(key=lambda t: (-t[1], t[0]))
    return rows


@pytest.mark.parametrize("mode", ["none", "sum", "avg", "min", "max"])
def test_has_child_engine_parity_and_brute(join_engines, mode):
    eng, teng, texts, n = join_engines
    a = eng.search_has_child("alpha beta", score_mode=mode, k=None)
    b = teng.search_has_child("alpha beta", score_mode=mode, k=None)
    assert a == b, mode
    want = _brute_has_child(eng, texts, n, mode)
    assert [(p, n_) for p, _, n_ in a] == [(p, n_) for p, _, n_ in want]
    for (_, ga, _), (_, wa, _) in zip(a, want):
        assert ga == pytest.approx(wa, abs=1.5e-4)


def test_has_child_count_bounds(join_engines):
    eng, teng, texts, n = join_engines
    a = eng.search_has_child("alpha beta", score_mode="none",
                             min_children=3, max_children=4, k=None)
    b = teng.search_has_child("alpha beta", score_mode="none",
                              min_children=3, max_children=4, k=None)
    assert a == b
    assert all(3 <= n_ <= 4 for _, _, n_ in a)
    want = _brute_has_child(eng, texts, n, "none", mn=3, mx=4)
    assert a == want


def test_has_parent_engine_parity_and_brute(join_engines):
    eng, teng, texts, n = join_engines
    a = eng.search_has_parent("gamma delta", k=None)
    b = teng.search_has_parent("gamma delta", k=None)
    assert a == b
    # brute: parents matching, then their children
    hits = dict(eng.search_bool(should="gamma delta", k=1 << 30,
                                minimum_should_match=1))
    want = []
    for d, s in hits.items():
        if d % FAM != 0:
            continue
        for c in range(d + 1, min(d + FAM, n)):
            want.append((c, s))
    want.sort(key=lambda t: (-t[1], t[0]))
    assert a == want
    # filter context: constant 1.0, same doc set
    af = eng.search_has_parent("gamma delta", score=False, k=None)
    assert sorted(d for d, _ in af) == sorted(d for d, _ in a)
    assert all(s == 1.0 for _, s in af)


def test_keyed_partials_kernel():
    from elasticsearch_assets_ray.search.joinfield import keyed_partials

    keys = np.array([1, 2, 1, 2, 2], dtype=np.int64)
    vals = np.array([5.0, 1.0, 3.0, 2.0, 9.0])
    assert keyed_partials(keys, vals) == {
        1: (2, 8.0, 3.0, 5.0), 2: (3, 12.0, 1.0, 9.0)
    }
    assert keyed_partials(keys, None) == {
        1: (2, None, None, None), 2: (3, None, None, None)
    }
    assert keyed_partials(np.empty(0, np.int64), None) == {}


def _brute_children_agg(eng, n, stats_on):
    hits = dict(eng.search_bool(should="alpha beta", k=1 << 30,
                                minimum_should_match=1))
    pids = sorted(d for d in hits if d % FAM == 0)
    rows: dict = {}
    for p in pids:
        key = p % 3  # grp recipe
        pc_, ch = rows.setdefault(key, [0, []])
        rows[key][0] += 1
        for c in range(p + 1, min(p + FAM, n)):
            rows[key][1].append(c % 7)  # val recipe
    out = []
    for key, (n_par, vs) in rows.items():
        row = {"key": key, "parent_count": n_par, "doc_count": len(vs)}
        if stats_on:
            row.update({
                "sum": float(sum(vs)) if vs else None,
                "min": float(min(vs)) if vs else None,
                "max": float(max(vs)) if vs else None,
                "avg": sum(vs) / len(vs) if vs else None,
            })
        out.append(row)
    out.sort(key=lambda r: (-r["parent_count"], r["key"]))
    return out


def test_children_agg_engine_parity_and_brute(join_engines):
    eng, teng, texts, n = join_engines
    a = eng.children_agg("alpha beta", group_by="grp", stats_on="val")
    b = teng.children_agg("alpha beta", group_by="grp", stats_on="val")
    assert a == b
    assert a == _brute_children_agg(eng, n, "val")
    # count-only + order/size options
    a2 = eng.children_agg("alpha beta", group_by="grp",
                          order=("_key", "desc"), size=2)
    b2 = teng.children_agg("alpha beta", group_by="grp",
                           order=("_key", "desc"), size=2)
    assert a2 == b2 and len(a2) == 2
    assert [r["key"] for r in a2] == sorted(
        [r["key"] for r in eng.children_agg("alpha beta", "grp")],
        reverse=True)[:2]


def test_parent_agg_engine_parity_and_brute(join_engines):
    eng, teng, texts, n = join_engines
    a = eng.parent_agg("gamma delta", group_by="grp", stats_on="val")
    b = teng.parent_agg("gamma delta", group_by="grp", stats_on="val")
    assert a == b
    # brute: unique parents of matched CHILD docs, bucketed by grp
    hits = dict(eng.search_bool(should="gamma delta", k=1 << 30,
                                minimum_should_match=1))
    parents = sorted({d - d % FAM for d in hits if d % FAM != 0})
    want: dict = {}
    for p in parents:
        key = p % 3
        want.setdefault(key, []).append(p % 7)
    rows = [
        {"key": k, "doc_count": len(vs), "sum": float(sum(vs)),
         "min": float(min(vs)), "max": float(max(vs)),
         "avg": sum(vs) / len(vs)}
        for k, vs in want.items()
    ]
    rows.sort(key=lambda r: (-r["doc_count"], r["key"]))
    assert a == rows


def test_family_agg_rows_zero_children_bucket():
    from elasticsearch_assets_ray.search.joinfield import family_agg_rows

    # a bucket whose parents have NO matching children still appears
    keys = np.array([1, 1, 2], dtype=np.int64)
    rows = family_agg_rows(keys, {1: (3, 6.0, 1.0, 3.0)}, "x")
    assert rows == [
        {"key": 1, "parent_count": 2, "doc_count": 3,
         "sum": 6.0, "min": 1.0, "max": 3.0, "avg": 2.0},
        {"key": 2, "parent_count": 1, "doc_count": 0,
         "sum": None, "min": None, "max": None, "avg": None},
    ]


def test_join_agg_empty_query(join_engines):
    eng, teng, _, _ = join_engines
    assert eng.children_agg("zzz_nonexistent", "grp") == []
    assert teng.children_agg("zzz_nonexistent", "grp") == []
    assert eng.parent_agg("zzz_nonexistent", "grp") == []
    assert teng.parent_agg("zzz_nonexistent", "grp") == []


def test_join_empty_query(join_engines):
    eng, teng, _, _ = join_engines
    assert eng.search_has_child("zzz_nonexistent") == []
    assert teng.search_has_child("zzz_nonexistent") == []
    assert eng.search_has_parent("zzz_nonexistent") == []
    assert teng.search_has_parent("zzz_nonexistent") == []

def test_global_agg_parity_and_brute(join_engines):
    eng, teng, texts, n = join_engines
    a = eng.global_agg("grp", stats_on="val")
    b = teng.global_agg("grp", stats_on="val")
    assert a == b
    # brute: every doc, bucketed by grp = doc_id % 3, stats val = id % 7
    want: dict = {}
    for d in range(n):
        want.setdefault(d % 3, []).append(d % 7)
    rows = [
        {"key": k, "doc_count": len(vs), "sum": float(sum(vs)),
         "min": float(min(vs)), "max": float(max(vs)),
         "avg": sum(vs) / len(vs)}
        for k, vs in want.items()
    ]
    rows.sort(key=lambda r: (-r["doc_count"], r["key"]))
    assert a == rows
    # count-only + size option
    a2 = eng.global_agg("grp", size=2)
    assert len(a2) == 2 and a2 == teng.global_agg("grp", size=2)


def test_missing_agg_parity_and_brute(join_engines):
    eng, teng, texts, n = join_engines
    a = eng.missing_agg("alpha beta", "opt", stats_on="val")
    b = teng.missing_agg("alpha beta", "opt", stats_on="val")
    assert a == b
    matched = {d for d, _ in eng.search_bool(should="alpha beta",
                                             k=1 << 30)}
    miss = sorted(d for d in matched if d % 4 == 0)  # opt NULL rule
    assert a["doc_count"] == len(miss)
    vs = [d % 7 for d in miss]
    assert a["sum"] == float(sum(vs)) and a["min"] == float(min(vs))
    assert a["max"] == float(max(vs))
    assert a["avg"] == sum(vs) / len(vs)
    # count-only form + no-match query
    c = eng.missing_agg("alpha beta", "opt")
    assert c == {"doc_count": len(miss)}
    assert teng.missing_agg("alpha beta", "opt") == c
    e0 = eng.missing_agg("zzz_nonexistent", "opt", stats_on="val")
    assert e0["doc_count"] == 0 and e0["sum"] is None
    assert teng.missing_agg("zzz_nonexistent", "opt",
                            stats_on="val") == e0
    # a total (never-null) field has an empty missing bucket
    assert eng.missing_agg("alpha beta", "grp")["doc_count"] == 0
