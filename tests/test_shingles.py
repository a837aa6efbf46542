"""index_phrases (2-token shingle indexing): build identity, unigram
invariants, and phrase parity with the unshingled path on both engines."""

import hashlib
import pathlib

import pytest

from elasticsearch_assets_ray.config import IndexConfig
from elasticsearch_assets_ray.index.build import (
    SHINGLE_SEP,
    add_shingle_stream_flat,
    build_index,
)

PHRASES = [
    ["def", "merge"],            # 2-term → single shingle lookup
    ["merge", "data"],
    ["import", "merge", "data"],  # 3-term → 2 shingle slots
    ["a", "a"],                   # repeated token (overlap counting)
    ["def", "merge", "data", "import"],
    ["zzz", "qqq"],               # absent
]


def test_config_requires_positions():
    with pytest.raises(ValueError):
        IndexConfig(index_phrases=True, store_positions=False)


def test_add_shingle_stream_flat():
    import numpy as np

    flat = ["a", "b", "a", "x"]
    rel = np.array([0, 0, 0, 1])
    flat2, rel2, pos2 = add_shingle_stream_flat(flat, rel)
    assert flat2 == ["a", "b", "a", "x",
                     "a" + SHINGLE_SEP + "b", "b" + SHINGLE_SEP + "a"]
    assert rel2.tolist() == [0, 0, 0, 1, 0, 0]
    assert pos2.tolist() == [0, 1, 2, 0, 0, 1]  # shingle @ first token


@pytest.fixture(scope="module")
def shingle_indexes(small_corpus, tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("shidx")
    base = dict(partition_target_docs=50, shard_target_docs=100,
                store_positions=True)
    plain = build_index(small_corpus, d / "plain", IndexConfig(**base))
    sh = build_index(small_corpus, d / "sh",
                     IndexConfig(**base, index_phrases=True))
    return plain, sh


def _seg_hash(d):
    h = hashlib.sha256()
    for p in sorted(pathlib.Path(d, "segments").rglob("segment.parquet")):
        h.update(p.read_bytes())
    return h.hexdigest()


def test_strategies_byte_identical_with_shingles(small_corpus, tmp_path,
                                                 ray_session,
                                                 shingle_indexes):
    _, sh = shingle_indexes
    gb = build_index(
        small_corpus, tmp_path / "sh_gb",
        IndexConfig(partition_target_docs=50, shard_target_docs=100,
                    store_positions=True, index_phrases=True,
                    merge_strategy="groupby"),
    )
    assert _seg_hash(sh.index_dir) == _seg_hash(gb.index_dir)


def test_unigram_stats_unchanged(shingle_indexes):
    plain, sh = shingle_indexes
    assert plain.stats.num_docs == sh.stats.num_docs
    assert plain.stats.total_tokens == sh.stats.total_tokens
    assert plain.stats.avgdl == sh.stats.avgdl


def test_shard_engine_parity(shingle_indexes, ray_session):
    from elasticsearch_assets_ray.search.engine import QueryEngine

    plain, sh = shingle_indexes
    ep = QueryEngine(plain.index_dir, num_actors=2)
    es = QueryEngine(sh.index_dir, num_actors=2)
    try:
        for ph in PHRASES:
            a = ep.search_phrase(ph, k=1000)
            b = es.search_phrase(ph, k=1000)
            assert [x[0] for x in a] == [x[0] for x in b], ph
            for (_, s1), (_, s2) in zip(a, b):
                assert abs(s1 - s2) < 1e-9, ph
        # sloppy phrases keep the unigram path (and still work)
        a = ep.search_phrase(["def", "data"], k=50, slop=2)
        b = es.search_phrase(["def", "data"], k=50, slop=2)
        assert a == b
        # dictionary walks never see shingle terms
        assert ep.expand_prefix("me", 50) == es.expand_prefix("me", 50)
        assert ep.expand_fuzzy("merge", 1) == es.expand_fuzzy("merge", 1)
        assert ep.search_wildcard("me*ge", k=50) == \
            es.search_wildcard("me*ge", k=50)
        assert ep.search_regexp("mer.e", k=50) == \
            es.search_regexp("mer.e", k=50)
        # unigram scoring identical (shingles don't leak into match)
        assert ep.search("merge data import", k=50) == \
            es.search("merge data import", k=50)
        # phrase-suggester collate: every surviving suggestion has >= 1
        # exact-phrase match; prune keeps all with a flag
        plain_sugg = es.suggest_phrase("merge dta", size=5)
        coll = es.suggest_phrase("merge dta", size=5, collate=True)
        assert {d["text"] for d in coll} <= {d["text"] for d in plain_sugg}
        for d in coll:
            assert es.search_phrase(d["text"].split(), k=1), d
        pruned = es.suggest_phrase("merge dta", size=5, collate_prune=True)
        for d in pruned:
            assert d["collate_match"] == bool(
                es.search_phrase(d["text"].split(), k=1)
            ), d
    finally:
        ep.shutdown()
        es.shutdown()


def test_term_engine_parity(shingle_indexes, ray_session, tmp_path):
    from elasticsearch_assets_ray.index.global_merge import (
        merge_global_postings,
    )
    from elasticsearch_assets_ray.search.term_engine import (
        TermPartitionedEngine,
    )

    plain, sh = shingle_indexes
    merge_global_postings(plain.index_dir, tmp_path / "gplain",
                          n_salts=2, n_buckets=4, store_norms=True)
    merge_global_postings(sh.index_dir, tmp_path / "gsh",
                          n_salts=2, n_buckets=4, store_norms=True)
    tp = TermPartitionedEngine(tmp_path / "gplain", num_actors=2)
    ts = TermPartitionedEngine(tmp_path / "gsh", num_actors=2)
    try:
        assert ts.meta["index_phrases"] is True
        for ph in PHRASES:
            a = tp.search_phrase(ph, k=1000)
            b = ts.search_phrase(ph, k=1000)
            assert [x[0] for x in a] == [x[0] for x in b], ph
            for (_, s1), (_, s2) in zip(a, b):
                assert abs(s1 - s2) < 1e-9, ph
        assert tp.search_prefix("me", k=50) == ts.search_prefix("me", k=50)
        assert tp.expand_fuzzy("merge", 1) == ts.expand_fuzzy("merge", 1)
        assert tp.search("merge data import", k=50) == \
            ts.search("merge data import", k=50)
    finally:
        tp.shutdown()
        ts.shutdown()


@pytest.fixture(scope="module")
def shingle_nopos_index(small_corpus, tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("shnp")
    return build_index(
        small_corpus, d / "shnp",
        IndexConfig(partition_target_docs=50, shard_target_docs=100,
                    store_positions=True, index_phrases=True,
                    shingle_positions=False),
    )


def test_shingle_positions_false_layout(shingle_indexes, shingle_nopos_index):
    """shingle_positions=False: every shingle row's position blob is
    EMPTY, every unigram row's non-empty, and the sidecar is strictly
    lighter than the full-shingle-positions layout."""
    import pyarrow.parquet as pq

    _, sh = shingle_indexes

    def pos_bytes(info, empty_shingles):
        tot = 0
        for p in sorted(pathlib.Path(info.index_dir, "segments")
                        .rglob("segment.parquet")):
            t = pq.read_table(p, columns=["term", "positions"])
            for term, blob in zip(t.column("term").to_pylist(),
                                  t.column("positions").to_pylist()):
                if SHINGLE_SEP in term and empty_shingles:
                    assert blob == b"", term
                else:
                    assert len(blob) > 0, term
                tot += len(blob)
        return tot

    assert pos_bytes(shingle_nopos_index, True) < pos_bytes(sh, False)
    # resume over the same dir is a no-op (fingerprint carries the flag)
    again = build_index(
        str(pathlib.Path(shingle_nopos_index.manifest.corpus_paths[0])
            .parent),
        shingle_nopos_index.index_dir,
        IndexConfig(partition_target_docs=50, shard_target_docs=100,
                    store_positions=True, index_phrases=True,
                    shingle_positions=False),
    )
    assert again.stats.num_docs == shingle_nopos_index.stats.num_docs


def test_shingle_positions_false_strategies_identical(
    small_corpus, tmp_path, ray_session, shingle_nopos_index
):
    gb = build_index(
        small_corpus, tmp_path / "shnp_gb",
        IndexConfig(partition_target_docs=50, shard_target_docs=100,
                    store_positions=True, index_phrases=True,
                    shingle_positions=False, merge_strategy="groupby"),
    )
    assert _seg_hash(shingle_nopos_index.index_dir) == _seg_hash(gb.index_dir)


def test_shingle_positions_false_shard_engine_parity(
    shingle_indexes, shingle_nopos_index, ray_session
):
    from elasticsearch_assets_ray.search.engine import QueryEngine

    plain, _ = shingle_indexes
    ep = QueryEngine(plain.index_dir, num_actors=2)
    en = QueryEngine(shingle_nopos_index.index_dir, num_actors=2)
    try:
        for ph in PHRASES:
            a = ep.search_phrase(ph, k=1000)
            b = en.search_phrase(ph, k=1000)
            assert [x[0] for x in a] == [x[0] for x in b], ph
            for (_, s1), (_, s2) in zip(a, b):
                assert abs(s1 - s2) < 1e-9, ph
        # sloppy + highlight (unigram positions intact)
        assert ep.search_phrase(["def", "data"], k=50, slop=2) == \
            en.search_phrase(["def", "data"], k=50, slop=2)
        assert ep.search_highlight("merge data", k=5) == \
            en.search_highlight("merge data", k=5)
    finally:
        ep.shutdown()
        en.shutdown()


def test_shingle_positions_false_term_engine_parity(
    shingle_indexes, shingle_nopos_index, ray_session, tmp_path
):
    from elasticsearch_assets_ray.index.global_merge import (
        merge_global_postings,
    )
    from elasticsearch_assets_ray.search.term_engine import (
        TermPartitionedEngine,
    )

    plain, _ = shingle_indexes
    merge_global_postings(plain.index_dir, tmp_path / "gplain2",
                          n_salts=2, n_buckets=4, store_norms=True)
    merge_global_postings(shingle_nopos_index.index_dir, tmp_path / "gshnp",
                          n_salts=2, n_buckets=4, store_norms=True)
    tp = TermPartitionedEngine(tmp_path / "gplain2", num_actors=2)
    tn = TermPartitionedEngine(tmp_path / "gshnp", num_actors=2)
    try:
        assert tn.meta["shingle_positions"] is False
        for ph in PHRASES:
            a = tp.search_phrase(ph, k=1000)
            b = tn.search_phrase(ph, k=1000)
            assert [x[0] for x in a] == [x[0] for x in b], ph
            for (_, s1), (_, s2) in zip(a, b):
                assert abs(s1 - s2) < 1e-9, ph
        assert tp.search_phrase(["def", "data"], k=50, slop=2) == \
            tn.search_phrase(["def", "data"], k=50, slop=2)
        assert tp.search("merge data import", k=50) == \
            tn.search("merge data import", k=50)
    finally:
        tp.shutdown()
        tn.shutdown()


def test_shingle_positions_false_compaction(small_corpus, tmp_path,
                                            ray_session):
    """Deletes + compaction preserve the empty shingle blobs and phrase
    results stay identical to a plain index compacted the same way."""
    from elasticsearch_assets_ray.index.compact import compact_index
    from elasticsearch_assets_ray.index.deletes import delete_docs
    from elasticsearch_assets_ray.search.engine import QueryEngine
    import pyarrow.parquet as pq

    base = dict(partition_target_docs=50, shard_target_docs=100,
                store_positions=True)
    plain = build_index(small_corpus, tmp_path / "cpl", IndexConfig(**base))
    shnp = build_index(
        small_corpus, tmp_path / "cnp",
        IndexConfig(**base, index_phrases=True, shingle_positions=False),
    )
    victims = [2, 61, 140, 260, 398]
    for idx in (tmp_path / "cpl", tmp_path / "cnp"):
        delete_docs(idx, victims)
        compact_index(idx)
    for p in sorted(pathlib.Path(tmp_path / "cnp", "segments")
                    .rglob("segment.parquet")):
        t = pq.read_table(p, columns=["term", "positions"])
        for term, blob in zip(t.column("term").to_pylist(),
                              t.column("positions").to_pylist()):
            assert (blob == b"") == (SHINGLE_SEP in term), term
    ep = QueryEngine(plain.index_dir, num_actors=2)
    en = QueryEngine(shnp.index_dir, num_actors=2)
    try:
        for ph in PHRASES:
            assert ep.search_phrase(ph, k=1000) == \
                en.search_phrase(ph, k=1000), ph
    finally:
        ep.shutdown()
        en.shutdown()
