"""End-to-end build + query conformance + resume (the oracle suite that
replaces the role MockClient/ES played in the reference's jest specs)."""

import math
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from elasticsearch_assets_ray.analysis.tokenizer import code_tokens
from elasticsearch_assets_ray.config import BM25Params, IndexConfig
from elasticsearch_assets_ray.corpus.synth import reference_queries
from elasticsearch_assets_ray.index.build import IndexInfo, build_index, segment_dir
from elasticsearch_assets_ray.search.engine import (
    QueryEngine,
    _ScorerCore,
    score_queries_dataset,
)


def test_stats_match_oracle(small_index, small_oracle):
    assert small_index.stats.num_docs == small_oracle.num_docs
    assert abs(small_index.stats.avgdl - small_oracle.avgdl) < 1e-12


def test_sha256_invariant(small_index, small_corpus):
    """Per-row content sha256 equality end-to-end (BASELINE.json:15)."""
    import hashlib
    import pathlib

    stored = (
        pq.read_table(small_index.index_dir / "docmeta", columns=["doc_id", "content_sha256"])
        .sort_by("doc_id")
        .column("content_sha256")
        .to_pylist()
    )
    i = 0
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        for text in pq.read_table(f, columns=["content"]).column("content").to_pylist():
            assert stored[i] == hashlib.sha256(text.encode()).hexdigest()
            i += 1
    assert i == len(stored)


def test_sha_arrow_rejects_nulls():
    """Null text rows must fail loud, not hash as empty bytes (which
    would silently dedupe them against genuinely-empty docs)."""
    from elasticsearch_assets_ray.index.build import sha_nbytes_arrow

    with pytest.raises(ValueError, match="null"):
        sha_nbytes_arrow(pa.array(["a", None, "b"], pa.string()))
    shas, nb = sha_nbytes_arrow(pa.array(["", "x"], pa.string()))
    import hashlib as _h

    assert shas == [_h.sha256(b"").hexdigest(), _h.sha256(b"x").hexdigest()]
    assert nb.tolist() == [0, 1]


def test_rank_and_score_identical(small_index, small_oracle):
    eng = QueryEngine(small_index.index_dir, num_actors=2)
    for row in reference_queries().to_pylist():
        got = eng.search(row["query"], k=row["k"])
        want = small_oracle.search(code_tokens(row["query"]), k=row["k"])
        assert [d for d, _ in got] == [d for d, _ in want], row["query"]
        for (_, s1), (_, s2) in zip(got, want):
            assert abs(s1 - s2) < 1e-9
    eng.shutdown()


def test_wand_equals_dense(small_index):
    info = small_index
    core = _ScorerCore(str(info.index_dir), info.shard_ids(), BM25Params())
    for q in [["import"], ["merge", "segment", "block"], ["data", "import", "return"]]:
        dfs = core.local_dfs(q)
        n = info.stats.num_docs
        idf = {t: math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5)) for t in q}
        for s in core.shards:
            d1 = s.dense_topk(sorted(q), idf, BM25Params(), core.avgdl, 10)
            d2 = s.wand_topk(sorted(q), idf, BM25Params(), core.avgdl, 10)
            assert np.array_equal(d1[0], d2[0])
            assert np.allclose(d1[1], d2[1], atol=1e-12)


def test_wand_equals_dense_with_round_decimals(small_index):
    """Tie-aware fetch (round_decimals) keeps WAND and dense identical,
    both returning every member of the kth rounded-score tie class."""
    info = small_index
    params = BM25Params(round_decimals=4)
    core = _ScorerCore(str(info.index_dir), info.shard_ids(), params)
    for q in [["import"], ["merge", "segment", "block"]]:
        dfs = core.local_dfs(q)
        n = info.stats.num_docs
        idf = {t: math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5)) for t in q}
        for s in core.shards:
            d1 = s.dense_topk(sorted(q), idf, params, core.avgdl, 5)
            d2 = s.wand_topk(sorted(q), idf, params, core.avgdl, 5)
            assert np.array_equal(d1[0], d2[0])
            assert np.allclose(d1[1], d2[1], atol=1e-12)
            assert len(d1[0]) >= min(5, len(d1[0]))


def test_resume_rebuilds_on_token_clip_change(small_corpus, tmp_path):
    """min/max_token_len are part of the plan fingerprint: a resume under
    a different clip must NOT reuse segments built under the old one."""
    from elasticsearch_assets_ray.index.manifest import BuildManifest

    cfg = IndexConfig(partition_target_docs=100, shard_target_docs=200)
    info1 = build_index(small_corpus, tmp_path / "idx", cfg)
    m1 = BuildManifest.load(info1.index_dir)
    assert (m1.min_token_len, m1.max_token_len) == (1, 64)
    cfg2 = IndexConfig(partition_target_docs=100, shard_target_docs=200,
                       min_token_len=2, max_token_len=32)
    info2 = build_index(small_corpus, tmp_path / "idx", cfg2, resume=True)
    m2 = BuildManifest.load(info2.index_dir)
    assert (m2.min_token_len, m2.max_token_len) == (2, 32)
    # the rebuilt index actually excludes 1-char tokens
    core = _ScorerCore(str(info2.index_dir), info2.shard_ids(), BM25Params())
    assert sum(s.local_df("a") for s in core.shards) == 0
    # and the query engine clips queries with the manifest's bounds
    eng = QueryEngine(info2.index_dir, num_actors=1)
    assert eng._analyze("a xy foo") == sorted({"xy", "foo"})
    eng.shutdown()


def test_arrow_tokenize_parity_with_python_path():
    """The Arrow-kernel tokenize+invert fast path produces identical
    (terms, postings, dls) to the per-doc Python path, for both uniform
    analyzers, including unicode, clip bounds, and empty docs."""
    from elasticsearch_assets_ray.index.build import (
        _analyzers, invert_codes, invert_flat, tokenize_codes_arrow,
        tokenize_flat,
    )
    import pyarrow as pa2

    texts = [
        "def fooBar(x): return HTTPServer2 + sha256_hash  # comment!",
        "",
        "import numpy as np\nclass MyClass_Impl: pass",
        "UPPER lower 12345 mixedCase99 __dunder__",
        "ünïcode tëst 中文 naïve",
        "x " * 500,
    ]
    langs = [""] * len(texts)
    for analyzer in ("code", "simple"):
        for lo, hi in [(1, 64), (2, 8)]:
            az = _analyzers(analyzer)
            flat, doc_rel, dls, _, _ = tokenize_flat(texts, langs, az, lo, hi)
            t1, ids1, tfs1, offs1 = invert_flat(flat, doc_rel, 100)
            t2, codes, rel2, dls2 = tokenize_codes_arrow(
                pa2.array(texts, pa2.large_string()), analyzer, lo, hi, {}
            )
            ids2, tfs2, offs2 = invert_codes(codes, rel2, len(t2), 100)
            assert list(t1) == list(t2)
            assert np.array_equal(ids1, ids2)
            assert np.array_equal(tfs1, tfs2)
            assert np.array_equal(offs1, offs2)
            assert np.array_equal(np.asarray(dls, np.int64), np.asarray(dls2, np.int64))


def test_tie_aware_merge_keeps_rounded_tie_class():
    from elasticsearch_assets_ray.search.engine import merge_topk

    ids = np.array([1, 2, 3, 4, 5], dtype=np.int64)
    sc = np.array([2.0, 1.00004, 1.00001, 0.99998, 0.5])  # 3 docs round to 1.0
    got_ids, got_sc = merge_topk([(ids, sc)], k=2, round_decimals=4)
    # doc 3 and 4 round-tie with the kth (doc 2): all survive the cut
    assert got_ids.tolist() == [1, 2, 3, 4]
    plain_ids, _ = merge_topk([(ids, sc)], k=2)
    assert plain_ids.tolist() == [1, 2]


def test_bulk_dataset_scoring(small_index, small_oracle):
    qds = rd.from_arrow(reference_queries())
    out = score_queries_dataset(qds, small_index.index_dir, concurrency=1).to_pandas()
    for row in reference_queries().to_pylist():
        want = small_oracle.search(code_tokens(row["query"]), k=row["k"])
        got = out[out.query_id == row["query_id"]].sort_values("rank")
        assert got.doc_id.tolist() == [d for d, _ in want]


def test_resume_skips_done_shards_and_rebuilds_missing(small_corpus, tmp_path):
    cfg = IndexConfig(partition_target_docs=50, shard_target_docs=100)
    idx = tmp_path / "idx"
    info = build_index(small_corpus, idx, cfg)
    seg1 = pq.read_table(info.segment_path(1))

    # simulate a mid-build crash: one shard's segment lost, manifest stale
    shutil.rmtree(segment_dir(idx, 1))
    info2 = build_index(small_corpus, idx, cfg)
    seg2 = pq.read_table(info2.segment_path(1))
    assert seg2.equals(seg1)  # deterministic replay → byte-identical segment
    assert info2.stats == info.stats


def test_empty_and_absent_queries(small_index):
    eng = QueryEngine(small_index.index_dir, num_actors=1)
    assert eng.search("zzzzqqqq", 10) == []
    assert eng.search("", 10) == []
    eng.shutdown()


def test_incremental_append(small_corpus, tmp_path):
    """Corpus grows → new shards append; old segments stay byte-identical;
    queries see the new docs (streaming micro-batch analogue, §2.10)."""
    import pathlib
    import shutil as sh

    from elasticsearch_assets_ray.corpus.synth import make_corpus_batch
    import numpy as np
    import pyarrow.parquet as pq2

    grow = tmp_path / "grow"
    grow.mkdir()
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        sh.copy(f, grow / f.name)
    cfg = IndexConfig(partition_target_docs=50, shard_target_docs=100)
    idx = tmp_path / "idx"
    info1 = build_index(grow, idx, cfg)
    n1 = info1.stats.num_docs
    seg0_before = pq.read_table(info1.segment_path(0))
    old_shards = set(info1.shard_ids())

    # append a new file (row ids continue after the existing corpus)
    extra = make_corpus_batch(np.arange(n1, n1 + 120, dtype=np.int64))
    pq2.write_table(extra, grow / "zz-extra.parquet", row_group_size=60)

    info2 = build_index(grow, idx, cfg)
    assert info2.stats.num_docs == n1 + 120
    assert old_shards < set(info2.shard_ids())
    assert pq.read_table(info2.segment_path(0)).equals(seg0_before)
    # avgdl reflects both old and new shards
    assert info2.stats.total_tokens > info1.stats.total_tokens

    eng = QueryEngine(idx, num_actors=2)
    got = eng.search("import", k=200)
    assert any(d >= n1 for d, _ in got)  # new docs are searchable
    eng.shutdown()

    # removing a file is NOT an append → full rebuild still works
    (grow / "zz-extra.parquet").unlink()
    info3 = build_index(grow, idx, cfg)
    assert info3.stats.num_docs == n1


def test_compaction_equals_masked_serving(small_corpus, tmp_path):
    """Compaction physically removes tombstoned docs: identical ranks and
    scores to mask-at-query-time serving, tombstones cleared, deleted ids
    gone from every posting list."""
    from elasticsearch_assets_ray.index.compact import compact_index
    from elasticsearch_assets_ray.index.deletes import delete_docs, load_deletes
    from elasticsearch_assets_ray.index.codec import decode_postings
    import pyarrow.parquet as pq2

    import pathlib as _pl0
    import shutil as _sh0

    # work on a private copy of the corpus so the append step can grow it
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for f in sorted(_pl0.Path(small_corpus).glob("*.parquet")):
        _sh0.copy(f, corpus / f.name)
    cfg = IndexConfig(partition_target_docs=50, shard_target_docs=100)
    idx = tmp_path / "idx"
    info = build_index(corpus, idx, cfg)
    victims = [3, 57, 120, 250, 399]
    delete_docs(idx, victims)

    eng = QueryEngine(idx, num_actors=2)
    masked_ranks = {q: [d for d, _ in eng.search(q, k=20)]
                    for q in ["import", "merge segment block", "data return"]}
    eng.shutdown()

    summary = compact_index(idx)
    assert summary.num_rows >= 1
    assert int(sum(summary.column("dropped_postings").to_pylist())) > 0
    assert int(sum(summary.column("dropped_docs").to_pylist())) == len(victims)
    for sid in info.shard_ids():
        assert len(load_deletes(idx, sid)) == 0
        seg = pq2.read_table(info.segment_path(sid))
        for blob in seg.column("postings").to_pylist():
            ids, _ = decode_postings(blob)
            assert not np.isin(ids.astype(np.int64), victims).any()
        assert (np.asarray(seg.column("df").to_pylist()) > 0).all()

    # ES merge semantics: the compacted index scores EXACTLY like an
    # index of the surviving docs (original doc ids preserved)
    import pathlib as _pl

    from elasticsearch_assets_ray.search.oracle import BM25Oracle
    from elasticsearch_assets_ray.analysis.tokenizer import clip_tokens

    oracle = BM25Oracle()
    doc_id = 0
    for f in sorted(_pl.Path(small_corpus).glob("*.parquet")):
        for text in pq2.read_table(f, columns=["content"]).column("content").to_pylist():
            if doc_id not in victims:
                oracle.add(doc_id, clip_tokens(code_tokens(text), 1, 64))
            doc_id += 1
    eng2 = QueryEngine(idx, num_actors=2)
    for q in masked_ranks:
        got = eng2.search(q, k=20)
        want = oracle.search(code_tokens(q), k=20)
        assert [d for d, _ in got] == [d for d, _ in want], q
        assert all(abs(s1 - s2) < 1e-9 for (_, s1), (_, s2) in zip(got, want))
        assert not set(d for d, _ in got) & set(victims)
    eng2.shutdown()
    # idempotent: nothing left to compact
    assert compact_index(idx).num_rows == 0
    # re-deleting an ALREADY-compacted doc must not subtract it from the
    # stats twice (regression: stats.json double-subtraction)
    import json as _json

    stats_before = _json.loads((idx / "stats.json").read_text())
    delete_docs(idx, victims[:2])
    summary2 = compact_index(idx)
    assert int(sum(summary2.column("dropped_docs").to_pylist())) == 0
    stats_after = _json.loads((idx / "stats.json").read_text())
    assert stats_after == stats_before

    # a TRUE APPEND after compaction must not resurrect the dropped docs
    # in the stats (build's stats write subtracts the per-shard archives)
    from elasticsearch_assets_ray.corpus.synth import make_corpus_batch

    n_total = stats_before["num_docs"] + len(victims)  # pre-delete corpus size
    extra = make_corpus_batch(np.arange(n_total, n_total + 60, dtype=np.int64))
    pq2.write_table(extra, corpus / "zz-extra.parquet", row_group_size=30)
    info3 = build_index(corpus, idx, cfg)
    assert info3.stats.num_docs == stats_before["num_docs"] + 60
    # old segments untouched by the append → victims stay physically gone
    seg0 = pq2.read_table(info3.segment_path(0))
    for blob in seg0.column("postings").to_pylist():
        ids2, _ = decode_postings(blob)
        assert not np.isin(ids2.astype(np.int64), victims).any()

    # crash-recovery rebuild of ONE shard: its segment vanishes (the
    # compaction crash window); the rebuild re-indexes the shard's docs
    # and must convert the archive back to tombstones so the compacted
    # docs stay masked and the stats stay truthful
    from elasticsearch_assets_ray.index.deletes import (
        load_dropped_archive,
    )

    dirty_sid = next(
        sid for sid in info3.shard_ids()
        if len(load_dropped_archive(idx, sid))
    )
    n_reconverted = len(load_dropped_archive(idx, dirty_sid))
    shutil.rmtree(segment_dir(idx, dirty_sid))
    info5 = build_index(corpus, idx, cfg, resume=True)
    # the rebuilt shard's docs are physically back and TOMBSTONED, so they
    # count in N again (mask semantics) while staying invisible to search
    assert info5.stats.num_docs == stats_before["num_docs"] + 60 + n_reconverted
    assert len(load_dropped_archive(idx, dirty_sid)) == 0  # archive → tombstones
    assert len(load_deletes(idx, dirty_sid)) == n_reconverted
    eng3 = QueryEngine(idx, num_actors=1)
    got3 = eng3.search("import", k=50)
    assert not set(d for d, _ in got3) & set(victims)  # still masked
    eng3.shutdown()

    # a FULL REBUILD (changed config) re-indexes everything: archives
    # cleared, victims back, stats reflect the whole corpus
    info4 = build_index(corpus, idx,
                        IndexConfig(partition_target_docs=50,
                                    shard_target_docs=200))
    assert info4.stats.num_docs == n_total + 60


def test_global_merge_refuses_pending_tombstones(small_corpus, tmp_path):
    """merge_global_postings on an index with un-compacted deletes would
    serve deleted docs from the term-partitioned layout while the
    doc-partitioned engine masks them — it must refuse instead."""
    from elasticsearch_assets_ray.index.compact import compact_index
    from elasticsearch_assets_ray.index.deletes import delete_docs
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings

    cfg = IndexConfig(partition_target_docs=50, shard_target_docs=100)
    idx = tmp_path / "idx"
    build_index(small_corpus, idx, cfg)
    delete_docs(idx, [3, 57])
    with pytest.raises(ValueError, match="compact_index"):
        merge_global_postings(idx, tmp_path / "gidx", n_salts=2, n_buckets=4)
    compact_index(idx)
    merge_global_postings(idx, tmp_path / "gidx", n_salts=2, n_buckets=4)


def test_compact_stats_recomputed_not_incremental(small_corpus, tmp_path):
    """The stats refresh at the end of compact_index derives from the
    manifest totals minus ALL per-shard dropped archives — so a stats
    file left stale by a crashed earlier compaction (shard tasks done,
    refresh never ran) heals on the next compact run."""
    import json as _json

    from elasticsearch_assets_ray.index.compact import compact_index
    from elasticsearch_assets_ray.index.deletes import delete_docs

    cfg = IndexConfig(partition_target_docs=50, shard_target_docs=100)
    idx = tmp_path / "idx"
    build_index(small_corpus, idx, cfg)
    delete_docs(idx, [3, 57, 120])
    compact_index(idx)
    good = _json.loads((idx / "stats.json").read_text())
    # simulate the crash window: archives/segments on disk are compacted
    # but the stats refresh never happened (stats still pre-delete)
    stale = dict(good)
    stale["num_docs"] = good["num_docs"] + 3
    stale["total_tokens"] = good["total_tokens"] + 999
    (idx / "stats.json").write_text(_json.dumps(stale))
    delete_docs(idx, [250])  # a fresh tombstone so the next run has work
    compact_index(idx)
    healed = _json.loads((idx / "stats.json").read_text())
    assert healed["num_docs"] == good["num_docs"] - 1
    # an incremental subtraction from the stale file would have left the
    # phantom +3 docs / +999 tokens in place
    assert healed["total_tokens"] < good["total_tokens"]


def test_modified_file_incremental_rebuild(small_corpus, tmp_path):
    """A corpus file modified IN PLACE (same path, same row count) must
    never reuse its stale checkpointed segments.  The content
    fingerprint (size+mtime) routes it through the INCREMENTAL path:
    only the shards covering the modified file re-tokenize (untouched
    segments stay byte-identical on disk, unrewritten), and the result
    equals a cold rebuild of the whole corpus exactly."""
    import pathlib

    import pyarrow.parquet as pq2
    import shutil as sh

    from elasticsearch_assets_ray.corpus.synth import make_corpus_batch

    grow = tmp_path / "grow"
    grow.mkdir()
    files = sorted(pathlib.Path(small_corpus).glob("*.parquet"))
    for f in files:
        sh.copy(f, grow / f.name)
    cfg = IndexConfig(partition_target_docs=50, shard_target_docs=100)
    idx = tmp_path / "idx"
    info1 = build_index(grow, idx, cfg)
    n1 = info1.stats.num_docs
    last_sid = max(info1.shard_ids())
    seg_last_before = (segment_dir(idx, last_sid) / "segment.parquet").stat().st_mtime_ns

    # overwrite the FIRST file with different content (same row count,
    # DIFFERENT row-group layout — the re-map must handle both)
    first = grow / files[0].name
    rows = pq2.read_table(first).num_rows
    replacement = make_corpus_batch(np.arange(500_000, 500_000 + rows, dtype=np.int64))
    pq2.write_table(replacement, first, row_group_size=35)

    info2 = build_index(grow, idx, cfg, resume=True)
    assert info2.stats.num_docs == n1
    # the rebuilt index reflects the NEW content: sha of doc 0 changed
    import hashlib as _h

    dm = pq2.read_table(info2.docmeta_paths(0)[0],
                        columns=["doc_id", "content_sha256"])
    got_sha = dm.column("content_sha256")[0].as_py()
    want_sha = _h.sha256(
        replacement.column("content")[0].as_py().encode()
    ).hexdigest()
    assert got_sha == want_sha
    # untouched shard: segment file NOT rewritten (true incremental)
    assert (segment_dir(idx, last_sid) / "segment.parquet").stat().st_mtime_ns \
        == seg_last_before

    # equivalence: every segment byte-identical to a cold rebuild
    cold = tmp_path / "cold"
    info3 = build_index(grow, cold, cfg)
    for sid in info3.shard_ids():
        assert pq2.read_table(info2.segment_path(sid)).equals(
            pq2.read_table(info3.segment_path(sid))
        ), f"shard {sid} diverges from cold rebuild"
    assert info2.stats == info3.stats

    # a modified file whose ROW COUNT changed still falls back to a full
    # rebuild (later files' doc ids move)
    pq2.write_table(
        make_corpus_batch(np.arange(600_000, 600_000 + rows + 7, dtype=np.int64)),
        first, row_group_size=50,
    )
    info4 = build_index(grow, idx, cfg, resume=True)
    assert info4.stats.num_docs == n1 + 7


def test_wand_method_end_to_end(small_index, small_oracle):
    """method='wand' serving is rank+score identical to the oracle."""
    eng = QueryEngine(small_index.index_dir, num_actors=2, method="wand")
    for row in reference_queries().to_pylist()[:8]:
        got = eng.search(row["query"], k=row["k"])
        want = small_oracle.search(code_tokens(row["query"]), k=row["k"])
        assert [d for d, _ in got] == [d for d, _ in want]
        assert all(abs(s1 - s2) < 1e-9 for (_, s1), (_, s2) in zip(got, want))
    eng.shutdown()
    import pytest as _pt
    with _pt.raises(ValueError):
        _ScorerCore(str(small_index.index_dir), [0], BM25Params(), method="nope")


def test_for_codec_build_is_rank_identical(small_corpus, small_oracle, tmp_path):
    """postings_codec='for' (frame-of-reference bit packing) builds an
    index whose BM25 results are identical to varint's and the oracle's."""
    cfg = IndexConfig(partition_target_docs=100, shard_target_docs=200,
                      postings_codec="for")
    info = build_index(small_corpus, tmp_path / "idx_for", cfg)
    eng = QueryEngine(info.index_dir, num_actors=2)
    for row in reference_queries().to_pylist()[:6]:
        got = eng.search(row["query"], k=row["k"])
        want = small_oracle.search(code_tokens(row["query"]), k=row["k"])
        assert [d for d, _ in got] == [d for d, _ in want]
        assert all(abs(s1 - s2) < 1e-9 for (_, s1), (_, s2) in zip(got, want))
    eng.shutdown()


def test_hot_term_salted_across_shards(small_index):
    """`import` hits >60% of docs; the doc-range shard salt bounds every
    merge unit's slice of it (north-rule skew requirement)."""
    total_df = 0
    for sid in small_index.shard_ids():
        st = small_index.manifest.shards[sid]
        seg = pq.read_table(small_index.segment_path(sid))
        d = dict(zip(seg.column("term").to_pylist(), seg.column("df").to_pylist()))
        assert "import" in d  # hot term present in every doc-range shard
        assert d["import"] <= st.num_docs  # bounded by the salt range
        total_df += d["import"]
    assert total_df > 0.6 * small_index.stats.num_docs  # genuinely hot


def test_delete_semantics(small_corpus, small_oracle, tmp_path):
    """Bulk `delete` actions tombstone docs: they vanish from top-k while
    surviving docs keep their exact scores (Lucene-style mask; stats stay
    pre-delete until a rebuild, like ES before segment merge)."""
    import pyarrow as pa
    import ray.data as rd

    from elasticsearch_assets_ray.index.deletes import (
        apply_delete_actions, delete_docs, load_deletes,
    )

    cfg = IndexConfig(partition_target_docs=100, shard_target_docs=200)
    info = build_index(small_corpus, tmp_path / "idx_del", cfg)
    eng = QueryEngine(info.index_dir, num_actors=2)
    before = eng.search("import", k=10)
    eng.shutdown()
    victims = [d for d, _ in before[:3]]

    out = delete_docs(info.index_dir, victims)
    assert sum(out.values()) == 3
    assert sum(len(load_deletes(info.index_dir, s)) for s in info.shard_ids()) == 3
    delete_docs(info.index_dir, victims)  # idempotent
    assert sum(len(load_deletes(info.index_dir, s)) for s in info.shard_ids()) == 3

    eng = QueryEngine(info.index_dir, num_actors=2)
    for method_engine in (eng, QueryEngine(info.index_dir, num_actors=1, method="wand")):
        after = method_engine.search("import", k=10)
        got_ids = [d for d, _ in after]
        assert not set(victims) & set(got_ids)
        # survivors keep identical scores, in the same relative order
        want = [(d, s) for d, s in small_oracle.search(["import"], k=13)
                if d not in victims][:10]
        assert got_ids == [d for d, _ in want]
        assert all(abs(s1 - s2) < 1e-9 for (_, s1), (_, s2) in zip(after, want))
        method_engine.shutdown()

    # action-columns path (IndexSelector output shape)
    actions = rd.from_arrow(pa.table({
        "doc_id": pa.array([before[3][0], before[4][0]], pa.int64()),
        "action": pa.array(["delete", "index"], pa.string()),
    }))
    out2 = apply_delete_actions(actions, info.index_dir)
    assert sum(out2.values()) == 1  # only the delete row applies


def test_index_metrics_surface(small_index):
    m = small_index.metrics()
    assert m.num_rows == len(small_index.shard_ids())
    assert set(m.column("status").to_pylist()) == {"done"}
    assert sum(m.column("num_docs").to_pylist()) == small_index.stats.num_docs
    assert sum(m.column("total_tokens").to_pylist()) == small_index.stats.total_tokens


def test_distributed_bulk_scoring(small_index, small_oracle):
    """Dataset bulk path over the shard-actor pool (per-actor memory
    bounded by shard subset) matches the oracle."""
    from elasticsearch_assets_ray.search.engine import (
        score_queries_dataset_distributed,
    )

    eng = QueryEngine(small_index.index_dir, num_actors=2)
    qds = rd.from_arrow(reference_queries())
    out = score_queries_dataset_distributed(qds, eng).to_pandas()
    for row in reference_queries().to_pylist():
        want = small_oracle.search(code_tokens(row["query"]), k=row["k"])
        got = out[out.query_id == row["query_id"]].sort_values("rank")
        assert got.doc_id.tolist() == [d for d, _ in want]
        assert all(abs(a - b) < 1e-9
                   for a, (_, b) in zip(got.score.tolist(), want))
    eng.shutdown()


def test_per_lang_analyzer_conformance(small_corpus, tmp_path):
    """per-language analyzer routing (markdown → prose analyzer with
    stopword removal) matches an oracle built the same way."""
    from elasticsearch_assets_ray.search.oracle import BM25Oracle
    from elasticsearch_assets_ray.analysis.tokenizer import get_analyzer

    cfg = IndexConfig(analyzer="per_lang", partition_target_docs=100,
                      shard_target_docs=200)
    info = build_index(small_corpus, tmp_path / "idx_pl", cfg)
    oracle = BM25Oracle.from_parquet(small_corpus, analyzer="per_lang")
    assert abs(info.stats.avgdl - oracle.avgdl) < 1e-12  # stopwords removed in md docs
    eng = QueryEngine(info.index_dir, num_actors=2)
    code_an = get_analyzer("code")
    for q in ["parse config value", "import", "data stream batch"]:
        got = eng.search(q, k=10)
        want = oracle.search(sorted(set(code_an(q))), k=10)
        assert [d for d, _ in got] == [d for d, _ in want]
    eng.shutdown()


def test_global_term_merge_with_salting(small_index, small_oracle, tmp_path):
    """The literal groupby-on-term merge: doc-range segments → term-
    partitioned global index; hot terms split across salt sub-keys; the
    un-salted postings equal the oracle's exactly."""
    import pyarrow.dataset as pds

    from elasticsearch_assets_ray.index.global_merge import (
        merge_global_postings, read_term_postings,
    )

    out = tmp_path / "global_idx"
    merge_global_postings(small_index.index_dir, out, n_salts=3, n_buckets=4)

    full = pds.dataset(str(out)).to_table(columns=["term", "salt"])
    by_term = {}
    for t, s in zip(full.column("term").to_pylist(), full.column("salt").to_pylist()):
        by_term.setdefault(t, []).append(s)
    assert len(by_term["import"]) > 1  # hot term salted into multiple parts
    assert all(s >= 0 for s in by_term["import"])
    assert by_term["quorum"] == [-1]  # rare term unsalted

    for term in ["import", "return", "data", "quorum", "merge"]:
        ids, tfs = read_term_postings(out, term, n_buckets=4)
        want = small_oracle.postings.get(term, {})
        assert ids.tolist() == sorted(want)
        assert [int(t) for t in tfs] == [want[d] for d in sorted(want)]
    ids, _ = read_term_postings(out, "zzzzqqqq", n_buckets=4)
    assert len(ids) == 0


def test_term_partitioned_engine_rank_score_identical(small_index, small_oracle, tmp_path):
    """Serving from the TERM-partitioned layout (precomputed-impact
    norms, bucket actors, gather + weighted merge) is rank AND score
    identical to the oracle — the same conformance bar the
    doc-partitioned engine meets."""
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    out = tmp_path / "global_norms"
    merge_global_postings(small_index.index_dir, out, n_salts=3, n_buckets=4,
                          store_norms=True)
    eng = TermPartitionedEngine(out, num_actors=2)
    for row in reference_queries().to_pylist():
        got = eng.search(row["query"], k=row["k"])
        want = small_oracle.search(code_tokens(row["query"]), k=row["k"])
        assert [d for d, _ in got] == [d for d, _ in want], row["query"]
        for (_, s1), (_, s2) in zip(got, want):
            assert abs(s1 - s2) < 1e-9
    assert eng.search("zzzzqqqq") == []
    eng.shutdown()

    # the Dataset bulk path over the same engine matches the oracle too
    from elasticsearch_assets_ray.search.term_engine import (
        score_queries_dataset_term,
    )

    eng2 = TermPartitionedEngine(out, num_actors=2)
    out_df = score_queries_dataset_term(
        rd.from_arrow(reference_queries()), eng2
    ).to_pandas()
    for row in reference_queries().to_pylist():
        want = small_oracle.search(code_tokens(row["query"]), k=row["k"])
        got = out_df[out_df.query_id == row["query_id"]].sort_values("rank")
        assert got.doc_id.tolist() == [d for d, _ in want]
    eng2.shutdown()

    # the window-partitioned block-max skip path is rank+score identical
    # to the dense gather (the same conformance bar)
    engw = TermPartitionedEngine(out, num_actors=2, method="wand")
    engd = TermPartitionedEngine(out, num_actors=2, method="dense")
    for row in reference_queries().to_pylist():
        got_w = engw.search(row["query"], k=row["k"])
        got_d = engd.search(row["query"], k=row["k"])
        assert [d for d, _ in got_w] == [d for d, _ in got_d], row["query"]
        for (_, s1), (_, s2) in zip(got_w, got_d):
            assert s1 == s2  # bit-identical accumulation
    assert engw.search("zzzzqqqq") == []
    engw.shutdown()
    engd.shutdown()

    # a layout merged WITHOUT norms refuses term-partitioned serving
    out2 = tmp_path / "global_nonorms"
    merge_global_postings(small_index.index_dir, out2, n_salts=3, n_buckets=4)
    with pytest.raises(ValueError):
        TermPartitionedEngine(out2)


def test_edge_corpus_empty_docs_and_unicode(tmp_path):
    """Empty content, unicode, single-token docs: build + search + stats
    stay consistent (no NaNs, no crashes, sha invariant holds)."""
    import hashlib
    import pyarrow as pa
    import pyarrow.parquet as pq2

    rows = {
        "repo": ["r"] * 5,
        "path": [f"f{i}" for i in range(5)],
        "commit": ["c"] * 5,
        "lang": ["python", "markdown", "c", "go", "rust"],
        "content": ["", "Héllo wörld Ünïcode", "x", "import import import", "日本語テキスト"],
    }
    src = tmp_path / "edge"
    src.mkdir()
    pq2.write_table(pa.table(rows), src / "part-00000.parquet")
    cfg = IndexConfig(partition_target_docs=2, shard_target_docs=4)
    info = build_index(src, tmp_path / "edge_idx", cfg)
    assert info.stats.num_docs == 5
    from elasticsearch_assets_ray.state.docstore import DocStore

    metas = DocStore(info.index_dir).mget([0, 1, 2, 3, 4]).to_pylist()
    for m, text in zip(metas, rows["content"]):
        assert m["content_sha256"] == hashlib.sha256(text.encode()).hexdigest()
    assert metas[0]["dl"] == 0  # empty doc
    eng = QueryEngine(info.index_dir, num_actors=1)
    got = eng.search("import", k=5)
    assert [d for d, _ in got] == [3]
    assert eng.search("", k=5) == []
    # unicode word: code tokenizer keeps ascii alnum runs only
    assert eng.search("x", k=5)[0][0] == 2
    eng.shutdown()


def test_groupby_strategy_resume_and_no_resume(small_corpus, tmp_path):
    """Resume-after-crash under the groupby exchange strategy, and the
    resume=False full-rebuild path."""
    cfg = IndexConfig(partition_target_docs=50, shard_target_docs=100,
                      merge_strategy="groupby")
    idx = tmp_path / "idx_gb"
    info = build_index(small_corpus, idx, cfg)
    seg1 = pq.read_table(info.segment_path(1))
    shutil.rmtree(segment_dir(idx, 1))
    info2 = build_index(small_corpus, idx, cfg)
    assert pq.read_table(info2.segment_path(1)).equals(seg1)

    info3 = build_index(small_corpus, idx, cfg, resume=False)  # full rebuild
    assert pq.read_table(info3.segment_path(1)).equals(seg1)
    assert info3.stats == info.stats


def test_bool_query_matches_oracle(small_index, small_oracle):
    """ES bool-query clause algebra (must/should/must_not/filter/msm) is
    rank- AND score-identical between the shard-actor engine and the
    dict-based oracle across clause combinations."""
    eng = QueryEngine(small_index.index_dir, num_actors=2)
    cases = [
        dict(must="def return", should="", must_not="", filter=""),
        dict(must="def", should="query batch merge", must_not="", filter=""),
        dict(must="", should="sort merge join", must_not="", filter=""),
        dict(must="", should="sort merge join", must_not="window", filter=""),
        dict(must="def", should="", must_not="", filter="return"),
        dict(must="", should="sort merge join scan", must_not="", filter="",
             minimum_should_match=2),
        dict(must="def", should="sort merge", must_not="", filter="",
             minimum_should_match=1),  # explicit msm alongside must
        dict(must="zzzznotaterm", should="sort", must_not="", filter=""),
    ]
    for case in cases:
        got = eng.search_bool(k=15, **case)
        kw = {k: code_tokens(v) if isinstance(v, str) else v
              for k, v in case.items() if k != "minimum_should_match"}
        want = small_oracle.search_bool(
            k=15, minimum_should_match=case.get("minimum_should_match"), **kw
        )
        assert [d for d, _ in got] == [d for d, _ in want], case
        for (_, s1), (_, s2) in zip(got, want):
            assert abs(s1 - s2) < 1e-9
    # filter-only query: matches, every score 0, ranked by doc_id
    got = eng.search_bool(filter="def return", k=10)
    want = small_oracle.search_bool(filter=code_tokens("def return"), k=10)
    assert got and [d for d, _ in got] == [d for d, _ in want]
    assert all(s == 0.0 for _, s in got)
    import pytest as _pytest

    with _pytest.raises(Exception):
        eng.search_bool(must_not="def", k=5)  # no positive clause
    eng.shutdown()


def test_global_append_matches_full_merge(small_corpus, tmp_path):
    """append_global_postings after a corpus append serves BIT-EXACT the
    same results as a from-scratch merge of the grown index — the v2
    (per-posting dls) property: the moved avgdl reaches the scorer at
    load, it is never baked into the part files."""
    import pathlib
    import shutil as sh

    import numpy as np
    import pyarrow.parquet as pq2

    from elasticsearch_assets_ray.corpus.synth import make_corpus_batch
    from elasticsearch_assets_ray.index.global_merge import (
        append_global_postings,
        merge_global_postings,
    )
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    grow = tmp_path / "grow"
    grow.mkdir()
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        sh.copy(f, grow / f.name)
    cfg = IndexConfig(
        partition_target_docs=50, shard_target_docs=100, store_positions=True
    )
    idx = tmp_path / "idx"
    info1 = build_index(grow, idx, cfg)
    n1 = info1.stats.num_docs

    gdir = tmp_path / "global"
    merge_global_postings(idx, gdir, n_salts=3, n_buckets=4, store_norms=True)

    # grow the corpus, append-build the doc index, append the layout
    extra = make_corpus_batch(np.arange(n1, n1 + 120, dtype=np.int64))
    pq2.write_table(extra, grow / "zz-extra.parquet", row_group_size=60)
    info2 = build_index(grow, idx, cfg)
    append_global_postings(idx, gdir)

    # reference: full re-merge of the grown index into a fresh layout
    gref = tmp_path / "global_ref"
    merge_global_postings(idx, gref, n_salts=3, n_buckets=4, store_norms=True)

    ga = TermPartitionedEngine(gdir, num_actors=2)
    gb = TermPartitionedEngine(gref, num_actors=2)
    deng = QueryEngine(idx, num_actors=2)
    try:
        for q in ["import", "merge data", "salted probe cursor", "return value"]:
            a = ga.search(q, k=50)
            assert a == gb.search(q, k=50), q
            d = deng.search(q, k=50)
            assert [x for x, _ in a] == [x for x, _ in d], q
            for (_, s1), (_, s2) in zip(a, d):
                assert abs(s1 - s2) < 1e-12
            assert any(x >= n1 for x, _ in a) or not any(
                x >= n1 for x, _ in d
            )  # appended docs visible where the doc engine sees them
        for p in ["def merge", "return data"]:
            a = ga.search_phrase(p, k=1000)
            assert a == gb.search_phrase(p, k=1000), p
            w = deng.search_phrase(p, k=1000)
            assert [x for x, _ in a] == [x for x, _ in w], p
    finally:
        ga.shutdown()
        gb.shutdown()
        deng.shutdown()

    # idempotent: nothing new → no-op; meta lineage covers all shards
    import json

    append_global_postings(idx, gdir)
    meta = json.loads((gdir / "_globalmeta.json").read_text())
    assert meta["merged_shards"] == sorted(info2.shard_ids())
    assert meta["num_docs"] == info2.stats.num_docs


def test_index_cat_summary(small_index, small_corpus):
    """_cat/indices-style summary: doc counts track deletes, byte sizes
    are real file sizes, totals match the manifest."""
    import os

    from elasticsearch_assets_ray.index.deletes import delete_docs

    c = small_index.cat()
    assert c["docs_count"] == small_index.stats.num_docs
    assert c["docs_deleted"] == 0
    assert c["shards"] == small_index.stats.num_shards
    assert c["segments_bytes"] == sum(
        os.path.getsize(small_index.segment_path(s))
        for s in small_index.shard_ids()
    )
    assert c["store_bytes"] == c["segments_bytes"] + c["docmeta_bytes"]
    assert c["total_tokens"] == small_index.stats.total_tokens


def test_global_append_crash_idempotent(small_corpus, tmp_path):
    """A crash between the append's part write and its meta commit must
    not duplicate postings: parts land in a staging generation dir that
    readers ignore until the atomic meta replace lists it; the retry
    garbage-collects the leftover and commits exactly once."""
    import json
    import pathlib
    import shutil as sh

    import numpy as np
    import pyarrow.parquet as pq2

    from elasticsearch_assets_ray.corpus.synth import make_corpus_batch
    from elasticsearch_assets_ray.index.global_merge import (
        append_global_postings,
        merge_global_postings,
        read_term_postings,
    )
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    grow = tmp_path / "grow"
    grow.mkdir()
    src = sorted(pathlib.Path(small_corpus).glob("*.parquet"))
    for f in src:
        sh.copy(f, grow / f.name)
    cfg = IndexConfig(partition_target_docs=50, shard_target_docs=100)
    idx = tmp_path / "idx"
    info1 = build_index(grow, idx, cfg)
    n1 = info1.stats.num_docs
    gdir = tmp_path / "global"
    merge_global_postings(idx, gdir, n_salts=2, n_buckets=4, store_norms=True)

    extra = make_corpus_batch(np.arange(n1, n1 + 120, dtype=np.int64))
    pq2.write_table(extra, grow / "zz-extra.parquet", row_group_size=60)
    info2 = build_index(grow, idx, cfg)
    new_shards = sorted(set(info2.shard_ids()) - set(info1.shard_ids()))

    # simulate the crash: stage the append parts WITHOUT the meta commit
    meta = json.loads((gdir / "_globalmeta.json").read_text())
    merge_global_postings(
        idx, gdir, n_salts=2, n_buckets=4, store_norms=True,
        _append_only_shards=new_shards,
        _append_hot_terms=meta.get("hot_terms", []),
        _append_gen_dir=gdir / "_gen-crashed",
    )
    assert (gdir / "_gen-crashed").exists()
    # readers do NOT see the staged parts (pre-append state intact)
    ids, _ = read_term_postings(gdir, "import", n_buckets=4)
    assert all(i < n1 for i in ids.tolist())

    # retry: the real append GCs the leftover and commits exactly once
    append_global_postings(idx, gdir)
    assert not (gdir / "_gen-crashed").exists()
    meta2 = json.loads((gdir / "_globalmeta.json").read_text())
    assert len(meta2["generations"]) == 1

    gref = tmp_path / "gref"
    merge_global_postings(idx, gref, n_salts=2, n_buckets=4, store_norms=True)
    ga = TermPartitionedEngine(gdir, num_actors=1)
    gb = TermPartitionedEngine(gref, num_actors=1)
    try:
        for q in ["import", "merge data", "return value"]:
            assert ga.search(q, k=100) == gb.search(q, k=100), q
    finally:
        ga.shutdown()
        gb.shutdown()
    # postings for a hot term carry no duplicates
    ids2, _ = read_term_postings(gdir, "import", n_buckets=4)
    assert len(ids2) == len(np.unique(ids2))
    idsr, _ = read_term_postings(gref, "import", n_buckets=4)
    assert np.array_equal(np.sort(ids2), np.sort(idsr))


def test_engine_live_refresh_after_append(small_corpus, tmp_path):
    """QueryEngine.refresh() picks up appended shards without an actor
    restart: results equal a freshly constructed engine (N/avgdl/idf all
    follow the post-append stats), old shard state stays loaded."""
    import pathlib
    import shutil as sh

    import numpy as np
    import pyarrow.parquet as pq2

    from elasticsearch_assets_ray.corpus.synth import make_corpus_batch

    grow = tmp_path / "grow"
    grow.mkdir()
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        sh.copy(f, grow / f.name)
    cfg = IndexConfig(partition_target_docs=50, shard_target_docs=100,
                      store_positions=True)
    idx = tmp_path / "idx"
    info1 = build_index(grow, idx, cfg)
    n1 = info1.stats.num_docs
    eng = QueryEngine(idx, num_actors=2)
    try:
        assert eng.refresh() == 0  # nothing new → no-op
        base = eng.search("import", k=5)
        assert base

        extra = make_corpus_batch(np.arange(n1, n1 + 120, dtype=np.int64))
        pq2.write_table(extra, grow / "zz-extra.parquet", row_group_size=60)
        info2 = build_index(grow, idx, cfg)
        added = eng.refresh()
        assert added == len(set(info2.shard_ids()) - set(info1.shard_ids()))

        fresh = QueryEngine(idx, num_actors=2)
        try:
            for q in ["import", "merge data", "salted probe cursor"]:
                assert eng.search(q, k=50) == fresh.search(q, k=50), q
            for p in ["def merge", "return data"]:
                assert eng.search_phrase(p, k=100) == fresh.search_phrase(
                    p, k=100
                ), p
            got = eng.search("import", k=300)
            assert any(d >= n1 for d, _ in got)  # appended docs served
        finally:
            fresh.shutdown()
    finally:
        eng.shutdown()


def test_engine_refresh_updates_all_actors_stats(small_corpus, tmp_path):
    """ONE appended shard, more actors than new shards: every actor must
    adopt the post-append avgdl/N (an actor with no new shard scoring
    under the stale avgdl would silently corrupt merged rankings)."""
    import pathlib
    import shutil as sh

    import numpy as np
    import pyarrow.parquet as pq2

    from elasticsearch_assets_ray.corpus.synth import make_corpus_batch

    grow = tmp_path / "grow"
    grow.mkdir()
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        sh.copy(f, grow / f.name)
    cfg = IndexConfig(partition_target_docs=50, shard_target_docs=100)
    idx = tmp_path / "idx"
    info1 = build_index(grow, idx, cfg)
    n1 = info1.stats.num_docs
    eng = QueryEngine(idx, num_actors=3)
    try:
        eng.search("import", k=5)
        # one new 60-doc shard << 3 actors
        extra = make_corpus_batch(np.arange(n1, n1 + 60, dtype=np.int64))
        pq2.write_table(extra, grow / "zz-extra.parquet", row_group_size=60)
        info2 = build_index(grow, idx, cfg)
        added = eng.refresh()
        assert 0 < added < 3
        fresh = QueryEngine(idx, num_actors=3)
        try:
            for q in ["import", "merge data", "parse value"]:
                got = eng.search(q, k=50)
                want = fresh.search(q, k=50)
                assert [d for d, _ in got] == [d for d, _ in want], q
                for (_, s1), (_, s2) in zip(got, want):
                    assert s1 == s2, q  # bit-identical: same avgdl everywhere
        finally:
            fresh.shutdown()
    finally:
        eng.shutdown()


def test_refresh_global_tolerates_pending_tombstones(small_corpus, tmp_path):
    """refresh_global_postings with pending tombstones: keeps an existing
    layout as-of its last merge (warning, no crash — the persistent tick
    must survive); with no layout it raises."""
    import warnings

    from elasticsearch_assets_ray.index.deletes import delete_docs
    from elasticsearch_assets_ray.index.global_merge import (
        refresh_global_postings,
    )

    idx = tmp_path / "idx"
    build_index(small_corpus, idx,
                IndexConfig(partition_target_docs=50, shard_target_docs=100))
    gdir = tmp_path / "g"
    refresh_global_postings(idx, gdir, n_salts=2, n_buckets=4)
    delete_docs(idx, [0, 1])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = refresh_global_postings(idx, gdir, n_salts=2, n_buckets=4)
    assert out == gdir
    assert any("tombstones" in str(x.message) for x in w)
    import shutil as sh

    sh.rmtree(gdir)
    with pytest.raises(ValueError, match="tombstones"):
        refresh_global_postings(idx, gdir, n_salts=2, n_buckets=4)


def test_term_hash_vectorized_parity_and_compat():
    """fnv1a64: the column-wise numpy hash ≡ the scalar definition on
    adversarial strings; md5 default stays byte-stable (golden values —
    layouts predating the term_hash key must keep routing)."""
    import numpy as np
    import pyarrow as pa

    from elasticsearch_assets_ray.index.global_merge import (
        _fnv1a64,
        _fnv1a64_vec,
        _term_bucket,
        _term_buckets_vec,
    )

    rng = np.random.default_rng(11)
    terms = ["", "a", "zz", "データ", "naïve", "x" * 64] + [
        "".join(chr(rng.integers(0x21, 0x2FA0)) for _ in range(rng.integers(1, 30)))
        for _ in range(300)
    ]
    arr = pa.array(terms, pa.string())
    got = _fnv1a64_vec(arr)
    want = np.array([_fnv1a64(t.encode()) for t in terms], dtype=np.uint64)
    assert (got == want).all()
    # sliced arrays (non-zero offset) hash identically
    assert (_fnv1a64_vec(arr.slice(3, 50)) == want[3:53]).all()
    # bucket assignment: vec ≡ scalar for both algos
    for algo in ("fnv1a64", "md5"):
        vb = _term_buckets_vec(pa.array(terms[:50]), 16, algo)
        sb = [_term_bucket(t, 16, algo) for t in terms[:50]]
        assert vb.tolist() == sb, algo
    # md5 golden values (the pre-term_hash layout contract)
    assert _term_bucket("merge", 16) == _term_bucket("merge", 16, "md5")
    assert [_term_bucket(t, 16) for t in ["merge", "data", "import"]] == [
        int.from_bytes(__import__("hashlib").md5(t.encode()).digest()[:4],
                       "little") % 16
        for t in ["merge", "data", "import"]
    ]
    # reasonable spread
    assert len(set(_fnv1a64_vec(pa.array(terms)).tolist())) > 290


def test_new_layout_records_fnv_and_append_reuses_it(small_corpus, tmp_path):
    """Fresh merges record term_hash=fnv1a64; the engine routes with it;
    an append to the layout keeps the recorded hash (placement contract)."""
    import json

    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    out = tmp_path / "g"
    merge_global_postings(small_index_dir(small_corpus, tmp_path), out,
                          n_salts=2, n_buckets=4, store_norms=True)
    meta = json.loads((out / "_globalmeta.json").read_text())
    assert meta["term_hash"] == "fnv1a64"
    eng = TermPartitionedEngine(out, num_actors=1)
    try:
        assert eng._term_hash == "fnv1a64"
        assert eng.search("merge data", k=5)  # routing finds the terms
    finally:
        eng.shutdown()


def small_index_dir(small_corpus, tmp_path):
    from elasticsearch_assets_ray.config import IndexConfig
    from elasticsearch_assets_ray.index.build import build_index

    idx = tmp_path / "idx_for_hash"
    build_index(small_corpus, idx,
                IndexConfig(partition_target_docs=50, shard_target_docs=100))
    return idx
