"""Live refresh of a running TermPartitionedEngine: bucket actors adopt
committed append generations in place (load only new part files, renorm
under the moved avgdl from retained dl/tf) and serve results identical
to a freshly constructed engine."""

import pathlib
import shutil as sh

import numpy as np
import pyarrow.parquet as pq

from elasticsearch_assets_ray.config import IndexConfig
from elasticsearch_assets_ray.corpus.synth import make_corpus_batch, write_corpus
from elasticsearch_assets_ray.index.build import build_index
from elasticsearch_assets_ray.index.global_merge import (
    append_global_postings,
    merge_global_postings,
)
from elasticsearch_assets_ray.search.engine import QueryEngine
from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

QUERIES = ["import", "merge data", "salted probe cursor", "return value"]
PHRASES = ["def merge", "return data"]


def test_live_refresh_adopts_append(tmp_path, ray_session):
    base = write_corpus(tmp_path / "base", 400, rows_per_file=100)
    grow = tmp_path / "grow"
    grow.mkdir()
    for f in sorted(pathlib.Path(base).glob("*.parquet")):
        sh.copy(f, grow / f.name)
    cfg = IndexConfig(
        partition_target_docs=50, shard_target_docs=100, store_positions=True
    )
    idx = tmp_path / "idx"
    info1 = build_index(grow, idx, cfg)
    n1 = info1.stats.num_docs
    gdir = tmp_path / "global"
    merge_global_postings(idx, gdir, n_salts=3, n_buckets=4, store_norms=True)

    live = TermPartitionedEngine(gdir, num_actors=2)  # constructed BEFORE
    pre = {q: live.search(q, k=30) for q in QUERIES}  # warm the term cache

    # warm the dictionary-walk caches BEFORE the append so a stale
    # sorted/reversed term list would be caught below
    pre_wild = live.search_wildcard("*mport", k=10)
    assert pre_wild  # suffix of "import" — must match pre-append docs

    extra = make_corpus_batch(np.arange(n1, n1 + 150, dtype=np.int64))
    # inject a term that exists ONLY in the append generation — walks
    # must see it after refresh (walk caches invalidate on _note_loaded)
    import pyarrow as pa
    import pyarrow.compute as pc

    content2 = pc.binary_join_element_wise(
        extra.column("content").cast(pa.string()),
        pa.scalar(" zzqnewterm"), ""
    )
    extra = extra.set_column(
        extra.schema.get_field_index("content"), "content", content2
    )
    pq.write_table(extra, grow / "zz-extra.parquet", row_group_size=50)
    build_index(grow, idx, cfg)
    append_global_postings(idx, gdir)

    live._mass_cache = {"stale_term": 1}  # phrase-gate memo must not survive
    statuses = live.refresh()
    assert statuses and all(s == "appended" for s in statuses), statuses
    # refresh drops every layout-dependent coordinator cache, including
    # the phrase-gate position-mass memo (code-review regression)
    assert not hasattr(live, "_mass_cache")

    fresh = TermPartitionedEngine(gdir, num_actors=2)
    deng = QueryEngine(idx, num_actors=2)
    try:
        saw_new = False
        for q in QUERIES:
            a = live.search(q, k=50)
            assert a == fresh.search(q, k=50), q
            d = deng.search(q, k=50)
            assert [x for x, _ in a] == [x for x, _ in d], q
            for (_, s1), (_, s2) in zip(a, d):
                assert abs(s1 - s2) < 1e-12
            saw_new |= any(x >= n1 for x, _ in a)
            # the moved avgdl must actually have changed old docs' scores
            # somewhere (else the renorm path wasn't exercised)
        assert saw_new
        assert any(
            dict(pre[q]).get(doc) not in (None, s)
            for q in QUERIES
            for doc, s in live.search(q, k=30)
        )
        # dictionary walks see the append-only term (stale-cache check):
        # both the prefix range and the reversed-dictionary suffix walk
        got_new = live.search_wildcard("zzqnew*", k=200)
        assert got_new == fresh.search_wildcard("zzqnew*", k=200)
        assert got_new and all(x >= n1 for x, _ in got_new)
        got_suf = live.search_wildcard("*qnewterm", k=200)
        assert got_suf == fresh.search_wildcard("*qnewterm", k=200)
        assert got_suf and all(x >= n1 for x, _ in got_suf)
        assert live.search_wildcard("*mport", k=10) == \
            fresh.search_wildcard("*mport", k=10)
        for p in PHRASES:
            assert live.search_phrase(p, k=100) == fresh.search_phrase(p, k=100)
        assert live.search_phrase("merge data", k=20, slop=2,
                                  slop_mode="lucene") == \
            fresh.search_phrase("merge data", k=20, slop=2, slop_mode="lucene")
        assert live.search_bool(must="import", should="data merge", k=25) == \
            fresh.search_bool(must="import", should="data merge", k=25)
        assert live.search_highlight("merge data", k=5) == \
            fresh.search_highlight("merge data", k=5)
        assert live.more_like_this(3, k=10) == fresh.more_like_this(3, k=10)
        # second refresh with nothing new: noop
        assert all(s == "noop" for s in live.refresh())
    finally:
        live.shutdown()
        fresh.shutdown()
        deng.shutdown()
