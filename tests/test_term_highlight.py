"""Highlight served from the term-partitioned layout must be identical
to the shard-actor engine's (shared renderer; positions sliced from term
fetches vs per-doc shard lookups)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from elasticsearch_assets_ray.config import BM25Params, IndexConfig
from elasticsearch_assets_ray.index.build import build_index
from elasticsearch_assets_ray.index.global_merge import merge_global_postings
from elasticsearch_assets_ray.search.engine import QueryEngine
from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine


def test_highlight_parity_term_vs_shard(tmp_path, ray_session):
    rng = np.random.default_rng(13)
    n = 150
    words = ["alpha", "beta", "gamma", "delta", "omega", "sigma"]
    texts = [
        " ".join(words[j] for j in rng.integers(0, len(words), rng.integers(3, 14)))
        for _ in range(n)
    ]
    src = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts),
            }
        ),
        src,
    )
    idx = tmp_path / "idx"
    build_index(
        str(src), idx,
        IndexConfig(
            analyzer="simple", text_col="text", lang_col=None, id_col="doc_id",
            meta_cols=(), partition_target_docs=16, shard_target_docs=48,
            store_positions=True,
        ),
    )
    gdir = tmp_path / "global"
    merge_global_postings(idx, gdir, n_salts=2, n_buckets=4,
                          hot_df_fraction=0.5, store_norms=True)
    eng = QueryEngine(idx, num_actors=2, params=BM25Params(round_decimals=4))
    teng = TermPartitionedEngine(gdir, num_actors=2, round_decimals=4)
    try:
        for q in ["alpha", "alpha beta", "omega sigma gamma", "zzznope"]:
            a = eng.search_highlight(q, k=8, fragment_size=30,
                                     number_of_fragments=3)
            b = teng.search_highlight(q, k=8, fragment_size=30,
                                      number_of_fragments=3)
            assert a == b, q
        # a hit must actually carry tags around every matched term
        hl = teng.search_highlight("alpha", k=3)
        assert hl and all("<em>alpha</em>" in h["highlighted"] for h in hl)
        assert all(h["n_matches"] >= 1 for h in hl)
    finally:
        eng.shutdown()
        teng.shutdown()
