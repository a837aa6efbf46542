"""date_histogram kernel + ingest-time derived docmeta columns."""

import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.search.datehist import (
    buckets_from_partials,
    floor_interval_us,
    parse_fixed_interval_us,
    partial_over_values,
)


def _us(s: str) -> int:
    d = dt.datetime.fromisoformat(s).replace(tzinfo=dt.timezone.utc)
    return int(d.timestamp() * 1_000_000)


def test_floor_interval_calendar_and_fixed():
    v = np.array(
        [_us("2024-03-15T13:45:10"), _us("2024-01-01T00:00:00"),
         _us("2025-12-31T23:59:59")]
    )
    cases = {
        "day": ["2024-03-15", "2024-01-01", "2025-12-31"],
        # weeks start Monday (ES/ISO)
        "week": ["2024-03-11", "2024-01-01", "2025-12-29"],
        "month": ["2024-03-01", "2024-01-01", "2025-12-01"],
        "quarter": ["2024-01-01", "2024-01-01", "2025-10-01"],
        "year": ["2024-01-01", "2024-01-01", "2025-01-01"],
        # fixed intervals are epoch-aligned
        "12h": ["2024-03-15T12:00:00", "2024-01-01", "2025-12-31T12:00:00"],
        "30m": ["2024-03-15T13:30:00", "2024-01-01", "2025-12-31T23:30:00"],
    }
    for interval, want in cases.items():
        got = floor_interval_us(v, interval)
        assert (got == np.array([_us(w) for w in want])).all(), interval


def test_parse_fixed_interval():
    assert parse_fixed_interval_us("1d") == 86_400_000_000
    assert parse_fixed_interval_us("5ms") == 5_000
    assert parse_fixed_interval_us("month") is None
    assert parse_fixed_interval_us("0h") is None
    with pytest.raises(ValueError):
        floor_interval_us(np.array([0]), "fortnight")


def test_partials_merge_to_buckets():
    k1, k2 = _us("2024-01-01"), _us("2024-02-01")
    p1 = partial_over_values(np.array([k1, k1, k2]), np.array([1.0, 3.0, 10.0]))
    p2 = partial_over_values(np.array([k2]), np.array([2.0]))
    rows = buckets_from_partials([p1, p2], stats_on="dl")
    assert [r["key"] for r in rows] == [k1, k2]  # key ascending (ES order)
    assert rows[0] == {"key": k1, "doc_count": 2, "sum": 4.0, "min": 1.0,
                       "max": 3.0, "avg": 2.0}
    assert rows[1]["doc_count"] == 2 and rows[1]["max"] == 10.0
    # count-only partials merge without stats
    c = buckets_from_partials(
        [partial_over_values(np.array([k1]), None)], stats_on=None
    )
    assert c == [{"key": k1, "doc_count": 1}]


def test_derived_meta_column_and_fingerprint(tmp_path, ray_session):
    """ts_from_int derives a timestamp docmeta column; changing the recipe
    changes the plan fingerprint (stale docmeta can never be reused)."""
    from elasticsearch_assets_ray.config import IndexConfig
    from elasticsearch_assets_ray.index.build import build_index, docmeta_path

    src = tmp_path / "docs.parquet"
    n = 40
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array([f"alpha beta doc{i}" for i in range(n)]),
            }
        ),
        src,
    )
    spec = "created_at=ts_from_int:doc_id:1704067200:8647:63072000"
    cfg = IndexConfig(
        analyzer="simple", text_col="text", lang_col=None, id_col="doc_id",
        meta_cols=("created_at",), derived_meta=(spec,),
        partition_target_docs=16, shard_target_docs=32,
    )
    idx = tmp_path / "idx"
    build_index(str(src), idx, cfg)
    dm = pq.read_table(docmeta_path(idx, 0))
    col = dm.column("created_at")
    assert pa.types.is_timestamp(col.type)
    got_us = col.cast(pa.int64()).to_numpy()
    ids = dm.column("doc_id").to_numpy()
    want_us = (1704067200 + (ids * 8647) % 63072000) * 1_000_000
    assert (got_us == want_us).all()
    # a changed recipe must change the fingerprint → full rebuild path
    from elasticsearch_assets_ray.index.manifest import BuildManifest

    m = BuildManifest.load(idx)
    fp1 = m.plan_fingerprint()
    m.derived_meta = ["created_at=ts_from_int:doc_id:1704067200:8647:1000"]
    assert m.plan_fingerprint() != fp1

    # bad specs fail eagerly at config time
    with pytest.raises(ValueError):
        IndexConfig(derived_meta=("nonsense",))
    with pytest.raises(ValueError):
        IndexConfig(meta_cols=(), derived_meta=("x=ts_from_int:doc_id:0:1:1",))


def test_date_histogram_engines_agree(tmp_path, ray_session):
    """Shard-actor and term-partitioned engines produce identical
    date_histogram buckets on the same corpus (all interval kinds)."""
    from elasticsearch_assets_ray.config import BM25Params, IndexConfig
    from elasticsearch_assets_ray.index.build import build_index
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.engine import QueryEngine
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    src = tmp_path / "docs.parquet"
    rng = np.random.default_rng(7)
    n = 120
    words = ["alpha", "beta", "gamma", "delta"]
    texts = [
        " ".join(words[j] for j in rng.integers(0, 4, rng.integers(2, 9)))
        for _ in range(n)
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts),
            }
        ),
        src,
    )
    cfg = IndexConfig(
        analyzer="simple", text_col="text", lang_col=None, id_col="doc_id",
        meta_cols=("created_at",),
        derived_meta=("created_at=ts_from_int:doc_id:1704067200:8647:63072000",),
        partition_target_docs=16, shard_target_docs=48,
    )
    idx = tmp_path / "idx"
    build_index(str(src), idx, cfg)
    gdir = tmp_path / "global"
    merge_global_postings(idx, gdir, n_salts=2, n_buckets=4,
                          hot_df_fraction=0.5, store_norms=True)
    eng = QueryEngine(idx, num_actors=2, params=BM25Params(round_decimals=4))
    teng = TermPartitionedEngine(gdir, num_actors=2, round_decimals=4)
    try:
        for interval in ["month", "week", "quarter", "12h"]:
            a = eng.date_histogram(
                "alpha beta", field="created_at", interval=interval,
                stats_on="dl",
            )
            b = teng.date_histogram(
                "alpha beta", field="created_at", interval=interval,
                stats_on="dl",
            )
            assert a == b, interval
            assert a and all(
                a[i]["key"] < a[i + 1]["key"] for i in range(len(a) - 1)
            )
        # count-only and empty-query paths
        assert eng.date_histogram("alpha", field="created_at") == \
            teng.date_histogram("alpha", field="created_at")
        assert eng.date_histogram("", field="created_at") == []
    finally:
        eng.shutdown()
        teng.shutdown()
