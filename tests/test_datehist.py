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


def test_range_expand_es_semantics():
    """from inclusive, to exclusive, open ends, overlap → every matching
    bucket (ES range-agg semantics)."""
    from elasticsearch_assets_ray.search.datehist import (
        bucket_partial,
        range_expand,
    )

    v = np.array([1.0, 5.0, 10.0, 20.0])
    ranges = [(None, 5.0), (5.0, 20.0), (0.0, 100.0)]  # 3rd overlaps all
    keys, vals = range_expand(v, ranges, np.array([10.0, 20.0, 30.0, 40.0]))
    got = sorted(zip(keys.tolist(), vals.tolist()))
    assert got == [(0, 10.0), (1, 20.0), (1, 30.0),
                   (2, 10.0), (2, 20.0), (2, 30.0), (2, 40.0)]
    # no range matches → empty
    k2, v2 = range_expand(np.array([50.0]), [(0.0, 10.0)], None)
    assert len(k2) == 0 and v2 is None
    p = bucket_partial(np.array([1.0, 5.0]), ("ranges", ranges), None)
    assert p[0] == (1, None, None, None) and p[2][0] == 2


def test_enumerate_bucket_keys_and_next():
    from elasticsearch_assets_ray.search.datehist import (
        enumerate_bucket_keys,
        next_bucket_key,
    )

    # fixed interval: simple arithmetic
    assert enumerate_bucket_keys(_us("2024-01-01T05:00:00"),
                                 _us("2024-01-02T13:00:00"), "12h") == [
        _us("2024-01-01T00:00:00"), _us("2024-01-01T12:00:00"),
        _us("2024-01-02T00:00:00"), _us("2024-01-02T12:00:00"),
    ]
    # calendar months step through year boundaries and short months
    assert enumerate_bucket_keys(_us("2023-11-15"), _us("2024-02-02"),
                                 "month") == [
        _us("2023-11-01"), _us("2023-12-01"), _us("2024-01-01"),
        _us("2024-02-01"),
    ]
    assert next_bucket_key(_us("2024-02-01"), "month") == _us("2024-03-01")
    assert next_bucket_key(_us("2024-10-01"), "quarter") == _us("2025-01-01")
    # weeks stay Monday-aligned
    assert next_bucket_key(_us("2024-03-11"), "week") == _us("2024-03-18")
    assert enumerate_bucket_keys(_us("2024-01-02"), _us("2024-01-01"),
                                 "day") == []


def test_zero_fill_and_extended_bounds():
    k_jan, k_apr = _us("2024-01-01"), _us("2024-04-01")
    p = partial_over_values(np.array([k_jan, k_apr, k_apr]), None)
    # default min_doc_count=1: only non-empty buckets
    assert [r["key"] for r in buckets_from_partials([p], None,
                                                    interval="month")] == \
        [k_jan, k_apr]
    # min_doc_count=0 fills feb+mar
    rows = buckets_from_partials([p], None, interval="month",
                                 min_doc_count=0)
    assert [(r["key"], r["doc_count"]) for r in rows] == [
        (k_jan, 1), (_us("2024-02-01"), 0), (_us("2024-03-01"), 0),
        (k_apr, 2),
    ]
    # extended_bounds (ISO strings) widen the span; stats rows untouched
    rows = buckets_from_partials(
        [p], None, interval="month", min_doc_count=0,
        extended_bounds=("2023-12-05", "2024-05-20"),
    )
    assert rows[0]["key"] == _us("2023-12-01")
    assert rows[-1] == {"key": _us("2024-05-01"), "doc_count": 0}
    assert len(rows) == 6


def test_numeric_fill_no_float_drift():
    """Zero-fill keys must be BIT-identical to the bucket kernel's floats
    for non-binary-exact intervals (0.1): a drifting running sum mints
    phantom duplicate buckets (code-review regression)."""
    from elasticsearch_assets_ray.search.datehist import (
        bucket_partial,
        buckets_from_partials,
    )

    p = bucket_partial(np.array([0.75, 0.95]), ("histogram", (0.1, 0.0)),
                       None)
    rows = buckets_from_partials([p], None, interval=(0.1, 0.0),
                                 min_doc_count=0)
    assert len(rows) == 3, rows  # 0.7, 0.8(empty), 0.9 — no phantom 4th
    assert [r["doc_count"] for r in rows] == [1, 0, 1]
    # the filled key equals the kernel key bit-for-bit
    kernel_keys = set(p)
    assert {rows[0]["key"], rows[2]["key"]} == kernel_keys


def test_empty_query_agg_shapes():
    """Aggregations over a query that matches nothing keep their ES
    shape: declared ranges still emit doc_count-0 rows; extended_bounds
    still zero-fill; None bounds (open ends) don't crash."""
    from elasticsearch_assets_ray.search.datehist import (
        buckets_from_partials,
        range_buckets_from_partials,
    )

    rows = range_buckets_from_partials([], [(None, 5.0), (5.0, None)], "x")
    assert [r["doc_count"] for r in rows] == [0, 0]
    fill = buckets_from_partials([], None, interval="1d", min_doc_count=0,
                                 extended_bounds=("2024-01-03",
                                                  "2024-01-05"))
    assert [r["doc_count"] for r in fill] == [0, 0, 0]
    # one-sided bounds: the open end contributes nothing, no TypeError
    one = buckets_from_partials([], None, interval="1d", min_doc_count=0,
                                extended_bounds=(None, "2024-01-02"))
    assert one == [{"key": _us("2024-01-02"), "doc_count": 0}]


def test_percentile_sketch_kernel():
    """Log-bucket percentile sketch: associative merge, underflow
    bucket for non-positive values, relative error within the bound
    over 6 decades."""
    from elasticsearch_assets_ray.search.datehist import (
        merge_count_partials,
        pctl_exact,
        pctl_from_sketch,
        pctl_sketch_partial,
    )

    rng = np.random.default_rng(5)
    v = 10.0 ** rng.uniform(-2, 4, 20_000)  # 6 decades
    k = 200
    # split into 4 partials, merge in two different orders → same dict
    chunks = np.array_split(v, 4)
    m1: dict = {}
    for c in chunks:
        merge_count_partials(m1, pctl_sketch_partial(c, k))
    m2: dict = {}
    for c in reversed(chunks):
        merge_count_partials(m2, pctl_sketch_partial(c, k))
    assert m1 == m2
    pct = (1.0, 50.0, 99.0)
    approx = pctl_from_sketch(m1, pct, k)
    exact = pctl_exact([np.sort(v)], pct)
    bound = 10.0 ** (1.0 / (2 * k)) - 1.0  # documented half-bucket error
    for p in pct:
        assert abs(approx[p] - exact[p]) <= 2 * bound * exact[p], p
    # non-positive values: underflow bucket, reported as 0.0
    m = pctl_sketch_partial(np.array([-1.0, 0.0, 5.0]), k)
    assert sum(m.values()) == 3
    got = pctl_from_sketch(m, (25.0,), k)
    assert got[25.0] == 0.0
    # empty
    assert pctl_from_sketch({}, (50.0,), k) == {50.0: None}
    assert pctl_exact([], (50.0,)) == {50.0: None}


def test_tz_floor_matches_duckdb_icu():
    """The vectorized timezone-aware floor (zoneinfo transition table)
    is bit-identical to DuckDB ICU's double-AT-TIME-ZONE date_trunc
    across DST transitions (spring-forward gap, fall-back overlap, both
    directions of the boundary, multiple years and zones)."""
    import duckdb

    from elasticsearch_assets_ray.search.datehist import (
        floor_interval_us_tz,
    )

    stamps = [
        "2024-03-10T06:59:00", "2024-03-10T07:01:00",
        "2024-03-09T04:59:00", "2024-11-03T05:59:00",
        "2024-11-03T06:01:00", "2024-11-03T07:30:00",
        "2024-06-15T03:59:00", "2024-01-01T04:59:00",
        "2024-01-01T05:01:00", "2025-03-09T06:30:00",
        "2023-11-05T06:30:00", "2024-12-31T23:30:00",
    ]
    v = np.array(
        [int(np.datetime64(s).astype("datetime64[us]").astype(np.int64))
         for s in stamps], np.int64,
    )
    con = duckdb.connect()
    for tz in ["America/New_York", "Europe/Berlin", "Asia/Kolkata"]:
        for interval in ["day", "month", "week", "year"]:
            mine = floor_interval_us_tz(v, interval, tz)
            sql = (
                f"SELECT epoch_us((date_trunc('{interval}', "
                f"(make_timestamp(x) AT TIME ZONE 'UTC') "
                f"AT TIME ZONE '{tz}')) AT TIME ZONE '{tz}') "
                f"FROM (SELECT unnest({[int(x) for x in v]}) AS x)"
            )
            want = [r[0] for r in con.execute(sql).fetchall()]
            assert mine.tolist() == want, (tz, interval)
    # engines: UTC default unchanged, tz gives shifted keys
    assert (floor_interval_us_tz(v, "day", "UTC")
            == np.array([int(x) for x in v]) // 86_400_000_000
            * 86_400_000_000).all()


def test_tz_transition_edge_and_nan_omission():
    """Review regressions: (a) bucket keys coinciding with a DST
    transition map back with the POST-transition offset (the 1-second
    bisection tolerance put them one offset off vs the ICU oracle);
    (b) missing timestamps are omitted, not crashed on / bucketed as
    garbage."""
    import duckdb

    from elasticsearch_assets_ray.search.datehist import (
        bucket_partial,
        floor_interval_us_tz,
    )

    v = np.array([_us("2024-03-10T07:01:00")], np.int64)  # NY 03:01 EDT
    got = int(floor_interval_us_tz(v, "1h", "America/New_York")[0])
    con = duckdb.connect()
    want = con.execute(
        f"SELECT epoch_us((date_trunc('hour', (make_timestamp({int(v[0])})"
        f" AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York')) "
        f"AT TIME ZONE 'America/New_York')"
    ).fetchone()[0]
    assert got == want  # 07:00 UTC (03:00 EDT), not 08:00
    p = bucket_partial(
        np.array([np.nan, float(_us("2024-06-01"))]),
        ("interval_tz", ("day", "America/New_York")), None,
    )
    assert sum(c for c, *_ in p.values()) == 1
    p2 = bucket_partial(np.array([np.nan, 5.0]),
                        ("histogram", (2.0, 0.0)), None)
    assert sum(c for c, *_ in p2.values()) == 1


def test_per_group_head_tie_class():
    """The shared per-group head-k split extends through the kth
    ROUNDED tie class when asked (shard boundaries must not decide
    rounded ties) and takes plain first-k otherwise."""
    from elasticsearch_assets_ray.search.datehist import per_group_head

    ginv = np.array([0, 0, 0, 1, 1])
    rounded = np.array([1.0, 1.0, 0.5, 2.0, 2.0])
    docs = np.array([10, 5, 7, 3, 1])
    order = np.lexsort((docs, -rounded, ginv))
    plain = dict(per_group_head(ginv, order, 1))
    assert [int(docs[i]) for i in plain[0]] == [5]
    tied = dict(per_group_head(ginv, order, 1, tie_vals=rounded))
    assert [int(docs[i]) for i in tied[0]] == [5, 10]  # tie class kept
    assert [int(docs[i]) for i in tied[1]] == [1, 3]
    assert per_group_head(np.empty(0, np.int64),
                          np.empty(0, np.int64), 3) == []


def test_datehist_offset_kernel():
    """ES offset semantics: the bucket grid shifts by the duration
    (key = floor(v - off) + off), applied in the local frame when a
    time_zone is also given."""
    from elasticsearch_assets_ray.search.datehist import (
        floor_interval_us_offset,
        parse_offset_us,
    )

    assert parse_offset_us("+6h") == 6 * 3_600_000_000
    assert parse_offset_us("-30m") == -30 * 60_000_000
    assert parse_offset_us("1d") == 86_400_000_000
    assert parse_offset_us(123) == 123
    with pytest.raises(ValueError):
        parse_offset_us("next tuesday")
    v = np.array([_us("2024-03-15T05:00:00"), _us("2024-03-15T07:00:00")])
    got = floor_interval_us_offset(v, "day", "+6h")
    # day buckets anchored at 06:00: 05:00 → prior day 06:00; 07:00 →
    # same-day 06:00
    assert got.tolist() == [_us("2024-03-14T06:00:00"),
                            _us("2024-03-15T06:00:00")]
    # with tz: offset applies in the LOCAL frame (NY = UTC-5 in March
    # pre-DST... use Jan): local midnight+6h boundary = 11:00 UTC
    vj = np.array([_us("2024-01-15T10:00:00"), _us("2024-01-15T12:00:00")])
    gj = floor_interval_us_offset(vj, "day", "+6h", "America/New_York")
    assert gj.tolist() == [_us("2024-01-14T11:00:00"),
                           _us("2024-01-15T11:00:00")]


def test_null_group_values_omitted():
    """Docs with a missing group/source value are OMITTED (ES semantics),
    not crashed on, by the composite and grouped partial kernels."""
    from elasticsearch_assets_ray.search.datehist import (
        bucket_partial,
        composite_partial,
        partial_over_pairs,
        valid_mask,
    )

    g = np.array(["a", None, "b", "a"], dtype=object)
    v = np.array([1.0, np.nan, 3.0, 4.0])
    assert valid_mask(g).tolist() == [True, False, True, True]
    assert valid_mask(v).tolist() == [True, False, True, True]
    keys = np.array([10, 10, 20, 20], dtype=np.int64)
    p = bucket_partial(keys, ("interval_terms", ("1ms", g)), None)
    # the None row is gone; remaining rows bucket normally
    # (keys floor to themselves at 1ms: 10 and 20 micros → 0 buckets of
    # 1000us → both 0; actually 10//1000*1000 = 0 for both)
    assert sum(c for c, *_ in p.values()) == 3
    assert all(t in ("a", "b") for _, t in p)
    # composite: a row with None in ANY source column is omitted
    cp = composite_partial([keys.astype(np.float64), g], 10, None)
    assert sum(cp.values()) == 3 and all(
        None not in k for k in cp
    )
    pp = partial_over_pairs(np.array([1, 1, 2]),
                            np.array(["x", "y", "x"], dtype=object), None)
    assert pp == {(1, "x"): (1, None, None, None),
                  (1, "y"): (1, None, None, None),
                  (2, "x"): (1, None, None, None)}


def test_grouped_histograms_never_zero_fill(ray_session):
    """min_doc_count=0 with group_by is forced off (ES fills the parent
    histogram only) — including the empty-match path, which previously
    emitted term-less fill rows."""
    from elasticsearch_assets_ray.search.datehist import (
        buckets_from_partials,
    )

    rows = buckets_from_partials(
        [{(1000, "a"): (2, None, None, None)}], None, interval="1ms",
        min_doc_count=0, extended_bounds=(0, 5000),
    )
    assert rows == [{"key": 1000, "term": "a", "doc_count": 2}]


def test_range_buckets_rendering():
    from elasticsearch_assets_ray.search.datehist import (
        range_buckets_from_partials,
    )

    ranges = [(None, 5.0), (5.0, 20.0), (100.0, None)]
    partials = [{0: (2, 7.0, 3.0, 4.0)}, {1: (1, 9.0, 9.0, 9.0)}]
    rows = range_buckets_from_partials(partials, ranges, stats_on="dl")
    # declaration order, empty ranges kept, ES-style keys
    assert [r["key"] for r in rows] == ["*-5", "5-20", "100-*"]
    assert rows[0]["doc_count"] == 2 and rows[0]["sum"] == 7.0
    assert rows[2] == {"key": "100-*", "from": 100.0, "to": None,
                       "doc_count": 0}


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

        # zero-fill parity (+ extended bounds as ISO strings)
        fa = eng.date_histogram(
            "alpha beta", field="created_at", interval="month",
            min_doc_count=0, extended_bounds=("2023-10-01", "2026-06-01"),
        )
        fb = teng.date_histogram(
            "alpha beta", field="created_at", interval="month",
            min_doc_count=0, extended_bounds=("2023-10-01", "2026-06-01"),
        )
        assert fa == fb
        assert fa[0]["key"] == _us("2023-10-01")
        assert fa[-1]["key"] == _us("2026-06-01")
        ks = [r["key"] for r in fa]
        assert len(ks) == 33 and any(r["doc_count"] == 0 for r in fa)

        # range / date_range aggregation parity + brute-force oracle
        date_ranges = [
            {"to": "2024-06-01"},
            {"from": "2024-06-01", "to": "2025-01-01"},
            {"from": "2024-01-01"},  # overlaps both — docs double-count
        ]
        ra = eng.range_agg("alpha beta", field="created_at",
                           ranges=date_ranges, stats_on="dl")
        rb = teng.range_agg("alpha beta", field="created_at",
                            ranges=date_ranges, stats_on="dl")
        assert ra == rb
        lo_jun = float(_us("2024-06-01"))
        assert [r["key"] for r in ra] == [
            f"*-{lo_jun:g}",
            f"{lo_jun:g}-{float(_us('2025-01-01')):g}",
            f"{float(_us('2024-01-01')):g}-*",
        ]
        # brute-force oracle over the derived timestamps
        match = {
            i for i, t in enumerate(texts) if {"alpha", "beta"} & set(t.split())
        }
        ts_us = (1704067200 + (np.arange(n) * 8647) % 63072000) * 1_000_000
        for row in ra:
            lo, hi = row["from"], row["to"]
            want = sum(
                1 for i in match
                if (lo is None or ts_us[i] >= lo) and (hi is None or ts_us[i] < hi)
            )
            assert row["doc_count"] == want
        # numeric field (plain ES range agg on dl), empty range kept
        nr = [(2, 5), (5, None), (900, None)]
        na = eng.range_agg("alpha beta", field="dl", ranges=nr)
        nb = teng.range_agg("alpha beta", field="dl", ranges=nr)
        assert na == nb
        assert na[2]["doc_count"] == 0
        assert na[0]["doc_count"] + na[1]["doc_count"] == len(match)

        # numeric histogram parity + brute force (interval 2, offset 0.5)
        ha = eng.histogram("alpha beta", field="dl", interval=2.0,
                           offset=0.5, stats_on="dl")
        hb = teng.histogram("alpha beta", field="dl", interval=2.0,
                            offset=0.5, stats_on="dl")
        assert ha == hb and ha
        dls = {}  # doc -> dl (token count)
        for i in match:
            dls[i] = len(texts[i].split())
        import collections

        want_counts = collections.Counter(
            np.floor((dls[i] - 0.5) / 2.0) * 2.0 + 0.5 for i in match
        )
        assert {r["key"]: r["doc_count"] for r in ha} == dict(want_counts)
        assert sum(r["doc_count"] for r in ha) == len(match)
        # zero-fill on the numeric grid
        hf = eng.histogram("alpha beta", field="dl", interval=2.0,
                           offset=0.5, min_doc_count=0)
        keys = [r["key"] for r in hf]
        assert keys == [keys[0] + 2.0 * j for j in range(len(keys))]
        assert teng.histogram("alpha beta", field="dl", interval=2.0,
                              offset=0.5, min_doc_count=0) == hf

        # cardinality: exact == brute force, both engines; approx within
        # HLL tolerance of exact
        ca = eng.cardinality("alpha beta", field="dl")
        cb = teng.cardinality("alpha beta", field="dl")
        want_card = len({dls[i] for i in match})
        assert ca == cb == want_card
        ea = eng.cardinality("alpha beta", field="dl", precision=12)
        eb = teng.cardinality("alpha beta", field="dl", precision=12)
        assert abs(ea - want_card) <= max(2, 0.1 * want_card)
        assert abs(eb - want_card) <= max(2, 0.1 * want_card)
        assert ea == eb  # same deterministic sketch either route

        # date_histogram with a terms SUB-aggregation (composite keys):
        # parity + brute force; ES order = parent key asc, then term
        ga = eng.date_histogram("alpha beta", field="created_at",
                                interval="quarter", group_by="dl")
        gb = teng.date_histogram("alpha beta", field="created_at",
                                 interval="quarter", group_by="dl")
        assert ga == gb and ga
        import collections as _c

        q_us = {}
        for i in match:
            dt64 = np.array([ts_us[i]], dtype=np.int64)
            from elasticsearch_assets_ray.search.datehist import (
                floor_interval_us,
            )

            q_us[i] = int(floor_interval_us(dt64, "quarter")[0])
        want_g = _c.Counter(
            (q_us[i], float(len(texts[i].split()))) for i in match
        )
        assert {(r["key"], r["term"]): r["doc_count"] for r in ga} == \
            dict(want_g)
        keys_seq = [(r["key"], r["term"]) for r in ga]
        assert keys_seq == sorted(keys_seq)

        # time_zone: both engines agree; keys shift off the UTC grid
        ta = eng.date_histogram("alpha beta", field="created_at",
                                interval="day",
                                time_zone="America/New_York")
        tb = teng.date_histogram("alpha beta", field="created_at",
                                 interval="day",
                                 time_zone="America/New_York")
        assert ta == tb and ta
        day_us = 86_400_000_000
        assert all(r["key"] % day_us != 0 for r in ta)  # NY offset

        # group_by × time_zone combine: both engines agree and the
        # composite keys reproduce the (tz-day-floor, group) pairs
        from elasticsearch_assets_ray.search.datehist import (
            floor_interval_us_tz,
        )

        gt = eng.date_histogram("alpha beta", field="created_at",
                                interval="day", group_by="dl",
                                time_zone="America/New_York")
        gtt = teng.date_histogram("alpha beta", field="created_at",
                                  interval="day", group_by="dl",
                                  time_zone="America/New_York")
        assert gt == gtt and gt
        ny_us = {
            i: int(floor_interval_us_tz(
                np.array([ts_us[i]], dtype=np.int64), "day",
                "America/New_York")[0])
            for i in match
        }
        want_gt = _c.Counter((ny_us[i], float(dls[i])) for i in match)
        assert {(r["key"], r["term"]): r["doc_count"] for r in gt} == \
            dict(want_gt)

        # offset: both engines agree; grid shifts by the duration
        oa = eng.date_histogram("alpha beta", field="created_at",
                                interval="day", offset="+6h")
        ob = teng.date_histogram("alpha beta", field="created_at",
                                 interval="day", offset="+6h")
        assert oa == ob and oa
        assert all(r["key"] % 86_400_000_000 == 6 * 3_600_000_000
                   for r in oa)

        # zero-fill on the OFFSET-shifted grid: contiguous 6h-anchored
        # days, the non-empty run identical to the unfilled result
        za = eng.date_histogram("alpha beta", field="created_at",
                                interval="day", offset="+6h",
                                min_doc_count=0)
        zb = teng.date_histogram("alpha beta", field="created_at",
                                 interval="day", offset="+6h",
                                 min_doc_count=0)
        assert za == zb and za
        zk = [r["key"] for r in za]
        assert zk == sorted(zk)
        assert all(k % day_us == 6 * 3_600_000_000 for k in zk)
        assert len(zk) == (zk[-1] - zk[0]) // day_us + 1  # contiguous
        assert [r for r in za if r["doc_count"]] == oa

        # zero-fill on the TIME_ZONE-shifted grid: strictly increasing
        # local-day starts covering every non-empty bucket
        zt = eng.date_histogram("alpha beta", field="created_at",
                                interval="day",
                                time_zone="America/New_York",
                                min_doc_count=0)
        ztt = teng.date_histogram("alpha beta", field="created_at",
                                  interval="day",
                                  time_zone="America/New_York",
                                  min_doc_count=0)
        assert zt == ztt and zt
        tk = [r["key"] for r in zt]
        assert tk == sorted(tk) and len(set(tk)) == len(tk)
        assert [r for r in zt if r["doc_count"]] == ta

        # composite aggregation: paginate (month, dl) buckets in pages
        # of 5; pages concatenated must equal the brute-force full
        # enumeration, identically on both engines
        comp_sources = [("m", "date_histogram", "created_at", "month"),
                        ("dl", "terms", "dl")]
        m_us = {
            i: int(floor_interval_us(
                np.array([ts_us[i]], dtype=np.int64), "month")[0])
            for i in match
        }
        want_full = _c.Counter((m_us[i], float(dls[i])) for i in match)
        for engine in (eng, teng):
            pages, after, npages = [], None, 0
            while True:
                buckets, after_key = engine.composite(
                    "alpha beta", comp_sources, size=5, after=after)
                pages += buckets
                npages += 1
                if after_key is None:
                    break
                after = after_key
            got_keys = [(b["key"]["m"], b["key"]["dl"]) for b in pages]
            assert got_keys == sorted(want_full), engine
            assert {k: 0 for k in got_keys} == {
                k: 0 for k in want_full}  # no dup pages
            assert [b["doc_count"] for b in pages] == [
                want_full[k] for k in sorted(want_full)]
            assert npages == -(-len(want_full) // 5) + (
                1 if len(want_full) % 5 == 0 else 0)

        # top_hits: per-group top-k equals the per-group filter of the
        # GLOBAL ranking (same tie contract), identical on both engines
        th_a = eng.top_hits("alpha beta", group_by="dl", k=2)
        th_b = teng.top_hits("alpha beta", group_by="dl", k=2)
        assert th_a == th_b and th_a
        global_rank = eng.search_bool(should="alpha beta", k=10_000)
        for b in th_a:
            want_hits = [
                (d, s) for d, s in global_rank
                if float(len(texts[d].split())) == b["key"]
            ][:2]
            assert b["hits"] == want_hits, b["key"]
            assert b["doc_count"] == sum(
                1 for i in match if float(dls[i]) == b["key"]
            )
        assert [(-b["doc_count"], b["key"]) for b in th_a] == sorted(
            (-b["doc_count"], b["key"]) for b in th_a
        )

        # significant_terms: parity + JLH brute force over dl values
        st_a = eng.significant_terms("alpha beta", field="dl", size=5)
        st_b = teng.significant_terms("alpha beta", field="dl", size=5)
        assert st_a == st_b
        import collections as _cc

        fg = _cc.Counter(float(dls[i]) for i in match)
        bg = _cc.Counter(float(len(t.split())) for t in texts)
        fg_t, bg_t = sum(fg.values()), sum(bg.values())
        want_st = []
        for g, c in fg.items():
            fgp, bgp = c / fg_t, bg[g] / bg_t
            if fgp > bgp:
                want_st.append(
                    {"key": g, "doc_count": c, "bg_count": bg[g],
                     "score": (fgp - bgp) * (fgp / bgp)}
                )
        want_st.sort(key=lambda r: (-r["score"], r["key"]))
        assert st_a == want_st[:5]

        # extended_stats: parity + brute force (population variance)
        es_a = eng.extended_stats("alpha beta", field="dl")
        es_b = teng.extended_stats("alpha beta", field="dl")
        assert es_a == es_b
        vals = np.array(sorted(dls[i] for i in match), dtype=np.float64)
        assert es_a["count"] == len(vals)
        assert es_a["sum"] == vals.sum() and es_a["min"] == vals.min()
        assert es_a["sum_of_squares"] == (vals * vals).sum()
        avg = vals.sum() / len(vals)
        assert es_a["variance"] == (vals * vals).sum() / len(vals) - avg * avg
        assert eng.extended_stats("", field="dl")["count"] == 0

        # percentiles: exact nearest-rank parity + brute force; sketch
        # within its documented relative error
        import math

        pct = (5.0, 50.0, 95.0)
        pa_ = eng.percentiles("alpha beta", field="dl", percents=pct)
        pb_ = teng.percentiles("alpha beta", field="dl", percents=pct)
        assert pa_ == pb_
        for p in pct:
            r = min(max(math.ceil(p / 100 * len(vals)), 1), len(vals)) - 1
            assert pa_[p] == vals[r], p
        sa = eng.percentiles("alpha beta", field="dl", percents=pct,
                             mode="sketch")
        sb = teng.percentiles("alpha beta", field="dl", percents=pct,
                              mode="sketch")
        assert sa == sb
        for p in pct:
            assert abs(sa[p] - pa_[p]) <= 0.01 * pa_[p] + 1e-9, (p, sa, pa_)

        # empty-match parity (code-review regression): a term absent
        # from the index still zero-fills / emits declared ranges,
        # identically on both engines
        eb_args = dict(field="created_at", interval="month",
                       min_doc_count=0,
                       extended_bounds=("2024-01-15", "2024-03-15"))
        za = eng.date_histogram("zzzzmissing", **eb_args)
        zb = teng.date_histogram("zzzzmissing", **eb_args)
        assert za == zb and [r["doc_count"] for r in za] == [0, 0, 0]
        assert eng.date_histogram("", **eb_args) == za
        zr_a = eng.range_agg("zzzzmissing", field="dl",
                             ranges=[(None, 5.0)])
        zr_b = teng.range_agg("zzzzmissing", field="dl",
                              ranges=[(None, 5.0)])
        assert zr_a == zr_b and zr_a[0]["doc_count"] == 0
        assert eng.range_agg("", field="dl", ranges=[(None, 5.0)]) == zr_a
        zh = dict(field="dl", interval=2.0, min_doc_count=0,
                  extended_bounds=(1.0, 5.0))
        ha0 = eng.histogram("zzzzmissing", **zh)
        hb0 = teng.histogram("zzzzmissing", **zh)
        assert ha0 == hb0 and len(ha0) == 3
        assert all(r["doc_count"] == 0 for r in ha0)
    finally:
        eng.shutdown()
        teng.shutdown()


def test_top_hits_sort_and_source(tmp_path, ray_session):
    """ES top_hits ``sort`` + ``_source`` options: rank by a date
    doc-values column with HEAVY cross-shard ties (mod-5 derived
    timestamps) — the tie class must resolve doc-ascending no matter
    where the shard boundaries fall — and hydrate a stored field
    post-cut.  Both engines, vs a brute-force reference."""
    from elasticsearch_assets_ray.config import BM25Params, IndexConfig
    from elasticsearch_assets_ray.index.build import build_index
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.engine import QueryEngine
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    src = tmp_path / "docs.parquet"
    rng = np.random.default_rng(11)
    n = 90
    words = ["alpha", "beta", "gamma", "delta"]
    texts = [
        " ".join(words[j] for j in rng.integers(0, 4, rng.integers(2, 8)))
        for _ in range(n)
    ]
    tags = [f"t{i % 3}" for i in range(n)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts),
                "tag": pa.array(tags),
            }
        ),
        src,
    )
    cfg = IndexConfig(
        analyzer="simple", text_col="text", lang_col=None, id_col="doc_id",
        meta_cols=("created_at", "tag"),
        # mod 5 → only five distinct timestamps: ties straddle shards
        derived_meta=("created_at=ts_from_int:doc_id:1704067200:8647:5",),
        partition_target_docs=12, shard_target_docs=30,
    )
    idx = tmp_path / "idx"
    build_index(str(src), idx, cfg)
    gdir = tmp_path / "global"
    merge_global_postings(idx, gdir, n_salts=2, n_buckets=4,
                          hot_df_fraction=0.5, store_norms=True)
    eng = QueryEngine(idx, num_actors=2, params=BM25Params(round_decimals=4))
    teng = TermPartitionedEngine(gdir, num_actors=2, round_decimals=4)
    ts_us = (1704067200 + (np.arange(n) * 8647) % 5) * 1_000_000
    match = sorted(
        i for i, t in enumerate(texts) if {"alpha", "beta"} & set(t.split())
    )
    try:
        for direction in ("asc", "desc"):
            a = eng.top_hits("alpha beta", group_by="tag", k=3,
                             sort=("created_at", direction),
                             source_fields=["tag"])
            b = teng.top_hits("alpha beta", group_by="tag", k=3,
                              sort=("created_at", direction),
                              source_fields=["tag"])
            assert a == b and a, direction
            sgn = -1 if direction == "desc" else 1
            for bkt in a:
                members = [i for i in match if tags[i] == bkt["key"]]
                want = sorted(members, key=lambda i: (sgn * ts_us[i], i))[:3]
                assert [h["doc_id"] for h in bkt["hits"]] == want, bkt["key"]
                assert [h["sort"] for h in bkt["hits"]] == \
                    [int(ts_us[i]) for i in want]
                assert all(h["tag"] == bkt["key"] for h in bkt["hits"])
                assert bkt["doc_count"] == len(members)

        # _source without sort: dict hits keep the BM25 score contract
        c = eng.top_hits("alpha beta", group_by="tag", k=2,
                         source_fields=["tag"])
        plain = eng.top_hits("alpha beta", group_by="tag", k=2)
        assert [(b2["key"], [(h["doc_id"], h["score"]) for h in b2["hits"]])
                for b2 in c] == \
            [(b2["key"], b2["hits"]) for b2 in plain]

        # STRING sort field: lexicographic (dense order-preserving
        # codes per shard, raw strings across the merge), ties
        # doc-ascending — both engines vs brute force.  Group by tag,
        # sort by tag: within a bucket every sort value ties, so this
        # ALSO exercises the all-ties path; then a second pass grouped
        # by a derived constant exercises real string ordering
        for direction in ("asc", "desc"):
            a = eng.top_hits("alpha beta", group_by="tag", k=3,
                             sort=("tag", direction))
            b = teng.top_hits("alpha beta", group_by="tag", k=3,
                              sort=("tag", direction))
            assert a == b and a, direction
            for bkt in a:
                members = [i for i in match if tags[i] == bkt["key"]]
                want = sorted(members)[:3]  # all-ties → doc asc
                assert [h["doc_id"] for h in bkt["hits"]] == want
                assert all(h["sort"] == bkt["key"] for h in bkt["hits"])
        # real string ordering: group by the (5-distinct) timestamp,
        # sort by tag — tags VARY within each group, ties doc-asc
        for direction in ("asc", "desc"):
            a = eng.top_hits("alpha beta", group_by="created_at", k=3,
                             sort=("tag", direction))
            b = teng.top_hits("alpha beta", group_by="created_at", k=3,
                              sort=("tag", direction))
            assert a == b and a, direction
            rev = direction == "desc"
            for bkt in a:
                members = [i for i in match if int(ts_us[i]) == bkt["key"]]
                want = sorted(
                    members,
                    key=lambda i: ((-ord(tags[i][1]) if rev
                                    else ord(tags[i][1])), i),
                )[:3]
                assert [h["doc_id"] for h in bkt["hits"]] == want
                assert [h["sort"] for h in bkt["hits"]] == \
                    [tags[i] for i in want]
    finally:
        eng.shutdown()
        teng.shutdown()


def test_metric_aggs_value_count_missing_weighted(tmp_path, ray_session):
    """value_count / missing / weighted_avg over a meta column WITH
    nulls (every 3rd doc missing): present/missing tallies, and the
    weighted average skipping rows where either side is missing — both
    engines vs brute force."""
    from elasticsearch_assets_ray.config import BM25Params, IndexConfig
    from elasticsearch_assets_ray.index.build import build_index
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.engine import QueryEngine
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    src = tmp_path / "docs.parquet"
    rng = np.random.default_rng(7)
    n = 80
    words = ["alpha", "beta", "gamma"]
    texts = [
        " ".join(words[j] for j in rng.integers(0, 3, rng.integers(2, 7)))
        for _ in range(n)
    ]
    score = [None if i % 3 == 0 else float(i % 11) for i in range(n)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts),
                "score": pa.array(score, pa.float64()),
            }
        ),
        src,
    )
    cfg = IndexConfig(
        analyzer="simple", text_col="text", lang_col=None, id_col="doc_id",
        meta_cols=("score",),
        partition_target_docs=12, shard_target_docs=30,
    )
    idx = tmp_path / "idx"
    build_index(str(src), idx, cfg)
    gdir = tmp_path / "global"
    merge_global_postings(idx, gdir, n_salts=2, n_buckets=4,
                          store_norms=True)
    eng = QueryEngine(idx, num_actors=2, params=BM25Params(round_decimals=4))
    teng = TermPartitionedEngine(gdir, num_actors=2, round_decimals=4)
    match = [i for i, t in enumerate(texts)
             if {"alpha", "beta"} & set(t.split())]
    dls = [len(t.split()) for t in texts]
    try:
        a = eng.metric_aggs("alpha beta", field="score", weight_field="dl")
        b = teng.metric_aggs("alpha beta", field="score", weight_field="dl")
        present = [i for i in match if score[i] is not None]
        want_vw = sum(score[i] * dls[i] for i in present)
        want_w = sum(dls[i] for i in present)
        for got in (a, b):
            assert got["value_count"] == len(present)
            assert got["missing"] == len(match) - len(present)
            assert abs(got["weighted_avg"] - want_vw / want_w) < 1e-12
        # no weight field: tallies only
        c = eng.metric_aggs("alpha beta", field="score")
        assert c == {"value_count": len(present),
                     "missing": len(match) - len(present)}
    finally:
        eng.shutdown()
        teng.shutdown()


def test_auto_date_histogram_ladder_selection():
    import numpy as np

    from elasticsearch_assets_ray.search.datehist import (
        auto_date_histogram,
        span_bucket_count,
    )

    US = 1_000_000
    MIN, HOUR, DAY = 60 * US, 3600 * US, 86400 * US
    assert span_bucket_count(0, 59 * US, "1m") == 1
    assert span_bucket_count(0, 60 * US, "1m") == 2
    assert span_bucket_count(0, 10 * MIN - 1, "5m") == 2
    assert span_bucket_count(5 * HOUR, 23 * HOUR, "12h") == 2
    # 2024-01-15 .. 2024-07-02 → 7 months, 3 quarters, 1 year
    lo = int(np.datetime64("2024-01-15T00:00:00", "us").astype(np.int64))
    hi = int(np.datetime64("2024-07-02T12:00:00", "us").astype(np.int64))
    assert span_bucket_count(lo, hi, "month") == 7
    assert span_bucket_count(lo, hi, "quarter") == 3
    assert span_bucket_count(lo, hi, "year") == 1

    class Fake:
        def __init__(self, lo, hi, n):
            self.lo, self.hi, self.n = lo, hi, n
            self.calls = []

        def filters_agg(self, filters, stats_on=None):
            return [{"key": "all", "doc_count": self.n,
                     "min": float(self.lo), "max": float(self.hi),
                     "sum": 0.0}]

        def date_histogram(self, query, field, interval="month",
                           stats_on=None, min_doc_count=1):
            self.calls.append((interval, min_doc_count))
            return [{"key": 0, "doc_count": self.n}]

    # 2-hour span, target 10 → 30m (5 buckets fits, 10m = 13 doesn't)
    f = Fake(0, 2 * HOUR, 50)
    out = auto_date_histogram(f, "q", "ts", target_buckets=10)
    assert out["interval"] == "30m" and f.calls == [("30m", 0)]
    # 500-day span, target 12 → quarter
    f = Fake(0, 500 * DAY, 50)
    assert auto_date_histogram(f, "q", "ts", 12)["interval"] == "quarter"
    # no matches → empty, yearly
    f = Fake(0, 0, 0)
    out = auto_date_histogram(f, "q", "ts")
    assert out == {"interval": "year", "buckets": []}


def test_multi_year_intervals_and_ladder_tail(ray_session):
    """The 5y/10y/20y/50y/100y ladder tail: decade/century-grid floors,
    next-bucket steps, span counts, and the auto ladder choosing them
    for spans too wide for yearly buckets."""
    import numpy as np

    from elasticsearch_assets_ray.search.datehist import (
        auto_date_histogram,
        enumerate_bucket_keys,
        floor_interval_us,
        next_bucket_key,
        span_bucket_count,
    )

    def us(s):
        return int(np.datetime64(s, "us").astype(np.int64))

    v = np.array([us("2024-07-15T12:00:00"), us("2020-01-01T00:00:00"),
                  us("2019-12-31T23:59:59"), us("1999-06-01T00:00:00")],
                 dtype=np.int64)
    assert floor_interval_us(v, "10y").tolist() == [
        us("2020-01-01T00:00:00"), us("2020-01-01T00:00:00"),
        us("2010-01-01T00:00:00"), us("1990-01-01T00:00:00")]
    assert floor_interval_us(v, "5y").tolist() == [
        us("2020-01-01"), us("2020-01-01"), us("2015-01-01"),
        us("1995-01-01")]
    assert floor_interval_us(v, "100y").tolist() == [
        us("2000-01-01"), us("2000-01-01"), us("2000-01-01"),
        us("1900-01-01")]
    assert next_bucket_key(us("2020-01-01"), "10y") == us("2030-01-01")
    assert span_bucket_count(us("1999-06-01"), us("2024-07-15"),
                             "10y") == 4  # 1990/2000/2010/2020
    assert span_bucket_count(us("1999-06-01"), us("2024-07-15"),
                             "20y") == 3  # 1980/2000/2020
    assert enumerate_bucket_keys(us("1999-06-01"), us("2024-07-15"),
                                 "10y") == [
        us("1990-01-01"), us("2000-01-01"), us("2010-01-01"),
        us("2020-01-01")]

    class Fake:
        def __init__(self, lo, hi, n):
            self.lo, self.hi, self.n = lo, hi, n
            self.calls = []

        def filters_agg(self, filters, stats_on=None):
            return [{"key": "all", "doc_count": self.n,
                     "min": float(self.lo), "max": float(self.hi),
                     "sum": 0.0}]

        def date_histogram(self, query, field, interval="month",
                           stats_on=None, min_doc_count=1):
            self.calls.append((interval, min_doc_count))
            return [{"key": 0, "doc_count": self.n}]

    # 45-year span, target 10 → 5y (10 buckets fits, year = 46 doesn't)
    f = Fake(us("1980-01-01"), us("2024-12-31"), 9)
    assert auto_date_histogram(f, "q", "ts", 10)["interval"] == "5y"
    # 400-year span, target 10 → 50y
    f = Fake(us("1700-01-01"), us("2099-12-31"), 9)
    assert auto_date_histogram(f, "q", "ts", 10)["interval"] == "50y"


def test_filter_terms_buckets_semantics():
    from elasticsearch_assets_ray.search.datehist import filter_terms_buckets

    rows = [
        {"key": "src1", "doc_count": 5},
        {"key": "src10", "doc_count": 1},
        {"key": "src13", "doc_count": 9},
        {"key": "other", "doc_count": 9},
        {"key": 7, "doc_count": 9},
    ]
    # include regex is ANCHORED (full match), exclude wins, floor drops
    got = filter_terms_buckets(rows, include="src1[0-9]?",
                               exclude=("src13",), min_doc_count=2)
    assert [r["key"] for r in got] == ["src1"]
    # value-collection include; numeric keys pass through collections
    got = filter_terms_buckets(rows, include=("other", 7))
    assert [r["key"] for r in got] == ["other", 7]
    # regex include never matches non-string keys
    got = filter_terms_buckets(rows, include=".*")
    assert 7 not in [r["key"] for r in got]
    # no filters = identity
    assert filter_terms_buckets(rows) == rows
