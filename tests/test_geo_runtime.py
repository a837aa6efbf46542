"""Runtime fields (``script:`` docmeta expressions) and the geo surface
built on them: expression-formula parity vs pure-python references,
shard-actor vs term-partitioned engine parity, and brute-force numpy
checks.  The DuckDB oracle twins run in test_contract.py via the geo /
runtime pipelines."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.search.geo import (
    EARTH_RADIUS_M,
    bbox_range_filters,
    geotile_key,
    geotile_script,
    haversine_script,
)

LAT_SPEC = "lat=affine_mod:doc_id:7919:17000:100:85"
LON_SPEC = "lon=affine_mod:doc_id:104729:36000:100:180"
ORIGIN = (40.7, -74.0)


def _lat(ids):
    return (ids * 7919) % 17000 / 100.0 - 85.0


def _lon(ids):
    return (ids * 104729) % 36000 / 100.0 - 180.0


def _haversine_ref(lat, lon, lat0, lon0):
    p1, p0 = np.radians(lat), math.radians(lat0)
    dphi = np.radians(lat - lat0) / 2.0
    dlmb = np.radians(lon - lon0) / 2.0
    h = np.sin(dphi) ** 2 + np.cos(p1) * math.cos(p0) * np.sin(dlmb) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.minimum(h, 1.0)))


def _geotile_ref(lat, lon, zoom):
    """OSM slippy-map tile formula (pure python, the public reference)."""
    s = 1 << zoom
    out = []
    for la, lo in zip(lat, lon):
        x = math.floor((lo + 180.0) / 360.0 * s)
        r = math.radians(la)
        y = math.floor(
            (1.0 - math.log(math.tan(r) + 1.0 / math.cos(r)) / math.pi)
            / 2.0 * s
        )
        out.append(
            min(max(x, 0), s - 1) * s + min(max(y, 0), s - 1)
        )
    return np.array(out, dtype=np.float64)


@pytest.fixture(scope="module")
def geo_engines(tmp_path_factory, ray_session):
    from elasticsearch_assets_ray.config import BM25Params, IndexConfig
    from elasticsearch_assets_ray.index.build import build_index
    from elasticsearch_assets_ray.index.global_merge import merge_global_postings
    from elasticsearch_assets_ray.search.engine import QueryEngine
    from elasticsearch_assets_ray.search.term_engine import TermPartitionedEngine

    tmp = tmp_path_factory.mktemp("geo")
    src = tmp / "docs.parquet"
    rng = np.random.default_rng(3)
    n = 150
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
        meta_cols=("lat", "lon"), derived_meta=(LAT_SPEC, LON_SPEC),
        partition_target_docs=16, shard_target_docs=48,
    )
    idx = tmp / "idx"
    build_index(str(src), idx, cfg)
    gdir = tmp / "global"
    merge_global_postings(idx, gdir, n_salts=2, n_buckets=4,
                          hot_df_fraction=0.5, store_norms=True)
    eng = QueryEngine(idx, num_actors=2, params=BM25Params(round_decimals=4))
    teng = TermPartitionedEngine(gdir, num_actors=2, round_decimals=4)
    # every doc id matching the "alpha beta" disjunction, numpy-side
    toks = [set(t.split()) for t in texts]
    match = np.array(
        [i for i in range(n) if {"alpha", "beta"} & toks[i]], dtype=np.int64
    )
    yield eng, teng, match, n
    teng.shutdown()
    eng.shutdown()


def test_affine_mod_derived_columns(geo_engines):
    """The affine_mod recipe materializes the documented grid values."""
    eng, _, _, n = geo_engines
    from elasticsearch_assets_ray.index.build import docmeta_path

    dm = pq.read_table(docmeta_path(eng.index_dir, 0))
    ids = dm.column("doc_id").to_numpy()
    assert (dm.column("lat").to_numpy() == _lat(ids)).all()
    assert (dm.column("lon").to_numpy() == _lon(ids)).all()


def test_geotile_script_matches_slippy_reference(geo_engines):
    """The packed geotile runtime field equals the OSM slippy formula
    doc-for-doc (zooms 0..8) on the shard engine's doc values."""
    eng, _, match, n = geo_engines
    ids = np.arange(n)
    for zoom in (0, 3, 5, 8):
        buckets = eng.aggregate(
            ["alpha", "beta", "gamma", "delta"],
            geotile_script("lat", "lon", zoom),
        )
        got = {b["key"]: b["doc_count"] for b in buckets}
        ref = _geotile_ref(_lat(ids), _lon(ids), zoom)
        want: dict = {}
        for t in ref:
            want[t] = want.get(t, 0) + 1
        assert got == want, zoom


def test_geotile_key_render():
    assert geotile_key(0.0, 0) == "0/0/0"
    # x=5, y=3 at z=3: packed 5*8+3
    assert geotile_key(43.0, 3) == "3/5/3"
    with pytest.raises(ValueError):
        geotile_script("lat", "lon", 14)


def test_runtime_field_extended_stats_engine_parity(geo_engines):
    """A generic (non-geo) runtime field flows through extended_stats on
    BOTH engines identically, and matches numpy."""
    eng, teng, match, _ = geo_engines
    fld = "script:floor(doc['lat'] / 10.0) * 10.0 + abs(doc['lon']) / 360.0"
    a = eng.extended_stats("alpha beta", fld)
    b = teng.extended_stats("alpha beta", fld)
    assert a == b
    v = np.floor(_lat(match) / 10.0) * 10.0 + np.abs(_lon(match)) / 360.0
    assert a["count"] == len(match)
    assert a["sum"] == pytest.approx(v.sum(), rel=1e-12)
    assert a["min"] == v.min() and a["max"] == v.max()


def test_geo_distance_agg_parity_and_brute(geo_engines):
    eng, teng, match, _ = geo_engines
    ranges = [{"to": 2_000_000.0}, {"from": 2_000_000.0, "to": "8000km"},
              {"from": "8000km"}]
    # stats over an INTEGER-valued column: float sums of decimal-grid
    # values are add-order sensitive across the two engines' different
    # partial shapes (repo invariant: integer-unit sums only)
    a = eng.geo_distance_agg("alpha beta", "lat", "lon", "40.7,-74.0",
                             ranges, stats_on="dl")
    b = teng.geo_distance_agg("alpha beta", "lat", "lon", ORIGIN, ranges,
                              stats_on="dl")
    assert a == b
    d = _haversine_ref(_lat(match), _lon(match), *ORIGIN)
    assert [r["doc_count"] for r in a] == [
        int((d < 2e6).sum()),
        int(((d >= 2e6) & (d < 8e6)).sum()),
        int((d >= 8e6).sum()),
    ]
    assert sum(r["doc_count"] for r in a) == len(match)


def test_geotile_grid_parity(geo_engines):
    eng, teng, _, _ = geo_engines
    a = eng.geotile_grid("alpha beta", "lat", "lon", precision=4, size=5)
    b = teng.geotile_grid("alpha beta", "lat", "lon", precision=4, size=5)
    assert a == b and len(a) == 5
    assert all(k["key"].startswith("4/") for k in a)
    counts = [r["doc_count"] for r in a]
    assert counts == sorted(counts, reverse=True)


def test_geo_bounds_centroid_parity_and_brute(geo_engines):
    eng, teng, match, _ = geo_engines
    gb_a = eng.geo_bounds("alpha beta", "lat", "lon")
    gb_b = teng.geo_bounds("alpha beta", "lat", "lon")
    assert gb_a == gb_b
    la, lo = _lat(match), _lon(match)
    assert gb_a["top_left"] == {"lat": la.max(), "lon": lo.min()}
    assert gb_a["bottom_right"] == {"lat": la.min(), "lon": lo.max()}
    gc_a = eng.geo_centroid("alpha beta", "lat", "lon")
    gc_b = teng.geo_centroid("alpha beta", "lat", "lon")
    # the mean of 0.01°-grid floats is add-order sensitive in the last
    # ulp across the engines' different partial shapes — approx here;
    # the contract pipelines use integer-degree grids (exact sums)
    for ax in ("lat", "lon"):
        assert gc_a["location"][ax] == pytest.approx(
            gc_b["location"][ax], rel=1e-12
        )
    assert gc_a["count"] == gc_b["count"] == len(match)
    assert gc_a["location"]["lat"] == pytest.approx(la.mean(), rel=1e-12)
    assert gc_a["location"]["lon"] == pytest.approx(lo.mean(), rel=1e-12)


def test_search_geo_distance_parity_and_brute(geo_engines):
    eng, teng, match, _ = geo_engines
    a = eng.search_geo_distance("alpha beta", "lat", "lon", ORIGIN,
                                "5000km", k=1000)
    b = teng.search_geo_distance("alpha beta", "lat", "lon", ORIGIN,
                                 "5000km", k=1000)
    assert a == b
    got_ids = sorted(d for d, _ in a)
    d = _haversine_ref(_lat(match), _lon(match), *ORIGIN)
    assert got_ids == sorted(match[d <= 5e6].tolist())


def test_search_geo_box_parity_and_brute(geo_engines):
    eng, teng, match, _ = geo_engines
    tl, br = (60.0, -120.0), (-20.0, 90.0)
    a = eng.search_geo_box("alpha beta", "lat", "lon", tl, br, k=1000)
    b = teng.search_geo_box("alpha beta", "lat", "lon", tl, br, k=1000)
    assert a == b
    la, lo = _lat(match), _lon(match)
    keep = (la >= -20.0) & (la <= 60.0) & (lo >= -120.0) & (lo <= 90.0)
    assert sorted(d for d, _ in a) == sorted(match[keep].tolist())


def test_bbox_validation():
    with pytest.raises(ValueError):
        bbox_range_filters("lat", "lon", (10.0, 0.0), (20.0, 50.0))
    with pytest.raises(ValueError):
        bbox_range_filters("lat", "lon", (30.0, 60.0), (10.0, 50.0))


def test_runtime_field_unmapped_column_matches_nothing(geo_engines):
    """A script referencing a missing column is an unmapped field on the
    qs-leaf paths: matches nothing, no error (the ES lenient mapping)."""
    eng, teng, _, _ = geo_engines
    from elasticsearch_assets_ray.search.datehist import meta_match_ids

    src = teng.meta.get("source_index")
    ids = meta_match_ids(src, "script:doc['nope'] * 2.0",
                         ("range", None, 1.0, True, True))
    assert len(ids) == 0

def test_field_caps_both_engines(geo_engines):
    """ES _field_caps analogue: field → type/searchable/aggregatable,
    identical across both engines (one schema read)."""
    eng, teng, _, _ = geo_engines
    caps = eng.field_caps()
    assert caps == teng.field_caps()
    assert caps["text"] == {"type": "text", "searchable": True,
                            "aggregatable": False}
    assert caps["lat"]["type"] == "double"
    assert caps["doc_id"]["type"] == "long"
    assert all(c["aggregatable"] for f, c in caps.items() if f != "text")


def _geohash_encode_ref(lat, lon, p):
    """Classic public bisection geohash encoder (reference)."""
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    latr, lonr = [-90.0, 90.0], [-180.0, 180.0]
    even, out, ch, bit = True, "", 0, 0
    BITS = [16, 8, 4, 2, 1]
    while len(out) < p:
        if even:
            mid = (lonr[0] + lonr[1]) / 2
            if lon >= mid:
                ch |= BITS[bit]
                lonr[0] = mid
            else:
                lonr[1] = mid
        else:
            mid = (latr[0] + latr[1]) / 2
            if lat >= mid:
                ch |= BITS[bit]
                latr[0] = mid
            else:
                latr[1] = mid
        even = not even
        if bit < 4:
            bit += 1
        else:
            out += b32[ch]
            bit = 0
            ch = 0
    return out


def test_geohash_key_matches_public_algorithm():
    from elasticsearch_assets_ray.search.geo import (
        _geohash_bits,
        geohash_cell_script,
        geohash_key,
    )

    def cell_of(lat, lon, p):
        bx, by = _geohash_bits(p)
        x = min(max(math.floor((lon + 180.0) / 360.0 * (1 << bx)), 0),
                (1 << bx) - 1)
        y = min(max(math.floor((lat + 90.0) / 180.0 * (1 << by)), 0),
                (1 << by) - 1)
        return x * (1 << by) + y

    # the canonical test vector + a seeded sample at several precisions
    assert geohash_key(cell_of(57.64911, 10.40744, 9), 9) == "u4pruydqq"
    rng = np.random.default_rng(13)
    for lat, lon in zip(rng.uniform(-90, 90, 50),
                        rng.uniform(-180, 180, 50)):
        for p in (1, 3, 5, 8, 10):
            assert geohash_key(cell_of(lat, lon, p), p) == \
                _geohash_encode_ref(lat, lon, p), (lat, lon, p)
    with pytest.raises(ValueError):
        geohash_cell_script("lat", "lon", 11)


def test_geohash_grid_parity_and_reference(geo_engines):
    eng, teng, match, _ = geo_engines
    a = eng.geohash_grid("alpha beta", "lat", "lon", precision=3, size=6)
    b = teng.geohash_grid("alpha beta", "lat", "lon", precision=3, size=6)
    assert a == b and len(a) == 6
    counts = [r["doc_count"] for r in a]
    assert counts == sorted(counts, reverse=True)
    # keys are the TRUE geohashes of the matched points
    want: dict = {}
    for la, lo in zip(_lat(match), _lon(match)):
        k = _geohash_encode_ref(la, lo, 3)
        want[k] = want.get(k, 0) + 1
    for r in a:
        assert want[r["key"]] == r["doc_count"], r


def test_polygon_orientation_and_validation():
    from elasticsearch_assets_ray.search.geo import (
        _orient_convex_ccw,
        polygon_halfplane_scripts,
        polygon_sql,
    )

    ccw = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]
    # CW input flips to the same CCW ring
    assert _orient_convex_ccw(ccw[::-1]) == _orient_convex_ccw(ccw)
    # closing vertex tolerated
    assert _orient_convex_ccw(ccw + [ccw[0]]) == _orient_convex_ccw(ccw)
    with pytest.raises(ValueError):
        _orient_convex_ccw([(0, 0), (1, 1)])
    with pytest.raises(ValueError):
        _orient_convex_ccw([(0, 0), (5, 5), (10, 10)])  # zero area
    with pytest.raises(ValueError):  # concave (notched square)
        _orient_convex_ccw([(0, 0), (0, 10), (5, 5), (10, 10), (10, 0)])
    scripts = polygon_halfplane_scripts("lat", "lon", ccw)
    assert len(scripts) == 4
    assert all(k.startswith("script:") for k in scripts)
    assert all(v == (0.0, None) for v in scripts.values())
    sql = polygon_sql("LA", "LO", ccw)
    assert sql.count(">= 0") == 4 and " AND " in sql


def test_geo_polygon_engines_match_reference(geo_engines):
    """Both engines' geo_polygon doc sets ≡ a numpy half-plane
    reference, including boundary inclusivity; concave rings raise."""
    from elasticsearch_assets_ray.search.geo import _orient_convex_ccw

    eng, teng, match, n = geo_engines
    ring = _orient_convex_ccw(
        [(80.0, -160.0), (80.0, 40.0), (0.0, 170.0), (-80.0, 40.0),
         (-80.0, -160.0)])

    def inside(la, lo, v):
        ok = np.ones(len(la), dtype=bool)
        m = len(v)
        for i in range(m):
            (y1, x1), (y2, x2) = v[i], v[(i + 1) % m]
            ok &= ((x2 - x1) * (la - y1) - (y2 - y1) * (lo - x1)) >= 0
        return ok

    ids = np.arange(n, dtype=np.int64)
    la, lo = _lat(ids), _lon(ids)
    want = set(
        int(i) for i in match
        if inside(la[i:i + 1], lo[i:i + 1], ring)[0]
    )
    got = {d for d, _ in
           eng.search_geo_polygon("alpha beta", "lat", "lon", ring,
                                  k=1 << 30)}
    got_t = {d for d, _ in
             teng.search_geo_polygon("alpha beta", "lat", "lon", ring,
                                     k=1 << 30)}
    assert got == want and got_t == want and len(want) > 0
    with pytest.raises(ValueError):
        eng.search_geo_polygon(
            "alpha", "lat", "lon",
            [(0, 0), (0, 10), (5, 5), (10, 10), (10, 0)])
