"""ES geo search surface served through RUNTIME FIELDS: ``geo_distance``
query/aggregation, ``geo_bounding_box`` filter, ``geotile_grid`` bucket
aggregation, ``geo_bounds`` / ``geo_centroid`` metric aggregations.

The reference validates geo params and delegates the math to
Elasticsearch (``/root/reference/asset/elasticsearch_reader/index.js:
187-286`` — geo_box_top_left/geo_point/geo_distance/geo_sort_point);
``ops/geo.py`` carries the Ray-Data dataset-side filters.  This module
is the ENGINE side: each geo primitive compiles to a ``script:``
runtime-field expression over stored ``lat``/``lon`` doc-value columns
(``funcscore.ScriptExpr`` subset), so the existing range/terms/stats
aggregation and filter machinery of BOTH engines executes it with no
new distributed code path — and every expression has a verbatim SQL
mirror for the driver oracle.

Formulas:

- distance: great-circle haversine, meters —
  ``2R·asin(sqrt(sin²(Δφ/2) + cosφ·cosφ₀·sin²(Δλ/2)))`` with
  ``R = 6371008.8`` (the mean earth radius ``ops.geo`` uses).  The
  origin's ``cos φ₀`` is folded to a PYTHON-computed literal so numpy
  and the SQL engine evaluate the exact same constant; the haversine
  operand is clamped to 1.0 before ``asin`` (antipodal float drift).
- geotile: slippy-map tiles (ES ``geotile_grid`` keys) —
  ``x = ⌊(λ+180)/360·2^z⌋``,
  ``y = ⌊(1 − ln(tan φ + sec φ)/π)/2·2^z⌋``, both clamped to
  ``[0, 2^z−1]``, packed as ``x·2^z + y`` (exact in float64 for
  z ≤ 13; callers render ``"z/x/y"`` via :func:`geotile_key`).
  ES clips latitudes to ±85.05112878 (web-mercator) — callers should
  keep synthetic coordinates inside that band, since ``tan φ + sec φ``
  is non-positive at the south pole and ``ln`` of it diverges between
  numpy (NaN) and SQL engines (error/NULL).
"""

from __future__ import annotations

import math

EARTH_RADIUS_M = 6_371_008.8
_K_FULL = repr(math.pi / 180.0)   # degrees → radians
_K_HALF = repr(math.pi / 360.0)   # half-angle: (a−b)·π/360 = Δ/2 in rad
_PI = repr(math.pi)

GEOTILE_MAX_ZOOM = 13  # x·2^z + y stays exactly representable


def _haversine(latv: str, lonv: str, lat0: float, lon0: float,
               minfn: str) -> str:
    c0 = repr(math.cos(math.radians(lat0)))
    return (
        f"2.0 * {EARTH_RADIUS_M!r} * asin(sqrt({minfn}("
        f"pow(sin(({latv} - {float(lat0)!r}) * {_K_HALF}), 2.0) + "
        f"cos({latv} * {_K_FULL}) * {c0} * "
        f"pow(sin(({lonv} - {float(lon0)!r}) * {_K_HALF}), 2.0)"
        f", 1.0)))"
    )


def haversine_script(lat_field: str, lon_field: str,
                     lat0: float, lon0: float) -> str:
    """Runtime-field name computing each doc's great-circle distance
    (meters) from ``(lat0, lon0)`` — usable anywhere a docmeta field
    name is: range filters, range aggs, stats, sort keys."""
    return "script:" + _haversine(
        f"doc['{lat_field}']", f"doc['{lon_field}']", lat0, lon0, "min"
    )


def haversine_sql(lat_col: str, lon_col: str,
                  lat0: float, lon0: float) -> str:
    """The same haversine expression in ANSI SQL (DuckDB ``least``)."""
    return _haversine(lat_col, lon_col, lat0, lon0, "least")


def _geotile_xy(latv: str, lonv: str, zoom: int, minfn: str, maxfn: str,
                lnfn: str) -> tuple[str, str]:
    if not (0 <= zoom <= GEOTILE_MAX_ZOOM):
        raise ValueError(
            f"geotile precision {zoom} outside [0, {GEOTILE_MAX_ZOOM}]"
        )
    s = repr(float(1 << zoom))
    sm1 = repr(float((1 << zoom) - 1))
    tx = f"floor(({lonv} + 180.0) / 360.0 * {s})"
    ty = (
        f"floor((1.0 - {lnfn}(tan({latv} * {_K_FULL}) + "
        f"1.0 / cos({latv} * {_K_FULL})) / {_PI}) / 2.0 * {s})"
    )
    return (
        f"{minfn}({maxfn}({tx}, 0.0), {sm1})",
        f"{minfn}({maxfn}({ty}, 0.0), {sm1})",
    )


def _geotile(latv: str, lonv: str, zoom: int, minfn: str, maxfn: str,
             lnfn: str) -> str:
    x, y = _geotile_xy(latv, lonv, zoom, minfn, maxfn, lnfn)
    return f"{x} * {float(1 << zoom)!r} + {y}"


def geotile_script(lat_field: str, lon_field: str, zoom: int) -> str:
    """Runtime-field name computing each doc's packed geotile id
    ``x·2^z + y`` at ``zoom`` (the ES ``geotile_grid`` bucket key,
    packed numeric; render with :func:`geotile_key`)."""
    return "script:" + _geotile(
        f"doc['{lat_field}']", f"doc['{lon_field}']", zoom,
        "min", "max", "log",
    )


def geotile_sql(lat_col: str, lon_col: str, zoom: int) -> str:
    """The same packed-geotile expression in ANSI SQL."""
    return _geotile(lat_col, lon_col, zoom, "least", "greatest", "ln")


def geotile_xy_sql(lat_col: str, lon_col: str, zoom: int
                   ) -> tuple[str, str]:
    """The clipped tile-x / tile-y sub-expressions in ANSI SQL (for
    rendering the ``"z/x/y"`` key string oracle-side)."""
    return _geotile_xy(lat_col, lon_col, zoom, "least", "greatest", "ln")


def geotile_key(tile_id: float, zoom: int) -> str:
    """Packed tile id → the ES ``geotile_grid`` bucket key ``"z/x/y"``."""
    s = 1 << zoom
    t = int(tile_id)
    return f"{zoom}/{t // s}/{t % s}"


GEOHASH_MAX_PRECISION = 10  # 50 bits — packed cell exact in float64
_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_bits(precision: int) -> tuple[int, int]:
    if not (1 <= precision <= GEOHASH_MAX_PRECISION):
        raise ValueError(
            f"geohash precision {precision} outside [1, "
            f"{GEOHASH_MAX_PRECISION}]"
        )
    total = 5 * precision
    return (total + 1) // 2, total // 2  # lon bits, lat bits (lon first)


def _geohash_cell(latv: str, lonv: str, precision: int,
                  minfn: str, maxfn: str) -> str:
    bx, by = _geohash_bits(precision)
    sx, sy = repr(float(1 << bx)), repr(float(1 << by))
    sxm1, sym1 = repr(float((1 << bx) - 1)), repr(float((1 << by) - 1))
    cx = f"floor(({lonv} + 180.0) / 360.0 * {sx})"
    cy = f"floor(({latv} + 90.0) / 180.0 * {sy})"
    return (
        f"{minfn}({maxfn}({cx}, 0.0), {sxm1}) * {sy} + "
        f"{minfn}({maxfn}({cy}, 0.0), {sym1})"
    )


def geohash_cell_script(lat_field: str, lon_field: str,
                        precision: int) -> str:
    """Runtime-field name computing each doc's packed geohash CELL
    ``x·2^by + y`` at ``precision`` (equirectangular x/y at the
    geohash bit depths — bijective with the base32 key; render with
    :func:`geohash_key`)."""
    return "script:" + _geohash_cell(
        f"doc['{lat_field}']", f"doc['{lon_field}']", precision,
        "min", "max",
    )


def geohash_cell_sql(lat_col: str, lon_col: str, precision: int) -> str:
    """The same packed-geohash-cell expression in ANSI SQL."""
    return _geohash_cell(lat_col, lon_col, precision, "least", "greatest")


def geohash_key(cell: float, precision: int) -> str:
    """Packed cell id → the base32 geohash string (the ES
    ``geohash_grid`` bucket key): interleave the x (lon) and y (lat)
    bits MSB-first starting with lon, 5 bits per character."""
    bx, by = _geohash_bits(precision)
    c = int(cell)
    x, y = c // (1 << by), c % (1 << by)
    bits = []
    xi, yi = bx - 1, by - 1
    for i in range(5 * precision):
        if i % 2 == 0:
            bits.append((x >> xi) & 1)
            xi -= 1
        else:
            bits.append((y >> yi) & 1)
            yi -= 1
    out = []
    for k in range(precision):
        v = 0
        for b in bits[5 * k: 5 * k + 5]:
            v = (v << 1) | b
        out.append(_BASE32[v])
    return "".join(out)


def bbox_range_filters(lat_field: str, lon_field: str,
                       top_left: tuple[float, float],
                       bottom_right: tuple[float, float]) -> dict:
    """ES ``geo_bounding_box`` as the engines' inclusive range-filter
    dict (the reference's geo_box_top_left/bottom_right pair,
    ``asset/elasticsearch_reader/index.js:187-213``)."""
    (top, left), (bottom, right) = top_left, bottom_right
    if bottom > top:
        raise ValueError(f"bounding box top {top} below bottom {bottom}")
    if left > right:
        raise ValueError(
            "dateline-crossing boxes (left > right) are not supported"
        )
    return {lat_field: (bottom, top), lon_field: (left, right)}


def _orient_convex_ccw(
    vertices: list[tuple[float, float]]
) -> list[tuple[float, float]]:
    """Validate a convex ring and return it counter-clockwise.

    ``vertices`` are ``(lat, lon)`` pairs (the ES ``geo_polygon``
    points list; a closing copy of the first vertex is tolerated and
    dropped).  Convexity is required — the half-plane decomposition
    below is only exact for convex rings; concave polygons must be
    split by the caller (disclosed in :func:`polygon_halfplane_scripts`)."""
    v = [(float(a), float(b)) for a, b in vertices]
    if len(v) >= 2 and v[0] == v[-1]:
        v = v[:-1]
    if len(v) < 3:
        raise ValueError("polygon needs at least 3 distinct vertices")
    # shoelace orientation on (x=lon, y=lat)
    area2 = sum(
        (v[i][1] * v[(i + 1) % len(v)][0])
        - (v[(i + 1) % len(v)][1] * v[i][0])
        for i in range(len(v))
    )
    if area2 == 0:
        raise ValueError("degenerate polygon (zero area)")
    if area2 < 0:
        v = v[::-1]
    # convex ⟺ every consecutive edge cross-product is ≥ 0 once CCW
    n = len(v)
    for i in range(n):
        (y0, x0), (y1, x1), (y2, x2) = v[i], v[(i + 1) % n], v[(i + 2) % n]
        cross = (x1 - x0) * (y2 - y1) - (y1 - y0) * (x2 - x1)
        if cross < 0:
            raise ValueError(
                "concave polygon — split it into convex rings"
            )
    return v


def polygon_halfplane_scripts(
    lat_field: str, lon_field: str, vertices: list[tuple[float, float]]
) -> dict:
    """ES ``geo_polygon`` filter as the engines' range-filter dict: a
    CONVEX ring decomposes into one half-plane test per edge — each a
    pure-arithmetic runtime-field script ``(x2−x1)·(lat−y1) −
    (y2−y1)·(lon−x1)`` gated ``≥ 0`` — so the filter composes with the
    existing ``filter_range`` machinery on BOTH engines with no new
    evaluation kind (the same pattern as the haversine geo_distance
    gate).  Boundary points count as inside (inclusive ≥, disclosed);
    concave polygons raise — split them into convex rings and OR the
    searches.  With integer-grid points and integer vertices every
    product is exact in float64, so results are hash-oracle-safe."""
    v = _orient_convex_ccw(vertices)
    out: dict = {}
    n = len(v)
    for i in range(n):
        (y1, x1), (y2, x2) = v[i], v[(i + 1) % n]
        dx, dy = x2 - x1, y2 - y1
        script = (
            f"script:({dx!r}) * (doc['{lat_field}'] - ({y1!r})) - "
            f"({dy!r}) * (doc['{lon_field}'] - ({x1!r}))"
        )
        out[script] = (0.0, None)
    return out


def polygon_sql(lat_sql: str, lon_sql: str,
                vertices: list[tuple[float, float]]) -> str:
    """The SQL mirror of :func:`polygon_halfplane_scripts` — the same
    half-plane expressions ANDed, term for term."""
    v = _orient_convex_ccw(vertices)
    parts = []
    n = len(v)
    for i in range(n):
        (y1, x1), (y2, x2) = v[i], v[(i + 1) % n]
        dx, dy = x2 - x1, y2 - y1
        parts.append(
            f"(({dx!r}) * (({lat_sql}) - ({y1!r})) - "
            f"({dy!r}) * (({lon_sql}) - ({x1!r})) >= 0)"
        )
    return "(" + " AND ".join(parts) + ")"


def geo_bounds_render(lat_stats: dict, lon_stats: dict) -> dict:
    """ES ``geo_bounds`` envelope from per-axis stats aggregations
    (``wrap_longitude`` not modeled — boxes never cross the dateline)."""
    if not lat_stats.get("count"):
        return {"count": 0, "top_left": None, "bottom_right": None}
    return {
        "count": lat_stats["count"],
        "top_left": {"lat": lat_stats["max"], "lon": lon_stats["min"]},
        "bottom_right": {"lat": lat_stats["min"], "lon": lon_stats["max"]},
    }


def geo_centroid_render(lat_stats: dict, lon_stats: dict) -> dict:
    """ES ``geo_centroid``: arithmetic mean per axis (the ES
    accumulation) over docs carrying the point."""
    if not lat_stats.get("count"):
        return {"count": 0, "location": None}
    return {
        "count": lat_stats["count"],
        "location": {"lat": lat_stats["avg"], "lon": lon_stats["avg"]},
    }


def geo_line_agg(
    engine,
    query,
    group_by: str,
    sort_field: str,
    lat_field: str = "lat",
    lon_field: str = "lon",
    size: int = 10000,
    sort_order: str = "asc",
    include_sort: bool = False,
) -> list[dict]:
    """ES ``geo_line`` aggregation (under a ``terms`` bucket): per group
    value, the matched docs' points connected in ``sort_field`` order
    (``sort_order`` asc/desc), truncated to the FIRST ``size`` points —
    exactly the ES semantics, and exactly the engines' ``top_hits``
    machinery (per-shard partials ship O(groups × size), points hydrate
    once after the cut).  Engine-agnostic; buckets in ES terms-agg order
    (doc_count desc, key asc).

    Each bucket: ``key``, ``doc_count`` (FULL match count for the
    group), ``points`` ([[lon, lat], ...] — GeoJSON axis order),
    ``complete`` (ES: false when truncation dropped points), and
    ``sort`` (the per-point sort values) when ``include_sort``."""
    if sort_order not in ("asc", "desc"):
        raise ValueError(f"sort_order {sort_order!r} not in asc/desc")
    buckets = engine.top_hits(
        query, group_by, k=size, sort=(sort_field, sort_order),
        source_fields=[lat_field, lon_field],
    )
    out = []
    for b in buckets:
        pts = [[h[lon_field], h[lat_field]] for h in b["hits"]]
        row = {
            "key": b["key"],
            "doc_count": b["doc_count"],
            "points": pts,
            "complete": b["doc_count"] <= size,
        }
        if include_sort:
            row["sort"] = [h["sort"] for h in b["hits"]]
        out.append(row)
    return out
