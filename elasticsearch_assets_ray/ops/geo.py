"""Geo bounding-box / distance filters and distance sort — the reference
reader's geo query surface (M5) as vectorized Ray Data stages.

Mirrors ``/root/reference/asset/elasticsearch_reader/index.js:187-276``:
points are ``"lat,lon"`` strings, validated to lat ∈ [-90, 90] and
lon ∈ [-180, 180]; distances are ``"<number><unit>"`` with units
{mi, yd, ft, km, m}; a bounding box needs both corners, a distance
query needs point + distance, and a geo sort needs a point to sort
from (the reference's selfValidation,
``asset/elasticsearch_reader/index.js:278-286``).  ES delegates the
math; here it is a haversine kernel over numpy columns inside
``map_batches``.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray.data as rd  # noqa: F401  (public API returns Datasets)

# ES distance units → meters (index.js:266-276 allows exactly these)
UNIT_METERS = {"mi": 1609.344, "yd": 0.9144, "ft": 0.3048, "km": 1000.0, "m": 1.0}
EARTH_RADIUS_M = 6_371_008.8

_DIST_RE = re.compile(r"^\s*([0-9]+(?:\.[0-9]+)?)\s*(mi|yd|ft|km|m)\s*$")


def parse_point(s: str) -> tuple[float, float]:
    """``"lat,lon"`` → (lat, lon) with range validation."""
    parts = s.split(",")
    if len(parts) != 2:
        raise ValueError(f"geo point must be 'lat,lon', got {s!r}")
    lat, lon = float(parts[0]), float(parts[1])
    if not (-90.0 <= lat <= 90.0):
        raise ValueError(f"latitude {lat} outside [-90, 90]")
    if not (-180.0 <= lon <= 180.0):
        raise ValueError(f"longitude {lon} outside [-180, 180]")
    return lat, lon


def parse_distance(s: str) -> float:
    """``"50km"`` → meters; unit restricted to the reference's set."""
    m = _DIST_RE.match(s)
    if not m:
        raise ValueError(
            f"bad distance {s!r}; expected <number><unit>, unit in {sorted(UNIT_METERS)}"
        )
    return float(m.group(1)) * UNIT_METERS[m.group(2)]


def _split_points(col: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Parse "lat,lon" strings → float arrays; null/malformed values get
    NaN (ES semantics: a doc missing/garbling the geo field is a
    non-match, never a query error)."""
    pts = col.to_pylist()
    lat = np.full(len(pts), np.nan, dtype=np.float64)
    lon = np.full(len(pts), np.nan, dtype=np.float64)
    for i, p in enumerate(pts):
        if p is None:
            continue
        try:
            a, b = p.split(",", 1)
            lat[i] = float(a)
            lon[i] = float(b)
        except (ValueError, AttributeError):
            continue
    return lat, lon


def haversine_meters(lat: np.ndarray, lon: np.ndarray,
                     plat: float, plon: float) -> np.ndarray:
    """Great-circle distance (meters) from each (lat, lon) to the point."""
    la1 = np.radians(lat)
    lo1 = np.radians(lon)
    la2 = math.radians(plat)
    lo2 = math.radians(plon)
    h = (
        np.sin((la2 - la1) / 2.0) ** 2
        + np.cos(la1) * math.cos(la2) * np.sin((lo2 - lo1) / 2.0) ** 2
    )
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(h))


@dataclass(frozen=True)
class GeoQuery:
    """Validated geo query config (the reference op-config subset)."""

    field: str
    box_top_left: str | None = None
    box_bottom_right: str | None = None
    point: str | None = None
    distance: str | None = None
    sort_point: str | None = None
    sort_order: str = "asc"
    sort_unit: str = "m"

    def __post_init__(self) -> None:
        if (self.box_top_left is None) != (self.box_bottom_right is None):
            raise ValueError("geo box needs both corners")
        if (self.point is None) != (self.distance is None):
            raise ValueError("geo distance needs point AND distance")
        if self.box_top_left is None and self.point is None:
            raise ValueError("geo query needs a box or a point+distance")
        if self.sort_order not in ("asc", "desc"):
            raise ValueError("sort_order must be asc|desc")
        if self.sort_unit not in UNIT_METERS:
            raise ValueError(f"sort_unit must be one of {sorted(UNIT_METERS)}")
        for p in (self.box_top_left, self.box_bottom_right, self.point,
                  self.sort_point):
            if p is not None:
                parse_point(p)
        if self.distance is not None:
            parse_distance(self.distance)

    def effective_sort_point(self) -> tuple[float, float] | None:
        if self.sort_point is not None:
            return parse_point(self.sort_point)
        if self.point is not None:
            return parse_point(self.point)  # distance query sorts from itself
        return None


def geo_filter_batch(batch: pa.Table, q: GeoQuery) -> pa.Table:
    """Filter one batch; appends ``_distance`` (in ``sort_unit``) when a
    sort point applies.  The haversine kernel and the point parse run
    ONCE per batch (distances for survivors are sliced from the filter
    pass, not recomputed).  NaN coordinates (null/malformed field) never
    match."""
    lat, lon = _split_points(batch.column(q.field))
    mask = ~np.isnan(lat)
    if q.box_top_left is not None:
        tl = parse_point(q.box_top_left)
        br = parse_point(q.box_bottom_right)
        mask &= (lat <= tl[0]) & (lat >= br[0])
        if tl[1] <= br[1]:
            mask &= (lon >= tl[1]) & (lon <= br[1])
        else:
            # box crosses the antimeridian (ES geo_bounding_box wraps)
            mask &= (lon >= tl[1]) | (lon <= br[1])
    sp = q.effective_sort_point()
    dist_m = None
    if q.point is not None:
        plat, plon = parse_point(q.point)
        dist_m = haversine_meters(lat, lon, plat, plon)
        mask &= dist_m <= parse_distance(q.distance)
    out = batch.filter(pa.array(mask))
    if sp is not None:
        if dist_m is not None and sp == parse_point(q.point):
            d = dist_m[mask]
        else:
            d = haversine_meters(lat[mask], lon[mask], sp[0], sp[1])
        out = out.append_column(
            "_distance", pa.array(d / UNIT_METERS[q.sort_unit], pa.float64())
        )
    return out


def geo_search(ds, q: GeoQuery):
    """Dataset-level geo filter (+ distance sort when a sort point applies).

    The sort is a Ray Data range-partitioned sort on the appended
    ``_distance`` column — only the filtered survivors shuffle.
    """
    out = ds.map_batches(lambda b: geo_filter_batch(b, q), batch_format="pyarrow", zero_copy_batch=True)
    if q.effective_sort_point() is not None:
        out = out.sort("_distance", descending=q.sort_order == "desc")
    return out
