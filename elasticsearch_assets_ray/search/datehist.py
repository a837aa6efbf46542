"""``date_histogram`` aggregation support — the most-used ES aggregation
and the reference's entire worldview (its reader plans work as time
buckets, ``/root/reference/asset/elasticsearch_reader/elasticsearch_date_range/slicer.js:484-505``,
and its index selector names indexes by date bucket,
``asset/elasticsearch_index_selector/index.js:7-36``).

Two pieces:

* :func:`floor_interval_us` — the vectorized bucket-key kernel shared by
  both serving engines: epoch-microsecond doc values → bucket-start epoch
  microseconds, for ES ``calendar_interval`` (day/week/month/quarter/
  year, UTC, weeks starting Monday like ES/ISO) and ``fixed_interval``
  (``<n><unit>``, epoch-aligned like ES).
* :func:`datehist_partials_over_ids` — the doc-values pass for the
  TERM-PARTITIONED layout, whose buckets hold postings, not documents: a
  matched doc-id set is routed to the owning docmeta partitions of the
  SOURCE index (contiguous doc-id ranges → one ``searchsorted``), and one
  Ray task per partition group reads ONLY the histogram field (+ optional
  stats column), floors, and returns an associative
  ``bucket → (count, sum, min, max)`` partial.  Work scales with matched
  docs + touched partitions, never corpus size.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

_US_PER = {
    "ms": 1_000,
    "s": 1_000_000,
    "m": 60_000_000,
    "h": 3_600_000_000,
    "d": 86_400_000_000,
}
_DAY_US = _US_PER["d"]

CALENDAR_INTERVALS = ("day", "week", "month", "quarter", "year")


def parse_fixed_interval_us(interval: str) -> int | None:
    """``"12h"`` → 43_200_000_000; None when not a fixed-interval spec."""
    for unit in ("ms", "s", "m", "h", "d"):  # 'ms' before 's': longest wins
        if interval.endswith(unit):
            head = interval[: -len(unit)]
            if head.isdigit() and int(head) > 0:
                return int(head) * _US_PER[unit]
    return None


def parse_multi_year(interval: str) -> int | None:
    """``"5y"`` → 5; None when not a multi-year calendar spec.  The
    auto_date_histogram ladder's coarse end (ES RoundingInfo inner
    intervals 5/10/20/50/100 years): buckets anchor at calendar-year
    multiples of N (2020 for N=10 — the "decade" grid)."""
    if interval.endswith("y"):
        head = interval[:-1]
        if head.isdigit() and int(head) > 0:
            return int(head)
    return None


def floor_interval_us(v_us: np.ndarray, interval: str) -> np.ndarray:
    """Bucket-start epoch micros for each value (int64 in, int64 out).

    Calendar months/quarters/years floor via numpy datetime64 casts (one
    vectorized C pass); weeks floor to Monday (ES default, ISO);
    day/fixed intervals are epoch-aligned integer floors.
    """
    v = np.asarray(v_us, dtype=np.int64)
    if interval == "day":
        return (v // _DAY_US) * _DAY_US
    if interval == "week":
        days = v // _DAY_US
        # epoch day 0 = Thursday; (days + 3) % 7 == 0 ⇔ Monday
        return (days - (days + 3) % 7) * _DAY_US
    if interval in ("month", "quarter", "year"):
        dt = v.astype("datetime64[us]")
        if interval == "year":
            return dt.astype("datetime64[Y]").astype("datetime64[us]").astype(np.int64)
        months = dt.astype("datetime64[M]").astype(np.int64)
        if interval == "quarter":
            months = (months // 3) * 3
        return months.astype("datetime64[M]").astype("datetime64[us]").astype(np.int64)
    ny = parse_multi_year(interval)
    if ny is not None:
        # years since 1970 → calendar year → floor to the N-multiple
        # grid anchored at year 0 (the "decade/century" grid) → back
        yrs = np.asarray(v, dtype=np.int64).astype(
            "datetime64[us]").astype("datetime64[Y]").astype(np.int64)
        cal = yrs + 1970
        fl = (cal // ny) * ny - 1970
        return fl.astype("datetime64[Y]").astype(
            "datetime64[us]").astype(np.int64)
    fixed = parse_fixed_interval_us(interval)
    if fixed is None:
        raise ValueError(
            f"unknown interval {interval!r}: expected one of "
            f"{CALENDAR_INTERVALS} or a fixed '<n><ms|s|m|h|d>'"
        )
    return (v // fixed) * fixed


from functools import lru_cache


@lru_cache(maxsize=64)
def tz_offsets_table(
    tz_name: str, lo_year: int, hi_year: int
) -> tuple[np.ndarray, np.ndarray]:
    """UTC-offset transition table for a named zone over [lo_year,
    hi_year], built from the PUBLIC zoneinfo API (daily offset scan +
    bisection to the transition second — no private attributes).
    Returns (transition epoch micros ascending, offset micros in effect
    from each transition).  Cached per (zone, year span) so repeated
    queries share one table."""
    import datetime as dt
    from zoneinfo import ZoneInfo

    z = ZoneInfo(tz_name)
    lo = dt.datetime(lo_year, 1, 1, tzinfo=dt.timezone.utc)
    hi = dt.datetime(hi_year + 1, 1, 1, tzinfo=dt.timezone.utc)

    def off_at(t: "dt.datetime") -> int:
        return int(t.astimezone(z).utcoffset().total_seconds() * 1e6)

    trans = [int(lo.timestamp() * 1e6)]
    offs = [off_at(lo)]
    day = dt.timedelta(days=1)
    t = lo
    while t < hi:
        t2 = t + day
        o1, o2 = off_at(t), off_at(t2)
        if o1 != o2:
            a, b = t, t2
            # bisect to MICROSECOND precision: a 1-second tolerance
            # recorded transitions up to ~1s late, which mapped every
            # bucket key coinciding with a transition back through the
            # stale offset (caught against the DuckDB ICU oracle)
            one_us = dt.timedelta(microseconds=1)
            while (b - a) > one_us:
                m = a + (b - a) / 2
                if off_at(m) == o1:
                    a = m
                else:
                    b = m
            trans.append(int(round(b.timestamp() * 1e6)))
            offs.append(o2)
        t = t2
    return np.array(trans, dtype=np.int64), np.array(offs, dtype=np.int64)


def parse_offset_us(offset) -> int:
    """ES ``date_histogram`` ``offset``: ``"+1h"`` / ``"-30m"`` /
    ``"6h"`` duration strings (same units as fixed intervals) or raw
    epoch micros.  Shifts the bucket grid:
    ``key = floor(v - off, interval) + off``."""
    if isinstance(offset, (int, float, np.integer, np.floating)):
        return int(offset)
    if not isinstance(offset, str):
        raise ValueError(
            f"bad offset {offset!r}: expected '<n><ms|s|m|h|d>' with an "
            "optional sign, or epoch micros"
        )
    sgn = 1
    o = offset
    if o and o[0] in "+-":
        sgn = -1 if o[0] == "-" else 1
        o = o[1:]
    us = parse_fixed_interval_us(o)
    if us is None:
        raise ValueError(
            f"bad offset {offset!r}: expected '<n><ms|s|m|h|d>' with an "
            "optional sign, or epoch micros"
        )
    return sgn * us


def floor_interval_us_offset(
    v_us: np.ndarray, interval: str, offset, tz_name: str | None = None
) -> np.ndarray:
    """Offset-shifted (and optionally timezone-aware) bucket floor:
    ES applies ``offset`` AFTER ``time_zone`` — the grid shifts by the
    duration in the (local, if tz given) bucketing frame."""
    off = parse_offset_us(offset)
    v = np.asarray(v_us, dtype=np.int64)
    if tz_name is not None:
        return floor_interval_us_tz(v - off, interval, tz_name) + off
    return floor_interval_us(v - off, interval) + off


def floor_interval_us_tz(
    v_us: np.ndarray, interval: str, tz_name: str
) -> np.ndarray:
    """Timezone-aware bucket floor (ES ``date_histogram`` with
    ``time_zone``): values convert to LOCAL wall time via the zone's
    transition table (DST-correct, vectorized searchsorted), floor on
    the local calendar/fixed grid, and the bucket start maps back to a
    UTC epoch key.  Bit-identical to DuckDB ICU's
    ``date_trunc(.., ts AT TIME ZONE tz) AT TIME ZONE tz`` across DST
    transitions (oracle-checked); local times in a spring-forward gap
    resolve with the pre-transition offset."""
    v = np.asarray(v_us, dtype=np.int64)
    if len(v) == 0:
        return v
    import datetime as dt

    lo_y = dt.datetime.fromtimestamp(
        int(v.min()) / 1e6, dt.timezone.utc
    ).year - 1
    hi_y = dt.datetime.fromtimestamp(
        int(v.max()) / 1e6, dt.timezone.utc
    ).year + 1
    trans, offs = tz_offsets_table(tz_name, lo_y, hi_y)
    idx = np.searchsorted(trans, v, side="right") - 1
    local = v + offs[idx]
    lf = floor_interval_us(local, interval)
    # local → UTC: transitions expressed in local wall time stay
    # monotonic (transition spacing >> offset deltas)
    ltrans = trans + offs
    j = np.searchsorted(ltrans, lf, side="right") - 1
    return lf - offs[j]


def partial_over_groups(
    groups: np.ndarray, stats_vals: np.ndarray | None
) -> dict:
    """Associative ``group → (count, sum, min, max)`` partial over
    arbitrary group values (ints for date buckets, strings for keyword
    terms aggs); merge with ``search.engine.merge_agg_partials``."""
    out: dict = {}
    if len(groups) == 0:
        return out
    ug, inv, counts = np.unique(groups, return_inverse=True, return_counts=True)
    if stats_vals is None:
        for g, c in zip(ug.tolist(), counts.tolist()):
            out[g] = (int(c), None, None, None)
        return out
    vals = np.asarray(stats_vals, dtype=np.float64)
    sums = np.bincount(inv, weights=vals, minlength=len(ug))
    mins = np.full(len(ug), np.inf)
    maxs = np.full(len(ug), -np.inf)
    np.minimum.at(mins, inv, vals)
    np.maximum.at(maxs, inv, vals)
    for i, g in enumerate(ug.tolist()):
        out[g] = (
            int(counts[i]), float(sums[i]), float(mins[i]), float(maxs[i]),
        )
    return out


def partial_over_values(
    keys_us: np.ndarray, stats_vals: np.ndarray | None
) -> dict:
    """:func:`partial_over_groups` with int bucket keys (date buckets)."""
    return {
        int(k): v
        for k, v in partial_over_groups(keys_us, stats_vals).items()
    }


def range_expand(
    v: np.ndarray,
    ranges: list[tuple[float | None, float | None]],
    stats_vals: np.ndarray | None,
) -> tuple[np.ndarray, np.ndarray | None]:
    """ES ``range`` / ``date_range`` aggregation bucketing: each value
    lands in EVERY range containing it (ES allows overlapping ranges — a
    doc then counts in several buckets; ``from`` inclusive, ``to``
    exclusive, None = open end).  Returns ``(range_idx, stats_vals)``
    row-expanded over the matches, ready for
    :func:`partial_over_groups`."""
    keys: list[np.ndarray] = []
    vals: list[np.ndarray] = []
    for i, (lo, hi) in enumerate(ranges):
        m = np.ones(len(v), dtype=bool)
        if lo is not None:
            m &= v >= lo
        if hi is not None:
            m &= v < hi
        n = int(m.sum())
        if n == 0:
            continue
        keys.append(np.full(n, i, dtype=np.int64))
        if stats_vals is not None:
            vals.append(stats_vals[m])
    if not keys:
        return np.empty(0, dtype=np.int64), (
            None if stats_vals is None else np.empty(0)
        )
    return (
        np.concatenate(keys),
        np.concatenate(vals) if stats_vals is not None else None,
    )


def to_epoch_us_bound(x) -> float | None:
    """A ``date_range`` bound → epoch micros: None passes through, ints/
    floats are taken as epoch micros already, ISO-8601 strings parse via
    numpy datetime64 (UTC, like the engines' doc values)."""
    if x is None or isinstance(x, (int, float)):
        return x
    return float(np.datetime64(x, "us").astype(np.int64))


def next_bucket_key(key: int, interval: str) -> int:
    """The start (epoch micros) of the bucket after ``key`` — inverse
    step of :func:`floor_interval_us`, used for empty-bucket fill."""
    if interval in ("month", "quarter", "year"):
        step = {"month": 1, "quarter": 3, "year": 12}[interval]
        m = np.datetime64(int(key), "us").astype("datetime64[M]").astype(np.int64)
        return int(
            np.int64(m + step).astype("datetime64[M]").astype("datetime64[us]").astype(np.int64)
        )
    ny = parse_multi_year(interval)
    if ny is not None:
        y = np.datetime64(int(key), "us").astype("datetime64[Y]").astype(np.int64)
        return int(
            np.int64(y + ny).astype("datetime64[Y]").astype("datetime64[us]").astype(np.int64)
        )
    if interval == "week":
        return int(key) + 7 * _DAY_US
    fixed = _DAY_US if interval == "day" else parse_fixed_interval_us(interval)
    if fixed is None:
        raise ValueError(f"unknown interval {interval!r}")
    return int(key) + fixed


def enumerate_bucket_keys(lo: int, hi: int, interval: str) -> list[int]:
    """Every bucket start from the bucket containing ``lo`` through the
    bucket containing ``hi`` inclusive (both epoch micros) — the ES
    ``min_doc_count: 0`` / ``extended_bounds`` bucket enumeration."""
    if hi < lo:
        return []
    k = int(floor_interval_us(np.array([lo], dtype=np.int64), interval)[0])
    end = int(floor_interval_us(np.array([hi], dtype=np.int64), interval)[0])
    out = [k]
    while k < end:
        k = next_bucket_key(k, interval)
        out.append(k)
    return out


def enumerate_bucket_keys_shifted(
    lo: int, hi: int, interval: str,
    tz_name: str | None = None, offset=None,
) -> list[int]:
    """:func:`enumerate_bucket_keys` on the SHIFTED grid — the ES
    ``min_doc_count: 0`` fill under ``time_zone`` and/or ``offset``.
    Works in the same frames as the bucket kernels (offset applies
    after time_zone), so enumerated keys are BIT-identical to
    :func:`floor_interval_us_offset` / :func:`floor_interval_us_tz`
    keys: shift into the local-minus-offset frame, enumerate the plain
    calendar/fixed grid there, and map each bucket start back through
    the zone's local-frame transition table."""
    off = parse_offset_us(offset) if offset is not None else 0
    if tz_name is None:
        return [g + off
                for g in enumerate_bucket_keys(lo - off, hi - off, interval)]
    import datetime as dt

    w = np.array([lo - off, hi - off], dtype=np.int64)
    lo_y = dt.datetime.fromtimestamp(
        int(w.min()) / 1e6, dt.timezone.utc
    ).year - 1
    hi_y = dt.datetime.fromtimestamp(
        int(w.max()) / 1e6, dt.timezone.utc
    ).year + 1
    trans, offs = tz_offsets_table(tz_name, lo_y, hi_y)
    idx = np.searchsorted(trans, w, side="right") - 1
    lw = w + offs[idx]
    gs = np.array(
        enumerate_bucket_keys(int(lw[0]), int(lw[1]), interval),
        dtype=np.int64,
    )
    if len(gs) == 0:
        return []
    ltrans = trans + offs
    j = np.searchsorted(ltrans, gs, side="right") - 1
    return [int(x) for x in gs - offs[j] + off]


def valid_mask(v: np.ndarray) -> np.ndarray:
    """True where a key/doc value is PRESENT — ES terms/composite
    sources omit documents whose source value is missing, and None/NaN
    would crash numpy's object sort anyway."""
    if v.dtype.kind == "f":
        return ~np.isnan(v)
    if v.dtype == object and len(v):
        return np.fromiter((x is not None for x in v), bool, len(v))
    return np.ones(len(v), dtype=bool)


def partial_over_pairs(
    a: np.ndarray, b: np.ndarray, stats_vals: np.ndarray | None
) -> dict:
    """Composite (a, b)-key partial WITHOUT per-row Python tuples: each
    column factorizes once (np.unique), the combined int64 codes run
    through the vectorized :func:`partial_over_groups`, and tuples
    materialize only for the ≤bucket-count OUTPUT.  Tuple keys sort
    lexicographically at render time — the ES bucket order (parent key
    ascending, then sub-bucket)."""
    ua, ia = np.unique(a, return_inverse=True)
    ub, ib = np.unique(b, return_inverse=True)
    nb = np.int64(max(len(ub), 1))
    comb = ia.astype(np.int64) * nb + ib.astype(np.int64)
    part = partial_over_groups(comb, stats_vals)

    def _py(x):
        return x.item() if hasattr(x, "item") else x

    return {
        (_py(ua[k // nb]), _py(ub[k % nb])): v for k, v in part.items()
    }


def _load_meta_values(tbl_col) -> np.ndarray:
    """Docmeta column → numeric doc values (timestamps surface as epoch
    micros, the ES doc-values convention; see ``ShardSearcher.meta_col``)."""
    col = tbl_col.combine_chunks() if isinstance(tbl_col, pa.ChunkedArray) else tbl_col
    if pa.types.is_timestamp(col.type):
        from ..ops import epoch_us

        return epoch_us(col)
    return col.to_numpy(zero_copy_only=False)


_SCRIPT_CACHE: dict = {}


def _compiled_script(src: str):
    """Per-process compile cache for runtime-field expressions (one
    compile per task process, not per partition)."""
    expr = _SCRIPT_CACHE.get(src)
    if expr is None:
        from .funcscore import ScriptExpr

        expr = _SCRIPT_CACHE[src] = ScriptExpr(src)
    return expr


def field_src_cols(field: str | None) -> list[str]:
    """The stored docmeta columns a field name actually reads — the
    field itself, or (for a ``script:`` runtime field) the columns its
    expression references (what the column-pruned read must fetch)."""
    if not field:
        return []
    if field.startswith("script:"):
        return list(_compiled_script(field[len("script:"):]).fields)
    return [field]


def field_from_table(t: pa.Table, field: str) -> np.ndarray:
    """Doc values of ``field`` from an already-read docmeta table slice:
    a stored column, or a ``script:<expr>`` RUNTIME FIELD evaluated
    vectorized over the columns it references."""
    if field.startswith("script:"):
        expr = _compiled_script(field[len("script:"):])
        env = {f: _load_meta_values(t.column(f)) for f in expr.fields}
        env["_score"] = np.zeros(t.num_rows)
        return expr(env)
    return _load_meta_values(t.column(field))


def read_field_values(path: str, field: str) -> np.ndarray:
    """One docmeta partition's doc values for a stored column OR a
    ``script:<expr>`` RUNTIME FIELD (ES runtime mappings — the field
    name carries its definition, mirroring the shard engine's
    ``ShardData.meta_col``).  Scripts read exactly the columns they
    reference (column-pruned), evaluate vectorized, and are what the
    term-partitioned engine's doc-values consumers — metric aggs,
    bucket aggs, docmeta predicates — hydrate."""
    return field_from_table(
        pq.read_table(path, columns=field_src_cols(field)), field
    )


def field_schema_ok(schema_names: set, field: str) -> bool:
    """Mapping check that understands runtime fields: a script field is
    mapped iff every stored column it reads is."""
    if field.startswith("script:"):
        return all(
            f in schema_names
            for f in _compiled_script(field[len("script:"):]).fields
        )
    return field in schema_names


def field_counts_partial(
    field_vals: np.ndarray, weight_vals: np.ndarray | None
) -> dict:
    """Associative partial for the metric aggs ``value_count`` /
    ``missing`` / ``weighted_avg``: present/missing tallies of the
    value field, plus Σ(value·weight) and Σ(weight) over rows where
    BOTH are present (the ES weighted_avg skip-missing default).
    Integer-valued inputs keep the float sums exact (< 2^53), so
    shard-order never changes the result."""
    fv = np.asarray(field_vals)
    ok = valid_mask(fv)
    out = {
        "values": (int(ok.sum()), None, None, None),
        "missing": (int(len(fv) - ok.sum()), None, None, None),
    }
    if weight_vals is not None:
        wv = np.asarray(weight_vals)
        both = ok & valid_mask(wv)
        v = fv[both].astype(np.float64)
        w = wv[both].astype(np.float64)
        out["weighted"] = (int(both.sum()), float(np.dot(v, w)),
                           None, None)
        out["weights"] = (int(both.sum()), float(w.sum()), None, None)
    return out


def metric_aggs_render(partials: list[dict]) -> dict:
    """Merge :func:`field_counts_partial`s → the ES-shaped metric-agg
    values (weighted_avg None when no weighted rows matched)."""
    from .engine import merge_agg_partials

    merged: dict = {}
    for p in partials:
        merge_agg_partials(merged, p)
    out = {
        "value_count": int(merged.get("values", (0,))[0]),
        "missing": int(merged.get("missing", (0,))[0]),
    }
    if "weights" in merged:
        sw = merged["weights"][1]
        out["weighted_avg"] = (
            merged["weighted"][1] / sw if sw else None
        )
    return out


def bucket_partial(
    field_vals: np.ndarray, spec: tuple, stats_vals: np.ndarray | None
) -> dict:
    """One associative aggregation partial under a bucketing spec:
    ``("interval", s)`` floors date doc values (date_histogram),
    ``("terms", None)`` groups by the raw column, ``("ranges",
    [(lo, hi), ...])`` is the ES range/date_range bucketing (overlap =
    several buckets, key = range index)."""
    kind, arg = spec
    if kind == "terms_pair":
        # ES multi_terms (2 fields): composite (field, arg) keys; docs
        # missing EITHER value are omitted (ES multi_terms semantics)
        group_vals = np.asarray(arg)
        ok = valid_mask(np.asarray(field_vals)) & valid_mask(group_vals)
        if not ok.all():
            field_vals = field_vals[ok]
            group_vals = group_vals[ok]
            if stats_vals is not None:
                stats_vals = stats_vals[ok]
        if len(field_vals) == 0:
            return {}
        return partial_over_pairs(field_vals, group_vals, stats_vals)
    if kind in ("interval", "interval_tz", "interval_off",
                "interval_terms", "histogram"):
        # ES date_histogram/histogram omit docs with a missing field
        # value (a NaN would also poison the int64 cast / tz conversion)
        ok = valid_mask(np.asarray(field_vals))
        if not ok.all():
            field_vals = field_vals[ok]
            if stats_vals is not None:
                stats_vals = stats_vals[ok]
            if kind == "interval_terms":
                arg = (arg[0], arg[1][ok]) + tuple(arg[2:])
    if kind == "interval":
        return partial_over_groups(
            floor_interval_us(field_vals, arg), stats_vals
        )
    if kind == "interval_tz":
        interval, tz = arg
        return partial_over_groups(
            floor_interval_us_tz(field_vals, interval, tz), stats_vals
        )
    if kind == "interval_off":
        interval, tz, off = arg
        return partial_over_groups(
            floor_interval_us_offset(field_vals, interval, off, tz),
            stats_vals,
        )
    if kind == "interval_terms":
        # date_histogram with a terms SUB-aggregation: composite
        # (bucket_us, term) keys — arg = (interval, group_vals[, tz,
        # offset]).  Docs with a missing group value are omitted (ES
        # terms-source semantics); tz/offset shift the bucket grid
        # exactly like the parent-only specs.
        interval, group_vals = arg[0], arg[1]
        tz = arg[2] if len(arg) > 2 else None
        off = arg[3] if len(arg) > 3 else None
        ok = valid_mask(group_vals)
        if not ok.all():
            field_vals = field_vals[ok]
            group_vals = group_vals[ok]
            if stats_vals is not None:
                stats_vals = stats_vals[ok]
        if off is not None:
            keys = floor_interval_us_offset(field_vals, interval, off, tz)
        elif tz is not None:
            keys = floor_interval_us_tz(field_vals, interval, tz)
        else:
            keys = floor_interval_us(field_vals, interval)
        return partial_over_pairs(keys, group_vals, stats_vals)
    if kind == "histogram":
        # ES numeric histogram: key = floor((v - offset)/interval)
        #                              * interval + offset
        interval, offset = arg
        v = field_vals.astype(np.float64)
        keys = np.floor((v - offset) / interval) * interval + offset
        return partial_over_groups(keys, stats_vals)
    if kind == "terms":
        ok = valid_mask(field_vals)
        if not ok.all():
            # ES terms sources omit docs with a missing field value
            field_vals = field_vals[ok]
            if stats_vals is not None:
                stats_vals = stats_vals[ok]
        return partial_over_groups(field_vals, stats_vals)
    if kind == "ranges":
        keys, sv = range_expand(field_vals.astype(np.float64), arg, stats_vals)
        return partial_over_groups(keys, sv)
    if kind == "field_counts":
        # metric aggs (value_count / missing / weighted_avg): the
        # stats column carries the WEIGHTS; missing rows must survive
        # to be counted, so no pre-mask applies
        return field_counts_partial(field_vals, stats_vals)
    raise ValueError(f"unknown bucket spec {spec!r}")


@ray.remote
def _agg_partition_task(
    paths: list[str],
    local_idx: list[np.ndarray],
    field: str,
    spec: tuple,
    stats_col: str | None,
) -> dict:
    """One task over a group of docmeta partitions: column-pruned read,
    row take at the matched local offsets, bucket, partial-aggregate."""
    from .engine import merge_agg_partials

    merged: dict = {}
    # an interval_terms / terms_pair spec names its group COLUMN; the
    # task reads it and swaps the per-row values in before the shared
    # bucket kernel
    if spec[0] == "interval_terms":
        gcol = spec[1][1]
    elif spec[0] == "terms_pair":
        gcol = spec[1]
    else:
        gcol = None
    # column-pruned read: the union of stored columns each field name
    # resolves to (a script: runtime field contributes the columns its
    # expression reads, not itself)
    cols = list(dict.fromkeys(
        field_src_cols(field) + field_src_cols(stats_col)
        + field_src_cols(gcol)
    ))
    for path, idx in zip(paths, local_idx):
        t = pq.read_table(path, columns=cols)
        sv = None
        if stats_col is not None:
            sv = field_from_table(t, stats_col)[idx].astype(np.float64)
        spec_local = spec
        if gcol is not None:
            gv = field_from_table(t, gcol)[idx]
            if spec[0] == "terms_pair":
                spec_local = ("terms_pair", gv)
            else:
                spec_local = (
                    "interval_terms",
                    (spec[1][0], gv) + tuple(spec[1][2:]),
                )
        merge_agg_partials(
            merged,
            bucket_partial(
                field_from_table(t, field)[idx], spec_local, sv
            ),
        )
    return merged


def agg_partials_over_ids(
    index_dir: str | Path,
    doc_ids: np.ndarray,
    field: str,
    spec: tuple,
    stats_col: str | None = None,
    partitions_per_task: int = 16,
) -> list[dict]:
    """Distributed aggregation partials for an explicit matched doc-id
    set, served from a SOURCE index's docmeta partition lineage (the path
    the term-partitioned engine uses; the doc-partitioned engine computes
    the same partial in-actor from its resident doc values).  ``spec``
    picks the bucketing (see :func:`_bucket_fn`); work scales with
    matched docs + touched partitions, never corpus size."""
    plan = _route_ids_to_partitions(index_dir, doc_ids)
    if plan is None:
        return []
    paths, locals_ = plan
    futs = [
        _agg_partition_task.remote(
            paths[i : i + partitions_per_task],
            locals_[i : i + partitions_per_task],
            field,
            spec,
            stats_col,
        )
        for i in range(0, len(paths), partitions_per_task)
    ]
    return list(ray.get(futs))


def per_group_head(
    ginv: np.ndarray,
    order: np.ndarray,
    k: int,
    tie_vals: np.ndarray | None = None,
) -> list[tuple[int, np.ndarray]]:
    """Shared per-group head-``k`` split: ``order`` sorts rows by
    (group, in-group rank); returns ``[(group_code, row_indices in rank
    order), ...]`` keeping each group's first ``k`` rows — O(n), no
    per-group rescans.  With ``tie_vals`` (the ROUNDED ranking value per
    row), the cut extends through the kth tie class (the serving
    ``_select_topk`` contract) so a shard boundary can never decide a
    rounded tie."""
    gs = ginv[order]
    if len(gs) == 0:
        return []
    starts = np.nonzero(np.concatenate([[True], gs[1:] != gs[:-1]]))[0]
    run_lens = np.diff(np.concatenate([starts, [len(order)]]))
    rank = np.arange(len(order)) - np.repeat(starts, run_lens)
    keep = rank < k
    if tie_vals is not None:
        tv = tie_vals[order]
        kth = tv[starts + np.minimum(k - 1, run_lens - 1)]
        keep |= tv == np.repeat(kth, run_lens)
    sel = order[keep]
    gk = gs[keep]
    bounds = np.nonzero(gk[1:] != gk[:-1])[0] + 1
    parts = np.split(sel, bounds)
    heads = gk[np.concatenate([[0], bounds])]
    return list(zip(heads.tolist(), parts))


# auto_date_histogram rounding ladder (finest → coarsest) — the FULL ES
# RoundingInfo sequence (seconds 1/5/10/30, minutes 1/5/10/30, hours
# 1/3/12, day, week, months 1/3, years 1/5/10/20/50/100).  Multi-year
# buckets anchor at calendar-year multiples of N (the decade/century
# grid); a span too wide even for century buckets returns 100y anyway.
AUTO_DATEHIST_LADDER = (
    "1s", "5s", "10s", "30s", "1m", "5m", "10m", "30m",
    "1h", "3h", "12h", "day", "week", "month", "quarter", "year",
    "5y", "10y", "20y", "50y", "100y",
)


def span_bucket_count(lo_us: int, hi_us: int, interval: str) -> int:
    """Number of ``interval`` buckets spanned by [lo, hi] inclusive —
    the zero-filled bucket count ``date_histogram(min_doc_count=0)``
    would return for data with that min/max."""
    f = floor_interval_us(np.array([lo_us, hi_us], dtype=np.int64),
                          interval)
    if interval in ("month", "quarter", "year"):
        m = f.astype("datetime64[us]").astype("datetime64[M]").astype(
            np.int64
        )
        step = {"month": 1, "quarter": 3, "year": 12}[interval]
        return int((m[1] - m[0]) // step) + 1
    ny = parse_multi_year(interval)
    if ny is not None:
        y = f.astype("datetime64[us]").astype("datetime64[Y]").astype(
            np.int64
        )
        return int((y[1] - y[0]) // ny) + 1
    step = _DAY_US * 7 if interval == "week" else (
        _DAY_US if interval == "day" else parse_fixed_interval_us(interval)
    )
    return int((f[1] - f[0]) // step) + 1


def auto_date_histogram(
    engine,
    query,
    field: str,
    target_buckets: int = 10,
    stats_on: str | None = None,
) -> dict:
    """ES ``auto_date_histogram``: pick the FINEST ladder interval whose
    zero-filled bucket count over the matched docs' [min, max] span is
    ≤ ``target_buckets``, then serve a zero-filled ``date_histogram`` at
    it.  Engine-agnostic — works over anything exposing ``filters_agg``
    (the min/max probe) and ``date_histogram`` (both engines; parity
    tested).  Returns ``{"interval": chosen, "buckets": rows}``; no
    matches → ``{"interval": "year", "buckets": []}``."""
    probe = engine.filters_agg({"all": query}, stats_on=field)
    r = probe[0]
    if r["doc_count"] == 0 or "min" not in r:
        return {"interval": "year", "buckets": []}
    lo, hi = int(r["min"]), int(r["max"])  # epoch µs < 2^53 — exact
    chosen = AUTO_DATEHIST_LADDER[-1]
    for interval in AUTO_DATEHIST_LADDER:
        if span_bucket_count(lo, hi, interval) <= target_buckets:
            chosen = interval
            break
    buckets = engine.date_histogram(
        query, field, interval=chosen, stats_on=stats_on, min_doc_count=0
    )
    return {"interval": chosen, "buckets": buckets}


def rare_terms_buckets(
    rows: list[dict], max_doc_count: int, size: int | None
) -> list[dict]:
    """ES ``rare_terms``: the long tail of a terms aggregation — buckets
    with doc_count ≤ ``max_doc_count``, ordered (doc_count asc, key
    asc).  Exact here (every bucket crosses the O(buckets) merge; ES
    uses a CuckooFilter approximation with possible false negatives —
    divergence in our favor, disclosed)."""
    out = [r for r in rows if r["doc_count"] <= max_doc_count]
    # keys are homogeneous (one doc-values column): numeric keys order
    # numerically, keywords lexically — matching the oracle's ORDER BY
    out.sort(key=lambda r: (r["doc_count"], r["key"]))
    return out[:size] if size is not None else out


def filter_terms_buckets(
    rows: list[dict],
    include=None,
    exclude=None,
    min_doc_count: int = 1,
) -> list[dict]:
    """ES terms-agg ``include`` / ``exclude`` / ``min_doc_count``:
    value filters applied before the order/size cut.  ``include`` /
    ``exclude`` are an anchored RE2 pattern (strings — ES regex form)
    or an explicit value collection (the ES array form); ``exclude``
    wins over ``include`` (ES precedence).  Exact here for the same
    reason the ``size`` cut is: every bucket crosses the O(buckets)
    merge, so filtering after the merge ≡ filtering at the shards (ES
    applies include/exclude during collection and then suffers
    shard_size truncation; we don't).  ``min_doc_count`` drops buckets
    below the floor AFTER the full merge — exact, unlike ES's per-shard
    ``shard_min_doc_count`` pre-filter."""
    import re as _re

    def _pred(spec):
        if spec is None:
            return None
        if isinstance(spec, str):
            rx = _re.compile(spec)
            return lambda k: isinstance(k, str) and rx.fullmatch(k) is not None
        vals = set(spec)
        return lambda k: k in vals

    inc, exc = _pred(include), _pred(exclude)
    out = []
    for r in rows:
        if r["doc_count"] < min_doc_count:
            continue
        k = r["key"]
        if inc is not None and not inc(k):
            continue
        if exc is not None and exc(k):
            continue
        out.append(r)
    return out


def order_terms_buckets(
    rows: list[dict],
    order: tuple[str, str] | None,
    size: int | None,
) -> list[dict]:
    """ES terms-agg ``order`` / ``size``: re-sort bucket rows by
    ``order=(metric, "asc"|"desc")`` — metric ``_count`` (doc_count),
    ``_key``, or a stats sub-agg value (``sum``/``avg``/``min``/``max``)
    — ties key-ascending (the ES tie-break), then cut to ``size``.
    ``order=None`` keeps the rows' incoming ES-default order.  The cut
    is exact here (ALL buckets merged before the sort) — no shard_size
    approximation."""
    if order is not None:
        metric, direction = order
        rev = direction == "desc"
        field = "doc_count" if metric == "_count" else metric
        if metric == "_key":
            rows = sorted(rows, key=lambda r: r["key"], reverse=rev)
        else:
            rows = sorted(rows, key=lambda r: r["key"])
            rows.sort(key=lambda r: r[field], reverse=rev)  # stable
    if size is not None:
        rows = rows[:size]
    return rows


def significant_terms_rows(
    fg: dict, bg: dict, size: int,
    fg_total: int | None = None, bg_total: int | None = None,
) -> list[dict]:
    """ES ``significant_terms`` scoring (JLH, the ES default heuristic):
    ``score = (fg% − bg%) · (fg% / bg%)`` over merged foreground /
    background count partials; values whose foreground rate does not
    EXCEED the background rate are not significant and drop (ES
    behavior).  Rows score-descending, ties by key, capped at ``size``;
    the float expression order is pinned for the SQL oracle.

    Totals default to the summed counts — correct for KEYWORD fields
    where each doc contributes one value.  TEXT mode (significant_text:
    a doc contributes many terms) passes explicit totals: fg_total =
    sampled doc count, bg_total = index doc count."""
    if fg_total is None:
        fg_total = sum(c for c, *_ in fg.values())
    if bg_total is None:
        bg_total = sum(c for c, *_ in bg.values())
    if fg_total == 0 or bg_total == 0:
        return []
    rows = []
    for g, (c, *_rest) in fg.items():
        bgc = bg.get(g, (0,))[0]
        if bgc == 0:
            continue  # value absent from the background set
        fgp = c / fg_total
        bgp = bgc / bg_total
        if not fgp > bgp:
            continue
        score = (fgp - bgp) * (fgp / bgp)
        rows.append(
            {"key": g, "doc_count": int(c), "bg_count": int(bgc),
             "score": float(score)}
        )
    rows.sort(key=lambda r: (-r["score"], r["key"]))
    return rows[:size]


# ------------------------------------------------------------- composite
# ES ``composite`` aggregation: paginate through ALL buckets of a
# multi-source key in deterministic ascending key order with an
# ``after`` cursor — the ES mechanism for enumerating millions of
# buckets without one giant response.


def composite_source_keys(spec: tuple, vals: np.ndarray) -> np.ndarray:
    """One composite source's bucket keys: ``("terms",)`` = raw doc
    values, ``("date_histogram", interval)`` = floored epoch micros,
    ``("histogram", interval, offset)`` = the numeric grid."""
    kind = spec[0]
    if kind == "terms":
        return vals
    if kind == "date_histogram":
        return floor_interval_us(vals, spec[1])
    if kind == "histogram":
        iv, off = float(spec[1]), float(spec[2])
        v = vals.astype(np.float64)
        return np.floor((v - off) / iv) * iv + off
    raise ValueError(f"unknown composite source {spec!r}")


def composite_partial(
    key_cols: list[np.ndarray], size: int, after: tuple | None
) -> dict:
    """One shard/partition-group partial for a composite aggregation:
    the ≤ ``size`` LEXICOGRAPHICALLY-SMALLEST composite keys strictly
    after the ``after`` cursor, with their local doc counts.  Capping at
    ``size`` per partial is exact by the standard top-k merge argument:
    any key in the global first ``size`` has fewer than ``size`` keys
    before it in EVERY partial, so every partial holding it reports it.
    The wire cost per shard is O(size), independent of bucket count —
    the property that lets composite paginate 10^8 buckets."""
    n = len(key_cols[0])
    if n == 0:
        return {}
    ok = valid_mask(key_cols[0])
    for c in key_cols[1:]:
        ok &= valid_mask(c)
    if not ok.all():
        # ES composite sources omit docs with a missing source value
        key_cols = [c[ok] for c in key_cols]
        n = len(key_cols[0])
        if n == 0:
            return {}
    if after is not None:
        # vectorized lexicographic "key > after"
        gt = np.zeros(n, dtype=bool)
        eq = np.ones(n, dtype=bool)
        for c, a in zip(key_cols, after):
            gt |= eq & (c > a)
            eq &= c == a
        key_cols = [c[gt] for c in key_cols]
        n = len(key_cols[0])
        if n == 0:
            return {}
    # factorize each column; combined codes sort lexicographically
    # because each np.unique dictionary is ascending
    codes, dims, uniqs = [], [], []
    for c in key_cols:
        u, inv = np.unique(c, return_inverse=True)
        uniqs.append(u)
        codes.append(inv.astype(np.int64))
        dims.append(np.int64(len(u)))
    comb = codes[0]
    for c, d in zip(codes[1:], dims[1:]):
        comb = comb * d + c
    uc, counts = np.unique(comb, return_counts=True)
    uc, counts = uc[:size], counts[:size]
    out = {}
    for k, cnt in zip(uc.tolist(), counts.tolist()):
        parts = []
        for d in reversed(dims[1:]):
            k, r = divmod(k, int(d))
            parts.append(r)
        parts.append(k)
        key = tuple(
            u[i].item() if hasattr(u[i], "item") else u[i]
            for u, i in zip(uniqs, reversed(parts))
        )
        out[key] = int(cnt)
    return out


def composite_render(
    partials: list[dict], names: list[str], size: int
) -> tuple[list[dict], tuple | None]:
    """Merge composite partials → (first ``size`` buckets in ascending
    key order as ES-shaped rows, after_key cursor for the next page)."""
    merged: dict = {}
    for p in partials:
        merge_count_partials(merged, p)
    keys = sorted(merged)[:size]
    buckets = [
        {"key": dict(zip(names, k)), "doc_count": merged[k]} for k in keys
    ]
    after_key = keys[-1] if len(keys) == size else None
    return buckets, after_key


@ray.remote
def _composite_partition_task(
    paths: list[str],
    local_idx: list[np.ndarray],
    fields: list[str],
    specs: list[tuple],
    size: int,
    after: tuple | None,
) -> dict:
    """Composite partial over a docmeta partition group (term-engine
    lineage path) — column-pruned read of exactly the source fields."""
    cols = list(dict.fromkeys(fields))
    merged: dict = {}
    for path, idx in zip(paths, local_idx):
        t = pq.read_table(path, columns=cols)
        raw = [_load_meta_values(t.column(f))[idx] for f in fields]
        vm = valid_mask(raw[0])
        for c in raw[1:]:
            vm &= valid_mask(c)
        if not vm.all():
            # validity judged on RAW values, before key transforms
            raw = [c[vm] for c in raw]
        key_cols = [
            composite_source_keys(spec, c)
            for spec, c in zip(specs, raw)
        ]
        merge_count_partials(
            merged, composite_partial(key_cols, size, after)
        )
    # re-cap after the per-file merge (still exact, same argument)
    keys = sorted(merged)[:size]
    return {k: merged[k] for k in keys}


def composite_partials_over_ids(
    index_dir: str | Path,
    doc_ids: np.ndarray,
    fields: list[str],
    specs: list[tuple],
    size: int,
    after: tuple | None,
    partitions_per_task: int = 16,
) -> list[dict]:
    plan = _route_ids_to_partitions(index_dir, doc_ids)
    if plan is None:
        return []
    paths, locals_ = plan
    futs = [
        _composite_partition_task.remote(
            paths[i: i + partitions_per_task],
            locals_[i: i + partitions_per_task],
            fields, specs, size, after,
        )
        for i in range(0, len(paths), partitions_per_task)
    ]
    return list(ray.get(futs))


# ---------------------------------------------------------------- metric
# aggregation kernels beyond (count, sum, min, max): extended_stats and
# percentiles (exact nearest-rank + a mergeable log-bucket sketch)

_SKETCH_NONPOS = -(10 ** 9)  # bucket id for values <= 0 (log undefined)


def pctl_sketch_partial(v: np.ndarray, k: int) -> dict:
    """Mergeable percentile-sketch partial: positive values land in
    log10 buckets ``floor(log10(v) * k)`` (relative error ≤
    ``10^(1/(2k)) - 1`` — ~0.6% at k=200), non-positive values in one
    underflow bucket.  The partial is a bucket→count dict whose size is
    bounded by the VALUE RANGE (decades × k), not the match count —
    counts add associatively, so the exchange stays O(buckets) at any
    scale."""
    out: dict[int, int] = {}
    if len(v) == 0:
        return out
    pos = v > 0.0
    vp = v[pos]
    if len(vp):
        idx = np.floor(np.log10(vp) * k).astype(np.int64)
        u, c = np.unique(idx, return_counts=True)
        out = {int(a): int(b) for a, b in zip(u.tolist(), c.tolist())}
    n_nonpos = int(len(v) - len(vp))
    if n_nonpos:
        out[_SKETCH_NONPOS] = out.get(_SKETCH_NONPOS, 0) + n_nonpos
    return out


def merge_count_partials(dst: dict, part: dict) -> dict:
    for b, c in part.items():
        dst[b] = dst.get(b, 0) + c
    return dst


def _nearest_ranks(n: int, percents) -> list[int]:
    """0-based nearest-rank index per percent: ``ceil(p/100 * n) - 1``
    (clamped) — integer logic, so the exact mode is SQL-bit-reproducible
    (no interpolation arithmetic to diverge on)."""
    import math

    return [
        min(max(math.ceil(p / 100.0 * n), 1), n) - 1 for p in percents
    ]


def pctl_exact(parts: list[np.ndarray], percents) -> dict:
    """Exact nearest-rank percentiles from per-shard sorted value
    arrays."""
    if not parts:
        return {float(p): None for p in percents}
    v = np.sort(np.concatenate(parts))
    if len(v) == 0:
        return {float(p): None for p in percents}
    ranks = _nearest_ranks(len(v), percents)
    return {float(p): float(v[r]) for p, r in zip(percents, ranks)}


def pctl_ranks_exact(parts: list[np.ndarray], values) -> dict:
    """Exact percentile RANKS (ES ``percentile_ranks``, inverse of
    :func:`pctl_exact`): for each value, ``100 · count(fv ≤ v) / n``
    from the same per-shard sorted value partials — one bisect per
    requested value."""
    if not parts:
        return {float(v): None for v in values}
    a = np.sort(np.concatenate(parts))
    if len(a) == 0:
        return {float(v): None for v in values}
    return {
        float(v): 100.0 * float(np.searchsorted(a, float(v), "right"))
        / len(a)
        for v in values
    }


def pctl_from_sketch(counts: dict, percents, k: int) -> dict:
    """Percentiles from merged sketch partials: walk the cumulative
    bucket counts to each nearest rank, report the bucket's geometric
    midpoint ``10^((idx + 0.5)/k)`` (0.0 for the underflow bucket)."""
    total = sum(counts.values())
    if total == 0:
        return {float(p): None for p in percents}
    buckets = sorted(counts)
    cum = np.cumsum([counts[b] for b in buckets])
    out = {}
    for p, r in zip(percents, _nearest_ranks(total, percents)):
        bi = int(np.searchsorted(cum, r + 1))
        b = buckets[bi]
        out[float(p)] = (
            0.0 if b == _SKETCH_NONPOS else float(10.0 ** ((b + 0.5) / k))
        )
    return out


def scripted_metric_result(parts: list[tuple], combine: str,
                           finalize: str | None = None) -> dict:
    """ES ``scripted_metric`` fold: merge per-actor/task extstats
    partials, apply the ``combine`` reduction, optionally run a
    ``finalize`` reduce-script (ScriptExpr over ``value``/``n``).

    Disclosed divergence: ES runs arbitrary painless init/map/combine/
    reduce; this ships the ASSOCIATIVE subset — a vectorized map
    expression, an enumerated combine (sum/count/avg/min/max), and a
    scalar reduce expression — i.e. exactly the shapes that distribute
    without shipping per-doc state, which is the point at scale."""
    n, s, _s2, mn, mx = merge_extstats(parts)
    if combine == "sum":
        v = s
    elif combine == "count":
        v = float(n)
    elif combine == "avg":
        v = s / n if n else 0.0
    elif combine == "min":
        v = mn if n else 0.0
    elif combine == "max":
        v = mx if n else 0.0
    else:
        raise ValueError(f"unknown combine {combine!r}")
    if finalize is not None:
        expr = _compiled_script(finalize)
        env = {f: np.zeros(1) for f in expr.fields}
        env.update({"value": np.array([v]), "n": np.array([float(n)]),
                    "_score": np.zeros(1)})
        v = float(np.asarray(expr(env))[0])
    return {"value": v, "doc_count": int(n)}


def merge_extstats(parts: list[tuple]) -> tuple:
    """Associative merge of (count, sum, sum_of_squares, min, max)."""
    n, s, s2, mn, mx = 0, 0.0, 0.0, np.inf, -np.inf
    for pn, ps, ps2, pmn, pmx in parts:
        n += pn
        s += ps
        s2 += ps2
        mn = min(mn, pmn)
        mx = max(mx, pmx)
    return n, s, s2, mn, mx


def extstats_render(parts: list[tuple]) -> dict:
    """Merged partials → the ES ``extended_stats`` payload (population
    variance, like ES)."""
    n, s, s2, mn, mx = merge_extstats(parts)
    if n == 0:
        return {"count": 0, "min": None, "max": None, "sum": 0.0,
                "avg": None, "sum_of_squares": 0.0, "variance": None,
                "std_deviation": None}
    avg = s / n
    var = s2 / n - avg * avg
    return {
        "count": int(n), "min": mn, "max": mx, "sum": s, "avg": avg,
        "sum_of_squares": s2, "variance": var,
        "std_deviation": float(np.sqrt(max(var, 0.0))),
    }


@ray.remote
def _values_partition_task(
    paths: list[str],
    local_idx: list[np.ndarray],
    field: str,
    mode: str,
    sketch_k: int | None,
) -> object:
    """Matched-row doc values of a partition group reduced per ``mode``:
    ``"sorted"`` (exact percentiles), ``"sketch"`` (log-bucket counts),
    ``"extstats"`` ((n, sum, sumsq, min, max)), ``"raw"`` (id-aligned
    values, any dtype — hydration for top_hits-style consumers)."""
    vals = []
    for path, idx in zip(paths, local_idx):
        v = read_field_values(path, field)[idx]
        if mode not in ("raw", "stringstats"):
            v = v.astype(np.float64)
            v = v[~np.isnan(v)]
        vals.append(v)
    v = np.concatenate(vals) if vals else np.empty(0)
    if mode == "raw":
        # id-ALIGNED raw doc values (routed partition order == sorted
        # unique id order) — no filtering, alignment is the contract
        return v
    if mode == "stringstats":
        from .statagg import string_stats_partial

        return string_stats_partial(v)
    if mode == "sketch":
        return pctl_sketch_partial(v, sketch_k)
    if mode == "extstats":
        if len(v) == 0:
            return (0, 0.0, 0.0, np.inf, -np.inf)
        return (int(len(v)), float(v.sum()), float((v * v).sum()),
                float(v.min()), float(v.max()))
    return np.sort(v)


@ray.remote
def _values_excl_partition_task(
    paths: list[str],
    excl_locals: list[np.ndarray],
    field: str,
) -> tuple:
    """Extstats partial over every row NOT in the exclusion set — the
    ES filters-agg ``other_bucket`` complement scan (full lineage,
    partition-parallel, one column-pruned read each)."""
    n = 0
    s = 0.0
    s2 = 0.0
    mn = np.inf
    mx = -np.inf
    for path, excl in zip(paths, excl_locals):
        v = read_field_values(path, field).astype(np.float64)
        if len(excl):
            keep = np.ones(len(v), dtype=bool)
            keep[excl] = False
            v = v[keep]
        v = v[~np.isnan(v)]
        if len(v):
            n += int(len(v))
            s += float(v.sum())
            s2 += float((v * v).sum())
            mn = min(mn, float(v.min()))
            mx = max(mx, float(v.max()))
    return (n, s, s2, mn, mx)


def values_partials_excluding(
    index_dir: str | Path,
    exclude_ids: np.ndarray,
    field: str,
    partitions_per_task: int = 16,
) -> list[tuple]:
    """Extstats partials of ``field`` over ALL docmeta rows EXCEPT the
    ``exclude_ids`` set — the other-bucket scan.  Every partition is
    visited (the complement is corpus-scale by construction); exclusion
    offsets route per partition with one searchsorted."""
    from ..index.build import IndexInfo, docmeta_path

    info = IndexInfo(index_dir)
    parts = sorted(info.manifest.partitions, key=lambda p: p.doc_base)
    if not parts:
        return []
    ids = np.unique(np.asarray(exclude_ids, dtype=np.int64))
    bases = np.array([p.doc_base for p in parts], dtype=np.int64)
    paths = [str(docmeta_path(index_dir, p.partition_id)) for p in parts]
    excl: list[np.ndarray] = []
    for i, p in enumerate(parts):
        lo = np.searchsorted(ids, p.doc_base)
        hi = np.searchsorted(ids, p.doc_base + p.num_rows)
        excl.append(ids[lo:hi] - bases[i])
    futs = [
        _values_excl_partition_task.remote(
            paths[i: i + partitions_per_task],
            excl[i: i + partitions_per_task],
            field,
        )
        for i in range(0, len(paths), partitions_per_task)
    ]
    return list(ray.get(futs))


def values_partials_over_ids(
    index_dir: str | Path,
    doc_ids: np.ndarray,
    field: str,
    mode: str,
    sketch_k: int | None = None,
    partitions_per_task: int = 16,
) -> list:
    """Metric-aggregation partials (percentiles / extended_stats) for an
    explicit matched doc-id set over the source docmeta lineage — same
    routing as :func:`agg_partials_over_ids`."""
    plan = _route_ids_to_partitions(index_dir, doc_ids)
    if plan is None:
        return []
    paths, locals_ = plan
    futs = [
        _values_partition_task.remote(
            paths[i: i + partitions_per_task],
            locals_[i: i + partitions_per_task],
            field,
            mode,
            sketch_k,
        )
        for i in range(0, len(paths), partitions_per_task)
    ]
    return list(ray.get(futs))


@ray.remote
def _multi_values_partition_task(
    paths: list[str],
    local_idx: list[np.ndarray],
    fields: list[str],
    mode: str,
) -> object:
    """Matched-row doc values of SEVERAL columns, reduced per ``mode``:
    ``"matrix"`` ((n, Σx, Gram) for matrix_stats), ``"paireddiff"``
    (extstats moments of fields[0] − fields[1] — the paired t_test
    partial).  One column-pruned read per partition per field."""
    cols: list[list[np.ndarray]] = [[] for _ in fields]
    for path, idx in zip(paths, local_idx):
        t = pq.read_table(path, columns=list(fields))
        for i, f in enumerate(fields):
            cols[i].append(
                _load_meta_values(t.column(f))[idx].astype(np.float64)
            )
    merged = [
        np.concatenate(c) if c else np.empty(0) for c in cols
    ]
    if mode == "matrix":
        from .statagg import matrix_stats_partial

        return matrix_stats_partial(merged)
    if mode == "paireddiff":
        d = merged[0] - merged[1]
        d = d[~np.isnan(d)]
        if len(d) == 0:
            return (0, 0.0, 0.0, np.inf, -np.inf)
        return (int(len(d)), float(d.sum()), float((d * d).sum()),
                float(d.min()), float(d.max()))
    raise ValueError(f"unknown multi-values mode: {mode!r}")


def multi_values_partials_over_ids(
    index_dir: str | Path,
    doc_ids: np.ndarray,
    fields: list[str],
    mode: str,
    partitions_per_task: int = 16,
) -> list:
    """Multi-column metric partials (matrix_stats / paired t_test) for
    an explicit matched doc-id set over the source docmeta lineage —
    same routing as :func:`values_partials_over_ids`."""
    plan = _route_ids_to_partitions(index_dir, doc_ids)
    if plan is None:
        return []
    paths, locals_ = plan
    futs = [
        _multi_values_partition_task.remote(
            paths[i: i + partitions_per_task],
            locals_[i: i + partitions_per_task],
            list(fields),
            mode,
        )
        for i in range(0, len(paths), partitions_per_task)
    ]
    return list(ray.get(futs))


@ray.remote
def _agg_full_partition_task(
    paths: list[str], group_col: str, stats_col: str | None
) -> dict:
    """Terms-agg partial over ALL rows of a docmeta-partition group —
    the ES ``global`` aggregation's scan (column-pruned, no id
    routing)."""
    from .engine import merge_agg_partials
    from .joinfield import keyed_partials

    merged: dict = {}
    for path in paths:
        keys = read_field_values(path, group_col)
        vals = (
            read_field_values(path, stats_col).astype(np.float64)
            if stats_col is not None else None
        )
        vm = valid_mask(keys)
        if not vm.all():
            keys = keys[vm]
            vals = vals[vm] if vals is not None else None
        merge_agg_partials(merged, keyed_partials(keys, vals))
    return merged


def agg_partials_full(
    index_dir: str | Path,
    group_col: str,
    stats_col: str | None = None,
    partitions_per_task: int = 16,
) -> list[dict]:
    """Terms partials over the WHOLE source docmeta lineage (every
    live row — the global layout refuses tombstoned inputs), one task
    per partition group."""
    from ..index.build import IndexInfo, docmeta_path

    info = IndexInfo(index_dir)
    parts = sorted(info.manifest.partitions, key=lambda p: p.doc_base)
    if not parts:
        return []
    paths = [str(docmeta_path(index_dir, p.partition_id)) for p in parts]
    futs = [
        _agg_full_partition_task.remote(
            paths[i: i + partitions_per_task], group_col, stats_col
        )
        for i in range(0, len(paths), partitions_per_task)
    ]
    return list(ray.get(futs))


def _route_ids_to_partitions(
    index_dir: str | Path, doc_ids: np.ndarray
) -> tuple[list[str], list[np.ndarray]] | None:
    """Matched GLOBAL doc ids → (docmeta paths, partition-local offsets),
    one entry per touched partition (contiguous doc-id ranges → one
    searchsorted).  None ⇔ no ids."""
    from ..index.build import IndexInfo, docmeta_path

    ids = np.unique(np.asarray(doc_ids, dtype=np.int64))
    if len(ids) == 0:
        return None
    info = IndexInfo(index_dir)
    parts = sorted(info.manifest.partitions, key=lambda p: p.doc_base)
    bases = np.array([p.doc_base for p in parts], dtype=np.int64)
    # partition of each matched id (ids outside any partition are a bug)
    pidx = np.searchsorted(bases, ids, side="right") - 1
    if (pidx < 0).any():
        raise ValueError("doc_id below the first partition base")
    paths: list[str] = []
    locals_: list[np.ndarray] = []
    for pi in np.unique(pidx):
        p = parts[pi]
        sel = ids[pidx == pi]
        if (sel >= p.doc_base + p.num_rows).any():
            raise ValueError(f"doc_id beyond partition {p.partition_id} range")
        paths.append(str(docmeta_path(index_dir, p.partition_id)))
        locals_.append(sel - p.doc_base)
    return paths, locals_


@ray.remote
def _meta_match_partition_task(
    paths: list[str], bases: list[int], field: str, pred: tuple
) -> np.ndarray:
    """Matching GLOBAL doc ids of a docmeta-partition group for one
    query_string docmeta predicate (column-pruned read; predicate
    semantics shared with the shard engine via ``qs.meta_pred_mask``)."""
    from .qs import meta_pred_mask

    out = []
    for path, base in zip(paths, bases):
        vals = read_field_values(path, field)
        idx = np.nonzero(meta_pred_mask(vals, pred))[0]
        if len(idx):
            out.append(idx.astype(np.int64) + base)
    return (
        np.concatenate(out) if out else np.empty(0, dtype=np.int64)
    )


@ray.remote
def _script_match_partition_task(
    paths: list[str], bases: list[int], source: str
) -> np.ndarray:
    """Global ids of rows whose compiled doc-values expression is truthy
    — the term layout's ES ``script``-query scan (column-pruned to the
    expression's fields, one vectorized eval per partition)."""
    from .funcscore import ScriptExpr

    expr = ScriptExpr(source)
    out = []
    for path, base in zip(paths, bases):
        t = pq.read_table(path, columns=list(expr.fields))
        n = t.num_rows
        env = {
            f: _load_meta_values(t.column(f)).astype(np.float64)
            for f in expr.fields
        }
        env["_score"] = np.zeros(n, np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            v = expr(env)
        ok = ~np.isnan(v) & (v != 0.0)
        idx = np.nonzero(ok)[0]
        if len(idx):
            out.append(idx.astype(np.int64) + base)
    return (
        np.concatenate(out) if out else np.empty(0, dtype=np.int64)
    )


def script_match_ids(
    index_dir: str | Path,
    source: str,
    partitions_per_task: int = 16,
) -> np.ndarray:
    """All live doc ids matching an ES ``script``-query expression over
    the source docmeta lineage — same routing as
    :func:`meta_match_ids` (the global layout's rows are all live)."""
    from ..index.build import IndexInfo, docmeta_path

    info = IndexInfo(index_dir)
    parts = sorted(info.manifest.partitions, key=lambda p: p.doc_base)
    if not parts:
        return np.empty(0, dtype=np.int64)
    paths = [str(docmeta_path(index_dir, p.partition_id)) for p in parts]
    bases = [p.doc_base for p in parts]
    futs = [
        _script_match_partition_task.remote(
            paths[i: i + partitions_per_task],
            bases[i: i + partitions_per_task],
            source,
        )
        for i in range(0, len(paths), partitions_per_task)
    ]
    got = [g for g in ray.get(futs) if len(g)]
    if not got:
        return np.empty(0, dtype=np.int64)
    return np.sort(np.concatenate(got))


def meta_match_ids(
    index_dir: str | Path,
    field: str,
    pred: tuple,
    partitions_per_task: int = 16,
) -> np.ndarray:
    """All live doc ids matching a docmeta predicate — the
    term-partitioned engine's ``field:value`` / range leaf.  Keyword
    fields are NOT inverted in this layout (ES indexes them; disclosed),
    so this is a partition-parallel column-pruned SCAN of the source
    docmeta lineage — work ∝ partitions × one column.  The global
    layout refuses to build over tombstoned indexes
    (``index/global_merge.py:174-182``), so every docmeta row is live.
    An unmapped field returns empty (the lenient mapping)."""
    from ..index.build import IndexInfo, docmeta_path

    info = IndexInfo(index_dir)
    parts = sorted(info.manifest.partitions, key=lambda p: p.doc_base)
    if not parts:
        return np.empty(0, dtype=np.int64)
    first = str(docmeta_path(index_dir, parts[0].partition_id))
    if not field_schema_ok(set(pq.read_schema(first).names), field):
        return np.empty(0, dtype=np.int64)
    paths = [str(docmeta_path(index_dir, p.partition_id)) for p in parts]
    bases = [p.doc_base for p in parts]
    futs = [
        _meta_match_partition_task.remote(
            paths[i: i + partitions_per_task],
            bases[i: i + partitions_per_task],
            field,
            pred,
        )
        for i in range(0, len(paths), partitions_per_task)
    ]
    got = [g for g in ray.get(futs) if len(g)]
    if not got:
        return np.empty(0, dtype=np.int64)
    return np.sort(np.concatenate(got))


@ray.remote
def _meta_pairs_partition_task(
    paths: list[str], bases: list[int], field: str, values: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(global ids, field values) of rows whose ``field`` is IN the
    broadcast ``values`` set — the has_parent child scan over the
    docmeta lineage (column-pruned, one vectorized isin per
    partition)."""
    out_i, out_v = [], []
    for path, base in zip(paths, bases):
        vals = read_field_values(path, field)
        idx = np.nonzero(np.isin(vals, values))[0]
        if len(idx):
            out_i.append(idx.astype(np.int64) + base)
            out_v.append(vals[idx])
    if not out_i:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    return np.concatenate(out_i), np.concatenate(out_v)


def meta_pairs_in(
    index_dir: str | Path,
    field: str,
    values: np.ndarray,
    partitions_per_task: int = 16,
) -> tuple[np.ndarray, np.ndarray]:
    """All live (doc id, ``field`` value) pairs whose value is in the
    ``values`` set — same partition-parallel routing as
    :func:`meta_match_ids`; ``values`` ships once via ``ray.put``."""
    from ..index.build import IndexInfo, docmeta_path

    info = IndexInfo(index_dir)
    parts = sorted(info.manifest.partitions, key=lambda p: p.doc_base)
    if not parts:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    first = str(docmeta_path(index_dir, parts[0].partition_id))
    if not field_schema_ok(set(pq.read_schema(first).names), field):
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    paths = [str(docmeta_path(index_dir, p.partition_id)) for p in parts]
    bases = [p.doc_base for p in parts]
    vref = ray.put(np.asarray(values))
    futs = [
        _meta_pairs_partition_task.remote(
            paths[i: i + partitions_per_task],
            bases[i: i + partitions_per_task],
            field,
            vref,
        )
        for i in range(0, len(paths), partitions_per_task)
    ]
    got = ray.get(futs)
    ids = [g[0] for g in got if len(g[0])]
    vals = [g[1] for g in got if len(g[0])]
    if not ids:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    return np.concatenate(ids), np.concatenate(vals)


@ray.remote
def _distinct_partition_task(
    paths: list[str],
    local_idx: list[np.ndarray],
    field: str,
    hll_p: int | None,
) -> object:
    """Distinct values of ``field`` over the matched rows of a partition
    group: exact mode returns the (partition-local) unique value array;
    approx mode returns HLL registers — the exchange is then 2^p bytes
    per task regardless of cardinality (the ES ``cardinality`` agg's
    design point)."""
    if hll_p is not None:
        from ..ops.sketch import HyperLogLog

        h = HyperLogLog(p=hll_p)
        for path, idx in zip(paths, local_idx):
            t = pq.read_table(path, columns=[field])
            col = t.column(field).combine_chunks()
            vals = col.take(pa.array(idx)).to_pylist()
            # COUNT(DISTINCT) semantics — drop missing values (None is
            # filtered by add_many; NaN must not hash as a value, to
            # match the exact branch and the doc-engine HLL path)
            h.add_many([
                v for v in vals
                if not (isinstance(v, float) and v != v)
            ])
        return h.to_bytes()
    parts = []
    for path, idx in zip(paths, local_idx):
        v = read_field_values(path, field)[idx]
        # COUNT(DISTINCT) semantics: missing values contribute nothing
        if v.dtype.kind == "f":
            v = v[~np.isnan(v)]
        elif v.dtype == object and len(v):
            v = v[np.fromiter((x is not None for x in v), bool, len(v))]
        parts.append(np.unique(v))
    return (
        np.unique(np.concatenate(parts)) if parts
        else np.empty(0, np.float64)
    )


def distinct_partials_over_ids(
    index_dir: str | Path,
    doc_ids: np.ndarray,
    field: str,
    hll_p: int | None = None,
    partitions_per_task: int = 16,
) -> list:
    """ES ``cardinality``-aggregation partials for an explicit matched
    doc-id set over the source index's docmeta lineage — same routing as
    :func:`agg_partials_over_ids`; exact partials are per-task unique
    arrays (union-merged by the caller), approx partials are HLL
    register blobs (OR-merged)."""
    plan = _route_ids_to_partitions(index_dir, doc_ids)
    if plan is None:
        return []
    paths, locals_ = plan
    futs = [
        _distinct_partition_task.remote(
            paths[i: i + partitions_per_task],
            locals_[i: i + partitions_per_task],
            field,
            hll_p,
        )
        for i in range(0, len(paths), partitions_per_task)
    ]
    return list(ray.get(futs))


def datehist_partials_over_ids(
    index_dir: str | Path,
    doc_ids: np.ndarray,
    field: str,
    interval: str,
    stats_col: str | None = None,
    partitions_per_task: int = 16,
) -> list[dict]:
    """date_histogram partials (``("interval", ...)`` spec) — see
    :func:`agg_partials_over_ids`."""
    return agg_partials_over_ids(
        index_dir, doc_ids, field, ("interval", interval), stats_col,
        partitions_per_task,
    )


def buckets_from_partials(
    partials: list[dict],
    stats_on: str | None,
    interval: str | None = None,
    min_doc_count: int = 1,
    extended_bounds: tuple | None = None,
    time_zone: str | None = None,
    offset=None,
) -> list[dict]:
    """Merge partials → ES-shaped bucket rows, key ascending (the ES
    date_histogram bucket order), key as epoch micros (UTC).

    ``min_doc_count=0`` (needs ``interval``) fills EMPTY buckets between
    the first and last non-empty one — the ES zero-fill — and
    ``extended_bounds=(lo, hi)`` (epoch micros or ISO strings) widens
    the enumerated span beyond the data, exactly like ES (bounds are
    clamped to whole buckets; data outside the bounds still shows).
    ``time_zone``/``offset`` put the fill on the SHIFTED grid the
    bucket kernels used (they only matter with ``min_doc_count=0``)."""
    from .engine import merge_agg_partials

    merged: dict = {}
    for p in partials:
        merge_agg_partials(merged, p)
    if (min_doc_count == 0 and interval is not None
            and not (merged and isinstance(next(iter(merged)), tuple))):
        # (composite sub-agg keys take the rows below unfilled — ES
        # zero-fill applies to the parent histogram only)
        if isinstance(interval, tuple):
            # numeric histogram: (interval, offset).  Fill keys must be
            # BIT-identical to the bucket kernel's floats, so they come
            # from the SAME expression — float(j)*iv + off, j the integer
            # bucket index (the kernel computes floor((v-off)/iv)*iv+off,
            # and np.floor yields exactly float(j)); a lo_k + j*iv
            # running sum drifts and mints phantom duplicate buckets
            iv, off = interval
            # merged keys sit ON the grid — recover j by rounding;
            # extended_bounds are arbitrary values — floor like the kernel
            js = [int(round((float(k) - off) / iv)) for k in merged]
            if extended_bounds is not None:
                js += [int(np.floor((float(b) - off) / iv))
                       for b in extended_bounds if b is not None]
            if js:
                for j in range(min(js), max(js) + 1):
                    merged.setdefault(float(np.float64(j) * iv + off),
                                      (0, None, None, None))
        else:
            bounds = [int(k) for k in merged]
            if extended_bounds is not None:
                bounds += [
                    int(to_epoch_us_bound(b)) for b in extended_bounds
                    if b is not None
                ]
            if bounds:
                if time_zone is not None or offset is not None:
                    keys = enumerate_bucket_keys_shifted(
                        min(bounds), max(bounds), interval,
                        time_zone, offset,
                    )
                else:
                    keys = enumerate_bucket_keys(min(bounds), max(bounds),
                                                 interval)
                for k in keys:
                    merged.setdefault(k, (0, None, None, None))
    rows = []
    numeric = isinstance(interval, tuple)
    for k in sorted(merged):
        c, s, lo, hi = merged[k]
        if isinstance(k, tuple):
            # composite (bucket, term) key — sub-aggregation rows;
            # tuple sort above IS the ES order (parent key asc, then
            # sub-bucket key).  Zero-fill doesn't apply here.
            row = {"key": int(k[0]), "term": k[1], "doc_count": int(c)}
        else:
            row = {"key": float(k) if numeric else int(k),
                   "doc_count": int(c)}
        if stats_on is not None and s is not None:
            row.update({"sum": s, "min": lo, "max": hi, "avg": s / c})
        rows.append(row)
    return rows


def range_buckets_from_partials(
    partials: list[dict],
    ranges: list[tuple[float | None, float | None]],
    stats_on: str | None,
) -> list[dict]:
    """Merge range-spec partials → ES ``range``/``date_range`` bucket
    rows: one row PER RANGE in the order given (ES keeps declaration
    order and includes empty ranges with ``doc_count`` 0), keyed
    ``"lo-hi"`` with open ends spelled ``*`` like ES."""
    from .engine import merge_agg_partials

    merged: dict = {}
    for p in partials:
        merge_agg_partials(merged, p)
    rows = []
    for i, (lo, hi) in enumerate(ranges):
        c, s, mn, mx = merged.get(i, (0, None, None, None))
        key = (
            ("*" if lo is None else f"{lo:g}")
            + "-"
            + ("*" if hi is None else f"{hi:g}")
        )
        row = {
            "key": key,
            "from": lo,
            "to": hi,
            "doc_count": int(c),
        }
        if stats_on is not None and s is not None:
            row.update({"sum": s, "min": mn, "max": mx, "avg": s / c})
        rows.append(row)
    return rows
