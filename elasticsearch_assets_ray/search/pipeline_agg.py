"""ES *pipeline aggregations* over parent-aggregation bucket lists.

In Elasticsearch, pipeline aggregations (``derivative``,
``cumulative_sum``, ``serial_diff``, the ``*_bucket`` sibling family,
``bucket_script``, ``bucket_selector``) do NOT touch shard data: they
run on the coordinating node over the bucket rows the parent
``date_histogram`` / ``histogram`` aggregation already produced.  The
same is true here — every function below is a pure transform over the
``list[dict]`` bucket rows that BOTH serving engines
(:class:`~..search.engine.QueryEngine` and
:class:`~..search.term_engine.TermPartitionedEngine`) return from
``date_histogram`` / ``histogram``, so one implementation serves both
layouts and its cost is O(buckets) on the driver regardless of corpus
size (the scale-bearing work stayed in the parent agg's shard
partials).

Reference framing: the reference engine delegates all aggregation to
Elasticsearch (e.g. ``asset/elasticsearch_reader`` consumes
date-bucketed slices); this module supplies the post-bucket ES surface
its users would otherwise get from ES itself.

Metric paths follow ES: ``"_count"`` / ``"doc_count"`` selects the
bucket doc count, any other name selects that key from the bucket row
(the stats sub-agg publishes ``sum`` / ``min`` / ``max`` / ``avg``).
Gap policy follows ES: ``"skip"`` (default) treats buckets whose
metric is missing/None as holes; ``"insert_zeros"`` scores them 0.
"""

from __future__ import annotations

import math
from collections.abc import Callable


def bucket_metric(bucket: dict, path: str, gap_policy: str = "skip"):
    """Resolve an ES buckets_path against one bucket row → float | None.

    ``None`` means the metric is a *gap* (missing stats on an empty
    zero-filled bucket, or NaN).  ``doc_count`` / ``_count`` never gap.
    """
    if path in ("_count", "doc_count"):
        return float(bucket["doc_count"])
    v = bucket.get(path)
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return 0.0 if gap_policy == "insert_zeros" else None
    return float(v)


def derivative(
    buckets: list[dict],
    path: str = "_count",
    gap_policy: str = "skip",
    out: str = "derivative",
) -> list[dict]:
    """ES ``derivative`` pipeline agg: per bucket, ``metric[i] −
    metric[i−1]``.  The first bucket (and, under ``gap_policy="skip"``,
    any bucket whose own or previous metric is a gap) carries
    ``out=None`` — ES omits the value there; ``None`` is the tabular
    spelling of that omission.  Parent buckets must be key-ascending
    (both engines' contract).  Returns NEW rows; input is not mutated.
    """
    rows = []
    prev = None
    for b in buckets:
        cur = bucket_metric(b, path, gap_policy)
        r = dict(b)
        r[out] = (cur - prev) if (cur is not None and prev is not None) else None
        rows.append(r)
        if cur is not None:
            prev = cur
        elif gap_policy != "skip":
            prev = None
    return rows


def serial_diff(
    buckets: list[dict],
    path: str = "_count",
    lag: int = 1,
    gap_policy: str = "skip",
    out: str = "serial_diff",
) -> list[dict]:
    """ES ``serial_diff``: ``metric[i] − metric[i−lag]`` (derivative is
    the ``lag=1`` case, which ES documents explicitly)."""
    if lag < 1:
        raise ValueError("serial_diff lag must be >= 1")
    vals = [bucket_metric(b, path, gap_policy) for b in buckets]
    rows = []
    for i, b in enumerate(buckets):
        r = dict(b)
        j = i - lag
        if j >= 0 and vals[i] is not None and vals[j] is not None:
            r[out] = vals[i] - vals[j]
        else:
            r[out] = None
        rows.append(r)
    return rows


def cumulative_sum(
    buckets: list[dict], path: str = "_count", out: str = "cumulative_sum"
) -> list[dict]:
    """ES ``cumulative_sum``: running total of the metric, inclusive.
    ES supports only gap-skipping here — a gapped bucket reports the
    running total unchanged (it still carries a value, unlike
    ``derivative``)."""
    rows = []
    total = 0.0
    for b in buckets:
        cur = bucket_metric(b, path, "skip")
        if cur is not None:
            total += cur
        r = dict(b)
        r[out] = total
        rows.append(r)
    return rows


def _sibling_values(buckets: list[dict], path: str, gap_policy: str):
    out = []
    for b in buckets:
        v = bucket_metric(b, path, gap_policy)
        if v is not None:
            out.append((b, v))
    return out


def sum_bucket(buckets, path="_count", gap_policy="skip") -> dict:
    """ES ``sum_bucket`` sibling agg → ``{"value": float}``."""
    vs = _sibling_values(buckets, path, gap_policy)
    return {"value": float(sum(v for _, v in vs))}


def avg_bucket(buckets, path="_count", gap_policy="skip") -> dict:
    """ES ``avg_bucket`` sibling agg → ``{"value": float | None}``
    (None when every bucket gapped, like ES's null)."""
    vs = _sibling_values(buckets, path, gap_policy)
    if not vs:
        return {"value": None}
    return {"value": float(sum(v for _, v in vs)) / len(vs)}


def _extreme_bucket(buckets, path, gap_policy, better) -> dict:
    vs = _sibling_values(buckets, path, gap_policy)
    if not vs:
        return {"value": None, "keys": []}
    best = vs[0][1]
    for _, v in vs[1:]:
        if better(v, best):
            best = v
    keys = [b["key"] for b, v in vs if v == best]
    return {"value": float(best), "keys": keys}


def max_bucket(buckets, path="_count", gap_policy="skip") -> dict:
    """ES ``max_bucket`` sibling agg → value + the keys of EVERY bucket
    attaining it (ES returns a keys array precisely because ties
    happen)."""
    return _extreme_bucket(buckets, path, gap_policy, lambda a, b: a > b)


def min_bucket(buckets, path="_count", gap_policy="skip") -> dict:
    """ES ``min_bucket`` sibling agg (see :func:`max_bucket`)."""
    return _extreme_bucket(buckets, path, gap_policy, lambda a, b: a < b)


def stats_bucket(buckets, path="_count", gap_policy="skip") -> dict:
    """ES ``stats_bucket`` sibling agg → count/min/max/sum/avg over the
    non-gapped bucket metrics."""
    vs = [v for _, v in _sibling_values(buckets, path, gap_policy)]
    if not vs:
        return {"count": 0, "min": None, "max": None, "sum": 0.0, "avg": None}
    s = float(sum(vs))
    return {
        "count": len(vs),
        "min": float(min(vs)),
        "max": float(max(vs)),
        "sum": s,
        "avg": s / len(vs),
    }


def bucket_script(
    buckets: list[dict],
    paths: dict[str, str],
    fn: Callable[..., float],
    gap_policy: str = "skip",
    out: str = "value",
) -> list[dict]:
    """ES ``bucket_script`` parent pipeline agg: per bucket, bind each
    ``paths`` entry (var name → buckets_path) and evaluate ``fn(**vars)``
    — the Python stand-in for the Painless script body.  Under
    ``gap_policy="skip"`` a bucket with ANY gapped input carries
    ``out=None`` (ES omits the sub-agg on that bucket)."""
    rows = []
    for b in buckets:
        bound = {k: bucket_metric(b, p, gap_policy) for k, p in paths.items()}
        r = dict(b)
        r[out] = None if any(v is None for v in bound.values()) else float(fn(**bound))
        rows.append(r)
    return rows


def bucket_selector(
    buckets: list[dict],
    paths: dict[str, str],
    fn: Callable[..., bool],
    gap_policy: str = "skip",
) -> list[dict]:
    """ES ``bucket_selector``: keep only buckets where the script is
    true.  A bucket with a gapped input is DROPPED under ``skip`` (ES
    behavior: the script never runs, the bucket is removed)."""
    keep = []
    for b in buckets:
        bound = {k: bucket_metric(b, p, gap_policy) for k, p in paths.items()}
        if any(v is None for v in bound.values()):
            continue
        if fn(**bound):
            keep.append(b)
    return keep


def moving_fn(
    buckets: list[dict],
    path: str = "_count",
    window: int = 3,
    fn: Callable[[list[float]], float] | str = "mean",
    shift: int = 0,
    gap_policy: str = "skip",
    out: str = "moving_fn",
) -> list[dict]:
    """ES ``moving_fn`` pipeline agg: slide a ``window``-wide frame over
    the bucket metric series and evaluate ``fn`` on each frame.  The ES
    frame for bucket *i* is ``values[i − window + shift : i + shift)``
    (shift=0 → strictly-previous values, the ES default; gaps are
    excluded from the frame under ``skip``).  ``fn`` accepts the
    builtin names ``min|max|sum|mean`` (the ``MovingFunctions.*``
    stand-ins) or any callable over a list of floats; an empty frame
    carries ``out=None``."""
    builtins: dict[str, Callable[[list[float]], float]] = {
        "min": lambda xs: float(min(xs)),
        "max": lambda xs: float(max(xs)),
        "sum": lambda xs: float(sum(xs)),
        "mean": lambda xs: float(sum(xs)) / len(xs),
    }
    f = builtins[fn] if isinstance(fn, str) else fn
    vals = [bucket_metric(b, path, gap_policy) for b in buckets]
    rows = []
    for i, b in enumerate(buckets):
        lo, hi = max(0, i - window + shift), max(0, i + shift)
        frame = [v for v in vals[lo:hi] if v is not None]
        r = dict(b)
        r[out] = f(frame) if frame else None
        rows.append(r)
    return rows
