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
        "unweightedAvg": lambda xs: float(sum(xs)) / len(xs),
        "stdDev": _moving_std,
        "linearWeightedAvg": _linear_weighted_avg,
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


def bucket_sort(
    buckets: list[dict],
    sort: list[tuple[str, str]] | None = None,
    frm: int = 0,
    size: int | None = None,
    gap_policy: str = "skip",
) -> list[dict]:
    """ES ``bucket_sort`` pipeline agg: re-order the parent's buckets by
    one or more metric paths, then truncate with ``from``/``size``.
    Under ``gap_policy="skip"`` (ES default) a bucket missing ANY sort
    metric is DROPPED (the ES contract); with no ``sort`` at all this is
    the pure-truncation form ES also allows.  Multi-key sort applies
    keys left-to-right (stable sorts in reverse spec order)."""
    rows = list(buckets)
    if sort:
        keyed = []
        for b in rows:
            vals = [bucket_metric(b, p, gap_policy) for p, _ in sort]
            if any(v is None for v in vals):
                continue  # skip: drop buckets with a gapped sort metric
            keyed.append((vals, b))
        for i in range(len(sort) - 1, -1, -1):
            keyed.sort(key=lambda kv: kv[0][i],
                       reverse=sort[i][1] == "desc")
        rows = [b for _, b in keyed]
    end = None if size is None else frm + size
    return rows[frm:end]


def normalize(
    buckets: list[dict],
    path: str = "_count",
    method: str = "percent_of_sum",
    out: str = "normalized",
) -> list[dict]:
    """ES ``normalize`` pipeline agg: rescale the bucket metric series.
    Methods (the ES set): ``proportion_of_sum`` (x/Σ),
    ``percent_of_sum`` (100·x/Σ), ``rescale_0_1`` ((x−min)/(max−min)),
    ``rescale_0_100``, ``mean`` ((x−mean)/(max−min)), ``z-score``
    ((x−mean)/σ, population σ — ES), ``softmax`` (eˣ/Σeʸ).  Gapped
    buckets carry ``out=None`` and are excluded from the statistics
    (the ES skip behavior); degenerate denominators (all-equal series,
    zero sum) also yield None rather than ±inf."""
    vals = [bucket_metric(b, path, "skip") for b in buckets]
    present = [v for v in vals if v is not None]

    def _stats():
        n = len(present)
        mean = sum(present) / n
        var = sum((v - mean) ** 2 for v in present) / n
        return mean, math.sqrt(var)

    def _of(v):
        if method == "proportion_of_sum":
            s = sum(present)
            return v / s if s else None
        if method == "percent_of_sum":
            s = sum(present)
            return 100.0 * v / s if s else None
        if method in ("rescale_0_1", "rescale_0_100", "mean"):
            lo, hi = min(present), max(present)
            if hi == lo:
                return None
            if method == "mean":
                m, _ = _stats()
                return (v - m) / (hi - lo)
            r = (v - lo) / (hi - lo)
            return r * 100.0 if method == "rescale_0_100" else r
        if method == "z-score":
            m, sd = _stats()
            return (v - m) / sd if sd else None
        if method == "softmax":
            s = sum(math.exp(x) for x in present)
            return math.exp(v) / s
        raise ValueError(f"unknown normalize method {method!r}")

    rows = []
    for b, v in zip(buckets, vals):
        r = dict(b)
        r[out] = None if (v is None or not present) else _of(v)
        rows.append(r)
    return rows


def moving_percentiles(
    buckets: list[dict],
    path: str = "_count",
    window: int = 3,
    percents: tuple[float, ...] = (50.0,),
    shift: int = 0,
    out: str = "moving_pctl",
) -> list[dict]:
    """ES ``moving_percentiles`` pipeline agg, EXACT twin: slide the
    ``moving_fn`` frame (``[i − window + shift, i + shift)``, gaps
    excluded) and compute nearest-rank percentiles of the frame values
    (ES merges the sub-agg's t-digests — approximation disclosed; the
    exact form is the SQL-reproducible one, matching the repo's
    percentile convention).  ``out`` maps percent → value (None frame →
    None)."""
    vals = [bucket_metric(b, path, "skip") for b in buckets]
    rows = []
    for i, b in enumerate(buckets):
        lo, hi = max(0, i - window + shift), max(0, i + shift)
        frame = sorted(v for v in vals[lo:hi] if v is not None)
        r = dict(b)
        if frame:
            n = len(frame)
            r[out] = {
                p: frame[min(max(math.ceil(p / 100.0 * n), 1), n) - 1]
                for p in percents
            }
        else:
            r[out] = None
        rows.append(r)
    return rows


# fixed ES units, microseconds (calendar units resolve per bucket)
_RATE_UNIT_US = {
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 604_800_000_000,
}


def rate(
    buckets: list[dict],
    interval: str,
    unit: str,
    path: str = "_count",
    out: str = "rate",
) -> list[dict]:
    """ES ``rate`` aggregation (inside a ``date_histogram``): the bucket
    metric re-expressed per ``unit`` of time — ``metric /
    (bucket_length / unit_length)``, where bucket length is the TRUE
    calendar span of that bucket (a monthly bucket divides by its own
    28/29/30/31 days — the ES behavior).  ``interval`` is the parent
    histogram's calendar/fixed interval (bucket keys are epoch-µs
    starts); ``unit`` ∈ second|minute|hour|day|week, or equal to
    ``interval`` (factor 1 — "per month of a monthly histogram").
    Gapped metrics carry None."""
    from .datehist import next_bucket_key

    if unit not in _RATE_UNIT_US and unit != interval:
        raise ValueError(
            f"rate unit {unit!r} must be one of {sorted(_RATE_UNIT_US)} "
            f"or equal the histogram interval {interval!r}"
        )
    rows = []
    for b in buckets:
        v = bucket_metric(b, path, "skip")
        r = dict(b)
        if v is None:
            r[out] = None
        elif unit == interval:
            r[out] = v
        else:
            key = int(b["key"])
            span = next_bucket_key(key, interval) - key
            r[out] = v / (span / _RATE_UNIT_US[unit])
        rows.append(r)
    return rows


def cumulative_cardinality(
    grouped_rows: list[dict],
    out: str = "cumulative_cardinality",
) -> list[dict]:
    """ES ``cumulative_cardinality`` pipeline agg, EXACT twin: input is
    the composite ``date_histogram(group_by=field)`` rows (one per
    (bucket, value) pair — the engines' existing sub-agg partials, wire
    = distinct pairs); output is one row per parent bucket carrying the
    bucket's exact ``cardinality`` and the expanding distinct count.
    ES merges per-bucket HLL sketches on the coordinator — same shape,
    approximate; the exact form here is the SQL-reproducible twin
    (divergence disclosed).  Driver work/memory = total distinct
    values, the same bound ES's coordinator pays."""
    per_bucket: dict[int, set] = {}
    for r in grouped_rows:
        per_bucket.setdefault(r["key"], set()).add(r["term"])
    seen: set = set()
    rows = []
    for k in sorted(per_bucket):
        terms = per_bucket[k]
        seen |= terms
        rows.append({"key": k, "cardinality": len(terms),
                     out: len(seen)})
    return rows


def _moving_std(xs: list[float]) -> float:
    """``MovingFunctions.stdDev`` (population σ around the frame mean)."""
    m = sum(xs) / len(xs)
    return math.sqrt(sum((v - m) ** 2 for v in xs) / len(xs))


def _linear_weighted_avg(xs: list[float]) -> float:
    """``MovingFunctions.linearWeightedAvg``: weights 1..n, newest
    heaviest — Σ(vᵢ·i)/Σi with i ascending over the frame."""
    n = len(xs)
    return sum(v * (i + 1) for i, v in enumerate(xs)) / (n * (n + 1) / 2)


def ewma(alpha: float) -> Callable[[list[float]], float]:
    """``MovingFunctions.ewma`` factory: exponentially weighted moving
    average over the frame (oldest seeds the accumulator; each newer
    value folds in as ``α·v + (1−α)·acc`` — the ES formulation).  Pass
    the returned callable as ``moving_fn``'s ``fn``."""

    def f(xs: list[float]) -> float:
        acc = xs[0]
        for v in xs[1:]:
            acc = alpha * v + (1.0 - alpha) * acc
        return float(acc)

    return f


def holt(alpha: float, beta: float) -> Callable[[list[float]], float]:
    """``MovingFunctions.holt`` factory: double-exponential (level +
    trend) smoothing over the frame, returning the last smoothed value
    — the ES holt() one-step form.  Frames shorter than 2 fall back to
    the raw value."""

    def f(xs: list[float]) -> float:
        if len(xs) < 2:
            return float(xs[0])
        level, trend = xs[0], xs[1] - xs[0]
        for v in xs[1:]:
            last = level
            level = alpha * v + (1.0 - alpha) * (level + trend)
            trend = beta * (level - last) + (1.0 - beta) * trend
        return float(level)

    return f


# --------------------------------------------------------------- ML
# The ES ML sibling aggregations (bucket_count_ks_test,
# bucket_correlation, change_point) are coordinating-node transforms
# over a parent aggregation's bucket rows, exactly like the *_bucket
# family above — the statistics are exact textbook formulas here, where
# ES's x-pack versions add Monte-Carlo sampling options (divergences
# noted per function).


def bucket_count_ks_test(
    buckets: list[dict],
    fractions: list[float] | None = None,
    alternatives: tuple[str, ...] = ("two_sided",),
    path: str = "_count",
) -> dict:
    """ES ``bucket_count_ks_test`` sibling aggregation: a one-sample
    Kolmogorov–Smirnov test of the buckets' count distribution against
    the expected ``fractions`` (default uniform across buckets).

    Statistics are EXACT sup-differences of the two CDFs
    (``greater`` = sup(F_emp − F_exp), ``less`` = sup(F_exp − F_emp),
    ``two_sided`` = sup |·|); p-values use the classical asymptotics
    (one-sided ``exp(−2 n D²)``, two-sided the Kolmogorov series with
    the small-n correction) — ES's ``sampling_method`` Monte-Carlo
    variants are not modeled (disclosed).  Returns
    ``{"statistics": {alt: D}, "p_values": {alt: p}, "n": total}``."""
    xs = [bucket_metric(b, path, "insert_zeros") or 0.0 for b in buckets]
    total = float(sum(xs))
    nb = len(xs)
    if nb == 0 or total <= 0:
        return {"statistics": {a: None for a in alternatives},
                "p_values": {a: None for a in alternatives}, "n": 0}
    if fractions is not None and len(fractions) != nb:
        raise ValueError(
            f"fractions has {len(fractions)} entries for {nb} buckets"
        )
    # ONE division per CDF point over exact integer-valued cumulative
    # sums (counts are ints) — bit-identical to a SQL mirror's
    # ``cum/total`` and ``i/n``; accumulating per-point quotients
    # drifts ulps and can straddle a rounding boundary
    f_emp, f_exp, ce = [], [], 0.0
    cx = 0.0
    for i, x in enumerate(xs):
        ce += x
        f_emp.append(ce / total)
        if fractions is None:
            f_exp.append((i + 1) / nb)
        else:
            cx += fractions[i]
            f_exp.append(cx)
    d_plus = max(e - x for e, x in zip(f_emp, f_exp))
    d_minus = max(x - e for e, x in zip(f_emp, f_exp))
    stats, pvals = {}, {}
    sq = math.sqrt(total)
    for alt in alternatives:
        if alt == "greater":
            d = max(d_plus, 0.0)
            p = math.exp(-2.0 * total * d * d)
        elif alt == "less":
            d = max(d_minus, 0.0)
            p = math.exp(-2.0 * total * d * d)
        elif alt == "two_sided":
            d = max(d_plus, d_minus)
            lam = (sq + 0.12 + 0.11 / sq) * d
            if lam < 0.2:
                # the alternating series converges too slowly below the
                # Kolmogorov distribution's support — p is 1 to >10
                # digits there
                p = 1.0
            else:
                p = 2.0 * sum(
                    (-1.0) ** (j - 1) * math.exp(-2.0 * j * j * lam * lam)
                    for j in range(1, 101)
                )
                p = min(max(p, 0.0), 1.0)
        else:
            raise ValueError(f"unknown KS alternative {alt!r}")
        stats[alt] = d
        pvals[alt] = p
    return {"statistics": stats, "p_values": pvals, "n": int(total)}


def bucket_correlation(
    buckets: list[dict],
    indicator: list[float],
    path: str = "_count",
) -> float | None:
    """ES ``bucket_correlation`` sibling aggregation
    (``count_correlation`` function): the Pearson correlation between
    the buckets' metric series and a caller-supplied ``indicator``
    vector of the same length — exact (r is normalization-invariant, so
    it equals both the population and sample formulations and any SQL
    ``corr()``).  None when either side is constant (undefined)."""
    xs = [bucket_metric(b, path, "insert_zeros") or 0.0 for b in buckets]
    if len(indicator) != len(xs):
        raise ValueError(
            f"indicator has {len(indicator)} entries for {len(xs)} buckets"
        )
    n = len(xs)
    if n == 0:
        return None
    mx = sum(xs) / n
    my = sum(indicator) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    syy = sum((y - my) ** 2 for y in indicator)
    if sxx <= 0.0 or syy <= 0.0:
        return None
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, indicator))
    return sxy / math.sqrt(sxx * syy)


def change_point(
    buckets: list[dict],
    path: str = "_count",
    min_r2: float = 0.3,
) -> dict:
    """ES ``change_point`` sibling aggregation, simplified to an EXACT
    binary-segmentation detector (ES runs proprietary ML with more
    change types — disclosed): the split ``k`` maximizing the
    between-segment sum of squares picks the change bucket; the same
    two-group decomposition with a leave-one-out partition decides
    ``spike``/``dip`` (one outlier bucket explains more variance than
    the best step) vs ``step_change``; series whose best model explains
    under ``min_r2`` of the variance are ``stationary``.

    Scores use the closed two-group form — for any 2-partition with
    ``k`` members summing ``cs``, between-SS = ``(cs·n − k·tot)² /
    (n·k·(n−k))`` — so each R² is ONE division of exact integers when
    the metric is integer counts (bit-identical to a SQL mirror of the
    same expressions; the float-safety invariant).  Returns
    ``{"type", "bucket_key", "score"}`` (key None when stationary);
    ``score`` = the winning model's explained-variance fraction R²."""
    xs = [bucket_metric(b, path, "insert_zeros") or 0.0 for b in buckets]
    n = len(xs)
    if n < 4:
        return {"type": "stationary", "bucket_key": None, "score": 0.0}
    if all(float(x).is_integer() for x in xs):
        xs = [int(x) for x in xs]
    tot = sum(xs)
    sumsq = sum(x * x for x in xs)
    ss_num = n * sumsq - tot * tot  # = n · total sum of squares
    if ss_num <= 0:
        return {"type": "stationary", "bucket_key": None, "score": 0.0}
    # best contiguous step: R²(k) = D_k² / (k·(n−k)·ss_num),
    # D_k = cs_k·n − k·tot (exact when counts are ints)
    best_k, best_step = 1, -1.0
    cs = 0
    for k in range(1, n):
        cs += xs[k - 1]
        d = cs * n - k * tot
        r2 = (d * d) / (k * (n - k) * ss_num)
        if r2 > best_step:
            best_k, best_step = k, r2
    # best single-bucket outlier: the same form with k=1, any position
    best_i, best_out = 0, -1.0
    for i, x in enumerate(xs):
        d = x * n - tot
        r2 = (d * d) / ((n - 1) * ss_num)
        if r2 > best_out:
            best_i, best_out = i, r2
    if max(best_step, best_out) < min_r2:
        return {"type": "stationary", "bucket_key": None, "score": 0.0}
    if best_out > best_step:
        kind = "spike" if x_gt_mean_rest(xs[best_i], tot, n) else "dip"
        return {"type": kind, "bucket_key": buckets[best_i].get("key"),
                "score": best_out}
    # the change bucket is the FIRST bucket of the second segment
    return {"type": "step_change",
            "bucket_key": buckets[best_k].get("key"),
            "score": best_step}


def x_gt_mean_rest(x, tot, n) -> bool:
    """``x > mean(rest)`` ⇔ ``x·n > tot`` — integer-exact for counts."""
    return x * n > tot
