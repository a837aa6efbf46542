"""Statistical aggregations shared by both serving engines.

ES aggregation family: ``boxplot``, ``median_absolute_deviation``,
``string_stats``, ``t_test``, ``matrix_stats`` and ``top_metrics`` —
the coordinator-side kernels.  Per-shard partials are associative and
O(1)/O(alphabet)/O(size) on the wire; every continuous-valued output is
rounded ONCE after the full computation (the repo's float-oracle
invariant, see DEVNOTES), while counts/lengths stay exact integers.

ES serves ``boxplot`` / ``median_absolute_deviation`` from t-digest
sketches (approximate); here the default mode is EXACT nearest-rank —
pure integer rank logic that a SQL oracle reproduces bit-for-bit — and
the existing ``pctl_sketch_partial`` log-bucket sketch remains the
10^12-row scale path for the quantile-shaped members of the family.

Reference: the reference repo delegates every aggregation to the ES
cluster (``/root/reference/asset/elasticsearch_reader/reader.js`` ships
the request envelope verbatim); these are from-scratch distributed
re-implementations of the delegated semantics.
"""
from __future__ import annotations

import math

import numpy as np

from .datehist import _nearest_ranks

# ---------------------------------------------------------------- boxplot


def variable_width_buckets(
    parts: list[np.ndarray], n_buckets: int
) -> list[dict]:
    """ES ``variable_width_histogram`` — but EXACT where ES is
    approximate (disclosed): optimal 1-D weighted k-means over the
    matched values via the Ckmeans dynamic program on DISTINCT values
    (cost O(k·m²) in m distinct values — bounded by value cardinality,
    not match count; shards ship sorted-value partials like the exact
    percentiles path).  Deterministic: the DP's leftmost-optimal split
    tie-break.  Buckets: {key: weighted centroid, min, max, doc_count},
    ascending."""
    vals = [p for p in parts if len(p)]
    if not vals:
        return []
    v = np.sort(np.concatenate(vals).astype(np.float64))
    uv, w = np.unique(v, return_counts=True)
    m = len(uv)
    k = min(n_buckets, m)
    # weighted prefix sums → O(1) segment SSE
    cw = np.concatenate(([0.0], np.cumsum(w)))
    cs = np.concatenate(([0.0], np.cumsum(w * uv)))
    cs2 = np.concatenate(([0.0], np.cumsum(w * uv * uv)))

    def seg_cost(a: np.ndarray, b: int) -> np.ndarray:
        """SSE of segments (a..b] for a vector of starts ``a``."""
        ww = cw[b] - cw[a]
        s = cs[b] - cs[a]
        s2 = cs2[b] - cs2[a]
        with np.errstate(invalid="ignore", divide="ignore"):
            out = s2 - np.where(ww > 0, s * s / ww, 0.0)
        return out
    INF = np.inf
    D = np.full((k + 1, m + 1), INF)
    B = np.zeros((k + 1, m + 1), dtype=np.int64)
    D[0, 0] = 0.0
    for j in range(1, k + 1):
        for i in range(j, m + 1):
            starts = np.arange(j - 1, i)
            costs = D[j - 1, starts] + seg_cost(starts, i)
            a = int(np.argmin(costs))  # leftmost optimum
            D[j, i], B[j, i] = costs[a], starts[a]
    # walk back the optimal split points
    bounds = [m]
    i = m
    for j in range(k, 0, -1):
        i = int(B[j, i])
        bounds.append(i)
    bounds = bounds[::-1]
    out = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        ww = cw[b] - cw[a]
        out.append({
            "key": float((cs[b] - cs[a]) / ww),
            "min": float(uv[a]),
            "max": float(uv[b - 1]),
            "doc_count": int(ww),
        })
    return out


def boxplot_exact(parts: list[np.ndarray]) -> dict:
    """ES ``boxplot`` aggregation (min/max/q1/q2/q3) from per-shard
    SORTED value partials — exact nearest-rank quartiles (ES itself is
    t-digest approximate; the exact form is the SQL-reproducible twin)."""
    parts = [p for p in parts if len(p)]
    if not parts:
        return {"min": None, "max": None, "q1": None, "q2": None,
                "q3": None, "count": 0}
    v = np.sort(np.concatenate(parts))
    r1, r2, r3 = _nearest_ranks(len(v), (25.0, 50.0, 75.0))
    return {
        "min": float(v[0]), "max": float(v[-1]),
        "q1": float(v[r1]), "q2": float(v[r2]), "q3": float(v[r3]),
        "count": int(len(v)),
    }


def mad_exact(parts: list[np.ndarray]) -> float | None:
    """ES ``median_absolute_deviation``: median(|x - median(x)|), both
    medians the exact nearest-rank form (ES is t-digest approximate).
    Absolute deviations of exactly-representable doc values are exact
    floats, so the result is bit-reproducible in SQL with the same
    integer rank logic."""
    parts = [p for p in parts if len(p)]
    if not parts:
        return None
    v = np.sort(np.concatenate(parts))
    m = v[_nearest_ranks(len(v), (50.0,))[0]]
    d = np.sort(np.abs(v - m))
    return float(d[_nearest_ranks(len(d), (50.0,))[0]])


# ------------------------------------------------------------ string_stats


def string_stats_partial(vals: np.ndarray) -> tuple:
    """Per-shard partial for ES ``string_stats`` over a keyword doc-
    values column: ``(count, sum_len, min_len, max_len, char_counts)``
    with ``char_counts`` a {codepoint: count} dict — wire size bounded
    by the alphabet, not the match count.  Unicode-correct: lengths and
    the entropy distribution count CODEPOINTS (utf-32 view), matching
    ES's per-character definition."""
    strs = [s for s in vals.tolist() if isinstance(s, str)]
    if not strs:
        return (0, 0, None, None, {})
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=len(strs))
    cps = np.frombuffer("".join(strs).encode("utf-32-le"), dtype=np.uint32)
    uniq, counts = np.unique(cps, return_counts=True)
    return (
        int(len(strs)), int(lens.sum()), int(lens.min()), int(lens.max()),
        {int(u): int(c) for u, c in zip(uniq, counts)},
    )


def merge_string_stats(parts: list[tuple]) -> tuple:
    n = 0
    sum_len = 0
    mn: int | None = None
    mx: int | None = None
    chars: dict[int, int] = {}
    for p in parts:
        pn, ps, pmn, pmx, pc = p
        if pn == 0:
            continue
        n += pn
        sum_len += ps
        mn = pmn if mn is None else min(mn, pmn)
        mx = pmx if mx is None else max(mx, pmx)
        for k, c in pc.items():
            chars[k] = chars.get(k, 0) + c
    return (n, sum_len, mn, mx, chars)


def string_stats_render(parts: list[tuple], round_decimals: int = 6) -> dict:
    """count / min_length / max_length / avg_length / entropy.  Entropy
    is Shannon entropy over the merged character distribution, summed in
    ascending-codepoint order and rounded AFTER the sum (continuous-
    valued math — the float-oracle rule)."""
    if round_decimals is None:
        round_decimals = 6
    n, sum_len, mn, mx, chars = merge_string_stats(parts)
    if n == 0:
        return {"count": 0, "min_length": None, "max_length": None,
                "avg_length": None, "entropy": 0.0}
    total = float(sum(chars.values()))
    ent = 0.0
    for k in sorted(chars):
        p = chars[k] / total
        ent -= p * math.log2(p)
    return {
        "count": n, "min_length": mn, "max_length": mx,
        # one exact-int division — bit-reproducible in SQL
        "avg_length": sum_len / n,
        "entropy": round(ent, round_decimals),
    }


# ----------------------------------------------------------------- t_test


def ttest_from_moments(
    a: tuple, b: tuple | None, kind: str, round_decimals: int = 6
) -> dict:
    """ES ``t_test`` aggregation from extstats-shaped moment partials
    ``(n, sum, sumsq, min, max)`` per side.

    * ``heteroscedastic`` (ES default): Welch's t over two independent
      samples + Welch–Satterthwaite degrees of freedom.
    * ``homoscedastic``: pooled-variance Student t, df = n1 + n2 - 2.
    * ``paired``: ``a`` holds moments of the per-doc DIFFERENCE column,
      ``b`` is None; one-sample t on the differences, df = n - 1.

    DIVERGENCE (disclosed): ES returns the two-sided p-value; the
    sandbox has no public Student-t CDF (no scipy) and neither does the
    DuckDB oracle, so this returns the sufficient pair ``(t, df)``
    instead — the statistic the p-value is a monotone function of.
    Sample variances use n-1 (the t-test definition); floats round ONCE
    after the full expression."""
    if round_decimals is None:
        round_decimals = 6
    def _mv(p):
        n, s, s2, _mn, _mx = p
        if n < 2:
            return None
        mean = s / n
        var = (s2 - s * mean) / (n - 1)  # = (Σx² − n·μ²)/(n−1), SQL-ordered
        return n, mean, var

    if kind == "paired":
        got = _mv(a)
        if got is None:
            return {"t": None, "df": None}
        n, mean, var = got
        if var <= 0.0:
            return {"t": None, "df": float(n - 1)}
        t = mean / math.sqrt(var / n)
        return {"t": round(t, round_decimals), "df": float(n - 1)}
    ga, gb = _mv(a), _mv(b)
    if ga is None or gb is None:
        return {"t": None, "df": None}
    n1, m1, v1 = ga
    n2, m2, v2 = gb
    if kind == "homoscedastic":
        sp2 = ((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)
        if sp2 <= 0.0:
            return {"t": None, "df": float(n1 + n2 - 2)}
        t = (m1 - m2) / math.sqrt(sp2 * (1.0 / n1 + 1.0 / n2))
        return {"t": round(t, round_decimals), "df": float(n1 + n2 - 2)}
    if kind != "heteroscedastic":
        raise ValueError(f"unknown t_test type: {kind!r}")
    se1, se2 = v1 / n1, v2 / n2
    if se1 + se2 <= 0.0:
        return {"t": None, "df": None}
    t = (m1 - m2) / math.sqrt(se1 + se2)
    df = (se1 + se2) ** 2 / (
        se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)
    )
    return {"t": round(t, round_decimals), "df": round(df, round_decimals)}


# ------------------------------------------------------------ matrix_stats


def matrix_stats_partial(cols: list[np.ndarray]) -> tuple:
    """Per-shard partial for ES ``matrix_stats`` over k numeric doc-
    values columns: rows missing ANY field are skipped (the ES
    semantics), then ``(n, sums[k], cross[k,k])`` with ``cross`` the
    full Σ·xᵢxⱼ Gram matrix — O(k²) wire regardless of match count."""
    k = len(cols)
    if k == 0:
        return (0, np.zeros(0), np.zeros((0, 0)))
    m = np.column_stack([c.astype(np.float64) for c in cols])
    ok = ~np.isnan(m).any(axis=1)
    m = m[ok]
    if m.shape[0] == 0:
        return (0, np.zeros(k), np.zeros((k, k)))
    return (int(m.shape[0]), m.sum(axis=0), m.T @ m)


def matrix_stats_render(
    parts: list[tuple], fields: list[str], round_decimals: int = 6
) -> list[dict]:
    """Merged matrix_stats: per ordered field pair (i ≤ j) one row with
    count, means, sample covariance (n-1) and Pearson correlation —
    every float derives from (n, Σx, Σx², Σxy) with a pinned operation
    order mirrored in the SQL oracle, rounded once at the end.  ES also
    reports skewness/kurtosis; those are a separate accepted-divergence
    (documented) — count/mean/variance/covariance/correlation is the
    cross-field core the aggregation exists for."""
    if round_decimals is None:
        round_decimals = 6
    k = len(fields)
    n = 0
    sums = np.zeros(k)
    cross = np.zeros((k, k))
    for pn, ps, pc in parts:
        if pn == 0:
            continue
        n += pn
        sums += ps
        cross += pc
    out: list[dict] = []
    if n < 2:
        return out
    mean = sums / n
    # sample covariance, SQL-ordered: (Σxy − n·μx·μy)/(n−1)
    cov = (cross - n * np.outer(mean, mean)) / (n - 1)
    sd = np.sqrt(np.diag(cov))
    for i in range(k):
        for j in range(i, k):
            denom = sd[i] * sd[j]
            corr = cov[i, j] / denom if denom > 0 else None
            out.append({
                "field_a": fields[i], "field_b": fields[j],
                "count": int(n),
                "mean_a": round(float(mean[i]), round_decimals),
                "mean_b": round(float(mean[j]), round_decimals),
                "covariance": round(float(cov[i, j]), round_decimals),
                "correlation": (
                    None if corr is None
                    else round(float(corr), round_decimals)
                ),
            })
    return out


# ------------------------------------------------------------- top_metrics


def merge_top_metrics(
    parts: list[list[tuple]], size: int, desc: bool
) -> list[tuple]:
    """Merge per-shard top-``size`` partials of ``(sort_value, doc_id,
    metrics_tuple)`` rows — ES ``top_metrics``: global top by sort value
    with the serving doc-ascending tiebreak.  Exact: each shard already
    kept its own top ``size``, and the global top is a subset of the
    union of per-shard tops."""
    allr = [r for p in parts for r in p]
    allr.sort(key=lambda r: ((-r[0] if desc else r[0]), r[1]))
    return allr[:size]
