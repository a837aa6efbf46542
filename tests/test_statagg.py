"""Statistical-aggregation kernels (search/statagg.py): brute-force
parity against numpy/pure-python references + degenerate edges.  The
engine-level twins (both serving engines vs the DuckDB oracle) run in
test_contract.py via the *_agg / *_agg_global pipelines."""

import math

import pytest

import numpy as np

from elasticsearch_assets_ray.search.statagg import (
    boxplot_exact,
    mad_exact,
    matrix_stats_partial,
    matrix_stats_render,
    merge_string_stats,
    merge_top_metrics,
    string_stats_partial,
    string_stats_render,
    ttest_from_moments,
)


def _moments(v: np.ndarray) -> tuple:
    return (int(len(v)), float(v.sum()), float((v * v).sum()),
            float(v.min()), float(v.max()))


def _rank(v: np.ndarray, p: float) -> float:
    """Nearest-rank reference: ceil(p/100·n)-th smallest."""
    s = np.sort(v)
    return float(s[min(max(math.ceil(p / 100.0 * len(s)), 1), len(s)) - 1])


def test_boxplot_matches_nearest_rank_reference():
    rng = np.random.default_rng(7)
    v = rng.integers(0, 1000, size=473).astype(np.float64)
    parts = [np.sort(p) for p in np.array_split(v, 5)]
    got = boxplot_exact(parts)
    assert got["count"] == 473
    assert got["min"] == v.min() and got["max"] == v.max()
    for key, p in (("q1", 25.0), ("q2", 50.0), ("q3", 75.0)):
        assert got[key] == _rank(v, p), key


def test_boxplot_empty_and_singleton():
    assert boxplot_exact([]) == {
        "min": None, "max": None, "q1": None, "q2": None, "q3": None,
        "count": 0,
    }
    got = boxplot_exact([np.array([42.0])])
    assert got == {"min": 42.0, "max": 42.0, "q1": 42.0, "q2": 42.0,
                   "q3": 42.0, "count": 1}


def test_mad_matches_reference():
    rng = np.random.default_rng(11)
    v = rng.integers(-50, 200, size=311).astype(np.float64)
    parts = [np.sort(p) for p in np.array_split(v, 4)]
    m = _rank(v, 50.0)
    want = _rank(np.abs(v - m), 50.0)
    assert mad_exact(parts) == want
    assert mad_exact([]) is None
    assert mad_exact([np.array([5.0])]) == 0.0


def test_string_stats_brute_parity_unicode():
    vals = np.array(["héllo", "wörld", "héllo", "ab", None], dtype=object)
    parts = [string_stats_partial(vals[:2]), string_stats_partial(vals[2:])]
    n, sum_len, mn, mx, chars = merge_string_stats(parts)
    strs = [s for s in vals if s is not None]
    assert n == 4 and sum_len == sum(len(s) for s in strs)
    assert mn == 2 and mx == 5
    # codepoint histogram == brute-force Counter over characters
    from collections import Counter

    want = Counter("".join(strs))
    assert chars == {ord(c): k for c, k in want.items()}
    out = string_stats_render(parts)
    total = sum(want.values())
    ent = -sum(
        (c / total) * math.log2(c / total)
        for _, c in sorted((ord(ch), c) for ch, c in want.items())
    )
    assert out["entropy"] == round(ent, 6)
    assert out["avg_length"] == sum_len / 4


def test_string_stats_empty():
    out = string_stats_render([string_stats_partial(np.array([], dtype=object))])
    assert out == {"count": 0, "min_length": None, "max_length": None,
                   "avg_length": None, "entropy": 0.0}


def test_ttest_welch_and_pooled_reference():
    rng = np.random.default_rng(3)
    a = rng.normal(10.0, 2.0, size=40)
    b = rng.normal(11.0, 3.0, size=55)
    got = ttest_from_moments(_moments(a), _moments(b), "heteroscedastic")
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se1, se2 = va / len(a), vb / len(b)
    t_ref = (a.mean() - b.mean()) / math.sqrt(se1 + se2)
    df_ref = (se1 + se2) ** 2 / (
        se1 ** 2 / (len(a) - 1) + se2 ** 2 / (len(b) - 1)
    )
    assert abs(got["t"] - t_ref) < 1e-4 and abs(got["df"] - df_ref) < 1e-3
    got = ttest_from_moments(_moments(a), _moments(b), "homoscedastic")
    sp2 = ((len(a) - 1) * va + (len(b) - 1) * vb) / (len(a) + len(b) - 2)
    t_ref = (a.mean() - b.mean()) / math.sqrt(
        sp2 * (1 / len(a) + 1 / len(b))
    )
    assert abs(got["t"] - t_ref) < 1e-4
    assert got["df"] == float(len(a) + len(b) - 2)


def test_ttest_paired_and_degenerate():
    d = np.array([1.0, 2.0, 3.0, 2.0])
    got = ttest_from_moments(_moments(d), None, "paired")
    t_ref = d.mean() / math.sqrt(d.var(ddof=1) / len(d))
    assert abs(got["t"] - t_ref) < 1e-4 and got["df"] == 3.0
    # n < 2 → undefined
    assert ttest_from_moments(_moments(np.array([1.0])), None, "paired") == {
        "t": None, "df": None,
    }
    # zero variance → undefined t, df still reported
    z = np.array([5.0, 5.0, 5.0])
    assert ttest_from_moments(_moments(z), None, "paired")["t"] is None


def test_matrix_stats_numpy_parity():
    rng = np.random.default_rng(9)
    a = rng.normal(0, 5, size=120)
    b = 0.6 * a + rng.normal(0, 2, size=120)
    cols = [a, b]
    parts = [
        matrix_stats_partial([a[:50], b[:50]]),
        matrix_stats_partial([a[50:], b[50:]]),
    ]
    rows = matrix_stats_render(parts, ["a", "b"], round_decimals=6)
    want_cov = np.cov(np.vstack(cols))  # ddof=1
    want_corr = np.corrcoef(np.vstack(cols))
    by_pair = {(r["field_a"], r["field_b"]): r for r in rows}
    assert by_pair[("a", "b")]["count"] == 120
    assert abs(by_pair[("a", "b")]["covariance"] - want_cov[0, 1]) < 1e-5
    assert abs(by_pair[("a", "b")]["correlation"] - want_corr[0, 1]) < 1e-5
    assert abs(by_pair[("a", "a")]["covariance"] - want_cov[0, 0]) < 1e-5
    assert by_pair[("a", "a")]["correlation"] == 1.0


def test_matrix_stats_skips_rows_missing_any_field():
    a = np.array([1.0, np.nan, 3.0])
    b = np.array([2.0, 5.0, np.nan])
    n, sums, cross = matrix_stats_partial([a, b])
    assert n == 1 and sums.tolist() == [1.0, 2.0]
    assert matrix_stats_render([(n, sums, cross)], ["a", "b"]) == []  # n<2


def test_merge_top_metrics_exact_subset_property():
    # global top-k over per-shard top-k partials == top-k over the union
    rng = np.random.default_rng(5)
    rows = [
        (float(rng.integers(0, 50)), int(i), (i * 2,)) for i in range(60)
    ]
    shards = [rows[:20], rows[20:45], rows[45:]]
    parts = [
        sorted(s, key=lambda r: (-r[0], r[1]))[:5] for s in shards
    ]
    got = merge_top_metrics(parts, 5, desc=True)
    want = sorted(rows, key=lambda r: (-r[0], r[1]))[:5]
    assert got == want
    got_asc = merge_top_metrics(
        [sorted(s, key=lambda r: (r[0], r[1]))[:5] for s in shards], 5,
        desc=False,
    )
    assert got_asc == sorted(rows, key=lambda r: (r[0], r[1]))[:5]


def _brute_ckmeans(v, w, k):
    """Exhaustive optimal contiguous partition into k clusters (small m)."""
    import itertools

    m = len(v)
    k = min(k, m)
    best, best_cost = None, float("inf")
    for cuts in itertools.combinations(range(1, m), k - 1):
        bounds = [0, *cuts, m]
        cost = 0.0
        for a, b in zip(bounds[:-1], bounds[1:]):
            ww = sum(w[a:b])
            mu = sum(wi * vi for vi, wi in zip(v[a:b], w[a:b])) / ww
            cost += sum(wi * (vi - mu) ** 2
                        for vi, wi in zip(v[a:b], w[a:b]))
        if cost < best_cost - 1e-12:
            best_cost, best = cost, bounds
    return best, best_cost


def test_variable_width_histogram_optimal_vs_brute():
    from elasticsearch_assets_ray.search.statagg import (
        variable_width_buckets,
    )

    rng = np.random.default_rng(5)
    raw = np.concatenate([
        rng.normal(0, 1, 40), rng.normal(10, 1, 30), rng.normal(25, 2, 30)
    ]).round(0)  # round → repeated values exercise the weights
    for k in (2, 3, 4):
        got = variable_width_buckets([raw], k)
        uv, w = np.unique(raw, return_counts=True)
        bounds, cost = _brute_ckmeans(uv.tolist(), w.tolist(), k)
        assert len(got) == min(k, len(uv))
        got_cost = 0.0
        for b in got:
            seg = raw[(raw >= b["min"]) & (raw <= b["max"])]
            got_cost += float(((seg - seg.mean()) ** 2).sum())
        assert got_cost == pytest.approx(cost, abs=1e-6)
        assert sum(b["doc_count"] for b in got) == len(raw)
        assert all(g1["max"] < g2["min"] for g1, g2 in zip(got, got[1:]))


def test_variable_width_histogram_edges():
    from elasticsearch_assets_ray.search.statagg import (
        variable_width_buckets,
    )

    assert variable_width_buckets([], 5) == []
    one = variable_width_buckets([np.array([3.0, 3.0])], 4)
    assert one == [{"key": 3.0, "min": 3.0, "max": 3.0, "doc_count": 2}]
