"""ES pipeline-aggregation semantics (search/pipeline_agg.py): pure
coordinating-node transforms over parent bucket rows — the gap/omission
contracts the coalesced oracle pipelines can't see."""

from elasticsearch_assets_ray.search import pipeline_agg as pl

B = [
    {"key": 0, "doc_count": 4, "sum": 10.0},
    {"key": 1, "doc_count": 0, "sum": None},  # zero-filled gap bucket
    {"key": 2, "doc_count": 6, "sum": 4.0},
    {"key": 3, "doc_count": 2, "sum": 4.0},
]


def test_derivative_doc_count_first_bucket_omitted():
    out = pl.derivative(B, path="_count")
    assert [r["derivative"] for r in out] == [None, -4.0, 6.0, -4.0]
    assert B[0].get("derivative") is None  # input not mutated


def test_derivative_gap_skip_vs_insert_zeros():
    # skip: the gapped bucket carries no value and is skipped as the
    # "previous" — bucket 2 differences against bucket 0
    out = pl.derivative(B, path="sum", gap_policy="skip")
    assert [r["derivative"] for r in out] == [None, None, -6.0, 0.0]
    out = pl.derivative(B, path="sum", gap_policy="insert_zeros")
    assert [r["derivative"] for r in out] == [None, -10.0, 4.0, 0.0]


def test_serial_diff_lag2():
    out = pl.serial_diff(B, path="_count", lag=2)
    assert [r["serial_diff"] for r in out] == [None, None, 2.0, 2.0]


def test_cumulative_sum_carries_through_gaps():
    out = pl.cumulative_sum(B, path="sum", out="cum")
    assert [r["cum"] for r in out] == [10.0, 10.0, 14.0, 18.0]


def test_sibling_buckets_and_tie_keys():
    assert pl.sum_bucket(B, path="sum") == {"value": 18.0}
    assert pl.avg_bucket(B, path="sum") == {"value": 6.0}  # 3 non-gapped
    mx = pl.max_bucket(B, path="sum")
    assert mx == {"value": 10.0, "keys": [0]}
    mn = pl.min_bucket(B, path="sum")
    assert mn["value"] == 4.0 and mn["keys"] == [2, 3]  # ES ties → all keys
    st = pl.stats_bucket(B, path="sum")
    assert st == {"count": 3, "min": 4.0, "max": 10.0, "sum": 18.0, "avg": 6.0}


def test_sibling_all_gapped():
    empty = [{"key": 0, "doc_count": 0, "sum": None}]
    assert pl.avg_bucket(empty, path="sum")["value"] is None
    assert pl.max_bucket(empty, path="sum") == {"value": None, "keys": []}
    assert pl.stats_bucket(empty, path="sum")["count"] == 0


def test_bucket_script_gap_omits_value():
    out = pl.bucket_script(
        B, {"s": "sum", "n": "_count"}, lambda s, n: s / n, out="ratio"
    )
    assert [r["ratio"] for r in out] == [2.5, None, 4.0 / 6.0, 2.0]


def test_bucket_selector_drops_gapped_and_false():
    out = pl.bucket_selector(B, {"s": "sum"}, lambda s: s > 4.0)
    assert [r["key"] for r in out] == [0]  # gap dropped, 4.0s fail s>4


def test_moving_fn_trailing_window_and_shift():
    out = pl.moving_fn(B, path="_count", window=2, fn="mean", out="m")
    # frame for i is values[i-2 : i) — strictly previous
    assert [r["m"] for r in out] == [None, 4.0, 2.0, 3.0]
    out = pl.moving_fn(B, path="_count", window=2, fn="max", shift=1, out="m")
    # shift=1 includes the current bucket: values[i-1 : i+1)
    assert [r["m"] for r in out] == [4.0, 4.0, 6.0, 6.0]


def test_moving_fn_gap_excluded_from_frame():
    out = pl.moving_fn(B, path="sum", window=3, fn="sum", out="m")
    assert [r["m"] for r in out] == [None, 10.0, 10.0, 14.0]


def test_bucket_sort_multi_key_truncation_and_gap_drop():
    out = pl.bucket_sort(B, sort=[("sum", "desc"), ("_count", "asc")])
    # the gapped bucket (sum None) is DROPPED under skip; ties on sum
    # break by doc_count asc
    assert [r["key"] for r in out] == [0, 3, 2]
    # single-key sort is stable: the sum=4 tie keeps parent order (2, 3)
    out = pl.bucket_sort(B, sort=[("sum", "desc")], frm=1, size=1)
    assert [r["key"] for r in out] == [2]
    # no sort → pure from/size truncation in incoming order
    assert [r["key"] for r in pl.bucket_sort(B, size=2)] == [0, 1]


def test_normalize_methods():
    out = pl.normalize(B, path="_count", method="proportion_of_sum")
    assert [r["normalized"] for r in out] == [
        4 / 12, 0.0, 6 / 12, 2 / 12]
    out = pl.normalize(B, path="sum", method="percent_of_sum")
    got = [r["normalized"] for r in out]
    assert got[1] is None  # gap stays a gap
    assert got[0] == 100.0 * 10.0 / 18.0
    out = pl.normalize(B, path="_count", method="rescale_0_1")
    assert [r["normalized"] for r in out] == [4 / 6, 0.0, 1.0, 2 / 6]
    out = pl.normalize(B, path="_count", method="z-score")
    m = 3.0
    sd = (sum((v - m) ** 2 for v in (4, 0, 6, 2)) / 4) ** 0.5
    assert out[2]["normalized"] == (6 - m) / sd
    import math

    out = pl.normalize(B, path="_count", method="softmax")
    s = sum(math.exp(v) for v in (4, 0, 6, 2))
    assert out[0]["normalized"] == math.exp(4) / s
    # degenerate: all-equal series has no 0-1 rescale
    flat = [{"key": 0, "doc_count": 5}, {"key": 1, "doc_count": 5}]
    assert [r["normalized"] for r in
            pl.normalize(flat, method="rescale_0_1")] == [None, None]


def test_moving_percentiles_exact_nearest_rank():
    out = pl.moving_percentiles(B, path="_count", window=3,
                                percents=(50.0, 100.0))
    # frames (strictly previous, gaps kept — _count never gaps):
    # [], [4], [4,0], [4,0,6]
    assert out[0]["moving_pctl"] is None
    assert out[1]["moving_pctl"] == {50.0: 4.0, 100.0: 4.0}
    assert out[2]["moving_pctl"] == {50.0: 0.0, 100.0: 4.0}
    assert out[3]["moving_pctl"] == {50.0: 4.0, 100.0: 6.0}


def test_rate_calendar_months_and_identity():
    # Jan 2024 (31d, leap year Feb 29d): epoch-µs month starts
    jan = 1_704_067_200_000_000
    feb = 1_706_745_600_000_000
    buckets = [
        {"key": jan, "doc_count": 62, "sum": 31.0},
        {"key": feb, "doc_count": 58, "sum": None},
    ]
    out = pl.rate(buckets, interval="month", unit="day")
    assert out[0]["rate"] == 62 / 31.0
    assert out[1]["rate"] == 58 / 29.0
    out = pl.rate(buckets, interval="month", unit="month")
    assert [r["rate"] for r in out] == [62.0, 58.0]
    out = pl.rate(buckets, interval="month", unit="day", path="sum")
    assert out[0]["rate"] == 1.0 and out[1]["rate"] is None
    import pytest

    with pytest.raises(ValueError):
        pl.rate(buckets, interval="month", unit="year")


def test_cumulative_cardinality_exact_expanding_distinct():
    rows = [
        {"key": 20, "term": "a"}, {"key": 10, "term": "a"},
        {"key": 10, "term": "b"}, {"key": 20, "term": "c"},
        {"key": 30, "term": "a"},
    ]
    out = pl.cumulative_cardinality(rows)
    assert out == [
        {"key": 10, "cardinality": 2, "cumulative_cardinality": 2},
        {"key": 20, "cardinality": 2, "cumulative_cardinality": 3},
        {"key": 30, "cardinality": 1, "cumulative_cardinality": 3},
    ]
    assert pl.cumulative_cardinality([]) == []


def test_moving_fn_extra_builtins_and_factories():
    import math

    vals = [4.0, 0.0, 6.0]
    out = pl.moving_fn(B, path="_count", window=3, fn="stdDev", out="m")
    m = sum(vals) / 3
    assert out[3]["m"] == math.sqrt(sum((v - m) ** 2 for v in vals) / 3)
    out = pl.moving_fn(B, path="_count", window=3,
                       fn="linearWeightedAvg", out="m")
    assert out[3]["m"] == (4 * 1 + 0 * 2 + 6 * 3) / 6
    out = pl.moving_fn(B, path="_count", window=3, fn=pl.ewma(0.5), out="m")
    # acc: 4 -> .5*0+.5*4=2 -> .5*6+.5*2=4
    assert out[3]["m"] == 4.0
    out = pl.moving_fn(B, path="_count", window=3,
                       fn=pl.holt(0.5, 0.5), out="m")
    assert isinstance(out[3]["m"], float)
    assert out[1]["m"] == 4.0  # single-value frame falls back raw
    assert out[0]["m"] is None


def _b(counts):
    return [{"key": i, "doc_count": c} for i, c in enumerate(counts)]


def test_ks_test_hand_computed():
    from elasticsearch_assets_ray.search.pipeline_agg import (
        bucket_count_ks_test,
    )

    # 4 buckets, counts [4,0,0,0], total 4, uniform expected CDF
    # F_emp = [1,1,1,1], F_exp = [.25,.5,.75,1] → D+ = .75, D- = 0
    r = bucket_count_ks_test(_b([4, 0, 0, 0]),
                             alternatives=("two_sided", "less", "greater"))
    assert r["n"] == 4
    assert abs(r["statistics"]["two_sided"] - 0.75) < 1e-12
    assert abs(r["statistics"]["greater"] - 0.75) < 1e-12
    assert r["statistics"]["less"] == 0.0
    # one-sided p = exp(-2 n D²) = exp(-4.5)
    import math

    assert abs(r["p_values"]["greater"] - math.exp(-4.5)) < 1e-12
    assert r["p_values"]["less"] == 1.0
    # perfectly uniform counts → two_sided D = 0, p = 1
    r2 = bucket_count_ks_test(_b([5, 5, 5, 5]))
    assert r2["statistics"]["two_sided"] == 0.0
    assert abs(r2["p_values"]["two_sided"] - 1.0) < 1e-9
    # explicit fractions matching the data exactly
    r3 = bucket_count_ks_test(_b([1, 3]), fractions=[0.25, 0.75])
    assert r3["statistics"]["two_sided"] == 0.0


def test_bucket_correlation_hand_computed():
    from elasticsearch_assets_ray.search.pipeline_agg import (
        bucket_correlation,
    )

    # perfectly linear → r = 1; reversed → -1
    assert abs(bucket_correlation(_b([1, 2, 3, 4]), [0, 1, 2, 3]) - 1.0) < 1e-12
    assert abs(bucket_correlation(_b([4, 3, 2, 1]), [0, 1, 2, 3]) + 1.0) < 1e-12
    # constant side → None (undefined)
    assert bucket_correlation(_b([2, 2, 2]), [0, 1, 2]) is None
    # hand value: x=[1,2,4], y=[0,1,2] → sxy=3, sxx≈4.6667, syy=2
    import math

    r = bucket_correlation(_b([1, 2, 4]), [0, 1, 2])
    sxx = sum((v - 7 / 3) ** 2 for v in [1, 2, 4])
    assert abs(r - 3.0 / math.sqrt(sxx * 2.0)) < 1e-12


def test_change_point_types():
    from elasticsearch_assets_ray.search.pipeline_agg import change_point

    # clean step down
    r = change_point(_b([10, 11, 9, 10, 0, 0, 0, 0]))
    assert r["type"] == "step_change" and r["bucket_key"] == 4
    assert r["score"] > 0.9
    # single spike
    r = change_point(_b([10, 10, 80, 10, 10, 10, 10, 10]))
    assert r["type"] == "spike" and r["bucket_key"] == 2
    # single dip
    r = change_point(_b([10, 10, 10, 0, 10, 10, 10, 10]))
    assert r["type"] == "dip" and r["bucket_key"] == 3
    # flat / alternating noise → stationary (no split or outlier
    # explains ≥ 30% of the variance)
    assert change_point(_b([10, 10, 10, 10]))["type"] == "stationary"
    assert change_point(_b([10, 9] * 8))["type"] == "stationary"
    # too short
    assert change_point(_b([1, 99]))["type"] == "stationary"
