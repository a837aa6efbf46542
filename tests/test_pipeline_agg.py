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
