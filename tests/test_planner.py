"""Planner unit tests — scripted count providers replacing the reference's
MockClient sequences (FIXTURES.md F5; behavioral parity with
test/elasticsearch_reader-spec.js and test/id_slicer-spec.js scenarios)."""

import numpy as np
import pytest

from elasticsearch_assets_ray.planner.date_slicer import (
    DateSlicer,
    ExactCountProvider,
    ParquetStatsCountProvider,
    auto_interval,
    divide_range,
)
from elasticsearch_assets_ray.planner.id_slicer import (
    IdSlicer,
    divide_key_array,
    prefix_count_fn_from_keys,
    validate_slicer_count,
)


def test_auto_interval_and_divide_range():
    # 10_000 docs / size 1000 over [0, 10000) → 10 slices of 1000
    assert auto_interval(10_000, 1000, 0, 10_000) == 1000
    parts = divide_range(0, 100, 3)
    assert parts[0][0] == 0 and parts[-1][1] == 100
    assert sum(b - a for a, b in parts) == 100


def test_uniform_slicing_counts_bounded():
    ts = np.arange(10_000)  # one doc per ms
    cp = ExactCountProvider(ts)
    s = DateSlicer(cp, *cp.bounds, size=500)
    slices = list(s.slices())
    assert all(sl.count <= 500 for sl in slices)
    assert sum(sl.count for sl in slices) == 10_000
    assert slices[0].start == 0 and slices[-1].end == 10_000
    # contiguous, no overlap
    for a, b in zip(slices, slices[1:]):
        assert a.end == b.start


def test_recursive_halving_on_burst():
    # dense burst: 5000 docs in [100, 160); sparse elsewhere
    ts = np.concatenate([np.linspace(100, 160, 5000), np.arange(1000, 10_000, 100)])
    cp = ExactCountProvider(ts.astype(np.int64))
    s = DateSlicer(cp, *cp.bounds, size=200)
    slices = list(s.slices())
    assert sum(sl.count for sl in slices) == len(ts)
    assert s.metrics.recursions > 0
    # only floor-width (1-unit) slices may exceed size (slicer.js:212-214)
    for sl in slices:
        if sl.count > 200:
            assert sl.end - sl.start == 1


def test_range_expansion_over_gap():
    ts = np.concatenate([np.arange(0, 100), np.arange(5000, 5100)])
    cp = ExactCountProvider(ts)
    s = DateSlicer(cp, *cp.bounds, size=50, interval=50)
    slices = list(s.slices())
    assert sum(sl.count for sl in slices) == 200
    assert s.metrics.expansions > 0
    assert all(sl.count > 0 for sl in slices)  # empty slices coalesced away


def test_trailing_empty_range_terminates():
    ts = np.arange(0, 100)
    cp = ExactCountProvider(ts)
    s = DateSlicer(cp, 0, 10_000, size=50, interval=50)
    slices = list(s.slices())
    assert sum(sl.count for sl in slices) == 100
    assert slices[-1].count > 0


def test_subslice_by_key_threshold():
    # all 1000 docs at ONE timestamp → unsplittable hot window → key fan-out
    ts = np.full(1000, 42)
    cp = ExactCountProvider(ts)
    keys = [f"{i % 16:x}{i:03d}" for i in range(1000)]
    kc = prefix_count_fn_from_keys(keys)

    def sub(start, end):
        return [(s.key, s.count) for s in IdSlicer(kc, 100, "hexadecimal").slices()]

    s = DateSlicer(
        cp, 0, 100, size=100, subslice_key_threshold=500, subslice_key_fn=sub
    )
    slices = list(s.slices())
    hot = [sl for sl in slices if sl.key is not None]
    assert len(hot) == 16  # one per hex first char (reader-spec:649-693)
    assert sum(sl.count for sl in hot) == 1000
    assert s.metrics.subslices == 16


def test_date_resume():
    ts = np.arange(1000)
    cp = ExactCountProvider(ts)
    s = DateSlicer(cp, *cp.bounds, size=100)
    full = list(s.slices())
    resumed = list(s.slices(resume_after=full[2].end))
    assert resumed == full[3:]


def test_id_descent_and_prune():
    # F5 descent case: a:100, b:500 → b splits; all other prefixes pruned
    keys = [f"a{i:02d}" for i in range(100)]
    keys += [f"b{'012'[i % 3]}x{i:03d}" for i in range(500)]
    s = IdSlicer(prefix_count_fn_from_keys(keys), 200, "hexadecimal")
    got = [(k.key, k.count) for k in s.slices()]
    assert got == [("a", 100), ("b0", 167), ("b1", 167), ("b2", 166)]


def test_id_resume_after_key():
    keys = [f"{c}{i:02d}" for c in "abcdef" for i in range(10)]
    s = IdSlicer(prefix_count_fn_from_keys(keys), 50, "base64url")
    full = [k.key for k in s.slices()]
    assert full == list("abcdef")
    assert [k.key for k in s.slices(resume_after="c")] == list("def")


def test_starting_key_depth():
    keys = ["a00x", "a01y", "a01z"]
    s = IdSlicer(
        prefix_count_fn_from_keys(keys), 50, "hexadecimal", key_range=["a"],
        starting_key_depth=3,
    )
    assert [(k.key, k.count) for k in s.slices()] == [("a00", 1), ("a01", 2)]


def test_id_split_covers_ids_equal_to_prefix():
    """Ids exactly equal to a split prefix get a residual EXACT slice —
    variable-length id spaces must not lose rows on descent."""
    keys = ["b"] + [f"b{'0123'[i % 4]}x{i:03d}" for i in range(208)]
    s = IdSlicer(prefix_count_fn_from_keys(keys), 200, "hexadecimal")
    slices = list(s.slices())
    assert sum(sl.count for sl in slices) == len(keys)
    exact = [sl for sl in slices if sl.exact]
    assert [(sl.key, sl.count) for sl in exact] == [("b", 1)]
    # short ids below starting_key_depth are covered the same way
    s2 = IdSlicer(prefix_count_fn_from_keys(["a", "a0x", "a0y", "a1z"]),
                  50, "hexadecimal", key_range=["a"], starting_key_depth=2)
    got = list(s2.slices())
    assert sum(sl.count for sl in got) == 4
    assert any(sl.exact and sl.key == "a" for sl in got)


def test_id_resume_validates_alphabet_and_prunes_probes():
    keys = [f"{c}{i:02d}" for c in "abcdef" for i in range(10)]
    probes = []
    base = prefix_count_fn_from_keys(keys)

    def counting(prefix):
        probes.append(prefix)
        return base(prefix)

    s = IdSlicer(counting, 50, "base64url")
    list(s.slices())
    full_probes = len(probes)
    probes.clear()
    resumed = [k.key for k in s.slices(resume_after="c")]
    assert resumed == list("def")
    # completed subtrees are pruned WITHOUT re-paying their count probes
    assert len(probes) < full_probes
    assert not any(p.startswith("a") or p.startswith("b") for p in probes)
    # a checkpoint char outside the alphabet is a clear error, not KeyError
    s3 = IdSlicer(base, 50, "hexadecimal")
    with pytest.raises(ValueError):
        list(s3.slices(resume_after="A1"))  # uppercase ∉ lowercase hex
    # uppercase-hex key spaces are supported via their own key_type
    s4 = IdSlicer(prefix_count_fn_from_keys(["A1", "B2"]), 50, "hexadecimal_upper")
    assert sorted(k.key for k in s4.slices()) == ["A", "B"]


def test_caps_and_key_range_validation():
    validate_slicer_count("hexadecimal", 16)
    with pytest.raises(ValueError):
        validate_slicer_count("hexadecimal", 17)  # id_reader/index.js:115-125
    with pytest.raises(ValueError):
        validate_slicer_count("base64url", 65)
    with pytest.raises(ValueError):
        IdSlicer(lambda p: 0, 10, "hexadecimal", key_range=["z"])


def test_divide_key_array_round_robin():
    groups = divide_key_array(list("abcdef"), 2)
    assert groups == [["a", "c", "e"], ["b", "d", "f"]]


def test_parquet_stats_provider(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = np.arange(0, 10_000, dtype=np.int64)
    pq.write_table(pa.table({"ts": ts}), tmp_path / "t.parquet", row_group_size=1000)
    cp = ParquetStatsCountProvider([str(tmp_path / "t.parquet")], "ts")
    assert cp.total == 10_000
    assert cp.bounds == (0, 10_000)
    assert abs(cp(0, 5000) - 5000) <= 10  # uniform density estimate
    s = DateSlicer(cp, *cp.bounds, size=1000)
    assert all(sl.count <= 1100 for sl in s.slices())


def test_scan_count_provider_matches_exact(tmp_path):
    """ScanCountProvider (pushdown count probes) slices identically to
    the in-memory exact provider, for int and timestamp[us] columns."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_assets_ray.planner.date_slicer import ScanCountProvider

    rng = np.random.default_rng(3)
    ms = np.sort(rng.integers(1_700_000_000_000, 1_700_000_900_000, 5000))
    pq.write_table(
        pa.table({"ts": pa.array(ms * 1000, pa.timestamp("us"))}),
        tmp_path / "tsus.parquet", row_group_size=500,
    )
    scan = ScanCountProvider([str(tmp_path / "tsus.parquet")], "ts")
    exact = ExactCountProvider(ms)
    assert scan.total == exact.total
    assert scan.bounds == exact.bounds
    for a, b in [(ms[0], ms[-1]), (ms[100], ms[900]), (0, ms[0])]:
        assert scan(int(a), int(b)) == exact(int(a), int(b))
    s1 = list(DateSlicer(scan, *scan.bounds, size=400).slices())
    s2 = list(DateSlicer(exact, *exact.bounds, size=400).slices())
    assert [(r.start, r.end, r.count) for r in s1] == [
        (r.start, r.end, r.count) for r in s2
    ]
    # SECONDS-unit storage: ms bounds must not floor-shift into the
    # coarser unit (regression: int(ms*0.001) dropped boundary rows)
    secs = np.array([1000, 1001, 1002], dtype=np.int64)
    pq.write_table(
        pa.table({"ts": pa.array(secs * 1_000_000, pa.timestamp("us")).cast(pa.timestamp("s"))}),
        tmp_path / "tss.parquet",
    )
    scan_s = ScanCountProvider([str(tmp_path / "tss.parquet")], "ts")
    assert scan_s(1_000_000, 1_000_500) == 1   # row at exactly 1000s
    assert scan_s(1_000_500, 1_001_500) == 1   # only the 1001s row
    assert scan_s(1_000_001, 1_001_000) == 0   # between rows
