"""Deterministic sampling ops: nesting, partition-invariance, strata."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from elasticsearch_assets_ray.ops import to_arrow
from elasticsearch_assets_ray.ops.sampling import (
    hash_sample,
    stratified_sample,
)


def _tbl(n=2000):
    ids = np.arange(n, dtype=np.int64)
    return pa.table({
        "doc_id": pa.array(ids),
        "lang": pa.array([f"l{int(i) % 5}" for i in ids]),
    })


def test_hash_sample_rate_nesting_and_partition_invariance(ray_session):
    t = _tbl()
    a = set(to_arrow(hash_sample(rd.from_arrow(t), 0.1))
            .column("doc_id").to_pylist())
    b = set(to_arrow(hash_sample(rd.from_arrow(t), 0.3))
            .column("doc_id").to_pylist())
    # rough rate (multiplicative hash over sequential ids is uniform-ish)
    assert 0.05 < len(a) / 2000 < 0.15
    assert 0.2 < len(b) / 2000 < 0.4
    assert a <= b  # nesting: smaller rate ⊂ larger rate
    # partitioning must not change the sample
    c = set(
        to_arrow(hash_sample(rd.from_arrow(t).repartition(7), 0.1))
        .column("doc_id").to_pylist()
    )
    assert c == a


def test_stratified_sample_exact_heads(ray_session):
    t = _tbl(500)
    out = to_arrow(stratified_sample(rd.from_arrow(t), "lang", 10))
    by_lang: dict[str, list[int]] = {}
    for r in out.to_pylist():
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert set(by_lang) == {f"l{i}" for i in range(5)}
    ids = np.arange(500, dtype=np.int64)
    h = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    for lang, got in by_lang.items():
        members = [i for i in range(500) if f"l{i % 5}" == lang]
        want = sorted(members, key=lambda i: (h[i], i))[:10]
        assert sorted(got) == sorted(want), lang
        assert len(got) == 10


def test_mixture_rates_temperature_math():
    from elasticsearch_assets_ray.ops.sampling import mixture_rates

    w = {"a": 4.0, "b": 1.0}
    r1 = mixture_rates(w, temperature=1.0)
    assert r1 == {"a": 1.0, "b": 0.25}
    r2 = mixture_rates(w, temperature=2.0)  # sqrt flattening
    assert r2["a"] == 1.0 and abs(r2["b"] - 0.5) < 1e-12
    # T -> inf flattens to uniform
    rf = mixture_rates(w, temperature=1e9)
    assert abs(rf["b"] - 1.0) < 1e-6
    import pytest as _pt

    with _pt.raises(ValueError):
        mixture_rates(w, temperature=0)


def test_mixture_sample_deterministic_and_nested(ray_session):
    import pyarrow as pa
    import ray
    import ray.data as rd

    from elasticsearch_assets_ray.ops.sampling import (
        mixture_sample,
        mixture_thresholds,
    )

    n = 4000
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "source": pa.array([f"s{i % 3}" for i in range(n)]),
    })

    def ids_of(thresh):
        ds = mixture_sample(rd.from_arrow(t), thresh)
        parts = [p for p in ray.get(ds.to_arrow_refs()) if p.num_rows]
        out = pa.concat_tables(parts) if parts else None
        return set(out.column("doc_id").to_pylist()) if out else set()

    lo = ids_of(mixture_thresholds({"s0": 1.0, "s1": 0.25, "s2": 0.0}))
    hi = ids_of(mixture_thresholds({"s0": 1.0, "s1": 0.5, "s2": 0.0}))
    assert lo < hi                       # per-source nesting
    assert ids_of(mixture_thresholds({"s0": 1.0, "s1": 0.25, "s2": 0.0})) == lo  # deterministic
    assert not any(i % 3 == 2 for i in hi)  # rate-0 source fully dropped
    s0 = {i for i in hi if i % 3 == 0}
    assert len(s0) == (n + 2) // 3       # rate-1 source fully kept


def test_token_budget_plan_math(ray_session):
    """Integer plan semantics: target = budget*w//1e6; epochs_e6 > 1e6
    flags upsampling; rate caps at 1e6; counts exact."""
    import pyarrow as pa
    import ray.data as rd

    from elasticsearch_assets_ray.ops.sampling import token_budget_plan
    from elasticsearch_assets_ray.ops.textstats import clipped_tokens

    docs = [
        (0, "a b c d e", "big"), (1, "f g h i j", "big"),
        (2, "k l m n o p q r s t", "big"),
        (3, "one two", "small"),
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _, _ in docs], pa.int64()),
        "text": pa.array([t for _, t, _ in docs], pa.string()),
        "source": pa.array([s for _, _, s in docs], pa.string()),
    }))
    # supplies: big=20 tokens, small=2
    plan = token_budget_plan(
        ds, {"big": 250_000, "small": 750_000}, budget_tokens=40
    ).to_pylist()
    by = {r["source"]: r for r in plan}
    assert by["big"]["n_tokens"] == 20 and by["big"]["n_docs"] == 3
    assert by["small"]["n_tokens"] == 2 and by["small"]["n_docs"] == 1
    # big: target 40*250000//1e6 = 10 of 20 -> rate 0.5e6, no upsampling
    assert by["big"]["target_tokens"] == 10
    assert by["big"]["epochs_e6"] == 500_000
    assert by["big"]["sample_rate_e6"] == 500_000
    # small: target 30 of 2 -> 15 epochs (upsampling), rate capped
    assert by["small"]["target_tokens"] == 30
    assert by["small"]["epochs_e6"] == 15_000_000
    assert by["small"]["sample_rate_e6"] == 1_000_000


def test_shuffle_order_is_deterministic_permutation(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from elasticsearch_assets_ray.ops.sampling import shuffle_order

    ids = np.arange(300, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids)}))

    def order(seed):
        out = shuffle_order(
            rd.from_arrow(pa.table({"doc_id": pa.array(ids)})), seed=seed)
        t = pa.concat_tables([ray.get(r) for r in out.to_arrow_refs()])
        return t.column("doc_id").to_numpy()

    a, b = order(0), order(0)
    assert np.array_equal(a, b)                    # reproducible
    assert np.array_equal(np.sort(a), ids)         # a permutation
    assert not np.array_equal(a, ids)              # actually shuffled
    c = order(1)
    assert np.array_equal(np.sort(c), ids)
    assert not np.array_equal(c, a)                # seeds independent


def test_shuffle_order_write_resumable(ray_session, tmp_path):
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from elasticsearch_assets_ray.ops.sampling import (
        shuffle_order,
        shuffle_order_write,
        shuffled_files,
    )

    ids = np.arange(1000, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids),
                  "v": pa.array(ids * 3)})
    out = str(tmp_path / "shuf")
    shuffle_order_write(rd.from_arrow(t), out, n_ranges=8, seed=3)
    files = shuffled_files(out)
    assert len(files) >= 4  # some ranges may be empty at n=1000
    got = pa.concat_tables([pq.read_table(f) for f in files])
    # reading ranges in order IS the epoch order: ≡ the global sort
    import ray as _ray

    want = pa.concat_tables([
        _ray.get(r) for r in shuffle_order(
            rd.from_arrow(t), seed=3).to_arrow_refs()
    ])
    assert got.column("doc_id").to_pylist() == \
        want.column("doc_id").to_pylist()
    assert got.column("v").to_pylist() == want.column("v").to_pylist()
    # resume: nuke one range's commit, rerun — only it is rewritten
    victim = os.path.dirname(files[2])
    keeper = os.path.dirname(files[1])
    os.remove(os.path.join(victim, "_done"))
    os.remove(os.path.join(victim, "part.parquet"))
    mtime_before = os.path.getmtime(os.path.join(keeper, "part.parquet"))
    shuffle_order_write(rd.from_arrow(t), out, n_ranges=8, seed=3)
    assert os.path.exists(os.path.join(victim, "part.parquet"))
    assert os.path.getmtime(
        os.path.join(keeper, "part.parquet")) == mtime_before
    got2 = pa.concat_tables([pq.read_table(f) for f in shuffled_files(out)])
    assert got2.column("doc_id").to_pylist() == \
        got.column("doc_id").to_pylist()
    import pytest as _pt

    with _pt.raises(ValueError):
        shuffle_order_write(rd.from_arrow(t), out, n_ranges=6)
    # run-manifest guard (round 5): reusing the out_dir with a
    # different seed / range count / key column refuses instead of
    # mixing stale committed ranges into a fresh epoch order
    with _pt.raises(ValueError, match="resume mismatch"):
        shuffle_order_write(rd.from_arrow(t), out, n_ranges=8, seed=4)
    with _pt.raises(ValueError, match="resume mismatch"):
        shuffle_order_write(rd.from_arrow(t), out, n_ranges=16, seed=3)
