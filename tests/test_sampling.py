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
