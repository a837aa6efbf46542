"""Cluster-aware train/test split (ops/split.py): atomic cluster
assignment, zero leakage by construction, deterministic hash rates."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from elasticsearch_assets_ray.ops.sampling import knuth_hash_u32
from elasticsearch_assets_ray.ops.split import cluster_split, split_leakage


@pytest.fixture(scope="module")
def fixture():
    # 1000 docs; pair graph: chains/triangles spanning hash boundaries
    rng = np.random.RandomState(3)
    n = 1000
    edges = []
    for base in range(0, 300, 3):  # 100 triangles
        edges += [(base, base + 1), (base + 1, base + 2)]
    for base in range(400, 480, 4):  # 20 chains of 4
        edges += [(base, base + 1), (base + 1, base + 2),
                  (base + 2, base + 3)]
    extra = rng.randint(500, 1000, (40, 2))
    edges += [(min(a, b), max(a, b)) for a, b in extra if a != b]
    pairs = pa.table({
        "doc_a": pa.array([a for a, _ in edges], pa.int64()),
        "doc_b": pa.array([b for _, b in edges], pa.int64()),
    })
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
    }))
    return docs, pairs, edges, n


def test_clusters_assign_atomically(fixture):
    docs, pairs, edges, n = fixture
    out = cluster_split(docs, rd.from_arrow(pairs), 0.3).to_pandas()
    assert len(out) == n and sorted(out["doc_id"]) == list(range(n))
    key = dict(zip(out["doc_id"], out["split_key"]))
    split = dict(zip(out["doc_id"], out["split"]))
    # every edge's endpoints share key and side
    for a, b in edges:
        assert key[a] == key[b], (a, b)
        assert split[a] == split[b], (a, b)
    # unpaired docs are their own key
    paired = {x for e in edges for x in e}
    for d in range(n):
        if d not in paired:
            assert key[d] == d
    # assignment is exactly the hash rule on the key
    thresh = int(0.3 * float(1 << 32))
    for d in range(n):
        want = "test" if knuth_hash_u32(
            np.array([key[d]], np.int64))[0] < thresh else "train"
        assert split[d] == want, d
    # non-degenerate at rate 0.3
    n_test = sum(1 for s in split.values() if s == "test")
    assert 0.15 * n < n_test < 0.45 * n


def test_leakage_zero_and_counts(fixture):
    docs, pairs, edges, n = fixture
    assign = cluster_split(docs, rd.from_arrow(pairs), 0.3)
    t = split_leakage(assign, pairs)
    row = t.to_pylist()[0]
    assert row["cross_pairs"] == 0
    assert row["n_train"] + row["n_test"] == n


def test_naive_split_would_leak(fixture):
    """The op exists for a reason: hashing doc_id directly (ignoring
    clusters) DOES produce cross-split near-dup pairs on this graph."""
    docs, pairs, edges, n = fixture
    thresh = int(0.3 * float(1 << 32))
    ids = np.arange(n, dtype=np.int64)
    naive_test = knuth_hash_u32(ids) < thresh
    crossing = sum(1 for a, b in edges if naive_test[a] != naive_test[b])
    assert crossing > 0


def test_empty_pair_graph(fixture):
    docs, _, _, n = fixture
    empty = rd.from_arrow(pa.table({
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
    }))
    out = cluster_split(docs, empty, 0.3).to_pandas()
    assert (out["split_key"] == out["doc_id"]).all()
