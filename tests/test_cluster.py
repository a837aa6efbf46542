"""Connected-components dedup clustering (ops/cluster.py): hash-to-min
label propagation over bucketed exchanges."""

import numpy as np
import pyarrow as pa
import pytest

from elasticsearch_assets_ray.ops import to_arrow
from elasticsearch_assets_ray.ops.cluster import (
    connected_components,
    dedup_clusters,
)


def _pairs(edges):
    a, b = zip(*edges) if edges else ((), ())
    return pa.table(
        {"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())}
    )


def test_chain_converges_to_min(ray_session):
    # a path graph needs label propagation across multiple rounds —
    # the case a single local pass gets wrong
    out = dedup_clusters(_pairs([(i, i + 1) for i in range(9)]))
    d = dict(zip(out.column("doc_id").to_pylist(),
                 out.column("component_id").to_pylist()))
    assert d == {i: 0 for i in range(10)}
    assert set(out.column("cluster_size").to_pylist()) == {10}
    keep = {r["doc_id"] for r in out.to_pylist() if r["keep"]}
    assert keep == {0}


def test_two_components_and_star(ray_session):
    # star centered at 100 + a disjoint triangle; ids straddle buckets
    edges = [(100, 7), (100, 65), (100, 129)] + [(2, 66), (66, 130), (2, 130)]
    out = dedup_clusters(_pairs(edges))
    d = dict(zip(out.column("doc_id").to_pylist(),
                 out.column("component_id").to_pylist()))
    assert d == {100: 7, 7: 7, 65: 7, 129: 7, 2: 2, 66: 2, 130: 2}
    sizes = {r["doc_id"]: r["cluster_size"] for r in out.to_pylist()}
    assert sizes[7] == 4 and sizes[2] == 3
    assert {r["doc_id"] for r in out.to_pylist() if r["keep"]} == {7, 2}


def test_duplicate_and_reversed_pairs_are_idempotent(ray_session):
    out = dedup_clusters(_pairs([(1, 2), (2, 1), (1, 2), (2, 3)]))
    assert out.num_rows == 3
    assert set(out.column("component_id").to_pylist()) == {1}


def test_labels_dataset_matches_numpy_union_find(ray_session):
    rng = np.random.default_rng(7)
    n = 300
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, (250, 2))
             if a != b]
    lab = to_arrow(connected_components(_pairs(edges)))
    got = dict(zip(lab.column("node").to_pylist(),
                   lab.column("label").to_pylist()))
    # reference union-find
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    comp: dict[int, int] = {}
    for x in set(np.array(edges).ravel().tolist()):
        r = find(x)
        comp.setdefault(r, x)
        comp[r] = min(comp[r], x)
    want = {x: comp[find(x)] for x in set(np.array(edges).ravel().tolist())}
    assert got == want


def test_max_rounds_guard(ray_session):
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs([(i, i + 1) for i in range(20)]),
                             max_rounds=2)


def test_empty_pairs(ray_session):
    out = dedup_clusters(_pairs([]))
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "component_id", "cluster_size",
                                "keep"]
