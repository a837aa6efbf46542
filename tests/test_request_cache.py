"""RequestCache proxy: hit/miss behavior, refresh invalidation,
mutation safety, LRU bound, and passthrough."""

import pytest

from elasticsearch_assets_ray.search.request_cache import (
    CACHED_METHODS,
    RequestCache,
)


class FakeEngine:
    def __init__(self):
        self.calls = 0
        self.refreshes = 0

    def search(self, q, k=10):
        self.calls += 1
        return [(1, 2.0), (2, 1.0)][:k]

    def aggregate(self, q, field):
        self.calls += 1
        return {"buckets": [("a", 1)]}

    def refresh(self):
        self.refreshes += 1
        return "appended"

    def shutdown(self):
        return "bye"


def test_hit_miss_and_refresh_invalidation():
    eng = FakeEngine()
    c = RequestCache(eng)
    a = c.search("x", k=2)
    b = c.search("x", k=2)
    assert a == b and eng.calls == 1
    assert (c.hits, c.misses) == (1, 1)
    assert c.search("x", k=1) != a and eng.calls == 2  # different key
    assert c.refresh() == "appended" and eng.refreshes == 1
    assert len(c) == 0
    c.search("x", k=2)
    assert eng.calls == 3  # refresh dropped the entry


def test_mutation_does_not_poison():
    eng = FakeEngine()
    c = RequestCache(eng)
    r = c.search("x")
    r.append(("junk", 0.0))
    assert c.search("x") == [(1, 2.0), (2, 1.0)]
    assert eng.calls == 1


def test_lru_bound_and_passthrough():
    eng = FakeEngine()
    c = RequestCache(eng, max_entries=2)
    c.search("a"), c.search("b"), c.search("c")
    assert len(c) == 2
    c.search("a")  # evicted → re-call
    assert eng.calls == 4
    assert c.shutdown() == "bye"  # non-whitelisted passthrough
    assert "shutdown" not in CACHED_METHODS
    with pytest.raises(ValueError):
        RequestCache(eng, max_entries=0)


def test_against_real_engine(small_index, ray_session):
    from elasticsearch_assets_ray.search.engine import QueryEngine

    eng = QueryEngine(small_index.index_dir, num_actors=2)
    try:
        c = RequestCache(eng)
        a = c.search("merge data", k=10)
        b = c.search("merge data", k=10)
        assert a == b == eng.search("merge data", k=10)
        assert c.hits == 1 and c.misses == 1
        assert c.invalidate() == 1
    finally:
        eng.shutdown()
