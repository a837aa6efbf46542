"""ES shard-request-cache analogue: an OPT-IN coordinator-side result
cache over either serving engine.

ES's request cache memoizes shard-level responses keyed by the whole
serialized request and invalidates on refresh (docs: "the shard-level
request cache ... is invalidated when the shard refreshes").  ES never
caches scored hits by default (only size=0 / aggregation responses);
here the proxy caches whatever whitelisted method you call it with —
so, like ES, it is DEFAULT-OFF and must be constructed explicitly:

    eng = QueryEngine(...)            # no caching anywhere
    ceng = RequestCache(eng)          # explicit opt-in
    ceng.search("hash join", k=10)    # miss → inner call
    ceng.search("hash join", k=10)    # hit  → no inner call
    ceng.refresh()                    # refreshes inner engine, clears

The repo's benchmarks deliberately do NOT use this proxy: bench p50
repeats each query 20×, and a silent cache would fake serving latency.

Design notes:
- key = (method, repr(args), repr(sorted kwargs)) — every whitelisted
  method takes only plain values (str/int/float/list/dict), so repr is
  deterministic within a process.
- values are shallow-copied on the way out (callers mutating a
  returned list must not poison the cache).
- LRU-bounded (``max_entries``); hit/miss counters for observability.
- any non-whitelisted attribute passes through untouched, so the proxy
  is a drop-in engine.
"""

from __future__ import annotations

import copy
from collections import OrderedDict

# read-only query methods safe to memoize on both engines (methods an
# engine lacks simply never get called through the proxy)
CACHED_METHODS = frozenset({
    "search", "search_phrase", "search_bool", "search_prefix",
    "search_wildcard", "search_regexp", "search_fuzzy",
    "search_phrase_prefix", "search_dis_max", "search_boosting",
    "search_constant_score", "search_simple_query_string",
    "search_query_string", "search_highlight", "more_like_this",
    "multi_match", "aggregate", "suggest_term", "suggest_completion",
    "suggest_phrase", "termvectors", "explain", "collapse_search",
    "function_score", "search_after",
})


class RequestCache:
    """Engine proxy memoizing whitelisted query methods until
    :meth:`invalidate` / :meth:`refresh` (which also refreshes the
    wrapped engine, mirroring ES's refresh-clears-cache contract)."""

    def __init__(self, engine, max_entries: int = 1024):
        if max_entries < 1:
            raise ValueError("max_entries must be >= 1")
        self._eng = engine
        self._max = int(max_entries)
        self._cache: OrderedDict = OrderedDict()
        self.hits = 0
        self.misses = 0

    # -- cache control -------------------------------------------------
    def invalidate(self) -> int:
        """Drop every cached entry; returns how many were dropped."""
        n = len(self._cache)
        self._cache.clear()
        return n

    def refresh(self, *args, **kwargs):
        """Refresh the wrapped engine, then clear (ES: a refresh
        invalidates the request cache)."""
        out = self._eng.refresh(*args, **kwargs)
        self.invalidate()
        return out

    def __len__(self) -> int:
        return len(self._cache)

    # -- dispatch ------------------------------------------------------
    def __getattr__(self, name: str):
        attr = getattr(self._eng, name)
        if name not in CACHED_METHODS or not callable(attr):
            return attr

        def cached(*args, **kwargs):
            key = (name, repr(args), repr(sorted(kwargs.items())))
            got = self._cache.get(key)
            if got is not None:
                self._cache.move_to_end(key)
                self.hits += 1
                return copy.copy(got)
            self.misses += 1
            out = attr(*args, **kwargs)
            self._cache[key] = out
            while len(self._cache) > self._max:
                self._cache.popitem(last=False)
            return copy.copy(out)

        return cached
