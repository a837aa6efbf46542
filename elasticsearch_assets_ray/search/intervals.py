"""ES ``intervals`` query — the minimal-interval positional algebra
(Lucene ``IntervalQuery``; the modern successor to span queries).

The reference passes intervals queries through to Elasticsearch
untranslated (lucene passthrough, ``/root/reference/asset/
elasticsearch_reader/reader.js:7-14``); this module is the serving-side
kernel both engines share, exactly like ``search/spans.py``.

An intervals tree is plain dicts, mirroring the ES rule JSON::

    {"term": "hash"}
    {"match": {"query": "hash join", "ordered": True, "max_gaps": 0,
               "filter": {...}?}}
    {"any_of": {"intervals": [node, ...], "filter": {...}?}}
    {"all_of": {"intervals": [node, ...], "ordered": False,
                "max_gaps": -1, "filter": {...}?}}
    {"prefix": {"prefix": "sc", "max_expansions": 20}}
    {"wildcard": {"pattern": "s?a*", "max_expansions": 20}}
    {"fuzzy": {"term": "jion", "fuzziness": 2, "prefix_length": 0}}
    {"regexp": {"pattern": "(so|sc).*", "max_expansions": 20}}
    {"range": {"gte": "scan", "lte": "sort", "max_expansions": 20}}

``filter`` is a one-key dict: ``containing`` / ``contained_by`` /
``not_containing`` / ``not_contained_by`` / ``overlapping`` /
``not_overlapping`` / ``before`` / ``after`` whose value is another
intervals node.  ``match`` is sugar: the engine analyzes the query text
and rewrites it to ``all_of`` over ``term`` leaves (``desugar``);
``prefix`` / ``wildcard`` / ``fuzzy`` / ``regexp`` rewrite to
``any_of`` of dictionary expansions (``rewrite_multi`` — same
deterministic global expansion as ``span_multi``).

Semantics — MINIMAL intervals (Clarke & Cormack's GC-lists, the Lucene
IntervalsSource contract): every node emits, per doc, an antichain
under containment (starts strictly increasing AND ends strictly
increasing), inclusive ``[start, end]`` token coordinates:

* ``term`` at position ``p`` → ``[p, p]``.
* ``any_of`` → union of the children's minimal sets, reduced to the
  minimal antichain (Lucene DisjunctionIntervalsSource).
* ``all_of(ordered=True)`` → chains choosing one interval per child in
  clause order, strictly non-overlapping (``next.start > prev.end``);
  the match set's minimal antichain, then ``gaps <= max_gaps`` when
  ``max_gaps >= 0`` with ``gaps = width - Σ child widths`` under the
  best (maximal Σ width) decomposition of that interval — identical to
  Lucene for unit-width children (terms, the common case), documented
  determinization for nested sources.
* ``all_of(ordered=False)`` → minimal covering windows containing one
  interval from EVERY child, overlaps between children allowed (Lucene
  unordered mode; note the DIVERGENCE from ``span_near`` unordered,
  which requires distinct positions); same gaps rule (can go negative
  when children overlap, as in Lucene).
* filters apply to the node's minimal set, tested against the FILTER
  node's minimal set (Lucene FilteredIntervalsSource iterates minimal
  intervals on both sides): ``containing`` keeps S with some F ⊆ S,
  ``contained_by`` keeps S ⊆ some F, ``overlapping`` keeps S
  intersecting some F, ``before`` keeps S with ``S.end < F.start`` for
  some F, ``after`` keeps S with ``S.start > F.end`` for some F;
  ``not_*`` negate.  Filtered sets remain antichains (subsets of one).

Scoring (both engines, same contract as spans): BM25 with tf = the
number of TOP-LEVEL minimal intervals in the doc (an antichain has
strictly increasing starts, so this equals distinct match starts) and
idf = Σ idf over every scoring leaf-term occurrence (``leaf_terms`` —
filter subtrees are excluded: filters gate, they don't score).  Lucene
instead feeds ``1/(1+slope)``-weighted sloppyFreq into the similarity;
the interval-count form is deterministic and exactly SQL-reproducible
(the contract oracle mirrors minimality with a per-start min-end CTE +
antichain anti-join), divergence documented in SURVEY.md §8.
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "desugar",
    "rewrite_multi",
    "leaf_terms",
    "all_terms",
    "requirement_sets",
    "eval_intervals",
    "span_freqs",
]

_FILTER_KEYS = (
    "containing", "contained_by", "not_containing", "not_contained_by",
    "overlapping", "not_overlapping", "before", "after",
)
_POSITIVE_FILTERS = frozenset(
    {"containing", "contained_by", "overlapping", "before", "after"}
)


# multi-term rules, all rewritten to any_of-of-terms by rewrite_multi
# (ES intervals rule types beyond match/term: prefix, wildcard, fuzzy,
# regexp — Lucene IntervalsSource multiterm wrappers)
_MULTI_KINDS = ("prefix", "wildcard", "fuzzy", "regexp", "range")


def _node_kind(node: dict) -> str:
    for k in ("term", "match", "any_of", "all_of") + _MULTI_KINDS:
        if k in node:
            return k
    raise ValueError(f"not an intervals node: {node!r}")


def _get_filter(node: dict) -> tuple[str, dict] | None:
    kind = _node_kind(node)
    if kind == "term" or kind in _MULTI_KINDS:
        return None
    f = node[kind].get("filter")
    if f is None:
        return None
    if len(f) != 1 or next(iter(f)) not in _FILTER_KEYS:
        raise ValueError(f"intervals filter must be one of {_FILTER_KEYS}: "
                         f"{f!r}")
    rel, sub = next(iter(f.items()))
    return rel, sub


def desugar(node: dict, analyze) -> dict:
    """Rewrite ``match`` sugar to ``all_of`` over ``term`` leaves using
    the engine's analyzer (``analyze(text) -> list[str]``, duplicates
    kept in order — ES analyzes the match query with the field's
    analyzer)."""
    kind = _node_kind(node)
    if kind == "term" or kind in _MULTI_KINDS:
        return node
    if kind == "match":
        spec = node["match"]
        terms = analyze(spec["query"])
        out: dict = {"all_of": {
            "intervals": [{"term": t} for t in terms],
            "ordered": bool(spec.get("ordered", True)),
            "max_gaps": int(spec.get("max_gaps", -1)),
        }}
        if spec.get("filter") is not None:
            rel, sub = next(iter(spec["filter"].items()))
            out["all_of"]["filter"] = {rel: desugar(sub, analyze)}
        return out
    spec = dict(node[kind])
    spec["intervals"] = [desugar(c, analyze) for c in spec["intervals"]]
    if spec.get("filter") is not None:
        rel, sub = next(iter(spec["filter"].items()))
        spec["filter"] = {rel: desugar(sub, analyze)}
    return {kind: spec}


def rewrite_multi(node: dict, expand) -> dict:
    """Rewrite every multi-term rule (``prefix`` / ``wildcard`` /
    ``fuzzy`` / ``regexp``) to ``any_of`` of ``term`` leaves via
    ``expand(spec, max_expansions) -> list[str]`` — the engines'
    ``_expand_span_multi`` dispatcher (deterministic global dictionary
    expansion; the ``span_multi`` analogue, hence the shared name with
    ``spans.rewrite_multi``).  ES rule shapes accepted:
    ``{"prefix": {"prefix": p}}``, ``{"wildcard": {"pattern": w}}``,
    ``{"fuzzy": {"term": t, "fuzziness": n, "prefix_length": l}}``,
    ``{"regexp": {"pattern": r}}``.  ``match`` sugar must be desugared
    first."""
    kind = _node_kind(node)
    if kind == "term":
        return node
    if kind == "match":
        raise ValueError("desugar match nodes before rewrite_multi")
    if kind in _MULTI_KINDS:
        spec = node[kind]
        m = int(spec.get("max_expansions", 50))
        if kind == "prefix":
            mt = {"prefix": spec["prefix"]}
        elif kind == "wildcard":
            mt = {"wildcard": spec["pattern"]}
        elif kind == "regexp":
            mt = {"regexp": spec["pattern"]}
        elif kind == "range":
            mt = {"range": {k: spec[k] for k in ("gte", "gt", "lte", "lt")
                            if spec.get(k) is not None}}
        else:
            mt = {"fuzzy": spec["term"],
                  "fuzziness": int(spec.get("fuzziness", 1)),
                  "prefix_length": int(spec.get("prefix_length", 0))}
        terms = expand(mt, m)
        return {"any_of": {"intervals": [{"term": t} for t in terms]}}
    spec = dict(node[kind])
    spec["intervals"] = [rewrite_multi(c, expand) for c in spec["intervals"]]
    if spec.get("filter") is not None:
        rel, sub = next(iter(spec["filter"].items()))
        spec["filter"] = {rel: rewrite_multi(sub, expand)}
    return {kind: spec}


def leaf_terms(node: dict) -> list[str]:
    """Scoring constituents: every ``term`` occurrence in the SOURCE
    tree, pre-order, repeats kept.  Filter subtrees are excluded —
    intervals filters gate matches, they don't score (unlike
    ``span_containing``, where both sides are matches)."""
    kind = _node_kind(node)
    if kind == "term":
        return [node["term"]]
    if kind == "match" or kind in _MULTI_KINDS:
        raise ValueError("desugar/rewrite before leaf_terms")
    out: list[str] = []
    for c in node[kind]["intervals"]:
        out.extend(leaf_terms(c))
    return out


def all_terms(node: dict) -> set[str]:
    """Every term whose position stream evaluation needs (source AND
    filter subtrees)."""
    kind = _node_kind(node)
    if kind == "term":
        return {node["term"]}
    if kind == "match" or kind in _MULTI_KINDS:
        raise ValueError("desugar/rewrite before all_terms")
    out: set[str] = set()
    for c in node[kind]["intervals"]:
        out |= all_terms(c)
    got = _get_filter(node)
    if got is not None:
        out |= all_terms(got[1])
    return out


def requirement_sets(node: dict) -> list[frozenset]:
    """Sound candidate-gate conjunction (the span gate's shape): a
    matching doc must hold ≥1 term from EVERY returned set.  ``any_of``
    yields one union set; ``all_of`` concatenates children; POSITIVE
    filters (containing / contained_by / overlapping / before / after)
    require their subtree to match too, negative filters add nothing."""
    kind = _node_kind(node)
    if kind == "term":
        return [frozenset([node["term"]])]
    if kind == "match" or kind in _MULTI_KINDS:
        raise ValueError("desugar/rewrite before requirement_sets")
    if kind == "any_of":
        terms: set[str] = set()
        for c in node["any_of"]["intervals"]:
            terms |= all_terms(c)
        out = [frozenset(terms)]
    else:
        out = []
        for c in node["all_of"]["intervals"]:
            out.extend(requirement_sets(c))
    got = _get_filter(node)
    if got is not None and got[0] in _POSITIVE_FILTERS:
        out = out + requirement_sets(got[1])
    return out


# ------------------------------------------------------------ evaluation


def _empty3():
    z = np.empty(0, dtype=np.int64)
    return z, z.copy(), z.copy()


def _doc_runs(docs: np.ndarray):
    if not len(docs):
        return docs, np.empty(0, np.int64), np.empty(0, np.int64)
    b = np.nonzero(np.diff(docs))[0] + 1
    starts = np.concatenate([[0], b])
    ends = np.concatenate([b, [len(docs)]])
    return docs[starts], starts, ends


def _minimal_antichain(starts: np.ndarray, ends: np.ndarray):
    """Minimal antichain of ONE doc's interval set: drop any interval
    that strictly contains another.  Returns (starts, ends) with both
    strictly increasing."""
    if not len(starts):
        return starts, ends
    order = np.lexsort((ends, starts))
    s, e = starts[order], ends[order]
    # per start keep the min end (first in the (start, end) sort)
    first = np.empty(len(s), dtype=bool)
    first[0] = True
    first[1:] = s[1:] != s[:-1]
    s, e = s[first], e[first]
    # right-to-left: keep while end strictly below the running min
    keep = np.empty(len(s), dtype=bool)
    m = np.int64(np.iinfo(np.int64).max)
    for i in range(len(s) - 1, -1, -1):
        keep[i] = e[i] < m
        if e[i] < m:
            m = e[i]
    return s[keep], e[keep]


def _ordered_doc(children, max_gaps: int):
    """Ordered all_of for ONE doc.  ``children``: per child, (starts,
    ends) minimal (both strictly ascending).  Chains pick one interval
    per child with ``next.start > prev.end``; match set → minimal
    antichain → gaps filter (gaps from the max-Σ-width decomposition).
    Returns sorted (start, end) pairs."""
    s0, e0 = children[0]
    # states: (origin, prev_end) -> max Σ child widths
    states: dict = {}
    for s, e in zip(s0.tolist(), e0.tolist()):
        key = (s, e)
        w = e - s + 1
        if states.get(key, -1) < w:
            states[key] = w
    for si, ei in children[1:]:
        sl, el = si.tolist(), ei.tolist()
        nxt: dict = {}
        for (o, pe), w in states.items():
            lo = int(np.searchsorted(si, pe, side="right"))
            for j in range(lo, len(sl)):
                key = (o, el[j])
                w2 = w + (el[j] - sl[j] + 1)
                if nxt.get(key, -1) < w2:
                    nxt[key] = w2
        states = nxt
        if not states:
            return []
    ss = np.array([k[0] for k in states], np.int64)
    ee = np.array([k[1] for k in states], np.int64)
    ms, me = _minimal_antichain(ss, ee)
    out = []
    for s, e in zip(ms.tolist(), me.tolist()):
        if max_gaps >= 0:
            gaps = (e - s + 1) - states[(s, e)]
            if gaps > max_gaps:
                continue
        out.append((s, e))
    return out


def _unordered_doc(children, max_gaps: int):
    """Unordered all_of for ONE doc: minimal covering windows holding
    one interval per child (overlaps allowed).  Plane sweep over child
    pointers (advance the min-start child), candidates → minimal
    antichain → gaps filter."""
    n = len(children)
    ptr = [0] * n
    sizes = [len(c[0]) for c in children]
    if any(sz == 0 for sz in sizes):
        return []
    cand: dict = {}
    while True:
        cs = [children[i][0][ptr[i]] for i in range(n)]
        ce = [children[i][1][ptr[i]] for i in range(n)]
        s, e = int(min(cs)), int(max(ce))
        w = int(sum(int(b) - int(a) + 1 for a, b in zip(cs, ce)))
        key = (s, e)
        if cand.get(key, -1) < w:
            cand[key] = w
        i = int(np.argmin(cs))
        ptr[i] += 1
        if ptr[i] >= sizes[i]:
            break
    ss = np.array([k[0] for k in cand], np.int64)
    ee = np.array([k[1] for k in cand], np.int64)
    ms, me = _minimal_antichain(ss, ee)
    out = []
    for s, e in zip(ms.tolist(), me.tolist()):
        if max_gaps >= 0:
            gaps = (e - s + 1) - cand[(s, e)]
            if gaps > max_gaps:
                continue
        out.append((s, e))
    return out


def _apply_filter(rel: str, docs, starts, ends, fd, fs, fe):
    """Keep source intervals per ``rel`` against the filter's minimal
    intervals.  All arrays doc-major sorted."""
    if not len(docs):
        return docs, starts, ends
    positive = rel in _POSITIVE_FILTERS
    base = rel[4:] if rel.startswith("not_") else rel
    if not len(fd):
        # empty filter set: positive relations keep nothing, negatives
        # keep everything
        if positive:
            return _empty3()
        return docs, starts, ends
    hit = np.zeros(len(docs), dtype=bool)
    su, s0, s1 = _doc_runs(docs)
    fu, f0, f1 = _doc_runs(fd)
    common, si_, fi_ = np.intersect1d(su, fu, assume_unique=True,
                                      return_indices=True)
    for a, b in zip(si_, fi_):
        i0, i1 = s0[a], s1[a]
        x0, x1 = f0[b], f1[b]
        S_s = starts[i0:i1][:, None]
        S_e = ends[i0:i1][:, None]
        F_s = fs[x0:x1][None, :]
        F_e = fe[x0:x1][None, :]
        if base == "containing":
            m = (S_s <= F_s) & (F_e <= S_e)
        elif base == "contained_by":
            m = (F_s <= S_s) & (S_e <= F_e)
        elif base == "overlapping":
            m = (S_s <= F_e) & (F_s <= S_e)
        elif base == "before":
            m = S_e < F_s
        else:  # after
            m = S_s > F_e
        hit[i0:i1] = m.any(axis=1)
    keep = hit if positive else ~hit
    return docs[keep], starts[keep], ends[keep]


def eval_intervals(node: dict, streams: dict) -> tuple:
    """Evaluate an intervals tree over per-term position streams
    (term -> ``(docs_flat, positions)`` sorted by (doc, position),
    restricted to candidate docs; absent terms may be missing).
    Returns ``(docs, starts, ends)`` — per doc a minimal antichain,
    ends INCLUSIVE, doc-major sorted."""
    kind = _node_kind(node)
    if kind == "term":
        got = streams.get(node["term"])
        if got is None:
            return _empty3()
        docs, pos = got
        p = pos.astype(np.int64)
        return docs.astype(np.int64), p, p.copy()
    if kind == "match" or kind in _MULTI_KINDS:
        raise ValueError("desugar/rewrite before eval_intervals")
    spec = node[kind]
    if kind == "any_of":
        parts = [eval_intervals(c, streams) for c in spec["intervals"]]
        parts = [p for p in parts if len(p[0])]
        if not parts:
            out = _empty3()
        else:
            docs = np.concatenate([p[0] for p in parts])
            starts = np.concatenate([p[1] for p in parts])
            ends = np.concatenate([p[2] for p in parts])
            order = np.lexsort((ends, starts, docs))
            docs, starts, ends = docs[order], starts[order], ends[order]
            o_d, o_s, o_e = [], [], []
            du, d0, d1 = _doc_runs(docs)
            for a in range(len(du)):
                i0, i1 = d0[a], d1[a]
                ms, me = _minimal_antichain(starts[i0:i1], ends[i0:i1])
                o_d.append(np.full(len(ms), du[a], np.int64))
                o_s.append(ms)
                o_e.append(me)
            out = (
                np.concatenate(o_d) if o_d else _empty3()[0],
                np.concatenate(o_s) if o_s else _empty3()[0],
                np.concatenate(o_e) if o_e else _empty3()[0],
            )
    else:  # all_of
        ordered = bool(spec.get("ordered", False))
        max_gaps = int(spec.get("max_gaps", -1))
        evald = [eval_intervals(c, streams) for c in spec["intervals"]]
        if any(not len(p[0]) for p in evald):
            out = _empty3()
        else:
            docsets = [_doc_runs(p[0]) for p in evald]
            cand = docsets[0][0]
            for u, _, _ in docsets[1:]:
                cand = cand[np.isin(cand, u, assume_unique=True)]
            if not len(cand):
                out = _empty3()
            else:
                o_d, o_s, o_e = [], [], []
                for doc in cand.tolist():
                    children = []
                    for (cd, cs, ce), (u, rs, re_) in zip(evald, docsets):
                        i = int(np.searchsorted(u, doc))
                        children.append((cs[rs[i]:re_[i]], ce[rs[i]:re_[i]]))
                    matches = (
                        _ordered_doc(children, max_gaps) if ordered
                        else _unordered_doc(children, max_gaps)
                    )
                    for s, e in matches:
                        o_d.append(doc)
                        o_s.append(s)
                        o_e.append(e)
                if not o_d:
                    out = _empty3()
                else:
                    out = (np.array(o_d, np.int64), np.array(o_s, np.int64),
                           np.array(o_e, np.int64))
    got = _get_filter(node)
    if got is not None:
        rel, sub = got
        fd, fs, fe = eval_intervals(sub, streams)
        out = _apply_filter(rel, out[0], out[1], out[2], fd, fs, fe)
    return out


def span_freqs(node: dict, streams: dict) -> tuple[np.ndarray, np.ndarray]:
    """(matched docs, tf) with tf = the doc's number of top-level
    minimal intervals (named ``span_freqs`` so both positional kernels
    expose the same engine-facing surface)."""
    docs, _starts, _ends = eval_intervals(node, streams)
    if not len(docs):
        return np.empty(0, np.int64), np.empty(0, np.float64)
    hd, pf = np.unique(docs, return_counts=True)
    return hd, pf.astype(np.float64)
