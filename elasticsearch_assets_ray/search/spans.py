"""Lucene span queries — the positional query algebra ES exposes as
``span_term`` / ``span_or`` / ``span_near`` / ``span_first`` /
``span_not`` / ``span_multi``.

The reference passes span queries through to Elasticsearch untranslated
(its lucene query passthrough, ``/root/reference/asset/elasticsearch_reader/
reader.js:7-14`` ships the query body verbatim); this module is the
serving-side implementation both engines share.

A span tree is plain dicts::

    {"span_term": "hash"}
    {"span_or": [node, ...]}
    {"span_near": {"clauses": [...], "slop": 3, "in_order": True}}
    {"span_first": {"match": node, "end": 4}}
    {"span_not": {"include": node, "exclude": node, "pre": 0, "post": 0}}
    {"span_multi": {"prefix": "sc", "max_expansions": 50}}
    {"span_multi": {"wildcard": "sc*n", ...}}
    {"span_multi": {"regexp": "qu.r.*", ...}}
    {"span_multi": {"fuzzy": "querry", "fuzziness": 1,
                    "prefix_length": 0, ...}}

The kernel is ENGINE-AGNOSTIC: both engines gather per-term
``(docs_flat, positions)`` streams (restricted to the candidate-doc
conjunction gate) and call :func:`span_freqs`; parity between the
doc-partitioned and term-partitioned engines is therefore structural.

Semantics (exact, documented where they diverge from Lucene):

* every node evaluates to a set of spans ``(doc, start, end)`` with
  ``end`` exclusive; a ``span_term`` leaf at token position ``p`` is the
  unit span ``(p, p+1)``.
* ``span_near`` with ``in_order=True``: a match is one span per clause,
  in clause order, non-overlapping (``end_i <= start_{i+1}``), with the
  total inter-clause gap ``sum(start_{i+1} - end_i) <= slop``.  The
  node's output spans are the distinct ``(start_1, end_k)`` pairs of
  valid chains (exact DP over Pareto-minimal ``(end, gap)`` states per
  start — general clauses supported, including nested nears).
* ``span_near`` with ``in_order=False``: clauses may appear in any
  order; supported for UNIT-length clause spans (terms / or-of-terms —
  the overwhelmingly common form): a match picks one position per
  clause, all distinct, and ``(max - min + 1) - n_clauses <= slop``.
  Output span per distinct start = the MINIMAL covering window
  starting there (if a start's minimal window fails the slop budget,
  every wider one does too, so match existence per start is exact).
  Non-unit clauses under ``in_order=False`` raise ``ValueError``.
* ``span_not``: include spans that do NOT overlap any exclude span
  widened by ``pre`` tokens before and ``post`` after (Lucene's
  pre/post semantics: kill when ``excl.start < incl.end + post`` and
  ``excl.end > incl.start - pre``).
* ``span_first``: match spans with ``end <= n`` (Lucene SpanFirstQuery).
* ``span_containing``: ``big`` spans that ENCLOSE at least one
  ``little`` span (``big.start <= little.start`` and ``little.end <=
  big.end`` — Lucene SpanContainingQuery); output spans are the
  qualifying ``big`` spans.
* ``span_within``: ``little`` spans that are enclosed by at least one
  ``big`` span (Lucene SpanWithinQuery); output spans are the
  qualifying ``little`` spans.
* ``span_multi``: the ES SpanMultiTermQueryWrapper — wraps a prefix,
  wildcard, regexp or fuzzy multi-term query, rewritten to ``span_or``
  of the first ``max_expansions`` matching dictionary terms in term
  order (the engines' deterministic global expansion).

Scoring (both engines): BM25 with tf = the number of DISTINCT top-level
match START positions in the doc and idf = the sum of every leaf term
occurrence's idf (``span_or``/``span_multi`` members each contribute —
the multi-leaf analogue of Lucene PhraseWeight's constituent-idf sum).
Lucene instead feeds ``1/(1+matchLength)``-weighted sloppyFreq into the
similarity; the distinct-starts form is deterministic and exactly
SQL-reproducible (the contract oracle mirrors it with EXISTS chains),
divergence documented in SURVEY.md §8.
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "leaf_terms",
    "requirement_sets",
    "rewrite_multi",
    "resolve_masks",
    "mask_key",
    "split_mask_key",
    "eval_spans",
    "span_freqs",
]


def _node_kind(node: dict) -> str:
    for k in ("span_term", "span_or", "span_near", "span_first",
              "span_not", "span_containing", "span_within", "span_multi",
              "span_field_masking"):
        if k in node:
            return k
    raise ValueError(f"not a span node: {node!r}")


# ----------------------------------------------------- span_field_masking
#
# ES span_field_masking (Lucene SpanFieldMaskingQuery) wraps a span
# query over ANOTHER field of the same documents and "lies" about its
# field so it can combine inside span_near/span_or on the outer field::
#
#     {"span_field_masking": {"query": <span node>,
#                             "query_field": "stem",   # source field
#                             "field": "text"}}        # masked-as field
#
# Only meaningful when the two fields produce position-compatible token
# streams (ES documents the same caveat); the `stem` analyzer is the
# canonical partner field here (1:1 tokens with `simple`).  Resolution
# happens BEFORE rewrite_multi/evaluation: every leaf inside a masked
# subtree is rewritten to a field-qualified stream key, after which the
# whole kernel (leaf_terms / requirement_sets / eval_spans) is
# field-oblivious again.  Scoring follows Lucene: term statistics (df →
# idf) come from each leaf's REAL field, norms (dl/avgdl) from the
# masked-as (outer) field.

# \x02 cannot collide with analyzer tokens ([a-z0-9]+) nor with
# index_phrases shingle terms (SHINGLE_SEP is \x1f)
MASK_SEP = "\x02"


def mask_key(field: str, term: str) -> str:
    """Field-qualified stream key for a masked leaf."""
    return f"{MASK_SEP}{field}{MASK_SEP}{term}"


def split_mask_key(key: str) -> tuple[str | None, str]:
    """(field, term) for a qualified key; (None, key) for a plain one."""
    if key.startswith(MASK_SEP):
        f, t = key[1:].split(MASK_SEP, 1)
        return f, t
    return None, key


def resolve_masks(node: dict, outer_field: str) -> dict:
    """Eliminate ``span_field_masking`` nodes by qualifying every leaf
    (span_term term / span_multi prefix) under a mask with its source
    field's stream key.  Validates that ``field`` (the masked-as field)
    equals the enclosing search field — ES requires position-compatible
    combination and our engines serve one coordinate space per query."""

    def walk(n: dict, field: str | None) -> dict:
        kind = _node_kind(n)
        if kind == "span_field_masking":
            spec = n["span_field_masking"]
            masked_as = spec.get("field", outer_field)
            if masked_as != outer_field:
                raise ValueError(
                    f"span_field_masking masks as {masked_as!r} but the "
                    f"query runs on field {outer_field!r}"
                )
            qf = spec["query_field"]
            return walk(spec["query"], None if qf == outer_field else qf)
        if kind == "span_term":
            t = n["span_term"]
            return {"span_term": mask_key(field, t) if field else t}
        if kind == "span_multi":
            spec = dict(n["span_multi"])
            if field:
                spec["field"] = field  # expansion runs in this field's
                # dictionary; the engine's expander re-qualifies results
            return {"span_multi": spec}
        if kind == "span_or":
            return {"span_or": [walk(c, field) for c in n["span_or"]]}
        if kind == "span_near":
            s = n["span_near"]
            return {"span_near": {
                "clauses": [walk(c, field) for c in s["clauses"]],
                "slop": int(s.get("slop", 0)),
                "in_order": bool(s.get("in_order", True)),
            }}
        if kind == "span_first":
            s = n["span_first"]
            return {"span_first": {"match": walk(s["match"], field),
                                   "end": int(s["end"])}}
        if kind in ("span_containing", "span_within"):
            s = n[kind]
            return {kind: {"big": walk(s["big"], field),
                           "little": walk(s["little"], field)}}
        s = n["span_not"]
        return {"span_not": {
            "include": walk(s["include"], field),
            "exclude": walk(s["exclude"], field),
            "pre": int(s.get("pre", 0)), "post": int(s.get("post", 0)),
        }}

    return walk(node, None)


def rewrite_multi(node: dict, expand) -> dict:
    """Rewrite every ``span_multi`` to a ``span_or`` of ``span_term``
    leaves via ``expand(spec, max_expansions) -> list[str]`` — the
    engine's deterministic global dictionary expansion of the wrapped
    multi-term query (``spec`` holds one of prefix / wildcard / regexp
    / fuzzy, plus an optional ``field`` from resolve_masks, in which
    case the expander returns field-qualified keys)."""
    kind = _node_kind(node)
    if kind == "span_field_masking":
        raise ValueError(
            "span_field_masking must be resolved first (resolve_masks); "
            "masked span queries are served by the multi-field entry "
            "points (MultiFieldEngine.search_spans / "
            "TermPartitionedEngine.search_spans with mask_engines)"
        )
    if kind == "span_term":
        return node
    if kind == "span_multi":
        spec = dict(node["span_multi"])
        terms = expand(spec, int(spec.get("max_expansions", 50)))
        return {"span_or": [{"span_term": t} for t in terms]}
    if kind == "span_or":
        return {"span_or": [rewrite_multi(c, expand) for c in node["span_or"]]}
    if kind == "span_near":
        s = node["span_near"]
        return {"span_near": {
            "clauses": [rewrite_multi(c, expand) for c in s["clauses"]],
            "slop": int(s.get("slop", 0)),
            "in_order": bool(s.get("in_order", True)),
        }}
    if kind == "span_first":
        s = node["span_first"]
        return {"span_first": {"match": rewrite_multi(s["match"], expand),
                               "end": int(s["end"])}}
    if kind in ("span_containing", "span_within"):
        s = node[kind]
        return {kind: {"big": rewrite_multi(s["big"], expand),
                       "little": rewrite_multi(s["little"], expand)}}
    s = node["span_not"]
    return {"span_not": {
        "include": rewrite_multi(s["include"], expand),
        "exclude": rewrite_multi(s["exclude"], expand),
        "pre": int(s.get("pre", 0)), "post": int(s.get("post", 0)),
    }}


def expand_multi_spec(spec: dict, m: int, prefix_fn, wildcard_fn,
                      regexp_fn, fuzzy_fn, range_fn=None) -> list[str]:
    """Dispatch a ``span_multi`` spec to an engine's deterministic
    global dictionary expanders.  Prefix/wildcard/regexp/range cap in
    TERM order; fuzzy caps (distance asc, term asc) — the ES FuzzyQuery
    ordering both engines already serve — then returns terms sorted
    (the or-group is order-insensitive; idf-sum counts each member).
    ``range`` (ES 8.16 intervals rule / Lucene TermRangeQuery) is a
    bounds dict ``{gte|gt, lte|lt}``."""
    if "prefix" in spec:
        return prefix_fn(spec["prefix"], m)
    if "wildcard" in spec:
        return wildcard_fn(spec["wildcard"], m)
    if "regexp" in spec:
        return regexp_fn(spec["regexp"], m)
    if "fuzzy" in spec:
        return fuzzy_fn(
            spec["fuzzy"], int(spec.get("fuzziness", 1)),
            int(spec.get("prefix_length", 0)), m,
        )
    if "range" in spec:
        if range_fn is None:
            raise ValueError("range expansion unsupported by this engine")
        r = spec["range"]
        return range_fn(r.get("gte"), r.get("lte"), r.get("gt"),
                        r.get("lt"), m)
    raise ValueError(
        "span_multi needs one of prefix/wildcard/regexp/fuzzy/range: "
        f"{spec!r}"
    )


def leaf_terms(node: dict) -> list[str]:
    """Every ``span_term`` occurrence, pre-order, repeats kept — the
    idf-sum constituents (``span_multi`` must be rewritten first)."""
    kind = _node_kind(node)
    if kind == "span_term":
        return [node["span_term"]]
    if kind == "span_or":
        out: list[str] = []
        for c in node["span_or"]:
            out.extend(leaf_terms(c))
        return out
    if kind == "span_near":
        out = []
        for c in node["span_near"]["clauses"]:
            out.extend(leaf_terms(c))
        return out
    if kind == "span_first":
        return leaf_terms(node["span_first"]["match"])
    if kind in ("span_containing", "span_within"):
        # both sides are REQUIRED matches (unlike span_not's exclude),
        # so both contribute scoring constituents (Lucene
        # SpanContainingQuery/SpanWithinQuery extract both clauses)
        s = node[kind]
        return leaf_terms(s["big"]) + leaf_terms(s["little"])
    if kind == "span_not":
        # exclude terms don't contribute to scoring (Lucene SpanNotQuery
        # scores the include clause) but DO need position streams
        return leaf_terms(node["span_not"]["include"])
    raise ValueError("span_multi must be rewritten before leaf_terms")


def all_terms(node: dict) -> set[str]:
    """Every term whose position stream evaluation needs (include AND
    exclude sides)."""
    kind = _node_kind(node)
    if kind == "span_term":
        return {node["span_term"]}
    if kind == "span_or":
        out: set[str] = set()
        for c in node["span_or"]:
            out |= all_terms(c)
        return out
    if kind == "span_near":
        out = set()
        for c in node["span_near"]["clauses"]:
            out |= all_terms(c)
        return out
    if kind == "span_first":
        return all_terms(node["span_first"]["match"])
    if kind in ("span_containing", "span_within"):
        s = node[kind]
        return all_terms(s["big"]) | all_terms(s["little"])
    if kind == "span_not":
        s = node["span_not"]
        return all_terms(s["include"]) | all_terms(s["exclude"])
    raise ValueError("span_multi must be rewritten before all_terms")


def requirement_sets(node: dict) -> list[frozenset]:
    """Sound candidate-gate conjunction: a matching doc must contain at
    least one term from EVERY returned set (the doc-conjunction gate
    both engines apply before shipping/decoding position streams —
    the phrase gate generalized to or-groups)."""
    kind = _node_kind(node)
    if kind == "span_term":
        return [frozenset([node["span_term"]])]
    if kind == "span_or":
        terms = set()
        for c in node["span_or"]:
            terms |= all_terms(c)
        return [frozenset(terms)] if terms else [frozenset()]
    if kind == "span_near":
        out: list[frozenset] = []
        for c in node["span_near"]["clauses"]:
            out.extend(requirement_sets(c))
        return out
    if kind == "span_first":
        return requirement_sets(node["span_first"]["match"])
    if kind in ("span_containing", "span_within"):
        # both sides must match in a qualifying doc
        s = node[kind]
        return requirement_sets(s["big"]) + requirement_sets(s["little"])
    if kind == "span_not":
        return requirement_sets(node["span_not"]["include"])
    raise ValueError("span_multi must be rewritten before requirement_sets")


# ------------------------------------------------------------ evaluation


def _empty3():
    z = np.empty(0, dtype=np.int64)
    return z, z.copy(), z.copy()


def _dedupe_sorted(docs, starts, ends):
    order = np.lexsort((ends, starts, docs))
    docs, starts, ends = docs[order], starts[order], ends[order]
    if len(docs):
        keep = np.empty(len(docs), dtype=bool)
        keep[0] = True
        keep[1:] = (
            (docs[1:] != docs[:-1]) | (starts[1:] != starts[:-1])
            | (ends[1:] != ends[:-1])
        )
        docs, starts, ends = docs[keep], starts[keep], ends[keep]
    return docs, starts, ends


def _doc_runs(docs: np.ndarray):
    """(unique docs, run starts, run ends) over a doc-sorted array."""
    if not len(docs):
        return docs, np.empty(0, np.int64), np.empty(0, np.int64)
    b = np.nonzero(np.diff(docs))[0] + 1
    starts = np.concatenate([[0], b])
    ends = np.concatenate([b, [len(docs)]])
    return docs[starts], starts, ends


def _near_ordered_doc(clause_spans, slop: int):
    """Exact ordered-near DP for ONE doc.

    ``clause_spans``: per clause, ``(starts, ends)`` sorted by start.
    Returns the distinct ``(start, end)`` match spans.  States after
    clause i: {(origin_start, end) -> min total gap}; Pareto growth is
    bounded by the doc's span counts (positions per doc are small)."""
    s0, e0 = clause_spans[0]
    states: dict = {}
    for s, e in zip(s0.tolist(), e0.tolist()):
        key = (s, e)
        if key not in states:
            states[key] = 0
    for si, ei in clause_spans[1:]:
        nxt: dict = {}
        sl = si.tolist()
        el = ei.tolist()
        for (o, pe), g in states.items():
            # spans of this clause starting at-or-after the previous end
            lo = int(np.searchsorted(si, pe))
            for j in range(lo, len(sl)):
                g2 = g + (sl[j] - pe)
                if g2 > slop:
                    break  # starts ascend → gap only grows
                key = (o, el[j])
                if g2 < nxt.get(key, slop + 1):
                    nxt[key] = g2
        states = nxt
        if not states:
            return []
    return sorted(states.keys())


def _near_unordered_doc(clause_pos, slop: int):
    """Unordered near over UNIT-length clauses for ONE doc: per distinct
    start, the minimal window covering one position from every clause
    with all chosen positions distinct; match iff width - n <= slop.

    ``clause_pos``: per clause, sorted positions.  Exact sweep: merge
    all (pos, clause) events; two-pointer minimal windows."""
    n = len(clause_pos)
    events = []
    for ci, p in enumerate(clause_pos):
        events.extend((int(x), ci) for x in p)
    events.sort()
    if not events:
        return []
    # classic minimal-window sweep: for each left event, the smallest
    # right edge covering every clause; emit when within the slop budget
    out = []
    count = [0] * n
    covered = 0
    hi = 0
    for lo in range(len(events)):
        while hi < len(events) and covered < n:
            _, c = events[hi]
            count[c] += 1
            if count[c] == 1:
                covered += 1
            hi += 1
        if covered < n:
            break
        p_lo = events[lo][0]
        p_hi = events[hi - 1][0]
        # distinctness: window holds >= n events and one per clause —
        # picking each clause's first event in-window yields distinct
        # positions unless two clauses share the exact position AND no
        # alternative exists; sharing a position requires sharing a term
        # (streams are per-term), which the caller documents as
        # unsupported overlap.  Window width check:
        if (p_hi - p_lo + 1) - n <= slop:
            out.append((p_lo, p_hi + 1))
        _, c = events[lo]
        count[c] -= 1
        if count[c] == 0:
            covered -= 1
    # dedupe per start (several left events can share a position)
    seen = {}
    for s, e in out:
        if s not in seen or e < seen[s]:
            seen[s] = e
    return sorted(seen.items())


def eval_spans(node: dict, streams: dict) -> tuple:
    """Evaluate a span tree over per-term position streams.

    ``streams``: term -> ``(docs_flat, positions)`` — int64 arrays
    sorted by (doc, position), one row per token occurrence, restricted
    to the candidate docs.  Absent terms may be missing from the dict.
    Returns ``(docs, starts, ends)`` sorted lex, deduped."""
    kind = _node_kind(node)
    if kind == "span_term":
        got = streams.get(node["span_term"])
        if got is None:
            return _empty3()
        docs, pos = got
        return docs.astype(np.int64), pos.astype(np.int64), pos.astype(np.int64) + 1
    if kind == "span_or":
        parts = [eval_spans(c, streams) for c in node["span_or"]]
        parts = [p for p in parts if len(p[0])]
        if not parts:
            return _empty3()
        docs = np.concatenate([p[0] for p in parts])
        starts = np.concatenate([p[1] for p in parts])
        ends = np.concatenate([p[2] for p in parts])
        return _dedupe_sorted(docs, starts, ends)
    if kind == "span_first":
        spec = node["span_first"]
        docs, starts, ends = eval_spans(spec["match"], streams)
        m = ends <= int(spec["end"])
        return docs[m], starts[m], ends[m]
    if kind in ("span_containing", "span_within"):
        spec = node[kind]
        bd, bs, be = eval_spans(spec["big"], streams)
        ld, ls, le = eval_spans(spec["little"], streams)
        if not len(bd) or not len(ld):
            return _empty3()
        # keep spans of the OUTPUT side that satisfy the enclosure test
        # against ≥1 span of the other side (both lists are doc-sorted)
        if kind == "span_containing":
            od, os_, oe = bd, bs, be          # output big
            td, ts_, te = ld, ls, le          # test little inside big
        else:
            od, os_, oe = ld, ls, le          # output little
            td, ts_, te = bd, bs, be          # test big around little
        keep = np.zeros(len(od), dtype=bool)
        ou, o0, o1 = _doc_runs(od)
        tu, t0, t1 = _doc_runs(td)
        common, oi, ti = np.intersect1d(ou, tu, assume_unique=True,
                                        return_indices=True)
        for a, b in zip(oi, ti):
            i0, i1 = o0[a], o1[a]
            x0, x1 = t0[b], t1[b]
            if kind == "span_containing":
                # big encloses little: big.start <= l.start, l.end <= big.end
                hit = (
                    (os_[i0:i1][:, None] <= ts_[x0:x1][None, :])
                    & (te[x0:x1][None, :] <= oe[i0:i1][:, None])
                ).any(axis=1)
            else:
                # little within big: big.start <= l.start, l.end <= big.end
                hit = (
                    (ts_[x0:x1][None, :] <= os_[i0:i1][:, None])
                    & (oe[i0:i1][:, None] <= te[x0:x1][None, :])
                ).any(axis=1)
            keep[i0:i1] = hit
        return od[keep], os_[keep], oe[keep]
    if kind == "span_not":
        spec = node["span_not"]
        docs, starts, ends = eval_spans(spec["include"], streams)
        if not len(docs):
            return docs, starts, ends
        xd, xs, xe = eval_spans(spec["exclude"], streams)
        if not len(xd):
            return docs, starts, ends
        pre, post = int(spec.get("pre", 0)), int(spec.get("post", 0))
        keep = np.ones(len(docs), dtype=bool)
        iu, is_, ie_ = _doc_runs(docs)
        xu, xs_, xe_ = _doc_runs(xd)
        common, ii, xi = np.intersect1d(iu, xu, assume_unique=True,
                                        return_indices=True)
        for a, b in zip(ii, xi):
            i0, i1 = is_[a], ie_[a]
            x0, x1 = xs_[b], xe_[b]
            # overlap: excl.start < incl.end + post  AND
            #          excl.end   > incl.start - pre
            bad = (
                (xs[x0:x1][None, :] < (ends[i0:i1] + post)[:, None])
                & (xe[x0:x1][None, :] > (starts[i0:i1] - pre)[:, None])
            ).any(axis=1)
            keep[i0:i1] &= ~bad
        return docs[keep], starts[keep], ends[keep]
    if kind == "span_near":
        spec = node["span_near"]
        clauses = spec["clauses"]
        slop = int(spec.get("slop", 0))
        in_order = bool(spec.get("in_order", True))
        evald = [eval_spans(c, streams) for c in clauses]
        if any(not len(p[0]) for p in evald):
            return _empty3()
        # doc conjunction across clauses
        docsets = [_doc_runs(p[0]) for p in evald]
        cand = docsets[0][0]
        for u, _, _ in docsets[1:]:
            cand = cand[np.isin(cand, u, assume_unique=True)]
            if not len(cand):
                return _empty3()
        unit = all(
            bool(np.all(p[2] - p[1] == 1)) for p in evald
        )
        if not in_order and not unit:
            raise ValueError(
                "span_near(in_order=False) supports unit-length clause "
                "spans only (terms / or-of-terms)"
            )
        o_d, o_s, o_e = [], [], []
        for doc in cand.tolist():
            clause_spans = []
            for (cd, cs, ce), (u, rs, re_) in zip(evald, docsets):
                i = int(np.searchsorted(u, doc))
                clause_spans.append((cs[rs[i]:re_[i]], ce[rs[i]:re_[i]]))
            if in_order:
                matches = _near_ordered_doc(clause_spans, slop)
            else:
                matches = _near_unordered_doc(
                    [s for s, _ in clause_spans], slop
                )
            for s, e in matches:
                o_d.append(doc)
                o_s.append(s)
                o_e.append(e)
        if not o_d:
            return _empty3()
        return (np.array(o_d, np.int64), np.array(o_s, np.int64),
                np.array(o_e, np.int64))
    raise ValueError("span_multi must be rewritten before eval_spans")


def span_freqs(node: dict, streams: dict) -> tuple[np.ndarray, np.ndarray]:
    """(matched docs, tf) where tf = distinct top-level match starts."""
    docs, starts, _ends = eval_spans(node, streams)
    if not len(docs):
        return np.empty(0, np.int64), np.empty(0, np.float64)
    # distinct (doc, start): spans are deduped by (doc,start,end); a
    # start with two ends counts once
    order = np.lexsort((starts, docs))
    d, s = docs[order], starts[order]
    new = np.empty(len(d), dtype=bool)
    new[0] = True
    new[1:] = (d[1:] != d[:-1]) | (s[1:] != s[:-1])
    d, s = d[new], s[new]
    hd, pf = np.unique(d, return_counts=True)
    return hd, pf.astype(np.float64)
