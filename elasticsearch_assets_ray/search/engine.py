"""BM25 top-k query serving over built index shards.

Two serving paths, both stateful-actor based (the reference's cached
state-storage pattern: expensive load once per worker, reused per request —
``/root/reference/asset/elasticsearch_state_storage/api.js:6-33``):

* **Shard-actor path** (`QueryEngine`): one Ray actor per shard group,
  each loads only its shards' segments + doc lengths once.  A query fans
  out to every shard actor (document-partitioned index — each shard holds
  a doc range, the build shuffle's salt key), local top-k per shard, then
  a driver-side tree merge with deterministic tie-break (score desc,
  doc_id asc).  This is the 10^12-doc layout: per-actor memory is bounded
  by its shard subset, never by the corpus.
* **Dataset bulk path** (`score_queries_dataset`): a query *Dataset* piped
  through ``map_batches(BulkScorer, concurrency=N)`` actor pool, each actor
  holding the whole (small) index — right for high-throughput offline
  query batches at test scale, and the shape `bench.py` measures.

Scoring is vectorized: per shard a dense float64 score array over the
shard's doc range is accumulated term-by-term (sorted term order — pinned
to match the oracle bit-for-bit), using the decoded postings.  A
block-max WAND traversal (`wand_topk`) implements the skip path over the
per-block max-tf metadata; it is rank-identical to dense scoring and wins
when queries are selective and shards large.
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..analysis.tokenizer import clip_tokens, get_analyzer
from ..config import BM25Params
from ..index.build import IndexInfo
from ..index.codec import decode_block, decode_postings, read_meta


def _merge_group_topk(
    parts_list: list[dict], k: int, round_decimals: int | None
) -> dict:
    """Merge per-group top-hits partials ({group: (count, ids, scores)})
    across shards/actors: counts add, hit lists merge with the serving
    tie contract (``merge_topk``) — the ONE implementation both merge
    levels share."""
    merged: dict = {}
    for part in parts_list:
        for g, (c, ids, scs) in part.items():
            got = merged.get(g)
            if got is None:
                merged[g] = [c, [(ids, scs)]]
            else:
                got[0] += c
                got[1].append((ids, scs))
    return {
        g: (c, *merge_topk(parts, k, round_decimals))
        for g, (c, parts) in merged.items()
    }


def rescore_with_phrase(
    engine,
    query: str | list[str],
    phrase: str | list[str],
    k: int = 10,
    window_size: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    score_mode: str = "total",
    round_decimals: int | None = 4,
) -> list[tuple[int, float]]:
    """ES ``rescore`` with a phrase rescorer: re-rank the query phase's
    top ``window_size`` hits by combining their BM25 score with a
    ``match_phrase`` score, then cut to ``k``.  ``score_mode`` is the ES
    option set: ``total`` (wq·q + wr·r, the default), ``multiply``,
    ``avg``, ``max``, ``min`` — a window doc outside the phrase's match
    set contributes no rescore term (ES: only matching rescore docs
    change score; under avg/max/min it keeps its weighted query score).

    Engine-agnostic by design: both serving engines expose ``search``
    and ``search_phrase`` with the same contract, so ONE composition
    serves both layouts.  Cost = the query phase + one phrase query —
    the phrase's match set is fetched once, not per window doc.
    Disclosed divergence: ES applies window_size PER SHARD during the
    fetch phase; here the window is the exact GLOBAL top (our merge is
    exact, so the global window dominates every per-shard one).
    """
    window = engine.search(query, k=window_size) if isinstance(query, str) \
        else engine.search_bool(should=query, k=window_size)
    if not window:
        return []
    # engines return the kth ROUNDED tie class in (raw desc, doc asc)
    # order; the ES window is exactly window_size docs under the serving
    # order (rounded desc, doc asc) — re-cut deterministically
    window = sorted(
        window,
        key=lambda ds: (
            -(round(ds[1], round_decimals) if round_decimals is not None
              else ds[1]),
            ds[0],
        ),
    )[:window_size]
    # the phrase's FULL match set (phrase matches are selective; k=∞ is
    # the tie-cut's "return everything matched" mode)
    ph = dict(engine.search_phrase(phrase, k=1 << 30))
    out = []
    wq, wr = float(query_weight), float(rescore_weight)
    for d, qs in window:
        r = ph.get(d)
        q_w = wq * qs
        if r is None:
            final = q_w
        else:
            r_w = wr * r
            if score_mode == "total":
                final = q_w + r_w
            elif score_mode == "multiply":
                final = q_w * r_w
            elif score_mode == "avg":
                final = (q_w + r_w) / 2.0
            elif score_mode == "max":
                final = max(q_w, r_w)
            elif score_mode == "min":
                final = min(q_w, r_w)
            else:
                raise ValueError(f"unknown score_mode {score_mode!r}")
        out.append((d, final))
    if round_decimals is not None:
        out = [(d, round(s, round_decimals)) for d, s in out]
    out.sort(key=lambda ds: (-ds[1], ds[0]))
    return out[:k]


def _render_hit_dicts(
    buckets: list[dict],
    sort: tuple[str, str] | None,
    source_fields: list[str] | None,
    docmeta_index_dir,
) -> list[dict]:
    """Tuple hits → ES-shaped dict hits, hydrating ``_source`` fields
    with ONE docstore point-join over the post-cut ids (O(groups × k)
    lookups against the docmeta partitions — the ES fetch phase).
    Shared by both serving engines (the term engine passes its
    ``source_index`` lineage as the docmeta dir)."""
    val_key = "sort" if sort is not None else "score"
    src: dict[int, dict] = {}
    if source_fields:
        from ..state.docstore import DocStore

        all_ids = [int(d) for b in buckets for d, _ in b["hits"]]
        if all_ids:
            rows = DocStore(
                docmeta_index_dir, columns=list(source_fields)
            ).mget(all_ids).to_pylist()
            src = dict(zip(all_ids, rows))
    out = []
    for b in buckets:
        hits = []
        for d, v in b["hits"]:
            h = {"doc_id": int(d), val_key: v}
            if source_fields:
                h.update({f: src[int(d)][f] for f in source_fields})
            hits.append(h)
        out.append({"key": b["key"], "doc_count": b["doc_count"],
                    "hits": hits})
    return out


def _sort_key(vals: np.ndarray, desc: bool) -> np.ndarray:
    """Lexsort key for a sort-values array of EITHER dtype family:
    numeric/date values negate for desc; STRING doc values map to
    order-preserving dense codes (np.unique sorts) — exact-value ties
    share a code, so tie classes survive either way."""
    if np.issubdtype(vals.dtype, np.number):
        return -vals if desc else vals
    _, vinv = np.unique(vals, return_inverse=True)
    return -vinv if desc else vinv


def _after_mask(v: np.ndarray, ids: np.ndarray, after: tuple,
                desc: bool) -> np.ndarray:
    """ES ``search_after`` survivor mask on RAW sort values — rows
    strictly past ``(after_value, after_doc)`` in (value, doc asc)
    order.  Comparing raw values (not ``_sort_key`` codes) keeps
    string fields correct: dense codes are per-array and cannot be
    compared against a scalar cursor.  NaN/missing values sort LAST
    either direction (the ``missing: _last`` contract), so they
    survive any non-NaN cursor and a NaN cursor advances through the
    NaN tail by doc id."""
    av, ad = after
    numeric = np.issubdtype(np.asarray(v).dtype, np.number)
    nanmask = (np.isnan(v) if numeric and
               np.issubdtype(np.asarray(v).dtype, np.floating)
               else np.zeros(len(v), dtype=bool))
    av_is_nan = numeric and isinstance(av, float) and np.isnan(av)
    if av_is_nan:
        return nanmask & (ids > ad)
    with np.errstate(invalid="ignore"):
        past = (v < av) if desc else (v > av)
        tied = v == av
    return past | (tied & (ids > ad)) | nanmask


def _merge_group_sorted(
    parts_list: list[dict], k: int, desc: bool, final: bool
) -> dict:
    """Merge per-group SORT-mode top-hits partials ({group: (count,
    ids, sort_values)}): counts add, hit lists re-rank by (sort value
    asc/desc, doc asc).  Non-final levels keep the kth EXACT-value tie
    class (so the next merge level can still resolve ties doc-
    ascending); the final level cuts exactly k — the ES top_hits
    ``size`` contract."""
    merged: dict = {}
    for part in parts_list:
        for g, (c, ids, vals) in part.items():
            got = merged.get(g)
            if got is None:
                merged[g] = [c, [ids], [vals]]
            else:
                got[0] += c
                got[1].append(ids)
                got[2].append(vals)
    out: dict = {}
    for g, (c, idl, vl) in merged.items():
        ids = np.concatenate(idl)
        vals = np.concatenate(vl)
        keyv = _sort_key(vals, desc)
        order = np.lexsort((ids, keyv))
        if final or len(order) <= k:
            sel = order[:k]
        else:
            srt = keyv[order]
            cut = np.searchsorted(srt, srt[k - 1], side="right")
            sel = order[:cut]
        out[g] = (c, ids[sel], vals[sel])
    return out


def merge_opt_stats_partials(dst: dict, part: dict) -> dict:
    """Like :func:`merge_agg_partials` but treats ``None`` stats as
    ABSENT rather than poisoning (a shard can match docs for a filter
    bucket while having no valid stats values) — used by the filters
    aggregation where partial stats are optional per shard."""
    for g, (c, sm, mn, mx) in part.items():
        c0, s0, m0, x0 = dst.get(g, (0, None, None, None))
        dst[g] = (
            c0 + c,
            sm if s0 is None else (s0 if sm is None else s0 + sm),
            mn if m0 is None else (m0 if mn is None else min(m0, mn)),
            mx if x0 is None else (x0 if mx is None else max(x0, mx)),
        )
    return dst


def field_caps(index_dir: str) -> dict:
    """ES ``_field_caps`` analogue: every queryable field of an index →
    ``{"type", "searchable", "aggregatable"}``.  The analyzed text
    field (manifest ``text_col``) is searchable-not-aggregatable; every
    docmeta column is both (term/range predicates scan doc values, the
    agg machinery consumes them); arrow types map to the ES names
    (timestamp → date, integer → long, floating → double, string →
    keyword).  One schema read — no data touched."""
    from ..index.build import IndexInfo, docmeta_path

    info = IndexInfo(index_dir)
    parts = sorted(info.manifest.partitions, key=lambda p: p.doc_base)
    schema = pq.read_schema(
        docmeta_path(index_dir, parts[0].partition_id)
    )
    out = {
        info.manifest.text_col: {
            "type": "text", "searchable": True, "aggregatable": False,
        }
    }
    for f in schema:
        if pa.types.is_timestamp(f.type):
            t = "date"
        elif pa.types.is_integer(f.type):
            t = "long"
        elif pa.types.is_floating(f.type):
            t = "double"
        elif pa.types.is_boolean(f.type):
            t = "boolean"
        else:
            t = "keyword"
        out[f.name] = {
            "type": t, "searchable": True, "aggregatable": True,
        }
    return out


def merge_agg_partials(dst: dict, part: dict) -> dict:
    """Fold one (count, sum, min, max) aggregation partial into ``dst``
    in place — the associative bucket merge shared by the actor-level
    and driver-level folds."""
    for g, (c, sm, mn, mx) in part.items():
        if g in dst:
            c0, s0, m0, x0 = dst[g]
            dst[g] = (
                c0 + c,
                None if sm is None else s0 + sm,
                None if mn is None else min(m0, mn),
                None if mx is None else max(x0, mx),
            )
        else:
            dst[g] = (c, sm, mn, mx)
    return dst


def apply_fvf_modifier(
    v: np.ndarray, factor: float, modifier: str
) -> np.ndarray:
    """ES ``field_value_factor`` modifiers over ``factor · value`` —
    note ES's log family is base 10 (``log1p`` = log10(1+x)), not
    natural.  Shared by both engines (and the SQL oracles mirror the
    same expressions)."""
    x = factor * v
    if modifier in (None, "none"):
        return x
    if modifier == "log1p":
        return np.log10(1.0 + x)
    if modifier == "log2p":
        return np.log10(2.0 + x)
    if modifier == "sqrt":
        return np.sqrt(x)
    if modifier == "square":
        return x * x
    if modifier == "reciprocal":
        return 1.0 / x
    raise ValueError(f"unknown field_value_factor modifier {modifier!r}")


def apply_decay(
    v: np.ndarray, function: str, origin: float, scale: float,
    offset: float = 0.0, decay: float = 0.5,
) -> np.ndarray:
    """ES ``function_score`` decay functions over numeric/date doc
    values: distance = max(0, |value − origin| − offset), then

    - ``gauss``:  exp(ln(decay) · (distance/scale)²)
      (the standard exp(−d²/2σ²) with σ² = −scale²/(2·ln decay))
    - ``exp``:    exp(ln(decay) · distance/scale)  = decayᵈ/ˢᶜᵃˡᵉ
    - ``linear``: max(0, (s − distance)/s) with s = scale/(1 − decay)

    Docs MISSING the field take function value 1.0 (handled by the
    callers — ES's contract for decay over absent fields).  Shared by
    both engines; the SQL oracles mirror these exact formulations.
    Date fields pass through as epoch-micros doubles (origin/scale in
    micros)."""
    if scale <= 0:
        raise ValueError("decay scale must be > 0")
    if not (0.0 < decay < 1.0):
        raise ValueError("decay must be in (0, 1)")
    dist = np.maximum(0.0, np.abs(v - origin) - offset)
    if function == "gauss":
        return np.exp(math.log(decay) * (dist / scale) ** 2)
    if function == "exp":
        return np.exp(math.log(decay) * (dist / scale))
    if function == "linear":
        s = scale / (1.0 - decay)
        return np.maximum((s - dist) / s, 0.0)
    raise ValueError(f"unknown decay function {function!r}")


def prefix_expand_sorted(
    term_list: list[str], prefix: str, cap: int | None = None
) -> list[str]:
    """Terms of a SORTED dictionary starting with ``prefix``, in term
    order (bisect + bounded walk).  Shared by both engines."""
    import bisect

    lo = bisect.bisect_left(term_list, prefix)
    out: list[str] = []
    for i in range(lo, len(term_list)):
        if not term_list[i].startswith(prefix):
            break
        out.append(term_list[i])
        if cap is not None and len(out) >= cap:
            break
    return out


def range_expand_sorted(
    term_list: list[str], gte: str | None = None, lte: str | None = None,
    gt: str | None = None, lt: str | None = None, cap: int | None = None,
) -> list[str]:
    """Terms of a SORTED dictionary in the lexical range (ES range-query
    bounds gte/gt/lte/lt; open sides unbounded), in term order — two
    bisects, shared by both engines (the ES 8.16 intervals ``range``
    rule / Lucene TermRangeQuery expansion)."""
    import bisect

    if gt is not None:
        lo = bisect.bisect_right(term_list, gt)
    elif gte is not None:
        lo = bisect.bisect_left(term_list, gte)
    else:
        lo = 0
    if lt is not None:
        hi = bisect.bisect_left(term_list, lt)
    elif lte is not None:
        hi = bisect.bisect_right(term_list, lte)
    else:
        hi = len(term_list)
    out = term_list[lo:hi]
    return out[:cap] if cap is not None else out


def trailing_wildcard_literal(pattern: str) -> str:
    """The literal run AFTER the last wildcard char (empty when the
    pattern ends with ``*``/``?`` or has no wildcard)."""
    si = max((pattern.rindex(c) for c in "*?" if c in pattern), default=-1)
    return pattern[si + 1:]


def wildcard_expand_sorted(
    term_list: list[str],
    pattern: str,
    cap: int | None = None,
    rev_list: list[str] | None = None,
) -> list[str]:
    """Terms of a SORTED dictionary matching an ES wildcard pattern
    (``*`` any run, ``?`` one char), in term order: the literal prefix
    before the first wildcard bisects the range, a compiled regex
    filters within it.  Shared by both engines.

    Leading-wildcard patterns (``*suffix``) have no usable prefix; when
    the caller supplies ``rev_list`` — the same dictionary with every
    term REVERSED, sorted — and the pattern carries a trailing literal,
    the reversed suffix bisects ``rev_list`` instead of scanning the
    whole dictionary (Lucene's ``reverse_wildcard`` sub-field idea as a
    lazy per-actor structure; result set identical to the scan, output
    still in term order)."""
    import bisect
    import re as _re

    wi = min(
        (pattern.index(c) for c in "*?" if c in pattern), default=len(pattern)
    )
    lit = pattern[:wi]
    rx = _re.compile(
        "".join(
            ".*" if c == "*" else "." if c == "?" else _re.escape(c)
            for c in pattern
        )
        + r"\Z"
    )
    if not lit and rev_list is not None:
        rsuf = trailing_wildcard_literal(pattern)[::-1]
        if rsuf:
            lo = bisect.bisect_left(rev_list, rsuf)
            out = []
            for j in range(lo, len(rev_list)):
                rt = rev_list[j]
                if not rt.startswith(rsuf):
                    break
                t = rt[::-1]
                if rx.match(t):
                    out.append(t)
            out.sort()
            return out[:cap] if cap is not None else out
    lo = bisect.bisect_left(term_list, lit) if lit else 0
    out: list[str] = []
    for j in range(lo, len(term_list)):
        t = term_list[j]
        if lit and not t.startswith(lit):
            break
        if rx.match(t):
            out.append(t)
            if cap is not None and len(out) >= cap:
                break
    return out


def regexp_expand_sorted(
    term_list: list[str], pattern: str, cap: int | None = None
) -> list[str]:
    """Terms of a SORTED dictionary matching an ES ``regexp`` pattern,
    in term order.  Like Lucene, the pattern is ANCHORED (it must match
    the whole term); the pattern's leading literal run bisects the
    dictionary range and a compiled regex filters within it.  Syntax is
    the RE2/Python-re common subset (disclosed divergence from Lucene's
    regexp flavor — the optional ``~ & < > @`` operators are not
    supported; character classes, alternation, quantifiers and groups
    are).  Shared by both engines."""
    import bisect
    import re as _re

    meta = set(".?+*|{}[]()\\^$")
    wi = next(
        (i for i, c in enumerate(pattern) if c in meta), len(pattern)
    )
    lit = pattern[:wi]
    # a literal char FOLLOWED by ? * { may be absent from matches
    # ("ab*" matches "a") — back it out of the bisect prefix; shorter
    # prefix only widens the scanned range, never loses a match
    if wi < len(pattern) and pattern[wi] in "?*{" and lit:
        lit = lit[:-1]
    rx = _re.compile(pattern + r"\Z")
    lo = bisect.bisect_left(term_list, lit) if lit else 0
    out: list[str] = []
    for j in range(lo, len(term_list)):
        t = term_list[j]
        if lit and not t.startswith(lit):
            break
        if rx.match(t):
            out.append(t)
            if cap is not None and len(out) >= cap:
                break
    return out


def fuzzy_expand_sorted(
    term_list: list[str], term: str, max_edits: int = 1,
    prefix_length: int = 0, transpositions: bool = False,
) -> list[tuple[str, int]]:
    """Terms of a SORTED dictionary within edit distance ``max_edits``
    of ``term`` → [(term, distance)] in term order.  One vectorized DP
    over all length-eligible candidates (rows = candidates, columns =
    target chars); ``prefix_length`` chars must match exactly
    (bisect-bounded scan).  ``transpositions=True`` counts an adjacent
    swap as ONE edit (Damerau OSA — ES's ``fuzzy_transpositions``
    default; the oracle-checked pipelines keep plain Levenshtein, which
    is what DuckDB's ``levenshtein`` computes — disclosed).  Shared by
    the shard and term-partitioned engines."""
    import bisect

    if max_edits < 0:
        raise ValueError("max_edits must be >= 0")
    pre = term[:prefix_length]
    if pre:
        lo = bisect.bisect_left(term_list, pre)
        hi = lo
        while hi < len(term_list) and term_list[hi].startswith(pre):
            hi += 1
        cand_all = term_list[lo:hi]
    else:
        cand_all = term_list
    qlen = len(term)
    cand = [t for t in cand_all if abs(len(t) - qlen) <= max_edits]
    if not cand:
        return []
    if max_edits == 0:
        return [(term, 0)] if term in cand else []
    L = max(len(t) for t in cand)
    n = len(cand)
    M = np.zeros((n, L), dtype=np.uint32)
    lens = np.empty(n, dtype=np.int64)
    for i, t in enumerate(cand):
        b = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
        M[i, : len(b)] = b
        lens[i] = len(b)
    q = np.frombuffer(term.encode("utf-32-le"), dtype=np.uint32)
    prev = np.broadcast_to(np.arange(L + 1, dtype=np.int64), (n, L + 1)).copy()
    prev2 = None
    for i in range(len(q)):
        cur = np.empty_like(prev)
        cur[:, 0] = i + 1
        for j in range(L):
            sub = prev[:, j] + (M[:, j] != q[i])
            dele = prev[:, j + 1] + 1
            ins = cur[:, j] + 1
            best = np.minimum(np.minimum(sub, dele), ins)
            if transpositions and i > 0 and j > 0:
                # OSA: adjacent swap costs 1 (M[j-1],M[j]) == (q[i],q[i-1])
                swap = (M[:, j] == q[i - 1]) & (M[:, j - 1] == q[i])
                best = np.where(swap, np.minimum(best, prev2[:, j - 1] + 1),
                                best)
            cur[:, j + 1] = best
        prev2, prev = prev, cur
    dist = prev[np.arange(n), lens]
    keep = np.nonzero(dist <= max_edits)[0]
    return [(cand[i], int(dist[i])) for i in keep.tolist()]


def _select_topk(
    cand: np.ndarray, scores: np.ndarray, k: int, params: BM25Params
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic local top-k over candidate rows of a dense score
    array: (score desc, doc asc), keeping the whole kth tie class — with
    ``round_decimals`` set, ROUNDED-equal scores count as ties (so a
    downstream rounded re-rank can never disagree across the cut)."""
    if len(cand) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    cs = scores[cand]
    if len(cand) > k:
        kth = np.partition(cs, len(cs) - k)[len(cs) - k]
        r = params.round_decimals
        if r is not None:
            keep = np.round(cs, r) >= np.round(kth, r)
        else:
            keep = cs >= kth
        cand, cs = cand[keep], cs[keep]
    order = np.lexsort((cand, -cs))
    if params.round_decimals is None:
        order = order[:k]
    else:
        r = params.round_decimals
        cut = min(k, len(order))
        if cut and cut < len(order):
            kth_r = np.round(cs[order[cut - 1]], r)
            while cut < len(order) and np.round(cs[order[cut]], r) == kth_r:
                cut += 1
        order = order[:cut]
    return cand[order], cs[order]


class ShardData:
    """One shard's in-memory state: term dictionary + postings blobs +
    doc lengths for its doc range."""

    def __init__(self, info: IndexInfo, shard_id: int):
        self.shard_id = shard_id
        self._info = info  # kept for lazy docmeta column loads
        self._meta_cache: dict[str, np.ndarray] = {}
        st = info.manifest.shards[shard_id]
        self.doc_base = st.doc_base
        self.num_docs = st.num_docs
        seg = pq.read_table(info.segment_path(shard_id))
        # segment term column is sorted ascending (both build strategies
        # emit factorize(sort=True) order) — kept as a list so prefix
        # queries can bisect a term range without a global dictionary
        self.term_list: list[str] = seg.column("term").to_pylist()
        self.terms: dict[str, int] = {t: i for i, t in enumerate(self.term_list)}
        # ES index_phrases: 2-token shingle terms live beside unigrams in
        # the dictionary; phrase queries rewrite onto them, and every
        # dictionary WALK (prefix/wildcard/regexp/fuzzy) must skip them —
        # "hash\x1fjoin" startswith "hash"
        self.index_phrases = bool(
            getattr(info.manifest, "index_phrases", False)
        )
        self.shingle_positions = bool(
            getattr(info.manifest, "shingle_positions", True)
        )
        if self.index_phrases:
            from ..index.build import SHINGLE_SEP

            self.walk_term_list = [
                t for t in self.term_list if SHINGLE_SEP not in t
            ]
        else:
            self.walk_term_list = self.term_list
        self.df = seg.column("df").to_numpy()
        self.cf = seg.column("cf").to_numpy()
        self.max_tf = seg.column("max_tf").to_numpy()
        self.blobs = seg.column("postings").to_pylist()
        # positional sidecar (store_positions builds) — None otherwise
        self.posblobs = (
            seg.column("positions").to_pylist()
            if "positions" in seg.column_names else None
        )
        dls = []
        for p in info.docmeta_paths(shard_id):
            dls.append(pq.read_table(p, columns=["dl"]).column("dl").to_numpy())
        self.dl = np.concatenate(dls).astype(np.float64) if dls else np.zeros(0)
        if len(self.dl) != self.num_docs:
            raise RuntimeError(
                f"shard {shard_id}: docmeta rows {len(self.dl)} != {self.num_docs}"
            )
        # tombstones (Lucene-style delete mask, loaded once per actor)
        from ..index.deletes import load_deletes

        deleted = load_deletes(info.index_dir, shard_id)
        self.deleted_mask = np.zeros(self.num_docs, dtype=bool)
        if len(deleted):
            self.deleted_mask[deleted - self.doc_base] = True

    def local_df(self, term: str) -> int:
        i = self.terms.get(term)
        return int(self.df[i]) if i is not None else 0

    def local_cf(self, term: str) -> int:
        i = self.terms.get(term)
        return int(self.cf[i]) if i is not None else 0

    def dense_topk(
        self,
        terms: list[str],
        idf: dict[str, float],
        params: BM25Params,
        avgdl: float,
        k: int,
        after: tuple[float, int] | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Exact local top-k via a dense score array over the shard's range.

        Accumulation order = sorted unique terms, float64 — pinned to the
        oracle's (SURVEY.md §7.4 rank-identity contract).

        ``after`` = (score, global doc_id) is the ES ``search_after``
        cursor: only docs strictly after it in (score desc, doc asc)
        order are candidates — applied BEFORE local top-k selection, so
        deep pagination never loses docs a shard's first page hid.
        Scores compare ROUNDED when ``params.round_decimals`` is set (the
        tie order the merge and the oracle use)."""
        scores, touched = self.dense_scores(terms, idf, params, avgdl)
        touched &= ~self.deleted_mask
        cand = np.nonzero(touched)[0]
        if after is not None:
            cur_s, cur_d = after
            r = params.round_decimals
            cs_cmp = np.round(scores[cand], r) if r is not None else scores[cand]
            gdocs = cand + self.doc_base
            keep = (cs_cmp < cur_s) | ((cs_cmp == cur_s) & (gdocs > cur_d))
            cand = cand[keep]
        cand, cs = _select_topk(cand, scores, k, params)
        return (cand + self.doc_base).astype(np.int64), cs

    def dense_scores(
        self,
        terms: list[str],
        idf: dict[str, float],
        params: BM25Params,
        avgdl: float,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Full BM25 score + touched arrays over the shard's doc range
        (sorted-term accumulation order, float64 — the rank-identity
        pin).  Shared by dense_topk and the multi-field combiner."""
        k1, b = params.k1, params.b
        scores = np.zeros(self.num_docs, dtype=np.float64)
        touched = np.zeros(self.num_docs, dtype=bool)
        for t in terms:  # caller passes sorted unique terms
            i = self.terms.get(t)
            if i is None:
                continue
            doc_ids, tfs = decode_postings(self.blobs[i])
            idx = (doc_ids - np.uint64(self.doc_base)).astype(np.int64)
            tf = tfs.astype(np.float64)
            dl = self.dl[idx]
            norm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            scores[idx] += idf[t] * norm
            touched[idx] = True
        return scores, touched

    def sparse_topk(
        self,
        items: tuple[tuple[str, float], ...],
        params: BM25Params,
        k: int,
    ) -> tuple[np.ndarray, np.ndarray]:
        """ES ``sparse_vector`` query (8.x learned-sparse retrieval)
        over this shard: score = Σ query_weight(token) × stored term
        impact.  ES stores model weights (ELSER) as term impacts; this
        index's impact is the term frequency — the dot-product algebra,
        top-k machinery and rank contract are identical, the weights'
        provenance differs (disclosed; no model ships in this repo).
        ``items`` = (token, weight) pairs SORTED by token — the
        accumulation-order pin that keeps float sums identical to the
        oracle.  Tokens are index terms verbatim (a sparse query vector
        comes from a model vocabulary, not the analyzer)."""
        scores = np.zeros(self.num_docs, dtype=np.float64)
        touched = np.zeros(self.num_docs, dtype=bool)
        for t, w in items:
            i = self.terms.get(t)
            if i is None:
                continue
            doc_ids, tfs = decode_postings(self.blobs[i])
            idx = (doc_ids - np.uint64(self.doc_base)).astype(np.int64)
            scores[idx] += w * tfs.astype(np.float64)
            touched[idx] = True
        touched &= ~self.deleted_mask
        cand = np.nonzero(touched)[0]
        cand, cs = _select_topk(cand, scores, k, params)
        return (cand + self.doc_base).astype(np.int64), cs

    def synonym_topk(
        self,
        slots: tuple[tuple[str, ...], ...],
        idf_slots: tuple[float, ...],
        params: BM25Params,
        avgdl: float,
        k: int,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Lucene ``SynonymQuery`` serving over this shard (what ES
        ``match`` becomes when the analyzer's synonym filter emits
        interchangeable terms at one position): each slot scores as ONE
        pseudo-term — tf = Σ members' frequencies in the doc
        (SynonymScorer), idf from the coordinator's BLENDED slot df
        (max over members, Lucene's ``docFreq``).  A doc matching ANY
        member of ANY slot is eligible (match disjunction)."""
        k1, b = params.k1, params.b
        scores = np.zeros(self.num_docs, dtype=np.float64)
        touched = np.zeros(self.num_docs, dtype=bool)
        for slot, idf in zip(slots, idf_slots):  # coordinator-pinned order
            tf = np.zeros(self.num_docs, dtype=np.float64)
            hit = np.zeros(self.num_docs, dtype=bool)
            for t in slot:  # members sorted — the float-sum pin
                i = self.terms.get(t)
                if i is None:
                    continue
                doc_ids, tfs = decode_postings(self.blobs[i])
                idx = (doc_ids - np.uint64(self.doc_base)).astype(np.int64)
                tf[idx] += tfs.astype(np.float64)
                hit[idx] = True
            cand = np.nonzero(hit)[0]
            if len(cand) == 0:
                continue
            tfc = tf[cand]
            dl = self.dl[cand]
            scores[cand] += idf * tfc * (k1 + 1.0) / (
                tfc + k1 * (1.0 - b + b * dl / avgdl)
            )
            touched |= hit
        touched &= ~self.deleted_mask
        cand = np.nonzero(touched)[0]
        cand, cs = _select_topk(cand, scores, k, params)
        return (cand + self.doc_base).astype(np.int64), cs

    def bool_topk(
        self,
        must: list[str],
        should: list[str],
        must_not: list[str],
        filters: list[str],
        idf: dict[str, float],
        params: BM25Params,
        avgdl: float,
        k: int,
        minimum_should_match: int | None = None,
        meta_filters: dict | None = None,
        range_filters: dict | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """ES-style ``bool`` query over the shard (exact local top-k).

        Clause semantics (``/root/reference`` delegates these to
        Elasticsearch's bool query; restated here over our own postings):

        * ``must``    — every term must occur in the doc; contributes score
        * ``filter``  — every term must occur; contributes NO score
        * ``must_not``— any term occurring excludes the doc
        * ``should``  — optional, contributes score; when the query has no
          must/filter clause at least ``minimum_should_match`` (default 1)
          should-terms must match; an EXPLICIT minimum_should_match is
          enforced even alongside must/filter (ES behavior)

        Scoring terms = sorted unique (must ∪ should); a term present in
        both clauses is scored once (single combined BM25 sum, matching
        the SQL oracle).  Deleted docs are masked like dense_topk.
        """
        k1, b = params.k1, params.b
        must_s, should_s = sorted(set(must)), sorted(set(should))
        filt_s, not_s = sorted(set(filters)), sorted(set(must_not))
        scoring = sorted(set(must_s) | set(should_s))

        decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}

        def postings_idx(t: str) -> tuple[np.ndarray, np.ndarray] | None:
            if t not in decoded:
                i = self.terms.get(t)
                if i is None:
                    decoded[t] = None
                else:
                    doc_ids, tfs = decode_postings(self.blobs[i])
                    idx = (doc_ids - np.uint64(self.doc_base)).astype(np.int64)
                    decoded[t] = (idx, tfs)
            return decoded[t]

        n = self.num_docs
        scores = np.zeros(n, dtype=np.float64)
        for t in scoring:  # sorted order — pinned to the oracle
            p = postings_idx(t)
            if p is None:
                continue
            idx, tfs = p
            tf = tfs.astype(np.float64)
            dl = self.dl[idx]
            norm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            scores[idx] += idf[t] * norm

        ok = self._bool_eligible(
            must_s, should_s, not_s, filt_s, minimum_should_match,
            meta_filters, range_filters, postings_idx,
        )
        cand = np.nonzero(ok)[0]
        cand, cs = _select_topk(cand, scores, k, params)
        return (cand + self.doc_base).astype(np.int64), cs

    def terms_set_topk(
        self,
        terms: list[str],
        minimum_field: str,
        idf: dict[str, float],
        params: BM25Params,
        avgdl: float,
        k: int,
    ) -> tuple[np.ndarray, np.ndarray]:
        """ES ``terms_set`` query over the shard: a doc is a candidate
        when it contains ≥1 of the (distinct) terms AND its count of
        matching distinct terms is ≥ the doc's OWN value of
        ``minimum_field`` (the ``minimum_should_match_field``
        semantics — a doc whose field value exceeds the number of query
        terms can never match; a value ≤ 0 gates nothing beyond the
        ≥1-match floor; both pinned in the oracle).  Score = BM25 sum
        over the matched terms, same tie contract as bool."""
        k1, b = params.k1, params.b
        terms_s = sorted(set(terms))
        n = self.num_docs
        scores = np.zeros(n, dtype=np.float64)
        count = np.zeros(n, dtype=np.int64)
        for t in terms_s:  # sorted order — pinned to the oracle
            i = self.terms.get(t)
            if i is None:
                continue
            doc_ids, tfs = decode_postings(self.blobs[i])
            idx = (doc_ids - np.uint64(self.doc_base)).astype(np.int64)
            tf = tfs.astype(np.float64)
            dl = self.dl[idx]
            norm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            scores[idx] += idf[t] * norm
            count[idx] += 1
        m = self.meta_col(minimum_field)
        ok = (count >= 1) & (count >= m) & ~self.deleted_mask
        cand = np.nonzero(ok)[0]
        cand, cs = _select_topk(cand, scores, k, params)
        return (cand + self.doc_base).astype(np.int64), cs

    def agg_top_hits(
        self,
        clauses: dict,
        idf: dict[str, float],
        params: "BM25Params",
        avgdl: float,
        group_col: str,
        k: int,
        sort: tuple[str, str] | None = None,
    ) -> dict:
        """Per-shard partial for an ES ``top_hits`` sub-aggregation
        under a ``terms`` bucket: group value → (total match count,
        local top-k GLOBAL doc ids, scores) — wire O(groups × k), never
        O(matches).  Scoring and eligibility are exactly
        :meth:`bool_topk`'s; ordering is the serving tie contract
        (rounded score desc, doc asc).  Docs with a missing group value
        are omitted (ES terms-source semantics).

        With ``sort=(field, "asc"|"desc")`` (the ES top_hits ``sort``
        option) hits rank by that numeric/date doc-values column
        instead of BM25 — no scoring pass at all — and the third slot
        of each partial carries the SORT VALUES; the shard cut keeps
        the kth EXACT-value tie class so a shard boundary can never
        decide a sort tie (the merge resolves it doc-ascending)."""
        from .datehist import valid_mask

        k1, b = params.k1, params.b
        must_s = sorted(set(clauses.get("must", [])))
        should_s = sorted(set(clauses.get("should", [])))
        not_s = sorted(set(clauses.get("must_not", [])))
        filt_s = sorted(set(clauses.get("filter", [])))
        scoring = sorted(set(must_s) | set(should_s))
        postings_idx = self._postings_idx_fn()
        n = self.num_docs
        scores = np.zeros(n, dtype=np.float64)
        if sort is None:
            for t in scoring:  # sorted order — pinned to the oracle
                p = postings_idx(t)
                if p is None:
                    continue
                idx, tfs = p
                tf = tfs.astype(np.float64)
                dl = self.dl[idx]
                norm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
                scores[idx] += idf[t] * norm
        ok = self._bool_eligible(
            must_s, should_s, not_s, filt_s, clauses.get("msm"),
            clauses.get("meta_filters"), clauses.get("range_filters"),
            postings_idx,
        )
        cand = np.nonzero(ok)[0]
        if len(cand) == 0:
            return {}
        groups = self.meta_col(group_col)[cand]
        vm = valid_mask(groups)
        if not vm.all():
            cand, groups = cand[vm], groups[vm]
            if len(cand) == 0:
                return {}
        from .datehist import per_group_head

        if sort is not None:
            field, direction = sort
            v = self.meta_col(field)[cand]
            keyv = _sort_key(v, direction == "desc")
            ug, ginv = np.unique(groups, return_inverse=True)
            order = np.lexsort((cand, keyv, ginv))
            counts = np.bincount(ginv, minlength=len(ug))
            out = {}
            for gi, m in per_group_head(ginv, order, k, tie_vals=keyv):
                g = ug[gi]
                out[g.item() if hasattr(g, "item") else g] = (
                    int(counts[gi]),
                    (cand[m] + self.doc_base).astype(np.int64),
                    v[m],
                )
            return out

        sc = scores[cand]
        r = (
            np.round(sc, params.round_decimals)
            if params.round_decimals is not None else sc
        )
        ug, ginv = np.unique(groups, return_inverse=True)
        order = np.lexsort((cand, -r, ginv))
        counts = np.bincount(ginv, minlength=len(ug))
        out = {}
        # tie_vals=r: the shard cut keeps the ROUNDED kth tie class so a
        # shard boundary can never decide a rounded tie (merge resolves
        # it doc-ascending, like serving)
        for gi, m in per_group_head(ginv, order, k, tie_vals=r):
            g = ug[gi]
            out[g.item() if hasattr(g, "item") else g] = (
                int(counts[gi]),
                (cand[m] + self.doc_base).astype(np.int64),
                scores[cand[m]],
            )
        return out

    def agg_join_children(
        self,
        clauses: dict,
        idf: dict[str, float],
        params: "BM25Params",
        avgdl: float,
        parent_field: str,
    ) -> dict:
        """Per-shard partial for ES ``has_child``: this shard's matched
        CHILD docs (rows whose ``parent_field`` differs from their own
        doc id) grouped by parent — ``{parent: (n, Σscore, min, max)}``
        over SERVING-rounded scores.  Associative, O(parents) wire;
        correct even when a family straddles a shard boundary.  Scoring
        and eligibility are exactly :meth:`agg_top_hits`'s."""
        from .joinfield import group_child_scores

        k1, b = params.k1, params.b
        must_s = sorted(set(clauses.get("must", [])))
        should_s = sorted(set(clauses.get("should", [])))
        not_s = sorted(set(clauses.get("must_not", [])))
        filt_s = sorted(set(clauses.get("filter", [])))
        scoring = sorted(set(must_s) | set(should_s))
        postings_idx = self._postings_idx_fn()
        scores = np.zeros(self.num_docs, dtype=np.float64)
        for t in scoring:  # sorted order — pinned to the oracle
            p = postings_idx(t)
            if p is None:
                continue
            idx, tfs = p
            tf = tfs.astype(np.float64)
            dl = self.dl[idx]
            norm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            scores[idx] += idf[t] * norm
        ok = self._bool_eligible(
            must_s, should_s, not_s, filt_s, clauses.get("msm"),
            clauses.get("meta_filters"), clauses.get("range_filters"),
            postings_idx,
        )
        cand = np.nonzero(ok)[0]
        if len(cand) == 0:
            return {}
        sc = scores[cand]
        if params.round_decimals is not None:
            sc = np.round(sc, params.round_decimals)
        parents = self.meta_col(parent_field)[cand].astype(np.int64)
        return group_child_scores(parents, cand + self.doc_base, sc)

    def meta_pairs_in(
        self, field: str, values: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Live docs of this shard whose ``field`` doc value is IN the
        broadcast ``values`` set: (global ids, field values) — the
        ``has_parent`` child scan (ES resolves the same join via global
        ordinals per shard; here it is one vectorized ``isin`` over the
        cached doc-values column)."""
        v = self.meta_col(field)
        m = np.isin(v, values) & ~self.deleted_mask
        idx = np.nonzero(m)[0]
        return (idx + self.doc_base).astype(np.int64), v[idx]

    def meta_values_of(
        self, ids: np.ndarray, field: str
    ) -> tuple[np.ndarray, np.ndarray]:
        """(resident global ids, ``field`` doc values) for the broadcast
        SORTED doc-id set — live rows only.  The inverse of
        :meth:`meta_pairs_in`: lookup by DOC ID rather than by value
        (two searchsorteds bound this shard's slice, no isin scan)."""
        lo = np.searchsorted(ids, self.doc_base)
        hi = np.searchsorted(ids, self.doc_base + self.num_docs)
        loc = (ids[lo:hi] - self.doc_base).astype(np.int64)
        if len(loc):
            loc = loc[~self.deleted_mask[loc]]
        return (loc + self.doc_base).astype(np.int64), self.meta_col(field)[loc]

    def agg_children_of(
        self,
        parent_field: str,
        pids: np.ndarray,
        pkeys: np.ndarray,
        stats_col: str | None = None,
    ) -> dict:
        """Per-shard partial for the ES ``children`` aggregation: this
        shard's CHILD rows whose parent is in the broadcast matched-
        parent set, bucketed by the PARENT's key — ``{key: (n, Σ, min,
        max)}`` over ``stats_col``.  ``pids`` (sorted) / ``pkeys``
        (aligned) ship once via ``ray.put``; associative partials keep
        the join correct across family-straddling shard boundaries."""
        from .joinfield import keyed_partials

        if len(pids) == 0:
            return {}
        v = self.meta_col(parent_field).astype(np.int64)
        gids = np.arange(self.num_docs, dtype=np.int64) + self.doc_base
        idxs = np.nonzero((v != gids) & ~self.deleted_mask)[0]
        if len(idxs) == 0:
            return {}
        p = v[idxs]
        pos = np.clip(np.searchsorted(pids, p), 0, len(pids) - 1)
        ok = pids[pos] == p
        idxs, pos = idxs[ok], pos[ok]
        if len(idxs) == 0:
            return {}
        vals = (
            self.meta_col(stats_col)[idxs].astype(np.float64)
            if stats_col is not None else None
        )
        return keyed_partials(pkeys[pos], vals)

    def agg_ids_buckets(
        self, ids: np.ndarray, group_col: str, stats_col: str | None = None
    ) -> dict:
        """Terms-agg partial over the resident docs of a broadcast doc-id
        set (the ES ``parent`` aggregation's second round: buckets over
        the joined parent docs)."""
        m = np.zeros(self.num_docs, dtype=bool)
        sel = ids[(ids >= self.doc_base) & (ids < self.doc_base + self.num_docs)]
        m[(sel - self.doc_base).astype(np.int64)] = True
        m &= ~self.deleted_mask
        return self._agg_over_mask(m, group_col, stats_col)

    def _bool_eligible(
        self, must_s, should_s, not_s, filt_s, minimum_should_match,
        meta_filters, range_filters, postings_idx,
    ) -> np.ndarray:
        """The bool clause algebra as a live-doc eligibility mask —
        shared by top-k serving and aggregations-over-bool."""
        n = self.num_docs
        ok = ~self.deleted_mask
        if meta_filters or range_filters:
            # ES keyword-field term/terms + numeric range filters
            # (non-scoring, like the ``filter`` clause) over docmeta
            ok = ok & self.meta_mask(meta_filters or {}, range_filters)
        if must_s:
            hits = np.zeros(n, dtype=np.int32)
            for t in must_s:
                p = postings_idx(t)
                if p is None:  # term absent from this shard → no doc matches
                    hits[:] = -1
                    break
                hits[p[0]] += 1
            ok = ok & (hits == len(must_s))
        if filt_s:
            fhits = np.zeros(n, dtype=np.int32)
            for t in filt_s:
                p = postings_idx(t)
                if p is None:
                    fhits[:] = -1
                    break
                fhits[p[0]] += 1
            ok = ok & (fhits == len(filt_s))
        if not_s:
            excl = np.zeros(n, dtype=bool)
            for t in not_s:
                p = postings_idx(t)
                if p is not None:
                    excl[p[0]] = True
            ok = ok & ~excl
        msm = minimum_should_match
        if msm is None:
            msm = 0 if (must_s or filt_s) else (1 if should_s else 0)
        if msm > 0:
            shits = np.zeros(n, dtype=np.int32)
            for t in should_s:
                p = postings_idx(t)
                if p is not None:
                    shits[p[0]] += 1
            ok = ok & (shits >= msm)
        elif not (must_s or filt_s):
            # no clause constrains the doc set → nothing matches (ES: an
            # empty bool query matches all docs, but an all-docs scan is
            # never what a top-k caller wants; fail loud instead)
            raise ValueError("bool query needs at least one positive clause")
        return ok

    def _postings_idx_fn(self):
        decoded: dict[str, tuple | None] = {}

        def postings_idx(t: str):
            if t not in decoded:
                i = self.terms.get(t)
                if i is None:
                    decoded[t] = None
                else:
                    doc_ids, tfs = decode_postings(self.blobs[i])
                    idx = (doc_ids - np.uint64(self.doc_base)).astype(np.int64)
                    decoded[t] = (idx, tfs)
            return decoded[t]

        return postings_idx

    def agg_background(self, group_col: str,
                       stats_col: str | None = None) -> dict:
        """Corpus-side (background) buckets of a keyword column over ALL
        live docs — the denominator set of ES ``significant_terms`` AND
        the ES ``global`` aggregation (terms + optional stats sub-agg
        ignoring the query scope).  One pass, cacheable upstream."""
        return self._agg_over_mask(~self.deleted_mask, group_col, stats_col)

    def agg_missing(
        self, clauses: dict, field: str, stats_col: str | None = None
    ) -> tuple:
        """Per-shard partial for the ES ``missing`` aggregation: matched
        docs whose ``field`` doc value is ABSENT — (n, Σ, min, max) over
        ``stats_col`` (an extstats-shaped associative tuple; count-only
        when ``stats_col`` is None)."""
        from .datehist import valid_mask

        ok = self._bool_eligible(
            sorted(set(clauses.get("must", []))),
            sorted(set(clauses.get("should", []))),
            sorted(set(clauses.get("must_not", []))),
            sorted(set(clauses.get("filter", []))),
            clauses.get("msm"),
            clauses.get("meta_filters"),
            clauses.get("range_filters"),
            self._postings_idx_fn(),
        )
        miss = ok & ~valid_mask(self.meta_col(field))
        idxs = np.nonzero(miss)[0]
        if stats_col is None or len(idxs) == 0:
            return (int(len(idxs)), 0, 0.0, np.inf, -np.inf)
        v = self.meta_col(stats_col)[idxs].astype(np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return (int(len(idxs)), 0, 0.0, np.inf, -np.inf)
        return (int(len(idxs)), int(len(v)), float(v.sum()),
                float(v.min()), float(v.max()))

    def agg_match_bool(
        self,
        clauses: dict,
        group_col: str,
        stats_col: str | None = None,
    ) -> dict:
        """:meth:`agg_match` with the match set defined by a full bool
        query (ES: any ``query`` under a ``terms`` aggregation)."""
        ok = self._bool_eligible(
            sorted(set(clauses.get("must", []))),
            sorted(set(clauses.get("should", []))),
            sorted(set(clauses.get("must_not", []))),
            sorted(set(clauses.get("filter", []))),
            clauses.get("msm"),
            clauses.get("meta_filters"),
            clauses.get("range_filters"),
            self._postings_idx_fn(),
        )
        return self._agg_over_mask(ok, group_col, stats_col)

    def agg_date_histogram(
        self,
        clauses: dict,
        field: str,
        interval: str,
        stats_col: str | None = None,
        group_col: str | None = None,
        time_zone: str | None = None,
        offset=None,
    ) -> dict:
        """Per-shard partial for an ES ``date_histogram`` aggregation over
        the docs matching a bool query: bucket-start epoch micros →
        (doc_count, sum, min, max) of ``stats_col``.  The date field is a
        stored docmeta column (timestamps load as epoch-micros doc
        values); bucketing is one vectorized floor
        (:func:`..search.datehist.floor_interval_us`)."""
        from .datehist import floor_interval_us, partial_over_values

        ok = self._bool_eligible(
            sorted(set(clauses.get("must", []))),
            sorted(set(clauses.get("should", []))),
            sorted(set(clauses.get("must_not", []))),
            sorted(set(clauses.get("filter", []))),
            clauses.get("msm"),
            clauses.get("meta_filters"),
            clauses.get("range_filters"),
            self._postings_idx_fn(),
        )
        idxs = np.nonzero(ok)[0]
        if len(idxs) == 0:
            return {}
        from .datehist import valid_mask

        fv = self.meta_col(field)[idxs]
        vm = valid_mask(fv)
        if not vm.all():
            # ES date_histogram omits docs with a missing field value
            idxs, fv = idxs[vm], fv[vm]
            if len(idxs) == 0:
                return {}
        if offset is not None:
            from .datehist import floor_interval_us_offset

            keys = floor_interval_us_offset(fv, interval, offset, time_zone)
        elif time_zone is not None:
            from .datehist import floor_interval_us_tz

            keys = floor_interval_us_tz(fv, interval, time_zone)
        else:
            keys = floor_interval_us(fv, interval)
        vals = (
            self.meta_col(stats_col)[idxs].astype(np.float64)
            if stats_col is not None
            else None
        )
        if group_col is not None:
            # terms SUB-aggregation: composite (bucket, term) keys,
            # factorized (no per-row Python tuples); docs with a missing
            # group value are omitted (ES terms-source semantics)
            from .datehist import partial_over_pairs, valid_mask

            gv = self.meta_col(group_col)[idxs]
            ok = valid_mask(gv)
            if not ok.all():
                keys, gv = keys[ok], gv[ok]
                if vals is not None:
                    vals = vals[ok]
            return partial_over_pairs(keys, gv, vals)
        return partial_over_values(keys, vals)

    def agg_range(
        self,
        clauses: dict,
        field: str,
        ranges: list[tuple[float | None, float | None]],
        stats_col: str | None = None,
    ) -> dict:
        """Per-shard partial for an ES ``range`` / ``date_range``
        aggregation over the docs matching a bool query: range INDEX →
        (doc_count, sum, min, max) of ``stats_col``.  ES semantics —
        ``from`` inclusive, ``to`` exclusive, open ends, a doc lands in
        EVERY overlapping range (so doc_counts can exceed the match
        count); date fields bucket on epoch-micro doc values."""
        from .datehist import bucket_partial

        ok = self._bool_eligible(
            sorted(set(clauses.get("must", []))),
            sorted(set(clauses.get("should", []))),
            sorted(set(clauses.get("must_not", []))),
            sorted(set(clauses.get("filter", []))),
            clauses.get("msm"),
            clauses.get("meta_filters"),
            clauses.get("range_filters"),
            self._postings_idx_fn(),
        )
        idxs = np.nonzero(ok)[0]
        if len(idxs) == 0:
            return {}
        vals = (
            self.meta_col(stats_col)[idxs].astype(np.float64)
            if stats_col is not None
            else None
        )
        return bucket_partial(
            self.meta_col(field)[idxs], ("ranges", ranges), vals
        )

    def agg_histogram(
        self,
        clauses: dict,
        field: str,
        interval: float,
        offset: float = 0.0,
        stats_col: str | None = None,
    ) -> dict:
        """Per-shard partial for an ES numeric ``histogram`` aggregation:
        key = floor((v - offset)/interval)*interval + offset."""
        from .datehist import bucket_partial

        ok = self._bool_eligible(
            sorted(set(clauses.get("must", []))),
            sorted(set(clauses.get("should", []))),
            sorted(set(clauses.get("must_not", []))),
            sorted(set(clauses.get("filter", []))),
            clauses.get("msm"),
            clauses.get("meta_filters"),
            clauses.get("range_filters"),
            self._postings_idx_fn(),
        )
        idxs = np.nonzero(ok)[0]
        if len(idxs) == 0:
            return {}
        vals = (
            self.meta_col(stats_col)[idxs].astype(np.float64)
            if stats_col is not None
            else None
        )
        return bucket_partial(
            self.meta_col(field)[idxs], ("histogram", (interval, offset)),
            vals,
        )

    def agg_composite(
        self,
        clauses: dict,
        sources: list[tuple],
        size: int,
        after: tuple | None,
    ) -> dict:
        """Per-shard partial for an ES ``composite`` aggregation:
        ``sources`` = [(name, kind, field, *args)] with kind ∈ terms /
        date_histogram / histogram; returns the shard's ≤ ``size``
        smallest composite keys strictly after the cursor (O(size) wire
        — see ``datehist.composite_partial``)."""
        from .datehist import composite_partial, composite_source_keys

        ok = self._bool_eligible(
            sorted(set(clauses.get("must", []))),
            sorted(set(clauses.get("should", []))),
            sorted(set(clauses.get("must_not", []))),
            sorted(set(clauses.get("filter", []))),
            clauses.get("msm"),
            clauses.get("meta_filters"),
            clauses.get("range_filters"),
            self._postings_idx_fn(),
        )
        idxs = np.nonzero(ok)[0]
        if len(idxs) == 0:
            return {}
        from .datehist import valid_mask

        raw = [self.meta_col(src[2])[idxs] for src in sources]
        vm = valid_mask(raw[0])
        for c in raw[1:]:
            vm &= valid_mask(c)
        if not vm.all():
            # validity must be judged on RAW values — a transformed key
            # (floored NaN timestamp) is garbage, not null
            raw = [c[vm] for c in raw]
        key_cols = [
            composite_source_keys(tuple(src[1:2]) + tuple(src[3:]), c)
            for src, c in zip(sources, raw)
        ]
        return composite_partial(key_cols, size, after)

    def agg_extended_stats(
        self, clauses: dict, field: str
    ) -> tuple[int, float, float, float, float]:
        """Per-shard partial for ES ``extended_stats``: (count, sum,
        sum_of_squares, min, max) — associative, O(1) wire."""
        ok = self._bool_eligible(
            sorted(set(clauses.get("must", []))),
            sorted(set(clauses.get("should", []))),
            sorted(set(clauses.get("must_not", []))),
            sorted(set(clauses.get("filter", []))),
            clauses.get("msm"),
            clauses.get("meta_filters"),
            clauses.get("range_filters"),
            self._postings_idx_fn(),
        )
        idxs = np.nonzero(ok)[0]
        v = self.meta_col(field)[idxs].astype(np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return (0, 0.0, 0.0, np.inf, -np.inf)
        return (
            int(len(v)), float(v.sum()), float((v * v).sum()),
            float(v.min()), float(v.max()),
        )

    def sort_topk(
        self, clauses: dict, field: str, desc: bool, k: int,
        after: tuple | None = None,
    ) -> tuple[int, np.ndarray, np.ndarray]:
        """Per-shard partial for a BODY-level field sort (ES ``sort``):
        (match count, top-k GLOBAL doc ids by the doc-values column,
        their sort values) — wire O(k), never O(matches).  The cut
        keeps the kth EXACT-value tie class (the merge resolves ties
        doc-ascending); numeric/date NaNs sort LAST either direction
        (numpy's NaN ordering = ES ``missing: _last``).

        ``after = (sort_value, global_doc_id)`` is the ES
        ``search_after`` cursor: only rows strictly past it in
        (value-key, doc) order survive — pushed into the shard cut so
        page depth never inflates the wire."""
        from .datehist import per_group_head

        ok = self._bool_eligible(
            sorted(set(clauses.get("must", []))),
            sorted(set(clauses.get("should", []))),
            sorted(set(clauses.get("must_not", []))),
            sorted(set(clauses.get("filter", []))),
            clauses.get("msm"),
            clauses.get("meta_filters"),
            clauses.get("range_filters"),
            self._postings_idx_fn(),
        )
        cand = np.nonzero(ok)[0]
        if len(cand) == 0:
            return (0, np.empty(0, np.int64), np.empty(0, np.float64))
        v = self.meta_col(field)[cand]
        total = int(len(cand))
        if after is not None:
            gids = cand + self.doc_base
            keep = _after_mask(v, gids, after, desc)
            cand, v = cand[keep], v[keep]
            if len(cand) == 0:
                return (total, np.empty(0, np.int64),
                        np.empty(0, np.float64))
        keyv = _sort_key(v, desc)
        order = np.lexsort((cand, keyv))
        ginv = np.zeros(len(cand), dtype=np.int64)  # one group: the page
        for _gi, m in per_group_head(ginv, order, k, tie_vals=keyv):
            return (total,
                    (cand[m] + self.doc_base).astype(np.int64), v[m])
        return (total, np.empty(0, np.int64), np.empty(0, np.float64))

    def agg_field_counts(
        self, clauses: dict, field: str, weight_field: str | None = None
    ) -> dict:
        """Per-shard partial for the metric aggs ``value_count`` /
        ``missing`` / ``weighted_avg`` (see
        ``datehist.field_counts_partial``) — associative, O(1) wire."""
        from .datehist import field_counts_partial

        ok = self._bool_eligible(
            sorted(set(clauses.get("must", []))),
            sorted(set(clauses.get("should", []))),
            sorted(set(clauses.get("must_not", []))),
            sorted(set(clauses.get("filter", []))),
            clauses.get("msm"),
            clauses.get("meta_filters"),
            clauses.get("range_filters"),
            self._postings_idx_fn(),
        )
        idxs = np.nonzero(ok)[0]
        fv = self.meta_col(field)[idxs]
        wv = (
            self.meta_col(weight_field)[idxs]
            if weight_field is not None else None
        )
        return field_counts_partial(fv, wv)

    def agg_values(
        self, clauses: dict, field: str, sketch_k: int | None = None
    ) -> object:
        """Per-shard partial for ES ``percentiles``: exact mode returns
        the shard's SORTED matched values; sketch mode returns a
        log-bucket count dict (``pctl_sketch_partial``) whose size is
        bounded by the value range, not the match count — the 10^12-row
        path."""
        ok = self._bool_eligible(
            sorted(set(clauses.get("must", []))),
            sorted(set(clauses.get("should", []))),
            sorted(set(clauses.get("must_not", []))),
            sorted(set(clauses.get("filter", []))),
            clauses.get("msm"),
            clauses.get("meta_filters"),
            clauses.get("range_filters"),
            self._postings_idx_fn(),
        )
        idxs = np.nonzero(ok)[0]
        v = self.meta_col(field)[idxs].astype(np.float64)
        v = v[~np.isnan(v)]
        if sketch_k is not None:
            from .datehist import pctl_sketch_partial

            return pctl_sketch_partial(v, sketch_k)
        return np.sort(v)

    def agg_cardinality(
        self, clauses: dict, field: str, hll_p: int | None = None
    ) -> object:
        """Per-shard partial for an ES ``cardinality`` aggregation over
        the docs matching a bool query: exact mode returns the shard's
        distinct value array (union-merged upstream); approx mode
        returns HLL registers (2^p bytes regardless of cardinality)."""
        ok = self._bool_eligible(
            sorted(set(clauses.get("must", []))),
            sorted(set(clauses.get("should", []))),
            sorted(set(clauses.get("must_not", []))),
            sorted(set(clauses.get("filter", []))),
            clauses.get("msm"),
            clauses.get("meta_filters"),
            clauses.get("range_filters"),
            self._postings_idx_fn(),
        )
        idxs = np.nonzero(ok)[0]
        vals = self.meta_col(field)[idxs]
        # COUNT(DISTINCT) semantics: missing values contribute nothing
        if vals.dtype.kind == "f":
            vals = vals[~np.isnan(vals)]
        elif vals.dtype == object and len(vals):
            vals = vals[np.fromiter((v is not None for v in vals), bool,
                                    len(vals))]
        if hll_p is not None:
            from ..ops.sketch import HyperLogLog

            h = HyperLogLog(p=hll_p)
            h.add_many(vals.tolist())
            return h.to_bytes()
        return np.unique(vals)

    def _agg_match_idxs(self, clauses: dict) -> np.ndarray:
        """Shard-local row indexes matching a bool clause set — the
        shared entry of every doc-values aggregation partial."""
        ok = self._bool_eligible(
            sorted(set(clauses.get("must", []))),
            sorted(set(clauses.get("should", []))),
            sorted(set(clauses.get("must_not", []))),
            sorted(set(clauses.get("filter", []))),
            clauses.get("msm"),
            clauses.get("meta_filters"),
            clauses.get("range_filters"),
            self._postings_idx_fn(),
        )
        return np.nonzero(ok)[0]

    def agg_string_stats(self, clauses: dict, field: str) -> tuple:
        """Per-shard partial for ES ``string_stats`` (see
        ``statagg.string_stats_partial``) — wire bounded by alphabet."""
        from .statagg import string_stats_partial

        idxs = self._agg_match_idxs(clauses)
        return string_stats_partial(self.meta_col(field)[idxs])

    def agg_matrix_stats(self, clauses: dict, fields: list[str]) -> tuple:
        """Per-shard partial for ES ``matrix_stats`` — (n, Σx, Gram),
        O(k²) wire (see ``statagg.matrix_stats_partial``)."""
        from .statagg import matrix_stats_partial

        idxs = self._agg_match_idxs(clauses)
        return matrix_stats_partial(
            [self.meta_col(f)[idxs] for f in fields]
        )

    def agg_paired_diff(
        self, clauses: dict, field_a: str, field_b: str
    ) -> tuple:
        """Per-shard extstats-shaped moments of the per-doc DIFFERENCE
        ``field_a - field_b`` over rows where BOTH are present — the
        paired ``t_test`` partial."""
        idxs = self._agg_match_idxs(clauses)
        a = self.meta_col(field_a)[idxs].astype(np.float64)
        b = self.meta_col(field_b)[idxs].astype(np.float64)
        d = a - b
        d = d[~np.isnan(d)]
        if len(d) == 0:
            return (0, 0.0, 0.0, np.inf, -np.inf)
        return (int(len(d)), float(d.sum()), float((d * d).sum()),
                float(d.min()), float(d.max()))

    def agg_top_metrics(
        self,
        clauses: dict,
        sort_field: str,
        desc: bool,
        size: int,
        metric_fields: list[str],
    ) -> list[tuple]:
        """Per-shard partial for ES ``top_metrics``: this shard's top
        ``size`` matched docs by ``sort_field`` (ties GLOBAL-doc-id
        ascending — the serving tiebreak), each carrying its metric
        doc values.  O(size) wire."""
        idxs = self._agg_match_idxs(clauses)
        sv = self.meta_col(sort_field)[idxs].astype(np.float64)
        keep = ~np.isnan(sv)  # ES skips docs missing the sort field
        idxs, sv = idxs[keep], sv[keep]
        if len(idxs) == 0:
            return []
        order = np.lexsort((idxs, -sv if desc else sv))[:size]
        idxs, sv = idxs[order], sv[order]
        mets = [self.meta_col(f)[idxs] for f in metric_fields]
        gids = idxs + self.doc_base
        out = []
        for i in range(len(idxs)):
            out.append((
                float(sv[i]), int(gids[i]),
                tuple(
                    None if (isinstance(c[i], float) and np.isnan(c[i]))
                    else (c[i].item() if hasattr(c[i], "item") else c[i])
                    for c in mets
                ),
            ))
        return out

    def expand_prefix(self, prefix: str, cap: int | None = None) -> list[str]:
        """Terms in this shard's (sorted) dictionary starting with
        ``prefix``, in term order — the Lucene per-segment prefix
        expansion.  ``cap`` bounds the walk (max_expansions)."""
        return prefix_expand_sorted(self.walk_term_list, prefix, cap)

    def expand_range(
        self, gte: str | None = None, lte: str | None = None,
        gt: str | None = None, lt: str | None = None,
        cap: int | None = None,
    ) -> list[str]:
        """Dictionary terms in the lexical range, in term order (the ES
        8.16 intervals ``range`` rule / span_multi TermRangeQuery)."""
        return range_expand_sorted(self.walk_term_list, gte, lte, gt, lt,
                                   cap)

    def prefix_docs(self, prefix: str, k: int) -> np.ndarray:
        """ES ``prefix`` query (constant_score rewrite): the k smallest
        live GLOBAL doc ids containing any term with the prefix."""
        hits: list[np.ndarray] = []
        for t in self.expand_prefix(prefix):
            doc_ids, _ = decode_postings(self.blobs[self.terms[t]])
            hits.append(doc_ids.astype(np.int64))
        if not hits:
            return np.empty(0, dtype=np.int64)
        docs = np.unique(np.concatenate(hits))
        docs = docs[~self.deleted_mask[docs - self.doc_base]]
        return docs[:k]

    def meta_col(self, name: str) -> np.ndarray:
        """Lazy per-shard load of one docmeta column (keyword-field
        filters / aggregations; ES keyword doc values).  Loaded once per
        actor and cached — the reference's cached-state pattern
        (``asset/elasticsearch_state_storage/api.js:6-33``)."""
        arr = self._meta_cache.get(name)
        if arr is None:
            if name.startswith("script:"):
                # RUNTIME FIELD (ES runtime mappings): the field "name"
                # IS its definition — an expression over stored docmeta
                # columns (``funcscore.ScriptExpr`` subset, all
                # SQL-mirrorable).  Strings-travel philosophy: like
                # derived_meta recipes and analyzer names, the script
                # string is the wire format, so every existing filter /
                # aggregation path (meta_mask ranges, terms, histogram,
                # stats, percentiles, ...) gains runtime-field support
                # with no signature change.  Computed once per actor
                # and cached like any stored column.
                from .funcscore import ScriptExpr

                expr = ScriptExpr(name[len("script:"):])
                env = {f: self.meta_col(f) for f in expr.fields}
                env["_score"] = np.zeros(self.num_docs)
                arr = expr(env)
            elif name == "dl":
                arr = self.dl
            else:
                parts = [
                    pq.read_table(p, columns=[name]).column(name)
                    for p in self._info.docmeta_paths(self.shard_id)
                ]
                col = pa.chunked_array(parts).combine_chunks()
                if pa.types.is_timestamp(col.type):
                    # date fields surface as epoch MICROS doc values (the
                    # ES epoch_millis convention, one unit finer) so range
                    # filters and date_histogram bucketing stay integer-
                    # vectorized; unit-aware (DEVNOTES invariant)
                    from ..ops import epoch_us

                    arr = epoch_us(col)
                else:
                    arr = col.to_numpy(zero_copy_only=False)
            self._meta_cache[name] = arr
        return arr

    def meta_mask(
        self, meta_filters: dict, range_filters: dict | None = None
    ) -> np.ndarray:
        """Boolean doc mask for ES keyword ``term``/``terms`` filters over
        stored metadata columns: {col: value | [values]} — a doc passes
        when EVERY column's value is in its allowed set.  ``range_filters``
        adds ES ``range`` filters over numeric columns:
        {col: (lo, hi)} with INCLUSIVE bounds (gte/lte); None on either
        side leaves that bound open."""
        ok = np.ones(self.num_docs, dtype=bool)
        for col, allowed in sorted(meta_filters.items()):
            vals = (
                list(allowed)
                if isinstance(allowed, (list, tuple, set, frozenset))
                else [allowed]
            )
            ok &= np.isin(self.meta_col(col), vals)
        for col, (lo, hi) in sorted((range_filters or {}).items()):
            v = self.meta_col(col)
            if lo is not None:
                ok &= v >= lo
            if hi is not None:
                ok &= v <= hi
        return ok

    def expand_wildcard(self, pattern: str, cap: int | None = None) -> list[str]:
        """Terms matching an ES ``wildcard`` pattern (``*`` = any run,
        ``?`` = one char), in term order (literal-prefix bisect + regex
        walk).  A leading-wildcard pattern with a trailing literal
        (``*suffix``) bisects a lazily-built REVERSED dictionary instead
        of scanning (Lucene ``reverse_wildcard``); only a pattern that
        both starts and ends with a wildcard still scans."""
        rev = None
        if pattern and pattern[0] in "*?" and trailing_wildcard_literal(
            pattern
        ):
            rev = getattr(self, "_rev_walk_list", None)
            if rev is None:
                rev = self._rev_walk_list = sorted(
                    t[::-1] for t in self.walk_term_list
                )
        return wildcard_expand_sorted(
            self.walk_term_list, pattern, cap, rev_list=rev
        )

    def match_first(self, terms: list[str], n: int) -> np.ndarray:
        """First ``n`` live GLOBAL doc ids matching the disjunction —
        the deterministic sampling probe (significant_text)."""
        hits = []
        for t in sorted(set(terms)):
            i = self.terms.get(t)
            if i is None:
                continue
            doc_ids, _ = decode_postings(self.blobs[i])
            hits.append(doc_ids.astype(np.int64))
        if not hits:
            return np.empty(0, dtype=np.int64)
        docs = np.unique(np.concatenate(hits)) - self.doc_base
        docs = docs[~self.deleted_mask[docs]]
        return (docs[:n] + self.doc_base).astype(np.int64)

    def _meta_leaf(self, node: tuple) -> tuple[np.ndarray, np.ndarray]:
        """query_string docmeta leaf (``field:value`` / ranges) over
        this shard's doc values: live matching GLOBAL ids, each scoring
        a constant 1.0 (filter-context semantics — divergence from ES
        keyword TermQuery idf scoring disclosed in search/qs.py).  An
        unmapped field matches nothing (the ES lenient mapping)."""
        from .qs import meta_pred_mask

        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        try:
            vals = self.meta_col(node[1])
        except Exception:
            return empty
        if node[0] == "metaterm":
            pred = ("term", node[2])
        elif node[0] == "metaexists":
            pred = ("exists",)
        else:
            pred = ("range",) + tuple(node[2:])
        mask = meta_pred_mask(vals, pred) & ~self.deleted_mask
        idx = np.nonzero(mask)[0]
        return ((idx + self.doc_base).astype(np.int64),
                np.ones(len(idx), np.float64))

    def wildcard_docs(self, pattern: str, k: int) -> np.ndarray:
        """ES ``wildcard`` query (constant_score rewrite): the k smallest
        live GLOBAL doc ids containing any matching term."""
        hits: list[np.ndarray] = []
        for t in self.expand_wildcard(pattern):
            doc_ids, _ = decode_postings(self.blobs[self.terms[t]])
            hits.append(doc_ids.astype(np.int64))
        if not hits:
            return np.empty(0, dtype=np.int64)
        docs = np.unique(np.concatenate(hits))
        docs = docs[~self.deleted_mask[docs - self.doc_base]]
        return docs[:k]

    def sqs_topk(
        self, tree: tuple, idf: dict, params: "BM25Params",
        avgdl: float, k: int,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Per-shard ``simple_query_string`` evaluation (see
        :mod:`.sqs`): the clause tree evaluates bottom-up over sparse
        (global ids, scores) pairs — term leaves score BM25 from the
        shard postings, phrase leaves reuse :meth:`phrase_topk` with
        k=∞ (the full match set), prefix leaves are constant_score doc
        sets — then the local result cuts to k with the rounded tie
        class for the standard merge."""
        from .sqs import eval_tree

        k1, b = params.k1, params.b
        postings_idx = self._postings_idx_fn()

        def leaf(node):
            empty = (np.empty(0, np.int64), np.empty(0, np.float64))
            if node[0] == "term":
                p = postings_idx(node[1])
                if p is None:
                    return empty
                idx, tfs = p
                live = ~self.deleted_mask[idx]
                if not live.all():
                    idx, tfs = idx[live], tfs[live]
                tf = tfs.astype(np.float64)
                dl = self.dl[idx]
                sc = (idf[node[1]] * tf * (k1 + 1.0)
                      / (tf + k1 * (1.0 - b + b * dl / avgdl)))
                return (idx + self.doc_base).astype(np.int64), sc
            if node[0] == "phrase":
                toks, slop = node[1], node[2]
                idf_sum = float(sum(idf[t] for t in toks))
                ids, sc = self.phrase_topk(
                    list(toks), idf_sum, params, avgdl, k=1 << 30,
                    slop=slop, slop_mode="lucene" if slop else "ordered",
                )
                order = np.argsort(ids)
                return ids[order].astype(np.int64), sc[order]
            if node[0] == "prefix":
                docs = self.prefix_docs(node[1], k=1 << 62)
                return docs, np.ones(len(docs), np.float64)
            if node[0] == "fuzzyexp":
                # weighted BM25 disjunction over the dictionary
                # expansion (scoring_boolean, = search_fuzzy semantics)
                base = node[1]
                n = self.num_docs
                sc_all = np.zeros(n, dtype=np.float64)
                hit = np.zeros(n, dtype=bool)
                for t, dist in sorted(node[2]):  # sorted-term accumulation
                    p = postings_idx(t)
                    if p is None:
                        continue
                    idx, tfs = p
                    tf = tfs.astype(np.float64)
                    dl = self.dl[idx]
                    w = idf[t] * (1.0 - dist / max(1, min(len(base), len(t))))
                    sc_all[idx] += (w * tf * (k1 + 1.0)
                                    / (tf + k1 * (1.0 - b + b * dl / avgdl)))
                    hit[idx] = True
                hit &= ~self.deleted_mask
                cand = np.nonzero(hit)[0]
                return ((cand + self.doc_base).astype(np.int64),
                        sc_all[cand])
            if node[0] == "wildcard":
                # ES wildcard under its constant_score rewrite — the
                # query_string ``te*t`` / ``te?t`` leaf
                docs = self.wildcard_docs(node[1], k=1 << 62)
                return docs, np.ones(len(docs), np.float64)
            if node[0] in ("metaterm", "metarange", "metaexists"):
                return self._meta_leaf(node)
            raise ValueError(f"unknown sqs leaf {node[0]!r}")

        ids, sc = eval_tree(tree, leaf)
        return merge_topk([(ids, sc)], k, params.round_decimals)

    def function_score_topk(
        self, terms: list[str], idf: dict, params: "BM25Params",
        avgdl: float, k: int, field: str, factor: float,
        modifier: str, missing: float, boost_mode: str,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Per-shard ES ``function_score`` with a ``field_value_factor``
        function over a match disjunction: F = modifier(factor · field)
        — ``log1p`` is log10(1 + x), the ES convention — combined with
        the BM25 score by ``boost_mode`` (multiply | sum).  Missing
        field values take ``missing``.  Returns the local top-k with
        the rounded tie class (standard merge)."""
        k1, b = params.k1, params.b
        postings_idx = self._postings_idx_fn()
        n = self.num_docs
        scores = np.zeros(n, dtype=np.float64)
        hit = np.zeros(n, dtype=bool)
        for t in sorted(set(terms)):
            p = postings_idx(t)
            if p is None:
                continue
            idx, tfs = p
            tf = tfs.astype(np.float64)
            dl = self.dl[idx]
            scores[idx] += (idf[t] * tf * (k1 + 1.0)
                            / (tf + k1 * (1.0 - b + b * dl / avgdl)))
            hit[idx] = True
        hit &= ~self.deleted_mask
        cand = np.nonzero(hit)[0]
        if len(cand) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        v = self.meta_col(field)[cand].astype(np.float64)
        nanm = np.isnan(v)
        if nanm.any():
            v = np.where(nanm, missing, v)
        f = apply_fvf_modifier(v, factor, modifier)
        base = scores[cand]
        final = base * f if boost_mode == "multiply" else base + f
        return merge_topk(
            [((cand + self.doc_base).astype(np.int64), final)],
            k, params.round_decimals,
        )

    def decay_score_topk(
        self, terms: list[str], idf: dict, params: "BM25Params",
        avgdl: float, k: int, field: str, function: str,
        origin: float, scale: float, offset: float, decay: float,
        boost_mode: str,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Per-shard ES ``function_score`` with a DECAY function
        (gauss | exp | linear) over numeric/date doc values, combined
        with the match disjunction's BM25 score by ``boost_mode``
        (multiply | sum).  Docs missing the field take function value
        1.0 (the ES decay contract).  Vectorized in-shard — no second
        pass, no driver hydration."""
        k1, b = params.k1, params.b
        postings_idx = self._postings_idx_fn()
        n = self.num_docs
        scores = np.zeros(n, dtype=np.float64)
        hit = np.zeros(n, dtype=bool)
        for t in sorted(set(terms)):
            p = postings_idx(t)
            if p is None:
                continue
            idx, tfs = p
            tf = tfs.astype(np.float64)
            dl = self.dl[idx]
            scores[idx] += (idf[t] * tf * (k1 + 1.0)
                            / (tf + k1 * (1.0 - b + b * dl / avgdl)))
            hit[idx] = True
        hit &= ~self.deleted_mask
        cand = np.nonzero(hit)[0]
        if len(cand) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        v = self.meta_col(field)[cand].astype(np.float64)
        f = apply_decay(v, function, origin, scale, offset, decay)
        nanm = np.isnan(v)
        if nanm.any():
            f = np.where(nanm, 1.0, f)
        base = scores[cand]
        final = base * f if boost_mode == "multiply" else base + f
        return merge_topk(
            [((cand + self.doc_base).astype(np.int64), final)],
            k, params.round_decimals,
        )

    def function_score_multi_topk(
        self, terms: list[str], idf: dict, params: "BM25Params",
        avgdl: float, k: int, specs: list[dict], score_mode: str,
        boost_mode: str, max_boost: float | None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Per-shard ES ``function_score`` with a FUNCTIONS LIST
        (per-function filters/weights, score_mode/boost_mode/max_boost):
        BM25 over the match disjunction, then the shared multi-function
        kernel (:mod:`.funcscore`) over this shard's doc values —
        vectorized in-shard, no driver hydration."""
        from .funcscore import combine_function_score

        k1, b = params.k1, params.b
        postings_idx = self._postings_idx_fn()
        n = self.num_docs
        scores = np.zeros(n, dtype=np.float64)
        hit = np.zeros(n, dtype=bool)
        for t in sorted(set(terms)):
            p = postings_idx(t)
            if p is None:
                continue
            idx, tfs = p
            tf = tfs.astype(np.float64)
            dl = self.dl[idx]
            scores[idx] += (idf[t] * tf * (k1 + 1.0)
                            / (tf + k1 * (1.0 - b + b * dl / avgdl)))
            hit[idx] = True
        hit &= ~self.deleted_mask
        cand = np.nonzero(hit)[0]
        if len(cand) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        final = combine_function_score(
            scores[cand], specs, lambda f: self.meta_col(f)[cand],
            score_mode, boost_mode, max_boost,
        )
        return merge_topk(
            [((cand + self.doc_base).astype(np.int64), final)],
            k, params.round_decimals,
        )

    def collapse_topk(
        self, terms: list[str], idf: dict, params: "BM25Params",
        avgdl: float, field: str, inner_size: int,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Per-shard ES ``collapse`` partial: BM25 over the match
        disjunction, then per-group top ``inner_size`` by (score desc,
        doc asc) over this shard's doc values — the return is bounded by
        distinct-groups × inner_size, not the match set
        (:mod:`.collapse` has the exactness argument)."""
        from .collapse import collapse_partial

        k1, b = params.k1, params.b
        postings_idx = self._postings_idx_fn()
        n = self.num_docs
        scores = np.zeros(n, dtype=np.float64)
        hit = np.zeros(n, dtype=bool)
        for t in sorted(set(terms)):
            p = postings_idx(t)
            if p is None:
                continue
            idx, tfs = p
            tf = tfs.astype(np.float64)
            dl = self.dl[idx]
            scores[idx] += (idf[t] * tf * (k1 + 1.0)
                            / (tf + k1 * (1.0 - b + b * dl / avgdl)))
            hit[idx] = True
        hit &= ~self.deleted_mask
        cand = np.nonzero(hit)[0]
        if len(cand) == 0:
            e = np.empty(0, np.int64)
            return e, np.empty(0, np.float64), np.empty(0, object)
        return collapse_partial(
            (cand + self.doc_base).astype(np.int64), scores[cand],
            np.asarray(self.meta_col(field)[cand]), inner_size,
        )

    def expand_regexp(self, pattern: str, cap: int | None = None) -> list[str]:
        """Terms matching an ES ``regexp`` pattern (anchored), in term
        order (leading-literal bisect + regex walk)."""
        return regexp_expand_sorted(self.walk_term_list, pattern, cap)

    def regexp_docs(self, pattern: str, k: int) -> np.ndarray:
        """ES ``regexp`` query (constant_score rewrite): the k smallest
        live GLOBAL doc ids containing any matching term."""
        hits: list[np.ndarray] = []
        for t in self.expand_regexp(pattern):
            doc_ids, _ = decode_postings(self.blobs[self.terms[t]])
            hits.append(doc_ids.astype(np.int64))
        if not hits:
            return np.empty(0, dtype=np.int64)
        docs = np.unique(np.concatenate(hits))
        docs = docs[~self.deleted_mask[docs - self.doc_base]]
        return docs[:k]

    def expand_fuzzy(
        self, term: str, max_edits: int = 1, prefix_length: int = 0,
        transpositions: bool = False,
    ) -> list[tuple[str, int]]:
        """Dictionary terms within edit distance ``max_edits`` of
        ``term`` (ES ``fuzzy`` query expansion) → [(term, distance)] in
        term order.  ``prefix_length`` chars must match exactly (the ES
        option that keeps the scan off the whole dictionary);
        ``transpositions`` enables Damerau-OSA adjacent swaps (the ES
        ``fuzzy_transpositions`` option).

        The distance computation is one vectorized DP across ALL length-
        eligible candidates at once (rows = candidates, columns = target
        chars) — no per-term Python edit-distance calls; candidate count
        is bounded by the shard vocabulary, and the prefix bisect bounds
        it further when prefix_length > 0."""
        return fuzzy_expand_sorted(
            self.walk_term_list, term, max_edits, prefix_length,
            transpositions,
        )

    def agg_match(
        self,
        terms: list[str],
        group_col: str,
        stats_col: str | None = None,
    ) -> dict:
        """Per-shard partial for an ES ``terms`` aggregation over the docs
        matching ANY of ``terms`` (the ``match`` disjunction, ES
        minimum_should_match=1): group value → (doc_count, sum, min, max)
        of ``stats_col`` (``dl`` = token count, or any numeric docmeta
        column).  Partials are mergeable — counts/sums add, min/max fold
        — so the driver combine is O(groups), never O(docs)."""
        hit = np.zeros(self.num_docs, dtype=bool)
        for t in terms:
            i = self.terms.get(t)
            if i is None:
                continue
            doc_ids, _ = decode_postings(self.blobs[i])
            hit[(doc_ids - np.uint64(self.doc_base)).astype(np.int64)] = True
        hit &= ~self.deleted_mask
        return self._agg_over_mask(hit, group_col, stats_col)

    def agg_match_multi(
        self,
        terms: list[str],
        group_cols: list[str],
        stats_col: str | None = None,
    ) -> dict:
        """Per-shard partial for an ES ``multi_terms`` aggregation
        (2 fields): composite (v1, v2) buckets over the docs matching
        ANY of ``terms``; docs missing EITHER field value are omitted
        (ES multi_terms semantics).  Same mergeable partial shape as
        :meth:`agg_match`."""
        from .datehist import partial_over_pairs, valid_mask

        if len(group_cols) != 2:
            raise ValueError("multi_terms supports exactly 2 fields")
        hit = np.zeros(self.num_docs, dtype=bool)
        for t in terms:
            i = self.terms.get(t)
            if i is None:
                continue
            doc_ids, _ = decode_postings(self.blobs[i])
            hit[(doc_ids - np.uint64(self.doc_base)).astype(np.int64)] = True
        hit &= ~self.deleted_mask
        idxs = np.nonzero(hit)[0]
        if len(idxs) == 0:
            return {}
        a = self.meta_col(group_cols[0])[idxs]
        b = self.meta_col(group_cols[1])[idxs]
        vm = valid_mask(a) & valid_mask(b)
        if not vm.all():
            idxs, a, b = idxs[vm], a[vm], b[vm]
            if len(idxs) == 0:
                return {}
        sv = (
            self.meta_col(stats_col)[idxs].astype(np.float64)
            if stats_col is not None else None
        )
        return partial_over_pairs(a, b, sv)

    def agg_adjacency(
        self, named_clauses: list[tuple[str, dict]], separator: str = "&",
    ) -> dict:
        """Per-shard partial for an ES ``adjacency_matrix`` aggregation:
        {key: doc_count} for every filter and every PAIRWISE
        intersection (key = the two names sorted, joined by
        ``separator``).  Masks come from the shared bool eligibility
        algebra; partials sum across shards."""
        postings_idx = self._postings_idx_fn()
        masks: list[tuple[str, np.ndarray]] = []
        for name, clauses in named_clauses:
            ok = self._bool_eligible(
                sorted(set(clauses.get("must", []))),
                sorted(set(clauses.get("should", []))),
                sorted(set(clauses.get("must_not", []))),
                sorted(set(clauses.get("filter", []))),
                clauses.get("msm"), clauses.get("meta_filters"),
                clauses.get("range_filters"), postings_idx,
            )
            masks.append((str(name), ok))
        out: dict = {}
        for i, (n1, m1) in enumerate(masks):
            c = int(m1.sum())
            if c:
                out[n1] = out.get(n1, 0) + c
            for n2, m2 in masks[i + 1:]:
                c = int((m1 & m2).sum())
                if c:
                    a, b = sorted((n1, n2))
                    out[a + separator + b] = out.get(
                        a + separator + b, 0) + c
        return out

    def agg_filters(
        self, named_clauses: list[tuple[str, dict]],
        stats_col: str | None = None,
        other_key: str | None = None,
    ) -> dict:
        """Per-shard partial for an ES ``filters`` aggregation: one
        NAMED bucket per filter query (each the full bool-clause
        algebra, non-scoring) → {name: (doc_count, sum, min, max)}.
        Stats cover only valid (non-NaN) values; doc_count counts every
        eligible doc — the ES metric-sub-agg convention.  A non-None
        ``other_key`` adds the ES ``other_bucket`` partial: LIVE docs
        matching NONE of the filters."""
        from .datehist import valid_mask

        postings_idx = self._postings_idx_fn()
        sv = (
            self.meta_col(stats_col) if stats_col is not None else None
        )

        def stat_row(idxs: np.ndarray) -> tuple:
            c = len(idxs)
            if c == 0 or sv is None:
                return (c, None, None, None)
            v = sv[idxs].astype(np.float64)
            v = v[valid_mask(v)]
            if len(v) == 0:
                return (c, None, None, None)
            return (c, float(v.sum()), float(v.min()), float(v.max()))

        out: dict = {}
        any_ok = np.zeros(self.num_docs, dtype=bool)
        for name, clauses in named_clauses:
            ok = self._bool_eligible(
                sorted(set(clauses.get("must", []))),
                sorted(set(clauses.get("should", []))),
                sorted(set(clauses.get("must_not", []))),
                sorted(set(clauses.get("filter", []))),
                clauses.get("msm"), clauses.get("meta_filters"),
                clauses.get("range_filters"), postings_idx,
            )
            any_ok |= ok
            out[name] = stat_row(np.nonzero(ok)[0])
        if other_key is not None:
            other = ~any_ok & ~self.deleted_mask
            out[other_key] = stat_row(np.nonzero(other)[0])
        return out

    def _agg_over_mask(
        self, hit: np.ndarray, group_col: str, stats_col: str | None
    ) -> dict:
        from .datehist import valid_mask

        idxs = np.nonzero(hit)[0]
        if len(idxs) == 0:
            return {}
        groups = self.meta_col(group_col)[idxs]
        vm = valid_mask(groups)
        if not vm.all():
            # ES terms aggs omit docs with a missing field value
            idxs, groups = idxs[vm], groups[vm]
            if len(idxs) == 0:
                return {}
        ug, inv, counts = np.unique(groups, return_inverse=True, return_counts=True)
        out: dict = {}
        if stats_col is None:
            for g, c in zip(ug.tolist(), counts.tolist()):
                out[g] = (int(c), None, None, None)
            return out
        vals = self.meta_col(stats_col)[idxs].astype(np.float64)
        sums = np.bincount(inv, weights=vals, minlength=len(ug))
        mins = np.full(len(ug), np.inf)
        maxs = np.full(len(ug), -np.inf)
        np.minimum.at(mins, inv, vals)
        np.maximum.at(maxs, inv, vals)
        for i, g in enumerate(ug.tolist()):
            out[g] = (int(counts[i]), float(sums[i]), float(mins[i]), float(maxs[i]))
        return out

    # positions cache cap, in cached position VALUES per shard: hot query
    # terms (Zipfian) re-decode their position streams every phrase query
    # otherwise; ~4 MB/shard at the cap, bounded per actor by its shard
    # count
    POS_CACHE_MAX_VALUES = 512_000

    def _decoded_positions(self, t: str) -> tuple:
        """(local idx, flat positions, tfcum) for a term, LRU-cached."""
        cache = getattr(self, "_pos_cache", None)
        if cache is None:
            from collections import OrderedDict

            cache = self._pos_cache = OrderedDict()
            self._pos_cache_values = 0
        got = cache.get(t)
        if got is not None:
            cache.move_to_end(t)
            return got
        from ..index.codec import decode_positions

        i = self.terms[t]
        doc_ids, tfs = decode_postings(self.blobs[i])
        idx = (doc_ids - np.uint64(self.doc_base)).astype(np.int64)
        tfs_i = tfs.astype(np.int64)
        pos = decode_positions(self.posblobs[i], tfs_i)
        tfcum = np.concatenate([[0], np.cumsum(tfs_i)])
        entry = (idx, pos, tfcum)
        cache[t] = entry
        self._pos_cache_values += len(pos)
        while self._pos_cache_values > self.POS_CACHE_MAX_VALUES and len(cache) > 1:
            _, old = cache.popitem(last=False)
            self._pos_cache_values -= len(old[1])
        return entry

    def term_positions_for_doc(
        self, doc_global: int, terms: list[str]
    ) -> dict[str, list[int]]:
        """Matched in-doc token positions per query term for ONE doc —
        the highlight primitive (decode only the queried terms' postings
        + position spans; cost is per-term, never per-corpus)."""
        if self.posblobs is None:
            raise RuntimeError(
                "index was built without store_positions=True — highlight "
                "needs the positional sidecar"
            )
        from ..index.codec import decode_positions

        out: dict[str, list[int]] = {}
        for t in sorted(set(terms)):
            i = self.terms.get(t)
            if i is None:
                continue
            doc_ids, tfs = decode_postings(self.blobs[i])
            e = int(np.searchsorted(doc_ids, np.uint64(doc_global)))
            if e >= len(doc_ids) or doc_ids[e] != np.uint64(doc_global):
                continue
            tfs_i = tfs.astype(np.int64)
            pos = decode_positions(self.posblobs[i], tfs_i)
            tfcum = np.concatenate([[0], np.cumsum(tfs_i)])
            out[t] = pos[tfcum[e]:tfcum[e + 1]].astype(int).tolist()
        return out

    def phrase_topk(
        self,
        phrase: list,
        idf_sum: float,
        params: BM25Params,
        avgdl: float,
        k: int,
        slop: int = 0,
        slop_mode: str = "ordered",
    ) -> tuple[np.ndarray, np.ndarray]:
        """Exact (multi-)phrase top-k over the positional sidecar (Lucene
        PhraseQuery / MultiPhraseQuery semantics, slop 0): each element of
        ``phrase`` is a term OR a list of alternative terms for that slot
        (the match_phrase_prefix expansion shape); a doc matches when some
        alternative of every slot occurs at consecutive in-doc positions.
        Score is BM25 with tf = the PHRASE frequency (number of start
        positions, overlap counted) and idf = the caller-provided sum of
        the constituent terms' idfs — Lucene's PhraseWeight treats the
        phrase as one pseudo-term.

        ``slop > 0`` runs ORDERED sloppy matching: a start position
        matches when the greedy chain (each slot takes its smallest
        position strictly after the previous slot's) spans
        ``≤ len(phrase)-1+slop`` positions; tf = count of matching start
        positions.  That ordered/greedy form (``slop_mode="ordered"``, the
        default) is deterministic and exactly SQL-reproducible;
        ``slop_mode="lucene"`` instead runs Lucene's SloppyPhraseMatcher
        semantics — reordered terms admitted within the slop budget, each
        match weighted ``1/(1+matchLength)`` into a FLOAT tf
        (``search.sloppy``; parity-tested against a naive reference, not
        SQL-oracled).  At slop=0 all definitions coincide (asserted by
        test against the intersect path)."""
        if self.posblobs is None:
            raise RuntimeError(
                "index was built without store_positions=True — phrase "
                "queries need the positional sidecar"
            )
        if not phrase:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)

        slots: list[list[str]] = [
            [s] if isinstance(s, str) else list(s) for s in phrase
        ]
        if (
            slop == 0
            and self.index_phrases
            and len(slots) >= 2
            and all(len(a) == 1 for a in slots)
            and (self.shingle_positions or len(slots) == 2)
        ):
            # index_phrases rewrite: the n-term phrase becomes n−1
            # SHINGLE slots at consecutive positions — a 2-term phrase
            # is ONE term lookup (pf = the shingle's tf), longer ones
            # intersect low-df shingle streams instead of hot unigram
            # position mass.  Identical matches/pf by construction
            # (a phrase start at p ⟺ every bigram at p..p+n−2; tested
            # vs the unigram path).  shingle_positions=False layouts
            # store no shingle position payloads, so only the 2-term
            # (tf-only) form rewrites; longer phrases use the identical-
            # result unigram path below.
            from ..index.build import SHINGLE_SEP

            toks0 = [a[0] for a in slots]
            slots = [
                [toks0[i] + SHINGLE_SEP + toks0[i + 1]]
                for i in range(len(toks0) - 1)
            ]
            if not self.shingle_positions:
                # pf = the shingle's tf — straight from its postings,
                # no positional decode (none stored for shingles)
                t = slots[0][0]
                i = self.terms.get(t)
                if i is None:
                    return np.empty(0, np.int64), np.empty(0, np.float64)
                doc_ids, tfs = decode_postings(self.blobs[i])
                idx = (doc_ids - np.uint64(self.doc_base)).astype(np.int64)
                live = ~self.deleted_mask[idx]
                hd, pf = idx[live], tfs[live].astype(np.float64)
                if len(hd) == 0:
                    return np.empty(0, np.int64), np.empty(0, np.float64)
                k1, b = params.k1, params.b
                dl = self.dl[hd]
                scores_local = idf_sum * pf * (k1 + 1.0) / (
                    pf + k1 * (1.0 - b + b * dl / avgdl)
                )
                dense = np.zeros(self.num_docs, dtype=np.float64)
                dense[hd] = scores_local
                cand2, cs = _select_topk(hd, dense, k, params)
                return (cand2 + self.doc_base).astype(np.int64), cs
        decoded: dict[str, tuple] = {}
        slot_present: list[list[str]] = []
        for alts in slots:
            present = []
            for t in alts:
                if t not in self.terms:
                    continue
                if t not in decoded:
                    decoded[t] = self._decoded_positions(t)
                present.append(t)
            if not present:  # a slot with no live term → no match in shard
                return np.empty(0, np.int64), np.empty(0, np.float64)
            slot_present.append(present)

        # Position-skip doc gating: a match needs EVERY slot in the doc,
        # so candidate docs = the slots' doc-set conjunction (postings
        # only, no position expansion) and position streams expand ONLY
        # for candidates — a hot slot beside a rare one skips ~all of its
        # position mass (the block-max-for-positions idea applied at doc
        # granularity; measured in BASELINE.md, rank+score unchanged by
        # construction and by test).
        cand_docs = None
        for alts in slot_present:
            if len(alts) == 1:
                docs = decoded[alts[0]][0]
            else:
                docs = np.unique(
                    np.concatenate([decoded[t][0] for t in alts])
                )
            if cand_docs is None:
                cand_docs = docs
            else:
                cand_docs = cand_docs[
                    np.isin(cand_docs, docs, assume_unique=True)
                ]
            if len(cand_docs) == 0:
                return np.empty(0, np.int64), np.empty(0, np.float64)

        # Vectorized start-position intersection: every (doc, token
        # position) pair becomes one uint-keyed value ``doc << 32 | pos``;
        # slot ``seq`` shifts its positions back by ``seq`` so a phrase
        # start is exactly a key present in EVERY slot's key set.  One
        # sorted-array intersect per slot replaces the per-candidate-doc
        # Python loop (measured: hot-phrase p50 on a 1M-doc index drops
        # from ~1.5 s to the dense-query regime).
        def slot_keys(alts: list[str], seq: int) -> np.ndarray:
            # doc-conjunction gate via the shared segment gather
            from .term_engine import subset_positions

            parts = []
            for t in alts:
                idx, pos, tfcum = decoded[t]
                tf = np.diff(tfcum)
                idx_s, tf_s, pos_s = subset_positions(idx, tf, pos, cand_docs)
                docs_flat = np.repeat(idx_s, tf_s)
                p = pos_s.astype(np.int64)
                if seq:
                    keep = p >= seq
                    if not keep.all():
                        docs_flat, p = docs_flat[keep], p[keep]
                    p = p - seq
                parts.append((docs_flat << np.int64(32)) | p)
            if len(parts) == 1:
                # positions are strictly ascending within each doc and the
                # entry docs ascend → single-term keys are sorted unique
                return parts[0]
            return np.unique(np.concatenate(parts))

        if slop > 0 and slop_mode == "lucene":
            from .sloppy import repeat_plan, sloppy_freqs_for_candidates

            rpt_groups, rpt_multi = repeat_plan(slot_present)
            mask32 = np.int64((1 << 32) - 1)
            slot_docs, slot_pos = [], []
            for alts in slot_present:
                keys = slot_keys(alts, 0)  # (doc<<32|pos), sorted unique
                slot_docs.append((keys >> np.int64(32)).astype(np.int64))
                slot_pos.append((keys & mask32).astype(np.int64))
            hd, pf = sloppy_freqs_for_candidates(
                slot_docs, slot_pos, slop, repeat_groups=rpt_groups,
                multi_term=rpt_multi,
            )
            if len(hd):
                live = ~self.deleted_mask[hd]
                hd, pf = hd[live], pf[live]
            if len(hd) == 0:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            k1, b = params.k1, params.b
            dl = self.dl[hd]
            scores_local = idf_sum * pf * (k1 + 1.0) / (
                pf + k1 * (1.0 - b + b * dl / avgdl)
            )
            dense = np.zeros(self.num_docs, dtype=np.float64)
            dense[hd] = scores_local
            cand2, cs = _select_topk(hd, dense, k, params)
            return (cand2 + self.doc_base).astype(np.int64), cs

        if slop > 0:
            # ordered sloppy matching: greedy successor chain per start
            # key via one searchsorted per slot; the chain's span check
            # is p_L - p_1 ≤ L-1+slop (all vectorized, no per-doc loop)
            shift = np.int64(32)
            starts = slot_keys(slot_present[0], 0)  # seq=0: raw keys
            cur = starts
            ok = np.ones(len(starts), dtype=bool)
            for alts in slot_present[1:]:
                nxt_keys = slot_keys(alts, 0)
                pos_in = np.searchsorted(nxt_keys, cur + 1)
                valid = pos_in < len(nxt_keys)
                cand_k = nxt_keys[np.minimum(pos_in, len(nxt_keys) - 1)]
                valid &= (cand_k >> shift) == (cur >> shift)
                ok &= valid
                cur = np.where(valid, cand_k, cur)
            span = (cur & np.int64((1 << 32) - 1)) - (
                starts & np.int64((1 << 32) - 1)
            )
            ok &= span <= (len(slot_present) - 1 + slop)
            cur = starts[ok]
            if len(cur) == 0:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            k1, b = params.k1, params.b
            hd, pf_c = np.unique(cur >> shift, return_counts=True)
            live = ~self.deleted_mask[hd]
            hd, pf_c = hd[live], pf_c[live]
            if len(hd) == 0:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            pf = pf_c.astype(np.float64)
            dl = self.dl[hd]
            scores_local = idf_sum * pf * (k1 + 1.0) / (
                pf + k1 * (1.0 - b + b * dl / avgdl)
            )
            dense = np.zeros(self.num_docs, dtype=np.float64)
            dense[hd] = scores_local
            cand2, cs = _select_topk(hd, dense, k, params)
            return (cand2 + self.doc_base).astype(np.int64), cs

        cur = slot_keys(slot_present[0], 0)
        for seq, alts in enumerate(slot_present[1:], start=1):
            if len(cur) == 0:
                break
            cur = np.intersect1d(cur, slot_keys(alts, seq), assume_unique=True)
        if len(cur) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)

        k1, b = params.k1, params.b
        hd, pf_c = np.unique(cur >> np.int64(32), return_counts=True)
        live = ~self.deleted_mask[hd]
        hd, pf_c = hd[live], pf_c[live]
        if len(hd) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        pf = pf_c.astype(np.float64)
        dl = self.dl[hd]
        scores_local = idf_sum * pf * (k1 + 1.0) / (
            pf + k1 * (1.0 - b + b * dl / avgdl)
        )
        dense = np.zeros(self.num_docs, dtype=np.float64)
        dense[hd] = scores_local
        cand2, cs = _select_topk(hd, dense, k, params)
        return (cand2 + self.doc_base).astype(np.int64), cs

    def span_topk(
        self,
        tree: dict,
        idf_sum: float,
        params: BM25Params,
        avgdl: float,
        k: int,
        kernel: str = "spans",
    ) -> tuple[np.ndarray, np.ndarray]:
        """Positional-tree top-k over the positional sidecar — Lucene
        span queries (``kernel="spans"``: ES ``span_term`` / ``span_or``
        / ``span_near`` / ``span_first`` / ``span_not``; ``span_multi``
        must be rewritten to ``span_or`` by the coordinator) and ES
        ``intervals`` queries (``kernel="intervals"``: minimal-interval
        algebra, ``match``/``prefix`` sugar rewritten by the
        coordinator).  Candidate docs = the tree's requirement-set
        conjunction (postings only — the phrase gate generalized to
        or-groups), so position streams expand ONLY for candidates; the
        engine-agnostic kernel module then computes per-doc tf (distinct
        top-level match starts / minimal-interval count) and BM25 scores
        it with the caller's constituent idf sum (see spans.py /
        intervals.py for exact semantics and documented Lucene
        divergences)."""
        if self.posblobs is None:
            raise RuntimeError(
                "index was built without store_positions=True — span "
                "queries need the positional sidecar"
            )
        if kernel == "spans":
            from .spans import all_terms, requirement_sets, span_freqs
        else:
            from .intervals import all_terms, requirement_sets, span_freqs
        from .term_engine import subset_positions

        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        reqs = requirement_sets(tree)
        present = {t for t in all_terms(tree) if t in self.terms}
        decoded = {t: self._decoded_positions(t) for t in sorted(present)}
        cand = None
        for rs in reqs:
            avail = sorted(t for t in rs if t in present)
            if not avail:
                return empty
            if len(avail) == 1:
                docs = decoded[avail[0]][0]
            else:
                docs = np.unique(
                    np.concatenate([decoded[t][0] for t in avail])
                )
            if cand is None:
                cand = docs
            else:
                cand = cand[np.isin(cand, docs, assume_unique=True)]
            if len(cand) == 0:
                return empty
        streams: dict[str, tuple] = {}
        for t in sorted(present):
            idx, pos, tfcum = decoded[t]
            tf = np.diff(tfcum)
            idx_s, tf_s, pos_s = subset_positions(idx, tf, pos, cand)
            streams[t] = (
                np.repeat(idx_s, tf_s).astype(np.int64),
                pos_s.astype(np.int64),
            )
        hd, pf = span_freqs(tree, streams)
        if len(hd) == 0:
            return empty
        live = ~self.deleted_mask[hd]
        hd, pf = hd[live], pf[live]
        if len(hd) == 0:
            return empty
        k1, b = params.k1, params.b
        dl = self.dl[hd]
        scores_local = idf_sum * pf * (k1 + 1.0) / (
            pf + k1 * (1.0 - b + b * dl / avgdl)
        )
        dense = np.zeros(self.num_docs, dtype=np.float64)
        dense[hd] = scores_local
        cand2, cs = _select_topk(hd, dense, k, params)
        return (cand2 + self.doc_base).astype(np.int64), cs

    def wand_topk(
        self,
        terms: list[str],
        idf: dict[str, float],
        params: BM25Params,
        avgdl: float,
        k: int,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Block-max exact top-k with skip: window-partitioned block-max OR.

        Window boundaries are the union of every queried term's block
        last-doc-ids, so each window intersects at most one block per term
        and the windows PARTITION the doc-id space — a doc receives all of
        its term contributions inside exactly one window.  Windows are
        processed in descending upper-bound order (``ub(window) = Σ_t
        block_ub``); once the running kth-best score meets the next
        window's bound, every remaining window is skipped without decoding
        its payload blocks.  Upper bound per block is the dl→0 limit
        ``idf * (k1+1)*max_tf / (max_tf + k1*(1-b))`` — valid without doc
        lengths at skip time.  Rank- and score-identical to `dense_topk`.
        """
        k1, b = params.k1, params.b
        metas = []
        for t in terms:
            i = self.terms.get(t)
            if i is None:
                continue
            m = read_meta(self.blobs[i])
            mt = m.block_max_tf.astype(np.float64)
            ub_blocks = idf[t] * (k1 + 1.0) * mt / (mt + k1 * (1.0 - b))
            metas.append((t, m, ub_blocks))
        if not metas:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)

        bounds = np.unique(np.concatenate([m.block_last_doc for _, m, _ in metas]))
        n_win = len(bounds)
        # active block of term t in window w = first block with last >=
        # bound (vectorized: one searchsorted per term; windows past the
        # term's last block get sentinel n_blocks = no contribution)
        ub_win = np.zeros(n_win, dtype=np.float64)
        block_of_win: list[np.ndarray] = []
        for t, m, ubs in metas:
            bw = np.searchsorted(m.block_last_doc, bounds, side="left")
            block_of_win.append(bw)
            valid = bw < m.n_blocks
            ub_win[valid] += ubs[bw[valid]]

        # rounded-tie guard: a doc whose ROUNDED score equals the kth's can
        # sit up to tie_eps below the raw kth — never skip a window that
        # could still produce one
        tie_eps = (
            10.0 ** (-params.round_decimals)
            if params.round_decimals is not None
            else 0.0
        )
        order = np.argsort(-ub_win, kind="stable")
        top: list[tuple[float, int]] = []  # (score, doc_id), kept sorted small
        kth = -math.inf
        decoded: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
        for w in order.tolist():
            if len(top) >= k and ub_win[w] < kth - tie_eps:
                break  # every later window has a smaller bound — skip all
            w_lo = int(bounds[w - 1]) if w > 0 else -1
            w_hi = int(bounds[w])
            d_parts: list[np.ndarray] = []
            c_parts: list[np.ndarray] = []
            for ti, (t, m, _) in enumerate(metas):
                j = int(block_of_win[ti][w])
                if j >= m.n_blocks:
                    continue
                key = (ti, j)
                if key not in decoded:
                    decoded[key] = decode_block(m, j)
                doc_ids, tfs = decoded[key]
                if w_lo >= 0:
                    sel = (doc_ids > np.uint64(w_lo)) & (doc_ids <= np.uint64(w_hi))
                else:
                    sel = doc_ids <= np.uint64(w_hi)
                d = doc_ids[sel]
                tf = tfs[sel].astype(np.float64)
                if len(d) == 0:
                    continue
                idx = (d - np.uint64(self.doc_base)).astype(np.int64)
                live = ~self.deleted_mask[idx]
                d, tf, idx = d[live], tf[live], idx[live]
                if len(d) == 0:
                    continue
                dl = self.dl[idx]
                norm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
                d_parts.append(d.astype(np.int64))
                c_parts.append(idf[t] * norm)
            if d_parts:
                # vectorized per-window accumulation: sort + segmented sum
                d_all = np.concatenate(d_parts)
                c_all = np.concatenate(c_parts)
                order = np.argsort(d_all, kind="stable")
                d_all, c_all = d_all[order], c_all[order]
                starts = np.nonzero(
                    np.concatenate([[True], d_all[1:] != d_all[:-1]])
                )[0]
                uniq = d_all[starts]
                sums = np.add.reduceat(c_all, starts)
                top.extend(zip(sums.tolist(), uniq.tolist()))
                top.sort(key=lambda x: (-x[0], x[1]))
                # keep the kth value plus ties (within tie_eps when the
                # rounded-tie policy is active)
                if len(top) > k:
                    kth = top[k - 1][0]
                    cut = k
                    while cut < len(top) and top[cut][0] >= kth - tie_eps:
                        cut += 1
                    top = top[:cut]
                elif len(top) == k:
                    kth = top[k - 1][0]
        if params.round_decimals is None:
            top = top[:k]
        elif len(top) > k:
            r = params.round_decimals
            kth_r = round(top[k - 1][0], r)
            cut = k
            while cut < len(top) and round(top[cut][0], r) == kth_r:
                cut += 1
            top = top[:cut]
        ids = np.array([d for _, d in top], dtype=np.int64)
        sc = np.array([s for s, _ in top], dtype=np.float64)
        return ids, sc


# pinned-query promoted score base: exactly representable, far above any
# BM25 score, and PINNED_BASE - i stays exact for every realistic i
PINNED_BASE = float(2.0 ** 100)


def pinned_search(
    engine, pinned_ids: list[int], organic_query: str, k: int = 10,
) -> list[tuple[int, float]]:
    """ES ``pinned`` query, engine-agnostic (works over either serving
    engine — anything with ``.search``): the given ids rank FIRST in the
    given order (scores ``PINNED_BASE - position``, mirroring ES's
    descending ``Float.MAX_VALUE``-family scores), then the organic
    query's results with pinned ids removed.  Ids the index does not
    contain are dropped when the engine exposes ``search_ids`` (the
    shard engine); the term layout refuses tombstoned sources, so all
    pinned ids are live there by construction."""
    ids = list(dict.fromkeys(int(d) for d in pinned_ids))  # order-keeping
    if hasattr(engine, "search_ids"):
        live = {d for d, _ in engine.search_ids(ids)}
        ids = [d for d in ids if d in live]
    out: list[tuple[int, float]] = [
        (d, PINNED_BASE - i) for i, d in enumerate(ids[:k])
    ]
    if len(out) < k:
        pinned = set(ids)
        organic = engine.search(organic_query, k=k + len(pinned))
        for d, s in organic:
            if d in pinned:
                continue
            out.append((d, s))
            if len(out) >= k:
                break
    return out


def merge_topk(
    parts: list[tuple[np.ndarray, np.ndarray]], k: int,
    round_decimals: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Merge per-shard top-k lists: score desc, doc_id asc (deterministic).

    With ``round_decimals``, the k-cut keeps every doc whose ROUNDED
    score ties the kth-best (tie-aware fetch — see BM25Params)."""
    ids = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
    sc = np.concatenate([p[1] for p in parts]) if parts else np.empty(0, np.float64)
    order = np.lexsort((ids, -sc))
    if round_decimals is None or len(order) <= k:
        order = order[:k]
    else:
        kth_r = np.round(sc[order[k - 1]], round_decimals) if k else None
        cut = k
        while cut < len(order) and np.round(sc[order[cut]], round_decimals) == kth_r:
            cut += 1
        order = order[:cut]
    return ids[order], sc[order]


WAND_AUTO_MIN_DOCS = 50_000  # auto: consider skipping only past this
# ...and only when the query's posting mass is a tiny fraction of the
# shard: measured on a single 1M-doc shard, WAND's per-window traversal
# costs ~0.1 ms/window (windows ≈ posting mass / block_size) while the
# dense kernel's floor is ~1 ms per 1M docs — WAND wins only below
# ~0.1% candidate density (0.57 vs 1.0 ms at df 50-500; it LOSES 5.1 vs
# 1.4 ms at df 500-3000)
WAND_AUTO_MAX_DENSITY = 0.001


class _ScorerCore:
    """Shared scoring core: loads shard subsets, answers df + top-k.

    ``method``: ``"dense"`` always scores the full shard range;
    ``"wand"`` always uses the block-max skip traversal; ``"auto"``
    (default) picks WAND only when the shard is large (>
    ``WAND_AUTO_MIN_DOCS``) AND the query's posting mass is sparse
    (candidate density < ``WAND_AUTO_MAX_DENSITY``) — measured on the 1M
    corpus, vectorized dense scoring beats the per-window traversal
    whenever a hot term (e.g. ``import``) makes most docs candidates.
    Both paths are rank- AND score-identical (tested); the choice is
    purely a performance one."""

    def __init__(self, index_dir: str, shard_ids: list[int], params: BM25Params,
                 method: str = "auto"):
        if method not in ("auto", "dense", "wand"):
            raise ValueError(f"unknown scoring method {method!r}")
        info = IndexInfo(index_dir)
        self.index_dir = index_dir
        self.params = params
        self.avgdl = info.stats.avgdl
        self.num_docs = info.stats.num_docs
        self.method = method
        self.shards = [ShardData(info, sid) for sid in shard_ids]

    def local_dfs(self, terms: list[str]) -> dict[str, int]:
        return {t: sum(s.local_df(t) for s in self.shards) for t in terms}

    def local_cfs(self, terms: list[str]) -> dict[str, int]:
        return {t: sum(s.local_cf(t) for s in self.shards) for t in terms}

    def df_candidates(self, local_min: int) -> dict[str, int]:
        """Terms whose ACTOR-local df ≥ ``local_min`` (the Apriori
        frequent-singles probe: a globally-frequent term must clear
        ms/num_actors on at least one actor — pigeonhole-sound).
        Shingle terms are internal and excluded (the walk list)."""
        out: dict[str, int] = {}
        for s in self.shards:
            for t in s.walk_term_list:
                d = s.local_df(t)
                if d:
                    out[t] = out.get(t, 0) + d
        return {t: d for t, d in out.items() if d >= local_min}

    def pair_supports(self, pairs: list[tuple[str, str]]) -> np.ndarray:
        """Local co-occurrence count per candidate pair: one postings
        decode per distinct term per shard (cached), one sorted-array
        intersect per pair.  Counts include tombstoned docs, matching
        the dictionary df the singles use (Lucene stats semantics)."""
        counts = np.zeros(len(pairs), dtype=np.int64)
        for s in self.shards:
            cache: dict[str, np.ndarray] = {}

            def docs(t: str) -> np.ndarray:
                arr = cache.get(t)
                if arr is None:
                    i = s.terms.get(t)
                    arr = (decode_postings(s.blobs[i])[0]
                           if i is not None else np.empty(0, np.int64))
                    cache[t] = arr
                return arr

            for j, (a, b) in enumerate(pairs):
                da, db = docs(a), docs(b)
                if len(da) and len(db):
                    counts[j] += len(np.intersect1d(
                        da, db, assume_unique=True))
        return counts

    def match_ids_bool(self, clauses: dict) -> np.ndarray:
        """ALL matched global doc ids for a bool-clause dict — the
        gather feeding source-lineage aggregations (categorize_text);
        wire cost ∝ matches."""
        out = []
        for s in self.shards:
            ok = s._bool_eligible(
                sorted(set(clauses.get("must", []))),
                sorted(set(clauses.get("should", []))),
                sorted(set(clauses.get("must_not", []))),
                sorted(set(clauses.get("filter", []))),
                clauses.get("msm"),
                clauses.get("meta_filters"),
                clauses.get("range_filters"),
                s._postings_idx_fn(),
            )
            out.append(np.nonzero(ok)[0].astype(np.int64) + s.doc_base)
        return (np.concatenate(out) if out else np.empty(0, np.int64))

    def scripted_extstats(self, clauses: dict, field: str) -> tuple:
        """(n, sum, sumsq, min, max) of ``field`` (stored or ``script:``
        runtime column) over this actor's matched docs — the
        scripted_metric map+combine partial, O(1) wire."""
        v = self.agg_values(clauses, field, None)
        if len(v) == 0:
            return (0, 0.0, 0.0, float("inf"), float("-inf"))
        return (int(len(v)), float(v.sum()), float((v * v).sum()),
                float(v.min()), float(v.max()))

    def terms_page(self, prefix: str, after: str | None,
                   size: int) -> list[str]:
        """ES ``_terms_enum`` shard page: the first ``size`` dictionary
        terms with ``prefix`` strictly after ``after``, merged across
        this actor's shards.  The union of per-actor first-``size``
        pages contains the global first-``size`` (each list is sorted
        and complete up to its cut)."""
        out: set[str] = set()
        for s in self.shards:
            n = 0
            for t in s.expand_prefix(prefix):
                if after is not None and t <= after:
                    continue
                out.add(t)
                n += 1
                if n >= size:
                    break
        return sorted(out)[:size]

    def match_first(self, terms: list[str], n: int) -> np.ndarray:
        parts = [s.match_first(terms, n) for s in self.shards]
        docs = np.concatenate(parts) if parts else np.empty(0, np.int64)
        return np.sort(docs)[:n]

    def add_shards(self, shard_ids: list[int], avgdl: float,
                   num_docs: int) -> int:
        """Live refresh (append-only growth): load ONLY the new shards
        into this running actor and adopt the post-append global stats —
        existing shard state stays warm.  Returns the loaded count."""
        info = IndexInfo(self.index_dir)
        have = {s.shard_id for s in self.shards}
        added = 0
        for sid in shard_ids:
            if sid in have:
                continue
            self.shards.append(ShardData(info, sid))
            added += 1
        self.avgdl = avgdl
        self.num_docs = num_docs
        return added

    def _shard_topk(self, s: ShardData, terms, idf, k):
        if self.method == "wand":
            use_wand = True
        elif self.method == "auto" and s.num_docs >= WAND_AUTO_MIN_DOCS:
            mass = sum(s.local_df(t) for t in terms)
            use_wand = mass < WAND_AUTO_MAX_DENSITY * s.num_docs
        else:
            use_wand = False
        fn = s.wand_topk if use_wand else s.dense_topk
        return fn(terms, idf, self.params, self.avgdl, k)

    def topk(
        self, queries: list[tuple], idf: dict[str, float]
    ) -> list[tuple[int, np.ndarray, np.ndarray]]:
        """queries: (qid, terms, k) or (qid, terms, k, after) — the
        4-tuple form is the search_after cursor page (dense path)."""
        out = []
        for q in queries:
            qid, terms, k = q[0], q[1], q[2]
            after = q[3] if len(q) > 3 else None
            if after is not None:
                parts = [
                    s.dense_topk(terms, idf, self.params, self.avgdl, k, after)
                    for s in self.shards
                ]
            else:
                parts = [self._shard_topk(s, terms, idf, k) for s in self.shards]
            ids, sc = merge_topk(parts, k, self.params.round_decimals)
            out.append((qid, ids, sc))
        return out

    def sparse_topk(
        self, queries: list[tuple]
    ) -> list[tuple[int, np.ndarray, np.ndarray]]:
        """queries: [(qid, ((token, weight), ...) sorted by token, k)] —
        the ES ``sparse_vector`` fan-out (see ShardData.sparse_topk)."""
        out = []
        for qid, items, k in queries:
            parts = [s.sparse_topk(items, self.params, k)
                     for s in self.shards]
            ids, sc = merge_topk(parts, k, self.params.round_decimals)
            out.append((qid, ids, sc))
        return out

    def synonym_topk(
        self, queries: list[tuple]
    ) -> list[tuple[int, np.ndarray, np.ndarray]]:
        """queries: [(qid, slots, idf_slots, k)] — the Lucene
        SynonymQuery fan-out (see ShardData.synonym_topk)."""
        out = []
        for qid, slots, idf_slots, k in queries:
            parts = [
                s.synonym_topk(slots, idf_slots, self.params, self.avgdl, k)
                for s in self.shards
            ]
            ids, sc = merge_topk(parts, k, self.params.round_decimals)
            out.append((qid, ids, sc))
        return out

    def phrase_topk(
        self, queries: list[tuple]
    ) -> list[tuple[int, np.ndarray, np.ndarray]]:
        """queries: [(qid, phrase terms in order, idf_sum, k[, slop[,
        slop_mode]])]."""
        out = []
        for q in queries:
            qid, phrase, idf_sum, k = q[0], q[1], q[2], q[3]
            slop = q[4] if len(q) > 4 else 0
            slop_mode = q[5] if len(q) > 5 else "ordered"
            parts = [
                s.phrase_topk(phrase, idf_sum, self.params, self.avgdl, k,
                              slop, slop_mode)
                for s in self.shards
            ]
            ids, sc = merge_topk(parts, k, self.params.round_decimals)
            out.append((qid, ids, sc))
        return out

    def span_topk(
        self, queries: list[tuple], kernel: str = "spans"
    ) -> list[tuple[int, np.ndarray, np.ndarray]]:
        """queries: [(qid, positional tree, idf_sum, k)] — rewrites
        (``span_multi`` / ``match`` / ``prefix``) already applied by the
        coordinator; ``kernel`` picks the span vs intervals algebra."""
        out = []
        for qid, tree, idf_sum, k in queries:
            parts = [
                s.span_topk(tree, idf_sum, self.params, self.avgdl, k,
                            kernel=kernel)
                for s in self.shards
            ]
            ids, sc = merge_topk(parts, k, self.params.round_decimals)
            out.append((qid, ids, sc))
        return out

    def expand_prefix(self, prefix: str, cap: int | None = None) -> list[str]:
        out: set[str] = set()
        for s in self.shards:
            out.update(s.expand_prefix(prefix, cap))
        return sorted(out)

    def prefix_docs(self, prefix: str, k: int) -> np.ndarray:
        parts = [s.prefix_docs(prefix, k) for s in self.shards]
        docs = np.concatenate(parts) if parts else np.empty(0, np.int64)
        return np.sort(docs)[:k]

    def expand_wildcard(self, pattern: str, cap: int | None = None) -> list[str]:
        out: set[str] = set()
        for s in self.shards:
            out.update(s.expand_wildcard(pattern, cap))
        return sorted(out)

    def wildcard_docs(self, pattern: str, k: int) -> np.ndarray:
        parts = [s.wildcard_docs(pattern, k) for s in self.shards]
        docs = np.concatenate(parts) if parts else np.empty(0, np.int64)
        return np.sort(docs)[:k]

    def sqs_topk(self, tree: tuple, idf: dict, k: int):
        parts = [
            s.sqs_topk(tree, idf, self.params, self.avgdl, k)
            for s in self.shards
        ]
        return merge_topk(parts, k, self.params.round_decimals)

    def function_score_topk(
        self, terms: list[str], idf: dict, k: int, field: str,
        factor: float, modifier: str, missing: float, boost_mode: str,
    ):
        parts = [
            s.function_score_topk(
                terms, idf, self.params, self.avgdl, k, field,
                factor, modifier, missing, boost_mode,
            )
            for s in self.shards
        ]
        return merge_topk(parts, k, self.params.round_decimals)

    def decay_score_topk(
        self, terms: list[str], idf: dict, k: int, field: str,
        function: str, origin: float, scale: float, offset: float,
        decay: float, boost_mode: str,
    ):
        parts = [
            s.decay_score_topk(
                terms, idf, self.params, self.avgdl, k, field,
                function, origin, scale, offset, decay, boost_mode,
            )
            for s in self.shards
        ]
        return merge_topk(parts, k, self.params.round_decimals)

    def function_score_multi_topk(
        self, terms: list[str], idf: dict, k: int, specs: list[dict],
        score_mode: str, boost_mode: str, max_boost: float | None,
    ):
        parts = [
            s.function_score_multi_topk(
                terms, idf, self.params, self.avgdl, k, specs,
                score_mode, boost_mode, max_boost,
            )
            for s in self.shards
        ]
        return merge_topk(parts, k, self.params.round_decimals)

    def collapse_topk(
        self, terms: list[str], idf: dict, field: str, inner_size: int,
    ):
        parts = [
            s.collapse_topk(terms, idf, self.params, self.avgdl,
                            field, inner_size)
            for s in self.shards
        ]
        ids = np.concatenate([p[0] for p in parts])
        sc = np.concatenate([p[1] for p in parts])
        gv = np.concatenate([np.asarray(p[2], dtype=object) for p in parts])
        return ids, sc, gv

    def expand_regexp(self, pattern: str, cap: int | None = None) -> list[str]:
        out: set[str] = set()
        for s in self.shards:
            out.update(s.expand_regexp(pattern, cap))
        return sorted(out)

    def expand_range(self, gte=None, lte=None, gt=None, lt=None,
                     cap: int | None = None) -> list[str]:
        out: set[str] = set()
        for s in self.shards:
            out.update(s.expand_range(gte, lte, gt, lt, cap))
        return sorted(out)

    def regexp_docs(self, pattern: str, k: int) -> np.ndarray:
        parts = [s.regexp_docs(pattern, k) for s in self.shards]
        docs = np.concatenate(parts) if parts else np.empty(0, np.int64)
        return np.sort(docs)[:k]

    def expand_fuzzy(
        self, term: str, max_edits: int = 1, prefix_length: int = 0,
        transpositions: bool = False,
    ) -> list[tuple[str, int]]:
        # distance is a property of (query, term) — identical across
        # shards, so a dict union suffices
        out: dict[str, int] = {}
        for s in self.shards:
            out.update(s.expand_fuzzy(term, max_edits, prefix_length,
                                      transpositions))
        return sorted(out.items())

    def docs_deleted(self, doc_ids: list[int]) -> list[int]:
        """Subset of ``doc_ids`` tombstoned in this group's shards."""
        out = []
        for d in doc_ids:
            for s in self.shards:
                if s.doc_base <= d < s.doc_base + s.num_docs:
                    if s.deleted_mask[d - s.doc_base]:
                        out.append(d)
                    break
        return out

    def exists_docs(self, field: str, k: int) -> np.ndarray:
        parts = []
        for s in self.shards:
            col = s.meta_col(field)
            ok = ~s.deleted_mask
            # numeric columns: NaN = missing; object columns: None
            if col.dtype.kind == "f":
                ok &= ~np.isnan(col)
            else:
                ok &= np.array([v is not None for v in col])
            parts.append(np.nonzero(ok)[0][:k] + s.doc_base)
        return (
            np.sort(np.concatenate(parts))[:k]
            if parts else np.empty(0, np.int64)
        )

    def script_docs(self, source: str, k: int) -> np.ndarray:
        """ES ``script`` query (filter context): live docs whose
        compiled expression over doc values is truthy (≠ 0); k smallest
        global ids per shard.  NaN comparisons are falsy (numpy), so
        docs missing a referenced value don't match — the painless
        null-pointer analogue, disclosed as non-matching."""
        from .funcscore import ScriptExpr

        expr = ScriptExpr(source)
        parts = []
        for s in self.shards:
            env = {f: s.meta_col(f).astype(np.float64)
                   for f in expr.fields}
            env["_score"] = np.zeros(s.num_docs, np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                v = expr(env)
            ok = ~s.deleted_mask & ~np.isnan(v) & (v != 0.0)
            parts.append(np.nonzero(ok)[0][:k] + s.doc_base)
        return (
            np.sort(np.concatenate(parts))[:k]
            if parts else np.empty(0, np.int64)
        )

    def doc_term_positions(
        self, pairs: list[tuple[int, list[str]]]
    ) -> list[dict[str, list[int]] | None]:
        """Per (global doc_id, terms) pair: matched positions, or None if
        no shard of this group owns the doc."""
        out: list[dict[str, list[int]] | None] = []
        for doc, terms in pairs:
            hit = None
            for s in self.shards:
                if s.doc_base <= doc < s.doc_base + s.num_docs:
                    hit = s.term_positions_for_doc(doc, terms)
                    break
            out.append(hit)
        return out

    def agg_match(
        self, terms: list[str], group_col: str, stats_col: str | None = None
    ) -> dict:
        merged: dict = {}
        for s in self.shards:
            merge_agg_partials(merged, s.agg_match(terms, group_col, stats_col))
        return merged

    def agg_match_multi(
        self, terms: list[str], group_cols: list[str],
        stats_col: str | None = None,
    ) -> dict:
        merged: dict = {}
        for s in self.shards:
            merge_agg_partials(
                merged, s.agg_match_multi(terms, group_cols, stats_col)
            )
        return merged

    def agg_match_bool(
        self, clauses: dict, group_col: str, stats_col: str | None = None
    ) -> dict:
        merged: dict = {}
        for s in self.shards:
            merge_agg_partials(
                merged, s.agg_match_bool(clauses, group_col, stats_col)
            )
        return merged

    def agg_date_histogram(
        self, clauses: dict, field: str, interval: str,
        stats_col: str | None = None, group_col: str | None = None,
        time_zone: str | None = None, offset=None,
    ) -> dict:
        merged: dict = {}
        for s in self.shards:
            merge_agg_partials(
                merged,
                s.agg_date_histogram(clauses, field, interval, stats_col,
                                     group_col, time_zone, offset),
            )
        return merged

    def agg_range(
        self, clauses: dict, field: str,
        ranges: list[tuple[float | None, float | None]],
        stats_col: str | None = None,
    ) -> dict:
        merged: dict = {}
        for s in self.shards:
            merge_agg_partials(
                merged, s.agg_range(clauses, field, ranges, stats_col)
            )
        return merged

    def agg_histogram(
        self, clauses: dict, field: str, interval: float,
        offset: float = 0.0, stats_col: str | None = None,
    ) -> dict:
        merged: dict = {}
        for s in self.shards:
            merge_agg_partials(
                merged,
                s.agg_histogram(clauses, field, interval, offset, stats_col),
            )
        return merged

    def agg_background(self, group_col: str,
                       stats_col: str | None = None) -> dict:
        merged: dict = {}
        for s in self.shards:
            merge_agg_partials(merged, s.agg_background(group_col,
                                                        stats_col))
        return merged

    def agg_missing(
        self, clauses: dict, field: str, stats_col: str | None = None
    ) -> tuple:
        n, vc, sm, mn, mx = 0, 0, 0.0, np.inf, -np.inf
        for s in self.shards:
            pn, pvc, ps, pmn, pmx = s.agg_missing(clauses, field,
                                                  stats_col)
            n += pn
            vc += pvc
            sm += ps
            mn = min(mn, pmn)
            mx = max(mx, pmx)
        return (n, vc, sm, mn, mx)

    def agg_filters(
        self, named_clauses: list[tuple[str, dict]],
        stats_col: str | None = None,
        other_key: str | None = None,
    ) -> dict:
        merged: dict = {}
        for s in self.shards:
            merge_opt_stats_partials(
                merged, s.agg_filters(named_clauses, stats_col, other_key)
            )
        return merged

    def agg_adjacency(
        self, named_clauses: list[tuple[str, dict]], separator: str = "&",
    ) -> dict:
        merged: dict = {}
        for s in self.shards:
            for key, c in s.agg_adjacency(named_clauses, separator).items():
                merged[key] = merged.get(key, 0) + c
        return merged

    def agg_top_hits(
        self, clauses: dict, idf: dict, group_col: str, k: int,
        sort: tuple[str, str] | None = None,
    ) -> dict:
        parts = [
            s.agg_top_hits(clauses, idf, self.params, self.avgdl,
                           group_col, k, sort)
            for s in self.shards
        ]
        if sort is not None:
            return _merge_group_sorted(
                parts, k, desc=sort[1] == "desc", final=False
            )
        return _merge_group_topk(parts, k, self.params.round_decimals)

    def sort_topk(
        self, clauses: dict, field: str, desc: bool, k: int,
        after: tuple | None = None,
    ) -> list[tuple]:
        return [s.sort_topk(clauses, field, desc, k, after)
                for s in self.shards]

    def agg_join_children(
        self, clauses: dict, idf: dict, parent_field: str
    ) -> dict:
        merged: dict = {}
        for s in self.shards:
            merge_agg_partials(
                merged,
                s.agg_join_children(clauses, idf, self.params,
                                    self.avgdl, parent_field),
            )
        return merged

    def meta_pairs_in(
        self, field: str, values: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        ids, vals = [], []
        for s in self.shards:
            i, v = s.meta_pairs_in(field, values)
            ids.append(i)
            vals.append(v)
        return np.concatenate(ids), np.concatenate(vals)

    def meta_values_of(
        self, ids: np.ndarray, field: str
    ) -> tuple[np.ndarray, np.ndarray]:
        rid, vals = [], []
        for s in self.shards:
            i, v = s.meta_values_of(ids, field)
            rid.append(i)
            vals.append(v)
        return np.concatenate(rid), np.concatenate(vals)

    def agg_children_of(
        self, parent_field: str, pids: np.ndarray, pkeys: np.ndarray,
        stats_col: str | None = None,
    ) -> dict:
        merged: dict = {}
        for s in self.shards:
            merge_agg_partials(
                merged, s.agg_children_of(parent_field, pids, pkeys,
                                          stats_col),
            )
        return merged

    def agg_ids_buckets(
        self, ids: np.ndarray, group_col: str,
        stats_col: str | None = None,
    ) -> dict:
        merged: dict = {}
        for s in self.shards:
            merge_agg_partials(
                merged, s.agg_ids_buckets(ids, group_col, stats_col),
            )
        return merged

    def agg_composite(
        self, clauses: dict, sources: list[tuple], size: int,
        after: tuple | None,
    ) -> dict:
        from .datehist import merge_count_partials

        merged: dict = {}
        for s in self.shards:
            merge_count_partials(
                merged, s.agg_composite(clauses, sources, size, after)
            )
        # re-cap (exact, same top-k merge argument)
        keys = sorted(merged)[:size]
        return {k: merged[k] for k in keys}

    def agg_extended_stats(self, clauses: dict, field: str) -> tuple:
        from .datehist import merge_extstats

        return merge_extstats(
            [s.agg_extended_stats(clauses, field) for s in self.shards]
        )

    def agg_field_counts(
        self, clauses: dict, field: str, weight_field: str | None = None
    ) -> dict:
        merged: dict = {}
        for s in self.shards:
            merge_agg_partials(
                merged, s.agg_field_counts(clauses, field, weight_field)
            )
        return merged

    def agg_values(
        self, clauses: dict, field: str, sketch_k: int | None = None
    ) -> object:
        parts = [s.agg_values(clauses, field, sketch_k) for s in self.shards]
        if sketch_k is not None:
            from .datehist import merge_count_partials

            merged: dict = {}
            for p in parts:
                merge_count_partials(merged, p)
            return merged
        parts = [p for p in parts if len(p)]
        return np.sort(np.concatenate(parts)) if parts else np.empty(0)

    def agg_cardinality(
        self, clauses: dict, field: str, hll_p: int | None = None
    ) -> object:
        if hll_p is not None:
            from ..ops.sketch import HyperLogLog

            h = HyperLogLog(p=hll_p)
            for s in self.shards:
                h.merge(HyperLogLog.from_bytes(
                    s.agg_cardinality(clauses, field, hll_p)
                ))
            return h.to_bytes()
        parts = [s.agg_cardinality(clauses, field) for s in self.shards]
        parts = [p for p in parts if len(p)]
        return np.unique(np.concatenate(parts)) if parts else np.empty(0)

    def agg_string_stats(self, clauses: dict, field: str) -> tuple:
        from .statagg import merge_string_stats

        return merge_string_stats(
            [s.agg_string_stats(clauses, field) for s in self.shards]
        )

    def agg_matrix_stats(self, clauses: dict, fields: list[str]) -> list:
        return [s.agg_matrix_stats(clauses, fields) for s in self.shards]

    def agg_paired_diff(
        self, clauses: dict, field_a: str, field_b: str
    ) -> tuple:
        from .datehist import merge_extstats

        return merge_extstats(
            [s.agg_paired_diff(clauses, field_a, field_b)
             for s in self.shards]
        )

    def agg_top_metrics(
        self, clauses: dict, sort_field: str, desc: bool, size: int,
        metric_fields: list[str],
    ) -> list[tuple]:
        from .statagg import merge_top_metrics

        return merge_top_metrics(
            [s.agg_top_metrics(clauses, sort_field, desc, size,
                               metric_fields)
             for s in self.shards],
            size, desc,
        )

    def bool_topk(
        self,
        queries: list[tuple[int, dict, int]],
        idf: dict[str, float],
    ) -> list[tuple[int, np.ndarray, np.ndarray]]:
        """queries: [(qid, {must,should,must_not,filter,msm}, k)]."""
        out = []
        for qid, clauses, k in queries:
            parts = [
                s.bool_topk(
                    clauses.get("must", []), clauses.get("should", []),
                    clauses.get("must_not", []), clauses.get("filter", []),
                    idf, self.params, self.avgdl, k,
                    clauses.get("msm"), clauses.get("meta_filters"),
                    clauses.get("range_filters"),
                )
                for s in self.shards
            ]
            ids, sc = merge_topk(parts, k, self.params.round_decimals)
            out.append((qid, ids, sc))
        return out

    def terms_set_topk(
        self, terms: list[str], minimum_field: str,
        idf: dict[str, float], k: int,
    ) -> tuple[np.ndarray, np.ndarray]:
        parts = [
            s.terms_set_topk(terms, minimum_field, idf, self.params,
                             self.avgdl, k)
            for s in self.shards
        ]
        return merge_topk(parts, k, self.params.round_decimals)


@ray.remote
class ShardScorer(_ScorerCore):
    """Ray actor wrapper (state loaded once; the ST1 pattern)."""


class QueryEngine:
    """Distributed BM25 serving: shard actors + global df/idf + merge.

    ``num_actors`` shard-groups are loaded once; queries fan out and merge
    on the driver.  Global df is summed across actors per queried term
    (no global term dictionary is ever materialized — at 10^12 docs that
    dictionary itself would be a dataset).
    """

    def __init__(
        self,
        index_dir: str | Path,
        num_actors: int = 4,
        params: BM25Params | None = None,
        analyzer: str | None = None,
        method: str = "auto",
    ):
        self.info = IndexInfo(index_dir)
        self.index_dir = str(index_dir)
        self.params = params or BM25Params()
        self.analyzer_name = analyzer or self.info.manifest.analyzer
        shard_ids = self.info.shard_ids()
        num_actors = max(1, min(num_actors, len(shard_ids)))
        groups: list[list[int]] = [[] for _ in range(num_actors)]
        for i, sid in enumerate(shard_ids):
            groups[i % num_actors].append(sid)
        self.actors = [
            ShardScorer.remote(str(index_dir), g, self.params, method)
            for g in groups
        ]
        self._shard_groups = groups
        self._text_reader = None  # lazy CorpusTextReader (highlight only)
        self._ids_store = None  # lazy DocStore (ids queries only)
        # per-term global df is immutable for a built index — cache it so
        # repeated terms (query distributions are Zipfian) skip the df
        # round-trip and a search needs ONE actor round instead of two
        self._df_cache: dict[str, int] = {}

    def _analyze(self, query: str) -> list[str]:
        fn = get_analyzer(
            "code" if self.analyzer_name == "per_lang" else self.analyzer_name
        )
        m = self.info.manifest
        return sorted(set(clip_tokens(fn(query), m.min_token_len, m.max_token_len)))

    def _analyze_seq(self, query: str) -> list[str]:
        """Order-preserving, duplicates-kept analysis (phrase/intervals
        ``match`` text — position semantics need the original order)."""
        fn = get_analyzer(
            "code" if self.analyzer_name == "per_lang" else self.analyzer_name
        )
        m = self.info.manifest
        return clip_tokens(fn(query), m.min_token_len, m.max_token_len)

    def dfs(self, terms: list[str]) -> dict[str, int]:
        """Global document frequencies (cached; one actor round for the
        uncached terms — the suggesters' popularity probe)."""
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            df_parts = ray.get([a.local_dfs.remote(missing) for a in self.actors])
            for t in missing:
                self._df_cache[t] = sum(p[t] for p in df_parts)
        return {t: self._df_cache[t] for t in terms}

    def terms_enum(self, prefix: str = "", *, size: int = 10,
                   after: str | None = None) -> list[tuple[str, int]]:
        """ES ``_terms_enum``: the first ``size`` dictionary terms with
        ``prefix`` (strictly after ``after`` — the pagination cursor),
        in term order.  One page round (per-actor sorted first-``size``,
        union ⊇ global first-``size``) + one cached df round.  Returned
        with df — a disclosed ADDITION over ES (which returns bare
        terms); like Lucene, df counts tombstoned docs until compaction.
        """
        pages = ray.get([
            a.terms_page.remote(prefix, after, size) for a in self.actors
        ])
        terms = sorted(set().union(*pages))[:size]
        df = self.dfs(terms)
        return [(t, df[t]) for t in terms]

    def idfs(self, terms: list[str]) -> dict[str, float]:
        dfs = self.dfs(terms)
        n = self.info.stats.num_docs
        return {
            t: math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            for t in terms
        }

    def cfs(self, terms: list[str]) -> dict[str, int]:
        """Global collection frequencies (total term freq — the ES
        ``ttf`` term statistic), one actor round."""
        parts = ray.get([a.local_cfs.remote(terms) for a in self.actors])
        return {t: sum(p[t] for p in parts) for t in terms}

    def termvectors(
        self,
        doc_id: int,
        term_statistics: bool = False,
        field_statistics: bool = False,
    ) -> dict:
        """ES ``_termvectors`` (the realtime path: re-analyze the stored
        ``_source``, exactly what ES does when termvectors aren't stored
        at index time): per-term ``term_freq`` + in-doc ``positions``;
        ``term_statistics=True`` adds ``doc_freq``/``ttf`` probed from
        the index; ``field_statistics=True`` adds doc_count /
        sum_doc_freq / sum_ttf from the build stats."""
        from ..state.docstore import CorpusTextReader
        from .termvectors import build_termvector

        if self._text_reader is None:
            self._text_reader = CorpusTextReader(self.info.index_dir)
        text = self._text_reader.mget([doc_id])[0]
        out = build_termvector(text, self._sqs_analyze())
        if term_statistics and out["terms"]:
            ts = sorted(out["terms"])
            dfs, cfs = self.dfs(ts), self.cfs(ts)
            for t, row in out["terms"].items():
                row["doc_freq"] = int(dfs.get(t, 0))
                row["ttf"] = int(cfs.get(t, 0))
        if field_statistics:
            st = self.info.stats
            out["field_statistics"] = {
                "doc_count": int(st.num_docs),
                "sum_ttf": int(st.total_tokens),
                "sum_doc_freq": int(sum(
                    s.num_postings
                    for s in self.info.manifest.shards.values()
                )),
            }
        return out

    def search(
        self,
        query: str,
        k: int = 10,
        search_after: tuple[float, int] | None = None,
    ) -> list[tuple[int, float]]:
        """BM25 top-k; ``search_after`` = the (score, doc_id) of the last
        hit of the previous page (ES search_after pagination) — returns
        the next k hits strictly after it in (score desc, doc asc)
        order.  With ``round_decimals`` set, pass the ROUNDED score the
        engine returned (the sort key).  Cursor pages run the dense
        scoring path (the cursor filter precedes local top-k selection,
        which the WAND heap cut can't express)."""
        if search_after is None:
            return self.search_batch([(0, query, k)])[0]
        terms = self._analyze(query)
        if not terms:
            return []
        idf = self.idfs(terms)
        per_actor = ray.get(
            [a.topk.remote([(0, terms, k, tuple(search_after))], idf)
             for a in self.actors]
        )
        parts = [(res[0][1], res[0][2]) for res in per_actor]
        ids, sc = merge_topk(parts, k, self.params.round_decimals)
        return list(zip(ids.tolist(), sc.tolist()))

    def search_sparse_vector(
        self, query_vector: dict[str, float], k: int = 10
    ) -> list[tuple[int, float]]:
        """ES ``sparse_vector`` query (the 8.x learned-sparse /
        text-expansion retrieval): ``query_vector`` maps tokens to
        weights; score(doc) = Σ weight(token) × stored term impact.
        The stored impact here is the term frequency (ES stores ELSER
        model weights — same dot-product algebra and serving path, the
        weight provenance differs; disclosed, no model in this repo).
        Tokens are matched against index terms VERBATIM — a sparse
        query vector comes from a model vocabulary, not the analyzer.
        The reference forwards query DSL to ES untouched
        (/root/reference/asset/elasticsearch_reader/reader.js:6-31)."""
        items = tuple(sorted(
            (t, float(w)) for t, w in query_vector.items() if w
        ))
        if not items:
            return []
        per_actor = ray.get(
            [a.sparse_topk.remote([(0, items, k)]) for a in self.actors]
        )
        parts = [(res[0][1], res[0][2]) for res in per_actor]
        ids, sc = merge_topk(parts, k, self.params.round_decimals)
        return list(zip(ids.tolist(), sc.tolist()))

    def search_synonyms(
        self,
        query: str | list,
        synonyms: dict[str, list[str]] | None = None,
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES ``match`` over a synonym-expanding analyzer (the
        ``synonym``/``synonym_graph`` token filter → Lucene
        ``SynonymQuery``): each analyzed token with an entry in
        ``synonyms`` becomes a SLOT of interchangeable terms scored as
        one pseudo-term — tf = Σ members' frequencies in the doc
        (SynonymScorer), df = MAX over the members' global dfs (Lucene
        ``SynonymQuery#docFreq``; disclosed: Lucene takes the max of
        SEARCH-TIME TermStates, identical here).  ``query`` may instead
        be a pre-built slot list (each item a term or a member list).
        Slot members sort — the float-sum accumulation pin the SQL
        oracle mirrors."""
        if isinstance(query, str):
            toks = self._analyze(query)
            syn = synonyms or {}
            slots = [
                tuple(sorted({t, *syn.get(t, ())})) for t in toks
            ]
        else:
            slots = [
                tuple(sorted(set(s))) if isinstance(s, (list, tuple, set))
                else (s,)
                for s in query
            ]
        if not slots:
            return []
        all_terms = sorted({t for s in slots for t in s})
        dfs = self.dfs(all_terms)
        n = self.info.stats.num_docs
        slot_dfs = [max(dfs[t] for t in s) for s in slots]
        idf_slots = tuple(
            math.log(1.0 + (n - df + 0.5) / (df + 0.5)) for df in slot_dfs
        )
        per_actor = ray.get(
            [a.synonym_topk.remote([(0, tuple(slots), idf_slots, k)])
             for a in self.actors]
        )
        parts = [(res[0][1], res[0][2]) for res in per_actor]
        ids, sc = merge_topk(parts, k, self.params.round_decimals)
        return list(zip(ids.tolist(), sc.tolist()))

    def search_phrase(
        self, phrase: str | list[str], k: int = 10, slop: int = 0,
        slop_mode: str = "ordered",
    ) -> list[tuple[int, float]]:
        """Exact phrase query (ES ``match_phrase``) over an index built
        with ``store_positions=True``.  ``phrase`` is free text analyzed
        in ORDER (duplicates kept) or a pre-analyzed token list; score =
        BM25 with tf = phrase frequency and idf = sum of the constituent
        terms' idfs (Lucene PhraseQuery).  ``slop > 0`` matches sloppy
        occurrences: ``slop_mode="ordered"`` (default) is the greedy
        minimal chain (span ≤ len-1+slop, SQL-reproducible);
        ``slop_mode="lucene"`` is Lucene's SloppyPhraseMatcher —
        reordering admitted, matches weighted 1/(1+matchLength) into a
        float tf (see ``search.sloppy``).

        A pre-analyzed ``phrase`` list may hold LISTS of alternative
        terms per slot (the Lucene MultiPhraseQuery shape); idf = Σ over
        every term occurrence across slots, and repeated terms among
        alternatives engage the multi-term repeat machinery
        (``sloppy.repeat_plan``) in the lucene slop mode."""
        if isinstance(phrase, str):
            fn = get_analyzer(
                "code" if self.analyzer_name == "per_lang" else self.analyzer_name
            )
            m = self.info.manifest
            terms = clip_tokens(fn(phrase), m.min_token_len, m.max_token_len)
        else:
            terms = list(phrase)
        if not terms:
            return []
        flat = [t for s in terms
                for t in ([s] if isinstance(s, str) else s)]
        idf = self.idfs(sorted(set(flat)))
        idf_sum = float(sum(idf[t] for t in flat))
        per_actor = ray.get(
            [a.phrase_topk.remote([(0, terms, idf_sum, k, slop, slop_mode)])
             for a in self.actors]
        )
        parts = [(res[0][1], res[0][2]) for res in per_actor]
        ids, sc = merge_topk(parts, k, self.params.round_decimals)
        return list(zip(ids.tolist(), sc.tolist()))

    def search_spans(self, tree: dict, k: int = 10) -> list[tuple[int, float]]:
        """Lucene span queries (ES ``span_term`` / ``span_or`` /
        ``span_near`` / ``span_first`` / ``span_not`` / ``span_multi``)
        — see ``search.spans`` for the tree shape and exact semantics.
        ``span_multi`` prefixes expand GLOBALLY (deterministic across
        shard layouts) before the fan-out; idf = Σ over every leaf term
        occurrence (or-group members each contribute); score = BM25 with
        tf = distinct top-level match starts."""
        from .spans import leaf_terms, rewrite_multi

        tree = rewrite_multi(tree, self._expand_span_multi)
        leaves = leaf_terms(tree)
        if not leaves:
            return []
        idf = self.idfs(sorted(set(leaves)))
        idf_sum = float(sum(idf[t] for t in leaves))
        per_actor = ray.get(
            [a.span_topk.remote([(0, tree, idf_sum, k)])
             for a in self.actors]
        )
        parts = [(res[0][1], res[0][2]) for res in per_actor]
        ids, sc = merge_topk(parts, k, self.params.round_decimals)
        return list(zip(ids.tolist(), sc.tolist()))

    def search_intervals(
        self, tree: dict, k: int = 10
    ) -> list[tuple[int, float]]:
        """ES ``intervals`` query (``match`` / ``any_of`` / ``all_of`` /
        ``prefix`` + filters) — see ``search.intervals`` for the tree
        shape and the minimal-interval semantics.  ``match`` text is
        analyzed with the engine's analyzer and ``prefix`` rules expand
        GLOBALLY (layout-deterministic) before the fan-out; idf = Σ over
        every SOURCE leaf-term occurrence (filters gate, they don't
        score); tf = the doc's top-level minimal-interval count."""
        from .intervals import desugar, leaf_terms, rewrite_multi

        tree = desugar(tree, self._analyze_seq)
        tree = rewrite_multi(tree, self._expand_span_multi)
        leaves = leaf_terms(tree)
        if not leaves:
            return []
        idf = self.idfs(sorted(set(leaves)))
        idf_sum = float(sum(idf[t] for t in leaves))
        per_actor = ray.get(
            [a.span_topk.remote([(0, tree, idf_sum, k)], kernel="intervals")
             for a in self.actors]
        )
        parts = [(res[0][1], res[0][2]) for res in per_actor]
        ids, sc = merge_topk(parts, k, self.params.round_decimals)
        return list(zip(ids.tolist(), sc.tolist()))

    def expand_prefix(self, prefix: str, max_expansions: int = 50) -> list[str]:
        """Global prefix expansion: union of the shard dictionaries'
        matching terms, first ``max_expansions`` in term order (computed
        from the full index, not per segment, so scoring is deterministic
        across shard layouts)."""
        per_actor = ray.get(
            # per-actor cap is sound: the global first-N in sorted order
            # is a subset of the union of per-shard first-Ns
            [a.expand_prefix.remote(prefix, max_expansions) for a in self.actors]
        )
        out = sorted(set().union(*map(set, per_actor)))
        return out[:max_expansions]

    def expand_wildcard(self, pattern: str, max_expansions: int = 50) -> list[str]:
        """Global wildcard expansion, first ``max_expansions`` in term
        order (per-shard walks emit in term order, so the per-actor cap
        is sound by the expand_prefix argument)."""
        per_actor = ray.get(
            [a.expand_wildcard.remote(pattern, max_expansions)
             for a in self.actors]
        )
        out = sorted(set().union(*map(set, per_actor)))
        return out[:max_expansions]

    def expand_regexp(self, pattern: str, max_expansions: int = 50) -> list[str]:
        """Global regexp expansion, first ``max_expansions`` in term
        order."""
        per_actor = ray.get(
            [a.expand_regexp.remote(pattern, max_expansions)
             for a in self.actors]
        )
        out = sorted(set().union(*map(set, per_actor)))
        return out[:max_expansions]

    def expand_fuzzy_capped(
        self, term: str, fuzziness: int = 1, prefix_length: int = 0,
        max_expansions: int = 50,
    ) -> list[str]:
        """Global fuzzy expansion capped (distance asc, term asc) — the
        ES FuzzyQuery ordering; distance is a (query, term) property so
        the per-actor dict union is exact."""
        per_actor = ray.get(
            [a.expand_fuzzy.remote(term, fuzziness, prefix_length)
             for a in self.actors]
        )
        merged: dict[str, int] = {}
        for part in per_actor:
            merged.update(dict(part))
        ranked = sorted(merged.items(), key=lambda kv: (kv[1], kv[0]))
        return sorted(t for t, _ in ranked[:max_expansions])

    def expand_range_capped(self, gte=None, lte=None, gt=None, lt=None,
                            max_expansions: int = 50) -> list[str]:
        """Global lexical-range expansion, first ``max_expansions`` in
        term order."""
        per_actor = ray.get(
            [a.expand_range.remote(gte, lte, gt, lt, max_expansions)
             for a in self.actors]
        )
        out = sorted(set().union(*map(set, per_actor)))
        return out[:max_expansions]

    def _expand_span_multi(self, spec: dict, m: int) -> list[str]:
        """span_multi wrapper dispatch (prefix/wildcard/regexp/fuzzy/
        range) — the deterministic global expansions above."""
        from .spans import expand_multi_spec

        return expand_multi_spec(
            spec, m, self.expand_prefix, self.expand_wildcard,
            self.expand_regexp, self.expand_fuzzy_capped,
            range_fn=self.expand_range_capped,
        )

    def search_prefix(self, prefix: str, k: int = 10) -> list[tuple[int, float]]:
        """ES ``prefix`` query under its default constant_score rewrite:
        every live doc containing any term starting with ``prefix``
        scores 1.0; top-k ties break on doc_id ascending (the engine's
        merge order), so the result is the k smallest matching ids."""
        if not prefix:
            return []
        per_actor = ray.get([a.prefix_docs.remote(prefix, k) for a in self.actors])
        docs = np.sort(np.concatenate(per_actor))[:k]
        return [(int(d), 1.0) for d in docs]

    def search_wildcard(self, pattern: str, k: int = 10) -> list[tuple[int, float]]:
        """ES ``wildcard`` query (``*`` any run, ``?`` one char) under its
        default constant_score rewrite: every live doc containing any
        matching term scores 1.0; ties break doc_id ascending, so the
        result is the k smallest matching ids."""
        if not pattern:
            return []
        per_actor = ray.get([a.wildcard_docs.remote(pattern, k) for a in self.actors])
        docs = np.sort(np.concatenate(per_actor))[:k]
        return [(int(d), 1.0) for d in docs]

    def search_function_score(
        self,
        query: str | list[str],
        field: str,
        k: int = 10,
        factor: float = 1.0,
        modifier: str = "none",
        missing: float = 1.0,
        boost_mode: str = "multiply",
    ) -> list[tuple[int, float]]:
        """ES ``function_score`` with a ``field_value_factor`` function:
        score the ``match`` disjunction with BM25, then combine each
        doc's score with F = modifier(factor · doc-values[field]) via
        ``boost_mode`` (multiply, the ES default, or sum).  The factor
        applies IN-SHARD beside the scoring loop — no second pass, no
        driver-side hydration; docs missing the field take ``missing``.
        ES convention note: the log modifiers are base 10."""
        terms = (
            self._analyze(query) if isinstance(query, str)
            else sorted(set(query))
        )
        if not terms:
            return []
        idf = self.idfs(terms)
        per_actor = ray.get(
            [a.function_score_topk.remote(
                terms, idf, k, field, float(factor), modifier,
                float(missing), boost_mode,
            ) for a in self.actors]
        )
        ids, sc = merge_topk(per_actor, k, self.params.round_decimals)
        return list(zip(ids.tolist(), sc.tolist()))

    def search_decay_score(
        self,
        query: str | list[str],
        field: str,
        function: str,
        origin: float,
        scale: float,
        offset: float = 0.0,
        decay: float = 0.5,
        boost_mode: str = "multiply",
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES ``function_score`` with a DECAY function (``gauss`` |
        ``exp`` | ``linear``) over numeric/date doc values: score the
        ``match`` disjunction with BM25, then combine each doc's score
        with the decay of its field value's distance from ``origin``
        (see :func:`apply_decay` for the exact formulations) via
        ``boost_mode`` (multiply, the ES default, or sum).  Date fields
        take origin/scale/offset in epoch MICROS (the engine's doc-value
        unit).  Docs missing the field take function value 1.0 — the ES
        decay contract.  Fully vectorized in-shard."""
        terms = (
            self._analyze(query) if isinstance(query, str)
            else sorted(set(query))
        )
        if not terms:
            return []
        idf = self.idfs(terms)
        per_actor = ray.get(
            [a.decay_score_topk.remote(
                terms, idf, k, field, function, float(origin),
                float(scale), float(offset), float(decay), boost_mode,
            ) for a in self.actors]
        )
        ids, sc = merge_topk(per_actor, k, self.params.round_decimals)
        return list(zip(ids.tolist(), sc.tolist()))

    def search_function_score_multi(
        self,
        query: str | list[str],
        functions: list[dict],
        score_mode: str = "multiply",
        boost_mode: str = "multiply",
        max_boost: float | None = None,
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES ``function_score`` with a FUNCTIONS LIST: each function
        (field_value_factor | decay | weight | script_score |
        random_score) optionally carries a docmeta ``filter`` and a
        ``weight``; matching functions combine per ``score_mode``
        (multiply/sum/avg/max/min/first), cap at ``max_boost``, and
        apply to the BM25 query score per ``boost_mode``
        (multiply/sum/avg/max/min/replace).  Docs matching no function
        keep their query score.  Spec shapes, the script expression
        subset and disclosed divergences: :mod:`.funcscore`."""
        terms = (
            self._analyze(query) if isinstance(query, str)
            else sorted(set(query))
        )
        if not terms:
            return []
        idf = self.idfs(terms)
        per_actor = ray.get(
            [a.function_score_multi_topk.remote(
                terms, idf, k, functions, score_mode, boost_mode,
                max_boost,
            ) for a in self.actors]
        )
        ids, sc = merge_topk(per_actor, k, self.params.round_decimals)
        return list(zip(ids.tolist(), sc.tolist()))

    def search_simple_query_string(
        self, query: str, k: int = 10, default_operator: str = "or",
        minimum_should_match: int | None = None,
    ) -> list[tuple[int, float]]:
        """ES ``simple_query_string``: the forgiving mini query language
        (terms, ``+``/``|`` infix operators, ``-`` negation, parens,
        ``"phrases"``/``"phrase"~N``, ``word*`` prefixes — the supported
        surface and its documented Lucene divergences live in
        :mod:`.sqs`).  The clause tree ships to every shard actor and
        evaluates there over sparse (ids, scores) algebra — Lucene
        BooleanQuery scoring: a doc's score is the SUM of its matching
        scoring clauses — then merges with the standard serving tie
        contract."""
        from .sqs import apply_minimum_should_match, parse_simple_query_string

        tree = parse_simple_query_string(
            query, self._sqs_analyze(), default_operator
        )
        tree = apply_minimum_should_match(tree, minimum_should_match)
        if tree is None:
            return []
        return self._eval_sqs_tree(tree, k)

    def search_query_string(
        self, query: str, k: int = 10, default_operator: str = "or",
        minimum_should_match: int | None = None,
    ) -> list[tuple[int, float]]:
        """ES ``query_string``: the classic Lucene query syntax — the
        ``q=`` string the reference forwards verbatim to ES
        (``asset/elasticsearch_reader/index.js:118-122``).  AND/OR/NOT
        and ``&&``/``||``/``!``, ``+``/``-`` occur modifiers, parens,
        ``field:value`` docmeta clauses, ``[a TO b]``/cmp ranges,
        ``clause^boost``, phrases (``"…"~N``), wildcards (``te*t``),
        fuzzy (``word~N``) — grammar, scoring and disclosed divergences
        in :mod:`.qs`.  Evaluates on the shard actors over the same
        sparse clause algebra as ``simple_query_string``.  The
        request-level ``minimum_should_match`` (≥ m of the root's
        optional clauses) applies via the shared msm count node."""
        from .qs import parse_query_string
        from .sqs import apply_minimum_should_match

        tree = parse_query_string(
            query, self._sqs_analyze(), default_operator,
            default_field=self.info.manifest.text_col,
        )
        tree = apply_minimum_should_match(tree, minimum_should_match)
        if tree is None:
            return []
        return self._eval_sqs_tree(tree, k)

    def _sqs_analyze(self):
        fn = get_analyzer(
            "code" if self.analyzer_name == "per_lang" else self.analyzer_name
        )
        m = self.info.manifest

        def analyze(s: str) -> list[str]:
            return clip_tokens(fn(s), m.min_token_len, m.max_token_len)

        return analyze

    def _eval_sqs_tree(self, tree: tuple, k: int) -> list[tuple[int, float]]:
        """Ship a clause tree (sqs grammar or the compound-query nodes —
        dismax / boosting / constscore) to every shard actor, evaluate
        over sparse (ids, scores) algebra, merge with the standard tie
        contract."""
        from .sqs import rewrite_fuzzy, tree_leaves

        # ``word~N`` fuzzy leaves expand against the GLOBAL dictionary
        # here (one coordinator round per leaf), so every shard scores
        # the same deterministic (dist, term)-capped expansion
        tree = rewrite_fuzzy(
            tree, lambda base, fz: self.expand_fuzzy(base, fuzziness=fz)
        )
        need: list[str] = []
        for leaf in tree_leaves(tree):
            if leaf[0] == "term":
                need.append(leaf[1])
            elif leaf[0] == "phrase":
                need.extend(leaf[1])
            elif leaf[0] == "fuzzyexp":
                need.extend(t for t, _ in leaf[2])
        idf = self.idfs(sorted(set(need))) if need else {}
        per_actor = ray.get(
            [a.sqs_topk.remote(tree, idf, k) for a in self.actors]
        )
        ids, sc = merge_topk(per_actor, k, self.params.round_decimals)
        return list(zip(ids.tolist(), sc.tolist()))

    def search_collapse(
        self,
        query: str | list[str],
        field: str,
        k_groups: int = 10,
        inner_size: int = 3,
    ) -> list[dict]:
        """ES field collapsing (``collapse`` + ``inner_hits``): hits of
        the ``match`` disjunction group by a keyword doc-values field;
        groups rank by their best hit (rounded score desc, doc asc),
        each returning its top ``inner_size`` hits.  Exact over the FULL
        match set (per-shard partials are bounded by distinct-groups ×
        inner_size — :mod:`.collapse` has the argument; ES's own
        window-bounded collapse can miss groups, disclosed divergence in
        our favor).  → [{group, group_rank, inner_rank, doc_id,
        score}]."""
        from .collapse import collapse_rows

        terms = (
            self._analyze(query) if isinstance(query, str)
            else sorted(set(query))
        )
        if not terms:
            return []
        idf = self.idfs(terms)
        parts = ray.get(
            [a.collapse_topk.remote(terms, idf, field, inner_size)
             for a in self.actors]
        )
        ids = np.concatenate([p[0] for p in parts])
        sc = np.concatenate([p[1] for p in parts])
        gv = np.concatenate([np.asarray(p[2], dtype=object) for p in parts])
        return collapse_rows(ids, sc, gv, k_groups, inner_size,
                             self.params.round_decimals)

    def explain(self, query: str, doc_id: int) -> dict:
        """ES ``_explain``: the BM25 score breakdown of one doc for a
        match query — per matched term df/idf/tf/length-norm and the
        contribution; ``score`` equals what ``search`` would rank this
        doc with (tested).  Realtime: the doc re-analyzes via its
        termvector, stats probe the live index."""
        from .termvectors import explain_from_termvector

        tv = self.termvectors(doc_id, term_statistics=True)
        return explain_from_termvector(
            tv, self._analyze(query), self.info.stats.num_docs,
            self.info.stats.avgdl, self.params.k1, self.params.b,
        )

    def suggest_term(
        self, text: str, size: int = 5, suggest_mode: str = "missing",
        max_edits: int = 2, prefix_length: int = 1,
        max_candidates: int = 200,
    ) -> list[dict]:
        """ES ``term`` suggester (spell correction): per analyzed input
        token, dictionary terms within ``max_edits`` ranked (score desc,
        df desc, term asc) — semantics in :mod:`.suggest`.  Candidates
        come from the deterministic (dist, term)-capped global fuzzy
        expansion; dfs probe in one actor round per token.  Returns
        [{token, suggestion, score, freq}] in input-token order."""
        from .suggest import rank_term_suggestions

        tokens = list(dict.fromkeys(self._analyze(text)))
        out: list[dict] = []
        for tok in tokens:
            cands = self.expand_fuzzy(
                tok, fuzziness=max_edits, prefix_length=prefix_length,
                max_expansions=max_candidates,
            )
            dfs = self.dfs(sorted({t for t, _ in cands} | {tok}))
            for row in rank_term_suggestions(
                tok, cands, dfs, dfs.get(tok, 0), size, suggest_mode,
            ):
                out.append({"token": tok, **row})
        return out

    def suggest_completion(
        self, prefix: str, size: int = 10, max_candidates: int = 1000,
    ) -> list[dict]:
        """ES ``completion`` suggester analogue: dictionary terms with
        the prefix ranked by df (popularity) desc, term asc — popularity
        derives from the indexed corpus instead of ES's explicit
        per-suggestion weights (disclosed, :mod:`.suggest`).  The
        term-ordered candidate walk is capped at ``max_candidates``."""
        from .suggest import rank_completions

        if not prefix:
            return []
        terms = self.expand_prefix(prefix, max_expansions=max_candidates)
        return rank_completions(terms, self.dfs(terms), size)

    def suggest_phrase(
        self, text: str, size: int = 3, max_edits: int = 1,
        prefix_length: int = 1, num_candidates: int = 6,
        max_errors: int = 2, collate: bool = False,
        collate_prune: bool = False,
    ) -> list[dict]:
        """ES ``phrase`` suggester (did-you-mean): whole-phrase
        corrections ranked by a stupid-backoff bigram language model
        whose counts come from the index_phrases SHINGLE postings
        (requires an ``index_phrases=True`` index — the layout IS the
        language model).  ``collate=True`` drops suggestions with zero
        exact-phrase matches (one k=1 phrase probe per surviving
        suggestion — the shingle chain makes it a term fetch for 2-term
        phrases); ``collate_prune=True`` keeps them with a
        ``collate_match`` flag (ES ``collate.prune``).  Formula +
        divergences: :mod:`.suggest`."""
        from ..index.build import SHINGLE_SEP
        from .suggest import suggest_phrase

        if not getattr(self.info.manifest, "index_phrases", False):
            raise ValueError(
                "phrase suggester needs an index_phrases=True index "
                "(shingle postings supply the bigram counts)"
            )
        collate_fn = (
            (lambda words: bool(self.search_phrase(list(words), k=1)))
            if collate or collate_prune else None
        )
        return suggest_phrase(
            text, self._sqs_analyze(), self.expand_fuzzy, self.cfs,
            int(self.info.stats.total_tokens), SHINGLE_SEP,
            size=size, max_edits=max_edits, prefix_length=prefix_length,
            num_candidates=num_candidates, max_errors=max_errors,
            collate_match=collate_fn, collate_prune=collate_prune,
        )

    def search_dis_max(
        self, queries: list[str], tie_breaker: float = 0.0, k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES ``dis_max``: per doc, the MAX over the sub-queries' scores
        plus ``tie_breaker`` × the remaining sub-queries' scores; a doc
        matches if any sub-query matches.  Each sub-query is the
        simple_query_string grammar (so match disjunctions, phrases,
        prefixes and fuzzy terms all compose); sub-queries that analyze
        away drop leniently."""
        from .sqs import parse_simple_query_string

        analyze = self._sqs_analyze()
        trees = [parse_simple_query_string(q, analyze, "or") for q in queries]
        trees = [t for t in trees if t is not None]
        if not trees:
            return []
        return self._eval_sqs_tree(
            ("dismax", float(tie_breaker), tuple(trees)), k
        )

    def search_boosting(
        self, positive: str, negative: str,
        negative_boost: float = 0.5, k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES ``boosting`` query: docs matching ``positive`` keep its
        score, demoted (× ``negative_boost``) where they ALSO match
        ``negative`` — the negative clause never adds or removes docs.
        Both clauses take the simple_query_string grammar."""
        from .sqs import parse_simple_query_string

        analyze = self._sqs_analyze()
        pos = parse_simple_query_string(positive, analyze, "or")
        if pos is None:
            return []
        neg = parse_simple_query_string(negative, analyze, "or")
        if neg is None:
            return self._eval_sqs_tree(pos, k)
        return self._eval_sqs_tree(
            ("boosting", pos, neg, float(negative_boost)), k
        )

    def search_constant_score(
        self, filter_query: str, boost: float = 1.0, k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES ``constant_score``: every doc matching the filter-context
        query scores exactly ``boost`` (ties break doc_id ascending).
        The filter takes the simple_query_string grammar."""
        from .sqs import parse_simple_query_string

        tree = parse_simple_query_string(filter_query, self._sqs_analyze(), "or")
        if tree is None:
            return []
        return self._eval_sqs_tree(("constscore", tree, float(boost)), k)

    def search_regexp(self, pattern: str, k: int = 10) -> list[tuple[int, float]]:
        """ES ``regexp`` query under its default constant_score rewrite:
        every live doc containing any dictionary term the ANCHORED
        pattern matches scores 1.0; ties break doc_id ascending, so the
        result is the k smallest matching ids.  Pattern syntax is the
        RE2/Python-re common subset (see ``regexp_expand_sorted``)."""
        if not pattern:
            return []
        per_actor = ray.get([a.regexp_docs.remote(pattern, k) for a in self.actors])
        docs = np.sort(np.concatenate(per_actor))[:k]
        return [(int(d), 1.0) for d in docs]

    def expand_fuzzy(
        self, term: str, fuzziness: int = 1, prefix_length: int = 0,
        max_expansions: int = 50, transpositions: bool = False,
    ) -> list[tuple[str, int]]:
        """Global fuzzy expansion: dictionary terms within edit
        distance ``fuzziness`` (Damerau-OSA when ``transpositions`` —
        the ES ``fuzzy_transpositions`` option), capped at
        ``max_expansions`` by (distance asc, term asc) — deterministic
        across shard layouts."""
        per_actor = ray.get(
            [a.expand_fuzzy.remote(term, fuzziness, prefix_length,
                                   transpositions)
             for a in self.actors]
        )
        merged: dict[str, int] = {}
        for part in per_actor:
            merged.update(part)
        ranked = sorted(merged.items(), key=lambda kv: (kv[1], kv[0]))
        return ranked[:max_expansions]

    def search_fuzzy(
        self, term: str, fuzziness: int = 1, prefix_length: int = 0,
        max_expansions: int = 50, k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES ``fuzzy`` query, scoring_boolean rewrite: the term expands
        to dictionary terms within edit distance ``fuzziness``
        (``expand_fuzzy`` cap order), and each doc scores the weighted
        BM25 disjunction Σ_t boost(t)·idf(t)·norm(tf_t) with the Lucene
        FuzzyTermsEnum boost ``1 − dist/min(len(query), len(t))``.
        (Lucene's default blended-frequency rewrite substitutes a blended
        df across expansions; the scoring_boolean form is the documented
        alternative and is exactly SQL-reproducible.)"""
        exps = self.expand_fuzzy(term, fuzziness, prefix_length, max_expansions)
        if not exps:
            return []
        idf = self.idfs([t for t, _ in exps])
        weighted = {
            t: idf[t] * (1.0 - d / max(1, min(len(term), len(t))))
            for t, d in exps
        }
        terms_sorted = sorted(weighted)
        per_actor = ray.get(
            [a.topk.remote([(0, terms_sorted, k)], weighted) for a in self.actors]
        )
        parts = [(res[0][1], res[0][2]) for res in per_actor]
        ids, sc = merge_topk(parts, k, self.params.round_decimals)
        return list(zip(ids.tolist(), sc.tolist()))

    def aggregate(
        self,
        query: str | list[str] | dict,
        group_by: str,
        stats_on: str | None = None,
        order: tuple[str, str] | None = None,
        size: int | None = None,
        include=None,
        exclude=None,
        min_doc_count: int = 1,
    ) -> list[dict]:
        """ES search + ``terms`` aggregation (with an optional nested
        ``stats`` sub-aggregation): buckets of ``group_by`` (a stored
        docmeta keyword column) over ALL docs matching ``query`` — not
        just the top-k.  ``query`` is free text / a term list (the
        ``match`` disjunction) OR a bool-clause dict ({must, should,
        must_not, filter, minimum_should_match, filter_meta,
        filter_range} — the full clause algebra, as ES allows any query
        under an aggregation).  Bucket order is ES's default (doc_count
        desc, then key asc) unless ``order=(metric, "asc"|"desc")`` —
        the ES terms-agg ``order`` option with metric ``_count`` /
        ``_key`` / a stats sub-agg path (``sum``/``avg``/``min``/
        ``max``); ``size`` cuts AFTER the global sort, and unlike ES's
        shard_size heuristic the cut is EXACT — every bucket already
        crossed the O(buckets) merge, so ordering by a sub-agg metric
        loses nothing.  Stats cover ``dl`` (token count) or any numeric
        docmeta column; partial (count,sum,min,max) rows merge
        associatively across shard actors, so driver work is
        O(buckets).  ``include`` / ``exclude`` (anchored-regex string or
        value collection) and ``min_doc_count`` are the ES terms-agg
        value filters — EXACT here (``datehist.filter_terms_buckets``);
        the terms ``missing`` parameter is served by the standalone
        ``missing`` aggregation instead."""
        from .datehist import filter_terms_buckets, order_terms_buckets

        if isinstance(query, dict):
            clauses = self._query_clauses(query)
            per_actor = ray.get(
                [a.agg_match_bool.remote(clauses, group_by, stats_on)
                 for a in self.actors]
            )
        else:
            terms = (self._analyze(query) if isinstance(query, str)
                     else sorted(set(query)))
            if not terms:
                return []
            per_actor = ray.get(
                [a.agg_match.remote(terms, group_by, stats_on)
                 for a in self.actors]
            )
        rows = filter_terms_buckets(
            self._agg_buckets(per_actor, stats_on), include, exclude,
            min_doc_count,
        )
        return order_terms_buckets(rows, order, size)

    def rare_terms(
        self, query: str | list[str] | dict, field: str,
        max_doc_count: int = 1, size: int | None = None,
    ) -> list[dict]:
        """ES ``rare_terms`` aggregation: the LONG TAIL of ``field`` over
        the matched docs — buckets with doc_count ≤ ``max_doc_count``,
        (doc_count asc, key asc) order.  Exact (no CuckooFilter false
        negatives — ES's approximation disclosed in
        ``datehist.rare_terms_buckets``)."""
        from .datehist import rare_terms_buckets

        return rare_terms_buckets(
            self.aggregate(query, field), max_doc_count, size
        )

    def multi_terms(
        self,
        query: str | list[str],
        fields: list[str],
        stats_on: str | None = None,
        order: tuple[str, str] | None = None,
        size: int | None = None,
    ) -> list[dict]:
        """ES ``multi_terms`` aggregation (2 fields): buckets keyed by
        the VALUE PAIR (field1, field2) over all docs matching the
        ``match`` disjunction; docs missing either value are omitted.
        Default order doc_count desc then key asc (tuple-lexicographic
        — the ES parent-then-sub order); ``order``/``size`` as in
        :meth:`aggregate` (exact cut).  Optional ``stats`` sub-agg over
        a numeric column."""
        from .datehist import order_terms_buckets

        terms = (
            self._analyze(query) if isinstance(query, str)
            else sorted(set(query))
        )
        if not terms:
            return []
        per_actor = ray.get(
            [a.agg_match_multi.remote(terms, list(fields), stats_on)
             for a in self.actors]
        )
        return order_terms_buckets(
            self._agg_buckets(per_actor, stats_on), order, size
        )

    def _agg_buckets(self, per_actor: list[dict], stats_on: str | None
                     ) -> list[dict]:
        merged: dict = {}
        for part in per_actor:
            merge_agg_partials(merged, part)
        return self._agg_buckets_rows(merged, stats_on)

    def _query_clauses(self, query: str | list[str] | dict) -> dict | None:
        """Free text / term list / bool-clause dict → the analyzed clause
        dict the shard actors consume (None ⇔ an empty non-dict query,
        which matches nothing)."""
        if isinstance(query, dict):
            def _clause(v):
                if isinstance(v, str):
                    return self._analyze(v) if v else []
                return sorted(set(v))

            return {
                "must": _clause(query.get("must", "")),
                "should": _clause(query.get("should", "")),
                "must_not": _clause(query.get("must_not", "")),
                "filter": _clause(query.get("filter", "")),
                "msm": query.get("minimum_should_match"),
                "meta_filters": query.get("filter_meta"),
                "range_filters": query.get("filter_range"),
            }
        terms = (
            self._analyze(query) if isinstance(query, str)
            else sorted(set(query))
        )
        if not terms:
            return None
        return {"must": [], "should": terms, "must_not": [],
                "filter": [], "msm": 1}

    def date_histogram(
        self,
        query: str | list[str] | dict,
        field: str,
        interval: str = "month",
        stats_on: str | None = None,
        min_doc_count: int = 1,
        extended_bounds: tuple | None = None,
        group_by: str | None = None,
        time_zone: str | None = None,
        offset=None,
    ) -> list[dict]:
        """ES ``date_histogram`` aggregation (with an optional ``stats``
        sub-aggregation) over ALL docs matching ``query`` — free text / a
        term list (the ``match`` disjunction) or a full bool-clause dict,
        exactly like :meth:`aggregate`.  ``interval`` is an ES
        ``calendar_interval`` (day/week/month/quarter/year, UTC, weeks
        starting Monday) or ``fixed_interval`` (``<n><ms|s|m|h|d>``,
        epoch-aligned).  Buckets come back key-ASCENDING (the ES
        date_histogram order), ``key`` = bucket start in epoch MICROS;
        per-shard partials merge associatively so driver work is
        O(buckets).  ``min_doc_count=0`` fills empty buckets between the
        first and last non-empty one, and ``extended_bounds=(lo, hi)``
        (epoch micros or ISO strings) widens that span — both ES-exact
        (driver-side enumeration, O(buckets))."""
        from .datehist import buckets_from_partials

        if group_by is not None:
            min_doc_count = 1  # ES zero-fill applies to the parent only
        clauses = self._query_clauses(query)
        if clauses is None:
            # an empty/unanalyzable query matches nothing, but ES still
            # zero-fills the extended_bounds span
            return buckets_from_partials(
                [], stats_on, interval=interval,
                min_doc_count=min_doc_count,
                extended_bounds=extended_bounds,
                time_zone=time_zone, offset=offset,
            )
        per_actor = ray.get(
            [a.agg_date_histogram.remote(clauses, field, interval, stats_on,
                                         group_by, time_zone, offset)
             for a in self.actors]
        )
        return buckets_from_partials(
            per_actor, stats_on, interval=interval,
            min_doc_count=min_doc_count, extended_bounds=extended_bounds,
            time_zone=time_zone, offset=offset,
        )

    def adjacency_matrix(
        self,
        filters: dict | list[tuple],
        separator: str = "&",
    ) -> list[dict]:
        """ES ``adjacency_matrix`` aggregation: a doc_count bucket for
        every named filter AND every pairwise intersection (key = the
        two names sorted, joined by ``separator`` — the ES default
        ``&``).  Each filter is a free-text match / term list / full
        bool-clause dict like :meth:`aggregate`'s query.  Only buckets
        with doc_count ≥ 1 return (the ES contract), sorted key
        ascending.  One actor round carries all filters; per-shard
        partials are O(filters²) counts."""
        items = (
            list(filters.items()) if isinstance(filters, dict)
            else list(filters)
        )
        named = []
        for n, q in items:
            c = self._query_clauses(q)
            if c is None:  # matches nothing — contributes no buckets
                c = {"must": ["\x00impossible\x00"], "should": [],
                     "must_not": [], "filter": [], "msm": None}
            named.append((str(n), c))
        merged: dict = {}
        per_actor = ray.get(
            [a.agg_adjacency.remote(named, separator)
             for a in self.actors]
        )
        for p in per_actor:
            for key, c in p.items():
                merged[key] = merged.get(key, 0) + c
        return [
            {"key": k, "doc_count": int(merged[k])}
            for k in sorted(merged)
        ]

    def count(self, query) -> int:
        """ES ``_count``: the exact number of live documents matching
        ``query`` (free-text match / term list / full bool-clause dict,
        exactly like :meth:`aggregate`'s query argument) — one
        non-scoring eligibility round via the filters-agg machinery; no
        scores computed, no ids shipped.  Reference context: the role
        uses ES count probes for all slicing decisions
        (/root/reference/asset/elasticsearch_reader/elasticsearch_date_range/slicer.js)."""
        return int(self.filters_agg({"q": query})[0]["doc_count"])

    def filters_agg(
        self,
        filters: dict | list[tuple],
        stats_on: str | None = None,
        other_bucket: bool = False,
        other_bucket_key: str = "_other_",
    ) -> list[dict]:
        """ES ``filters`` aggregation: one NAMED bucket per filter
        query — each a free-text match / term list / full bool-clause
        dict, exactly like :meth:`aggregate`'s query argument — with an
        optional ``stats`` sub-aggregation.  Buckets come back in
        DECLARATION order (the ES keyed-filters contract), empty
        filters included with ``doc_count`` 0.  One actor round carries
        ALL filters; per-shard partials are (count, sum, min, max) per
        name, so driver work is O(filters).  ``other_bucket=True``
        appends the ES other bucket (LIVE docs matching NO filter,
        keyed ``other_bucket_key``) — computed shard-side from the
        union mask in the same round."""
        items = (
            list(filters.items()) if isinstance(filters, dict)
            else list(filters)
        )
        named = [(str(n), self._query_clauses(q)) for n, q in items]
        send = [(n, c) for n, c in named if c is not None]
        other_key = other_bucket_key if other_bucket else None
        merged: dict = {}
        if send or other_key is not None:
            per_actor = ray.get(
                [a.agg_filters.remote(send, stats_on, other_key)
                 for a in self.actors]
            )
            for p in per_actor:
                merge_opt_stats_partials(merged, p)
        keys = [n for n, _ in named]
        if other_key is not None:
            keys.append(other_key)
        rows = []
        for n in keys:
            c, s, mn, mx = merged.get(n, (0, None, None, None))
            row = {"key": n, "doc_count": int(c)}
            if stats_on is not None and s is not None:
                row.update({"sum": s, "min": mn, "max": mx, "avg": s / c})
            rows.append(row)
        return rows

    def range_agg(
        self,
        query: str | list[str] | dict,
        field: str,
        ranges: list[dict | tuple],
        stats_on: str | None = None,
    ) -> list[dict]:
        """ES ``range`` / ``date_range`` aggregation (with an optional
        ``stats`` sub-aggregation) over ALL docs matching ``query``.
        ``ranges`` is a list of ES-style ``{"from": x, "to": y}`` dicts
        (or ``(from, to)`` tuples) — ``from`` inclusive, ``to``
        exclusive, None/missing = open end; date fields accept ISO
        strings (converted to the engines' epoch-micro doc values).
        Overlapping ranges behave like ES: a doc lands in every matching
        bucket.  One bucket row PER RANGE comes back in declaration
        order, empty ranges included (``doc_count`` 0)."""
        from .datehist import range_buckets_from_partials, to_epoch_us_bound

        norm = [
            (
                to_epoch_us_bound(r.get("from") if isinstance(r, dict) else r[0]),
                to_epoch_us_bound(r.get("to") if isinstance(r, dict) else r[1]),
            )
            for r in ranges
        ]
        clauses = self._query_clauses(query)
        if clauses is None:
            # ES emits every declared range (doc_count 0) even when the
            # query matches nothing
            return range_buckets_from_partials([], norm, stats_on)
        per_actor = ray.get(
            [a.agg_range.remote(clauses, field, norm, stats_on)
             for a in self.actors]
        )
        return range_buckets_from_partials(per_actor, norm, stats_on)

    def histogram(
        self,
        query: str | list[str] | dict,
        field: str,
        interval: float,
        offset: float = 0.0,
        stats_on: str | None = None,
        min_doc_count: int = 1,
        extended_bounds: tuple | None = None,
    ) -> list[dict]:
        """ES numeric ``histogram`` aggregation (optional ``stats``
        sub-agg) over ALL docs matching ``query``: bucket key =
        ``floor((v - offset)/interval)*interval + offset``, buckets
        key-ascending; ``min_doc_count=0`` fills empty buckets between
        the span ends (``extended_bounds`` widens it) — all ES-exact."""
        from .datehist import buckets_from_partials

        clauses = self._query_clauses(query)
        if clauses is None:
            return buckets_from_partials(
                [], stats_on, interval=(float(interval), float(offset)),
                min_doc_count=min_doc_count,
                extended_bounds=extended_bounds,
            )
        per_actor = ray.get(
            [a.agg_histogram.remote(clauses, field, float(interval),
                                    float(offset), stats_on)
             for a in self.actors]
        )
        return buckets_from_partials(
            per_actor, stats_on, interval=(float(interval), float(offset)),
            min_doc_count=min_doc_count, extended_bounds=extended_bounds,
        )

    def composite(
        self,
        query: str | list[str] | dict,
        sources: list[tuple],
        size: int = 100,
        after: tuple | None = None,
    ) -> tuple[list[dict], tuple | None]:
        """ES ``composite`` aggregation: paginate through ALL buckets of
        a multi-source key in ascending key order.  ``sources`` =
        [(name, kind, field, *args)] with kind ∈ ``terms`` /
        ``date_histogram`` (interval) / ``histogram`` (interval,
        offset); returns (buckets, after_key) — pass ``after=after_key``
        for the next page.  Each shard ships at most ``size`` buckets
        per page regardless of its bucket count (exact by the top-k
        merge argument), which is what lets this enumerate 10^8 buckets
        without a 10^8-row exchange."""
        from .datehist import composite_render

        clauses = self._query_clauses(query)
        if clauses is None:
            return [], None
        parts = ray.get(
            [a.agg_composite.remote(clauses, sources, size, after)
             for a in self.actors]
        )
        return composite_render(parts, [s[0] for s in sources], size)

    def significant_terms(
        self,
        query: str | list[str] | dict,
        field: str,
        size: int = 10,
        background_filter=None,
    ) -> list[dict]:
        """ES ``significant_terms`` over a keyword field: values
        overrepresented in the docs matching ``query`` relative to the
        whole index, scored with the JLH heuristic
        ``(fg% − bg%) · (fg% / bg%)`` (the ES default), values whose
        foreground rate does not exceed the background rate dropped.
        Foreground counts are the terms-agg partials; background counts
        sweep each shard once and CACHE per field (the corpus-side
        denominator never changes between refreshes).  Buckets come back
        score-descending (ties by key), capped at ``size``.

        ``background_filter`` (the ES option) narrows the background to
        the docs matching ANOTHER query (same grammar as ``query``) —
        "unusual vs a context", not vs the whole index; those counts
        are the same terms-agg partials over the filter's match set (no
        cache — filter-dependent)."""
        clauses = self._query_clauses(query)
        if clauses is None:
            return []
        per_actor = ray.get(
            [a.agg_match_bool.remote(clauses, field, None)
             for a in self.actors]
        )
        fg: dict = {}
        for part in per_actor:
            merge_agg_partials(fg, part)
        if not fg:
            return []
        from .datehist import significant_terms_rows

        if background_filter is not None:
            bclauses = self._query_clauses(background_filter)
            if bclauses is None:
                return []
            bg = {}
            for part in ray.get(
                [a.agg_match_bool.remote(bclauses, field, None)
                 for a in self.actors]
            ):
                merge_agg_partials(bg, part)
            return significant_terms_rows(fg, bg, size)
        if not hasattr(self, "_bg_cache"):
            self._bg_cache: dict[str, dict] = {}
        bg = self._bg_cache.get(field)
        if bg is None:
            bg = {}
            for part in ray.get(
                [a.agg_background.remote(field) for a in self.actors]
            ):
                merge_agg_partials(bg, part)
            self._bg_cache[field] = bg
        return significant_terms_rows(fg, bg, size)

    def significant_text(
        self,
        query: str | list[str],
        size: int = 10,
        sample_size: int = 200,
    ) -> list[dict]:
        """ES ``significant_text``: terms overrepresented in the TEXT of
        docs matching ``query`` vs the whole index, JLH-scored.  Like
        ES, the foreground re-analyzes a SAMPLE of matching docs (ES
        samples per shard; here the sample is the first ``sample_size``
        matched doc ids ascending — deterministic and SQL-reproducible,
        disclosed) and counts each term once per doc; the background is
        the dictionary df over the index.  fg_total = sampled docs,
        bg_total = index docs (the text-mode totals)."""
        from ..state.docstore import CorpusTextReader
        from .datehist import significant_terms_rows

        ids, texts = self.sample_match_texts(query, sample_size)
        if len(ids) == 0:
            return []
        analyze = self._sqs_analyze()
        fg: dict[str, tuple] = {}
        for text in texts:
            for t in set(analyze(text)):
                c = fg.get(t)
                fg[t] = (c[0] + 1,) if c else (1,)
        bg = {t: (df,) for t, df in self.dfs(sorted(fg)).items()}
        return significant_terms_rows(
            fg, bg, size,
            fg_total=len(ids), bg_total=self.info.stats.num_docs,
        )

    def sample_match_texts(
        self, query: str | list[str], sample_size: int
    ) -> tuple[np.ndarray, list[str]]:
        """Deterministic matched-doc sample (first ``sample_size`` ids
        ascending — SQL-reproducible, the disclosed stand-in for ES's
        per-shard sampling) + their hydrated texts: the foreground both
        ``significant_text`` and ``graph_explore`` re-analyze."""
        from ..state.docstore import CorpusTextReader

        terms = (
            self._analyze(query) if isinstance(query, str)
            else sorted(set(query))
        )
        if not terms:
            return np.empty(0, np.int64), []
        per_actor = ray.get(
            [a.match_first.remote(terms, sample_size) for a in self.actors]
        )
        ids = np.sort(np.concatenate(per_actor))[:sample_size]
        if len(ids) == 0:
            return ids, []
        if self._text_reader is None:
            self._text_reader = CorpusTextReader(self.info.index_dir)
        return ids, self._text_reader.mget(ids.tolist())

    def top_hits(
        self,
        query: str | list[str] | dict,
        group_by: str,
        k: int = 3,
        sort: tuple[str, str] | None = None,
        source_fields: list[str] | None = None,
    ) -> list[dict]:
        """ES ``top_hits`` sub-aggregation under a ``terms`` bucket: per
        group value, the top-``k`` matching docs by BM25 (serving tie
        contract — rounded score desc, doc asc) plus the group's FULL
        match count.  Per-shard partials ship O(groups × k); buckets
        come back in ES terms-agg order (doc_count desc, key asc).

        ``sort=(field, "asc"|"desc")`` is the ES top_hits ``sort``
        option: hits rank by that numeric/date doc-values column (ties
        doc-ascending) and carry the sort value instead of a score.
        ``source_fields`` is ES ``_source`` filtering: each hit
        hydrates the named stored fields via one O(groups × k)
        docstore point-join AFTER the cut — never per matching doc.
        With either option, ``hits`` entries are dicts
        ``{"doc_id", "sort"|"score", **fields}``; the bare form keeps
        the legacy ``(doc_id, score)`` tuples."""
        clauses = self._query_clauses(query)
        if clauses is None:
            return []
        scoring = sorted(set(clauses["must"]) | set(clauses["should"]))
        if sort is None:
            if not scoring:
                raise ValueError("top_hits needs a scoring clause")
            idf = self.idfs(scoring)
            per_actor = ray.get(
                [a.agg_top_hits.remote(clauses, idf, group_by, k)
                 for a in self.actors]
            )
            merged = _merge_group_topk(
                per_actor, k, self.params.round_decimals
            )
        else:
            per_actor = ray.get(
                [a.agg_top_hits.remote(clauses, {}, group_by, k, sort)
                 for a in self.actors]
            )
            merged = _merge_group_sorted(
                per_actor, k, desc=sort[1] == "desc", final=True
            )
        out = []
        for g, (c, ids, scs) in merged.items():
            out.append({
                "key": g, "doc_count": int(c),
                # merge_topk keeps the rounded-tie class at the kth
                # boundary (serving semantics); top_hits returns exactly
                # k — the order already breaks ties doc-ascending
                "hits": [
                    (int(d),
                     float(sv) if sort is None
                     else (sv.item() if hasattr(sv, "item") else sv))
                    for d, sv in zip(ids[:k], scs[:k])
                ],
            })
        out.sort(key=lambda r: (-r["doc_count"], r["key"]))
        if sort is None and source_fields is None:
            return out
        return _render_hit_dicts(out, sort, source_fields, self.index_dir)

    def search_sort(
        self, query: str | list[str] | dict, field: str, k: int = 10,
        order: str = "desc", after: tuple | None = None,
    ) -> tuple[int, list[tuple[int, object]]]:
        """ES BODY-level ``sort``: the matching docs ordered by a
        doc-values column instead of BM25 — ``(total matches,
        [(doc_id, sort_value)])``, ties doc-ascending.  Per-shard
        partials ship O(k) (exact-value tie class kept across the
        shard boundary, like the top_hits sort merge); numeric/date
        NaNs sort last either direction (ES ``missing: _last``).
        ``after = (sort_value, doc_id)`` is the ES ``search_after``
        cursor, pushed into the shard cut."""
        clauses = self._query_clauses(query)
        if clauses is None:
            return 0, []
        desc = str(order).lower() == "desc"
        per_actor = ray.get(
            [a.sort_topk.remote(clauses, field, desc, k, after)
             for a in self.actors]
        )
        total, ids_l, vals_l = 0, [], []
        for parts in per_actor:
            for c, ids, vals in parts:
                total += c
                if len(ids):
                    ids_l.append(ids)
                    vals_l.append(vals)
        if total == 0 or not ids_l:
            return total, []
        ids = np.concatenate(ids_l)
        vals = np.concatenate(vals_l)
        keyv = _sort_key(vals, desc)
        o = np.lexsort((ids, keyv))[:k]
        return total, [
            (int(ids[i]),
             vals[i].item() if hasattr(vals[i], "item") else vals[i])
            for i in o
        ]

    def extended_stats(
        self, query: str | list[str] | dict, field: str
    ) -> dict:
        """ES ``extended_stats`` aggregation over the docs matching
        ``query``: count/min/max/sum/avg/sum_of_squares/variance
        (population, like ES)/std_deviation — O(1)-wire associative
        per-shard partials."""
        from .datehist import extstats_render

        clauses = self._query_clauses(query)
        if clauses is None:
            return extstats_render([])
        parts = ray.get(
            [a.agg_extended_stats.remote(clauses, field)
             for a in self.actors]
        )
        return extstats_render(parts)

    def metric_aggs(
        self,
        query: str | list[str] | dict,
        field: str,
        weight_field: str | None = None,
    ) -> dict:
        """ES ``value_count`` + ``missing`` + ``weighted_avg``
        aggregations over the docs matching ``query``, in one actor
        round: count of PRESENT values of ``field``, count of docs
        MISSING it, and (with ``weight_field``) Σ(value·weight)/Σ(weight)
        over rows where both are present — the ES skip-missing default.
        O(1)-wire associative partials."""
        from .datehist import metric_aggs_render

        clauses = self._query_clauses(query)
        if clauses is None:
            return metric_aggs_render([])
        parts = ray.get(
            [a.agg_field_counts.remote(clauses, field, weight_field)
             for a in self.actors]
        )
        return metric_aggs_render(parts)

    def frequent_item_sets(
        self,
        *,
        minimum_support: int,
        minimum_set_size: int = 1,
        size: int | None = None,
        max_frequent_items: int = 1000,
    ) -> list[dict]:
        """ES ``frequent_item_sets`` over the indexed terms (items = a
        doc's distinct tokens), the Apriori subset up to SET SIZE 2 —
        disclosed divergence: ES mines arbitrary-size closed sets; the
        1-and-2 tier is the part whose support comes straight from the
        index (singles = dictionary df, pairs = one postings intersect
        per candidate) with no per-doc itemset state anywhere.

        Candidate singles: one actor round returning terms with local
        df ≥ ceil(ms/num_actors) (pigeonhole-sound) + one cached global
        df round.  Candidate pairs: frequent×frequent (a<b), counted by
        per-shard sorted-array intersects.  ``max_frequent_items`` is
        the scale valve (top-df cut, disclosed when it trips — ES has
        the same knob, default 10).  Buckets (support desc, items asc).
        """
        import math as _math

        local_min = max(1, _math.ceil(minimum_support / len(self.actors)))
        parts = ray.get(
            [a.df_candidates.remote(local_min) for a in self.actors]
        )
        cand = sorted({t for p in parts for t in p})
        df = self.dfs(cand)
        singles = sorted(
            (t for t in cand if df[t] >= minimum_support)
        )
        if len(singles) > max_frequent_items:
            singles = sorted(
                sorted(singles, key=lambda t: (-df[t], t))
                [:max_frequent_items]
            )
        pairs = [
            (a, b)
            for i, a in enumerate(singles)
            for b in singles[i + 1:]
        ]
        rows: list[dict] = []
        if minimum_set_size <= 1:
            rows += [{"items": [t], "support": int(df[t])}
                     for t in singles]
        if pairs:
            counts = np.sum(
                ray.get([a.pair_supports.remote(pairs)
                         for a in self.actors]),
                axis=0,
            )
            rows += [
                {"items": [a, b], "support": int(c)}
                for (a, b), c in zip(pairs, counts)
                if c >= minimum_support
            ]
        rows.sort(key=lambda r: (-r["support"], r["items"]))
        return rows[:size] if size is not None else rows

    def categorize_text(
        self,
        query: str | list[str] | dict,
        *,
        max_tokens: int = 5,
        size: int | None = None,
    ) -> list[dict]:
        """ES ``categorize_text`` aggregation: log-template buckets of
        the matched docs' text (see ``search.categorize`` for the
        deterministic template-key semantics and the disclosed
        similarity-merge divergence).  Matched ids gather from the
        actors; texts stay inside corpus-partition tasks that ship only
        ``{category: count}`` dicts."""
        from .categorize import categorize_buckets, categorize_partials

        clauses = self._query_clauses(query)
        if clauses is None:
            return []
        ids_parts = ray.get(
            [a.match_ids_bool.remote(clauses) for a in self.actors]
        )
        ids = (np.concatenate([p for p in ids_parts if len(p)])
               if any(len(p) for p in ids_parts) else np.empty(0, np.int64))
        return categorize_buckets(
            categorize_partials(self.index_dir, ids, max_tokens), size
        )

    def scripted_metric(
        self,
        query: str | list[str] | dict,
        *,
        map_script: str,
        combine: str = "sum",
        finalize: str | None = None,
    ) -> dict:
        """ES ``scripted_metric`` aggregation (the distributable
        subset — see ``datehist.scripted_metric_result``): ``map_script``
        evaluates vectorized over each matched doc's docmeta (runtime-
        field machinery), combines per actor into an O(1) extstats
        partial, folds with ``combine`` and an optional ``finalize``
        reduce-script over ``value``/``n``."""
        from .datehist import scripted_metric_result

        clauses = self._query_clauses(query)
        parts = [] if clauses is None else ray.get([
            a.scripted_extstats.remote(clauses, f"script:{map_script}")
            for a in self.actors
        ])
        return scripted_metric_result(parts, combine, finalize)

    PCTL_DEFAULT = (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0)
    PCTL_SKETCH_K = 200

    def percentiles(
        self,
        query: str | list[str] | dict,
        field: str,
        percents=PCTL_DEFAULT,
        mode: str = "exact",
    ) -> dict:
        """ES ``percentiles`` aggregation over the docs matching
        ``query``.  ``mode="exact"`` uses the nearest-rank definition
        (``ceil(p/100·n)``-th smallest — integer logic, SQL-
        reproducible) from per-shard sorted value partials;
        ``mode="sketch"`` is the scale path: mergeable log-bucket counts
        whose exchange size is bounded by the value RANGE, not the match
        count (relative error ≤ ~0.6% at the default resolution,
        accuracy-tested).  ES itself serves approximate percentiles
        (t-digest) — the sketch mode is the analogous trade."""
        from .datehist import pctl_exact, pctl_from_sketch

        sketch_k = self.PCTL_SKETCH_K if mode == "sketch" else None
        clauses = self._query_clauses(query)
        if clauses is None:
            return {float(p): None for p in percents}
        parts = ray.get(
            [a.agg_values.remote(clauses, field, sketch_k)
             for a in self.actors]
        )
        if mode == "sketch":
            from .datehist import merge_count_partials

            merged: dict = {}
            for p in parts:
                merge_count_partials(merged, p)
            return pctl_from_sketch(merged, percents, self.PCTL_SKETCH_K)
        return pctl_exact([p for p in parts if len(p)], percents)

    def percentile_ranks(
        self,
        query: str | list[str] | dict,
        field: str,
        values: list[float],
    ) -> dict:
        """ES ``percentile_ranks`` aggregation (the inverse of
        ``percentiles``): for each requested value, the percentage of
        matched docs' ``field`` doc values ≤ it — EXACT
        (``100·count(fv ≤ v)/n``; ES serves a t-digest approximation,
        divergence disclosed).  Reuses the percentiles machinery's
        sorted per-shard partials."""
        from .datehist import pctl_ranks_exact

        clauses = self._query_clauses(query)
        if clauses is None:
            return {float(v): None for v in values}
        parts = ray.get(
            [a.agg_values.remote(clauses, field, None)
             for a in self.actors]
        )
        return pctl_ranks_exact([p for p in parts if len(p)], values)

    def cardinality(
        self,
        query: str | list[str] | dict,
        field: str,
        precision: int | None = None,
    ) -> float:
        """ES ``cardinality`` aggregation over the docs matching
        ``query``: distinct values of a doc-values column.  Default is
        EXACT (per-shard unique arrays union-merged — fine for the
        keyword-cardinality fields the agg is typically pointed at);
        ``precision=p`` switches to HyperLogLog partials (2^p bytes per
        shard regardless of cardinality — the 10^12-row path, estimate
        within ~1.04/sqrt(2^p))."""
        clauses = self._query_clauses(query)
        if clauses is None:
            return 0.0
        parts = ray.get(
            [a.agg_cardinality.remote(clauses, field, precision)
             for a in self.actors]
        )
        if precision is not None:
            from ..ops.sketch import HyperLogLog

            h = HyperLogLog(p=precision)
            for b in parts:
                h.merge(HyperLogLog.from_bytes(b))
            return float(h.estimate())
        parts = [p for p in parts if len(p)]
        return float(len(np.unique(np.concatenate(parts)))) if parts else 0.0

    def boxplot(self, query: str | list[str] | dict, field: str) -> dict:
        """ES ``boxplot`` aggregation (min/max/q1/q2/q3) over the docs
        matching ``query`` — exact nearest-rank quartiles from per-shard
        sorted value partials (ES itself serves t-digest approximations;
        the exact form is the SQL-reproducible twin, and the
        ``percentiles(mode="sketch")`` log-bucket path remains the
        10^12-row option for the same quantile shape)."""
        from .statagg import boxplot_exact

        clauses = self._query_clauses(query)
        if clauses is None:
            return boxplot_exact([])
        return boxplot_exact(ray.get(
            [a.agg_values.remote(clauses, field, None)
             for a in self.actors]
        ))

    def variable_width_histogram(
        self, query: str | list[str] | dict, field: str,
        buckets: int = 10,
    ) -> list[dict]:
        """ES ``variable_width_histogram`` — EXACT optimal 1-D weighted
        k-means (Ckmeans DP over distinct values) where ES clusters
        approximately per shard (disclosed; see
        ``statagg.variable_width_buckets`` for the cost model)."""
        from .statagg import variable_width_buckets

        clauses = self._query_clauses(query)
        if clauses is None:
            return []
        return variable_width_buckets(
            ray.get([a.agg_values.remote(clauses, field, None)
                     for a in self.actors]),
            buckets,
        )

    def median_absolute_deviation(
        self, query: str | list[str] | dict, field: str
    ) -> float | None:
        """ES ``median_absolute_deviation``: exact nearest-rank
        median(|x − median(x)|) from the same sorted-value partials."""
        from .statagg import mad_exact

        clauses = self._query_clauses(query)
        if clauses is None:
            return None
        return mad_exact(ray.get(
            [a.agg_values.remote(clauses, field, None)
             for a in self.actors]
        ))

    def string_stats(
        self, query: str | list[str] | dict, field: str
    ) -> dict:
        """ES ``string_stats`` aggregation over a keyword doc-values
        column: count / min_length / max_length / avg_length / Shannon
        entropy over the merged character distribution.  Per-shard
        partials are alphabet-bounded (codepoint histograms), never
        O(match count) on the wire."""
        from .statagg import string_stats_render

        clauses = self._query_clauses(query)
        if clauses is None:
            return string_stats_render([])
        return string_stats_render(
            ray.get(
                [a.agg_string_stats.remote(clauses, field)
                 for a in self.actors]
            ),
            self.params.round_decimals,
        )

    def t_test(
        self,
        query_a: str | list[str] | dict,
        field: str | None = None,
        query_b: str | list[str] | dict | None = None,
        fields: tuple[str, str] | None = None,
        type: str = "heteroscedastic",
    ) -> dict:
        """ES ``t_test`` aggregation.  Two forms:

        * unpaired (``heteroscedastic`` Welch / ``homoscedastic``
          pooled): one numeric ``field``, two match sets ``query_a`` /
          ``query_b`` (the ES two-filter form) — one extstats partial
          round per side.
        * ``type="paired"``: two ``fields`` of the SAME match set
          ``query_a`` — per-doc differences reduce in-shard.

        Returns ``{"t", "df"}`` (p-value divergence documented in
        ``statagg.ttest_from_moments``)."""
        from .datehist import merge_extstats
        from .statagg import ttest_from_moments

        if type == "paired":
            if fields is None:
                raise ValueError("paired t_test needs fields=(a, b)")
            clauses = self._query_clauses(query_a)
            if clauses is None:
                return {"t": None, "df": None}
            part = merge_extstats(ray.get(
                [a.agg_paired_diff.remote(clauses, fields[0], fields[1])
                 for a in self.actors]
            ))
            return ttest_from_moments(
                part, None, "paired", self.params.round_decimals
            )
        if field is None or query_b is None:
            raise ValueError("unpaired t_test needs field= and query_b=")
        ca = self._query_clauses(query_a)
        cb = self._query_clauses(query_b)
        if ca is None or cb is None:
            return {"t": None, "df": None}
        pa_ = merge_extstats(ray.get(
            [a.agg_extended_stats.remote(ca, field) for a in self.actors]
        ))
        pb = merge_extstats(ray.get(
            [a.agg_extended_stats.remote(cb, field) for a in self.actors]
        ))
        return ttest_from_moments(pa_, pb, type, self.params.round_decimals)

    def matrix_stats(
        self, query: str | list[str] | dict, fields: list[str]
    ) -> list[dict]:
        """ES ``matrix_stats`` aggregation over k numeric doc-values
        columns: per ordered field pair, count / means / sample
        covariance / Pearson correlation, from O(k²)-wire Gram-matrix
        partials (rows missing any field skipped — ES semantics).
        Skewness/kurtosis divergence documented in
        ``statagg.matrix_stats_render``."""
        from .statagg import matrix_stats_render

        clauses = self._query_clauses(query)
        if clauses is None:
            return []
        per_actor = ray.get(
            [a.agg_matrix_stats.remote(clauses, list(fields))
             for a in self.actors]
        )
        return matrix_stats_render(
            [p for parts in per_actor for p in parts],
            list(fields), self.params.round_decimals,
        )

    def top_metrics(
        self,
        query: str | list[str] | dict,
        metrics: list[str],
        sort: tuple[str, str],
        size: int = 1,
    ) -> list[dict]:
        """ES ``top_metrics`` aggregation: the metric doc values of the
        top-``size`` matching docs by a numeric/date sort field (ties
        doc-ascending — the serving tiebreak).  Per-shard partials ship
        O(size); the global top is exact because it is a subset of the
        union of per-shard tops."""
        from .statagg import merge_top_metrics

        clauses = self._query_clauses(query)
        if clauses is None:
            return []
        field, direction = sort
        desc = direction == "desc"
        per_actor = ray.get(
            [a.agg_top_metrics.remote(clauses, field, desc, size,
                                      list(metrics))
             for a in self.actors]
        )
        merged = merge_top_metrics(per_actor, size, desc)
        return [
            {"doc_id": d, "sort": sv,
             "metrics": dict(zip(metrics, mv))}
            for sv, d, mv in merged
        ]

    @staticmethod
    def _geo_origin(origin) -> tuple[float, float]:
        from ..ops.geo import parse_point

        return parse_point(origin) if isinstance(origin, str) else origin

    @staticmethod
    def _geo_meters(v) -> float | None:
        from ..ops.geo import parse_distance

        if v is None:
            return None
        return parse_distance(v) if isinstance(v, str) else float(v)

    def geo_distance_agg(
        self,
        query: str | list[str] | dict,
        lat_field: str,
        lon_field: str,
        origin: str | tuple[float, float],
        ranges: list[dict | tuple],
        stats_on: str | None = None,
    ) -> list[dict]:
        """ES ``geo_distance`` aggregation: distance-from-``origin``
        range buckets over the matched docs.  ``origin`` is a
        ``"lat,lon"`` string (the reference's geo_point format) or a
        tuple; range ends are meters or ``"<n><unit>"`` strings
        (``ops.geo.parse_distance`` units).  Distance is a haversine
        RUNTIME FIELD (``geo.haversine_script``), so this is exactly
        :meth:`range_agg` — per-shard partials, O(ranges) wire."""
        lat0, lon0 = self._geo_origin(origin)
        from .geo import haversine_script

        norm = [
            {
                "from": self._geo_meters(
                    r.get("from") if isinstance(r, dict) else r[0]),
                "to": self._geo_meters(
                    r.get("to") if isinstance(r, dict) else r[1]),
            }
            for r in ranges
        ]
        return self.range_agg(
            query, haversine_script(lat_field, lon_field, lat0, lon0),
            norm, stats_on,
        )

    def geotile_grid(
        self,
        query: str | list[str] | dict,
        lat_field: str,
        lon_field: str,
        precision: int = 7,
        size: int = 10,
        stats_on: str | None = None,
    ) -> list[dict]:
        """ES ``geotile_grid`` aggregation: slippy-map tile buckets
        (``"z/x/y"`` keys) of the matched docs' points, doc_count
        descending (tile-ascending ties) cut to ``size`` — EXACT, unlike
        ES's shard_size heuristic (every tile crosses the O(tiles)
        merge).  The tile id is a runtime field, so the whole agg is
        the terms machinery."""
        from .geo import geotile_key, geotile_script

        buckets = self.aggregate(
            query, geotile_script(lat_field, lon_field, precision),
            stats_on=stats_on, size=size,
        )
        for b in buckets:
            b["key"] = geotile_key(b["key"], precision)
        return buckets

    def geohash_grid(
        self,
        query: str | list[str] | dict,
        lat_field: str,
        lon_field: str,
        precision: int = 5,
        size: int = 10,
        stats_on: str | None = None,
    ) -> list[dict]:
        """ES ``geohash_grid`` aggregation: base32 geohash buckets of
        the matched points, doc_count descending (packed-cell-ascending
        ties), EXACT top-``size`` cut.  The packed cell id is a runtime
        field (equirectangular x/y at the geohash bit depths), so the
        whole agg is the terms machinery; each row carries both the
        base32 ``key`` and the numeric ``cell`` (what the SQL oracle
        compares — base32 rendering is unit-tested against the public
        algorithm)."""
        from .geo import geohash_cell_script, geohash_key

        buckets = self.aggregate(
            query, geohash_cell_script(lat_field, lon_field, precision),
            stats_on=stats_on, size=size,
        )
        for b in buckets:
            b["cell"] = float(b["key"])
            b["key"] = geohash_key(b["cell"], precision)
        return buckets

    def geo_bounds(
        self, query: str | list[str] | dict,
        lat_field: str = "lat", lon_field: str = "lon",
    ) -> dict:
        """ES ``geo_bounds``: the envelope of matched points (two
        extended_stats rounds; ``wrap_longitude`` not modeled)."""
        from .geo import geo_bounds_render

        return geo_bounds_render(
            self.extended_stats(query, lat_field),
            self.extended_stats(query, lon_field),
        )

    def geo_centroid(
        self, query: str | list[str] | dict,
        lat_field: str = "lat", lon_field: str = "lon",
    ) -> dict:
        """ES ``geo_centroid``: per-axis arithmetic mean of matched
        points (the ES accumulation)."""
        from .geo import geo_centroid_render

        return geo_centroid_render(
            self.extended_stats(query, lat_field),
            self.extended_stats(query, lon_field),
        )

    def search_geo_distance(
        self,
        query: str | list[str],
        lat_field: str,
        lon_field: str,
        origin: str | tuple[float, float],
        distance: str | float,
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES bool query with a ``geo_distance`` filter (the reference's
        geo_point + geo_distance param pair): BM25-ranked ``query`` hits
        within ``distance`` of ``origin`` — the filter is a non-scoring
        range predicate over the haversine runtime field."""
        from .geo import haversine_script

        lat0, lon0 = self._geo_origin(origin)
        return self.search_bool(
            should=query, k=k, minimum_should_match=1,
            filter_range={
                haversine_script(lat_field, lon_field, lat0, lon0):
                    (None, self._geo_meters(distance)),
            },
        )

    def search_geo_box(
        self,
        query: str | list[str],
        lat_field: str,
        lon_field: str,
        top_left: str | tuple[float, float],
        bottom_right: str | tuple[float, float],
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES bool query with a ``geo_bounding_box`` filter (the
        reference's geo_box_top_left/bottom_right pair) — two plain
        range predicates over the stored lat/lon doc values."""
        from .geo import bbox_range_filters

        return self.search_bool(
            should=query, k=k, minimum_should_match=1,
            filter_range=bbox_range_filters(
                lat_field, lon_field,
                self._geo_origin(top_left),
                self._geo_origin(bottom_right),
            ),
        )

    def search_geo_polygon(
        self,
        query: str | list[str],
        lat_field: str,
        lon_field: str,
        vertices: list[tuple[float, float]],
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES bool query with a ``geo_polygon`` filter: a CONVEX ring
        decomposes into one half-plane runtime-field gate per edge
        (``search.geo.polygon_halfplane_scripts``), all ANDed through
        the ordinary ``filter_range`` machinery — no new evaluation
        kind.  Concave rings raise (split into convex rings and union
        the searches, disclosed)."""
        from .geo import polygon_halfplane_scripts

        return self.search_bool(
            should=query, k=k, minimum_should_match=1,
            filter_range=polygon_halfplane_scripts(
                lat_field, lon_field, vertices),
        )

    def search_has_child(
        self,
        child_query: str | list[str] | dict,
        parent_field: str = "parent_id",
        score_mode: str = "none",
        min_children: int = 1,
        max_children: int | None = None,
        k: int | None = 10,
    ) -> list[tuple[int, float, int]]:
        """ES ``has_child`` (join field): PARENT docs whose children
        match ``child_query``, scored by ``score_mode`` ∈
        none|sum|avg|min|max over the children's serving scores
        (``none`` → constant 1.0 filter context), count-bounded by
        ``min_children``/``max_children`` — rows ``(parent_id, score,
        n_matching_children)``, (score desc, parent asc).  Per-shard
        associative partials keyed by parent (see
        ``joinfield.group_child_scores``); O(parents) wire."""
        from .joinfield import finish_has_child

        clauses = self._query_clauses(child_query)
        if clauses is None:
            return []
        scoring = sorted(set(clauses["must"]) | set(clauses["should"]))
        idf = self.idfs(scoring)
        per_actor = ray.get(
            [a.agg_join_children.remote(clauses, idf, parent_field)
             for a in self.actors]
        )
        merged: dict = {}
        for p in per_actor:
            merge_agg_partials(merged, p)
        return finish_has_child(
            merged, score_mode, min_children, max_children, k,
            self.params.round_decimals,
        )

    def search_has_parent(
        self,
        parent_query: str | list[str],
        parent_field: str = "parent_id",
        score: bool = True,
        k: int | None = 10,
    ) -> list[tuple[int, float]]:
        """ES ``has_parent`` (join field): CHILD docs whose parent
        matches ``parent_query``, carrying the parent's serving score
        (or 1.0 with ``score=False``) — (score desc, child asc).  The
        parent match restricts to parent-typed rows via the
        ``parent_id == doc_id`` runtime-field predicate; the child scan
        broadcasts the matched-parent id set to one vectorized ``isin``
        per shard over cached doc values."""
        from .joinfield import children_rows, self_parent_script

        hits = self.search_bool(
            should=parent_query, k=1 << 30, minimum_should_match=1,
            filter_range={self_parent_script(parent_field): (0.0, 0.0)},
        )
        if not hits:
            return []
        pscores = {int(d): float(s) for d, s in hits}
        pids = np.fromiter(pscores, dtype=np.int64, count=len(pscores))
        got = ray.get(
            [a.meta_pairs_in.remote(parent_field, pids)
             for a in self.actors]
        )
        ids = np.concatenate([g[0] for g in got])
        parents = np.concatenate([g[1] for g in got]).astype(np.int64)
        child = parents != ids  # drop the parent rows themselves
        return children_rows(ids[child], parents[child], pscores,
                             score, k)

    def search_parent_id(
        self,
        parent: int,
        parent_field: str = "parent_id",
        k: int | None = 10,
        boost: float = 1.0,
    ) -> list[tuple[int, float]]:
        """ES ``parent_id`` query: child docs whose join parent is the
        given id, each at constant score ``boost`` (the ES semantics —
        the query matches in filter-like fashion and scores 1.0×boost).
        One broadcast single-value ``isin`` scan per shard over cached
        doc values; the parent row itself (``doc_id == parent``) is
        excluded, matching the join-field child-type contract."""
        pids = np.asarray([parent], dtype=np.int64)
        got = ray.get(
            [a.meta_pairs_in.remote(parent_field, pids)
             for a in self.actors]
        )
        ids = np.concatenate([g[0] for g in got])
        ids = np.sort(ids[ids != parent])
        if k is not None:
            ids = ids[:k]
        return [(int(d), float(boost)) for d in ids]

    def children_agg(
        self,
        parent_query: str | list[str],
        group_by: str,
        parent_field: str = "parent_id",
        stats_on: str | None = None,
        order: tuple[str, str] | None = None,
        size: int | None = None,
    ) -> list[dict]:
        """ES ``children`` aggregation (join field): PARENT docs matching
        ``parent_query`` bucket by ``group_by`` (terms agg over the
        parent scope), and each bucket switches to its parents' CHILD
        docs — ``parent_count`` (the terms bucket's own doc_count),
        ``doc_count`` (the ``children`` sub-agg count) and optional
        stats over a child numeric column.  Two rounds: matched parents'
        keys hydrate by doc id (``meta_values_of``), then one broadcast
        of the (sorted parent ids, aligned keys) pair feeds per-shard
        associative child partials (``agg_children_of``) — O(buckets)
        wire on the reduce, correct across family-straddling shard
        boundaries (the ES shard-local join relies on routing instead)."""
        from .datehist import order_terms_buckets, valid_mask
        from .joinfield import family_agg_rows, self_parent_script

        hits = self.search_bool(
            should=parent_query, k=1 << 30, minimum_should_match=1,
            filter_range={self_parent_script(parent_field): (0.0, 0.0)},
        )
        if not hits:
            return []
        pids = np.unique(np.fromiter(
            (d for d, _ in hits), np.int64, count=len(hits)
        ))
        pref = ray.put(pids)
        got = ray.get(
            [a.meta_values_of.remote(pref, group_by) for a in self.actors]
        )
        rid = np.concatenate([g[0] for g in got])
        keys = np.concatenate([g[1] for g in got])
        vm = valid_mask(keys)  # ES terms aggs omit missing-key parents
        rid, keys = rid[vm], keys[vm]
        o = np.argsort(rid)
        rid, keys = rid[o], keys[o]
        if len(rid) == 0:
            return []
        idr, kr = ray.put(rid), ray.put(keys)
        per_actor = ray.get(
            [a.agg_children_of.remote(parent_field, idr, kr, stats_on)
             for a in self.actors]
        )
        merged: dict = {}
        for p in per_actor:
            merge_agg_partials(merged, p)
        return order_terms_buckets(
            family_agg_rows(keys, merged, stats_on), order, size
        )

    def parent_agg(
        self,
        child_query: str | list[str],
        group_by: str,
        parent_field: str = "parent_id",
        stats_on: str | None = None,
        order: tuple[str, str] | None = None,
        size: int | None = None,
    ) -> list[dict]:
        """ES ``parent`` aggregation (join field): CHILD docs matching
        ``child_query`` join to their parents, and buckets of
        ``group_by`` form over the UNIQUE parent docs (each parent
        counted once however many children matched — the ES parent-agg
        doc_count).  Optional stats over a parent numeric column.
        Matched docs' parent ids hydrate by doc id, parent-typed matches
        drop (the child-scope contract), and the deduped parent set
        broadcasts to one terms-partial round (``agg_ids_buckets``)."""
        from .datehist import order_terms_buckets

        hits = self.search_bool(
            should=child_query, k=1 << 30, minimum_should_match=1,
        )
        if not hits:
            return []
        ids = np.unique(np.fromiter(
            (d for d, _ in hits), np.int64, count=len(hits)
        ))
        iref = ray.put(ids)
        got = ray.get(
            [a.meta_values_of.remote(iref, parent_field)
             for a in self.actors]
        )
        rid = np.concatenate([g[0] for g in got])
        pv = np.concatenate([g[1] for g in got]).astype(np.int64)
        parents = np.unique(pv[pv != rid])
        if len(parents) == 0:
            return []
        uref = ray.put(parents)
        per_actor = ray.get(
            [a.agg_ids_buckets.remote(uref, group_by, stats_on)
             for a in self.actors]
        )
        merged: dict = {}
        for p in per_actor:
            merge_agg_partials(merged, p)
        return order_terms_buckets(
            self._agg_buckets_rows(merged, stats_on), order, size
        )

    def random_sampler(
        self,
        query: str | list[str] | dict,
        group_by: str,
        probability: float,
        seed: int = 0,
        stats_on: str | None = None,
        order: tuple[str, str] | None = None,
        size: int | None = None,
    ) -> list[dict]:
        """ES ``random_sampler`` aggregation: a terms sub-agg on
        ``group_by`` restricted to a probabilistic sample of the match
        set.  The sample is a DETERMINISTIC Knuth-hash cut
        (``sampler.random_sample_mask`` — the ES ``seed`` option made
        reproducible and SQL-mirrorable, where ES uses per-shard RNG;
        disclosed), so results are exact and hash-oracled.  Rows carry
        the raw in-sample ``doc_count``/stats plus ES's
        inverse-probability ``doc_count_scaled`` estimate.  Matched ids
        gather once (wire ∝ matches, the categorize_text shape), the
        sampled subset broadcasts to one terms-partial round."""
        from .datehist import order_terms_buckets
        from .sampler import random_sample_mask, scale_sampled_rows

        clauses = self._query_clauses(query)
        if clauses is None:
            return []
        got = ray.get(
            [a.match_ids_bool.remote(clauses) for a in self.actors]
        )
        ids = np.concatenate(got) if got else np.empty(0, np.int64)
        ids = ids[random_sample_mask(ids, probability, seed)]
        if len(ids) == 0:
            return []
        ref = ray.put(np.sort(ids))
        per_actor = ray.get(
            [a.agg_ids_buckets.remote(ref, group_by, stats_on)
             for a in self.actors]
        )
        merged: dict = {}
        for p in per_actor:
            merge_agg_partials(merged, p)
        return order_terms_buckets(
            scale_sampled_rows(
                self._agg_buckets_rows(merged, stats_on), probability
            ),
            order, size,
        )

    def global_agg(
        self,
        group_by: str,
        stats_on: str | None = None,
        order: tuple[str, str] | None = None,
        size: int | None = None,
    ) -> list[dict]:
        """ES ``global`` aggregation with a terms (+ optional stats)
        sub-agg: buckets over ALL live docs, ignoring any query scope —
        the significant_terms background pass re-used as a first-class
        aggregation (one per-shard partial round, O(buckets) wire)."""
        from .datehist import order_terms_buckets

        per_actor = ray.get(
            [a.agg_background.remote(group_by, stats_on)
             for a in self.actors]
        )
        return order_terms_buckets(
            self._agg_buckets(per_actor, stats_on), order, size
        )

    def missing_agg(
        self,
        query: str | list[str] | dict,
        field: str,
        stats_on: str | None = None,
    ) -> dict:
        """ES ``missing`` aggregation: the bucket of matched docs whose
        ``field`` doc value is ABSENT (null), with an optional stats
        sub-agg over another numeric column — per-shard associative
        partials, O(1) wire."""
        empty = {"doc_count": 0}
        if stats_on is not None:
            empty.update({"sum": None, "min": None, "max": None,
                          "avg": None})
        clauses = self._query_clauses(query)
        if clauses is None:
            return empty
        parts = ray.get(
            [a.agg_missing.remote(clauses, field, stats_on)
             for a in self.actors]
        )
        n, vc, sm, mn, mx = 0, 0, 0.0, float("inf"), float("-inf")
        for pn, pvc, ps, pmn, pmx in parts:
            n += pn
            vc += pvc
            sm += ps
            mn = min(mn, pmn)
            mx = max(mx, pmx)
        row = {"doc_count": n}
        if stats_on is not None:
            # avg divides by the stats field's VALUE COUNT (the ES
            # sub-agg contract), not the parent bucket's doc_count
            row.update({
                "sum": sm if vc else None,
                "min": mn if vc else None,
                "max": mx if vc else None,
                "avg": sm / vc if vc else None,
            })
        return row

    def _agg_buckets_rows(self, merged: dict, stats_on: str | None
                          ) -> list[dict]:
        """Merged ``{key: (n, Σ, min, max)}`` partials → default-ordered
        terms-agg rows (doc_count desc, key asc) — the tail
        :meth:`_agg_buckets` shares with the id-set aggregations."""
        buckets = sorted(merged.items(), key=lambda kv: (-kv[1][0], kv[0]))
        out = []
        for g, (c, sm, mn, mx) in buckets:
            row = {"key": g, "doc_count": c}
            if stats_on is not None:
                row.update({
                    "sum": sm, "min": mn, "max": mx,
                    "avg": sm / c if c else None,
                })
            out.append(row)
        return out

    def search_phrase_prefix(
        self, phrase: str | list[str], k: int = 10,
        max_expansions: int = 50, slop: int = 0,
        slop_mode: str = "ordered",
    ) -> list[tuple[int, float]]:
        """ES ``match_phrase_prefix``: an exact phrase whose LAST term is
        a prefix, expanded to ``max_expansions`` dictionary terms in term
        order (Lucene MultiPhraseQuery).  idf = Σ idfs of the fixed terms
        plus Σ idfs of every expansion; tf = multi-phrase frequency.
        ``slop``/``slop_mode`` behave as in :meth:`search_phrase` over
        the multi-term slots (an expansion repeating a fixed term
        engages the lucene-mode multi-term repeat machinery)."""
        if isinstance(phrase, str):
            fn = get_analyzer(
                "code" if self.analyzer_name == "per_lang" else self.analyzer_name
            )
            m = self.info.manifest
            terms = clip_tokens(fn(phrase), m.min_token_len, m.max_token_len)
        else:
            terms = list(phrase)
        if not terms:
            return []
        expansions = self.expand_prefix(terms[-1], max_expansions)
        if not expansions:
            return []
        fixed = terms[:-1]
        idf = self.idfs(sorted(set(fixed) | set(expansions)))
        idf_sum = float(sum(idf[t] for t in fixed) + sum(idf[t] for t in expansions))
        slots: list = list(fixed) + [expansions]
        per_actor = ray.get(
            [a.phrase_topk.remote([(0, slots, idf_sum, k, slop, slop_mode)])
             for a in self.actors]
        )
        parts = [(res[0][1], res[0][2]) for res in per_actor]
        ids, sc = merge_topk(parts, k, self.params.round_decimals)
        return list(zip(ids.tolist(), sc.tolist()))

    def search_bool(
        self,
        must: str | list[str] = "",
        should: str | list[str] = "",
        must_not: str | list[str] = "",
        filter: str | list[str] = "",
        k: int = 10,
        minimum_should_match: int | None = None,
        filter_meta: dict | None = None,
        filter_range: dict | None = None,
    ) -> list[tuple[int, float]]:
        """ES ``bool`` query: each clause is free text (analyzed with the
        index analyzer) or a pre-analyzed term list.  Score = BM25 over
        the distinct (must ∪ should) terms; filter/must_not gate without
        scoring.  ``filter_meta`` adds keyword term/terms filters over
        stored docmeta columns ({col: value | [values]});
        ``filter_range`` adds numeric range filters ({col: (lo, hi)},
        inclusive gte/lte, None = open bound) — both are the ES filter
        clause, non-scoring.  Same deterministic merge + tie semantics
        as search()."""

        def _clause(v) -> list[str]:
            if isinstance(v, str):
                return self._analyze(v) if v else []
            return sorted(set(v))

        clauses = {
            "must": _clause(must),
            "should": _clause(should),
            "must_not": _clause(must_not),
            "filter": _clause(filter),
            "msm": minimum_should_match,
            "meta_filters": filter_meta,
            "range_filters": filter_range,
        }
        if not (clauses["must"] or clauses["should"] or clauses["filter"]):
            raise ValueError("bool query needs at least one positive clause")
        scoring = sorted(set(clauses["must"]) | set(clauses["should"]))
        idf = self.idfs(scoring) if scoring else {}
        per_actor = ray.get(
            [a.bool_topk.remote([(0, clauses, k)], idf) for a in self.actors]
        )
        parts = [(res[0][1], res[0][2]) for res in per_actor]
        ids, sc = merge_topk(parts, k, self.params.round_decimals)
        return list(zip(ids.tolist(), sc.tolist()))

    def search_terms_set(
        self, terms: str | list[str], minimum_field: str, k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES ``terms_set`` query: docs containing at least their OWN
        ``minimum_field`` value's worth of the given terms (the
        ``minimum_should_match_field`` form — ES's per-doc msm; a doc
        whose field value exceeds the number of distinct query terms
        can never match, a value ≤ 0 gates nothing beyond the ≥1-match
        candidate floor).  Score = BM25 sum over matched terms; same
        merge + tie semantics as search()."""
        terms_s = (
            sorted(set(self._analyze(terms))) if isinstance(terms, str)
            else sorted(set(terms))
        )
        if not terms_s:
            return []
        idf = self.idfs(terms_s)
        parts = ray.get([
            a.terms_set_topk.remote(terms_s, minimum_field, idf, k)
            for a in self.actors
        ])
        ids, sc = merge_topk(parts, k, self.params.round_decimals)
        return list(zip(ids.tolist(), sc.tolist()))

    def search_match_bool_prefix(
        self, text: str, k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES ``match_bool_prefix``: the analyzed terms become bool
        SHOULD clauses, the LAST one as a prefix query (constant-score
        rewrite — its contribution is 1.0, Lucene's default MultiTerm
        rewrite inside bool) — the type-ahead cousin of
        match_phrase_prefix without the adjacency requirement."""
        toks = self._sqs_analyze()(text)
        if not toks:
            return []
        tree: tuple = ("prefix", toks[-1])
        for t in reversed(toks[:-1]):
            tree = ("or", ("term", t), tree)
        return self._eval_sqs_tree(tree, k)

    def search_ids(self, doc_ids: list[int], k: int | None = None
                   ) -> list[tuple[int, float]]:
        """ES ``ids`` query: the given docs, constant score 1.0, doc-id
        ascending, deleted docs excluded — a filtered mget on the search
        surface (point docmeta reads, no posting scan)."""
        from ..state.docstore import DocStore

        ids = sorted(set(int(d) for d in doc_ids))
        if not ids:
            return []
        if self._ids_store is None:
            self._ids_store = DocStore(
                self.info.index_dir, columns=["doc_id"]
            )
        live = []
        for d in ids:
            try:
                self._ids_store.get(d)
            except KeyError:
                continue
            live.append(d)
        # mask tombstoned docs like every other query path
        del_mask = ray.get(
            [a.docs_deleted.remote(live) for a in self.actors]
        )
        dead = set()
        for part in del_mask:
            dead.update(part)
        out = [(d, 1.0) for d in live if d not in dead]
        return out[:k] if k is not None else out

    def search_exists(self, field: str, k: int = 10) -> list[tuple[int, float]]:
        """ES ``exists`` query over a stored docmeta column: the k
        smallest live docs whose value is non-null, constant score."""
        per_actor = ray.get(
            [a.exists_docs.remote(field, k) for a in self.actors]
        )
        docs = np.sort(np.concatenate(per_actor))[:k]
        return [(int(d), 1.0) for d in docs]

    def search_script_query(
        self, source: str, k: int = 10
    ) -> list[tuple[int, float]]:
        """ES ``script`` query (filter context, constant score): the k
        smallest live docs whose compiled doc-values expression
        (``search.funcscore.ScriptExpr`` — arithmetic, %, one
        comparison) is truthy.  The expression evaluates VECTORIZED
        in-shard; only k ids per actor cross the wire."""
        per_actor = ray.get(
            [a.script_docs.remote(source, k) for a in self.actors]
        )
        docs = np.sort(np.concatenate(per_actor))[:k]
        return [(int(d), 1.0) for d in docs]

    def more_like_this(
        self,
        doc_id: int,
        k: int = 10,
        max_query_terms: int = 25,
        min_term_freq: int = 2,
        min_doc_freq: int = 5,
        minimum_should_match: float = 0.3,
    ) -> list[tuple[int, float]]:
        """ES ``more_like_this`` (like = one indexed doc): re-analyze the
        source document, keep terms with tf ≥ ``min_term_freq`` and
        df ≥ ``min_doc_freq``, select the ``max_query_terms`` best by
        interestingness tf·idf (ties term asc — deterministic, unlike
        Lucene's PQ order), then run the selected terms as a BM25
        ``should`` disjunction with ``minimum_should_match`` given as a
        fraction (ES "30%" semantics: floor, min 1).  The source doc is
        excluded from the hits (ES ``include: false`` default).

        The reference feeds MLT through to ES untranslated; semantics
        restated here over our own postings + analyzers."""
        from ..state.docstore import CorpusTextReader

        if self._text_reader is None:
            self._text_reader = CorpusTextReader(self.info.index_dir)
        text = self._text_reader.mget([doc_id])[0]
        m = self.info.manifest
        fn = get_analyzer(
            "code" if self.analyzer_name == "per_lang" else self.analyzer_name
        )
        toks = clip_tokens(fn(text), m.min_token_len, m.max_token_len)
        if not toks:
            return []
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        cand = sorted(t for t, c in tf.items() if c >= min_term_freq)
        if not cand:
            return []
        idf = self.idfs(cand)
        n = self.info.stats.num_docs
        scored = []
        for t in cand:
            df = self._df_cache[t]
            if df < min_doc_freq:
                continue
            scored.append((-(tf[t] * idf[t]), t))
        if not scored:
            return []
        scored.sort()
        selected = sorted(t for _, t in scored[:max_query_terms])
        msm = max(1, int(len(selected) * minimum_should_match))
        fetch_k = max(2 * k, k + 10)
        hits = self.search_bool(
            should=selected, minimum_should_match=msm, k=fetch_k
        )
        return [(d, s) for d, s in hits if d != doc_id][:k]

    def search_terms_lookup(
        self,
        lookup_doc: int,
        k: int | None = None,
        boost: float = 1.0,
    ) -> list[tuple[int, float]]:
        """ES ``terms`` query with TERMS LOOKUP: the term list hydrates
        from a stored document's text field (the lookup ``index``/
        ``id``/``path`` triple — here the corpus text via partition
        lineage, one point read), then every doc containing ANY of the
        looked-up terms scores the constant ``boost`` (the ES
        terms-query contract; the lookup doc itself matches too — ES
        does not exclude it).  Rows (doc asc), optional cut."""
        from ..state.docstore import CorpusTextReader

        if self._text_reader is None:
            self._text_reader = CorpusTextReader(self.info.index_dir)
        text = self._text_reader.mget([lookup_doc])[0]
        m = self.info.manifest
        fn = get_analyzer(
            "code" if self.analyzer_name == "per_lang" else self.analyzer_name
        )
        terms = sorted(set(
            clip_tokens(fn(text), m.min_token_len, m.max_token_len)
        ))
        if not terms:
            return []
        got = ray.get([
            a.match_ids_bool.remote(
                {"must": [], "should": terms, "must_not": [],
                 "filter": [], "msm": 1}
            )
            for a in self.actors
        ])
        ids = np.sort(np.concatenate(got)) if got else np.empty(0, np.int64)
        if k is not None:
            ids = ids[:k]
        return [(int(d), float(boost)) for d in ids]

    def search_highlight(
        self,
        query: str,
        k: int = 10,
        pre_tag: str = "<em>",
        post_tag: str = "</em>",
        fragment_size: int = 100,
        number_of_fragments: int = 5,
    ) -> list[dict]:
        """ES ``highlight``: BM25 top-k, then for each hit map the matched
        terms' index POSITIONS (positional sidecar — no re-scan of the
        doc) through the analyzer's character-offset map and wrap the
        matched spans in tags.  Adjacent/overlapping matched spans merge,
        ES-style.  Hydrates original text from the corpus parquet via
        partition lineage (k point reads, never a corpus scan).

        Returns per hit: {doc_id, score, highlighted, n_matches,
        positions: {term: [token positions]}}."""
        from ..state.docstore import CorpusTextReader

        terms = self._analyze(query)
        hits = self.search(query, k=k)
        if not hits:
            return []
        ids = [d for d, _ in hits]
        # route each doc to its owning shard-group actor in one round
        per_actor_pairs: dict[int, list[tuple[int, int]]] = {}
        for qi, d in enumerate(ids):
            ai = self._actor_index_for_doc(d)
            per_actor_pairs.setdefault(ai, []).append((qi, d))
        futs, order = [], []
        for ai, pairs in per_actor_pairs.items():
            futs.append(
                self.actors[ai].doc_term_positions.remote(
                    [(d, terms) for _, d in pairs]
                )
            )
            order.extend(qi for qi, _ in pairs)
        pos_flat: list[dict[str, list[int]] | None] = [None] * len(ids)
        for res in ray.get(futs):
            for r in res:
                pos_flat[order.pop(0)] = r
        if self._text_reader is None:
            self._text_reader = CorpusTextReader(self.info.index_dir)
        texts = self._text_reader.mget(ids)
        m = self.info.manifest
        analyzer = (
            "code" if self.analyzer_name == "per_lang" else self.analyzer_name
        )
        from .highlight import render_highlights

        return render_highlights(
            hits, texts, pos_flat, self.idfs(terms), analyzer,
            m.min_token_len, m.max_token_len, pre_tag, post_tag,
            fragment_size, number_of_fragments,
        )

    def _actor_index_for_doc(self, doc: int) -> int:
        for ai, sids in enumerate(self._shard_groups):
            for sid in sids:
                st = self.info.manifest.shards[sid]
                if st.doc_base <= doc < st.doc_base + st.num_docs:
                    return ai
        raise KeyError(f"doc {doc} not covered by any shard")

    def search_batch(
        self, queries: list[tuple[int, str, int]]
    ) -> list[list[tuple[int, float]]]:
        """queries: [(query_id, text, k)] → per query [(doc_id, score)]."""
        analyzed = [(qid, self._analyze(q), k) for qid, q, k in queries]
        all_terms = sorted({t for _, terms, _ in analyzed for t in terms})
        idf = self.idfs(all_terms) if all_terms else {}
        per_actor = ray.get([a.topk.remote(analyzed, idf) for a in self.actors])
        results = []
        for qi, (qid, terms, k) in enumerate(analyzed):
            parts = [(pa_res[qi][1], pa_res[qi][2]) for pa_res in per_actor]
            ids, sc = merge_topk(parts, k, self.params.round_decimals)
            results.append(list(zip(ids.tolist(), sc.tolist())))
        return results

    def msearch(self, requests: list[dict]) -> list[list[tuple[int, float]]]:
        """ES ``_msearch``: a batch of independent search requests in
        one call, results in request order.  Plain match requests
        (``{"query": str, "k": int}``) collapse into ONE actor round via
        :meth:`search_batch` — the multiplexing win msearch exists for;
        typed requests (``{"bool": {...}}``, ``{"phrase": str, "slop":
        n}``) dispatch through their engine methods."""
        plain = [
            (i, r["query"], int(r.get("k", 10)))
            for i, r in enumerate(requests)
            if "query" in r and "bool" not in r and "phrase" not in r
        ]
        out: list = [None] * len(requests)
        if plain:
            got = self.search_batch(plain)
            for (i, _, _), res in zip(plain, got):
                out[i] = res
        for i, r in enumerate(requests):
            if out[i] is not None:
                continue
            k = int(r.get("k", 10))
            if "bool" in r:
                out[i] = self.search_bool(**r["bool"], k=k)
            elif "phrase" in r:
                out[i] = self.search_phrase(
                    r["phrase"], k=k, slop=int(r.get("slop", 0))
                )
            else:
                raise ValueError(f"msearch: unsupported request {r!r}")
        return out

    def field_caps(self) -> dict:
        """ES ``_field_caps``: field → type/searchable/aggregatable
        (module-level :func:`field_caps` over this index)."""
        return field_caps(self.index_dir)

    def refresh(self) -> int:
        """Pick up shards appended to the index since this engine loaded
        — WITHOUT restarting actors (existing shard state stays warm;
        only new shards' segments read).  Round-robins new shards over
        the actor pool, adopts post-append N/avgdl, and drops the df
        cache (every cached df is stale once N changes).  Covers
        append-only growth; deletes/compaction rewrite existing shards →
        construct a fresh engine.  Returns the number of shards added."""
        self.info = IndexInfo(self.info.index_dir)
        loaded = {sid for g in self._shard_groups for sid in g}
        new = [sid for sid in self.info.shard_ids() if sid not in loaded]
        if not new:
            return 0
        per_actor: list[list[int]] = [[] for _ in self.actors]
        sizes = [len(g) for g in self._shard_groups]
        for sid in new:
            ai = int(np.argmin(sizes))
            per_actor[ai].append(sid)
            self._shard_groups[ai].append(sid)
            sizes[ai] += 1
        avgdl, n = self.info.stats.avgdl, self.info.stats.num_docs
        # EVERY actor adopts the post-append stats — an actor that gets
        # no new shard still scores with the moved avgdl/N
        ray.get(
            [
                a.add_shards.remote(sids, avgdl, n)
                for a, sids in zip(self.actors, per_actor)
            ]
        )
        # stale caches: every idf depends on N; dfs grew with new shards
        self._df_cache.clear()
        self._text_reader = None
        self._ids_store = None
        if hasattr(self, "_bg_cache"):
            self._bg_cache.clear()  # background counts grew too
        return len(new)

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []


class BulkScorer:
    """Actor-pool callable for the Dataset bulk-query path: each actor loads
    the full index once (test/bench scale), scores query batches.

    Input batch: (query_id:int64, query:string, k:int32)
    Output: (query_id:int64, rank:int32, doc_id:int64, score:float64)
    """

    def __init__(self, index_dir: str, params: BM25Params | None = None,
                 method: str = "auto"):
        info = IndexInfo(index_dir)
        self.core = _ScorerCore(index_dir, info.shard_ids(),
                                params or BM25Params(), method)
        self.n = info.stats.num_docs
        self.clip = (info.manifest.min_token_len, info.manifest.max_token_len)
        self.analyzer = get_analyzer(
            "code" if info.manifest.analyzer == "per_lang" else info.manifest.analyzer
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch.column("query_id").to_pylist()
        texts = batch.column("query").to_pylist()
        ks = batch.column("k").to_pylist() if "k" in batch.column_names else [10] * len(qids)
        queries = [
            (qid, sorted(set(clip_tokens(self.analyzer(q), *self.clip))), int(k))
            for qid, q, k in zip(qids, texts, ks)
        ]
        all_terms = sorted({t for _, terms, _ in queries for t in terms})
        dfs = self.core.local_dfs(all_terms)
        idf = {
            t: math.log(1.0 + (self.n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            for t in all_terms
        }
        o_qid, o_rank, o_doc, o_score = [], [], [], []
        for qid, ids, sc in self.core.topk(queries, idf):
            for r, (d, s) in enumerate(zip(ids.tolist(), sc.tolist())):
                o_qid.append(qid)
                o_rank.append(r + 1)
                o_doc.append(d)
                o_score.append(s)
        return pa.table(
            {
                "query_id": pa.array(o_qid, pa.int64()),
                "rank": pa.array(o_rank, pa.int32()),
                "doc_id": pa.array(o_doc, pa.int64()),
                "score": pa.array(o_score, pa.float64()),
            }
        )


def score_queries_dataset(queries_ds, index_dir: str | Path, concurrency: int = 2):
    """Bulk-score a Dataset of queries through a BulkScorer actor pool."""
    return queries_ds.map_batches(
        BulkScorer,
        fn_constructor_args=(str(index_dir),),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=256,
        concurrency=concurrency,
        num_cpus=1,
    )


class DistributedBulkScorer:
    """Dataset stage that fans each query batch out to the shard-actor
    pool of an existing :class:`QueryEngine` — the bulk path whose memory
    per actor is bounded by its shard subset (the 10^12-doc shape), unlike
    :class:`BulkScorer` which loads the whole index per pool actor.

    Construct with the engine's actor handles + stats (plain picklables),
    so stage tasks talk straight to the long-lived scorer actors.
    """

    def __init__(self, actor_handles, num_docs: int, analyzer_name: str,
                 round_decimals: int | None = None,
                 clip: tuple[int, int] = (1, 64)):
        self.actors = actor_handles
        self.n = num_docs
        self.round_decimals = round_decimals
        self.clip = clip
        self.analyzer = get_analyzer(
            "code" if analyzer_name == "per_lang" else analyzer_name
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch.column("query_id").to_pylist()
        texts = batch.column("query").to_pylist()
        ks = (
            batch.column("k").to_pylist()
            if "k" in batch.column_names
            else [10] * len(qids)
        )
        queries = [
            (qid, sorted(set(clip_tokens(self.analyzer(q), *self.clip))), int(k))
            for qid, q, k in zip(qids, texts, ks)
        ]
        all_terms = sorted({t for _, terms, _ in queries for t in terms})
        if all_terms:
            df_parts = ray.get([a.local_dfs.remote(all_terms) for a in self.actors])
            idf = {}
            for t in all_terms:
                df = sum(p[t] for p in df_parts)
                idf[t] = math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))
        else:
            idf = {}
        per_actor = ray.get([a.topk.remote(queries, idf) for a in self.actors])
        o_qid, o_rank, o_doc, o_score = [], [], [], []
        for qi, (qid, terms, k) in enumerate(queries):
            parts = [(res[qi][1], res[qi][2]) for res in per_actor]
            ids, sc = merge_topk(parts, k, self.round_decimals)
            for r, (d, s) in enumerate(zip(ids.tolist(), sc.tolist())):
                o_qid.append(qid)
                o_rank.append(r + 1)
                o_doc.append(d)
                o_score.append(s)
        return pa.table(
            {
                "query_id": pa.array(o_qid, pa.int64()),
                "rank": pa.array(o_rank, pa.int32()),
                "doc_id": pa.array(o_doc, pa.int64()),
                "score": pa.array(o_score, pa.float64()),
            }
        )


def score_queries_dataset_distributed(queries_ds, engine: "QueryEngine",
                                      batch_size: int = 256):
    """Bulk-score a query Dataset against an engine's shard-actor pool."""
    return queries_ds.map_batches(
        DistributedBulkScorer(
            engine.actors, engine.info.stats.num_docs, engine.analyzer_name,
            engine.params.round_decimals,
            (engine.info.manifest.min_token_len, engine.info.manifest.max_token_len),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
