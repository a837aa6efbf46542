"""ES *join field* queries — ``has_child`` and ``has_parent`` — over a
parent-id docmeta column.

ES models parent/child with a ``join``-typed field: children carry
their parent's id and are ROUTED to the parent's shard, so the join
never leaves a shard.  Here the relation is a ``parent_id`` docmeta
column (a doc is a PARENT iff ``parent_id == doc_id``, a CHILD
otherwise — the ``group_of`` derived-meta recipe), and:

- ``has_child(child_query)`` returns PARENT docs having ≥1 (or
  [min_children, max_children]) matching children, scored by
  ``score_mode`` ∈ none|sum|avg|min|max over the children's scores;
- ``has_parent(parent_query)`` returns CHILD docs whose parent matches,
  carrying the parent's score (``score=True``) or a constant 1.0.

Scale shape: the shard-actor engine aggregates children per shard
(associative ``(count, sum, min, max)`` partials keyed by parent —
O(parents-with-matches) wire, correct even when a family straddles a
shard boundary); the term-partitioned engine routes matched child ids
to the source docmeta lineage (work ∝ matched docs, its standard
aggregation shape).  ``has_parent`` broadcasts the matched-parent id
set to the doc-values scan — bounded by matching parents, the same
fan-out ES's global ordinals join pays.

Score contract: children contribute their SERVING scores (rounded to
the engine's ``round_decimals``), so the per-parent sum is a sum of
decimal-grid values — order-independent in integer grid units, which is
what keeps the distributed reduction and the SQL oracle bit-equal (ES
sums unrounded floats; divergence disclosed).
"""

from __future__ import annotations

import numpy as np

SCORE_MODES = ("none", "sum", "avg", "min", "max")


def group_child_scores(
    parents: np.ndarray, gids: np.ndarray, scores_r: np.ndarray
) -> dict:
    """Per-parent associative partial over one engine's matched docs:
    ``{parent_id: (n, sum, min, max)}`` of the children's (rounded)
    scores.  Docs that ARE their own parent (parent rows) are excluded
    — only child-typed docs count (the ES join-field contract)."""
    is_child = parents != gids
    p, r = parents[is_child], scores_r[is_child]
    if len(p) == 0:
        return {}
    ug, ginv = np.unique(p, return_inverse=True)
    cnt = np.bincount(ginv, minlength=len(ug))
    sm = np.bincount(ginv, weights=r, minlength=len(ug))
    o = np.argsort(ginv, kind="stable")
    bounds = np.searchsorted(ginv[o], np.arange(len(ug)))
    rs = r[o]
    mn = np.minimum.reduceat(rs, bounds)
    mx = np.maximum.reduceat(rs, bounds)
    return {
        int(ug[i]): (int(cnt[i]), float(sm[i]), float(mn[i]), float(mx[i]))
        for i in range(len(ug))
    }


def finish_has_child(
    merged: dict,
    score_mode: str = "none",
    min_children: int = 1,
    max_children: int | None = None,
    k: int | None = None,
    round_decimals: int | None = None,
) -> list[tuple[int, float, int]]:
    """Merged per-parent partials → ranked ``(parent_id, score,
    n_children)`` rows: count-bounds filter, score_mode combine
    (``none`` → constant 1.0, the ES filter-context default), rank by
    (score desc, parent asc), optional top-k cut."""
    if score_mode not in SCORE_MODES:
        raise ValueError(f"unknown score_mode {score_mode!r}")
    rows = []
    for parent, (n, s, mn, mx) in merged.items():
        if n < min_children:
            continue
        if max_children is not None and n > max_children:
            continue
        v = {"none": 1.0, "sum": s, "avg": s / n, "min": mn,
             "max": mx}[score_mode]
        if round_decimals is not None:
            v = float(np.round(v, round_decimals))
        rows.append((int(parent), v, n))
    rows.sort(key=lambda t: (-t[1], t[0]))
    return rows if k is None else rows[:k]


def children_rows(
    child_ids: np.ndarray,
    child_parents: np.ndarray,
    parent_scores: dict[int, float],
    score: bool = True,
    k: int | None = None,
) -> list[tuple[int, float]]:
    """``has_parent`` assembly: child docs whose parent matched, each
    carrying the parent's (already-rounded serving) score — or 1.0 in
    filter context; (score desc, child asc) order, optional cut."""
    out = []
    for c, p in zip(child_ids.tolist(), child_parents.tolist()):
        sc = parent_scores.get(int(p))
        if sc is None:
            continue
        out.append((int(c), float(sc) if score else 1.0))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out if k is None else out[:k]


def keyed_partials(keys: np.ndarray, vals: np.ndarray | None) -> dict:
    """Group values → ``{key: (n, Σ, min, max)}`` — the engines'
    terms-agg partial shape (fold with ``merge_agg_partials``).
    ``keys`` must already be missing-filtered (``datehist.valid_mask``);
    ``vals`` aligns with ``keys`` (None ⇔ count-only partials)."""
    if len(keys) == 0:
        return {}
    ug, inv, counts = np.unique(keys, return_inverse=True,
                                return_counts=True)
    if vals is None:
        return {
            g: (int(c), None, None, None)
            for g, c in zip(ug.tolist(), counts.tolist())
        }
    v = np.asarray(vals, dtype=np.float64)
    sums = np.bincount(inv, weights=v, minlength=len(ug))
    mins = np.full(len(ug), np.inf)
    maxs = np.full(len(ug), -np.inf)
    np.minimum.at(mins, inv, v)
    np.maximum.at(maxs, inv, v)
    return {
        g: (int(counts[i]), float(sums[i]), float(mins[i]), float(maxs[i]))
        for i, g in enumerate(ug.tolist())
    }


def family_agg_rows(
    parent_keys: np.ndarray,
    child_partials: dict,
    stats_on: str | None,
) -> list[dict]:
    """Assemble ``children``-aggregation rows: one per parent bucket —
    ``parent_count`` from the matched parents' own key values (so a
    bucket whose parents have NO children still appears, the ES terms +
    sub-agg nesting), ``doc_count`` = that bucket's matching CHILD docs
    (the ``children`` sub-agg's count), optional child stats.  Default
    ES bucket order: (parent doc_count desc, key asc)."""
    uk, pc = np.unique(parent_keys, return_counts=True)
    rows = []
    for key, n_par in zip(uk.tolist(), pc.tolist()):
        c, sm, mn, mx = child_partials.get(key, (0, None, None, None))
        row = {"key": key, "parent_count": int(n_par), "doc_count": int(c)}
        if stats_on is not None:
            row.update({
                "sum": sm if c else None, "min": mn if c else None,
                "max": mx if c else None,
                "avg": sm / c if c else None,
            })
        rows.append(row)
    rows.sort(key=lambda r: (-r["parent_count"], r["key"]))
    return rows


def self_parent_script(parent_field: str, id_field: str = "doc_id") -> str:
    """Runtime-field expression that is 0 exactly on PARENT rows
    (``parent_id == doc_id``) — the type filter both engines use as a
    range predicate."""
    return f"script:doc['{parent_field}'] - doc['{id_field}']"
