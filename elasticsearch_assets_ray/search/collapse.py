"""ES field collapsing (``collapse`` on a keyword doc-values field):
hits group by the field's value, groups rank by their BEST hit
(rounded score desc, doc_id asc — the serving tie contract), and each
group returns its top ``inner_size`` hits (``inner_hits``).

Exactness note (vs ES): ES collapses each shard's top-k candidate
window, which can miss a group whose best hit sits below the window.
This engine collapses the FULL match set — per shard the return is
bounded by distinct-groups × inner_size (keyword-field cardinality),
then the per-group partials merge exactly: the global per-group best
is the max over shard bests, and the global per-group top-n is
contained in the union of per-shard top-ns.  So results are exact and
layout-independent (and SQL-reproducible — the contract oracle is a
window function).
"""

from __future__ import annotations

import numpy as np


def collapse_partial(
    ids: np.ndarray,
    scores: np.ndarray,
    groups: np.ndarray,
    inner_size: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-group top ``inner_size`` hits by (score desc, doc asc) —
    vectorized (one lexsort + rank-within-run); the shard-side partial
    AND the coordinator-side final selection share this kernel.
    Returns the selected (ids, scores, groups) rows (null-group rows —
    None / NaN doc values — drop, the ES collapse contract)."""
    if len(ids) == 0:
        return ids, scores, groups
    if groups.dtype.kind == "f":
        keep = ~np.isnan(groups)
    else:
        keep = np.array([g is not None for g in groups], dtype=bool)
    ids, scores, groups = ids[keep], scores[keep], groups[keep]
    if len(ids) == 0:
        return ids, scores, groups
    # factorize group values (np.unique sorts; fine — order is per-group)
    _, codes = np.unique(groups, return_inverse=True)
    order = np.lexsort((ids, -scores, codes))  # group, score desc, doc asc
    gc = codes[order]
    starts = np.concatenate([[True], gc[1:] != gc[:-1]])
    # rank within group = position − position of the group's first row
    pos = np.arange(len(gc))
    first = pos[starts][np.cumsum(starts) - 1]
    sel = order[(pos - first) < inner_size]
    return ids[sel], scores[sel], groups[sel]


def collapse_rows(
    ids: np.ndarray,
    scores: np.ndarray,
    groups: np.ndarray,
    k_groups: int,
    inner_size: int,
    round_decimals: int | None = None,
) -> list[dict]:
    """Final collapse: groups rank by best hit (rounded score desc,
    doc asc), top ``k_groups``; inner hits per group by the same key,
    top ``inner_size``.  → [{group, group_rank, inner_rank, doc_id,
    score}] in (group_rank, inner_rank) order."""
    ids, scores, groups = collapse_partial(ids, scores, groups, inner_size)
    if len(ids) == 0:
        return []
    r = np.round(scores, round_decimals) if round_decimals is not None \
        else scores
    order = np.lexsort((ids, -r))  # score desc, doc asc — global hit order
    out: list[dict] = []
    grank: dict = {}
    counts: dict = {}
    for i in order:
        g = groups[i]
        if g not in grank:
            if len(grank) >= k_groups:
                continue
            grank[g] = len(grank) + 1
            counts[g] = 0
        if counts[g] >= inner_size:
            continue
        counts[g] += 1
        out.append({
            "group": g, "group_rank": grank[g],
            "inner_rank": counts[g], "doc_id": int(ids[i]),
            "score": float(r[i]),
        })
    out.sort(key=lambda d: (d["group_rank"], d["inner_rank"]))
    return out
