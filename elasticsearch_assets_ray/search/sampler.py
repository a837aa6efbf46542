"""ES ``sampler`` / ``diversified_sampler`` aggregations — restrict a
sub-aggregation to the best-scoring sample of the match set, optionally
capping how many docs any one value of a ``dedup_on`` field may
contribute (the "don't let one author dominate the sample" agg).

Engine-agnostic: works over anything exposing ``.search`` (both
engines — parity tested); group / dedup values hydrate by doc id from
the index's docmeta via :class:`~..state.docstore.DocStore` (point
reads, partition-LRU — never a corpus scan).

Determinism + divergence notes:
- The sample is taken from the FULL ranked match list under the serving
  tie contract (rounded score desc, doc id asc), so results are exact
  and SQL-reproducible.  ES samples PER SHARD (``shard_size`` top docs
  per shard) — an approximation this implementation deliberately
  avoids; with one shard the two coincide.
- ``diversified_sampler`` walks rank order, skipping docs whose
  ``dedup_on`` value already contributed ``max_docs_per_value`` docs,
  until ``sample_size`` docs are kept (ES ``max_docs_per_value``,
  default 1); docs with a MISSING dedup value are skipped entirely (ES
  de-duplication can't bucket them).
"""

from __future__ import annotations

import numpy as np


_KNUTH = np.uint64(2_654_435_761)
_MOD32 = np.uint64(1) << np.uint64(32)


def random_sample_mask(
    ids: np.ndarray, probability: float, seed: int = 0
) -> np.ndarray:
    """ES ``random_sampler`` membership: doc passes iff
    ``((id + seed) * 2654435761) % 2^32 < floor(p * 2^32)`` — the
    repo's Knuth multiplicative hash with the ES ``seed`` option as an
    additive offset.  Deterministic, seed-reproducible, and
    SQL-mirrorable verbatim (the hash-sampling contract
    ``ops/sampling.py`` established)."""
    if not (0.0 < probability <= 1.0):
        raise ValueError("probability must be in (0, 1]")
    thresh = np.uint64(int(probability * float(_MOD32)))
    h = ((ids.astype(np.uint64) + np.uint64(seed)) * _KNUTH) % _MOD32
    return h < thresh


def scale_sampled_rows(rows: list[dict], probability: float) -> list[dict]:
    """Attach ES's inverse-probability estimate next to each raw sampled
    count (``doc_count_scaled = rint(doc_count / p)``) — exact when
    ``1/p`` is integral (the recommended usage; a fractional ``1/p``
    puts the estimate on a rounding boundary)."""
    for r in rows:
        r["doc_count_scaled"] = int(np.rint(r["doc_count"] / probability))
    return rows


def _occurrence_index(vals: np.ndarray) -> np.ndarray:
    """occ[i] = how many earlier rows share vals[i] (vectorized
    cumcount: stable argsort by value, run-relative positions)."""
    order = np.argsort(vals, kind="stable")
    sv = vals[order]
    new = np.ones(len(sv), dtype=bool)
    new[1:] = sv[1:] != sv[:-1]
    starts = np.nonzero(new)[0]
    within = np.arange(len(sv)) - np.repeat(
        starts, np.diff(np.concatenate([starts, [len(sv)]]))
    )
    occ = np.empty(len(sv), dtype=np.int64)
    occ[order] = within
    return occ


def sampler_agg(
    engine,
    query,
    group_by: str,
    index_dir: str,
    sample_size: int = 100,
    dedup_on: str | None = None,
    max_docs_per_value: int = 1,
    round_decimals: int | None = 4,
) -> list[dict]:
    """``sampler`` (``dedup_on=None``) / ``diversified_sampler``
    aggregation with a ``terms`` sub-agg on ``group_by``: buckets of the
    sample's group values, (doc_count desc, key asc) order — plus a
    leading ``{"key": "_sample_count", ...}`` row is NOT emitted; the
    caller can len() the sample via the returned counts."""
    from ..state.docstore import DocStore

    ranked = engine.search(query, k=1 << 30)
    if not ranked:
        return []
    ids = np.array([d for d, _ in ranked], dtype=np.int64)
    # pin the walk order to the ROUNDED tie contract (score_r desc, doc
    # asc) — engines order by raw score, which can permute rounded ties
    sc = np.array([s for _, s in ranked], dtype=np.float64)
    if round_decimals is not None:
        sc = np.round(sc, round_decimals)
    ids = ids[np.lexsort((ids, -sc))]
    cols = [group_by] if dedup_on in (None, group_by) else [
        group_by, dedup_on
    ]
    store = DocStore(index_dir, columns=sorted(set(cols)))
    tbl = store.mget(ids)
    gvals = tbl.column(group_by).to_numpy(zero_copy_only=False)
    if dedup_on is not None:
        dvals = tbl.column(dedup_on).to_numpy(zero_copy_only=False)
        present = np.fromiter(
            (v is not None and v == v for v in dvals), bool, len(dvals)
        )
        occ = np.full(len(dvals), np.iinfo(np.int64).max, dtype=np.int64)
        if present.any():
            occ[present] = _occurrence_index(
                dvals[present].astype("U") if dvals.dtype == object
                else dvals[present]
            )
        keep = occ < max_docs_per_value
    else:
        keep = np.ones(len(ids), dtype=bool)
    kept_idx = np.nonzero(keep)[0][:sample_size]
    sample_g = gvals[kept_idx]
    # ES terms-agg convention: missing group values are omitted
    ok = np.fromiter(
        (v is not None and v == v for v in sample_g), bool, len(sample_g)
    )
    sample_g = sample_g[ok]
    vals, counts = np.unique(
        sample_g.astype("U") if sample_g.dtype == object else sample_g,
        return_counts=True,
    )
    rows = [
        {"key": v.item() if hasattr(v, "item") else v,
         "doc_count": int(c)}
        for v, c in zip(vals, counts)
    ]
    rows.sort(key=lambda r: (-r["doc_count"], r["key"]))
    return rows
