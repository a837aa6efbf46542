"""Deterministic sampling operators for training-data pipelines.

Random sampling (``ds.random_sample``) is irreproducible across runs
and cluster layouts; training-data curation wants DETERMINISTIC
samples — the same corpus always yields the same subset, regardless of
partitioning, so reruns, A/B slices and audits line up.  Both operators
key on a multiplicative integer hash of the id column (Knuth's
2654435761 mod 2^32 — SQL-expressible, so the driver oracle can verify
bit-exactly; swap in a stronger mix if adversarial ids matter), making
them pure per-batch filters with NO shuffle for the rate sampler and
one small-cardinality groupby for the stratified one.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_KNUTH = np.uint64(2_654_435_761)
_MOD = np.uint64(1) << np.uint64(32)


def knuth_hash_u32(ids: np.ndarray) -> np.ndarray:
    """Multiplicative hash of int ids → uniform-ish u32 values
    (deterministic, order-free, SQL-reproducible)."""
    return (ids.astype(np.uint64) * _KNUTH) % _MOD


def hash_sample(ds, rate: float, id_col: str = "doc_id"):
    """Keep ~``rate`` of rows, deterministically by id hash — a pure
    per-batch filter (no shuffle, no state, resumable by construction).
    The SAME rows survive at any partitioning, which also means
    rate=0.1 and rate=0.2 samples NEST (the smaller is a subset of the
    larger) — the property curriculum/data-scaling studies rely on."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    thresh = np.uint64(int(rate * float(_MOD)))

    def pick(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy()
        return b.filter(pa.array(knuth_hash_u32(ids) < thresh))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(ds, group_col: str, n_per_group: int,
                      id_col: str = "doc_id"):
    """Deterministic per-stratum head: for each ``group_col`` value,
    the ``n_per_group`` rows with the smallest (id-hash, id) key — a
    hash-ordered "random" sample that is stable across runs and
    partitionings.  Strata are keyword-cardinality (languages, sources),
    so the groupby exchange is small; for high-cardinality strata use
    the bucketed-reduction pattern instead (see DEVNOTES)."""

    def pick(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy()
        h = knuth_hash_u32(ids)
        order = np.lexsort((ids, h))[:n_per_group]
        return g.take(pa.array(np.sort(order)))

    return ds.groupby(group_col).map_groups(
        pick, batch_format="pyarrow", zero_copy_batch=True
    )


def mixture_rates(weights: dict[str, float], temperature: float = 1.0,
                  ) -> dict[str, float]:
    """Temperature-adjusted per-source inclusion rates — the
    multilingual / source-balancing recipe (p_s ∝ w_s^(1/T), scaled so
    the largest rate is 1.0).  T > 1 flattens the mixture toward the
    tail sources; T = 1 keeps the raw weights; T → 0 keeps only the
    heaviest source.  Feed the result to :func:`mixture_sample`."""
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    p = {s: float(w) ** (1.0 / temperature) for s, w in weights.items()}
    m = max(p.values())
    return {s: v / m for s, v in p.items()}


def mixture_thresholds(rates: dict[str, float]) -> dict[str, int]:
    """Exact integer hash thresholds (rate × 2³²) — the wire/SQL form;
    computing them ONCE here keeps the float pow out of the oracle
    comparison (both sides compare against the same integers)."""
    return {s: int(r * float(_MOD)) for s, r in rates.items()}


def mixture_sample(ds, thresholds: dict[str, int],
                   source_col: str = "source", id_col: str = "doc_id"):
    """Per-source deterministic downsampling in ONE streaming filter —
    the training-data MIXING step (upweight rare sources / downweight
    dominant ones without a shuffle).  Each row keeps iff
    ``knuth_hash(id) < thresholds[source]``; unknown sources drop.
    Same nesting + partitioning-independence properties as
    :func:`hash_sample`, per source."""

    def pick(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        src = b.column(source_col)
        src = src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src
        enc = src.dictionary_encode()
        dict_thresh = np.array(
            [thresholds.get(v, 0) for v in enc.dictionary.to_pylist()],
            dtype=np.uint64,
        )
        row_thresh = dict_thresh[
            np.asarray(enc.indices.to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        ]
        ids = b.column(id_col).to_numpy()
        return b.filter(pa.array(knuth_hash_u32(ids) < row_thresh))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
