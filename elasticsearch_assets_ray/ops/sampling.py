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


def shuffle_order(ds, id_col: str = "doc_id", seed: int = 0):
    """Deterministic GLOBAL training-order shuffle (the GPT-style epoch
    ordering): every row gets the seeded Knuth-hash key of its id in a
    ``shuffle_key`` column and the dataset sorts on ``(shuffle_key,
    id)`` — a pseudo-random permutation that is a PURE FUNCTION of the
    id set, so reruns, resumes and audits see the identical order, and
    different ``seed`` values give independent epoch orders.

    The sort is the one unavoidable all-to-all a global shuffle is; at
    100 TB consume the result with a key-range-partitioned
    ``write_parquet`` so a crashed epoch prep resumes per range (the
    key column makes every range self-describing).  Ray's own
    ``random_shuffle`` moves the same bytes but is NOT reproducible
    across runs/partitionings — the property this op exists for."""

    def key(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy()
        h = (
            (ids.astype(np.uint64) + np.uint64(seed)) * _KNUTH
        ) % _MOD
        return b.append_column("shuffle_key",
                               pa.array(h.astype(np.int64), pa.int64()))

    return ds.map_batches(
        key, batch_format="pyarrow", zero_copy_batch=True
    ).sort(["shuffle_key", id_col])


def shuffle_order_write(ds, out_dir: str, n_ranges: int = 64,
                        id_col: str = "doc_id", seed: int = 0) -> str:
    """:func:`shuffle_order` materialized the 100-TB way: equal-width
    key RANGES of the u32 shuffle key (``n_ranges`` a power of two)
    instead of one global sort — each range sorts independently inside
    ``groupby(range).map_groups`` and writes its own
    ``range=<r>/part.parquet`` atomically (tmp + rename, a ``_done``
    marker commits it), so reading ``range`` dirs in ascending order IS
    the epoch order and a crashed run redoes only uncommitted ranges
    (the exchange replays, the writes are idempotent — committed ranges
    are never rewritten).  Never one giant file; never a global sort.

    A ``_manifest.json`` (seed, id_col, n_ranges, input-file
    fingerprint) commits at out_dir root before any range: reusing an
    out_dir with a different seed, key column, range count or corpus
    raises instead of silently serving stale epoch order mixed with
    fresh ranges — resume is only valid for the identical run."""
    import json
    import os

    import pyarrow.parquet as pq

    if n_ranges < 1 or (n_ranges & (n_ranges - 1)):
        raise ValueError("n_ranges must be a power of two")
    shift = np.uint64(32 - (n_ranges.bit_length() - 1))
    os.makedirs(out_dir, exist_ok=True)

    try:
        fingerprint = sorted(ds.input_files())
    except Exception:  # non-file-backed dataset: no lineage to pin
        fingerprint = None
    manifest = {"seed": int(seed), "id_col": id_col,
                "n_ranges": int(n_ranges), "input_files": fingerprint}
    mpath = os.path.join(out_dir, "_manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            prior = json.load(f)
        if prior != manifest:
            raise ValueError(
                f"shuffle_order_write resume mismatch in {out_dir!r}: "
                f"prior run {prior} vs this run {manifest} — committed "
                "ranges would mix two different epoch orders; use a "
                "fresh out_dir"
            )
    else:
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)

    def key(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy()
        h = ((ids.astype(np.uint64) + np.uint64(seed)) * _KNUTH) % _MOD
        b = b.append_column("shuffle_key",
                            pa.array(h.astype(np.int64), pa.int64()))
        return b.append_column(
            "shuffle_range",
            pa.array((h >> shift).astype(np.int32), pa.int32()))

    def write_range(g: pa.Table) -> pa.Table:
        r = int(g.column("shuffle_range")[0].as_py())
        dest = os.path.join(out_dir, f"range={r:05d}")
        done = os.path.join(dest, "_done")
        if not os.path.exists(done):
            order = np.lexsort((
                g.column(id_col).to_numpy(),
                g.column("shuffle_key").to_numpy(),
            ))
            g2 = g.drop_columns(["shuffle_range"]).take(
                pa.array(order, pa.int64()))
            os.makedirs(dest, exist_ok=True)
            tmp = os.path.join(dest, "_tmp.part.parquet")
            pq.write_table(g2, tmp)
            os.replace(tmp, os.path.join(dest, "part.parquet"))
            with open(done, "w") as f:
                f.write(str(g2.num_rows))
        return pa.table({
            "range": pa.array([r], pa.int32()),
            "rows": pa.array([g.num_rows], pa.int64()),
        })

    summary = (
        ds.map_batches(key, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shuffle_range")
        .map_groups(write_range, batch_format="pyarrow",
                    zero_copy_batch=True)
    )
    summary.materialize()
    return out_dir


def shuffled_files(out_dir: str) -> list[str]:
    """The epoch-order file list of a :func:`shuffle_order_write`
    output (ascending range, the explicit-file-list form
    ``read_parquet`` wants)."""
    import glob
    import os

    return [
        os.path.join(d, "part.parquet")
        for d in sorted(glob.glob(os.path.join(out_dir, "range=*")))
        if os.path.exists(os.path.join(d, "_done"))
    ]


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


def token_budget_plan(
    ds,
    weights_ppm: dict[str, int],
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    analyzer: str = "simple",
):
    """Token-budget mixture planning: given target mixture WEIGHTS
    (integer parts-per-million, the exact wire form) and a total token
    BUDGET, measure each source's token supply (one streaming counting
    pass — per-batch tokenize + tiny source-keyed partials) and compute
    the integer plan:

    * ``target_tokens``  = ``budget · w_s // 10⁶`` — the source's share;
    * ``epochs_e6``      = ``target · 10⁶ // supply`` — how often the
      source repeats in micro-epochs (> 10⁶ ⇒ UPSAMPLING: the source is
      scarcer than its share; the standard repeated-epochs regime);
    * ``sample_rate_e6`` = ``min(10⁶, epochs_e6)`` — the downsampling
      rate to feed :func:`mixture_sample` (via ``rate·2³²/10⁶``).

    EVERY output is integer arithmetic on exact counts — the SQL oracle
    reproduces the plan bit-for-bit (no float division anywhere)."""
    from ray.data.aggregate import Sum

    from ..index.build import tokenize_codes_arrow

    def partial(b: pa.Table) -> pa.Table:
        _t, codes, doc_rel, dls = tokenize_codes_arrow(
            b.column(text_col), analyzer, 1, 64, {}
        )
        ntok = np.asarray(dls, dtype=np.int64)
        enc = b.column(source_col).combine_chunks().dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        toks = np.zeros(k, np.int64)
        np.add.at(toks, idx, ntok)
        docs = np.bincount(idx, minlength=k).astype(np.int64)
        return pa.table({
            "source": enc.dictionary,
            "n_docs": pa.array(docs, pa.int64()),
            "n_tokens": pa.array(toks, pa.int64()),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_tokens", alias_name="n_tokens"))
    )
    import ray as _ray

    parts = [_ray.get(r) for r in agg.to_arrow_refs()]
    t = pa.concat_tables([p for p in parts if p.num_rows])
    rows = {r["source"]: r for r in t.to_pylist()}
    out = []
    for s in sorted(weights_ppm):
        w = int(weights_ppm[s])
        supply = int(rows[s]["n_tokens"]) if s in rows else 0
        target = budget_tokens * w // 1_000_000
        epochs_e6 = (target * 1_000_000 // supply) if supply else 0
        rate_e6 = min(1_000_000, epochs_e6)
        out.append((s, int(rows[s]["n_docs"]) if s in rows else 0,
                    supply, w, target, epochs_e6, rate_e6))
    return pa.table({
        "source": pa.array([r[0] for r in out], pa.string()),
        "n_docs": pa.array([r[1] for r in out], pa.int64()),
        "n_tokens": pa.array([r[2] for r in out], pa.int64()),
        "weight_ppm": pa.array([r[3] for r in out], pa.int64()),
        "target_tokens": pa.array([r[4] for r in out], pa.int64()),
        "epochs_e6": pa.array([r[5] for r in out], pa.int64()),
        "sample_rate_e6": pa.array([r[6] for r in out], pa.int64()),
    })
