"""EQL-style SEQUENCE queries over an event stream — the Elastic Event
Query Language's core primitive (``sequence by <key> with maxspan=N
[step1] [step2] ...``), as a Ray-Data custom operator per the
custom-operator recipe (map_batches tag → bucketed key exchange →
vectorized per-bucket chaining; same shape as ``ops/window.py``).

Semantics (deterministic, SQL-reproducible): for every event matching
step 1, chain to the EARLIEST strictly-later event of the same key
matching step 2, from there to the earliest matching step 3, and so on;
the sequence reports iff every step completes and ``last_ts − first_ts
≤ maxspan``.  This is the "first completion per anchor" reading —
anchors may share later-step events (overlap allowed).  Disclosed
divergence: ES's engine keeps rolling partial-sequence state and can
bind a step to a newer partial, yielding a different (undocumented-
order) subset; the anchor-chaining form is the one an oracle can
verify.

Scale shape: one streaming tag pass (step masks are Arrow/numpy
kernels), a 64-bucket key exchange, then ONE lexsort per bucket and one
``searchsorted`` per step — no per-key Python loops.  Per-bucket bound
(guarded, not assumed): keys-per-bucket × time-span-µs must fit int64;
raise ``n_buckets`` for larger key spaces.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import epoch_us

N_BUCKETS = 64


def eql_sequence(
    ds,
    steps: list,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    maxspan_us: int | None = None,
    n_buckets: int = N_BUCKETS,
):
    """→ Dataset(key, step0_id, step1_id, ..., span_us): one row per
    completed sequence (anchored at each step-1 match).  ``steps`` is a
    list of ``batch → bool numpy mask`` predicates (e.g. event_type
    equality), length ≥ 2."""
    n_steps = len(steps)
    if n_steps < 2:
        raise ValueError("an EQL sequence needs at least 2 steps")

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy()
        ts = epoch_us(batch.column(ts_col))
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        ks, tss, idss, stps = [], [], [], []
        for s, pred in enumerate(steps):
            m = pred(batch)
            ks.append(keys[m])
            tss.append(ts[m])
            idss.append(ids[m])
            stps.append(np.full(int(m.sum()), s, dtype=np.int8))
        k2 = np.concatenate(ks)
        return pa.table({
            "key": pa.array(k2.astype(np.int64), pa.int64()),
            "bucket": pa.array((k2 % n_buckets).astype(np.int32)),
            "ts": pa.array(np.concatenate(tss), pa.int64()),
            "id": pa.array(np.concatenate(idss), pa.int64()),
            "step": pa.array(np.concatenate(stps), pa.int8()),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        key = g.column("key").to_numpy()
        ts = g.column("ts").to_numpy()
        ids = g.column("id").to_numpy()
        step = g.column("step").to_numpy()
        # dense key runs + normalized time → one sortable composite;
        # id tie-break makes equal-ts choices deterministic (oracle:
        # ORDER BY ts, event_id LIMIT 1)
        order = np.lexsort((ids, ts, key))
        key, ts, ids, step = key[order], ts[order], ids[order], step[order]
        run = np.cumsum(np.concatenate(
            [[0], (key[1:] != key[:-1]).astype(np.int64)]
        ))
        t0 = ts.min() if len(ts) else 0
        span = int(ts.max() - t0) + 2 if len(ts) else 2
        n_runs = int(run[-1]) + 1 if len(run) else 0
        if n_runs and n_runs > (2**62) // span:
            raise ValueError(
                "per-bucket keys × time span overflow int64 — raise "
                "n_buckets for this key space"
            )
        comp = run * span + (ts - t0)
        per_step = []
        for s in range(n_steps):
            m = step == s
            per_step.append((comp[m], ids[m], ts[m], run[m]))
        a_comp, a_ids, a_ts, a_run = per_step[0]
        cols = {"key": key[step == 0], "step0_id": a_ids}
        first_ts = a_ts
        cur_comp = a_comp
        alive = np.ones(len(a_comp), dtype=bool)
        last_ts = a_ts.copy()
        for s in range(1, n_steps):
            s_comp, s_ids, s_ts, s_run = per_step[s]
            if len(s_comp) == 0:
                alive[:] = False
                cols[f"step{s}_id"] = np.full(len(a_comp), -1,
                                              dtype=np.int64)
                continue
            pos = np.searchsorted(s_comp, cur_comp, side="right")
            ok = pos < len(s_comp)
            posc = np.minimum(pos, len(s_comp) - 1)
            ok &= s_run[posc] == a_run
            alive &= ok
            cols[f"step{s}_id"] = np.where(alive, s_ids[posc], -1)
            last_ts = np.where(alive, s_ts[posc], last_ts)
            cur_comp = np.where(alive, s_comp[posc], cur_comp)
        keep = alive
        if maxspan_us is not None:
            keep = keep & (last_ts - first_ts <= maxspan_us)
        out = {
            k: pa.array(np.asarray(v)[keep], pa.int64())
            for k, v in cols.items()
        }
        out["span_us"] = pa.array((last_ts - first_ts)[keep], pa.int64())
        return pa.table(out)

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow",
                    zero_copy_batch=True)
    )


def type_is(event_type: str, col: str = "event_type"):
    """Step-predicate factory: ``event_type == value`` (one Arrow
    compare kernel)."""

    def pred(batch: pa.Table) -> np.ndarray:
        import pyarrow.compute as pc

        return pc.equal(batch.column(col), event_type).to_numpy(
            zero_copy_only=False
        )

    return pred
