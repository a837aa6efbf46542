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


def _key_array(batch: pa.Table, key_col) -> np.ndarray:
    """``by`` key per event as int64.  A single integer column is used
    EXACTLY (no collisions); a composite / string key is a mixed 64-bit
    hash (splitmix over ints, fnv1a64 over strings) — collision odds
    ~n²/2⁶⁴, disclosed, the standard join-key-hash trade."""
    cols = [key_col] if isinstance(key_col, str) else list(key_col)
    first = batch.column(cols[0])
    if len(cols) == 1 and pa.types.is_integer(first.type):
        return first.to_numpy().astype(np.int64)
    acc = np.zeros(batch.num_rows, dtype=np.uint64)
    for c in cols:
        col = batch.column(c)
        if pa.types.is_integer(col.type):
            h = col.to_numpy().astype(np.uint64)
        else:
            from ..index.global_merge import _fnv1a64_vec

            col = col.combine_chunks() if isinstance(
                col, pa.ChunkedArray) else col
            h = _fnv1a64_vec(col).astype(np.uint64)
        # splitmix64 finalizer mixes each field before combining
        h = (h + np.uint64(0x9E3779B97F4A7C15))
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = h ^ (h >> np.uint64(31))
        acc = acc * np.uint64(1099511628211) ^ h
    return (acc >> np.uint64(1)).astype(np.int64)  # keep non-negative


def eql_sequence(
    ds,
    steps: list,
    key_col="user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    maxspan_us: int | None = None,
    until=None,
    n_buckets: int = N_BUCKETS,
):
    """→ Dataset(key, step0_id, step1_id, ..., span_us): one row per
    completed sequence (anchored at each step-1 match).  ``steps`` is a
    list of ``batch → bool numpy mask`` predicates (e.g. event_type
    equality), length ≥ 2.  ``until`` (EQL's ``until [cond]``) kills a
    sequence when a matching event of the same key falls strictly
    between the anchor and the final step — the pending-state expiry.
    ``key_col`` may be a list of columns (EQL ``by a, b``)."""
    n_steps = len(steps)
    if n_steps < 2:
        raise ValueError("an EQL sequence needs at least 2 steps")
    all_preds = list(steps) + ([until] if until is not None else [])

    def tag(batch: pa.Table) -> pa.Table:
        keys = _key_array(batch, key_col)
        ts = epoch_us(batch.column(ts_col))
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        ks, tss, idss, stps = [], [], [], []
        for s, pred in enumerate(all_preds):
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
        u_comp = comp[step == n_steps] if until is not None else None
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
        if u_comp is not None and len(u_comp):
            # EQL `until`: an until event of the same key STRICTLY
            # between anchor and completion expires the pending
            # sequence.  comp encodes (run, ts), and anchor/completion
            # share a run, so a composite range check is the per-key
            # time-window check in one searchsorted pair.
            lo = np.searchsorted(u_comp, a_comp, side="right")
            hi = np.searchsorted(u_comp, cur_comp, side="left")
            keep = keep & ~(hi > lo)
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


def eql_sample(
    ds,
    steps: list,
    key_col="user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    n_buckets: int = N_BUCKETS,
):
    """EQL ``sample by <key> [s1] [s2] ...`` — UNORDERED join semantics:
    one row per key that has at least one event matching every step,
    carrying the earliest (ts, id) event per step.  (ES returns an
    arbitrary combination; the earliest-per-step reading is the
    deterministic, oracle-verifiable one — disclosed.)  Same bucketed
    exchange as :func:`eql_sequence`; per bucket one lexsort + one
    first-per-run cut per step, no time chaining."""
    n_steps = len(steps)
    if n_steps < 1:
        raise ValueError("an EQL sample needs at least 1 step")

    def tag(batch: pa.Table) -> pa.Table:
        keys = _key_array(batch, key_col)
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
        order = np.lexsort((ids, ts, key))
        key, ts, ids, step = key[order], ts[order], ids[order], step[order]
        # first event per (key, step): intersect key sets across steps
        per = []
        for s in range(n_steps):
            m = step == s
            ks, vs = key[m], ids[m]
            first = np.concatenate(([True], ks[1:] != ks[:-1])) if len(ks) \
                else np.zeros(0, bool)
            per.append((ks[first], vs[first]))
        common = per[0][0]
        for ks, _ in per[1:]:
            common = common[np.isin(common, ks, assume_unique=True)]
        cols = {"key": pa.array(common, pa.int64())}
        for s, (ks, vs) in enumerate(per):
            pos = np.searchsorted(ks, common)
            cols[f"step{s}_id"] = pa.array(vs[pos], pa.int64())
        return pa.table(cols)

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
