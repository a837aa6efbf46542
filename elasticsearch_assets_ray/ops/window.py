"""Windowed aggregates and as-of joins — custom operators the Dataset
API lacks, composed per the custom-operator recipe (SURVEY.md: map_batches
+ bucketed key exchange + vectorized per-group kernels).

* ``sliding_window_counts`` — tumbling is ``floor(ts/W)``; sliding assigns
  each event to ``W/S`` overlapping windows (flat_map-shaped repeat) and
  then it IS a tumbling count on the window id.  The reference's
  persistent-mode tumbling windows (``slicer.js:382-395``) are the
  ``window == slide`` special case.
* ``asof_join`` — for each left event, the latest right event of the same
  key strictly before it.  Partitioning assumption (documented per the
  custom-operator contract): the key column co-locates via the bucketed
  exchange; per-key history must fit one task (bounded by per-key event
  counts, the natural bound for user/session streams).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import epoch_ms, epoch_us

N_BUCKETS = 64


def sliding_window_counts(ds, ts_col: str = "ts", window_ms: int = 21_600_000,
                          slide_ms: int = 10_800_000):
    """→ Dataset(window_id, n_events): count per sliding window.

    ``slide_ms`` must divide ``window_ms``; window k covers
    ``[k*slide, k*slide + window)`` — each event lands in exactly
    ``window/slide`` windows.  Counts pre-aggregate per batch (combiner)
    before the tiny window-keyed exchange.
    """
    if window_ms % slide_ms:
        raise ValueError("slide_ms must divide window_ms")
    fanout = window_ms // slide_ms

    def partial(batch: pa.Table) -> pa.Table:
        ms = epoch_ms(batch.column(ts_col))
        base = ms // slide_ms
        wins = (base[:, None] - np.arange(fanout, dtype=np.int64)[None, :]).reshape(-1)
        uniq, counts = np.unique(wins, return_counts=True)
        return pa.table(
            {
                "window_id": pa.array(uniq, pa.int64()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("window_id")
        .aggregate(Sum("n", alias_name="n_events"))
    )


def asof_join(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    left_filter,
    right_filter,
    missing: int = -1,
):
    """For every left row: id of the latest right row with the same key and
    strictly earlier ``ts_col`` → Dataset(left_id, right_id).

    ``left_filter``/``right_filter``: ``batch → bool numpy mask`` (e.g.
    event_type == 'purchase' / 'view').  Assumes ``(key, ts)`` has no
    duplicates across the filtered rows (verified corpora; ties would
    need an explicit tiebreak column).
    """

    def tag(batch: pa.Table) -> pa.Table:
        lm = left_filter(batch)
        rm = right_filter(batch)
        keys = batch.column(key_col).to_numpy()
        ts = epoch_us(batch.column(ts_col))
        ids = batch.column(id_col).to_numpy()
        # a row matching BOTH filters plays both roles — emit it twice
        # (once per role) so overlapping filters never lose candidates
        k2 = np.concatenate([keys[lm], keys[rm]])
        return pa.table(
            {
                "key": pa.array(k2, pa.int64()),
                "bucket": pa.array((k2 % N_BUCKETS).astype(np.int32)),
                "ts": pa.array(np.concatenate([ts[lm], ts[rm]])),
                "id": pa.array(
                    np.concatenate([ids[lm], ids[rm]]).astype(np.int64), pa.int64()
                ),
                "is_left": pa.array(
                    np.concatenate(
                        [np.ones(int(lm.sum()), bool), np.zeros(int(rm.sum()), bool)]
                    )
                ),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        key = g.column("key").to_numpy()
        ts = g.column("ts").to_numpy()
        ids = g.column("id").to_numpy()
        is_left = g.column("is_left").to_numpy(zero_copy_only=False)
        n = len(key)
        # one lexsort, then a forward-fill of "last right seen so far"
        # with a per-key-run reset — NO per-key Python loop.  At equal
        # (key, ts), lefts sort BEFORE rights so strictly-before holds.
        order = np.lexsort((~is_left, ts, key))
        key, ts, ids, is_left = key[order], ts[order], ids[order], is_left[order]
        run_id = np.cumsum(np.concatenate([[0], (key[1:] != key[:-1]).astype(np.int64)]))
        pos = np.arange(n, dtype=np.int64)
        # encode (run, position) of every right row; maximum.accumulate
        # forward-fills; a value from an earlier run is detected and
        # treated as missing
        tagged = np.where(~is_left, run_id * n + pos, np.int64(-1))
        acc = np.maximum.accumulate(tagged)
        valid = (acc >= 0) & (acc // n == run_id)
        last_right = np.where(valid, ids[np.maximum(acc % n, 0)], missing)
        lm = is_left
        return pa.table(
            {
                "left_id": pa.array(ids[lm], pa.int64()),
                "right_id": pa.array(last_right[lm], pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow", zero_copy_batch=True)
    )


def range_join_count(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    anchor_filter,
    band_ms: int,
    include_self: bool = False,
):
    """Banded range join (self): for each anchor row, count same-key rows
    with ``ts`` in ``(anchor_ts, anchor_ts + band]`` (or ``[anchor_ts, …]``
    when ``include_self``) → Dataset(anchor_id, n_in_band).

    Same bucketed-key exchange as :func:`asof_join`; the in-band count is
    two vectorized ``searchsorted`` calls per key run.
    """
    band_us = band_ms * 1000

    def tag(batch: pa.Table) -> pa.Table:
        am = anchor_filter(batch)
        keys = batch.column(key_col).to_numpy()
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "bucket": pa.array((keys % N_BUCKETS).astype(np.int32)),
                "ts": pa.array(epoch_us(batch.column(ts_col))),
                "id": pa.array(batch.column(id_col).to_numpy(), pa.int64()),
                "is_anchor": pa.array(am),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        key = g.column("key").to_numpy()
        ts = g.column("ts").to_numpy()
        ids = g.column("id").to_numpy()
        is_a = g.column("is_anchor").to_numpy(zero_copy_only=False)
        n = len(key)
        order = np.lexsort((ts, key))
        key, ts, ids, is_a = key[order], ts[order], ids[order], is_a[order]
        side = "left" if include_self else "right"
        starts = np.nonzero(np.concatenate([[True], key[1:] != key[:-1]]))[0]
        run_id = np.cumsum(
            np.concatenate([[0], (key[1:] != key[:-1]).astype(np.int64)])
        )
        # fast path: fold (run, ts) into ONE sortable int64 so a single
        # global searchsorted answers every per-key band query — the
        # per-key Python loop only remains as the overflow fallback
        t0 = int(ts.min()) if n else 0
        span = (int(ts.max()) - t0 + band_us + 2) if n else 1
        n_runs = int(run_id[-1]) + 1 if n else 0
        if n and n_runs * span < (1 << 62):
            comp = run_id * np.int64(span) + (ts - t0)
            a = np.nonzero(is_a)[0]
            if len(a) == 0:
                return pa.table(
                    {"anchor_id": pa.array([], pa.int64()),
                     "n_in_band": pa.array([], pa.int64())}
                )
            lo_pos = np.searchsorted(comp, comp[a], side=side)
            hi_pos = np.searchsorted(comp, comp[a] + band_us, side="right")
            return pa.table(
                {
                    "anchor_id": pa.array(ids[a], pa.int64()),
                    "n_in_band": pa.array((hi_pos - lo_pos).astype(np.int64)),
                }
            )
        ends = np.concatenate([starts[1:], [n]])
        out_id: list[np.ndarray] = []
        out_n: list[np.ndarray] = []
        for lo, hi in zip(starts.tolist(), ends.tolist()):
            a = np.nonzero(is_a[lo:hi])[0]
            if len(a) == 0:
                continue
            t = ts[lo:hi]
            a_ts = t[a]
            lo_pos = np.searchsorted(t, a_ts, side=side)
            hi_pos = np.searchsorted(t, a_ts + band_us, side="right")
            out_id.append(ids[lo:hi][a])
            out_n.append((hi_pos - lo_pos).astype(np.int64))
        if not out_id:
            return pa.table(
                {"anchor_id": pa.array([], pa.int64()),
                 "n_in_band": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "anchor_id": pa.array(np.concatenate(out_id), pa.int64()),
                "n_in_band": pa.array(np.concatenate(out_n), pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow", zero_copy_batch=True)
    )
