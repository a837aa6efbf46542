"""EQL sequence queries (ops/eql.py): brute-force parity on synthetic
streams (incl. key-collision buckets, equal-timestamp strictness, empty
steps, maxspan cuts).  The DuckDB-oracle twin runs via the
eql_sequence contract pipeline."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from elasticsearch_assets_ray.ops.eql import eql_sequence, type_is


def _brute(rows, steps, maxspan=None):
    """Anchor-chaining reference: earliest next match per step."""
    out = []
    by_key: dict = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"])):
        by_key.setdefault(r["user_id"], []).append(r)
    for key, evs in by_key.items():
        for a in [e for e in evs if e["event_type"] == steps[0]]:
            chain, t = [a], a["ts"]
            ok = True
            for st in steps[1:]:
                nxt = [e for e in evs if e["event_type"] == st
                       and e["ts"] > t]
                if not nxt:
                    ok = False
                    break
                e = min(nxt, key=lambda e: e["ts"])
                chain.append(e)
                t = e["ts"]
            if ok and (maxspan is None
                       or chain[-1]["ts"] - chain[0]["ts"] <= maxspan):
                out.append(tuple(e["event_id"] for e in chain))
    return sorted(out)


def _mk_rows(n=600, keys=17, seed=3):
    rng = np.random.default_rng(seed)
    types = ["view", "click", "purchase", "error"]
    rows = []
    for i in range(n):
        rows.append({
            "event_id": i,
            # keys straddle bucket boundaries (64-bucket exchange):
            # include ids 64 apart that share a bucket
            "user_id": int(rng.integers(0, keys)) * 64 + int(
                rng.integers(0, 2)) * 0,
            "ts": int(rng.integers(0, 1_000_000)),
            "event_type": types[int(rng.integers(0, 4))],
        })
    return rows


def _ds(rows):
    t = pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "ts": pa.array([r["ts"] for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r["event_type"] for r in rows]),
    })
    return rd.from_arrow(t)


def _got(ds, steps, maxspan=None):
    import ray

    parts = ray.get(eql_sequence(
        ds, [type_is(s) for s in steps], maxspan_us=maxspan
    ).to_arrow_refs())
    tbl = pa.concat_tables([p for p in parts if p.num_rows >= 0])
    cols = [c for c in tbl.column_names if c.startswith("step")]
    return sorted(
        tuple(int(tbl.column(c)[i].as_py()) for c in sorted(cols))
        for i in range(tbl.num_rows)
    )


def test_eql_two_and_three_steps_brute_parity(ray_session):
    rows = _mk_rows()
    ds = _ds(rows)
    for steps in (["view", "click"], ["view", "click", "purchase"]):
        got = _got(ds, steps)
        want = _brute(rows, steps)
        assert got == want, steps


def test_eql_maxspan_cut(ray_session):
    rows = _mk_rows(seed=5)
    ds = _ds(rows)
    full = _got(ds, ["view", "purchase"])
    cut = _got(ds, ["view", "purchase"], maxspan=50_000)
    want = _brute(rows, ["view", "purchase"], maxspan=50_000)
    assert cut == want
    assert set(cut) <= set(full) and len(cut) < len(full)


def test_eql_equal_ts_is_strict(ray_session):
    rows = [
        {"event_id": 0, "user_id": 1, "ts": 100, "event_type": "view"},
        {"event_id": 1, "user_id": 1, "ts": 100, "event_type": "click"},
        {"event_id": 2, "user_id": 1, "ts": 101, "event_type": "click"},
        {"event_id": 3, "user_id": 2, "ts": 100, "event_type": "view"},
    ]
    got = _got(_ds(rows), ["view", "click"])
    # the equal-ts click (id 1) is NOT strictly later — chains to id 2;
    # user 2 has no click at all
    assert got == [(0, 2)]


def test_eql_empty_step_and_validation(ray_session):
    rows = _mk_rows(n=60, seed=7)
    ds = _ds(rows)
    assert _got(ds, ["view", "signup"]) == []  # no signup events
    with pytest.raises(ValueError):
        eql_sequence(ds, [type_is("view")])


def _brute_until(rows, steps, until):
    """Anchor chains killed by an until event strictly inside the
    (anchor, completion) window."""
    base = _brute(rows, steps)
    by_key = {}
    for r in rows:
        if r["event_type"] == until:
            by_key.setdefault(r["user_id"], []).append(r["ts"])
    ids = {r["event_id"]: r for r in rows}
    out = []
    for chain in base:
        first, last = ids[chain[0]], ids[chain[-1]]
        uts = by_key.get(first["user_id"], [])
        if not any(first["ts"] < u < last["ts"] for u in uts):
            out.append(chain)
    return out


def test_eql_until_kills_pending(ray_session):
    rows = _mk_rows(seed=13)
    ds = _ds(rows)
    import ray

    from elasticsearch_assets_ray.ops.eql import type_is as ti

    parts = ray.get(eql_sequence(
        ds, [ti("view"), ti("purchase")], until=ti("error")
    ).to_arrow_refs())
    tbl = pa.concat_tables([p for p in parts if p.num_rows >= 0])
    got = sorted(
        (int(tbl.column("step0_id")[i].as_py()),
         int(tbl.column("step1_id")[i].as_py()))
        for i in range(tbl.num_rows)
    )
    want = _brute_until(rows, ["view", "purchase"], "error")
    assert got == want
    full = _got(ds, ["view", "purchase"])
    assert set(got) < set(full)  # until really killed some


def test_eql_multi_key_by(ray_session):
    # same user, two "sessions": sequence must not chain across them
    rows = []
    for i, (sess, et, t) in enumerate([
        (1, "view", 10), (2, "click", 20),   # cross-session: no chain
        (1, "click", 30),
        (2, "view", 40), (2, "click", 50),
    ]):
        rows.append({"event_id": i, "user_id": 7, "session": sess,
                     "ts": t, "event_type": et})
    t = pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "session": pa.array([r["session"] for r in rows], pa.int64()),
        "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r["event_type"] for r in rows]),
    })
    import ray

    parts = ray.get(eql_sequence(
        rd.from_arrow(t), [type_is("view"), type_is("click")],
        key_col=["user_id", "session"],
    ).to_arrow_refs())
    tbl = pa.concat_tables([p for p in parts if p.num_rows >= 0])
    pairs = sorted(
        (int(tbl.column("step0_id")[i].as_py()),
         int(tbl.column("step1_id")[i].as_py()))
        for i in range(tbl.num_rows)
    )
    assert pairs == [(0, 2), (3, 4)]


def test_eql_sample_earliest_per_step(ray_session):
    from elasticsearch_assets_ray.ops.eql import eql_sample

    rows = _mk_rows(seed=21)
    ds = _ds(rows)
    import ray

    parts = ray.get(eql_sample(
        ds, [type_is("view"), type_is("error")]
    ).to_arrow_refs())
    tbl = pa.concat_tables([p for p in parts if p.num_rows >= 0])
    got = sorted(
        (int(tbl.column("key")[i].as_py()),
         int(tbl.column("step0_id")[i].as_py()),
         int(tbl.column("step1_id")[i].as_py()))
        for i in range(tbl.num_rows)
    )
    # brute: earliest (ts, id) per step per key, keys having both
    want = []
    keys = {r["user_id"] for r in rows}
    for k in sorted(keys):
        picks = []
        ok = True
        for et in ("view", "error"):
            evs = [r for r in rows
                   if r["user_id"] == k and r["event_type"] == et]
            if not evs:
                ok = False
                break
            picks.append(min(evs, key=lambda r: (r["ts"], r["event_id"]))
                         ["event_id"])
        if ok:
            want.append((k, picks[0], picks[1]))
    assert got == sorted(want) and len(got) > 0