"""ES nested-documents op (ops/nested.py): build parity, the
nested-vs-flattened distinction, stats and reverse_nested — all vs a
per-row pandas brute force on a seeded synthetic events table."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from elasticsearch_assets_ray.ops.nested import (
    flattened_not_nested,
    nest_events,
    nested_match,
    nested_stats,
    reverse_nested_counts,
)

TYPES = ["click", "view", "purchase", "error"]


@pytest.fixture(scope="module")
def events_df():
    rng = np.random.RandomState(7)
    n = 4000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 80, n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.randint(0, 10**6, n) * 1000, unit="ms", utc=False
        ).astype("datetime64[us]"),
        "event_type": [TYPES[i] for i in rng.randint(0, 4, n)],
        "value": np.round(rng.uniform(0, 400, n), 2),
    })
    return df


@pytest.fixture(scope="module")
def nested_ds(events_df):
    ds = rd.from_arrow(pa.Table.from_pandas(events_df))
    return nest_events(ds, n_buckets=8).materialize()


def test_nest_events_structure(events_df, nested_ds):
    t = nested_ds.to_arrow_refs()
    import ray

    tab = pa.concat_tables([ray.get(r) for r in t])
    users = tab.column("user_id").to_numpy()
    # one parent row per user, all users present
    assert sorted(users) == sorted(events_df["user_id"].unique())
    n_ev = dict(zip(users, tab.column("n_events").to_numpy()))
    want = events_df.groupby("user_id").size().to_dict()
    assert n_ev == want
    # elements in (ts, event_id) order within each parent, values exact
    flat = tab.column("events").combine_chunks().flatten()
    off = np.zeros(len(users) + 1, dtype=np.int64)
    off[1:] = np.cumsum(tab.column("n_events").to_numpy())
    ids = flat.field("event_id").to_numpy()
    ts = flat.field("ts").to_numpy()
    vu = flat.field("value_u").to_numpy()
    by_id_v = dict(zip(events_df["event_id"],
                       np.round(events_df["value"] * 1e6).astype(np.int64)))
    for i, u in enumerate(users):
        s, e = off[i], off[i + 1]
        pairs = list(zip(ts[s:e], ids[s:e]))
        assert pairs == sorted(pairs), u
        g = events_df[events_df.user_id == u]
        assert set(ids[s:e]) == set(g["event_id"])
        assert all(vu[j] == by_id_v[ids[j]] for j in range(s, e))


CONDS = [("event_type", "==", "purchase"), ("value_u", ">=", 250_000_000)]


def _brute(events_df):
    df = events_df.copy()
    df["value_u"] = np.round(df["value"] * 1e6).astype(np.int64)
    hit = df[(df.event_type == "purchase") & (df.value_u >= 250_000_000)]
    return df, hit


def test_nested_match_brute(events_df, nested_ds):
    df, hit = _brute(events_df)
    want = sorted(hit["user_id"].unique())
    got = nested_match(nested_ds, CONDS).to_pandas()
    assert sorted(got["user_id"]) == want
    assert set(got.columns) == {"user_id", "n_events"}


def test_flattened_not_nested_brute(events_df, nested_ds):
    df, hit = _brute(events_df)
    has_p = set(df[df.event_type == "purchase"]["user_id"])
    has_v = set(df[df.value_u >= 250_000_000]["user_id"])
    nested = set(hit["user_id"])
    want = sorted((has_p & has_v) - nested)
    got = flattened_not_nested(nested_ds, CONDS).to_pandas()
    assert sorted(got["user_id"]) == want
    assert len(want) > 0  # the distinction is non-degenerate here


def test_nested_stats_brute(events_df, nested_ds):
    df, hit = _brute(events_df)
    want = hit.groupby("user_id").agg(
        n_matching=("value_u", "size"), sum_value_u=("value_u", "sum")
    )
    got = nested_stats(nested_ds, CONDS).to_pandas().set_index("user_id")
    assert sorted(got.index) == sorted(want.index)
    for u in want.index:
        assert got.loc[u, "n_matching"] == want.loc[u, "n_matching"]
        assert got.loc[u, "sum_value_u"] == want.loc[u, "sum_value_u"]


def test_reverse_nested_brute(events_df, nested_ds):
    df, _ = _brute(events_df)
    m = df[df.value_u >= 250_000_000]
    want = m.groupby("event_type")["user_id"].nunique().to_dict()
    got = reverse_nested_counts(
        nested_ds, key_field="event_type",
        conds=[("value_u", ">=", 250_000_000)],
    ).to_pandas()
    assert dict(zip(got["key"], got["doc_count"])) == want
