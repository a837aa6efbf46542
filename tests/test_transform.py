"""ES transforms (ops/transform.py): incremental checkpoint ≡ cold run,
append-only guard, spec fingerprint guard, no-op checkpoints, latest
argmax determinism.  The DuckDB oracle twins run via the
``transform_pivot`` / ``transform_latest`` contract pipelines."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.ops.transform import (
    latest_transform,
    pivot_transform,
    render_latest,
    render_pivot,
)

AGGS = {
    "n": (None, "count"),
    "s": ("v", "sum_e6"),
    "lo": ("v", "min"),
    "hi": ("v", "max"),
    "m": ("v", "avg_e6"),
}


def _write_events(d, n, seed, start_id=0):
    rng = np.random.default_rng(seed)
    tbl = pa.table({
        "event_id": pa.array(
            np.arange(start_id, start_id + n, dtype=np.int64)
        ),
        "k": pa.array(rng.choice(["a", "b", "c"], n)),
        "v": pa.array(np.round(rng.uniform(0, 10, n), 2)),
        "ts": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
    })
    pq.write_table(tbl, d)
    return tbl


def test_pivot_incremental_equals_cold(tmp_path, ray_session):
    f1, f2 = tmp_path / "a.parquet", tmp_path / "b.parquet"
    t1 = _write_events(f1, 300, 1)
    t2 = _write_events(f2, 200, 2, start_id=300)

    # cold: both files in one checkpoint
    cold = tmp_path / "cold"
    r = pivot_transform([f1, f2], cold, ["k"], AGGS)
    assert r["new_files"] == 2
    want = render_pivot(cold, ["k"], AGGS)

    # incremental: two checkpoints
    inc = tmp_path / "inc"
    assert pivot_transform([f1], inc, ["k"], AGGS)["new_files"] == 1
    mid = render_pivot(inc, ["k"], AGGS)
    assert pivot_transform([f1, f2], inc, ["k"], AGGS)["new_files"] == 1
    got = render_pivot(inc, ["k"], AGGS)
    assert got.equals(want)  # bit-identical (integer partials)
    assert not mid.equals(want)

    # brute check against pandas
    import pandas as pd

    df = pa.concat_tables([t1, t2]).to_pandas()
    df["u"] = np.rint(df.v.to_numpy() * 1e6).astype(np.int64)
    g = df.groupby("k")
    gp = got.to_pandas().set_index("k")
    for k, sub in g:
        assert gp.loc[k, "n"] == len(sub)
        assert gp.loc[k, "s"] == sub.u.sum()
        assert gp.loc[k, "lo"] == sub.v.min()
        assert gp.loc[k, "hi"] == sub.v.max()
        assert gp.loc[k, "m"] == sub.u.sum() / len(sub)

    # no-op checkpoint
    assert pivot_transform([f1, f2], inc, ["k"], AGGS)["new_files"] == 0
    assert render_pivot(inc, ["k"], AGGS).equals(want)


def test_pivot_guards(tmp_path, ray_session):
    f1 = tmp_path / "a.parquet"
    _write_events(f1, 50, 3)
    dest = tmp_path / "t"
    pivot_transform([f1], dest, ["k"], AGGS)
    # spec change → explicit reset required
    with pytest.raises(ValueError, match="spec changed"):
        pivot_transform([f1], dest, ["k"], {"n": (None, "count")})
    # mutated input → append-only violation
    _write_events(f1, 60, 4)
    with pytest.raises(ValueError, match="append-only"):
        pivot_transform([f1], dest, ["k"], AGGS)
    with pytest.raises(ValueError, match="unknown agg fn"):
        pivot_transform([f1], tmp_path / "x", ["k"], {"b": ("v", "sum")})


def test_latest_incremental_and_ties(tmp_path, ray_session):
    f1, f2 = tmp_path / "a.parquet", tmp_path / "b.parquet"
    t1 = _write_events(f1, 250, 5)
    t2 = _write_events(f2, 250, 6, start_id=250)

    cold = tmp_path / "cold"
    latest_transform([f1, f2], cold, key="k", sort_on="ts",
                     fields=["v"], tie_on="event_id")
    want = render_latest(cold, "k", ["v"])

    inc = tmp_path / "inc"
    latest_transform([f1], inc, key="k", sort_on="ts",
                     fields=["v"], tie_on="event_id")
    latest_transform([f1, f2], inc, key="k", sort_on="ts",
                     fields=["v"], tie_on="event_id")
    got = render_latest(inc, "k", ["v"])
    assert got.equals(want)

    # brute: argmax by (ts, event_id) per key — ts collisions are
    # guaranteed at 500 rows over 1000 distinct ts values
    import pandas as pd

    df = pa.concat_tables([t1, t2]).to_pandas()
    win = df.sort_values(["ts", "event_id"]).groupby("k").tail(1)
    win = win.sort_values("k")
    gp = got.to_pandas()
    assert list(gp["k"]) == list(win["k"])
    assert np.allclose(gp["_sort"].to_numpy(),
                       win["ts"].to_numpy().astype(float))
    assert np.allclose(gp["v"].to_numpy(), win["v"].to_numpy())
