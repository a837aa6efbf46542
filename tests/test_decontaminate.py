"""Benchmark decontamination (ops/decontaminate.py): exact n-gram
membership semantics, short-doc / empty-benchmark edges, distinctness.
The DuckDB oracle twin runs via the ``decontaminate`` contract
pipeline."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from elasticsearch_assets_ray.ops.decontaminate import (
    Decontaminator,
    benchmark_ngrams,
    decontaminate,
)


def _bench():
    return pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": pa.array([
            "the quick brown fox",
            "pack my box with",
        ]),
    })


def test_benchmark_ngrams_sorted_distinct():
    g = benchmark_ngrams(_bench(), n=3)
    assert list(g) == sorted(set(g))
    assert "the quick brown" in g and "quick brown fox" in g
    assert "pack my box" in g and "my box with" in g
    assert len(g) == 4
    # short benchmark rows contribute nothing
    assert len(benchmark_ngrams(
        pa.table({"doc_id": [1], "text": ["two words"]}), n=3
    )) == 0


def test_decontaminator_counts_and_edges():
    grams = benchmark_ngrams(_bench(), n=3)
    st = Decontaminator(grams, n=3)
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            # contains one benchmark gram, repeated (distinct count = 1)
            "see the quick brown fox, the quick brown dog",
            "nothing shared here at all",
            "tiny doc",                         # < n tokens
            "pack my box with the quick brown fox jumps",  # 3 hits
        ]),
    })
    out = st(batch)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    # hits: "the quick brown" + "quick brown fox" (distinct, repeats
    # counted once)
    assert rows[0]["n_hits"] == 2 and rows[0]["contaminated"]
    # "see the quick brown fox the quick brown dog" distinct 3-grams:
    # 7 windows, "the quick brown" repeats → 6 distinct
    assert rows[0]["n_grams"] == 6
    assert rows[1]["n_hits"] == 0 and not rows[1]["contaminated"]
    assert rows[1]["n_grams"] == 3
    assert rows[2]["n_grams"] == 0 and rows[2]["n_hits"] == 0
    assert not rows[2]["contaminated"]
    # doc3 grams hitting: "pack my box", "my box with",
    # "the quick brown", "quick brown fox" → 4 hits
    assert rows[3]["n_hits"] == 4 and rows[3]["contaminated"]


def test_decontaminate_dataset_and_empty_benchmark(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(6, dtype=np.int64)),
        "text": pa.array([
            "the quick brown fox jumps", "alpha beta gamma delta",
            "pack my box with care", "x", "alpha beta", "quick brown fox",
        ]),
    }))
    out = decontaminate(ds, _bench(), n=3, concurrency=2, batch_size=2)
    tbl = out.to_pandas().set_index("doc_id").sort_index()
    assert len(tbl) == 6
    assert bool(tbl.loc[0, "contaminated"]) and tbl.loc[0, "n_hits"] == 2
    assert tbl.loc[2, "n_hits"] == 2  # pack my box / my box with
    assert tbl.loc[5, "n_hits"] == 1  # quick brown fox
    assert not tbl.loc[1, "contaminated"]
    assert tbl.loc[3, "n_grams"] == 0
    # empty benchmark → nothing contaminated, counts still reported
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    out2 = decontaminate(ds, empty, n=3).to_pandas()
    assert not out2["contaminated"].any()
    assert out2["n_grams"].sum() == tbl["n_grams"].sum()
