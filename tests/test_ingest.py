"""ES ingest pipelines (ops/ingest.py): per-processor kernels,
conditional `if` merge semantics, drop, list append interleave, dissect,
and a full chained simulate.  The SQL-oracle twin runs via the
ingest_pipeline contract pipeline."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from elasticsearch_assets_ray.ops.ingest import IngestPipeline


def _docs():
    return pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "lang": pa.array(["EN ", "de", "FR", "de"]),
        "text": pa.array(["a-b", "c-d", "e-f", "g-h"]),
        "n": pa.array([10, 20, 30, 40], pa.int64()),
        "tags": pa.array([["x"], [], ["y", "z"], ["w"]]),
    })


def test_core_processors():
    p = IngestPipeline([
        {"trim": {"field": "lang"}},
        {"lowercase": {"field": "lang"}},
        {"gsub": {"field": "text", "pattern": "-", "replacement": "_"}},
        {"set": {"field": "source", "value": "ingest"}},
        {"rename": {"field": "n", "target_field": "count"}},
        {"convert": {"field": "count", "type": "double"}},
        {"script": {"source": "count * 2 + 1", "target_field": "c2"}},
        {"split": {"field": "text", "separator": "_",
                   "target_field": "parts"}},
        {"append": {"field": "tags", "value": "added"}},
    ])
    out = p.simulate(_docs())
    assert out.column("lang").to_pylist() == ["en", "de", "fr", "de"]
    assert out.column("text").to_pylist() == ["a_b", "c_d", "e_f", "g_h"]
    assert out.column("source").to_pylist() == ["ingest"] * 4
    assert "n" not in out.column_names
    assert out.column("c2").to_pylist() == [21.0, 41.0, 61.0, 81.0]
    assert out.column("parts").to_pylist() == [
        ["a", "b"], ["c", "d"], ["e", "f"], ["g", "h"]
    ]
    assert out.column("tags").to_pylist() == [
        ["x", "added"], ["added"], ["y", "z", "added"], ["w", "added"]
    ]


def test_conditional_if_merges_rows():
    p = IngestPipeline([
        {"uppercase": {"field": "text", "if": "lang:de"}},
        {"set": {"field": "flag", "value": 1, "if": "n:>=30"}},
    ])
    out = p.simulate(_docs())
    assert out.column("text").to_pylist() == ["a-b", "C-D", "e-f", "G-H"]
    assert out.column("flag").to_pylist() == [None, None, 1, 1]
    # no-match condition leaves the batch untouched
    out2 = IngestPipeline(
        [{"uppercase": {"field": "text", "if": "lang:xx"}}]
    ).simulate(_docs())
    assert out2.column("text").to_pylist() == ["a-b", "c-d", "e-f", "g-h"]


def test_drop_and_dissect():
    p = IngestPipeline([
        {"drop": {"if": "lang:de"}},
        {"dissect": {"field": "text", "pattern": "%{left}-%{right}"}},
    ])
    out = p.simulate(_docs())
    assert out.num_rows == 2
    assert out.column("left").to_pylist() == ["a", "e"]
    assert out.column("right").to_pylist() == ["b", "f"]


def test_date_and_json():
    t = pa.table({
        "ts": pa.array(["2024-03-01T10:00:00", "2024-03-02T11:30:00"]),
        "props": pa.array(['{"k": 1}', '{"k": 2}']),
    })
    p = IngestPipeline([
        {"date": {"field": "ts", "target_field": "ts_parsed"}},
        {"json": {"field": "props", "target_field": "obj"}},
    ])
    out = p.simulate(t)
    assert str(out.column("ts_parsed").type).startswith("timestamp")
    assert out.column("obj").to_pylist() == [{"k": 1}, {"k": 2}]


def test_streams_through_map_batches(ray_session):
    import ray

    p = IngestPipeline([
        {"lowercase": {"field": "lang"}},
        {"drop": {"if": "lang:fr"}},
    ])
    ds = rd.from_arrow(_docs()).map_batches(
        p, batch_format="pyarrow", zero_copy_batch=True
    )
    parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    out = pa.concat_tables(parts)
    assert out.num_rows == 3 and "fr" not in out.column("lang").to_pylist()


def test_unknown_processor_rejected():
    with pytest.raises(ValueError):
        IngestPipeline([{"nope": {}}])
