"""Sources layer: lucene-ish query compiler, filtered reads, mock-data
generator chunk planning (reference data-generator spec parity), and
multimodal stage plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from elasticsearch_assets_ray.ops import to_arrow
from elasticsearch_assets_ray.ops.multimodal import (
    DecodeStage,
    FrameSampleStage,
    ResizeStage,
    decode_pipeline,
    make_synthetic_media_batch,
)
from elasticsearch_assets_ray.sources.generator import (
    once_slices,
    persistent_slices,
    read_generated,
)
from elasticsearch_assets_ray.sources.query import QuerySyntaxError, compile_query
from elasticsearch_assets_ray.sources.reader import parse_date, read_filtered


# ------------------------------------------------------------ query compile


def test_compile_query_eval():
    tbl = pa.table(
        {
            "lang": ["en", "de", "fr"],
            "n": [10, 200, 300],
            "src": ["src1a", "src20", "src1b"],
        }
    )
    import pyarrow.dataset as pds

    def rows(q):
        return pds.dataset(tbl).to_table(filter=compile_query(q))["n"].to_pylist()

    assert rows("lang:en") == [10]
    assert rows("lang:en OR lang:de") == [10, 200]
    assert rows("NOT lang:en") == [200, 300]
    assert rows("n:[10 TO 200]") == [10, 200]
    assert rows("n:{10 TO 300}") == [200]
    # mixed brackets: each bound's inclusivity follows its own bracket
    assert rows("n:[10 TO 300}") == [10, 200]
    assert rows("n:{10 TO 200]") == [200]
    assert rows("n:>=200") == [200, 300]
    assert rows("src:src1*") == [10, 300]
    assert rows("src:src1* AND n:>100") == [300]
    assert rows("(lang:en OR lang:fr) NOT src:src1b") == [10]  # implicit AND
    assert rows('lang:"en"') == [10]
    for bad in ["", "lang", "lang:", "n:[1 TO", "AND lang:en", "lang:en )"]:
        with pytest.raises(QuerySyntaxError):
            compile_query(bad)


def test_full_response_envelope(ray_session, tmp_path):
    """full_response attaches the hit-envelope metadata columns
    (reader.js:7,13-14: _index/_type/_version/_id)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_assets_ray.ops import to_arrow
    from elasticsearch_assets_ray.sources.reader import read_filtered

    pq.write_table(
        pa.table({"uid": pa.array([7, 8], pa.int64()),
                  "v": pa.array([1.0, 2.0])}),
        tmp_path / "d.parquet",
    )
    out = to_arrow(read_filtered(
        str(tmp_path / "d.parquet"), fields=["v"], full_response=True,
        index_name="logs-v1", id_field="uid",
    ))
    assert out.column("_index").to_pylist() == ["logs-v1", "logs-v1"]
    assert out.column("_type").to_pylist() == ["_doc", "_doc"]
    assert out.column("_version").to_pylist() == [1, 1]
    assert sorted(out.column("_id").to_pylist()) == ["7", "8"]
    # without full_response: no metadata columns
    plain = to_arrow(read_filtered(str(tmp_path / "d.parquet"), fields=["v"]))
    assert plain.column_names == ["v"]


def test_parse_date_forms():
    import datetime as dt

    assert parse_date("2024-01-10T00:00:00") == dt.datetime(2024, 1, 10)
    assert parse_date("2024-01-10T00:00:00Z") == dt.datetime(2024, 1, 10)
    assert parse_date(1704844800000) == dt.datetime(2024, 1, 10)
    assert parse_date(dt.datetime(2024, 1, 10)) == dt.datetime(2024, 1, 10)
    with pytest.raises(TypeError):
        parse_date(object())


def test_read_filtered_matches_duckdb(ray_session):
    import duckdb

    sf = "/root/testdata/sf0.001"
    got = to_arrow(
        read_filtered(
            f"{sf}/events.parquet",
            start="2024-01-05T00:00:00",
            end="2024-01-15T00:00:00",
            query="value:>=80",
            fields=["event_id"],
        )
    )
    want = duckdb.connect().execute(
        f"""SELECT count(*) FROM read_parquet('{sf}/events.parquet')
            WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-15'
            AND value >= 80"""
    ).fetchone()[0]
    assert got.num_rows == want


# ---------------------------------------------------------------- generator


def test_once_slices_countdown():
    # reference spec: size 15 / chunk 5 → [5],[5],[5],[null]; 13 → [13],[null]
    assert list(once_slices(15, 5)) == [5, 5, 5]
    assert list(once_slices(13, 20)) == [13]
    assert list(once_slices(0, 5)) == []
    it = persistent_slices(550)
    assert [next(it) for _ in range(3)] == [550, 550, 550]


def test_read_generated_deterministic_and_routed(ray_session):
    a = to_arrow(read_generated(120, chunk=50, seed=7)).sort_by("uuid")
    b = to_arrow(read_generated(120, chunk=50, seed=7)).sort_by("uuid")
    assert a.equals(b)
    assert a.num_rows == 120
    forced = to_arrow(read_generated(40, chunk=20, seed=7, id_start_key="a"))
    assert all(i.startswith("a") for i in forced.column("id").to_pylist())
    stress = to_arrow(read_generated(30, chunk=10, seed=7, stress_test=True))
    # stress test repeats one doc per chunk
    assert len(set(stress.column("uuid").to_pylist())) == 3


# --------------------------------------------------------------- multimodal


def test_media_decode_pipeline(ray_session):
    import ray.data as rd

    media = make_synthetic_media_batch(np.arange(40), "image")
    decoded = to_arrow(decode_pipeline(rd.from_arrow(media), concurrency=1))
    assert decoded.num_rows == 40
    # decoded dims equal the typed metadata written at synthesis
    joined = dict(zip(media.column("media_id").to_pylist(), media.column("width").to_pylist()))
    for mid, w in zip(decoded.column("media_id").to_pylist(),
                      decoded.column("decoded_width").to_pylist()):
        assert joined[mid] == w
    resized = ResizeStage(max_side=100)(decoded)
    tw = resized.column("target_width").to_numpy()
    th = resized.column("target_height").to_numpy()
    assert (np.maximum(tw, th) <= 100).all()


def test_media_real_impl_is_stubbed():
    media = make_synthetic_media_batch(np.arange(2))
    with pytest.raises(NotImplementedError):
        DecodeStage(impl="real")(media)
    with pytest.raises(ValueError):
        DecodeStage(impl="nope")


def test_frame_sampling():
    media = make_synthetic_media_batch(np.arange(5), "video")
    out = FrameSampleStage(every_k=10)(media)
    nf = media.column("n_frames").to_numpy()
    want = sum(len(np.arange(0, int(n), 10)) for n in nf)
    assert out.num_rows == want
    assert out.column("frame_idx").to_numpy().max() < nf.max()


def test_bench_cli_help():
    import subprocess, sys
    out = subprocess.run([sys.executable, "bench.py", "--help"],
                         capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0 and "--scaling" in out.stdout
