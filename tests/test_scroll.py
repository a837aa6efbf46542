"""PIT + sliced scroll (search/scroll.py): slice disjointness/union,
page order + cursor resume, and snapshot isolation under
delete_by_query / update_by_query."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray

from elasticsearch_assets_ray.index.build import build_index
from elasticsearch_assets_ray.index.byquery import delete_by_query, update_by_query
from elasticsearch_assets_ray.search.scroll import (
    PointInTime,
    pit_export,
    scroll_pages,
)

from tests.test_byquery import CFG, _mk_corpus


def _tbl(ds) -> pa.Table:
    parts = ray.get(ds.to_arrow_refs())
    parts = [p for p in parts if p.num_rows]
    return pa.concat_tables(parts) if parts else None


@pytest.fixture(scope="module")
def built(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("scroll")
    src = _mk_corpus(str(root / "src"), n=240, files=3)
    idx = str(root / "idx")
    build_index(src, idx, CFG)
    return src, idx


def test_slices_disjoint_union_ordered(built):
    src, idx = built
    pit = PointInTime(idx)
    full = _tbl(pit_export(pit))
    assert full.num_rows == pit.live_count() == 240
    ids = full.column("_doc").to_numpy()
    seen = []
    for s in range(3):
        part = _tbl(pit_export(pit, slice_id=s, slice_max=3))
        sv = part.column("doc_id").to_numpy()
        assert (sv % 3 == s).all()
        seen.append(part)
    u = pa.concat_tables(seen)
    assert u.num_rows == full.num_rows
    assert set(u.column("_doc").to_pylist()) == set(ids.tolist())


def test_query_filter_and_columns(built):
    src, idx = built
    pit = PointInTime(idx)
    t = _tbl(pit_export(pit, query="lang:de", columns=["lang"]))
    assert set(t.column_names) == {"lang", "_doc"}
    assert set(t.column("lang").to_pylist()) == {"de"}


def test_scroll_pages_order_and_resume(built):
    src, idx = built
    pit = PointInTime(idx)
    pages = list(scroll_pages(pit, batch_size=37))
    assert all(p.num_rows == 37 for p in pages[:-1])
    allids = np.concatenate([p.column("_doc").to_numpy() for p in pages])
    assert (np.diff(allids) > 0).all() and len(allids) == 240
    # resume from a mid-stream cursor reproduces the tail exactly
    cursor = int(pages[2].column("_doc")[-1].as_py())
    resumed = list(scroll_pages(pit, batch_size=37, after=cursor))
    tail = np.concatenate([p.column("_doc").to_numpy() for p in resumed])
    assert tail.tolist() == allids[3 * 37:].tolist()


def test_pit_snapshot_isolation(built, tmp_path):
    src, idx = built
    pit = PointInTime(idx)
    before = _tbl(pit_export(pit, columns=["doc_id", "lang", "text"]))
    n_de = pc.sum(pc.equal(before.column("lang"), "de")).as_py()

    delete_by_query(idx, query="lang:de")

    def relabel(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index("lang"), "lang",
            pa.array(["uu"] * t.num_rows),
        )

    update_by_query(src, idx, query="lang:fr", transform=relabel,
                    tag="iso", config=CFG)

    # the OPEN pit still sees the pre-op world, byte-identical
    again = _tbl(pit_export(pit, columns=["doc_id", "lang", "text"]))
    assert again.equals(before)
    # a FRESH pit sees deletes applied and updates relabeled
    pit2 = PointInTime(idx)
    assert pit2.pit_id != pit.pit_id
    now = _tbl(pit_export(pit2, columns=["lang"]))
    langs = set(now.column("lang").to_pylist())
    assert "de" not in langs and "fr" not in langs and "uu" in langs
    assert now.num_rows == before.num_rows - n_de
