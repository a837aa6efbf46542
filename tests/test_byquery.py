"""ES bulk data-plane ops (index/byquery.py): _reindex resume +
byte-identity, _delete_by_query search parity and idempotence,
_update_by_query append+tombstone semantics and post-compaction
equivalence to a cold build of the logical corpus."""

import glob
import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.config import IndexConfig
from elasticsearch_assets_ray.index.build import IndexInfo, build_index
from elasticsearch_assets_ray.index.byquery import (
    delete_by_query,
    match_meta_ids,
    reindex,
    update_by_query,
)
from elasticsearch_assets_ray.index.compact import compact_index
from elasticsearch_assets_ray.search.engine import QueryEngine

LANGS = ["en", "de", "fr"]
WORDS = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "kappa"]


def _mk_corpus(path, n=240, files=3, seed=11):
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    rng = np.random.default_rng(seed)
    per = n // files
    for f in range(files):
        ids = np.arange(f * per, (f + 1) * per, dtype=np.int64)
        t = pa.table({
            "doc_id": pa.array(ids),
            "lang": pa.array([LANGS[int(rng.integers(0, 3))] for _ in ids]),
            "text": pa.array([
                " ".join(WORDS[int(rng.integers(0, len(WORDS)))]
                         for _ in range(12))
                for _ in ids
            ]),
        })
        pq.write_table(t, f"{path}/docs-{f:03d}.parquet")
    return path


CFG = IndexConfig(
    analyzer="simple", text_col="text", lang_col=None, id_col="doc_id",
    meta_cols=("lang",), partition_target_docs=40,
    shard_target_docs=80,
)


def _engine_rows(idx, q, k=500):
    eng = QueryEngine(idx, num_actors=2)
    got = eng.search(q, k=k)
    # map internal doc -> orig_id
    metas = pa.concat_tables([
        pq.read_table(f, columns=["doc_id", "orig_id"])
        for f in sorted(glob.glob(f"{idx}/docmeta/*.parquet"))
    ])
    o = dict(zip(metas.column("doc_id").to_pylist(),
                 metas.column("orig_id").to_pylist()))
    return [(o[d], round(s, 9)) for d, s in got]


def test_reindex_filter_transform_resume(ray_session, tmp_path):
    src = _mk_corpus(str(tmp_path / "src"))
    dest = str(tmp_path / "dest")

    def upper_lang(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index("lang"), "lang",
            pc.utf8_upper(t.column("lang")),
        )

    r = reindex(src, dest, query="lang:de OR lang:fr",
                transform=upper_lang)
    full = pa.concat_tables([
        pq.read_table(f) for f in sorted(glob.glob(f"{src}/*.parquet"))
    ])
    n_want = pc.sum(pc.is_in(
        full.column("lang"), value_set=pa.array(["de", "fr"])
    )).as_py()
    assert r["created"] == n_want and r["resumed_files"] == 0
    got = pa.concat_tables([
        pq.read_table(f) for f in sorted(glob.glob(f"{dest}/*.parquet"))
    ])
    assert got.num_rows == n_want
    assert set(got.column("lang").to_pylist()) == {"DE", "FR"}
    hashes = {
        f: hashlib.sha256(open(f, "rb").read()).hexdigest()
        for f in sorted(glob.glob(f"{dest}/*.parquet"))
    }
    # crash-resume: drop one output, re-run, byte-identical
    victim = sorted(hashes)[1]
    os.remove(victim)
    r2 = reindex(src, dest, query="lang:de OR lang:fr",
                 transform=upper_lang)
    assert r2["created"] == n_want and r2["resumed_files"] == len(hashes) - 1
    for f, h in hashes.items():
        assert hashlib.sha256(open(f, "rb").read()).hexdigest() == h


def test_delete_by_query_parity_and_idempotence(ray_session, tmp_path):
    src = _mk_corpus(str(tmp_path / "src"))
    idx = str(tmp_path / "idx")
    build_index(src, idx, CFG)
    before = _engine_rows(idx, "alpha beta")
    de_ids = set(match_meta_ids(idx, "lang:de").tolist())
    r = delete_by_query(idx, query="lang:de")
    assert r["deleted"] == len(de_ids) > 0
    # mask-at-query-time: surviving ranking == full ranking minus victims
    # (scores unchanged — df/N still count tombstoned docs, Lucene-style)
    metas = pa.concat_tables([
        pq.read_table(f, columns=["doc_id", "orig_id"])
        for f in sorted(glob.glob(f"{idx}/docmeta/*.parquet"))
    ])
    dead_orig = {
        o for d, o in zip(metas.column("doc_id").to_pylist(),
                          metas.column("orig_id").to_pylist())
        if d in de_ids
    }
    after = _engine_rows(idx, "alpha beta")
    assert after == [(o, s) for o, s in before if o not in dead_orig]
    # idempotent: same query deletes nothing further
    r2 = delete_by_query(idx, query="lang:de")
    assert r2["deleted"] == 0
    assert _engine_rows(idx, "alpha beta") == after


def test_update_by_query_append_tombstone_compact(ray_session, tmp_path):
    src = _mk_corpus(str(tmp_path / "src"))
    idx = str(tmp_path / "idx")
    build_index(src, idx, CFG)
    n_fr = len(match_meta_ids(idx, "lang:fr"))

    def add_sentinel(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index("text"), "text",
            pc.binary_join_element_wise(
                t.column("text"), "zzsentinel", " "
            ),
        )

    r = update_by_query(src, idx, query="lang:fr",
                        transform=add_sentinel, tag="t1", config=CFG)
    assert r["updated"] == n_fr > 0
    # every updated doc is findable; old versions are tombstoned
    hits = _engine_rows(idx, "zzsentinel")
    assert len(hits) == n_fr
    # re-run same tag: fully idempotent (victims already dead, files
    # exist, build no-ops)
    r2 = update_by_query(src, idx, query="lang:fr",
                         transform=add_sentinel, tag="t1", config=CFG)
    assert r2["updated"] == 0
    assert _engine_rows(idx, "zzsentinel") == hits
    # compaction drops the dead versions and refreshes stats: scores
    # equal a COLD build over the logical post-update corpus
    compact_index(idx)
    logical = str(tmp_path / "logical")
    os.makedirs(logical)
    for f in sorted(glob.glob(f"{src}/docs-*.parquet")):
        t = pq.read_table(f)
        m = pc.equal(t.column("lang"), "fr")
        keep = t.filter(pc.invert(m))
        upd = add_sentinel(t.filter(m))
        pq.write_table(pa.concat_tables([keep, upd]),
                       f"{logical}/{os.path.basename(f)}")
    cold = str(tmp_path / "cold_idx")
    build_index(logical, cold, CFG)
    for q in ("zzsentinel", "alpha beta", "omega"):
        assert sorted(_engine_rows(idx, q)) == sorted(_engine_rows(cold, q)), q


def test_update_by_query_second_tag_sees_new_versions(ray_session, tmp_path):
    src = _mk_corpus(str(tmp_path / "src"), n=80, files=2)
    idx = str(tmp_path / "idx")
    build_index(src, idx, CFG)
    n_en = len(match_meta_ids(idx, "lang:en"))

    def relabel(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index("lang"), "lang",
            pa.array(["xx"] * t.num_rows),
        )

    update_by_query(src, idx, query="lang:en", transform=relabel,
                    tag="a", config=CFG)
    # first update relabeled every en doc; a second, different-tag pass
    # over the same query must find NOTHING live (dead originals are
    # excluded — no resurrection)
    r = update_by_query(src, idx, query="lang:en", transform=relabel,
                        tag="b", config=CFG)
    assert r["updated"] == 0
    assert len(match_meta_ids(idx, "lang:xx")) == n_en
