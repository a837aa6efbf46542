"""Sequence packing (ops/packing.py): token-count kernel parity,
concat-and-chunk exactness vs a pure-python reference, the id-order
contract check, and greedy-bin properties.  The SQL-oracle twin of the
concat form runs via the pack_chunks contract pipeline."""

import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.ops.packing import (
    pack_concat_chunk,
    pack_greedy_bins,
    token_counts_arrow,
)


def _ref_count(text: str) -> int:
    return len([t for t in re.split(r"[^a-z0-9]+", text.lower())
                if t and len(t) <= 64])


def test_token_counts_kernel_matches_reference():
    texts = ["Hello, World!", "", "a" * 70 + " ok", "x1 y2 z3",
             "ALL-CAPS and_underscores", "日本語 mixed ascii42"]
    got = token_counts_arrow(pa.array(texts))
    assert got.tolist() == [_ref_count(t) for t in texts]


@pytest.fixture()
def corpus_files(tmp_path):
    rng = np.random.default_rng(21)
    files, next_id = [], 0
    texts_by_id = {}
    for fi in range(3):
        n = 40
        ids = np.arange(next_id, next_id + n, dtype=np.int64)
        next_id += n
        texts = [
            " ".join(f"w{rng.integers(0, 50)}"
                     for _ in range(rng.integers(0, 30)))
            for _ in range(n)
        ]
        for i, t in zip(ids, texts):
            texts_by_id[int(i)] = t
        p = tmp_path / f"part-{fi:03d}.parquet"
        # shuffle row order INSIDE the file — in-file order must not
        # matter (the op re-sorts by id)
        perm = rng.permutation(n)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids[perm]),
                      "text": pa.array([texts[j] for j in perm])}),
            p,
        )
        files.append(str(p))
    return files, texts_by_id


def test_pack_concat_chunk_exact(corpus_files, ray_session):
    files, texts = corpus_files
    C = 57
    got = pack_concat_chunk(files, C).to_pandas().sort_values("doc_id")
    # python reference: one global stream in id order
    off = 0
    for _, r in got.iterrows():
        n = _ref_count(texts[r.doc_id])
        assert r.n_tok == n
        assert r.start_tok == off
        assert r.first_chunk == off // C
        assert r.last_chunk == max(off + n - 1, off) // C
        off += n
    assert len(got) == len(texts)


def test_pack_concat_chunk_rejects_unordered_files(corpus_files,
                                                   ray_session):
    files, _ = corpus_files
    with pytest.raises(ValueError):
        pack_concat_chunk(list(reversed(files)), 64)
    with pytest.raises(ValueError):
        pack_concat_chunk(files, 0)


def test_pack_greedy_bins_properties(corpus_files, ray_session):
    files, texts = corpus_files
    C = 60
    got = pack_greedy_bins(files, C).to_pandas()
    assert len(got) == len(texts)
    assert got.doc_id.is_unique
    # capacity respected except oversize singletons; bins never span files
    for bin_id, grp in got.groupby("bin_id"):
        tot = grp.n_tok.sum()
        if tot > C:
            assert len(grp) == 1  # oversize singleton
        assert (grp.doc_id // 40).nunique() == 1  # 40 docs per file
        assert (bin_id >> 32) == (grp.doc_id // 40).iloc[0]
    # determinism
    again = pack_greedy_bins(files, C).to_pandas()
    assert got.sort_values("doc_id").reset_index(drop=True).equals(
        again.sort_values("doc_id").reset_index(drop=True))
    # packing does something: fewer bins than docs
    assert got.bin_id.nunique() < len(got)