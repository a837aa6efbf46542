"""Unit tests for the training-data ops (dedup, similarity, text stats),
routing/index-selection operators and the doc-store state storage."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from elasticsearch_assets_ray.ops import to_arrow
from elasticsearch_assets_ray.ops import dedup as dd
from elasticsearch_assets_ray.ops import similarity as sim
from elasticsearch_assets_ray.ops import textstats as ts
from elasticsearch_assets_ray.ops.routing import (
    IndexSelector,
    IndexSelectorConfig,
    parse_connection_map,
    route_batch,
    timeseries_index_name,
)


def _docs_ds(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


# ------------------------------------------------------------------ dedup


def test_exact_dedup_groups_and_survivors():
    ds = _docs_ds(["alpha beta", "gamma", "alpha beta", "alpha beta", "delta"])
    groups = to_arrow(dd.exact_dedup_groups(ds)).to_pylist()
    by_keep = {g["keep_id"]: g["dup_count"] for g in groups}
    assert by_keep == {0: 3, 1: 1, 4: 1}
    survivors = to_arrow(dd.exact_dedup(ds))
    assert sorted(survivors.column("doc_id").to_pylist()) == [0, 1, 4]


def test_jaccard_pairs_exact_values():
    # doc0/doc1 share exactly 3 of their shingles; doc2 is disjoint
    a = "x1 x2 x3 x4 x5 x6"          # shingles: 4
    b = "x1 x2 x3 x4 x5 zz"          # shingles: 4; shared with a: 3
    c = "q1 q2 q3 q4 q5 q6"
    out = dd.jaccard_pairs(_docs_ds([a, b, c]), threshold=0.1).to_pylist()
    assert len(out) == 1
    row = out[0]
    assert (row["doc_a"], row["doc_b"], row["common"]) == (0, 1, 3)
    assert row["jacc"] == 3 / (4 + 4 - 3)


def test_jaccard_shingle_df_cap_drops_hot_shingles():
    texts = ["same same same same"] * 5
    exact = dd.jaccard_pairs(_docs_ds(texts), threshold=0.5)
    assert exact.num_rows == 10  # all pairs, jacc 1.0
    capped = dd.jaccard_pairs(_docs_ds(texts), threshold=0.5, max_shingle_df=2)
    assert capped.num_rows == 0  # hot shingle dropped, disclosed via arg


def test_minhash_finds_near_dups():
    near_a = " ".join(f"w{i}" for i in range(50))
    near_b = " ".join(f"w{i}" for i in range(48)) + " zz yy"
    other = " ".join(f"v{i}" for i in range(50))
    out = dd.minhash_lsh_pairs(_docs_ds([near_a, near_b, other]), threshold=0.4)
    rows = out.to_pylist()
    assert [(r["doc_a"], r["doc_b"]) for r in rows] == [(0, 1)]
    # verified jaccard is exact, matching the direct computation
    ha = dd.doc_shingle_hashes(near_a)
    hb = dd.doc_shingle_hashes(near_b)
    common = len(np.intersect1d(ha, hb))
    assert rows[0]["jacc"] == common / (len(ha) + len(hb) - common)


def test_minhash_spill_path_matches_legacy_verify(tmp_path):
    """The spill-based pipeline (one tokenize pass → parquet spill →
    sig-prefilter → spilled-shingle verify) is pair- and value-identical
    to the legacy corpus-retokenizing verify path."""
    texts = [
        " ".join(f"w{i}" for i in range(50)),
        " ".join(f"w{i}" for i in range(48)) + " zz yy",
        " ".join(f"v{i}" for i in range(50)),
        " ".join(f"v{i}" for i in range(46)) + " k1 k2 k3 k4",
        "tiny",
        "",
    ]
    ds = _docs_ds(texts)
    new = dd.minhash_lsh_pairs(ds, threshold=0.4)

    # legacy flow: band rows from the corpus, candidates, re-tokenizing
    # candidate-keyed verify
    band_rows = ds.map_batches(
        dd.MinHashBands("text", "doc_id", 3, 128, 32),
        batch_format="pyarrow", batch_size=512,
    )
    raw = dd._bucketed_emit_pairs(band_rows, "band_key", None)
    cand = to_arrow(dd._bucketed_pair_counts(
        raw, lambda p, _c: pa.table({"pair": pa.array(p, pa.int64())})
    ))
    legacy = to_arrow(dd.verify_pairs_jaccard(
        _docs_ds(texts), cand.column("pair").to_numpy(), threshold=0.4
    )).sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])
    assert new.to_pylist() == legacy.to_pylist()
    assert len(new) >= 2  # both near-dup pairs found


def test_verify_spill_matches_corpus_verify(tmp_path):
    texts = [
        " ".join(f"w{i}" for i in range(30)),
        " ".join(f"w{i}" for i in range(28)) + " aa bb",
        " ".join(f"v{i}" for i in range(30)),
        "tiny",
    ]
    mh = dd.MinHashBands("text", "doc_id", 3, 128, 32)
    spill = str(tmp_path / "spill")
    _docs_ds(texts).map_batches(
        dd.MinHashSpill(mh), batch_format="pyarrow", batch_size=512
    ).write_parquet(spill)
    cand = np.array([(0 << 32) | 1, (0 << 32) | 2, (1 << 32) | 3], dtype=np.int64)
    got = to_arrow(dd.verify_pairs_jaccard_spill(
        rd.read_parquet(spill, columns=["doc_id", "shingles"]), cand, 0.0
    )).sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])
    want = to_arrow(dd.verify_pairs_jaccard(
        _docs_ds(texts), cand, threshold=0.0
    )).sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])
    assert got.to_pylist() == want.to_pylist()

    # the signature pre-filter keeps near-dup pairs and drops disjoint
    # ones at a high cut
    kept = dd.prefilter_pairs_sig(
        rd.read_parquet(spill, columns=["doc_id", "sig"]), cand, 128, 0.5
    )
    assert (0 << 32) | 1 in kept.tolist()
    assert (0 << 32) | 2 not in kept.tolist()


def test_curation_spill_crash_resume(tmp_path):
    """The curation tokenize spill is a real checkpoint: per-input-file
    atomic outputs, presence-based resume (only missing files re-run),
    fingerprint-guarded against corpus changes — mirroring the index
    build's crash-resume contract."""
    import os
    import pyarrow.parquet as pq2

    from elasticsearch_assets_ray.ops import to_arrow as _ta
    from elasticsearch_assets_ray.pipelines.curation import (
        curate, spill_curation_stats,
    )

    corpus = tmp_path / "corpus"
    corpus.mkdir()

    def mk(i, text_prefix="doc"):
        return pa.table(
            {
                "doc_id": pa.array(range(i * 10, (i + 1) * 10), pa.int64()),
                "lang": pa.array(["en"] * 10, pa.string()),
                "text": pa.array(
                    [f"{text_prefix} {j} the common and shared words here run"
                     for j in range(i * 10, (i + 1) * 10)],
                    pa.string(),
                ),
            }
        )

    for i in range(3):
        pq2.write_table(mk(i), corpus / f"p{i}.parquet")
    spill = tmp_path / "spill"
    spill_curation_stats(str(corpus), str(spill))
    outs = sorted(spill.glob("stats-*.parquet"))
    assert [o.name for o in outs] == [f"stats-p{i}.parquet" for i in range(3)]
    ref = {o.name: pq2.read_table(o) for o in outs}

    # crash window: one output missing → ONLY it is rebuilt
    mt0 = (spill / "stats-p0.parquet").stat().st_mtime_ns
    (spill / "stats-p1.parquet").unlink()
    spill_curation_stats(str(corpus), str(spill))
    assert (spill / "stats-p0.parquet").stat().st_mtime_ns == mt0
    assert pq2.read_table(spill / "stats-p1.parquet").equals(
        ref["stats-p1.parquet"]
    )

    # corpus change → fingerprint mismatch → full respill
    pq2.write_table(mk(0, "changed"), corpus / "p0.parquet")
    os.utime(corpus / "p0.parquet", (1, 1))  # force a visible mtime change
    spill_curation_stats(str(corpus), str(spill))
    assert not pq2.read_table(spill / "stats-p0.parquet").equals(
        ref["stats-p0.parquet"]
    )

    # curate() through the checkpointed spill ≡ the one-shot spill
    ds = rd.read_parquet(str(corpus))
    a = _ta(
        curate(ds, str(tmp_path / "s2"), min_quality=0.3,
               input_path=str(corpus))
    ).sort_by("doc_id")
    b = _ta(curate(ds, str(tmp_path / "s3"), min_quality=0.3)).sort_by("doc_id")
    assert a.equals(b)
    assert a.num_rows > 0


def test_simhash_batch_matches_per_doc_formula():
    """The batch-vectorized SimHash equals the naive per-doc formulation."""
    texts = ["foo bar baz foo", "", "one two two three three three", "单 word"]
    got = dd.simhash64_batch(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    ).column("simhash").to_pylist()
    from elasticsearch_assets_ray.ops.textstats import clipped_tokens
    bit_idx = np.arange(64, dtype=np.uint64)
    for i, text in enumerate(texts):
        toks = clipped_tokens(text)
        if not toks:
            assert got[i] == 0
            continue
        uniq = {}
        for t in toks:
            uniq[t] = uniq.get(t, 0) + 1
        hs = np.array([dd._stable_hash64(t) for t in uniq], dtype=np.uint64)
        tf = np.array(list(uniq.values()), dtype=np.int64)
        bits = ((hs[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
        votes = ((bits * 2 - 1) * tf[:, None]).sum(axis=0)
        want = int(np.bitwise_or.reduce((votes > 0).astype(np.uint64) << bit_idx))
        assert got[i] == want


def test_simhash_identical_and_banded_near():
    t = "foo bar baz qux quux corge grault"
    out = dd.simhash_pairs(_docs_ds([t, t, "unrelated words entirely distinct"]),
                           max_hamming=3)
    rows = out.to_pylist()
    assert {(r["doc_a"], r["doc_b"], r["hamming"]) for r in rows} == {(0, 1, 0)}


# -------------------------------------------------------------- similarity


def _emb_ds(mat):
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(mat)), pa.int64()),
                "embedding": pa.array([list(map(float, r)) for r in mat],
                                      pa.list_(pa.float32())),
            }
        )
    )


def test_knn_cosine_matches_numpy():
    rng = np.random.default_rng(5)
    mat = rng.standard_normal((80, 16)).astype(np.float32)
    ds = _emb_ds(mat)
    out = sim.knn_cosine(ds, mat[:3].astype(np.float64), [0, 1, 2], k=5)
    m64 = mat.astype(np.float64)
    norm = m64 / np.linalg.norm(m64, axis=1)[:, None]
    for qid in range(3):
        sims = norm @ norm[qid]
        want = np.lexsort((np.arange(80), -np.round(sims, 4)))[:5]
        got = out.filter(
            pa.compute.equal(out.column("query_id"), qid)
        ).column("vec_id").to_pylist()
        assert got == want.tolist()
        assert out.filter(
            pa.compute.equal(out.column("query_id"), qid)
        ).column("rank").to_pylist() == [1, 2, 3, 4, 5]


def test_knn_cosine_similarity_cutoff():
    """ES 8.8 knn.similarity: hits below the minimum drop, surviving
    ranks are the untouched prefix of the uncut result."""
    rng = np.random.default_rng(5)
    mat = rng.standard_normal((80, 16)).astype(np.float32)
    ds = _emb_ds(mat)
    base = sim.knn_cosine(ds, mat[:2].astype(np.float64), [0, 1], k=10)
    sims = base.column("sim_r").to_numpy()
    # a cutoff between the observed min and max is non-degenerate
    cut = float(np.quantile(sims, 0.4)) + 1e-6
    out = sim.knn_cosine(ds, mat[:2].astype(np.float64), [0, 1], k=10,
                         similarity=cut)
    assert 0 < out.num_rows < base.num_rows
    assert (out.column("sim_r").to_numpy() >= cut).all()
    # prefix property: surviving rows == base rows filtered, ranks kept
    kept = base.filter(pa.compute.greater_equal(base.column("sim_r"), cut))
    assert out.equals(kept)
    # cutoff above every sim → empty; cutoff below → identity
    assert sim.knn_cosine(ds, mat[:1].astype(np.float64), [0], k=5,
                          similarity=2.0).num_rows == 0
    assert sim.knn_cosine(ds, mat[:1].astype(np.float64), [0], k=5,
                          similarity=-2.0).num_rows == 5


def test_knn_lsh_self_hit_and_subset():
    rng = np.random.default_rng(6)
    mat = rng.standard_normal((60, 16)).astype(np.float32)
    ds = _emb_ds(mat)
    out = sim.knn_cosine_lsh(ds, mat[:2].astype(np.float64), [0, 1], k=5)
    for qid in (0, 1):
        got = out.filter(pa.compute.equal(out.column("query_id"), qid))
        ids = got.column("vec_id").to_pylist()
        assert ids[0] == qid  # the vector itself is always in its own bucket
        assert got.column("sim_r").to_pylist()[0] == 1.0


def test_cosine_dup_pairs_block_tiled_matches_bruteforce():
    """The block-pair exact path (multiple blocks) equals the driver-side
    brute force — every pair covered exactly once, no driver matrix."""
    rng = np.random.default_rng(9)
    mat = rng.standard_normal((50, 8)).astype(np.float32)
    mat[11] = mat[3] + 0.01 * rng.standard_normal(8).astype(np.float32)
    mat[27] = mat[4]
    ds = _emb_ds(mat)
    # broadcast_max_rows=0 forces the block-tiled plan (4 blocks)
    out = sim.cosine_dup_pairs(ds, threshold=0.8, block_rows=16,
                               broadcast_max_rows=0)
    # both physical plans produce the identical table
    assert out.equals(sim.cosine_dup_pairs(ds, threshold=0.8))
    m64 = mat.astype(np.float64)
    norm = m64 / np.linalg.norm(m64, axis=1)[:, None]
    sims = np.round(norm @ norm.T, 4)
    ii, jj = np.nonzero(np.triu(sims >= 0.8, k=1))
    want = sorted(zip(ii.tolist(), jj.tolist()))
    got = sorted(zip(out.column("vec_a").to_pylist(), out.column("vec_b").to_pylist()))
    assert got == want
    for r in out.to_pylist():
        assert r["sim_r"] == sims[r["vec_a"], r["vec_b"]]


def test_cosine_dup_pairs_lsh_subset_of_exact():
    rng = np.random.default_rng(10)
    mat = rng.standard_normal((40, 8)).astype(np.float32)
    mat[7] = mat[2] + 0.001 * rng.standard_normal(8).astype(np.float32)
    ds = _emb_ds(mat)
    exact = sim.cosine_dup_pairs(ds, threshold=0.9, block_rows=1000)
    approx = sim.cosine_dup_pairs_lsh(ds, threshold=0.9)
    exact_pairs = set(zip(exact.column("vec_a").to_pylist(), exact.column("vec_b").to_pylist()))
    approx_pairs = set(zip(approx.column("vec_a").to_pylist(), approx.column("vec_b").to_pylist()))
    assert approx_pairs <= exact_pairs  # verification is exact → no false positives
    assert (2, 7) in approx_pairs      # near-identical vectors share every bucket
    # verified sims match the exact path's values
    ex = {(r["vec_a"], r["vec_b"]): r["sim_r"] for r in exact.to_pylist()}
    for r in approx.to_pylist():
        assert r["sim_r"] == ex[(r["vec_a"], r["vec_b"])]


def test_verify_pairs_jaccard_matches_driver_dict_verify():
    """The distributed candidate verify equals the round-1 driver-dict
    implementation (re-stated inline) on every candidate pair."""
    texts = [
        " ".join(f"w{i}" for i in range(30)),
        " ".join(f"w{i}" for i in range(28)) + " aa bb",
        " ".join(f"v{i}" for i in range(30)),
        " ".join(f"v{i}" for i in range(25)) + " cc dd ee ff gg",
        "tiny",
    ]
    ds = _docs_ds(texts)
    cand = np.array(
        [(0 << 32) | 1, (2 << 32) | 3, (0 << 32) | 2, (1 << 32) | 4],
        dtype=np.int64,
    )
    out = to_arrow(dd.verify_pairs_jaccard(ds, cand, threshold=0.0)).to_pylist()
    got = {(r["doc_a"], r["doc_b"]): r["jacc"] for r in out}
    sets = {i: dd.doc_shingle_hashes(t) for i, t in enumerate(texts)}
    for p in cand.tolist():
        a, b = p >> 32, p & 0xFFFFFFFF
        ha, hb = sets[a], sets[b]
        common = len(np.intersect1d(ha, hb, assume_unique=True))
        denom = len(ha) + len(hb) - common
        if denom == 0 or len(ha) == 0 or len(hb) == 0:
            # docs with no shingles are unverifiable → pair dropped (or
            # scored with the present side only); never a false positive
            continue
        assert got[(a, b)] == common / denom


def test_knn_ivf_self_hits_and_high_recall(tmp_path):
    rng = np.random.default_rng(12)
    mat = rng.standard_normal((400, 16)).astype(np.float32)
    ds = _emb_ds(mat)
    ivf = str(tmp_path / "ivf")
    sim.build_ivf(ds, ivf, n_clusters=16, sample_size=400)
    q = mat[:5].astype(np.float64)
    out = sim.knn_cosine_ivf(ivf, q, [0, 1, 2, 3, 4], k=5, nprobe=4)
    exact = sim.knn_cosine(ds, q, [0, 1, 2, 3, 4], k=5)
    for qid in range(5):
        got = out.filter(pa.compute.equal(out.column("query_id"), qid))
        ids = got.column("vec_id").to_pylist()
        assert ids[0] == qid  # own cluster is always probed first
        assert got.column("sim_r").to_pylist()[0] == 1.0
        want = exact.filter(
            pa.compute.equal(exact.column("query_id"), qid)
        ).column("vec_id").to_pylist()
        # nprobe=4/16 probes ≥ a quarter of the space → decent overlap
        assert len(set(ids) & set(want)) >= 2


# --------------------------------------------------------------- textstats


def test_text_stats_values():
    out = to_arrow(
        _docs_ds(["The cat and the hat 42", ""]).map_batches(
            ts.TextStats(), batch_format="pyarrow"
        )
    ).to_pylist()
    r = out[0]
    assert r["token_count"] == 6
    assert out[1]["token_count"] == 0 and out[1]["distinct_tokens"] == 0
    assert out[1]["quality"] == 0.3 + 0.5 * (0 / 100)  # empty doc floor


def test_text_stats_distinct_and_quality():
    out = to_arrow(
        _docs_ds(["The cat and the hat 42"]).map_batches(
            ts.TextStats(), batch_format="pyarrow"
        )
    ).to_pylist()[0]
    assert out["distinct_tokens"] == 5
    assert out["stopword_count"] == 3  # the, and, the
    assert out["digit_tokens"] == 1
    expect_q = 0.5 * min(6 / 100, 1.0) + 0.3 * (1 - 1 / 6) + 0.2 * min(3 * 3 / 6, 1.0)
    assert abs(out["quality"] - expect_q) < 1e-12


def test_bpe_ish_token_counts():
    out = to_arrow(
        _docs_ds(["Hello world, it's a test!", "", "a+b=c 42"]).map_batches(
            ts.BPETokenCount(), batch_format="pyarrow"
        )
    ).to_pylist()
    # "Hello|" world|,| it|'s| a| test|!" → 8 bpe segments, 5 ws tokens
    assert out[0]["ws_tokens"] == 5 and out[0]["bpe_tokens"] == 8
    assert out[1]["ws_tokens"] == 0 and out[1]["bpe_tokens"] == 0
    # "a|+|b|=|c| |42"? → 'a','+','b','=','c',' 42' = 6
    assert out[2]["ws_tokens"] == 2 and out[2]["bpe_tokens"] == 6


def test_lang_id():
    lid = ts.LangID()
    assert lid.predict("the cat is on the mat and it is happy") == "en"
    assert lid.predict("der hund ist nicht zu haus und die katze") == "de"
    assert lid.predict("le chat est dans la maison avec les souris") == "fr"
    assert lid.predict("el perro es un animal y la casa es grande") == "es"
    assert lid.predict("这是一个中文句子") == "zh"


_PARITY_TEXTS = [
    "The cat and the hat 42",
    "",
    "der hund ist nicht zu haus und die katze der der",
    "le chat est dans la maison avec les souris",
    "这是一个中文句子 with latin",
    "no stopwords here zqx vvk 123 456 123",
    "x" * 70 + " tiny doc " + "x" * 70,  # >64-char tokens clipped out
    "Hello world, it's a TEST! Mixed_Case-and-dashes  \t\n spaced",
    "a a a a b b c 1 2 3",
]


def test_text_stats_vectorized_matches_python_reference():
    """The Arrow-kernel TextStats path is value-identical (fingerprint
    md5 included) to the per-doc clipped_tokens formulation."""
    st = ts.TextStats()
    batch = pa.table(
        {"doc_id": pa.array(range(len(_PARITY_TEXTS)), pa.int64()),
         "text": pa.array(_PARITY_TEXTS, pa.string())}
    )
    assert st(batch).equals(st.python_reference(batch))


def test_lang_id_vectorized_matches_predict():
    lid = ts.LangID(lang_col=None)
    batch = pa.table(
        {"doc_id": pa.array(range(len(_PARITY_TEXTS)), pa.int64()),
         "text": pa.array(_PARITY_TEXTS, pa.string())}
    )
    got = lid(batch).column("pred_lang").to_pylist()
    assert got == [lid.predict(t) for t in _PARITY_TEXTS]


def test_bpe_vectorized_matches_python_reference():
    bt = ts.BPETokenCount()
    batch = pa.table(
        {"doc_id": pa.array(range(len(_PARITY_TEXTS)), pa.int64()),
         "text": pa.array(_PARITY_TEXTS, pa.string())}
    )
    assert bt(batch).equals(bt.python_reference(batch))


def test_token_count_batch_matches_clipped_tokens():
    from elasticsearch_assets_ray.ops.textstats import (
        clipped_tokens, token_count_batch,
    )

    batch = pa.table({"text": pa.array(_PARITY_TEXTS, pa.string())})
    got = token_count_batch(batch).column("token_count").to_pylist()
    assert got == [len(clipped_tokens(t)) for t in _PARITY_TEXTS]


# ----------------------------------------------------------------- routing


def test_timeseries_index_names():
    ts_arr = pa.array(
        [
            np.datetime64("2015-08-20T14:33:09.356", "us"),
            np.datetime64("2015-08-21T00:00:00", "us"),
        ],
        pa.timestamp("us"),
    )
    assert timeseries_index_name(ts_arr, "events", "daily").to_pylist() == [
        "events-2015.08.20", "events-2015.08.21",
    ]
    assert timeseries_index_name(ts_arr, "events", "monthly").to_pylist() == [
        "events-2015.08", "events-2015.08",
    ]
    assert timeseries_index_name(ts_arr, "events", "yearly").to_pylist() == [
        "events-2015", "events-2015",
    ]
    # weekly = floor(epoch_ms / 604800000)  (index_selector/index.js:7-9)
    ms = 1440081189356
    assert timeseries_index_name(ts_arr, "events", "weekly").to_pylist()[0] == (
        f"events-{ms // 604800000}"
    )


def test_epoch_helpers_unit_independent():
    """timeseries naming / window ids must not change with the parquet
    timestamp storage unit (s / ms / us / ns)."""
    from elasticsearch_assets_ray.ops import epoch_ms, epoch_us

    t = np.datetime64("2015-08-20T14:33:09.356", "us")
    for unit in ("s", "ms", "us", "ns"):
        arr = pa.array([t.astype(f"datetime64[{unit}]")], pa.timestamp(unit))
        expect_ms = 1440081189356 if unit != "s" else 1440081189000
        assert epoch_ms(arr)[0] == expect_ms
        assert epoch_us(arr)[0] == expect_ms * 1000
        got = timeseries_index_name(arr, "events", "weekly").to_pylist()[0]
        assert got == f"events-{expect_ms // 604800000}"
    with pytest.raises(TypeError):
        epoch_ms(pa.array([1, 2], pa.int64()))


def test_index_selector_columns_and_validation():
    cfg = IndexSelectorConfig(index="logs", action="index",
                              date_field="ts", timeseries="daily", id_field="uid")
    batch = pa.table(
        {
            "uid": pa.array([7, 8], pa.int64()),
            "ts": pa.array([np.datetime64("2020-01-02T03:04:05", "us")] * 2, pa.timestamp("us")),
        }
    )
    out = IndexSelector(cfg)(batch)
    assert out.column("target_index").to_pylist() == ["logs-2020.01.02"] * 2
    assert out.column("action").to_pylist() == ["index", "index"]
    assert out.column("_id").to_pylist() == ["7", "8"]
    with pytest.raises(ValueError):
        IndexSelectorConfig(index="x", timeseries="daily")  # needs date_field
    with pytest.raises(ValueError):
        IndexSelectorConfig(index="x", action="nope")
    with pytest.raises(ValueError):
        IndexSelectorConfig(index="x", update_fields=("a",))  # needs update action


def test_index_selector_update_bodies_golden():
    """Mirrors the reference's golden bulk-body cases
    (/root/reference/test/index_selector-spec.js:144-290), restated
    columnar: update_fields projection, whole-doc upsert, script+params
    with falsy-value skip, delete with no body."""
    batch = pa.table(
        {
            "some": pa.array(["data"], pa.string()),
            "name": pa.array(["someName"], pa.string()),
            "job": pa.array(["to be awesome!"], pa.string()),
        }
    )
    # update with update_fields → doc projection only
    out = IndexSelector(
        IndexSelectorConfig(index="some_index", action="update", id_field="name",
                            update_fields=("name",), update_retry_on_conflict=11)
    )(batch)
    assert out.column("update_doc").to_pylist() == ['{"name":"someName"}']
    assert out.column("retry_on_conflict").to_pylist() == [11]
    assert "upsert_doc" not in out.column_names
    # upsert with update_fields → whole-record upsert + projection doc
    out = IndexSelector(
        IndexSelectorConfig(index="some_index", action="upsert",
                            update_fields=("name", "job"))
    )(batch)
    assert out.column("upsert_doc").to_pylist() == [
        '{"some":"data","name":"someName","job":"to be awesome!"}'
    ]
    assert out.column("update_doc").to_pylist() == [
        '{"name":"someName","job":"to be awesome!"}'
    ]
    # script with params extracted from the record
    nbatch = pa.table({"count": pa.array([1], pa.int64()),
                       "add": pa.array([2], pa.int64())})
    out = IndexSelector(
        IndexSelectorConfig(index="hello", action="upsert",
                            script="ctx._source.count += add",
                            script_params=(("add", "add"),))
    )(nbatch)
    assert out.column("script").to_pylist() == [
        '{"source":"ctx._source.count += add","params":{"add":2}}'
    ]
    assert out.column("upsert_doc").to_pylist() == ['{"count":1,"add":2}']
    # script_file flavor + falsy record value skipped (index.js:119-121)
    zbatch = pa.table({"count": pa.array([0], pa.int64())})
    out = IndexSelector(
        IndexSelectorConfig(index="x", action="update", script_file="someFile",
                            script_params=(("aKey", "count"),))
    )(zbatch)
    assert out.column("script").to_pylist() == ['{"file":"someFile","params":{}}']
    # update with neither fields nor script → whole-doc merge
    out = IndexSelector(
        IndexSelectorConfig(index="x", action="update")
    )(nbatch)
    assert out.column("update_doc").to_pylist() == ['{"count":1,"add":2}']
    # delete emits no body columns
    out = IndexSelector(IndexSelectorConfig(index="x", action="delete", id_field="name"))(batch)
    assert "update_doc" not in out.column_names and "script" not in out.column_names
    # validation
    with pytest.raises(ValueError):
        IndexSelectorConfig(index="x", script="s")  # script needs update/upsert
    with pytest.raises(ValueError):
        IndexSelectorConfig(index="x", action="update", script="s", script_file="f")


def test_connection_map_and_multisend_routing():
    cm = parse_connection_map({"a,b": "es1", "c": "es2", "*": "fallback"})
    assert cm == {"a": "es1", "b": "es1", "c": "es2", "*": "fallback"}
    with pytest.raises(ValueError):
        parse_connection_map({"a": "x", "a,b": "y"})
    batch = pa.table(
        {
            "_id": pa.array(["a1", "b2", "c3", "z9"], pa.string()),
            "target_index": pa.array(["logs"] * 4, pa.string()),
        }
    )
    out = route_batch(batch, {"a,b": "es1", "c": "es2", "*": "fb"}, index_append=True)
    assert out.column("connection").to_pylist() == ["es1", "es1", "es2", "fb"]
    assert out.column("target_index").to_pylist() == [
        "logs-a", "logs-b", "logs-c", "logs-z",
    ]
    with pytest.raises(KeyError):
        route_batch(batch, {"a,b,c": "es1"})  # 'z' unmapped, no '*'


# ---------------------------------------------------------------- docstore


def test_docstore_mget_order_cache_and_missing(small_index):
    from elasticsearch_assets_ray.state.docstore import DocStore

    store = DocStore(small_index.index_dir, columns=["doc_id", "repo", "dl"])
    got = store.mget([250, 3, 250, 399])
    assert got.column("doc_id").to_pylist() == [250, 3, 250, 399]
    assert store.count() > 0  # partitions cached
    h0 = store.hits
    store.mget([3])
    assert store.hits > h0  # LRU hit, no re-read
    other = DocStore(small_index.index_dir)
    assert other.count() == 0  # instances independent (reference api-spec)
    with pytest.raises(KeyError):
        store.mget([10_000_000])


def test_hydrate_dataset(small_index):
    from elasticsearch_assets_ray.state.docstore import hydrate_dataset

    res = rd.from_arrow(
        pa.table({"doc_id": pa.array([5, 100, 399], pa.int64()),
                  "score": pa.array([3.0, 2.0, 1.0])})
    )
    out = to_arrow(hydrate_dataset(res, small_index.index_dir, ["repo", "lang"], concurrency=1))
    assert set(out.column_names) >= {"doc_id", "score", "repo", "lang"}
    assert out.num_rows == 3


# --------------------------------------------------------------------- geo


def test_geo_validation_and_parsing():
    from elasticsearch_assets_ray.ops.geo import (
        GeoQuery, parse_distance, parse_point,
    )

    assert parse_point("45.5,-122.6") == (45.5, -122.6)
    for bad in ["91,0", "-91,0", "0,181", "0,-181", "1", "a,b"]:
        with pytest.raises(ValueError):
            parse_point(bad)
    assert parse_distance("50km") == 50_000.0
    assert parse_distance("1mi") == 1609.344
    for bad in ["50", "50parsecs", "km"]:
        with pytest.raises(ValueError):
            parse_distance(bad)
    with pytest.raises(ValueError):
        GeoQuery(field="loc", box_top_left="1,1")  # missing corner
    with pytest.raises(ValueError):
        GeoQuery(field="loc", point="1,1")  # missing distance
    with pytest.raises(ValueError):
        GeoQuery(field="loc")  # neither
    with pytest.raises(ValueError):
        GeoQuery(field="loc", point="1,1", distance="1km", sort_unit="parsec")


def test_geo_null_values_and_antimeridian(ray_session):
    import ray.data as rd3
    from elasticsearch_assets_ray.ops.geo import GeoQuery, geo_search

    tbl = pa.table({
        "pid": pa.array(range(5), pa.int64()),
        "loc": pa.array(["10,10", None, "garbage", "5,175", "5,-175"], pa.string()),
    })
    # nulls/malformed rows are non-matches, never query errors
    near = GeoQuery(field="loc", point="10,10", distance="100km")
    got = to_arrow(geo_search(rd3.from_arrow(tbl), near))
    assert got.column("pid").to_pylist() == [0]
    # antimeridian-crossing box wraps (ES geo_bounding_box semantics)
    box = GeoQuery(field="loc", box_top_left="10,170", box_bottom_right="0,-170")
    got2 = to_arrow(geo_search(rd3.from_arrow(tbl), box))
    assert sorted(got2.column("pid").to_pylist()) == [3, 4]


def test_hll_null_semantics():
    from elasticsearch_assets_ray.ops.sketch import HyperLogLog

    # COUNT(DISTINCT) ignores nulls; the string "None" stays distinct
    h = HyperLogLog(14).add_many([None, "None", "a", None])
    assert round(h.estimate()) == 2
    assert HyperLogLog(14).add_many([None, None]).estimate() == 0.0


def test_geo_box_distance_and_sort(ray_session):
    import ray.data as rd2
    from elasticsearch_assets_ray.ops.geo import (
        GeoQuery, geo_search, haversine_meters,
    )

    pts = ["10,10", "10.5,10.5", "12,12", "-10,10", "10,-10", "89,179"]
    tbl = pa.table({"pid": pa.array(range(len(pts)), pa.int64()),
                    "loc": pa.array(pts, pa.string())})
    ds = rd2.from_arrow(tbl)
    # box: top-left (11, 9) → bottom-right (9, 11) keeps the two ~10,10 pts
    box = GeoQuery(field="loc", box_top_left="11,9", box_bottom_right="9,11")
    got = to_arrow(geo_search(ds, box))
    assert sorted(got.column("pid").to_pylist()) == [0, 1]
    # distance 100km around 10,10 keeps only the exact point + 10.5 is ~78km
    near = GeoQuery(field="loc", point="10,10", distance="100km")
    got2 = to_arrow(geo_search(ds, near).materialize())
    ids = got2.column("pid").to_pylist()
    assert ids == [0, 1]  # sorted by distance asc (0 is distance 0)
    assert got2.column("_distance").to_pylist()[0] == 0.0
    # haversine sanity: 1 degree latitude ≈ 111.2 km
    import numpy as np2
    d = haversine_meters(np2.array([11.0]), np2.array([10.0]), 10.0, 10.0)[0]
    assert abs(d - 111_195) < 500


def test_cached_state_storage(small_index, tmp_path):
    """Reference state-storage semantics: read-through mget, mset overlay,
    independent named instances, overlay flush."""
    from elasticsearch_assets_ray.state.docstore import CachedStateStorage

    a = CachedStateStorage(small_index.index_dir, columns=["doc_id", "repo", "dl"])
    b = CachedStateStorage(small_index.index_dir, columns=["doc_id", "repo", "dl"])
    rows = a.mget([3, 250])
    assert [r["doc_id"] for r in rows] == [3, 250]
    a.mset([{"doc_id": 3, "repo": "patched/repo", "dl": 1}])
    assert a.get(3)["repo"] == "patched/repo"
    assert b.get(3)["repo"] != "patched/repo"  # instances independent
    mixed = a.mget([3, 250])
    assert mixed[0]["repo"] == "patched/repo" and "dl" in mixed[1]
    out = tmp_path / "overlay.parquet"
    assert a.flush_overlay(out) == 1
    import pyarrow.parquet as pq2
    assert pq2.read_table(out).num_rows == 1
    assert a.count() >= b.count()


# ---------------------------------------------------------------- windowing


def test_sliding_window_and_asof(ray_session):
    import datetime as dt

    from elasticsearch_assets_ray.ops.window import asof_join, sliding_window_counts

    base = dt.datetime(2024, 1, 1)
    rows = [
        # (event_id, user, minutes, type)
        (1, 7, 0, "view"), (2, 7, 10, "view"), (3, 7, 20, "purchase"),
        (4, 7, 20, "view"),      # same-instant view must NOT match (strict <)
        (5, 8, 5, "purchase"),   # no prior view → -1
        (6, 9, 1, "view"), (7, 9, 2, "purchase"), (8, 9, 3, "purchase"),
    ]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([base + dt.timedelta(minutes=r[2]) for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })
    ds = rd.from_arrow(tbl)
    out = to_arrow(asof_join(
        ds, "user_id", "ts", "event_id",
        lambda b: pa.compute.equal(b.column("event_type"), "purchase").to_numpy(zero_copy_only=False),
        lambda b: pa.compute.equal(b.column("event_type"), "view").to_numpy(zero_copy_only=False),
    )).to_pylist()
    got = {r["left_id"]: r["right_id"] for r in out}
    assert got == {3: 2, 5: -1, 7: 6, 8: 6}

    # overlapping roles: a row matching BOTH filters must serve as a
    # right-side candidate too ("attribute to any prior event")
    both = to_arrow(asof_join(
        ds, "user_id", "ts", "event_id",
        lambda b: pa.compute.equal(b.column("event_type"), "purchase").to_numpy(zero_copy_only=False),
        lambda b: pa.compute.is_in(
            b.column("event_type"), value_set=pa.array(["view", "purchase"])
        ).to_numpy(zero_copy_only=False),
    )).to_pylist()
    got_both = {r["left_id"]: r["right_id"] for r in both}
    # user 9: purchase#8 (t=3) must match purchase#7 (t=2), not view#6;
    # same-instant rows stay excluded (strictly-before)
    assert got_both == {3: 2, 5: -1, 7: 6, 8: 7}

    win = to_arrow(sliding_window_counts(ds, "ts", window_ms=1_200_000, slide_ms=600_000))
    w = {r["window_id"]: r["n_events"] for r in win.to_pylist()}
    # every event counted exactly window/slide = 2 times
    assert sum(w.values()) == 2 * len(rows)
    with pytest.raises(ValueError):
        sliding_window_counts(ds, "ts", window_ms=1000, slide_ms=300)


# ------------------------------------------------------------------ sketch


def test_hll_accuracy_merge_and_roundtrip(ray_session):
    from elasticsearch_assets_ray.ops.sketch import HyperLogLog, approx_distinct

    vals = [f"item-{i}" for i in range(100_000)]
    h = HyperLogLog(14).add_many(vals)
    assert abs(h.estimate() - 100_000) / 100_000 < 0.02
    # merge of halves == whole (associative registers)
    a = HyperLogLog(14).add_many(vals[:50_000])
    b = HyperLogLog(14).add_many(vals[50_000:])
    assert a.merge(b).estimate() == h.estimate()
    rt = HyperLogLog.from_bytes(h.to_bytes())
    assert rt.estimate() == h.estimate()
    # small range → linear counting is near exact
    small = HyperLogLog(14).add_many([str(i) for i in range(500)])
    assert abs(small.estimate() - 500) < 10
    with pytest.raises(ValueError):
        HyperLogLog(2)

    # distributed partials over a Dataset
    tbl = pa.table({"user": pa.array([f"u{i % 1500}" for i in range(10_000)])})
    est = approx_distinct(rd.from_arrow(tbl).repartition(8), "user")
    assert abs(est - 1500) / 1500 < 0.03


def test_multisend_write_partitioned_sink(ray_session, tmp_path):
    """The bulk sink end-to-end: route by id prefix, write parquet
    partitioned by (connection, target_index), rows round-trip."""
    import pyarrow.dataset as pds

    from elasticsearch_assets_ray.ops.routing import multisend_write

    tbl = pa.table({
        "_id": pa.array(["a1", "b2", "c3", "a9"], pa.string()),
        "target_index": pa.array(["logs"] * 4, pa.string()),
        "v": pa.array([1, 2, 3, 4], pa.int64()),
    })
    out = tmp_path / "sink"
    multisend_write(rd.from_arrow(tbl), str(out),
                    {"a,b": "es1", "*": "es2"}, index_append=True)
    back = pds.dataset(str(out), partitioning="hive").to_table()
    assert back.num_rows == 4
    got = {(r["connection"], r["target_index"], r["v"]) for r in back.to_pylist()}
    assert got == {("es1", "logs-a", 1), ("es1", "logs-b", 2),
                   ("es2", "logs-c", 3), ("es1", "logs-a", 4)}


def test_clear_deletes(small_corpus, tmp_path):
    from elasticsearch_assets_ray.config import IndexConfig
    from elasticsearch_assets_ray.index.build import build_index
    from elasticsearch_assets_ray.index.deletes import (
        clear_deletes, delete_docs, load_deletes,
    )

    info = build_index(small_corpus, tmp_path / "idx",
                       IndexConfig(partition_target_docs=100, shard_target_docs=200))
    delete_docs(info.index_dir, [1, 2, 3])
    assert sum(len(load_deletes(info.index_dir, s)) for s in info.shard_ids()) == 3
    clear_deletes(info.index_dir)
    assert sum(len(load_deletes(info.index_dir, s)) for s in info.shard_ids()) == 0


def test_decontamination_kernel(ray_session):
    """n-grams never cross document boundaries; counts are DISTINCT
    shared grams; the broadcast set drives the flag."""
    import pyarrow as pa

    from elasticsearch_assets_ray.ops.decontam import (
        benchmark_gram_ref,
        contamination_counts,
        doc_ngrams_arrow,
    )
    import ray as _ray

    texts = pa.array(["a b", "c d", "x a b c x a b c"], pa.string())
    grams, gdoc = doc_ngrams_arrow(texts, 2)
    gs = set(zip(gdoc.tolist(), grams.to_pylist()))
    assert ("0", "b c") not in gs and (0, "b c") not in gs  # no crossing
    assert (2, "a b") in gs and (0, "a b") in gs
    ref = benchmark_gram_ref(["a b c"], 2)
    bench = _ray.get(ref)
    counts = contamination_counts(texts, bench, 2)
    # doc0 shares {a b}; doc1 nothing; doc2 shares {a b, b c} (distinct,
    # despite each occurring twice)
    assert counts.tolist() == [1, 0, 2]


def test_knn_filtered_is_prefilter(ray_session):
    """ES kNN filter = PRE-filter: the top-k is exact over surviving
    vectors (a passing vector ranked below k unfiltered must appear),
    and every hit passes the filter."""
    import numpy as np
    import ray.data as rd

    from elasticsearch_assets_ray.ops import similarity as sim

    rng = np.random.default_rng(9)
    n, d = 300, 16
    emb = rng.standard_normal((n, d)).astype(np.float32)
    labels = (np.arange(n) % 3).astype(np.int32)
    ds = rd.from_items([
        {"vec_id": i, "embedding": emb[i].tolist(), "label": int(labels[i])}
        for i in range(n)
    ])
    q = emb[:2].astype(np.float64)
    got = sim.knn_cosine_filtered(
        ds, q, [0, 1], {"col": "label", "in": [1]}, k=5
    ).to_pandas()
    assert set(got.vec_id) <= set(np.nonzero(labels == 1)[0].tolist())
    # brute reference among label==1 only
    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    keep = np.nonzero(labels == 1)[0]
    for qi in range(2):
        sims = en[keep] @ qn[qi]
        order = np.lexsort((keep, -np.round(sims, 4)))[:5]
        want = keep[order].tolist()
        assert got[got.query_id == qi].sort_values("rank").vec_id.tolist() \
            == want, qi
    # range-filter form + validation
    got2 = sim.knn_cosine_filtered(
        ds, q[:1], [0], {"col": "label", "range": (1, None)}, k=5
    ).to_pandas()
    assert set(got2.vec_id) <= set(np.nonzero(labels >= 1)[0].tolist())
    import pytest as _pt

    with _pt.raises(ValueError):
        sim.knn_cosine_filtered(ds, q[:1], [0],
                                {"col": "label", "range": (None, None)})


def test_incremental_exact_dedup(ray_session, tmp_path):
    """Wave-by-wave dedup against the persisted signature store ≡ full
    exact dedup over the union; idempotent replay; only the new wave's
    buckets are touched."""
    import os

    import ray.data as rd

    from elasticsearch_assets_ray.ops.dedup import (
        exact_dedup,
        incremental_exact_dedup,
    )

    texts_a = ["aa bb", "cc dd", "aa bb", "ee ff"]            # ids 0-3
    texts_b = ["cc dd", "gg hh", "gg hh", "aa bb", "ii jj"]   # ids 4-8
    wave_a = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts_a)])
    wave_b = rd.from_items(
        [{"doc_id": 4 + i, "text": t} for i, t in enumerate(texts_b)])
    sdir = str(tmp_path / "dedup_state")

    va = {r["doc_id"]: r for r in incremental_exact_dedup(
        wave_a, sdir, run_tag="day1").take_all()}
    vb = {r["doc_id"]: r for r in incremental_exact_dedup(
        wave_b, sdir, run_tag="day2").take_all()}
    assert [va[i]["keep"] for i in range(4)] == [True, True, False, True]
    assert va[2]["dup_of"] == 0
    # wave B: 'cc dd' loses to state winner 1; in-batch 'gg hh' first
    # occurrence (5) wins, 6 points at 5; 'aa bb' loses to 0; new text 8
    assert [vb[i]["keep"] for i in range(4, 9)] == [
        False, True, False, False, True]
    assert vb[4]["dup_of"] == 1
    assert vb[6]["dup_of"] == 5
    assert vb[7]["dup_of"] == 0
    # equivalence with full dedup over the union (survivor ids match)
    union = rd.from_items(
        [{"doc_id": i, "text": t}
         for i, t in enumerate(texts_a + texts_b)])
    full = sorted(r["doc_id"] for r in exact_dedup(union).take_all())
    inc = sorted([i for i in range(4) if va[i]["keep"]]
                 + [i for i in range(4, 9) if vb[i]["keep"]])
    assert inc == full
    # replay of day2 (crash-resume): same verdicts, state unchanged
    vb2 = {r["doc_id"]: r for r in incremental_exact_dedup(
        wave_b, sdir, run_tag="day2").take_all()}
    assert vb2 == vb
    # a third wave still sees day1+day2 winners
    wave_c = rd.from_items([{"doc_id": 9, "text": "gg hh"}])
    vc = incremental_exact_dedup(wave_c, sdir, run_tag="day3").take_all()
    assert vc[0]["keep"] is False and vc[0]["dup_of"] == 5
    # state on disk: per-bucket generation files only
    gens = set()
    for b in os.listdir(sdir):
        gens.update(os.listdir(os.path.join(sdir, b)))
    assert gens <= {"gen-day1.parquet", "gen-day2.parquet",
                    "gen-day3.parquet"}


def test_incremental_minhash_pairs(ray_session, tmp_path):
    """Wave-by-wave LSH near-dup against the persisted band+spill store:
    the union of the waves' outputs is PAIR-IDENTICAL (and jacc-
    identical) to the batch op over the union corpus; replay is
    idempotent; pairs always include ≥1 wave member."""
    import ray.data as rd

    from elasticsearch_assets_ray.ops.dedup import (
        incremental_minhash_pairs,
        minhash_lsh_pairs,
    )

    base = ("the quick brown fox jumps over the lazy dog while "
            "seventeen engineers review a streaming shuffle plan")
    texts = []
    for i in range(30):
        words = base.split()
        words[i % len(words)] = f"tok{i}"
        texts.append(" ".join(words))           # near-dups of base
    texts += [f"totally unrelated document number {i} about "
              f"galaxies{i} and protein{i} folding rates" for i in range(10)]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    kw = dict(n=3, num_perm=64, bands=16, threshold=0.5)

    full = minhash_lsh_pairs(
        rd.from_items(rows), **kw).to_pandas()
    full_set = {(a, b, round(j, 9)) for a, b, j in
                zip(full.doc_a, full.doc_b, full.jacc)}

    sdir = str(tmp_path / "mh_state")
    w1 = incremental_minhash_pairs(
        rd.from_items(rows[:20]), sdir, "w1", **kw).to_pandas()
    w2 = incremental_minhash_pairs(
        rd.from_items(rows[20:]), sdir, "w2", **kw).to_pandas()
    inc_set = {(a, b, round(j, 9)) for d in (w1, w2)
               for a, b, j in zip(d.doc_a, d.doc_b, d.jacc)}
    assert inc_set == full_set and len(full_set) > 50
    # wave 2's pairs all touch a wave-2 doc; cross-wave pairs exist
    assert all(a >= 20 or b >= 20 for a, b in zip(w2.doc_a, w2.doc_b))
    assert any(a < 20 and b >= 20 for a, b in zip(w2.doc_a, w2.doc_b))
    # replay: same pairs, state unchanged
    w2b = incremental_minhash_pairs(
        rd.from_items(rows[20:]), sdir, "w2", **kw).to_pandas()
    assert w2b.equals(w2)
