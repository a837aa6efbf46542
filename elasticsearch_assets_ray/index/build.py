"""Distributed inverted-index build — the engine the reference delegates
to Elasticsearch, as a Ray Data pipeline.

Pipeline (SURVEY.md §3.4)::

    plan partitions+shards from Parquet footers   (driver; slicer analogue)
      → ray.data.from_items(shard manifest)       (one row per shard)
      → map_batches(BuildShard)                   (DEFAULT "fused" strategy:
            read the shard's partitions in doc order, code-aware tokenize,
            sha256, accumulate postings bounded by shard_target_docs — the
            doc-range salt that caps even a 100%-df term like `import` —
            batch-encode, atomic segment write + per-partition docmeta)
      → driver: manifest + global stats (N, avgdl) from shard summaries

    "groupby" strategy (the same semantics as an explicit exchange):
      from_items(partition manifest)
      → map_batches(TokenizePartition)            (per-partition partials)
      → groupby("shard_id")                       (all-to-all keyed by the
            doc-range shard — the skew salt)
      → map_groups(WriteShardSegment)             (merge partials per term)

The shard→partition routing is fixed at plan time (shards are contiguous
partition ranges), so the fused strategy turns the exchange into a no-op:
measured on the 400k-doc bench corpus the generic sort shuffle alone cost
more wall time than the entire fused build.  The groupby path remains as
the general mechanism and is tested byte-identical to the fused path.

Resume: shards whose segment is already checkpointed are skipped before
the tokenize stage, mirroring the reference's replay-and-skip resume
(``/root/reference/asset/id_reader/id_slicer.js:178-199``).

Scale notes: nothing here materializes the corpus — shard tasks stream
their own partition reads, per-shard state is bounded by
``shard_target_docs``, segments write shard-partitioned (resumable, never
one giant file).  Only per-shard summary rows and the manifest touch the
driver.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from collections import Counter
from dataclasses import asdict, dataclass
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from ..analysis.tokenizer import (
    _CODE_RE as _CODE_SPLIT_RE,
    analyzer_for_lang,
    clip_tokens,
    get_analyzer,
    stem_token,
)
from ..config import IndexConfig
from .codec import (
    decode_postings_many,
    encode_positions_many,
    encode_postings_many,
)
from .manifest import (
    STATS_NAME,
    BuildManifest,
    atomic_write_text,
    plan_append,
    plan_build,
)

_PARTIAL_SCHEMA = pa.schema(
    [
        ("shard_id", pa.int32()),
        ("term", pa.string()),
        ("partition_id", pa.int32()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("blob", pa.large_binary()),
    ]
)

_PARTIAL_SCHEMA_POS = pa.schema(
    list(_PARTIAL_SCHEMA) + [pa.field("posblob", pa.large_binary())]
)

SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("max_tf", pa.int64()),
        ("postings", pa.large_binary()),
    ]
)

SEGMENT_SCHEMA_POS = pa.schema(
    list(SEGMENT_SCHEMA) + [pa.field("positions", pa.large_binary())]
)


def tokenize_flat(contents, langs, analyzer_of, cfg_min, cfg_max):
    """Tokenize docs → (flat tokens, per-token doc offsets, dls, shas, nbytes).

    Per-doc work is only the regex + sha; inversion happens later in one
    vectorized pass (no per-doc Counter/dict — measured ~2× tokenize-stage
    CPU under full-node load)."""
    n = len(contents)
    flat: list[str] = []
    counts = np.zeros(n, dtype=np.int64)
    shas: list[str] = []
    nbytes = np.zeros(n, dtype=np.int64)
    for i, (text, lang) in enumerate(zip(contents, langs)):
        raw = text.encode("utf-8")
        shas.append(hashlib.sha256(raw).hexdigest())
        nbytes[i] = len(raw)
        toks = clip_tokens(analyzer_of(lang)(text), cfg_min, cfg_max)
        counts[i] = len(toks)
        flat.extend(toks)
    doc_rel = np.repeat(np.arange(n, dtype=np.int64), counts)
    return flat, doc_rel, counts.astype(np.int32), shas, nbytes


def tokenize_codes_arrow(
    text: "pa.Array | pa.ChunkedArray",
    analyzer_name: str,
    cfg_min: int,
    cfg_max: int,
    ident_cache: dict,
):
    """Arrow-kernel tokenization for the uniform ``code`` / ``simple``
    analyzers → (sorted_terms, flat term codes, doc_rel, dls).

    The per-token hot path is C kernels + integer gathers only: RE2 split
    of the whole column (``split_pattern_regex``), ``dictionary_encode``
    to distinct identifiers, then the camel/snake sub-split (Python, but
    memoized) runs once per DISTINCT identifier and every occurrence
    expands via one packed-table gather.  Output is IDENTICAL to the
    per-doc Python path (``tokenize_flat`` + ``invert_flat`` term order)
    — parity is tested and the groupby merge strategy still runs the
    Python path, with byte-identical segments.

    Motivation: the per-doc path allocates one Python string per token;
    at 32 concurrent workers on one box that allocator traffic saturates
    the memory bus (measured +38% CPU-s/task vs 8 workers).  Integer
    gathers keep the hot loop in cache-friendly numpy.

    For inputs past a few thousand docs, call
    :func:`tokenize_codes_arrow_chunked` instead: the multi-million-
    element intermediate arrays of one giant call thrash L3 (measured 6×
    slower at 64k docs than the same work in 4k-doc chunks).
    """
    codes, doc_rel, dls, sub_code = _tokenize_codes_unsorted(
        text, analyzer_name, cfg_min, cfg_max, ident_cache, {}
    )
    return _remap_sorted(codes, sub_code) + (doc_rel, dls)


def tokenize_codes_arrow_chunked(
    text: "pa.Array | pa.ChunkedArray",
    analyzer_name: str,
    cfg_min: int,
    cfg_max: int,
    ident_cache: dict,
    chunk_docs: int = 4096,
):
    """:func:`tokenize_codes_arrow` executed in ``chunk_docs``-sized
    chunks that SHARE one sub-vocabulary, remapped to sorted term order
    once at the end — bit-identical output (tested), but each chunk's
    intermediate arrays stay cache-sized, which keeps the kernel linear
    in shard size (one 64k-doc call measured 6× slower than the same
    docs chunked)."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = len(text)
    sub_code: dict[str, int] = {}
    code_parts: list[np.ndarray] = []
    rel_parts: list[np.ndarray] = []
    dls_parts: list[np.ndarray] = []
    for off in range(0, max(n, 1), chunk_docs):
        sl = text.slice(off, chunk_docs)
        if len(sl) == 0:
            break
        codes, rel, dls, sub_code = _tokenize_codes_unsorted(
            sl, analyzer_name, cfg_min, cfg_max, ident_cache, sub_code
        )
        code_parts.append(codes)
        rel_parts.append(rel + off)
        dls_parts.append(dls)
    codes = (
        np.concatenate(code_parts) if code_parts else np.empty(0, np.int64)
    )
    doc_rel = np.concatenate(rel_parts) if rel_parts else np.empty(0, np.int64)
    dls = (
        np.concatenate(dls_parts) if dls_parts else np.zeros(n, np.int32)
    )
    terms, flat = _remap_sorted(codes, sub_code)
    return terms, flat, doc_rel, dls


def _remap_sorted(codes: np.ndarray, sub_code: dict):
    """Remap insertion-order codes to sorted term order (the Python
    path's ``pd.factorize(sort=True)`` order)."""
    sorted_terms = sorted(sub_code)
    if len(codes) == 0:
        return sorted_terms, np.empty(0, np.int64)
    remap = np.empty(len(sorted_terms), dtype=np.int64)
    for rank, t in enumerate(sorted_terms):
        remap[sub_code[t]] = rank
    return sorted_terms, remap[codes]


def _tokenize_codes_unsorted(
    text: "pa.Array | pa.ChunkedArray",
    analyzer_name: str,
    cfg_min: int,
    cfg_max: int,
    ident_cache: dict,
    sub_code: dict,
):
    """Core Arrow tokenize: returns (insertion-order codes, doc_rel, dls,
    sub_code) — ``sub_code`` is the shared token→code map, grown in
    place so successive chunk calls emit consistent codes."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = len(text)
    if analyzer_name in ("simple", "stem"):
        la = pc.split_pattern_regex(pc.utf8_lower(text), "[^a-z0-9]+")
    elif analyzer_name == "code":
        la = pc.split_pattern_regex(text, "[^A-Za-z0-9_]+")
    else:  # pragma: no cover - guarded by caller
        raise ValueError(f"no arrow fast path for analyzer {analyzer_name!r}")
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    counts0 = np.diff(la.offsets.to_numpy().astype(np.int64))
    vals = la.values
    de = vals.dictionary_encode()
    indices = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = de.dictionary.to_pylist()
    doc_rel0 = np.repeat(np.arange(n, dtype=np.int64), counts0)

    # one expansion per DISTINCT identifier; sub-vocabulary accumulates
    # in the caller-shared sub_code map
    exp_parts: list[np.ndarray] = []
    exp_len = np.zeros(len(vocab), dtype=np.int64)
    estarts = np.zeros(len(vocab), dtype=np.int64)
    pos = 0
    for vi, ident in enumerate(vocab):
        if not ident:
            estarts[vi] = pos
            continue
        if analyzer_name == "simple":
            subs = [ident] if cfg_min <= len(ident) <= cfg_max else []
        elif analyzer_name == "stem":
            # per-DISTINCT-token suffix strip (clip applies to the STEM,
            # matching clip_tokens(stem_tokens(text)) in the Python path)
            s = stem_token(ident)
            subs = [s] if cfg_min <= len(s) <= cfg_max else []
        else:
            cached = ident_cache.get(ident)
            if cached is None:
                cached = ident_cache[ident] = [
                    t.lower()
                    for t in _CODE_SPLIT_RE.findall(ident)
                ]
            subs = [s for s in cached if cfg_min <= len(s) <= cfg_max]
        codes = np.empty(len(subs), dtype=np.int64)
        for j, s in enumerate(subs):
            c = sub_code.get(s)
            if c is None:
                c = sub_code[s] = len(sub_code)
            codes[j] = c
        exp_parts.append(codes)
        estarts[vi] = pos
        exp_len[vi] = len(subs)
        pos += len(subs)
    packed = (
        np.concatenate(exp_parts) if exp_parts else np.empty(0, dtype=np.int64)
    )

    lens = exp_len[indices]
    total = int(lens.sum())
    if total == 0:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.zeros(n, np.int32),
            sub_code,
        )
    starts = np.repeat(estarts[indices], lens)
    cum = np.cumsum(lens)
    intra = np.arange(total, dtype=np.int64) - np.repeat(cum - lens, lens)
    flat_codes = packed[starts + intra]
    doc_rel = np.repeat(doc_rel0, lens)
    dls = np.bincount(doc_rel, minlength=n).astype(np.int32)
    return flat_codes, doc_rel, dls, sub_code



def sha_nbytes(contents: list[str]) -> tuple[list[str], np.ndarray]:
    shas = []
    nbytes = np.zeros(len(contents), dtype=np.int64)
    for i, text in enumerate(contents):
        raw = text.encode("utf-8")
        shas.append(hashlib.sha256(raw).hexdigest())
        nbytes[i] = len(raw)
    return shas, nbytes


def sha_nbytes_arrow(arr: "pa.Array | pa.ChunkedArray") -> tuple[list[str], np.ndarray]:
    """Per-row sha256 + byte length straight from the Arrow string
    buffers (parquet strings are already utf-8): zero-copy memoryview
    slices into the data buffer instead of materializing every document
    as a Python str + bytes pair.  Identical digests to
    ``sha256(text.encode())`` (tested)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        # a null offset slices to b"" — silently hashing nulls would dedupe
        # null-text rows against genuinely-empty docs; fail loud like the
        # per-row `text.encode()` path did
        raise ValueError(
            f"sha_nbytes_arrow: {arr.null_count} null value(s) in text column; "
            "drop or fill nulls before hashing"
        )
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = arr.buffers()[2]
    mv = memoryview(data) if data is not None else memoryview(b"")
    shas = [
        hashlib.sha256(mv[offs[i]:offs[i + 1]]).hexdigest()
        for i in range(len(arr))
    ]
    return shas, np.diff(offs)


def invert_codes(
    flat_codes: np.ndarray, doc_rel: np.ndarray, n_terms: int, doc_base: int
):
    """Vectorized inversion over integer term codes (the
    :func:`invert_flat` kernel with factorize already done)."""
    if len(flat_codes) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.uint64), np.zeros(1, np.int64)
    key = (flat_codes << np.int64(32)) | doc_rel
    uk, tfs = np.unique(key, return_counts=True)
    tids = (uk >> np.int64(32)).astype(np.int64)
    docs = (uk & np.int64(0xFFFFFFFF)).astype(np.uint64) + np.uint64(doc_base)
    offsets = np.zeros(n_terms + 1, dtype=np.int64)
    np.cumsum(np.bincount(tids, minlength=n_terms), out=offsets[1:])
    return docs, tfs.astype(np.uint64), offsets


def in_doc_positions(doc_rel: np.ndarray) -> np.ndarray:
    """Per-token position within its document (0-based), given the
    nondecreasing flat token→doc map both tokenize paths produce."""
    n = len(doc_rel)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = doc_rel[1:] != doc_rel[:-1]
    starts = np.nonzero(change)[0]
    seg_len = np.diff(np.append(starts, n))
    return np.arange(n, dtype=np.int64) - np.repeat(starts, seg_len)


# shingle-term separator (ES ``index_phrases``): 0x1f can never appear
# in an analyzed token (every analyzer's split pattern strips it), so a
# term containing it is unambiguously a 2-token shingle
SHINGLE_SEP = "\x1f"


def add_shingle_stream(
    terms: list[str], codes: np.ndarray, rel: np.ndarray
) -> tuple[list[str], np.ndarray, np.ndarray, np.ndarray]:
    """Append the 2-token SHINGLE stream (ES ``index_phrases``) to a
    tokenized code stream: every in-doc adjacent token pair becomes one
    shingle token ``t1\\x1ft2`` at the FIRST token's position.  Returns
    the merged SORTED vocabulary and remapped (codes, rel, pos) streams
    — unigram positions are computed before the append, so doc lengths
    and unigram postings are untouched.  Output feeds
    :func:`invert_codes_pos` unchanged (shingle and unigram codes never
    share a (term, doc) group, and within one group original token
    order keeps positions ascending)."""
    pos = in_doc_positions(rel)
    if len(codes) < 2:
        return list(terms), codes, rel, pos
    adj = rel[1:] == rel[:-1]
    if not adj.any():
        return list(terms), codes, rel, pos
    nt = np.int64(len(terms))
    a, b = codes[:-1][adj], codes[1:][adj]
    upairs, pcodes = np.unique(a * nt + b, return_inverse=True)
    pair_terms = [
        terms[int(k // nt)] + SHINGLE_SEP + terms[int(k % nt)]
        for k in upairs
    ]
    all_terms = list(terms) + pair_terms
    order = sorted(range(len(all_terms)), key=all_terms.__getitem__)
    remap = np.empty(len(all_terms), dtype=np.int64)
    for rank, i in enumerate(order):
        remap[i] = rank
    new_codes = np.concatenate(
        [remap[codes], remap[len(terms) + pcodes]]
    )
    new_rel = np.concatenate([rel, rel[:-1][adj]])
    new_pos = np.concatenate([pos, pos[:-1][adj]])
    return [all_terms[i] for i in order], new_codes, new_rel, new_pos


def add_shingle_stream_flat(
    flat: list[str], rel: np.ndarray
) -> tuple[list[str], np.ndarray, np.ndarray]:
    """:func:`add_shingle_stream` for the per-doc string path (the
    groupby strategy / custom analyzers) — same output order contract
    (``pd.factorize(sort=True)`` downstream sorts the merged vocab), so
    segments stay byte-identical across strategies (tested)."""
    pos = in_doc_positions(rel)
    if len(flat) < 2:
        return list(flat), rel, pos
    adj = rel[1:] == rel[:-1]
    if not adj.any():
        return list(flat), rel, pos
    idx = np.nonzero(adj)[0]
    flat2 = list(flat) + [
        flat[i] + SHINGLE_SEP + flat[i + 1] for i in idx.tolist()
    ]
    rel2 = np.concatenate([rel, rel[:-1][adj]])
    pos2 = np.concatenate([pos, pos[:-1][adj]])
    return flat2, rel2, pos2


def shingle_mask(terms: list[str]) -> np.ndarray:
    """Bool mask over the term list: True for 2-token shingle terms —
    the ``encode_positions_many`` skip mask under
    ``shingle_positions=False`` (both build strategies derive it with
    this one helper, keeping segments byte-identical across them)."""
    return np.fromiter(
        (SHINGLE_SEP in t for t in terms), dtype=bool, count=len(terms)
    )


def unigram_token_total(terms: list[str], cfs: np.ndarray) -> int:
    """Σcf over UNIGRAM terms only — index stats (total_tokens → avgdl)
    must not count shingle tokens, or BM25 length normalization would
    shift under ``index_phrases``."""
    if not terms:
        return 0
    uni = np.fromiter(
        (SHINGLE_SEP not in t for t in terms), dtype=bool, count=len(terms)
    )
    return int(np.asarray(cfs)[uni].sum())


def invert_codes_pos(
    flat_codes: np.ndarray, doc_rel: np.ndarray, n_terms: int, doc_base: int,
    tokpos: np.ndarray,
):
    """:func:`invert_codes` + flat per-posting positions.

    Stable argsort on the same composite key np.unique sorts, so docs /
    tfs / offsets are IDENTICAL to the positionless kernel (tested);
    the stable order preserves original token order within each
    (term, doc) group, i.e. positions come out ascending."""
    if len(flat_codes) == 0:
        return (np.empty(0, np.uint64), np.empty(0, np.uint64),
                np.zeros(n_terms + 1, np.int64), np.empty(0, np.int64))
    key = (flat_codes << np.int64(32)) | doc_rel
    order = np.argsort(key, kind="stable")
    sk = key[order]
    posf = tokpos[order]
    boundary = np.empty(len(sk), dtype=bool)
    boundary[0] = True
    boundary[1:] = sk[1:] != sk[:-1]
    entry_idx = np.nonzero(boundary)[0]
    uk = sk[entry_idx]
    tfs = np.diff(np.append(entry_idx, len(sk)))
    tids = (uk >> np.int64(32)).astype(np.int64)
    docs = (uk & np.int64(0xFFFFFFFF)).astype(np.uint64) + np.uint64(doc_base)
    offsets = np.zeros(n_terms + 1, dtype=np.int64)
    np.cumsum(np.bincount(tids, minlength=n_terms), out=offsets[1:])
    return docs, tfs.astype(np.uint64), offsets, posf


def invert_flat_pos(flat_tokens, doc_rel: np.ndarray, doc_base: int,
                    tokpos: np.ndarray | None = None):
    """:func:`invert_flat` + flat per-posting positions (same term order
    — pd.factorize(sort=True) — and identical docs/tfs/offsets).
    ``tokpos`` overrides the derived in-doc positions (the shingle
    stream carries explicit first-token positions)."""
    import pandas as pd

    if not flat_tokens:
        return ([], np.empty(0, np.uint64), np.empty(0, np.uint64),
                np.zeros(1, np.int64), np.empty(0, np.int64))
    codes, uniques = pd.factorize(np.asarray(flat_tokens, dtype=object), sort=True)
    if tokpos is None:
        tokpos = in_doc_positions(doc_rel)
    docs, tfs, offsets, posf = invert_codes_pos(
        codes.astype(np.int64), doc_rel, len(uniques), doc_base, tokpos
    )
    return list(uniques), docs, tfs, offsets, posf


def invert_flat(flat_tokens, doc_rel: np.ndarray, doc_base: int):
    """One vectorized inversion: (terms sorted, flat doc_ids, flat tfs,
    offsets) ready for :func:`encode_postings_many`.

    ``doc_rel`` must fit in 32 bits (bounded by shard_target_docs — the
    same bound that caps merge memory), so (term_id << 32 | doc_rel) is a
    sortable composite key; one ``np.unique`` yields per-(term, doc) term
    frequencies with docs ascending within each term."""
    import pandas as pd

    if not flat_tokens:
        return [], np.empty(0, np.uint64), np.empty(0, np.uint64), np.zeros(1, np.int64)
    codes, uniques = pd.factorize(np.asarray(flat_tokens, dtype=object), sort=True)
    key = (codes.astype(np.int64) << np.int64(32)) | doc_rel
    uk, tfs = np.unique(key, return_counts=True)
    tids = (uk >> np.int64(32)).astype(np.int64)
    docs = (uk & np.int64(0xFFFFFFFF)).astype(np.uint64) + np.uint64(doc_base)
    offsets = np.zeros(len(uniques) + 1, dtype=np.int64)
    np.cumsum(np.bincount(tids, minlength=len(uniques)), out=offsets[1:])
    return list(uniques), docs, tfs.astype(np.uint64), offsets


def _analyzers(analyzer_name: str):
    """Resolve the analyzer once per task; 'per_lang' keys off the lang
    column.  The code analyzer gets a per-task identifier-memoizing
    variant (identical output, one camel-split per distinct identifier)."""
    from ..analysis.tokenizer import make_cached_code_tokens

    cached_code = make_cached_code_tokens()
    if analyzer_name == "per_lang":
        return lambda lang: (
            cached_code
            if analyzer_for_lang(lang) is get_analyzer("code")
            else analyzer_for_lang(lang)
        )
    if analyzer_name == "code":
        return lambda lang: cached_code
    fn = get_analyzer(analyzer_name)
    return lambda lang: fn


def docmeta_path(index_dir: str | Path, partition_id: int) -> Path:
    return Path(index_dir) / "docmeta" / f"part-{partition_id:05d}.parquet"


def parse_derived_meta(spec: str):
    """Resolve one ingest-time derived-field recipe string (the ES
    ingest-pipeline analogue; IndexConfig.derived_meta documents the
    grammar) → ``(name, src_cols, fn)`` with ``fn(tbl) -> pa.Array``.

    Recipes are strings, not callables, so they serialize into the build
    manifest's plan fingerprint and resolve identically inside Ray
    workers — the same reason analyzer names (not functions) travel in
    the manifest."""
    name, rest = spec.split("=", 1)
    kind, *args = rest.split(":")
    if kind == "ts_from_int":
        src, epoch0, mult, mod_s = args[0], int(args[1]), int(args[2]), int(args[3])

        def fn(tbl: pa.Table) -> pa.Array:
            v = tbl.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
            sec = epoch0 + (v * mult) % mod_s
            return pa.array(sec * 1_000_000).cast(pa.timestamp("us"))

        return name, (src,), fn
    if kind == "len_of":
        # character length of a string column (an ES ingest `script`
        # staple; gives schema-light corpora a numeric doc-values field)
        (src,) = args

        def fn(tbl: pa.Table) -> pa.Array:
            return pc.utf8_length(tbl.column(src)).cast(pa.int64()) \
                .combine_chunks()

        return name, (src,), fn
    if kind == "mod_of":
        # small-int field out of an integer column: src % m + plus (an
        # ES ingest `script` one-liner; e.g. a terms_set
        # minimum_should_match_field needs single-digit values) —
        # SQL-mirrorable verbatim as ``src % m + plus``
        src, m_s, plus_s = args
        m, plus = int(m_s), int(plus_s)
        if m < 1:
            raise ValueError(f"mod_of modulus must be >= 1 in {spec!r}")

        def fn(tbl: pa.Table) -> pa.Array:
            v = tbl.column(src).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            return pa.array(v % m + plus, pa.int64())

        return name, (src,), fn
    if kind == "group_of":
        # family anchor out of an integer column: (src // m) * m — the
        # deterministic parent-id recipe for the ES join-field analogue
        # (each run of m consecutive ids is one family whose first
        # member is the parent); SQL mirror: ``src - src % m``
        src, m_s = args
        m = int(m_s)
        if m < 1:
            raise ValueError(f"group_of modulus must be >= 1 in {spec!r}")

        def fn(tbl: pa.Table) -> pa.Array:
            v = tbl.column(src).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            return pa.array((v // m) * m, pa.int64())

        return name, (src,), fn
    if kind == "nullable_mod":
        # SPARSE small-int field: src % m where src % k != 0, NULL
        # otherwise — the deterministic nullable doc value the ES
        # ``missing`` aggregation / ``exists`` query need (real corpora
        # have optional fields; derived columns are total by default).
        # SQL mirror: ``CASE WHEN src % k = 0 THEN NULL ELSE src % m END``
        src, m_s, k_s = args
        m, kk = int(m_s), int(k_s)
        if m < 1 or kk < 1:
            raise ValueError(f"nullable_mod moduli must be >= 1 in {spec!r}")

        def fn(tbl: pa.Table) -> pa.Array:
            v = tbl.column(src).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            return pa.array(
                np.ma.masked_array(v % m, mask=(v % kk == 0)), pa.int64()
            )

        return name, (src,), fn
    if kind == "affine_mod":
        # gridded float field out of an integer column:
        # ((src * mult) % mod) / div - sub — the deterministic
        # geo-coordinate recipe (e.g. lat on a 0.01° grid over
        # [-85, 85)): integer modular arithmetic is exact, the single
        # float divide is SQL-mirrorable verbatim
        src, mult_s, mod_s, div_s, sub_s = args
        mult, mod, div, sub = int(mult_s), int(mod_s), float(div_s), float(sub_s)
        if mod < 1:
            raise ValueError(f"affine_mod modulus must be >= 1 in {spec!r}")

        def fn(tbl: pa.Table) -> pa.Array:
            v = tbl.column(src).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            return pa.array((v * mult) % mod / div - sub, pa.float64())

        return name, (src,), fn
    raise ValueError(f"unknown derived_meta kind {kind!r} in {spec!r}")


def segment_dir(index_dir: str | Path, shard_id: int) -> Path:
    return Path(index_dir) / "segments" / f"shard={shard_id:05d}"


class TokenizePartition:
    """Stateless-per-task tokenize stage (plain callable; analyzer tables are
    module-level compiled regexes, so tasks — not actors — are the right
    compute strategy, SURVEY.md §7.2)."""

    def __init__(self, index_dir: str, config: IndexConfig,
                 done_shards: frozenset[int]):
        self.index_dir = index_dir
        self.analyzer = config.analyzer
        self.cfg_min = config.min_token_len
        self.cfg_max = config.max_token_len
        self.block_size = config.block_size
        self.text_col = config.text_col
        self.lang_col = config.lang_col
        self.id_col = config.id_col
        self.meta_cols = tuple(config.meta_cols)
        self.codec = config.postings_codec
        self.store_positions = config.store_positions
        self.index_phrases = config.index_phrases
        self.shingle_positions = config.shingle_positions
        self.derived = [parse_derived_meta(s) for s in config.derived_meta]
        self.done_shards = done_shards

    def _read_columns(self) -> list[str]:
        derived_names = {name for name, _, _ in self.derived}
        cols: list[str] = [self.text_col]
        for c in (self.lang_col, self.id_col, *self.meta_cols):
            if c is not None and c not in cols and c not in derived_names:
                cols.append(c)
        for _, srcs, _ in self.derived:
            for c in srcs:
                if c not in cols:
                    cols.append(c)
        return cols

    def read_partition(self, row: dict) -> pa.Table:
        """Projected read of one partition (row-group span + row slice),
        plus ingest-time derived columns (computed AFTER the slice, so a
        derived value never depends on partitioning)."""
        pf = pq.ParquetFile(row["path"])
        tbl = pf.read_row_groups(
            list(range(row["row_group_start"], row["row_group_end"])),
            columns=self._read_columns(),
        )
        if row.get("row_start", -1) >= 0:
            tbl = tbl.slice(row["row_start"], row["row_end"] - row["row_start"])
        for name, _, fn in self.derived:
            tbl = tbl.append_column(name, fn(tbl))
        return tbl

    def write_docmeta(self, row: dict, tbl: pa.Table, dls, shas, nbytes) -> None:
        """Atomic, idempotent docmeta side-write — the doc store +
        per-partition lineage checkpoint."""
        dm = docmeta_path(self.index_dir, row["partition_id"])
        if dm.exists():
            return
        doc_base = row["doc_base"]
        n = tbl.num_rows
        dm.parent.mkdir(parents=True, exist_ok=True)
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            "doc_id": pa.array(np.arange(doc_base, doc_base + n, dtype=np.int64))
        }
        if self.id_col is not None:
            cols["orig_id"] = tbl.column(self.id_col)
        for mc in self.meta_cols:
            if mc != self.text_col:
                cols[mc] = tbl.column(mc)
        if self.lang_col is not None and self.lang_col not in cols:
            cols[self.lang_col] = tbl.column(self.lang_col)
        cols["dl"] = pa.array(dls)
        cols["n_bytes"] = pa.array(nbytes)
        cols["content_sha256"] = pa.array(shas, pa.string())
        meta_tbl = pa.table(cols)
        tmp = dm.with_name(dm.name + f".tmp-{os.getpid()}")
        pq.write_table(meta_tbl, tmp)
        os.replace(tmp, dm)

    def __call__(self, descs: pa.Table) -> pa.Table:
        out_shard, out_term, out_pid, out_df, out_cf, out_blob = [], [], [], [], [], []
        out_pos: list[bytes] = []
        analyzer_of = _analyzers(self.analyzer)
        for row in descs.to_pylist():
            if row["shard_id"] in self.done_shards:
                continue
            tbl = self.read_partition(row)
            contents = tbl.column(self.text_col).to_pylist()
            if self.lang_col is not None:
                langs = tbl.column(self.lang_col).to_pylist()
            else:
                langs = [""] * len(contents)
            doc_base = row["doc_base"]

            flat, doc_rel, dls, shas, nbytes = tokenize_flat(
                contents, langs, analyzer_of, self.cfg_min, self.cfg_max
            )
            self.write_docmeta(row, tbl, dls, shas, nbytes)
            if self.store_positions:
                posx = None
                if self.index_phrases:
                    flat, doc_rel, posx = add_shingle_stream_flat(
                        flat, doc_rel
                    )
                terms, ids_a, tfs_a, offs, posf = invert_flat_pos(
                    flat, doc_rel, doc_base, tokpos=posx
                )
                skip = (
                    shingle_mask(terms)
                    if self.index_phrases and not self.shingle_positions
                    else None
                )
                out_pos.extend(
                    encode_positions_many(posf, tfs_a, offs, skip=skip)
                )
            else:
                terms, ids_a, tfs_a, offs = invert_flat(flat, doc_rel, doc_base)
            blobs = encode_postings_many(ids_a, tfs_a, offs, self.block_size,
                                         self.codec)
            cfs = (
                np.add.reduceat(tfs_a.astype(np.int64), offs[:-1])
                if len(terms)
                else np.empty(0, dtype=np.int64)
            )
            out_shard.extend([row["shard_id"]] * len(terms))
            out_term.extend(terms)
            out_pid.extend([row["partition_id"]] * len(terms))
            out_df.extend(np.diff(offs).tolist())
            out_cf.extend(cfs.tolist())
            out_blob.extend(blobs)

        cols = {
            "shard_id": pa.array(out_shard, pa.int32()),
            "term": pa.array(out_term, pa.string()),
            "partition_id": pa.array(out_pid, pa.int32()),
            "df": pa.array(out_df, pa.int64()),
            "cf": pa.array(out_cf, pa.int64()),
            "blob": pa.array(out_blob, pa.large_binary()),
        }
        if self.store_positions:
            cols["posblob"] = pa.array(out_pos, pa.large_binary())
            return pa.table(cols, schema=_PARTIAL_SCHEMA_POS)
        return pa.table(cols, schema=_PARTIAL_SCHEMA)


def write_segment_atomic(index_dir: str | Path, shard_id: int, seg: pa.Table) -> None:
    """Atomic (tmp + rename) segment write; concurrent-retry safe."""
    final = segment_dir(index_dir, shard_id)
    tmp = final.with_name(final.name + f".tmp-{os.getpid()}")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    pq.write_table(seg, tmp / "segment.parquet", row_group_size=16_384)
    if final.exists():
        shutil.rmtree(tmp)  # lost the race to a concurrent retry — fine
    else:
        os.replace(tmp, final)


class WriteShardSegment:
    """Per-shard merge + atomic segment write (``map_groups`` over the
    shard-keyed shuffle).  Returns one summary row per shard."""

    def __init__(self, index_dir: str, block_size: int, codec: str = "varint",
                 index_phrases: bool = False):
        self.index_dir = index_dir
        self.block_size = block_size
        self.codec = codec
        self.index_phrases = index_phrases

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"shard_id": pa.array([], pa.int32()),
                             "num_terms": pa.array([], pa.int64()),
                             "num_postings": pa.array([], pa.int64()),
                             "total_tokens": pa.array([], pa.int64())})
        shard_id = int(group.column("shard_id")[0].as_py())
        group = group.sort_by([("term", "ascending"), ("partition_id", "ascending")])
        terms = group.column("term").to_pylist()
        blobs = group.column("blob").to_pylist()
        posblobs = (
            group.column("posblob").to_pylist()
            if "posblob" in group.column_names else None
        )

        # batch decode every part, then batch re-encode per distinct term:
        # all heavy work is O(1) numpy kernels over the shard's flat streams
        doc_flat, tf_flat, part_offs = decode_postings_many(blobs)
        n = len(terms)
        is_first = np.ones(n, dtype=bool)
        is_first[1:] = np.array(terms[1:]) != np.array(terms[:-1])
        group_rows = np.nonzero(is_first)[0]
        term_offs = np.concatenate([part_offs[group_rows], part_offs[-1:]])
        out_terms = [terms[i] for i in group_rows.tolist()]

        # partition order makes each merged list ascending; verify, and fix
        # the (never-expected) violation by a stable per-term sort
        interior = np.ones(len(doc_flat), dtype=bool)
        interior[term_offs[:-1]] = False
        if len(doc_flat) > 1:
            viol = interior & np.concatenate([[False], doc_flat[1:] <= doc_flat[:-1]])
            if viol.any() and posblobs is not None:
                # a per-term re-sort would misalign the doc-ordered
                # position spans; this branch is a never-expected repair
                raise ValueError(
                    "posting parts out of order with positions present"
                )
            if viol.any():
                for g in np.unique(np.searchsorted(term_offs, np.nonzero(viol)[0], "right") - 1):
                    lo, hi = int(term_offs[g]), int(term_offs[g + 1])
                    order = np.argsort(doc_flat[lo:hi], kind="stable")
                    doc_flat[lo:hi] = doc_flat[lo:hi][order]
                    tf_flat[lo:hi] = tf_flat[lo:hi][order]
                if not np.all(doc_flat[1:][interior[1:]] > doc_flat[:-1][interior[1:]]):
                    raise ValueError("duplicate doc_ids across posting parts")

        merged = encode_postings_many(doc_flat, tf_flat, term_offs,
                                      self.block_size, self.codec)
        out_df = np.diff(term_offs)
        out_cf = (
            np.add.reduceat(tf_flat.astype(np.int64), term_offs[:-1])
            if len(out_terms)
            else np.empty(0, dtype=np.int64)
        )
        out_maxtf = (
            np.maximum.reduceat(tf_flat.astype(np.int64), term_offs[:-1])
            if len(out_terms)
            else np.empty(0, dtype=np.int64)
        )
        n_postings = int(part_offs[-1])

        seg_cols = {
            "term": pa.array(out_terms, pa.string()),
            "df": pa.array(out_df, pa.int64()),
            "cf": pa.array(out_cf, pa.int64()),
            "max_tf": pa.array(out_maxtf, pa.int64()),
            "postings": pa.array(merged, pa.large_binary()),
        }
        if posblobs is not None:
            # per-doc-absolute varint restarts make position spans
            # byte-concatenable in the same partition order the postings
            # parts merged in (codec concat property, tested)
            bounds = np.append(group_rows, n)
            seg_cols["positions"] = pa.array(
                [
                    b"".join(posblobs[int(bounds[i]):int(bounds[i + 1])])
                    for i in range(len(out_terms))
                ],
                pa.large_binary(),
            )
            seg = pa.table(seg_cols, schema=SEGMENT_SCHEMA_POS)
        else:
            seg = pa.table(seg_cols, schema=SEGMENT_SCHEMA)
        write_segment_atomic(self.index_dir, shard_id, seg)
        return pa.table(
            {
                "shard_id": pa.array([shard_id], pa.int32()),
                "num_terms": pa.array([len(out_terms)], pa.int64()),
                "num_postings": pa.array([n_postings], pa.int64()),
                "total_tokens": pa.array(
                    [unigram_token_total(out_terms, out_cf)
                     if self.index_phrases else int(out_cf.sum())],
                    pa.int64(),
                ),
            }
        )


class BuildShard:
    """Fused tokenize+merge: one task builds one complete shard segment.

    A shard is a *contiguous* partition range fixed at plan time, so the
    partials→shard exchange the groupby strategy performs is a planned,
    deterministic routing — executing it as a generic sort shuffle moves
    every posting byte through an all-to-all for nothing.  This stage
    reads the shard's partitions in order, accumulates postings in one
    dict (bounded by ``shard_target_docs`` — the doc-range salt that caps
    even a 100%-df term), then batch-encodes and atomically writes the
    segment.  Zero shuffle; scales as #shards, which grows linearly with
    the corpus.  (The ``groupby`` strategy remains for exchanges Ray must
    schedule, and as the semantic spec of this fused form.)
    """

    def __init__(self, index_dir: str, config: IndexConfig, parts_ref):
        self.index_dir = index_dir
        self.config = config
        self.parts_ref = parts_ref  # ray.put({shard_id: [partition dict]})
        self._parts = None
        self.tokenizer = TokenizePartition(index_dir, config, frozenset())

    def _shard_parts(self) -> dict[int, list[dict]]:
        if self._parts is None:
            import ray

            self._parts = ray.get(self.parts_ref)
        return self._parts

    def __call__(self, descs: pa.Table) -> pa.Table:
        out_rows = []
        cfg = self.config
        analyzer_of = _analyzers(cfg.analyzer)
        arrow_path = cfg.analyzer in ("code", "simple", "stem")
        if arrow_path and not hasattr(self, "_ident_cache"):
            self._ident_cache: dict = {}
        for shard_id in descs.column("shard_id").to_pylist():
            shard_parts = self._shard_parts()[shard_id]
            shard_base = min(p["doc_base"] for p in shard_parts)
            n_docs = 0
            if arrow_path:
                # Arrow-kernel tokenize over the whole shard's text column
                # at once (C split + dict-encode + integer gathers); the
                # per-doc Python path below is kept for per_lang/custom
                # analyzers and as the byte-identity semantic reference
                tbls = [self.tokenizer.read_partition(p) for p in shard_parts]
                text = pa.chunked_array(
                    [t.column(cfg.text_col).combine_chunks() for t in tbls]
                )
                # chunked: shared sub-vocabulary, one sorted remap at the
                # end — bit-identical to the single-call kernel but keeps
                # each chunk's intermediates cache-sized (a single 64k-doc
                # call measured 6× slower than the same docs chunked)
                terms, codes, rel, dls_all = tokenize_codes_arrow_chunked(
                    text, cfg.analyzer, cfg.min_token_len, cfg.max_token_len,
                    self._ident_cache,
                )
                off = 0
                for prow, tbl in zip(shard_parts, tbls):
                    nrows = tbl.num_rows
                    shas, nbytes = sha_nbytes_arrow(tbl.column(cfg.text_col))
                    self.tokenizer.write_docmeta(
                        prow, tbl, dls_all[off:off + nrows], shas, nbytes
                    )
                    off += nrows
                    n_docs += nrows
                if cfg.store_positions:
                    if cfg.index_phrases:
                        terms, codes, rel, posx = add_shingle_stream(
                            terms, codes, rel
                        )
                    else:
                        posx = in_doc_positions(rel)
                    ids_a, tfs_a, offs, posf = invert_codes_pos(
                        codes, rel, len(terms), shard_base, posx
                    )
                else:
                    ids_a, tfs_a, offs = invert_codes(codes, rel, len(terms), shard_base)
            else:
                all_flat: list[str] = []
                rel_chunks: list[np.ndarray] = []
                for prow in shard_parts:
                    tbl = self.tokenizer.read_partition(prow)
                    contents = tbl.column(cfg.text_col).to_pylist()
                    langs = (
                        tbl.column(cfg.lang_col).to_pylist()
                        if cfg.lang_col is not None
                        else [""] * len(contents)
                    )
                    flat, doc_rel, dls, shas, nbytes = tokenize_flat(
                        contents, langs, analyzer_of, cfg.min_token_len, cfg.max_token_len
                    )
                    self.tokenizer.write_docmeta(prow, tbl, dls, shas, nbytes)
                    all_flat.extend(flat)
                    rel_chunks.append(doc_rel + (prow["doc_base"] - shard_base))
                    n_docs += len(contents)

                rel = (
                    np.concatenate(rel_chunks) if rel_chunks else np.empty(0, np.int64)
                )
                if cfg.store_positions:
                    posx = None
                    if cfg.index_phrases:
                        all_flat, rel, posx = add_shingle_stream_flat(
                            all_flat, rel
                        )
                    terms, ids_a, tfs_a, offs, posf = invert_flat_pos(
                        all_flat, rel, shard_base, tokpos=posx
                    )
                else:
                    terms, ids_a, tfs_a, offs = invert_flat(all_flat, rel, shard_base)
            blobs = encode_postings_many(ids_a, tfs_a, offs, cfg.block_size,
                                         cfg.postings_codec)
            maxtf = (
                np.maximum.reduceat(tfs_a.astype(np.int64), offs[:-1])
                if terms
                else np.empty(0, dtype=np.int64)
            )
            cfs = (
                np.add.reduceat(tfs_a.astype(np.int64), offs[:-1])
                if terms
                else np.empty(0, dtype=np.int64)
            )
            seg_cols = {
                "term": pa.array(terms, pa.string()),
                "df": pa.array(np.diff(offs), pa.int64()),
                "cf": pa.array(cfs, pa.int64()),
                "max_tf": pa.array(maxtf, pa.int64()),
                "postings": pa.array(blobs, pa.large_binary()),
            }
            if cfg.store_positions:
                skip = (
                    shingle_mask(terms)
                    if cfg.index_phrases and not cfg.shingle_positions
                    else None
                )
                seg_cols["positions"] = pa.array(
                    encode_positions_many(posf, tfs_a, offs, skip=skip),
                    pa.large_binary(),
                )
                seg = pa.table(seg_cols, schema=SEGMENT_SCHEMA_POS)
            else:
                seg = pa.table(seg_cols, schema=SEGMENT_SCHEMA)
            write_segment_atomic(self.index_dir, shard_id, seg)
            total_toks = (
                unigram_token_total(terms, cfs)
                if cfg.index_phrases else int(cfs.sum())
            )
            out_rows.append((shard_id, len(terms), int(offs[-1]), total_toks))
        return pa.table(
            {
                "shard_id": pa.array([r[0] for r in out_rows], pa.int32()),
                "num_terms": pa.array([r[1] for r in out_rows], pa.int64()),
                "num_postings": pa.array([r[2] for r in out_rows], pa.int64()),
                "total_tokens": pa.array([r[3] for r in out_rows], pa.int64()),
            }
        )


@dataclass(frozen=True)
class IndexStats:
    num_docs: int
    total_tokens: int
    avgdl: float
    num_shards: int


class IndexInfo:
    """Handle to a built index: manifest, stats, layout helpers."""

    def __init__(self, index_dir: str | Path):
        self.index_dir = Path(index_dir)
        m = BuildManifest.load(self.index_dir)
        if m is None:
            raise FileNotFoundError(f"no index manifest in {self.index_dir}")
        self.manifest = m
        import json

        s = json.loads((self.index_dir / STATS_NAME).read_text())
        self.stats = IndexStats(**s)

    def shard_ids(self) -> list[int]:
        return sorted(self.manifest.shards)

    def segment_path(self, shard_id: int) -> Path:
        return segment_dir(self.index_dir, shard_id) / "segment.parquet"

    def docmeta_paths(self, shard_id: int) -> list[Path]:
        return [
            docmeta_path(self.index_dir, pid)
            for pid in self.manifest.shards[shard_id].partition_ids
        ]

    def metrics(self) -> pa.Table:
        """Per-shard build metrics + lineage (the north rule's
        "per-partition checkpoints with lineage and doc/term-count
        metrics" made queryable)."""
        shards = sorted(self.manifest.shards.values(), key=lambda s: s.shard_id)
        return pa.table(
            {
                "shard_id": pa.array([s.shard_id for s in shards], pa.int32()),
                "status": pa.array([s.status for s in shards], pa.string()),
                "doc_base": pa.array([s.doc_base for s in shards], pa.int64()),
                "num_docs": pa.array([s.num_docs for s in shards], pa.int64()),
                "num_terms": pa.array([s.num_terms for s in shards], pa.int64()),
                "num_postings": pa.array([s.num_postings for s in shards], pa.int64()),
                "total_tokens": pa.array([s.total_tokens for s in shards], pa.int64()),
                "num_partitions": pa.array(
                    [len(s.partition_ids) for s in shards], pa.int64()
                ),
                "segment_path": pa.array([s.segment_path for s in shards], pa.string()),
            }
        )


    def cat(self) -> dict:
        """ES ``_cat/indices``-style one-row summary: live/deleted doc
        counts, term/posting/token totals, store bytes, shard count —
        footer-and-stat reads only, never a data scan."""
        import os

        from .deletes import load_deletes, load_dropped_archive

        shards = self.manifest.shards.values()
        seg_bytes = sum(
            os.path.getsize(self.segment_path(s.shard_id)) for s in shards
        )
        dm_bytes = sum(
            os.path.getsize(p)
            for s in shards
            for p in self.docmeta_paths(s.shard_id)
        )
        deleted = sum(
            len(
                np.setdiff1d(
                    load_deletes(self.index_dir, s.shard_id),
                    load_dropped_archive(self.index_dir, s.shard_id),
                )
            )
            for s in shards
        )
        return {
            "docs_count": self.stats.num_docs - deleted,
            "docs_deleted": int(deleted),  # pending tombstones
            "shards": self.stats.num_shards,
            "terms": sum(s.num_terms for s in shards),  # per-shard sum
            "postings": sum(s.num_postings for s in shards),
            "total_tokens": self.stats.total_tokens,
            "avgdl": self.stats.avgdl,
            "segments_bytes": seg_bytes,
            "docmeta_bytes": dm_bytes,
            "store_bytes": seg_bytes + dm_bytes,
            "analyzer": self.manifest.analyzer,
            "store_positions": bool(
                getattr(self.manifest, "store_positions", False)
            ),
            "index_phrases": bool(
                getattr(self.manifest, "index_phrases", False)
            ),
            "shingle_positions": bool(
                getattr(self.manifest, "shingle_positions", True)
            ),
        }


def build_index(
    corpus: str | Path | list[str],
    index_dir: str | Path,
    config: IndexConfig | None = None,
    *,
    resume: bool = True,
) -> IndexInfo:
    """Build (or resume) an inverted index over a Parquet corpus."""
    config = config or IndexConfig()
    index_dir = Path(index_dir)
    index_dir.mkdir(parents=True, exist_ok=True)

    plan = plan_build(
        corpus,
        config.analyzer,
        config.partition_target_docs,
        config.shard_target_docs,
        config.block_size,
        text_col=config.text_col,
        lang_col=config.lang_col,
        id_col=config.id_col,
        meta_cols=tuple(config.meta_cols),
        postings_codec=config.postings_codec,
        min_token_len=config.min_token_len,
        max_token_len=config.max_token_len,
        store_positions=config.store_positions,
        derived_meta=tuple(config.derived_meta),
        index_phrases=config.index_phrases,
        shingle_positions=config.shingle_positions,
    )
    existing = BuildManifest.load(index_dir) if resume else None
    if existing is not None and existing.plan_fingerprint() == plan.plan_fingerprint():
        manifest = existing
    elif existing is not None:
        appended = plan_append(
            existing,
            corpus,
            config.analyzer,
            config.partition_target_docs,
            config.shard_target_docs,
            config.block_size,
            text_col=config.text_col,
            lang_col=config.lang_col,
            id_col=config.id_col,
            meta_cols=tuple(config.meta_cols),
            postings_codec=config.postings_codec,
            min_token_len=config.min_token_len,
            max_token_len=config.max_token_len,
            store_positions=config.store_positions,
            derived_meta=tuple(config.derived_meta),
            index_phrases=config.index_phrases,
            shingle_positions=config.shingle_positions,
        )
        if appended is not None:
            # incremental append: old shards stay checkpointed, only new
            # files get partitions/shards (streaming micro-batch
            # analogue).  Partitions of files MODIFIED in place carry a
            # dirty mark: their docmeta side-writes are idempotent by
            # file presence, so the stale ones must go BEFORE the new
            # manifest lands (a crash between the two re-plans and
            # re-deletes on the next run — both orders are safe, this
            # one can never serve stale docmeta)
            manifest = appended
            if appended is not existing:
                for pid in getattr(appended, "dirty_partition_ids", []):
                    docmeta_path(index_dir, pid).unlink(missing_ok=True)
                manifest.save(index_dir)
        else:
            # incompatible plan: clear derived state, full rebuild —
            # including tombstones AND compaction archives (the rebuild
            # re-indexes every corpus doc, so nothing stays "dropped")
            for sub in ("segments", "docmeta", "deletes"):
                shutil.rmtree(index_dir / sub, ignore_errors=True)
            manifest = plan
            manifest.save(index_dir)
    else:
        if not resume:
            for sub in ("segments", "docmeta", "deletes"):
                shutil.rmtree(index_dir / sub, ignore_errors=True)
        manifest = plan
        manifest.save(index_dir)

    done = frozenset(
        sid
        for sid, s in manifest.shards.items()
        if s.status == "done" and (segment_dir(index_dir, sid) / "segment.parquet").exists()
    )
    # a PENDING shard with a segment on disk is stale (modified source
    # file) or a crash remnant (segment written, status update lost —
    # rebuilding reproduces it byte-identically); either way it must not
    # survive, or write_segment_atomic's lost-the-race branch would keep
    # it over the fresh rebuild
    for sid in manifest.shards:
        if sid not in done and segment_dir(index_dir, sid).exists():
            shutil.rmtree(segment_dir(index_dir, sid), ignore_errors=True)
    # a shard being REBUILT from the corpus (e.g. its segment was lost in
    # a compaction crash window) re-indexes its compacted-away docs; turn
    # the archive back into tombstones so those docs stay masked and the
    # stats subtraction stays truthful
    from .deletes import clear_dropped_archive, load_dropped_archive as _lda

    for sid in manifest.shards:
        if sid in done:
            continue
        arch = _lda(index_dir, sid)
        if len(arch):
            from .deletes import deletes_path, load_deletes

            merged = np.union1d(load_deletes(index_dir, sid), arch)
            dp = deletes_path(index_dir, sid)
            dp.parent.mkdir(parents=True, exist_ok=True)
            tmp = dp.with_name(f".tmp-{os.getpid()}-{dp.name}")
            with open(tmp, "wb") as fh:
                np.save(fh, merged)
            os.replace(tmp, dp)
            clear_dropped_archive(index_dir, sid)
    pending_parts = [
        asdict(p) for p in manifest.partitions if p.shard_id not in done
    ]

    if pending_parts:
        if config.merge_strategy == "fused":
            import ray as _ray

            by_shard: dict[int, list[dict]] = {}
            for p in pending_parts:
                by_shard.setdefault(p["shard_id"], []).append(p)
            for v in by_shard.values():
                v.sort(key=lambda r: r["partition_id"])
            parts_ref = _ray.put(by_shard)  # broadcast once, read per task
            summaries = (
                rd.from_items([{"shard_id": s} for s in sorted(by_shard)])
                .map_batches(
                    BuildShard(str(index_dir), config, parts_ref),
                    batch_format="pyarrow",
        zero_copy_batch=True,
                    batch_size=1,
                )
                .take_all()  # one tiny row per shard
            )
        else:
            partials = rd.from_items(pending_parts).map_batches(
                TokenizePartition(str(index_dir), config, done),
                batch_format="pyarrow",
        zero_copy_batch=True,
                batch_size=1,
            )
            writer = WriteShardSegment(str(index_dir), config.block_size,
                                       config.postings_codec,
                                       config.index_phrases)

            def write_shard_segment(group: pa.Table) -> pa.Table:
                return writer(group)

            summaries = (
                partials.groupby("shard_id")
                .map_groups(write_shard_segment, batch_format="pyarrow", zero_copy_batch=True)
                .take_all()  # one tiny row per shard
            )
        for row in summaries:
            s = manifest.shards[int(row["shard_id"])]
            s.status = "done"
            s.num_terms = int(row["num_terms"])
            s.num_postings = int(row["num_postings"])
            s.total_tokens = int(row["total_tokens"])
            s.segment_path = str(segment_dir(index_dir, s.shard_id))
        manifest.save(index_dir)

    missing = [s for s in manifest.shards.values() if s.status != "done" and s.num_docs > 0]
    if missing:
        raise RuntimeError(f"build incomplete: shards {[s.shard_id for s in missing]}")

    # global stats (N, avgdl) — summed from the per-shard summaries the
    # build already returned (zero extra scans; checkpointed in the
    # manifest so resume needs no recompute)
    stats_path = index_dir / STATS_NAME
    if not pending_parts and stats_path.exists():
        return IndexInfo(index_dir)
    total_tokens = sum(s.total_tokens for s in manifest.shards.values())
    num_docs = manifest.total_docs
    # docs physically removed by compaction stay subtracted across
    # appends/resume: the per-shard dropped archives (ids + cumulative dl
    # mass, written at compaction time) are the durable O(1) record
    from .deletes import load_dropped_archive, load_dropped_tokens

    for sid in manifest.shards:
        arch = load_dropped_archive(index_dir, sid)
        if len(arch) == 0:
            continue
        num_docs -= len(arch)
        total_tokens -= load_dropped_tokens(index_dir, sid)
    stats = IndexStats(
        num_docs=num_docs,
        total_tokens=total_tokens,
        avgdl=total_tokens / num_docs if num_docs else 0.0,
        num_shards=len(manifest.shards),
    )
    import json

    atomic_write_text(stats_path, json.dumps(asdict(stats)))
    return IndexInfo(index_dir)
