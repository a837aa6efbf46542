"""Posting-list codec: delta-encoded doc-id gaps + vectorized varint,
with per-block max-tf metadata and skip offsets (block-max structure).

The reference delegates this entirely to Elasticsearch/Lucene; the format
here is our own, designed for zero-copy Arrow transport: a posting part is
a single ``bytes`` value (``large_binary`` column) that decodes with numpy
only — no per-posting Python loops.

Blob layout (little-endian)::

    header: magic:u32  n_docs:u32  n_blocks:u32  block_size:u32
            docid_bytes:u32  tf_bytes:u32
    block_last_doc : u64[n_blocks]   last doc_id of each block
    block_max_tf   : u32[n_blocks]   max term frequency within the block
    block_doc_off  : u32[n_blocks]   index (in docs) of block start
    block_did_off  : u32[n_blocks]   byte offset of block start in docid stream
    block_tf_off   : u32[n_blocks]   byte offset of block start in tf stream
    docid stream   : varint deltas; first delta of block i is relative to
                     block_last_doc[i-1] (block 0: relative to -1), so any
                     block decodes independently — the WAND skip path reads
                     only the blocks it needs.
    tf stream      : varint(tf - 1), block-aligned like the docid stream

Doc ids are strictly increasing within a part; parts (one per doc-range)
concatenate in range order, mirroring the reference's id-prefix sub-slices
(``asset/id_reader/id_slicer.js:83-99``) where a hot key fans out into
ordered sub-ranges.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_MAGIC = 0x45415250  # "PRAE" — varint streams
_MAGIC_FOR = 0x464F5250  # "PROF" — frame-of-reference bit-packed streams
_HEADER_DTYPE = np.dtype(
    [
        ("magic", "<u4"),
        ("n_docs", "<u4"),
        ("n_blocks", "<u4"),
        ("block_size", "<u4"),
        ("docid_bytes", "<u4"),
        ("tf_bytes", "<u4"),
    ]
)


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length of each value (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    lengths = np.ones(len(v), dtype=np.int64)
    for k in range(1, 10):
        lengths += v >= np.uint64(1) << np.uint64(7 * k)
    return lengths


def encode_varint(values: np.ndarray, lengths: np.ndarray | None = None) -> np.ndarray:
    """Vectorized LEB128 varint encode of a uint64 array → uint8 array.

    The scratch matrix is (n, max encoded length) — NOT a fixed (n, 10):
    gap streams (postings deltas, position deltas) are overwhelmingly 1-2
    bytes per value, and trimming the matrix to the true max width cuts
    the encode's memory traffic ~5× (measured: the 10-wide scratch made
    position-sidecar encoding the dominant cost of a positional build).
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return np.empty(0, dtype=np.uint8)
    if lengths is None:
        lengths = varint_lengths(v)
    width = int(lengths.max())
    out = np.empty((n, width), dtype=np.uint8)
    tmp = v.copy()
    seven = np.uint64(7)
    for i in range(width):
        out[:, i] = (tmp & np.uint64(0x7F)).astype(np.uint8)
        tmp >>= seven
    cols = np.arange(width)[None, :]
    out[cols < (lengths - 1)[:, None]] |= 0x80
    return out[cols < lengths[:, None]]


def decode_varint(buf: np.ndarray) -> np.ndarray:
    """Vectorized varint decode of a uint8 array → uint64 array."""
    b = np.ascontiguousarray(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.nonzero(b < 0x80)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(len(ends), dtype=np.uint64)
    for j in range(int(lengths.max())):
        m = lengths > j
        vals[m] |= (b[starts[m] + j].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(
            7 * j
        )
    return vals


def _pack_for(values: np.ndarray) -> bytes:
    """FOR-pack one block: [width:u8][ceil(n*width/8) bytes, LSB-first].

    Width is the bit length of the block maximum (the PForDelta family
    without exception patching — per-block frame of reference)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    width = max(1, int(v.max()).bit_length()) if len(v) else 1
    bits = ((v[:, None] >> np.arange(width, dtype=np.uint64)[None, :]) & np.uint64(1)
            ).astype(np.uint8).reshape(-1)
    return bytes([width]) + np.packbits(bits, bitorder="little").tobytes()


def _unpack_for(buf: np.ndarray, count: int) -> np.ndarray:
    """Inverse of :func:`_pack_for`; ``buf`` starts at the width byte."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    width = int(buf[0])
    bits = np.unpackbits(buf[1 : 1 + (count * width + 7) // 8],
                         count=count * width, bitorder="little")
    return (
        bits.reshape(count, width).astype(np.uint64)
        << np.arange(width, dtype=np.uint64)[None, :]
    ).sum(axis=1, dtype=np.uint64)


@dataclass(frozen=True)
class PostingsMeta:
    """Parsed header + block metadata of a postings blob (no payload decode)."""

    n_docs: int
    n_blocks: int
    block_size: int
    codec: str  # "varint" | "for"
    block_last_doc: np.ndarray  # u64[n_blocks]
    block_max_tf: np.ndarray  # u32[n_blocks]
    block_doc_off: np.ndarray  # u32[n_blocks]
    block_did_off: np.ndarray  # u32[n_blocks]
    block_tf_off: np.ndarray  # u32[n_blocks]
    _docid_stream: np.ndarray  # u8
    _tf_stream: np.ndarray  # u8


def encode_postings_many(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    offsets: np.ndarray,
    block_size: int = 128,
    codec: str = "varint",
) -> list[bytes]:
    """Encode T posting lists in one vectorized pass → T blobs.

    ``doc_ids``/``tfs`` are the concatenation of all lists; ``offsets``
    (int64, len T+1) delimits them.  Produces bytes identical to calling
    :func:`encode_postings` per list, but with O(1) numpy kernel launches
    instead of O(T) — the tokenize stage calls this once per partition
    (thousands of terms), where per-term encoding was the CPU hot spot
    under multi-worker memory contention.
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    T = len(offsets) - 1
    n = len(doc_ids)
    if n != len(tfs):
        raise ValueError("doc_ids and tfs length mismatch")
    if T == 0:
        return []
    # shared validation for BOTH codecs: no empty/negative lists, and the
    # u32 header fields must not wrap (a >4 GiB stream or >2^32-doc list
    # would silently encode a corrupt blob)
    if (np.diff(offsets) <= 0).any():
        raise ValueError("empty posting lists not supported in batch encode")
    if np.diff(offsets).max() >= 1 << 32:
        raise ValueError("posting list exceeds 2^32 docs (u32 header field)")
    if codec == "for":
        # optional codec: per-list loop (block loop inside); the varint
        # default keeps the fully-batched fast path
        return [
            _encode_postings_for(doc_ids[offsets[t]:offsets[t + 1]],
                                 tfs[offsets[t]:offsets[t + 1]], block_size)
            for t in range(T)
        ]
    if codec != "varint":
        raise ValueError(f"unknown postings codec {codec!r}")
    starts = offsets[:-1]
    n_t = np.diff(offsets)

    # per-list gap encoding, computed flat: interior deltas are plain diffs,
    # each list's first delta is its first doc_id + 1 (relative to -1)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[1:] = doc_ids[1:] - doc_ids[:-1]
    deltas[starts] = doc_ids[starts] + np.uint64(1)

    tf0 = tfs - np.uint64(1)
    did_lens = varint_lengths(deltas)
    tf_lens = varint_lengths(tf0)
    did_stream = encode_varint(deltas, did_lens).tobytes()
    tf_stream = encode_varint(tf0, tf_lens).tobytes()
    did_cum = np.concatenate([[0], np.cumsum(did_lens)])
    tf_cum = np.concatenate([[0], np.cumsum(tf_lens)])

    # global block table: every list's blocks, in list order
    nb_t = (n_t + block_size - 1) // block_size
    total_blocks = int(nb_t.sum())
    term_of_block = np.repeat(np.arange(T), nb_t)
    nb_cum = np.concatenate([[0], np.cumsum(nb_t)])
    block_ord = np.arange(total_blocks) - nb_cum[term_of_block]
    block_starts = starts[term_of_block] + block_ord * block_size
    block_ends = np.minimum(block_starts + block_size, offsets[term_of_block + 1])
    block_last = doc_ids[block_ends - 1].astype("<u8")
    block_max = np.maximum.reduceat(tfs, block_starts).astype("<u4")
    block_doc_off = (block_starts - starts[term_of_block]).astype("<u4")
    block_did_off = (did_cum[block_starts] - did_cum[starts[term_of_block]]).astype("<u4")
    block_tf_off = (tf_cum[block_starts] - tf_cum[starts[term_of_block]]).astype("<u4")

    headers = np.zeros(T, dtype=_HEADER_DTYPE)
    headers["magic"] = _MAGIC
    headers["n_docs"] = n_t
    headers["n_blocks"] = nb_t
    headers["block_size"] = block_size
    did_t_lo = did_cum[starts]
    did_t_hi = did_cum[offsets[1:]]
    tf_t_lo = tf_cum[starts]
    tf_t_hi = tf_cum[offsets[1:]]
    if int((did_t_hi - did_t_lo).max()) >= 1 << 32 or int(
        (tf_t_hi - tf_t_lo).max()
    ) >= 1 << 32:
        raise ValueError(
            "posting stream exceeds 4 GiB (u32 header field) — lower "
            "shard_target_docs or salt the term"
        )
    headers["docid_bytes"] = did_t_hi - did_t_lo
    headers["tf_bytes"] = tf_t_hi - tf_t_lo

    bl_b = block_last.tobytes()
    bm_b = block_max.tobytes()
    bdo_b = block_doc_off.tobytes()
    bdi_b = block_did_off.tobytes()
    btf_b = block_tf_off.tobytes()
    out: list[bytes] = []
    for t in range(T):
        b_lo, b_hi = int(nb_cum[t]), int(nb_cum[t + 1])
        out.append(
            headers[t].tobytes()
            + bl_b[b_lo * 8 : b_hi * 8]
            + bm_b[b_lo * 4 : b_hi * 4]
            + bdo_b[b_lo * 4 : b_hi * 4]
            + bdi_b[b_lo * 4 : b_hi * 4]
            + btf_b[b_lo * 4 : b_hi * 4]
            + did_stream[int(did_t_lo[t]) : int(did_t_hi[t])]
            + tf_stream[int(tf_t_lo[t]) : int(tf_t_hi[t])]
        )
    return out


def decode_postings_many(
    blobs: list[bytes],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode many blobs in one vectorized pass →
    (doc_ids flat u64, tfs flat u64, offsets int64[len(blobs)+1]).

    Headers parse per blob (cheap); the payload varint streams decode as
    ONE concatenated buffer with a segmented cumsum — no per-blob kernels.
    """
    metas = [read_meta(b) for b in blobs]
    counts = np.array([m.n_docs for m in metas], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    if any(m.codec != "varint" for m in metas):
        decoded = [decode_postings(b) for b in blobs]
        return (
            np.concatenate([d for d, _ in decoded]) if decoded else np.empty(0, np.uint64),
            np.concatenate([t for _, t in decoded]) if decoded else np.empty(0, np.uint64),
            offsets,
        )
    if offsets[-1] == 0:
        return (
            np.empty(0, dtype=np.uint64),
            np.empty(0, dtype=np.uint64),
            offsets,
        )
    did_cat = np.concatenate([m._docid_stream for m in metas if m.n_docs])
    tf_cat = np.concatenate([m._tf_stream for m in metas if m.n_docs])
    deltas = decode_varint(did_cat)
    tfs = decode_varint(tf_cat) + np.uint64(1)
    c = np.cumsum(deltas, dtype=np.uint64)
    starts = offsets[:-1][counts > 0]
    base = np.zeros(len(starts), dtype=np.uint64)
    base[1:] = c[starts[1:] - 1]
    seg_counts = counts[counts > 0]
    doc_ids = c - np.repeat(base, seg_counts) - np.uint64(1)
    return doc_ids, tfs, offsets


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, block_size: int = 128,
    codec: str = "varint",
) -> bytes:
    """Encode sorted unique ``doc_ids`` (+ per-doc ``tfs`` >= 1) into a blob.

    ``codec="varint"`` → LEB128 gap streams; ``codec="for"`` → per-block
    frame-of-reference bit packing (the PForDelta family without
    exception patching).  Decoders auto-detect via the magic."""
    if codec == "for":
        return _encode_postings_for(doc_ids, tfs, block_size)
    if codec != "varint":
        raise ValueError(f"unknown postings codec {codec!r}")
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    n = len(doc_ids)
    if n != len(tfs):
        raise ValueError("doc_ids and tfs length mismatch")
    n_blocks = (n + block_size - 1) // block_size

    # gap encoding; block i's first delta is relative to block i-1's last
    # doc, which is simply the preceding doc — blocks decode independently
    # (given block_last_doc[i-1]) yet the stream is one contiguous cumsum.
    deltas = np.empty(n, dtype=np.uint64)
    if n:
        deltas[0] = doc_ids[0] + np.uint64(1)  # relative to -1
        deltas[1:] = doc_ids[1:] - doc_ids[:-1]

    # encode each stream ONCE; block byte offsets fall out of per-value lengths
    tf0 = tfs - np.uint64(1)
    did_lens = varint_lengths(deltas)
    tf_lens = varint_lengths(tf0)
    did_stream = encode_varint(deltas, did_lens)
    tf_stream = encode_varint(tf0, tf_lens)
    if n:
        block_starts = np.arange(n_blocks, dtype=np.int64) * block_size
        block_ends = np.minimum(block_starts + block_size, n)
        did_cum = np.concatenate([[0], np.cumsum(did_lens)])
        tf_cum = np.concatenate([[0], np.cumsum(tf_lens)])
        block_last = doc_ids[block_ends - 1]
        block_max = np.maximum.reduceat(tfs, block_starts).astype(np.uint32)
        block_doc_off = block_starts.astype(np.uint32)
        block_did_off = did_cum[block_starts].astype(np.uint32)
        block_tf_off = tf_cum[block_starts].astype(np.uint32)
    else:
        block_last = np.empty(0, dtype=np.uint64)
        block_max = np.empty(0, dtype=np.uint32)
        block_doc_off = block_did_off = block_tf_off = np.empty(0, dtype=np.uint32)

    header = np.zeros(1, dtype=_HEADER_DTYPE)
    header["magic"] = _MAGIC
    header["n_docs"] = n
    header["n_blocks"] = n_blocks
    header["block_size"] = block_size
    header["docid_bytes"] = len(did_stream)
    header["tf_bytes"] = len(tf_stream)
    parts = [
        header.tobytes(),
        block_last.astype("<u8").tobytes(),
        block_max.astype("<u4").tobytes(),
        block_doc_off.astype("<u4").tobytes(),
        block_did_off.astype("<u4").tobytes(),
        block_tf_off.astype("<u4").tobytes(),
        did_stream.tobytes(),
        tf_stream.tobytes(),
    ]
    return b"".join(parts)


def _encode_postings_for(
    doc_ids: np.ndarray, tfs: np.ndarray, block_size: int
) -> bytes:
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    n = len(doc_ids)
    if n != len(tfs):
        raise ValueError("doc_ids and tfs length mismatch")
    n_blocks = (n + block_size - 1) // block_size
    deltas = np.empty(n, dtype=np.uint64)
    if n:
        deltas[0] = doc_ids[0] + np.uint64(1)
        deltas[1:] = doc_ids[1:] - doc_ids[:-1]
    tf0 = tfs - np.uint64(1)

    did_parts: list[bytes] = []
    tf_parts: list[bytes] = []
    block_last = np.empty(n_blocks, dtype=np.uint64)
    block_max = np.empty(n_blocks, dtype=np.uint32)
    block_doc_off = np.empty(n_blocks, dtype=np.uint32)
    block_did_off = np.empty(n_blocks, dtype=np.uint32)
    block_tf_off = np.empty(n_blocks, dtype=np.uint32)
    d_off = t_off = 0
    for b in range(n_blocks):
        lo, hi = b * block_size, min((b + 1) * block_size, n)
        dp = _pack_for(deltas[lo:hi])
        tp = _pack_for(tf0[lo:hi])
        block_last[b] = doc_ids[hi - 1]
        block_max[b] = int(tfs[lo:hi].max())
        block_doc_off[b] = lo
        block_did_off[b] = d_off
        block_tf_off[b] = t_off
        did_parts.append(dp)
        tf_parts.append(tp)
        d_off += len(dp)
        t_off += len(tp)

    header = np.zeros(1, dtype=_HEADER_DTYPE)
    header["magic"] = _MAGIC_FOR
    header["n_docs"] = n
    header["n_blocks"] = n_blocks
    header["block_size"] = block_size
    header["docid_bytes"] = d_off
    header["tf_bytes"] = t_off
    return b"".join(
        [
            header.tobytes(),
            block_last.astype("<u8").tobytes(),
            block_max.astype("<u4").tobytes(),
            block_doc_off.astype("<u4").tobytes(),
            block_did_off.astype("<u4").tobytes(),
            block_tf_off.astype("<u4").tobytes(),
            *did_parts,
            *tf_parts,
        ]
    )


def read_meta(blob: bytes | memoryview) -> PostingsMeta:
    """Parse header + block metadata; payload streams stay undecoded."""
    raw = np.frombuffer(blob, dtype=np.uint8)
    header = raw[: _HEADER_DTYPE.itemsize].view(_HEADER_DTYPE)[0]
    magic = int(header["magic"])
    if magic == _MAGIC:
        codec = "varint"
    elif magic == _MAGIC_FOR:
        codec = "for"
    else:
        raise ValueError("bad postings blob magic")
    n_blocks = int(header["n_blocks"])
    off = _HEADER_DTYPE.itemsize

    def take(dtype: str, count: int) -> np.ndarray:
        nonlocal off
        width = np.dtype(dtype).itemsize
        arr = raw[off : off + width * count].view(dtype)
        off += width * count
        return arr

    block_last = take("<u8", n_blocks)
    block_max = take("<u4", n_blocks)
    block_doc_off = take("<u4", n_blocks)
    block_did_off = take("<u4", n_blocks)
    block_tf_off = take("<u4", n_blocks)
    docid_stream = raw[off : off + int(header["docid_bytes"])]
    off += int(header["docid_bytes"])
    tf_stream = raw[off : off + int(header["tf_bytes"])]
    return PostingsMeta(
        n_docs=int(header["n_docs"]),
        n_blocks=n_blocks,
        block_size=int(header["block_size"]),
        codec=codec,
        block_last_doc=block_last,
        block_max_tf=block_max,
        block_doc_off=block_doc_off,
        block_did_off=block_did_off,
        block_tf_off=block_tf_off,
        _docid_stream=docid_stream,
        _tf_stream=tf_stream,
    )


def decode_block(meta: PostingsMeta, i: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode a single block → (doc_ids u64, tfs u64). Independent of others."""
    did_lo = int(meta.block_did_off[i])
    tf_lo = int(meta.block_tf_off[i])
    did_hi = (
        int(meta.block_did_off[i + 1])
        if i + 1 < meta.n_blocks
        else len(meta._docid_stream)
    )
    tf_hi = (
        int(meta.block_tf_off[i + 1]) if i + 1 < meta.n_blocks else len(meta._tf_stream)
    )
    doc_hi = (
        int(meta.block_doc_off[i + 1]) if i + 1 < meta.n_blocks else meta.n_docs
    )
    count = doc_hi - int(meta.block_doc_off[i])
    if meta.codec == "for":
        deltas = _unpack_for(meta._docid_stream[did_lo:did_hi], count)
        tfs = _unpack_for(meta._tf_stream[tf_lo:tf_hi], count) + np.uint64(1)
    else:
        deltas = decode_varint(meta._docid_stream[did_lo:did_hi])
        tfs = decode_varint(meta._tf_stream[tf_lo:tf_hi]) + np.uint64(1)
    base = meta.block_last_doc[i - 1] if i > 0 else np.uint64(0)
    doc_ids = np.cumsum(deltas, dtype=np.uint64) + base
    if i == 0:
        doc_ids -= np.uint64(1)  # block 0 deltas are relative to -1
    return doc_ids, tfs


def decode_postings(blob: bytes | memoryview) -> tuple[np.ndarray, np.ndarray]:
    """Decode a full blob → (doc_ids u64, tfs u64)."""
    meta = read_meta(blob)
    if meta.n_docs == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64)
    if meta.codec == "for":
        parts = [decode_block(meta, i) for i in range(meta.n_blocks)]
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
        )
    # the first delta of block i is relative to block i-1's last doc, which
    # is exactly the preceding doc — so the stream is one contiguous gap
    # sequence and a single cumsum decodes it (block independence costs 0).
    deltas = decode_varint(meta._docid_stream)
    tfs = decode_varint(meta._tf_stream) + np.uint64(1)
    if len(deltas) != meta.n_docs or len(tfs) != meta.n_docs:
        # truncated / torn stream: fail loudly rather than silently
        # returning fewer postings than the header promises
        raise ValueError(
            f"corrupt posting blob: decoded {len(deltas)} doc ids / "
            f"{len(tfs)} tfs, header says {meta.n_docs}"
        )
    doc_ids = np.cumsum(deltas, dtype=np.uint64) - np.uint64(1)
    return doc_ids, tfs


def merge_encoded_parts(blobs: list[bytes], block_size: int = 128,
                        codec: str = "varint") -> bytes:
    """Merge posting parts covering disjoint ascending doc-id ranges.

    Used by the shard merge ``map_groups``: each input part came from one
    tokenize partition; shard-contiguous partition order makes the
    concatenation sorted.  Bounded by the shard's doc count (the doc-range
    salt), never by a term's global df — that is the skew guarantee.
    """
    decoded = [decode_postings(b) for b in blobs]
    decoded = [(d, t) for d, t in decoded if len(d)]
    if not decoded:
        return encode_postings(
            np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64),
            block_size, codec,
        )
    doc_ids = np.concatenate([d for d, _ in decoded])
    tfs = np.concatenate([t for _, t in decoded])
    if not np.all(doc_ids[:-1] < doc_ids[1:]):
        order = np.argsort(doc_ids, kind="stable")
        doc_ids, tfs = doc_ids[order], tfs[order]
        if not np.all(doc_ids[:-1] < doc_ids[1:]):
            raise ValueError("duplicate doc_ids across posting parts")
    return encode_postings(doc_ids, tfs, block_size, codec)


# ---------------------------------------------------------------- positions
#
# Positional sidecar (Lucene-style .prx analogue): per term one blob of
# varint-encoded in-doc position gaps, doc-aligned with the postings
# stream (doc i's span holds tf_i positions).  Each doc's first position
# is encoded ABSOLUTE, so blobs covering disjoint ascending doc ranges
# concatenate byte-wise with no re-encode — the same property the
# postings parts merge relies on.


def encode_positions_many(
    positions: np.ndarray,
    tfs: np.ndarray,
    offsets: np.ndarray,
    skip: np.ndarray | None = None,
) -> list[bytes]:
    """Encode T terms' position streams → T blobs (one vectorized pass).

    ``positions``: flat in-doc token positions ordered (term, doc, pos
    ascending); ``tfs``: per (term, doc) posting entry, flat; ``offsets``
    (len T+1) delimits posting ENTRIES per term (the same offsets array
    :func:`encode_postings_many` takes).

    ``skip`` (len T bool): terms whose blob is emitted EMPTY and whose
    tokens never enter the varint pass — the ``shingle_positions=False``
    build path (a 2-term phrase reads the shingle's tf, never its
    positions, so storing them is pure layout weight).  An empty blob is
    unambiguous: any term with df ≥ 1 has tf ≥ 1, so a real stream is
    always ≥ 1 byte.
    """
    positions = np.ascontiguousarray(positions, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    T = len(offsets) - 1
    if T == 0:
        return []
    if skip is not None and skip.any():
        entry_keep = np.repeat(~skip, np.diff(offsets))
        kept_tfs = tfs[entry_keep]
        if len(positions) == int(tfs.sum()):
            # positions cover every term (build path) — drop skipped
            positions = positions[np.repeat(entry_keep, tfs)]
        elif len(positions) != int(kept_tfs.sum()):
            # else: positions already exclude skipped terms (compaction
            # of a layout whose skipped blobs were never stored)
            raise ValueError("positions length matches neither all terms "
                             "nor the non-skipped subset")
        kept_counts = np.diff(offsets)[~skip]
        sub_offsets = np.concatenate(
            [[0], np.cumsum(kept_counts)]
        ).astype(np.int64)
        sub = encode_positions_many(positions, kept_tfs, sub_offsets)
        out_all: list[bytes] = []
        it = iter(sub)
        for t in range(T):
            out_all.append(b"" if skip[t] else next(it))
        return out_all
    if int(tfs.sum()) != len(positions):
        raise ValueError("positions length != sum(tfs)")
    tfcum = np.concatenate([[0], np.cumsum(tfs)])  # token offset per entry
    entry_starts = tfcum[:-1]
    gaps = np.empty(len(positions), dtype=np.uint64)
    if len(positions):
        gaps[1:] = positions[1:] - positions[:-1]
        gaps[entry_starts] = positions[entry_starts]  # absolute per doc
    lens = varint_lengths(gaps)
    enc = encode_varint(gaps, lens).tobytes()
    bytecum = np.concatenate([[0], np.cumsum(lens)])
    out: list[bytes] = []
    for t in range(T):
        lo = int(bytecum[tfcum[offsets[t]]])
        hi = int(bytecum[tfcum[offsets[t + 1]]])
        out.append(enc[lo:hi])
    return out


def decode_positions(blob: bytes | memoryview, tfs: np.ndarray) -> np.ndarray:
    """Decode one term's position blob → flat in-doc positions (uint64),
    doc-aligned: the first ``tfs[0]`` values belong to the term's first
    posting doc, and so on.  ``tfs`` is the term's decoded tf array."""
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    gaps = decode_varint(np.frombuffer(blob, dtype=np.uint8))
    total = int(tfs.sum())
    if len(gaps) != total:
        raise ValueError(f"positions blob holds {len(gaps)} values, tfs sum {total}")
    if total == 0:
        return np.empty(0, dtype=np.uint64)
    cs = np.cumsum(gaps, dtype=np.uint64)
    tfcum = np.concatenate([[0], np.cumsum(tfs)])
    starts = tfcum[:-1]
    seg_base = np.where(starts > 0, cs[np.maximum(starts - 1, 0)], np.uint64(0))
    return cs - np.repeat(seg_base, tfs)
