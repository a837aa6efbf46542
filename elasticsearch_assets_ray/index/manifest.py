"""Partition planning + checkpoint manifest for index builds.

Planning mirrors the reference's slicer, with Parquet metadata replacing
ES count-probes:

* target-count partitions (``interval = range / ceil(count/size)``,
  ``/root/reference/asset/elasticsearch_reader/elasticsearch_date_range/slicer.js:484-505``)
  → here: split files at row-group boundaries so every partition holds
  ≤ ``partition_target_docs`` rows, computed from ``pq.ParquetFile``
  metadata without reading data;
* resumable slicing with retry state
  (``retryData.lastSlice`` replay, ``asset/id_reader/id_slicer.js:233-255``)
  → here: a JSON manifest checkpoint listing every partition and shard
  with lineage (input file, row-group span, doc-id range) and metrics
  (doc/term/posting counts); a re-run diffs the manifest and skips
  completed shards.

Doc ids are global sequential row numbers under a stable ordering of input
files (sorted path) — deterministic, replay-safe, and delta-friendly
(SURVEY.md §7.3 "docID assignment").
"""

from __future__ import annotations

import bisect
import json
import os
from dataclasses import asdict, dataclass, field
from pathlib import Path

import pyarrow.parquet as pq

MANIFEST_NAME = "manifest.json"
STATS_NAME = "stats.json"


@dataclass(frozen=True)
class PartitionPlan:
    """One tokenize unit: a contiguous row-group span of one input file,
    optionally narrowed to a row range within the span.

    ``row_start``/``row_end`` (span-relative, ``row_end`` exclusive; -1 =
    whole span) split a single oversized row group into parallel units —
    the recursive-halving floor case where the reference fans a hot window
    out by secondary key (``slicer.js:281-332``): when the storage-level
    unit can't be subdivided any further, subdivide logically."""

    partition_id: int
    path: str
    row_group_start: int
    row_group_end: int  # exclusive
    num_rows: int
    doc_base: int  # first global doc_id of this partition
    shard_id: int
    row_start: int = -1
    row_end: int = -1


@dataclass
class ShardState:
    shard_id: int
    partition_ids: list[int]
    doc_base: int
    num_docs: int
    status: str = "pending"  # pending | done
    num_terms: int = 0
    num_postings: int = 0
    total_tokens: int = 0
    segment_path: str = ""


@dataclass
class BuildManifest:
    corpus_paths: list[str]
    analyzer: str
    partition_target_docs: int
    shard_target_docs: int
    block_size: int
    total_docs: int
    text_col: str = "content"
    lang_col: str | None = "lang"
    id_col: str | None = None
    meta_cols: list[str] = field(default_factory=lambda: ["repo", "path"])
    # ingest-time derived-field recipe strings (IndexConfig.derived_meta):
    # tokenize tasks resolve them by spec, so they MUST travel in the
    # plan fingerprint — a changed recipe over the same dir otherwise
    # silently reuses docmeta computed under the old one
    derived_meta: list[str] = field(default_factory=list)
    postings_codec: str = "varint"
    # positional sidecar present in every segment (phrase-query support);
    # layout-affecting, so it travels in the plan fingerprint
    store_positions: bool = False
    # 2-token shingle terms indexed beside unigrams (ES index_phrases);
    # layout-affecting, so it travels in the plan fingerprint
    index_phrases: bool = False
    # shingle terms' positional payloads stored (see IndexConfig);
    # layout-affecting, so it travels in the plan fingerprint
    shingle_positions: bool = True
    # tokenization-affecting config: MUST travel with the manifest so a
    # resume/append under a changed clip can never silently reuse stale
    # segments, and the query side clips exactly as the build did
    min_token_len: int = 1
    max_token_len: int = 64
    # byte size per corpus file (parallel to corpus_paths): the
    # immutability guard — input files are data-lake-immutable by
    # contract, and this catches the contract being broken (a file
    # modified in place would otherwise silently reuse stale segments)
    corpus_sizes: list[int] = field(default_factory=list)
    # st_mtime_ns per corpus file (parallel to corpus_paths): with sizes,
    # the content fingerprint that detects in-place modification
    corpus_mtimes: list[int] = field(default_factory=list)
    partitions: list[PartitionPlan] = field(default_factory=list)
    shards: dict[int, ShardState] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "corpus_paths": self.corpus_paths,
                "analyzer": self.analyzer,
                "partition_target_docs": self.partition_target_docs,
                "shard_target_docs": self.shard_target_docs,
                "block_size": self.block_size,
                "total_docs": self.total_docs,
                "text_col": self.text_col,
                "lang_col": self.lang_col,
                "id_col": self.id_col,
                "meta_cols": list(self.meta_cols),
                "derived_meta": list(self.derived_meta),
                "postings_codec": self.postings_codec,
                "store_positions": self.store_positions,
                "index_phrases": self.index_phrases,
                "shingle_positions": self.shingle_positions,
                "min_token_len": self.min_token_len,
                "max_token_len": self.max_token_len,
                "corpus_sizes": self.corpus_sizes,
                "corpus_mtimes": self.corpus_mtimes,
                "partitions": [asdict(p) for p in self.partitions],
                "shards": {str(k): asdict(v) for k, v in self.shards.items()},
            },
            indent=1,
        )

    @classmethod
    def from_json(cls, text: str) -> "BuildManifest":
        d = json.loads(text)
        m = cls(
            corpus_paths=d["corpus_paths"],
            analyzer=d["analyzer"],
            partition_target_docs=d["partition_target_docs"],
            shard_target_docs=d["shard_target_docs"],
            block_size=d["block_size"],
            total_docs=d["total_docs"],
            text_col=d.get("text_col", "content"),
            lang_col=d.get("lang_col", "lang"),
            id_col=d.get("id_col"),
            meta_cols=list(d.get("meta_cols", ["repo", "path"])),
            derived_meta=list(d.get("derived_meta", [])),
            postings_codec=d.get("postings_codec", "varint"),
            store_positions=d.get("store_positions", False),
            index_phrases=d.get("index_phrases", False),
            shingle_positions=d.get("shingle_positions", True),
            min_token_len=d.get("min_token_len", 1),
            max_token_len=d.get("max_token_len", 64),
            corpus_sizes=d.get("corpus_sizes", []),
            corpus_mtimes=d.get("corpus_mtimes", []),
        )
        m.partitions = [PartitionPlan(**p) for p in d["partitions"]]
        m.shards = {int(k): ShardState(**v) for k, v in d["shards"].items()}
        return m

    def save(self, index_dir: str | Path) -> None:
        atomic_write_text(Path(index_dir) / MANIFEST_NAME, self.to_json())

    @classmethod
    def load(cls, index_dir: str | Path) -> "BuildManifest | None":
        p = Path(index_dir) / MANIFEST_NAME
        if not p.exists():
            return None
        return cls.from_json(p.read_text())

    def plan_fingerprint(self) -> tuple:
        return (
            tuple(self.corpus_paths),
            self.analyzer,
            self.partition_target_docs,
            self.shard_target_docs,
            self.block_size,
            self.total_docs,
            self.text_col,
            self.lang_col,
            self.id_col,
            tuple(self.meta_cols),
            tuple(self.derived_meta),
            self.postings_codec,
            self.store_positions,
            self.index_phrases,
            self.shingle_positions,
            self.min_token_len,
            self.max_token_len,
            tuple(self.corpus_sizes),
            tuple(self.corpus_mtimes),
        )


def plan_append(
    existing: BuildManifest,
    corpus: str | Path | list[str],
    analyzer: str,
    partition_target_docs: int,
    shard_target_docs: int,
    block_size: int,
    text_col: str = "content",
    lang_col: str | None = "lang",
    id_col: str | None = None,
    meta_cols: tuple[str, ...] = ("repo", "path"),
    postings_codec: str = "varint",
    min_token_len: int = 1,
    max_token_len: int = 64,
    store_positions: bool = False,
    derived_meta: tuple[str, ...] = (),
    index_phrases: bool = False,
    shingle_positions: bool = True,
) -> "BuildManifest | None":
    """Incremental append: plan ONLY files not in ``existing``, plus an
    in-place rebuild of the shards covering files MODIFIED in place.

    The reference's persistent-mode micro-batching re-runs the slicer over
    the new time window and leaves old slices untouched
    (``slicer.js:382-395``); here a grown corpus appends new partitions
    and shards after the existing ones — doc ids of old files never move
    (file order = manifest order + sorted new files), old segments stay
    checkpointed.

    A file whose content fingerprint (byte size + mtime_ns) changed is
    handled incrementally WHEN its row count is unchanged: its old
    partitions are re-mapped onto the file's new row-group layout
    (same partition_id / doc_base / shard_id — doc ids never move) and
    every shard touching it is reset to ``pending``, so only those
    shards re-tokenize; the result is identical to a cold rebuild of the
    whole corpus (tested).  A modified file whose ROW COUNT changed
    would shift every later file's doc ids — that returns None (caller
    falls back to a full rebuild), as do config changes and removed
    files.
    """
    params_same = (
        existing.analyzer == analyzer
        and existing.partition_target_docs == partition_target_docs
        and existing.shard_target_docs == shard_target_docs
        and existing.block_size == block_size
        and existing.text_col == text_col
        and existing.lang_col == lang_col
        and existing.id_col == id_col
        and list(existing.meta_cols) == list(meta_cols)
        and list(existing.derived_meta) == list(derived_meta)
        and existing.postings_codec == postings_codec
        and existing.store_positions == store_positions
        and existing.index_phrases == index_phrases
        and existing.shingle_positions == shingle_positions
        and existing.min_token_len == min_token_len
        and existing.max_token_len == max_token_len
    )
    if not params_same:
        return None
    all_files = list_corpus_files(corpus)
    old = set(existing.corpus_paths)
    if not old.issubset(all_files):
        return None  # files removed → not an append
    # content fingerprints: manifests from before these fields existed
    # skip the check (treated as unmodified)
    modified: list[str] = []
    if existing.corpus_sizes:
        old_size = dict(zip(existing.corpus_paths, existing.corpus_sizes))
        old_mtime = (
            dict(zip(existing.corpus_paths, existing.corpus_mtimes))
            if existing.corpus_mtimes else {}
        )
        for f in existing.corpus_paths:
            if os.path.getsize(f) != old_size[f] or (
                old_mtime and os.stat(f).st_mtime_ns != old_mtime[f]
            ):
                modified.append(f)
    repl_parts: dict[str, list[PartitionPlan]] = {}
    dirty_shards: set[int] = set()
    for f in modified:
        old_parts = sorted(
            (p for p in existing.partitions if p.path == f),
            key=lambda p: p.doc_base,
        )
        old_rows = sum(p.num_rows for p in old_parts)
        md = pq.ParquetFile(f).metadata
        if md.num_rows != old_rows:
            return None  # row count changed → later doc ids would move
        rg_offs = [0]
        for i in range(md.num_row_groups):
            rg_offs.append(rg_offs[-1] + md.row_group(i).num_rows)
        file_base = old_parts[0].doc_base
        new_list: list[PartitionPlan] = []
        for p in old_parts:
            a = p.doc_base - file_base
            b = a + p.num_rows
            i = bisect.bisect_right(rg_offs, a) - 1
            j = bisect.bisect_left(rg_offs, b)
            new_list.append(
                PartitionPlan(
                    partition_id=p.partition_id, path=f,
                    row_group_start=i, row_group_end=j,
                    num_rows=p.num_rows, doc_base=p.doc_base,
                    shard_id=p.shard_id,
                    row_start=a - rg_offs[i], row_end=b - rg_offs[i],
                )
            )
            dirty_shards.add(p.shard_id)
        repl_parts[f] = new_list
    new_files = [f for f in all_files if f not in old]
    if not new_files and not modified:
        return existing  # nothing to do
    if not new_files:
        merged = _apply_modified(existing, repl_parts, dirty_shards)
        return merged
    if modified:
        existing = _apply_modified(existing, repl_parts, dirty_shards)
    sub = plan_build(
        new_files, analyzer, partition_target_docs, shard_target_docs,
        block_size, text_col=text_col, lang_col=lang_col, id_col=id_col,
        meta_cols=meta_cols, postings_codec=postings_codec,
        min_token_len=min_token_len, max_token_len=max_token_len,
        store_positions=store_positions, derived_meta=derived_meta,
        index_phrases=index_phrases,
        shingle_positions=shingle_positions,
    )
    pid0 = (max((p.partition_id for p in existing.partitions), default=-1)) + 1
    sid0 = (max(existing.shards, default=-1)) + 1
    base0 = existing.total_docs
    merged = BuildManifest(
        corpus_paths=list(existing.corpus_paths) + new_files,
        analyzer=analyzer,
        partition_target_docs=partition_target_docs,
        shard_target_docs=shard_target_docs,
        block_size=block_size,
        total_docs=existing.total_docs + sub.total_docs,
        text_col=text_col,
        lang_col=lang_col,
        id_col=id_col,
        meta_cols=list(meta_cols),
        derived_meta=list(derived_meta),
        postings_codec=postings_codec,
        store_positions=store_positions,
        index_phrases=index_phrases,
        shingle_positions=shingle_positions,
        min_token_len=min_token_len,
        max_token_len=max_token_len,
        corpus_sizes=(
            list(existing.corpus_sizes) + [os.path.getsize(f) for f in new_files]
            if existing.corpus_sizes
            else []
        ),
        corpus_mtimes=(
            list(existing.corpus_mtimes)
            + [os.stat(f).st_mtime_ns for f in new_files]
            if existing.corpus_mtimes
            else []
        ),
    )
    merged.partitions = list(existing.partitions) + [
        PartitionPlan(
            p.partition_id + pid0, p.path, p.row_group_start, p.row_group_end,
            p.num_rows, p.doc_base + base0, p.shard_id + sid0,
            p.row_start, p.row_end,
        )
        for p in sub.partitions
    ]
    merged.shards = dict(existing.shards)
    for sid, s in sub.shards.items():
        merged.shards[sid + sid0] = ShardState(
            sid + sid0,
            [pid + pid0 for pid in s.partition_ids],
            s.doc_base + base0,
            s.num_docs,
        )
    merged.dirty_partition_ids = list(getattr(existing, "dirty_partition_ids", []))
    return merged


def _apply_modified(
    existing: BuildManifest,
    repl_parts: dict[str, list[PartitionPlan]],
    dirty_shards: set[int],
) -> BuildManifest:
    """Copy ``existing`` with modified files' partitions re-mapped and
    their shards reset to pending (same ids/doc ranges — only the
    row-group addressing and the rebuild flag change), and the content
    fingerprints refreshed."""
    import copy

    m = copy.deepcopy(existing)
    by_pid = {
        p.partition_id: p for parts in repl_parts.values() for p in parts
    }
    m.partitions = [by_pid.get(p.partition_id, p) for p in m.partitions]
    for sid in dirty_shards:
        s0 = m.shards[sid]
        m.shards[sid] = ShardState(
            sid, list(s0.partition_ids), s0.doc_base, s0.num_docs
        )
    if m.corpus_sizes:
        m.corpus_sizes = [os.path.getsize(f) for f in m.corpus_paths]
    if m.corpus_mtimes:
        m.corpus_mtimes = [os.stat(f).st_mtime_ns for f in m.corpus_paths]
    # session-only (not serialized): partitions whose SOURCE CONTENT
    # changed — their idempotent docmeta side-writes must be invalidated
    # by the caller even when the re-mapped plan happens to be identical
    m.dirty_partition_ids = sorted(by_pid)
    return m


def atomic_write_text(path: Path, text: str) -> None:
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_text(text)
    os.replace(tmp, path)


def list_corpus_files(corpus: str | Path | list[str]) -> list[str]:
    """Stable (sorted) list of parquet files — the doc_id ordering anchor."""
    if isinstance(corpus, (str, Path)):
        p = Path(corpus)
        if p.is_dir():
            return sorted(str(f) for f in p.glob("*.parquet"))
        return [str(p)]
    return sorted(str(f) for f in corpus)


def plan_build(
    corpus: str | Path | list[str],
    analyzer: str,
    partition_target_docs: int,
    shard_target_docs: int,
    block_size: int,
    text_col: str = "content",
    lang_col: str | None = "lang",
    id_col: str | None = None,
    meta_cols: tuple[str, ...] = ("repo", "path"),
    postings_codec: str = "varint",
    min_token_len: int = 1,
    max_token_len: int = 64,
    store_positions: bool = False,
    derived_meta: tuple[str, ...] = (),
    index_phrases: bool = False,
    shingle_positions: bool = True,
) -> BuildManifest:
    """Plan partitions + shards from Parquet footer metadata only.

    Equivalent of the reference's slicer planning pass (count-probe per
    candidate range) using row-group statistics instead of ES ``count``
    queries — zero data reads, so the plan cost scales with file count,
    not corpus bytes.
    """
    files = list_corpus_files(corpus)
    if not files:
        raise ValueError(f"no parquet files found in {corpus!r}")
    sizes = [os.path.getsize(f) for f in files]
    mtimes = [os.stat(f).st_mtime_ns for f in files]
    partitions: list[PartitionPlan] = []
    doc_base = 0
    pid = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        rg_sizes = [md.row_group(i).num_rows for i in range(md.num_row_groups)]
        i = 0
        while i < len(rg_sizes):
            j = i
            rows = 0
            # greedy: pack whole row groups up to the target (a single
            # oversized row group becomes its own partition — the recursive
            # halving floor, slicer.js:212-214)
            while j < len(rg_sizes) and (rows == 0 or rows + rg_sizes[j] <= partition_target_docs):
                rows += rg_sizes[j]
                j += 1
            if rows > partition_target_docs:
                # a single oversized row group: split it into near-even row
                # ranges so parallelism never degrades to one task per file
                n_chunks = -(-rows // partition_target_docs)
                chunk = -(-rows // n_chunks)
                lo = 0
                while lo < rows:
                    hi = min(lo + chunk, rows)
                    partitions.append(
                        PartitionPlan(
                            partition_id=pid, path=f,
                            row_group_start=i, row_group_end=j,
                            num_rows=hi - lo, doc_base=doc_base, shard_id=-1,
                            row_start=lo, row_end=hi,
                        )
                    )
                    doc_base += hi - lo
                    pid += 1
                    lo = hi
            else:
                partitions.append(
                    PartitionPlan(
                        partition_id=pid,
                        path=f,
                        row_group_start=i,
                        row_group_end=j,
                        num_rows=rows,
                        doc_base=doc_base,
                        shard_id=-1,
                    )
                )
                doc_base += rows
                pid += 1
            i = j
    total_docs = doc_base

    # shards = contiguous partition ranges (the doc-range salt for skewed
    # terms: a term's postings within one merge group are bounded by the
    # shard's doc count, never by global df — SURVEY.md §7.3)
    shards: dict[int, ShardState] = {}
    sid = 0
    acc_docs = 0
    acc_parts: list[int] = []
    shard_base = 0
    fixed = []
    for p in partitions:
        if acc_docs and acc_docs + p.num_rows > shard_target_docs:
            shards[sid] = ShardState(sid, acc_parts, shard_base, acc_docs)
            sid += 1
            acc_docs = 0
            acc_parts = []
            shard_base = p.doc_base
        fixed.append(
            PartitionPlan(
                p.partition_id, p.path, p.row_group_start, p.row_group_end,
                p.num_rows, p.doc_base, sid, p.row_start, p.row_end,
            )
        )
        acc_parts.append(p.partition_id)
        acc_docs += p.num_rows
    if acc_parts:
        shards[sid] = ShardState(sid, acc_parts, shard_base, acc_docs)

    return BuildManifest(
        corpus_paths=files,
        analyzer=analyzer,
        partition_target_docs=partition_target_docs,
        shard_target_docs=shard_target_docs,
        block_size=block_size,
        total_docs=total_docs,
        text_col=text_col,
        lang_col=lang_col,
        id_col=id_col,
        meta_cols=list(meta_cols),
        derived_meta=list(derived_meta),
        postings_codec=postings_codec,
        store_positions=store_positions,
        index_phrases=index_phrases,
        shingle_positions=shingle_positions,
        min_token_len=min_token_len,
        max_token_len=max_token_len,
        corpus_sizes=sizes,
        corpus_mtimes=mtimes,
        partitions=fixed,
        shards=shards,
    )
