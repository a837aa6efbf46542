"""Distributed inverted-index build — the engine the reference delegates
to Elasticsearch, as a Ray Data pipeline.

Pipeline (SURVEY.md §3.4)::

    plan partitions from Parquet footers          (driver; slicer analogue)
      → ray.data.from_items(partition manifest)   (one row per partition)
      → map_batches(tokenize_partition)           (stateless tasks: read row
            groups, code-aware tokenize, sha256, per-partition postings
            partials; docmeta side-written per partition, atomically)
      → groupby("shard_id")                       (THE wide step: partials
            shuffle keyed by doc-range shard — the skew salt; a term's
            group size is bounded by the shard's doc count, so `import`
            at 60% df cannot blow up a merge task)
      → map_groups(write_shard_segment)           (merge partials per term,
            block-max encode, atomic segment write + checkpoint)
      → driver: manifest + global stats (N, avgdl)

Resume: shards whose segment is already checkpointed are skipped before
the tokenize stage (their partitions short-circuit), mirroring the
reference's replay-and-skip resume
(``/root/reference/asset/id_reader/id_slicer.js:178-199``).

Scale notes: nothing here materializes the corpus — tokenize streams
blocks, the shuffle moves encoded partials (≈4 B/posting), segments write
shard-partitioned (resumable, never one giant file).  Only per-shard
summary rows (one per shard) and the manifest touch the driver.
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
import pyarrow.parquet as pq

import ray.data as rd

from ..analysis.tokenizer import analyzer_for_lang, clip_tokens, get_analyzer
from ..config import IndexConfig
from .codec import encode_postings, merge_encoded_parts, read_meta
from .manifest import (
    STATS_NAME,
    BuildManifest,
    atomic_write_text,
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

SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("max_tf", pa.int64()),
        ("postings", pa.large_binary()),
    ]
)


def _analyzers(analyzer_name: str):
    """Resolve the analyzer once per task; 'per_lang' keys off the lang column."""
    if analyzer_name == "per_lang":
        return analyzer_for_lang
    fn = get_analyzer(analyzer_name)
    return lambda lang: fn


def docmeta_path(index_dir: str | Path, partition_id: int) -> Path:
    return Path(index_dir) / "docmeta" / f"part-{partition_id:05d}.parquet"


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
        self.done_shards = done_shards

    def _read_columns(self) -> list[str]:
        cols: list[str] = [self.text_col]
        for c in (self.lang_col, self.id_col, *self.meta_cols):
            if c is not None and c not in cols:
                cols.append(c)
        return cols

    def __call__(self, descs: pa.Table) -> pa.Table:
        out_shard, out_term, out_pid, out_df, out_cf, out_blob = [], [], [], [], [], []
        analyzer_of = _analyzers(self.analyzer)
        for row in descs.to_pylist():
            if row["shard_id"] in self.done_shards:
                continue
            pf = pq.ParquetFile(row["path"])
            tbl = pf.read_row_groups(
                list(range(row["row_group_start"], row["row_group_end"])),
                columns=self._read_columns(),
            )
            if row.get("row_start", -1) >= 0:
                tbl = tbl.slice(row["row_start"], row["row_end"] - row["row_start"])
            contents = tbl.column(self.text_col).to_pylist()
            if self.lang_col is not None:
                langs = tbl.column(self.lang_col).to_pylist()
            else:
                langs = [""] * len(contents)
            doc_base = row["doc_base"]
            n = len(contents)

            postings: dict[str, tuple[list[int], list[int]]] = {}
            dls = np.zeros(n, dtype=np.int32)
            shas: list[str] = []
            nbytes = np.zeros(n, dtype=np.int64)
            for i, (text, lang) in enumerate(zip(contents, langs)):
                raw = text.encode("utf-8")
                shas.append(hashlib.sha256(raw).hexdigest())
                nbytes[i] = len(raw)
                toks = clip_tokens(analyzer_of(lang)(text), self.cfg_min, self.cfg_max)
                dls[i] = len(toks)
                doc_id = doc_base + i
                for t, tf in Counter(toks).items():
                    slot = postings.get(t)
                    if slot is None:
                        slot = postings[t] = ([], [])
                    slot[0].append(doc_id)
                    slot[1].append(tf)

            # docmeta side-write (atomic, idempotent) — the doc store +
            # per-partition lineage checkpoint
            dm = docmeta_path(self.index_dir, row["partition_id"])
            if not dm.exists():
                dm.parent.mkdir(parents=True, exist_ok=True)
                cols: dict[str, pa.Array | pa.ChunkedArray] = {
                    "doc_id": pa.array(
                        np.arange(doc_base, doc_base + n, dtype=np.int64)
                    )
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

            for t in sorted(postings):
                ids, tfs = postings[t]
                ids_a = np.asarray(ids, dtype=np.uint64)
                tfs_a = np.asarray(tfs, dtype=np.uint64)
                out_shard.append(row["shard_id"])
                out_term.append(t)
                out_pid.append(row["partition_id"])
                out_df.append(len(ids_a))
                out_cf.append(int(tfs_a.sum()))
                out_blob.append(encode_postings(ids_a, tfs_a, self.block_size))

        return pa.table(
            {
                "shard_id": pa.array(out_shard, pa.int32()),
                "term": pa.array(out_term, pa.string()),
                "partition_id": pa.array(out_pid, pa.int32()),
                "df": pa.array(out_df, pa.int64()),
                "cf": pa.array(out_cf, pa.int64()),
                "blob": pa.array(out_blob, pa.large_binary()),
            },
            schema=_PARTIAL_SCHEMA,
        )


class WriteShardSegment:
    """Per-shard merge + atomic segment write (``map_groups`` over the
    shard-keyed shuffle).  Returns one summary row per shard."""

    def __init__(self, index_dir: str, block_size: int):
        self.index_dir = index_dir
        self.block_size = block_size

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"shard_id": pa.array([], pa.int32()),
                             "num_terms": pa.array([], pa.int64()),
                             "num_postings": pa.array([], pa.int64())})
        shard_id = int(group.column("shard_id")[0].as_py())
        group = group.sort_by([("term", "ascending"), ("partition_id", "ascending")])
        terms = group.column("term").to_pylist()
        blobs = group.column("blob").to_pylist()
        dfs = group.column("df").to_numpy()
        cfs = group.column("cf").to_numpy()

        out_terms: list[str] = []
        out_df: list[int] = []
        out_cf: list[int] = []
        out_maxtf: list[int] = []
        out_blob: list[bytes] = []
        i = 0
        n = len(terms)
        n_postings = 0
        while i < n:
            j = i
            while j < n and terms[j] == terms[i]:
                j += 1
            if j - i == 1:
                merged = blobs[i]
            else:
                merged = merge_encoded_parts(blobs[i:j], self.block_size)
            meta = read_meta(merged)
            out_terms.append(terms[i])
            out_df.append(int(dfs[i:j].sum()))
            out_cf.append(int(cfs[i:j].sum()))
            out_maxtf.append(int(meta.block_max_tf.max()) if meta.n_blocks else 0)
            out_blob.append(merged)
            n_postings += meta.n_docs
            i = j

        seg = pa.table(
            {
                "term": pa.array(out_terms, pa.string()),
                "df": pa.array(out_df, pa.int64()),
                "cf": pa.array(out_cf, pa.int64()),
                "max_tf": pa.array(out_maxtf, pa.int64()),
                "postings": pa.array(out_blob, pa.large_binary()),
            },
            schema=SEGMENT_SCHEMA,
        )
        final = segment_dir(self.index_dir, shard_id)
        tmp = final.with_name(final.name + f".tmp-{os.getpid()}")
        if tmp.exists():
            shutil.rmtree(tmp)
        tmp.mkdir(parents=True)
        pq.write_table(seg, tmp / "segment.parquet", row_group_size=16_384)
        if final.exists():
            shutil.rmtree(tmp)  # lost the race to a concurrent retry — fine
        else:
            os.replace(tmp, final)
        return pa.table(
            {
                "shard_id": pa.array([shard_id], pa.int32()),
                "num_terms": pa.array([len(out_terms)], pa.int64()),
                "num_postings": pa.array([n_postings], pa.int64()),
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
    )
    existing = BuildManifest.load(index_dir) if resume else None
    if existing is not None and existing.plan_fingerprint() == plan.plan_fingerprint():
        manifest = existing
    else:
        if existing is not None or not resume:
            # stale plan: clear derived state, keep nothing
            for sub in ("segments", "docmeta"):
                shutil.rmtree(index_dir / sub, ignore_errors=True)
        manifest = plan
        manifest.save(index_dir)

    done = frozenset(
        sid
        for sid, s in manifest.shards.items()
        if s.status == "done" and (segment_dir(index_dir, sid) / "segment.parquet").exists()
    )
    pending_parts = [
        asdict(p) for p in manifest.partitions if p.shard_id not in done
    ]

    if pending_parts:
        partials = rd.from_items(pending_parts).map_batches(
            TokenizePartition(str(index_dir), config, done),
            batch_format="pyarrow",
            batch_size=1,
        )
        writer = WriteShardSegment(str(index_dir), config.block_size)

        def write_shard_segment(group: pa.Table) -> pa.Table:
            return writer(group)

        summaries = (
            partials.groupby("shard_id")
            .map_groups(write_shard_segment, batch_format="pyarrow")
            .take_all()  # one tiny row per shard
        )
        for row in summaries:
            s = manifest.shards[int(row["shard_id"])]
            s.status = "done"
            s.num_terms = int(row["num_terms"])
            s.num_postings = int(row["num_postings"])
            s.segment_path = str(segment_dir(index_dir, s.shard_id))
        manifest.save(index_dir)

    missing = [s for s in manifest.shards.values() if s.status != "done" and s.num_docs > 0]
    if missing:
        raise RuntimeError(f"build incomplete: shards {[s.shard_id for s in missing]}")

    # global stats (N, avgdl) — distributed column scan of docmeta;
    # skipped entirely on a no-op resume (checkpointed in stats.json)
    stats_path = index_dir / STATS_NAME
    if not pending_parts and stats_path.exists():
        return IndexInfo(index_dir)
    dm = rd.read_parquet(str(index_dir / "docmeta"), columns=["dl"])
    total_tokens = int(dm.sum("dl") or 0)
    stats = IndexStats(
        num_docs=manifest.total_docs,
        total_tokens=total_tokens,
        avgdl=total_tokens / manifest.total_docs if manifest.total_docs else 0.0,
        num_shards=len(manifest.shards),
    )
    import json

    atomic_write_text(stats_path, json.dumps(asdict(stats)))
    return IndexInfo(index_dir)
