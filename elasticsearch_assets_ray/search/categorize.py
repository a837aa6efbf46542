"""ES ``categorize_text`` aggregation — log-template buckets over the
matched docs' TEXT (the reference's log-pipeline worldview: group the
messages, not the tokens).

Semantics (deterministic, SQL-mirrorable — disclosed divergence from
ES, whose drain-style tokenizer also merges near-identical categories
by similarity): a doc's category key is its first ``max_tokens``
template tokens — split on non-alphanumeric, empty and digit-bearing
tokens dropped (numbers/ids/hex are the *variable* parts of a log
line).  Buckets sort (doc_count desc, key asc).

Scale shape: matched ids route to their source corpus partitions
(manifest lineage, contiguous-range searchsorted); each Ray task does
ONE projected text-column read and a fully vectorized Arrow kernel
(split → flatten → digit-mask → offsets rebuild → binary_join), and
ships a ``{category: count}`` dict bounded by template cardinality —
never the texts.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

TOKEN_SPLIT_RX = r"[^a-zA-Z0-9]+"
DIGIT_RX = r"[0-9]"


def categorize_keys(texts, max_tokens: int = 5) -> pa.Array:
    """Vectorized template key per text (no Python per row)."""
    texts = (texts.combine_chunks()
             if isinstance(texts, pa.ChunkedArray) else texts)
    toks = pc.split_pattern_regex(texts, TOKEN_SPLIT_RX)
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = toks.flatten()
    off = np.asarray(toks.offsets, dtype=np.int64)
    counts = np.diff(off)
    valid = (
        pc.and_(
            pc.not_equal(flat, ""),
            pc.invert(pc.match_substring_regex(flat, DIGIT_RX)),
        )
        .to_numpy(zero_copy_only=False)
        .astype(bool)
    )
    cum = np.cumsum(valid)
    before = np.concatenate(([0], cum))[off[:-1]]
    rank = cum - np.repeat(before, counts)  # 1-based among valid, per row
    keep = valid & (rank <= max_tokens)
    kept_counts = np.minimum(
        np.concatenate(([0], cum))[off[1:]] - before, max_tokens
    )
    new_off = np.concatenate(([0], np.cumsum(kept_counts)))
    kept = flat.filter(pa.array(keep))
    lst = pa.ListArray.from_arrays(pa.array(new_off, pa.int32()), kept)
    return pc.binary_join(lst, " ")


@ray.remote
def _categorize_partition_task(
    plans: list[dict], local_idx: list[np.ndarray], text_col: str,
    max_tokens: int,
) -> dict:
    from collections import Counter

    agg: Counter = Counter()
    for plan, idx in zip(plans, local_idx):
        pf = pq.ParquetFile(plan["path"])
        t = pf.read_row_groups(
            list(range(plan["row_group_start"], plan["row_group_end"])),
            columns=[text_col],
        )
        if plan.get("row_start", -1) >= 0:
            t = t.slice(plan["row_start"],
                        plan["row_end"] - plan["row_start"])
        texts = t.column(text_col).take(pa.array(idx))
        keys = categorize_keys(texts, max_tokens)
        vc = keys.value_counts()
        agg.update(dict(zip(
            vc.field("values").to_pylist(),
            vc.field("counts").to_pylist(),
        )))
    return dict(agg)


def categorize_partials(
    index_dir: str | Path,
    doc_ids: np.ndarray,
    max_tokens: int = 5,
    partitions_per_task: int = 16,
) -> list[dict]:
    """Matched ids → per-task ``{category: count}`` partials read from
    the source CORPUS partition lineage (text never leaves the task)."""
    from ..index.build import IndexInfo

    ids = np.unique(np.asarray(doc_ids, dtype=np.int64))
    if len(ids) == 0:
        return []
    info = IndexInfo(index_dir)
    parts = sorted(info.manifest.partitions, key=lambda p: p.doc_base)
    bases = np.array([p.doc_base for p in parts], dtype=np.int64)
    pidx = np.searchsorted(bases, ids, side="right") - 1
    plans, locals_ = [], []
    for pi in np.unique(pidx):
        p = parts[int(pi)]
        plans.append({
            "path": p.path,
            "row_group_start": p.row_group_start,
            "row_group_end": p.row_group_end,
            "row_start": p.row_start,
            "row_end": p.row_end,
        })
        locals_.append(ids[pidx == pi] - p.doc_base)
    futs = [
        _categorize_partition_task.remote(
            plans[i: i + partitions_per_task],
            locals_[i: i + partitions_per_task],
            info.manifest.text_col,
            max_tokens,
        )
        for i in range(0, len(plans), partitions_per_task)
    ]
    return list(ray.get(futs))


def categorize_buckets(
    partials: list[dict], size: int | None = None
) -> list[dict]:
    """Merge partials → ES-shaped buckets (doc_count desc, key asc)."""
    from collections import Counter

    agg: Counter = Counter()
    for p in partials:
        agg.update(p)
    rows = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))
    if size is not None:
        rows = rows[:size]
    return [{"key": k, "doc_count": int(v)} for k, v in rows]
