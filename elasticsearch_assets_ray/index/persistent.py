"""Persistent (micro-batch streaming) index lifecycle.

Reference semantics (``/root/reference/asset/elasticsearch_reader/
elasticsearch_date_range/slicer.js:382-431,507-515`` and
``docs/ops_reference.md:89-113``):

* persistent mode processes tumbling ``interval`` windows of wall-clock
  time; a window's read end is held back to ``now - delay`` (static
  watermark) so late writers can land;
* a ``setInterval`` loop ENQUEUES the next window even while the current
  one is still processing — windows queue, processing drains serially;
* data arriving with timestamps before the already-processed frontier is
  never seen ("assumes linear date times").

File-corpus analogue: the corpus directory grows by immutable parquet
files (data-lake contract).  Each tick at driver time ``T`` makes every
file whose mtime ≤ ``T - delay`` eligible and runs an incremental append
build (``plan_append``): existing shards stay checkpointed byte-for-byte,
only new files get partitions/shards.  The watermark maps to file mtime;
"linear dates" maps to name-ordered arrival (a new file sorting BEFORE
existing ones still indexes correctly, but doc ids then follow MANIFEST
order, not sorted-file order — pass ``manifest.corpus_paths`` to
``BM25Oracle.from_parquet(file_order=...)`` for conformance checks on
appended indexes).

The loop itself is plain driver code (the reference's slicer is also a
single process); all heavy lifting stays in the Ray Data build pipeline.
"""

from __future__ import annotations

import time
from pathlib import Path

from ..config import IndexConfig
from .build import IndexInfo, build_index


class PersistentIndexer:
    """Tumbling-interval incremental indexer over a growing parquet dir.

    ``clock`` / ``sleep`` are injectable for tests (the reference tests
    its persistent slicer the same way — scripted time, no real waiting).
    """

    def __init__(
        self,
        corpus_dir: str | Path,
        index_dir: str | Path,
        config: IndexConfig | None = None,
        interval_s: float = 30.0,
        delay_s: float = 30.0,
        clock=time.time,
        sleep=time.sleep,
        compact_tombstone_fraction: float | None = None,
        global_dir: str | Path | None = None,
        global_kwargs: dict | None = None,
    ):
        if interval_s <= 0 or delay_s < 0:
            raise ValueError("need interval_s > 0 and delay_s >= 0")
        if compact_tombstone_fraction is not None and not (
            0.0 < compact_tombstone_fraction <= 1.0
        ):
            raise ValueError("compact_tombstone_fraction must be in (0, 1]")
        self.corpus_dir = Path(corpus_dir)
        self.index_dir = Path(index_dir)
        self.config = config or IndexConfig()
        self.interval_s = interval_s
        self.delay_s = delay_s
        self.clock = clock
        self.sleep = sleep
        # Lucene-style merge policy: when the tombstoned fraction of the
        # index exceeds this, a tick runs segment compaction after the
        # incremental build (None = never auto-compact)
        self.compact_tombstone_fraction = compact_tombstone_fraction
        # optional term-partitioned layout kept current per tick:
        # append-only deltas append (work ∝ new data); compaction or
        # in-place shard rewrites trigger a full re-merge + atomic swap
        self.global_dir = Path(global_dir) if global_dir is not None else None
        self.global_kwargs = dict(global_kwargs or {})
        self.compactions = 0
        self.ticks = 0
        self.indexed_files: list[str] = []
        # content fingerprints of the last indexed snapshot: a file
        # MODIFIED in place (same path, new mtime/size) is new work even
        # though the file SET is unchanged — build_index routes it
        # through the incremental modified-shard rebuild (plan_append)
        self.indexed_fps: dict[str, tuple[int, int]] = {}
        # window queue: the enqueue loop appends window end-stamps; the
        # drain loop (tick) pops — mirrors slicer.js:414-431
        self.pending_windows: list[float] = []
        self._last_enqueued: float | None = None

    def eligible_files(self, now: float | None = None) -> list[str]:
        """Files past the watermark (mtime <= now - delay), name-sorted."""
        now = self.clock() if now is None else now
        cut = now - self.delay_s
        out = []
        for f in sorted(self.corpus_dir.glob("*.parquet")):
            if f.stat().st_mtime <= cut:
                out.append(str(f))
        return out

    def enqueue_due_windows(self) -> int:
        """Append every interval boundary that has elapsed since the last
        enqueue (windows queue even when processing lags)."""
        now = self.clock()
        if self._last_enqueued is None:
            self._last_enqueued = now
            self.pending_windows.append(now)
            return 1
        n = 0
        while now - self._last_enqueued >= self.interval_s:
            self._last_enqueued += self.interval_s
            self.pending_windows.append(self._last_enqueued)
            n += 1
        return n

    def _maybe_compact(self) -> bool:
        if self.compact_tombstone_fraction is None:
            return False
        import numpy as np

        from .compact import compact_index
        from .deletes import load_deletes, load_dropped_archive

        try:
            info = IndexInfo(self.index_dir)
        except FileNotFoundError:
            return False
        if info.stats.num_docs == 0:
            return False
        # only tombstones for LIVE docs count — replayed deletes of
        # already-compacted ids are no-ops and must not trigger merges
        tombstoned = sum(
            len(np.setdiff1d(load_deletes(self.index_dir, sid),
                             load_dropped_archive(self.index_dir, sid)))
            for sid in info.shard_ids()
        )
        if tombstoned / info.stats.num_docs >= self.compact_tombstone_fraction:
            compact_index(self.index_dir)
            self.compactions += 1
            return True
        return False

    def tick(self) -> "IndexInfo | None":
        """Drain one pending window: incremental build over the files
        eligible at that window's timestamp (then the merge policy, when
        configured).  Returns the IndexInfo when new work ran, None when
        the window had nothing new."""
        if not self.pending_windows:
            return None
        window_end = self.pending_windows.pop(0)
        files = self.eligible_files(window_end)
        self.ticks += 1
        import os as _os

        fps = {
            f: (_os.path.getsize(f), _os.stat(f).st_mtime_ns) for f in files
        }
        if not files or (files == self.indexed_files and fps == self.indexed_fps):
            if self._maybe_compact():
                self._refresh_global()
            return None
        info = build_index(files, self.index_dir, self.config, resume=True)
        self.indexed_files = files
        self.indexed_fps = fps
        if self._maybe_compact():
            info = IndexInfo(self.index_dir)  # stats changed on disk
        self._refresh_global()
        return info

    def _refresh_global(self) -> None:
        if self.global_dir is None:
            return
        from .global_merge import refresh_global_postings

        refresh_global_postings(
            self.index_dir, self.global_dir, **self.global_kwargs
        )

    def run(self, max_ticks: int) -> "IndexInfo | None":
        """Drive ``max_ticks`` windows (bounded for tests/CLI; the true
        daemon loops forever)."""
        info = None
        for _ in range(max_ticks):
            if not self.pending_windows:
                self.enqueue_due_windows()
            if not self.pending_windows:
                self.sleep(self.interval_s)
                continue
            got = self.tick()
            info = got or info
        return info
