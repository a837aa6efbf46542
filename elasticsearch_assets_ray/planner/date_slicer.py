"""Adaptive date-range partition planning.

Behavioral port of the reference's date slicer
(``/root/reference/asset/elasticsearch_reader/elasticsearch_date_range/slicer.js``)
— same planning *semantics*, none of its execution machinery (our slices
become Ray Data read-task manifest rows, not Teraslice worker messages):

* P1 auto interval  — ``interval = range / ceil(total/size)``  (slicer.js:484-505)
* P2 divideRange    — split evenly among N planners, last pinned  (slicer.js:359-380)
* P3 recursive halving — count > size → halve window, recurse; floor at one
  resolution unit  (slicer.js:163-250)
* P4 range expansion — count == 0 → grow window by interval, capped at the
  limit  (slicer.js:227-240)
* P5 subslice-by-key — a floor-width slice still ≥ threshold fans out into
  id-prefix sub-slices  (slicer.js:281-332)

Counts come from a pluggable ``count_fn(start, end) -> int`` — the ES
``count`` probe of the reference (slicer.js:469-482), backed here by an
exact in-memory counter (tests / small data) or Parquet row-group
statistics (scale path: cost ∝ file count, zero data reads).

Timestamps are plain integers in the caller's resolution (ms or s),
mirroring the reference's ``time_resolution`` normalization
(``asset/utils.js:6-47``).
"""

from __future__ import annotations

import math
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import numpy as np


@dataclass(frozen=True)
class DateSlice:
    start: int
    end: int  # exclusive
    count: int
    key: str | None = None  # set for P5 sub-slices


@dataclass
class SlicerMetrics:
    """Counters mirroring the reference's slicer events
    (``slicer:slice:recursion`` / ``slicer:slice:range_expansion``)."""

    recursions: int = 0
    expansions: int = 0
    subslices: int = 0


def auto_interval(total_count: int, size: int, start: int, end: int) -> int:
    """P1: target-equal-count interval, floored at one resolution unit."""
    if total_count <= 0:
        return max(1, end - start)
    num_slices = math.ceil(total_count / size)
    return max(1, math.ceil((end - start) / num_slices))


def divide_range(start: int, end: int, n: int) -> list[tuple[int, int]]:
    """P2: split [start, end) into n near-even spans; last pinned to end."""
    if n < 1:
        raise ValueError("n must be >= 1")
    step = max(1, (end - start) // n)
    out = []
    lo = start
    for i in range(n):
        hi = end if i == n - 1 else min(lo + step, end)
        out.append((lo, hi))
        lo = hi
    return [(a, b) for a, b in out if b > a] or [(start, end)]


class DateSlicer:
    """Iterator of adaptive slices over [start, end).

    ``subslice_key_fn(start, end) -> list[(key, count)]`` enables P5 — it is
    typically an :class:`~elasticsearch_assets_ray.planner.id_slicer.IdSlicer`
    restricted to the time window.
    """

    def __init__(
        self,
        count_fn: Callable[[int, int], int],
        start: int,
        end: int,
        size: int,
        interval: int | None = None,
        total_count: int | None = None,
        subslice_key_threshold: int | None = None,
        subslice_key_fn: Callable[[int, int], list[tuple[str, int]]] | None = None,
    ):
        if end <= start:
            raise ValueError(f"empty range [{start}, {end})")
        if size < 1:
            raise ValueError("size must be >= 1")
        if subslice_key_threshold is not None and subslice_key_fn is None:
            raise ValueError("subslice_key_threshold requires subslice_key_fn")
        self.count_fn = count_fn
        self.start = start
        self.end = end
        self.size = size
        if interval is None:
            total = total_count if total_count is not None else count_fn(start, end)
            interval = auto_interval(total, size, start, end)
        self.interval = interval
        self.subslice_key_threshold = subslice_key_threshold
        self.subslice_key_fn = subslice_key_fn
        self.metrics = SlicerMetrics()

    def _shrink_to_fit(self, start: int, end: int, count: int) -> tuple[int, int]:
        """P3: halve the window until count <= size or width hits 1 unit."""
        while count > self.size and end - start > 1:
            self.metrics.recursions += 1
            mid = start + (end - start) // 2
            end = mid
            count = self.count_fn(start, end)
        # a shrink can land on an empty half — regrow minimally (the
        # reference re-expands via determineSlice, slicer.js:227-240)
        while count == 0 and end < self.end:
            end = min(end + 1, self.end)
            count = self.count_fn(start, end)
        return end, count

    def slices(self, resume_after: int | None = None) -> Iterator[DateSlice]:
        """Yield slices; ``resume_after`` = last completed slice end
        (checkpoint resume, the ``retryData.lastSlice`` analogue,
        slicer.js:298-300)."""
        start = resume_after if resume_after is not None else self.start
        while start < self.end:
            end = min(start + self.interval, self.end)
            count = self.count_fn(start, end)
            if count == 0:
                # P4: expand until data or limit
                while count == 0 and end < self.end:
                    self.metrics.expansions += 1
                    end = min(end + self.interval, self.end)
                    count = self.count_fn(start, end)
                if count == 0:
                    return  # rest of the range is empty
            if count > self.size:
                end, count = self._shrink_to_fit(start, end, count)
            if (
                count > self.size
                and self.subslice_key_threshold is not None
                and count >= self.subslice_key_threshold
            ):
                # P5: floor-width window still too hot → id-prefix fan-out
                for key, kcount in self.subslice_key_fn(start, end):
                    self.metrics.subslices += 1
                    yield DateSlice(start, end, kcount, key=key)
            else:
                yield DateSlice(start, end, count)
            start = end


class ExactCountProvider:
    """Exact counts from an in-memory sorted timestamp array (test scale,
    and the per-window secondary probe at any scale)."""

    def __init__(self, timestamps: np.ndarray):
        self.ts = np.sort(np.asarray(timestamps))

    def __call__(self, start: int, end: int) -> int:
        return int(
            np.searchsorted(self.ts, end, "left")
            - np.searchsorted(self.ts, start, "left")
        )

    @property
    def total(self) -> int:
        return len(self.ts)

    @property
    def bounds(self) -> tuple[int, int]:
        """min/max discovery — the reference's sort-asc/desc size-1 probe
        (slicer.js:75-132); end is +1 to make the range inclusive→exclusive
        (slicer.js:127-130)."""
        return int(self.ts[0]), int(self.ts[-1]) + 1


class ParquetStatsCountProvider:
    """Approximate counts from Parquet row-group min/max statistics —
    zero data reads, cost ∝ number of row groups (the scale path).

    Density is assumed uniform within a row group; exact planning then
    happens inside each partition where the data is local.
    """

    def __init__(self, files: list[str], ts_column: str):
        import pyarrow.parquet as pq

        mins, maxs, rows = [], [], []
        for f in files:
            md = pq.ParquetFile(f).metadata
            ci = md.schema.to_arrow_schema().get_field_index(ts_column)
            for i in range(md.num_row_groups):
                st = md.row_group(i).column(ci).statistics
                if st is None or not st.has_min_max:
                    raise ValueError(f"no stats for {ts_column} in {f} rg{i}")
                mins.append(_to_int(st.min))
                maxs.append(_to_int(st.max))
                rows.append(md.row_group(i).num_rows)
        self.mins = np.array(mins, dtype=np.int64)
        self.maxs = np.array(maxs, dtype=np.int64)
        self.rows = np.array(rows, dtype=np.int64)

    def __call__(self, start: int, end: int) -> int:
        span = np.maximum(self.maxs - self.mins + 1, 1)
        lo = np.maximum(self.mins, start)
        hi = np.minimum(self.maxs + 1, end)
        overlap = np.maximum(hi - lo, 0)
        return int(np.sum(self.rows * overlap / span))

    @property
    def total(self) -> int:
        return int(self.rows.sum())

    @property
    def bounds(self) -> tuple[int, int]:
        return int(self.mins.min()), int(self.maxs.max()) + 1


def _to_int(v) -> int:
    """Statistics value → planner epoch-ms (timestamp stats arrive as
    datetimes regardless of the column's storage unit; plain ints pass
    through untouched)."""
    import datetime as dt

    if isinstance(v, dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=dt.timezone.utc)
        return int(v.timestamp() * 1_000)
    return int(v)


class ScanCountProvider:
    """EXACT counts via predicate-pushdown scans — the reference's ES
    ``count`` probe made literal (``slicer.js:469-482``): each probe is a
    ``pyarrow.dataset.count_rows`` with a range filter, so row-group
    statistics prune non-overlapping groups and only boundary pages
    decode.  Bounds and total come from footer metadata alone.  Nothing
    corpus-sized ever reaches the driver — probe cost scales with the
    rows under the probed range, not the corpus.

    Ranges are epoch-ms for timestamp columns (unit-independent), raw
    ints for integer columns.
    """

    def __init__(self, files: list[str], ts_column: str):
        import pyarrow as pa
        import pyarrow.dataset as pds

        self._stats = ParquetStatsCountProvider(files, ts_column)
        self._ds = pds.dataset(files)
        self.ts_column = ts_column
        t = self._ds.schema.field(ts_column).type
        # compare in a domain where ms bounds are EXACT: cast the column
        # up to us (lossless for s/ms/us; ns floors to us, matching the
        # exact provider's epoch_ms floor).  Scaling the ms bound DOWN
        # into a coarser column unit (e.g. int(ms*0.001) for seconds)
        # floor-shifts the boundary by up to 999 ms — measured to
        # misattribute boundary rows between adjacent slices.
        import pyarrow.compute as pc

        if pa.types.is_timestamp(t):
            self._field = pc.field(ts_column).cast(pa.timestamp("us"))
            self._scalar = lambda ms: pa.scalar(int(ms) * 1000, type=pa.timestamp("us"))
        else:
            self._field = pc.field(ts_column)
            self._scalar = lambda v: pa.scalar(int(v), type=t)

    def __call__(self, start: int, end: int) -> int:
        f = (self._field >= self._scalar(start)) & (
            self._field < self._scalar(end)
        )
        return self._ds.count_rows(filter=f)

    @property
    def total(self) -> int:
        return self._stats.total

    @property
    def bounds(self) -> tuple[int, int]:
        return self._stats.bounds
