"""Mock-data generator source — the reference's
``elasticsearch_data_generator`` (``/root/reference/asset/
elasticsearch_data_generator/index.js:9-96``) as a Ray Data source.

Chunk planning reproduces the reference slicer exactly:

* ``once`` mode counts a ``total`` down in chunks of the *downstream
  op's* batch size (``index.js:59-78`` — the sink's ``size``
  back-propagates into planning), terminating when exhausted;
* ``persistent`` mode yields constant ``chunk`` forever
  (``index.js:80-82``);
* one generator slicer regardless of requested parallelism
  (``index.js:84-96``).

Row synthesis is the deterministic ``make_gen_docs`` fixture (F4, seeded
per-chunk) — unlike the reference's unseeded mocker, identical runs
produce identical rows, which is what makes resume/replay testable.
``id_start_key`` forces the first id character (``default_schema.js:96-103``),
enabling the multisend routing demo.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

import ray.data as rd

from ..corpus.synth import make_gen_docs


def once_slices(total: int, chunk: int) -> Iterator[int]:
    """Counts for ``once`` lifecycle: chunks of ``chunk`` summing to
    ``total`` (last one smaller); the reference emits null after — here
    the iterator just ends."""
    if total < 0 or chunk < 1:
        raise ValueError("need total >= 0, chunk >= 1")
    remaining = total
    while remaining > 0:
        n = min(chunk, remaining)
        yield n
        remaining -= n


def persistent_slices(chunk: int) -> Iterator[int]:
    """Constant-size chunks forever (persistent lifecycle)."""
    if chunk < 1:
        raise ValueError("chunk must be >= 1")
    while True:
        yield chunk


def read_generated(
    total: int,
    chunk: int = 500,
    seed: int = 42,
    id_start_key: str | None = None,
    stress_test: bool = False,
):
    """Bounded generated Dataset: one block per planned chunk.

    ``stress_test`` repeats the first generated doc (the reference's
    write-perf mode, ``index.js:36-49``) — rows are identical, planning
    unchanged.
    """
    plan = [
        {"slice_id": i, "count": n, "offset": sum_}
        for i, (n, sum_) in enumerate(
            (n, s) for n, s in _with_offsets(once_slices(total, chunk))
        )
    ]

    def gen(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            tbl = make_gen_docs(
                row["count"], seed=seed + row["slice_id"], id_start_key=id_start_key
            )
            if stress_test and tbl.num_rows:
                tbl = pa.concat_tables([tbl.slice(0, 1)] * tbl.num_rows)
            out.append(tbl)
        return pa.concat_tables(out) if out else make_gen_docs(0, seed=seed)

    return rd.from_items(plan).map_batches(
        gen, batch_format="pyarrow", zero_copy_batch=True, batch_size=1
    )


def _with_offsets(counts):
    off = 0
    for n in counts:
        yield n, off
        off += n
