#!/usr/bin/env python
"""1M-doc scale rehearsal of the incremental / substring / epoch-order
ops (VERDICT r4 item 5): one op per invocation in its own fresh Ray
session, printing ONE JSON line with wall seconds, docs/sec and peak
resident memory.

    python scripts/scale_rehearsal.py --op incremental_minhash
    python scripts/scale_rehearsal.py --op esd_hash128
    python scripts/scale_rehearsal.py --op shuffle_write

Peak RSS is the sum of resident set over the driver + every Ray process
(raylet / plasma / workers), sampled at 2 Hz from /proc — an
approximation of the op's whole-box memory footprint (the raylet's RSS
includes resident object-store pages, so spill-heavy ops show the store
pressure too).

The corpus is the persistent deterministic 1M code corpus
(/tmp/esray_corpus_1m, corpus/synth.py); a (doc_id, text) projection is
derived once to /tmp/esray_docs_1m — doc_id = global row number in
sorted-file order, so every run sees identical ids.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import pathlib
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

N_DOCS = 1_000_000
CORPUS = "/tmp/esray_corpus_1m"
DOCS = "/tmp/esray_docs_1m"
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _proc_rss(pid: str) -> int:
    with open(f"/proc/{pid}/statm") as f:
        return int(f.read().split()[1]) * 4096


def rss_sampler(stop: threading.Event, out: dict) -> None:
    me = os.getpid()
    while not stop.is_set():
        tot = 0
        for p in os.listdir("/proc"):
            if not p.isdigit():
                continue
            try:
                if int(p) != me:
                    with open(f"/proc/{p}/cmdline", "rb") as f:
                        cmd = f.read()
                    if (b"ray::" not in cmd and b"raylet" not in cmd
                            and b"plasma" not in cmd):
                        continue
                tot += _proc_rss(p)
            except OSError:
                continue
        out["peak_rss"] = max(out.get("peak_rss", 0), tot)
        stop.wait(0.5)


def ensure_docs() -> None:
    """One-off (doc_id, text) projection of the 1M corpus with stable
    ids (global row number in sorted-file order)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_assets_ray.corpus.synth import write_corpus

    write_corpus(CORPUS, N_DOCS, rows_per_file=4_000)  # no-op if present
    if os.path.exists(os.path.join(DOCS, "_COMPLETE")):
        return
    shutil.rmtree(DOCS, ignore_errors=True)
    os.makedirs(DOCS)
    base = 0
    for i, f in enumerate(sorted(glob.glob(f"{CORPUS}/*.parquet"))):
        t = pq.read_table(f, columns=["content"])
        ids = pa.array(range(base, base + t.num_rows), pa.int64())
        base += t.num_rows
        pq.write_table(
            pa.table({"doc_id": ids, "text": t.column("content")}),
            os.path.join(DOCS, f"docs-{i:05d}.parquet"),
        )
    with open(os.path.join(DOCS, "_COMPLETE"), "w") as f:
        f.write(str(base))


def run_op(op: str) -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    files = sorted(glob.glob(f"{DOCS}/docs-*.parquet"))
    info: dict = {"op": op, "n_docs": N_DOCS, "num_cpus": NUM_CPUS}
    t0 = time.perf_counter()
    if op == "incremental_minhash":
        # two 500k waves against a persisted band+spill store — the
        # daily-increment posture; wave 2 pays wave-1 state reads
        from elasticsearch_assets_ray.ops.dedup import (
            incremental_minhash_pairs,
        )

        half = len(files) // 2
        state = tempfile.mkdtemp(prefix="esray_rehearse_mh_")
        try:
            t1 = incremental_minhash_pairs(
                rd.read_parquet(files[:half]), state, "w1")
            w1 = time.perf_counter() - t0
            t2 = incremental_minhash_pairs(
                rd.read_parquet(files[half:]), state, "w2")
            info.update(wave1_sec=round(w1, 1),
                        wave2_sec=round(time.perf_counter() - t0 - w1, 1),
                        pairs=t1.num_rows + t2.num_rows)
        finally:
            shutil.rmtree(state, ignore_errors=True)
    elif op == "esd_hash128":
        from elasticsearch_assets_ray.ops.ngram_coverage import (
            exact_substring_dedup,
        )

        out = exact_substring_dedup(rd.read_parquet(files), n=5,
                                    gram_identity="hash128")
        from elasticsearch_assets_ray.ops import to_arrow

        info["out_rows"] = to_arrow(out).num_rows
    elif op == "shuffle_write":
        from elasticsearch_assets_ray.ops.sampling import (
            shuffle_order_write,
            shuffled_files,
        )

        dest = tempfile.mkdtemp(prefix="esray_rehearse_shuf_")
        try:
            shuffle_order_write(rd.read_parquet(files), dest,
                                n_ranges=256, seed=7)
            info["ranges"] = len(shuffled_files(dest))
        finally:
            shutil.rmtree(dest, ignore_errors=True)
    else:
        raise SystemExit(f"unknown op {op!r}")
    dt = time.perf_counter() - t0
    info.update(wall_sec=round(dt, 1), docs_per_sec=round(N_DOCS / dt, 1))
    ray.shutdown()
    return info


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", required=True)
    args = ap.parse_args()
    ensure_docs()
    stop = threading.Event()
    mem: dict = {}
    load0 = round(os.getloadavg()[0], 1)
    th = threading.Thread(target=rss_sampler, args=(stop, mem), daemon=True)
    th.start()
    info = run_op(args.op)
    stop.set()
    th.join()
    info["peak_rss_gib"] = round(mem.get("peak_rss", 0) / 2**30, 2)
    info["loadavg_end"] = round(os.getloadavg()[0], 1)
    info["loadavg_start"] = load0
    print(json.dumps(info))


if __name__ == "__main__":
    main()
