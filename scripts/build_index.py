#!/usr/bin/env python
"""Index-build job entry point.

Run locally::

    python scripts/build_index.py --corpus /data/corpus --index /data/idx

or on a cluster via ray job submit (the cluster-mode path the sandbox
stands in for)::

    ray job submit --working-dir . -- python scripts/build_index.py \
        --corpus s3://bucket/corpus --index /shared/idx --analyzer code

Resumable: re-running after a failure skips checkpointed shards; a grown
corpus appends new shards (see ``elasticsearch_assets_ray.index.build``).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="parquet file/dir")
    ap.add_argument("--index", required=True, help="output index dir")
    ap.add_argument("--analyzer", default="code",
                    help="code | simple | text | per_lang")
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--lang-col", default="lang")
    ap.add_argument("--no-lang-col", action="store_true")
    ap.add_argument("--id-col", default=None)
    ap.add_argument("--meta-cols", default="repo,path")
    ap.add_argument("--partition-docs", type=int, default=5_000)
    ap.add_argument("--shard-docs", type=int, default=40_000)
    ap.add_argument("--merge-strategy", default="fused",
                    choices=["fused", "groupby"])
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="only for standalone runs; ignored under ray job submit")
    ap.add_argument("--persistent", action="store_true",
                    help="micro-batch streaming over a growing corpus dir "
                         "(tumbling windows + mtime watermark)")
    ap.add_argument("--interval", type=float, default=30.0,
                    help="persistent mode: window interval seconds")
    ap.add_argument("--delay", type=float, default=30.0,
                    help="persistent mode: watermark delay seconds")
    ap.add_argument("--max-ticks", type=int, default=0,
                    help="persistent mode: stop after N windows (0 = forever)")
    ap.add_argument("--compact-fraction", type=float, default=None,
                    help="persistent mode: auto-compact when the tombstoned "
                         "share of the index exceeds this fraction")
    ap.add_argument("--global-dir", default=None,
                    help="persistent mode: keep a term-partitioned serving "
                         "layout current per tick (append-only deltas "
                         "append; compaction/rewrites re-merge + swap)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        import os

        repo = str(pathlib.Path(__file__).resolve().parent.parent)
        env = {"PYTHONPATH": repo + ":" + os.environ.get("PYTHONPATH", "")}
        kwargs = {
            "include_dashboard": False,
            "logging_level": "ERROR",
            "runtime_env": {"env_vars": env},
        }
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)

    from elasticsearch_assets_ray.config import IndexConfig
    from elasticsearch_assets_ray.index.build import build_index

    cfg = IndexConfig(
        analyzer=args.analyzer,
        text_col=args.text_col,
        lang_col=None if args.no_lang_col else args.lang_col,
        id_col=args.id_col,
        meta_cols=tuple(c for c in args.meta_cols.split(",") if c),
        partition_target_docs=args.partition_docs,
        shard_target_docs=args.shard_docs,
        merge_strategy=args.merge_strategy,
    )
    if args.persistent:
        import itertools

        from elasticsearch_assets_ray.index.persistent import PersistentIndexer

        px = PersistentIndexer(args.corpus, args.index, cfg,
                               interval_s=args.interval, delay_s=args.delay,
                               compact_tombstone_fraction=args.compact_fraction,
                               global_dir=args.global_dir)
        ticks = args.max_ticks or None
        t0 = time.perf_counter()
        info = None
        for _ in itertools.count() if ticks is None else range(ticks):
            got = px.run(max_ticks=1)
            info = got or info
        dt = time.perf_counter() - t0
        if info is None:
            print(json.dumps({"index": args.index, "windows": px.ticks,
                              "num_docs": 0, "seconds": round(dt, 2)}))
            return 0
    else:
        t0 = time.perf_counter()
        info = build_index(args.corpus, args.index, cfg, resume=not args.no_resume)
        dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "index": str(info.index_dir),
                "num_docs": info.stats.num_docs,
                "num_shards": info.stats.num_shards,
                "avgdl": round(info.stats.avgdl, 3),
                "seconds": round(dt, 2),
                "docs_per_sec": round(info.stats.num_docs / dt, 1),
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
