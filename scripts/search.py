#!/usr/bin/env python
"""BM25 query job entry point (ray job submit compatible).

    python scripts/search.py --index /data/idx --query "parse config value" -k 10
    ray job submit --working-dir . -- python scripts/search.py --index ... --query ...
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", action="append", default=[],
                    help="repeatable; each runs as one free-text query")
    ap.add_argument("--body", action="append", default=[],
                    help="repeatable; a full ES search request body as "
                         "JSON ({'query': …, 'from'/'size', 'aggs': …}) "
                         "— executed via search.request.execute_request")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--actors", type=int, default=4)
    ap.add_argument("--method", default="auto", choices=["auto", "dense", "wand"])
    ap.add_argument("--hydrate", default=None,
                    help="comma-separated docmeta columns to attach")
    ap.add_argument("--embeddings", default=None,
                    help="embeddings parquet path — enables retriever "
                         "knn leaves and the top-level knn body section")
    ap.add_argument("--num-cpus", type=int, default=None)
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

    from elasticsearch_assets_ray.search.engine import QueryEngine

    eng = QueryEngine(args.index, num_actors=args.actors, method=args.method)
    store = None
    if args.hydrate:
        from elasticsearch_assets_ray.state.docstore import DocStore

        cols = ["doc_id"] + [c for c in args.hydrate.split(",") if c]
        store = DocStore(args.index, columns=cols)
    if not args.query and not args.body:
        ap.error("need at least one --query or --body")
    for q in args.query:
        hits = eng.search(q, k=args.k)
        rows = [{"doc_id": d, "score": round(s, 6)} for d, s in hits]
        if store is not None and rows:
            meta = store.mget([r["doc_id"] for r in rows]).to_pylist()
            rows = [{**r, **{k: v for k, v in m.items() if k != "doc_id"}}
                    for r, m in zip(rows, meta)]
        print(json.dumps({"query": q, "hits": rows}))
    ctx = None
    for raw in args.body:
        from elasticsearch_assets_ray.search.request import execute_request

        body = json.loads(raw)
        if ctx is None and ("retriever" in body or "knn" in body):
            from elasticsearch_assets_ray.search.retriever import (
                RetrieverContext,
            )

            ctx = RetrieverContext(eng, args.index,
                                   embeddings_path=args.embeddings)
        print(json.dumps(execute_request(eng, body, retriever_ctx=ctx)))
    eng.shutdown()
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
