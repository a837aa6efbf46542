"""ES *Graph explore* (the ``_graph/explore`` API): discover the terms
most significantly associated with a seed query (VERTICES) and how
strongly those terms co-occur in documents (CONNECTIONS) — the "show me
the concept graph around X" exploration tool.

Restated over the engines' existing primitives (engine-agnostic — both
engines expose the same surface):

- The SAMPLE is the deterministic first ``sample_size`` matched doc ids
  ascending (``engine.sample_match_texts`` — the same disclosed
  stand-in for ES's per-shard ``sample_size`` that ``significant_text``
  uses, SQL-reproducible).
- VERTICES are the top-``vertices_size`` terms of the sample's text by
  JLH significance against the whole-index background (exactly the
  ``significant_text`` scoring — ES Graph's default "certainty"
  weighting is the same significance family).
- CONNECTIONS are DISTINCT-DOC co-occurrence counts between vertex
  pairs within the sample (ES weights edges by in-sample document
  overlap); pairs below ``min_edge_doc_count`` drop.  Edge rows come
  back (doc_count desc, source asc, target asc) with source < target.

Depth-1 is exact and SQL-oracled; deeper spidering (ES ``connections``
nesting) is iterated client-side by re-seeding with vertex terms —
each hop is another exact depth-1 call.

Driver-side work is O(sample_size × vertices) set probes — bounded by
the sample exactly like ES's own Graph implementation (it never scans
the full index either).
"""

from __future__ import annotations

import numpy as np


def graph_explore(
    engine,
    query: str | list[str],
    vertices_size: int = 8,
    sample_size: int = 100,
    min_edge_doc_count: int = 2,
) -> tuple[list[dict], list[dict]]:
    """→ (vertices, connections).  Vertices carry the significant-terms
    row shape ({key, doc_count, bg_count, score}); connections are
    {source, target, doc_count} with source < target."""
    from .datehist import significant_terms_rows

    ids, texts = engine.sample_match_texts(query, sample_size)
    if len(ids) == 0:
        return [], []
    analyze = engine._sqs_analyze()
    doc_sets = [set(analyze(t)) for t in texts]
    fg: dict[str, tuple] = {}
    for s in doc_sets:
        for t in s:
            c = fg.get(t)
            fg[t] = (c[0] + 1,) if c else (1,)
    bg = {t: (df,) for t, df in engine.dfs(sorted(fg)).items()}
    n_total = getattr(engine, "n", None)
    if n_total is None:
        n_total = engine.info.stats.num_docs
    verts = significant_terms_rows(
        fg, bg, vertices_size, fg_total=len(ids), bg_total=n_total,
    )
    vterms = sorted(v["key"] for v in verts)
    edges = []
    for i, a in enumerate(vterms):
        for b in vterms[i + 1:]:
            c = sum(1 for s in doc_sets if a in s and b in s)
            if c >= min_edge_doc_count:
                edges.append({"source": a, "target": b, "doc_count": c})
    edges.sort(key=lambda e: (-e["doc_count"], e["source"], e["target"]))
    return verts, edges
