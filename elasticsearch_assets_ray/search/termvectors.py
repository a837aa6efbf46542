"""ES ``_termvectors``: per-document term vectors via the REALTIME path
— re-analyze the stored ``_source`` with the index analyzer (exactly
what ES does when term vectors aren't stored at index time), yielding
per-term ``term_freq`` and in-doc token ``positions``.  Engines layer
``term_statistics`` (doc_freq / ttf probes) and ``field_statistics``
(doc_count / sum_doc_freq / sum_ttf from build stats) on top; both
layouts return identical vectors by construction (shared analyzer +
source stats).  Character offsets are not reported (the analyzers
return token streams, not spans — the highlight module owns the
char-offset map); disclosed divergence."""

from __future__ import annotations


def explain_from_termvector(
    tv: dict, terms: list[str], n_docs: int, avgdl: float,
    k1: float, b: float,
) -> dict:
    """ES ``_explain``: the BM25 score breakdown of one doc for a match
    query — per matched term: df, idf, tf, the length norm and the
    contribution ``idf · tf(k1+1)/(tf + k1(1−b+b·dl/avgdl))``; total =
    the serving score (asserted by test).  Built from the realtime
    termvector (tf + doc_freq per term; dl = Σ term_freq — identical to
    the indexed dl under the same analyzer)."""
    import math

    dl = float(sum(r["term_freq"] for r in tv["terms"].values()))
    rows: dict[str, dict] = {}
    total = 0.0
    for t in sorted(set(terms)):
        row = tv["terms"].get(t)
        if row is None:
            continue
        df = int(row["doc_freq"])
        tf = float(row["term_freq"])
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        norm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        contribution = idf * norm
        total += contribution
        rows[t] = {
            "doc_freq": df, "idf": idf, "term_freq": int(tf),
            "dl": dl, "norm": norm, "contribution": contribution,
        }
    return {"matched": bool(rows), "score": total, "terms": rows,
            "k1": k1, "b": b, "avgdl": avgdl, "n_docs": n_docs}


def build_termvector(text: str, analyze) -> dict:
    """→ {"terms": {term: {"term_freq": n, "positions": [int, ...]}}}
    with positions in token order (0-based, the index's position
    convention)."""
    toks = analyze(text or "")
    terms: dict[str, dict] = {}
    for pos, t in enumerate(toks):
        row = terms.get(t)
        if row is None:
            terms[t] = {"term_freq": 1, "positions": [pos]}
        else:
            row["term_freq"] += 1
            row["positions"].append(pos)
    return {"terms": terms}
