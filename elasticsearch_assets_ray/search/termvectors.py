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
