"""ES suggesters: ``term`` (spell correction) and ``completion``
(prefix + popularity) — shared ranking logic; each engine supplies its
dictionary expansion and df probe, so both layouts return identical
suggestions by construction.

Term suggester (the ES ``suggest.term`` / Lucene DirectSpellChecker
analogue): per input token, dictionary terms within ``max_edits``
(``prefix_length`` leading chars pinned, candidates drawn under the
engines' deterministic (distance asc, term asc) ``max_candidates``
cap), scored ``1 − distance / min(len(token), len(candidate))`` — the
SAME normalized-similarity form this repo's ``fuzzy`` query boosts
with (Lucene FuzzyTermsEnum; DirectSpellChecker's distance scorer
differs in tie details — disclosed), ranked (score desc, df desc, term
asc), top ``size``.  ``suggest_mode``: ``missing`` (suggest only for
tokens absent from the index — the ES default), ``popular`` (only
candidates more frequent than the input), ``always``.

Completion suggester: dictionary terms with the prefix ranked by
DOCUMENT FREQUENCY (popularity) desc, term asc.  ES's completion
suggester ranks by explicit per-suggestion ``weight`` over a dedicated
FST field; this engine derives popularity from the indexed corpus
itself (df) — the zero-config analogue, disclosed.  The candidate walk
is term-ordered and capped (``max_candidates``) — a short prefix over a
huge vocabulary is bounded by the cap, not the vocabulary.
"""

from __future__ import annotations


def rank_term_suggestions(
    token: str,
    candidates: list[tuple[str, int]],
    dfs: dict[str, int],
    token_df: int,
    size: int,
    suggest_mode: str = "missing",
) -> list[dict]:
    """Rank one token's fuzzy candidates → [{suggestion, score, freq}]."""
    if suggest_mode not in ("missing", "popular", "always"):
        raise ValueError(f"unknown suggest_mode {suggest_mode!r}")
    if suggest_mode == "missing" and token_df > 0:
        return []
    scored = []
    for term, dist in candidates:
        if term == token:
            continue
        df = int(dfs.get(term, 0))
        if df < 1:
            continue
        if suggest_mode == "popular" and df <= token_df:
            continue
        score = 1.0 - dist / max(1, min(len(token), len(term)))
        scored.append((-score, -df, term))
    scored.sort()
    return [
        {"suggestion": t, "score": -ns, "freq": -nd}
        for ns, nd, t in scored[:size]
    ]


def rank_completions(
    terms: list[str], dfs: dict[str, int], size: int
) -> list[dict]:
    """Rank prefix candidates by (df desc, term asc) → top ``size``."""
    ranked = sorted(
        ((-int(dfs.get(t, 0)), t) for t in terms if dfs.get(t, 0)),
    )
    return [{"suggestion": t, "freq": -nd} for nd, t in ranked[:size]]
