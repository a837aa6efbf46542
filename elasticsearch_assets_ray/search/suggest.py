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


# ----------------------------------------------------- phrase suggester

# Documented formula (the ES phrase suggester's shape, exact constants
# ours — disclosed): candidate phrases score a log10 bigram language
# model with STUPID BACKOFF (factor 0.4, the classic constant and the
# ES default discount) over corpus counts, times per-token error
# likelihoods:
#
#   score = Σ_i log10(P(w_i | w_{i-1})) + Σ_i log10(e_i)
#   P(w_1)           = cf(w_1) / total_tokens
#   P(w_i | w_{i-1}) = big(w_{i-1}, w_i) / cf(w_{i-1})    if bigram > 0
#                      0.4 · cf(w_i) / total_tokens        otherwise
#   e_i = real_word_error_likelihood (0.95)                if unchanged
#         (1 − dist/min(len(orig), len(cand))) · 0.05      if corrected
#
# Bigram counts come from the index_phrases SHINGLE postings (cf of the
# "w1\x1fw2" term IS the corpus bigram count) — the layout that makes a
# did-you-mean serving path possible without a side model.
BACKOFF = 0.4
RWEL = 0.95


def suggest_phrase(
    text: str,
    analyze,
    expand_fuzzy,
    cfs,
    total_tokens: int,
    shingle_sep: str,
    size: int = 3,
    max_edits: int = 1,
    prefix_length: int = 1,
    num_candidates: int = 6,
    max_errors: int = 2,
    collate_match=None,
    collate_prune: bool = False,
) -> list[dict]:
    """ES ``phrase`` suggester (did-you-mean): per-token candidates from
    the dictionary (deterministic (dist, term) cap — the direct
    generator), exhaustive combination under ``max_errors`` changed
    tokens, bigram-LM scoring per the module formula, top ``size`` by
    (score desc, text asc).  Only combinations scoring STRICTLY above
    the unchanged input (``confidence=1.0``, the ES default) return; an
    input with an out-of-dictionary token scores −∞, so any valid
    correction beats it.  ``cfs(terms) → {term: count}`` must resolve
    both unigrams and ``w1<sep>w2`` shingle terms (an index_phrases
    layout).

    ``collate_match`` (ES ``collate``): a callable ``(words: tuple) →
    bool`` — does the suggestion, as an exact phrase, match at least one
    document?  Suggestions failing it are DROPPED (walked lazily in rank
    order, so queries run only until ``size`` survivors are found); with
    ``collate_prune=True`` (ES ``prune``) they are kept and every
    suggestion gains a ``collate_match`` field instead."""
    import itertools
    import math

    toks = analyze(text)
    if not toks:
        return []
    cand_lists: list[list[tuple[str, int]]] = []
    for tok in toks:
        cands = list(expand_fuzzy(tok, max_edits, prefix_length,
                                  num_candidates))
        if tok not in {t for t, _ in cands}:
            cands.append((tok, 0))  # keep the original even if absent
        cand_lists.append(cands)
    n_combos = 1
    for c in cand_lists:
        n_combos *= len(c)
    if n_combos > 100_000:
        raise ValueError("phrase suggester: candidate space too large")
    # one batched stats probe: every candidate unigram + every adjacent
    # candidate bigram (shingle terms)
    need = sorted({t for cl in cand_lists for t, _ in cl})
    bigrams = sorted({
        a + shingle_sep + b
        for i in range(len(cand_lists) - 1)
        for a, _ in cand_lists[i]
        for b, _ in cand_lists[i + 1]
    })
    counts = cfs(need + bigrams)

    def phrase_score(words: tuple, dists: tuple) -> float | None:
        s = 0.0
        for i, (w, d) in enumerate(zip(words, dists)):
            cf = counts.get(w, 0)
            if cf == 0:
                return None  # out-of-dictionary token → −∞
            if i == 0:
                p = cf / total_tokens
            else:
                big = counts.get(words[i - 1] + shingle_sep + w, 0)
                p = big / counts[words[i - 1]] if big > 0 \
                    else BACKOFF * cf / total_tokens
            e = RWEL if w == toks[i] else (
                (1.0 - d / max(1, min(len(toks[i]), len(w)))) * (1.0 - RWEL)
            )
            if e <= 0.0:
                return None
            s += math.log10(p) + math.log10(e)
        return s

    base = phrase_score(tuple(toks), (0,) * len(toks))
    out = []
    for combo in itertools.product(*cand_lists):
        words = tuple(w for w, _ in combo)
        dists = tuple(d for _, d in combo)
        changed = sum(1 for w, t in zip(words, toks) if w != t)
        if changed == 0 or changed > max_errors:
            continue
        s = phrase_score(words, dists)
        if s is None or (base is not None and s <= base):
            continue
        out.append((-s, " ".join(words), words))
    out.sort()
    results: list[dict] = []
    for ns, t, words in out:
        if len(results) >= size:
            break
        if collate_match is None:
            results.append({"text": t, "score": -ns})
            continue
        m = bool(collate_match(words))
        if collate_prune:
            results.append({"text": t, "score": -ns, "collate_match": m})
        elif m:
            results.append({"text": t, "score": -ns})
    return results
