"""Code-aware tokenization and the per-language analyzer registry.

The reference has NO tokenizer — Elasticsearch analyzers fill that role
(SURVEY.md §2.9).  This module is our replacement.  The extension surface
mirrors the reference's operator-plugin registry (ops discovered by ``_op``
name, ``/root/reference/asset/elasticsearch_reader/index.js:297-303``):
analyzers are registered by name and selected per ``lang``.

Analyzers are pure functions compiled once; stages hold them in actor
``__init__``.  The same code is used by the distributed engine AND the
pure-Python oracle so tokenization is never the source of divergence
(the oracle independently reimplements the index/scoring math only).

Tokenization spec (``code`` analyzer), deliberately simple and exactly
reproducible:

* runs of ``[A-Za-z0-9_]`` are candidate identifiers; everything else
  (operators, punctuation, whitespace) separates tokens;
* identifiers split on underscores and camelCase boundaries: an uppercase
  run followed by a lowercase letter splits before its last capital
  (``HTTPServer`` → ``http``, ``server``), a lower→upper transition splits
  (``fooBar`` → ``foo``, ``bar``); digits stick to the preceding run
  (``sha256`` is one token) but a leading digit run stands alone;
* subtokens are lowercased; length clipped to [min_token_len, max_token_len].

The ``simple`` analyzer is ``lower(text)`` split on ``[^a-z0-9]+`` — chosen
because it is expressible verbatim in ANSI SQL
(``regexp_split_to_array(lower(text), '[^a-z0-9]+')``), which the DuckDB
oracle of the driver correctness gate relies on.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterable

Analyzer = Callable[[str], list[str]]

# one pass over raw text: camel runs, lower runs (digits attached), digit runs
_CODE_RE = re.compile(r"[A-Z]+(?![a-z])[0-9]*|[A-Z][a-z0-9]*|[a-z][a-z0-9]*|[0-9]+")
_SIMPLE_RE = re.compile(r"[a-z0-9]+")

# minimal English stopword list for the `text` analyzer (markdown/prose)
_STOPWORDS = frozenset(
    "a an and are as at be by for from has he in is it its of on that the to was were will with".split()
)


def code_tokens(text: str) -> list[str]:
    """Code analyzer: camel/snake-aware subtokens, lowercased."""
    return [t.lower() for t in _CODE_RE.findall(text)]


_IDENT_RE = re.compile(r"[A-Za-z0-9_]+")


def make_cached_code_tokens(max_idents: int = 1 << 20) -> Analyzer:
    """Memoizing variant of :func:`code_tokens` with IDENTICAL output.

    Identifiers repeat Zipf-style across a corpus, so the camel/snake
    sub-splitting (the 4-alternative regex) runs once per DISTINCT
    identifier; the hot path is a single simple-pattern scan.  One cache
    per build task (bounded; cleared past ``max_idents``).
    """
    cache: dict[str, list[str]] = {}

    def fn(text: str) -> list[str]:
        if len(cache) > max_idents:
            cache.clear()
        out: list[str] = []
        for ident in _IDENT_RE.findall(text):
            subs = cache.get(ident)
            if subs is None:
                subs = cache[ident] = [t.lower() for t in _CODE_RE.findall(ident)]
            out.extend(subs)
        return out

    return fn


def simple_tokens(text: str) -> list[str]:
    """Simple analyzer: lowercase, split on non-alphanumeric (SQL-parity)."""
    return _SIMPLE_RE.findall(text.lower())


def text_tokens(text: str) -> list[str]:
    """Prose analyzer: simple + English stopword removal."""
    return [t for t in _SIMPLE_RE.findall(text.lower()) if t not in _STOPWORDS]


# crude English suffix stripper for the `stem` analyzer (Porter-style
# suffixes + final-e deletion).  Alternatives anchored at $ with
# distinct lengths start at DIFFERENT positions for any given token, so
# leftmost-match semantics pick the same suffix in Python re and RE2
# (DuckDB regexp_replace) — the SQL mirror is
# `CASE WHEN len(regexp_replace(t,'(ing|ies|ed|es|s|e)$','')) >= 2
#       THEN regexp_replace(t,'(ing|ies|ed|es|s|e)$','') ELSE t END`.
_STEM_RE = re.compile(r"(ing|ies|ed|es|s|e)$")


def stem_token(tok: str) -> str:
    """Suffix-strip one token; keep the original when the stem would
    drop below 2 chars (never emits an empty token, so the stem stream
    is 1:1 with the ``simple`` stream — POSITIONS ALIGN, the property
    ``span_field_masking`` requires)."""
    r = _STEM_RE.sub("", tok)
    return r if len(r) >= 2 else tok


def stem_tokens(text: str) -> list[str]:
    """Stemmed sibling of the ``simple`` analyzer (ES multi-field
    ``text.stems`` pattern): identical tokenization, each token mapped
    through :func:`stem_token`.  Token COUNT and POSITIONS are identical
    to ``simple`` over the same text, which makes a ``stem``-analyzed
    field the canonical ``span_field_masking`` partner field."""
    return [stem_token(t) for t in _SIMPLE_RE.findall(text.lower())]


_REGISTRY: dict[str, Analyzer] = {
    "code": code_tokens,
    "simple": simple_tokens,
    "text": text_tokens,
    "stem": stem_tokens,
}

# lang → analyzer name; unknown langs fall back to `code`
_LANG_MAP: dict[str, str] = {
    "markdown": "text",
    "text": "text",
}


def register_analyzer(name: str, fn: Analyzer) -> None:
    """User-extension hook (reference plugin-API analogue)."""
    _REGISTRY[name] = fn


def get_analyzer(name: str) -> Analyzer:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown analyzer {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def analyzer_for_lang(lang: str) -> Analyzer:
    return _REGISTRY[_LANG_MAP.get(lang, "code")]


def clip_tokens(tokens: Iterable[str], min_len: int, max_len: int) -> list[str]:
    return [t for t in tokens if min_len <= len(t) <= max_len]


def tokens_with_offsets(
    text: str, analyzer_name: str, min_len: int = 1, max_len: int = 64
) -> list[tuple[str, int, int]]:
    """Analyzer tokens WITH their [start, end) character offsets in
    ``text`` — the highlighting primitive (ES re-analyzes the stored
    source to map matched terms back to character spans).

    The token SEQUENCE (including the clip filter, applied before
    numbering — the index's position semantics) is identical to
    ``clip_tokens(get_analyzer(name)(text), min_len, max_len)``
    (parity-tested), so index positions index directly into this list.
    Supports the uniform ``code`` / ``simple`` / ``text`` analyzers;
    custom registered analyzers have no offset mapping."""
    out: list[tuple[str, int, int]] = []
    if analyzer_name == "code":
        for m in _IDENT_RE.finditer(text):
            base = m.start()
            for sm in _CODE_RE.finditer(m.group()):
                tok = sm.group().lower()
                if min_len <= len(tok) <= max_len:
                    out.append((tok, base + sm.start(), base + sm.end()))
        return out
    if analyzer_name in ("simple", "text"):
        low = text.lower()
        if len(low) != len(text):  # pragma: no cover - non-1:1 lowercasing
            # offsets computed on the lowered text cannot index the
            # original (e.g. 'İ' → 'i̇' shifts every later span) — fail
            # loud rather than tag the wrong characters
            raise ValueError(
                "text lowercases to a different length; character offsets "
                "cannot map back to the original — highlight unavailable "
                "for this document"
            )
        for m in _SIMPLE_RE.finditer(low):
            tok = m.group()
            if analyzer_name == "text" and tok in _STOPWORDS:
                continue
            if min_len <= len(tok) <= max_len:
                out.append((tok, m.start(), m.end()))
        return out
    raise ValueError(
        f"no offset mapping for analyzer {analyzer_name!r} (custom analyzers "
        "return tokens only)"
    )


def analyze(
    text: str, analyzer: str = "simple", min_len: int = 1, max_len: int = 64
) -> list[dict]:
    """ES ``_analyze`` API: the token stream a text produces under an
    analyzer, as ``[{token, start_offset, end_offset, position, type}]``
    (the shape ES returns).  ``position`` numbers the EMITTED sequence —
    the index's position semantics (filters apply before numbering);
    ES's stop filter instead leaves position gaps, a disclosed
    divergence that keeps ``_analyze`` consistent with how our phrase
    queries number positions.  ``type`` mirrors ES's standard-tokenizer
    tags (``<NUM>`` for all-digit tokens, ``<ALPHANUM>`` otherwise).

    Per-request debugging surface — bulk paths use the vectorized
    ``tokenize_codes_arrow`` instead."""
    return [
        {
            "token": t,
            "start_offset": s,
            "end_offset": e,
            "position": i,
            "type": "<NUM>" if t.isdigit() else "<ALPHANUM>",
        }
        for i, (t, s, e) in enumerate(
            tokens_with_offsets(text, analyzer, min_len, max_len)
        )
    ]
