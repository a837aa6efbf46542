"""ES ``query_string`` query: the classic Lucene query syntax over the
serving engines.

This is the ``q=`` syntax the reference forwards verbatim to
Elasticsearch as the reader's free-text ``query`` config
(``/root/reference/asset/elasticsearch_reader/index.js:118-122``,
``asset/simple_api_reader/index.js:67-84`` pass it straight into a
``query_string`` request body) — the repo's ``sources/query.py``
compiles the same surface to Arrow FILTER expressions for the read
path; this module compiles it to SCORED clause trees for the serving
engines (the part the reference delegates to ES).

Supported syntax (the documented subset — divergences at the bottom):

- whitespace-adjacent clauses combine with ``default_operator``
  (``"or"``, the ES default, or ``"and"``);
- ``AND`` / ``&&``, ``OR`` / ``||`` explicit operators; ``AND`` binds
  tighter than ``OR``-level adjacency (see divergences);
- ``NOT x`` / ``!x`` / ``-x`` prohibited clause, ``+x`` required
  clause (Lucene occur modifiers: required clauses gate the match set
  but every matching scoring clause still contributes to the sum);
- ``( ... )`` grouping, with an optional trailing ``^boost``;
- ``"a phrase"`` / ``"a phrase"~N`` — exact / sloppy phrase (Lucene
  SloppyPhraseMatcher semantics via the in-repo matcher);
- ``field:value`` — field-scoped clause.  The DEFAULT field (the
  indexed text) produces scored text leaves; any other field is a
  stored-docmeta (keyword / numeric / date doc-values) clause scoring
  a constant 1.0 per match (see divergences);
- ``field:[a TO b]`` / ``{a TO b}`` ranges (each bound's inclusivity
  follows its own bracket, mixed brackets legal), ``field:>=v``,
  ``>v``, ``<=v``, ``<v`` — numeric or ISO-date bounds; ``*`` as a
  bound leaves it open;
- ``field:(x y z)`` — field scope distributes over a group;
- ``te*t`` / ``te?t`` wildcards (``*`` any run, ``?`` one char) —
  constant_score 1.0, the ES default ``constant_score`` multi-term
  rewrite; a trailing-``*``-only pattern lowers to the cheaper prefix
  leaf;
- ``word~`` / ``word~N`` fuzzy (edit distance, default 2) — the
  engines' dictionary expansion + scoring_boolean weighted
  disjunction (same kernel as ``simple_query_string``'s ``~N``);
- ``clause^F`` boost — multiplies the clause's scores by ``F``.

Scoring is Lucene BooleanQuery's: a doc's score at each node is the
SUM of its matching scoring clauses; ``^boost`` scales a subtree;
required (``+``) clauses restrict the doc set without double-counting
score; prohibited clauses subtract docs.

Disclosed divergences from ES/Lucene:

- operator precedence: this parser resolves ``NOT`` > ``AND`` >
  ``OR``/adjacency (the precedence most reimplementations and the ES
  docs' examples assume).  Lucene's single-pass parser has famously
  non-boolean corner cases (``a OR b AND c`` etc.) that are NOT
  reproduced bug-for-bug.
- keyword-field term clauses (``lang:python``) score a constant 1.0
  per matching doc (filter-context semantics); ES scores keyword term
  queries with an idf-weighted TermQuery.  Numeric/date RANGE clauses
  score 1.0 in ES too (``constant_score`` rewrite) — those match.
- no ``\\`` escaping and no per-clause ``minimum_should_match``;
  ``_exists_:field`` IS supported (docs with a non-null value for the
  docmeta field, constant score 1.0), ``_missing_:`` (removed from ES
  5+) is not.

Tree node additions over :mod:`.sqs` (evaluated by the same
``eval_tree`` walker so both engines serve query_string through their
existing sqs machinery):

- ``("boost", child, factor)`` — scores × factor;
- ``("filter", scored, required)`` — scored's docs ∩ required's docs,
  scored's scores (the MUST-occur gate);
- ``("metaterm", field, raw_value)`` — docmeta equality, score 1.0;
- ``("metarange", field, lo_raw, hi_raw, lo_incl, hi_incl)`` — docmeta
  range over numeric/date doc values (raw string bounds; the engines
  coerce against the column's dtype — ISO dates become epoch micros),
  score 1.0; ``None`` bound = open;
- ``("metaexists", field)`` — docmeta non-null check, score 1.0;
- ``("wildcard", pattern)`` — dictionary wildcard, constant_score 1.0.
"""

from __future__ import annotations

import datetime as _dt
import re

import numpy as np

_PHRASE_RX = re.compile(r'"([^"]*)"(?:~(\d+))?(?:\^(\d+(?:\.\d+)?))?\Z')
_RANGE_RX = re.compile(r"([\[{])([^\]}]*?)\s+TO\s+([^\]}]*?)([\]}])\Z")
_BOOST_RX = re.compile(r"\^(\d+(?:\.\d+)?)\Z")
_FIELD_RX = re.compile(r"([A-Za-z0-9_.]+):(.*)\Z", re.S)
_FUZZY_RX = re.compile(r"(.+?)~(\d*)\Z")
_CMP_RX = re.compile(r"(>=|<=|>|<)(.+)\Z", re.S)

_TOKEN_RX = re.compile(
    r'"[^"]*"(?:~\d+)?(?:\^\d+(?:\.\d+)?)?'   # phrase [~slop][^boost]
    r"|[\[{][^\]}]*[\]}]"                     # range body (may hold spaces)
    r"|\(|\)(?:\^\d+(?:\.\d+)?)?"             # parens; rparen may carry ^boost
    r"|&&|\|\|"
    r'|[^\s()\[\]{}"]+'                       # word (field:, ops, ~N, *?, ^F)
)


def validate_query(query: str, analyze=None, meta_fields=None) -> dict:
    """ES ``_validate/query`` (the ``explain=false`` form): parse-check
    a Lucene query string without running it.  Returns the ES-shaped
    body — ``{"valid": bool[, "error": str]}``.  A query that parses
    but matches nothing (all clauses analyzed away) is VALID, exactly
    as in ES; pass ``meta_fields`` (the index's mapped fields) to also
    reject unknown-field clauses, ES's strict-mapping behavior."""
    if analyze is None:
        def analyze(s: str) -> list[str]:  # the lenient default
            return [t for t in s.lower().split() if t]
    try:
        parse_query_string(query, analyze, meta_fields=meta_fields)
        return {"valid": True}
    except QSParseError as e:
        return {"valid": False, "error": str(e)}


class QSParseError(ValueError):
    pass


def parse_query_string(
    query: str,
    analyze,
    default_operator: str = "or",
    default_field: str | None = None,
    meta_fields=None,
) -> tuple | None:
    """Parse a Lucene-syntax query string → clause tree (None ⇔ no
    positive clause survives analysis — matches nothing, the lenient
    contract shared with :func:`.sqs.parse_simple_query_string`).

    ``analyze`` is the index analyzer.  ``default_field`` names the
    indexed text field (``field:`` scopes equal to it produce text
    leaves); every other fielded clause becomes a docmeta leaf.
    ``meta_fields`` (optional collection) restricts which non-default
    fields are legal — an unlisted field raises, like an ES strict
    mapping; ``None`` accepts any (unmapped fields match nothing at
    evaluation, the lenient mapping)."""
    if default_operator not in ("or", "and"):
        raise QSParseError(f"bad default_operator {default_operator!r}")
    toks = _TOKEN_RX.findall(query or "")
    state = {"i": 0}

    def peek():
        return toks[state["i"]] if state["i"] < len(toks) else None

    def take():
        t = toks[state["i"]]
        state["i"] += 1
        return t

    def is_meta(field: str | None) -> bool:
        if field is None or field == default_field:
            return False
        if meta_fields is not None and field not in meta_fields:
            raise QSParseError(f"unknown field {field!r}")
        return True

    def text_unit(raw: str):
        """One unfielded word unit → text leaf (term / prefix /
        wildcard / fuzzy; multi-token analyses fold under the default
        operator, the sqs convention).  None ⇔ analyzed away."""
        fm = _FUZZY_RX.match(raw)
        if fm and "*" not in raw and "?" not in raw:
            bts = analyze(fm.group(1))
            if not bts:
                return None
            node = None
            for w in bts[:-1]:
                node = _fold_default(node, ("term", w))
            fz = int(fm.group(2)) if fm.group(2) else 2
            return _fold_default(node, ("fuzzy", bts[-1], fz))
        if "*" in raw or "?" in raw:
            pat = raw.lower()  # wildcard terms are not analyzed (Lucene)
            if (
                pat.endswith("*")
                and "?" not in pat
                and "*" not in pat[:-1]
                and len(pat) > 1
            ):
                return ("prefix", pat[:-1])
            return ("wildcard", pat)
        node = None
        for w in analyze(raw):
            node = _fold_default(node, ("term", w))
        return node

    def _fold_default(node, new):
        if new is None:
            return node
        if node is None:
            return new
        return (default_operator, node, new)

    def meta_unit(field: str, raw: str):
        cm = _CMP_RX.match(raw)
        if cm:
            op, lit = cm.group(1), cm.group(2)
            lo = lit if op in (">", ">=") else None
            hi = lit if op in ("<", "<=") else None
            return ("metarange", field, lo, hi, op == ">=", op == "<=")
        return ("metaterm", field, raw)

    def range_unit(field: str | None, tok: str):
        m = _RANGE_RX.match(tok)
        if not m:
            raise QSParseError(f"bad range {tok!r}")
        if field is None or not is_meta(field):
            raise QSParseError(
                f"range {tok!r} needs a docmeta field scope"
            )
        lo = None if m.group(2).strip() in ("*", "") else m.group(2).strip()
        hi = None if m.group(3).strip() in ("*", "") else m.group(3).strip()
        # an open bound's inclusivity is meaningless — normalize False
        return ("metarange", field, lo, hi,
                lo is not None and m.group(1) == "[",
                hi is not None and m.group(4) == "]")

    def atom(field):
        """One clause body (group / phrase / range / word), with its
        optional field scope and ^boost applied.  None ⇔ analyzed
        away."""
        t = take()
        if t == "(":
            node = expr(field)
            boost = None
            nxt = peek()
            if nxt is not None and nxt.startswith(")"):
                take()
                bm = _BOOST_RX.search(nxt)
                if bm:
                    boost = float(bm.group(1))
            if node is not None and boost is not None and boost != 1.0:
                node = ("boost", node, boost)
            return node
        if t.startswith('"'):
            return phrase_atom(field, t)
        if t[0] in "[{":
            return range_unit(field, t)
        # word: optional ^boost suffix, optional field: prefix
        boost = None
        bm = _BOOST_RX.search(t)
        if bm:
            boost = float(bm.group(1))
            t = t[: bm.start()]
        fm = _FIELD_RX.match(t)
        if fm and not _CMP_RX.match(t):  # '>' never starts a field name
            field2, rest = fm.group(1), fm.group(2)
            if field2 == "_exists_" and rest:
                node = ("metaexists", rest)
                if boost is not None and boost != 1.0:
                    node = ("boost", node, boost)
                return node
            if rest == "":
                # ``field:`` scoping the NEXT atom: group/phrase/range
                node = atom(field2)
            elif is_meta(field2):
                node = meta_unit(field2, rest)
            else:
                node = text_unit(rest)
        elif field is not None and is_meta(field):
            node = meta_unit(field, t)
        else:
            node = text_unit(t)
        if node is not None and boost is not None and boost != 1.0:
            node = ("boost", node, boost)
        return node

    def phrase_atom(field, t):
        m = _PHRASE_RX.match(t)
        body, slop = m.group(1), int(m.group(2) or 0)
        boost = float(m.group(3)) if m.group(3) else None
        if field is not None and is_meta(field):
            node = ("metaterm", field, body)  # exact keyword equality
        else:
            ptoks = analyze(body)
            if not ptoks:
                return None
            if len(ptoks) == 1 and slop == 0:
                node = ("term", ptoks[0])
            else:
                node = ("phrase", ptoks, slop)
        if boost is not None and boost != 1.0:
            node = ("boost", node, boost)
        return node

    def expr(field):
        """One parenthesis level: collect (joiner, modifier, node)
        items, then combine with NOT > AND > OR/adjacency
        precedence and Lucene occur-modifier semantics."""
        items: list[tuple[str | None, str | None, tuple]] = []
        joiner: str | None = None
        while True:
            t = peek()
            if t is None or t.startswith(")"):
                break
            if t in ("AND", "&&"):
                take()
                joiner = "and"
                continue
            if t in ("OR", "||"):
                take()
                joiner = "or"
                continue
            mod = None
            while True:
                t = peek()
                if t in ("NOT", "!"):
                    take()
                    mod = "-" if mod != "-" else None
                elif t is not None and t not in ("+", "-") and len(t) > 1 \
                        and t[0] in "+-!" and t[1] not in "+-!":
                    # leading occur modifier glued to the word/phrase
                    toks[state["i"]] = t[1:]
                    if mod is None:
                        mod = "-" if t[0] == "!" else t[0]
                elif t in ("+", "-"):
                    take()  # standalone modifier before a spaced clause
                    mod = t if mod is None else mod
                else:
                    break
            if peek() is None or peek().startswith(")"):
                break
            node = atom(field)
            if node is not None:
                items.append((joiner, mod, node))
            joiner = None
        return _combine(items, default_operator)

    tree = expr(None)
    if peek() is not None and peek().startswith(")"):
        take()  # tolerate an unbalanced close, the lenient contract
    return tree


def _combine(items, default_op):
    """Combine one level's (joiner, modifier, node) items: explicit
    ``AND`` glues consecutive items into chains (a ``-`` item joins as
    AND-NOT); chains then combine at the OR level where ``+`` chains
    gate the doc set (("filter", …)) and ``-`` chains subtract
    (("andnot", …)).  Adjacency joins at the ``default_op`` level."""
    chains: list[tuple[str | None, tuple]] = []  # (mod, node)
    for j, mod, node in items:
        eff = j if j is not None else default_op
        if chains and eff == "and":
            pmod, pnode = chains[-1]
            if mod == "-":
                chains[-1] = (pmod, ("andnot", pnode, node))
            else:
                chains[-1] = (pmod, ("and", pnode, node))
        else:
            chains.append((mod, node))
    node = None
    for m, n in chains:
        if m != "-":
            node = n if node is None else ("or", node, n)
    if node is None:
        return None
    for m, n in chains:
        if m == "+":
            node = ("filter", node, n)
    for m, n in chains:
        if m == "-":
            node = ("andnot", node, n)
    return node


# ------------------------------------------------- docmeta leaf helpers
# shared by both engines so metaterm/metarange evaluate identically over
# doc values in the ``meta_col`` / ``_load_meta_values`` conventions
# (keyword columns → object/str arrays, numerics → int/float arrays,
# timestamps → epoch-MICROS int64)


def coerce_meta_bound(raw: str) -> float | None:
    """A raw query-string literal → the numeric doc-value it compares
    against: plain numbers parse as float; ISO-8601 dates/datetimes
    (naive = UTC, trailing ``Z`` accepted) convert to epoch MICROS —
    the engines' timestamp doc-value unit.  None ⇔ unparseable (the
    clause then matches nothing, the lenient contract)."""
    try:
        return float(raw)
    except (TypeError, ValueError):
        pass
    try:
        d = _dt.datetime.fromisoformat(str(raw).replace("Z", "+00:00"))
    except ValueError:
        return None
    if d.tzinfo is None:
        d = d.replace(tzinfo=_dt.timezone.utc)
    return float(int(d.timestamp() * 1_000_000))


def meta_pred_mask(vals: np.ndarray, pred: tuple) -> np.ndarray:
    """Boolean row mask of a docmeta predicate over doc values.

    ``pred`` is ``("term", raw)``, ``("range", lo_raw, hi_raw, lo_incl,
    hi_incl)`` with raw string literals (None bound = open), or
    ``("exists",)``.  Numeric/timestamp columns coerce literals via
    :func:`coerce_meta_bound`; keyword columns compare exact strings
    (ranges over keyword columns are unsupported and match nothing —
    disclosed)."""
    n = len(vals)
    numeric = vals.dtype.kind in "iuf"
    if pred[0] == "exists":
        if vals.dtype.kind == "f":
            return ~np.isnan(vals)
        if numeric:
            return np.ones(n, dtype=bool)  # non-nullable int doc values
        return np.fromiter(
            (v is not None for v in vals), dtype=bool, count=n
        )
    if pred[0] == "term":
        raw = pred[1]
        if numeric:
            v = coerce_meta_bound(raw)
            if v is None:
                return np.zeros(n, dtype=bool)
            return vals.astype(np.float64) == v
        out = vals == raw  # object/str arrays: elementwise, None != str
        return out if isinstance(out, np.ndarray) else np.zeros(n, bool)
    _, lo, hi, lo_incl, hi_incl = pred
    if not numeric:
        return np.zeros(n, dtype=bool)
    v = vals.astype(np.float64)
    mask = ~np.isnan(v)
    if lo is not None:
        b = coerce_meta_bound(lo)
        if b is None:
            return np.zeros(n, dtype=bool)
        mask &= (v >= b) if lo_incl else (v > b)
    if hi is not None:
        b = coerce_meta_bound(hi)
        if b is None:
            return np.zeros(n, dtype=bool)
        mask &= (v <= b) if hi_incl else (v < b)
    return mask
