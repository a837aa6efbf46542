"""Lucene-style filter queries compiled to Arrow dataset expressions.

The reference forwards a free-text ``query`` string to Elasticsearch and
ANDs it with the slice's date range
(``/root/reference/asset/elasticsearch_reader/index.js:118-122``,
``asset/simple_api_reader/index.js:67-84``: ``range AND (query)``).  Our
storage is Parquet, so the equivalent capability is compiling the same
query surface into a :class:`pyarrow.dataset.Expression` that
``ray.data.read_parquet`` pushes into the scan (row-group statistics
pruning for comparisons, per-batch evaluation for the rest).  Full-text
(unfielded) predicates are NOT handled here — that is the inverted
index's job (``search.engine``).

Supported grammar (a practical subset of Lucene query syntax)::

    expr     := or
    or       := and (OR and)*
    and      := not (AND not)*          # adjacent clauses imply AND
    not      := NOT not | clause
    clause   := '(' expr ')' | field ':' value
    value    := '[' lit TO lit ']'      # inclusive range
              | '{' lit TO lit '}'      # exclusive range
              | ('>=' | '<=' | '>' | '<') lit
              | lit '*'                 # prefix wildcard
              | lit                     # equality
    lit      := quoted string | bare word | number

Numbers compare numerically; everything else compares as strings.
"""

from __future__ import annotations

import re

import pyarrow.compute as pc
import pyarrow.dataset as pds

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<op>AND\b|OR\b|NOT\b) |
        (?P<quoted>"[^"]*") |
        (?P<cmp>>=|<=|>|<) |
        (?P<lbrack>\[|\{) | (?P<rbrack>\]|\}) |
        (?P<colon>:) |
        (?P<word>[^\s():\[\]{}"]+)
    )""",
    re.VERBOSE,
)


class QuerySyntaxError(ValueError):
    pass


def _tokenize(q: str):
    pos = 0
    out = []
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m or m.end() == pos:
            if q[pos:].strip():
                raise QuerySyntaxError(f"bad token at: {q[pos:pos + 20]!r}")
            break
        pos = m.end()
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
    return out


def _coerce(lit: str):
    if lit.startswith('"'):
        return lit[1:-1]
    try:
        return int(lit)
    except ValueError:
        pass
    try:
        return float(lit)
    except ValueError:
        return lit


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self, kind=None):
        k, v = self.peek()
        if k is None:
            raise QuerySyntaxError("unexpected end of query")
        if kind is not None and k != kind:
            raise QuerySyntaxError(f"expected {kind}, got {k}:{v!r}")
        self.i += 1
        return k, v

    def parse(self) -> pds.Expression:
        e = self.or_expr()
        if self.peek()[0] is not None:
            raise QuerySyntaxError(f"trailing input: {self.peek()!r}")
        return e

    def or_expr(self):
        e = self.and_expr()
        while self.peek() == ("op", "OR"):
            self.take()
            e = e | self.and_expr()
        return e

    def and_expr(self):
        e = self.not_expr()
        while True:
            k, v = self.peek()
            if (k, v) == ("op", "AND"):
                self.take()
                e = e & self.not_expr()
            elif k in ("lparen", "word", "quoted") or (k, v) == ("op", "NOT"):
                e = e & self.not_expr()  # implicit AND
            else:
                return e

    def not_expr(self):
        if self.peek() == ("op", "NOT"):
            self.take()
            return ~self.not_expr()
        return self.clause()

    def clause(self):
        k, v = self.take()
        if k == "lparen":
            e = self.or_expr()
            self.take("rparen")
            return e
        if k not in ("word", "quoted"):
            raise QuerySyntaxError(f"expected field, got {k}:{v!r}")
        field = v[1:-1] if k == "quoted" else v
        self.take("colon")
        return self.value(field)

    def _range_literal(self, stop_at_to: bool) -> str:
        """Inside ``[a TO b]`` brackets, Lucene range endpoints may contain
        colons (ISO timestamps like ``2017-09-23T18:07:14.332Z`` — the
        exact form the simple_api_reader emits, ``index.js:137-150``);
        re-join the colon-split pieces until TO / the closing bracket."""
        pieces: list[str] = []
        while True:
            k, v = self.peek()
            if k is None:
                raise QuerySyntaxError("unterminated range")
            if k == "rbrack" or (stop_at_to and (k, v) == ("word", "TO")):
                break
            if k in ("word", "cmp"):
                pieces.append(v)
            elif k == "colon":
                pieces.append(":")
            elif k == "quoted":
                pieces.append(v[1:-1])
            else:
                raise QuerySyntaxError(f"bad range literal token {k}:{v!r}")
            self.take()
        if not pieces:
            raise QuerySyntaxError("empty range bound")
        return "".join(pieces)

    def value(self, field: str) -> pds.Expression:
        f = pc.field(field)
        k, v = self.take()
        if k == "lbrack":
            lo = _coerce(self._range_literal(stop_at_to=True))
            to = self.take()
            if to != ("word", "TO"):
                raise QuerySyntaxError("range needs TO")
            hi = _coerce(self._range_literal(stop_at_to=False))
            rk, rv = self.take("rbrack")
            # each bound's inclusivity follows its OWN bracket (Lucene
            # mixed ranges like [a TO b} are legal): [ → >=, { → >,
            # ] → <=, } → <
            lo_expr = (f >= lo) if v == "[" else (f > lo)
            hi_expr = (f <= hi) if rv == "]" else (f < hi)
            return lo_expr & hi_expr
        if k == "cmp":
            lit = _coerce(self.take()[1])
            return {">=": f >= lit, "<=": f <= lit, ">": f > lit, "<": f < lit}[v]
        if k in ("word", "quoted"):
            if k == "word" and v.endswith("*") and len(v) > 1:
                # prefix wildcard — the id_reader's `prefix*` probe surface
                # (asset/id_reader/id_slicer.js:65)
                return pc.starts_with(f, v[:-1])
            return f == _coerce(v if k == "word" else v)
        raise QuerySyntaxError(f"bad value {k}:{v!r}")


def compile_query(q: str) -> pds.Expression:
    """Compile a lucene-style fielded query to an Arrow dataset expression."""
    tokens = _tokenize(q)
    if not tokens:
        raise QuerySyntaxError("empty query")
    return _Parser(tokens).parse()
