"""ES ``simple_query_string``: a forgiving mini query language over the
serving engines.

Supported syntax (the Lucene SimpleQueryParser surface this engine
reproduces — divergences documented below):

- whitespace-separated clauses combine with the ``default_operator``
  (``"or"``, the ES default, or ``"and"``);
- ``+`` infix AND, ``|`` infix OR — applied LEFT-ASSOCIATIVELY with
  equal precedence, like Lucene's single-pass parser;
- ``(`` ... ``)`` grouping;
- ``-clause`` negation (combines as AND-NOT with what precedes it; a
  query with no positive clause matches nothing);
- ``"a phrase"`` exact phrase, ``"a phrase"~N`` sloppy phrase with
  Lucene SloppyPhraseMatcher semantics (reordering + 1/(1+matchLength)
  weighting — the in-repo matcher, ``search.sloppy``);
- ``word*`` prefix (constant_score 1.0, the Lucene PrefixQuery
  CONSTANT_SCORE rewrite);
- ``word~N`` fuzzy (edit distance N): the term expands against the
  index dictionary (deterministic (dist, term) cap, 50 like ES's
  ``max_expansions`` default) and scores the weighted BM25 disjunction
  with the Lucene FuzzyTermsEnum boost ``1 − dist/min(len(q),
  len(t))`` — the scoring_boolean rewrite this repo's ``fuzzy`` query
  uses (disclosed: Lucene's default blends frequencies instead).
  Parsing keeps the leaf as ("fuzzy", base, N); engines rewrite it to
  ("fuzzyexp", base, ((term, dist), ...)) via their dictionary before
  evaluation (``rewrite_fuzzy``).

Scoring is Lucene BooleanQuery's: a doc's score at each node is the
SUM of its matching scoring sub-clauses; AND requires both sides, OR
either, AND-NOT subtracts the right side's matches.  Term clauses score
BM25; phrases score BM25 over the phrase frequency with the summed
constituent idfs; prefixes contribute a constant 1.0.

Disclosed divergences from ES: no ``\"`` escaping inside phrases, and
operator precedence is flat
left-associative (Lucene's documented single-pass behavior; ES edge
cases around mixed ``|``/``-`` may group differently).

The tree evaluates PER SHARD on the doc-partitioned engine (sparse
(ids, scores) algebra, top-k + rounded tie class per shard, standard
merge) and on the coordinator for the term-partitioned layout (whose
bool machinery already gathers per-term postings).
"""

from __future__ import annotations

import re

import numpy as np

# node = ("term", token)
#      | ("phrase", [tokens], slop)
#      | ("prefix", prefix_string)
#      | ("fuzzy", base_token, fuzziness)        — parse-time form
#      | ("fuzzyexp", base_token, ((term, dist), ...))  — after rewrite
#      | ("and" | "or" | "andnot", left, right)
#
# compound-query nodes (not produced by the parser — built by the
# engines' dis_max / boosting / constant_score entry points; evaluated
# by the same tree walker so both engines serve them through their
# existing sqs machinery):
#      | ("dismax", tie_breaker, (child, ...))   — max + tie·Σ(rest)
#      | ("msm", m, (child, ...))                — ≥ m children match;
#                                                  score = Σ matching
#      | ("boosting", positive, negative, negative_boost)
#      | ("constscore", child, boost)            — matching docs score boost
#
# query_string nodes (built by search/qs.py, same walker; its docmeta
# leaves — metaterm/metarange/wildcard — are engine-specific):
#      | ("boost", child, factor)                — scores × factor
#      | ("filter", scored, required)            — scored ∩ required docs,
#                                                  scored's scores (MUST gate)

# '-' is the NOT operator only at clause start (standalone token);
# inside a word it stays part of the term ("hash-join" is one unit the
# analyzer splits, not a negation)
_TOKEN_RX = re.compile(
    r'"[^"]*"(?:~\d+)?|\(|\)|\||\+|-|[^\s()|+"-][^\s()|+"]*'
)


class SQSParseError(ValueError):
    pass


def parse_simple_query_string(
    query: str,
    analyze,
    default_operator: str = "or",
) -> tuple | None:
    """Parse → clause tree (None ⇔ no positive clause survives
    analysis — matches nothing, the ES lenient contract).  ``analyze``
    is the index analyzer (a word unit analyzing to several tokens
    becomes a sub-group under the default operator; to zero tokens, it
    drops)."""
    if default_operator not in ("or", "and"):
        raise SQSParseError(f"bad default_operator {default_operator!r}")
    toks = _TOKEN_RX.findall(query or "")
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def atom():
        """None ⇔ the unit analyzed away (lenient drop)."""
        t = take()
        if t == "(":
            node = expr()
            if peek() == ")":
                take()
            return node
        if t.startswith('"'):
            m = re.match(r'"([^"]*)"(?:~(\d+))?\Z', t)
            body, slop = m.group(1), int(m.group(2) or 0)
            ptoks = analyze(body)
            if not ptoks:
                return None
            if len(ptoks) == 1 and slop == 0:
                return ("term", ptoks[0])
            return ("phrase", ptoks, slop)
        if t.endswith("*") and len(t) > 1:
            pts = analyze(t[:-1])
            if not pts:
                return None
            # multi-token prefix units: leading tokens are terms, the
            # last carries the star (documented subset)
            node = None
            for w in pts[:-1]:
                node = _fold(node, ("term", w), default_operator)
            return _fold(node, ("prefix", pts[-1]), default_operator)
        fm = re.match(r"(.+)~(\d+)\Z", t)
        if fm:
            bts = analyze(fm.group(1))
            if not bts:
                return None
            # multi-token fuzzy units: the edit distance applies to the
            # last token, leading tokens are plain terms (same subset
            # rule as prefixes)
            node = None
            for w in bts[:-1]:
                node = _fold(node, ("term", w), default_operator)
            return _fold(node, ("fuzzy", bts[-1], int(fm.group(2))),
                         default_operator)
        wts = analyze(t)
        node = None
        for w in wts:
            node = _fold(node, ("term", w), default_operator)
        return node

    def clause():
        neg = False
        while peek() == "-":
            take()
            neg = not neg
        if peek() is None:
            return None, False
        a = atom()
        return a, neg

    def expr():
        node = None
        pending_neg: list = []  # negatives seen before any positive
        while True:
            t = peek()
            if t is None or t == ")":
                break
            op = None
            if t in ("+", "|"):
                take()
                op = "and" if t == "+" else "or"
                if peek() is None or peek() == ")":
                    break
            c, neg = clause()
            if c is None:
                continue
            if neg:
                if node is None:
                    pending_neg.append(c)
                else:
                    node = ("andnot", node, c)
            else:
                node = _fold(node, c, op or default_operator)
                while pending_neg and node is not None:
                    node = ("andnot", node, pending_neg.pop(0))
        # a tree that never acquired a positive clause matches nothing
        return node

    return expr()


def _fold(node, new, op):
    if new is None:
        return node
    if node is None:
        return new
    return (op, node, new)


def rewrite_fuzzy(tree, expand_fn):
    """Replace parse-time ("fuzzy", base, N) leaves with ("fuzzyexp",
    base, ((term, dist), ...)) via ``expand_fn(base, N) → [(term,
    dist)]`` — each engine supplies its dictionary expansion (the
    deterministic (dist, term) cap ``expand_fuzzy`` uses).  An EMPTY
    expansion stays a leaf evaluating to the empty match set — like a
    term absent from the index, not a lenient drop (``AND`` with it
    still matches nothing)."""
    if tree is None:
        return None
    kind = tree[0]
    if kind in ("and", "or", "andnot", "filter"):
        return (kind, rewrite_fuzzy(tree[1], expand_fn),
                rewrite_fuzzy(tree[2], expand_fn))
    if kind == "boost":
        return (kind, rewrite_fuzzy(tree[1], expand_fn), tree[2])
    if kind in ("dismax", "msm"):
        return (kind, tree[1],
                tuple(rewrite_fuzzy(c, expand_fn) for c in tree[2]))
    if kind == "boosting":
        return (kind, rewrite_fuzzy(tree[1], expand_fn),
                rewrite_fuzzy(tree[2], expand_fn), tree[3])
    if kind == "constscore":
        return (kind, rewrite_fuzzy(tree[1], expand_fn), tree[2])
    if kind == "fuzzy":
        return ("fuzzyexp", tree[1], tuple(expand_fn(tree[1], tree[2])))
    return tree


def calculate_min_should_match(n: int, spec) -> int:
    """Lucene's ``minimum_should_match`` spec grammar over ``n``
    optional clauses (org.elasticsearch.common.lucene.search.Queries
    ``calculateMinShouldMatch``): a positive integer is absolute, a
    negative integer means ``n + spec`` (that many may be MISSING),
    ``"P%"`` is the truncated percentage of ``n`` (negative per the
    missing rule), and conditional specs ``"3<90%"`` (space-separated,
    ascending) pick the right-most clause whose lower bound is below
    ``n`` — ``n`` at or under the first bound requires ALL clauses.
    The percentage multiply is float32 like the Java original, so
    boundary cases (``100%`` of 5) truncate identically.  The result is
    floored at 0 but NOT capped at ``n``: a result above ``n`` is
    Lucene's MatchNoDocsQuery rewrite — callers match nothing."""
    if isinstance(spec, (int, np.integer)) and not isinstance(spec, bool):
        return max(n + int(spec) if spec < 0 else int(spec), 0)
    s = str(spec).strip()
    if "<" in s:
        result = n
        for part in re.sub(r"\s*<\s*", "<", s).split():
            before, _, after = part.partition("<")
            if not after:
                raise ValueError(
                    f"invalid minimum_should_match spec {part!r}")
            if n <= int(before):
                return result
            result = calculate_min_should_match(n, after)
        return result
    if s.endswith("%"):
        pct = int(s[:-1])
        calc = float(np.float32(np.float32(n * pct)
                                * (np.float32(1) / np.float32(100))))
        res = n + int(calc) if calc < 0 else int(calc)
    else:
        v = int(s)
        res = n + v if v < 0 else v
    return max(res, 0)


def apply_minimum_should_match(tree, m: int | str | None):
    """ES's request-level ``minimum_should_match`` over a parsed tree:
    the root BooleanQuery's OPTIONAL clauses are the top-level OR spine
    — flatten it into an ``("msm", m, children)`` count node.  ``m``
    takes any Lucene spec form (int, negative int, percentage,
    conditional — :func:`calculate_min_should_match` computes the count
    against the root's optional-clause total).  Lucene semantics (the
    root is read as a BooleanQuery): required (``filter``) and
    prohibited (``andnot``) wrappers pass through to their optional
    side; a root with FEWER optional clauses than ``m`` matches
    nothing, exactly as Lucene rewrites a BooleanQuery with
    minShouldMatch > should-count to MatchNoDocsQuery — so ``m ≥ 1``
    over a pure conjunction (``a AND b`` = ``+a +b``, zero optional
    clauses) matches nothing, while ``m = 1`` over an OR spine or a
    single optional clause is the plain query (no-op)."""
    if tree is None or m is None or m == 0:
        return tree
    kind = tree[0]
    if kind in ("filter", "andnot", "boost"):
        inner = apply_minimum_should_match(tree[1], m)
        return (kind, inner) + tree[2:]
    if kind == "and":
        # pure required conjunction: zero optional clauses at the root;
        # a percentage/negative spec resolves against n=0 (no-op at 0),
        # while any absolute m ≥ 1 is unsatisfiable (empty-children msm
        # evals to ∅)
        m = calculate_min_should_match(0, m)
        return tree if m < 1 else ("msm", int(m), ())
    if kind == "or":
        children: list = []

        def flat(n):
            if n[0] == "or":
                flat(n[1])
                flat(n[2])
            else:
                children.append(n)

        flat(tree)
        m = calculate_min_should_match(len(children), m)
        if m <= 1:
            return tree
        return ("msm", int(m), tuple(children))
    m = calculate_min_should_match(1, m)
    if m <= 1:
        return tree
    return ("msm", int(m), (tree,))


def tree_leaves(tree) -> list[tuple]:
    out = []

    def walk(n):
        if n is None:
            return
        if n[0] in ("and", "or", "andnot", "not", "filter"):
            for c in n[1:]:
                walk(c)
        elif n[0] == "boost":
            walk(n[1])
        elif n[0] in ("dismax", "msm"):
            for c in n[2]:
                walk(c)
        elif n[0] == "boosting":
            walk(n[1])
            walk(n[2])
        elif n[0] == "constscore":
            walk(n[1])
        else:
            out.append(n)

    walk(tree)
    return out


# ------------------------------------------------------- sparse algebra
# a result is (ids: int64 sorted ascending unique, scores: float64)


def sqs_and(a, b):
    ids = np.intersect1d(a[0], b[0], assume_unique=True)
    sa = a[1][np.searchsorted(a[0], ids)]
    sb = b[1][np.searchsorted(b[0], ids)]
    return ids, sa + sb


def sqs_or(a, b):
    ids = np.union1d(a[0], b[0])
    out = np.zeros(len(ids), np.float64)
    ia = np.searchsorted(ids, a[0])
    out[ia] += a[1]
    ib = np.searchsorted(ids, b[0])
    out[ib] += b[1]
    return ids, out


def sqs_andnot(a, b):
    keep = ~np.isin(a[0], b[0], assume_unique=True)
    return a[0][keep], a[1][keep]


def eval_tree(tree, leaf_fn):
    """Evaluate a clause tree bottom-up; ``leaf_fn(node) → (ids,
    scores)`` supplies leaves (engine-specific)."""
    kind = tree[0]
    if kind == "and":
        return sqs_and(eval_tree(tree[1], leaf_fn),
                       eval_tree(tree[2], leaf_fn))
    if kind == "or":
        return sqs_or(eval_tree(tree[1], leaf_fn),
                      eval_tree(tree[2], leaf_fn))
    if kind == "andnot":
        return sqs_andnot(eval_tree(tree[1], leaf_fn),
                          eval_tree(tree[2], leaf_fn))
    if kind == "dismax":
        # ES dis_max: per doc, max over matching children plus
        # tie_breaker × the other children's scores; a doc matches if
        # ANY child matches (children iterate in given order — max and
        # sum are order-insensitive elementwise, so floats are stable)
        tie = tree[1]
        parts = [eval_tree(c, leaf_fn) for c in tree[2]]
        ids = parts[0][0]
        for p in parts[1:]:
            ids = np.union1d(ids, p[0])
        best = np.zeros(len(ids), np.float64)
        tot = np.zeros(len(ids), np.float64)
        for p_ids, p_sc in parts:
            aligned = np.zeros(len(ids), np.float64)
            aligned[np.searchsorted(ids, p_ids)] = p_sc
            np.maximum(best, aligned, out=best)
            tot += aligned
        return ids, best + tie * (tot - best)
    if kind == "msm":
        # Lucene BooleanQuery minimum_should_match m-of-n: a doc
        # matches iff ≥ m children match; score = SUM of ALL matching
        # children (not just m of them — the Lucene contract).  Matched
        # counts and sums accumulate order-insensitively, so floats are
        # stable across child order.
        m = int(tree[1])
        parts = [eval_tree(c, leaf_fn) for c in tree[2]
                 if c is not None]
        if not parts or m > len(parts):
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ids = parts[0][0]
        for p in parts[1:]:
            ids = np.union1d(ids, p[0])
        cnt = np.zeros(len(ids), np.int64)
        tot = np.zeros(len(ids), np.float64)
        for p_ids, p_sc in parts:
            pos = np.searchsorted(ids, p_ids)
            cnt[pos] += 1
            tot[pos] += p_sc
        keep = cnt >= m
        return ids[keep], tot[keep]
    if kind == "boosting":
        # ES boosting: positive-clause score, demoted by
        # ``negative_boost`` where the doc ALSO matches the negative
        # clause (the negative clause never adds or removes docs)
        pos_ids, pos_sc = eval_tree(tree[1], leaf_fn)
        neg_ids, _ = eval_tree(tree[2], leaf_fn)
        demote = np.isin(pos_ids, neg_ids, assume_unique=True)
        return pos_ids, np.where(demote, pos_sc * tree[3], pos_sc)
    if kind == "constscore":
        # ES constant_score: every doc matching the (filter-context)
        # child scores exactly ``boost``
        ids, _ = eval_tree(tree[1], leaf_fn)
        return ids, np.full(len(ids), float(tree[2]), np.float64)
    if kind == "boost":
        ids, sc = eval_tree(tree[1], leaf_fn)
        return ids, sc * float(tree[2])
    if kind == "filter":
        # Lucene MUST gate: the scored side's docs restricted to those
        # also matching the required side — scores unchanged (the
        # required clause already contributed once inside the scored
        # side's sum; no double counting)
        a = eval_tree(tree[1], leaf_fn)
        b = eval_tree(tree[2], leaf_fn)
        keep = np.isin(a[0], b[0], assume_unique=True)
        return a[0][keep], a[1][keep]
    return leaf_fn(tree)
